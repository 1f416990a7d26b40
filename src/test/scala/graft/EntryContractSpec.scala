package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: `entry` must return rows on the smoke SF,
  * and the registry must be collision-free — `queries` is a Map, so a
  * duplicate name across modules would silently SHADOW one query and the
  * gate would never notice the dropped one.
  */
class EntryContractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("registry names are unique and oracle keys all resolve") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names shadow each other: $dups")
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("driver smoke contract: entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
