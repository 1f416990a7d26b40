package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout features the 100 TB design leans on: partitioned
  * layouts with partition pruning, bucketed tables giving co-located
  * (shuffle-free) joins, and the CSV/JSON source formats. Driven against
  * the sf0.001 test tables.
  */
class StorageLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("partitioned parquet layout prunes partitions at scan time") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, sf)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val filtered = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter not pushed to the scan:\n$plan")
    // pruned scan reads only the lang=en directory
    val full = spark.read.parquet(dir).count()
    val en = filtered.count()
    assert(en > 0 && en < full)
  }

  test("bucketed tables join without a shuffle on the bucketed key") {
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    Tables.customer(spark, sf)
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    // disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("CSV and JSON sources round-trip the documents table") {
    import spark.implicits._
    val base = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    val csvDir = Files.createTempDirectory("graft-csv").toString
    val jsonDir = Files.createTempDirectory("graft-json").toString
    base.write.mode("overwrite").option("header", "true").csv(csvDir)
    base.write.mode("overwrite").json(jsonDir)

    val fromCsv = spark.read.option("header", "true")
      .schema("doc_id LONG, lang STRING, n_chars INT").csv(csvDir)
    val fromJson = spark.read.schema("doc_id LONG, lang STRING, n_chars INT").json(jsonDir)
    assert(fromCsv.count() == base.count())
    assert(fromJson.count() == base.count())
    // exact content equality, not just counts
    assert(fromCsv.exceptAll(base).isEmpty && base.exceptAll(fromCsv).isEmpty)
    assert(fromJson.exceptAll(base).isEmpty && base.exceptAll(fromJson).isEmpty)
  }
}
