package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The session-extensions hook must give a freshly built session the
  * `graft_*` SQL functions without any per-session register() call.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions(new GraftExtensions) registers the native functions") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
          graft_simhash60(array(7L)) AS s,
          graft_minhash_affine(array(42L), 4) AS m""").collect().head
      assert(r.getDouble(0) == 11.0)
      assert(r.getLong(1) == 7L)
      assert(r.getSeq[Long](2).size == 4)
    } finally spark.stop()
  }
}
