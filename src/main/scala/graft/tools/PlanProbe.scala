package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc physical-plan probe: does `localCheckpoint` preserve output
  * partitioning (and therefore let an iterative consumer skip its
  * per-round Exchange) under this Spark version's AQE? Evidence feeds
  * the r15 iteration-shape decisions; run: runMain graft.tools.PlanProbe
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(1000)
      .select((col("id") % 100).as("src"), col("id").as("dst"))

    def planOf(d: org.apache.spark.sql.DataFrame): String =
      d.queryExecution.executedPlan.toString

    def exchanges(d: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(planOf(d)).length

    val a = df.repartition(4, col("src")).localCheckpoint()
    println(s"A aqe-on ckpt: groupBy(src) exchanges = ${exchanges(a.groupBy("src").count())}")
    println(planOf(a.groupBy("src").count()))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val b = df.repartition(4, col("src")).localCheckpoint()
    println(s"B aqe-off ckpt: groupBy(src) exchanges = ${exchanges(b.groupBy("src").count())}")
    println(planOf(b.groupBy("src").count()))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    println(s"B aqe back on: groupBy(src) exchanges = ${exchanges(b.groupBy("src").count())}")
    val c2 = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val r = df.groupBy("src").agg(count(lit(1)).as("d"))
        .repartition(4, col("src")).localCheckpoint()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      r
    }
    val j = b.join(c2, "src")
    println(s"C co-partitioned join exchanges = ${exchanges(j)}")
    println(planOf(j))
    spark.stop()
  }
}
