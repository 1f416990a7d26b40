package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspection + timing: runMain graft.Explain <sfDir> <query>[,query2] [--plan] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',')
    val showPlan = args.contains("--plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      if (showPlan) {
        println(s"===== $name plan =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      // Time construction + execution, like Bench: iterative queries do
      // eager work (localCheckpoint, convergence counts) during
      // construction, so timing only the final write undercounts them.
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"===== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
