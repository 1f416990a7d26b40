package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only phase profiler for the qg_betweenness pipeline: times the
  * trade-graph build, the landmark BFS, and the DAG-build + backward
  * sweep separately so loop-constant work can be attributed before
  * tuning. Not part of the bench or gate surface.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (rep <- 1 to 3) {
      graft.analytics.Memo.clear()
      println(s"--- rep $rep")
      time("trade_graph")(graft.analytics.GraphOps.warmTradeGraph(spark, sfDir))
      time("landmark_bfs")(graft.analytics.GraphOps.warmLandmarkBfs(spark, sfDir))
      time("qg_betweenness") {
        graft.SparkEntry.queries("qg_betweenness")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      time("qg_betweenness2") {
        graft.SparkEntry.queries("qg_betweenness")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
