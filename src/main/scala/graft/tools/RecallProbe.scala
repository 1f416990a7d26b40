package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: runs the PRODUCTION qs_ann_recall binding (memoized
  * index, self-sizing entry ladder) on an arbitrary sf dir and prints
  * the per-method recall rows — the evidence the scale rehearsal needs
  * for "recall holds at sf1 with the ladder auto-selected"
  * (EXPLAINS_r13). Not part of the gate surface.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.analytics.Tables.embeddings(spark, sfDir).count()
    val (mod, rounds) = graft.analytics.SimilarityOps.entryLadder(n)
    println(s"[recall] $sfDir corpus=$n ladder=(mod=$mod, rounds=$rounds)")
    val t0 = System.nanoTime()
    val rows = graft.SparkEntry.queries("qs_ann_recall")(spark, sfDir).collect()
    println(f"[recall] harness ${(System.nanoTime() - t0) / 1e9}%.1f s")
    rows.foreach(r => println(s"[recall] $r"))
    spark.stop()
  }
}
