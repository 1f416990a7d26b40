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
    val (mod, rounds, beam) = graft.analytics.SimilarityOps.entryLadder(n)
    println(s"[recall] $sfDir corpus=$n ladder=(mod=$mod, rounds=$rounds, beam=$beam)")
    val t0 = System.nanoTime()
    val rows = graft.SparkEntry.queries("qs_ann_recall")(spark, sfDir).collect()
    println(f"[recall] harness ${(System.nanoTime() - t0) / 1e9}%.1f s")
    rows.foreach(r => println(s"[recall] $r"))
    // ladder A/B over the PRODUCTION navigable graph (same memoized
    // edges the qs_graph_ann binding walks): vary entry mod / rounds
    if (args.length > 1 && args(1) == "ab") {
      import org.apache.spark.sql.functions._
      import graft.analytics.{SimilarityOps, Tables}
      val corpus = Tables.embeddings(spark, sfDir)
      val q = corpus.filter(col("vec_id") < 20)
      val exact = SimilarityOps.cosineTopK(corpus, q, 5).localCheckpoint()
      // the PRODUCTION graph builder — the probe must measure the
      // graph qs_graph_ann actually walks, not a reimplementation
      val sym = SimilarityOps.navigableEdges(spark, sfDir).localCheckpoint()
      for ((mod, rounds, beam) <- Seq((4096, 4, 120), (4096, 4, 200),
          (4096, 5, 200), (4096, 4, 360), (4096, 5, 360),
          (4096, 6, 360), (4096, 5, 600))) {
        val t1 = System.nanoTime()
        val r = SimilarityOps.annRecall(exact,
          SimilarityOps.graphAnnSearch(corpus, q,
            corpus.filter(col("vec_id") % mod === 0), sym, 5, beam, rounds,
            entryK = 24)).collect()(0)
        println(f"[recall] ab mod=$mod%5d rounds=$rounds beam=$beam -> " +
          f"${r.getDouble(r.fieldIndex("recall"))}%.3f  " +
          f"${(System.nanoTime() - t1) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
