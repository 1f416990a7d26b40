package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only recall/cost probe for the ANN tiers: prints recall@k and
  * wall time for graph-ANN beam-search configurations and the binary
  * (1-bit) tier, against the exact top-k. Not part of the gate surface.
  */
object SimProbe {
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
    import graft.analytics.{SimilarityOps, Tables}
    val corpus = Tables.embeddings(spark, sfDir)
    println(s"[sim] corpus rows = ${corpus.count()}")
    val q = corpus.filter(col("vec_id") < 20)
    val exact = SimilarityOps.cosineTopK(corpus, q, 5).localCheckpoint()
    def recallOf(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = SimilarityOps.annRecall(exact, f).collect()(0)
      println(f"[sim] $label%-28s recall=${r.getDouble(r.fieldIndex("recall"))}%.3f  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // binary tier at two rerank budgets
    recallOf("binary rerank=20")(SimilarityOps.binaryTopK(corpus, q, 5, 20))
    recallOf("binary rerank=40")(SimilarityOps.binaryTopK(corpus, q, 5, 40))
    // graph ANN: build kNN edges once per config of k
    for (knnK <- Seq(8, 12)) {
      val e = SimilarityOps.knnGraph(corpus, knnK,
        SimilarityOps.trainCentroids(corpus)).localCheckpoint()
      val sym = e.select(col("src"), col("nbr"))
        .union(e.select(col("nbr").as("src"), col("src").as("nbr")))
      for ((beam, rounds, entryMod) <- Seq((30, 3, 10), (40, 3, 10),
          (40, 4, 10), (60, 3, 10), (60, 4, 10))) {
        recallOf(s"graph k=$knnK beam=$beam r=$rounds em=$entryMod")(
          SimilarityOps.graphAnnSearch(corpus, q,
            corpus.filter(col("vec_id") % entryMod === 0), sym, 5, beam, rounds))
      }
    }
    spark.stop()
  }
}
