package graft.analytics

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cross-partitioning determinism pin — the property the whole oracle gate
  * rests on: every emitted double is either an exact integer-arithmetic
  * result (quantized-BIGINT sums, fixed-point PageRank) or a fixed-order
  * fold, so results are BIT-IDENTICAL under different shuffle partition
  * counts (different partition counts ⇒ different merge orders ⇒ any
  * order-sensitive float accumulation would drift). A plain sum(double)
  * would not survive this spec; these queries must.
  */
class DeterminismSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  // representative of each exactness technique: quantized-BIGINT means,
  // integer fixed-point iteration, sorted-fold scoring, hash ranking
  private val pinned = Seq(
    "qs_label_centroids", // ×2^24 BIGINT quantized sums
    "qg_pagerank",        // integer fixed-point power iteration
    "qt_bm25",            // sorted-token float fold
    "qt_dsir_weights",    // exact-BIGINT likelihood ratios
    "qs_kmeans_step",     // quantized Lloyd step
    "qd_winnow",          // packed-BIGINT window argmin
    "qg_sssp",            // frontier relaxation, BIGINT min-distances
    "qg_ppr",             // per-seed teleport fixed-point
    "qml_target_encode",  // LOO micro-unit integer division
    "qs_rrf_fusion",      // integer micro-unit rank fusion
    "qd_cc_stars",        // large/small-star edge-set fixpoint (r8)
    "qt_mw_reweight",     // exact-rational hedge update (r8)
    "qt_zipf_surprisal",  // two-level bucket-offset ranks + integer bits (r8 s2)
    "qe_kaplan_meier",    // ppm floor-product fold over the sorted day array (r8 s2)
    "qj_fellegi_sunter",  // saturating ppm ratio chain over count-derived u's (r8 s2)
    "qm_audio_fingerprint") // delta voting + max-struct winner (r8 s2)

  test("pinned queries are bit-identical under different shuffle partitionings") {
    pinned.foreach { name =>
      def run(parts: String): Seq[String] = {
        // drop session memos so BOTH runs rebuild every shared prefix
        // under their own partitioning — otherwise the second run would
        // trivially reuse the first run's materialized frames and the
        // pin would only cover the post-memo stages
        graft.analytics.Memo.clear()
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        graft.SparkEntry.queries(name)(spark, sf)
          .collect().map(_.toString).toSeq
      }
      val a = run("3")
      val b = run("7")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b,
        s"$name drifted across shuffle partitionings (3 vs 7 partitions): " +
          s"first diff = ${a.zip(b).find { case (x, y) => x != y }}")
    }
  }
}
