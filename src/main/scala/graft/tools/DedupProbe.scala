package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition probe for the near-dup clustering build (the
  * r13 scale rehearsal's one super-linear term): times the simhash pair
  * join and the CC fixpoint separately and prints candidate/verified/
  * cluster counts, so the quadratic factor can be attributed to
  * candidate volume vs intrinsic verified-pair volume. Not part of the
  * gate surface.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    // same rehearsal IO profile as Bench (SCALE.md r14): tmpfs local dir
    val spark = (if (sys.env.get("SPARK_GRAFT_TMPFS").contains("1")) {
      val d = "/dev/shm/graft-spark-local"
      new java.io.File(d).mkdirs()
      b0.config("spark.local.dir", d)
    } else b0).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.analytics.{DedupOps, Tables}
    val docs = Tables.documents(spark, sfDir)
    println(s"[dedup] $sfDir docs=${docs.count()}")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedup] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // candidate volume the chunk join must enumerate: sum over
    // (chunk, value) buckets of C(b, 2)
    val sigs = docs
      .select(col("doc_id"),
        graft.functions.GraftFunctions.graft_simhash60(
          expr(s"transform(${graft.analytics.Nlp.toksExpr}, t -> " +
            s"${graft.analytics.Nlp.h60("t")})")).as("simhash"))
    println(s"[dedup] distinct signatures = " +
      s"${sigs.select(col("simhash")).distinct().count()}")
    val occ = sigs
      .select(explode(expr("transform(sequence(0, 6), i -> " +
        "struct(i AS ck, shiftright(simhash, i * 8) & 255 AS cv))")).as("x"))
      .groupBy(col("x.ck"), col("x.cv")).agg(count(lit(1)).as("b"))
      .agg(sum(expr("b * (b - 1) / 2")).as("cand"), max(col("b")).as("maxb"))
      .head
    println(s"[dedup] approx candidate pairs = ${occ.get(0)} " +
      s"(hottest bucket ${occ.get(1)})")
    // decomposition: signature compute alone, then the pair phase over
    // MATERIALIZED signatures (mirrors simhashPairs' internals)
    val sigC = timed("signatures compute+checkpoint") {
      sigs.repartition(col("doc_id")).localCheckpoint()
    }
    locally {
      val nChunks = 7
      def off(i: Int) = if (i < 4) i * 9 else 4 * 9 + (i - 4) * 8
      def width(i: Int) = if (i < 4) 9 else 8
      val chunkArr = (0 until nChunks).map(i =>
        s"named_struct('ck', $i, 'cv', shiftright(simhash, ${off(i)}) & ${(1 << width(i)) - 1})")
        .mkString("array(", ", ", ")")
      val chunked = sigC.select(col("doc_id"), col("simhash"),
          explode(expr(chunkArr)).as("x"))
        .select(col("doc_id"), col("simhash"), col("x.ck").as("ck"), col("x.cv").as("cv"))
      val cand = timed("raw chunk join candidate count") {
        chunked.as("a").join(chunked.as("b"),
          col("a.ck") === col("b.ck") && col("a.cv") === col("b.cv") &&
            col("a.doc_id") < col("b.doc_id")).count()
      }
      println(s"[dedup] raw candidates = $cand")
      val verified = timed("candidates + verify filter count") {
        chunked.as("a").join(chunked.as("b"),
            col("a.ck") === col("b.ck") && col("a.cv") === col("b.cv") &&
              col("a.doc_id") < col("b.doc_id"))
          .filter(expr("bit_count(a.simhash ^ b.simhash) <= 6")).count()
      }
      println(s"[dedup] verified (with chunk multiplicity) = $verified")
    }
    // budget-only mode ("budget" as arg 2): skip the full pair list —
    // at collision-dense sf10 the verified list is intrinsically
    // quadratic (~10^4 core-seconds by problem statement); the budgeted
    // path is the one that must complete there (r13 verdict task 1)
    val budgetOnly = args.length > 1 && args(1) == "budget"
    val clFull = if (budgetOnly) None else Some {
      val pairs = timed("simhashPairs materialize") {
        DedupOps.simhashPairs(docs).localCheckpoint()
      }
      println(s"[dedup] verified pairs = ${pairs.count()}")
      val cl = timed("nearDupClusters fixpoint") {
        DedupOps.nearDupClusters(pairs)
      }
      println(s"[dedup] clustered rows = ${cl.count()}")
      cl
    }
    val edges = timed("simhashClusterEdges materialize") {
      DedupOps.simhashClusterEdges(docs).localCheckpoint()
    }
    println(s"[dedup] budgeted edges = ${edges.count()}")
    val clB = timed("nearDupClusters over budgeted edges") {
      DedupOps.nearDupClusters(edges).localCheckpoint()
    }
    println(s"[dedup] budgeted clustered rows = ${clB.count()}")
    clFull.foreach { cl =>
      val mismatches = cl.as("a")
        .join(clB.as("b"), col("a.doc_id") === col("b.doc_id"), "full")
        .filter(col("a.cluster_id").isNull || col("b.cluster_id").isNull ||
          col("a.cluster_id") =!= col("b.cluster_id"))
        .count()
      println(s"[dedup] budgeted-vs-full label mismatches = $mismatches" +
        (if (mismatches == 0) " (closure identical)" else " *** DIVERGED ***"))
    }
    spark.stop()
  }
}
