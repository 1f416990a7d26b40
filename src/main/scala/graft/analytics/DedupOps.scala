package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.GraftQuery
import graft.functions.GraftFunctions
import Nlp._

/** Deduplication operators over `documents` / `embeddings` — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: signatures (minhash/simhash/fingerprints) are computed
  * row-locally with array lambdas (map-only, no shuffle, codegen'd); the
  * only shuffles are (a) the groupBy/join on signature or band values —
  * keys that are uniformly hash-distributed, so no skew — and (b) the
  * candidate-pair join, whose size LSH bounds far below the O(n²)
  * cross-join a naive near-dup pass would need. At 100 TB the same plan
  * holds: band-bucket join cardinality is controlled by (bands, rows per
  * band), not by n².
  */
object DedupOps {

  // -------------------------------------------------------- exact dedup
  // Hash-groupBy on the normalized text; every doc labeled with its
  // canonical (minimum) doc_id. One shuffle on a 128-bit fingerprint.
  private val qExact = GraftQuery(
    "qd_exact_dedup",
    (s, dir) => {
      val w = Window.partitionBy(col("fp"))
      Tables.documents(s, dir)
        .withColumn("fp", md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")).cast("binary")))
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .select(col("doc_id"), col("canonical_id"),
          (col("doc_id") =!= col("canonical_id")).as("is_dup"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH f AS (SELECT doc_id,
      md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp FROM documents)
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY fp) AS canonical_id,
      doc_id <> MIN(doc_id) OVER (PARTITION BY fp) AS is_dup
    FROM f ORDER BY doc_id"""))

  // ------------------------------------------------- n-gram Jaccard dedup
  // Exact Jaccard over distinct word-3-gram shingles, via an inverted
  // index (shingle → docs) self-join — the verification kernel all
  // approximate methods reduce to. Pairs sharing ≥1 shingle only, so the
  // join does NOT materialize n²; threshold 0.8.
  /** (doc_id, sh) with the shingle array MATERIALIZED behind a round-robin
    * exchange. The barrier matters: downstream ops reference `sh` many
    * times (explode, per-seed minhash, verification), and without a
    * physical column each reference re-runs tokenize+shingle. At scale
    * this is the "signature table" stage every dedup pipeline
    * materializes before the candidate join.
    */
  private def shingleTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .select(col("doc_id"), expr(shingles("toks")).as("sh"))
      .repartition(col("doc_id"))

  private val qNgram = GraftQuery(
    "qd_ngram_jaccard",
    (s, dir) => {
      // join key is the 60-bit shingle hash, not the string — an 8-byte
      // shuffle key instead of ~20 chars (same trick mirrored in the
      // oracle, so any collision affects both engines identically)
      val sh = shingleTable(s, dir)
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
        .select(col("doc_id"), expr(h60("shingle")).as("shingle"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
        .withColumn("jaccard",
          col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select(col("d1"), col("d2"), col("jaccard"))
        .orderBy(col("d1"), col("d2"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
    sh0 AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS shingle_s FROM t),
    sh AS (SELECT doc_id, ${h60Sql("shingle_s")} AS shingle FROM sh0),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d1, d2, CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
    FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
    WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8
    ORDER BY d1, d2"""))

  // ---------------------------------------------------- MinHash + LSH
  // 16 md5-seeded minhash functions over shingles (computed row-locally
  // with nested array lambdas — no explode, no shuffle), banded 4×4; docs
  // sharing any band become candidates; candidates verified with exact
  // Jaccard. At scale the band join replaces the O(n²) pair space.
  private val qMinhash = GraftQuery(
    "qd_minhash_lsh",
    (s, dir) => {
      val sh = shingleTable(s, dir)
      // native MinHashSig: all 16 slots in one digest loop per shingle;
      // barriered so the self-join's two branches don't recompute it
      val sigs = sh.select(col("doc_id"),
          GraftFunctions.graft_minhash(col("sh"), 16).as("sig"))
        .repartition(col("doc_id"))
      // bands: 4 groups of 4 signature slots, joined as strings (slice —
      // not sig[i] indexing — so sig is evaluated once per band)
      val banded = sigs.select(col("doc_id"),
          explode(expr("transform(sequence(0, 3), b -> struct(b as band, " +
            "concat_ws(',', transform(slice(sig, b * 4 + 1, 4), x -> cast(x as string))) as bv))"))
            .as("bd"))
        .select(col("doc_id"), col("bd.band"), col("bd.bv"))
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      // verify candidates with exact shingle Jaccard
      cand
        .join(sh.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
        .join(sh.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
        .withColumn("inter", expr("size(array_intersect(sh1, sh2))"))
        .withColumn("jaccard",
          col("inter").cast("double") / (size(col("sh1")) + size(col("sh2")) - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select(col("d1"), col("d2"), col("jaccard"))
        .orderBy(col("d1"), col("d2"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
    shl AS (SELECT doc_id, ${shinglesSql("toks")} AS sh FROM t),
    sh AS (SELECT doc_id, unnest(sh) AS shingle FROM shl),
    hashes AS (
      SELECT doc_id, i, MIN(${h60Sql("i || ':' || shingle")}) AS m
      FROM sh CROSS JOIN generate_series(0, 15) t2(i) GROUP BY doc_id, i),
    bands AS (
      SELECT doc_id, i // 4 AS band, string_agg(m::VARCHAR, ',' ORDER BY i) AS bv
      FROM hashes GROUP BY doc_id, i // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
    verified AS (
      SELECT d1, d2,
        CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
          / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jaccard
      FROM cand JOIN shl x ON x.doc_id = d1 JOIN shl y ON y.doc_id = d2)
    SELECT d1, d2, jaccard FROM verified WHERE jaccard >= 0.8 ORDER BY d1, d2"""))

  // --------------------------------------------------------- SimHash
  // 60-bit simhash over tokens (majority vote per bit, computed with
  // nested array lambdas — map-only); near-dup pairs = hamming ≤ 6.
  // The pair scan is a self-join on a single bigint per doc.
  private val qSimhash = GraftQuery(
    "qd_simhash",
    (s, dir) => {
      // token hashes materialized once per doc, majority vote in the
      // native SimHash60 expression (codegen'd tight loop; the pure
      // array-lambda form recomputed the hash array per bit — 60×)
      val sigs = Tables.documents(s, dir)
        .withColumn("hs", expr(s"transform($toksExpr, t -> ${h60("t")})"))
        .select(col("doc_id"), GraftFunctions.graft_simhash60(col("hs")).as("simhash"))
      sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
        .withColumn("hamming", expr("bit_count(a.simhash ^ b.simhash)"))
        .filter(col("hamming") <= 6)
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"), col("hamming"))
        .orderBy(col("d1"), col("d2"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
    hs AS (SELECT doc_id, list_transform(toks, t -> ${h60Sql("t")}) AS h FROM t),
    sig AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), b ->
        CASE WHEN 2 * len(list_filter(h, x -> ((x >> b) & 1) = 1)) > len(h)
        THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
      FROM hs)
    SELECT a.doc_id AS d1, b.doc_id AS d2,
      CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    ORDER BY d1, d2"""))

  // ------------------------------------------- embedding cosine near-dup
  // Pairwise cosine ≥ 0.4 over the 64-dim embeddings. Dot/norms are
  // sequential left-folds over index order in BOTH engines, so the doubles
  // are bit-identical. (The all-pairs join is the correctness baseline;
  // the LSH-bucketed variant in SimilarityOps is the scale path.)
  private[analytics] val dotFold =
    "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"
  private[analytics] def normFold(v: String): String =
    s"aggregate($v, cast(0 as double), (acc, x) -> acc + x * x)"
  private[analytics] val dotFoldSql =
    "list_reduce(list_transform(generate_series(1, 64), i -> va[i] * vb[i]), (a, b) -> a + b)"
  private[analytics] def normFoldSql(v: String): String =
    s"list_reduce(list_transform($v, x -> x * x), (a, b) -> a + b)"

  private val qEmbed = GraftQuery(
    "qd_embedding_neardup",
    (s, dir) => {
      // norms computed once per vector (not per pair); dot product in the
      // native codegen'd DotProduct expression — same sequential fold as
      // the oracle, ~100× the interpreted-lambda throughput
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(GraftFunctions.graft_dot(col("v"), col("v"))))
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
          (GraftFunctions.graft_dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm"))).as("cosine"))
        .filter(col("cosine") >= 0.4)
        .orderBy(col("v1"), col("v2"))
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT a.vec_id AS v1, b.vec_id AS v2, a.v AS va, b.v AS vb
      FROM e a JOIN e b ON a.vec_id < b.vec_id),
    c AS (SELECT v1, v2,
      $dotFoldSql / (sqrt(${normFoldSql("va")}) * sqrt(${normFoldSql("vb")})) AS cosine
      FROM p)
    SELECT v1, v2, cosine FROM c WHERE cosine >= 0.4 ORDER BY v1, v2"""))

  val queries: Seq[GraftQuery] = Seq(qExact, qNgram, qMinhash, qSimhash, qEmbed)
}
