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

  /** Shingles hotter than this document frequency are dropped before the
    * inverted-index self-join (standard stop-shingle guard). A df-f shingle
    * fans out f²/2 candidate pairs, so one hot stop-phrase is a skew key
    * that dominates the shuffle at corpus scale; capping df bounds per-key
    * fan-out at Cap²/2. Jaccard is then defined over non-hot shingles —
    * mirrored exactly in the oracle. (Max observed df in the test corpora
    * is 25, so the cap is semantics-neutral there.)
    */
  private val ShingleDfCap = 500

  private val qNgram = GraftQuery(
    "qd_ngram_jaccard",
    (s, dir) => {
      // join key is the 60-bit shingle hash, not the string — an 8-byte
      // shuffle key instead of ~20 chars (same trick mirrored in the
      // oracle, so any collision affects both engines identically)
      val sh = shingleTable(s, dir)
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
        .select(col("doc_id"), expr(h60("shingle")).as("shingle"))
      // hot list is tiny by construction (only df > Cap survives) → broadcast
      // anti-join costs one map-side filter, no extra shuffle of sh
      val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") > ShingleDfCap).select(col("shingle"))
      val kept = sh.join(broadcast(hot), Seq("shingle"), "left_anti")
      val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = kept.as("a").join(kept.as("b"),
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
    hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > $ShingleDfCap),
    kept AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d1, d2, CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) AS jaccard
    FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
    WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8
    ORDER BY d1, d2"""))

  // ---------------------------------------------------- MinHash + LSH
  // 16-permutation minhash over shingles (computed row-locally — no
  // explode, no shuffle), banded 4×4; docs sharing any band become
  // candidates; candidates verified with exact Jaccard. At scale the band
  // join replaces the O(n²) pair space.
  private val qMinhash = GraftQuery(
    "qd_minhash_lsh",
    (s, dir) => {
      val sh = shingleTable(s, dir)
      // signature = native MinHashAffine over one 60-bit base hash per
      // shingle: 1 md5 + 16 multiply-mods per shingle instead of 16 md5s
      // (the multiply-mod family is exactly mirrored in the oracle's
      // BIGINT arithmetic — see MinHashAffine); barriered so the
      // self-join's two branches don't recompute it
      val sigs = sh.select(col("doc_id"),
          GraftFunctions.graft_minhash_affine(
            expr(s"transform(sh, t -> ${h60("t")})"), 16).as("sig"))
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
    hs AS (SELECT doc_id, ${h60Sql("shingle")} AS h FROM sh),
    hashes AS (
      SELECT doc_id, i,
        MIN((${graft.functions.MinHashAffine.sqlListA(16)}[i + 1] * (h & ${graft.functions.MinHashAffine.Mask})
          + ${graft.functions.MinHashAffine.sqlListB(16)}[i + 1]) % ${graft.functions.MinHashAffine.P}) AS m
      FROM hs CROSS JOIN generate_series(0, 15) t2(i) GROUP BY doc_id, i),
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
  // 60-bit simhash over tokens (majority vote per bit, computed map-only
  // in the native SimHash60 expression); near-dup pairs = hamming ≤ 6.
  //
  // Pair generation is a PIGEONHOLE BUCKET JOIN, not a pair scan: split
  // the 60 bits into 7 chunks (4×9 + 3×8 bits). Two signatures within
  // hamming distance 6 differ in ≤ 6 bits, so at least one of the 7
  // chunks is bit-identical — joining on (chunk index, chunk value) is
  // EXACT (recall 1.0), and candidates are verified with a full
  // bit_count. Replaces the O(n²) `a.doc_id < b.doc_id` self-join with a
  // hash join whose keys are near-uniform 8/9-bit slices of a hash.
  private val qSimhash = GraftQuery(
    "qd_simhash",
    (s, dir) => {
      // token hashes materialized once per doc, majority vote in the
      // native SimHash60 expression (codegen'd tight loop; the pure
      // array-lambda form recomputed the hash array per bit — 60×);
      // repartition barrier so the self-join's branches reuse one exchange
      val sigs = Tables.documents(s, dir)
        .withColumn("hs", expr(s"transform($toksExpr, t -> ${h60("t")})"))
        .select(col("doc_id"), GraftFunctions.graft_simhash60(col("hs")).as("simhash"))
        .repartition(col("doc_id"))
      val chunked = sigs.select(col("doc_id"), col("simhash"),
          explode(expr(
            "transform(sequence(0, 6), c -> named_struct(" +
              "'ck', c, " +
              "'cv', shiftright(simhash, CASE WHEN c < 4 THEN c * 9 ELSE 36 + (c - 4) * 8 END) " +
              "& CASE WHEN c < 4 THEN 511 ELSE 255 END))")).as("x"))
        .select(col("doc_id"), col("simhash"), col("x.ck").as("ck"), col("x.cv").as("cv"))
      val cand = chunked.as("a").join(chunked.as("b"),
          col("a.ck") === col("b.ck") && col("a.cv") === col("b.cv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.simhash").as("s1"), col("b.simhash").as("s2"))
        .distinct()  // a pair can collide in several chunks
      cand
        .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
        .filter(col("hamming") <= 6)
        .select(col("d1"), col("d2"), col("hamming"))
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
  // are bit-identical.
  //
  // Why NOT hyperplane LSH here: at θ = 0.4 the per-plane collision
  // probability is 1 − arccos(0.4)/π ≈ 0.63, and the test corpora contain
  // NO high-cosine pairs (max pairwise cosine 0.51 at sf0.01 / 0.60 at
  // sf0.1 — every matching pair is borderline), so any banding scheme
  // either misses pairs (breaking exactness) or degenerates to buckets
  // covering most of the corpus. An exact θ=0.4 similarity join over
  // random vectors is intrinsically Ω(n²) candidate evaluations.
  //
  // The scale-correct EXACT plan is therefore a BLOCK-PARTITIONED pair
  // join (triangle enumeration): assign each vector a block in [0, B),
  // broadcast the B·(B+1)/2 ordered block pairs, and hash-join vectors to
  // block pairs. Work per task is (n/B)² dot products, build memory per
  // task is n/B vectors, parallelism is B·(B+1)/2 tasks, and nothing —
  // neither the corpus nor the pair space — is broadcast or cartesian'd.
  // (For true near-dup thresholds θ ≥ ~0.8, qs_ann_lsh's hyperplane
  // buckets are the sub-quadratic path; B scales with cluster size.)
  private[analytics] val dotFold =
    "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"
  private[analytics] def normFold(v: String): String =
    s"aggregate($v, cast(0 as double), (acc, x) -> acc + x * x)"
  private[analytics] val dotFoldSql =
    "list_reduce(list_transform(generate_series(1, 64), i -> va[i] * vb[i]), (a, b) -> a + b)"
  private[analytics] def normFoldSql(v: String): String =
    s"list_reduce(list_transform($v, x -> x * x), (a, b) -> a + b)"

  /** Block count for the triangle-blocked exact pair join. Locally sized
    * for local[32]; on a cluster this scales with executor count (tasks =
    * B·(B+1)/2, per-task build memory = n/B vectors).
    */
  private val EmbedBlocks = 16

  private val qEmbed = GraftQuery(
    "qd_embedding_neardup",
    (s, dir) => {
      import s.implicits._
      val B = EmbedBlocks
      // norms computed once per vector (not per pair); dot product in the
      // native codegen'd DotProduct expression — same sequential fold as
      // the oracle, ~100× the interpreted-lambda throughput; repartition
      // barrier so both join branches reuse one exchange
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(GraftFunctions.graft_dot(col("v"), col("v"))))
        .withColumn("blk", pmod(col("vec_id"), lit(B)).cast("int"))
        .repartition(col("vec_id"))
      // ordered block pairs (bi ≤ bj): each unordered vector pair lands in
      // exactly one block pair — cross-block via block order, same-block
      // via vec_id order
      val blockPairs = (for { i <- 0 until B; j <- i until B } yield (i, j))
        .toDF("bi", "bj")
      e.as("a")
        .join(broadcast(blockPairs), col("a.blk") === col("bi"))
        .join(e.as("b"),
          col("b.blk") === col("bj") &&
            (col("bi") < col("bj") || col("a.vec_id") < col("b.vec_id")))
        .select(
          least(col("a.vec_id"), col("b.vec_id")).as("v1"),
          greatest(col("a.vec_id"), col("b.vec_id")).as("v2"),
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
