package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.GraftQuery
import graft.functions.GraftFunctions.{graft_dot, graft_dot_scores, graft_idot, graft_idot_packed, graft_int8_pack}
import DedupOps.{dotFoldSql, normFoldSql}
import Nlp.{h60, h60Sql}

/** Nearest-neighbor search — exact top-k plus LSH and IVF approximate
  * tiers — exposed as a column-parameterized public API (corpus + queries
  * DataFrames with an id + vector column) and driver-checked bindings over
  * the `embeddings` table.
  *
  * Tiers:
  *  - `qs_topk_bruteforce`: exact cosine top-k for a small query set. The
  *    query side is tiny → broadcast; the corpus is scanned once, never
  *    collected; norms precomputed per row; dot products in the native
  *    codegen'd DotProduct expression. Correctness baseline for ANN.
  *  - `qs_ann_lsh`: random-hyperplane LSH. Hyperplanes are derived
  *    deterministically from md5 (computed once on the driver, shipped as
  *    a literal — both engines and every executor agree). Each vector gets
  *    a 4-bit bucket (map-only); candidates co-located by a join on
  *    bucket; exact rerank inside the bucket. At 100 TB the bucket join
  *    replaces the O(n·q) brute-force scan; recall tunes with planes.
  */
object SimilarityOps {

  private val NQ = 20   // query vectors: vec_id < NQ
  private val K = 5

  /** float mantissa width: lossless-enough, exact sums. Declared up top:
    * vals interpolated into other vals' SQL strings must initialize
    * FIRST or they silently read as 0 (Scala object init order).
    */
  private val Quant = 1 << 24

  /** Hyperplane count: 2^Planes buckets. Sized for the test corpora (2k
    * vectors / 16 buckets); at larger corpus scale raise it so the expected
    * bucket occupancy n/2^Planes stays rerank-able (e.g. 12-16 planes at
    * 10^9 vectors) — recall then tunes by unioning several plane sets.
    * The oracle SQL derives from the same constant, so changing it keeps
    * the gate consistent.
    */
  private[analytics] val Planes = 4

  /** Driver-side replica of Nlp.h60 (md5 prefix → 60-bit long); used to
    * derive the LSH plane weights once instead of per row.
    */
  private def h60Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** weight(p, i) = (h60("plane<p>_<i>") % 2001 - 1000) / 1000 ∈ [-1, 1]. */
  private[analytics] def planeWeights: Seq[Seq[Double]] =
    (0 until Planes).map(p => (0 to 63).map(i =>
      (h60Local(s"plane${p}_$i") % 2001 - 1000).toDouble / 1000.0))

  private def withCosine(pairs: org.apache.spark.sql.DataFrame) =
    pairs.withColumn("cosine",
      graft_dot(col("va"), col("vb")) / (col("na") * col("nb")))

  private val cosineSql =
    s"$dotFoldSql / (sqrt(${normFoldSql("va")}) * sqrt(${normFoldSql("vb")}))"

  /** Normalize any (idCol, vecCol) frame to (vec_id, v, nrm). */
  /** Literal→broadcast-join switchover for cell assignment: up to this
    * many centroids ride the plan as ONE matrix literal (O(1) plan
    * NODES, but the literal value itself — C·dim doubles — is copied
    * into every serialized plan, task binary, and explain string);
    * above it the codebook becomes a broadcast TABLE and the plan stays
    * O(1) in bytes too. C ≈ √n is ~250 at sf0.1, so every shipped
    * binding stays on the literal path; the join path is the 100 TB
    * regime (C ~ 10⁵–10⁶), where inlining the codebook would be a
    * plan-size bomb.
    */
  private[analytics] val CentroidLiteralMax = 1024

  /** Nearest-centroid (argmax-dot) cell assignment on a prepped frame
    * (must carry `vec_id` and `v`): adds `cell`, the 1-based codebook
    * index. Two physically different, bit-identical paths:
    *
    *  - C ≤ `literalMax`: the fused [[graft.functions.ArrayExprs]]
    *    DotScores matrix-literal kernel + array_position-of-max —
    *    map-only, no join; ties resolve to the LOWEST cell index.
    *  - C > `literalMax`: the codebook becomes a broadcast (cell, w)
    *    table; each row scores all C broadcast rows (a broadcast
    *    nested-loop with bounded per-row fan-out C — exactly the FLOPs
    *    the literal kernel does, now without the plan-text payload), a
    *    partial agg takes max(struct(dot, −cell)) so ties resolve to
    *    the SAME lowest cell, and one id-keyed join maps cells back.
    *
    * DotProduct and DotScores share the per-element contract
    * (sequential accumulation, truncate-to-shorter, NULL element → 0),
    * so the paths agree bit-for-bit — OpsApiSpec pins the equivalence
    * and the C = 10⁴ plan-size bound.
    */
  private[analytics] def withArgmaxCell(df: org.apache.spark.sql.DataFrame,
      cents: Seq[Seq[Double]],
      literalMax: Int = CentroidLiteralMax): org.apache.spark.sql.DataFrame =
    if (cents.size <= literalMax)
      df.withColumn("_sc", graft_dot_scores(typedLit(cents), col("v")))
        .withColumn("cell", expr("array_position(_sc, array_max(_sc))"))
        .drop("_sc")
    else {
      val spark = df.sparkSession
      val codebook = broadcast(spark.createDataFrame(
          cents.zipWithIndex.map { case (w, i) => ((i + 1).toLong, w) })
        .toDF("_cell", "_w"))
      val cells = df.select(col("vec_id"), col("v")).crossJoin(codebook)
        .select(col("vec_id"), col("_cell"),
          graft_dot(col("_w"), col("v")).as("_dot"))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("_dot"), (-col("_cell")).as("_nc"))).as("_m"))
        .select(col("vec_id"), (-col("_m._nc")).as("cell"))
      df.join(cells, "vec_id")
    }

  private def prep(df: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String) =
    df.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft_dot(col("v"), col("v"))))

  private def vectors(s: org.apache.spark.sql.SparkSession, dir: String) =
    prep(Tables.embeddings(s, dir), "vec_id", "embedding")

  private def topK(pairs: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ======================= public operator API =======================

  /** Exact cosine top-k: broadcast the (small) query side, scan the corpus
    * once, never collect; norms precomputed per row; dot products in the
    * native codegen'd DotProduct expression. Correctness baseline for ANN.
    * Output: (query_id, rank, cand_id, cosine).
    */
  def cosineTopK(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val q = prep(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("v").as("va"), col("nrm").as("na"))
    val pairs = prep(corpus, idCol, vecCol)
      .select(col("vec_id").as("cand_id"), col("v").as("vb"), col("nrm").as("nb"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
    topK(withCosine(pairs), k)
  }

  /** Random-hyperplane LSH ANN: sign-bit buckets from the plane literals
    * (map-only), candidates co-located by a bucket join, exact cosine
    * rerank in-bucket. Sub-quadratic scale path; recall tunes with planes.
    */
  def annLsh(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      planes: Seq[Seq[Double]] = planeWeights,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val bucketCol = planes.zipWithIndex.map { case (w, p) =>
      when(graft_dot(typedLit(w), col("v")) >= 0.0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    val q = prep(queries, idCol, vecCol).withColumn("bucket", bucketCol)
      .select(col("vec_id").as("query_id"), col("v").as("va"),
        col("nrm").as("na"), col("bucket"))
    val cands = prep(corpus, idCol, vecCol).withColumn("bucket", bucketCol)
      .select(col("vec_id").as("cand_id"), col("v").as("vb"),
        col("nrm").as("nb"), col("bucket"))
    val pairs = cands.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
    topK(withCosine(pairs), k)
  }

  /** IVF (inverted-file) ANN: map-only cell assignment (argmax of native
    * dot against the centroid literals), queries probe their `nprobe`
    * best cells, exact cosine rerank inside the probed cells. The cell
    * join replaces the O(n·q) scan; per-cell candidate lists are the
    * "inverted file". Probe fan-out is per-QUERY (the broadcast side), so
    * raising nprobe trades broadcast-side rows for recall with unchanged
    * corpus-side cost — the standard IVF recall knob.
    *
    * nprobe = 2 keeps the original best-plus-second-best formulation its
    * oracles pin; nprobe > 2 probes every cell scoring ≥ the nprobe-th
    * best (ties included — a deterministic superset, mirrored by the
    * list_reverse_sort threshold in SQL).
    */
  def annIvf(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      cents: Seq[Seq[Double]] = centroids,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nprobe: Int = 2): org.apache.spark.sql.DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    // Corpus side: argmax-only assignment through the literal/broadcast
    // switchover. Query side keeps the matrix-literal score ARRAY (it
    // needs the top-nprobe cells, and queries are the tiny broadcast
    // side of the probe join anyway).
    val corpusCells = withArgmaxCell(prep(corpus, idCol, vecCol), cents)
      .select(col("vec_id").as("cand_id"), col("v").as("vb"),
        col("nrm").as("nb"), col("cell"))
    val q0 = prep(queries, idCol, vecCol)
      .withColumn("sc", graft_dot_scores(typedLit(cents), col("v")))
      .withColumn("cell", expr("array_position(sc, array_max(sc))"))
    val q =
      if (nprobe == 2)
        q0.withColumn("p2",
            expr("array_position(sc, array_max(filter(sc, x -> x != array_max(sc))))"))
          .select(col("vec_id").as("query_id"), col("v").as("va"), col("nrm").as("na"),
            explode(array(col("cell"), col("p2"))).as("cell"))
      else
        q0.withColumn("thr",
            expr(s"element_at(sort_array(sc, false), least($nprobe, size(sc)))"))
          .select(col("vec_id").as("query_id"), col("v").as("va"), col("nrm").as("na"),
            explode(expr("transform(filter(sequence(1, size(sc))," +
              " i -> element_at(sc, i) >= thr), i -> cast(i as bigint))")).as("cell"))
    val pairs = corpusCells.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
    topK(withCosine(pairs), k)
  }

  /** Filtered (pre-filter) vector search: a metadata predicate prunes the
    * corpus BEFORE cell assignment and the inverted-list join. Spark-first
    * this is plain composition — `annIvf(corpus.filter(pred), …)` — and
    * Catalyst pushes the predicate into the parquet scan (PushedFilters),
    * so at 100 TB the inverted lists are built only over qualifying rows.
    * Pre-filtering keeps the top-k exact w.r.t. the filtered subset;
    * post-filtering an unfiltered top-k can silently return fewer than k
    * rows when survivors are scarce.
    */
  def annIvfFiltered(corpus: org.apache.spark.sql.DataFrame,
      pred: org.apache.spark.sql.Column,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      cents: Seq[Seq[Double]] = centroids,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame =
    annIvf(corpus.filter(pred), queries, k, cents, idCol, vecCol)

  // ==================== driver-checked query bindings ====================

  /** Recall of an approximate top-k against the exact top-k: the fraction
    * of exact (query, neighbor) pairs the approximation recovered — THE
    * number a user tunes planes/nprobe against. One broadcast-able join of
    * two k·|Q|-row frames + a global aggregate; never touches the corpus
    * again. Both inputs come from deterministic, literal-seeded plans, so
    * recall itself is a fixed, oracle-checkable number.
    */
  def annRecall(exact: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    exact.select(col("query_id"), col("cand_id"))
      .join(approx.select(col("query_id"), col("cand_id")).withColumn("hit", lit(1)),
        Seq("query_id", "cand_id"), "left")
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)))
        .as("recall"))

  private val bruteSql = s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS va, c.v AS vb
      FROM e q JOIN e c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    sc AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM p),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val qBrute = GraftQuery(
    "qs_topk_bruteforce",
    (s, dir) => cosineTopK(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K),
    Some(bruteSql))

  private val planeWSql =
    s"list_transform(generate_series(0, ${Planes - 1}), p -> list_transform(generate_series(0, 63), i -> " +
      s"CAST(${h60Sql("'plane' || p || '_' || i")} % 2001 - 1000 AS DOUBLE) / 1000.0))"
  private val bucketSql =
    s"CAST(list_sum(list_transform(generate_series(1, $Planes), p -> CASE WHEN " +
      s"list_reduce(list_transform(generate_series(1, 64), i -> w[p][i] * v[i]), (a, b) -> a + b) >= 0 " +
      s"THEN (1 << (p - 1)) ELSE 0 END)) AS INTEGER)"

  private val lshSql = s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pw AS (SELECT $planeWSql AS w),
    e AS (SELECT vec_id, v, $bucketSql AS bucket FROM e0, pw),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS va, c.v AS vb
      FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    sc AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM p),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val qAnnLsh = GraftQuery(
    "qs_ann_lsh",
    (s, dir) => annLsh(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K),
    Some(lshSql))

  /** Multi-probe LSH (Lv et al., VLDB 2007): each query probes its own
    * bucket PLUS every 1-bit-flip neighbor — the buckets a near neighbor
    * most likely fell into when one hyperplane split the pair. Recall
    * rises from one bucket's worth to P+1 buckets' worth WITHOUT adding
    * planes or a second table: probe fan-out is per-QUERY (the broadcast
    * side), so the corpus-side cost is unchanged — the standard way LSH
    * recall is tuned at corpus scale. A candidate has exactly one bucket,
    * so a (query, candidate) pair can match at most one probe — no
    * dedup needed.
    */
  def annLshMultiProbe(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      planes: Seq[Seq[Double]] = planeWeights,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val bucketCol = planes.zipWithIndex.map { case (w, p) =>
      when(graft_dot(typedLit(w), col("v")) >= 0.0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    val probes = col("bucket0") +:
      planes.indices.map(p => col("bucket0").bitwiseXOR(lit(1 << p)))
    val q = prep(queries, idCol, vecCol).withColumn("bucket0", bucketCol)
      .select(col("vec_id").as("query_id"), col("v").as("va"),
        col("nrm").as("na"), explode(array(probes: _*)).as("bucket"))
    val cands = prep(corpus, idCol, vecCol).withColumn("bucket", bucketCol)
      .select(col("vec_id").as("cand_id"), col("v").as("vb"),
        col("nrm").as("nb"), col("bucket"))
    val pairs = cands.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
    topK(withCosine(pairs), k)
  }

  private val lshMpSql = s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pw AS (SELECT $planeWSql AS w),
    e AS (SELECT vec_id, v, $bucketSql AS bucket FROM e0, pw),
    qp AS (SELECT vec_id, v, unnest([bucket] || list_transform(
        generate_series(1, $Planes), p -> CAST(xor(bucket, 1 << (p - 1)) AS INTEGER))) AS bucket
      FROM e WHERE vec_id < $NQ),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS va, c.v AS vb
      FROM qp q JOIN e c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
    sc AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM p),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val qAnnLshMp = GraftQuery(
    "qs_ann_lsh_mp",
    (s, dir) => annLshMultiProbe(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K),
    Some(lshMpSql))

  // ------------------------------------------------------------- IVF ANN
  /** Coarse-quantizer cell count and probe width. At corpus scale C grows
    * ~√n (classic IVF sizing) and cells come from k-means; here the
    * centroids are deterministic pseudo-random unit vectors (same
    * md5-derived construction as the LSH planes, L2-normalized on the
    * driver) so both engines and every executor share them as literals.
    */
  private val Cents = 8

  /** `c` deterministic md5-seeded unit vectors — the k-means/IVF seed
    * codebook at any cell count (Lloyd training then fits them to data).
    * `prefix` salts the hash stream so independent constructions (IVF
    * seeds vs random-projection planes) decorrelate.
    */
  private[analytics] def seedCentroids(c: Int, dim: Int = 64,
      prefix: String = "cent"): Seq[Seq[Double]] =
    (0 until c).map { k =>
      val raw = (0 until dim).map(i =>
        (h60Local(s"$prefix${k}_$i") % 2001 - 1000).toDouble / 1000.0)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }

  private[analytics] def centroids: Seq[Seq[Double]] = seedCentroids(Cents)

  /** IVF (inverted-file) ANN: map-only cell assignment (argmax of native
    * dot against the C centroid literals), queries probe their 2 best
    * cells, exact cosine rerank inside the probed cells. The cell join
    * replaces the O(n·q) scan; per-cell candidate lists are the "inverted
    * file". The same approximation is mirrored in the oracle, so the gate
    * is exact.
    */
  private val ivfSql = s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cw AS (SELECT ${centroids.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")} AS w),
    scs AS (SELECT vec_id, v,
      list_transform(generate_series(1, $Cents), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS sc
      FROM e0, cw),
    e AS (SELECT vec_id, v, sc, list_position(sc, list_max(sc)) AS cell FROM scs),
    q AS (SELECT vec_id, v, cell AS p1,
        list_position(sc, list_max(list_filter(sc, x -> x <> list_max(sc)))) AS p2
      FROM e WHERE vec_id < $NQ),
    qp AS (SELECT vec_id, v, unnest([p1, p2]) AS cell FROM q),
    p AS (SELECT q2.vec_id AS query_id, c.vec_id AS cand_id, q2.v AS va, c.v AS vb
      FROM qp q2 JOIN e c ON q2.cell = c.cell AND q2.vec_id <> c.vec_id),
    sc2 AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM p),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc2)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val qAnnIvf = GraftQuery(
    "qs_ann_ivf",
    (s, dir) => annIvf(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K),
    Some(ivfSql))

  /** Labels the filtered search admits as candidates. */
  private val FilterLabels = Seq(1, 3, 5)

  private val ivfFilteredSql = s"""WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    cw AS (SELECT ${centroids.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")} AS w),
    scs AS (SELECT vec_id, label, v,
      list_transform(generate_series(1, $Cents), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS sc
      FROM e0, cw),
    e AS (SELECT vec_id, label, v, sc, list_position(sc, list_max(sc)) AS cell FROM scs),
    ef AS (SELECT vec_id, v, cell FROM e WHERE label IN (${FilterLabels.mkString(", ")})),
    q AS (SELECT vec_id, v, cell AS p1,
        list_position(sc, list_max(list_filter(sc, x -> x <> list_max(sc)))) AS p2
      FROM e WHERE vec_id < $NQ),
    qp AS (SELECT vec_id, v, unnest([p1, p2]) AS cell FROM q),
    p AS (SELECT q2.vec_id AS query_id, c.vec_id AS cand_id, q2.v AS va, c.v AS vb
      FROM qp q2 JOIN ef c ON q2.cell = c.cell AND q2.vec_id <> c.vec_id),
    sc2 AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM p),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc2)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val qAnnFiltered = GraftQuery(
    "qs_ann_filtered",
    (s, dir) => annIvfFiltered(Tables.embeddings(s, dir),
      col("label").isin(FilterLabels: _*),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K),
    Some(ivfFilteredSql))

  // --------------------------------------------------- trained IVF ANN
  /** Lloyd-train the IVF coarse quantizer: `iters` rounds of
    * [[kmeansStep]] starting from `init`, each round collecting the C·dim
    * new centroid means to the driver (the sanctioned tiny driver
    * traffic — C·dim doubles per round, the corpus itself is scanned
    * once per round and never collected) and re-broadcasting them as
    * literals for the next assignment. A cell that attracted no vectors
    * keeps its previous centroid (standard empty-cluster fallback).
    * Every mean is the exact quantized-BIGINT average of
    * [[labelCentroids]], so the trained centroids are bit-identical
    * across engines and the whole training loop stays oracle-checkable.
    */
  def trainCentroids(vecs: org.apache.spark.sql.DataFrame,
      init: Seq[Seq[Double]] = centroids, iters: Int = IvfIters,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var cs = init
    for (_ <- 1 to iters) {
      val rows = kmeansStep(vecs, cs, idCol, vecCol)
        .select(col("cell"), col("dim"), col("mean_val")).collect()
      val byCell = rows.groupBy(_.getLong(0))
      cs = cs.indices.map { c =>
        byCell.get((c + 1).toLong)
          .map(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq: Seq[Double])
          .getOrElse(cs(c))
      }
    }
    cs
  }

  /** Deterministic content-hash training sample: rows whose
    * h60(id) mod `den` < `num` — the 100 TB discipline for Lloyd
    * training. [[trainCentroids]] scans its input once per round and
    * fetches C·dim doubles; at C = ⌈√n⌉ both costs grow with the corpus,
    * so a real run trains the quantizer on a fixed-rate hash sample
    * (deterministic → both engines and every partitioning see the same
    * sample; no sampling seed to disagree on) while C is still sized
    * from the FULL pre-counted n. Contract: choose num/den so the sample
    * comfortably exceeds C (at scale sample ≈ n·num/den ≫ √n); a sample
    * smaller than C simply yields fewer seeds (both engines LIMIT the
    * same way). OpsApiSpec pins rate-1 ≡ full-corpus training and the
    * sample-rule mirror.
    */
  def trainSample(vecs: org.apache.spark.sql.DataFrame, num: Int, den: Int,
      idCol: String = "vec_id"): org.apache.spark.sql.DataFrame = {
    require(den >= 1 && num >= 1 && num <= den,
      s"sample rate must satisfy 1 <= num <= den, got $num/$den")
    vecs.filter(expr(s"${h60(s"cast($idCol as string)")} % $den < $num"))
  }

  /** Training-sample rate for the dynamic-C bindings (qd_semdedup,
    * qs_knn_graph): half the corpus — large enough that the trained
    * quantizer is indistinguishable in quality, and it exercises the
    * sampled path in the oracle gate.
    */
  private val TrainSampleNum = 1
  private val TrainSampleDen = 2

  /** First-C-by-id data seeds — the standard "init from data points"
    * k-means seeding, sized by [[semDedupCellCount]] (C ≈ √n). One
    * C·dim-doubles driver fetch (the same sanctioned traffic class as
    * [[trainCentroids]]' per-round means); the oracle mirrors it as
    * `ORDER BY vec_id LIMIT C`. At 100 TB pass a pre-counted n to the
    * sizing rule rather than re-scanning for COUNT(*).
    */
  def dataSeeds(vecs: org.apache.spark.sql.DataFrame, c: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] = {
    require(c >= 1, s"seed count must be >= 1, got $c")
    vecs.orderBy(col(idCol)).limit(c)
      .select(expr(s"cast($vecCol as array<double>)"))
      .collect().map(_.getSeq[Double](0).toIndexedSeq: Seq[Double]).toIndexedSeq
  }

  /** [[annIvf]] against a data-trained codebook: the composition real IVF
    * indexes use (train the coarse quantizer with k-means, then assign +
    * probe). Identical query plan to [[annIvf]] once trained — the
    * training rounds are upstream kmeansStep scans.
    */
  def annIvfTrained(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      init: Seq[Seq[Double]] = centroids, iters: Int = IvfIters,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame =
    annIvf(corpus, queries, k,
      trainCentroids(corpus, init, iters, idCol, vecCol), idCol, vecCol)

  private val IvfIters = 2

  /** CTE chain mirroring [[trainCentroids]]: cw0 = the seed literals,
    * cw<t> = the exact quantized means of the assignment against
    * cw<t-1>, with the empty-cluster coalesce fallback. Requires an `e0`
    * CTE (vec_id, v) in scope.
    */
  private def lloydSql(iters: Int): String = lloydChain(iters,
    s"cw0 AS (SELECT ${centroids.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")} AS w)")

  /** Dynamic-C Lloyd chain, SAMPLED: C = ⌈√n⌉ is derived from the FULL
    * corpus inside the SQL ([[semDedupCellCount]]'s rule — the analogue
    * of a pre-counted n at scale), while the per-round training scans and
    * the data seeds touch only the deterministic hash sample `e0s`
    * (h60(vec_id) mod [[TrainSampleDen]] < [[TrainSampleNum]]) — so the
    * oracle itself enforces both the sub-quadratic quantizer sizing AND
    * the bounded-training-cost discipline rather than trusting literals.
    * Mirrored by [[trainSample]] + [[dataSeeds]] + [[trainCentroids]] on
    * the Spark side.
    */
  private def lloydSqlDyn(iters: Int): String = lloydChain(iters,
    s"""nc AS (SELECT CAST(ceil(sqrt(COUNT(*))) AS BIGINT) AS c FROM e0),
    e0s AS (SELECT vec_id, v FROM e0
      WHERE ${h60Sql("CAST(vec_id AS VARCHAR)")} % $TrainSampleDen < $TrainSampleNum),
    cw0 AS (SELECT list(v ORDER BY vec_id) AS w FROM
      (SELECT vec_id, v FROM e0s ORDER BY vec_id LIMIT (SELECT c FROM nc)))""",
    rel = "e0s")

  /** Shared Lloyd body: every cell-count reference is `len(w)` (never a
    * literal), so the same chain serves the fixed-seed and dynamic-C
    * oracles; `rel` is the training relation (the full `e0` or the hash
    * sample `e0s`). `cells` is the scalar-unnest form because DuckDB's
    * table-function `generate_series` cannot take a lateral column bound.
    */
  private def lloydChain(iters: Int, init: String, rel: String = "e0"): String = {
    val cells = "cells AS (SELECT unnest(generate_series(1, len(w))) AS c FROM cw0)"
    val steps = (1 to iters).map { t =>
      val prev = s"cw${t - 1}"
      s"""ts$t AS (SELECT vec_id, v,
      list_transform(generate_series(1, len(w)), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS sc
      FROM $rel, $prev),
    ta$t AS (SELECT list_position(sc, list_max(sc)) AS cell, v FROM ts$t),
    tu$t AS (SELECT cell, unnest(generate_series(1, len(v))) AS i, v FROM ta$t),
    tq$t AS (SELECT cell, i AS dim1, CAST(round(v[i] * ${Quant}.0) AS BIGINT) AS q FROM tu$t),
    tg$t AS (SELECT cell, dim1,
      CAST(SUM(q) AS DOUBLE) / (COUNT(*) * $Quant) AS mean_val FROM tq$t GROUP BY cell, dim1),
    tm$t AS (SELECT cell, list(mean_val ORDER BY dim1) AS m FROM tg$t GROUP BY cell),
    cw$t AS (SELECT list(coalesce(m.m, w0.w[g.c]) ORDER BY g.c) AS w
      FROM $prev w0, cells g LEFT JOIN tm$t m ON m.cell = g.c)"""
    }
    (Seq(init, cells) ++ steps).mkString(",\n    ")
  }

  /** The assign/probe/rerank tail of [[ivfSql]], parameterized on the
    * centroid CTE name; requires `e0` in scope.
    */
  private def ivfTailSql(cwName: String): String = s"""scs AS (SELECT vec_id, v,
      list_transform(generate_series(1, $Cents), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS sc
      FROM e0, $cwName),
    e AS (SELECT vec_id, v, sc, list_position(sc, list_max(sc)) AS cell FROM scs),
    q AS (SELECT vec_id, v, cell AS p1,
        list_position(sc, list_max(list_filter(sc, x -> x <> list_max(sc)))) AS p2
      FROM e WHERE vec_id < $NQ),
    qp AS (SELECT vec_id, v, unnest([p1, p2]) AS cell FROM q),
    p AS (SELECT q2.vec_id AS query_id, c.vec_id AS cand_id, q2.v AS va, c.v AS vb
      FROM qp q2 JOIN e c ON q2.cell = c.cell AND q2.vec_id <> c.vec_id),
    sc2 AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM p),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc2)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val ivfTrainedSql =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ${lloydSql(IvfIters)},
    ${ivfTailSql(s"cw$IvfIters")}"""

  /** [[ivfTailSql]] at a general probe width: probe every cell scoring ≥
    * the nprobe-th best (the tie-inclusive threshold rule annIvf uses for
    * nprobe > 2).
    */
  private def ivfTailSqlNp(cwName: String, nprobe: Int): String = s"""scs AS (SELECT vec_id, v,
      list_transform(generate_series(1, $Cents), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS sc
      FROM e0, $cwName),
    e AS (SELECT vec_id, v, sc, list_position(sc, list_max(sc)) AS cell FROM scs),
    q AS (SELECT vec_id, v, sc,
        list_reverse_sort(sc)[least($nprobe, len(sc))] AS thr
      FROM e WHERE vec_id < $NQ),
    qp AS (SELECT vec_id, v,
        unnest(list_filter(generate_series(1, len(sc)), i -> sc[i] >= thr)) AS cell
      FROM q),
    p AS (SELECT q2.vec_id AS query_id, c.vec_id AS cand_id, q2.v AS va, c.v AS vb
      FROM qp q2 JOIN e c ON q2.cell = c.cell AND q2.vec_id <> c.vec_id),
    sc2 AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM p),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc2)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val ivfTrained4Sql =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ${lloydSql(IvfIters)},
    ${ivfTailSqlNp(s"cw$IvfIters", 4)}"""

  private val qAnnIvfTrained = GraftQuery(
    "qs_ann_ivf_trained",
    (s, dir) => annIvfTrained(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K),
    Some(ivfTrainedSql))

  // ------------------------------------------- binary (1-bit) quantization
  /** Binary-quantized search — the 1-bit end of the compression ladder
    * (float32 → int8 SQ → PQ codes → SIGN BITS): each 64-dim vector
    * packs to ONE BIGINT of sign bits (64× smaller than int8 SQ, 256×
    * smaller than float), candidates rank by Hamming distance (one XOR +
    * popcount per pair — the modern "binary embeddings" serving trick),
    * and the Hamming top-`rerank` candidates get the exact cosine
    * rerank (two-phase, exactly the IVF-PQ pattern). Map-only packing,
    * broadcast query side, 8 bytes/vector through the scan.
    * Output: (query_id, rank, cand_id, cosine) — exact cosines on the
    * reranked survivors.
    */
  def binaryTopK(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5, rerank: Int = 20,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    require(rerank >= k, s"rerank budget must be >= k, got $rerank < $k")
    val packExpr = expr(
      """aggregate(sequence(1, size(v)), 0L,
         (acc, i) -> acc + IF(element_at(v, i) > cast(0 as double),
           shiftleft(1L, i - 1), 0L))""")
    def prepB(df: org.apache.spark.sql.DataFrame) =
      prep(df, idCol, vecCol).withColumn("b", packExpr)
    val q = prepB(queries)
      .select(col("vec_id").as("query_id"), col("v").as("va"),
        col("nrm").as("na"), col("b").as("qb"))
    val cands = prepB(corpus)
      .select(col("vec_id").as("cand_id"), col("v").as("vb"),
        col("nrm").as("nb"), col("b").as("cb"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("hamming", expr("cast(bit_count(qb ^ cb) as int)"))
    val wH = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("cand_id"))
    topK(withCosine(
      cands.withColumn("hr", row_number().over(wH)).filter(col("hr") <= rerank)), k)
  }

  private val BqRerank = 20

  // bit 63 via the explicit two's-complement literal: DuckDB range-checks
  // 1 << 63 (Spark's shiftleft silently wraps to Long.MinValue — the same
  // value this spells out)
  private val binaryPackSql =
    """CAST(list_sum(list_transform(generate_series(1, len(v)),
       i -> CASE WHEN v[i] <= 0 THEN CAST(0 AS BIGINT)
                 WHEN i = 64 THEN CAST(-9223372036854775807 - 1 AS BIGINT)
                 ELSE (CAST(1 AS BIGINT) << (i - 1)) END)) AS BIGINT)"""

  private val binarySql = s"""WITH e AS (SELECT vec_id, v,
      $binaryPackSql AS b FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS va, c.v AS vb,
        CAST(bit_count(xor(q.b, c.b)) AS INT) AS hamming
      FROM e q JOIN e c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    hr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY hamming, cand_id) AS hrk FROM p),
    sc AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM hr WHERE hrk <= $BqRerank),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val qBinary = GraftQuery(
    "qs_binary_topk",
    (s, dir) => binaryTopK(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K, BqRerank),
    Some(binarySql))

  // ------------------------------------------- IVF probe curve
  /** Recall-vs-nprobe curve over the TRAINED quantizer — the tuning
    * instrument that turns "pick nprobe" from folklore into a table:
    * each row is the recall of [[annIvfTrained]] at one probe width
    * against the exact top-k. The exact baseline is checkpointed once,
    * training runs once (memoized — shared with qs_ann_recall's trained
    * legs), and each curve point is one corpus scan + cell join. The
    * cost model is linear in Σnprobe; the curve's knee is where to stop
    * paying.
    * Output: (nprobe, recall) for nprobe ∈ {1, 2, 4, 8}.
    */
  private def trainedCents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Memo.value(s, s"ivfTrainedCents:$dir")(
      trainCentroids(Tables.embeddings(s, dir)))

  private val ProbeWidths = Seq(1, 2, 4, 8)

  private def probeBranchSql(np: Int, approxSql: String) =
    s"""SELECT $np AS nprobe,
      CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*) AS recall
      FROM ($bruteSql) e LEFT JOIN ($approxSql) a
      ON e.query_id = a.query_id AND e.cand_id = a.cand_id"""

  private def ivfTrainedNpSql(np: Int) =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ${lloydSql(IvfIters)},
    ${ivfTailSqlNp(s"cw$IvfIters", np)}"""

  private val qProbeCurve = GraftQuery(
    "qs_ivf_probe_curve",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val q = corpus.filter(col("vec_id") < NQ)
      val exact = cosineTopK(corpus, q, K).localCheckpoint()
      val trained = trainedCents(s, dir)
      ProbeWidths.map { np =>
        annRecall(exact, annIvf(corpus, q, K, trained, nprobe = np))
          .withColumn("nprobe", lit(np))
      }.reduce(_ unionByName _)
        .select(col("nprobe"), col("recall"))
        .orderBy(col("nprobe"))
    },
    // nprobe = 2 takes the best+second-best formulation exactly like the
    // Spark branch; the other widths take the threshold formulation
    Some(Seq(
      probeBranchSql(1, ivfTrainedNpSql(1)),
      probeBranchSql(2, ivfTrainedSql),
      probeBranchSql(4, ivfTrainedNpSql(4)),
      probeBranchSql(8, ivfTrainedNpSql(8)))
      .mkString("", "\nUNION ALL ", "\nORDER BY nprobe")))

  // ------------------------------------------- product quantization (ADC)
  /** PQ geometry: 64 dims split into `SubM`=4 subspaces of `SubDim`=16,
    * `PqK`=8 codewords per subspace → each corpus vector compresses to 4
    * small ints (codebook addresses), a 128× cut of what the scoring join
    * has to carry vs the raw 64 doubles.
    */
  private val SubM = 4
  private val SubDim = 16
  private val PqK = 8

  /** md5-seeded PQ codebooks w(m)(c) ∈ [-1,1]^SubDim — deterministic
    * literals both engines share, same construction as [[centroids]].
    * [[pqTrainCodebooks]] refines them per subspace with the exact
    * quantized Lloyd loop when a data-fit codebook is wanted.
    */
  private[analytics] def pqCodebooks: Seq[Seq[Seq[Double]]] =
    (0 until SubM).map(m => (0 until PqK).map(c =>
      (0 until SubDim).map(i =>
        (h60Local(s"pq${m}_${c}_$i") % 2001 - 1000).toDouble / 1000.0)))

  /** Product-quantization top-k with asymmetric distance computation
    * (the public PQ/ADC method of Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011 — the FAISS
    * `IndexPQ` recipe):
    *
    *  1. ENCODE (map-only, corpus scanned once): each subvector slice is
    *     assigned its nearest codeword by inner product; a vector becomes
    *     `SubM` small-int codes. At 100 TB this is the point — the
    *     scoring join ships (id, 4 ints) per corpus row, never the
    *     embedding, so the dominant cost (corpus bytes through the
    *     broadcast-join scan) drops ~128×, the same economics that let
    *     FAISS hold billion-vector indexes in RAM.
    *  2. LUT (map-only on the tiny query side): the query's `PqK`
    *     sub-scores per subspace ARE the ADC lookup table — dot(q_sub,
    *     codeword) for every codeword.
    *  3. SCORE: adc(q, x) = Σ_m lut[m][code_m(x)] — `SubM` array lookups
    *     + adds per pair instead of a 64-mult dot product. Top-k by the
    *     same rank-window shape as every other tier.
    *
    * Composes with [[annIvf]] exactly like FAISS IVF-PQ: the cell join
    * prunes candidates, the PQ codes score them. Deterministic end to
    * end (literal codebooks, fixed fold order, first-max tie-break), so
    * the whole approximation is oracle-checked, and [[annRecall]] reports
    * its recall against the exact top-k next to the LSH/IVF tiers.
    * Output: (query_id, rank, cand_id, adc).
    */
  def pqTopK(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      books: Seq[Seq[Seq[Double]]] = pqCodebooks,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    require(books.nonEmpty && books.forall(_.nonEmpty), "empty PQ codebook")
    val subDim = books.head.head.size
    // uniform geometry is load-bearing: subspace m's slice offset is
    // m·subDim, which mis-slices silently for ragged codebooks
    require(books.forall(_.forall(_.size == subDim)),
      s"PQ codebooks must share one subspace width (head = $subDim)")
    def base(df: org.apache.spark.sql.DataFrame) =
      df.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
    def subScores(m: Int) = array(books(m).map(cw =>
      graft_dot(typedLit(cw), expr(s"slice(v, ${m * subDim + 1}, $subDim)"))): _*)
    val enc = books.indices.foldLeft(base(corpus)) { (df, m) =>
      df.withColumn(s"sc_$m", subScores(m))
        .withColumn(s"code_$m",
          expr(s"cast(array_position(sc_$m, array_max(sc_$m)) as int)"))
    }.select(col("vec_id").as("cand_id") +:
      books.indices.map(m => col(s"code_$m")): _*)
    val q = books.indices.foldLeft(base(queries)) { (df, m) =>
      df.withColumn(s"lut_$m", subScores(m))
    }.select(col("vec_id").as("query_id") +:
      books.indices.map(m => col(s"lut_$m")): _*)
    val adc = books.indices.map(m =>
      element_at(col(s"lut_$m"), col(s"code_$m"))).reduce(_ + _)
    val pairs = enc.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("adc", adc)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("cand_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("adc"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-subspace Lloyd training for the PQ codebooks: [[trainCentroids]]
    * (the exact quantized-BIGINT k-means loop) run independently on each
    * `SubDim`-dim subvector slice — the standard PQ training procedure.
    * Corpus is scanned once per (subspace, iteration); driver traffic is
    * PqK·SubDim doubles per round.
    */
  def pqTrainCodebooks(corpus: org.apache.spark.sql.DataFrame,
      init: Seq[Seq[Seq[Double]]] = pqCodebooks, iters: Int = IvfIters,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Seq[Double]]] = {
    require(init.nonEmpty && init.forall(_.nonEmpty), "empty PQ codebook")
    val subDim = init.head.head.size
    // same uniform-geometry pin as [[pqTopK]]: both compute subspace m's
    // slice offset as m·subDim, so trained books stay aligned with scoring
    require(init.forall(_.forall(_.size == subDim)),
      s"PQ codebooks must share one subspace width (head = $subDim)")
    init.indices.map { m =>
      val sub = corpus.select(col(idCol).as("vec_id"),
        expr(s"slice(cast($vecCol as array<double>), ${m * subDim + 1}, $subDim)").as("v"))
      trainCentroids(sub, init(m), iters, "vec_id", "v")
    }
  }

  private val pqBooksSql = pqCodebooks.map(_.map(_.mkString("[", ", ", "]"))
    .mkString("[", ", ", "]")).mkString("[", ", ", "]")

  private val pqSql = s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bw AS (SELECT $pqBooksSql AS w),
    scs AS (SELECT vec_id, list_transform(generate_series(1, $SubM), m ->
        list_transform(generate_series(1, $PqK), c ->
          list_reduce(list_transform(generate_series(1, $SubDim),
            i -> w[m][c][i] * v[(m - 1) * $SubDim + i]), (a, b) -> a + b))) AS sc
      FROM e0, bw),
    enc AS (SELECT vec_id,
      list_transform(sc, s -> list_position(s, list_max(s))) AS code FROM scs),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.sc AS lut, c.code AS code
      FROM scs q JOIN enc c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    a AS (SELECT query_id, cand_id,
      ${(1 to SubM).map(m => s"lut[$m][code[$m]]").mkString(" + ")} AS adc FROM p),
    rk AS (SELECT query_id, cand_id, adc,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, cand_id) AS rank
      FROM a)
    SELECT query_id, rank, cand_id, adc FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val qPq = GraftQuery(
    "qs_pq_topk",
    (s, dir) => pqTopK(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K),
    Some(pqSql))

  // -------------------------------------------------------------- IVF-PQ
  /** ADC rerank depth: the exact pass re-scores this many ADC-ranked
    * candidates per query before the final top-k. At the test corpus size
    * 4·K is plenty; at scale it's the standard recall/cost dial (FAISS's
    * `k_factor`).
    */
  private val IvfPqRerank = 20

  /** The full FAISS `IndexIVFPQ` composition (Jégou et al. 2011, §V —
    * public method), in the no-residual encoding variant (FAISS
    * `by_residual=false`): three stages, each one already proven alone:
    *
    *  1. PRUNE — trained-IVF cell assignment ([[annIvf]] against
    *     [[trainCentroids]] output): queries probe their 2 best cells, so
    *     the candidate join touches ~2/C of the corpus instead of all of
    *     it.
    *  2. SCORE — PQ/ADC inside the probed cells ([[pqTopK]]'s economics):
    *     the candidate join carries (id, cell, `SubM` small-int codes) per
    *     corpus row — never the vectors — and scoring is `SubM` LUT
    *     lookups + adds per pair. This is what makes the probe affordable
    *     when cells hold millions of vectors.
    *  3. RERANK — the ADC top-`rerank` per query (row_number window over
    *     a |Q|·rerank-sized frame) is re-scored EXACTLY: the survivor id
    *     list is broadcast against one more corpus scan to fetch true
    *     vectors (at scale: a broadcast semi-join id-fetch, the standard
    *     two-phase lookup), exact cosine, final top-k. Fixes ADC ranking
    *     errors among the survivors, so recall ≥ the pure-PQ tier's at
    *     the same candidate budget.
    *
    * Corpus cost: two map-only scans (encode+assign, rerank fetch) and one
    * broadcast join each — no corpus shuffle anywhere. Deterministic end
    * to end (literal/trained-literal codebooks, fixed fold order,
    * first-max + cand_id tie-breaks), so the whole index is
    * oracle-checked and [[annRecall]] reports its recall row.
    * Output: (query_id, rank, cand_id, cosine).
    */
  def ivfPqTopK(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      rerank: Int = IvfPqRerank,
      cents: Seq[Seq[Double]] = centroids,
      books: Seq[Seq[Seq[Double]]] = pqCodebooks,
      residual: Boolean = false,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    require(rerank >= k, s"rerank depth $rerank must be >= k = $k")
    require(books.nonEmpty && books.forall(_.nonEmpty), "empty PQ codebook")
    val subDim = books.head.head.size
    require(books.forall(_.forall(_.size == subDim)),
      s"PQ codebooks must share one subspace width (head = $subDim)")
    // Fused native kernel: ONE matrix literal + one expression, O(1) plan
    // size in C — C separate graft_dot(lit, v) columns blow the codegen
    // method budget once C reaches sqrt(n) scale (see DotScores scaladoc).
    val scoreArr = graft_dot_scores(typedLit(cents), col("v"))
    def withCell(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("sc", scoreArr)
        .withColumn("cell", expr("array_position(sc, array_max(sc))"))
    // residual=true is FAISS's default IVFPQ encoding: PQ quantizes
    // (v − centroid[cell]) instead of v, at identical join/shuffle shape
    // (the subtraction is one extra map-only zip_with per side). On
    // CLUSTERED corpora residuals are much smaller than raw vectors, so
    // the same codebook budget spends on a tighter cloud and recall
    // rises; on the near-uniform synthetic test corpus residuals don't
    // shrink and the two variants measure the same (recall rows ivfpq
    // 0.21 vs ivfpq_res 0.20 at sf0.01) — the variant is here for
    // real-data fidelity, not for the gate corpus.
    def withEv(df: org.apache.spark.sql.DataFrame) =
      if (residual)
        df.withColumn("ev", zip_with(col("v"),
          element_at(typedLit(cents), col("cell").cast("int")), (x, y) => x - y))
      else df.withColumn("ev", col("v"))
    def subScores(m: Int) = array(books(m).map(cw =>
      graft_dot(typedLit(cw), expr(s"slice(ev, ${m * subDim + 1}, $subDim)"))): _*)
    val base = prep(corpus, idCol, vecCol)
    // corpus side of the ADC join: (cand_id, cell, codes) — map-only
    val enc = books.indices.foldLeft(withEv(withCell(base))) { (df, m) =>
      df.withColumn(s"sq_$m", subScores(m))
        .withColumn(s"code_$m",
          expr(s"cast(array_position(sq_$m, array_max(sq_$m)) as int)"))
    }.select(col("vec_id").as("cand_id") +: col("cell") +:
      books.indices.map(m => col(s"code_$m")): _*)
    // query side: 2 probed cells + the ADC LUTs (tiny → broadcast). LUTs
    // are computed per (query, probed cell) row: under residual encoding
    // the query's residual — hence its LUT — differs per probed cell.
    val q0 = withCell(prep(queries, idCol, vecCol))
      .withColumn("p2",
        expr("array_position(sc, array_max(filter(sc, x -> x != array_max(sc))))"))
      .select(col("vec_id").as("query_id"), col("v"),
        explode(array(col("cell"), col("p2"))).as("cell"))
    val q = books.indices.foldLeft(withEv(q0)) { (df, m) =>
      df.withColumn(s"lut_$m", subScores(m))
    }.select(col("query_id") +: col("cell") +:
      books.indices.map(m => col(s"lut_$m")): _*)
    val adc = books.indices.map(m =>
      element_at(col(s"lut_$m"), col(s"code_$m"))).reduce(_ + _)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("cand_id"))
    val cands = enc.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("adc", adc)
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("cand_id"))
    // exact rerank of the |Q|·rerank survivors
    val qv = prep(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("v").as("va"), col("nrm").as("na"))
    val pairs = base
      .select(col("vec_id").as("cand_id"), col("v").as("vb"), col("nrm").as("nb"))
      .join(broadcast(cands), "cand_id")
      .join(broadcast(qv), "query_id")
    topK(withCosine(pairs), k)
  }

  /** Oracle mirror of [[ivfPqTopK]] against the Lloyd-trained cells: the
    * ivfTrainedSql assignment CTEs + pqSql's encode/LUT CTEs + the ADC
    * window + the exact-rerank tail.
    */
  private val ivfpqSql =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ${lloydSql(IvfIters)},
    scs AS (SELECT vec_id, v,
      list_transform(generate_series(1, $Cents), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS sc
      FROM e0, cw$IvfIters),
    e AS (SELECT vec_id, v, sc, list_position(sc, list_max(sc)) AS cell FROM scs),
    q AS (SELECT vec_id, cell AS p1,
        list_position(sc, list_max(list_filter(sc, x -> x <> list_max(sc)))) AS p2
      FROM e WHERE vec_id < $NQ),
    qp AS (SELECT vec_id, unnest([p1, p2]) AS cell FROM q),
    bw AS (SELECT $pqBooksSql AS w),
    ps AS (SELECT vec_id, list_transform(generate_series(1, $SubM), m ->
        list_transform(generate_series(1, $PqK), c ->
          list_reduce(list_transform(generate_series(1, $SubDim),
            i -> w[m][c][i] * v[(m - 1) * $SubDim + i]), (a, b) -> a + b))) AS sc2
      FROM e0, bw),
    enc AS (SELECT vec_id,
      list_transform(sc2, s -> list_position(s, list_max(s))) AS code FROM ps),
    pr AS (SELECT qp.vec_id AS query_id, c.vec_id AS cand_id, l.sc2 AS lut, n.code AS code
      FROM qp JOIN e c ON qp.cell = c.cell AND qp.vec_id <> c.vec_id
      JOIN enc n ON n.vec_id = c.vec_id
      JOIN ps l ON l.vec_id = qp.vec_id),
    a AS (SELECT query_id, cand_id,
      ${(1 to SubM).map(m => s"lut[$m][code[$m]]").mkString(" + ")} AS adc FROM pr),
    ar AS (SELECT query_id, cand_id,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, cand_id) AS arank
      FROM a),
    cnd AS (SELECT query_id, cand_id FROM ar WHERE arank <= $IvfPqRerank),
    px AS (SELECT cnd.query_id, cnd.cand_id, qv.v AS va, cv.v AS vb
      FROM cnd JOIN e0 qv ON qv.vec_id = cnd.query_id
      JOIN e0 cv ON cv.vec_id = cnd.cand_id),
    sc3 AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM px),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc3)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val qIvfPq = GraftQuery(
    "qs_ivfpq_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      ivfPqTopK(emb, emb.filter(col("vec_id") < NQ), K,
        cents = trainCentroids(emb))
    },
    Some(ivfpqSql))

  /** Oracle mirror of [[ivfPqTopK]] with `residual = true`: identical CTE
    * chain except encode/LUT operate on rv = v − w[cell] (the per-row
    * residual against the trained centroid; the query side computes one
    * residual/LUT per probed cell).
    */
  private val ivfpqResSql =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ${lloydSql(IvfIters)},
    scs AS (SELECT vec_id, v,
      list_transform(generate_series(1, $Cents), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS sc
      FROM e0, cw$IvfIters),
    e AS (SELECT vec_id, v, sc, list_position(sc, list_max(sc)) AS cell FROM scs),
    q AS (SELECT vec_id, cell AS p1,
        list_position(sc, list_max(list_filter(sc, x -> x <> list_max(sc)))) AS p2
      FROM e WHERE vec_id < $NQ),
    qp AS (SELECT vec_id, unnest([p1, p2]) AS cell FROM q),
    bw AS (SELECT $pqBooksSql AS b),
    er AS (SELECT vec_id, cell,
      list_transform(generate_series(1, 64), i -> v[i] - w[cell][i]) AS rv
      FROM e, cw$IvfIters),
    enc AS (SELECT vec_id, list_transform(
        list_transform(generate_series(1, $SubM), m ->
          list_transform(generate_series(1, $PqK), c ->
            list_reduce(list_transform(generate_series(1, $SubDim),
              i -> b[m][c][i] * rv[(m - 1) * $SubDim + i]), (x, y) -> x + y))),
        s -> list_position(s, list_max(s))) AS code
      FROM er, bw),
    qr AS (SELECT qp.vec_id, qp.cell,
      list_transform(generate_series(1, 64), i -> e.v[i] - w.w[qp.cell][i]) AS rv
      FROM qp JOIN e ON e.vec_id = qp.vec_id, cw$IvfIters w),
    ql AS (SELECT vec_id, cell,
      list_transform(generate_series(1, $SubM), m ->
        list_transform(generate_series(1, $PqK), c ->
          list_reduce(list_transform(generate_series(1, $SubDim),
            i -> b[m][c][i] * rv[(m - 1) * $SubDim + i]), (x, y) -> x + y))) AS lut
      FROM qr, bw),
    pr AS (SELECT ql.vec_id AS query_id, c.vec_id AS cand_id, ql.lut AS lut, n.code AS code
      FROM ql JOIN e c ON ql.cell = c.cell AND ql.vec_id <> c.vec_id
      JOIN enc n ON n.vec_id = c.vec_id),
    a AS (SELECT query_id, cand_id,
      ${(1 to SubM).map(m => s"lut[$m][code[$m]]").mkString(" + ")} AS adc FROM pr),
    ar AS (SELECT query_id, cand_id,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, cand_id) AS arank
      FROM a),
    cnd AS (SELECT query_id, cand_id FROM ar WHERE arank <= $IvfPqRerank),
    px AS (SELECT cnd.query_id, cnd.cand_id, qv.v AS va, cv.v AS vb
      FROM cnd JOIN e0 qv ON qv.vec_id = cnd.query_id
      JOIN e0 cv ON cv.vec_id = cnd.cand_id),
    sc3 AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM px),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc3)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val qIvfPqRes = GraftQuery(
    "qs_ivfpq_residual",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      ivfPqTopK(emb, emb.filter(col("vec_id") < NQ), K,
        cents = trainCentroids(emb), residual = true)
    },
    Some(ivfpqResSql))

  // --------------------------------------- random projection (JL) search
  /** Compressed-space search dimensionality and the exact-rerank width. */
  private[analytics] val RpDim = 16
  private val RpRerank = 20

  /** The Johnson–Lindenstrauss projection matrix: RpDim deterministic
    * md5-seeded unit planes (salt "rp" decorrelates them from the IVF
    * seed codebook and the LSH sign planes).
    */
  private[analytics] def rpPlanes: Seq[Seq[Double]] = seedCentroids(RpDim, 64, "rp")

  /** Random-projection (JL) compressed top-k: project every vector onto
    * the RpDim plane matrix (ONE fused [[graft.functions.DotScores]]
    * against a single matrix literal — map-only), rank candidates by
    * cosine in the compressed space, then exact-rerank the top `rerank`
    * survivors in full dimension — the same two-phase shape as PQ-ADC.
    *
    * What JL buys at scale: the compare phase still touches every
    * (query, candidate) pair, but on 16-dim vectors instead of 64 — a 4×
    * cut of the dominant cost (scan + compare bandwidth), and the
    * projected column is what ships through the broadcast. Use it when
    * the corpus side can't be cell-bucketed (e.g. a one-off scan);
    * compose with [[annIvf]] cells when it can.
    *
    * Output: (query_id, rank, cand_id, cosine) — cosine is the FULL-dim
    * exact value of the reranked survivors.
    */
  def rpTopK(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      planes: Seq[Seq[Double]] = rpPlanes, rerank: Int = RpRerank,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    require(rerank >= k, s"rerank width $rerank must be >= k = $k")
    require(planes.nonEmpty, "need at least one projection plane")
    val pl = typedLit(planes)
    def proj(df: org.apache.spark.sql.DataFrame) = prep(df, idCol, vecCol)
      .withColumn("p", graft_dot_scores(pl, col("v")))
      .withColumn("np", sqrt(graft_dot(col("p"), col("p"))))
    val cands = proj(corpus).select(col("vec_id").as("cand_id"),
      col("p").as("pb"), col("np").as("npb"))
    val qs = proj(queries).select(col("vec_id").as("query_id"),
      col("p").as("pa"), col("np").as("npa"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("cand_id"))
    val survivors = cands.crossJoin(broadcast(qs))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("pcos",
        graft_dot(col("pa"), col("pb")) / (col("npa") * col("npb")))
      .withColumn("prank", row_number().over(w))
      .filter(col("prank") <= rerank)
      .select(col("query_id"), col("cand_id"))
    val fullC = prep(corpus, idCol, vecCol).select(col("vec_id").as("cand_id"),
      col("v").as("vb"), col("nrm").as("nb"))
    val fullQ = prep(queries, idCol, vecCol).select(col("vec_id").as("query_id"),
      col("v").as("va"), col("nrm").as("na"))
    topK(withCosine(broadcast(survivors).join(fullC, Seq("cand_id"))
      .join(broadcast(fullQ), Seq("query_id"))), k)
  }

  private val rpSql = s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pl AS (SELECT ${rpPlanes.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")} AS w),
    pj AS (SELECT vec_id, v,
      list_transform(generate_series(1, $RpDim), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS p
      FROM e0, pl),
    q AS (SELECT vec_id AS query_id, p AS pa FROM pj WHERE vec_id < $NQ),
    c AS (SELECT vec_id AS cand_id, p AS pb FROM pj),
    pr AS (SELECT query_id, cand_id,
      list_reduce(list_transform(generate_series(1, $RpDim), i -> pa[i] * pb[i]), (a, b) -> a + b)
        / (sqrt(${normFoldSql("pa")}) * sqrt(${normFoldSql("pb")})) AS pcos
      FROM q, c WHERE query_id <> cand_id),
    rk1 AS (SELECT query_id, cand_id,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY pcos DESC, cand_id) AS prank FROM pr),
    sv AS (SELECT query_id, cand_id FROM rk1 WHERE prank <= $RpRerank),
    px AS (SELECT sv.query_id, sv.cand_id, qv.v AS va, cv.v AS vb
      FROM sv JOIN e0 qv ON qv.vec_id = sv.query_id
      JOIN e0 cv ON cv.vec_id = sv.cand_id),
    sc3 AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM px),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc3)
    SELECT query_id, rank, cand_id, cosine FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val qRp = GraftQuery(
    "qs_rp_topk",
    (s, dir) => rpTopK(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K),
    Some(rpSql))

  /** recall@k of each approximate tier vs the exact top-k, as a
    * deterministic oracled query: both approximations are seeded by
    * literals, so recall is a fixed number both engines compute.
    */
  /** (id, cell) coarse-quantizer assignment for every row — the shared
    * primitive behind [[annIvf]]'s inverted lists and
    * [[LayoutOps]]'s disk-backed IVF partitioning.
    */
  private[analytics] def corpusCells(df: org.apache.spark.sql.DataFrame,
      cents: Seq[Seq[Double]] = centroids, idCol: String = "vec_id",
      vecCol: String = "embedding"): org.apache.spark.sql.DataFrame =
    prep(df, idCol, vecCol)
      .withColumn("sc", graft_dot_scores(typedLit(cents), col("v")))
      .withColumn("cell", expr("array_position(sc, array_max(sc))"))
      .select(col("vec_id"), col("cell"))

  /** (query id, probed cell) pairs — each query's best + second-best
    * cell, the probe set [[annIvf]] reranks inside (distinct guards the
    * tie case where both argmaxes land on one cell).
    */
  private[analytics] def queryProbes(df: org.apache.spark.sql.DataFrame,
      cents: Seq[Seq[Double]] = centroids, idCol: String = "vec_id",
      vecCol: String = "embedding"): org.apache.spark.sql.DataFrame =
    prep(df, idCol, vecCol)
      .withColumn("sc", graft_dot_scores(typedLit(cents), col("v")))
      .withColumn("p1", expr("array_position(sc, array_max(sc))"))
      .withColumn("p2",
        expr("array_position(sc, array_max(filter(sc, x -> x != array_max(sc))))"))
      .select(col("vec_id").as("query_id"),
        explode(array(col("p1"), col("p2"))).as("cell"))
      .distinct()

  // ---------------------------------------------- reciprocal-rank fusion
  /** Reciprocal-rank fusion (Cormack, Clarke, Büttcher, SIGIR 2009) — the
    * standard hybrid-retrieval combiner: each input ranking contributes
    * 1/(c+rank) per (query, candidate); candidates are re-ranked by the
    * sum. Rank-based (not score-based), so heterogeneous retrievers —
    * dense ANN, sparse BM25, different score scales — fuse without any
    * calibration, which is why every production RAG stack runs RRF
    * between its dense and lexical legs. Scores are integer micro-units
    * (10⁶ DIV (c+rank), summed, like [[retrievalMrr]]) — cross-engine
    * exact, no float ratio chains.
    *
    * Scale shape: inputs are already top-k lists (k·|Q| rows each — the
    * retrievers did the corpus-scale work); fusion is a union + one
    * uniform-key aggregation on (query, candidate) + a per-query top-k
    * window, never touching the corpus. Ties break on candidate id.
    *
    * Output: (query_id, rank, cand_id, rrf_micro), top `k` per query.
    */
  def rrfFuse(rankings: Seq[org.apache.spark.sql.DataFrame], k: Int = 5,
      c: Int = 60): org.apache.spark.sql.DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contrib = rankings.map(_.select(col("query_id"), col("cand_id"),
      expr(s"1000000L div ($c + rank)").as("contrib")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("cand_id"))
    contrib.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("contrib")).as("rrf_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("rrf_micro"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val RrfC = 60

  private val rrfSql = s"""WITH u AS (
      SELECT query_id, cand_id, 1000000 // ($RrfC + rank) AS contrib FROM ($lshSql)
      UNION ALL
      SELECT query_id, cand_id, 1000000 // ($RrfC + rank) AS contrib FROM ($ivfSql)),
    f AS (SELECT query_id, cand_id, CAST(SUM(contrib) AS BIGINT) AS rrf_micro
      FROM u GROUP BY query_id, cand_id),
    rk AS (SELECT query_id, cand_id, rrf_micro,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_micro DESC, cand_id) AS rank
      FROM f)
    SELECT query_id, CAST(rank AS INT) AS rank, cand_id, rrf_micro
    FROM rk WHERE rank <= $K ORDER BY query_id, rank"""

  /** RRF over the tuned strong legs (multi-probe LSH + trained IVF at
    * nprobe 4) — the recall harness's fusion branch.
    */
  private val rrf2Sql = s"""WITH u AS (
      SELECT query_id, cand_id, 1000000 // ($RrfC + rank) AS contrib FROM ($lshMpSql)
      UNION ALL
      SELECT query_id, cand_id, 1000000 // ($RrfC + rank) AS contrib FROM ($ivfTrained4Sql)),
    f AS (SELECT query_id, cand_id, CAST(SUM(contrib) AS BIGINT) AS rrf_micro
      FROM u GROUP BY query_id, cand_id),
    rk AS (SELECT query_id, cand_id, rrf_micro,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_micro DESC, cand_id) AS rank
      FROM f)
    SELECT query_id, CAST(rank AS INT) AS rank, cand_id, rrf_micro
    FROM rk WHERE rank <= $K ORDER BY query_id, rank"""

  private def recallBranchSql(method: String, approxSql: String) =
    s"""SELECT '$method' AS method,
      CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*) AS recall
      FROM ($bruteSql) e LEFT JOIN ($approxSql) a
      ON e.query_id = a.query_id AND e.cand_id = a.cand_id"""

  // qRecall (qs_ann_recall) is DEFINED AFTER the graph-ANN section (its
  // graph_ann/binary branches read graphAnnSql and the beam constants;
  // Scala object vals initialize in declaration order, so referencing
  // them from up here would read nulls/zeros).

  /** Mean reciprocal rank of the TRUE nearest neighbor inside an
    * approximate top-k list — the ranking-quality complement of
    * [[annRecall]] (recall counts set overlap anywhere in the list; MRR
    * asks "and was the right answer near the top?"). Emitted in integer
    * micro-units (1e6/rank, integer division, then the mean as one more
    * integer division) so the metric is cross-engine exact — no float
    * ratio chains. Same scale shape as annRecall: a join of two
    * |Q|-row / k·|Q|-row frames, never the corpus.
    *
    * Output: one row (n_queries, n_hit, mrr_micro); mrr_micro ≈
    * MRR·1e6, truncated.
    */
  def retrievalMrr(exact: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    exact.filter(col("rank") === 1)
      .select(col("query_id"), col("cand_id"))
      .join(approx.select(col("query_id"), col("cand_id"),
        col("rank").as("arank")), Seq("query_id", "cand_id"), "left")
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("arank").isNotNull, 1L).otherwise(0L)).as("n_hit"),
        sum(coalesce(expr("1000000L div arank"), lit(0L))).as("_rr"))
      .select(col("n_queries"), col("n_hit"),
        expr("_rr div n_queries").as("mrr_micro"))

  private def mrrBranchSql(method: String, approxSql: String) =
    s"""SELECT '$method' AS method,
      CAST(COUNT(*) AS BIGINT) AS n_queries,
      CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      CAST(SUM(COALESCE(1000000 // a.rank, 0)) // COUNT(*) AS BIGINT) AS mrr_micro
      FROM (SELECT query_id, cand_id FROM ($bruteSql) WHERE rank = 1) e
      LEFT JOIN ($approxSql) a
      ON e.query_id = a.query_id AND e.cand_id = a.cand_id"""

  private val qMrr = GraftQuery(
    "qs_retrieval_mrr",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val q = corpus.filter(col("vec_id") < NQ)
      // the exact top-1 is shared by both method branches — barrier it
      val exact = cosineTopK(corpus, q, K).localCheckpoint()
      retrievalMrr(exact, annLsh(corpus, q, K)).withColumn("method", lit("lsh"))
        .unionByName(
          retrievalMrr(exact, annIvf(corpus, q, K)).withColumn("method", lit("ivf")))
        .select(col("method"), col("n_queries"), col("n_hit"), col("mrr_micro"))
        .orderBy(col("method"))
    },
    Some(s"""${mrrBranchSql("lsh", lshSql)}
      UNION ALL ${mrrBranchSql("ivf", ivfSql)} ORDER BY method"""))

  /** Rank-biased precision at the persistence parameter p = 1/2 (Moffat
    * & Zobel, TOIS 2008) — the top-weighted retrieval metric that, unlike
    * MRR, credits EVERY relevant hit, geometrically discounted by rank:
    * RBP = (1−p)·Σ p^(rank−1)·rel(rank). At p = 1/2 each hit at rank i
    * contributes exactly 2^−i, a dyadic rational — so the whole metric is
    * computed in EXACT integer units (hit at rank i → 2^(20−i) micro-
    * units; sums and the final per-query mean are BIGINT floor division),
    * the same engine-exactness discipline as [[retrievalMrr]]'s
    * micro-units, with no transcendental log2 anywhere (what makes nDCG
    * a cross-engine hazard). Relevance = membership in the exact top-k.
    * Output: (n_queries, n_hits, rbp_micro = mean per-query units).
    */
  def rbpScore(exact: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    exact.select(col("query_id"), col("cand_id"))
      .join(approx.select(col("query_id"), col("cand_id"),
        col("rank").as("arank")), Seq("query_id", "cand_id"), "left")
      .agg(countDistinct(col("query_id")).as("n_queries"),
        sum(when(col("arank").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        sum(coalesce(expr("shiftright(1048576L, arank)"), lit(0L))).as("_u"))
      .select(col("n_queries"), col("n_hits"),
        expr("_u div n_queries").as("rbp_micro"))

  private def rbpBranchSql(method: String, approxSql: String) =
    s"""SELECT '$method' AS method,
      CAST(COUNT(DISTINCT e.query_id) AS BIGINT) AS n_queries,
      CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      CAST(SUM(COALESCE(1048576 >> a.rank, 0)) // COUNT(DISTINCT e.query_id) AS BIGINT) AS rbp_micro
      FROM (SELECT query_id, cand_id FROM ($bruteSql)) e
      LEFT JOIN ($approxSql) a
      ON e.query_id = a.query_id AND e.cand_id = a.cand_id"""

  private val qRbp = GraftQuery(
    "qs_rbp",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val q = corpus.filter(col("vec_id") < NQ)
      val exact = cosineTopK(corpus, q, K).localCheckpoint()
      rbpScore(exact, annLsh(corpus, q, K)).withColumn("method", lit("lsh"))
        .unionByName(
          rbpScore(exact, annIvf(corpus, q, K)).withColumn("method", lit("ivf")))
        .select(col("method"), col("n_queries"), col("n_hits"), col("rbp_micro"))
        .orderBy(col("method"))
    },
    Some(s"""${rbpBranchSql("lsh", lshSql)}
      UNION ALL ${rbpBranchSql("ivf", ivfSql)} ORDER BY method"""))

  /** nDCG@k rank weights in integer micro-units: w(i) = ⌊10⁶ / log₂(i+1)⌋,
    * computed ONCE on the driver and inlined as literals in both engines —
    * the determinism lives in the literal table, so the transcendental
    * log₂ (the hazard [[rbpScore]]'s scaladoc flags) never runs inside
    * either engine.
    */
  private val NdcgW: Seq[Long] =
    (1 to K).map(i => (1e6 * math.log(2) / math.log(i + 1)).toLong)

  /** nDCG@k against the exact top-k as binary relevance — the third leg
    * of the retrieval-metric triad ([[retrievalMrr]]: first hit only;
    * [[rbpScore]]: geometric persistence; nDCG: the logarithmic discount
    * leaderboards actually report). DCG_q = Σ_hits w(rank); the ideal
    * DCG is the CONSTANT Σᵢ w(i) (every query has exactly k relevant
    * results by construction), so mean nDCG = 10⁴·ΣDCG DIV (n_q·IDCG) is
    * one integer division. Same single count-frame join as the other
    * metrics — never touches the corpus.
    * Output: (n_queries, n_hits, ndcg_bp).
    */
  def ndcgScore(exact: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // explicit CASE on the rank, NOT element_at(arr, cast(arank AS int)):
    // after an outer join Spark's codegen for element_at mis-handles the
    // null index from the unmatched side (observed returning the last
    // array element) — the branch form is null-safe on both engines
    val wCase = NdcgW.zipWithIndex
      .map { case (w, i) => s"WHEN arank = ${i + 1} THEN ${w}L" }
      .mkString("CASE ", " ", " ELSE 0L END")
    val idcg = NdcgW.sum
    exact.select(col("query_id"), col("cand_id"))
      .join(approx.select(col("query_id"), col("cand_id"),
        col("rank").as("arank")), Seq("query_id", "cand_id"), "left")
      .agg(countDistinct(col("query_id")).as("n_queries"),
        sum(when(col("arank").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        sum(expr(wCase)).as("_dcg"))
      .select(col("n_queries"), col("n_hits"),
        expr(s"10000L * _dcg div (n_queries * ${idcg}L)").as("ndcg_bp"))
  }

  private def ndcgBranchSql(method: String, approxSql: String) = {
    val wCase = NdcgW.zipWithIndex
      .map { case (w, i) => s"WHEN a.rank = ${i + 1} THEN $w" }
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""SELECT '$method' AS method,
      CAST(COUNT(DISTINCT e.query_id) AS BIGINT) AS n_queries,
      CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      CAST(10000 * SUM($wCase)
        // (COUNT(DISTINCT e.query_id) * ${NdcgW.sum}) AS BIGINT) AS ndcg_bp
      FROM (SELECT query_id, cand_id FROM ($bruteSql)) e
      LEFT JOIN ($approxSql) a
      ON e.query_id = a.query_id AND e.cand_id = a.cand_id"""
  }

  private val qNdcg = GraftQuery(
    "qs_ndcg",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val q = corpus.filter(col("vec_id") < NQ)
      val exact = cosineTopK(corpus, q, K).localCheckpoint()
      ndcgScore(exact, annLsh(corpus, q, K)).withColumn("method", lit("lsh"))
        .unionByName(
          ndcgScore(exact, annIvf(corpus, q, K)).withColumn("method", lit("ivf")))
        .select(col("method"), col("n_queries"), col("n_hits"), col("ndcg_bp"))
        .orderBy(col("method"))
    },
    Some(s"""${ndcgBranchSql("lsh", lshSql)}
      UNION ALL ${ndcgBranchSql("ivf", ivfSql)} ORDER BY method"""))

  /** Mean average precision @ k — the recall-ORDER-sensitive average the
    * triad still lacks: AP = (1/k)·Σ over hit ranks i of Precision@i,
    * so it rewards packing the relevant results early without [[rbpScore]]'s
    * fixed geometric horizon or nDCG's log table. Precision@i at a hit is
    * h/i with h = the hit's index among the query's hits in approx-rank
    * order (a row_number over the matched rows only); each term rides in
    * exact lcm(1..k) units (k = 5 → 60·h div i is EXACT — every i ≤ k
    * divides the lcm), so MAP needs no floats and no per-rank literal
    * table. Same single count-frame join as the other metrics; the
    * per-query window is k rows. Output: (n_queries, n_hits, map_micro).
    */
  def mapScore(exact: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame, k: Int = K): org.apache.spark.sql.DataFrame = {
    val lcm = (1 to k).foldLeft(1L)((a, b) => a * b / BigInt(a).gcd(BigInt(b)).toLong)
    val w = Window.partitionBy(col("query_id")).orderBy(col("arank"))
    exact.select(col("query_id"), col("cand_id"))
      .join(approx.select(col("query_id"), col("cand_id"),
        col("rank").as("arank")), Seq("query_id", "cand_id"), "left")
      // count(arank) ignores the unmatched rows' nulls, so h at a hit is
      // its 1-based index among the query's hits whichever way the
      // engine orders nulls
      .withColumn("h", count(col("arank")).over(w))
      .withColumn("u",
        coalesce(expr(s"${lcm}L * h div arank"), lit(0L)))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        sum(when(col("arank").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        sum(col("u")).as("_u"))
      .select(col("n_queries"), col("n_hits"),
        expr(s"1000000L * _u div (${lcm * k}L * n_queries)").as("map_micro"))
  }

  private def mapBranchSql(method: String, approxSql: String) = {
    val lcm = 60L // lcm(1..5), K = 5
    s"""SELECT '$method' AS method,
      CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
      CAST(SUM(CASE WHEN arank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      CAST(1000000 * SUM(COALESCE($lcm * h // arank, 0))
        // (${lcm * K} * COUNT(DISTINCT query_id)) AS BIGINT) AS map_micro
      FROM (SELECT e.query_id, a.rank AS arank,
          COUNT(a.rank) OVER (PARTITION BY e.query_id ORDER BY a.rank
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
        FROM (SELECT query_id, cand_id FROM ($bruteSql)) e
        LEFT JOIN ($approxSql) a
        ON e.query_id = a.query_id AND e.cand_id = a.cand_id) t"""
  }

  private val qMap = GraftQuery(
    "qs_map",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val q = corpus.filter(col("vec_id") < NQ)
      val exact = cosineTopK(corpus, q, K).localCheckpoint()
      mapScore(exact, annLsh(corpus, q, K)).withColumn("method", lit("lsh"))
        .unionByName(
          mapScore(exact, annIvf(corpus, q, K)).withColumn("method", lit("ivf")))
        .select(col("method"), col("n_queries"), col("n_hits"), col("map_micro"))
        .orderBy(col("method"))
    },
    Some(s"""${mapBranchSql("lsh", lshSql)}
      UNION ALL ${mapBranchSql("ivf", ivfSql)} ORDER BY method"""))

  /** Truncated-RBO per-candidate contribution table at persistence p:
    * a candidate matched with m = max(exact rank, approx rank)
    * participates in every overlap depth d ≥ m, so its total weight is
    * (1−p)·Σ_{d=m..K} p^(d−1)/d — computed ONCE on the driver and
    * inlined as micro-unit literals in both engines (the [[NdcgW]]
    * discipline: the determinism lives in the literal table, the
    * floating p-powers never run inside either engine).
    */
  private val RboW: Seq[Long] = {
    val p = 0.9
    (1 to K).map(m => (1e6 * (1 - p) *
      (m to K).map(d => math.pow(p, d - 1) / d).sum).toLong)
  }

  /** Rank-biased overlap truncated at k (Webber, Moffat & Zobel, TOIS
    * 2010) — the ORDER-AWARE agreement between the approximate and the
    * exact ranking, where recall ([[qs_ann_recall]]'s tiers) is order-
    * blind and RBP/nDCG grade only membership: RBO@k = (1−p)·Σ_d
    * p^(d−1)·|A_:d ∩ B_:d|/d rewards tiers that put the exact list's
    * HEAD first. A candidate in both top-k lists joins the overlap at
    * depth max(rank_exact, rank_approx) — one greatest() per matched
    * row against the literal weight table; no per-depth slicing, no
    * second corpus pass. Same single count-frame join as the other
    * retrieval metrics.
    *
    * Output per method: (method, n_queries, n_hits, rbo_micro =
    * floor-mean of per-query micro sums).
    */
  def rboScore(exact: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wCase = RboW.zipWithIndex
      .map { case (w, i) => s"WHEN greatest(erank, arank) = ${i + 1} THEN ${w}L" }
      .mkString("CASE ", " ", " ELSE 0L END")
    exact.select(col("query_id"), col("cand_id"), col("rank").as("erank"))
      .join(approx.select(col("query_id"), col("cand_id"),
        col("rank").as("arank")), Seq("query_id", "cand_id"), "left")
      .agg(countDistinct(col("query_id")).as("n_queries"),
        sum(when(col("arank").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        sum(coalesce(expr(wCase), lit(0L))).as("_u"))
      .select(col("n_queries"), col("n_hits"),
        expr("_u div n_queries").as("rbo_micro"))
  }

  private def rboBranchSql(method: String, approxSql: String) = {
    val wCase = RboW.zipWithIndex
      .map { case (w, i) => s"WHEN greatest(e.rank, a.rank) = ${i + 1} THEN $w" }
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""SELECT '$method' AS method,
      CAST(COUNT(DISTINCT e.query_id) AS BIGINT) AS n_queries,
      CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      CAST(SUM(COALESCE($wCase, 0)) // COUNT(DISTINCT e.query_id) AS BIGINT) AS rbo_micro
      FROM (SELECT query_id, cand_id, rank FROM ($bruteSql)) e
      LEFT JOIN ($approxSql) a
      ON e.query_id = a.query_id AND e.cand_id = a.cand_id"""
  }

  private val qRbo = GraftQuery(
    "qs_rbo",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val q = corpus.filter(col("vec_id") < NQ)
      val exact = cosineTopK(corpus, q, K).localCheckpoint()
      rboScore(exact, annLsh(corpus, q, K)).withColumn("method", lit("lsh"))
        .unionByName(
          rboScore(exact, annIvf(corpus, q, K)).withColumn("method", lit("ivf")))
        .select(col("method"), col("n_queries"), col("n_hits"), col("rbo_micro"))
        .orderBy(col("method"))
    },
    Some(s"""${rboBranchSql("lsh", lshSql)}
      UNION ALL ${rboBranchSql("ivf", ivfSql)} ORDER BY method"""))

  /** int8 scalar-quantized top-k — the memory-bandwidth scale path real
    * vector stores use (FAISS `SQ8`): each vector is quantized once,
    * map-only, to `round(x·127/maxabs)` ∈ [-127, 127]; candidates are
    * scored by the EXACT integer dot product of the quantized vectors
    * (native codegen'd [[graft.functions.IntDot]], bigint — no float
    * drift, hash-identical across engines). At 100 TB the quantized
    * column is what ships through the shuffle/broadcast: 4 bytes/element
    * as a Spark int array, 1 byte packed to BINARY in a storage-side
    * production variant — either way a 2–8× cut of the dominant cost,
    * scan bandwidth. Composes with [[annLsh]]/[[annIvf]] bucketing: the
    * quantized rerank replaces the exact rerank inside buckets.
    * Output: (query_id, rank, cand_id, qscore).
    */
  def sqTopK(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    def quant(df: org.apache.spark.sql.DataFrame) =
      df.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
        .withColumn("m", expr("array_max(transform(v, x -> abs(x)))"))
        .withColumn("qv", expr(
          "CASE WHEN m = 0D THEN transform(v, x -> 0) " +
            "ELSE transform(v, x -> cast(round(x * 127.0 / m) as int)) END"))
    val q = quant(queries)
      .select(col("vec_id").as("query_id"), col("qv").as("qa"))
    val pairs = quant(corpus)
      .select(col("vec_id").as("cand_id"), col("qv").as("qb"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("qscore", graft_idot(col("qa"), col("qb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col("cand_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("qscore"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val sqSql = s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    mx AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m FROM e),
    z AS (SELECT vec_id, CASE WHEN m = 0 THEN list_transform(v, x -> 0)
      ELSE list_transform(v, x -> CAST(round(x * 127.0 / m) AS INT)) END AS qv FROM mx),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.qv AS qa, c.qv AS qb
      FROM z q JOIN z c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    sc AS (SELECT query_id, cand_id, CAST(list_sum(list_transform(
      generate_series(1, len(qa)), i -> CAST(qa[i] AS BIGINT) * qb[i])) AS BIGINT) AS qscore
      FROM p),
    rk AS (SELECT query_id, cand_id, qscore,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qscore DESC, cand_id) AS rank
      FROM sc)
    SELECT query_id, rank, cand_id, qscore FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  /** [[sqTopK]] on the 1-byte wire format: quantized vectors PACK to
    * BINARY (native [[graft.functions.Int8Pack]]) before the broadcast,
    * and candidates score with [[graft.functions.Int8DotPacked]] without
    * ever unpacking — what ships through scan/broadcast/shuffle is 1
    * byte/element, 4× less than the int-array form and 4–8× less than
    * the float vectors. Clamp-free here because round(x·127/maxabs) is
    * already in [-127, 127], so results are BIT-IDENTICAL to [[sqTopK]]
    * — the binding reuses qs_sq_topk's oracle verbatim, which is the
    * end-to-end proof the codec is lossless.
    */
  def sqTopKPacked(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    def quant(df: org.apache.spark.sql.DataFrame) =
      df.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
        .withColumn("m", expr("array_max(transform(v, x -> abs(x)))"))
        .withColumn("qv", expr(
          "CASE WHEN m = 0D THEN transform(v, x -> 0) " +
            "ELSE transform(v, x -> cast(round(x * 127.0 / m) as int)) END"))
        .withColumn("pk", graft_int8_pack(col("qv")))
    val q = quant(queries)
      .select(col("vec_id").as("query_id"), col("pk").as("pa"))
    val pairs = quant(corpus)
      .select(col("vec_id").as("cand_id"), col("pk").as("pb"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("qscore", graft_idot_packed(col("pa"), col("pb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col("cand_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("qscore"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val qSqPacked = GraftQuery(
    "qs_sq_packed",
    (s, dir) => sqTopKPacked(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K),
    Some(sqSql))

  private val qSq = GraftQuery(
    "qs_sq_topk",
    (s, dir) => sqTopK(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K),
    Some(sqSql))

  /** Per-label embedding centroids — the k-means/IVF training kernel
    * (cluster assignment's other half) as one aggregation: explode to
    * (label, dim, x), hash-aggregate sums per (label, dim). Plain
    * double-summing is shuffle-order-dependent, so values are quantized
    * to exact BIGINTs at float's own precision (×2²⁴, round) and the mean
    * is one final IEEE division — deterministic across engines, partitions,
    * and retries, with no precision loss beyond the input floats'.
    * Output: (label, dim, mean_val, n).
    */
  def labelCentroids(vecs: org.apache.spark.sql.DataFrame,
      labelCol: String = "label", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame =
    vecs.select(col(labelCol).as("label"), col(vecCol).cast("array<double>").as("v"))
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .withColumn("q", expr(s"cast(round(x * ${Quant}.0) as bigint)"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        (col("sq").cast("double") / (col("n") * Quant)).as("mean_val"), col("n"))

  private val centroidsSql = s"""WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    u AS (SELECT label, unnest(generate_series(1, len(v))) AS i, v FROM e),
    q AS (SELECT label, i - 1 AS dim, CAST(round(v[i] * ${Quant}.0) AS BIGINT) AS q FROM u),
    a AS (SELECT label, dim, SUM(q) AS sq, COUNT(*) AS n FROM q GROUP BY label, dim)
    SELECT label, CAST(dim AS INT) AS dim,
      CAST(sq AS DOUBLE) / (n * $Quant) AS mean_val, n
    FROM a ORDER BY label, dim"""

  private val qCentroids = GraftQuery(
    "qs_label_centroids",
    (s, dir) => labelCentroids(Tables.embeddings(s, dir))
      .orderBy(col("label"), col("dim")),
    Some(centroidsSql))

  /** One Lloyd (k-means) iteration at corpus scale: map-only nearest-
    * centroid assignment against the current centroid literals (argmax of
    * native dot — identical to [[annIvf]]'s coarse quantizer), then the
    * exact quantized centroid recompute of [[labelCentroids]] per cell.
    * This is the whole training loop body for the IVF coarse quantizer:
    * broadcast C centroids out, one aggregation back — iterate from the
    * driver, C·dim doubles per round, corpus scanned once per iteration.
    * A cell that attracts no vectors emits no rows (the standard empty-
    * cluster case — the driver loop re-seeds or drops it).
    * Output: (cell, dim, mean_val, n).
    */
  def kmeansStep(vecs: org.apache.spark.sql.DataFrame,
      cents: Seq[Seq[Double]] = centroids,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val assigned = withArgmaxCell(prep(vecs, idCol, vecCol), cents)
    labelCentroids(assigned, labelCol = "cell", vecCol = "v")
      .withColumnRenamed("label", "cell")
  }

  private val kmeansSql = s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cw AS (SELECT ${centroids.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")} AS w),
    scs AS (SELECT vec_id, v,
      list_transform(generate_series(1, $Cents), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS sc
      FROM e0, cw),
    e AS (SELECT list_position(sc, list_max(sc)) AS cell, v FROM scs),
    u AS (SELECT cell, unnest(generate_series(1, len(v))) AS i, v FROM e),
    qz AS (SELECT cell, i - 1 AS dim, CAST(round(v[i] * ${Quant}.0) AS BIGINT) AS q FROM u),
    a AS (SELECT cell, dim, SUM(q) AS sq, COUNT(*) AS n FROM qz GROUP BY cell, dim)
    SELECT CAST(cell AS BIGINT) AS cell, CAST(dim AS INT) AS dim,
      CAST(sq AS DOUBLE) / (n * $Quant) AS mean_val, n
    FROM a ORDER BY cell, dim"""

  private val qKmeans = GraftQuery(
    "qs_kmeans_step",
    (s, dir) => kmeansStep(Tables.embeddings(s, dir))
      .orderBy(col("cell"), col("dim")),
    Some(kmeansSql))

  /** Embedding outlier detection — the embedding-QA pass: squared L2
    * distance of every vector to its OWN label centroid, global top-k
    * most-distant flagged (corrupt encodes, mislabeled rows, degenerate
    * all-zero vectors all surface here). Centroids come from
    * [[labelCentroids]] (exact, deterministic), collapse to one tiny
    * broadcast array per label, and the distance is a sequential
    * fold mirrored verbatim in the oracle; global top-k via
    * orderBy+limit = TakeOrdered (parallel). Output: (vec_id, label,
    * dist2).
    */
  def centroidOutliers(vecs: org.apache.spark.sql.DataFrame, k: Int = 10,
      idCol: String = "vec_id", labelCol: String = "label",
      vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val cents = labelCentroids(vecs, labelCol, vecCol)
      .groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(dim, mean_val))), s -> s.mean_val)")
        .as("m"))
    vecs.select(col(labelCol).as("label"), col(vecCol).cast("array<double>").as("v"),
        col(idCol).as("vec_id"))
      .join(broadcast(cents), "label")
      .withColumn("dist2", expr(
        "aggregate(zip_with(v, m, (x, y) -> (x - y) * (x - y)), " +
          "cast(0 as double), (a, b) -> a + b)"))
      .orderBy(col("dist2").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("dist2"))
  }

  private val outliersSql = s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    u AS (SELECT label, unnest(generate_series(1, len(v))) AS i, v FROM e),
    qz AS (SELECT label, i AS dim1, CAST(round(v[i] * ${Quant}.0) AS BIGINT) AS q FROM u),
    a AS (SELECT label, dim1,
      CAST(SUM(q) AS DOUBLE) / (COUNT(*) * $Quant) AS mean_val FROM qz GROUP BY label, dim1),
    m AS (SELECT label, list(mean_val ORDER BY dim1) AS m FROM a GROUP BY label),
    d AS (SELECT e.vec_id, e.label,
      list_reduce(list_transform(generate_series(1, 64),
        i -> (e.v[i] - m.m[i]) * (e.v[i] - m.m[i])), (x, y) -> x + y) AS dist2
      FROM e JOIN m ON e.label = m.label)
    SELECT vec_id, label, dist2 FROM d ORDER BY dist2 DESC, vec_id LIMIT 10"""

  private val qOutliers = GraftQuery(
    "qs_centroid_outliers",
    (s, dir) => centroidOutliers(Tables.embeddings(s, dir)),
    Some(outliersSql))

  // ----------------------------------------------------- silhouette
  /** Simplified silhouette coefficient per label (Hruschka et al.'s
    * centroid variant of Rousseeuw 1987) — the cluster-quality readout
    * for any labeling (k-means cells, a classifier's partition, the
    * `label` column): per point a = d²(x, own centroid),
    * b = min d²(x, other centroids), s = (b−a)/max(a,b) ∈ [−1, 1];
    * negative s marks points parked nearer a FOREIGN centroid. The
    * centroid variant replaces full silhouette's O(n²) pairwise
    * distances with L centroid distances per point — the only version
    * that exists at corpus scale.
    *
    * Determinism: centroids are [[labelCentroids]]' exact quantized
    * means; d² is the same sequential fold both engines run; s is one
    * fixed-form IEEE expression floored to basis points per point, so
    * per-label means are exact integer division.
    *
    * Plan: one L-row broadcast (labels × dim means) crossed into one
    * corpus scan, per-(point, label) distance collapses immediately to
    * per-point (a, b) via a 2-branch min agg, then one label-key agg.
    * Output: (label, n, mean_sil_bp, n_negative) ordered by label.
    */
  def silhouetteByLabel(vecs: org.apache.spark.sql.DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val cents = labelCentroids(vecs, labelCol, vecCol)
      .groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(dim, mean_val))), s -> s.mean_val)")
        .as("m"))
      .select(col("label").as("clabel"), col("m"))
    vecs.select(col(labelCol).as("label"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("_rid", monotonically_increasing_id())
      .crossJoin(broadcast(cents))
      .withColumn("d2", expr(
        "aggregate(zip_with(v, m, (x, y) -> (x - y) * (x - y)), " +
          "cast(0 as double), (a, b) -> a + b)"))
      .groupBy(col("_rid"), col("label"))
      .agg(min(when(col("clabel") === col("label"), col("d2"))).as("a"),
        min(when(col("clabel") =!= col("label"), col("d2"))).as("b"))
      .withColumn("sil_bp",
        when(greatest(col("a"), col("b")) === 0d, 0L).otherwise(
          floor(lit(10000d) * (col("b") - col("a")) / greatest(col("a"), col("b")))))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        expr("sum(sil_bp) div count(1)").as("mean_sil_bp"),
        sum(when(col("sil_bp") < 0, 1L).otherwise(0L)).as("n_negative"))
      .orderBy(col("label"))
  }

  private val silhouetteSql = s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    u AS (SELECT label, unnest(generate_series(1, len(v))) AS i, v FROM e),
    qz AS (SELECT label, i AS dim1, CAST(round(v[i] * ${Quant}.0) AS BIGINT) AS q FROM u),
    a0 AS (SELECT label, dim1,
      CAST(SUM(q) AS DOUBLE) / (COUNT(*) * $Quant) AS mean_val FROM qz GROUP BY label, dim1),
    m AS (SELECT label AS clabel, list(mean_val ORDER BY dim1) AS m FROM a0 GROUP BY label),
    d AS (SELECT e.vec_id, e.label, m.clabel,
      list_reduce(list_transform(generate_series(1, 64),
        i -> (e.v[i] - m.m[i]) * (e.v[i] - m.m[i])), (x, y) -> x + y) AS d2
      FROM e, m),
    ab AS (SELECT vec_id, label,
        MIN(CASE WHEN clabel = label THEN d2 END) AS a,
        MIN(CASE WHEN clabel <> label THEN d2 END) AS b
      FROM d GROUP BY vec_id, label),
    sil AS (SELECT label,
        CASE WHEN GREATEST(a, b) = 0 THEN 0
             ELSE CAST(floor(10000 * (b - a) / GREATEST(a, b)) AS BIGINT)
        END AS sil_bp
      FROM ab)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(sil_bp) // COUNT(*) AS BIGINT) AS mean_sil_bp,
      CAST(SUM(CASE WHEN sil_bp < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
    FROM sil GROUP BY label ORDER BY label"""

  private val qSilhouette = GraftQuery(
    "qs_silhouette",
    (s, dir) => silhouetteByLabel(Tables.embeddings(s, dir)),
    Some(silhouetteSql))

  // ----------------------------------------------- KNN-Shapley valuation
  /** Exact KNN-Shapley data valuation (Jia et al., VLDB 2019): each
    * training point's Shapley value for a K-NN classifier over a test
    * set, via the closed-form recursion — the tractable instance of Data
    * Shapley ("which training rows helped, which ones actively hurt").
    * With training points sorted per test point by similarity (rank 1 =
    * nearest, N = corpus size):
    *
    *   s(N)  = 1[y_N = y_test] / N
    *   s(i)  = s(i+1) + (1[y_i = y_test] − 1[y_{i+1} = y_test]) / max(i, K)
    *
    * i.e. a SUFFIX SUM over rank order — two window functions (lead +
    * backward running sum), no recursion at runtime. Kept exact: each
    * rational term is floored to micro-units with the ±1·10⁶ DIV max(i,K)
    * integer division (truncation toward zero on both engines), so sums
    * are order-independent BIGINTs; per-train values average over test
    * points with one final integer division.
    *
    * Plan: broadcast the bounded test set into one corpus scan (the
    * cosineTopK shape), per-test ranking windows keyed by test id, one
    * train-key aggregation, TakeOrdered head/tail. Ranking the FULL
    * corpus per test point is exact KNN-Shapley's definition; at 100 TB
    * truncate candidates with any ANN tier first (the standard practice —
    * beyond the truncation rank all terms telescope to ~0 anyway).
    * Output: the `topK` highest-value and `topK` lowest-value training
    * points, (train_id, label, n_test, shapley_micro), ordered by
    * (shapley_micro DESC, train_id).
    */
  def knnShapley(train: org.apache.spark.sql.DataFrame,
      test: org.apache.spark.sql.DataFrame, k: Int = 3, topK: Int = 10,
      idCol: String = "vec_id", labelCol: String = "label",
      vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && topK >= 1, s"k and topK must be >= 1, got k=$k topK=$topK")
    val tr = prep(train, idCol, vecCol)
      .join(train.select(col(idCol).as("vec_id"), col(labelCol).as("y")), "vec_id")
      .select(col("vec_id").as("train_id"), col("v").as("vb"),
        col("nrm").as("nb"), col("y"))
    val te = prep(test, idCol, vecCol)
      .join(test.select(col(idCol).as("vec_id"), col(labelCol).as("yt")), "vec_id")
      .select(col("vec_id").as("test_id"), col("v").as("va"),
        col("nrm").as("na"), col("yt"))
    val wRank = Window.partitionBy(col("test_id"))
      .orderBy(col("cosine").desc, col("train_id"))
    val wPart = Window.partitionBy(col("test_id"))
    val wSuffix = Window.partitionBy(col("test_id")).orderBy(col("rnk"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val scored = withCosine(tr.crossJoin(broadcast(te)))
      .withColumn("u", (col("y") === col("yt")).cast("long"))
      .withColumn("rnk", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wPart))
      .withColumn("u_last", last(col("u")).over(
        wPart.orderBy(col("rnk")).rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("u_next", lead(col("u"), 1).over(
        Window.partitionBy(col("test_id")).orderBy(col("rnk"))))
      .withColumn("term", when(col("u_next").isNull, 0L).otherwise(
        expr(s"((u - u_next) * 1000000L) div greatest(rnk, $k)")))
      .withColumn("s_micro",
        expr("(u_last * 1000000L) div n") + sum(col("term")).over(wSuffix))
    val values = scored.groupBy(col("train_id"), col("y"))
      .agg(count(lit(1)).as("n_test"),
        expr("sum(s_micro) div count(1)").as("shapley_micro"))
      .select(col("train_id"), col("y").as("label"), col("n_test"),
        col("shapley_micro"))
      .localCheckpoint()   // train-corpus-sized value frame, read twice below
    values.orderBy(col("shapley_micro").desc, col("train_id")).limit(topK)
      .unionByName(
        values.orderBy(col("shapley_micro").asc, col("train_id").desc).limit(topK))
      .orderBy(col("shapley_micro").desc, col("train_id"))
  }

  private val ShK = 3
  private val ShTop = 10

  private val shapleySql = s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    tr AS (SELECT vec_id AS train_id, label AS y, v AS vb FROM e WHERE vec_id >= $NQ),
    te AS (SELECT vec_id AS test_id, label AS yt, v AS va FROM e WHERE vec_id < $NQ),
    p AS (SELECT train_id, y, test_id, yt, $cosineSql AS cosine FROM tr, te),
    r AS (SELECT test_id, train_id, y,
        CASE WHEN y = yt THEN 1 ELSE 0 END AS u,
        ROW_NUMBER() OVER (PARTITION BY test_id ORDER BY cosine DESC, train_id) AS rnk,
        COUNT(*) OVER (PARTITION BY test_id) AS n
      FROM p),
    t AS (SELECT test_id, train_id, y, rnk, n, u,
        LAST_VALUE(u) OVER (PARTITION BY test_id ORDER BY rnk
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS u_last,
        LEAD(u, 1) OVER (PARTITION BY test_id ORDER BY rnk) AS u_next
      FROM r),
    s AS (SELECT test_id, train_id, y,
        (u_last * 1000000) // n +
        SUM(CASE WHEN u_next IS NULL THEN 0
                 ELSE ((u - u_next) * 1000000) // GREATEST(rnk, $ShK) END)
          OVER (PARTITION BY test_id ORDER BY rnk
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS s_micro
      FROM t),
    v AS (SELECT train_id, y AS label, CAST(COUNT(*) AS BIGINT) AS n_test,
        CAST(SUM(s_micro) // COUNT(*) AS BIGINT) AS shapley_micro
      FROM s GROUP BY train_id, y),
    hd AS (SELECT * FROM v ORDER BY shapley_micro DESC, train_id LIMIT $ShTop),
    tl AS (SELECT * FROM v ORDER BY shapley_micro ASC, train_id DESC LIMIT $ShTop)
    SELECT train_id, label, n_test, shapley_micro
    FROM (SELECT * FROM hd UNION ALL SELECT * FROM tl)
    ORDER BY shapley_micro DESC, train_id"""

  /** Test points = the NQ query vectors, training corpus = the rest;
    * K-NN on the label column — the "which corpus rows help the
    * classifier" valuation readout.
    */
  private val qShapley = GraftQuery(
    "qs_knn_shapley",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      knnShapley(e.filter(col("vec_id") >= NQ), e.filter(col("vec_id") < NQ),
        ShK, ShTop)
    },
    Some(shapleySql))

  // ----------------------------------------------------------- SemDeDup
  /** Semantic deduplication via clustering (the SemDeDup recipe, Abbas et
    * al. 2023, arXiv:2303.09540 — public method): k-means-cluster the
    * embedding space, then look for near-identical pairs ONLY inside each
    * cluster; any vector with a smaller-id neighbor at cosine >= `theta`
    * in its own cell is dropped (keep-min rule — deterministic, the same
    * tie-break every dedup tier here uses).
    *
    * Scale shape: cell assignment is map-only (argmax of the native dot
    * against C centroid literals); the ONLY join is the intra-cell
    * self-join, whose fan-out is bounded by cell occupancy — the expected
    * intra-cell pair count is ~n²/(2C), so C MUST grow ~√n (classic IVF
    * sizing) for the pair count to stay ~n^1.5 ≪ n². This is exactly why
    * SemDeDup clusters first: the corpus is never compared all-pairs.
    *
    * The quantizer is therefore REQUIRED, not defaulted: callers size it
    * with [[semDedupCellCount]] (C ≈ √n) and train it via
    * [[trainCentroids]] from [[seedCentroids]] — a fixed tiny C at a large
    * n silently degrades to a quadratic self-join. OpsApiSpec pins the
    * fan-out bound.
    *
    * Output: (vec_id, cell, kept) for every corpus row.
    */
  def semDedup(corpus: org.apache.spark.sql.DataFrame, theta: Double,
      cents: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    require(cents.nonEmpty, "semDedup requires a trained coarse quantizer " +
      "(size it with semDedupCellCount(n) ~ sqrt(n), train with trainCentroids)")
    val assigned = withArgmaxCell(prep(corpus, idCol, vecCol), cents)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val lo = assigned.select(col("cell"), col("vec_id").as("query_id"),
      col("v").as("va"), col("nrm").as("na"))
    val hi = assigned.select(col("cell"), col("vec_id").as("cand_id"),
      col("v").as("vb"), col("nrm").as("nb"))
    val dropped = withCosine(
        lo.join(hi, Seq("cell")).filter(col("query_id") < col("cand_id")))
      .filter(col("cosine") >= theta)
      .select(col("cand_id").as("vec_id")).distinct()
    assigned
      .join(dropped.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        not(coalesce(col("dup"), lit(false))).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** The C ≈ √n quantizer sizing rule for [[semDedup]] (and IVF generally):
    * with C = ⌈√n⌉ cells the expected intra-cell pair count is ~n^1.5/2 —
    * the sub-quadratic bound the whole method depends on. Floor of 2 keeps
    * degenerate corpora trainable.
    */
  def semDedupCellCount(n: Long): Int =
    math.max(2, math.ceil(math.sqrt(n.toDouble)).toInt)

  private val SemTheta = 0.4

  private val semDedupSql =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ${lloydSqlDyn(IvfIters)},
    scs AS (SELECT vec_id, v,
      list_transform(generate_series(1, len(w)), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS sc
      FROM e0, cw$IvfIters),
    e AS (SELECT vec_id, v, CAST(list_position(sc, list_max(sc)) AS BIGINT) AS cell FROM scs),
    pr AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, a.v AS va, b.v AS vb
      FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id < b.vec_id),
    dp AS (SELECT DISTINCT cand_id FROM
      (SELECT cand_id, $cosineSql AS cosine FROM pr) x WHERE cosine >= $SemTheta)
    SELECT e.vec_id, e.cell, dp.cand_id IS NULL AS kept
    FROM e LEFT JOIN dp ON e.vec_id = dp.cand_id ORDER BY e.vec_id"""

  /** Shared trained quantizer for the dynamic-C bindings: C from the full
    * pre-counted n, Lloyd rounds on the hash sample ([[trainSample]]),
    * memoized per session — qd_semdedup and qs_knn_graph run the same
    * training, so a suite pass pays it once.
    */
  private def dynTrained(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[Seq[Double]] =
    Memo.value(s, s"dynTrainedCents:$dir") {
      val emb = Tables.embeddings(s, dir)
      val c = semDedupCellCount(emb.count())
      val smp = trainSample(emb, TrainSampleNum, TrainSampleDen)
      trainCentroids(smp, dataSeeds(smp, c))
    }

  private val qSemDedup = GraftQuery(
    "qd_semdedup",
    (s, dir) =>
      semDedup(Tables.embeddings(s, dir), SemTheta, dynTrained(s, dir)),
    Some(semDedupSql))

  // ------------------------------------------------------------ kNN graph
  /** k-nearest-neighbor GRAPH construction — the input artifact of
    * graph-based clustering / agglomerative dedup (SemDeDup's sibling
    * output: instead of keep/drop flags, every vector's top-k in-cell
    * neighbors): trained-cell assignment (map-only), intra-cell pairs
    * only (the same C ≈ √n occupancy bound as [[semDedup]] — this is an
    * all-SOURCES ANN, so cell-bucketing is what keeps it off the n²
    * cliff), exact cosine, top-k per source via a rank window partitioned
    * by the uniform source id. nprobe is 1 by construction (a vector's
    * own cell); boundary-crossing true neighbors are the standard recall
    * trade, tunable by raising C iterations or unioning a second probe.
    * Output: (src, rank, nbr, cosine).
    */
  def knnGraph(corpus: org.apache.spark.sql.DataFrame, k: Int,
      cents: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(cents.nonEmpty, "knnGraph requires a trained coarse quantizer " +
      "(size it with semDedupCellCount(n), train with trainCentroids)")
    knnEdgesFrom(withArgmaxCell(prep(corpus, idCol, vecCol), cents)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell")), k)
  }

  /** The intra-cell pair join + per-source rank cut over a (vec_id, v,
    * nrm, cell) assignment frame — ONE body shared by the public
    * [[knnGraph]] and [[knnEdgesMemo]] so the tie rule / cut / filter
    * cannot drift from the shared `knnEdgeCtes` oracle.
    */
  private def knnEdgesFrom(assigned: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val lo = assigned.select(col("cell"), col("vec_id").as("src"),
      col("v").as("va"), col("nrm").as("na"))
    val hi = assigned.select(col("cell"), col("vec_id").as("nbr"),
      col("v").as("vb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("src")).orderBy(col("cosine").desc, col("nbr"))
    withCosine(lo.join(hi, Seq("cell")).filter(col("src") =!= col("nbr")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("rank"), col("nbr"), col("cosine"))
      .orderBy(col("src"), col("rank"))
  }

  // Graph degree: 12 out-edges per node (r8, up from 3) — at degree 3
  // the quantizer-local graph was too sparse for the beam to route
  // around cell boundaries (graph-ANN recall 0.25); at 12 the
  // symmetrized graph carries ~24 links/node, HNSW's usual M-class
  // budget, and recall reaches ~0.91 at sf0.1. Edge list stays n·k.
  private val KnnK = 12

  /** CTE chain producing the kNN-graph edge list as `edg (src, nbr)`
    * (+ the ranked form `rkk`); shared by the qs_knn_graph oracle, the
    * qg_coloring oracle (which reads the symmetrized `edg`), and the
    * graph-ANN search oracle (which AUGMENTS `edg1` with the
    * cross-cell long links into `edgh` — see graphAnnSql). Requires
    * nothing in scope; defines `e0` (the corpus) itself.
    */
  private[analytics] val knnEdgeCtes =
    s"""e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ${lloydSqlDyn(IvfIters)},
    scs AS (SELECT vec_id, v,
      list_transform(generate_series(1, len(w)), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS sc
      FROM e0, cw$IvfIters),
    e AS (SELECT vec_id, v, list_position(sc, list_max(sc)) AS cell FROM scs),
    pr AS (SELECT a.vec_id AS src, b.vec_id AS nbr, a.v AS va, b.v AS vb
      FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
    sc2 AS (SELECT src, nbr, $cosineSql AS cosine FROM pr),
    rkk AS (SELECT src, nbr, cosine,
      ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, nbr) AS rank
      FROM sc2),
    edg1 AS (SELECT src, nbr FROM rkk WHERE rank <= $KnnK),
    edg AS (SELECT src, nbr FROM edg1 UNION ALL SELECT nbr, src FROM edg1)"""

  private val knnSql =
    s"""WITH $knnEdgeCtes
    SELECT src, rank, nbr, cosine FROM rkk WHERE rank <= $KnnK
    ORDER BY src, rank"""

  // -------------------- cross-cell long-range edges (HNSW navigability)
  /** Long-range edges that make the quantizer-local kNN graph NAVIGABLE —
    * the HNSW/DiskANN structural insight (Malkov & Yashunin 2018 §4.1):
    * greedy/beam routing needs links that cross the coarse partition.
    * [[knnGraph]]'s edges live strictly inside one quantizer cell, so a
    * beam could only ever reach clusters it was seeded in; the r8–r10
    * search compensated with a corpus-scaled entry set (one entry per 10
    * vectors — an O(n/10) scored frontier per query). These edges fix the
    * GRAPH instead: every vector also links to its `xK` nearest neighbors
    * inside each of its `xCells` next-best quantizer cells (score ranks
    * 2..xCells+1), so routing hops across cell boundaries and a small
    * fixed entry set suffices (recall 0.45 → 0.94 at 24 entries, sf0.1).
    *
    * Scale shape: the (vector, secondary-cell) frame is n·xCells rows;
    * the candidate join is blocked per cell exactly like [[knnGraph]]'s
    * intra-cell join; the per-(src, cell) top-xK window rides the same
    * uniform src keys. Total added edges: n·xCells·xK — the edge list
    * stays n·const. Cell ranks come from the same dot-score vector the
    * argmax assignment reads (literal path: an array_sort on codegen'd
    * scores, no shuffle) or from the broadcast codebook join (large-C
    * path, same volume [[withArgmaxCell]] already processes).
    *
    * Output: (src, nbr, cosine) — union with the primary edges and
    * symmetrize before searching.
    */
  def crossCellEdges(corpus: org.apache.spark.sql.DataFrame,
      cents: Seq[Seq[Double]], xCells: Int, xK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      literalMax: Int = CentroidLiteralMax): org.apache.spark.sql.DataFrame =
    crossEdgesFrom(assignWithSecondaries(
      prep(corpus, idCol, vecCol), cents, xCells, literalMax), xK)
      .select(col("src"), col("nbr"), col("cosine"))

  /** (vec_id, v, nrm, cell, xcells): primary cell (argmax) plus the
    * `xCells` next-best cells from ONE dot-score pass — ties break to
    * the smaller cell id, the same rule as [[withArgmaxCell]] and the
    * SQL mirrors. Literal path sorts (-score, cell) structs in-row
    * (map-only, whole-stage codegen); the large-C path ranks the
    * broadcast codebook join with a per-vector window (n·C rows — the
    * volume the assignment join already processes).
    */
  private def assignWithSecondaries(p: org.apache.spark.sql.DataFrame,
      cents: Seq[Seq[Double]], xCells: Int,
      literalMax: Int = CentroidLiteralMax): org.apache.spark.sql.DataFrame = {
    require(xCells >= 1, s"xCells must be >= 1, got $xCells")
    require(cents.size > xCells,
      s"need more centroids (${cents.size}) than secondary cells ($xCells)")
    if (cents.size <= literalMax)
      p.withColumn("_sc", graft_dot_scores(typedLit(cents), col("v")))
        .withColumn("cell", expr("array_position(_sc, array_max(_sc))"))
        .withColumn("xcells", expr(
          s"transform(slice(array_sort(transform(_sc, (s, i) -> struct(-s AS ns, i + 1 AS c))), 2, $xCells), x -> CAST(x.c AS BIGINT))"))
        .drop("_sc")
    else {
      val spark = p.sparkSession
      val codebook = broadcast(spark.createDataFrame(
          cents.zipWithIndex.map { case (w, i) => ((i + 1).toLong, w) })
        .toDF("_cell", "_w"))
      val wC = Window.partitionBy(col("vec_id"))
        .orderBy(col("_dot").desc, col("_cell"))
      val ranked = p.select(col("vec_id"), col("v")).crossJoin(codebook)
        .select(col("vec_id"), col("_cell"),
          graft_dot(col("_w"), col("v")).as("_dot"))
        .withColumn("_crk", row_number().over(wC))
        .filter(col("_crk") <= xCells + 1)
        .groupBy(col("vec_id"))
        .agg(max(when(col("_crk") === 1, col("_cell"))).as("cell"),
          sort_array(collect_list(when(col("_crk") > 1,
            struct(col("_crk"), col("_cell"))))).as("_xs"))
        .select(col("vec_id"), col("cell"),
          expr("transform(_xs, x -> x._cell)").as("xcells"))
      p.join(ranked, "vec_id")
    }
  }

  /** The cross-edge join + per-(src, cell) top-xK cut over an
    * [[assignWithSecondaries]] frame. Output keeps `cosine` for the
    * public operator; the memo drops it.
    */
  private def crossEdgesFrom(a: org.apache.spark.sql.DataFrame,
      xK: Int): org.apache.spark.sql.DataFrame = {
    require(xK >= 1, s"xK must be >= 1, got $xK")
    val sec = a.select(col("vec_id").as("src"), col("v").as("va"),
      col("nrm").as("na"), explode(col("xcells")).as("scell"))
    val tgt = a.select(col("cell").cast("long").as("scell"),
      col("vec_id").as("nbr"), col("v").as("vb"), col("nrm").as("nb"))
    val wX = Window.partitionBy(col("src"), col("scell"))
      .orderBy(col("cosine").desc, col("nbr"))
    withCosine(sec.join(tgt, Seq("scell")).filter(col("src") =!= col("nbr")))
      .withColumn("rank", row_number().over(wX))
      .filter(col("rank") <= xK)
      .select(col("src"), col("nbr"), col("cosine"))
  }

  /** Streaming maintenance twin of the navigable ANN graph — the
    * incremental-insert path for [[knnGraph]] + [[crossCellEdges]]
    * (HNSW's insert, re-expressed on engine-managed per-key state):
    * each arriving vector is routed to its primary cell (as a MEMBER)
    * and its `xCells` secondary cells (as a cross-link VISITOR), both
    * from the same one-pass dot-score assignment the batch build uses,
    * and a [[graft.streaming.GraphAnnInsertProcessor]] per quantizer
    * cell maintains every resident's exact top-k adjacency in RocksDB
    * as inserts arrive.
    *
    * Because the batch graph is cell-local by construction, the
    * maintained state equals the batch rebuild over the same arrivals
    * EDGE FOR EDGE (same tie rule, same cosines — pinned in
    * StreamingExtrasSpec), so search recall over the streamed graph is
    * identical to the bulk path's, not merely within ε. The codebook
    * rides the plan as a literal (C ≤ [[CentroidLiteralMax]]) — the
    * deployment contract is the IVF one: retrain periodically, restart
    * the query with the new codebook (state keyed by cell id must not
    * outlive its quantizer).
    *
    * Output (append mode, change-log): (cell, src, member, nbrs,
    * cosines, alive) — src's new adjacency within that cell; keep the
    * LATEST row per (cell, src) and drop rows whose latest emission has
    * alive = false (a tombstone). Member rows are the intra-cell kNN
    * edges, visitor rows the cross-cell links; symmetrize downstream
    * exactly as [[graphAnnSearch]]'s callers do.
    *
    * Deletes (r13): pass `deleteCol` — rows with the flag true remove
    * their id from the graph. A tombstone carries the SAME vector as
    * its insert (it must route to the identical primary + secondary
    * cells); the processor removes the resident, emits alive = false,
    * and re-links every survivor that pointed at a removed member by an
    * exact cell-local rescan, so the maintained graph equals the batch
    * rebuild over the survivor set under any insert/delete interleaving
    * (pinned in StreamingExtrasSpec). TTL expiry is INCOHERENT by
    * construction (r13 verdict): RocksDB drops expired MapState entries
    * without the re-link, so survivors keep adjacency edges into
    * vanished residents until some later arrival rewrites them.
    * Tombstones are therefore the ONLY supported expiry route — a
    * non-NONE `stateTtl` throws unless the caller passes
    * `allowIncoherentTtl = true` to opt into the documented staleness
    * (acceptable when the consumer re-validates neighbors at read
    * time, e.g. a serving layer that drops dead ids from beam results).
    */
  def graphAnnStream(vectors: org.apache.spark.sql.DataFrame,
      cents: Seq[Seq[Double]],
      k: Int = KnnK, xCells: Int = GXCells, xK: Int = GXK,
      idCol: String = "vec_id", vecCol: String = "embedding",
      stateTtl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE,
      deleteCol: String = "",
      allowIncoherentTtl: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig}
    require(stateTtl == TTLConfig.NONE || allowIncoherentTtl,
      "graphAnnStream: TTL expiry drops residents WITHOUT re-linking " +
        "survivors (orphan adjacency edges) — use explicit tombstones " +
        "via deleteCol for coherent expiry, or pass allowIncoherentTtl " +
        "= true to accept stale edges until the next arrival rewrites them")
    require(cents.size <= CentroidLiteralMax,
      s"graphAnnStream ships the codebook as a plan literal; C = " +
        s"${cents.size} exceeds $CentroidLiteralMax — shrink the " +
        "codebook or shard the stream (the large-C broadcast-join " +
        "assignment path needs a batch aggregation)")
    val spark = vectors.sparkSession
    import spark.implicits._
    // null-id rows are dropped (a null would kill the query inside the
    // primitive-Long deserializer); zero-norm vectors are dropped too —
    // their cosines are NaN, carrying no geometry (the batch build
    // ranks NaN first, a quirk not worth reproducing into state)
    // deleteCol (r13): rows with the flag true are tombstones — they
    // carry the SAME vector as the insert (a delete must route to the
    // identical primary + secondary cells), and the processor removes
    // the resident and re-links survivors exactly. Empty = insert-only.
    val del =
      if (deleteCol.isEmpty) lit(false)
      else coalesce(col(deleteCol).cast("boolean"), lit(false))
    // prep() inlined with the tombstone flag carried through (prep
    // projects id/vec only; assignWithSecondaries preserves extras)
    val prepped = vectors
      .select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"), del.as("_del"))
      .withColumn("nrm", sqrt(graft_dot(col("v"), col("v"))))
    val routed = assignWithSecondaries(prepped, cents, xCells)
      .filter(col("vec_id").isNotNull && col("nrm") > 0.0)
      .select(col("vec_id").cast("long").as("vec_id"), col("v"), col("nrm"),
        col("_del"),
        explode(expr(
          """concat(array(struct(CAST(cell AS BIGINT) AS c, true AS m)),
             transform(xcells, x -> struct(x AS c, false AS m)))""")).as("r"))
      .select(col("r.c").as("cell"), col("vec_id"),
        col("r.m").as("member"), col("v"), col("nrm"), col("_del"))
      .as[(Long, Long, Boolean, Array[Double], Double, Boolean)]
    val timeMode =
      if (stateTtl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    routed.groupByKey(_._1)
      .transformWithState(
        new graft.streaming.GraphAnnInsertProcessor(k, xK, stateTtl),
        timeMode, OutputMode.Append())
      .toDF("cell", "src", "member", "nbrs", "cosines", "alive")
  }

  /** One-scan cell assignment shared by the kNN-graph and cross-edge
    * builders: primary cell (argmax) PLUS the GXCells next-best cells,
    * all from a single codegen'd dot-score vector, checkpointed — the
    * "assignment stage table" both edge builds join against. Building
    * the secondary ranks here (instead of a second corpus scan inside
    * [[crossCellEdges]]) is what keeps the navigable-graph build at
    * roughly the r10 primary-only cost.
    */
  private def annAssignedMemo(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Memo.cached(s, s"annAssigned:$dir")(assignWithSecondaries(
      prep(Tables.embeddings(s, dir), "vec_id", "embedding"),
      dynTrained(s, dir), GXCells))

  /** Session-memoized kNN graph — built once, read by qs_knn_graph and
    * walked by qs_graph_ann (the same "index built once, queried many
    * times" economics a real deployment has). Same join/window as the
    * public [[knnGraph]], reading the shared assignment stage table.
    */
  private[graft] def knnEdgesMemo(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Memo.cached(s, s"knnEdges:$dir")(
      knnEdgesFrom(annAssignedMemo(s, dir)
        .select(col("vec_id"), col("v"), col("nrm"), col("cell")), KnnK))

  /** Session-memoized cross-cell long-range edges ([[crossCellEdges]]
    * semantics), built from the same assignment stage table — no second
    * corpus scan.
    */
  private[graft] def crossEdgesMemo(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Memo.cached(s, s"crossEdges:$dir")(
      crossEdgesFrom(annAssignedMemo(s, dir), GXK)
        .select(col("src"), col("nbr")))

  private val qKnn = GraftQuery(
    "qs_knn_graph",
    (s, dir) => knnEdgesMemo(s, dir),
    Some(knnSql))

  // ------------------------------ graph-based ANN (beam search on kNN)
  /** Graph-based ANN search — beam search over a prebuilt kNN graph, the
    * batch analogue of the NSW/HNSW/DiskANN search layer (Malkov &
    * Yashunin 2018): every query starts from a fixed entry set, and each
    * round expands the current beam through the graph's out-edges,
    * rescores, and keeps the best `beam` candidates; after `rounds` hops
    * the top `k` survive. Complementary recall path to cell probing
    * (IVF): edges cross cell boundaries wherever a vector's true
    * neighbors straddle the quantizer partition.
    *
    * Scale shape: the frontier is (queries × beam) rows — broadcast-
    * sized by construction. Per round: one hash join frontier⋈edges
    * (edge list is n·k, shuffled by src), then candidate vectors are
    * fetched by a BROADCAST of the candidate-id frame against one corpus
    * scan (never a corpus shuffle), and the rescore + beam cut is a
    * window over the per-query candidates. Rounds are few and fixed —
    * total corpus scans = rounds, like IVF's two.
    *
    * Output: (query_id, rank, cand_id, cosine), rank <= k.
    */
  /** The beam-search loop itself, returning EVERY round's beam frame
    * (r13; the recall-vs-rounds curve needs the intermediates — running
    * the search once per round count would walk R(R+1)/2 rounds and
    * re-score the entry layer R times). With allBeams = false the last
    * beam is left un-checkpointed (it feeds only one consumer).
    */
  private def graphAnnBeamsAll(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      entries: org.apache.spark.sql.DataFrame,
      edges: org.apache.spark.sql.DataFrame,
      beam: Int, rounds: Int,
      entryK: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      allBeams: Boolean = false): List[org.apache.spark.sql.DataFrame] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // entryK: how many scored entry points seed the beam (HNSW-style
    // descent keeps this well below the working beam width; 0 = beam)
    val eK = if (entryK > 0) entryK else beam
    val q = prep(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("v").as("va"), col("nrm").as("na"))
    val corp = prep(corpus, idCol, vecCol)
      .select(col("vec_id").as("cand_id"), col("v").as("vb"), col("nrm").as("nb"))
    val wB = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    def topBeam(scored: org.apache.spark.sql.DataFrame, cut: Int) =
      scored.withColumn("rk", row_number().over(wB))
        .filter(col("rk") <= cut)
        .select(col("query_id"), col("cand_id"), col("cosine"))
    val ent = prep(entries, idCol, vecCol)
      .select(col("vec_id").as("cand_id"), col("v").as("vb"), col("nrm").as("nb"))
    // each round's beam is (queries x beam) rows — checkpoint it so round
    // r+1's plan starts from the materialized frontier instead of
    // re-deriving (and re-executing) every earlier round inside both
    // branches of the expansion union
    var beamDf = topBeam(withCosine(ent.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))), eK).localCheckpoint()
    val perRound = scala.collection.mutable.ListBuffer.empty[org.apache.spark.sql.DataFrame]
    for (r <- 1 to rounds) {
      val expanded = edges.select(col("src").as("cand_id"), col("nbr"))
        .join(broadcast(beamDf.select(col("query_id"), col("cand_id"))),
          Seq("cand_id"))
        .select(col("query_id"), col("nbr").as("cand_id"))
        .union(beamDf.select(col("query_id"), col("cand_id")))
        .filter(col("query_id") =!= col("cand_id"))
        .distinct()
      val next = topBeam(withCosine(
        corp.join(broadcast(expanded), Seq("cand_id"))
          .join(broadcast(q.select(col("query_id"), col("va"), col("na"))),
            Seq("query_id"))), beam)
      // interior beams feed two branches of the next expansion (and its
      // broadcast) — materialize; the last beam feeds only the final cut
      // (or the per-round curve when allBeams asked for it)
      beamDf = if (r < rounds || allBeams) next.localCheckpoint() else next
      perRound += beamDf
    }
    perRound.toList
  }

  /** Beam search over a STREAM-MAINTAINED graph — the serve side of
    * [[graphAnnStream]] (r13 verdict task 8: bm25Stream got
    * bm25RankFromPostings; this closes the same maintain-but-can't-serve
    * asymmetry for the ANN tier).
    *
    * `state` is the maintained snapshot of the change-log: the LATEST
    * row per (cell, src) — exactly what the documented consumer keeps.
    * Tombstoned rows (latest emission alive = false) are dropped here;
    * live member rows contribute the intra-cell kNN adjacency, visitor
    * rows the cross-cell links, and both are symmetrized exactly as the
    * batch callers symmetrize [[knnGraph]] ∪ [[crossCellEdges]].
    * `residents` carries the live ids' vectors (the ingest side owns
    * them — the change-log intentionally ships adjacency, not
    * embeddings); entries are the same `id % entryMod == 0` sample the
    * batch walker seeds from. With the r13 pin that the maintained
    * graph EQUALS the batch rebuild edge for edge, this search is
    * bit-identical to [[graphAnnSearch]] over a batch-built index on
    * the same residents (pinned in StreamingExtrasSpec).
    */
  def graphAnnSearchFromState(state: org.apache.spark.sql.DataFrame,
      residents: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      k: Int, beam: Int = GBeam, rounds: Int = GRounds,
      entryMod: Long = GEntryMod.toLong, entryK: Int = GEntryK,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val base = state.filter(col("alive"))
      .select(col("src"), explode(col("nbrs")).as("nbr"))
    val sym = base.union(
      base.select(col("nbr").as("src"), col("src").as("nbr")))
    val entries = residents.filter(col(idCol) % entryMod === 0)
    graphAnnSearch(residents, queries, entries, sym, k, beam, rounds,
      entryK, idCol, vecCol)
  }

  /** Beam search — the top-k cut of [[graphAnnBeamsAll]]'s final round. */
  def graphAnnSearch(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      entries: org.apache.spark.sql.DataFrame,
      edges: org.apache.spark.sql.DataFrame,
      k: Int, beam: Int, rounds: Int,
      entryK: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    require(beam >= k, s"beam ($beam) must be >= k ($k)")
    require(entryK <= 0 || entryK >= k, s"entryK ($entryK) must be >= k ($k)")
    topK(graphAnnBeamsAll(corpus, queries, entries, edges, beam, rounds,
      entryK, idCol, vecCol, allBeams = false).last, k)
  }

  // r11 retune (HNSW 2-layer): with [[crossCellEdges]] making the graph
  // navigable, the search no longer buys recall with a huge entry set
  // and a wide beam — a small entry layer plus beam 40 reaches recall
  // 0.94 at sf0.1, vs 0.87 for the r10 setup (200 entries, beam 60, 3
  // rounds). Measured ladder (sf0.1): without cross edges, 24 entries
  // collapse to 0.45 — the navigability is the cross-cell links, not
  // the beam width. Frontier stays queries×beam rows — broadcast-sized.
  //
  // r12 retune (the descent step): the entry layer was the one term
  // still LINEAR in n per query batch (scoring every 16th vector). The
  // small-world graph itself does the descent HNSW uses extra layers
  // for, so the entry sample sparsens 16× (every 256th vector) and the
  // beam runs ONE more constant-cost round. Measured A/B at sf0.1 under
  // identical load: recall 0.94 -> 0.94 (2 rounds at mod 256 drop to
  // 0.64 — the third round IS the descent), index+recall harness
  // 5.60+5.52 s -> 4.56+4.86 s. At 100× the saved entry term dominates:
  // rounds cost O(queries·beam·degree) regardless of n, entries cost
  // O(n/mod); extend the ladder (mod 4096 + round 4) when n/256 itself
  // gets large — EXPLAINS_r12 §1.
  private val GBeam = 40
  private val GRounds = 3
  private val GEntryMod = 256
  private val GEntryK = 24
  // r13 (verdict task 4): the ladder is SELF-SIZING along two
  // independent axes. ENTRY MOD follows the cost budget — sparsen 16×
  // whenever the per-query entry scan n/mod would exceed GEntryBudget
  // candidates (the only n-linear search term stays bounded). BEAM and
  // ROUNDS follow recall, per DECADE of corpus: the sf1/sf10
  // rehearsals measured that a fixed beam decays with n regardless of
  // entries or rounds (beam 40: 0.94 → 0.79 → —; beam 120: — → 0.97 →
  // 0.72), so the search effort scales beam ×3 / rounds +1 per 10× n —
  // three calibrated points all ≥ 0.94 on the isotropic corpus
  // (2k: 40/3, 20k: 120/4, 200k: 360/5); EXPLAINS_r13 §3, the HNSW
  // grow-ef-with-n convention, here beam ∝ n^0.48 because the flat
  // cell-local graph has no hierarchy to lean on. Per-round cost is
  // O(queries·beam·degree), n-independent. sf0.01 (n=500) and sf0.1
  // (n=2000) both select the base config, so the static DuckDB oracle
  // — which bakes in mod 256 / 3 rounds / beam 40 — stays exact at
  // every gate sf.
  private val GEntryBudget = 64L
  // Beam/rounds scale PER DECADE of corpus, decoupled from the entry
  // mod: the sf10 rehearsal showed within-rung decay (n=200k still
  // selects mod 4096, but beam 120 reads 0.72 recall — the rung
  // boundary is an entry-COST rule and says nothing about search
  // effort). Three calibrated points, each ≥ 0.94 recall on the
  // isotropic corpus: (2k: beam 40, 3 rounds) (20k: 120, 4)
  // (200k: 360, 5) — beam ×3 and rounds +1 per 10× n, i.e. beam
  // ∝ n^0.48. ceil on the decade is the recall-safe rounding for
  // intermediate sizes (costs beam, never recall).
  private[graft] def entryLadder(n: Long): (Long, Int, Int) = {
    var mod = GEntryMod.toLong
    while (n / mod > GEntryBudget) mod *= 16
    val dec = math.max(0,
      math.ceil(math.log10(n / 2000.0) - 1e-9).toInt)
    (mod, GRounds + dec, GBeam * math.pow(3, dec).toInt)
  }
  // 3 secondary cells × 2 links each: +6 edges/node before
  // symmetrization — HNSW's usual long-link budget next to KnnK = 12
  private val GXCells = 3
  private val GXK = 2

  // CTE body shared by qs_graph_ann and qs_graph_ann_rounds (r13):
  // index build + entry scoring + the GRounds beam rounds, no final cut
  private val graphAnnCtes = {
    val cv = "cv AS (SELECT vec_id AS cand_id, v AS vb FROM e0)"
    val roundCtes = (1 to GRounds).map { r =>
      s"""c$r AS (SELECT DISTINCT query_id, cand_id FROM (
        SELECT query_id, cand_id FROM b${r - 1}
        UNION ALL
        SELECT b.query_id, g.nbr AS cand_id FROM b${r - 1} b JOIN edgh g ON g.src = b.cand_id)
      WHERE query_id <> cand_id),
    sc_$r AS (SELECT c.query_id, c.cand_id, $cosineSql AS cosine
      FROM c$r c JOIN qv ON qv.query_id = c.query_id
      JOIN cv ON cv.cand_id = c.cand_id),
    b$r AS (SELECT query_id, cand_id, cosine FROM (
        SELECT query_id, cand_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rk
        FROM sc_$r) WHERE rk <= $GBeam)"""
    }
    // edgh = the primary intra-cell edges + the crossCellEdges long
    // links (score ranks 2..GXCells+1, top GXK per (src, cell)),
    // symmetrized — the navigable graph the beam actually walks
    s"""$knnEdgeCtes,
    scr AS (SELECT s.vec_id, s.v, g.c AS scell,
      ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY s.sc[g.c] DESC, g.c) AS crk
      FROM scs s, cells g),
    secx AS (SELECT vec_id, v, scell FROM scr WHERE crk BETWEEN 2 AND ${GXCells + 1}),
    prx AS (SELECT a.vec_id AS src, b.vec_id AS nbr, a.scell, a.v AS va, b.v AS vb
      FROM secx a JOIN e b ON b.cell = a.scell AND a.vec_id <> b.vec_id),
    scx AS (SELECT src, nbr, scell, $cosineSql AS cosine FROM prx),
    rkx AS (SELECT src, nbr, cosine,
      ROW_NUMBER() OVER (PARTITION BY src, scell ORDER BY cosine DESC, nbr) AS rank
      FROM scx),
    edgx AS (SELECT src, nbr FROM rkx WHERE rank <= $GXK),
    edg1b AS (SELECT src, nbr FROM edg1 UNION ALL SELECT src, nbr FROM edgx),
    edgh AS (SELECT src, nbr FROM edg1b UNION ALL SELECT nbr, src FROM edg1b),
    qv AS (SELECT vec_id AS query_id, v AS va FROM e0 WHERE vec_id < $NQ),
    $cv,
    ev AS (SELECT vec_id AS cand_id, v AS vb FROM e0 WHERE vec_id % $GEntryMod = 0),
    sc_0 AS (SELECT query_id, cand_id, $cosineSql AS cosine
      FROM qv, ev WHERE query_id <> cand_id),
    b0 AS (SELECT query_id, cand_id, cosine FROM (
        SELECT query_id, cand_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rk
        FROM sc_0) WHERE rk <= $GEntryK),
    ${roundCtes.mkString(",\n    ")}"""
  }

  private val graphAnnSql =
    s"""WITH $graphAnnCtes
    SELECT query_id, rank, cand_id, cosine FROM (
      SELECT query_id, cand_id, cosine,
        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM b$GRounds) WHERE rank <= $K
    ORDER BY query_id, rank"""

  // recall@K after each beam round against the exact top-K — the
  // in-oracle pin of "the round IS the descent" (r12's measured A/B,
  // now a hash-checked curve): recall must be non-decreasing in rounds
  // and the last row equals qs_ann_recall's graph_ann figure
  private val graphAnnRoundsSql = {
    val xact = s"""xp AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS va, c.v AS vb
      FROM e0 q JOIN e0 c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    xsc AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM xp),
    xtop AS (SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
        FROM xsc) WHERE rank <= $K)"""
    val recCtes = (1 to GRounds).map { r =>
      s"""tr$r AS (SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rk
        FROM b$r) WHERE rk <= $K),
    rec$r AS (SELECT CAST($r AS BIGINT) AS rounds,
      CAST(SUM(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*) AS recall
      FROM xtop x LEFT JOIN tr$r t
        ON t.query_id = x.query_id AND t.cand_id = x.cand_id)"""
    }
    val union = (1 to GRounds).map(r => s"SELECT rounds, recall FROM rec$r")
      .mkString(" UNION ALL ")
    s"""WITH $graphAnnCtes,
    $xact,
    ${recCtes.mkString(",\n    ")}
    SELECT rounds, recall FROM ($union) ORDER BY rounds"""
  }

  /** Session-memoized graph-ANN search result — qs_graph_ann's binding
    * and qs_ann_recall's graph_ann branch read the same frame, so the
    * beam search runs once per (session, sf) like the kNN index it
    * walks.
    */
  /** The navigable graph the beam walks — intra-cell kNN edges +
    * cross-cell long links (HNSW 2-layer, r11), SYMMETRIZED (HNSW keeps
    * links bidirectional): reverse edges double routing connectivity at
    * zero build cost. Both edge memos are session-cached.
    */
  private[graft] def navigableEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val e = knnEdgesMemo(s, dir)
    val x = crossEdgesMemo(s, dir)
    val base = e.select(col("src"), col("nbr"))
      .union(x.select(col("src"), col("nbr")))
    base.union(base.select(col("nbr").as("src"), col("src").as("nbr")))
  }

  /** The base ladder rung every static oracle SQL bakes in (mod 256, 3
    * rounds, beam 40) — [[graphAnnSql]]/[[graphAnnRoundsSql]] are fixed
    * text, so an oracle-compared sf whose corpus selects a HIGHER rung
    * would hash-mismatch with no hint at the cause (r13 ADVICE). The
    * ladder is correct behavior at scale; [[ladderFor]] logs loudly
    * when a non-base config is selected so the divergence self-diagnoses.
    */
  private val LadderBase = (GEntryMod.toLong, GRounds, GBeam)

  /** entryLadder over the memoized corpus count — ONE count job per
    * (session, sf) instead of one per ANN query (r13 verdict item 7;
    * parquet metadata makes each cheap at bench sf, but it was an
    * unmemoized repeated job on the hot path).
    */
  private[graft] def ladderFor(s: org.apache.spark.sql.SparkSession,
      dir: String): (Long, Int, Int) = {
    val n = Memo.value(s, s"embCount:$dir")(Tables.embeddings(s, dir).count())
    val cfg = entryLadder(n)
    if (cfg != LadderBase)
      System.err.println(s"[graft-ann] WARN: entryLadder selected non-base config " +
        s"(mod, rounds, beam) = $cfg for n = $n at $dir — the static " +
        s"oracle SQL bakes $LadderBase; an oracle hash mismatch on " +
        "qs_graph_ann/qs_graph_ann_rounds at this sf is the ladder, " +
        "not the search")
    cfg
  }

  private[graft] def graphAnnMemo(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Memo.cached(s, s"graphAnnTopK:$dir") {
      val corpus = Tables.embeddings(s, dir)
      // self-sizing entry ladder: one memoized count() picks the
      // config; base at every oracle sf (see entryLadder/ladderFor)
      val (mod, rounds, beam) = ladderFor(s, dir)
      graphAnnSearch(corpus,
        corpus.filter(col("vec_id") < NQ),
        corpus.filter(col("vec_id") % mod === 0),
        navigableEdges(s, dir), K, beam, rounds, GEntryK)
    }

  private val qGraphAnn = GraftQuery(
    "qs_graph_ann",
    (s, dir) => graphAnnMemo(s, dir),
    Some(graphAnnSql))

  /** Recall@K after EACH beam round vs the exact top-K — the r12 "the
    * round IS the descent" A/B as a hash-checked oracle curve: recall
    * must climb with rounds, and the final row equals qs_ann_recall's
    * graph_ann figure. Shares the memoized navigable graph; one extra
    * exact baseline (broadcast-query corpus scan) checkpointed across
    * the per-round joins.
    */
  private val qGraphAnnRounds = GraftQuery(
    "qs_graph_ann_rounds",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val q = corpus.filter(col("vec_id") < NQ)
      val exact = cosineTopK(corpus, q, K).localCheckpoint()
      val sym = navigableEdges(s, dir)
      val (mod, rounds, beam) = ladderFor(s, dir)
      // ONE search pass: every round's beam comes back checkpointed, so
      // the curve costs the same rounds the plain search walks (r13
      // review — per-round re-search would walk R(R+1)/2 rounds)
      val beams = graphAnnBeamsAll(corpus, q,
        corpus.filter(col("vec_id") % mod === 0), sym, beam, rounds,
        GEntryK, allBeams = true)
      beams.zipWithIndex.map { case (b, i) =>
        annRecall(exact, topK(b, K))
          .select(lit((i + 1).toLong).as("rounds"), col("recall"))
      }.reduce(_.unionByName(_)).orderBy(col("rounds"))
    },
    Some(graphAnnRoundsSql))

  /** Bench warm-up hook: forces the kNN index + beam-search memo shared
    * by qs_knn_graph / qs_graph_ann / qs_ann_recall onto its own timed
    * line.
    */
  def warmGraphAnnIndex(s: org.apache.spark.sql.SparkSession,
      dir: String): Unit = graphAnnMemo(s, dir).count(): Unit

  private val qRecall = GraftQuery(
    "qs_ann_recall",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val q = corpus.filter(col("vec_id") < NQ)
      // barrier the exact baseline: all twelve recall branches join
      // against it, and without materialization each branch re-runs the
      // brute-force corpus scan (12× the dominant cost of this query)
      val exact = cosineTopK(corpus, q, K).localCheckpoint()
      // one shared training run: the ivf_trained and ivfpq branches use the
      // identical quantizer, so Lloyd runs once, not twice (memoized —
      // qs_ivf_probe_curve reads the same centroids)
      val trained = trainedCents(s, dir)
      annRecall(exact, annIvf(corpus, q, K)).withColumn("method", lit("ivf"))
        .unionByName(
          annRecall(exact, annIvf(corpus, q, K, trained))
            .withColumn("method", lit("ivf_trained")))
        .unionByName(
          annRecall(exact, annIvf(corpus, q, K, trained, nprobe = 4))
            .withColumn("method", lit("ivf_t4")))
        .unionByName(
          annRecall(exact, ivfPqTopK(corpus, q, K, cents = trained))
            .withColumn("method", lit("ivfpq")))
        .unionByName(
          annRecall(exact, ivfPqTopK(corpus, q, K, cents = trained, residual = true))
            .withColumn("method", lit("ivfpq_res")))
        .unionByName(
          annRecall(exact, annLsh(corpus, q, K)).withColumn("method", lit("lsh")))
        .unionByName(
          annRecall(exact, annLshMultiProbe(corpus, q, K))
            .withColumn("method", lit("lsh_mp")))
        .unionByName(
          annRecall(exact, pqTopK(corpus, q, K)).withColumn("method", lit("pq")))
        .unionByName(
          annRecall(exact, rpTopK(corpus, q, K)).withColumn("method", lit("rp")))
        .unionByName(
          // fuse the two strongest tuned legs (multi-probe LSH + trained
          // IVF at nprobe 4) — RRF should beat both, not average in a
          // weak leg
          annRecall(exact, rrfFuse(Seq(annLshMultiProbe(corpus, q, K),
              annIvf(corpus, q, K, trained, nprobe = 4)), K, RrfC))
            .withColumn("method", lit("rrf")))
        .unionByName(
          // NSW-style beam search over the memoized kNN graph (r8: beam
          // tuned 10→40, graph degree 3→12 — recall 0.25 → ~0.91 at
          // sf0.1, the strongest single leg; shares the qs_graph_ann
          // result frame)
          annRecall(exact, graphAnnMemo(s, dir))
            .withColumn("method", lit("graph_ann")))
        .unionByName(
          // 1-bit Hamming prefilter + exact rerank — the compression
          // ladder's floor, reported next to its PQ/SQ siblings
          annRecall(exact, binaryTopK(corpus, q, K, BqRerank))
            .withColumn("method", lit("binary")))
        .select(col("method"), col("recall"))
        .orderBy(col("method"))
    },
    Some(s"""${recallBranchSql("ivf", ivfSql)}
      UNION ALL ${recallBranchSql("ivf_trained", ivfTrainedSql)}
      UNION ALL ${recallBranchSql("ivf_t4", ivfTrained4Sql)}
      UNION ALL ${recallBranchSql("ivfpq", ivfpqSql)}
      UNION ALL ${recallBranchSql("ivfpq_res", ivfpqResSql)}
      UNION ALL ${recallBranchSql("lsh", lshSql)}
      UNION ALL ${recallBranchSql("lsh_mp", lshMpSql)}
      UNION ALL ${recallBranchSql("pq", pqSql)}
      UNION ALL ${recallBranchSql("rp", rpSql)}
      UNION ALL ${recallBranchSql("rrf", rrf2Sql)}
      UNION ALL ${recallBranchSql("graph_ann", graphAnnSql)}
      UNION ALL ${recallBranchSql("binary", binarySql)} ORDER BY method"""))

  // ------------------------------------- hard-negative mining
  /** Hard-negative mining for contrastive / embedding training data
    * (the ANCE / DPR-style negative sampler): from a scored candidate
    * pool, drop each query's positives and everything so similar it is
    * probably a paraphrase of the positive (cosine >= `capRatio` x the
    * query's best positive score — the "false negative" guard), then
    * keep the top `k` HARDEST remaining candidates (highest cosine).
    *
    * Takes the scored pool as input — any retrieval tier (exact, IVF,
    * graph) produces it — so the mining itself is one broadcast
    * anti-join + one per-query threshold join + a rank window. Output:
    * (query_id, rank, cand_id, cosine).
    */
  def hardNegatives(scored: org.apache.spark.sql.DataFrame,
      positives: org.apache.spark.sql.DataFrame,
      k: Int, capRatio: Double): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(capRatio > 0.0 && capRatio <= 1.0,
      s"capRatio must be in (0, 1], got $capRatio")
    val pos = positives.select(col("query_id"), col("cand_id"))
    val posBest = scored.join(broadcast(pos), Seq("query_id", "cand_id"))
      .groupBy(col("query_id")).agg(max(col("cosine")).as("pos_cos"))
    val negs = scored
      .join(broadcast(pos).withColumn("is_pos", lit(1)),
        Seq("query_id", "cand_id"), "left_anti")
      .join(broadcast(posBest), Seq("query_id"))
      .filter(col("cosine") < col("pos_cos") * capRatio)
    topK(negs, k)
  }

  private val HnPoolK = 20
  private val HnK = 5
  private val HnRatio = 0.9

  private val hardNegSql =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS va, c.v AS vb
      FROM e q JOIN e c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    sc AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM p),
    rk AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc),
    pool AS (SELECT query_id, cand_id, cosine FROM rk WHERE rank <= $HnPoolK),
    pos AS (SELECT query_id, cand_id FROM rk WHERE rank = 1),
    pb AS (SELECT p2.query_id, MAX(p2.cosine) AS pos_cos FROM pool p2
      JOIN pos ON pos.query_id = p2.query_id AND pos.cand_id = p2.cand_id
      GROUP BY p2.query_id),
    ng AS (SELECT p2.query_id, p2.cand_id, p2.cosine FROM pool p2
      JOIN pb ON pb.query_id = p2.query_id
      WHERE NOT EXISTS (SELECT 1 FROM pos
        WHERE pos.query_id = p2.query_id AND pos.cand_id = p2.cand_id)
        AND p2.cosine < pb.pos_cos * $HnRatio),
    rk2 AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM ng)
    SELECT query_id, rank, cand_id, cosine FROM rk2 WHERE rank <= $HnK
    ORDER BY query_id, rank"""

  private val qHardNeg = GraftQuery(
    "qs_hard_negatives",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val q = corpus.filter(col("vec_id") < NQ)
      val pool = cosineTopK(corpus, q, HnPoolK)
      hardNegatives(pool, pool.filter(col("rank") === 1), HnK, HnRatio)
    },
    Some(hardNegSql))

  // ------------------------- dimension-truncation (matryoshka) recall
  /** Truncated-dimension retrieval recall — the Matryoshka evaluation
    * (Kusupati et al. 2022): search with only the first `dims` vector
    * components and measure recall@k against the full-dimension exact
    * top-k. The operational question it answers is the standard
    * index-sizing one: how many leading dimensions does the corpus need
    * at query time before recall plateaus (prefix search is `dims`/D of
    * the bandwidth and index size). One corpus scan per tested width,
    * query side broadcast throughout. Output: (dims, recall).
    */
  def dimTruncationRecall(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int, dimsList: Seq[Int],
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    require(dimsList.nonEmpty && dimsList.forall(_ >= 1),
      s"dimsList must be non-empty positive, got $dimsList")
    val exact = cosineTopK(corpus, queries, k, idCol, vecCol).localCheckpoint()
    def trunc(df: org.apache.spark.sql.DataFrame, d: Int) =
      df.select(col(idCol),
        slice(col(vecCol).cast("array<double>"), 1, d).as(vecCol))
    dimsList.map { d =>
      annRecall(exact, cosineTopK(trunc(corpus, d), trunc(queries, d), k, idCol, vecCol))
        .withColumn("dims", lit(d))
        .select(col("dims"), col("recall"))
    }.reduce(_ union _).orderBy(col("dims"))
  }

  private val MrlDims = Seq(16, 32)

  private val mrlSql = {
    def cosD(d: Int) =
      s"list_reduce(list_transform(generate_series(1, $d), i -> va[i] * vb[i]), (x, y) -> x + y)" +
        s" / (sqrt(list_reduce(list_transform(generate_series(1, $d), i -> va[i] * va[i]), (x, y) -> x + y))" +
        s" * sqrt(list_reduce(list_transform(generate_series(1, $d), i -> vb[i] * vb[i]), (x, y) -> x + y)))"
    val perD = MrlDims.map { d =>
      s"""sc$d AS (SELECT query_id, cand_id, ${cosD(d)} AS cosine FROM p),
    ap$d AS (SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
        FROM sc$d) WHERE rank <= $K),
    r$d AS (SELECT $d AS dims,
      CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*) AS recall
      FROM ex LEFT JOIN ap$d a
        ON a.query_id = ex.query_id AND a.cand_id = ex.cand_id)"""
    }
    val allR = MrlDims.map(d => s"SELECT dims, recall FROM r$d").mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS va, c.v AS vb
      FROM e q JOIN e c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    scf AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM p),
    ex AS (SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
        FROM scf) WHERE rank <= $K),
    ${perD.mkString(",\n    ")}
    SELECT CAST(dims AS INT) AS dims, recall FROM ($allR) ORDER BY dims"""
  }

  private val qMrl = GraftQuery(
    "qs_mrl_recall",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      dimTruncationRecall(corpus, corpus.filter(col("vec_id") < NQ), K, MrlDims)
    },
    Some(mrlSql))

  // ------------------------------------------- MMR diversified re-rank
  private val MmrPoolK = 20
  private val MmrK = 5
  private val MmrLambda = 0.5

  /** Greedy Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998) — the standard RAG-serving diversification pass: from a
    * retrieval pool, pick `k` results that trade relevance against
    * redundancy, `score(c) = λ·rel(c) − (1−λ)·max_{s∈S} cos(c, s)`,
    * selecting the argmax each step (ties → smallest cand_id; the first
    * step has no selected set, so its penalty term is 0).
    *
    * Scale shape: the corpus appears ONLY in the retrieval pool build
    * ([[cosineTopK]] here — any ANN tier composes the same way) and in one
    * broadcast-pool hash join that attaches candidate vectors (one corpus
    * scan, zero corpus shuffle). The greedy selection itself runs on the
    * pool — |Q|·poolK rows, proportional to query load, not corpus size —
    * via `groupByKey(query_id).flatMapGroups`: MMR's step-t choice depends
    * on steps 1..t−1, so it is inherently sequential per query; a
    * relational unroll would be k self-joins over the same tiny frame.
    * Per-group cost is O(k·poolK·dim) with the running-max-similarity
    * cache (max is order-independent, so the cache is bit-identical to
    * re-maxing over the selected set, which is what the oracle computes).
    *
    * Determinism: rel comes from the oracle-matched [[cosineTopK]] plan;
    * pairwise cosines accumulate in ascending index order (the same
    * sequential fold as the DuckDB `list_reduce` twin) → bit-identical
    * doubles cross-engine.
    *
    * Output: (query_id, step, cand_id, score), steps 1..k per query.
    */
  def mmrRerank(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = MmrK,
      poolK: Int = MmrPoolK, lambda: Double = MmrLambda,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && poolK >= k, s"need poolK >= k >= 1, got k=$k poolK=$poolK")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val sp = corpus.sparkSession
    import sp.implicits._
    val pool = cosineTopK(corpus, queries, poolK, idCol, vecCol)
      .select(col("query_id"), col("cand_id"), col("cosine").as("rel"))
    val pv = corpus
      .select(col(idCol).as("cand_id"), col(vecCol).cast("array<double>").as("v"))
      .join(broadcast(pool), "cand_id")
      .select(col("query_id"), col("cand_id"), col("rel"), col("v"))
      .as[(Long, Long, Double, Seq[Double])]
    pv.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // ascending cand_id so a strict > keeps the smallest id on ties
        val cs = it.toArray.sortBy(_._2)
        val vs = cs.map(_._4.toArray)
        val nrm = vs.map { v =>
          var acc = 0.0; var i = 0
          while (i < v.length) { acc += v(i) * v(i); i += 1 }
          math.sqrt(acc)
        }
        def cosAt(a: Int, b: Int): Double = {
          val va = vs(a); val vb = vs(b)
          var acc = 0.0; var i = 0
          val n = math.min(va.length, vb.length)
          while (i < n) { acc += va(i) * vb(i); i += 1 }
          acc / (nrm(a) * nrm(b))
        }
        val n = cs.length
        val taken = new Array[Boolean](n)
        // running max-similarity to the selected set; max is
        // order-independent so this equals re-maxing per step
        val maxSim = Array.fill(n)(Double.NegativeInfinity)
        val out = Array.newBuilder[(Long, Int, Long, Double)]
        var step = 1
        val kk = math.min(k, n)
        while (step <= kk) {
          var bi = -1; var bs = 0.0
          var i = 0
          while (i < n) {
            if (!taken(i)) {
              val ms = if (step == 1) 0.0 else maxSim(i)
              val sc = lambda * cs(i)._3 - (1 - lambda) * ms
              if (bi == -1 || sc > bs) { bi = i; bs = sc }
            }
            i += 1
          }
          taken(bi) = true
          out += ((qid, step, cs(bi)._2, bs))
          i = 0
          while (i < n) {
            if (!taken(i)) maxSim(i) = math.max(maxSim(i), cosAt(i, bi))
            i += 1
          }
          step += 1
        }
        out.result().iterator
      }
      .toDF("query_id", "step", "cand_id", "score")
      .orderBy(col("query_id"), col("step"))
  }

  /** One pairwise-cosine DuckDB expression between pool aliases `a.v`
    * and `b.v` — same sequential fold order as the Scala kernel above.
    */
  private def mmrCosSql(a: String, b: String) =
    s"list_reduce(list_transform(generate_series(1, 64), i -> $a.v[i] * $b.v[i]), (x, y) -> x + y)" +
      s" / (sqrt(list_reduce(list_transform($a.v, x -> x * x), (x, y) -> x + y))" +
      s" * sqrt(list_reduce(list_transform($b.v, x -> x * x), (x, y) -> x + y)))"

  /** Greedy step t as CTEs: m{t} scores the not-yet-selected pool rows
    * against the cumulative selection s{t-1}, p{t} is the per-query
    * argmax (ties → smallest cand_id), s{t} appends the pick.
    */
  private def mmrStepSql(t: Int): String =
    s"""m$t AS (SELECT c.query_id, c.cand_id, c.rel, MAX(${mmrCosSql("c", "p")}) AS ms
      FROM pv c JOIN s${t - 1} s ON s.query_id = c.query_id
      JOIN pv p ON p.query_id = s.query_id AND p.cand_id = s.cand_id
      WHERE NOT EXISTS (SELECT 1 FROM s${t - 1} x
        WHERE x.query_id = c.query_id AND x.cand_id = c.cand_id)
      GROUP BY c.query_id, c.cand_id, c.rel),
    t$t AS (SELECT query_id, cand_id, $MmrLambda * rel - ${1 - MmrLambda} * ms AS score FROM m$t),
    p$t AS (SELECT query_id, cand_id, score FROM (SELECT query_id, cand_id, score,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, cand_id) AS rk
      FROM t$t) WHERE rk = 1),
    s$t AS (SELECT * FROM s${t - 1}
      UNION ALL SELECT query_id, CAST($t AS INT) AS step, cand_id, score FROM p$t)"""

  private val mmrSql = s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pr AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS va, c.v AS vb
      FROM e q JOIN e c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    sc0 AS (SELECT query_id, cand_id, $cosineSql AS cosine FROM pr),
    rk0 AS (SELECT query_id, cand_id, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      FROM sc0),
    pool AS (SELECT query_id, cand_id, cosine AS rel FROM rk0 WHERE rank <= $MmrPoolK),
    pv AS (SELECT pool.query_id, pool.cand_id, pool.rel, e.v
      FROM pool JOIN e ON e.vec_id = pool.cand_id),
    t1 AS (SELECT query_id, cand_id, $MmrLambda * rel - ${1 - MmrLambda} * 0.0 AS score FROM pv),
    p1 AS (SELECT query_id, cand_id, score FROM (SELECT query_id, cand_id, score,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, cand_id) AS rk
      FROM t1) WHERE rk = 1),
    s1 AS (SELECT query_id, CAST(1 AS INT) AS step, cand_id, score FROM p1),
    ${(2 to MmrK).map(mmrStepSql).mkString(",\n    ")}
    SELECT query_id, step, cand_id, score FROM s$MmrK ORDER BY query_id, step"""

  private val qMmr = GraftQuery(
    "qs_mmr_rerank",
    (s, dir) => mmrRerank(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ)),
    Some(mmrSql))

  // ---------------------------- k-center greedy coreset selection
  /** Greedy k-center selection (farthest-point-first, Gonzalez 1985) —
    * the coreset / diversity data-pruning pass (Sener & Savarese, ICLR
    * 2018 use exactly this rule for training-set selection): pick the
    * point farthest from the corpus mean, then repeatedly the point
    * maximizing its minimum squared-L2 distance to everything selected
    * so far. The selected set is a 2-approximation of the optimal
    * k-center cover — the standard "most diverse k examples" subset.
    *
    * Scale shape: one exact-quantized mean pass ([[trainCentroids]] with
    * a single zero seed — BIGINT sums, shuffle-order independent), then
    * one corpus scan per selection round: distances against the ≤ k
    * selected vectors ride the fused [[graft_dot_scores]] kernel
    * (d²(x,s) = x·x − 2 x·s + s·s), argmax = `orderBy().limit(1)` =
    * TakeOrdered (per-partition top-1, ONE row to the driver per round —
    * the sanctioned driver-loop traffic class of [[trainCentroids]] /
    * BPE). k scans total, no joins, no shuffles beyond the top-1.
    *
    * Determinism: every distance is the same ascending-index fold in
    * both engines; ties broken by smallest vec_id.
    * Returns (sel_rank, vec_id, gap_d2) — gap_d2 is the covering radius
    * the pick closed (its min-d² at selection time).
    */
  def kCenterSelect(corpus: org.apache.spark.sql.DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Int, Long, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = prep(corpus, idCol, vecCol)
      .select(col("vec_id"), col("v"))
      .withColumn("xx", graft_dot(col("v"), col("v")))
    val mean: Seq[Double] =
      trainCentroids(corpus, Seq(Seq.fill(64)(0.0)), 1, idCol, vecCol).head
    val picked = scala.collection.mutable.ListBuffer.empty[(Int, Long, Double, Seq[Double])]
    for (r <- 1 to k) {
      val refs: Seq[Seq[Double]] =
        if (r == 1) Seq(mean) else picked.map(_._4).toSeq
      // driver-side self-dots use the same ascending fold as the oracle
      val ss: Seq[Double] = refs.map { s =>
        var a = 0.0; s.foreach(x => a += x * x); a
      }
      val row = base
        .withColumn("dots", graft_dot_scores(typedLit(refs), col("v")))
        .withColumn("ssl", typedLit(ss))
        .withColumn("md",
          expr("array_min(zip_with(dots, ssl, (d, q) -> xx - 2 * d + q))"))
        .orderBy(col("md").desc, col("vec_id"))
        .limit(1).select(col("vec_id"), col("v"), col("md")).collect()(0)
      picked += ((r, row.getLong(0), row.getDouble(2),
        row.getSeq[Double](1).toIndexedSeq))
    }
    picked.map(p => (p._1, p._2, p._3)).toList
  }

  private val KCenterK = 5

  private def kcDot(a: String, b: String) =
    s"list_reduce(list_transform(generate_series(1, 64), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  private val kcenterSql = {
    val zeroInit =
      "cw0 AS (SELECT [[" + Seq.fill(64)("0.0").mkString(", ") + "]] AS w)"
    val rounds = (2 to KCenterK).map { r =>
      val selu = (1 until r).map(j => s"SELECT v FROM s$j").mkString(" UNION ALL ")
      s"""d$r AS (SELECT e.vec_id,
      MIN(e.xx - 2 * ${kcDot("e.v", "s.v")} + ${kcDot("s.v", "s.v")}) AS md
      FROM ex e CROSS JOIN ($selu) s GROUP BY e.vec_id),
    s$r AS (SELECT $r AS sel_rank, d.vec_id, e.v, d.md
      FROM d$r d JOIN ex e ON e.vec_id = d.vec_id
      ORDER BY d.md DESC, d.vec_id LIMIT 1)"""
    }
    val allSel = (1 to KCenterK)
      .map(j => s"SELECT sel_rank, vec_id, md FROM s$j").mkString(" UNION ALL ")
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ${lloydChain(1, zeroInit)},
    m AS (SELECT w[1] AS mv FROM cw1),
    ex AS (SELECT vec_id, v, ${kcDot("v", "v")} AS xx FROM e0),
    d1 AS (SELECT e.vec_id, e.v,
      e.xx - 2 * ${kcDot("e.v", "m.mv")} + ${kcDot("m.mv", "m.mv")} AS md
      FROM ex e, m),
    s1 AS (SELECT 1 AS sel_rank, vec_id, v, md FROM d1
      ORDER BY md DESC, vec_id LIMIT 1),
    ${rounds.mkString(",\n    ")}
    SELECT CAST(sel_rank AS INT) AS sel_rank, vec_id, md AS gap_d2
    FROM ($allSel) ORDER BY sel_rank"""
  }

  private val qKCenter = GraftQuery(
    "qs_kcenter_select",
    (s, dir) => {
      import s.implicits._
      kCenterSelect(Tables.embeddings(s, dir), KCenterK)
        .toDF("sel_rank", "vec_id", "gap_d2")
        .orderBy(col("sel_rank"))
    },
    Some(kcenterSql))

  private val qRrf = GraftQuery(
    "qs_rrf_fusion",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir)
      val q = corpus.filter(col("vec_id") < NQ)
      rrfFuse(Seq(annLsh(corpus, q, K), annIvf(corpus, q, K)), K, RrfC)
    },
    Some(rrfSql))

  // ------------------------------------- margin-based bitext mining
  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
    * LASER/CCMatrix miner): for each source vector, retrieve its best
    * target by the RATIO margin — cos(x,y) normalized by the average
    * cosine of both endpoints' k-nearest neighborhoods — which cancels
    * the "hubness" that makes raw cosine thresholds useless for mining
    * (a hub y scores high against everything, but its neighborhood
    * average is high too, so its margin collapses).
    *
    *   margin(x,y) = cos(x,y) / ( (Σ_{z∈NNk(x,T)} cos(x,z)
    *                             + Σ_{z∈NNk(y,S)} cos(y,z)) / 2k )
    *
    * reported in EXACT basis points: cosines are floored to integer
    * micro-units first (identical doubles on both engines ⇒ identical
    * floors), so the neighborhood sums are order-independent BIGINTs and
    * the margin is one integer division — no float accumulation anywhere.
    * Pairs whose pooled neighborhood sum is ≤ 0 are dropped (margin
    * undefined; cannot happen for genuinely aligned corpora). `mutual`
    * flags pairs that are also in the target's backward top-k — the
    * "mutual best" confidence tier.
    *
    * Plan shape (the 100 TB contract): the SOURCE side is the bounded
    * query set; both directional kNN legs broadcast it — forward
    * retrieves over a target scan, backward ranks each target row
    * against the broadcast sources — so the target corpus is scanned,
    * never reshuffled. The two n·k candidate frames are checkpointed
    * once and every downstream join either broadcasts a frame bounded
    * by |S|·k or shuffles only (src,tgt) id pairs on a uniform composite
    * key. At mining scale (both sides huge) swap the exact legs for any
    * ANN tier — the margin/mutual assembly is tier-agnostic.
    * Output: (src_id, tgt_id, cosine, margin_bp, mutual), one row per
    * source, ordered by src_id.
    */
  def marginMine(src: org.apache.spark.sql.DataFrame,
      tgt: org.apache.spark.sql.DataFrame, k: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val s = prep(src, idCol, vecCol)
      .select(col("vec_id").as("src_id"), col("v").as("va"), col("nrm").as("na"))
    val t = prep(tgt, idCol, vecCol)
      .select(col("vec_id").as("tgt_id"), col("v").as("vb"), col("nrm").as("nb"))
    val pairs = t.crossJoin(broadcast(s))
      .withColumn("cosine", graft_dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("c_micro", floor(col("cosine") * lit(1000000d)).cast("long"))
      .select(col("src_id"), col("tgt_id"), col("cosine"), col("c_micro"))
    val wF = Window.partitionBy(col("src_id")).orderBy(col("cosine").desc, col("tgt_id"))
    val fwd = pairs.withColumn("r", row_number().over(wF))
      .filter(col("r") <= k).drop("r").localCheckpoint()
    val wB = Window.partitionBy(col("tgt_id")).orderBy(col("cosine").desc, col("src_id"))
    val bwd = pairs.withColumn("r", row_number().over(wB))
      .filter(col("r") <= k).drop("r").localCheckpoint()
    val sf = fwd.groupBy(col("src_id")).agg(sum(col("c_micro")).as("sf_micro"))
    val sb = bwd.groupBy(col("tgt_id")).agg(sum(col("c_micro")).as("sb_micro"))
    val scored = sb.join(broadcast(fwd.join(broadcast(sf), "src_id")), "tgt_id")
    val mutual = bwd.select(col("src_id"), col("tgt_id"), lit(true).as("mutual"))
    val wBest = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_bp").desc, col("tgt_id"))
    scored
      .join(mutual, Seq("src_id", "tgt_id"), "left")
      .withColumn("mutual", coalesce(col("mutual"), lit(false)))
      .filter(col("sf_micro") + col("sb_micro") > 0)
      .withColumn("margin_bp",
        expr(s"(10000 * ${2 * k} * c_micro) div (sf_micro + sb_micro)"))
      .withColumn("r", row_number().over(wBest)).filter(col("r") === 1)
      .select(col("src_id"), col("tgt_id"), col("cosine"), col("margin_bp"),
        col("mutual"))
      .orderBy(col("src_id"))
  }

  private val BtK = 4
  private val BtSrcBound = 100

  private val bitextSql = s"""WITH s AS (SELECT vec_id AS src_id,
      embedding::DOUBLE[] AS va FROM embeddings
      WHERE label % 2 = 0 AND vec_id < $BtSrcBound),
    t AS (SELECT vec_id AS tgt_id, embedding::DOUBLE[] AS vb FROM embeddings
      WHERE label % 2 = 1),
    p AS (SELECT src_id, tgt_id, $cosineSql AS cosine FROM t, s),
    pc AS (SELECT src_id, tgt_id, cosine,
      CAST(floor(cosine * 1000000) AS BIGINT) AS c_micro FROM p),
    fwd AS (SELECT src_id, tgt_id, cosine, c_micro FROM (SELECT *,
      ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY cosine DESC, tgt_id) AS r
      FROM pc) WHERE r <= $BtK),
    bwd AS (SELECT src_id, tgt_id, c_micro FROM (SELECT *,
      ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY cosine DESC, src_id) AS r
      FROM pc) WHERE r <= $BtK),
    sf AS (SELECT src_id, SUM(c_micro) AS sf_micro FROM fwd GROUP BY src_id),
    sb AS (SELECT tgt_id, SUM(c_micro) AS sb_micro FROM bwd GROUP BY tgt_id),
    sc AS (SELECT f.src_id, f.tgt_id, f.cosine, f.c_micro, sf.sf_micro,
        sb.sb_micro, COALESCE(m.mutual, FALSE) AS mutual
      FROM fwd f JOIN sf USING (src_id) JOIN sb ON f.tgt_id = sb.tgt_id
      LEFT JOIN (SELECT src_id, tgt_id, TRUE AS mutual FROM bwd) m
        ON f.src_id = m.src_id AND f.tgt_id = m.tgt_id
      WHERE sf.sf_micro + sb.sb_micro > 0),
    mg AS (SELECT src_id, tgt_id, cosine,
      (10000 * ${2 * BtK} * c_micro) // (sf_micro + sb_micro) AS margin_bp,
      mutual FROM sc)
    SELECT src_id, tgt_id, cosine, CAST(margin_bp AS BIGINT) AS margin_bp, mutual
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
      ORDER BY margin_bp DESC, tgt_id) AS r FROM mg)
    WHERE r = 1 ORDER BY src_id"""

  /** Even labels play "source language", odd labels "target language":
    * mine each source vector's best margin-scored target. */
  private val qBitext = GraftQuery(
    "qs_bitext_margin",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      marginMine(e.filter(col("label") % 2 === 0 && col("vec_id") < BtSrcBound),
        e.filter(col("label") % 2 === 1), BtK)
    },
    Some(bitextSql))

  /** Pairwise label-centroid cosine — the embedding-drift / class-
    * separation readout over [[labelCentroids]]' geometry: how close are
    * the per-label mean vectors to each other (near-parallel centroids =
    * labels the embedding can't separate; in a time- or source-keyed
    * corpus the same op reads as drift between slices). Exact and
    * sqrt-free: per (label, dim) the quantized sum ÷ count floors to a
    * ×2²⁴-grid centroid coordinate (pmod floor — engine-identical on
    * negative sums), and each pair reports the SIGNED SQUARED cosine in
    * basis points, cos2s_bp = sign(D)·⌊10⁴·D²/(Na·Nb)⌋ with
    * D = Σ ca·cb, N = Σ c². |c| ≤ 2²⁴ keeps 10⁴·D² under ~10³⁷ at
    * dim 64.
    *
    * Plan: one corpus scan → (label, dim) agg (label-domain-sized) →
    * broadcast self-join on dim with la < lb → per-pair agg. Everything
    * after the first agg is |labels|²·dim.
    */
  private val centroidPairsSql = s"""WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    u AS (SELECT label, unnest(generate_series(1, len(v))) AS i, v FROM e),
    q AS (SELECT label, i - 1 AS dim, CAST(round(v[i] * ${Quant}.0) AS BIGINT) AS q FROM u),
    a AS (SELECT label, dim, SUM(q) AS sq, COUNT(*) AS n FROM q GROUP BY label, dim),
    c AS (SELECT label, dim,
        (sq - ((sq % n) + n) % n) // n AS c FROM a),
    p AS (SELECT x.label AS label_a, y.label AS label_b,
        SUM(CAST(x.c AS HUGEINT) * y.c) AS d,
        SUM(CAST(x.c AS HUGEINT) * x.c) AS na,
        SUM(CAST(y.c AS HUGEINT) * y.c) AS nb
      FROM c x JOIN c y ON x.dim = y.dim AND x.label < y.label
      GROUP BY 1, 2)
    SELECT CAST(label_a AS BIGINT) AS label_a, CAST(label_b AS BIGINT) AS label_b,
      CAST(CASE WHEN na = 0 OR nb = 0 THEN NULL
        WHEN d >= 0 THEN ((10000 * d * d) // na) // nb
        ELSE -(((10000 * d * d) // na) // nb) END AS BIGINT) AS cos2s_bp
    FROM p ORDER BY label_a, label_b"""

  private val qCentroidPairs = GraftQuery(
    "qs_centroid_pairs",
    (s, dir) => {
      val a = Tables.embeddings(s, dir)
        .select(col("label"), col("embedding").cast("array<double>").as("v"))
        .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
        .withColumn("q", expr(s"cast(round(x * ${Quant}.0) as bigint)"))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
        .select(col("label"), col("dim"),
          expr("(sq - pmod(sq, n)) div n").as("c"))
      val x = a.select(col("label").as("la"), col("dim"), col("c").as("ca"))
      val y = a.select(col("label").as("lb"), col("dim").as("dimb"), col("c").as("cb"))
      x.join(broadcast(y), col("dim") === col("dimb") && col("la") < col("lb"))
        .groupBy(col("la"), col("lb"))
        .agg(sum(expr("CAST(ca AS DECIMAL(38,0)) * cb")).as("d"),
          sum(expr("CAST(ca AS DECIMAL(38,0)) * ca")).as("na"),
          sum(expr("CAST(cb AS DECIMAL(38,0)) * cb")).as("nb"))
        .select(col("la").cast("long").as("label_a"),
          col("lb").cast("long").as("label_b"),
          expr("""CAST(CASE WHEN na = 0 OR nb = 0 THEN NULL
              WHEN d >= 0 THEN ((10000 * d * d) div na) div nb
              ELSE -(((10000 * d * d) div na) div nb) END AS BIGINT)""")
            .as("cos2s_bp"))
        .orderBy(col("label_a"), col("label_b"))
    },
    Some(centroidPairsSql))

  // --------------------------------------------- PCA (power iteration)
  /** Top principal direction of the corpus embedding cloud by DISTRIBUTED
    * power iteration on the (uncentered) second-moment matrix — the
    * dominant-variance axis every embedding-debug workflow wants
    * (anisotropy check, "rogue dimension" detection, whitening prep).
    * Never materializes a dim×dim matrix: each round is the two
    * matrix-free products
    *
    *   t_i = ⟨x_i, v⟩  (corpus join on dim, agg per row id)
    *   w_d = Σ_i q_id·t_i  (join back on id, agg per dim)
    *
    * then L∞ re-normalization to the ×10⁶ grid by sign-split floor
    * division — no sqrt, every intermediate an exact integer (x
    * quantized ×2²⁴; |w| ≤ 2⁴⁶·n stays inside DECIMAL(38,0)/HUGEINT to
    * n ≈ 10¹¹ rows). Uncentered on purpose (documented): the moment
    * matrix is PSD so iteration signs are stable, and centering is one
    * subtraction the caller can fold into the embedding column.
    * Fixed `iters` rounds (the engine-wide fixed-horizon discipline);
    * per-round lineage truncation.
    *
    * Scale: rounds × (2 uniform-key hash joins + 2 aggs) over the long
    * (id, dim, q) frame — n·dim rows, the same frame every *TopK kernel
    * scans; the v frame is dim-sized and broadcasts.
    */
  def pcaPowerTop(vecs: org.apache.spark.sql.DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      iters: Int = 3): org.apache.spark.sql.DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val VScale = 1000000L
    val q = vecs
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .select(col("id"), posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("id"), col("dim").cast("long").as("dim"),
        expr(s"cast(round(x * ${Quant}.0) as bigint)").as("q"))
      .localCheckpoint()
    var v = q.select(col("dim")).distinct()
      .withColumn("vv", lit(VScale)).localCheckpoint()
    for (_ <- 1 to iters) {
      val t = q.join(v, "dim").groupBy(col("id"))
        .agg(sum(col("q") * col("vv")).as("t"))
      val w = q.join(t, "id").groupBy(col("dim"))
        .agg(sum(expr("CAST(q AS DECIMAL(38,0)) * t")).as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      v = w.crossJoin(broadcast(m))
        .select(col("dim"),
          expr(s"""CAST(CASE WHEN w >= 0 THEN ($VScale * w) div m
              ELSE -(($VScale * (-w)) div m) END AS BIGINT)""").as("vv"))
        .localCheckpoint()
    }
    v.select(col("dim"), col("vv").as("v_int")).orderBy(col("dim"))
  }

  private def pcaRoundSql(prevV: String, r: Int): String =
    s"""t$r AS (SELECT q.id, SUM(q.q * $prevV.vv) AS t
      FROM q JOIN $prevV ON q.dim = $prevV.dim GROUP BY q.id),
    w$r AS (SELECT q.dim, SUM(CAST(q.q AS HUGEINT) * t$r.t) AS w
      FROM q JOIN t$r ON q.id = t$r.id GROUP BY q.dim),
    m$r AS (SELECT MAX(abs(w)) AS m FROM w$r),
    v$r AS (SELECT dim, CAST(CASE WHEN w >= 0 THEN (1000000 * w) // m
        ELSE -((1000000 * (-w)) // m) END AS BIGINT) AS vv
      FROM w$r, m$r)"""

  // The WITH-chain through v3, shared by qs_pca_power (which SELECTs the
  // direction) and qs_anisotropy (which extends the chain).
  private val pcaSql0 = s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    u AS (SELECT id, unnest(generate_series(1, len(v))) AS i, v FROM e),
    q AS (SELECT id, CAST(i - 1 AS BIGINT) AS dim,
      CAST(round(v[i] * ${Quant}.0) AS BIGINT) AS q FROM u),
    v0 AS (SELECT DISTINCT dim, CAST(1000000 AS BIGINT) AS vv FROM q),
    ${pcaRoundSql("v0", 1)},
    ${pcaRoundSql("v1", 2)},
    ${pcaRoundSql("v2", 3)}"""

  private val pcaSql = s"""$pcaSql0
    SELECT dim, vv AS v_int FROM v3 ORDER BY dim"""

  // Top principal direction shared across qs_pca_power / qs_anisotropy.
  private def pcaTop(s: org.apache.spark.sql.SparkSession, dir: String) =
    Memo.cached(s, s"pcaTop:$dir") {
      pcaPowerTop(Tables.embeddings(s, dir))
    }

  private val qPcaPower = GraftQuery(
    "qs_pca_power",
    (s, dir) => pcaTop(s, dir).orderBy(col("dim")),
    Some(pcaSql))

  /** Anisotropy: the share of total (uncentered) second-moment mass
    * captured by the top principal direction, exact basis points — the
    * standard "is this embedding space degenerate" readout (a near-10⁴
    * share means every vector leans on one axis and cosine similarities
    * collapse; Ethayarajh 2019 is the public reference). With v the
    * [[pcaPowerTop]] direction, t_i = ⟨q_i, v⟩:
    *
    *   share_bp = ⌊10⁴·Σt²/(Σv²·Σq²)⌋   (Rayleigh quotient ÷ trace)
    *
    * computed with one remainder split (10⁴·(num mod den) needs
    * num, den ≲ 10³⁴ — holds to ~10⁸ vectors at dim 64; beyond, split
    * 10⁴ = 10²·10² as in [[chiSquareAb]]'s nested identity). One extra
    * corpus join pass over the memoized direction — the PCA rounds are
    * shared with qs_pca_power, not re-run.
    */
  private val qAnisotropy = GraftQuery(
    "qs_anisotropy",
    (s, dir) => {
      val v = pcaTop(s, dir).select(col("dim"), col("v_int").as("vv"))
      val q = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("v"))
        .select(col("id"), posexplode(col("v")).as(Seq("dim", "x")))
        .select(col("id"), col("dim").cast("long").as("dim"),
          expr(s"cast(round(x * ${Quant}.0) as bigint)").as("q"))
      val t = q.join(broadcast(v), "dim").groupBy(col("id"))
        .agg(sum(col("q") * col("vv")).as("t"))
      val num = t.agg(count(lit(1)).as("n_vecs"),
        sum(expr("CAST(t AS DECIMAL(38,0)) * t")).as("num"))
      val den = q.agg(sum(expr("CAST(q AS DECIMAL(38,0)) * q")).as("qq"))
        .crossJoin(broadcast(v.agg(sum(expr("CAST(vv AS DECIMAL(38,0)) * vv")).as("vv2"))))
        .select((col("qq") * col("vv2")).as("den"))
      num.crossJoin(broadcast(den))
        .select(col("n_vecs"),
          expr("""CAST(10000 * CAST(num div den AS DECIMAL(38,0))
              + (10000 * (num % den)) div den AS BIGINT)""").as("share_bp"))
    },
    Some(s"""$pcaSql0,
    ta AS (SELECT q.id, SUM(q.q * v3.vv) AS t
      FROM q JOIN v3 ON q.dim = v3.dim GROUP BY q.id),
    na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
      SUM(CAST(t AS HUGEINT) * t) AS num FROM ta),
    da AS (SELECT (SELECT SUM(CAST(q AS HUGEINT) * q) FROM q)
        * (SELECT SUM(CAST(vv AS HUGEINT) * vv) FROM v3) AS den)
    SELECT n_vecs, CAST(10000 * (num // den) + (10000 * (num % den)) // den
      AS BIGINT) AS share_bp
    FROM na, da"""))

  // ------------------------------------------- adjusted Rand index
  /** Adjusted Rand Index between the TRAINED k-means cells and the
    * ground-truth labels — the external clustering-validity score, and
    * (unlike NMI) a pure RATIONAL in the contingency pair counts, so it
    * stays exact-integer end to end:
    *
    *   ARI = 2(S·C₂ − A·B) / (C₂(A+B) − 2AB)
    *
    * with S = Σᵢⱼ C(nᵢⱼ,2), A = Σᵢ C(aᵢ,2), B = Σⱼ C(bⱼ,2),
    * C₂ = C(n,2); reported sign-split in micro-units. ARI ≈ 0 means the
    * clustering is no better than chance AGAINST the label marginals —
    * the honest follow-up to [[qSilhouette]]'s internal geometry.
    * 2·10⁶·S·C₂ caps DECIMAL(38,0)/HUGEINT exactness at n ≈ 10⁸ rows;
    * beyond, compute on a deterministic hash sample (ARI is a
    * per-pair-rate statistic — subsampling estimates it unbiasedly).
    *
    * Plan: one corpus scan assigns cells against the memoized trained
    * centroids (shared with qs_ann_recall / qs_ivf_probe_curve — no new
    * training); contingency, margins, and moments are all aggs of the
    * (cells × labels)-sized frame.
    */
  private val ariSql = s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ${lloydSql(IvfIters)},
    scs AS (SELECT vec_id, v,
      list_transform(generate_series(1, len(w)), c ->
        list_reduce(list_transform(generate_series(1, 64), i -> w[c][i] * v[i]), (a, b) -> a + b)) AS sc
      FROM e0, cw$IvfIters),
    asg AS (SELECT vec_id, list_position(sc, list_max(sc)) AS cell FROM scs),
    lab AS (SELECT a.cell, emb.label FROM asg a
      JOIN embeddings emb ON a.vec_id = emb.vec_id),
    cont AS (SELECT cell, label, COUNT(*) AS nij FROM lab GROUP BY 1, 2),
    sS AS (SELECT SUM(CAST(nij AS HUGEINT) * (nij - 1) // 2) AS s,
        CAST(SUM(nij) AS HUGEINT) AS n,
        CAST(COUNT(DISTINCT cell) AS BIGINT) AS n_cells,
        CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels
      FROM cont),
    am AS (SELECT SUM(CAST(ai AS HUGEINT) * (ai - 1) // 2) AS a FROM
      (SELECT cell, SUM(nij) AS ai FROM cont GROUP BY cell)),
    bm AS (SELECT SUM(CAST(bj AS HUGEINT) * (bj - 1) // 2) AS b FROM
      (SELECT label, SUM(nij) AS bj FROM cont GROUP BY label)),
    f AS (SELECT n, n_cells, n_labels, s, a, b, n * (n - 1) // 2 AS c2
      FROM sS, am, bm)
    SELECT CAST(n AS BIGINT) AS n, n_cells, n_labels,
      CAST(CASE WHEN c2 * (a + b) - 2 * a * b = 0 THEN NULL
        WHEN s * c2 - a * b >= 0 THEN
          (2000000 * (s * c2 - a * b)) // (c2 * (a + b) - 2 * a * b)
        ELSE -((2000000 * (a * b - s * c2)) // (c2 * (a + b) - 2 * a * b))
        END AS BIGINT) AS ari_micro
    FROM f"""

  private val qAri = GraftQuery(
    "qs_cluster_ari",
    (s, dir) => {
      val cents = trainedCents(s, dir)
      val cont = Tables.embeddings(s, dir)
        .select(col("label"), col("embedding").cast("array<double>").as("v"))
        .withColumn("sc", graft_dot_scores(typedLit(cents), col("v")))
        .withColumn("cell", expr("array_position(sc, array_max(sc))"))
        .groupBy(col("cell"), col("label")).agg(count(lit(1)).as("nij"))
        .localCheckpoint()
      val sS = cont.agg(
        sum(expr("CAST(nij AS DECIMAL(38,0)) * (nij - 1) div 2")).as("s"),
        sum(col("nij")).cast("decimal(38,0)").as("n"),
        countDistinct(col("cell")).as("n_cells"),
        countDistinct(col("label")).as("n_labels"))
      val am = cont.groupBy(col("cell")).agg(sum(col("nij")).as("ai"))
        .agg(sum(expr("CAST(ai AS DECIMAL(38,0)) * (ai - 1) div 2")).as("a"))
      val bm = cont.groupBy(col("label")).agg(sum(col("nij")).as("bj"))
        .agg(sum(expr("CAST(bj AS DECIMAL(38,0)) * (bj - 1) div 2")).as("b"))
      sS.crossJoin(broadcast(am)).crossJoin(broadcast(bm))
        .select(col("n"), col("n_cells"), col("n_labels"),
          col("s"), col("a"), col("b"),
          expr("n * (n - 1) div 2").as("c2"))
        .select(col("n").cast("long").as("n"), col("n_cells"), col("n_labels"),
          expr("""CAST(CASE WHEN c2 * (a + b) - 2 * a * b = 0 THEN NULL
              WHEN s * c2 - a * b >= 0 THEN
                (2000000 * (s * c2 - a * b)) div (c2 * (a + b) - 2 * a * b)
              ELSE -((2000000 * (a * b - s * c2)) div (c2 * (a + b) - 2 * a * b))
              END AS BIGINT)""").as("ari_micro"))
    },
    Some(ariSql))

  // ------------------------------- MIPS (inner-product) exact top-k
  /** Maximum-inner-product top-k — the recommender scorer: rank by RAW
    * dot product ⟨q, c⟩, NOT cosine. The two orders genuinely differ
    * (a long candidate vector can out-dot a better-aligned short one),
    * which is why rec-sys retrieval (user embedding × item embeddings,
    * popularity encoded in the norm) is MIPS and semantic search is
    * cosine — both belong in the tier. Same scale shape as
    * [[cosineTopK]]: broadcast query side, one corpus scan, native
    * codegen'd dots, per-query WindowGroupLimit top-k. The standard
    * sub-quadratic path is the norm-augmentation reduction (Bachrach
    * et al. 2014: append sqrt(M²−‖c‖²), queries get 0 — MIPS becomes
    * cosine) feeding any ANN tier above; the exact form here is the
    * recall baseline for it.
    * Output: (query_id, rank, cand_id, dot).
    */
  def mipsTopK(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : org.apache.spark.sql.DataFrame = {
    val q = prep(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("v").as("va"))
    val pairs = prep(corpus, idCol, vecCol)
      .select(col("vec_id").as("cand_id"), col("v").as("vb"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("dot", graft_dot(col("va"), col("vb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("cand_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("dot"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val mipsSql =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS va,
        c.v AS vb
      FROM e q JOIN e c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id),
    sc AS (SELECT query_id, cand_id, $dotFoldSql AS dot FROM p),
    rk AS (SELECT query_id, cand_id, dot,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id)
        AS rank
      FROM sc)
    SELECT query_id, rank, cand_id, dot FROM rk WHERE rank <= $K
    ORDER BY query_id, rank"""

  private val qMips = GraftQuery(
    "qs_mips_topk",
    (s, dir) => mipsTopK(Tables.embeddings(s, dir),
      Tables.embeddings(s, dir).filter(col("vec_id") < NQ), K),
    Some(mipsSql))

  // -------------------- facility-location greedy selection (coreset)
  /** Greedy facility-location selection over the kNN graph — the
    * submodular coreset picker (Nemhauser–Wolsey–Fisher 1978 greedy,
    * 1−1/e guarantee; the objective behind similarity-based training-
    * data selection à la CRAIG/craig-style coresets): maximize
    * F(S) = Σ_q max_{c∈S} sim(q, c), picking the element with the
    * largest marginal gain k times. Complements [[kCenterSelect]]
    * (minimax distance coverage — outlier-chasing) with SUM coverage —
    * density-chasing: picks land in the corpus' mass centers.
    *
    * Scale: the exact objective is Ω(n²) (every (q, c) sim); the
    * standard sparse relaxation scores sim only on the prebuilt kNN
    * graph (sim(q,c) = 0 off-graph), so each round is one edge-list
    * join against the per-q cover vector + one grouped sum — n·k rows,
    * never all-pairs. The graph is the session-memoized qs_knn_graph
    * index (built once, third consumer). Gains/covers are exact BIGINT
    * micro-units (cosine floored to 10⁻⁶) — float summation order can
    * flip an argmax across partitionings, integers cannot.
    *
    * Output: (sel_rank, vec_id, gain_micro, coverage_micro) per pick —
    * gain the marginal objective increase, coverage the cumulative
    * Σ_q cover(q) after the pick.
    */
  def facilityLocationSelect(edges: org.apache.spark.sql.DataFrame,
      corpusIds: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ids = corpusIds.select(col("vec_id")).distinct().localCheckpoint()
    val dir0 = edges.select(col("src").as("q"), col("nbr").as("c"),
      floor(col("cosine") * 1000000).cast("bigint").as("s"))
    val sed = dir0
      .unionByName(dir0.select(col("c").as("q"), col("q").as("c"), col("s")))
      .unionByName(ids.select(col("vec_id").as("q"),
        col("vec_id").as("c"), lit(1000000L).as("s")))
      .groupBy(col("q"), col("c")).agg(max(col("s")).as("s"))
      .localCheckpoint()
    var cover = Scans.rebase(
      ids.select(col("vec_id").as("q"), lit(0L).as("cv")), 8)
    val picked = scala.collection.mutable.ListBuffer.empty[(Int, Long, Long, Long)]
    var exhausted = false
    for (r <- 1 to k if !exhausted) {
      val pickedIds = picked.map(_._2).toSeq
      val cand = if (pickedIds.isEmpty) sed
        else sed.filter(!col("c").isin(pickedIds: _*))
      val bestRows = cand.join(cover, Seq("q"))
        .groupBy(col("c"))
        .agg(sum(greatest(col("s") - col("cv"), lit(0L))).as("gain"))
        .orderBy(col("gain").desc, col("c"))
        .limit(1).collect()
      // k larger than the candidate pool: stop with the picks made
      // (selection semantics, not an error)
      if (bestRows.isEmpty) { exhausted = true }
      else {
      val best = bestRows(0)
      val (cStar, gain) = (best.getLong(0), best.getLong(1))
      val cEdges = sed.filter(col("c") === cStar)
        .select(col("q"), col("s").as("cs"))
      cover = Scans.rebaseSwap(
        cover.join(broadcast(cEdges), Seq("q"), "left")
          .select(col("q"),
            greatest(col("cv"), coalesce(col("cs"), lit(0L))).as("cv")),
        cover, 8)
      val covTot = cover.agg(sum(col("cv"))).collect()(0).getLong(0)
      picked += ((r, cStar, gain, covTot))
      }
    }
    val s = edges.sparkSession
    import s.implicits._
    picked.toSeq.toDF("sel_rank", "vec_id", "gain_micro", "coverage_micro")
      .orderBy(col("sel_rank"))
  }

  private val FacilityK = 5

  private val facilitySql = {
    val rounds = (1 to FacilityK).map { r =>
      val p = r - 1
      val notPicked = if (r == 1) ""
        else "WHERE c NOT IN (" +
          (1 until r).map(j => s"SELECT c FROM p$j").mkString(" UNION ALL ") + ")"
      s"""g$r AS (SELECT c, SUM(GREATEST(s - cv, 0)) AS gain
        FROM sca JOIN cov$p USING (q) $notPicked GROUP BY c),
      p$r AS (SELECT c, gain FROM g$r ORDER BY gain DESC, c LIMIT 1),
      cov$r AS MATERIALIZED (SELECT cov.q,
          GREATEST(cov.cv, COALESCE(x.s, 0)) AS cv
        FROM cov$p cov LEFT JOIN
          (SELECT q, s FROM sca JOIN p$r USING (c)) x USING (q))"""
    }
    val out = (1 to FacilityK).map(r =>
      s"""SELECT $r AS sel_rank, c AS vec_id, gain AS gain_micro,
        (SELECT SUM(cv) FROM cov$r) AS coverage_micro FROM p$r""")
      .mkString("\n      UNION ALL ")
    s"""WITH $knnEdgeCtes,
      dir0 AS (SELECT src AS q, nbr AS c,
          CAST(floor(cosine * 1000000) AS BIGINT) AS s
        FROM rkk WHERE rank <= $KnnK),
      sca AS MATERIALIZED (SELECT q, c, MAX(s) AS s FROM (
        SELECT q, c, s FROM dir0
        UNION ALL SELECT c, q, s FROM dir0
        UNION ALL SELECT vec_id, vec_id, 1000000 FROM e0) GROUP BY q, c),
      cov0 AS MATERIALIZED (SELECT vec_id AS q, CAST(0 AS BIGINT) AS cv
        FROM e0),
      ${rounds.mkString(",\n      ")}
      SELECT CAST(sel_rank AS INT) AS sel_rank, CAST(vec_id AS BIGINT)
          AS vec_id,
        CAST(gain_micro AS BIGINT) AS gain_micro,
        CAST(coverage_micro AS BIGINT) AS coverage_micro
      FROM ($out) ORDER BY sel_rank"""
  }

  private val qFacility = GraftQuery(
    "qs_facility_select",
    (s, dir) => facilityLocationSelect(knnEdgesMemo(s, dir),
      Tables.embeddings(s, dir), FacilityK),
    Some(facilitySql))

  val queries: Seq[GraftQuery] = Seq(qBrute, qAnnLsh, qAnnIvf, qAnnIvfTrained,
    qAnnLshMp, qAnnFiltered, qRecall, qMrr, qSq, qSqPacked, qCentroids, qKmeans,
    qOutliers, qSemDedup, qPq, qIvfPq, qIvfPqRes, qKnn, qRp, qMmr, qRrf,
    qKCenter, qGraphAnn, qGraphAnnRounds, qHardNeg, qMrl, qRbp, qRbo, qBitext, qNdcg, qMap, qSilhouette,
    qShapley, qProbeCurve, qBinary, qCentroidPairs, qPcaPower, qAnisotropy,
    qAri, qFacility, qMips)
}
