package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.GraftQuery
import graft.functions.GraftFunctions.graft_nfc
import Nlp._

/** Corpus-assembly operators — the stages between "cleaned documents" and
  * "training batches": Unicode normalization, temperature-based domain
  * mixing, and fixed-token-budget sequence packing. Column-parameterized
  * public API over any DataFrame, plus driver-checked bindings on
  * `documents`.
  *
  * Scale shapes:
  *  - [[normalizeText]] is map-only (native [[graft.functions.NfcNormalize]]
  *    expression, stays in whole-stage codegen).
  *  - [[domainMix]] aggregates one tiny per-domain frame (domains are
  *    bounded — languages/sources, not documents), broadcasts the rates
  *    back, and filters map-side: one small-key aggregation, no corpus
  *    shuffle beyond it.
  *  - [[packSequences]] is the one windowed op, and its window is
  *    PARTITIONED by a hash bucket: each of `buckets` streams is packed
  *    independently (the concatenate-and-chunk order is only ever defined
  *    per stream), so no global sort / single-task window exists at any
  *    scale — raise `buckets` with the cluster, each task packs one bucket.
  */
object MixOps {

  private def norm(docs: DataFrame, idCol: String, textCol: String) =
    Nlp.normDocs(docs, idCol, textCol)

  // ======================= public operator API =======================

  /** Unicode NFC + lowercase + whitespace-collapse + trim. The canonical
    * first pass before anything content-addressed (fingerprints, shingle
    * hashes, exact dedup) — combining-mark and precomposed spellings of
    * the same glyph otherwise hash apart. `changed` marks rows the
    * normalization actually rewrote.
    */
  def normalizeText(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    norm(docs, idCol, textCol)
      .select(
        col("doc_id"),
        trim(regexp_replace(lower(graft_nfc(col("text"))), "\\s+", " "))
          .as("norm_text"),
        col("text"))
      .select(
        col("doc_id"),
        col("norm_text"),
        length(col("norm_text")).as("n_chars_norm"),
        (col("norm_text") =!= col("text")).as("changed"))

  /** Temperature-based domain rebalancing (the multilingual-sampling rule
    * from the mT5/XLM-R line of work): a domain with corpus share `s_d`
    * is sampled proportionally to `s_d^(1/T)`, flattening the distribution
    * toward uniform as T grows. Rates are scaled so the most-upweighted
    * domain keeps everything (keep-rate 1.0) and every other domain is
    * down-sampled deterministically by content hash — reproducible across
    * runs, engines, and cluster layouts, unlike `rand()`-based sampling.
    *
    * keep_d = (s_d^(1/T) / s_d)  normalized to max 1
    *        = (1/s_d)^((T-1)/T)  / max_d'(...)   — rarest domain → 1.0.
    *
    * Returns one row per domain: (domain, n_docs, n_kept). Per-doc keep
    * decisions are exposed via [[domainMixKeep]].
    */
  def domainMix(docs: DataFrame, domainCol: String = "lang",
      textCol: String = "text", temperature: Double = 2.0,
      salt: String = "mix"): DataFrame =
    domainMixKeep(docs, domainCol, textCol, temperature, salt)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("domain"))

  /** Per-document keep decision for [[domainMix]] — joinable back to the
    * corpus by the caller. Output: (domain, doc_hash_ratio, keep) plus all
    * original columns.
    */
  def domainMixKeep(docs: DataFrame, domainCol: String = "lang",
      textCol: String = "text", temperature: Double = 2.0,
      salt: String = "mix"): DataFrame = {
    require(temperature >= 1.0, s"temperature must be >= 1, got $temperature")
    val d = docs.withColumn("domain", col(domainCol))
    // Tiny frame: one row per domain. The unpartitioned windows below run
    // on those few rows, never on the corpus.
    val cnts = d.groupBy("domain").agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
      // r_d = (total/cnt_d)^((T-1)/T), the unnormalized upweight factor.
      // T=2 is expressed via sqrt, which IEEE requires to be correctly
      // rounded — bit-identical across engines, unlike pow's 1-ulp slack;
      // the oracle binding relies on that.
      .withColumn("r", {
        val base = col("total").cast("double") / col("cnt").cast("double")
        if (temperature == 2.0) sqrt(base)
        else pow(base, lit((temperature - 1.0) / temperature))
      })
      .withColumn("keep_rate", col("r") / max(col("r")).over(Window.partitionBy()))
      .select("domain", "keep_rate")
    d.join(broadcast(cnts), "domain")
      .withColumn("doc_hash_ratio",
        (expr(h60(s"concat(${textCol}, '|$salt')")) % 1000000L).cast("double")
          / lit(1000000.0))
      .withColumn("keep", col("doc_hash_ratio") < col("keep_rate"))
      // keep_rate is internal plumbing — the documented contract is
      // (domain, doc_hash_ratio, keep) plus the original columns
      .drop("keep_rate")
  }

  /** Concatenate-and-chunk sequence packing — assign every document a
    * (bucket, seq_id, seq_offset): documents are ordered deterministically
    * by content hash inside each of `buckets` hash-partitioned streams,
    * token counts are prefix-summed, and a document belongs to the
    * `budget`-token training sequence its first token lands in (the GPT
    * concat-then-chunk recipe; a doc straddling a boundary starts the
    * spillover into the next chunk).
    *
    * The window is partitioned on the hash bucket, so packing is
    * embarrassingly parallel across buckets — there is no global-order
    * cumsum anywhere (that would be the single-task window trap).
    */
  def packSequences(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", budget: Int = 256,
      buckets: Int = 16): DataFrame = {
    require(budget > 0 && buckets > 0)
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("fp"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    norm(docs, idCol, textCol)
      .withColumn("toks", expr(toksExpr))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("fp", expr(h60("text")))
      .withColumn("bucket", (col("fp") % buckets).cast("int"))
      .withColumn("cum", sum(col("n_tokens").cast("long")).over(w))
      .select(
        col("doc_id"), col("n_tokens"), col("bucket"),
        expr(s"(cum - n_tokens) div $budget").as("seq_id"),
        ((col("cum") - col("n_tokens")) % budget).as("seq_offset"))
  }

  /** Sliding token-window chunking — the RAG / context-window-prep op:
    * split each document into windows of `size` tokens advancing by
    * `stride` (overlap = size - stride). Map-only: tokenize, compute the
    * window count with integer math, explode, slice. Empty documents
    * yield no chunks. Output: (doc_id, chunk_idx, chunk_tokens,
    * chunk_text).
    *
    * Window count for n tokens: 1 + ceil(max(0, n - size) / stride) —
    * every token is covered, the last window may be short.
    */
  def chunkTokens(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", size: Int = 64, stride: Int = 48): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    norm(docs, idCol, textCol)
      .withColumn("toks", expr(toksExpr))
      .withColumn("n", expr("size(toks)"))
      .filter(col("n") > 0)
      .withColumn("nchunks",
        expr(s"1 + (greatest(n - $size, 0) + ${stride - 1}) div $stride").cast("int"))
      .withColumn("chunk_idx", explode(sequence(lit(0), col("nchunks") - 1)))
      .select(
        col("doc_id"), col("chunk_idx"),
        expr(s"size(slice(toks, chunk_idx * $stride + 1, $size))").as("chunk_tokens"),
        expr(s"array_join(slice(toks, chunk_idx * $stride + 1, $size), ' ')")
          .as("chunk_text"))
  }

  // ==================== driver-checked bindings ======================

  private val qNormalize = GraftQuery(
    "qt_normalize",
    (s, dir) => normalizeText(Tables.documents(s, dir)).orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id,
      trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS norm_text,
      text FROM documents)
    SELECT doc_id, norm_text, length(norm_text) AS n_chars_norm,
      norm_text != text AS changed
    FROM t ORDER BY doc_id"""))

  private val qDomainMix = GraftQuery(
    "qt_domain_mix",
    (s, dir) => domainMix(Tables.documents(s, dir)),
    Some(s"""WITH d AS (SELECT lang AS domain, text FROM documents),
    c AS (SELECT domain, COUNT(*) AS cnt, SUM(COUNT(*)) OVER () AS total
      FROM d GROUP BY domain),
    r AS (SELECT domain, sqrt(CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE)) AS r FROM c),
    k AS (SELECT domain, r / MAX(r) OVER () AS keep_rate FROM r),
    dec AS (SELECT d.domain,
      CAST(${h60Sql("d.text || '|mix'")} % 1000000 AS DOUBLE) / 1000000.0
        < k.keep_rate AS keep
      FROM d JOIN k ON d.domain = k.domain)
    SELECT domain, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM dec GROUP BY domain ORDER BY domain"""))

  private val PackBudget = 256
  private val PackBuckets = 16

  private val qSeqPack = GraftQuery(
    "qt_seq_pack",
    (s, dir) => packSequences(Tables.documents(s, dir),
      budget = PackBudget, buckets = PackBuckets).orderBy(col("doc_id")),
    Some(s"""WITH t AS (SELECT doc_id, len($toksSql) AS n_tokens,
      ${h60Sql("text")} AS fp FROM documents),
    b AS (SELECT doc_id, n_tokens, fp, CAST(fp % $PackBuckets AS INT) AS bucket FROM t),
    c AS (SELECT doc_id, n_tokens, bucket,
      CAST(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY fp, doc_id
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM b)
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, bucket,
      (cum - n_tokens) // $PackBudget AS seq_id,
      (cum - n_tokens) % $PackBudget AS seq_offset
    FROM c ORDER BY doc_id"""))

  private val ChunkSize = 64
  private val ChunkStride = 48

  private val qChunk = GraftQuery(
    "qt_chunk",
    (s, dir) => chunkTokens(Tables.documents(s, dir),
        size = ChunkSize, stride = ChunkStride)
      .orderBy(col("doc_id"), col("chunk_idx")),
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
    c AS (SELECT doc_id, toks,
      1 + CAST((greatest(n - $ChunkSize, 0) + ${ChunkStride - 1}) // $ChunkStride AS INT) AS nchunks
      FROM n),
    e AS (SELECT doc_id, toks,
      unnest(generate_series(0, nchunks - 1)) AS chunk_idx FROM c)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
      CAST(len(toks[chunk_idx * $ChunkStride + 1 : chunk_idx * $ChunkStride + $ChunkSize]) AS INT) AS chunk_tokens,
      array_to_string(toks[chunk_idx * $ChunkStride + 1 : chunk_idx * $ChunkStride + $ChunkSize], ' ') AS chunk_text
    FROM e ORDER BY doc_id, chunk_idx"""))

  // ------------------------------------------- DSIR importance weights
  /** Data selection via hashed n-gram importance weights (the DSIR recipe,
    * Xie et al. 2023, arXiv:2302.03169 — public method): score every raw
    * document by how target-like its hashed unigram+bigram features are.
    * Per bucket b, the smoothed likelihood ratio
    * `(t_b+1)/(T+B) ÷ (r_b+1)/(R+B)` (target vs raw feature frequency);
    * per document, the mean ratio over its feature bag. High score = looks
    * like the target distribution — the resampling weight DSIR selects by.
    *
    * Determinism contract: the paper's log-weights would sum `ln()` values,
    * and ln carries no cross-engine exactness guarantee (same reason
    * [[VocabOps.tfidfKeywords]] is log-free). Instead each bucket ratio is
    * quantized once to a BIGINT (×2²⁴; one IEEE multiply/divide tree both
    * engines evaluate bit-identically), and per-doc aggregation is an
    * exact integer sum — order- and partitioning-independent.
    *
    * Scale shape: feature hashing is map-only; the only corpus-sized
    * shuffle is the uniform B-bucket count (partial-agg collapses it);
    * the B-row ratio table is broadcast back over one feature scan. The
    * target side is benchmarks/curated data — MBs against a 100 TB raw
    * corpus.
    *
    * Output: (doc_id, n_feats, score) for every raw document.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame,
      buckets: Int = DsirBuckets,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // short-doc sentinel the native kernel emits when a doc has < n tokens
    // (h60 of the empty string) — not a real feature, stripped post-union
    val sentinel = graft.functions.ShingleKernel.h60(Array.emptyByteArray)
    def featBuckets(df: DataFrame) =
      norm(df, idCol, textCol)
        // native codegen'd kernels (no interpreted lambdas in the hot
        // path): unigram + bigram hash SETS, deduped by array_union
        .select(col("doc_id"), explode(array_remove(array_union(
            graft.functions.GraftFunctions.graft_shingle_hashes(col("text"), 1),
            graft.functions.GraftFunctions.graft_shingle_hashes(col("text"), 2)),
          sentinel)).as("h"))
        .select(col("doc_id"), (col("h") % buckets).as("bucket"))

    val rawFeats = featBuckets(raw)
    val rb = rawFeats.groupBy(col("bucket")).agg(count(lit(1)).as("rc"))
    val tb = featBuckets(target).groupBy(col("bucket")).agg(count(lit(1)).as("tc"))
    val totals = rb.agg(sum(col("rc")).as("r_tot"))
      .crossJoin(tb.agg(sum(col("tc")).as("t_tot")))
    val spark = raw.sparkSession
    val ratio = spark.range(buckets).select(col("id").as("bucket"))
      .join(rb, Seq("bucket"), "left").join(tb, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      // op tree mirrored CHARACTER-FOR-CHARACTER in the oracle: every step
      // is IEEE +,*,/ on doubles (bit-identical across engines), then one
      // round-to-BIGINT
      .select(col("bucket"), expr(
        s"cast(round(($DsirQuant.0 * ((coalesce(tc, 0) + 1.0) * " +
          s"(cast(r_tot as double) + $buckets.0))) / ((coalesce(rc, 0) + 1.0) * " +
          s"(cast(t_tot as double) + $buckets.0))) as bigint)").as("q"))
    val perDoc = rawFeats.join(broadcast(ratio), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("q")).as("qsum"))
    raw.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(expr(s"cast(qsum as double) / (n_feats * $DsirQuant.0)"), lit(0.0))
          .as("score"))
      .orderBy(col("doc_id"))
  }

  private val DsirBuckets = 64
  private val DsirQuant = 1 << 24

  private val qDsir = GraftQuery(
    "qt_dsir_weights",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      dsirWeights(docs, docs.filter(col("lang") === "en"))
    },
    Some(s"""WITH d AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
    fz AS (SELECT doc_id, lang, list_distinct(list_concat(
      list_transform(toks, t -> ${h60Sql("t")}),
      list_transform(generate_series(1, len(toks) - 1), i -> ${h60Sql("toks[i] || ' ' || toks[i+1]")}))) AS feats
      FROM d),
    fe AS (SELECT doc_id, lang, f % $DsirBuckets AS bucket
      FROM (SELECT doc_id, lang, unnest(feats) AS f FROM fz) u),
    rb AS (SELECT bucket, COUNT(*) AS rc FROM fe GROUP BY bucket),
    tb AS (SELECT bucket, COUNT(*) AS tc FROM fe WHERE lang = 'en' GROUP BY bucket),
    tot AS (SELECT (SELECT SUM(rc) FROM rb) AS r_tot, (SELECT SUM(tc) FROM tb) AS t_tot),
    qt AS (SELECT g.b AS bucket,
      CAST(round(($DsirQuant.0 * ((coalesce(tb.tc, 0) + 1.0) * (CAST(r_tot AS DOUBLE) + $DsirBuckets.0))) / ((coalesce(rb.rc, 0) + 1.0) * (CAST(t_tot AS DOUBLE) + $DsirBuckets.0))) AS BIGINT) AS q
      FROM generate_series(0, ${DsirBuckets - 1}) g(b)
        LEFT JOIN rb ON rb.bucket = g.b LEFT JOIN tb ON tb.bucket = g.b, tot),
    sc AS (SELECT doc_id, COUNT(*) AS n_feats, SUM(q) AS qsum
      FROM fe JOIN qt USING (bucket) GROUP BY doc_id)
    SELECT dd.doc_id, CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
      coalesce(CAST(sc.qsum AS DOUBLE) / (sc.n_feats * $DsirQuant.0), 0.0) AS score
    FROM documents dd LEFT JOIN sc ON dd.doc_id = sc.doc_id ORDER BY dd.doc_id"""))

  // ------------------------------------------------ export shard plan
  /** Deterministic training-export sharding — the LAST step of dataset
    * assembly: give every document a position in a deterministic GLOBAL
    * shuffle (ordered by a row hash — "shuffled" for training locality,
    * yet reproducible run-to-run and engine-to-engine, no RNG) and cut
    * that order into shards of ≤ `budget` total tokens, so every writer
    * task emits balanced shard files and a re-run of the pipeline
    * produces byte-identical shard membership (the property data audits
    * need).
    *
    * Scale shape: the same TWO-LEVEL PREFIX SUM as
    * [[LayoutOps.compactionPlan]] — range-partition by the hash order,
    * per-partition running sums (partition-local windows), one P-row
    * offsets frame broadcast back. No global single-task window at any
    * size; the global order exists only as arithmetic.
    *
    * Output: (doc_id, n_tokens, shard) — contiguous shard ids in hash
    * order, each shard ≤ budget tokens past its first document.
    */
  def shardPlan(docs: DataFrame, budget: Long, idCol: String = "doc_id",
      textCol: String = "text", parts: Int = 0): DataFrame = {
    require(budget > 0, s"token budget must be > 0, got $budget")
    val spark = docs.sparkSession
    val p = if (parts > 0) parts
      else spark.sessionState.conf.numShufflePartitions
    val inv = Nlp.normDocs(docs, idCol, textCol)
      .select(col("doc_id"), expr(s"cast(size($toksExpr) as bigint)").as("w"),
        expr(h60(s"cast(doc_id as string)")).as("hk"))
      .repartitionByRange(p, col("hk"), col("doc_id"))
      // materialized: both consumers must read ONE sampled partitioning
      // (see Scans.rangedCumSums)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val offsets = inv.groupBy(col("_pid")).agg(sum(col("w")).as("_psum"))
      .withColumn("_off", coalesce(sum(col("_psum")).over(
        Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_psum")
    val wLoc = Window.partitionBy(col("_pid")).orderBy(col("hk"), col("doc_id"))
    inv.join(broadcast(offsets), "_pid")
      .withColumn("_cum", col("_off") + sum(col("w")).over(wLoc) - col("w"))
      .select(col("doc_id"), col("w").as("n_tokens"),
        expr(s"_cum div ${budget}L").as("shard"))
  }

  private val ShardBudget = 4096L

  private val shardSql = s"""WITH f AS (SELECT doc_id,
      CAST(len($toksSql) AS BIGINT) AS w,
      ${h60Sql("CAST(doc_id AS VARCHAR)")} AS hk FROM documents),
    c AS (SELECT doc_id, w,
      COALESCE(SUM(w) OVER (ORDER BY hk, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM f)
    SELECT doc_id, w AS n_tokens, CAST(cum // $ShardBudget AS BIGINT) AS shard
    FROM c ORDER BY shard, doc_id"""

  private val qShardPlan = GraftQuery(
    "qt_shard_plan",
    (s, dir) => shardPlan(Tables.documents(s, dir), ShardBudget)
      .orderBy(col("shard"), col("doc_id")),
    Some(shardSql))

  // ---------------------------------------- token-budget allocation
  /** Exact waterfilling of a global token budget across domains — the
    * "how many tokens do I actually take from each source" step of mix
    * planning (the DoReMi/Pile-style static allocation): each domain i
    * gets budget share ∝ weight w_i, capped at its available tokens,
    * with capped domains' unused share redistributed over the rest.
    * This is the classic waterfilling solution, computed EXACTLY in
    * integers: domains sort by avail/w (the saturation order — the
    * double ratio is used only for ORDERING, deterministic IEEE both
    * engines; ties → domain), and domain i saturates iff
    *
    *   avail_i · (W − W_prev) ≤ (B − A_prev) · w_i
    *
    * evaluated in DECIMAL(38,0)/HUGEINT cross-multiplication (no
    * division), where A_prev/W_prev are prefix sums over the
    * saturation order and saturation is the running-AND of the
    * condition (a later failure ends the saturated prefix).
    * Unsaturated domains get ⌊(B − A_sat)·w_i/(W − W_sat)⌋.
    *
    * Scale: the corpus appears only in whatever aggregation BUILT the
    * per-domain frame; this op runs on the DOMAIN SUMMARY (bounded by
    * #sources/#languages), so its unpartitioned prefix windows are over
    * a deliberately tiny frame. Σ alloc ≤ B exactly; epochs_bp =
    * ⌊10⁴·alloc/avail⌋ reads as "how much of this domain one epoch of
    * the mix consumes".
    *
    * Contract: weights ≥ 1, avail ≥ 1 (filter empty domains upstream).
    * Output: (domain, avail_tokens, weight, alloc_tokens, saturated,
    * epochs_bp).
    */
  def tokenBudgetAllocate(domains: DataFrame, budget: Long,
      domainCol: String = "domain", availCol: String = "avail_tokens",
      wCol: String = "weight"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val d = domains.select(col(domainCol).as("domain"),
      col(availCol).cast("long").as("avail"), col(wCol).cast("long").as("w"))
    val tot = d.agg(sum(col("w")).as("tot_w"))
    val ord = Window.orderBy(col("ratio"), col("domain"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = d
      .withColumn("ratio", col("avail").cast("double") / col("w"))
      .crossJoin(broadcast(tot))
      .withColumn("a_prev", coalesce(sum(col("avail")).over(ord), lit(0L)))
      .withColumn("w_prev", coalesce(sum(col("w")).over(ord), lit(0L)))
      .withColumn("cond",
        dec(col("avail")) * dec(col("tot_w") - col("w_prev")) <=
          dec(lit(budget) - col("a_prev")) * dec(col("w")))
      .withColumn("bad_prev",
        coalesce(sum(when(col("cond"), 0L).otherwise(1L)).over(ord), lit(0L)))
      .withColumn("saturated", col("cond") && col("bad_prev") === 0L)
    val sat = r.agg(
      coalesce(sum(when(col("saturated"), col("avail"))), lit(0L)).as("a_sat"),
      coalesce(sum(when(col("saturated"), col("w"))), lit(0L)).as("w_sat"))
    r.crossJoin(broadcast(sat))
      .withColumn("alloc_tokens",
        when(col("saturated"), col("avail")).otherwise(expr(
          s"CAST((CAST($budget - a_sat AS DECIMAL(38,0)) * w) div (tot_w - w_sat) AS BIGINT)")))
      .select(col("domain"), col("avail").as("avail_tokens"),
        col("w").as("weight"), col("alloc_tokens"), col("saturated"),
        expr("10000 * alloc_tokens div avail").as("epochs_bp"))
      .orderBy(col("domain"))
  }

  /** Binding: per-language token counts from documents, temperature-2
    * weights (w = ⌊√avail⌋ — the same T=2 rule as [[domainMix]]), budget
    * = 90 % of the corpus tokens — high enough that the down-weighted
    * small domains cap out at their full supply while the big one is
    * waterfilled, so the gate exercises BOTH arms. The budget scalar is
    * ONE driver fetch (the kCore-style sanctioned scalar); the oracle
    * derives the same number inside SQL.
    */
  private val qTokenBudget = GraftQuery(
    "qt_token_budget",
    (s, dir) => {
      val dom = Tables.documents(s, dir)
        .select(col("lang").as("domain"),
          expr(s"cast(size($toksExpr) as bigint)").as("tk"))
        .groupBy(col("domain"))
        .agg(sum(col("tk")).as("avail_tokens"))
        .filter(col("avail_tokens") >= 1)
        .withColumn("weight",
          expr("cast(floor(sqrt(cast(avail_tokens as double))) as bigint)"))
      val budget = dom.agg(expr("(sum(avail_tokens) * 9) div 10").as("b"))
        .head().getLong(0)
      tokenBudgetAllocate(dom, budget)
    },
    Some(s"""WITH t AS (SELECT lang AS domain,
        CAST(len($toksSql) AS BIGINT) AS tk FROM documents),
      d AS (SELECT domain, CAST(SUM(tk) AS BIGINT) AS avail,
          CAST(floor(sqrt(CAST(SUM(tk) AS DOUBLE))) AS BIGINT) AS w
        FROM t GROUP BY domain HAVING SUM(tk) >= 1),
      b AS (SELECT CAST((SUM(avail) * 9) // 10 AS BIGINT) AS budget FROM d),
      tw AS (SELECT CAST(SUM(w) AS BIGINT) AS tot_w FROM d),
      r AS (SELECT d.*, CAST(avail AS DOUBLE) / w AS ratio,
        CAST(COALESCE(SUM(avail) OVER (ORDER BY CAST(avail AS DOUBLE) / w, domain
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS a_prev,
        CAST(COALESCE(SUM(w) OVER (ORDER BY CAST(avail AS DOUBLE) / w, domain
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS w_prev
        FROM d),
      c AS (SELECT r.*, tot_w, budget,
        CAST(avail AS HUGEINT) * (tot_w - w_prev)
          <= CAST(budget - a_prev AS HUGEINT) * w AS cond
        FROM r CROSS JOIN tw CROSS JOIN b),
      c2 AS (SELECT c.*,
        CAST(COALESCE(SUM(CASE WHEN cond THEN 0 ELSE 1 END) OVER (
          ORDER BY ratio, domain
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bad_prev
        FROM c),
      c3 AS (SELECT *, cond AND bad_prev = 0 AS saturated FROM c2),
      st AS (SELECT CAST(COALESCE(SUM(CASE WHEN saturated THEN avail END), 0) AS BIGINT) AS a_sat,
          CAST(COALESCE(SUM(CASE WHEN saturated THEN w END), 0) AS BIGINT) AS w_sat
        FROM c3),
      al AS (SELECT c3.*, a_sat, w_sat,
        CAST(CASE WHEN saturated THEN avail
          ELSE (CAST(budget - a_sat AS HUGEINT) * w) // (tot_w - w_sat)
        END AS BIGINT) AS alloc_tokens
        FROM c3 CROSS JOIN st)
      SELECT domain, avail AS avail_tokens, w AS weight, alloc_tokens,
        saturated, CAST(10000 * alloc_tokens // avail AS BIGINT) AS epochs_bp
      FROM al ORDER BY domain"""))

  // ------------------------ multiplicative-weights domain reweighting
  /** DoReMi-flavored domain reweighting by MULTIPLICATIVE WEIGHTS over
    * any per-document integer signal (Xie et al. 2023 reweight domains
    * by excess loss; here the update is the textbook LINEAR hedge form
    * w ← w·(1 + η·m) — exact rational arithmetic, no exp, so both
    * engines agree bit-for-bit). Domains whose mean signal exceeds the
    * corpus mean gain weight round over round, bounded per round to
    * [×0.25, ×4]; the caller picks the signal (excess loss proxy,
    * difficulty, quality — any integer column) and η.
    *
    * Everything after ONE corpus aggregation is domain-sized: per-domain
    * (n, Σsignal), a 1-row corpus-mean broadcast, then `rounds` unrolled
    * integer hedge updates as column arithmetic and a 1-row total for
    * shares. Signal sums ride DECIMAL(38,0) so 10¹²-doc corpora cannot
    * wrap. Relative excess is normalized by |corpus mean| (dimensionless
    * bp), making η signal-unit-free. Both engines truncate integer
    * division toward zero, so negative excess needs no sign-split.
    *
    * Output: (source, n_docs, mean_sig, excess, weight_micro, share_bp)
    * ordered by source.
    */
  def mwDomainReweight(rows: DataFrame, sourceCol: String,
      signal: org.apache.spark.sql.Column, rounds: Int = 3,
      etaBp: Int = 2500): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds must be in [1,8], got $rounds")
    require(etaBp >= 1 && etaBp <= 10000, s"etaBp must be in [1,10000], got $etaBp")
    val dom = rows.select(col(sourceCol).as("source"),
        signal.cast("long").as("_s"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_s").cast("decimal(38,0)")).as("_ss"))
    val g = dom.agg(sum(col("_ss")).as("_gs"), sum(col("n_docs")).as("_gn"))
      .select(expr("CAST(_gs div _gn AS BIGINT)").as("_cm"))
    val seeded = dom.crossJoin(broadcast(g))
      .withColumn("mean_sig", expr("CAST(_ss div n_docs AS BIGINT)"))
      .withColumn("excess", col("mean_sig") - col("_cm"))
      .withColumn("_f", expr(s"""least(greatest(
        1000000L + ($etaBp * ((10000 * excess) div greatest(abs(_cm), 1L)))
          div 10000, 250000L), 4000000L)"""))
      .withColumn("weight_micro", lit(1000000L))
    val hedged = (1 to rounds).foldLeft(seeded)((d, _) =>
      d.withColumn("weight_micro", expr("(weight_micro * _f) div 1000000")))
    val tw = hedged.agg(sum(col("weight_micro")).as("_tw"))
    hedged.crossJoin(broadcast(tw))
      .select(col("source"), col("n_docs"), col("mean_sig"), col("excess"),
        col("weight_micro"),
        expr("(10000 * weight_micro) div _tw").as("share_bp"))
      .orderBy(col("source"))
  }

  private val MwRounds = 3
  private val MwEtaBp = 2500

  // signal: Flesch–Kincaid grade micro (TextOps.readability) — "harder
  // prose gains sampling weight", the difficulty-targeting instantiation
  private val mwFkSql = {
    val hedge = (1 to MwRounds).foldLeft("1000000")((e, _) =>
      s"(($e * f) // 1000000)")
    s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
    m AS (SELECT doc_id, source,
        CAST(len(toks) AS BIGINT) AS n_words,
        GREATEST(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
        CAST(list_sum(list_transform(toks, t ->
          GREATEST(1, len(regexp_extract_all(lower(t), '[aeiouy]+'))))) AS BIGINT) AS n_syllables
      FROM t WHERE len(toks) >= 1),
    fk AS (SELECT source,
        CAST(390000 * n_words // n_sentences
          + 11800000 * n_syllables // n_words - 15590000 AS BIGINT) AS s
      FROM m),
    dom AS (SELECT source, COUNT(*) AS n_docs, SUM(CAST(s AS HUGEINT)) AS ss
      FROM fk GROUP BY source),
    g AS (SELECT CAST(SUM(ss) // SUM(n_docs) AS BIGINT) AS cm FROM dom),
    d1 AS (SELECT source, n_docs, CAST(ss // n_docs AS BIGINT) AS mean_sig,
        CAST(ss // n_docs AS BIGINT) - cm AS excess, cm FROM dom, g),
    d2 AS (SELECT source, n_docs, mean_sig, excess,
        LEAST(GREATEST(1000000 + ($MwEtaBp * ((10000 * excess)
          // GREATEST(ABS(cm), 1))) // 10000, 250000), 4000000) AS f
      FROM d1),
    d3 AS (SELECT source, n_docs, mean_sig, excess,
        CAST($hedge AS BIGINT) AS weight_micro FROM d2),
    w AS (SELECT SUM(weight_micro) AS tw FROM d3)
    SELECT source, n_docs, CAST(mean_sig AS BIGINT) AS mean_sig,
      CAST(excess AS BIGINT) AS excess,
      CAST(weight_micro AS BIGINT) AS weight_micro,
      CAST((10000 * weight_micro) // tw AS BIGINT) AS share_bp
    FROM d3, w ORDER BY source"""
  }

  private val qMwReweight = GraftQuery(
    "qt_mw_reweight",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      mwDomainReweight(
        docs.select(col("doc_id"), col("source"))
          .join(TextOps.readability(docs)
            .select(col("doc_id"), col("fk_grade_micro")), "doc_id"),
        "source", col("fk_grade_micro"), MwRounds, MwEtaBp)
    },
    Some(mwFkSql))

  // ---------------------------- PPS systematic sampling (Madow 1949)
  /** Probability-proportional-to-size SYSTEMATIC sampling — the
    * classical πps design (Madow 1949; the workhorse behind audit
    * sampling and weighted corpus subsetting; the fixed-BUDGET
    * with-multiplicity design next to TextOps.weightedSample's
    * priority top-k): lay every unit's weight
    * end-to-end on [0, W), fire n probes at the midpoints p_i =
    * ⌊(2i+1)·W/(2n)⌋, and select each unit as many times as probes
    * land in its interval — inclusion probability exactly n·w/W for
    * w ≤ W/n, oversized units drawn with multiplicity (the textbook
    * behavior). Zero randomness: units are ordered by content hash
    * (id-tiebroken), so the draw is reproducible across engines,
    * partitionings, and reruns — the [[Nlp.h60]] derandomization
    * convention.
    *
    * Exactness: with F(t) = #probes < t = min(n, ⌈(⌈2nt/W⌉ − 1)/2⌉),
    * a unit's multiplicity is F(c) − F(c−w) on its cumulative interval
    * — prefix-count differences, every ceil on nonnegative integers,
    * and Σ mult = F(W) = n EXACTLY (test-pinned). One
    * [[Scans.rangedCumSum]] over the hash order + a 1-row broadcast
    * total; no global sort, no per-probe pass.
    *
    * Output: selected units only — (id, w, mult), ordered by id.
    */
  def ppsSystematicSample(docs: DataFrame, n: Int, idCol: String = "doc_id",
      weightCol: String = "n_chars", textCol: String = "text"): DataFrame = {
    require(n >= 1, s"sample budget must be >= 1, got $n")
    val v = docs.select(col(idCol).cast("long").as("id"),
        col(weightCol).cast("long").as("w"), col(textCol).as("t"))
      .filter(col("w") > 0)
      .withColumn("ok", expr(
        s"cast(${Nlp.h60("t")} as decimal(38,0)) * 10000000000 + id"))
      .select(col("id"), col("w"), col("ok"))
    val tot = v.agg(sum(col("w")).as("tw")).localCheckpoint()
    def f(t: String) =
      s"least(cast($n as bigint), ((2 * $n * cast(($t) as decimal(38,0)) + tw - 1) div tw) div 2)"
    Scans.rangedCumSum(v, "ok", col("w"), "c")
      .crossJoin(broadcast(tot))
      .withColumn("mult",
        (expr(f("c")) - expr(f("c - w"))).cast("long"))
      .filter(col("mult") > 0)
      .select(col("id"), col("w"), col("mult"))
      .orderBy(col("id"))
  }

  private val PpsN = 200

  /** 200-probe πps draw over the corpus by character mass — the
    * deterministic weighted subset a size-budgeted curation pass
    * starts from.
    */
  private val qPps = GraftQuery(
    "qt_pps_sample",
    (s, dir) => ppsSystematicSample(Tables.documents(s, dir), PpsN),
    Some(s"""WITH v AS (SELECT doc_id AS id, n_chars AS w,
        CAST(${h60Sql("text")} AS HUGEINT) * 10000000000 + doc_id AS ok
      FROM documents WHERE n_chars > 0),
    cum AS (SELECT id, w,
        SUM(w) OVER (ORDER BY ok
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM v),
    tw AS (SELECT SUM(w) AS tw FROM v),
    m AS (SELECT id, w,
        LEAST($PpsN, ((2 * $PpsN * CAST(c AS HUGEINT) + tw - 1) // tw) // 2)
        - LEAST($PpsN, ((2 * $PpsN * CAST(c - w AS HUGEINT) + tw - 1) // tw) // 2)
          AS mult
      FROM cum, tw)
    SELECT id, w, CAST(mult AS BIGINT) AS mult FROM m
    WHERE mult > 0 ORDER BY id"""))

  def queries: Seq[GraftQuery] = Seq(qNormalize, qDomainMix, qSeqPack, qChunk,
    qDsir, qShardPlan, qTokenBudget, qMwReweight, qPps)
}
