package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.GraftQuery

/** Data-profiling operator — the QA pass a training-data pipeline runs
  * before spending GPU-hours: per-column null counts, cardinality, and
  * range, in ONE aggregation job regardless of column count (no per-column
  * scans, no driver loops; the single aggregated row is unpivoted with
  * `stack`, so everything stays in the plan).
  */
object ProfileOps {

  private def orderable(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType | BooleanType => true
    case _ => false
  }

  /** Profile every column: (col_name, non_null, nulls, n_distinct, min_s,
    * max_s). `exact=false` (default) uses approx_count_distinct — the right
    * profiler at corpus scale; `exact=true` uses COUNT(DISTINCT) for
    * cross-engine-exact output. min/max surface as strings so
    * heterogeneous columns stack into one frame; non-orderable columns
    * (arrays, maps, binary) report null min/max.
    */
  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val distinct = if (exact) countDistinct(c) else approx_count_distinct(c)
      Seq(
        count(c).as(s"${f.name}__nn"),
        distinct.as(s"${f.name}__nd"),
        (if (orderable(f.dataType)) min(c).cast("string") else lit(null).cast("string"))
          .as(s"${f.name}__min"),
        (if (orderable(f.dataType)) max(c).cast("string") else lit(null).cast("string"))
          .as(s"${f.name}__max"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = fields.map { f =>
      s"'${f.name}', `${f.name}__nn`, __total - `${f.name}__nn`, " +
        s"`${f.name}__nd`, `${f.name}__min`, `${f.name}__max`"
    }.mkString(", ")
    row.selectExpr(
        s"stack(${fields.length}, $stackArgs) AS (col_name, non_null, nulls, n_distinct, min_s, max_s)")
      .orderBy(col("col_name"))
  }

  // Oracle binding: exact profile of `documents` (integer/string columns
  // only, so min/max string forms agree across engines).
  private val qProfile = GraftQuery(
    "qprof_documents",
    (s, dir) => profile(
      Tables.documents(s, dir).select("doc_id", "lang", "n_chars", "text"),
      exact = true),
    Some("""WITH p AS (
      SELECT 'doc_id' AS col_name, COUNT(doc_id) AS non_null,
        COUNT(*) - COUNT(doc_id) AS nulls, COUNT(DISTINCT doc_id) AS n_distinct,
        CAST(MIN(doc_id) AS VARCHAR) AS min_s, CAST(MAX(doc_id) AS VARCHAR) AS max_s
      FROM documents
      UNION ALL
      SELECT 'lang', COUNT(lang), COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
        CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'n_chars', COUNT(n_chars), COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
        CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'text', COUNT(text), COUNT(*) - COUNT(text), COUNT(DISTINCT text),
        CAST(MIN(text) AS VARCHAR), CAST(MAX(text) AS VARCHAR) FROM documents)
    SELECT col_name, non_null, nulls, n_distinct, min_s, max_s
    FROM p ORDER BY col_name"""))

  // Second binding on a different shape (events): bigint/varchar columns
  // only — double and timestamp min/max would compare via engine-specific
  // string formatting, which the profile's min_s/max_s casts can't make
  // deterministic.
  private val qProfileEvents = GraftQuery(
    "qprof_events",
    (s, dir) => profile(
      Tables.events(s, dir).select("event_id", "user_id", "event_type"),
      exact = true),
    Some("""WITH p AS (
      SELECT 'event_id' AS col_name, COUNT(event_id) AS non_null,
        COUNT(*) - COUNT(event_id) AS nulls, COUNT(DISTINCT event_id) AS n_distinct,
        CAST(MIN(event_id) AS VARCHAR) AS min_s, CAST(MAX(event_id) AS VARCHAR) AS max_s
      FROM events
      UNION ALL
      SELECT 'user_id', COUNT(user_id), COUNT(*) - COUNT(user_id),
        COUNT(DISTINCT user_id),
        CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR) FROM events
      UNION ALL
      SELECT 'event_type', COUNT(event_type), COUNT(*) - COUNT(event_type),
        COUNT(DISTINCT event_type),
        CAST(MIN(event_type) AS VARCHAR), CAST(MAX(event_type) AS VARCHAR) FROM events)
    SELECT col_name, non_null, nulls, n_distinct, min_s, max_s
    FROM p ORDER BY col_name"""))

  // ------------------------------------------------- histogram quantiles
  /** Histogram-sketch quantiles — the deterministic, mergeable stand-in
    * for approx_percentile/t-digest at corpus scale: values bin into
    * `bins` fixed-width buckets over [lo, hi] (map-only), ONE uniform-key
    * aggregation counts them, and each requested quantile reads off the
    * first bin whose cumulative count reaches ⌈q·n⌉. Error is bounded by
    * the bin width, every step is exact integer arithmetic (the bin pick
    * compares cum ≥ ceil(q·n) — no division), and unlike t-digest the
    * sketch is order-insensitive, so results are bit-identical across
    * engines, partitionings, and retries — the property approx_percentile
    * explicitly does NOT guarantee.
    *
    * Output: (group, q, bin, est_upper) — est_upper is the bin's upper
    * edge, a conservative quantile upper bound lo + (bin+1)·width.
    */
  def histogramQuantiles(df: DataFrame, valueCol: String, groupCol: String,
      qs: Seq[Double], lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "quantiles in (0, 1]")
    val width = (hi - lo) / bins
    val binned = df.select(col(groupCol).as("grp"),
      least(lit(bins - 1), greatest(lit(0),
        floor((col(valueCol) - lo) / (hi - lo) * bins))).cast("int").as("bin"))
    val counts = binned.groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("bin"))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wn))
      .crossJoin(broadcast(
        df.sparkSession.range(1).select(explode(typedLit(qs)).as("q"))))
      .filter(col("cum") >= expr("cast(ceil(q * n) as bigint)"))
      .groupBy(col("grp"), col("q"))
      .agg(min(col("bin")).as("bin"))
      .select(col("grp"), col("q"), col("bin"),
        (lit(lo) + (col("bin") + 1) * lit(width)).as("est_upper"))
  }

  private val HistQs = Seq(0.5, 0.9, 0.99)

  private val qHistQuantile = GraftQuery(
    "qstat_hist_quantile",
    (s, dir) => histogramQuantiles(Tables.events(s, dir), "value", "event_type",
        HistQs, lo = 0.0, hi = 500.0, bins = 50)
      .withColumnRenamed("grp", "event_type")
      .orderBy(col("event_type"), col("q")),
    Some(s"""WITH b AS (SELECT event_type,
      CAST(LEAST(49, GREATEST(0, floor((value - 0.0) / (500.0 - 0.0) * 50))) AS INT) AS bin
      FROM events),
    c AS (SELECT event_type, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
    w AS (SELECT event_type, bin,
      CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum,
      CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM c),
    qx AS (SELECT unnest([${HistQs.map(q => s"CAST($q AS DOUBLE)").mkString(", ")}]) AS q),
    s AS (SELECT event_type, q, MIN(bin) AS bin FROM w, qx
      WHERE cum >= CAST(ceil(q * n) AS BIGINT) GROUP BY 1, 2)
    SELECT event_type, q, bin,
      CAST(0.0 + (bin + 1) * ${(500.0 - 0.0) / 50} AS DOUBLE) AS est_upper
    FROM s ORDER BY event_type, q"""))

  // ------------------------------------------------------ expectations
  /** One row-level data-quality expectation: a name plus a boolean
    * predicate. A NULL predicate result counts as a FAILURE (the
    * convention validation suites use — an unknown is not a pass).
    */
  final case class Expectation(name: String, pred: org.apache.spark.sql.Column)

  /** Evaluate row-level expectations in ONE aggregation pass regardless
    * of how many checks there are (each check is a conditional-sum
    * column; the single result row is unpivoted with `stack`) — never a
    * scan per check. Output: (check, n_rows, n_fail, pass).
    */
  def validate(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "need at least one expectation")
    require(checks.map(_.name).distinct.size == checks.size,
      "expectation names must be unique")
    val aggs = checks.map(e =>
      sum(when(e.pred, 0L).otherwise(1L)).as(s"${e.name}__f")) :+
      count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.map(e => s"'${e.name}', `${e.name}__f`").mkString(", ")
    row.selectExpr(
        s"stack(${checks.size}, $stackArgs) AS (check, n_fail)", "__total AS n_rows")
      .select(col("check"), col("n_rows"), col("n_fail"),
        (col("n_fail") === 0L).as("pass"))
  }

  /** Table-level uniqueness expectation: rows beyond one per distinct
    * non-null key tuple are failures. Same output row shape as
    * [[validate]].
    */
  def uniqueExpectation(df: DataFrame, name: String,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    df.agg(count(lit(1)).as("n_rows"),
        countDistinct(col(keys.head), keys.tail.map(col): _*).as("_nd"))
      .select(lit(name).as("check"), col("n_rows"),
        (col("n_rows") - col("_nd")).as("n_fail"),
        (col("n_rows") === col("_nd")).as("pass"))
  }

  /** Referential-integrity expectation: child rows whose key has no match
    * in the parent are failures (orphans). Plan is a left-anti join on
    * the key — Catalyst/AQE picks broadcast when the parent's distinct
    * keys fit, sort-merge otherwise; no hint is forced because a generic
    * integrity check cannot assume the parent is a dimension.
    */
  def refExpectation(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String): DataFrame = {
    val orphans = child.join(
        parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_fail"))
    child.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphans)
      .select(lit(name).as("check"), col("n_rows"), col("n_fail"),
        (col("n_fail") === 0L).as("pass"))
  }

  // Orders-table validation suite: the shape every ingest gate runs —
  // row-level domain/nullability/format checks in one pass, plus
  // key-uniqueness and referential integrity to customer.
  private val qExpectations = GraftQuery(
    "qprof_expectations",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      validate(o, Seq(
          Expectation("custkey_not_null", col("o_custkey").isNotNull),
          Expectation("priority_format", col("o_orderpriority").rlike("^[1-5]-")),
          Expectation("status_in_domain", col("o_orderstatus").isin("O", "F", "P")),
          Expectation("totalprice_positive", col("o_totalprice") > 0)))
        .unionAll(uniqueExpectation(o, "orderkey_unique", Seq("o_orderkey")))
        .unionAll(refExpectation(o, "o_custkey",
          Tables.customer(s, dir), "c_custkey", "custkey_in_customer"))
        .orderBy(col("check"))
    },
    Some("""WITH rc AS (SELECT COUNT(*) AS n,
      SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS f1,
      SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 0 ELSE 1 END) AS f2,
      SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END) AS f3,
      SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS f4,
      COUNT(DISTINCT o_orderkey) AS nd FROM orders),
    orph AS (SELECT COUNT(*) AS orphans FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
    u AS (
      SELECT 'custkey_not_null' AS check_name, n, CAST(f1 AS BIGINT) AS n_fail FROM rc
      UNION ALL SELECT 'priority_format', n, CAST(f2 AS BIGINT) FROM rc
      UNION ALL SELECT 'status_in_domain', n, CAST(f3 AS BIGINT) FROM rc
      UNION ALL SELECT 'totalprice_positive', n, CAST(f4 AS BIGINT) FROM rc
      UNION ALL SELECT 'orderkey_unique', n, n - nd FROM rc
      UNION ALL SELECT 'custkey_in_customer', n, orphans FROM rc, orph)
    SELECT check_name AS "check", n AS n_rows, n_fail, n_fail = 0 AS pass
    FROM u ORDER BY check_name"""))

  // --------------------------------------------- distribution drift
  /** Distribution-drift monitor — the PSI-family check ML-ops pipelines
    * run between a reference window and current data before trusting a
    * model or a data feed: bucket both sides on FIXED edges (data-
    * independent, so the readout is comparable across runs and
    * streamable), compare per-bucket population shares. The shares and
    * their deltas are exact integer basis points (10⁴·n DIV total) —
    * the log-ratio PSI statistic is deliberately replaced by the L∞/L1-
    * style share deltas so the gate stays engine-exact; any bucket's
    * drift_bp over a threshold is the alert.
    *
    * Scale shape: two map-only bucket projections, two ≤`buckets`-row
    * aggregations (uniform keys, map-side partials), one full-outer
    * join of bucket-count frames + two 1-row broadcast totals. The
    * corpus is scanned once per side; everything downstream is
    * bucket-cardinality-sized.
    *
    * Output: (bucket, n_ref, n_cur, ref_bp, cur_bp, drift_bp) for every
    * bucket populated on either side, ordered by bucket.
    */
  def distributionDrift(ref: DataFrame, cur: DataFrame,
      valCents: org.apache.spark.sql.Column, buckets: Int = 10,
      widthCents: Long = 5000L): DataFrame = {
    require(buckets >= 2 && widthCents > 0)
    def counts(df: DataFrame, side: String) = df
      .select(least(lit(buckets - 1),
        (valCents.cast("bigint") / lit(widthCents)).cast("bigint")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(s"n_$side"))
    val r = counts(ref, "ref")
    val c = counts(cur, "cur")
    val totals = r.agg(sum(col("n_ref")).as("t_ref"))
      .crossJoin(c.agg(sum(col("n_cur")).as("t_cur")))
    r.join(c, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        expr("10000 * n_ref div t_ref").as("ref_bp"),
        expr("10000 * n_cur div t_cur").as("cur_bp"),
        abs(expr("10000 * n_ref div t_ref") - expr("10000 * n_cur div t_cur"))
          .as("drift_bp"))
      .orderBy(col("bucket"))
  }

  private val DriftCutoff = "2024-01-16 00:00:00"

  private val driftSql = s"""WITH c AS (SELECT ts,
      CAST(round(value * 100) AS BIGINT) AS cents FROM events),
    r AS (SELECT LEAST(9, cents // 5000) AS bucket, COUNT(*) AS n_ref
      FROM c WHERE ts < TIMESTAMP '$DriftCutoff' GROUP BY 1),
    u AS (SELECT LEAST(9, cents // 5000) AS bucket, COUNT(*) AS n_cur
      FROM c WHERE ts >= TIMESTAMP '$DriftCutoff' GROUP BY 1),
    t AS (SELECT (SELECT SUM(n_ref) FROM r) AS t_ref, (SELECT SUM(n_cur) FROM u) AS t_cur)
    SELECT COALESCE(r.bucket, u.bucket) AS bucket,
      CAST(COALESCE(r.n_ref, 0) AS BIGINT) AS n_ref,
      CAST(COALESCE(u.n_cur, 0) AS BIGINT) AS n_cur,
      CAST(10000 * COALESCE(r.n_ref, 0) // t.t_ref AS BIGINT) AS ref_bp,
      CAST(10000 * COALESCE(u.n_cur, 0) // t.t_cur AS BIGINT) AS cur_bp,
      CAST(abs(10000 * COALESCE(r.n_ref, 0) // t.t_ref
        - 10000 * COALESCE(u.n_cur, 0) // t.t_cur) AS BIGINT) AS drift_bp
    FROM r FULL OUTER JOIN u ON r.bucket = u.bucket CROSS JOIN t
    ORDER BY bucket"""

  private val qDrift = GraftQuery(
    "qprof_drift",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("ts"), round(col("value") * 100).cast("bigint").as("cents"))
      val cut = lit(DriftCutoff).cast("timestamp")
      distributionDrift(ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        col("cents"))
    },
    Some(driftSql))

  // ------------------------------------------- embedding dim profile
  /** Per-DIMENSION embedding statistics — the vector-column QA pass
    * (dead dimensions, scale drift, un-normalized batches) run before
    * any ANN/clustering tier trusts the column. One posexplode (×dim
    * map-side fan-out that collapses immediately into a `dim`-key
    * partial aggregate — at most `dim` rows per partition cross the
    * wire) + one tiny agg.
    *
    * Exactness: sums accumulate as ×2²⁴-quantized BIGINTs in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB SUM), so mean and std are
    * ONE fixed-form IEEE expression over exact integers — bit-identical
    * cross-engine; min/max compare raw doubles exactly.
    *
    * Output: (dim, n, mean_val, std_val, min_val, max_val), dim 1-based.
    */
  def embeddingDimProfile(vecs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = 1L << 24
    val q2 = (1L << 24).toDouble * (1L << 24)   // 2^48, exact as double
    vecs
      .select(posexplode(expr(s"cast($vecCol as array<double>)")).as(Seq("pos", "val")))
      .select((col("pos") + 1).cast("bigint").as("dim"), col("val"),
        expr(s"cast(round(val * $q) as bigint)").as("qv"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("qv").cast("decimal(38,0)")).as("qs"),
        sum((col("qv") * col("qv")).cast("decimal(38,0)")).as("q2s"),
        min(col("val")).as("min_val"), max(col("val")).as("max_val"))
      .select(col("dim"), col("n"),
        expr(s"cast(qs as double) / (cast(n as double) * $q)").as("mean_val"),
        expr(s"sqrt(greatest(cast(q2s as double) / (cast(n as double) * $q2)" +
          s" - (cast(qs as double) / (cast(n as double) * $q))" +
          s" * (cast(qs as double) / (cast(n as double) * $q)), 0.0))").as("std_val"),
        col("min_val"), col("max_val"))
      .orderBy(col("dim"))
  }

  private val qDimProfile = GraftQuery(
    "qprof_embedding_dims",
    (s, dir) => embeddingDimProfile(Tables.embeddings(s, dir)),
    Some("""WITH x AS (SELECT CAST(i AS BIGINT) AS dim, v[i] AS val,
        CAST(round(v[i] * 16777216) AS BIGINT) AS qv
      FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings) e,
        LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) g),
      a AS (SELECT dim, COUNT(*) AS n, SUM(qv) AS qs, SUM(qv * qv) AS q2s,
        MIN(val) AS min_val, MAX(val) AS max_val FROM x GROUP BY dim)
      SELECT dim, CAST(n AS BIGINT) AS n,
        CAST(qs AS DOUBLE) / (CAST(n AS DOUBLE) * 16777216) AS mean_val,
        sqrt(greatest(CAST(q2s AS DOUBLE) / (CAST(n AS DOUBLE) * 281474976710656.0)
          - (CAST(qs AS DOUBLE) / (CAST(n AS DOUBLE) * 16777216))
          * (CAST(qs AS DOUBLE) / (CAST(n AS DOUBLE) * 16777216)), 0.0) ) AS std_val,
        min_val, max_val
      FROM a ORDER BY dim"""))

  // --------------------------- privacy QA: k-anonymity / l-diversity
  /** Privacy audit of a release candidate — the re-identification QA
    * pass run before any row-level data leaves a pipeline (Sweeney's
    * k-anonymity; Machanavajjhala et al.'s l-diversity): group rows by
    * the quasi-identifier columns and flag every group that is either
    * smaller than `k` (an attacker joining on the QI pins a person to
    * < k candidates) or carries fewer than `l` distinct values of the
    * sensitive column (the whole group shares an attribute, so
    * membership alone discloses it). Generalization (banding a numeric
    * QI) is the caller's `withColumn` — the audit works on any frame.
    *
    * One uniform-QI-key aggregation (count + count distinct), map-only
    * otherwise; output is bounded by the violating-group count.
    * Output: (quasi..., n_rows, n_sensitive, k_violation, l_violation)
    * for violating groups only, ordered by the quasi columns.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_violation", col("n_rows") < k)
      .withColumn("l_violation", col("n_sensitive") < l)
      .filter(col("k_violation") || col("l_violation"))
      .orderBy(quasiCols.map(col): _*)
  }

  private val AnonK = 4
  private val AnonL = 3

  private val qKAnon = GraftQuery(
    "qpriv_k_anon",
    (s, dir) => kAnonymityAudit(
      Tables.customer(s, dir)
        .withColumn("acct_band", floor(col("c_acctbal") / 2000).cast("long")),
      Seq("c_nationkey", "acct_band"), "c_mktsegment", AnonK, AnonL),
    Some(s"""WITH g AS (SELECT c_nationkey,
        CAST(floor(c_acctbal / 2000) AS BIGINT) AS acct_band,
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
      FROM customer GROUP BY 1, 2)
      SELECT c_nationkey, acct_band, n_rows, n_sensitive,
        n_rows < $AnonK AS k_violation, n_sensitive < $AnonL AS l_violation
      FROM g WHERE n_rows < $AnonK OR n_sensitive < $AnonL
      ORDER BY c_nationkey, acct_band"""))

  // ---------------------------------------------- privacy QA: t-closeness
  /** t-closeness audit (Li, Li & Venkatasubramanian 2007, the variational-
    * distance instantiation for categorical sensitive attributes):
    * k-anonymity and l-diversity ([[kAnonymityAudit]]) don't catch a group
    * whose sensitive-value DISTRIBUTION is skewed far from the corpus (an
    * attacker learns "this group is 90% segment X" even with l distinct
    * values present). For each quasi-identifier group, the total-variation
    * distance between the group's sensitive distribution and the global
    * one, flagged when it exceeds `tMicro`:
    *
    *   TVD_g = ½ (Σp_g + Σp_glob − 2 Σ_matched min(p_g, p_glob))
    *
    * — the same min-form as [[PairOps.sourceTvd]] (absent sensitive values
    * contribute only their global mass), probabilities micro-floored so
    * both engines agree bit-exactly. Plan: one (QI, sensitive) agg, one QI
    * agg, the |sensitive|-sized global table joined BROADCAST, one final
    * QI-key agg — all uniform keys, nothing corpus-pairing.
    *
    * Output: violating groups only — (quasi..., n_rows, tvd_micro),
    * ordered by the quasi columns.
    */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tMicro: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tMicro >= 0, s"tMicro must be >= 0, got $tMicro")
    val qc = quasiCols.map(col)
    val gsv = df.groupBy((qc :+ col(sensitiveCol).as("_sv")): _*)
      .agg(count(lit(1)).as("_ngs"))
    val gtot = gsv.groupBy(qc: _*).agg(sum(col("_ngs")).as("_ng"))
    val glob = gsv.groupBy(col("_sv")).agg(sum(col("_ngs")).as("_ns"))
      .crossJoin(broadcast(gsv.agg(sum(col("_ngs")).as("_nn"))))
      .select(col("_sv"), expr("(1000000 * _ns) div _nn").as("_pglob"))
    val globTot = glob.agg(sum(col("_pglob")).as("_ptg"))
    gsv.join(gtot, quasiCols)
      .select((qc :+ col("_sv") :+ expr("(1000000 * _ngs) div _ng").as("_pg")
        :+ col("_ng")): _*)
      .join(broadcast(glob), Seq("_sv"))
      .groupBy(qc: _*)
      .agg(max(col("_ng")).as("n_rows"), sum(col("_pg")).as("_spg"),
        sum(least(col("_pg"), col("_pglob"))).as("_m"))
      .crossJoin(broadcast(globTot))
      .select((qc :+ col("n_rows") :+
        expr("(_spg + _ptg - 2 * _m) div 2").as("tvd_micro")): _*)
      .filter(col("tvd_micro") > tMicro)
      .orderBy(qc: _*)
  }

  private val CloseT = 400000L

  private val qTClose = GraftQuery(
    "qpriv_t_closeness",
    (s, dir) => tClosenessAudit(
      Tables.customer(s, dir)
        .withColumn("acct_band", floor(col("c_acctbal") / 2000).cast("long")),
      Seq("c_nationkey", "acct_band"), "c_mktsegment", CloseT),
    Some(s"""WITH b AS (SELECT c_nationkey,
        CAST(floor(c_acctbal / 2000) AS BIGINT) AS acct_band,
        c_mktsegment AS sv FROM customer),
    gsv AS (SELECT c_nationkey, acct_band, sv, COUNT(*) AS ngs
      FROM b GROUP BY 1, 2, 3),
    gtot AS (SELECT c_nationkey, acct_band, SUM(ngs) AS ng
      FROM gsv GROUP BY 1, 2),
    gl AS (SELECT sv, (1000000 * SUM(ngs)) // (SELECT SUM(ngs) FROM gsv) AS pglob
      FROM gsv GROUP BY sv),
    ptg AS (SELECT SUM(pglob) AS ptg FROM gl),
    g AS (SELECT gsv.c_nationkey, gsv.acct_band, MAX(gtot.ng) AS n_rows,
        SUM((1000000 * gsv.ngs) // gtot.ng) AS spg,
        SUM(LEAST((1000000 * gsv.ngs) // gtot.ng, gl.pglob)) AS m
      FROM gsv
      JOIN gtot ON gsv.c_nationkey = gtot.c_nationkey
        AND gsv.acct_band = gtot.acct_band
      JOIN gl ON gsv.sv = gl.sv
      GROUP BY gsv.c_nationkey, gsv.acct_band)
    SELECT c_nationkey, acct_band, CAST(n_rows AS BIGINT) AS n_rows,
      CAST((spg + ptg.ptg - 2 * m) // 2 AS BIGINT) AS tvd_micro
    FROM g, ptg
    WHERE (spg + ptg.ptg - 2 * m) // 2 > $CloseT
    ORDER BY c_nationkey, acct_band"""))

  // ------------------------------------- functional-dependency discovery
  /** Approximate functional-dependency profiling over candidate column
    * pairs — the schema-discovery / data-quality readout ("does A
    * determine B, and if not, how far off is it"). For each (det, dep)
    * candidate the violation measure is the standard g3 error (Kivinen &
    * Mannila; TANE): the minimum number of rows to delete so det → dep
    * holds exactly, = Σ over det-groups of (group rows − rows of the
    * group's most common dep value). Reported exactly, in rows and in
    * basis points of the table.
    *
    * NULL discipline: a NULL dep value counts as one dependent value (the
    * two-level count construction below — NOT count(distinct), which
    * would silently ignore NULLs and declare a column with NULL leaks
    * FD-clean on both engines only by accident).
    *
    * Plan per pair: project 2 columns (pruned at the scan) → (det, dep)
    * partial-agg count → det-level agg → 1 row. Two uniform-key
    * aggregations whose partial agg collapses each partition to its
    * distinct (det, dep) pairs before any shuffle; low-cardinality det
    * columns are an agg, not a join, so no skew guard is needed. The
    * per-pair frames are tiny unions — candidate pair count (not table
    * size) bounds the result.
    */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one (determinant, dependent) pair")
    val frames = pairs.map { case (a, b) =>
      df.select(col(a).cast("string").as("_det"), col(b).cast("string").as("_dep"))
        .groupBy(col("_det"), col("_dep")).agg(count(lit(1)).as("_n"))
        .groupBy(col("_det"))
        .agg(sum(col("_n")).as("_rows"), max(col("_n")).as("_keep"),
          count(lit(1)).as("_ndep"))
        .agg(sum(col("_rows")).cast("long").as("n_rows"),
          count(lit(1)).as("n_groups"),
          sum(when(col("_ndep") > 1, 1L).otherwise(0L)).as("violating_groups"),
          sum(col("_rows") - col("_keep")).cast("long").as("g3_remove_rows"))
        .select(lit(a).as("determinant"), lit(b).as("dependent"),
          col("n_rows"), col("n_groups"), col("violating_groups"),
          col("g3_remove_rows"),
          expr("10000 * g3_remove_rows div n_rows").as("g3_bp"),
          (col("violating_groups") === 0L).as("holds"))
    }
    frames.reduce(_ unionByName _).orderBy(col("determinant"), col("dependent"))
  }

  private def fdOracleLeg(table: String, a: String, b: String): String =
    s"""SELECT '$a' AS determinant, '$b' AS dependent,
        CAST(SUM(rows_) AS BIGINT) AS n_rows,
        CAST(COUNT(*) AS BIGINT) AS n_groups,
        CAST(SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
        CAST(SUM(rows_ - keep_) AS BIGINT) AS g3_remove_rows,
        CAST(10000 * SUM(rows_ - keep_) // SUM(rows_) AS BIGINT) AS g3_bp,
        SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) = 0 AS holds
      FROM (SELECT det, SUM(n) AS rows_, MAX(n) AS keep_, COUNT(*) AS ndep
        FROM (SELECT CAST($a AS VARCHAR) AS det, CAST($b AS VARCHAR) AS dep,
                COUNT(*) AS n FROM $table GROUP BY 1, 2) GROUP BY det)"""

  /** Candidate FDs on orders: the PK trivially determines everything, a
    * constant column is determined by anything, and the interesting
    * middle (customer → priority, date → priority) quantifies HOW
    * non-functional the dependency is.
    */
  private val qFd = GraftQuery(
    "qprof_fd_violations",
    (s, dir) => fdProfile(Tables.orders(s, dir), Seq(
      ("o_orderkey", "o_custkey"),
      ("o_custkey", "o_orderpriority"),
      ("o_orderstatus", "o_orderpriority"),
      ("o_orderdate", "o_orderpriority"))),
    Some(Seq(
      fdOracleLeg("orders", "o_orderkey", "o_custkey"),
      fdOracleLeg("orders", "o_custkey", "o_orderpriority"),
      fdOracleLeg("orders", "o_orderstatus", "o_orderpriority"),
      fdOracleLeg("orders", "o_orderdate", "o_orderpriority"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY determinant, dependent")))

  // ------------------------------------- join-cardinality estimation
  /** Equi-join output-cardinality estimate from a deterministic key-domain
    * sample — the optimizer-statistics instrument ("how big would A ⋈ B
    * be") for join planning at 100 TB, where |A ⋈ B| = Σ_k cntA(k)·cntB(k)
    * over the key domain and computing it exactly costs a full join.
    *
    * The sample is END-BIASED-style uniform over the KEY DOMAIN, not the
    * rows: key k is in the sample iff the first 8 hex digits of md5(k)
    * mod `rate` = 0 — the SAME keys on both sides and both engines, so
    * the per-key count products are exact on the sampled domain and the
    * estimate is rate · Σ_{sampled k} cntA·cntB. Sampling the key domain
    * (not rows) keeps the estimator unbiased for skewed joins: a hot
    * key's full cntA·cntB product is either in or out, never thinned
    * quadratically like a row sample would.
    *
    * The exact cardinality is also computed (per-key count frames joined
    * on the uniform key — counts, never payload rows) so the query doubles
    * as its own error harness, like qd_lsh_recall. Output: one row
    * (rate, n_keys_sampled, est_card, exact_card, err_bp).
    *
    * Plan: the sample filter sits BEFORE the per-key aggs (hash on the
    * key prunes at scan time); both aggs collapse map-side; the exact leg
    * joins two count frames on the uniform key. No join of row payloads
    * anywhere.
    */
  def joinCardEstimate(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, rate: Int = 16): DataFrame = {
    require(rate >= 1, s"rate must be >= 1, got $rate")
    def keyCounts(df: DataFrame, k: String, as: String) = df
      .select(col(k).cast("string").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as(as))
    def sampled(df: DataFrame) = df.filter(
      expr(s"cast(conv(substring(md5(k), 1, 8), 16, 10) as bigint) % $rate = 0"))
    val la = keyCounts(left, leftKey, "na")
    val ra = keyCounts(right, rightKey, "nb")
    val est = sampled(la).join(sampled(ra), "k")
      .agg(count(lit(1)).as("n_keys_sampled"),
        (sum(col("na") * col("nb")).cast("long") * rate).as("est_card"))
      .select(lit(rate).cast("long").as("rate"), col("n_keys_sampled"),
        col("est_card"))
    val exactCard = la.join(ra, "k")
      .agg(sum(col("na") * col("nb")).cast("long").as("exact_card"))
    est.crossJoin(broadcast(exactCard))
      .select(col("rate"), col("n_keys_sampled"), col("est_card"),
        col("exact_card"),
        expr("10000 * abs(est_card - exact_card) div exact_card").as("err_bp"))
  }

  /** Self-join of lineitem on part key — the classic skew-sensitive
    * cardinality the uniform-independence assumption gets wrong; the
    * domain sample gets it right to within a few percent.
    */
  private val qJoinCard = GraftQuery(
    "qprof_join_card",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      joinCardEstimate(li, "l_partkey", li, "l_partkey", rate = 16)
    },
    Some("""WITH kc AS (SELECT CAST(l_partkey AS VARCHAR) AS k, COUNT(*) AS n
        FROM lineitem GROUP BY 1),
      samp AS (SELECT k, n FROM kc
        WHERE CAST('0x' || substr(md5(k), 1, 8) AS BIGINT) % 16 = 0),
      est AS (SELECT CAST(16 AS BIGINT) AS rate,
        CAST(COUNT(*) AS BIGINT) AS n_keys_sampled,
        CAST(SUM(a.n * b.n) * 16 AS BIGINT) AS est_card
        FROM samp a JOIN samp b USING (k)),
      ex AS (SELECT CAST(SUM(a.n * b.n) AS BIGINT) AS exact_card
        FROM kc a JOIN kc b USING (k))
      SELECT rate, n_keys_sampled, est_card, exact_card,
        CAST(10000 * abs(est_card - exact_card) // exact_card AS BIGINT) AS err_bp
      FROM est CROSS JOIN ex"""))

  // ------------------------------------- privacy: randomized response
  /** Randomized response (Warner 1965) — the oldest local-DP mechanism,
    * the audit side here: each row reports its sensitive bit TRUTHFULLY
    * with probability 3/4 and FLIPPED with probability 1/4 (ε = ln 3
    * local differential privacy: P[report|yes]/P[report|no] ≤ 3 for
    * either report), then per-group counts are debiased by the closed
    * form ŷ = (obs − n/4)/(1 − 2/4) = 2·obs − n/2. The query emits the
    * true count next to the estimate — the utility audit a pipeline runs
    * before committing to a privatized collection.
    *
    * The "coin" is the deterministic md5-derived 60-bit hash of the row
    * id ([[Nlp.h60]], the one hash both engines compute identically) mod
    * 4 — so the mechanism is reproducible across engines and
    * partitionings (a pinned-seed simulation of the mechanism, exactly
    * like the hash-sampled k-means training contract). Debiased counts
    * stay integer by reporting ×2 units (`est_x2 = 4·obs − n`). One
    * map-only flip + one uniform-key aggregate — scale-free.
    *
    * Output: (group, n, true_pos, obs_pos, est_x2, err_x2) ordered by
    * group, where err_x2 = est_x2 − 2·true_pos is the realized
    * debiasing error in ×2 units.
    */
  def randomizedResponse(df: DataFrame, idCol: String, groupCol: String,
      sensitive: Column): DataFrame = {
    val flips = df.select(col(groupCol).as("grp"),
        sensitive.cast("int").as("y"),
        (expr(Nlp.h60(s"concat('rr', CAST($idCol AS STRING))")) % 4 === 0)
          .cast("int").as("flip"))
      .withColumn("rep", expr("CASE WHEN flip = 1 THEN 1 - y ELSE y END"))
    flips.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("true_pos"),
        sum(col("rep")).as("obs_pos"))
      .select(col("grp"), col("n"), col("true_pos"), col("obs_pos"),
        (lit(4) * col("obs_pos") - col("n")).as("est_x2"),
        (lit(4) * col("obs_pos") - col("n") - lit(2) * col("true_pos"))
          .as("err_x2"))
      .orderBy(col("grp"))
  }

  private val qRandResponse = GraftQuery(
    "qpriv_rand_response",
    (s, dir) => randomizedResponse(Tables.customer(s, dir),
      idCol = "c_custkey", groupCol = "c_nationkey",
      sensitive = col("c_mktsegment") === "BUILDING"),
    Some(s"""WITH f AS (SELECT c_nationkey AS grp,
        CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS y,
        CASE WHEN ${Nlp.h60Sql("('rr' || CAST(c_custkey AS VARCHAR))")} % 4 = 0
          THEN 1 ELSE 0 END AS flip
      FROM customer),
    r AS (SELECT grp, y, CASE WHEN flip = 1 THEN 1 - y ELSE y END AS rep FROM f)
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(y) AS BIGINT) AS true_pos,
      CAST(SUM(rep) AS BIGINT) AS obs_pos,
      CAST(4 * SUM(rep) - COUNT(*) AS BIGINT) AS est_x2,
      CAST(4 * SUM(rep) - COUNT(*) - 2 * SUM(y) AS BIGINT) AS err_x2
    FROM r GROUP BY grp ORDER BY grp"""))

  // ------------------------------ privacy: DP counts (discrete Laplace)
  /** Per-group count thresholds for the truncated discrete-Laplace
    * (two-sided geometric) mechanism at ε = ln 2: α = e^(−ε) = 1/2
    * makes EVERY CDF cut point an exact dyadic rational — P(K=0) = 1/3,
    * P(K=±k) = 2^(−k)/3, so with u uniform on [0, 3·2¹⁶) the inverse
    * CDF is a pure integer CASE ladder, identical in both engines (no
    * floats, no exp). Truncated at ±16: the folded tail mass is
    * 2·(1/3)·2⁻¹⁶ ≈ 10⁻⁵ (the δ of the resulting (ε, δ)-guarantee).
    */
  private def dlNoiseCase(u: String): String = {
    val neg = (16 to 1 by -1).map(j => s"WHEN $u < ${1L << (17 - j)} THEN ${-j}")
    val pos = (0 to 15).map(m =>
      s"WHEN $u < ${196608L - (1L << (16 - m))} THEN $m")
    (neg ++ pos).mkString("CASE ", " ", " ELSE 16 END")
  }

  /** Differentially private per-group counts — the release side of the
    * privacy tier ([[randomizedResponse]] is the local-DP collection
    * side; this is central DP on an aggregate): each group's count gets
    * independent discrete-Laplace noise with ε = ln 2 per count
    * (sensitivity 1 — one row moves one group's count by one), the
    * geometric mechanism of Ghosh–Roughgarden–Sundararajan, which is
    * UNIVERSALLY utility-optimal for counting queries.
    *
    * The noise draw is DERANDOMIZED through the engine's pinned-seed
    * convention (the bootstrap / randomized-response contract): u =
    * h60(tag ‖ group) mod 3·2¹⁶ — 60 hash bits against a 17.6-bit
    * modulus, bias < 10⁻¹², and both engines materialize the identical
    * release. True counts ride along for the utility audit. One
    * uniform-key aggregate + a map-only integer CASE — scale-free.
    *
    * Output: (grp, true_count, noisy_count, noise) ordered by grp.
    */
  def dpNoisyCounts(df: DataFrame, groupCol: String,
      tag: String = "dl"): DataFrame = {
    val u = s"(${Nlp.h60(s"concat('$tag', grp)")} % 196608)"
    df.select(col(groupCol).cast("string").as("grp"))
      .groupBy(col("grp")).agg(count(lit(1)).as("true_count"))
      .withColumn("noise", expr(dlNoiseCase(u)).cast("long"))
      .select(col("grp"), col("true_count"),
        (col("true_count") + col("noise")).as("noisy_count"), col("noise"))
      .orderBy(col("grp"))
  }

  private val qDpCounts = GraftQuery(
    "qpriv_dp_counts",
    (s, dir) => dpNoisyCounts(Tables.events(s, dir), "event_type"),
    Some(s"""WITH c AS (SELECT CAST(event_type AS VARCHAR) AS grp,
        COUNT(*) AS true_count FROM events GROUP BY 1),
    n AS (SELECT grp, true_count,
        CAST(${dlNoiseCase(s"(${Nlp.h60Sql("('dl' || grp)")} % 196608)")}
          AS BIGINT) AS noise FROM c)
    SELECT grp, CAST(true_count AS BIGINT) AS true_count,
      CAST(true_count + noise AS BIGINT) AS noisy_count, noise
    FROM n ORDER BY grp"""))

  // --------------------------------------- embedding distribution drift
  /** Embedding-space drift detection by random projections + KS — the
    * high-dimensional companion to qprof_drift (which buckets ONE scalar
    * column): project every vector onto a few fixed Rademacher (±1)
    * directions (Johnson–Lindenstrauss-style 1-D shadows; Cramér–Wold —
    * two distributions differ only if some 1-D projection differs) and
    * run the exact two-sample Kolmogorov–Smirnov test per direction
    * between the reference and current shards. An embedding-model swap,
    * a renormalization bug, or an upstream-content shift moves at least
    * one shadow; per-dim means (qprof_embedding_dims) miss covariance-
    * only drift that projections catch.
    *
    * Exactness: components are floored to integer micro-units BEFORE
    * the signed sum (float dot products are partition-order-dependent;
    * integer sums are not), so each projection is a deterministic
    * BIGINT and the KS statistic is [[StatTests.ksTest]]'s exact
    * cross-multiplied integer form. The sign matrix is an md5-derived
    * literal baked into both engines — one source. Scale: map-only
    * projection, then the KS ranged scan per direction — no pairs, no
    * global sort, d×(one exchange).
    *
    * Output: one KS row per direction (dir, n1, n2, at_value, d_bp,
    * reject_05), ordered by dir.
    */
  def embeddingDrift(emb: DataFrame, signs: Seq[Seq[Int]],
      isRef: Column, vecCol: String = "embedding"): DataFrame = {
    require(signs.nonEmpty && signs.forall(s => s.nonEmpty &&
      s.forall(v => v == 1 || v == -1)), "signs must be ±1 rows")
    val xi = expr(s"transform(cast($vecCol as array<double>), " +
      "x -> cast(floor(x * 1000000) as bigint))")
    signs.zipWithIndex.map { case (sg, j) =>
      // loud per-row dimension guard: a vector shorter/longer than the
      // sign row would zip_with-pad to NULL and silently VANISH from the
      // KS counts (while the oracle's list_sum keeps a partial sum) —
      // assert_true throws instead; it returns NULL on success, so the
      // when() wrapper just gates the projection on it
      val guard = assert_true(size(col(vecCol)) === lit(sg.size),
        lit(s"embeddingDrift: $vecCol length must equal the sign-row " +
          s"length ${sg.size} (direction $j)"))
      val proj = when(guard.isNull, aggregate(
        zip_with(xi, typedLit(sg).cast("array<bigint>"), (x, s) => x * s),
        lit(0L), (acc, v) => acc + v))
      StatTests.ksTest(emb.select(proj.as("v"), isRef.as("ref")), "v",
          col("ref"))
        .select(lit(j).as("dir"), col("n1"), col("n2"), col("at_value"),
          col("d_bp"), col("reject_05"))
    }.reduce(_ unionByName _).orderBy(col("dir"))
  }

  /** md5-derived ±1 (same bit rule as Nlp.h60 parity) — one source for
    * the Spark literal and the SQL list below.
    */
  private def rademacher(j: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp:$j:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1
    else -1
  }
  private val DriftDirs = 4
  private val DriftDim = 64
  private val driftSigns: Seq[Seq[Int]] =
    (0 until DriftDirs).map(j => (0 until DriftDim).map(i => rademacher(j, i)))

  private val embDriftSql = {
    val dirs = (0 until DriftDirs).map { j =>
      val lst = driftSigns(j).mkString("[", ", ", "]")
      s"""prj$j AS (SELECT vec_id % 2 = 0 AS ref,
        list_sum(list_transform(generate_series(1, ${driftSigns.head.size}),
          i -> CAST(floor(v[i] * 1000000) AS BIGINT) * ($lst)[i])) AS v
      FROM e0),
    g$j AS (SELECT v, SUM(CASE WHEN ref THEN 1 ELSE 0 END) AS k1,
        SUM(CASE WHEN ref THEN 0 ELSE 1 END) AS k2
      FROM prj$j WHERE v IS NOT NULL GROUP BY v),
    cum$j AS (SELECT v,
        SUM(k1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS c1,
        SUM(k2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS c2
      FROM g$j),
    tot$j AS (SELECT SUM(k1) AS n1, SUM(k2) AS n2 FROM g$j),
    d$j AS (SELECT v, n1, n2, ABS(c1 * n2 - c2 * n1) AS d_num
      FROM cum$j CROSS JOIN tot$j
      ORDER BY d_num DESC, v ASC LIMIT 1)"""
    }
    val out = (0 until DriftDirs).map(j =>
      s"""SELECT $j AS dir, n1, n2, v AS at_value,
        10000 * d_num // (n1 * n2) AS d_bp,
        CAST(d_num AS HUGEINT) * d_num * 1000000 >
          CAST(1844164 AS HUGEINT) * (n1 + n2) * n1 * n2 AS reject_05
      FROM d$j""").mkString("\n      UNION ALL ")
    s"""WITH e0 AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings),
      ${dirs.mkString(",\n    ")}
      SELECT CAST(dir AS INT) AS dir, CAST(n1 AS BIGINT) AS n1,
        CAST(n2 AS BIGINT) AS n2, CAST(at_value AS BIGINT) AS at_value,
        CAST(d_bp AS BIGINT) AS d_bp, reject_05
      FROM ($out) ORDER BY dir"""
  }

  /** Reference = even vec_ids, current = odd (the snapshot-parity split
    * every drift query here uses) — same-model halves, so the expected
    * read is "no rejection", and any flip is a real pipeline change.
    */
  private val qEmbDrift = GraftQuery(
    "qprof_embedding_drift",
    (s, dir) => embeddingDrift(Tables.embeddings(s, dir), driftSigns,
      col("vec_id") % 2 === 0),
    Some(embDriftSql))

  // ------------------------------------ Mondrian k-anonymization (build)
  /** Mondrian multidimensional k-anonymization (LeFevre, DeWitt &
    * Ramakrishnan, ICDE 2006) over two integer quasi-identifier
    * dimensions — the CONSTRUCTIVE side of qpriv_k_anon (that query
    * audits a given generalization; this one builds it): recursively
    * median-cut the QI space while both sides keep ≥ k records, emit
    * each final cell's generalized ranges. Variant pinned here (and
    * mirrored exactly by the oracle): per round every live cell tries
    * ONLY its widest-raw-range dimension (tie → dim 1), lower-median
    * threshold, left = v ≤ median; an inadmissible cut freezes the
    * cell. Fixed depth bounds the rounds (cells ≤ 2^depth).
    *
    * Scale: per round one cell-keyed stats agg, one (cell, value)
    * collapsed count + per-cell running sum — the window partition is
    * bounded by the DIM's distinct-value domain (constant in corpus
    * size for banded QI dims), never corpus rows — and one broadcast
    * join of the ≤2^depth-row cut plan back onto the rows. Loop state
    * rides [[Scans.rebase]].
    *
    * Output: (cell, n_rows, d1_min, d1_max, d2_min, d2_max) per final
    * cell, ordered by cell id (the cut path, so stable across engines).
    */
  def mondrianAnonymize(rows: DataFrame, k: Int, depth: Int = 6,
      idCol: String = "id", d1Col: String = "d1", d2Col: String = "d2")
      : DataFrame = {
    require(k >= 2 && depth >= 1, s"need k >= 2, depth >= 1: $k, $depth")
    var st = Scans.rebase(rows.select(col(idCol).as("id"),
      col(d1Col).cast("bigint").as("d1"), col(d2Col).cast("bigint").as("d2"))
      .withColumn("cell", lit(1L)).withColumn("done", lit(false)), 8)
    for (_ <- 1 to depth) {
      val act = st.filter(!col("done"))
      val stats = act.groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), min(col("d1")).as("a1"),
          max(col("d1")).as("b1"), min(col("d2")).as("a2"),
          max(col("d2")).as("b2"))
        .withColumn("dim",
          when(col("b1") - col("a1") >= col("b2") - col("a2"), 1)
            .otherwise(2))
      val vals = act.join(broadcast(stats.select(col("cell"), col("dim"))),
          "cell")
        .withColumn("v", when(col("dim") === 1, col("d1"))
          .otherwise(col("d2")))
      val cum = vals.groupBy(col("cell"), col("v"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
            .orderBy(col("v"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
      val med = cum.join(broadcast(stats.select(col("cell"), col("n"))),
          "cell")
        .groupBy(col("cell"))
        .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("v")))
          .as("med"))
      val nl = cum.join(broadcast(med), "cell")
        .filter(col("v") === col("med"))
        .select(col("cell"), col("cum").as("nl"))
      val plan = stats.join(med, "cell").join(nl, "cell")
        .withColumn("ok",
          col("nl") >= k && (col("n") - col("nl")) >= k)
        .select(col("cell"), col("dim"), col("med"), col("ok"))
      val prev = st
      st = Scans.rebase(st.join(broadcast(plan), Seq("cell"), "left")
        .select(col("id"), col("d1"), col("d2"),
          when(!col("done") && col("ok"),
            col("cell") * 2 + when((when(col("dim") === 1, col("d1"))
              .otherwise(col("d2"))) > col("med"), 1L).otherwise(0L))
            .otherwise(col("cell")).as("cell"),
          (col("done") || !coalesce(col("ok"), lit(false))).as("done")), 8)
      prev.unpersist(blocking = false)
    }
    st.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_rows"), min(col("d1")).as("d1_min"),
        max(col("d1")).as("d1_max"), min(col("d2")).as("d2_min"),
        max(col("d2")).as("d2_max"))
      .orderBy(col("cell"))
  }

  private val MondrianK = 100
  private val MondrianDepth = 6

  private def mondrianRoundSql(r: Int, k: Int): String = {
    val p = r - 1
    s"""stats$r AS MATERIALIZED (SELECT cell, COUNT(*) AS n,
        MIN(d1) AS a1, MAX(d1) AS b1, MIN(d2) AS a2, MAX(d2) AS b2,
        CASE WHEN MAX(d1) - MIN(d1) >= MAX(d2) - MIN(d2) THEN 1 ELSE 2 END
          AS dim
      FROM st$p WHERE NOT done GROUP BY cell),
    cum$r AS MATERIALIZED (SELECT cell, v, SUM(cnt) OVER (PARTITION BY cell
        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (SELECT t.cell, CASE WHEN s.dim = 1 THEN t.d1 ELSE t.d2 END AS v,
          COUNT(*) AS cnt
        FROM st$p t JOIN stats$r s USING (cell)
        WHERE NOT t.done GROUP BY 1, 2)),
    med$r AS MATERIALIZED (SELECT c.cell,
        MIN(CASE WHEN c.cum >= (s.n + 1) // 2 THEN c.v END) AS med
      FROM cum$r c JOIN stats$r s USING (cell) GROUP BY c.cell),
    plan$r AS MATERIALIZED (SELECT s.cell, s.dim, m.med,
        (l.nl >= $k AND s.n - l.nl >= $k) AS ok
      FROM stats$r s JOIN med$r m USING (cell)
      JOIN (SELECT c.cell, c.cum AS nl FROM cum$r c
        JOIN med$r m2 ON c.cell = m2.cell AND c.v = m2.med) l USING (cell)),
    st$r AS MATERIALIZED (SELECT t.id, t.d1, t.d2,
        CASE WHEN NOT t.done AND COALESCE(p.ok, FALSE)
          THEN t.cell * 2 + (CASE WHEN (CASE WHEN p.dim = 1 THEN t.d1
            ELSE t.d2 END) > p.med THEN 1 ELSE 0 END)
          ELSE t.cell END AS cell,
        (t.done OR NOT COALESCE(p.ok, FALSE)) AS done
      FROM st$p t LEFT JOIN plan$r p USING (cell))"""
  }

  private val mondrianSql = {
    val rounds = (1 to MondrianDepth)
      .map(mondrianRoundSql(_, MondrianK)).mkString(",\n    ")
    s"""WITH st0 AS MATERIALIZED (SELECT c_custkey AS id,
        CAST(c_nationkey AS BIGINT) AS d1,
        CAST(floor(c_acctbal) AS BIGINT) AS d2,
        CAST(1 AS BIGINT) AS cell, FALSE AS done
      FROM customer),
    $rounds
    SELECT CAST(cell AS BIGINT) AS cell, CAST(COUNT(*) AS BIGINT) AS n_rows,
      MIN(d1) AS d1_min, MAX(d1) AS d1_max,
      MIN(d2) AS d2_min, MAX(d2) AS d2_max
    FROM st$MondrianDepth GROUP BY cell ORDER BY cell"""
  }

  /** Customers k-anonymized over (nation, whole-dollar balance) — the
    * cells this produces are exactly what qpriv_k_anon then audits.
    */
  private val qMondrian = GraftQuery(
    "qpriv_mondrian",
    (s, dir) => mondrianAnonymize(
      Tables.customer(s, dir)
        .select(col("c_custkey").as("id"),
          col("c_nationkey").as("d1"),
          floor(col("c_acctbal")).cast("bigint").as("d2")),
      MondrianK, MondrianDepth),
    Some(mondrianSql))

  val queries: Seq[GraftQuery] =
    Seq(qProfile, qProfileEvents, qHistQuantile, qExpectations, qDrift,
      qDimProfile, qKAnon, qTClose, qFd, qJoinCard, qRandResponse, qDpCounts,
      qEmbDrift, qMondrian)
}
