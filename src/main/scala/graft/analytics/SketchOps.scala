package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.api.GraftQuery
import graft.functions.FreqItemsAgg.graft_freq_items
import graft.functions.TDigestAgg.graft_tdigest

/** Mergeable-summary operators beyond the HLL/theta/count-min/bottom-k
  * family: Misra–Gries heavy hitters ([[graft.functions.FreqItemsMG]]) and
  * t-digest quantiles ([[graft.functions.TDigestQuantiles]]), both native
  * Catalyst `TypedImperativeAggregate`s — constant state per group,
  * map-side partial aggregation, shuffle-safe serialization.
  *
  * Correctness gates follow the sketch-accuracy-contract pattern
  * (qagg_hll_sketch): the hashed output carries EXACT values plus boolean
  * bound flags that any row-order / merge-tree execution must satisfy, so
  * the full sketch pipeline stays in the measured plan while the gate
  * checks the deterministic guarantee, not engine-specific bit patterns.
  */
object SketchOps {

  /** Verified heavy hitters: for every item whose true frequency exceeds
    * N/(k+1) — the Misra–Gries retention threshold — emit its exact count
    * plus the three contract flags (present in the k-counter summary;
    * estimate never above truth; underestimate within N/(k+1)).
    *
    * Two aggregations over one scan: the O(k)-state sketch and the exact
    * per-item counts (the verifier). At 100 TB the sketch side is the
    * product (constant state, no matter the item domain); the exact side
    * exists to make the gate a real check at test SF. The ≤k-row summary
    * and the 1-row total broadcast to the exact counts.
    */
  def heavyHitters(rows: DataFrame, item: Column, k: Int): DataFrame = {
    val it = rows.select(item.as("item")).filter(col("item").isNotNull)
    val summary = it.agg(graft_freq_items(col("item"), k).as("mg"))
      .select(explode(col("mg")).as(Seq("item", "est")))
    val totals = it.agg(count(lit(1)).as("n_total"))
    it.groupBy(col("item")).agg(count(lit(1)).as("exact_cnt"))
      .crossJoin(broadcast(totals))
      .filter(col("exact_cnt") * (k + 1) > col("n_total"))
      .join(broadcast(summary), Seq("item"), "left")
      .select(col("item"), col("exact_cnt"),
        col("est").isNotNull.as("in_summary"),
        coalesce(col("est") <= col("exact_cnt"), lit(false)).as("est_le_exact"),
        coalesce((col("exact_cnt") - col("est")) * (k + 1) <= col("n_total"),
          lit(false)).as("err_within_bound"))
      .orderBy(col("item"))
  }

  /** t-digest quantile estimates per group: one O(δ) digest per group,
    * eval'd at `qs`. The raw public op — the oracle binding wraps it with
    * exact rank brackets (see qagg_tdigest below).
    */
  def tdigestQuantiles(rows: DataFrame, value: Column, delta: Int,
      qs: Seq[Double], by: Seq[Column]): DataFrame =
    if (by.isEmpty) rows.agg(graft_tdigest(value, delta, qs).as("q_est"))
    else rows.groupBy(by: _*).agg(graft_tdigest(value, delta, qs).as("q_est"))

  // ==================== driver-checked query bindings ====================

  private val HhK = 16

  // Deterministic skewed item domain over the uniform events table: click
  // traffic concentrates into 2 synthetic keys (~10% of N each), the other
  // four event types spread over 50 keys each (~0.4%). With k=16 the
  // retention threshold is N/17 (~5.9%), so exactly the two click keys are
  // guaranteed-retained heavy hitters at every SF.
  private val qHeavy = GraftQuery(
    "qagg_heavy_hitters",
    (s, dir) => {
      val item = when(col("event_type") === "click",
          concat(lit("click_"), col("user_id") % 2))
        .otherwise(concat(col("event_type"), lit("_"), col("user_id") % 50))
      heavyHitters(Tables.events(s, dir), item, HhK)
    },
    Some(s"""WITH it AS (SELECT CASE WHEN event_type = 'click'
        THEN 'click_' || (user_id % 2)
        ELSE event_type || '_' || (user_id % 50) END AS item FROM events),
      tot AS (SELECT COUNT(*) AS n_total FROM it),
      ex AS (SELECT item, COUNT(*) AS exact_cnt FROM it GROUP BY item)
      SELECT item, exact_cnt, TRUE AS in_summary, TRUE AS est_le_exact,
        TRUE AS err_within_bound
      FROM ex CROSS JOIN tot WHERE exact_cnt * ${HhK + 1} > n_total
      ORDER BY item"""))

  private val TdDelta = 200

  // Rank-bracket gate: the t-digest contract is on RANK, not value, so
  // each estimate must land between exact order statistics ±5 percentile
  // points away (p99's upper bracket is the max). percentile_disc picks
  // actual data values with no interpolation — engine-exact (the
  // qstat_percentile_disc precedent); δ=200 holds rank error well under
  // one point on every test SF. Sketches build per event_type AND merged
  // ungrouped (the pre-aggregated-quantiles rollup HLL does for distinct
  // counts); map-side partials exercise the merge path in both.
  private val qTdigest = GraftQuery(
    "qagg_tdigest",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      e.createOrReplaceTempView("td_cents")
      val brackets = s.sql("""SELECT event_type,
          CAST(percentile_disc(0.45) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS lo50,
          CAST(percentile_disc(0.55) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS hi50,
          CAST(percentile_disc(0.85) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS lo90,
          CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS hi90,
          CAST(percentile_disc(0.97) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS lo99,
          MAX(cents) AS hi99
        FROM td_cents GROUP BY event_type
        UNION ALL SELECT 'ALL' AS event_type,
          CAST(percentile_disc(0.45) WITHIN GROUP (ORDER BY cents) AS BIGINT),
          CAST(percentile_disc(0.55) WITHIN GROUP (ORDER BY cents) AS BIGINT),
          CAST(percentile_disc(0.85) WITHIN GROUP (ORDER BY cents) AS BIGINT),
          CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) AS BIGINT),
          CAST(percentile_disc(0.97) WITHIN GROUP (ORDER BY cents) AS BIGINT),
          MAX(cents)
        FROM td_cents""")
      val v = col("cents").cast("double")
      val qs = Seq(0.5, 0.9, 0.99)
      val est = tdigestQuantiles(e, v, TdDelta, qs, Seq(col("event_type")))
        .unionByName(tdigestQuantiles(e, v, TdDelta, qs, Seq.empty)
          .withColumn("event_type", lit("ALL")))
      brackets.join(broadcast(est), Seq("event_type"))
        .select(col("event_type"),
          col("lo50"), col("hi50"), col("lo90"), col("hi90"),
          col("lo99"), col("hi99"),
          (col("q_est")(0) >= col("lo50") && col("q_est")(0) <= col("hi50"))
            .as("p50_in_bracket"),
          (col("q_est")(1) >= col("lo90") && col("q_est")(1) <= col("hi90"))
            .as("p90_in_bracket"),
          (col("q_est")(2) >= col("lo99") && col("q_est")(2) <= col("hi99"))
            .as("p99_in_bracket"))
        .orderBy(col("event_type"))
    },
    Some("""WITH c AS (SELECT event_type,
        CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      b AS (SELECT event_type,
          CAST(quantile_disc(cents, 0.45) AS BIGINT) AS lo50,
          CAST(quantile_disc(cents, 0.55) AS BIGINT) AS hi50,
          CAST(quantile_disc(cents, 0.85) AS BIGINT) AS lo90,
          CAST(quantile_disc(cents, 0.95) AS BIGINT) AS hi90,
          CAST(quantile_disc(cents, 0.97) AS BIGINT) AS lo99,
          MAX(cents) AS hi99
        FROM c GROUP BY event_type
        UNION ALL SELECT 'ALL',
          CAST(quantile_disc(cents, 0.45) AS BIGINT),
          CAST(quantile_disc(cents, 0.55) AS BIGINT),
          CAST(quantile_disc(cents, 0.85) AS BIGINT),
          CAST(quantile_disc(cents, 0.95) AS BIGINT),
          CAST(quantile_disc(cents, 0.97) AS BIGINT),
          MAX(cents)
        FROM c)
      SELECT event_type, lo50, hi50, lo90, hi90, lo99, hi99,
        TRUE AS p50_in_bracket, TRUE AS p90_in_bracket, TRUE AS p99_in_bracket
      FROM b ORDER BY event_type"""))

  /** Exact distinct via the paged-bitmap aggregate next to its two
    * neighbors in the distinct tier: countDistinct (exact, key-set
    * state) and HLL (constant state, approximate). The gate runs bitmap
    * and exact over the same scan and asserts per-group EQUALITY — the
    * bitmap is exact by construction (OR is total), so the check is a
    * wire-format/merge-path regression net, not a tolerance.
    */
  def bitmapDistinct(rows: DataFrame, key: Column, by: Column): DataFrame =
    rows.select(by.as("grp"), key.as("k")).filter(col("k").isNotNull)
      .groupBy(col("grp"))
      .agg(graft.functions.BitmapAgg.graft_bitmap_distinct(col("k"))
          .as("n_bitmap"),
        countDistinct(col("k")).as("n_exact"))
      .withColumn("equal", col("n_bitmap") === col("n_exact"))
      .orderBy(col("grp"))

  private val qBitmap = GraftQuery(
    "qagg_bitmap_distinct",
    (s, dir) => bitmapDistinct(Tables.events(s, dir),
        col("user_id"), to_date(col("ts")))
      .withColumnRenamed("grp", "d"),
    Some("""SELECT CAST(ts AS DATE) AS d,
      COUNT(DISTINCT user_id) AS n_bitmap,
      COUNT(DISTINCT user_id) AS n_exact, TRUE AS equal
    FROM events WHERE user_id IS NOT NULL GROUP BY 1 ORDER BY d"""))

  def queries: Seq[GraftQuery] = Seq(qHeavy, qTdigest, qBitmap)
}
