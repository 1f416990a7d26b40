package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.GraftQuery
import Nlp.{h60, h60Sql}

/** Distributed statistical hypothesis tests + resampling — the experiment-
  * analysis tier (A/B testing, distribution comparison, uncertainty
  * quantification) expressed as exact-arithmetic Spark aggregations.
  *
  * Everything follows the module family's determinism discipline: test
  * statistics are integers in fixed-point units (micro-units / basis
  * points), computed via integer or DECIMAL(38,0) arithmetic so results
  * are bit-identical across engines and partitionings. Significance
  * thresholds are pre-squared so no sqrt is ever taken.
  *
  * Scale shapes: the chi-square test is ONE full-scan aggregation to a
  * 1-row contingency summary; the bootstrap is one scan with a 64×
  * map-side explode collapsing into a 64-key partial agg; the KS test
  * needs one global sort of the DISTINCT value domain (the inherent cost
  * of an exact ECDF comparison — for 100 TB inputs the value domain,
  * not the row count, bounds the sorted set).
  */
object StatTests {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Two-proportion A/B test as the 2×2 chi-square statistic, exact
    * micro-units. For cells a,b (variant 0: hit/miss) and c,d (variant 1):
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * — the closed form that keeps every intermediate integral (DECIMAL(38,0)
    * carries the 128-bit intermediates; the final integer division lands in
    * micro-units). `significant` compares against χ²₍₀.₀₅,1₎ = 3.841459
    * pre-scaled, so the α=0.05 decision is itself exact.
    *
    * One aggregation pass over the trials frame → 1 row; nothing but the
    * four cell counts ever leaves the executors.
    */
  def chiSquareAb(trials: DataFrame, variant: Column, hit: Column): DataFrame = {
    val cells = trials.agg(
      sum(when(variant === 0 && hit, 1L).otherwise(0L)).as("a"),
      sum(when(variant === 0 && !hit, 1L).otherwise(0L)).as("b"),
      sum(when(variant === 1 && hit, 1L).otherwise(0L)).as("c"),
      sum(when(variant === 1 && !hit, 1L).otherwise(0L)).as("d"))
    val ad_bc = dec(col("a")) * dec(col("d")) - dec(col("b")) * dec(col("c"))
    val n = dec(col("a") + col("b") + col("c") + col("d"))
    val den = dec(col("a") + col("b")) * dec(col("c") + col("d")) *
      dec(col("a") + col("c")) * dec(col("b") + col("d"))
    cells.select(
        col("a"), col("b"), col("c"), col("d"),
        expr("10000 * a div (a + b)").as("rate0_bp"),
        expr("10000 * c div (c + d)").as("rate1_bp"),
        (n * ad_bc * ad_bc * lit(1000000L)).as("num"), den.as("den"))
      .select(col("a"), col("b"), col("c"), col("d"),
        col("rate0_bp"), col("rate1_bp"),
        expr("CAST(num div den AS BIGINT)").as("chi2_micro"))
      .withColumn("significant", col("chi2_micro") > lit(3841459L))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic. Samples are the rows of
    * `vals` split by `isFirst`; D = max over the pooled value domain of
    * |ECDF₁ − ECDF₂|, kept integral as d_num = max|C₁·n₂ − C₂·n₁| (C_i =
    * cumulative counts). Reported in basis points (⌊10⁴·d_num/(n₁n₂)⌋)
    * together with the smallest value attaining the max, and an exact α=0.05
    * decision via the pre-squared large-sample critical value
    * c(0.05)² = 1.358² = 1.844164:  reject ⟺ d_num²·10⁶ > 1844164·(n₁+n₂)·n₁·n₂.
    *
    * Plan: group by value (collapses the sort input to the distinct domain),
    * one global ordered cumsum window, TopK(1) for the argmax — no pairwise
    * anything.
    */
  def ksTest(vals: DataFrame, valueCol: String, isFirst: Column): DataFrame = {
    val g = vals
      .select(col(valueCol).as("v"), isFirst.cast("int").as("one"))
      .groupBy(col("v"))
      .agg(sum(col("one")).as("k1"), sum(lit(1) - col("one")).as("k2"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.select(col("v"),
      sum(col("k1")).over(w).as("c1"), sum(col("k2")).over(w).as("c2"))
    val tot = g.agg(sum(col("k1")).as("n1"), sum(col("k2")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .select(col("v"), col("n1"), col("n2"),
        abs(col("c1") * col("n2") - col("c2") * col("n1")).as("d_num"))
      .orderBy(col("d_num").desc, col("v").asc)
      .limit(1)
      .select(col("n1"), col("n2"), col("v").as("at_value"),
        expr("CAST(10000 * d_num div (n1 * n2) AS BIGINT)").as("d_bp"),
        (dec(col("d_num")) * dec(col("d_num")) * lit(1000000L) >
          lit(1844164L) * dec(col("n1") + col("n2")) * dec(col("n1")) * dec(col("n2")))
          .as("reject_05"))
  }

  /** Deterministic Poisson bootstrap of a mean, integer cents. Each of the
    * `reps` resamples draws every row with a Poisson(1) multiplicity — the
    * standard distributed bootstrap (no global n needed, weights are i.i.d.
    * per row) — but the draw is DERANDOMIZED: the multiplicity is the
    * inverse-CDF of Poisson(1) evaluated at u = h60(id:b)/10⁶, so both
    * engines and every partitioning materialize the identical resample.
    * CDF thresholds in micro-units: P(≤k) for k=0..5 =
    * 367879, 735759, 919699, 981012, 996340, 999406 (then 6).
    *
    * The confidence interval is percentile_disc(0.025/0.5/0.975) over the
    * `reps` resample means (cume_dist formulation — no interpolation, so
    * the bounds are actual resample means, exact in integer cents).
    *
    * Scale: one corpus scan, map-side explode ×reps, partial-agg collapse
    * to `reps` rows per partition before the single tiny shuffle.
    */
  def bootstrapMeanCi(rows: DataFrame, idCol: String, cents: Column,
      reps: Int = 64): DataFrame = {
    require(reps >= 4, s"reps must be >= 4, got $reps")
    val rep = rows
      .select(col(idCol).cast("string").as("id"), cents.as("cents"))
      .select(col("id"), col("cents"),
        explode(sequence(lit(0), lit(reps - 1))).as("b"))
      .withColumn("u",
        expr(s"${h60("concat(id, ':', cast(b as string))")} % 1000000"))
      .withColumn("w",
        when(col("u") < 367879L, 0L).when(col("u") < 735759L, 1L)
          .when(col("u") < 919699L, 2L).when(col("u") < 981012L, 3L)
          .when(col("u") < 996340L, 4L).when(col("u") < 999406L, 5L)
          .otherwise(6L))
    val means = rep.groupBy(col("b"))
      .agg(sum(col("w") * col("cents")).as("sw"), sum(col("w")).as("ww"))
      .select(col("b"), expr("sw div ww").as("m"))
    val cd = means
      .select(col("m"), cume_dist().over(Window.orderBy(col("m"))).as("cd"))
    val ci = cd.agg(
      min(when(col("cd") >= 0.025, col("m"))).as("lo_cents"),
      min(when(col("cd") >= 0.5, col("m"))).as("med_cents"),
      min(when(col("cd") >= 0.975, col("m"))).as("hi_cents"))
    val point = rows.agg(
      (sum(cents).cast("long")).as("sc"), count(lit(1)).as("n"))
      .select(expr("sc div n").as("point_cents"))
    point.crossJoin(broadcast(ci))
      .select(lit(reps).cast("long").as("n_boot"), col("point_cents"),
        col("lo_cents"), col("med_cents"), col("hi_cents"))
  }

  // ==================== driver-checked query bindings ====================

  /** Variant = user parity, outcome = error event: "did the treatment arm
    * change the error rate" — the canonical product A/B readout.
    */
  private val qChisq = GraftQuery(
    "qstat_chisq_ab",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      chiSquareAb(ev, col("user_id") % 2, col("event_type") === "error")
    },
    Some("""WITH cells AS (SELECT
        SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'error' THEN 1 ELSE 0 END) AS a,
        SUM(CASE WHEN user_id % 2 = 0 AND event_type <> 'error' THEN 1 ELSE 0 END) AS b,
        SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'error' THEN 1 ELSE 0 END) AS c,
        SUM(CASE WHEN user_id % 2 = 1 AND event_type <> 'error' THEN 1 ELSE 0 END) AS d
      FROM events),
      st AS (SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
        CAST(10000 * a // (a + b) AS BIGINT) AS rate0_bp,
        CAST(10000 * c // (c + d) AS BIGINT) AS rate1_bp,
        CAST(a + b + c + d AS HUGEINT)
          * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
          * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) * 1000000 AS num,
        CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d) AS den
      FROM cells)
      SELECT a, b, c, d, rate0_bp, rate1_bp,
        CAST(num // den AS BIGINT) AS chi2_micro,
        CAST(num // den AS BIGINT) > 3841459 AS significant
      FROM st"""))

  /** Do purchase values and click values follow the same distribution? */
  private val qKs = GraftQuery(
    "qstat_ks_test",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "click"))
      ksTest(ev, "value", col("event_type") === "purchase")
    },
    Some("""WITH g AS (SELECT value AS v,
        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k1,
        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS k2
      FROM events WHERE event_type IN ('purchase', 'click') GROUP BY value),
      cum AS (SELECT v,
        SUM(k1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
        SUM(k2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
      FROM g),
      tot AS (SELECT SUM(k1) AS n1, SUM(k2) AS n2 FROM g),
      d AS (SELECT v, n1, n2, ABS(c1 * n2 - c2 * n1) AS d_num
        FROM cum CROSS JOIN tot
        ORDER BY d_num DESC, v ASC LIMIT 1)
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, v AS at_value,
        CAST(10000 * d_num // (n1 * n2) AS BIGINT) AS d_bp,
        CAST(d_num AS HUGEINT) * d_num * 1000000 >
          CAST(1844164 AS HUGEINT) * (n1 + n2) * n1 * n2 AS reject_05
      FROM d"""))

  private val qBoot = GraftQuery(
    "qstat_bootstrap_ci",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      bootstrapMeanCi(ev, "event_id",
        expr("CAST(round(value * 100) AS BIGINT)"))
    },
    Some(s"""WITH base AS (SELECT CAST(event_id AS VARCHAR) AS id,
        CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      rep AS (SELECT id, cents, UNNEST(generate_series(0, 63)) AS b FROM base),
      uw AS (SELECT cents, b,
        ${h60Sql("id || ':' || CAST(b AS VARCHAR)")} % 1000000 AS u
      FROM rep),
      wt AS (SELECT cents, b,
        CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1 WHEN u < 919699 THEN 2
             WHEN u < 981012 THEN 3 WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
             ELSE 6 END AS w
      FROM uw),
      means AS (SELECT b, SUM(w * cents) // SUM(w) AS m FROM wt GROUP BY b),
      ci AS (SELECT quantile_disc(m, 0.025) AS lo_cents,
                    quantile_disc(m, 0.5) AS med_cents,
                    quantile_disc(m, 0.975) AS hi_cents FROM means),
      pt AS (SELECT SUM(cents) // COUNT(*) AS point_cents FROM base)
      SELECT CAST(64 AS BIGINT) AS n_boot, CAST(point_cents AS BIGINT) AS point_cents,
        CAST(lo_cents AS BIGINT) AS lo_cents, CAST(med_cents AS BIGINT) AS med_cents,
        CAST(hi_cents AS BIGINT) AS hi_cents
      FROM pt CROSS JOIN ci"""))

  val queries: Seq[GraftQuery] = Seq(qChisq, qKs, qBoot)
}
