package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine exact arithmetic helpers.
  *
  * The driver hash-compares our parquet output against a DuckDB oracle, so
  * every double we emit must be BIT-IDENTICAL across engines. Plain
  * `SUM(double)` is order-dependent and differs between Spark's partial
  * aggregation and DuckDB's scan order. All money/measure columns in the
  * test data carry ≤2 decimal digits, so we accumulate in DECIMAL (exact,
  * order-independent) and cast the final aggregate to DOUBLE — the decimal
  * → double conversion is deterministic round-to-nearest in both engines.
  *
  * The Scala helpers here and the SQL fragments in [[OracleFragments]] must
  * stay structurally identical.
  */
object Exact {
  val D: DecimalType = DecimalType(12, 2)

  /** Cast a ≤2-decimal double column to exact DECIMAL(12,2). */
  def d2(c: Column): Column = c.cast(D)
  val one: Column = lit(1).cast(D)

  /** l_extendedprice * (1 - l_discount), exact DECIMAL(25,4). */
  def discPrice: Column = d2(col("l_extendedprice")) * (one - d2(col("l_discount")))

  /** l_extendedprice * (1 - l_discount) * (1 + l_tax), exact DECIMAL(38,6). */
  def charge: Column = discPrice * (one + d2(col("l_tax")))

  /** Exact decimal sum surfaced as a deterministic double. */
  def sumD(c: Column): Column = sum(c).cast("double")

  /** Deterministic average: exact decimal sum / count, one IEEE division. */
  def avgD(c: Column): Column = sum(c).cast("double") / count(lit(1))
}

/** Distributed scan primitives shared across operators. */
object Scans {

  /** Materialize like `localCheckpoint` but RESET the leaf's statistics.
    *
    * `LogicalRDD.fromDataset` (what localCheckpoint leaves behind)
    * propagates the origin plan's size ESTIMATE, and Catalyst's
    * size-only stats visitor MULTIPLIES child sizes at join nodes — so
    * in an iterative operator whose round-r state joins two frames
    * derived from the round-(r−1) checkpoint, the BigInt size estimate
    * SQUARES every round. A single bounded loop (≤ ~15 rounds) never
    * notices (≤ ~10⁴-digit numbers); NESTED loops (Borůvka's per-round
    * CC merge, the SCC peel's per-outer-round fixpoints) compound the
    * squarings and the driver disappears into `BigInteger.multiply`
    * inside stats estimation — observed as a single-core planner hang.
    *
    * Rebuilding the frame from the checkpointed RDD resets the leaf to
    * `defaultSizeInBytes`, CONSTANT across rounds. Broadcast planning
    * inside the loop is forfeited (the leaf claims default size) —
    * the safe direction for unbounded-size state, and measured noise
    * on the loops that use this (their wall time is job latency, not
    * join strategy). Two tempting "improvements" are KNOWN BAD here:
    * cache-based materialization (persist + count) fixes the stats but
    * does NOT truncate the LOGICAL plan — an iterative op referencing
    * its state 3× per round grows the plan tree 3^k nodes until AQE's
    * plan-change logging OOMs the driver rendering the explain string
    * (observed at 8 GB heap, sf0.1 SCC; LogicalRDD truncation is
    * load-bearing, not cosmetic); and multi-hop/multi-jump fusion per
    * materialization just moves cost from iteration count into plan
    * size — per-iteration wall time scales with the number of
    * joins in the plan, so total time is invariant (measured on the
    * Borůvka merge). `parts > 0` coalesces first — a 32-task stage on
    * a 10⁴-row frame is pure scheduler overhead.
    */
  def rebase(df: DataFrame, parts: Int = 0): DataFrame = {
    val cp = (if (parts > 0) df.coalesce(parts) else df).localCheckpoint()
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** [[rebase]] the next loop state, releasing the previous one's
    * blocks if its materialization holds any (a no-op for the
    * checkpoint-backed path, where the context cleaner reclaims
    * unreferenced checkpoint blocks — kept so loop call sites state
    * their lifetime intent once, whatever rebase's storage becomes).
    */
  def rebaseSwap(next: DataFrame, prev: DataFrame,
      parts: Int = 0): DataFrame = {
    val c = rebase(next, parts)
    if (prev != null) prev.unpersist(blocking = false)
    c
  }

  /** Inclusive running sum of `weight` over `orderCol` ascending, as a new
    * column `cumCol` — DISTRIBUTED, never a single-partition global window.
    *
    * The two-level scheme used throughout the engine (compaction planner
    * `LayoutOps.compactionPlan`, sequence packer, supplier running totals):
    * range-partition on the order key, per-partition weight totals (≤ P
    * rows) get exclusive prefix offsets via one tiny window, then every
    * partition computes its local running sum in parallel and adds its
    * broadcast offset. Requires `orderCol` to be UNIQUE per row (a strict
    * total order) so global prefix sums are partition-placement-independent
    * — callers pass a groupBy key or an id-tiebroken key.
    */
  def rangedCumSum(df: DataFrame, orderCol: String, weight: Column,
      cumCol: String): DataFrame =
    rangedCumSums(df, orderCol, Seq(weight -> cumCol))

  /** [[rangedCumSum]] for SEVERAL weights in one pass — one range
    * exchange, one offsets broadcast, one local Window operator carrying
    * all the running sums (KS needs two, the quartile scan three).
    */
  def rangedCumSums(df: DataFrame, orderCol: String,
      weights: Seq[(Column, String)]): DataFrame = {
    require(weights.nonEmpty, "need at least one (weight, cumCol) pair")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val wcols = weights.zipWithIndex.map { case ((w, _), i) => (s"_w$i", w) }
    // MATERIALIZE the ranged frame: repartitionByRange samples its
    // boundaries and spark_partition_id() is nondeterministic, so the two
    // consumers below (offsets branch + join branch) are only guaranteed
    // the SAME partitioning if they read the same materialized blocks —
    // without this, exchange reuse is best-effort and a re-evaluated
    // branch can see different pids (observed as off-by-a-partition cums).
    val ranged = wcols.foldLeft(df) { case (d, (n, w)) => d.withColumn(n, w) }
      .repartitionByRange(p, col(orderCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val offsets = ranged.groupBy(col("_pid"))
      .agg(sum(col(wcols.head._1)).as("_ps0"),
        wcols.tail.zipWithIndex.map { case ((n, _), i) =>
          sum(col(n)).as(s"_ps${i + 1}") }: _*)
    val offs = wcols.indices.foldLeft(offsets) { (d, i) =>
      d.withColumn(s"_off$i", coalesce(sum(col(s"_ps$i")).over(
        Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    }.drop(wcols.indices.map(i => s"_ps$i"): _*)
    val wLoc = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
    val joined = ranged.join(broadcast(offs), "_pid")
    weights.zipWithIndex.foldLeft(joined) { case (d, ((_, cumCol), i)) =>
      d.withColumn(cumCol, col(s"_off$i") + sum(col(s"_w$i")).over(wLoc))
    }.drop("_pid").drop(wcols.map(_._1): _*)
      .drop(wcols.indices.map(i => s"_off$i"): _*)
  }

  /** Exact 1-based GLOBAL rank under `sortCols` as a new column `out`,
    * without a single-partition window — the same two-level scheme as
    * [[rangedCumSum]] (and `MatchOps.sortedNeighborhoodPairs`'s bucket
    * ranks): range-exchange on the sort key, per-partition row counts
    * get exclusive prefix offsets via one ≤P-row window, every
    * partition ranks locally in parallel and adds its broadcast offset.
    * `sortCols` must be a STRICT total order (include a unique
    * tie-break column) or ranks become partition-placement-dependent.
    * The ranged frame is materialized for the same
    * `spark_partition_id()` determinism reason as [[rangedCumSums]].
    */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
      out: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val offs = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_bn"))
      .withColumn("_off", coalesce(sum(col("_bn")).over(
        Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    ranged.join(broadcast(offs), "_pid")
      .withColumn(out, col("_off") + row_number().over(
        Window.partitionBy(col("_pid")).orderBy(sortCols: _*)))
      .drop("_pid", "_off")
  }

  /** Inclusive running MIN of `value` over `sortCols` ascending — the
    * [[rangedCumSums]] two-level scheme with (min, least) in place of
    * (sum, +): range-exchange on the sort key, per-partition minima get
    * exclusive prefix FLOORS via one ≤P-row window, every partition
    * takes its local running min in parallel and leasts in its
    * broadcast floor (null floor on the first partition — `least`
    * skips nulls). Same strict-total-order and materialization
    * contract as the sum variant.
    */
  def rangedRunningMin(df: DataFrame, sortCols: Seq[Column], value: Column,
      out: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.withColumn("_rmv", value)
      .repartitionByRange(p, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val offs = ranged.groupBy(col("_pid")).agg(min(col("_rmv")).as("_pm"))
      .withColumn("_floor", min(col("_pm")).over(
        Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_pid"), col("_floor"))
    val wLoc = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
    ranged.join(broadcast(offs), "_pid")
      .withColumn(out, least(min(col("_rmv")).over(wLoc), col("_floor")))
      .drop("_pid", "_floor", "_rmv")
  }
}

/** DuckDB-side fragments mirroring [[Exact]]. Keep in lock-step. */
object OracleFragments {
  /** CAST(x AS DECIMAL(12,2)) */
  def d2(x: String): String = s"CAST($x AS DECIMAL(12,2))"
  val one: String = "CAST(1 AS DECIMAL(12,2))"
  val discPrice: String = s"${d2("l_extendedprice")} * ($one - ${d2("l_discount")})"
  val charge: String = s"$discPrice * ($one + ${d2("l_tax")})"
  def sumD(x: String): String = s"CAST(SUM($x) AS DOUBLE)"
  def avgD(x: String): String = s"CAST(SUM($x) AS DOUBLE) / COUNT(*)"
}
