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
      cumCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val ranged = df.withColumn("_w", weight)
      .repartitionByRange(p, col(orderCol))
      .withColumn("_pid", spark_partition_id())
    val offsets = ranged.groupBy(col("_pid")).agg(sum(col("_w")).as("_psum"))
      .withColumn("_off", coalesce(sum(col("_psum")).over(
        Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_psum")
    val wLoc = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
    ranged.join(broadcast(offsets), "_pid")
      .withColumn(cumCol, col("_off") + sum(col("_w")).over(wLoc))
      .drop("_pid", "_w")
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
