package graft.analytics

import org.apache.spark.sql.Column
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
