package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.api.GraftQuery
import Exact.{d2, sumD}
import OracleFragments.{d2 => od2, sumD => oSumD}

/** Skew-handling primitives — the two-phase (salt → unsalt) patterns that
  * keep hot keys from serializing a 1000-executor job, exposed as public
  * API and oracle-checked for result-identity with the unsalted plans.
  *
  * When salting matters on Spark:
  *  - Aggregation: partial (map-side) aggregation already soaks up key
  *    skew when hot-key rows are SCATTERED across input partitions. It
  *    does nothing when the input is already hash-partitioned by the hot
  *    key (typical right after an upstream join/window on the same key),
  *    or when the aggregation state itself is large (collect_list/
  *    count-distinct) so partial merge is no cheaper than reduce.
  *    [[saltedAgg]] splits each hot reduce group into `salts` independent
  *    groups and re-combines — associativity makes the result identical.
  *  - Join: a large-large shuffle join on a skewed key puts the whole hot
  *    key in ONE task's build/stream pair (AQE's skew-join split handles
  *    sort-merge stragglers within limits, but not a single monster key).
  *    [[saltedJoin]] scatters the fact side's hot key across `salts`
  *    subkeys and replicates the other side's matching rows to all of
  *    them — the classic replicate-broadcast-free skew join; replication
  *    cost is `salts × |dim|`, so size `salts` to the hot key's excess,
  *    not the cluster.
  */
object SkewOps {

  /** Two-phase salted sum+count over `keys`. Result-identical to the
    * direct `groupBy(keys).agg(sum, count)` because decimal/long sums are
    * associative AND commutative — the result does not depend on which
    * salt group a row lands in, so the salt only has to scatter. It is
    * row-position based (`monotonically_increasing_id % salts`), NOT a
    * hash of the row's values: a hot key whose rows all carry the same
    * measure (the canonical count-style skew) would collapse a value-hash
    * salt into one group and silently undo the mitigation.
    * Output: keys..., `salted_sum`, `n_rows`.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], value: Column,
      salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!df.columns.exists(c => c == "_salt" || c == "_v"),
      "input already has a _salt/_v column")
    val keyCols = keys.map(col)
    val withV = df.withColumn("_v", value)
    // The two-level sum widens decimals twice (DECIMAL(p+20,s) where the
    // direct groupBy yields p+10). Cast back to the single-level sum's
    // type so the output schema is identical to the unsalted plan; an
    // overflow of that type would overflow the direct plan too. Analysis
    // only — no job runs here.
    val directSumType = withV.select(sum(col("_v")).as("_s")).schema("_s").dataType
    withV
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col("_v")).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_psum")).cast(directSumType).as("salted_sum"),
        sum(col("_pcnt")).as("n_rows"))
  }

  /** Salted inner equi-join on `key`: the left/fact side scatters each key
    * into `salts` subkeys by row hash; the right side is replicated to
    * every subkey (explode of 0..salts-1), so each of a hot key's subkeys
    * joins in its own task. Row-identical to `fact.join(dim, key)`.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "input already has a _salt column")
    // row-position salt, same reasoning as saltedAgg: inner-join output is
    // a bag, so scatter placement cannot change the result
    val f = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts)))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }

  // ==================== driver-checked bindings ======================

  // Result-identity is the contract: both bindings oracle against the
  // plain unsalted SQL.

  private val qSaltedAgg = GraftQuery(
    "qskew_salted_agg",
    (s, dir) => saltedAgg(Tables.lineitem(s, dir), Seq("l_returnflag"),
        d2(col("l_quantity")))
      .select(col("l_returnflag"),
        col("salted_sum").cast("double").as("sum_qty"), col("n_rows"))
      .orderBy(col("l_returnflag")),
    Some(s"""SELECT l_returnflag,
      ${oSumD(od2("l_quantity"))} AS sum_qty, COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val qSaltedJoin = GraftQuery(
    "qskew_salted_join",
    (s, dir) => saltedJoin(Tables.lineitem(s, dir),
        // USING-style join: align o_orderkey to the fact side's name
        Tables.orders(s, dir).select(col("o_orderkey").as("l_orderkey"),
          col("o_orderpriority")),
        "l_orderkey", salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(sumD(d2(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority")),
    Some(s"""SELECT o_orderpriority,
      ${oSumD(od2("l_quantity"))} AS sum_qty, COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  def queries: Seq[GraftQuery] = Seq(qSaltedAgg, qSaltedJoin)
}
