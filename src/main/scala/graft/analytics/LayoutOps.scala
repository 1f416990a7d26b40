package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.GraftQuery

/** Z-order (Morton-curve) data layout — the write-side clustering that
  * makes parquet min/max footer stats selective on MORE THAN ONE column
  * at once. A table sorted by `a` alone skips nothing for predicates on
  * `b`; laid out along the Z-curve over (a, b), every file covers a small
  * RECTANGLE of the (a, b) space, so range predicates on either column
  * (or both) prune files. At 100 TB this is the difference between a
  * full scan and reading a few percent of files for selective filters —
  * the same layout trick Delta/Iceberg expose as `OPTIMIZE ZORDER BY`,
  * built here from public Spark primitives: one tiny min/max aggregate
  * (broadcast as a 1-row literal), a map-only bit-interleave expression,
  * and `repartitionByRange` + `sortWithinPartitions` so each output task
  * writes one contiguous Z-range.
  *
  * Everything is exact integer arithmetic (scale-to-code uses integer
  * `DIV`, never a double), so the layout — and the oracle — are
  * deterministic across engines and partitionings.
  */
object LayoutOps {

  /** Bit-interleave two `bits`-wide non-negative codes into the Morton
    * code: bit i of `ca` lands at position 2i, bit i of `cb` at 2i+1.
    * Statically unrolled (2·bits codegen-friendly shift/mask terms), no
    * UDF, no loop at runtime.
    */
  def mortonInterleave(ca: Column, cb: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** `df` plus a `zval` Morton code over integer columns `colA`/`colB`:
    * each value is scaled to a `bits`-wide code by exact integer
    * arithmetic against the column's min/max — `(x-min)·2^bits DIV
    * (max-min+1)`, which lands max at 2^bits−1 with no clamp — then the
    * codes are interleaved. The min/max aggregate is one 1-row frame,
    * broadcast into a map-only projection; the corpus is scanned twice
    * (stats + codes), the standard two-pass layout write.
    */
  def zorder(df: DataFrame, colA: String, colB: String,
      bits: Int = 8): DataFrame = {
    require(!df.columns.exists(Set("_mna", "_mxa", "_mnb", "_mxb", "_ca", "_cb")),
      "input already has a _mna/_mxa/_mnb/_mxb/_ca/_cb column")
    val st = df.agg(min(col(colA)).as("_mna"), max(col(colA)).as("_mxa"),
      min(col(colB)).as("_mnb"), max(col(colB)).as("_mxb"))
    val w = 1L << bits
    df.crossJoin(broadcast(st))
      .withColumn("_ca", expr(s"(($colA - _mna) * ${w}L) DIV (_mxa - _mna + 1)"))
      .withColumn("_cb", expr(s"(($colB - _mnb) * ${w}L) DIV (_mxb - _mnb + 1)"))
      .withColumn("zval", mortonInterleave(col("_ca"), col("_cb"), bits))
      .drop("_mna", "_mxa", "_mnb", "_mxb", "_ca", "_cb")
  }

  /** The write-side layout: Z-value the rows, range-partition into
    * `numFiles` contiguous Z-ranges, sort within each — every output
    * file then covers one rectangle of (colA, colB) space and its
    * parquet footer min/max prunes on both columns. Write with
    * `.write.parquet(...)` as-is.
    */
  def zorderLayout(df: DataFrame, colA: String, colB: String,
      numFiles: Int, bits: Int = 8): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    zorder(df, colA, colB, bits)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
  }

  // ==================== driver-checked query bindings ====================

  private val ZBits = 8
  // Buckets = top 4 Morton bits → 16 buckets, 2 bits per dimension.

  /** Per-Z-bucket occupancy + raw-column spans: the direct evidence the
    * layout skips — each bucket's (min,max) on BOTH key columns is a
    * quarter-range rectangle, where a single-column sort would leave the
    * other column's span at full range.
    */
  private val zorderSql = s"""WITH st AS (SELECT MIN(l_partkey) AS mna, MAX(l_partkey) AS mxa,
      MIN(l_suppkey) AS mnb, MAX(l_suppkey) AS mxb FROM lineitem),
    c AS (SELECT l_partkey, l_suppkey,
      ((l_partkey - mna) * ${1L << ZBits}) // (mxa - mna + 1) AS ca,
      ((l_suppkey - mnb) * ${1L << ZBits}) // (mxb - mnb + 1) AS cb
      FROM lineitem, st),
    z AS (SELECT l_partkey, l_suppkey,
      ${(0 until ZBits).map(i =>
        s"(((ca >> $i) & 1) << ${2 * i}) + (((cb >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")} AS zval
      FROM c)
    SELECT zval >> ${2 * ZBits - 4} AS bucket, COUNT(*) AS n_rows,
      MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
      MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
    FROM z GROUP BY bucket ORDER BY bucket"""

  private val qZorder = GraftQuery(
    "qlayout_zorder",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      zorder(li.select(col("l_partkey"), col("l_suppkey")),
          "l_partkey", "l_suppkey", ZBits)
        .groupBy(shiftright(col("zval"), 2 * ZBits - 4).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
        .orderBy(col("bucket"))
    },
    Some(zorderSql))

  val queries: Seq[GraftQuery] = Seq(qZorder)
}
