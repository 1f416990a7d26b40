package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mutable t-digest buffer (Dunning's MERGING variant, arXiv:1902.04023):
  * an append tail of raw points plus periodic compression into weighted
  * centroids under the k1-style size bound — centroid weight at quantile q
  * may not exceed max(1, 2·W·√(q(1−q))/δ), so clusters are tiny at the
  * tails (where rank precision matters most) and O(W/δ) in the middle,
  * with total centroid count ≤ ~πδ/2 independent of W. Memory
  * is O(δ) regardless of input size; compression is a sort + one linear
  * greedy pass.
  */
final class TDigestBuf(val delta: Int) {
  var means = new Array[Double](64)
  var weights = new Array[Long](64)
  var n = 0

  private def ensure(cap: Int): Unit =
    if (cap > means.length) {
      val nc = math.max(cap, means.length * 2)
      means = java.util.Arrays.copyOf(means, nc)
      weights = java.util.Arrays.copyOf(weights, nc)
    }

  def add(m: Double, w: Long): Unit = {
    ensure(n + 1)
    means(n) = m; weights(n) = w; n += 1
    if (n > 8 * delta) compress()
  }

  /** Sort by mean, then greedily merge adjacent centroids subject to the
    * scale-function bound. Weighted means drift by merge order (gated, not
    * hashed — see SketchOps); ranks stay within the t-digest contract.
    */
  def compress(): Unit = {
    if (n <= 1) return
    val idx = Array.range(0, n).sortBy(means(_))
    var total = 0L
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val outM = new Array[Double](n)
    val outW = new Array[Long](n)
    var out = 0
    var curM = means(idx(0))
    var curW = weights(idx(0))
    var wSoFar = 0L
    i = 1
    while (i < n) {
      val m = means(idx(i))
      val w = weights(idx(i))
      val q0 = wSoFar.toDouble / total
      val q2 = (wSoFar + curW + w).toDouble / total
      val qb = (q0 + q2) / 2.0
      // k1-style sqrt scale: max cluster weight 2·W·√(q(1−q))/δ keeps the
      // total centroid count ≤ ~πδ/2 INDEPENDENT of W (the plain q(1−q)
      // bound grows O(δ·log W) — measured 641 centroids at W=1e5, δ=100)
      val lim = math.max(1.0, 2.0 * total * math.sqrt(qb * (1.0 - qb)) / delta)
      if (curW + w <= lim) {
        val tw = curW + w
        curM += (m - curM) * w / tw
        curW = tw
      } else {
        outM(out) = curM; outW(out) = curW; out += 1
        wSoFar += curW
        curM = m; curW = w
      }
      i += 1
    }
    outM(out) = curM; outW(out) = curW; out += 1
    System.arraycopy(outM, 0, means, 0, out)
    System.arraycopy(outW, 0, weights, 0, out)
    n = out
  }

  /** Quantile estimate: interpolate between centroid mid-ranks (centroids
    * are mean-sorted after compress). */
  def quantile(q: Double): Double = {
    compress()
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    var total = 0L
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val target = q * total
    var cum = 0L
    var prevMid = weights(0) / 2.0
    if (target <= prevMid) return means(0)
    i = 1
    while (i < n) {
      cum += weights(i - 1)
      val mid = cum + weights(i) / 2.0
      if (target <= mid) {
        val f = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + f * (means(i) - means(i - 1))
      }
      prevMid = mid
      i += 1
    }
    means(n - 1)
  }
}

/** t-digest quantile sketch as a native Catalyst
  * `TypedImperativeAggregate`: O(δ) bytes per group independent of group
  * size, associative-enough merge (concatenate centroid sets, re-compress
  * — rank error stays within the scale-function contract for any merge
  * tree), byte-serializable for shuffle/spill. `eval` returns the
  * requested quantile estimates as `array<double>`.
  *
  * This is the warehouse pre-aggregated-quantiles pattern at 100 TB:
  * store one digest per partition/dimension, answer any coarser-grain
  * quantile by merging digests — never rescanning facts (exact
  * percentiles are not mergeable; digests are). The centroid means drift
  * slightly with merge order, so correctness is gated on the RANK
  * contract against exact order statistics, not on bit equality — see
  * `SketchOps.tdigestQuantiles`.
  */
case class TDigestQuantiles(
    child: Expression,
    delta: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuf]
  with UnaryLike[Expression] {

  require(delta >= 20 && delta <= 10000, s"delta out of range: $delta")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), "qs must be in [0,1]")

  override def prettyName: String = "graft_tdigest"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TDigestBuf = new TDigestBuf(delta)

  override def update(b: TDigestBuf, input: InternalRow): TDigestBuf = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double], 1L)
    b
  }

  override def merge(b: TDigestBuf, o: TDigestBuf): TDigestBuf = {
    var i = 0
    while (i < o.n) { b.add(o.means(i), o.weights(i)); i += 1 }
    b.compress()
    b
  }

  override def eval(b: TDigestBuf): Any =
    new GenericArrayData(qs.map(b.quantile).toArray)

  override def serialize(b: TDigestBuf): Array[Byte] = {
    b.compress()
    val bb = ByteBuffer.allocate(4 + b.n * 16)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.means(i)); bb.putLong(b.weights(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.add(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestQuantiles =
    copy(child = c)
}

object TDigestAgg {
  /** t-digest quantile estimates of a double column at compression `delta`;
    * returns array<double> aligned with `qs`.
    */
  def graft_tdigest(c: Column, delta: Int, qs: Seq[Double]): Column =
    GraftColumnBridge.column(
      TDigestQuantiles(GraftColumnBridge.expression(c), delta, qs)
        .toAggregateExpression())
}
