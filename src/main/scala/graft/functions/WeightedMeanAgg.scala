package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` tier — the Dataset-native custom-aggregate API,
  * complementing the Catalyst `TypedImperativeAggregate` in [[TopKLongs]].
  *
  * Weighted mean over (value-cents, weight-cents) pairs, accumulated
  * EXACTLY in integer cents: the merge is plain long addition (associative,
  * map-side-combine friendly, spill-safe through the tuple encoder) and the
  * final division is the only IEEE operation — cross-engine deterministic
  * like the rest of the Exact toolkit. Long cents bound the exact range to
  * Σ v·w < 2⁶³ (~9e18 cent² — fine for the test SFs; at larger scale swap
  * the buffer to DECIMAL or split the sum).
  */
object WeightedMeanAgg extends Aggregator[(Long, Long), (Long, Long), Double] {
  /** (Σ value·weight, Σ weight) in cents. */
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  /** cents²/cents → cents → dollars; one fixed-form double expression. */
  override def finish(b: (Long, Long)): Double =
    b._1.toDouble / b._2.toDouble / 100.0
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
