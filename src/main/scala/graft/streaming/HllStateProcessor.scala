package graft.streaming

import org.apache.datasketches.hll.{HllSketch, TgtHllType}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key (e.g. per-day) streaming HLL distinct-count maintainer —
  * MERGEABLE-SKETCH state, the streaming half of the qagg_hll_sketch /
  * qagg_hll_sliding warehouse pattern: each key's state is ONE serialized
  * HllSketch (lgK, HLL_8 — the configuration of Spark's
  * `hll_sketch_agg(col, lgK)`; both route through datasketches-java),
  * arrivals update it in place.
  *
  * Estimator choice is the determinism-critical detail: the library's
  * default `getEstimate` prefers the HIP (historical inverse
  * probability) estimator, whose accumulator depends on INSERTION
  * HISTORY — two builds over the same distinct set in different orders,
  * or a merged vs sequential build, legitimately emit slightly different
  * numbers (which is also why `hll_sketch_agg`'s estimate varies with
  * partitioning). This processor emits `getCompositeEstimate` instead —
  * a pure function of the REGISTER state, and registers are
  * max-commutative, so the emitted estimate is identical however the
  * stream is micro-batched, ordered, or partitioned. StreamingExtrasSpec
  * pins exactly that: stream final ≡ a sequential golden build's
  * composite estimate (bit-equal), and ≈ `hll_sketch_agg` within sketch
  * tolerance.
  *
  * State per key is the ~2^lgK-byte sketch — constant, never
  * per-distinct-element (the whole point vs the exact dropDuplicates
  * twin `slidingDistinctStream`, whose state is one row per membership).
  * At corpus scale this is the only viable rolling-distinct state shape.
  *
  * Input: (key, value-to-count). Output: (key, estimate) per touched key
  * per batch.
  */
final class HllStateProcessor(lgK: Int = 12)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {

  @transient private var sk: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sk = getHandle.getValueState[Array[Byte]]("hll", Encoders.BINARY,
      TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val s = Option(sk.get())
      .map(HllSketch.heapify)
      .getOrElse(new HllSketch(lgK, TgtHllType.HLL_8))
    rows.foreach { case (_, v) => s.update(v) }
    sk.update(s.toUpdatableByteArray)
    Iterator.single((key, Math.round(s.getCompositeEstimate)))
  }
}
