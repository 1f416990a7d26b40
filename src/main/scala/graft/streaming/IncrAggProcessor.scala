package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key running COUNT/SUM maintainer backing
  * [[graft.analytics.CdcOps.incrementalAggStream]] — the streaming half
  * of the materialized-view delta rule: state is the key's live
  * (count, sum) pair, each input applies its signed delta (insert →
  * +1/+v, delete → −1/−v), and the updated pair is emitted after every
  * batch that touches the key. The last emitted row per key — dropping
  * keys whose live count is ≤ 0 — is IDENTICAL to the batch
  * [[graft.analytics.CdcOps.incrementalAgg]] over everything seen so
  * far, however the changelog is chopped into micro-batches
  * (StreamingExtrasSpec pins it): integer addition is associative and
  * commutative, so batching cannot change the total.
  *
  * Values are exact integer units (cents — the caller scales), never
  * floats: state is 16 bytes per key and cross-run deterministic.
  *
  * Input: (key, dCnt, dUnits). Output: (key, cnt, units).
  */
final class IncrAggProcessor
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long)] {

  @transient private var agg: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState[(Long, Long)]("agg",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var (c, s) = Option(agg.get()).getOrElse((0L, 0L))
    rows.foreach { case (_, dc, ds) => c += dc; s += ds }
    agg.update((c, s))
    Iterator.single((key, c, s))
  }
}
