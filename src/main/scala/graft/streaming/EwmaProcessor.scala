package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key streaming EWMA level monitor — the smoothed companion to
  * [[CusumProcessor]]'s drift detector, at the DYADIC smoothing constant
  * α = ½ that keeps the whole recurrence integer-exact:
  *
  *   s ← (s + x) div 2        (floor; s starts at 0)
  *
  * A geometric-memory level estimate with no window buffer: like CUSUM,
  * ONE long of state per entity regardless of event volume. α = ½ is
  * the one smoothing constant where EWMA needs no float and no scale
  * factor — each event's weight halves per subsequent event, and the
  * floor loses < 1 cent per step (both engines floor identically, so
  * the oracle hash-matches bit-exactly).
  *
  * Rows of one micro-batch are applied in (event-time, event_id) order;
  * stream ≡ batch under the same batch-monotone feed contract as every
  * twin (StreamingExtrasSpec pins a mid-key batch split).
  *
  * Input: (key, us, event_id, cents). Output: (key, us, s) for each row
  * whose post-update smoothed level exceeds `h`.
  */
final class EwmaProcessor(h: Long)
    extends StatefulProcessor[Long, (Long, Long, Long, Long), (Long, Long, Long)] {

  @transient private var st: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Long]("s", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var acc = if (st.exists()) st.get() else 0L
    val out = rows.toVector.sortBy(r => (r._2, r._3)).flatMap {
      case (_, us, _, cents) =>
        acc = Math.floorDiv(acc + cents, 2L)
        if (acc > h) Some((key, us, acc)) else None
    }
    st.update(acc)
    out.iterator
  }
}
