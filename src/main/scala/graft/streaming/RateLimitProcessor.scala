package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key streaming token-bucket admission audit — the third
  * constant-state monitor next to [[CusumProcessor]] (drift) and
  * [[EwmaProcessor]] (level): a bucket of capacity `cap` refills at
  * `rate` units per second of EVENT time and each event spends its cost;
  * an event whose cost exceeds the available tokens is REJECTED (tokens
  * unchanged — the standard strict-bucket policy). All integer: refill =
  * rate · ⌊Δus / 10⁶⌋.
  *
  * State is TWO longs per entity — (tokens, last event-time µs) —
  * regardless of event volume. Rows of one micro-batch are applied in
  * (event-time, event_id) order; stream ≡ batch under the
  * batch-monotone feed contract every twin documents.
  *
  * Input: (key, us, event_id, cost). Output: (key, us, cost, avail) for
  * each REJECTED row, where avail is the post-refill balance the event
  * saw — identical row set to the batch fold.
  */
final class RateLimitProcessor(cap: Long, rate: Long)
    extends StatefulProcessor[Long, (Long, Long, Long, Long), (Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("s",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    var (tok, lastUs) =
      if (st.exists()) st.get() else (-1L, 0L)   // -1 = no prior event
    val out = rows.toVector.sortBy(r => (r._2, r._3)).flatMap {
      case (_, us, _, cost) =>
        val avail =
          if (tok < 0L) cap
          else math.min(cap, tok + rate * ((us - lastUs) / 1000000L))
        val admitted = avail >= cost
        tok = if (admitted) avail - cost else avail
        lastUs = us
        if (admitted) None else Some((key, us, cost, avail))
    }
    st.update((tok, lastUs))
    out.iterator
  }
}
