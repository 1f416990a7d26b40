package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key streaming CUSUM drift monitor — the `transformWithState` twin
  * the batch qe_cusum_alerts scaladoc promises: the clamped recurrence
  * s ← max(0, s + x − k) is the one sequence pattern the declarative
  * surface cannot express, and in the streaming plane it is the
  * canonical CONSTANT-STATE monitor: ONE long of state per entity
  * regardless of event volume (the dual of the MG/HLL sketch twins'
  * constant-bytes-per-window story).
  *
  * Rows of one micro-batch are applied in (event-time, event_id) order
  * — the handler sorts its batch slice, so stream ≡ batch holds
  * whenever the FEED delivers each key's rows batch-monotonically (a
  * single-partition source split at any boundaries, the
  * StreamingExtrasSpec harness); arrivals straddling batches out of
  * order are the at-least-once replay caveat every twin documents.
  *
  * Input: (key, us, event_id, cents). Output: (key, us, s) for each
  * row whose post-update statistic exceeds `h` — identical row set to
  * the batch fold.
  */
final class CusumProcessor(k: Long, h: Long)
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
        acc = math.max(0L, acc + cents - k)
        if (acc > h) Some((key, us, acc)) else None
    }
    st.update(acc)
    out.iterator
  }
}
