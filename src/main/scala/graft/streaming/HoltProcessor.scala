package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key streaming Holt double-exponential (level + trend) monitor —
  * the trend-aware companion to [[EwmaProcessor]]'s level-only smoother,
  * at the DYADIC smoothing pair α = β = ½ that keeps both recurrences
  * integer-exact:
  *
  *   l' ← (x + l + b) >> 1            (level: ½x + ½(l + b))
  *   b' ← ((l' − l) + b) >> 1         (trend: ½Δlevel + ½b)
  *
  * Arithmetic right-shift, NOT integer division: the trend term is
  * signed, and `div` truncates toward zero on negatives while `>> 1`
  * floors — the JVM and DuckDB agree on two's-complement `>> 1`, so
  * stream, batch fold, and oracle are bit-identical. Initialization is
  * the standard l₁ = x₁, b₁ = 0 on each key's first-ever event.
  *
  * TWO longs of state per entity regardless of event volume. Rows of one
  * micro-batch are applied in (event-time, event_id) order; stream ≡
  * batch under the same batch-monotone feed contract as every twin.
  *
  * Input: (key, us, event_id, cents). Output: (key, us, level, trend,
  * forecast = level + trend) for every row.
  */
final class HoltProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, Long), (Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("lb",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
    var seeded = st.exists()
    var (l, b) = if (seeded) st.get() else (0L, 0L)
    val out = rows.toVector.sortBy(r => (r._2, r._3)).map {
      case (_, us, _, cents) =>
        if (!seeded) { l = cents; b = 0L; seeded = true }
        else {
          val l0 = l
          l = (cents + l + b) >> 1
          b = ((l - l0) + b) >> 1
        }
        (key, us, l, b, l + b)
    }
    st.update((l, b))
    out.iterator
  }
}
