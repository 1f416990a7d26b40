package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user RFM feature maintainer — the streaming half of
  * [[graft.analytics.EventsQueries]]'s qe_rfm segmentation: state is the
  * user's live (last-event-micros, event count, value cents) triple,
  * each input row folds max/+1/+cents, and the updated triple is
  * emitted after every batch that touches the user. The last emitted
  * row per user is IDENTICAL to the batch per-user feature frame over
  * everything seen so far, however the stream is chopped into
  * micro-batches (max and + are associative/commutative —
  * StreamingExtrasSpec pins the equivalence). Quintile SCORING stays a
  * batch/periodic step over the emitted feature frame: NTILE is a
  * global-ordering readout, meaningless per-increment.
  *
  * State is 24 bytes per live user, exact integer units, cross-run
  * deterministic. Input: (user, tsMicros, cents). Output:
  * (user, lastMicros, f, m).
  */
final class RfmFeatureProcessor
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)]("rfm",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    var (last, c, s) = Option(st.get()).getOrElse((Long.MinValue, 0L, 0L))
    rows.foreach { case (_, tm, cents) =>
      if (tm > last) last = tm
      c += 1; s += cents
    }
    st.update((last, c, s))
    Iterator.single((key, last, c, s))
  }
}
