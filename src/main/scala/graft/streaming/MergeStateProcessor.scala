package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-entity latest-wins row maintainer backing
  * [[graft.analytics.CdcOps.mergeStream]] — the streaming half of the
  * changelog MERGE: state is the (ts, tie) stamp of each entity's current
  * row, and an input row is emitted (and the stamp advanced) only when it
  * is NEWER than the state — out-of-order stale updates are suppressed,
  * which is exactly what makes the emitted stream's per-key last row agree
  * with the batch [[graft.analytics.CdcOps.changelogState]] no matter how
  * the log was chopped into batches (StreamingExtrasSpec pins it).
  * Tombstones ('delete') flow through like any change (downstream state
  * stores need to see them); the batch-equivalence reduction drops keys
  * whose final emitted op is a delete, mirroring the batch filter.
  *
  * State is 16 bytes per entity regardless of row width — the row itself
  * rides on the output, not in state.
  *
  * Input: (entity, etype, value, ts_us, tie, op).
  * Output: (entity, etype, value, ts_us, op).
  */
final class MergeStateProcessor
    extends StatefulProcessor[Long, (Long, String, Double, Long, Long, String), (Long, String, Double, Long, String)] {

  @transient private var stamp: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    stamp = getHandle.getValueState[(Long, Long)]("stamp",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, String, Double, Long, Long, String)],
      timerValues: TimerValues): Iterator[(Long, String, Double, Long, String)] = {
    var cur = Option(stamp.get())
    val out = Vector.newBuilder[(Long, String, Double, Long, String)]
    rows.toVector.sortBy(r => (r._4, r._5)).foreach { case (_, et, v, ts, tie, op) =>
      if (cur.forall(c => c._1 < ts || (c._1 == ts && c._2 < tie))) {
        out += ((key, et, v, ts, op))
        cur = Some((ts, tie))
      }
    }
    cur.foreach(stamp.update)
    out.result().iterator
  }
}
