package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming point-in-time join backing
  * [[graft.analytics.CdcOps.pitJoinStream]] — the incremental twin of the
  * batch [[graft.analytics.CdcOps.pitJoin]]: one keyed stream carries both
  * dimension changes (kind 0) and facts (kind 1); per entity, the state is
  * the COLLAPSED dimension history (one (from_us, attr) entry per actual
  * change, exactly the rows the batch scd2 collapse keeps), and each fact
  * is emitted with the attribute in force at its own timestamp — the
  * latest change with from_us ≤ fact ts, ties resolved to the
  * latest-appended entry like the batch side's max-tie collapse.
  *
  * Ordering contract (same as [[Scd2ChangeProcessor]]): rows arrive
  * per-key in event-time order ACROSS batches; within a batch they are
  * sorted on (ts, kind, tie) before the scan — kind orders a dimension
  * change at the same instant as a fact BEFORE the fact, mirroring the
  * batch join's `fact.ts >= dim.valid_from` inclusivity. A fact that
  * precedes every dimension change emits a null attribute, like the
  * batch ASOF LEFT join. State grows with an entity's CHANGE count (not
  * its fact count); bound it upstream with a retention cutoff on the
  * dimension log when entities churn forever.
  *
  * Input: (entity, kind, ts_us, tie, attr, fact_id).
  * Output: (entity, fact_id, ts_us, attr_at_ts).
  */
final class PitJoinProcessor
    extends StatefulProcessor[Long, (Long, Int, Long, Long, String, Long), (Long, Long, Long, String)] {

  @transient private var hist: ListState[(Long, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    hist = getHandle.getListState[(Long, String)]("dimHist",
      Encoders.product[(Long, String)], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Int, Long, Long, String, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, String)] = {
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    hist.get().foreach(entries += _)
    var appended = false
    val out = Vector.newBuilder[(Long, Long, Long, String)]
    rows.toVector.sortBy(r => (r._3, r._2, r._4)).foreach {
      case (_, 0, ts, _, attr, _) =>        // dimension change candidate
        if (entries.isEmpty || entries.last._2 != attr) {
          entries += ((ts, attr))
          appended = true
        }
      case (_, _, ts, _, _, factId) =>      // fact: probe latest from <= ts
        var i = entries.length - 1
        while (i >= 0 && entries(i)._1 > ts) i -= 1
        out += ((key, factId, ts, if (i >= 0) entries(i)._2 else null))
    }
    if (appended) hist.put(entries.toArray)
    out.result().iterator
  }
}
