package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-entity attribute change detector backing
  * [[graft.analytics.CdcOps.scd2Stream]] — the streaming half of the SCD2
  * build: state is ONE value per entity (the last seen attribute), and a
  * row is emitted only when the attribute differs from it, i.e. the LAG
  * collapse of the batch [[graft.analytics.CdcOps.scd2]] evaluated
  * incrementally. Validity-interval closing stays a batch/query-time
  * concern (it needs the NEXT change); the emitted change stream is
  * exactly the batch collapse's row set, which the spec pins.
  *
  * Input rows must arrive per-key in (ts, tie) order ACROSS batches (the
  * usual CDC-source contract); within a batch they are sorted before the
  * scan, so intra-batch disorder is fine.
  *
  * Input: (entity, attr, ts_us, tie). Output: (entity, attr, from_us).
  */
final class Scd2ChangeProcessor
    extends StatefulProcessor[Long, (Long, String, Long, Long), (Long, String, Long)] {

  @transient private var last: ValueState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[String]("lastAttr", Encoders.STRING, TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, String, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, String, Long)] = {
    var cur = Option(last.get())
    val out = Vector.newBuilder[(Long, String, Long)]
    rows.toVector.sortBy(r => (r._3, r._4)).foreach { case (_, attr, ts, _) =>
      if (!cur.contains(attr)) {
        out += ((key, attr, ts))
        cur = Some(attr)
      }
    }
    cur.foreach(last.update)
    out.result().iterator
  }
}
