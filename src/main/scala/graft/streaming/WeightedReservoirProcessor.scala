package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-stratum k-smallest-priority reservoir backing
  * [[graft.analytics.TextOps.weightedReservoirStream]].
  *
  * Key = stratum; state = the current reservoir, at most k
  * (skey, doc_id, w) entries. Each batch merges arrivals into the
  * reservoir, keeps the k smallest by (skey, doc_id) — the SAME total
  * order the batch sampler sorts by, which is what makes stream ≡ batch —
  * and emits the post-batch snapshot. The merge dedupes, so at-least-once
  * re-delivery of a row cannot occupy two reservoir slots.
  *
  * State is O(k) per stratum regardless of stream length — the reservoir
  * property; a row whose skey exceeds the current k-th is absorbed and
  * discarded in one batch.
  */
final class WeightedReservoirProcessor(k: Int)
    extends StatefulProcessor[String, (String, Long, Long, Long), (String, Long, Long, Long)] {

  @transient private var res: ListState[(Long, Long, Long)] = _ // (skey, doc_id, w)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    res = getHandle.getListState[(Long, Long, Long)]("reservoir",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
    val merged = (res.get().toVector ++
        rows.map { case (_, id, w, skey) => (skey, id, w) })
      .distinct
      .sortBy(t => (t._1, t._2))
      .take(k)
    res.clear()
    merged.foreach(res.appendValue)
    merged.iterator.map { case (skey, id, w) => (key, id, w, skey) }
  }
}
