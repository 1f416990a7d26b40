package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-asset state behind [[graft.analytics.MultimodalOps.sceneCutStream]]:
  * the previous frame's (histogram, length) plus the running
  * (n_frames, n_cuts, first_cut) — so the histogram-delta cut rule
  * (2·L1 > flen + prev_flen, exactly [[graft.analytics.MultimodalOps.sceneCuts]])
  * keeps firing across micro-batch boundaries: a cut whose two frames
  * arrive in different batches is detected from the 40-byte state, not by
  * re-reading earlier frames. Within a batch rows sort by frame_idx (the
  * same in-order contract as the CEP processor); across batches frames
  * are assumed to arrive batch-monotonically, as a frame extractor
  * produces them.
  *
  * Input: (doc_id, frame_idx, flen, hist). Output after each batch that
  * touches the asset: (doc_id, n_frames, n_cuts, first_cut | -1).
  */
final case class SceneState(hist: Seq[Long], flen: Int, n: Long,
    cuts: Long, first: Int)

final class SceneCutProcessor
    extends StatefulProcessor[Long, (Long, Int, Int, Seq[Long]), (Long, Long, Long, Int)] {

  @transient private var st: ValueState[SceneState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SceneState]("scene",
      Encoders.product[SceneState], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Int, Int, Seq[Long])],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Int)] = {
    var s = Option(st.get()).getOrElse(SceneState(Nil, 0, 0L, 0L, -1))
    rows.toSeq.sortBy(_._2).foreach { case (_, idx, flen, hist) =>
      if (s.n > 0L) {
        var l1 = 0L
        var i = 0
        while (i < hist.length) { l1 += math.abs(hist(i) - s.hist(i)); i += 1 }
        if (2L * l1 > flen + s.flen) {
          s = s.copy(cuts = s.cuts + 1,
            first = if (s.first < 0) idx else s.first)
        }
      }
      s = s.copy(hist = hist, flen = flen, n = s.n + 1)
    }
    st.update(s)
    Iterator.single((key, s.n, s.cuts, s.first))
  }
}
