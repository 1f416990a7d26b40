package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-hash incremental contamination state backing
  * [[graft.analytics.TextOps.contaminationStream]].
  *
  * Key = tagged hash ("e:<fp60>" exact-fingerprint or "p:<h>" shingle-
  * window, the batch check's two hash domains). State = (has a
  * BENCHMARK doc ever carried this hash, the train docs that carry
  * it). A train arrival on a benchmark-marked hash flags immediately;
  * a benchmark arrival retro-flags every stored train doc — late
  * benchmark sets converge to the same flag set a batch re-run would
  * produce (the eval-hygiene twin of the dedup-family processors).
  *
  * Within a batch, benchmark rows process first, so a (bench, train)
  * pair landing in one micro-batch still flags; the final flag SET is
  * interleaving-independent either way. A doc sharing several
  * contaminated windows emits once per window key — consumers dedup on
  * (doc_id, kind), exactly as the batch check's post-join distinct.
  * Output: (doc_id, kind) with kind = "e" | "p".
  */
final class ContaminationProcessor(stateTtl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[String, (String, Boolean, Long), (Long, String)] {

  @transient private var benchSeen: ValueState[Boolean] = _
  @transient private var trainDocs: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    benchSeen = getHandle.getValueState[Boolean]("benchSeen",
      Encoders.scalaBoolean, stateTtl)
    trainDocs = getHandle.getListState[Long]("trainDocs",
      Encoders.scalaLong, stateTtl)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Boolean, Long)],
      timerValues: TimerValues): Iterator[(Long, String)] = {
    val kind = key.substring(0, 1)
    val (bench, train) = rows.toVector.partition(_._2)
    val out = Vector.newBuilder[(Long, String)]
    var seen = benchSeen.exists() && benchSeen.get()
    if (!seen && bench.nonEmpty) {
      seen = true
      benchSeen.update(true)
      // retroactive flags: every train doc stored before the benchmark
      // set grew to cover this hash — after which the stored list is
      // never read again, so release it (a hot contaminated shingle
      // would otherwise grow state forever for zero benefit)
      trainDocs.get().foreach(d => out += ((d, kind)))
      trainDocs.clear()
    }
    train.sortBy(_._3).foreach { case (_, _, d) =>
      if (seen) out += ((d, kind))
      // store only while retroactivity still needs it: once the hash is
      // benchmark-marked, arrivals are flagged immediately and stored
      // docs have no future reader
      else trainDocs.appendValue(d)
    }
    out.result().iterator
  }
}
