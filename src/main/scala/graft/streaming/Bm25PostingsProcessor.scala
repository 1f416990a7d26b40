package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

object Bm25PostingsProcessor {
  /** (key, docId, a, b) — routed arrival. Term keys ("t:<term>") carry
    * a = tf (the term's count in the doc) and b = dl (doc length in
    * tokens); shard keys ("s:<shard>") carry a = 0 and b = dl.
    */
  type In = (String, Long, Long, Long)

  /** Change-log row, same shape: term keys re-emit (key, docId, tf, dl)
    * once per NEW posting (replays are first-wins no-ops); shard keys
    * emit (key, -1, n_docs, sum_dl) — the shard's current corpus stats
    * — once per touched batch (latest wins; sum the shards).
    */
  type Out = (String, Long, Long, Long)
}

/** Incremental inverted-index + corpus-stats maintenance — the streaming
  * twin of [[graft.analytics.VocabOps.bm25Rank]]'s index-side inputs
  * (the last major batch-only retrieval surface under continuous
  * ingest, r12 verdict task 3).
  *
  * Two key spaces ride one processor:
  *
  *  - `t:<term>` — per-term postings as RocksDB MapState docId → (tf,
  *    dl). Per arrival: one containsKey + one put — NEVER a scan of the
  *    postings list, so a million-posting term costs the same per
  *    arrival as an empty one. Documents are immutable in this model
  *    (a doc's tf/dl are fixed at ingest), so at-least-once replays are
  *    first-wins no-ops and emit nothing.
  *  - `s:<shard>` — corpus stats (n_docs, sum_dl) sharded by
  *    hash(doc_id) so the global aggregate never rides one hot key:
  *    each shard keeps a seen-doc map (docId → dl, the exactly-once
  *    guard the additive counters need under replay) plus the running
  *    (n, sum) pair, and re-emits the pair per touched batch. The
  *    global figures are the sum over shard rows — associative, so any
  *    shard count works and consumers need no ordering.
  *
  * BM25 of a probe query over (latest postings, summed stats) equals
  * the batch [[graft.analytics.VocabOps.bm25Rank]] bit for bit — same
  * integer inputs, same float expression tree, same sorted-token fold
  * (pinned in StreamingExtrasSpec, with a 10⁶-posting soak + restart).
  *
  * TTL caveat: the three states expire independently, so a non-NONE
  * `stateTtl` lets a redelivery after a `seenDocs` expiry re-increment
  * the still-live `corpusStats` (and an expired posting re-emit) —
  * [[graft.analytics.VocabOps.bm25Stream]] gates this behind an
  * explicit `allowIncoherentTtl` opt-in.
  */
final class Bm25PostingsProcessor(stateTtl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[String, Bm25PostingsProcessor.In, Bm25PostingsProcessor.Out] {
  import Bm25PostingsProcessor._

  @transient private var postings: MapState[Long, (Long, Long)] = _
  @transient private var seen: MapState[Long, Long] = _
  @transient private var stats: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    postings = getHandle.getMapState[Long, (Long, Long)]("postings",
      Encoders.scalaLong, Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      stateTtl)
    seen = getHandle.getMapState[Long, Long]("seenDocs",
      Encoders.scalaLong, Encoders.scalaLong, stateTtl)
    stats = getHandle.getValueState[(Long, Long)]("corpusStats",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), stateTtl)
  }

  override def handleInputRows(key: String, rows: Iterator[In],
      timerValues: TimerValues): Iterator[Out] = {
    if (key.startsWith("t:")) {
      // sorted for deterministic emission order within a batch
      val out = rows.toVector.sortBy(_._2).flatMap { case (_, docId, tf, dl) =>
        if (postings.containsKey(docId)) None // replay: first wins
        else {
          postings.updateValue(docId, (tf, dl))
          Some((key, docId, tf, dl))
        }
      }
      out.iterator
    } else {
      var (n, s) = if (stats.exists()) stats.get() else (0L, 0L)
      var touched = false
      rows.foreach { case (_, docId, _, dl) =>
        if (!seen.containsKey(docId)) {
          seen.updateValue(docId, dl)
          n += 1L; s += dl
          touched = true
        }
      }
      if (touched) {
        stats.update((n, s))
        Iterator.single((key, -1L, n, s))
      } else Iterator.empty
    }
  }
}
