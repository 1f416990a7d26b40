package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-band-bucket incremental near-dup verifier backing
  * [[graft.analytics.DedupOps.nearDupStream]].
  *
  * Key = "band:bandValue" (one MinHash band of the signature); state = the
  * bucket's (doc_id, sorted-distinct shingle hashes) list. Each arrival is
  * exact-verified against the bucket's prior docs (Jaccard of the hash
  * arrays — the same verify as the batch `minhashLsh`) and then appended,
  * so any later near-dup that lands in this bucket is checked against it.
  * Within a micro-batch, rows process in doc-id order — deterministic, and
  * in-batch pairs are still caught (earlier id becomes `dup_of`).
  *
  * State is per (band, value) bucket: small by the LSH premise (a bucket
  * collecting many docs means they ARE near-dups of each other), uniform
  * by construction of the hash key, TTL-boundable for unbounded streams.
  * Input: (doc_id, shingleHashes, bandKey). Output: (doc_id, dup_of,
  * jaccard) per verified pair in this bucket.
  */
final class BandNearDupProcessor(threshold: Double, stateTtl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[String, (Long, Array[Long], String), (Long, Long, Double)] {

  @transient private var seen: ListState[(Long, Array[Long])] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getListState[(Long, Array[Long])]("bandDocs",
      Encoders.product[(Long, Array[Long])], stateTtl)

  override def handleInputRows(key: String, rows: Iterator[(Long, Array[Long], String)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var existing = seen.get().toVector
    val out = Vector.newBuilder[(Long, Long, Double)]
    rows.toVector.sortBy(_._1).foreach { case (id, sh, _) =>
      existing.foreach { case (oid, osh) =>
        if (oid != id) {
          // both arrays are sorted distinct (native ShingleHashes) — the
          // intersect is the exact shingle-set overlap
          val inter = osh.intersect(sh).length
          val union = osh.length + sh.length - inter
          val j = if (union == 0) 0.0 else inter.toDouble / union
          if (j >= threshold) out += ((id, oid, j))
        }
      }
      existing :+= ((id, sh))
      seen.appendValue((id, sh))
    }
    out.result().iterator
  }
}
