package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.BitmapPages

/** Per-key streaming EXACT distinct-count maintainer on paged-bitmap
  * state — the streaming twin of the `graft_bitmap_distinct` native
  * aggregate (qagg_bitmap_distinct), sharing its update/merge/wire core
  * ([[graft.functions.BitmapPages]]) the way the trending twin shares
  * MGSummary. Each key's state is ONE serialized page map (4096-bit
  * pages, present-word mask encoding); arrivals OR bits in place.
  *
  * Sits between the engine's two other rolling-distinct shapes: the
  * exact `slidingDistinctStream` carries a state ROW PER MEMBERSHIP
  * (state scales with distincts seen), the HLL twin
  * ([[HllStateProcessor]]) is constant-state but approximate. For dense
  * BIGINT id domains the bitmap is exact at ~1 bit per domain slot:
  * 10⁶ clustered users/day is ~125 KB of state per day-key, one row.
  *
  * Determinism is STRUCTURAL, stronger than the HLL twin's composite-
  * estimate argument: bitwise OR is commutative, associative, and
  * idempotent, so any micro-batching, arrival order, or at-least-once
  * replay yields the identical bitmap — the emitted count is pinned
  * bit-exact to batch `countDistinct` / `graft_bitmap_distinct` with no
  * tolerance clause anywhere.
  *
  * Input: (key, id). Output: (key, exact distinct) per touched key per
  * batch.
  */
final class BitmapStateProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {

  @transient private var st: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Array[Byte]]("bitmap", Encoders.BINARY,
      TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val pages = Option(st.get())
      .map(BitmapPages.deserialize)
      .getOrElse(new java.util.HashMap[java.lang.Long, Array[Long]]())
    rows.foreach { case (_, id) => BitmapPages.add(pages, id) }
    st.update(BitmapPages.serialize(pages))
    Iterator.single((key, BitmapPages.cardinality(pages)))
  }
}
