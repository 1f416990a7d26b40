package graft.functions

import java.nio.ByteBuffer
import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** EXACT distinct-count of a BIGINT key as a paged-bitmap native
  * `TypedImperativeAggregate` — the roaring-bitmap pattern (Chambi et
  * al. 2016) in its simplest useful form: ids bucket into 4096-bit
  * pages (id >> 12 → 64 words of 64 bits), pages live in a hash map,
  * merge is pointwise OR, cardinality is Σ popcount.
  *
  * Where it sits in the distinct-count tier: `countDistinct` is exact
  * but its partial state is the full key SET (hash rows through the
  * shuffle); `hll_sketch_agg` is constant-state but approximate. For
  * DENSE integer domains (user ids, fact surrogate keys — the common
  * analytics case) the paged bitmap is BOTH: exact, with state ~n/8
  * bytes worst case but ~domain/8 when keys cluster, 64 ids per word
  * regardless of multiplicity, and O(pages) merges that vectorize as
  * long ORs. A 10⁹-id dense domain is 125 MB as a bitmap vs gigabytes
  * of shuffled key rows — and partial aggregation collapses each
  * partition to its page set map-side.
  *
  * Determinism: trivially total — OR is commutative/associative/
  * idempotent, so ANY row order, merge tree, or duplication (spill
  * replay) yields the identical bitmap. The gate query asserts
  * equality with `countDistinct` on every group.
  *
  * Serialized form per page: [pageId][present-word mask][nonzero words]
  * — empty words cost one bit, so sparse pages stay small.
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JHashMap[java.lang.Long, Array[Long]]]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_bitmap_distinct"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): JHashMap[java.lang.Long, Array[Long]] =
    new JHashMap[java.lang.Long, Array[Long]]()

  override def update(
      b: JHashMap[java.lang.Long, Array[Long]],
      input: InternalRow): JHashMap[java.lang.Long, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) BitmapPages.add(b, v.asInstanceOf[Long])
    b
  }

  override def merge(
      b: JHashMap[java.lang.Long, Array[Long]],
      o: JHashMap[java.lang.Long, Array[Long]]): JHashMap[java.lang.Long, Array[Long]] =
    BitmapPages.mergeInto(b, o)

  override def eval(b: JHashMap[java.lang.Long, Array[Long]]): Any =
    BitmapPages.cardinality(b)

  override def serialize(b: JHashMap[java.lang.Long, Array[Long]]): Array[Byte] =
    BitmapPages.serialize(b)

  override def deserialize(bytes: Array[Byte]): JHashMap[java.lang.Long, Array[Long]] =
    BitmapPages.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapDistinct =
    copy(child = c)
}

object BitmapPages {
  private val WordsPerPage = 64   // 4096 ids per page

  def add(b: JHashMap[java.lang.Long, Array[Long]], id: Long): Unit = {
    val page = java.lang.Long.valueOf(id >> 12)
    var words = b.get(page)
    if (words == null) {
      words = new Array[Long](WordsPerPage)
      b.put(page, words)
    }
    val bit = (id & 4095L).toInt
    words(bit >> 6) |= (1L << (bit & 63))
  }

  def mergeInto(b: JHashMap[java.lang.Long, Array[Long]],
      o: JHashMap[java.lang.Long, Array[Long]]): JHashMap[java.lang.Long, Array[Long]] = {
    val it = o.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = b.get(e.getKey)
      if (mine == null) b.put(e.getKey, e.getValue.clone())
      else {
        var i = 0
        while (i < WordsPerPage) { mine(i) |= e.getValue()(i); i += 1 }
      }
    }
    b
  }

  def cardinality(b: JHashMap[java.lang.Long, Array[Long]]): Long = {
    var n = 0L
    val it = b.values().iterator()
    while (it.hasNext) {
      val words = it.next()
      var i = 0
      while (i < WordsPerPage) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    }
    n
  }

  def serialize(b: JHashMap[java.lang.Long, Array[Long]]): Array[Byte] = {
    // worst case: 4 + pages * (8 + 8 + 64*8)
    val buf = ByteBuffer.allocate(4 + b.size * (16 + WordsPerPage * 8))
    buf.putInt(b.size)
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.putLong(e.getKey.longValue())
      val words = e.getValue
      var mask = 0L
      var i = 0
      while (i < WordsPerPage) {
        if (words(i) != 0L) mask |= (1L << i)
        i += 1
      }
      buf.putLong(mask)
      i = 0
      while (i < WordsPerPage) {
        if (words(i) != 0L) buf.putLong(words(i))
        i += 1
      }
    }
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  def deserialize(bytes: Array[Byte]): JHashMap[java.lang.Long, Array[Long]] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new JHashMap[java.lang.Long, Array[Long]](n * 2)
    var p = 0
    while (p < n) {
      val page = buf.getLong
      val mask = buf.getLong
      val words = new Array[Long](WordsPerPage)
      var i = 0
      while (i < WordsPerPage) {
        if ((mask & (1L << i)) != 0L) words(i) = buf.getLong
        i += 1
      }
      b.put(java.lang.Long.valueOf(page), words)
      p += 1
    }
    b
  }
}

object BitmapAgg {
  /** Column-API surface: exact distinct count of a BIGINT column. */
  def graft_bitmap_distinct(c: Column): Column =
    GraftColumnBridge.column(BitmapDistinct(GraftColumnBridge.expression(c))
      .toAggregateExpression())
}
