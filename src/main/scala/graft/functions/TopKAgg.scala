package graft.functions

import java.nio.ByteBuffer
import java.util.{PriorityQueue => JPriorityQueue}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom aggregate function tier: exact top-k of a BIGINT column as a
  * TypedImperativeAggregate with a bounded min-heap buffer — constant
  * memory per group, associative merge (map-side partial aggregation
  * works), byte-serializable for shuffle/spill. Returns the k largest
  * values sorted descending.
  *
  * The composable equivalent (`slice(sort_array(collect_list(x), false),
  * 1, k)`) buffers every value per group; this buffers k.
  */
case class TopKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JPriorityQueue[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_topk"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): JPriorityQueue[java.lang.Long] =
    new JPriorityQueue[java.lang.Long](k + 1)

  private def offer(b: JPriorityQueue[java.lang.Long], v: Long): Unit =
    if (b.size < k) b.add(v)
    else if (b.peek() < v) { b.poll(); b.add(v) }

  override def update(b: JPriorityQueue[java.lang.Long], input: InternalRow): JPriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: JPriorityQueue[java.lang.Long], o: JPriorityQueue[java.lang.Long]): JPriorityQueue[java.lang.Long] = {
    val it = o.iterator()
    while (it.hasNext) offer(b, it.next())
    b
  }

  override def eval(b: JPriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](b.size)
    var i = 0
    val it = b.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending
    val out = new Array[Long](arr.length)
    i = 0
    while (i < arr.length) { out(i) = arr(arr.length - 1 - i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: JPriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JPriorityQueue[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TopKLongs = copy(child = c)
}

object TopKAgg {
  def graft_topk(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKLongs(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
