package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable K-minimum-values sketch state: the K smallest DISTINCT
  * long values of the group, as an ascending `array<bigint>`.
  *
  * This is the aggregate the KMV estimator (SketchOps) is built on,
  * with the merge property made REAL in the physical plan: the buffer
  * is a bounded (≤ K entries) tree set, `update` is an O(log K)
  * insert-or-reject, and `merge` combines two partial states — so the
  * plan is a partial ObjectHashAggregate + final merge (map-side
  * combine, one narrow shuffle of ≤ K longs per group per partition)
  * instead of the previous full per-group hash `distinct` + Window
  * sort, which shuffled EVERY distinct hash and sorted the whole
  * group to keep 64 rows. Deduplication rides the set for free, so
  * callers drop their pre-`distinct` too. This is also exactly the
  * associative state the streaming twin
  * ([[graft.streaming.StreamingDistinctKmv]]) folds per micro-batch —
  * the batch and streaming paths now share one merge semantics.
  *
  * Input longs must be non-negative hashes (h60 domain); NULL inputs
  * are skipped. Groups with no non-null input evaluate to an empty
  * array. */
case class KmvKSmallest(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "kmv_sketch requires k > 0")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = java.lang.Long.valueOf(v.asInstanceOf[Long])
      if (buf.size < k) { buf.add(l); () }
      else if (l.longValue < buf.last.longValue) {
        if (buf.add(l)) { buf.pollLast(); () }
      }
    }
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) { b1.pollLast(); () }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) { buf.add(java.lang.Long.valueOf(bb.getLong)); () }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a bigint input, got ${child.dataType}")
  override def prettyName: String = "kmv_sketch"

  override protected def withNewChildInternal(newChild: Expression): KmvKSmallest =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(offset: Int): KmvKSmallest =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvKSmallest =
    copy(inputAggBufferOffset = offset)
}
