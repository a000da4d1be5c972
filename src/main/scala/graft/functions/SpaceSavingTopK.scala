package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a native
  * `TypedImperativeAggregate` (mutable binary-serializable buffer — the
  * integration class Spark's own HLL/percentile sketches use).
  *
  * Finds the ≤ `capacity` most frequent string values in one pass with
  * bounded memory: when the buffer is full, the minimum-count entry is
  * evicted and its count inherited (Metwally et al.'s SpaceSaving).
  * Guarantees: estimated count ≥ true count, error ≤ n/capacity, and
  * any value with true frequency > n/capacity is retained. With
  * capacity ≥ |distinct| the sketch is EXACT.
  *
  * At 100 TB this replaces a full groupBy+sort over a high-cardinality
  * column (vocab, user ids, URLs) with an O(capacity) state per
  * partition and an O(capacity²) worst-case merge.
  *
  * Returns map<value, estimated_count>.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType)
  override def prettyName: String = "topk_sketch"

  // fail at analysis (not with an executor ClassCastException mid-job)
  // when the input is not a string
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def offer(buf: mutable.HashMap[String, Long], v: String,
                    inc: Long): Unit =
    buf.get(v) match {
      case Some(c) => buf.update(v, c + inc)
      case None if buf.size < capacity => buf.update(v, inc)
      case None =>
        val (minK, minC) = buf.minBy { case (k, c) => (c, k) }
        buf.remove(minK)
        buf.update(v, minC + inc)  // inherit the evicted count (SpaceSaving)
    }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.toSeq.sortBy { case (k, c) => (-c, k) }
      .foreach { case (k, c) => offer(buf, k, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, c) => (-c, k) }
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(sorted.map(_._2).toArray[Any]))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}

object SpaceSavingTopK {
  /** Column API: `topkSketch(col("token"), 64)` → map<value, est_count>. */
  def topkSketch(c: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      SpaceSavingTopK(GraftColumnBridge.expression(c), capacity)
        .toAggregateExpression())
}
