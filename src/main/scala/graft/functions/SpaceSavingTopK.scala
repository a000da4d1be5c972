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
  * partition and an O(capacity·log capacity) merge.
  *
  * Returns map<value, estimated_count>.
  */
object SpaceSaving {

  /** Sketch state: counts plus a lazy-deletion min-heap over
    * (count, value) so eviction is O(log capacity) amortized instead of
    * a full O(capacity) scan per evicted row — in the saturated regime
    * (capacity ≪ distinct, the actual heavy-hitters use case) every
    * unseen value evicts, so the scan made update cost O(n·capacity).
    *
    * A count increment pushes a fresh heap entry and leaves the old one
    * stale; pops skip entries whose (count, value) no longer matches the
    * live map. The heap is rebuilt from the map once it exceeds
    * 4×capacity entries, keeping memory O(capacity) amortized. Eviction
    * order — minimum (count, value) lexicographically — is identical to
    * the previous linear `minBy`, so results are bit-for-bit unchanged.
    */
  final class Buffer {
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
    // PriorityQueue is a max-heap for its Ordering; reverse → min-heap
    private var heap: mutable.PriorityQueue[(Long, String)] =
      mutable.PriorityQueue.empty(
        Ordering.Tuple2(Ordering.Long, Ordering.String).reverse)

    private def compact(capacity: Int): Unit =
      if (heap.size > 4 * capacity + 8) {
        heap = mutable.PriorityQueue.empty(
          Ordering.Tuple2(Ordering.Long, Ordering.String).reverse)
        counts.foreach { case (k, c) => heap.enqueue((c, k)) }
      }

    def offer(capacity: Int, v: String, inc: Long): Unit = {
      counts.get(v) match {
        case Some(c) =>
          counts.update(v, c + inc)
          heap.enqueue((c + inc, v))
        case None if counts.size < capacity =>
          counts.update(v, inc)
          heap.enqueue((inc, v))
        case None =>
          var top = heap.dequeue()
          while (!counts.get(top._2).contains(top._1)) top = heap.dequeue()
          counts.remove(top._2)
          counts.update(v, top._1 + inc) // inherit the evicted count
          heap.enqueue((top._1 + inc, v))
      }
      compact(capacity)
    }

    /** Rebuild the heap after deserialization (counts restored first). */
    def reheap(): Unit =
      counts.foreach { case (k, c) => heap.enqueue((c, k)) }
  }
}

case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving.Buffer] {

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

  override def createAggregationBuffer(): SpaceSaving.Buffer =
    new SpaceSaving.Buffer

  override def update(buf: SpaceSaving.Buffer,
                      input: InternalRow): SpaceSaving.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(capacity, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: SpaceSaving.Buffer,
                     other: SpaceSaving.Buffer): SpaceSaving.Buffer = {
    other.counts.toSeq.sortBy { case (k, c) => (-c, k) }
      .foreach { case (k, c) => buf.offer(capacity, k, c) }
    buf
  }

  override def eval(buf: SpaceSaving.Buffer): Any = {
    val sorted = buf.counts.toSeq.sortBy { case (k, c) => (-c, k) }
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(sorted.map(_._2).toArray[Any]))
  }

  override def serialize(buf: SpaceSaving.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSaving.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new SpaceSaving.Buffer
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.counts.update(new String(b, "UTF-8"), in.readLong())
    }
    buf.reheap()
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
