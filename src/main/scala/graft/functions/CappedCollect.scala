package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `collect_list` with a HARD per-group buffer cap — the bucket-
  * pigeonhole companion: [[graft.functions.Dedup.winnowPairs]]-style
  * pair generators collect each fingerprint's posting list and then
  * DISCARD any bucket whose document frequency exceeds a small `maxDf`
  * (boilerplate fingerprints are worthless containment evidence and
  * quadratic join fuel). Spark's `collect_list` still materializes the
  * FULL posting array in the aggregation buffer before that filter
  * runs — a fingerprint shared by a large fraction of the corpus
  * accumulates an unbounded array (skew/OOM at scale) only to be
  * thrown away.
  *
  * This aggregate collects AT MOST `cap` values and silently drops the
  * rest, so every buffer — update, merge, serialize — is O(cap).
  * Callers pass `cap = maxDf + 1`: a group whose true df ≤ maxDf is
  * collected COMPLETELY (output identical to `collect_list`), and an
  * overflowing group surfaces as an array of exactly `cap` elements —
  * `size(ds) > maxDf`, which the existing
  * `filter(size(ds).between(2, maxDf))` discards just as it discarded
  * the full array. Which cap elements survive an overflow is
  * plan-dependent, but overflow groups are discarded by contract, so
  * the nondeterminism is unobservable.
  *
  * 100 TB posture: this turns the pair generators' worst-case memory
  * per aggregation state from O(corpus) (one viral fingerprint) to
  * O(maxDf) — the difference between an executor OOM and a no-op.
  */
case class CappedLongList(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "capped_long_list"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    new ArrayBuffer[Long](math.min(cap, 16))

  override def update(buf: ArrayBuffer[Long],
                      input: InternalRow): ArrayBuffer[Long] = {
    if (buf.length < cap) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Long],
                     other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    val take = math.min(cap - buf.length, other.length)
    var i = 0
    while (i < take) { buf += other(i); i += 1 }
    buf
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray[Long])

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(8 * buf.length + 4)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[Long](n)
    (0 until n).foreach(_ => buf += in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedLongList =
    copy(child = newChildren.head)
}

object CappedCollect {
  /** Column API: `cappedLongList(col("doc_id"), maxDf + 1)` →
    * array<bigint> of at most `cap` collected values.
    */
  def cappedLongList(c: Column, cap: Int): Column =
    GraftColumnBridge.column(
      CappedLongList(GraftColumnBridge.expression(c), cap)
        .toAggregateExpression())
}
