package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV ("k minimum values") distinct-value sketch as a native
  * `TypedImperativeAggregate` — the mergeable set-cardinality sketch
  * behind Theta-sketch set algebra (Bar-Yossef et al. 2002; Beyer et
  * al. 2007): keep the k SMALLEST hash values ever seen; the k-th
  * smallest, read as a fraction θ of the hash space, estimates the
  * distinct count as (k−1)/θ, and because the state is just a sorted
  * set of hashes, sketches of different sets compose — union = k
  * smallest of the concatenation, intersection via the inclusion test
  * on the union's members — which plain `approx_count_distinct` (HLL)
  * cannot do for intersections.
  *
  * The aggregate keeps O(k) state per group, merges map-side like any
  * declarative aggregate (partial sketches combine associatively and
  * order-independently — a sorted SET, so duplicate hashes collapse and
  * arrival order is irrelevant), and returns the sorted hash array for
  * in-plan estimator math. With k ≥ |distinct| the sketch holds every
  * hash and the estimators below degrade to EXACT counts.
  *
  * The hash is supplied by the CALLER as a plain long column (the gate
  * derives it from an md5 prefix so the DuckDB oracle re-derives the
  * identical sketch relationally); the aggregate itself is
  * hash-agnostic. At 100 TB: one pass, k longs per (group × partition)
  * of exchange, no distinct-grain shuffle of the corpus.
  */
object Kmv {

  /** Sketch state: a bounded sorted set of the k smallest longs.
    * `TreeSet` gives O(log k) insert/evict; eviction drops the MAX the
    * moment size exceeds k, so memory is O(k) at all times.
    */
  final class Buffer(val k: Int) {
    val set: mutable.TreeSet[Long] = mutable.TreeSet.empty
    def offer(h: Long): Unit = {
      // skip values already above the current k-th smallest
      if (set.size < k) { set.add(h); () }
      else if (h < set.last) { if (set.add(h)) { set.remove(set.last); () } }
    }
  }
}

case class KmvSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buffer] {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long hash column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Kmv.Buffer = new Kmv.Buffer(k)

  override def update(buf: Kmv.Buffer, input: InternalRow): Kmv.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Kmv.Buffer, other: Kmv.Buffer): Kmv.Buffer = {
    other.set.foreach(buf.offer)
    buf
  }

  /** Sorted ascending — element k−1 (if present) is θ. */
  override def eval(buf: Kmv.Buffer): Any =
    new GenericArrayData(buf.set.toArray[Any])

  override def serialize(buf: Kmv.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.set.size)
    buf.set.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Kmv.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Kmv.Buffer(k)
    (0 until n).foreach(_ => buf.offer(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** Column API: `kmvSketch(col("h"), 128)` → array<long> (sorted k
    * smallest distinct hashes).
    */
  def kmvSketch(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvSketch(GraftColumnBridge.expression(c), k)
        .toAggregateExpression())
}

/** Audience-overlap report built on [[KmvSketch]]: for every pair of
  * event types, the exact AND sketch-estimated size of the
  * union/intersection of their active-user sets ("active in T" = ≥
  * `minEvents` events of type T). This is the Theta-sketch workflow a
  * 100 TB event store runs daily — per-segment sketches are small
  * (k longs), persist, and answer ANY pairwise overlap later without
  * re-reading events — and the exact columns beside the estimates are
  * the gate's proof both engines derive the identical sketch and the
  * identical estimator arithmetic.
  *
  * Estimator (Beyer et al. 2007), over 48-bit hashes (12 md5 hex
  * chars — BIGINT-exact on both engines, q_dp_noise's idiom):
  *   θ        = k-th smallest hash of the pair's hash union
  *   est_U    = (k−1)·2⁴⁸/θ when the union sketch is full, else the
  *              (exact) member count
  *   est_J    = |both-set members of the union sketch| / |union sketch|
  *   est_I    = est_J · est_U
  * Every double op is +,·,/ over integer-exact operands, mirrored
  * operand-for-operand in the DuckDB twin — no libm, no decimal round,
  * so raw doubles compare bit-identically.
  *
  * Shape: one (type,user)-grain count shuffle, one type-grain sketch
  * aggregate (map-side partial sketches, k longs each), a user-grain
  * self-join for the exact intersection (each user fans out ≤ |types|²
  * rows), and all estimator math on a |types|²-row broadcast-joined
  * frame. Nothing downstream of the first aggregate scales with the
  * corpus.
  */
object KmvOverlap {
  import org.apache.spark.sql.{DataFrame, functions => F}
  import F._

  /** The shared Theta-style estimator arithmetic: given a frame with
    * two sketch columns `ska`/`skb` (sorted KMV hash arrays over the
    * same 48-bit hash space), appends
    *
    *   - `m_size`      — size of the merged (union) sketch, capped at k
    *   - `est_union`   — (k−1)·2⁴⁸/θ when the union sketch is full,
    *                     else the exact member count
    *   - `est_jaccard` — both-sides fraction of the union sketch
    *   - `est_inter`   — est_jaccard · est_union
    *
    * Every double op is +,·,/ over integer-exact operands (the
    * bit-portability contract the DuckDB twins mirror). Exposed so any
    * two PERSISTED sketches — different tables, different days,
    * different pipelines — can be composed without re-reading data:
    * the set-algebra capability that distinguishes KMV/Theta from HLL.
    */
  def withEstimates(df: DataFrame, k: Int): DataFrame = {
    val merged = array_sort(array_distinct(concat(col("ska"), col("skb"))))
    df.withColumn("mg", merged)
      .withColumn("m", slice(col("mg"), 1, k))
      .withColumn("m_size", least(size(col("mg")), lit(k)))
      .withColumn("est_union",
        when(size(col("mg")) >= k,
          (lit((k - 1).toDouble) * lit(281474976710656.0))
            / element_at(col("m"), -1).cast("double"))
          .otherwise(size(col("mg")).cast("double")))
      .withColumn("i_cnt", size(filter(col("m"),
        x => array_contains(col("ska"), x) && array_contains(col("skb"), x))))
      .withColumn("est_jaccard",
        col("i_cnt").cast("double") / col("m_size").cast("double"))
      .withColumn("est_inter", col("est_jaccard") * col("est_union"))
      .drop("mg", "m", "i_cnt")
  }

  def audienceOverlap(events: DataFrame, k: Int = 128,
                      minEvents: Int = 14): DataFrame = {
    // (type, user)-grain audience frame: consumed by the sketch agg,
    // BOTH crossBroadcast sides of the pair expansion, and both legs of
    // the exact-intersection self-join — uncached that is 4+ full fact
    // aggregations per call. Memoized (audience grain is bounded by
    // |users|·|types|, far below the fact), size-gated on the event
    // scan like every corpus-adjacent memo.
    val membersPlan = events.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_ev"))
      .filter(col("n_ev") >= minEvents)
      .select("event_type", "user_id")
    val members =
      if (events.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30))
        graft.core.PlanMemo.cached("kmv.audienceMembers", membersPlan)
      else membersPlan
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 12),
      16, 10).cast("long")
    // members is (type,user)-distinct by construction, so the count IS
    // the exact distinct-user cardinality
    val sk = members.select(col("event_type"), h.as("h"))
      .groupBy("event_type")
      .agg(KmvSketch.kmvSketch(col("h"), k).as("sk"),
        count(lit(1)).as("n_exact"))
    val a = sk.select(col("event_type").as("type_a"), col("sk").as("ska"),
      col("n_exact").as("n_a"))
    val b = sk.select(col("event_type").as("type_b"), col("sk").as("skb"),
      col("n_exact").as("n_b"))
    val pairs = graft.core.Scalars.crossBroadcast(a, b)
      .filter(col("type_a") < col("type_b"))
    val inter = members.select(col("event_type").as("type_a"),
        col("user_id"))
      .join(members.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_inter"))
    val est = withEstimates(pairs
      .join(inter, Seq("type_a", "type_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L))), k)
    est.select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
      (col("n_a") + col("n_b") - col("n_inter")).as("n_union"),
      col("n_inter"), col("m_size"), col("est_union"), col("est_inter"),
      col("est_jaccard"))
  }
}
