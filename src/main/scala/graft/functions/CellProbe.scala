package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native twins of the IVF cell-selection HOF folds — `assign`'s
  * argmax-cosine ([[NearestCell]]) and `probeAssign`'s top-nprobe sort
  * ([[ProbeCells]]) — bit-identical to the interpreted forms and
  * parity-pinned over the corpus in SimilaritySpec.
  *
  * Semantics replicated exactly (each is an observed behavior of the
  * HOF, pinned before this was written):
  *   - csim_j = round9(dot(x, c_j) / (‖x‖·‖c_j‖)) with the dot and the
  *     norm as left-to-right IEEE double folds and round9 the
  *     cast-decimal(20,12)→round(9,HALF_UP)→double chain; a null-able
  *     case (dim mismatch, null element, NaN/∞ from a zero vector)
  *     makes csim_j NULL in the HOF — the NaN sentinel here;
  *   - [[NearestCell]]: fold ascending centroid_id with strict `>`
  *     (lowest-id winner on ties); if every csim is null it raises
  *     `assign: no centroid matched` exactly like the HOF's −1
  *     sentinel guard;
  *   - [[ProbeCells]]: ascending sort of `struct(−csim, cid)` puts
  *     NULL csims FIRST (Spark's nulls-first field ordering — the
  *     dim-mismatch case emits the nprobe LOWEST cids, it does NOT
  *     raise), then real csims by (csim desc, cid asc); the first
  *     nprobe ids are the probes.
  *
  * Why native: the HOF folds evaluate interpreted per (row × centroid)
  * with boxed structs and zipped arrays — the dominant per-row cost of
  * every assign/probe pass (centroid training, the kNN-graph build,
  * IVF serving, SemDeDup). At 100 TB `assign` runs once per corpus row;
  * ~170 µs/row interpreted vs ~2 µs fused is the difference between a
  * feasible and an infeasible backfill. Centroids ride as
  * reference-object plan data, not literal trees.
  */
object CellProbe {

  /** Left-to-right x·v, NaN when the HOF's zip would null (length
    * mismatch or null element). */
  private def dotOrNaN(emb: ArrayData, isFloat: Boolean,
                       v: Array[Double]): Double = {
    if (emb.numElements() != v.length) return Double.NaN
    var s = 0.0
    var i = 0
    while (i < v.length) {
      if (emb.isNullAt(i)) return Double.NaN
      val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      s += x * v(i)
      i += 1
    }
    s
  }

  /** ‖x‖ as sqrt of the same sequential self-dot the `norm` column
    * computes. NaN propagates the null cases. */
  private def normOrNaN(emb: ArrayData, isFloat: Boolean): Double = {
    val n = emb.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (emb.isNullAt(i)) return Double.NaN
      val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  /** All rounded csims for one row; NaN marks the HOF's null. */
  def csims(emb: ArrayData, isFloat: Boolean,
            cvecs: Array[Array[Double]], cnorms: Array[Double]): Array[Double] = {
    val out = new Array[Double](cvecs.length)
    if (emb == null) {
      java.util.Arrays.fill(out, Double.NaN)
      return out
    }
    val nrm = normOrNaN(emb, isFloat)
    var j = 0
    while (j < cvecs.length) {
      out(j) = PqCodes.round9OrNaN(
        dotOrNaN(emb, isFloat, cvecs(j)) / (nrm * cnorms(j)))
      j += 1
    }
    out
  }

  def nearest(emb: ArrayData, isFloat: Boolean, cids: Array[Int],
              cvecs: Array[Array[Double]], cnorms: Array[Double]): Int = {
    val cs = csims(emb, isFloat, cvecs, cnorms)
    var best = -1
    var bestS = Double.NegativeInfinity
    var j = 0
    while (j < cs.length) {
      if (cs(j) > bestS) { best = cids(j); bestS = cs(j) }
      j += 1
    }
    if (best == -1)
      throw new org.apache.spark.SparkException(
        "assign: no centroid matched — embedding/centroid dim mismatch")
    best
  }

  def probes(emb: ArrayData, isFloat: Boolean, cids: Array[Int],
             cvecs: Array[Array[Double]], cnorms: Array[Double],
             nprobe: Int): ArrayData = {
    val cs = csims(emb, isFloat, cvecs, cnorms)
    val idx = Array.range(0, cs.length)
    // cids ascend in array order, so a STABLE sort on the csim key alone
    // reproduces the struct sort's (−csim asc, cid asc) with nulls-first
    val boxed = idx.sortWith { (a, b) =>
      val na = cs(a).isNaN
      val nb = cs(b).isNaN
      if (na != nb) na // null csims first
      else if (na) a < b // among nulls: cid asc
      else if (cs(a) != cs(b)) cs(a) > cs(b) // csim desc
      else a < b // tie: cid asc
    }
    val k = math.min(nprobe, boxed.length)
    val out = new Array[Int](k)
    var i = 0
    while (i < k) { out(i) = cids(boxed(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Column builders over the collected `(cid, cvec, ‖cvec‖)` literal
    * set (ascending cid — collectUpTo's contract). */
  def nearestCell(emb: Column, cents: Seq[(Int, Seq[Double], Double)]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NearestCell(GraftColumnBridge.expression(emb),
      cents.map(_._1).toIndexedSeq,
      cents.map(_._2.toIndexedSeq).toIndexedSeq,
      cents.map(_._3).toIndexedSeq))
  }

  def probeCells(emb: Column, cents: Seq[(Int, Seq[Double], Double)],
                 nprobe: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ProbeCells(GraftColumnBridge.expression(emb),
      cents.map(_._1).toIndexedSeq,
      cents.map(_._2.toIndexedSeq).toIndexedSeq,
      cents.map(_._3).toIndexedSeq, nprobe))
  }
}

sealed abstract class CellProbeExpr extends UnaryExpression {
  def cids: IndexedSeq[Int]
  def cvecs: IndexedSeq[IndexedSeq[Double]]
  def cnorms: IndexedSeq[Double]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  @transient protected lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient protected lazy val cidArr: Array[Int] = cids.toArray
  @transient protected lazy val vecArr: Array[Array[Double]] =
    cvecs.map(_.toArray).toArray
  @transient protected lazy val nrmArr: Array[Double] = cnorms.toArray
}

/** `assign`'s argmax fold: embedding → nearest centroid_id (raises when
  * nothing matches — see [[CellProbe]]).
  */
case class NearestCell(child: Expression, cids: IndexedSeq[Int],
                       cvecs: IndexedSeq[IndexedSeq[Double]],
                       cnorms: IndexedSeq[Double])
    extends CellProbeExpr {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_cell"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    CellProbe.nearest(child.eval(input).asInstanceOf[ArrayData], isFloat,
      cidArr, vecArr, nrmArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val cidsRef = ctx.addReferenceObj("cpCids", cidArr, "int[]")
    val vecsRef = ctx.addReferenceObj("cpVecs", vecArr, "double[][]")
    val nrmsRef = ctx.addReferenceObj("cpNorms", nrmArr, "double[]")
    val c = child.genCode(ctx)
    val isF = if (isFloat) "true" else "false"
    ev.copy(
      code = code"""
        |${c.code}
        |int ${ev.value} = graft.functions.CellProbe.nearest(
        |  ${c.isNull} ? null : ${c.value}, $isF, $cidsRef, $vecsRef, $nrmsRef);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/** `probeAssign`'s sorted top-nprobe: embedding → array of probe cell
  * ids (nulls-first mismatch semantics — see [[CellProbe]]).
  */
case class ProbeCells(child: Expression, cids: IndexedSeq[Int],
                      cvecs: IndexedSeq[IndexedSeq[Double]],
                      cnorms: IndexedSeq[Double], nprobe: Int)
    extends CellProbeExpr {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "probe_cells"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    CellProbe.probes(child.eval(input).asInstanceOf[ArrayData], isFloat,
      cidArr, vecArr, nrmArr, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val cidsRef = ctx.addReferenceObj("cpCids", cidArr, "int[]")
    val vecsRef = ctx.addReferenceObj("cpVecs", vecArr, "double[][]")
    val nrmsRef = ctx.addReferenceObj("cpNorms", nrmArr, "double[]")
    val c = child.genCode(ctx)
    val isF = if (isFloat) "true" else "false"
    ev.copy(
      code = code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.CellProbe.probes(
        |    ${c.isNull} ? null : ${c.value}, $isF, $cidsRef, $vecsRef,
        |    $nrmsRef, $nprobe);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeCells =
    copy(child = newChild)
}
