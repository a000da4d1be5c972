package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `m` PQ sub-codes of one embedding in ONE fused loop — the native
  * twin of [[Similarity]]'s per-subspace HOF argmin fold (`subCode`),
  * bit-identical by construction and kept honest by a parity spec over
  * the corpus:
  *
  *   - candidates scan in codebook ARRAY order (the collected literal is
  *     sorted ascending centroid_id) with strict `<`, so the lowest-id
  *     winner survives ties — the same tie-break as
  *     `ORDER BY d2 ASC, centroid_id ASC`;
  *   - the squared-L2 accumulates left-to-right in IEEE double (the
  *     zip_with/aggregate order), and each candidate distance rounds
  *     through decimal space exactly as `roundSim` does —
  *     `cast(double as decimal(20,12))` (shortest-decimal-string
  *     semantics = `BigDecimal.valueOf`, with precision-overflow → null)
  *     then `round(_, 9)` half-up, then back to double;
  *   - a candidate whose distance is NULL under the HOF (NaN/∞/overflow
  *     in decimal space) is skipped, and an embedding that yields no
  *     match anywhere (null input, null element, or a sub-slice shorter
  *     than the codebook's subvector) raises the same
  *     fail-loudly error instead of emitting a garbage code.
  *
  * Why native: the HOF form evaluates interpreted per (row × subspace ×
  * candidate) with a boxed struct allocation and an intermediate zipped
  * array per fold step — at sf1 the 8×16 fold tree IS ann_pq_adc's
  * measured cost (~170 µs/row). One helper call per row participates in
  * whole-stage codegen and runs the same arithmetic in a primitive loop.
  *
  * The codebook rides in the expression as plan DATA (structural-equality
  * Seqs, surfaced to codegen via `addReferenceObj`), not as a literal
  * tree — a 16×64-double literal in the plan is what made every
  * canonicalize/sameResult pass over these plans slow.
  */
case class PqCodes(child: Expression, cids: IndexedSeq[Int],
                   subvecs: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val cidArr: Array[Int] = cids.toArray
  @transient private lazy val vecArr: Array[Array[Array[Double]]] =
    subvecs.map(_.map(_.toArray).toArray).toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    PqCodes.compute(v.asInstanceOf[ArrayData], isFloat, cidArr, vecArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val cidsRef = ctx.addReferenceObj("pqCids", cidArr, "int[]")
    val vecsRef = ctx.addReferenceObj("pqSubvecs", vecArr, "double[][][]")
    val c = child.genCode(ctx)
    val isF = if (isFloat) "true" else "false"
    ev.copy(
      code = code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.PqCodes.compute(
        |    ${c.isNull} ? null : ${c.value}, $isF, $cidsRef, $vecsRef);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {

  /** `roundSim` in JVM form: cast(double → decimal(20,12)) → round(9,
    * HALF_UP) → double. Returns NaN as the "decimal NULL" sentinel
    * (NaN/∞ and precision-20 overflow all cast to NULL in the HOF) —
    * callers must treat NaN as a skipped candidate, exactly as
    * `when(null < acc) … otherwise(acc)` does.
    */
  def round9OrNaN(d: Double): Double = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      return Double.NaN
    val scaled = java.math.BigDecimal.valueOf(d)
      .setScale(12, RoundingMode.HALF_UP)
    if (scaled.precision() > 20) return Double.NaN
    scaled.setScale(9, RoundingMode.HALF_UP).doubleValue()
  }

  private def fail(): Nothing =
    throw new org.apache.spark.SparkException(
      "pqEncode: no codebook match — embedding/codebook dim mismatch")

  /** One row's full code array. `emb == null`, a null element inside a
    * consumed slice, or a short slice all end in the HOF's raise (every
    * candidate distance is null there → the −1 sentinel survives).
    */
  def compute(emb: ArrayData, isFloat: Boolean, cids: Array[Int],
              subvecs: Array[Array[Array[Double]]]): ArrayData = {
    if (emb == null) fail()
    val m = subvecs.length
    val out = new Array[Int](m)
    val n = emb.numElements()
    var s = 0
    while (s < m) {
      val cands = subvecs(s)
      val sub = cands(0).length
      val off = s * sub
      // a slice shorter than the subvector zips against null padding →
      // every candidate null → raise (and the HOF also raises when the
      // EMBEDDING side is longer than the zipped codebook subvector —
      // that cannot happen here because the slice length is exactly sub)
      if (off + sub > n) fail()
      var best = -1
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < cands.length) {
        val cv = cands(j)
        var acc = 0.0
        var i = 0
        var nullSeen = false
        while (i < sub && !nullSeen) {
          if (emb.isNullAt(off + i)) nullSeen = true
          else {
            val x = if (isFloat) emb.getFloat(off + i).toDouble
                    else emb.getDouble(off + i)
            val dlt = x - cv(i)
            acc += dlt * dlt
          }
          i += 1
        }
        if (!nullSeen) {
          val d2 = round9OrNaN(acc)
          // NaN sentinel: `d2 < bestD` is false for NaN, which IS the
          // HOF's null-comparison skip
          if (d2 < bestD) { best = cids(j); bestD = d2 }
        }
        j += 1
      }
      if (best == -1) fail()
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  def pqCodes(emb: Column, cents: Seq[(Int, Seq[Double])], m: Int): Column = {
    require(cents.nonEmpty, "pqCodes: empty codebook")
    val dim = cents.head._2.length
    require(dim % m == 0, s"pqCodes: dim $dim not divisible by m=$m")
    val sub = dim / m
    val cids = cents.map(_._1).toIndexedSeq
    val sv: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
      (0 until m).map { s =>
        cents.map(_._2.slice(s * sub, (s + 1) * sub).toIndexedSeq).toIndexedSeq
      }
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      PqCodes(GraftColumnBridge.expression(emb), cids, sv))
  }
}
