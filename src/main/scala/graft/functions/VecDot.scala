package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric arrays — bit-identical to the
  * HOF form `aggregate(zip_with(a, b, (x, y) => x.cast(double) *
  * y.cast(double)), 0.0, _ + _)` (same left-to-right accumulation
  * order, same widening casts — float→double widening is exact, and
  * IEEE addition order is preserved), at a fraction of its cost: the
  * HOF pair evaluates interpreted per element with boxing plus an
  * intermediate zipped array, while this is one fused primitive loop
  * that participates in whole-stage codegen. At 6M candidate pairs ×
  * 64 dims (the k-NN graph at sf0.1) the HOF form IS the query's cost.
  *
  * Null semantics match the HOF exactly: a length mismatch (zip_with
  * pads the shorter side with null) or any null element produces a
  * null product which poisons the fold's sum → result null. Callers
  * that must fail loudly on dim mismatch keep their explicit guards
  * (assign/probeAssign raise on the null/−1 sentinel).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(et, _) => VecDot.getters.contains(et)
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of numeric elements, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val ga = VecDot.getters(elemType(left))
    val gb = VecDot.getters(elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += ga(a, i) * gb(b, i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def access(t: DataType, v: String, i: String): String = t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case DoubleType => s"$v.getDouble($i)"
      case IntegerType => s"(double) $v.getInt($i)"
      case LongType => s"(double) $v.getLong($i)"
      case ShortType => s"(double) $v.getShort($i)"
      case ByteType => s"(double) $v.getByte($i)"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    val lt = elemType(left)
    val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${access(lt, a, i)} * ${access(rt, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  private[functions] val getters: Map[DataType, (ArrayData, Int) => Double] =
    Map(
      FloatType -> ((a, i) => a.getFloat(i).toDouble),
      DoubleType -> ((a, i) => a.getDouble(i)),
      IntegerType -> ((a, i) => a.getInt(i).toDouble),
      LongType -> ((a, i) => a.getLong(i).toDouble),
      ShortType -> ((a, i) => a.getShort(i).toDouble),
      ByteType -> ((a, i) => a.getByte(i).toDouble))

  def vecDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
