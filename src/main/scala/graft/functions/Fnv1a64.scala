package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit rolling hash as a native Catalyst expression with
  * whole-stage codegen — the engine's document-fingerprint primitive
  * (SURVEY §2.12 flags a custom fingerprint expression as the one
  * worthwhile Catalyst extension; built-ins cover everything else).
  *
  * A byte-at-a-time rolling hash (unlike the block-based xxhash64
  * built-in) is the building block for rolling-window content chunking
  * (Rabin-style content-defined boundaries) used by dedup pipelines.
  * `doGenCode` emits the tight loop inline so the hot path stays inside
  * WholeStageCodegen — no UDF/serialization boundary.
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a64"

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Fnv1a64.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

object Fnv1a64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  /** Referenced from generated code — must stay public + static-like. */
  def hash(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  /** Column API (via [[org.apache.spark.sql.GraftColumnBridge]]). */
  def fnv1a64(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Fnv1a64(GraftColumnBridge.expression(c)))
  }
}
