package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.Fnv1a64

/** Engine extension point (`SparkSessionExtensions`): registers the
  * custom expressions with the SQL function registry so the SQL front
  * door and the DataFrame API expose the same surface.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  * or  --conf spark.sql.extensions=graft.plans.GraftExtensions
  *
  * SURVEY §7.3 found no operator REQUIRING a custom planner strategy
  * (Spark's built-ins cover the reference's algebra), so this extension
  * registers functions only; `injectPlannerStrategy`/`injectRule` slots
  * are where an as-of join or similar would land if the surface grows.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "fnv1a64 expects one argument")
        Fnv1a64(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_sketch"),
      new ExpressionInfo(
        classOf[graft.functions.SpaceSavingTopK].getName, "topk_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "topk_sketch(col, capacity)")
        val capacity = args(1) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
          case _ => throw new IllegalArgumentException(
            "topk_sketch capacity must be a literal")
        }
        graft.functions.SpaceSavingTopK(args.head, capacity)
          .toAggregateExpression()
      }))
  }
}
