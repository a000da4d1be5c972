/* Bridge into Spark's private[sql] Column↔Expression converters.
 * Spark 4 moved `Column` to a backend-agnostic API (sql-api) backed by
 * ColumnNode; building a Column from a raw Catalyst Expression now goes
 * through `org.apache.spark.sql.classic.ExpressionUtils`, which is
 * private[sql] — so this one object lives in the org.apache.spark.sql
 * package to re-export the two functions the engine's custom
 * expressions need.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
