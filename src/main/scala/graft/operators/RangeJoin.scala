package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: points joined to the intervals containing
  * them. Spark plans a raw `p >= s && p <= e` condition as a broadcast
  * nested loop (O(|points|·|intervals|)); the banded form buckets time
  * into fixed-width bands, explodes each interval across the bands it
  * overlaps, equi-joins on band, and keeps the residual containment
  * predicate — O(|points| + |interval-bands| + |matches|), the same
  * strategy Databricks' range-join optimization applies internally.
  *
  * Band width should approximate the typical interval length: too small
  * multiplies interval replication, too large packs unrelated rows into
  * a band. Both sides shuffle on the band key only.
  */
object RangeJoin {

  /** @param bandWidth in the units of the point/bound columns
    *                  (e.g. days for date-epochs, seconds for epochs).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bandWidth: Long): DataFrame = {
    def band(c: Column): Column = floor(c / bandWidth).cast("long")
    val p = points.withColumn("__band", band(col(pointCol)))
    val iv = intervals.withColumn("__band",
      explode(sequence(band(col(startCol)), band(col(endCol)))))
    p.join(iv, Seq("__band"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__band")
  }
}
