package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with
  * `rightTs <= leftTs` in the same key group (inclusive, matching
  * DuckDB/kdb semantics). Spark has no built-in as-of join; the naive
  * rewrite (range join + rank) explodes to O(|matches|) pairs.
  *
  * This is the scalable composition (SURVEY preference (a) — compose
  * built-ins before custom planner work): tag both sides, union, sort
  * each key group by (ts, side) once, and carry the latest right-side
  * values forward with `last(..., ignoreNulls)` over an unbounded-
  * preceding frame. One shuffle + one sort, no pair blow-up; exactly
  * the pattern a custom SparkPlan would implement internally.
  *
  * Ties: a right row at ts == left ts IS visible to that left row
  * (side tag orders right rows first within a timestamp). Right rows
  * should be unique per (key, ts); pre-aggregate if not.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry, source → output name
    *                  (output names must not collide with left columns).
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           valueCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = valueCols.values.toSeq
    require(carried.intersect(leftCols).isEmpty,
      "carried output names must not collide with left columns")
    // the union/window plumbing owns these names — an input frame
    // carrying one of them would silently corrupt results (duplicate or
    // ambiguous internal columns), so fail fast instead
    val reserved = Seq("__ts", "__side", "__r", "__m")
    require(leftCols.intersect(reserved).isEmpty,
      s"left columns must not use reserved names ${reserved.mkString(", ")}")
    require(carried.intersect(reserved).isEmpty,
      s"carried output names must not use reserved names ${reserved.mkString(", ")}")

    // The carried payload travels inside ONE struct column: last() with
    // ignoreNulls then means "latest right ROW" (null only on left
    // rows), so a matched right row whose VALUE is legitimately NULL
    // still wins — carrying bare value columns would skip it and
    // resurrect an older value.
    val payload = struct(
      valueCols.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)
    val rTagged = right.select(
      col(key) +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        payload.as("__r") +: Nil: _*)
    val payloadType = rTagged.schema("__r").dataType
    val rAligned = rTagged.select(
      leftCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__ts") :+ col("__side") :+ col("__r"): _*)
    val lAligned = left.select(
      leftCols.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(payloadType).as("__r"): _*)

    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lAligned.unionByName(rAligned)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      // equality-join as-of semantics: a NULL key matches nothing
      .select(leftCols.map(col) ++ carried.map(c =>
        when(col(key).isNotNull, col(s"__m.$c")).as(c)): _*)
  }
}
