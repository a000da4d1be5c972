package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the r14 day-grain aggregate form of the range join to the
  * pair-enumerating banded form it replaced on q_range_join: for
  * associative-commutative aggregates the two must be bit-identical,
  * including every containment boundary (point exactly at an interval
  * start/end, one past either bound, overlapping intervals sharing
  * points, an interval containing nothing).
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aggregatePointsByInterval == pointInInterval + groupBy, " +
    "boundaries included") {
    // points at epochs 0..40 with deliberately colliding values; ids
    // chosen so sum/min/max differ when any boundary row is mis-binned
    val points = Seq(
      (1000L, 0L), (1001L, 5L), (1002L, 10L), (1003L, 10L),
      (1004L, 11L), (1005L, 14L), (1006L, 15L), (1007L, 20L),
      (1008L, 24L), (1009L, 25L), (1010L, 26L), (1011L, 40L))
      .toDF("point_order", "p_epoch")
    // intervals: [0,14] (closed ends), [10,24] (overlaps), [25,25]
    // (single-grain), [27,39] (contains nothing), [40,54] (one point
    // exactly at start)
    val intervals = Seq(
      (1L, 0L, 14L), (2L, 10L, 24L), (3L, 25L, 25L),
      (4L, 27L, 39L), (5L, 40L, 54L))
      .toDF("interval_id", "s_epoch", "e_epoch")

    val P = lit(97L) // small modulus so the ssq column exercises wraps
    def ssqTerm = (col("point_order") % P) * (col("point_order") % P) % P

    val pairForm = RangeJoin.pointInInterval(points, intervals,
        "p_epoch", "s_epoch", "e_epoch", bandWidth = 14L)
      .groupBy("interval_id")
      .agg(count(lit(1)).as("n"), min("point_order").as("mn"),
        max("point_order").as("mx"), sum("point_order").as("sm"),
        sum(ssqTerm).as("ssq"))
      .orderBy("interval_id")

    val aggForm = RangeJoin.aggregatePointsByInterval(points, intervals,
        "p_epoch", "s_epoch", "e_epoch", "interval_id",
        partials = Seq(count(lit(1)).as("pc"),
          min("point_order").as("pmin"), max("point_order").as("pmax"),
          sum("point_order").as("psum"), sum(ssqTerm).as("pssq")),
        combines = Seq(coalesce(sum("pc"), lit(0L)).as("n"), min("pmin").as("mn"),
          max("pmax").as("mx"), sum("psum").as("sm"),
          sum("pssq").as("ssq")))
      .orderBy("interval_id")

    val a = pairForm.collect().map(_.toSeq).toSeq
    val b = aggForm.collect().map(_.toSeq).toSeq
    assert(a == b)
    // the empty interval is absent from BOTH (inner semantics)
    assert(!a.exists(_.head == 4L) && a.size == 4)
    // sanity: schema (names and types) identical too
    assert(pairForm.schema == aggForm.schema)
  }

  test("inverted interval (end < start) contains nothing in both forms") {
    // sequence(20, 10) would auto-step -1 and yield a DESCENDING range;
    // containment semantics say an inverted interval holds no points.
    val points = Seq((1L, 12L), (2L, 15L), (3L, 20L), (4L, 10L))
      .toDF("point_order", "p_epoch")
    val intervals = Seq(
      (1L, 20L, 10L),  // inverted: must match nothing
      (2L, 10L, 15L))  // sane twin sharing the span
      .toDF("interval_id", "s_epoch", "e_epoch")
    val pairForm = RangeJoin.pointInInterval(points, intervals,
        "p_epoch", "s_epoch", "e_epoch", bandWidth = 5L)
      .groupBy("interval_id").agg(count(lit(1)).as("n"))
    val aggForm = RangeJoin.aggregatePointsByInterval(points, intervals,
        "p_epoch", "s_epoch", "e_epoch", "interval_id",
        partials = Seq(count(lit(1)).as("pc")),
        combines = Seq(coalesce(sum("pc"), lit(0L)).as("n")))
    val a = pairForm.orderBy("interval_id").collect().map(_.toSeq).toSeq
    val b = aggForm.orderBy("interval_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    // only the sane interval survives, holding points 10/12/15
    assert(a == Seq(Seq(2L, 3L)))
  }
}
