package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of semantics: latest prior (inclusive), nulls before first") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)).toDF("k", "qts", "px")
    val trades = Seq(
      (101L, 1L, ts("2024-01-01 09:59:00")),  // before first quote -> null
      (102L, 1L, ts("2024-01-01 10:00:00")),  // tie -> inclusive
      (103L, 1L, ts("2024-01-01 10:30:00")),  // between -> 100
      (104L, 1L, ts("2024-01-01 12:00:00")),  // after both -> 110
      (105L, 2L, ts("2024-01-01 11:00:00")),  // other key -> 200
      (106L, 3L, ts("2024-01-01 11:00:00")))  // unseen key -> null
      .toDF("trade_id", "k", "tts")
    val out = AsOfJoin.asof(trades, quotes, "k", "tts", "qts",
      Map("px" -> "last_px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out == Map(
      101L -> None, 102L -> Some(100.0), 103L -> Some(100.0),
      104L -> Some(110.0), 105L -> Some(200.0), 106L -> None))
  }

  test("a matched right row with NULL value wins over an older non-null") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0)),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[Double])).toDF("k", "qts", "px")
    val trades = Seq((1L, 1L, ts("2024-01-01 12:00:00"))).toDF("trade_id", "k", "tts")
    val out = AsOfJoin.asof(trades, quotes, "k", "tts", "qts", Map("px" -> "last_px"))
      .collect()
    assert(out.head.isNullAt(3),
      "the 11:00 NULL-valued row is the as-of match; 100.0 must not leak")
  }

  test("NULL join keys match nothing (equality-join semantics)") {
    val quotes = Seq((Option.empty[java.lang.Long], ts("2024-01-01 09:00:00"), 7.0))
      .toDF("k", "qts", "px")
    val trades = Seq((201L, Option.empty[java.lang.Long], ts("2024-01-01 10:00:00")))
      .toDF("trade_id", "k", "tts")
    val out = AsOfJoin.asof(trades, quotes, "k", "tts", "qts", Map("px" -> "last_px"))
      .collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("left columns and row count are preserved exactly") {
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "rts", "v")
    val left = Seq(
      (1L, ts("2024-01-02 00:00:00"), "a"),
      (1L, ts("2024-01-03 00:00:00"), "b"),
      (9L, ts("2024-01-02 00:00:00"), "c")).toDF("k", "lts", "tag")
    val out = AsOfJoin.asof(left, right, "k", "lts", "rts", Map("v" -> "rv"))
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("k", "lts", "tag", "rv"))
  }
}
