package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly agg equals the batch twin") {
    val batch = EventsStream.hourlyAggBatch(Tables.events(spark, TestSpark.sf))
    val stream = EventsStream.hourlyAggStreaming(spark, TestSpark.sf,
      "spec_hourly")
    assert(stream.count() == batch.count())
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }

  test("stateful sessionizer agrees with the batch sessionizer") {
    val events = Tables.events(spark, TestSpark.sf)
    val batch = EventsStream.sessionizeBatch(events)
      .select(col("user_id"), col("session_idx").cast("long"),
        col("n_events"))
      .as[(Long, Long, Long)].collect().toSet

    val evs = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsUs"))
      .as[EventsStream.Ev]
      .orderBy("user_id", "tsUs", "event_id")
    // run the stateful function in one batch per user; closed sessions
    // must match the batch result minus each user's final open session
    val stateful = EventsStream.sessionizeStateful(spark, evs)
      .collect().map(s => (s.user_id, s.session_idx, s.n_events)).toSet
    val lastPerUser = batch.groupBy(_._1).map { case (u, ss) =>
      ss.maxBy(_._2)
    }.toSet
    assert(stateful == batch -- lastPerUser,
      "closed sessions identical; open tail sessions withheld by state")
  }

  test("sessionizer splits on gaps > 30 minutes") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    val ev = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(10)), (1L, 3L, ts(50)),
      (2L, 4L, ts(0))).toDF("user_id", "event_id", "ts")
    val out = EventsStream.sessionizeBatch(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 1L) -> 2L, (1L, 2L) -> 1L, (2L, 1L) -> 1L))
  }
}
