package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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

  test("stream-stream interval join equals the batch twin") {
    val batch = EventsStream.clickPurchaseBatch(
      Tables.events(spark, TestSpark.sf))
    val stream = EventsStream.clickPurchaseStreaming(spark, TestSpark.sf,
      "spec_cpjoin")
    assert(stream.count() == batch.count())
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
    // the band is directional: every purchase follows its click
    assert(stream.filter(col("purchase_ts") < col("click_ts")).isEmpty)
  }

  test("left-outer stream-stream join: inner rows + watermark-gated null pads") {
    val events = Tables.events(spark, TestSpark.sf)
    val inner = EventsStream.clickPurchaseBatch(events)
    val stream = EventsStream.clickPurchaseLeftStreaming(spark, TestSpark.sf,
      "spec_cpleft").cache()
    val matched = stream.filter(col("purchase_id").isNotNull)
    // the matched slice IS the inner join — outer-ness adds rows, never
    // changes them
    assert(matched.count() == inner.count())
    assert(matched.except(inner).isEmpty && inner.except(matched).isEmpty)
    // null pads: every one is a genuinely unmatched click whose match
    // window closed before the terminal watermark (predicate pinned by
    // ProfLeftJoin --micro: wm = floor_ms(min of stream maxes) - 10min,
    // eviction at click_ts + 1h + 1ms <= wm)
    val pads = stream.filter(col("purchase_id").isNull).cache()
    assert(pads.count() > 0, "corpus must exercise the eviction path")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
    val unmatched = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      "left_anti")
    val maxClick = clicks.agg(max("click_ts")).collect()(0).getTimestamp(0)
    val maxPurch = purchases.agg(max("purchase_ts")).collect()(0)
      .getTimestamp(0)
    val wmMs = math.min(maxClick.getTime, maxPurch.getTime) - 600000L
    val expected = unmatched.filter(
      unix_micros(col("click_ts")) + 3600000000L + 1000L <= wmMs * 1000L)
    assert(pads.select("click_id").except(expected.select("click_id")).isEmpty
      && expected.select("click_id").except(pads.select("click_id")).isEmpty,
      "null-pad set == unmatched clicks evicted by the terminal watermark")
  }

  test("chained stateful aggs: daily-of-hourly equals the gated batch rollup") {
    val events = Tables.events(spark, TestSpark.sf)
    val stream = EventsStream.dailyOfHourlyStreaming(spark, TestSpark.sf,
      "spec_chained").cache()
    assert(stream.count() > 0)
    // batch twin: daily rollup of hourly counts, gated on
    // day_end <= terminal watermark (floor_ms(max ts) - 10 min)
    val maxTs = events.agg(max("ts")).collect()(0).getTimestamp(0)
    val wmMs = maxTs.getTime - 600000L
    val hourly = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val gated = hourly
      .groupBy(window(col("w.start"), "1 day").as("d"), col("event_type"))
      .agg(sum("n_events").as("n_events"),
        max("n_events").as("max_hourly"), count(lit(1)).as("n_hours"))
      .filter(unix_micros(col("d.end")) <= wmMs * 1000L)
      .select(col("d.start").as("day_start"), col("event_type"),
        col("n_events"), col("max_hourly"), col("n_hours"))
    assert(stream.exceptAll(gated).isEmpty && gated.exceptAll(stream).isEmpty,
      "chained streaming output == batch daily rollup of complete days")
    // the incomplete tail day is withheld, not emitted partially
    val lastEmitted = stream.agg(max("day_start")).collect()(0)
      .getTimestamp(0)
    assert(lastEmitted.getTime + 86400000L <= wmMs)
  }

  test("stream-static enrichment equals the batch twin, stateless plan") {
    val batch = EventsStream.enrichBatch(
      Tables.events(spark, TestSpark.sf), Tables.customer(spark, TestSpark.sf))
    val stream = EventsStream.enrichStreaming(spark, TestSpark.sf,
      "spec_enrich")
    assert(stream.count() == batch.count())
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
    // left join: both enriched hits and null-padded misses are present
    assert(stream.filter(col("c_name").isNull).count() > 0)
    assert(stream.filter(col("c_name").isNotNull).count() > 0)
  }

  test("stateful streaming is state-store-provider agnostic (RocksDB)") {
    // the 100 TB posture behind this pin: the default HDFS-backed store
    // keeps every key's state on the executor HEAP, so key cardinality
    // is bounded by executor memory; the in-box RocksDB provider spills
    // state to local disk and is the production config for large keyed
    // state. Results must be IDENTICAL — the provider is a storage
    // choice, not a semantics choice — so any stateful computation here
    // can ship with either, switched by one session conf.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    val default = EventsStream.hourlyAggStreaming(spark, TestSpark.sf,
      "spec_store_hdfs").collect().map(_.toString).sorted
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val rocks = EventsStream.hourlyAggStreaming(spark, TestSpark.sf,
        "spec_store_rocks").collect().map(_.toString).sorted
      assert(rocks.length == default.length && rocks.sameElements(default),
        "RocksDB-backed state store must reproduce the default exactly")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
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

  test("abandoned sessions: gap/timeout boundary emissions are exact") {
    // ProfAbandon --micro's fixture, asserted: gap 30 min, delay 10 min,
    // sentinel max 12:00:00.000 → terminal wm 11:50:00.000 → a lone
    // session emits by timeout iff floor_ms(last) < 11:20:00.000
    // (strict; timeoutTs == wm does NOT fire).
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("spec_abandon").toString
    val rows = Seq(
      (100L, ts("2024-01-01 11:20:00.000"), 1L, "view"),    // == boundary: held
      (101L, ts("2024-01-01 11:19:59.999"), 2L, "view"),    // 1ms inside: timeout
      (102L, ts("2024-01-01 11:20:00.001"), 3L, "view"),    // outside: held
      (103L, ts("2024-01-01 11:20:00.000500"), 4L, "view"), // floors to u1: held
      (104L, ts("2024-01-01 11:19:59.999500"), 5L, "view"), // floors to u2: timeout
      (105L, ts("2024-01-01 10:00:00.000"), 6L, "purchase"),// well past: timeout
      // gap-split user: first session closes by GAP in-batch (carrying
      // the purchase), second by timeout
      (200L, ts("2024-01-01 09:00:00.000"), 7L, "purchase"),
      (201L, ts("2024-01-01 09:40:00.000"), 7L, "view"),
      // still-open user (within gap of the watermark): withheld
      (210L, ts("2024-01-01 11:55:00.000"), 8L, "view"),
      // sentinel pinning the terminal watermark; itself withheld
      (220L, ts("2024-01-01 12:00:00.000"), 99L, "view"))
    rows.map { case (e, t, u, k) => (e, t, u, k, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = EventsStream.abandonedStreaming(spark, dir, "spec_abandon")
      .select("user_id", "end_reason", "n_purchases")
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((2L, "timeout", 0L), (5L, "timeout", 0L),
      (6L, "timeout", 1L), (7L, "gap", 1L), (7L, "timeout", 0L)))
  }

  test("abandoned streaming equals batch sessions gated by the terminal watermark") {
    val events = Tables.events(spark, TestSpark.sf)
    val gapUs = 30L * 60 * 1000000
    val order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val sess = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag("ts_us", 1).over(order))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum("new_session").over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"))
    val wmMs = events.agg(max(unix_micros(col("ts")))).head.getLong(0) /
      1000L - 600000L
    val expected = sess
      .withColumn("last_idx",
        max("session_idx").over(Window.partitionBy("user_id")))
      .withColumn("end_reason",
        when(col("session_idx") < col("last_idx"), "gap").otherwise("timeout"))
      .filter(col("session_idx") < col("last_idx") ||
        floor(col("end_us") / 1000L).cast("long") + 1800000L < wmMs)
      .select(col("user_id"),
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"),
        col("n_events"), col("n_purchases"), col("end_reason"))
    val got = EventsStream.abandonedStreaming(spark, TestSpark.sf,
      "spec_abandon_sf").cache()
    assert(got.count() == expected.count())
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    // both end reasons actually occur in the corpus — the gate row
    // exercises both paths, not just the trivial gap one
    assert(got.select("end_reason").distinct().count() == 2)
  }

  test("sliding windows: each event lands in exactly window/slide windows") {
    import spark.implicits._
    // one event at 10:07 → 60/15 windows starting 09:15, 09:30, 09:45,
    // 10:00; a second at 10:07 same type aggregates into the same four
    val ev = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:07:00"), "view", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:07:30"), "view", 3.0))
      .toDF("ts", "event_type", "value")
    val out = EventsStream.slidingAggBatch(ev).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("2024-01-01 09:15:00.0",
      "2024-01-01 09:30:00.0", "2024-01-01 09:45:00.0",
      "2024-01-01 10:00:00.0"))
    assert(out.forall(t => t._2 == 2L && t._3 == 5.0),
      "both events aggregate into every covering window")
  }

  test("watermark drops late rows in append-mode windowed aggregation") {
    // Spark 4 moved MemoryStream under execution.streaming.runtime
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_test").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      input.addData((ts("2024-01-01 10:05:00"), 1.0),
        (ts("2024-01-01 10:20:00"), 2.0))
      q.processAllAvailable()
      // advance event time far past the 10:00 window + watermark
      input.addData((ts("2024-01-01 12:00:00"), 3.0))
      q.processAllAvailable()
      // this event is LATE: watermark has passed its window end
      input.addData((ts("2024-01-01 10:30:00"), 4.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 14:00:00"), 5.0))
      q.processAllAvailable()
      val rows = spark.table("late_test")
        .select(col("window.start").cast("string"), col("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("2024-01-01 10:00:00") == 2,
        s"late 10:30 event must be dropped, got $rows")
    } finally q.stop()
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

  test("session_window boundary: exactly-gap spacing MERGES on both forms") {
    // The fixture events are never spaced at exactly the gap, so the
    // boundary behavior is invisible to the oracle — this spec places
    // one. session_window merges sessions whose [ts, ts+gap] windows
    // touch: an event exactly gap after the previous one still merges
    // (same islands as sessionizeBatch's `> gap` split test); one
    // minute past the gap splits.
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    val ev = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(29)),  // 29 min < gap: merge
      (1L, 3L, ts(59)),                   // 30 min exactly: still merges
      (1L, 4L, ts(90)),                   // 31 min: NEW session
      (2L, 5L, ts(0))).toDF("user_id", "event_id", "ts")
    val native = EventsStream.sessionWindowBatch(ev).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val u1 = native.filter(_._1 == 1L).sortBy(_._2.getTime)
    assert(u1.length == 2, s"expected 2 sessions for user 1: ${native.toSeq}")
    assert(u1.map(_._3).toSeq == Seq(3L, 1L),
      "exact-gap event merges into the first session; 31-min gap splits")
    // the lag-based sessionizer draws the same islands
    val lagBased = EventsStream.sessionizeBatch(ev)
      .filter($"user_id" === 1L).orderBy("session_idx").collect()
      .map(_.getLong(2))
    assert(lagBased.toSeq == Seq(3L, 1L))
  }

  test("CDC upsert replay: stream order wins over timestamps") {
    // user 1's wave-1 update (event_id % 3 == 1) carries a LATER
    // timestamp than their wave-2 update — stream-order semantics mean
    // the wave-2 row still wins (a later batch overwrites, whatever its
    // timestamps); user 2 exists only in wave 0 and must survive both
    // later merges untouched
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    val ev = Seq(
      (1L, 3L, ts(0), "a", 1.0),   // wave 0
      (1L, 7L, ts(99), "b", 2.0),  // wave 1, latest ts overall
      (1L, 5L, ts(50), "c", 3.0),  // wave 2 — must win anyway
      (2L, 6L, ts(10), "d", 4.0))  // wave 0 only
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = EventsStream.streamingUpsertReplay(spark, ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(out(1L) == ((5L, "c")),
      s"wave-2 update must overwrite the later-ts wave-1 row: $out")
    assert(out(2L) == ((6L, "d")), "wave-0-only row survives later merges")
  }

  test("streaming dedup keeps first doc per fingerprint, bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sq = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = EventsStream.dedupStream(
      input.toDF().toDF("ts", "doc_id", "text"))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_test").start()
    try {
      // case/whitespace variants of one doc + a distinct doc
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "the quick brown fox"),
        (ts("2024-01-01 10:01:00"), 2L, "The quick  BROWN fox"),
        (ts("2024-01-01 10:02:00"), 3L, "a different document"))
      q.processAllAvailable()
      // advance watermark far past the first batch, then replay doc 1:
      // its fingerprint state has been dropped, so it re-emits
      input.addData((ts("2024-01-01 12:00:00"), 4L, "late window mover"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 12:01:00"), 5L, "the quick brown fox"))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 4L, 5L),
        s"dup 2 dropped; 5 re-admitted after watermark expiry, got $ids")
    } finally q.stop()
  }
}
