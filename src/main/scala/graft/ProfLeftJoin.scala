package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: pin the left-outer stream-stream join's null-pad emission
  * semantics before writing the oracle — (a) does processAllAvailable
  * cover the terminal no-data eviction batch, (b) is the eviction
  * boundary `click_ts + 1h < wm` or `<=`, (c) is the global watermark
  * min(max click_ts, max purchase_ts) − delay.
  */
object ProfLeftJoin {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--micro")) { micro(); return }
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    val res = streaming.EventsStream
      .clickPurchaseLeftStreaming(spark, sfDir, "prof_left_join")
      .cache()
    val nullPad = res.filter(col("purchase_id").isNull).cache()
    println(s"[probe] total rows = ${res.count()}")
    println(s"[probe] null-pad rows = ${nullPad.count()}")

    val ev = graft.sources.Tables
      .microTs(spark.read.parquet(s"$sfDir/events.parquet"))
    val maxClick = ev.filter(col("event_type") === "click")
      .agg(max("ts")).collect()(0).getTimestamp(0)
    val maxPurch = ev.filter(col("event_type") === "purchase")
      .agg(max("ts")).collect()(0).getTimestamp(0)
    println(s"[probe] max click_ts=$maxClick max purchase_ts=$maxPurch")

    // batch expectation: unmatched clicks, split by window-end vs wm
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val unmatched = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        "left_anti")
    val wmMin = new java.sql.Timestamp(
      math.min(maxClick.getTime, maxPurch.getTime) - 10 * 60 * 1000L)
    val wmMax = new java.sql.Timestamp(
      math.max(maxClick.getTime, maxPurch.getTime) - 10 * 60 * 1000L)
    for ((nm, wm) <- Seq(("min", wmMin), ("max", wmMax))) {
      val lt = unmatched.filter(
        col("click_ts") + expr("INTERVAL 1 HOUR") < lit(wm)).count()
      val le = unmatched.filter(
        col("click_ts") + expr("INTERVAL 1 HOUR") <= lit(wm)).count()
      println(s"[probe] wm($nm)=$wm unmatched<: $lt unmatched<=: $le")
    }
    println(s"[probe] unmatched total = ${unmatched.count()}")
    // which clicks actually emitted null-pads — boundary sample
    val emitted = nullPad.select(col("click_id")).collect()
      .map(_.getLong(0)).toSet
    val missing = unmatched.select("click_id").collect()
      .map(_.getLong(0)).filterNot(emitted)
    println(s"[probe] unmatched-but-not-emitted n=${missing.length} " +
      s"sample=${missing.take(5).toSeq}")
    spark.stop()
  }

  /** Boundary micro-case: watermark lands EXACTLY on one click's match
    * window end (11:00:00.000), one µs past another's (.001), one µs
    * before a third's (.999 ms). Whether A emits pins `<` vs `<=`; the
    * sub-ms clicks pin the µs→ms watermark truncation.
    */
  def micro(): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prof_lj").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // clicks at window-end boundary cases; sentinels at 11:10:00.000 on
    // BOTH sides pin the global watermark to exactly 11:00:00.000
    // clicks at window-end boundary cases; sentinel purchase+click pin
    // the global watermark. Scenario 1: sentinels at 11:10:00.000 →
    // naive wm 11:00:00.000. Scenario 2: sentinels at 11:10:00.000500 →
    // tests µs→ms truncation of the watermark itself.
    val clicks = Seq(
      1L -> "2024-01-01 10:00:00.000",      // end == wm
      2L -> "2024-01-01 10:00:00.000001",   // end = wm+1µs
      3L -> "2024-01-01 09:59:59.999999",   // end = wm-1µs   (ms .999)
      7L -> "2024-01-01 09:59:59.999",      // end = wm-1ms   (ms .999)
      8L -> "2024-01-01 09:59:59.998999",   // ms .998+999µs
      9L -> "2024-01-01 09:59:59.998",      // end = wm-2ms
      4L -> "2024-01-01 09:00:00.000")      // end << wm
    for ((tag, sentinel) <- Seq(
        ("s1", "2024-01-01 11:10:00.000"),
        ("s2", "2024-01-01 11:10:00.000500"),
        // floor-discriminator: floored wm = 11:00:00.000 keeps click 3
        // un-emitted; an unfloored wm (.000999) would emit it
        ("s3", "2024-01-01 11:10:00.000999"))) {
      val d2 = java.nio.file.Files.createTempDirectory(s"prof_lj_$tag")
        .toString
      val rows = clicks.map { case (id, t) =>
        (id, ts(t), 100L + id, "click", 1.0, "{}") } ++ Seq(
        (5L, ts(sentinel), 105L, "click", 1.0, "{}"),
        (6L, ts(sentinel), 106L, "purchase", 2.0, "{}"))
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$d2/events.parquet")
      val res = streaming.EventsStream
        .clickPurchaseLeftStreaming(spark, d2, s"prof_lj_micro_$tag")
      val emitted = res.filter(col("purchase_id").isNull)
        .select("click_id").collect().map(_.getLong(0)).toSet
      println(s"[micro:$tag] emitted null-pad click_ids = " +
        emitted.toSeq.sorted)
    }
    spark.stop()
  }
}
