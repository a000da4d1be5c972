package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: pin the chained stateful aggregation's emission semantics —
  * which daily rows actually reach the sink on a fully-available source,
  * vs the candidate predicate day_end <= terminal watermark.
  */
object ProfChained {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    val res = streaming.EventsStream
      .dailyOfHourlyStreaming(spark, sfDir, "prof_chained").cache()
    println(s"[probe] emitted daily rows = ${res.count()}")
    res.orderBy("day_start", "event_type").show(50, false)

    val ev = graft.sources.Tables
      .microTs(spark.read.parquet(s"$sfDir/events.parquet"))
    val maxTs = ev.agg(max("ts")).collect()(0).getTimestamp(0)
    val wmMs = maxTs.getTime - 600000L
    println(s"[probe] max ts = $maxTs  wm(ms-floor) = ${new java.sql.Timestamp(wmMs)}")

    // batch expectation: full daily rollup of hourly counts, gated on
    // day_end <= wm
    val hourly = ev.groupBy(window(col("ts"), "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val daily = hourly
      .groupBy(window(col("w.start"), "1 day").as("d"), col("event_type"))
      .agg(sum("n_events").as("n_events"),
        max("n_events").as("max_hourly"),
        count(lit(1)).as("n_hours"))
      .select(col("d.start").as("day_start"), col("d.end").as("day_end"),
        col("event_type"), col("n_events"), col("max_hourly"),
        col("n_hours"))
    val gated = daily.filter(
      unix_micros(col("day_end")) <= wmMs * 1000L).drop("day_end")
    println(s"[probe] batch gated rows = ${gated.count()}  " +
      s"full daily rows = ${daily.count()}")
    val d1 = res.exceptAll(gated)
    val d2 = gated.exceptAll(res)
    println(s"[probe] stream-minus-gated = ${d1.count()}  " +
      s"gated-minus-stream = ${d2.count()}")
    d1.show(10, false); d2.show(10, false)
    spark.stop()
  }
}
