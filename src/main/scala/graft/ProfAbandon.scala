package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: pin the event-time-timeout semantics of
  * [[streaming.EventsStream.abandonedSessions]] before writing the
  * oracle — (a) does the terminal no-data batch fire timeouts under
  * processAllAvailable, (b) is the firing boundary
  * `timeoutTs < wm` or `<=`, (c) is the registered timeout the
  * ms-FLOOR of the session's last µs timestamp, (d) is the terminal
  * watermark ms-floored before the delay subtraction.
  */
object ProfAbandon {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--micro")) { micro(); return }
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val res = streaming.EventsStream
      .abandonedStreaming(spark, sfDir, "prof_abandon").cache()
    println(s"[probe] total rows = ${res.count()}")
    res.groupBy("end_reason").count().collect()
      .foreach(r => println(s"[probe] reason ${r.get(0)} = ${r.get(1)}"))
    spark.stop()
  }

  /** Boundary micro-cases, gap 30 min / delay 10 min. The sentinel user
    * (no successor within gap of anyone else) pins the terminal
    * watermark; single-event users sit at ±1 ms / ±500 µs around
    * `wm − gap` so which of them emit pins the comparison operator and
    * both µs→ms floors.
    */
  def micro(): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // wm−gap = 11:20:00.000 when sentinel max = 12:00:00.000
    val base = Seq(
      1L -> "2024-01-01 11:20:00.000",    // timeoutTs == wm  → pins < / <=
      2L -> "2024-01-01 11:19:59.999",    // timeoutTs = wm−1ms
      3L -> "2024-01-01 11:20:00.001",    // timeoutTs = wm+1ms
      4L -> "2024-01-01 11:20:00.000500", // floors to u1's case
      5L -> "2024-01-01 11:19:59.999500", // floors to u2's case
      6L -> "2024-01-01 10:00:00.000")    // clearly past
    for ((tag, sentinel) <- Seq(
        ("s1", "2024-01-01 12:00:00.000"),
        // sub-ms max: does wm floor to 11:50:00.000 or carry .0007?
        ("s2", "2024-01-01 12:00:00.000700"))) {
      val dir = java.nio.file.Files.createTempDirectory(s"prof_ab_$tag")
        .toString
      val rows = base.zipWithIndex.map { case ((u, t), i) =>
        (100L + i, ts(t), u, "view", 1.0, "{}") } ++ Seq(
        // gap-split user: two events 40 min apart → first session closes
        // by gap in-batch; second times out (well before wm)
        (200L, ts("2024-01-01 09:00:00.000"), 7L, "view", 1.0, "{}"),
        (201L, ts("2024-01-01 09:40:00.000"), 7L, "purchase", 1.0, "{}"),
        // still-open user: last event 5 min before sentinel → withheld
        (210L, ts("2024-01-01 11:55:00.000"), 8L, "view", 1.0, "{}"),
        (220L, ts(sentinel), 99L, "view", 1.0, "{}"))
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      val res = streaming.EventsStream
        .abandonedStreaming(spark, dir, s"prof_ab_micro_$tag")
      val got = res.select("user_id", "end_reason").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      println(s"[micro:$tag] emitted = ${got.toSeq}")
    }
    spark.stop()
  }
}
