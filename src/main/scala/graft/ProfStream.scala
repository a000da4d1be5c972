package graft

import graft.core.GraftSession
import graft.streaming.EventsStream

/** Dev-only: attribute the streaming family's per-query fixed cost
  * (state-store count vs no-data micro-batches vs query startup) at
  * sf0.1 — VERDICT r8 #6. Each stateful query pays a constant dominated
  * by store commits per micro-batch; this sweeps the store count and
  * the no-data batch toggle on two representatives (complete-mode agg;
  * append-mode interval join) and prints emitted-row counts so any
  * semantic drift is immediately visible.
  */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(appName = "graft-prof-stream",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag%-52s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    var i = 0
    def uniq(p: String): String = { i += 1; s"${p}_$i" }

    // warm both paths once (codegen, file listing page cache)
    t("warmup hourly")(EventsStream.hourlyAggStreaming(spark, sfDir, uniq("w")).count())
    t("warmup cpjoin")(EventsStream.clickPurchaseStreaming(spark, sfDir, uniq("w")).count())

    for (parts <- Seq("8", "4", "2", "1")) {
      spark.conf.set("spark.sql.graft.streamShufflePartitions", parts)
      t(s"hourly agg, $parts store(s)")(
        EventsStream.hourlyAggStreaming(spark, sfDir, uniq("h")).count())
      t(s"hourly agg, $parts store(s) again")(
        EventsStream.hourlyAggStreaming(spark, sfDir, uniq("h")).count())
      t(s"cp join, $parts store(s)")(
        EventsStream.clickPurchaseStreaming(spark, sfDir, uniq("j")).count())
      t(s"cp join, $parts store(s) again")(
        EventsStream.clickPurchaseStreaming(spark, sfDir, uniq("j")).count())
    }
    spark.conf.unset("spark.sql.graft.streamShufflePartitions")

    // no-data micro-batch toggle (complete-mode agg only: append-mode
    // queries NEED the watermark-advancing batch to emit finals)
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    t("hourly agg, noData OFF")(
      EventsStream.hourlyAggStreaming(spark, sfDir, uniq("nd")).count())
    t("hourly agg, noData OFF again")(
      EventsStream.hourlyAggStreaming(spark, sfDir, uniq("nd")).count())
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")

    // r10: the two heaviest sf1 rows (st_session 3.67 s, st_abandoned
    // 3.91 s) — attribute batch-equivalent work vs streaming overhead.
    // The batch twin prices the pure agg/sessionize computation; the
    // delta is micro-batch + state-store + sink machinery.
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.sources.Tables.microTs(
      spark.read.parquet(s"$sfDir/events.parquet"))
    t("session batch twin")(
      EventsStream.sessionWindowBatch(events).count())
    t("session batch twin again")(
      EventsStream.sessionWindowBatch(events).count())
    for (i <- 1 to 2)
      t(s"session streaming #$i")(
        EventsStream.sessionWindowStreaming(spark, sfDir, uniq("ss")).count())
    t("abandoned batch-ish twin (sessionizeBatch)")(
      EventsStream.sessionizeBatch(events).count())
    for (i <- 1 to 2)
      t(s"abandoned streaming #$i")(
        EventsStream.abandonedStreaming(spark, sfDir, uniq("ab")).count())
    spark.stop()
  }
}
