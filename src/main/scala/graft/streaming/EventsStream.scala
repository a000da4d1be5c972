package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.Money

/** Structured Streaming over the `events` table.
  *
  * The reference is batch-only (SURVEY §2.13) — its "temporal" dimension
  * is daily DAY_DT snapshots. This module is the engine's streaming
  * extension: the same daily-ingest semantics expressed as a file-source
  * stream with watermarked tumbling windows, plus a stateful sessionizer
  * (`flatMapGroupsWithState`). Each streaming computation has a batch
  * twin with identical semantics, used for oracle verification and as
  * the backfill path (classic kappa-style replay).
  */
object EventsStream {

  /** File-source stream over one sf table, layout-aware. The driver's
    * testdata lays each table out as a BARE FILE
    * `<sfDir>/<table>.parquet`, which the directory-only file-stream
    * source can only reach via a glob filter on the parent directory;
    * scaled-up data (graft.ScaleUp) writes the standard DIRECTORY
    * layout, where that same glob matches nothing (pathGlobFilter
    * filters leaf FILE names, and the parts are `part-*.parquet`) and
    * the stream is SILENTLY empty — a zero-row result, not an error.
    * Detect the layout and stream accordingly.
    */
  private def tableStream(spark: SparkSession, sfDir: String, table: String,
                          schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val path = s"$sfDir/$table.parquet"
    if (new java.io.File(path).isDirectory)
      spark.readStream.schema(schema).parquet(path)
    else
      spark.readStream.schema(schema)
        .option("pathGlobFilter", s"$table.parquet").parquet(sfDir)
  }

  /** Start a stateful stream with `spark.sql.shuffle.partitions` pinned
    * low for the duration of the `start()` call, restoring the session
    * default immediately. A stateful query pins its state-store count
    * per stream from that conf at its first micro-batch, and on local
    * mode the per-batch HDFS-backed snapshot cost scales with store
    * COUNT, not data ([[clickPurchaseStreaming]]'s original
    * measurement, generalized to every stateful demo stream). The
    * round-9 sweep (ProfStream, sf0.1) measured the fixed cost at
    * 8/4/2/1 stores with IDENTICAL emitted sets: the hourly agg ran
    * 1.49→1.16 s and the interval join 3.84→2.53 s from 8 to 2 stores.
    * At sf1 the trade inverts for the heavy stateful queries — the
    * session/abandoned family wants parallelism more than it fears
    * store constants (st_session 5.4 s at 2 stores vs 3.8 s at 4; 8 ≈ 4)
    * — so 4 is the default: within noise of 2 at sf0.1, ~30% better at
    * sf1. A production deployment sizes this to the topic's key
    * cardinality via
    * `spark.sql.graft.streamShufflePartitions`; results are
    * partitioning-independent (aggregation/dedup/join semantics do not
    * depend on how keys are distributed over stores — the sweep's
    * constant row counts are the proof).
    */
  /** Drain an append-mode stream into an EXECUTOR-side parquet sink
    * and return the materialized result (scratch tree deleted). The
    * memory sink parks every emitted row on the DRIVER — fine for the
    * hourly-grain aggregates, a scaling failure for row-grain outputs
    * (csvDropReplay measured 205 MB task binaries at sf1; st_enrich's
    * output is the full 6M-row event grain). Measured at sf1: session
    * 4.2 → ~2.6 s, abandoned 5.1 → ~3.3 s, with identical emitted
    * sets (StreamingSpec pins all three outputs).
    */
  private def drainToParquet(spark: SparkSession, out: DataFrame,
                             queryName: String,
                             inputBytes: Long = 0L): DataFrame = {
    val root = graft.core.Scratch.fastTempDirectory("graft_stsink",
      inputBytes)
    val sink = root.resolve("sink").toString
    val q = startAt8(spark, inputBytes)(out.writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .queryName(queryName)
      .start())
    try q.processAllAvailable() finally q.stop()
    readBackAndDrop(spark, sink, out.schema, root)
  }

  /** Complete-mode twin of [[drainToParquet]]: file sinks reject
    * complete mode, so each batch's full result overwrites the sink
    * via `foreachBatch` — still an executor-side write; the final
    * overwrite IS the complete-mode table.
    */
  private def drainCompleteToParquet(spark: SparkSession, agg: DataFrame,
                                     queryName: String,
                                     inputBytes: Long = 0L): DataFrame = {
    val root = graft.core.Scratch.fastTempDirectory("graft_stsink",
      inputBytes)
    val sink = root.resolve("sink").toString
    val q = startAt8(spark, inputBytes)(agg.writeStream
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .queryName(queryName)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        b.write.mode("overwrite").parquet(sink); ()
      }
      .start())
    try q.processAllAvailable() finally q.stop()
    readBackAndDrop(spark, sink, agg.schema, root)
  }

  private def readBackAndDrop(spark: SparkSession, sink: String,
      schema: org.apache.spark.sql.types.StructType,
      root: java.nio.file.Path): DataFrame = {
    // a stream that emitted nothing never creates the sink directory
    val read =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(sink)))
        spark.read.schema(schema).parquet(sink)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    graft.core.Scratch.materializeAndDelete(read, root)
  }

  /** Memory-sink twin of [[drainToParquet]]: start the stream with an
    * EXPLICIT checkpoint on fast scratch ([[graft.core.Scratch
    * .fastTempDirectory]]), drain synchronously, delete the checkpoint
    * tree, return the in-memory sink table. Without the explicit
    * option Spark provisions its temporary checkpoint under
    * `java.io.tmpdir` — the durable data disk — and every offset/
    * commit WAL write and state-store delta pays device latency for a
    * tree whose lifetime is this one call.
    */
  private def drainToMemory(spark: SparkSession,
      w: org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row],
      queryName: String, inputBytes: Long = 0L): DataFrame = {
    val ckpt = graft.core.Scratch.fastTempDirectory("graft_ckpt")
    val q = startAt8(spark, inputBytes)(w
      .option("checkpointLocation", ckpt.resolve("ckpt").toString)
      .format("memory")
      .queryName(queryName)
      .start())
    try q.processAllAvailable()
    finally { q.stop(); graft.core.Scratch.deleteRecursively(ckpt) }
    spark.table(queryName)
  }

  /** Bytes on disk of one sf table (bare-file or directory layout) —
    * the scale signal [[startAt8]] derives its store count from.
    * Recursive to leaf files (Scratch.pathBytes): a partitioned/nested
    * table dir must not read as a handful of 4 KiB dir entries.
    */
  private def tableBytes(sfDir: String, table: String): Long =
    graft.core.Scratch.pathBytes(s"$sfDir/$table.parquet")

  private def startAt8[A](spark: SparkSession,
                          inputBytes: Long = 0L)(start: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    // Scale-adaptive store count (guide §2: derive partitioning from
    // input size, never a constant tuned for one rung):
    // round(sqrt(bytes/256 KiB)), floored at 4 and capped at the core
    // count. The sqrt law is the classic fixed-cost/parallelism trade
    // (per-batch commit cost grows ~linearly with store COUNT, per-
    // store work shrinks ~linearly with it; the optimum sits at the
    // geometric mean) and it passes through all three same-box sweep
    // optima measured this round on the 4 heavy stateful rows
    // (session/abandoned/both interval joins, min of interleaved
    // runs): sf0.1 (2 MB events) → 4 = the r9/r13 optimum, unchanged
    // and bench-comparable with every prior round; sf1 (17.6 MB) → 8
    // (14.05 s at 4, 11.5 s at 8, 17.0 s at 16); sf3 (63 MB) → 16
    // (20.3 s at 4, 18.1 s at 16, 38.4 s at 26 — oversizing is as bad
    // as undersizing: 4 store instances per join × count). The
    // explicit conf still wins: a deployment sizes it to topic key
    // cardinality.
    val n = spark.conf.getOption("spark.sql.graft.streamShufflePartitions")
      .getOrElse {
        val cpus = math.max(1L, spark.sparkContext.defaultParallelism.toLong)
        val derived = math.round(math.sqrt(inputBytes / (256.0 * 1024)))
        math.max(4L, math.min(derived, cpus)).toString
      }
    val prev = spark.conf.get(key)
    spark.conf.set(key, n)
    try start finally spark.conf.set(key, prev)
  }

  /** Batch twin: hourly tumbling counts/sums per event_type. */
  def hourlyAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Money.round2(Money.moneySum(col("value"))).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window aggregation: `windowMinutes` windows advancing every
    * `slideMinutes` (each event lands in window/slide overlapping
    * windows — 4 at the 60/15 default): the dashboard "smoothed rate"
    * query. Spark's `window(ts, win, slide)` expands the overlap in a
    * narrow generator before the shuffle, so the exchange carries
    * overlap× rows at (window, type) grain — linear fan-out, no
    * self-join. Works unchanged under `readStream` + watermark (the
    * same operator [[hourlyAggStreaming]] runs tumbling).
    */
  def slidingAggBatch(events: DataFrame, windowMinutes: Int = 60,
                      slideMinutes: Int = 15): DataFrame =
    events
      .groupBy(window(col("ts"), s"$windowMinutes minutes",
        s"$slideMinutes minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Money.round2(Money.moneySum(col("value"))).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming form of [[slidingAggBatch]]: the SAME overlapping-window
    * groupBy under `readStream` with a watermark — the state store holds
    * one row per open (window, type) and the generator's overlap
    * fan-out happens before the stateful exchange, exactly as in batch.
    * Complete-mode memory sink, drained synchronously; on a fully
    * available source the watermark drops nothing, so streaming must
    * hash-equal the batch twin (and its DuckDB oracle).
    */
  def slidingAggStreaming(spark: SparkSession, sfDir: String,
                          queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.sources.Tables.schemaOf(spark, s"$sfDir/events.parquet")
    val events = graft.sources.Tables.microTs(
      tableStream(spark, sfDir, "events", schema))
    val agg = slidingAggBatch(
      events.withWatermark("ts", "10 minutes"))
    drainToMemory(spark,
      agg.writeStream.outputMode(OutputMode.Complete()), queryName,
      tableBytes(sfDir, "events"))
  }

  /** Streaming version: file-source stream over the same parquet, 10-min
    * watermark, complete-mode memory sink, drained synchronously.
    * Returns the result as a batch DataFrame (for verification; a real
    * deployment would writeStream to a sink).
    */
  def hourlyAggStreaming(spark: SparkSession, sfDir: String,
                         queryName: String = "graft_hourly"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.sources.Tables.schemaOf(spark, s"$sfDir/events.parquet")
    val events = graft.sources.Tables.microTs(
      tableStream(spark, sfDir, "events", schema))
    val agg = events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Money.round2(Money.moneySum(col("value"))).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    drainToMemory(spark,
      agg.writeStream.outputMode(OutputMode.Complete()), queryName,
      tableBytes(sfDir, "events"))
  }

  /** CHAINED stateful streaming aggregation (two stateful operators in
    * ONE streaming query — the multi-stateful-operator capability Spark
    * gained in 3.4): hourly tumbling counts per event_type feed a daily
    * rollup (sum / max / n_hours) downstream IN THE SAME QUERY, with
    * one watermark driving both state stores. Before 3.4 this required
    * two queries bridged by a sink; chained, the intermediate hourly
    * grain never leaves the executors. The time column handed to the
    * outer window is `window_time(w)` (= w.end − 1 event-time tick),
    * so an hour ending exactly at midnight rolls into the PRECEDING
    * day. Emission cascade on a fully-available source (pinned
    * empirically, `ProfChained`): terminal watermark
    * wm = floor_ms(max ts) − 10 min; the inner agg finalizes hours with
    * hour_end <= wm (same predicate as [[st_late_drop]]'s oracle), the
    * outer agg — in the SAME terminal batch, chained late-filtering
    * uses the previous-batch watermark — finalizes days with
    * day_end <= wm, whose hours are by then all finalized. The oracle
    * states exactly that: daily rollups of complete days, gated on
    * day_end <= wm.
    */
  def dailyOfHourlyStreaming(spark: SparkSession, sfDir: String,
                             queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.sources.Tables.schemaOf(spark, s"$sfDir/events.parquet")
    val events = graft.sources.Tables.microTs(
      tableStream(spark, sfDir, "events", schema))
    val hourly = events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val daily = hourly
      .groupBy(window(window_time(col("w")), "1 day").as("d"),
        col("event_type"))
      .agg(sum("n_events").as("n_events"),
        max("n_events").as("max_hourly"),
        count(lit(1)).as("n_hours"))
      .select(col("d.start").as("day_start"), col("event_type"),
        col("n_events"), col("max_hourly"), col("n_hours"))
    drainToMemory(spark,
      daily.writeStream.outputMode(OutputMode.Append()), queryName,
      tableBytes(sfDir, "events"))
  }

  /** Streaming CSV-drop ingest: the reference's daily sales file drop
    * (`gs://meta-morph-flow/<yyyymmdd>/sales_<yyyymmdd>.csv`,
    * `ingestion_tasks.py:269-273`) as a file-source stream — new files
    * appearing under `dropDir` are ingested continuously with a pinned
    * schema (inference is not allowed on streams, which also closes the
    * reference's inferred-type-drift hazard, SURVEY §7.4(6)).
    * Returns the running stream; callers attach their sink.
    */
  def csvDropStream(spark: SparkSession, dropDir: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", "16")
      .csv(dropDir)

  /** End-to-end CSV-drop replay, the oracle harness for
    * [[csvDropStream]]: the sales entity is written as three CSV drop
    * files — the first present at stream start, the other two appearing
    * only AFTER the first micro-batch completes (the continuous-ingest
    * case the file source exists for) — then streamed with the pinned
    * schema into a memory sink. The batch twin (the sales derivation
    * itself) is the oracle: hash equality proves the CSV encode →
    * stream-decode round trip preserves every value (dates, doubles,
    * statuses) and that late-arriving files are picked up exactly once.
    */
  def csvDropReplay(spark: SparkSession, sfDir: String,
                    queryName: String): DataFrame = {
    // cached: the three slice writes would otherwise re-run the
    // lineitem⨝orders derivation once per drop file
    val sales = graft.sources.Entities.sales(spark, sfDir).cache()
    val root = graft.core.Scratch.fastTempDirectory("graft_csv_drop",
      tableBytes(sfDir, "lineitem") * 3)
    val dropDir = root.resolve("drop")
    java.nio.file.Files.createDirectories(dropDir)
    def drop(mod: Int): Unit = {
      val stage = root.resolve(s"stage_$mod")
      sales.filter(col("sale_id") % 3 === mod)
        .coalesce(1).write.option("header", "true")
        .mode("overwrite").csv(stage.toString)
      graft.core.Scratch.moveSinglePart(stage, ".csv",
        dropDir.resolve(s"sales_$mod.csv"))
    }
    try {
      drop(0)
      // PARQUET sink, not a memory sink: the replay's output is the
      // full sales fact, and a memory sink parks every row on the
      // DRIVER — queries over it then re-serialize the rows into task
      // binaries (measured 205 MB/task at sf1, the same driver-bound
      // scaling failure materializeAndDelete's collect had). The sink
      // keeps rows executor-side; the consumer below pins them off the
      // scratch tree. (queryName is retained for the stream's UI name.)
      val sink = root.resolve("sink").toString
      val q = csvDropStream(spark, dropDir.toString, sales.schema)
        .writeStream
        .outputMode(OutputMode.Append())
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .queryName(queryName)
        .start()
      try {
        q.processAllAvailable() // drains the file present at start
        drop(1); drop(2)        // late arrivals: new files mid-stream
        q.processAllAvailable()
      } finally q.stop()
      // the CSV tree (a full copy of the sales fact) and the sink must
      // not accumulate across gate runs
      graft.core.Scratch.materializeAndDelete(
        spark.read.schema(sales.schema).parquet(sink), root)
    } finally {
      sales.unpersist(blocking = false)
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
    }
  }

  /** Batch sessionizer: sessions split on gaps > gapMinutes, windowed
    * lag + running sum (exact integer epoch math, oracle-comparable).
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    val flagged = events
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag("ts_us", 1).over(order))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum("new_session").over(order.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"),
        max("ts").as("session_end"))
  }

  /** Native `session_window` aggregation — the OPERATOR form of
    * [[sessionizeBatch]] (a dedicated SessionWindowing plan node with
    * merging session state, not a lag+running-sum window): events whose
    * [ts, ts+gap) windows overlap merge into one session. The same
    * groupBy runs unchanged under `readStream` with a watermark, where
    * the state store merges sessions incrementally — which is why the
    * operator matters beyond the windowed rewrite.
    *
    * Boundary semantics match [[sessionizeBatch]]: session_window
    * merges sessions whose `[ts, ts+gap]` windows TOUCH, so an event
    * spaced at exactly `gapMinutes` still merges — the same islands as
    * the lag-based form's `> gap` split test. Not guessed: a
    * `StreamingSpec` fixture places an event at exactly the gap and
    * pins the merge on both forms (the corpus never spaces events at
    * exactly the gap, so the oracle alone could not tell `>` from
    * `>=`).
    */
  def sessionWindowBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events.groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), max("ts").as("last_ts"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("last_ts"))

  /** [[sessionWindowBatch]] under `readStream`: the SAME session_window
    * groupBy with a watermark, complete-mode memory sink, drained
    * synchronously. The state store holds one row per OPEN session —
    * merging on arrival, exactly the semantics the batch operator
    * computes at rest — so on a fully-available source streaming must
    * hash-equal the batch twin (and share its oracle), the
    * [[slidingAggStreaming]] contract applied to the stateful-merge
    * window.
    */
  def sessionWindowStreaming(spark: SparkSession, sfDir: String,
                             queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.sources.Tables.schemaOf(spark, s"$sfDir/events.parquet")
    val events = graft.sources.Tables.microTs(
      tableStream(spark, sfDir, "events", schema))
    val agg = sessionWindowBatch(events.withWatermark("ts", "10 minutes"))
    drainCompleteToParquet(spark, agg, queryName,
      tableBytes(sfDir, "events"))
  }

  /** Streaming CDC apply: a micro-batched update stream upserted into a
    * stored dimension via `foreachBatch` + MERGE — the production
    * pattern for maintaining a serving table from a change stream
    * (Structured Streaming has no native MERGE sink; foreachBatch is
    * the documented recipe). Each micro-batch first collapses to its
    * LATEST row per key (ts desc, event_id desc) so a batch carrying
    * several updates for one key applies exactly once, then
    * [[graft.pipeline.LayerWriter.mergeInto]] write-temp-swaps the
    * dimension.
    *
    * The replay drives three update waves (event_id % 3) through the
    * stream with a barrier between drops, so arrival order is
    * deterministic: the final dimension row for a user comes from the
    * LAST wave containing that user (stream-order semantics — a later
    * batch overwrites, whatever its timestamps), with (ts, event_id)
    * deciding within the wave. The oracle replicates exactly that:
    * wave-major, timestamp-minor.
    */
  def streamingUpsertReplay(spark: SparkSession, sfDir: String): DataFrame =
    streamingUpsertReplay(spark,
      graft.sources.Tables.events(spark, sfDir))

  /** [[streamingUpsertReplay]] over an explicit update frame (specs feed
    * hand-placed waves; the query entry feeds the events table).
    */
  def streamingUpsertReplay(spark: SparkSession,
                            events: DataFrame): DataFrame = {
    val ev = events.select("user_id", "event_id", "ts", "event_type", "value")
    val root = graft.core.Scratch.fastTempDirectory("graft_upsert")
    val dropDir = root.resolve("drop")
    java.nio.file.Files.createDirectories(dropDir)
    val destDir = root.resolve("dim").toString
    // ONE file per wave (the restartReplay/csvDropReplay drop pattern),
    // NOT a multi-file append: the file source's listing thread can fire
    // mid-commit and see a PREFIX of a multi-file wave, splitting the
    // wave across two micro-batches — the second sub-batch then
    // overwrites its users even when its (ts, event_id) winners are
    // lower, silently breaking the wave-major contract the oracle
    // states. Latent until sf1 (9-file waves + slower commits) flagged
    // it: 11k/15k users diverged in the round-9 gate. A single renamed
    // file is atomic to the listing.
    def drop(mod: Int): Unit = {
      val stage = root.resolve(s"stage_$mod")
      ev.filter(col("event_id") % 3 === mod)
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      graft.core.Scratch.moveSinglePart(stage, ".parquet",
        dropDir.resolve(s"wave_$mod.parquet"))
    }
    drop(0)
    val q = spark.readStream.schema(ev.schema).parquet(dropDir.toString)
      .writeStream
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = Window.partitionBy("user_id")
          .orderBy(desc("ts"), desc("event_id"))
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        graft.pipeline.LayerWriter.mergeInto(
          spark, latest, destDir, Seq("user_id"), Seq.empty)
        ()
      }
      .start()
    try {
      q.processAllAvailable() // wave 0 applies alone
      drop(1); q.processAllAvailable()
      drop(2); q.processAllAvailable()
    } finally q.stop()
    // the final dimension is small by contract (one row per user_id);
    // pin it and delete the scratch tree — repeated gate runs must not
    // accumulate drop files, checkpoints, and dimension copies on disk
    graft.core.Scratch.materializeAndDelete(
      spark.read.parquet(destDir)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("ts").as("last_ts"), col("event_type").as("last_type"),
          col("value").as("last_value")),
      root)
  }

  /** Batch twin of the stream-stream interval join: clicks attributed to
    * same-user purchases within the hour AFTER the click. The join
    * condition (equi-key + time band) is exactly what lets the streaming
    * form bound its state.
    */
  def clickPurchaseBatch(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("purchase_value"))
  }

  /** Watermarked stream-stream interval join (§2.13 widening): both
    * sides carry watermarks and the join condition carries the time
    * band, so the state store holds only one watermark-plus-band window
    * of each side — the bounded-state contract that makes stream-stream
    * joins viable at 100 TB/day (an unconstrained stream join buffers
    * both streams forever). Two independent file-source streams over the
    * same parquet stand in for the two live topics.
    */
  def clickPurchaseStreaming(spark: SparkSession, sfDir: String,
                             queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.sources.Tables.schemaOf(spark, s"$sfDir/events.parquet")
    def stream(): DataFrame = graft.sources.Tables.microTs(
      tableStream(spark, sfDir, "events", schema))
    val clicks = stream().filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "10 minutes")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("purchase_value"))
    // A stream-stream join keeps 4 store instances per partition (two
    // sides × key/index), making it the hottest beneficiary of the
    // shared 8-store start seam.
    drainToMemory(spark,
      joined.writeStream.outputMode(OutputMode.Append()), queryName,
      tableBytes(sfDir, "events"))
  }

  /** LEFT-OUTER watermarked stream-stream interval join (§2.13): the
    * attribution report that must also show the clicks that converted to
    * NOTHING. Matched rows stream out exactly as in the inner join
    * ([[clickPurchaseStreaming]]); a click with no same-user purchase in
    * the hour after it emits ONE null-padded row — but only once the
    * watermark passes the end of its match window, because until then a
    * matching purchase could still arrive. That state EVICTION is what
    * makes outer-join semantics decidable on an unbounded stream, and it
    * is the part an inner join never exercises: the store must hold each
    * unmatched left row for exactly watermark + band and then emit, not
    * drop, it. On a fully-available source the terminal watermark is
    * floor_ms(min(max click_ts, max purchase_ts)) − 10 min (global
    * watermark =
    * min over the two inputs; event-time stats track milliseconds, so
    * the µs component of the max is floored first), and the eviction
    * predicate carries Spark's 1 ms safety margin (StreamingJoinHelper
    * subtracts one from the state-value watermark): a click null-pads
    * iff it is unmatched AND `click_ts + 1h + 1ms <= wm` at full µs
    * precision. All three facts pinned empirically by
    * `ProfLeftJoin --micro` (clicks whose window end lands exactly ON
    * the watermark, 1 µs past it, 1 µs / 1 ms before it; sentinel
    * max-ts with sub-ms components for the floor); the oracle states
    * the predicate literally.
    */
  def clickPurchaseLeftStreaming(spark: SparkSession, sfDir: String,
                                 queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.sources.Tables.schemaOf(spark, s"$sfDir/events.parquet")
    def stream(): DataFrame = graft.sources.Tables.microTs(
      tableStream(spark, sfDir, "events", schema))
    val clicks = stream().filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "10 minutes")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("purchase_value"))
    // parquet sink: the left join emits CLICK-grain rows (every click,
    // matched or not — ~1M+ at sf1), not the inner join's sparse pairs
    drainToParquet(spark, joined, queryName, tableBytes(sfDir, "events"))
  }

  /** Batch twin of the stream-static enrichment: events left-joined to a
    * (selective) customer dimension. The dim keeps every third customer
    * so both join branches carry rows — enriched hits AND null-padded
    * misses — on real data.
    */
  def enrichBatch(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(customers.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_name"), col("c_mktsegment"))

  /** Stream-static enrichment join (§2.13 widening): a live event stream
    * joined to a STATIC dimension — the standard streaming-enrichment
    * pattern, and the stateless member of the streaming-join family: the
    * static side is planned as an ordinary (broadcastable) batch
    * relation re-read per micro-batch, so there is NO state store, no
    * watermark requirement, and nothing to bound — the property that
    * makes dim enrichment free at any stream rate. Left-outer keeps
    * events with no dim hit (null-padded), exactly as the batch twin.
    */
  def enrichStreaming(spark: SparkSession, sfDir: String,
                      queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.sources.Tables.schemaOf(spark, s"$sfDir/events.parquet")
    val events = tableStream(spark, sfDir, "events", schema)
    val customers = graft.sources.Tables.customer(spark, sfDir)
    // parquet sink, not memory: the output is EVENT-grain (6M rows at
    // sf1) — the largest driver-side materialization the family had
    drainToParquet(spark, enrichBatch(events, customers), queryName,
      tableBytes(sfDir, "events"))
  }

  final case class Ev(user_id: Long, event_id: Long, tsUs: Long)
  final case class SessionState(sessionIdx: Long, lastUs: Long,
                                n: Long, startUs: Long)
  final case class SessionOut(user_id: Long, session_idx: Long,
                              n_events: Long, start_us: Long, end_us: Long)

  /** Stateful streaming sessionizer (`flatMapGroupsWithState`): emits a
    * session when a later event arrives past the gap. Used by the spec
    * to cross-check [[sessionizeBatch]]; events must arrive in ts order
    * per user within a batch (the spec feeds them sorted).
    */
  def sessionizeStateful(spark: SparkSession,
                         events: org.apache.spark.sql.Dataset[Ev],
                         gapMinutes: Int = 30)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsUs, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          var st = state.getOption.getOrElse(SessionState(0, Long.MinValue, 0, 0))
          sorted.foreach { e =>
            if (st.n == 0) st = SessionState(1, e.tsUs, 1, e.tsUs)
            else if (e.tsUs - st.lastUs > gapUs) {
              out += SessionOut(userId, st.sessionIdx, st.n, st.startUs, st.lastUs)
              st = SessionState(st.sessionIdx + 1, e.tsUs, 1, e.tsUs)
            } else st = st.copy(lastUs = e.tsUs, n = st.n + 1)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Flush helper for the stateful sessionizer's final open sessions in
    * tests: the batch twin is the source of truth for totals.
    */

  final case class AbEv(user_id: Long, event_id: Long, tsUs: Long,
                        event_type: String, ts: java.sql.Timestamp)
  final case class AbandonState(startUs: Long, lastUs: Long,
                                n: Long, nPurchase: Long)
  final case class AbandonOut(user_id: Long, session_start_us: Long,
                              session_end_us: Long, n_events: Long,
                              n_purchases: Long, end_reason: String)

  /** Arbitrary-stateful session close-out with EVENT-TIME TIMEOUT
    * (`flatMapGroupsWithState` + `GroupStateTimeout.EventTimeTimeout`) —
    * the piece of the stateful API surface [[sessionizeStateful]] does
    * not exercise: a per-user session that sees no further events is
    * closed by the WATERMARK, not by a successor event. This is the
    * abandoned-cart/abandoned-browse primitive: emit each user session
    * with its purchase count and HOW it ended —
    *
    *  - `'gap'`:     a later event arrived more than `gapMinutes` after
    *                 the session's last event (closed in-line, like the
    *                 batch sessionizer);
    *  - `'timeout'`: no successor arrived and the event-time watermark
    *                 passed `last event + gap` — the state store drops
    *                 the key and the session emits exactly once.
    *
    * A session neither closed by a gap nor passed by the watermark stays
    * in state and does NOT emit (on an unbounded stream it is still
    * open; the oracle mirrors that withholding).
    *
    * Timeout bookkeeping is in MILLISECONDS (the `GroupState` API's
    * unit): the timeout registers at `floorDiv(lastUs, 1000) + gapMs`,
    * and Spark fires it when the event-time watermark moves STRICTLY
    * past that instant. All three boundary facts pinned empirically by
    * `ProfAbandon --micro` (sessions ending at ±1 ms / ±500 µs around
    * `wm − gap`, sentinel maxes with sub-ms components): a session
    * whose registered timeout lands exactly ON the terminal watermark
    * does NOT fire (`timeoutTimestamp < watermark`, strict), the
    * registered instant is the ms-FLOOR of the last event's µs
    * timestamp, and the terminal watermark is `floor_ms(max ts) −
    * delay` (the max's sub-ms component is floored away before the
    * delay subtraction). The oracle states the resulting predicate
    * literally: emit-by-timeout iff
    * `last_us // 1000 + gap_ms < max_us // 1000 − delay_ms`.
    *
    * Complete-source contract (how the gate runs it): all events arrive
    * in ONE data micro-batch (file source, ≤ 1000 files), so the
    * in-batch iterator sees every event of a user at once (sorted by
    * (ts, event_id) in the function — Spark does not order the group
    * iterator) and the terminal no-data micro-batch
    * (`noDataMicroBatches`, on by default) delivers the timeouts. Under
    * that contract streaming output is deterministic and equals the
    * batch sessionization gated by the terminal watermark — which is
    * exactly what the DuckDB oracle states.
    */
  def abandonedSessions(events: org.apache.spark.sql.Dataset[AbEv],
                        gapMinutes: Int = 30)
      : org.apache.spark.sql.Dataset[AbandonOut] = {
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L
    implicit val stEnc: org.apache.spark.sql.Encoder[AbandonState] =
      org.apache.spark.sql.Encoders.product[AbandonState]
    implicit val outEnc: org.apache.spark.sql.Encoder[AbandonOut] =
      org.apache.spark.sql.Encoders.product[AbandonOut]
    events.groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[AbandonState, AbandonOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[AbEv], state: GroupState[AbandonState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(AbandonOut(userId, st.startUs, st.lastUs,
              st.n, st.nPurchase, "timeout"))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.tsUs, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer[AbandonOut]()
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val p = if (e.event_type == "purchase") 1L else 0L
              if (st == null) st = AbandonState(e.tsUs, e.tsUs, 1, p)
              else if (e.tsUs - st.lastUs > gapUs) {
                out += AbandonOut(userId, st.startUs, st.lastUs,
                  st.n, st.nPurchase, "gap")
                st = AbandonState(e.tsUs, e.tsUs, 1, p)
              } else st = AbandonState(st.startUs, e.tsUs,
                st.n + 1, st.nPurchase + p)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(
                Math.floorDiv(st.lastUs, 1000L) + gapMs)
            }
            out.iterator
          }
      }
  }

  /** [[abandonedSessions]] over the events table as a file-source
    * stream: watermarked µs-normalized events → the stateful close-out
    * → append-mode memory sink, drained synchronously. Emits closed
    * sessions only (gap- or timeout-ended); still-open sessions stay in
    * state, exactly as they would on an unbounded stream.
    */
  def abandonedStreaming(spark: SparkSession, sfDir: String,
                         queryName: String, gapMinutes: Int = 30,
                         delay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.sources.Tables.schemaOf(spark, s"$sfDir/events.parquet")
    val events = graft.sources.Tables.microTs(
      tableStream(spark, sfDir, "events", schema))
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsUs"), col("event_type"), col("ts"))
      .as[AbEv]
    val out = abandonedSessions(events, gapMinutes)
      .select(col("user_id"),
        timestamp_micros(col("session_start_us")).as("session_start"),
        timestamp_micros(col("session_end_us")).as("session_end"),
        col("n_events"), col("n_purchases"), col("end_reason"))
    drainToParquet(spark, out, queryName, tableBytes(sfDir, "events"))
  }

  /** Streaming exact dedup — the streaming twin of
    * [[graft.functions.Dedup.exact]]: keep the FIRST document seen per
    * normalized-content fingerprint, forgetting fingerprints once the
    * watermark passes them. Plain `dropDuplicates` on a stream keeps
    * every key forever (the classic unbounded-state OOM at 100 TB/day);
    * `dropDuplicatesWithinWatermark` bounds state to the late-data
    * horizon, which is the correct contract for continuous corpus
    * ingestion where a true duplicate re-arriving months later is a new
    * document for retention purposes.
    */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
                  watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp",
        md5(graft.functions.TextAnalysis.normalized(col("text"))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Watermark LATE-DATA DROP replay — the negative path every other
    * streaming row deliberately avoids (they run complete sources where
    * the watermark drops nothing and prove batch parity). Here wave 1
    * (events from Jan 2 on) advances the watermark to max(ts) − 10 min;
    * wave 2 is ENTIRELY day-1 events — weeks late — and must be
    * dropped by the stateful hourly aggregation, not aggregated. In
    * APPEND mode a window emits once the watermark REACHES its end
    * (eviction predicate `window.end <= watermark`), so the final table
    * is exactly wave 1's hours with `hour_end <= watermark` (the last
    * sliver of hours never finalizes — that is watermark semantics, not
    * loss; the oracle applies the same `<=` cutoff, including the
    * boundary case where the watermark lands exactly on an hour end).
    * Proves both drop and finalization arithmetic.
    */
  def lateDropReplay(spark: SparkSession, sfDir: String,
                     queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.sources.Tables.microTs(
      spark.read.parquet(s"$sfDir/events.parquet")).cache()
    val cut = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val root = graft.core.Scratch.fastTempDirectory("graft_late",
      tableBytes(sfDir, "events"))
    val dropDir = root.resolve("drop")
    java.nio.file.Files.createDirectories(dropDir)
    def drop(name: String, slice: DataFrame): Unit = {
      val stage = root.resolve(s"stage_$name")
      slice.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      graft.core.Scratch.moveSinglePart(stage, ".parquet",
        dropDir.resolve(s"$name.parquet"))
    }
    try {
      drop("wave1", events.filter(col("ts") >= lit(cut)))
      val stream = spark.readStream.schema(events.schema)
        .parquet(dropDir.toString)
      val agg = stream
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Money.round2(Money.moneySum(col("value"))).as("sum_value"))
        .select(col("w.start").as("hour_start"), col("event_type"),
          col("n_events"), col("sum_value"))
      val q = startAt8(spark, tableBytes(sfDir, "events"))(agg.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .format("memory")
        .queryName(queryName)
        .start())
      try {
        q.processAllAvailable() // watermark now max(wave1) − 10 min
        drop("wave2", events.filter(col("ts") < lit(cut))) // weeks late
        q.processAllAvailable() // must drop wave 2, finalize wave 1
      } finally q.stop()
    } finally {
      events.unpersist(blocking = false)
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    spark.table(queryName)
  }

  /** Checkpoint-restart replay: the exactly-once contract a production
    * stream lives on. Wave 1 is processed by a first query incarnation
    * writing through a parquet SINK with a CHECKPOINT location; the
    * query is stopped (a deploy, a crash), wave 2 arrives, and a brand-
    * new incarnation starts against the SAME checkpoint + sink. The
    * file-source offsets and the sink's transaction log must hand over
    * exactly: wave 1 is neither re-emitted (no duplicates) nor wave 2
    * missed. The batch sales derivation is the oracle — a hash match
    * proves exactly-once across the restart, not just at-least-once.
    */
  def restartReplay(spark: SparkSession, sfDir: String): DataFrame = {
    val sales = graft.sources.Entities.sales(spark, sfDir).cache()
    val root = graft.core.Scratch.fastTempDirectory("graft_restart",
      tableBytes(sfDir, "lineitem") * 2)
    val dropDir = root.resolve("drop")
    java.nio.file.Files.createDirectories(dropDir)
    val sink = root.resolve("sink").toString
    val ckpt = root.resolve("ckpt").toString
    def drop(mod: Int): Unit = {
      val stage = root.resolve(s"stage_$mod")
      sales.filter(col("sale_id") % 2 === mod)
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      graft.core.Scratch.moveSinglePart(stage, ".parquet",
        dropDir.resolve(s"wave_$mod.parquet"))
    }
    def runIncarnation(): Unit = {
      // Trigger.AvailableNow: process everything present at start, then
      // terminate GRACEFULLY — no external stop() at all. This both
      // models the incarnation semantics exactly (a bounded run that
      // "dies" after its data) and avoids the processAllAvailable→stop
      // interrupt race, which at sf1 reproducibly leaked every local
      // scheduler core (two hung gate runs, each parked forever on the
      // NEXT 1-task write job with an idle JVM — see PLANS.md round 8).
      val q = spark.readStream.schema(sales.schema)
        .parquet(dropDir.toString)
        .writeStream
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    try {
      drop(0)
      runIncarnation() // first incarnation consumes wave 0, then "dies"
      drop(1)
      runIncarnation() // restart: same checkpoint, same sink, new query
      graft.core.Scratch.materializeAndDelete(
        spark.read.parquet(sink)
          .orderBy("sale_id", "customer_id", "product_id", "sale_date",
            "quantity", "discount", "shipping_cost", "order_status",
            "payment_mode"),
        root)
    } finally {
      sales.unpersist(blocking = false)
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
    }
  }

  /** End-to-end [[dedupStream]] replay for the oracle gate: the
    * documents table streamed through the file source (arrival
    * timestamps synthesized from doc_id — deterministic), deduped on
    * the normalized-content fingerprint, emitting the SURVIVING
    * FINGERPRINT SET. Which member of a duplicate group survives is
    * arrival-order-dependent (micro-batch internals), so the gate pins
    * the invariant that IS deterministic: exactly one row per distinct
    * fingerprint, none lost — hash-equal to batch `SELECT DISTINCT
    * md5(normalized(text))`.
    */
  def dedupStreamReplay(spark: SparkSession, sfDir: String,
                        queryName: String): DataFrame = {
    val schema = graft.sources.Tables.schemaOf(spark, s"$sfDir/documents.parquet")
    val docs = tableStream(spark, sfDir, "documents", schema)
      .withColumn("ts",
        (lit(1704067200L) + col("doc_id")).cast("timestamp"))
    drainToMemory(spark,
      dedupStream(docs).select("fp")
        .writeStream.outputMode(OutputMode.Append()), queryName,
      tableBytes(sfDir, "documents"))
  }
}
