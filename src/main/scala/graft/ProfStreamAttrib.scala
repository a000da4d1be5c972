package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Attribution harness for the streaming family's fixed micro-batch
  * overhead (VERDICT r11 task 5): every `st_*` row costs 0.9–2.6 s at
  * sf0.1 REGARDLESS of data, and this breaks the wall down per batch
  * into Structured Streaming's own duration buckets (queryPlanning /
  * getBatch / addBatch / walCommit / commitOffsets) plus the state
  * operators' update/commit times — the facts that decide whether the
  * cost is Spark-fixed replay machinery or something the engine can
  * move. Optionally A/Bs the RocksDB state-store provider
  * (`--rocksdb`).
  *
  * Usage: `tools/runmain.sh graft.ProfStreamAttrib [sfDir] [--rocksdb]
  *         [query...]`
  */
object ProfStreamAttrib {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (pos.length > 1) pos.drop(1).toSeq
      else Seq("st_events_hourly", "st_sliding", "st_session",
        "st_dedup", "st_left_join", "st_click_purchase_join", "st_chained")
    val spark = core.GraftSession.builder(appName = "prof-stream",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (flags.contains("--rocksdb"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // Queries run strictly sequentially, so one global accumulator
    // scoped to the timed window owns every progress event posted in
    // it (the drain helpers use their own queryName strings, so keying
    // by name would miss). Durations in ms.
    class Acc {
      var batches = 0
      var trigger, planning, getBatch, addBatch, walCommit,
          commitOffsets, stateCommit, stateUpdate, rows = 0L
    }
    @volatile var acc = new Acc
    spark.streams.addListener(new StreamingQueryListener {
      import StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val a = acc
        def d(k: String) = p.durationMs.getOrDefault(k, 0L)
        a.batches += 1
        a.trigger += d("triggerExecution")
        a.planning += d("queryPlanning")
        a.getBatch += d("getBatch") + d("latestOffset")
        a.addBatch += d("addBatch")
        a.walCommit += d("walCommit")
        a.commitOffsets += d("commitOffsets")
        a.rows += p.numInputRows
        Option(p.stateOperators).foreach(_.foreach { s =>
          a.stateCommit += s.commitTimeMs
          a.stateUpdate += s.allUpdatesTimeMs + s.allRemovalsTimeMs
        })
      }
    })

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm (codegen, page cache)
      Thread.sleep(300) // listener-bus drain of the warm run's events
      acc = new Acc
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener-bus drain
      val a = acc
      println(f"$n%-24s wall=$wall%6.2f s batches=${a.batches}%2d " +
        f"rows=${a.rows}%7d | trigger=${a.trigger}%5d ms " +
        f"plan=${a.planning}%4d get=${a.getBatch}%4d " +
        f"add=${a.addBatch}%5d wal=${a.walCommit}%4d " +
        f"commitOff=${a.commitOffsets}%4d | stateUpd=${a.stateUpdate}%4d " +
        f"stateCommit=${a.stateCommit}%4d")
      ()
    }
    spark.stop()
  }
}
