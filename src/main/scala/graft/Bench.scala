package graft
import graft.core.GraftSession
import java.nio.file.{Files, Paths}

/** Headline benchmark. Emits exactly one JSON line on stdout (the driver
  * parses it; `run / outputStrategy := StdoutOutput` keeps sbt's logger
  * prefix off it) AND writes the same JSON to a well-known file
  * (`bench_out.json`, override via SPARK_GRAFT_BENCH_OUT) — stdout
  * scraping has proven fragile across sbt/log configurations, so the file
  * is the canonical artifact and stdout the convenience copy.
  *
  * Determinism: queries run in fixed alphabetical order, and a full
  * untimed warm pass runs first so shared cache fills (SqlLab mart views,
  * raptor memo, dedup shingle/signature caches) and per-query codegen are
  * not attributed to whichever query happens to run first. The reported
  * per-query number is the MIN over the two timed warm passes in which the
  * query SUCCEEDED, so a single GC pause or OS scheduling hiccup cannot
  * print a 10x outlier for a 1 s query — and a pass that crashed fast
  * cannot masquerade as a fast success (a failing time is used only when
  * the query failed in BOTH warm passes). The cold pass is reported
  * per-query (`cold_queries`) and in total (`cold_total_sec`) so a cold
  * regression is attributable, not hidden in one number.
  *
  * A query that throws is NOT silently absorbed: its elapsed time still
  * counts toward its pass (honest wall-clock) and the failure is recorded
  * in an `errors` map keyed `<query>@<pass>`, so which regime broke is
  * visible in the artifact.
  */
object Bench {

  /** End-to-end ETL replays, not queries: `pipeline_backfill` runs 5 full
    * daily pipeline executions (4 ingests → 3 marts → MERGE → 7 reporting
    * exports, all writing parquet layers) per invocation — disk-write IO
    * orders of magnitude above any query here, and 3 bench passes would
    * re-run it 15×. `st_csv_drop` likewise re-WRITES the whole sales
    * fact as three CSV drop files and re-streams them on every
    * invocation (an ingest replay: ~5 s of encode+decode IO at sf0.1,
    * none of it query work). Both stay in the CORRECTNESS gate (Verify
    * runs every query); the bench measures query throughput. The
    * exclusions are declared in the JSON (`excluded`) so the artifact is
    * explicit about what the total does not contain. `st_upsert` is the
    * same class: it re-WRITES the events table as three parquet waves
    * and MERGE-rewrites the dimension three times per invocation — an
    * ETL replay, not a query.
    */
  // k4_merge_partitioned is the same class: it writes the whole orders
  // table as a partitioned parquet target and merge-rewrites a month
  // per invocation — an ETL replay, not a query. ann_index_append
  // likewise builds, appends and deletes a fresh stored index per
  // invocation (index maintenance, measured by its spec and gate).
  // src_orc_roundtrip rewrites the orders table through the ORC sink
  // per invocation — format-interchange ETL, not a query.
  // q_bucketed_join stages both sides as bucket tables per invocation —
  // the one-time layout write a co-located join amortizes, an ETL replay
  // by the same rule as the merges above.
  // k6_forget writes the whole orders table month-partitioned and
  // replays a partition-scoped delete per invocation — same ETL-replay
  // class as k4_merge_partitioned. src_schema_evolution rewrites the
  // orders table as two parquet waves per invocation — format/layout
  // ETL like the ORC round trip.
  // k7_timetravel commits the orders table three times into a fresh
  // snapshot store per invocation — the same class.
  // st_restart re-writes the sales fact as two parquet waves and runs
  // two full query incarnations per invocation — st_csv_drop's class.
  // k8_skipping commits the orders table twice into a fresh snapshot
  // store (range-laid-out, with stats) per invocation — k7's class.
  val excluded: Set[String] = Set("pipeline_backfill", "st_csv_drop",
    "st_restart", "st_late_drop", "st_upsert", "k4_merge_partitioned",
    "k6_forget", "k7_timetravel", "k8_skipping", "ann_index_append",
    "src_orc_roundtrip", "src_schema_evolution", "src_badrecords",
    "q_bucketed_join")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // subset runs (named queries = local iteration) must not clobber
    // the committed artifact of record — they default to /tmp
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (args.nonEmpty) "/tmp/bench_subset.json"
      else "/root/repo/bench_out.json")
    val spark = GraftSession.builder(appName = "graft-bench",
      master = s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JVM/codegen warm-up so the first query doesn't absorb one-time
    // janino + classloader costs (~5 s in a fresh JVM)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // optional args restrict the run to named queries (local iteration);
    // explicitly naming an excluded query overrides the exclusion
    val all = SparkEntry.queries
    val picked =
      if (args.nonEmpty) all.filter(kv => args.contains(kv._1))
      else all.filter(kv => !excluded.contains(kv._1))
    val ordered = picked.toSeq.sortBy(_._1)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Jobs-per-query telemetry: a global job-start counter, read as a
    // delta around each query. Queries run strictly sequentially, so
    // every job submitted during a query's window belongs to it —
    // including micro-batch jobs a streaming query runs on its own
    // execution thread, which a job-group tag would miss. Job-start
    // events fire at SUBMISSION (before the action returns), so the
    // post-action read sees them; the short stability poll below
    // absorbs listener-bus lag. Stacked fixed per-job overhead on
    // cached inputs is the recurring cost disease (ProfDsir), and this
    // column makes it visible in the artifact instead of per-profile.
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); ()
        }
      })
    val jobsByQuery = scala.collection.mutable.LinkedHashMap[String, Int]()
    // Attribution caveat (telemetry, not an exact count): the stability
    // poll waits for the counter to sit still, but async work that
    // keeps submitting past the spin cap (streaming micro-batches
    // draining their own thread, late AQE re-optimization jobs) leaks
    // its jobs into the NEXT query's delta. Streaming rows get a 10×
    // longer cap (~2.5 s) because their sinks demonstrably trail the
    // action's return; read cross-round jobs diffs as a ranking signal,
    // not an exact ledger.
    def drainedJobCount(maxSpins: Int): Int = {
      var prev = jobCount.get()
      var stable = 0
      var spins = 0
      while (stable < 2 && spins < maxSpins) {
        Thread.sleep(5)
        val cur = jobCount.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        spins += 1
      }
      prev
    }
    def spinCapFor(name: String): Int = if (name.startsWith("st_")) 500 else 50
    // per-pass: (query, elapsed sec, succeeded)
    def pass(tag: String, countJobs: Boolean = false): Seq[(String, Double, Boolean)] =
      ordered.map { case (name, fn) =>
        val j0 = if (countJobs) drainedJobCount(spinCapFor(name)) else 0
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              errors(s"$name@$tag") =
                Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
              false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        if (countJobs) jobsByQuery(name) = drainedJobCount(spinCapFor(name)) - j0
        (name, dt, ok)
      }
    // Shared cache fills run BEFORE the cold pass, each timed as its own
    // named line: filling them inside the pass would land a shared build
    // cost on whichever consumer runs first alphabetically (round-4 cold
    // artifact: three 10-15 s sql_* lines that were ~0.5 s queries;
    // round-5: dd_canonical at 13 s that is a 0.2 s query). A fill runs
    // only when one of its consumers is selected.
    val fillLines = scala.collection.mutable.ArrayBuffer[(String, Double, Boolean)]()
    def timeFill(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      val ok =
        try { body; true } catch {
          case e: Throwable =>
            errors(s"$name@cold") =
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            false
        }
      fillLines += ((name, (System.nanoTime() - t0) / 1e9, ok))
    }
    // SQL-lab mart views + legacy catalog tables
    if (ordered.exists(_._1.startsWith("sql_")))
      timeFill("__sqllab_fill")(sqllab.SqlLab.registerViews(spark, sfDir))
    // dedup/curation memo fills (LSH signatures, pair-graph closure,
    // band index) — declared next to the queries that consume them
    functions.TrainingQueries.coldFills.foreach { case (name, consumers, thunk) =>
      if (ordered.exists(kv => consumers(kv._1)))
        timeFill(name)(thunk(spark, sfDir))
    }
    // Host-speed calibration: a fixed, self-contained, data-independent
    // probe (CPU-bound hash-reduce over a generated range) timed as the
    // min of 3 runs. Cross-round warm-total comparisons divide by this
    // to cancel ambient host drift (~10% day-to-day on this builder —
    // round 7 spent an adjudication cycle attributing exactly that).
    val calibration = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 50000000L, 1, cpus.toInt)
        .selectExpr("bit_xor(xxhash64(id))").collect() // xor: no ANSI overflow
      (System.nanoTime() - t0) / 1e9
    }.min
    val cold = fillLines.toSeq ++ pass("cold") // fills remaining caches, codegen, page cache
    val warm1 = pass("warm1")
    // jobs are counted on the LAST warm pass: fully warm caches, so the
    // count is the steady-state job shape, not cache-fill jobs
    val warm2 = pass("warm2", countJobs = true)
    val warm = warm1.zip(warm2).map { case ((k, a, okA), (_, b, okB)) =>
      val succeeded = Seq(a -> okA, b -> okB).collect { case (t, true) => t }
      k -> (if (succeeded.nonEmpty) succeeded.min else math.min(a, b))
    }
    val total = warm.map(_._2).sum
    val coldTotal = cold.map(_._2).sum
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val exclJson = excluded.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    val jobsJson = jobsByQuery.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(warm)},"jobs":$jobsJson,"errors":$errJson,"cold_total_sec":$coldTotal,"cold_queries":${jmap(cold.map(c => c._1 -> c._2))},"excluded":$exclJson,"__calibration":$calibration,"sf":${jstr(sfDir)}}"""
    // ATOMIC file write (temp + move): a reader (the driver's fallback
    // path) can never observe a half-written artifact, and a crash
    // mid-write leaves the previous artifact intact.
    try {
      val dest = Paths.get(outFile)
      val dir = Option(dest.getParent).getOrElse(Paths.get("."))
      val tmp = Files.createTempFile(dir, ".bench_out", ".tmp")
      Files.writeString(tmp, json + "\n")
      try Files.move(tmp, dest,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      System.err.println(s"[bench] wrote $outFile")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    // The one-line JSON is the LAST stdout act: r13's round-over-round
    // PERF table was erased by a driver-side stdout capture gap
    // (BENCH_r13.json parsed:null, tail truncated mid-JSON), so nothing
    // may print to stdout after it — spark.stop() runs first (its
    // SparkUI/log chatter goes to the log4j sink, but ordering it
    // before the JSON removes the risk entirely), then print + flush.
    spark.stop()
    println(json)
    System.out.flush()
  }
}
