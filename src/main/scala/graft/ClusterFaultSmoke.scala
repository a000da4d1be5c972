package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskStart}

/** Executor-loss fault-tolerance smoke (VERDICT r11 task 2) — the one
  * cluster behavior the 9-leg smoke never exercised: SIGKILL an
  * executor JVM mid-query and verify Spark's recovery produces the
  * IDENTICAL result. At 100 TB executor loss is routine (spot
  * reclaims, OOM kills, hardware); a library whose operators only ever
  * ran to completion has not demonstrated its shuffles and state
  * stores survive it.
  *
  * Two legs, each hash-compared against a healthy run in the same app:
  *
  *  1. batch — `m_customer_sales_report` (3-way join + agg-back +
  *     window tiers). The kill lands after ≥ 8 tasks have STARTED
  *     (listener-coordinated, not a sleep race), destroying one of two
  *     executors and its shuffle files; the stage retry must refetch /
  *     recompute the lost map outputs on the survivor + the standalone
  *     master's relaunched replacement.
  *  2. streaming — `st_session`'s stateful session-window stream. The
  *     HDFSBackedStateStore partitions living in the killed executor
  *     must reload from the checkpoint's delta files when their tasks
  *     reschedule — executor loss IS the state-store recovery path.
  *
  * Checksums are order-independent and exact: row count + SUM of
  * per-row xxhash64 over the canonicalized row (summed as
  * DECIMAL(38,0) — xor would cancel duplicate row pairs).
  *
  * Driven by `tools/cluster_fault_smoke.sh`, which launches the
  * 1-master + 2-worker standalone cluster as child JVMs and runs
  *
  *   tools/runmain.sh graft.ClusterFaultSmoke spark://127.0.0.1:7077 \
  *     /root/testdata/sf0.1 <graft jar>
  */
object ClusterFaultSmoke {

  /** Order-independent exact checksum: (rows, Σ xxhash64(row)). */
  private def checksum(df: DataFrame): (Long, java.math.BigDecimal) = {
    import org.apache.spark.sql.functions._
    val h = xxhash64(df.columns.map(c => col(c).cast("string")): _*)
    val r = df.select(count(lit(1)).as("n"),
      sum(h.cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
      .collect()(0)
    (r.getLong(0), r.getDecimal(1))
  }

  private def execPids(): Set[Long] = {
    val p = new ProcessBuilder("pgrep", "-f",
      "CoarseGrainedExecutorBackend").start()
    val out = new String(p.getInputStream.readAllBytes())
    p.waitFor()
    out.split("\n").filter(_.nonEmpty).map(_.trim.toLong).toSet
  }

  def main(args: Array[String]): Unit = {
    val master = args.headOption.getOrElse("spark://127.0.0.1:7077")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val jar = if (args.length > 2) args(2)
      else "/root/repo/target/scala-2.13/metamorphetldatabricksspark_2.13-0.1.0.jar"
    val spark = SparkSession.builder()
      .appName("graft-fault-smoke")
      .master(master)
      .config("spark.jars", jar)
      .config("spark.executor.memory", "8g")
      .config("spark.executor.cores", "8")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execs = spark.sparkContext.getExecutorMemoryStatus.size - 1
    def awaitExecs(n: Int, what: String): Unit = {
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (execs < n && System.nanoTime() < deadline) Thread.sleep(500)
      require(execs >= n, s"$what: needed >= $n executors, have $execs")
    }
    awaitExecs(2, "startup")
    println(s"[fault] master=$master executors=$execs pids=${execPids()}")

    // the kill is coordinated on task STARTS, not a sleep: it fires
    // only once the victim query is demonstrably mid-stage
    val tasksStarted = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskStart(t: SparkListenerTaskStart): Unit = {
        tasksStarted.incrementAndGet(); ()
      }
    })

    /** Arm a killer that SIGKILLs one executor JVM once `afterTasks`
      * more tasks have started; returns a handle reporting what died and
      * WHEN (nanoTime). The caller must require the kill timestamp to
      * precede the faulted run's completion — otherwise a fast victim
      * query can finish before the kill fires and the leg "passes"
      * without exercising recovery at all (a silent no-op receipt).
      * The killer also confirms the victim pid actually left the
      * executor set before reporting, so a failed `kill` can't pass.
      */
    def armKiller(afterTasks: Int)
        : java.util.concurrent.CompletableFuture[(Long, Long)] = {
      val base = tasksStarted.get()
      val victims = execPids()
      val done = new java.util.concurrent.CompletableFuture[(Long, Long)]()
      val th = new Thread(() => {
        try {
          while (tasksStarted.get() - base < afterTasks) Thread.sleep(20)
          val victim = victims.min // deterministic pick
          // stamp BEFORE launching the kill — a conservative early
          // bound. Stamping after waitFor() opened a flake window: a
          // SIGKILL delivered just before query completion whose
          // waitFor returned just after it would fail the
          // kill-before-completion requirement despite having
          // exercised recovery.
          val killedAt = System.nanoTime()
          new ProcessBuilder("kill", "-9", victim.toString).start().waitFor()
          val gone = Iterator.continually {
            Thread.sleep(100); !execPids().contains(victim)
          }.take(50).exists(identity)
          require(gone, s"victim pid $victim still alive after SIGKILL")
          println(s"[fault] SIGKILLed executor pid=$victim after " +
            s"${tasksStarted.get() - base} task starts (pid confirmed gone)")
          done.complete((victim, killedAt))
        } catch { case e: Throwable => done.completeExceptionally(e) }
        ()
      })
      th.setDaemon(true)
      th.start()
      done
    }

    // ── leg 1: batch mart under executor loss ──────────────────────
    val mart = () => SparkEntry.queries("m_customer_sales_report")(spark, sfDir)
    val healthy = checksum(mart())
    println(s"[fault] batch healthy: rows=${healthy._1} sum=${healthy._2}")
    val k1 = armKiller(afterTasks = 8)
    val t0 = System.nanoTime()
    val faulted = checksum(mart())
    val end1 = System.nanoTime()
    val dt1 = (end1 - t0) / 1e9
    val (victim1, killAt1) = k1.get(30, java.util.concurrent.TimeUnit.SECONDS)
    println(f"[fault] batch under kill: rows=${faulted._1} " +
      f"sum=${faulted._2} wall=$dt1%.2f s (victim=$victim1)")
    require(killAt1 < end1,
      f"batch leg did not exercise recovery: kill landed " +
        f"${(killAt1 - end1) / 1e9}%.2f s AFTER the faulted run completed")
    require(faulted == healthy,
      s"batch result diverged after executor loss: $healthy vs $faulted")
    println("[fault] PASS leg 1: batch mart identical after executor SIGKILL " +
      f"(kill ${(end1 - killAt1) / 1e9}%.2f s before completion)")

    // the standalone master relaunches the lost executor; wait so leg 2
    // starts from a full 2-executor cluster again
    awaitExecs(2, "post-kill relaunch")
    println(s"[fault] replacement executor up: executors=$execs " +
      s"pids=${execPids()}")

    // ── leg 2: stateful streaming under executor loss ──────────────
    val sHealthy = checksum(
      streaming.EventsStream.sessionWindowStreaming(
        spark, sfDir, "fault_session_healthy"))
    println(s"[fault] stream healthy: rows=${sHealthy._1} sum=${sHealthy._2}")
    val k2 = armKiller(afterTasks = 8)
    val t1 = System.nanoTime()
    val sFaulted = checksum(
      streaming.EventsStream.sessionWindowStreaming(
        spark, sfDir, "fault_session_killed"))
    val end2 = System.nanoTime()
    val dt2 = (end2 - t1) / 1e9
    val (victim2, killAt2) = k2.get(30, java.util.concurrent.TimeUnit.SECONDS)
    println(f"[fault] stream under kill: rows=${sFaulted._1} " +
      f"sum=${sFaulted._2} wall=$dt2%.2f s (victim=$victim2)")
    require(killAt2 < end2,
      f"stream leg did not exercise recovery: kill landed " +
        f"${(killAt2 - end2) / 1e9}%.2f s AFTER the faulted run completed")
    require(sFaulted == sHealthy,
      s"stream result diverged after executor loss: $sHealthy vs $sFaulted")
    println("[fault] PASS leg 2: stateful stream identical after executor SIGKILL " +
      f"(kill ${(end2 - killAt2) / 1e9}%.2f s before completion)")

    awaitExecs(2, "post-kill relaunch (leg 2)")
    println(s"[fault] PASS - both legs recovered; cluster back to $execs executors")
    spark.stop()
  }
}
