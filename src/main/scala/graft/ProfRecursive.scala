package graft

/** A/B harness for the sql_recursive_months job-stack finding (round-12
  * jobs-per-query telemetry). Hypothesis was that Spark schedules one
  * job per recursive iteration, so a binary range-split recursion
  * (⌈log₂ N⌉ iterations) should beat the `+1` stepping form (N
  * iterations) — MEASURED AND REJECTED at sf0.1: step+1 runs 7 jobs /
  * 0.73 s, binary-split 42 jobs / 1.10 s. `UnionLoopExec` executes a
  * simple-projection recursive term over a local anchor without
  * per-iteration scheduled jobs; the split form's VALUES join in the
  * recursive term plans an exchange whose jobs DO stack per iteration.
  * Kept for re-measurement if Spark's recursion execution changes.
  * Usage: `runmain.sh graft.ProfRecursive [sfDir]`.
  */
object ProfRecursive {

  /** Rejected binary range-split variant (same result set). */
  private val binarySplit: String =
    """WITH RECURSIVE b AS (
      |  SELECT CAST(year(min(o_orderdate)) * 12 + month(min(o_orderdate)) - 1 AS INT) AS lo,
      |         CAST(year(max(o_orderdate)) * 12 + month(max(o_orderdate)) - 1 AS INT) AS hi
      |  FROM orders
      |),
      |mi(a, z) AS (
      |  SELECT lo, hi FROM b
      |  UNION ALL
      |  SELECT CASE WHEN t.s = 0 THEN a ELSE CAST(floor((a + z) / 2) AS INT) + 1 END,
      |         CASE WHEN t.s = 0 THEN CAST(floor((a + z) / 2) AS INT) ELSE z END
      |  FROM mi, (VALUES (0), (1)) t(s)
      |  WHERE a < z
      |),
      |m AS (SELECT make_date(CAST(floor(a / 12) AS INT), CAST(a % 12 AS INT) + 1, 1) AS month_start FROM mi WHERE a = z),
      |o AS (SELECT make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS mo,
      |             count(*) AS n_orders
      |      FROM orders GROUP BY 1)
      |SELECT m.month_start AS month_start, CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders
      |FROM m LEFT JOIN o ON m.month_start = o.mo
      |ORDER BY month_start""".stripMargin

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = core.GraftSession.builder(appName = "prof-recursive",
      master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sources.Tables.registerAll(spark, sfDir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    def time(tag: String, sql: String): Unit = {
      spark.sql(sql).count() // warm
      val best = (1 to 3).map { _ =>
        Thread.sleep(200)
        val j0 = jobs.get(); val t0 = System.nanoTime()
        val c = spark.sql(sql).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        (dt, jobs.get() - j0, c)
      }.minBy(_._1)
      println(f"$tag%-12s rows=${best._3} jobs=${best._2} min3=${best._1}%.3f s")
    }
    time("step+1", SparkEntry.oracleSql("sql_recursive_months"))
    time("binary-split", binarySplit)
    spark.stop()
  }
}
