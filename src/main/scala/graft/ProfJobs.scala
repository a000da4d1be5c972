package graft

import graft.core.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only: per-JOB attribution for a named registry query (VERDICT
  * r12 task 3 — q_assoc / dd_ngram_jaccard / dd_winnow_pairs job
  * stacks). Runs the query warm (fills first), then prints every job
  * the timed run submits: description/callsite, stage count, wall —
  * the data that says whether a 10-job stack is semantic passes or
  * collapsible seams.
  *
  *   tools/runmain.sh graft.ProfJobs q_assoc [more...]
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(appName = "graft-prof-jobs",
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    case class J(id: Int, desc: String, stages: Int, start: Long,
                 var end: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val recording = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        if (recording.get) {
          // the NEW stages this job runs (prior stage ids were computed
          // by earlier jobs and arrive as skipped) name the exchange /
          // result this AQE materialization job is actually for
          val d = s.stageInfos.sortBy(_.stageId)
            .map(si => si.name.takeWhile(_ != '\n'))
            .mkString(" | ")
          jobs.put(s.jobId, J(s.jobId, d.take(220), s.stageIds.size, s.time))
          ()
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
        ()
      }
    })

    val names = if (args.nonEmpty) args.toSeq else Seq("q_assoc")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // untimed warm passes: memo fills + codegen
      fn(spark, sfDir).count(); fn(spark, sfDir).count()
      jobs.clear()
      recording.set(true)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      recording.set(false)
      println(f"\n[profjobs] $name warm wall=$wall%.3f s rows=$n " +
        s"jobs=${jobs.size}")
      import scala.jdk.CollectionConverters._
      jobs.values.asScala.toSeq.sortBy(_.id).foreach { j =>
        println(f"[profjobs]   job ${j.id}%3d  ${(j.end - j.start) / 1e3}%7.3f s" +
          f"  stages=${j.stages}%2d  ${j.desc}")
      }
    }
    spark.stop()
  }
}
