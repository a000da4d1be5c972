package graft

import graft.core.GraftSession
import java.nio.file.{Files, Paths}

/** Replay-wall bench for the rows [[Bench.excluded]] keeps out of the
  * headline artifact (VERDICT r13 task 3). Those 14 rows are
  * side-effecting ETL replays — MERGE/SCD2 write paths, snapshot
  * commits, stream-input re-writes, bucket-table staging — so they had
  * ZERO perf tracking: a write-path regression was invisible to every
  * bench artifact while staying green in the correctness gate.
  *
  * Protocol — deliberately different from [[Bench]] and documented as
  * such: each row runs ONCE, cold, in fixed alphabetical order, after
  * the same JVM/codegen warm-up. No warm-min: every invocation
  * re-writes its target (a second pass would measure re-writing the
  * same bytes plus whatever the first pass left in the page cache, a
  * number that is neither cold nor steady-state). One-shot walls are
  * noisier than warm-min walls; read round-over-round diffs against
  * the `__calibration` probe and treat <30% moves as noise. The value
  * of the artifact is catching the 2×+ write-path regression class,
  * which one-shot resolution sees fine.
  *
  * Emits one JSON line and writes `BENCH_replay.json` (override via
  * SPARK_GRAFT_BENCH_OUT). Optional args restrict to named rows.
  */
object BenchReplay {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (args.nonEmpty) "/tmp/bench_replay_subset.json"
      else "/root/repo/BENCH_replay.json")
    val spark = GraftSession.builder(appName = "graft-bench-replay",
      master = s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val picked = Bench.excluded.toSeq.sorted
      .filter(n => args.isEmpty || args.contains(n))
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // same host-speed probe as Bench, so cross-round replay-wall diffs
    // can cancel ambient host drift the same way
    val calibration = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 50000000L, 1, cpus.toInt)
        .selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }.min

    val walls = picked.map { name =>
      val t0 = System.nanoTime()
      val rows =
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch {
          case e: Throwable =>
            errors(name) =
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            -1L
        }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[replay] $name%-24s $dt%7.2f s rows=$rows%9d")
      name -> dt
    }
    val total = walls.map(_._2).sum

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qJson = walls.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"replay_total","value":$total,"unit":"sec","queries":$qJson,"errors":$errJson,"protocol":"one-shot cold (side-effecting rows; see BenchReplay scaladoc)","__calibration":$calibration,"sf":${jstr(sfDir)}}"""
    try {
      Files.writeString(Paths.get(outFile), json + "\n")
      System.err.println(s"[replay] wrote $outFile")
    } catch { case e: Throwable =>
      System.err.println(s"[replay] could not write $outFile: ${e.getMessage}")
    }
    println(json)
    spark.stop()
  }
}
