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
  * per-query number is the MIN of two timed warm passes, so a single GC
  * pause or OS scheduling hiccup cannot print a 10x outlier for a 1 s
  * query. The cold pass total is reported alongside as `cold_total_sec`
  * so both regimes stay visible.
  *
  * A query that throws is NOT silently absorbed: its elapsed time still
  * counts (honest wall-clock) but the failure is recorded in an `errors`
  * map in the JSON, so a crash can never masquerade as a fast pass.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    val spark = GraftSession.builder(appName = "graft-bench",
      master = s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JVM/codegen warm-up so the first query doesn't absorb one-time
    // janino + classloader costs (~5 s in a fresh JVM)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // optional args restrict the run to named queries (local iteration)
    val all = SparkEntry.queries
    val picked = if (args.nonEmpty) all.filter(kv => args.contains(kv._1)) else all
    val ordered = picked.toSeq.sortBy(_._1)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def pass(): (Double, Seq[(String, Double)]) = {
      val times = ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
      (times.map(_._2).sum, times)
    }
    val (coldTotal, _) = pass() // fills shared caches, codegen, page cache
    val (_, warm1) = pass()
    val (_, warm2) = pass()
    val warm = warm1.zip(warm2).map { case ((k, a), (_, b)) => k -> math.min(a, b) }
    val total = warm.map(_._2).sum
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = warm.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"cold_total_sec":$coldTotal,"sf":${jstr(sfDir)}}"""
    try {
      Files.writeString(Paths.get(outFile), json + "\n")
      System.err.println(s"[bench] wrote $outFile")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    println(json)
    spark.stop()
  }
}
