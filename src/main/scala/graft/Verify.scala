package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [query ...]")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing names restrict the dump (local iteration only;
    // the driver always runs the full inventory). --skip-existing is the
    // watchdog-resume mode (tools/localverify.py): a query whose output
    // dir already holds a _SUCCESS marker is not re-run, so a relaunch
    // after a stalled/killed JVM continues instead of starting over.
    val skipExisting = args.drop(2).contains("--skip-existing")
    val only = args.drop(2).filterNot(_ == "--skip-existing").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Single source of truth for session config: the correctness gate must
    // run under exactly the environment GraftSession defines (UTC, AQE,
    // advisory size) — an inline copy here would silently drift.
    val spark = graft.core.GraftSession.builder(appName = "graft-verify",
      master = s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Delete every query's output dir up front: with a reused outDir, a
    // query that newly crashes must read as "no spark output", not
    // silently PASS against stale parquet from a previous run.
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete(); ()
    }
    val picked = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .filter { case (name, _) =>
        !(skipExisting &&
          new java.io.File(s"$outDir/$name/_SUCCESS").exists()) }
    picked.keys.foreach { name =>
      deleteRec(new java.io.File(s"$outDir/$name"))
    }
    // Per-query wall clocks, dumped as walls.json: the sf10 gate's
    // Spark phase runs every tier row anyway (~55 min), and discarding
    // its walls left 100× sublinearity proven for only the 5
    // kernels-off bench rows (VERDICT r13 task 1). The wall includes
    // the coalesce(1) parquet write — constant protocol across rungs,
    // so fitted growth exponents are comparable. One-shot cold walls:
    // noisier than Bench's warm-min, good enough to flag superlinear
    // growth (the b > 0.9 class) at rungs Bench never visits.
    val walls = scala.collection.mutable.LinkedHashMap[String, Double]()
    // watchdog-resume keeps completed queries' walls from the previous
    // attempt (their dirs are skipped, so they'd otherwise vanish)
    val prevWalls = Paths.get(s"$outDir/walls.json")
    if (skipExisting && Files.exists(prevWalls)) {
      val txt = Files.readString(prevWalls)
      """"([^"]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(txt).foreach { m =>
        walls(m.group(1)) = m.group(2).toDouble
      }
    }
    picked.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        walls(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val wallsJson = walls
      .map { case (k, v) => s"${q(k)}: ${f"$v%.3f"}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/walls.json"), wallsJson)
    spark.stop()
  }
}
