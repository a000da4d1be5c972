package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults follow the 100 TB-scale posture (SURVEY.md §7.4(9)): AQE on
  * (runtime re-planning, skew-join splitting, shuffle coalescing), UTC
  * session timezone for deterministic date semantics (the reference pins
  * Asia/Kolkata at `ETL-Airflow/dags/tasks/utils.py:139`; we pin UTC and
  * take the run date as an explicit parameter instead — see [[RunClock]]).
  */
object GraftSession {
  def builder(appName: String = "graft", master: String = "local[32]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // local-mode: default 64m advisory would coalesce small CPU-heavy
      // shuffles (md5 minhash etc.) down to one thread
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // CSV malformedness must be a ROW property, not a projection
      // property: with parser column pruning on, a row with a corrupt
      // cell in an UNREFERENCED column silently survives DROPMALFORMED
      // (and dodges _corrupt_record), so clean-row counts change with
      // the SELECT list — a correctness trap for the dirty-drop policy
      // readers (Ingest.readCsvDropMalformed/Permissive). CSV is the
      // ingest edge, never the hot path; full-row parse there is the
      // right trade.
      .config("spark.sql.csv.parser.columnPruning.enabled", "false")
      // per-JVM warehouse: the default is $cwd/spark-warehouse, SHARED
      // across concurrent driver JVMs — two gate workers materializing
      // the legacy.db tables race on the same _temporary dir (observed
      // at the sf10 spot gate: "_temporary/0 does not exist"). Nothing
      // reads the warehouse across JVMs (materializeLegacy clears
      // orphaned locations), so a throwaway per-process dir is strictly
      // safer and stops littering the repo checkout. ONE dir per JVM
      // (lazy val), removed on exit: a fresh createTempDirectory per
      // builder() call orphaned an empty /tmp dir every time
      // getOrCreate returned the existing session.
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.ui.enabled", "false")

  private lazy val warehouseDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_warehouse")
    sys.addShutdownHook {
      try Scratch.deleteRecursively(d)
      catch { case _: Throwable => () }
    }
    d.toString
  }

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
