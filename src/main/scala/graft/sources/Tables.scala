package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw testdata readers (TPC-H-ish star schema, see TESTDATA.md).
  *
  * Parquet scans are the engine's S4 source (SURVEY.md §2.1); Catalyst
  * pushes predicates and prunes columns into these scans, so downstream
  * code just composes lazily.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    spark.read.schema(schemaOf(spark, path)).parquet(path)
  }

  /** Memoized parquet schema per (path, names+mtime+length fingerprint).
    *
    * A schema-less `spark.read.parquet(path)` runs a one-task
    * footer-read JOB per fresh relation; the round-14 job telemetry
    * attributed 5–13 such jobs (~30 ms each on local[32]) to every
    * bench query — pure fixed overhead re-paid on every pass because
    * queries rebuild their relations each invocation. The schema is
    * METADATA (this memoizes no rows and no results): passing it
    * explicitly skips the inference job and the scan plans exactly as
    * before. The fingerprint key follows the [[registerAll]] /
    * PlanMemo discipline — an append or in-place rewrite of the file
    * changes mtime/length and re-infers, so stale schemas cannot be
    * served. Size-capped defensively (clear at 512 entries; keys are
    * one per (table, fingerprint), so steady state is tens).
    */
  def schemaOf(spark: SparkSession, path: String): org.apache.spark.sql.types.StructType = {
    // Local-path contract, enforced: a non-local path (hdfs://, s3a://)
    // fingerprints to a path-only constant (java.io.File sees nothing),
    // which would serve a stale schema forever after a remote rewrite —
    // so only LOCAL files that exist are memoized; anything else
    // re-infers every call (correct, just unmemoized). Inference is
    // also conf-dependent for TIMESTAMP(NANOS) columns, so the relevant
    // legacy-conf value is part of the key.
    val f = new java.io.File(path)
    val nanosConf = spark.conf
      .getOption("spark.sql.legacy.parquet.nanosAsLong").getOrElse("")
    if (!f.exists()) return spark.read.parquet(path).schema
    val key = (path + "#" + nanosConf, fileFingerprint(f))
    if (schemaMemo.size > 512) schemaMemo.clear()
    schemaMemo.computeIfAbsent(key, _ => spark.read.parquet(path).schema)
  }

  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), org.apache.spark.sql.types.StructType]()

  /** names+mtime+length fingerprint of one table file/dir (order-free
    * sum over leaves — the same shape as [[dirFingerprint]]'s walk).
    */
  private def fileFingerprint(f: java.io.File): Long =
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids == null) 0L else kids.map(fileFingerprint).sum
    } else f.getPath.hashCode.toLong * 31 + f.lastModified() * 7 + f.length()

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS). How that surfaces depends
    * on the Spark build: older readers reject it unless
    * `spark.sql.legacy.parquet.nanosAsLong` delivers it as LONG nanos;
    * newer ones read it natively as a micro-truncated TIMESTAMP_NTZ and
    * ignore the legacy conf. [[microTs]] lands BOTH on the same
    * microsecond TimestampType (floor division — the same truncation
    * DuckDB applies reading the file; the session timezone is pinned
    * UTC so the NTZ cast is wall-clock = instant).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    microTs(table(s, d, "events"))
  }

  /** Normalize an events frame's `ts` to microsecond TimestampType
    * regardless of which nanos read path produced it (see [[events]]).
    */
  def microTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts read as unexpected type ${other.simpleString}")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view (S7, `Raptor.py:95-99`) so the
    * SQL front door (`spark.sql`) serves the same relations the DataFrame
    * API does. `events` goes through its reader so the view carries the
    * microsecond-converted `ts` the DataFrame API exposes (raw
    * registration would fail on the TIMESTAMP(NANOS) parquet column).
    *
    * Idempotent per (session, sfDir, dir fingerprint): a repeat call is
    * a guard check plus one cheap local listing, not ten fresh
    * `spark.read.parquet` relations (each new relation lists +
    * footer-reads its path — the round-12 jobs telemetry attributed
    * ~10 of sql_recursive_months' 17 jobs to exactly this). The guard
    * key folds a names+mtime+length fingerprint of the directory (the
    * PlanMemo discipline), so an append or in-place rewrite of a table
    * file re-registers instead of silently serving stale relations,
    * and stopped sessions are evicted on every call so long-lived
    * multi-session JVMs don't leak map entries. The
    * SqlLab.registerViews failure discipline applies: the guard
    * updates only AFTER every view registered, and is dropped on a
    * mid-registration failure so a retry re-registers from scratch.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    registeredDir.keySet.removeIf(_.sparkContext.isStopped)
    val key = (sfDir, dirFingerprint(sfDir))
    if (registeredDir.get(spark) == key) return
    registeredDir.remove(spark)
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir)
      else table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
    registeredDir.put(spark, key)
    ()
  }

  /** names+mtime+length fingerprint of the sfDir's table files (order-
    * free sum, like PlanMemo.fileFingerprint). Local-filesystem only by
    * contract — the driver's testdata dirs; a non-local sfDir (no such
    * deployment exists here) would fingerprint 0 and fall back to the
    * per-(session, sfDir) idempotence the guard always had.
    */
  private def dirFingerprint(sfDir: String): Long = {
    val root = new java.io.File(sfDir)
    if (!root.exists()) 0L
    else names.map(n =>
      fileFingerprint(new java.io.File(root, s"$n.parquet"))).sum
  }

  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, (String, Long)]()
}
