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

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

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
    * Idempotent per (session, sfDir): a repeat call is a guard check,
    * not ten fresh `spark.read.parquet` relations (each new relation
    * lists + footer-reads its path — the round-12 jobs telemetry
    * attributed ~10 of sql_recursive_months' 17 jobs to exactly this).
    * The SqlLab.registerViews failure discipline applies: the guard
    * updates only AFTER every view registered, and is dropped on a
    * mid-registration failure so a retry re-registers from scratch.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    if (registeredDir.get(spark) == sfDir) return
    registeredDir.remove(spark)
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir)
      else table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
    registeredDir.put(spark, sfDir)
    ()
  }

  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
}
