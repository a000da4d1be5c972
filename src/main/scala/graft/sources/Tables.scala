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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. With `spark.sql.legacy.parquet.nanosAsLong`
    * the column arrives as LONG nanos; convert to a microsecond timestamp
    * (floor division — same truncation DuckDB applies reading the file).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view (S7, `Raptor.py:95-99`) so the
    * SQL front door (`spark.sql`) serves the same relations the DataFrame
    * API does. `events` goes through its reader so the view carries the
    * microsecond-converted `ts` the DataFrame API exposes (raw
    * registration would fail on the TIMESTAMP(NANOS) parquet column).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir)
      else table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
