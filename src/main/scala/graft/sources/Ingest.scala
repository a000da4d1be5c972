package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingestion sources beyond parquet (SURVEY §2.1).
  *
  * S3  — CSV with header + schema inference (the reference reads daily
  *       sales drops this way, `ingestion_tasks.py:269-273`);
  * S5  — REST-JSON: the reference fetches JSON on the driver and builds a
  *       DataFrame by Row reflection (`utils.py:31-84`,
  *       `ingestion_tasks.py:41-44`). The HTTP client is an adapter
  *       outside the engine; the engine-side operator is "local JSON
  *       payload → DataFrame", via Spark's JSON datasource on a
  *       Dataset[String] (schema inference included);
  * S6  — local rows → DataFrame (`Raptor.py:435`).
  *
  * Inferred schemas are then pinned by `Conform.conform` (positional
  * rename + cast), so type drift in a daily file can't leak downstream
  * (SURVEY §7.4(6)).
  */
object Ingest {

  /** S3: CSV scan, header + inference (plus explicit-schema overload
    * for production paths — inference reads the file twice).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S3 hardening — malformed-row policies for dirty drops (a daily
    * file with truncated lines, stray text, or type drift must not
    * poison the load). Measured Spark semantics, pinned by
    * `IngestBadRecordsSpec`:
    *
    *  - DROPMALFORMED drops STRUCTURAL errors (token count mismatching
    *    the schema — truncated lines, extra columns, stray text)
    *    unconditionally; a failed CAST drops the row only when the
    *    failing column is REFERENCED by the query — Spark converts
    *    just the required columns, so cast-level malformedness is
    *    projection-scoped even with parser column pruning disabled
    *    (GraftSession pins `csv.parser.columnPruning.enabled=false`,
    *    which makes the STRUCTURAL verdict row-global). Both regimes
    *    are pinned by the spec; a pipeline that must treat type drift
    *    as row-fatal regardless of projection should read PERMISSIVE
    *    and filter on the corrupt column.
    *  - PERMISSIVE + `_corrupt_record` keeps every line and
    *    dead-letters the RAW text of any row with a structural error
    *    or a failed cast among the referenced columns — the
    *    audit policy. Spark requires the corrupt column declared in
    *    the schema, and a query referencing ONLY that column must
    *    cache first.
    */
  def readCsvDropMalformed(spark: SparkSession, path: String,
                           schema: StructType): DataFrame =
    spark.read.option("header", "true").option("mode", "DROPMALFORMED")
      .schema(schema).csv(path)

  def readCsvPermissive(spark: SparkSession, path: String,
                        schema: StructType): DataFrame =
    spark.read.option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record",
        org.apache.spark.sql.types.StringType))
      .csv(path)

  /** ORC sink + scan — the columnar interchange format the warehouse
    * world that isn't parquet speaks. Spark's native `orc` datasource
    * keeps the same pushdown/pruning machinery as parquet (predicate
    * pushdown into ORC stripe/row-group indexes, column projection into
    * the stripe reader), so a query over the round-tripped table plans
    * the way the parquet original does.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines interchange sink — the lowest-common-denominator
    * handoff format (every downstream tool reads it; the reference's
    * REST surfaces speak it natively). Schema-less on disk, so the
    * matching scan re-applies the ORIGINAL schema: dates and integral
    * types round-trip exactly instead of degrading to strings/longs
    * under inference, and streaming readers get the pinned schema they
    * require anyway.
    */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonLines(spark: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S5: a JSON array/lines payload already on the driver → DataFrame. */
  def readJsonPayload(spark: SparkSession, jsonLines: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(jsonLines))
  }

  /** S5 fetch adapter: GET a REST-JSON endpoint (optional bearer token —
    * the reference logs in for a JWT and sends it on each fetch,
    * `utils.py:31-84`) and hand the payload to [[readJsonPayload]].
    * `java.net.http` keeps the engine dependency-free; the fetch runs on
    * the driver exactly like the reference's `requests.get` — REST
    * payloads are driver-sized by contract (the bulk path is parquet).
    */
  def fetchJson(spark: SparkSession, url: String,
                bearerToken: Option[String] = None,
                timeout: java.time.Duration =
                  java.time.Duration.ofSeconds(30)): DataFrame = {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val client = HttpClient.newBuilder().connectTimeout(timeout).build()
    val builder = HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(timeout).GET()
    bearerToken.foreach(t => builder.header("Authorization", s"Bearer $t"))
    val resp = client.send(builder.build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"HTTP ${resp.statusCode()} fetching $url")
    readJsonPayload(spark, Seq(resp.body()))
  }

  /** S6: local rows with an explicit schema. */
  def fromRows(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), schema)

  /** S1: JDBC table scan with the reference's read parallelism
    * (`numPartitions=4`, `utils.py:197-205`). Partition-column bounds
    * should be supplied for real parallel reads; without them the JDBC
    * source reads on one connection. (No database ships in this
    * environment — the testdata path substitutes parquet — so this is
    * the connector surface, exercised only against a live JDBC URL.)
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               properties: java.util.Properties,
               numPartitions: Int = 4): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("numPartitions", numPartitions)
      .options(scala.jdk.CollectionConverters
        .PropertiesHasAsScala(properties).asScala.toMap)
      .load()

  /** S2: JDBC pushdown-query scan — arbitrary SQL executed source-side
    * (the reference wraps it as `(query) AS subquery`, `Raptor.py:19-37`;
    * the `query` option is the modern form of the same pushdown).
    */
  def readJdbcQuery(spark: SparkSession, url: String, query: String,
                    properties: java.util.Properties): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
      .options(scala.jdk.CollectionConverters
        .PropertiesHasAsScala(properties).asScala.toMap)
      .load()
}
