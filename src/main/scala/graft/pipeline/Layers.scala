package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 4-layer medallion of the reference (`utils.py:160-177`): raw
  * (per-run snapshot, overwrite), legacy (full history, append keyed by
  * DAY_DT), staging (overwrite + MERGE), work (validation outputs) —
  * here as path-namespaced parquet datasets under one root.
  */
final case class LayerCatalog(root: String) {
  def path(layer: String, table: String): String = s"$root/$layer/$table"
  def raw(table: String): String = path("raw", table)
  def legacy(table: String): String = path("legacy", table)
  def staging(table: String): String = path("staging", table)
  def work(table: String): String = path("work", table)
  def reporting(table: String): String = path("reporting", table)
}

/** Layered writers.
  *
  * The reference writes JDBC with overwrite/append (`utils.py:214-246`)
  * and parquet with `repartition(2)` (`utils.py:250-263`). Our legacy
  * layer gains REAL daily partitioning: `partitionBy("DAY_DT")` makes the
  * reference's logical DAY_DT convention physical, so day-filtered reads
  * prune partitions instead of scanning history (SURVEY §1.5) — the
  * difference between reading one day and reading 100 TB.
  */
object LayerWriter {

  def overwrite(df: DataFrame, dest: String): Unit =
    df.write.mode("overwrite").parquet(dest)

  /** Append today's slice into a DAY_DT-partitioned history table. */
  def appendDaily(df: DataFrame, dest: String): Unit =
    df.write.mode("append").partitionBy("DAY_DT").parquet(dest)

  /** Idempotent daily write: dynamic partition overwrite replaces ONLY
    * the DAY_DT partitions present in `df`, leaving history intact — a
    * re-run of the same day cannot double its slice (the reference's
    * plain append has that hazard; its dup gates only check the frame
    * being written, not the table).
    */
  def overwriteDaily(df: DataFrame, dest: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("DAY_DT").parquet(dest)

  /** Reporting export: the day slice, shrunk to a couple of files
    * (reference `repartition(2)`, `utils.py:261` — `coalesce` avoids the
    * extra shuffle). With `idempotent` the export partitions by DAY_DT
    * and dynamically overwrites the day's slice, matching the legacy
    * layer's re-run safety.
    */
  def exportDaily(df: DataFrame, dayDt: java.sql.Date, dest: String,
                  idempotent: Boolean = false): Unit = {
    val slice = df.filter(col("DAY_DT") === lit(dayDt)).coalesce(2)
    if (idempotent)
      slice.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("DAY_DT").parquet(dest)
    else slice.write.mode("append").parquet(dest)
  }

  /** Bucketed managed table: co-locates future joins/aggregations on
    * the bucket key — both sides bucketed by the same key with the same
    * bucket count join with ZERO shuffle (SURVEY §7.4(9): at 100 TB the
    * fact⨝fact joins on orderkey should be bucket-co-located, not
    * shuffled per query). Requires the session catalog (`saveAsTable`).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** K1 write side: the reference's primary sink is a JDBC table write
    * with append/overwrite + post-write count
    * (`write_into_table`, `utils.py:214-246`). Delegates to [[JdbcSink]];
    * layer→table naming mirrors [[LayerCatalog]] (layer = DB schema).
    * No database ships in this environment, so like `Ingest.readJdbc`
    * this is the connector surface — mode mapping and identifier
    * handling are unit-tested; the save needs a live URL.
    *
    * @return the written row count (the reference logs
    *         `data_frame.count()` after the save, `utils.py:239-242`)
    */
  def writeJdbc(df: DataFrame, sink: JdbcSink.Config, layer: String,
                table: String, mode: String): Long = {
    JdbcSink.write(df, sink, layer, table, mode)
    df.count()
  }

  /** MERGE upsert into a parquet target with write-temp-then-swap
    * (the reference gets transactional MERGE from Postgres,
    * `utils.py:434-435`). On a plain filesystem the delete+rename swap
    * is BEST-EFFORT, not atomic: a reader in the swap window can see a
    * missing path, and a crash between delete and rename leaves the data
    * only in `<dest>__tmp`. Single-writer batch pipelines (this engine's
    * model) tolerate that; true atomicity needs a table format with
    * commit protocol (Delta/Iceberg) — out of scope per SURVEY §7.4(1).
    */
  def mergeInto(spark: SparkSession, stage: DataFrame, dest: String,
                keys: Seq[String], preserved: Seq[String]): Unit = {
    import graft.operators.MergeUpsert
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dest), spark.sparkContext.hadoopConfiguration)
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val merged =
      if (fs.exists(destPath)) {
        val target = spark.read.parquet(dest)
        MergeUpsert.merge(target.select(stage.columns.toIndexedSeq.map(col): _*), stage,
          keys, preserved)
      } else stage
    val tmp = new org.apache.hadoop.fs.Path(dest + "__tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(destPath)) fs.delete(destPath, true)
    fs.rename(tmp, destPath)
  }

  /** Partition-scoped MERGE into a `partitionCol`-partitioned target:
    * only the partitions PRESENT IN THE STAGE are read, merged, and
    * rewritten (dynamic partition overwrite — the mechanism
    * [[overwriteDaily]] already uses); every untouched partition's
    * files are left byte-identical on disk. This is the shape a
    * 100 TB history table needs: [[mergeInto]] rewrites the WHOLE
    * target per call, which is fine for a dimension-sized table and
    * pathological for a partitioned fact/history — a daily stage
    * should cost one day's rewrite, not the table's.
    *
    * Contract: `partitionCol` must be stable per merge key (part of
    * the key, or an immutable attribute) — a key whose partition value
    * CHANGED between target and stage would leave its old row in the
    * unread old partition and insert the new one elsewhere, duplicating
    * the key. That is the standard pruned-merge contract (Delta's
    * `replaceWhere`-scoped merge has the same one); [[mergeInto]]
    * remains the safe path for mutable-partition dimensions.
    *
    * Unlike the temp-swap in [[mergeInto]], untouched partitions are
    * never deleted, and the overwrite of a touched partition is a
    * per-directory job commit — the non-atomicity window shrinks from
    * the whole table to the touched slice.
    */
  def mergeIntoPartitioned(spark: SparkSession, stage: DataFrame,
                           dest: String, keys: Seq[String],
                           preserved: Seq[String],
                           partitionCol: String): Unit = {
    import graft.operators.MergeUpsert
    require(stage.columns.contains(partitionCol),
      s"stage must carry the partition column $partitionCol")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dest), spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(new org.apache.hadoop.fs.Path(dest))) {
        // the touched-partition set is small by contract (a daily stage
        // touches a handful of days); isin over it PRUNES the target
        // read to those directories
        val touched = stage.select(col(partitionCol)).distinct()
          .collect().map(_.get(0)).toIndexedSeq
        val slice = spark.read.parquet(dest)
          .filter(col(partitionCol).isin(touched: _*))
        MergeUpsert.merge(
          slice.select(stage.columns.toIndexedSeq.map(col): _*), stage,
          keys, preserved)
      } else stage
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(dest)
  }

  /** Right-to-erasure (GDPR/CCPA "forget") over a partitioned store:
    * delete every row whose `keyCol` appears in `keys`, rewriting ONLY
    * the partitions that contain a hit — the partition-scoped
    * counterpart of [[mergeIntoPartitioned]], and the operation a
    * 100 TB corpus runs weekly against its deletion queue.
    *
    * Two passes over the pruned slice, none over the full table:
    * pass 1 finds the touched partition values (a semi join against the
    * key set — broadcast when small, shuffle otherwise; Spark picks);
    * pass 2 re-reads ONLY those directories (isin-pruned scan),
    * anti-joins the keys out, and dynamic-partition-overwrites them.
    * A partition with no hit is never read twice, never rewritten —
    * its files stay byte-identical (WriterSpec). An empty key set (or
    * no hits) is a no-op.
    *
    * Same non-atomicity contract as [[mergeIntoPartitioned]]: readers
    * may observe a touched partition mid-rewrite; the window is the
    * touched slice, not the table.
    *
    * Crash-window contract (this is an ERASURE primitive, so the failure
    * mode is spelled out rather than implied): emptied-partition
    * directories are removed only AFTER the dynamic-overwrite commit. A
    * crash between the two steps leaves an emptied partition's old files
    * on disk — every "forgotten" row of that partition silently
    * resurrected on the next read. Two defenses: (1) the operation is
    * idempotent — re-running it with the same key set re-finds those
    * rows and deletes the directory, so a failed run MUST be re-run, not
    * assumed partial-complete; (2) a post-condition re-scans the touched
    * partitions after cleanup and throws if any key survived, so a run
    * that RETURNS NORMALLY is verified clean — only a crash can leave
    * the window open, and (1) closes it.
    */
  def deleteKeysPartitioned(spark: SparkSession, dest: String,
                            keyCol: String, keys: DataFrame,
                            partitionCol: String): Unit = {
    require(keys.columns.sameElements(Array(keyCol)),
      s"keys frame must be single-column [$keyCol], got " +
        keys.columns.mkString(","))
    val stored = spark.read.parquet(dest)
    // the emptied-partition cleanup below reconstructs directory names
    // from collected values; restrict to the types whose canonical
    // string form matches Spark's partition-path encoding rather than
    // silently missing a directory (TIMESTAMP's java toString carries a
    // trailing '.0' Spark's encoding does not — a stale-file trap)
    stored.schema(partitionCol).dataType match {
      case org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BooleanType |
           org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"deleteKeysPartitioned: unsupported partition type $other for " +
          s"$partitionCol (date/string/boolean/integral only)")
    }
    val touched = stored.join(keys, Seq(keyCol), "left_semi")
      .select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toIndexedSeq
    if (touched.nonEmpty) {
      // isin() never matches NULL — a null partition value needs its
      // own isNull branch or the to-be-forgotten rows in the default
      // partition silently survive the rewrite
      val (nullTouched, valTouched) = touched.partition(_ == null)
      val matchTouched =
        if (valTouched.isEmpty) col(partitionCol).isNull
        else if (nullTouched.isEmpty) col(partitionCol).isin(valTouched: _*)
        else col(partitionCol).isin(valTouched: _*) ||
          col(partitionCol).isNull
      val slice = spark.read.parquet(dest).filter(matchTouched)
      val remaining = slice.join(keys, Seq(keyCol), "left_anti")
      // dynamic overwrite only rewrites partitions PRESENT in the
      // written data — a partition emptied by the delete would silently
      // keep its old files. Clear those directories explicitly.
      val kept = remaining.select(col(partitionCol)).distinct()
        .collect().map(_.get(0)).toSet
      val emptied = touched.filterNot(kept.contains)
      remaining.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol).parquet(dest)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dest), spark.sparkContext.hadoopConfiguration)
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      emptied.foreach { v =>
        val rendered =
          if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
          else String.valueOf(v)
        fs.delete(new org.apache.hadoop.fs.Path(dest,
          ExternalCatalogUtils.getPartitionPathString(
            partitionCol, rendered)), true)
      }
      // Post-condition (see scaladoc crash-window contract): re-scan the
      // touched slice and prove zero forgotten keys survived — a wrong
      // directory-name reconstruction or a botched overwrite fails HERE,
      // loudly, instead of resurrecting erased rows on the next read.
      // The scan is partition-pruned to the touched values, so the cost
      // is one semi join over the rewritten slice, not the table.
      val survivors =
        try spark.read.parquet(dest).filter(matchTouched)
          .join(keys, Seq(keyCol), "left_semi").count()
        catch {
          // A delete that emptied EVERY partition leaves no parquet
          // footers to infer a schema from — that is full erasure, i.e.
          // zero survivors, not a verification failure.
          case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("infer schema") ||
               e.getMessage.contains("does not exist") => 0L
        }
      if (survivors != 0) throw new IllegalStateException(
        s"deleteKeysPartitioned: $survivors row(s) with forgotten keys " +
          s"survived the rewrite of $dest — store left dirty; re-run the " +
          "delete after diagnosing")
    }
  }
}

/** JDBC sink primitives (K1 write side, `utils.py:214-246`): mode map,
  * schema-qualified dbtable, read parallelism carried over from the
  * reference's reader (`numPartitions=4`, `utils.py:197-205`).
  */
object JdbcSink {
  import org.apache.spark.sql.SaveMode

  final case class Config(url: String,
                          properties: java.util.Properties = new java.util.Properties,
                          numPartitions: Int = 4)

  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** `<schema>.<table>` as the reference interpolates it
    * (`utils.py:235`) — identifiers validated so a caller-supplied name
    * can't smuggle SQL into the dbtable option.
    */
  def qualifiedTable(schema: String, table: String): String = {
    require(Ident.matches(schema), s"invalid schema identifier: $schema")
    require(Ident.matches(table), s"invalid table identifier: $table")
    s"$schema.$table"
  }

  /** The reference's strategy strings → SaveMode (`utils.py:223,237`). */
  def saveMode(strategy: String): SaveMode = strategy.toLowerCase match {
    case "overwrite" => SaveMode.Overwrite
    case "append"    => SaveMode.Append
    case other => throw new IllegalArgumentException(
      s"unsupported write strategy '$other' (append|overwrite)")
  }

  def write(df: DataFrame, cfg: Config, schema: String, table: String,
            strategy: String): Unit =
    df.write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", qualifiedTable(schema, table))
      .option("numPartitions", cfg.numPartitions)
      .options(scala.jdk.CollectionConverters
        .PropertiesHasAsScala(cfg.properties).asScala.toMap)
      .mode(saveMode(strategy))
      .save()
}

/** Pinned entity schemas + positional conform (the reference imposes
  * canonical names by column position after inferred ingest,
  * `ingestion_tasks.py:48-52` — P2 in SURVEY §2.3; we add explicit casts
  * so inferred-type drift can't leak through, SURVEY §7.4(6)).
  */
object Conform {
  import org.apache.spark.sql.types._

  val schemas: Map[String, StructType] = Map(
    "suppliers" -> StructType(Seq(
      StructField("supplier_id", StringType),
      StructField("supplier_name", StringType),
      StructField("contact_details", StringType),
      StructField("region", StringType))),
    "customers" -> StructType(Seq(
      StructField("customer_id", StringType),
      StructField("name", StringType),
      StructField("city", StringType),
      StructField("email", StringType),
      StructField("phone_number", StringType))),
    "products" -> StructType(Seq(
      StructField("product_id", StringType),
      StructField("product_name", StringType),
      StructField("category", StringType),
      StructField("selling_price", DoubleType),
      StructField("cost_price", DoubleType),
      StructField("stock_quantity", IntegerType),
      StructField("reorder_level", IntegerType),
      StructField("supplier_id", StringType))),
    "sales" -> StructType(Seq(
      StructField("sale_id", LongType),
      StructField("customer_id", StringType),
      StructField("product_id", StringType),
      StructField("sale_date", DateType),
      StructField("quantity", IntegerType),
      StructField("discount", DoubleType),
      StructField("shipping_cost", DoubleType),
      StructField("order_status", StringType),
      StructField("payment_mode", StringType))))

  /** Positional rename + explicit cast to the pinned schema. */
  def conform(df: DataFrame, entity: String): DataFrame = {
    val schema = schemas(entity)
    require(df.columns.length == schema.length,
      s"$entity expects ${schema.length} columns, got ${df.columns.length}")
    df.toDF(schema.fieldNames.toIndexedSeq: _*)
      .select(schema.fields.toIndexedSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
  }
}
