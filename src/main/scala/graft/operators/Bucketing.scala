package graft.operators

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) table layout — the shuffle-free join path for
  * repeated fact⨝fact joins at 100 TB.
  *
  * A normal sort-merge join exchanges BOTH sides on the join key every
  * time the join runs. Bucketing pays that shuffle ONCE at write time:
  * each side is hash-partitioned into `n` bucket files by the key (and
  * sorted within buckets), so every subsequent join between tables
  * bucketed the same way reads bucket i against bucket i directly —
  * Catalyst plans the SortMergeJoin with NO Exchange under either side,
  * and an aggregation on the bucket key afterwards reuses the same
  * partitioning (asserted in `BucketingSpec`). On a real cluster this is
  * the difference between re-shuffling the 100 TB fact per query and
  * never shuffling it again.
  *
  * Spark only recognizes bucket layouts through the catalog, so the
  * helper registers external parquet tables over a caller-owned scratch
  * path. Table names are uniqued per call; [[withColocated]] drops the
  * catalog entries when the body finishes (the caller deletes the
  * scratch tree, usually via `Scratch.materializeAndDelete`).
  */
object Bucketing {

  private val id = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Write `df` as an external parquet table bucketed+sorted by `key`
    * under `dir`, and return the registered table name.
    */
  def writeBucketed(spark: SparkSession, df: DataFrame, key: String,
                    nBuckets: Int, dir: Path, prefix: String): String = {
    val name = s"${prefix}_${id.incrementAndGet()}"
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", dir.resolve(name).toString)
      .saveAsTable(name)
    name
  }

  /** Stage both sides as bucket tables on the join key, hand them to
    * `body`, and always drop the catalog entries afterwards. The scratch
    * directory's lifetime belongs to the caller.
    */
  def withColocated(spark: SparkSession,
                    left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String,
                    nBuckets: Int, dir: Path)
                   (body: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val ln = writeBucketed(spark, left, leftKey, nBuckets, dir, "bkt_l")
    val rn = writeBucketed(spark, right, rightKey, nBuckets, dir, "bkt_r")
    try body(spark.table(ln), spark.table(rn))
    finally {
      spark.sql(s"DROP TABLE IF EXISTS $ln")
      spark.sql(s"DROP TABLE IF EXISTS $rn")
    }
  }
}
