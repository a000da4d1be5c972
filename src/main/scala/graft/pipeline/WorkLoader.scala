package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Work-dataset loader (SURVEY §3.4): the reference lists GCS work
  * directories not yet present in the `work` schema (catalog probe via
  * information_schema, `utils.py:276-335`) and copies each missing one
  * (`m_pull_work_to_pgadmin.py:9-43`). Here both sides are filesystem
  * layers: datasets under `srcRoot` missing from `dstRoot` are loaded
  * parquet→parquet.
  */
object WorkLoader {

  private def list(spark: SparkSession, root: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  def missingDatasets(spark: SparkSession, srcRoot: String,
                      dstRoot: String): Seq[String] =
    (list(spark, srcRoot).toSet -- list(spark, dstRoot).toSet).toSeq.sorted

  /** Copies every missing dataset; returns the names loaded. */
  def loadMissing(spark: SparkSession, srcRoot: String,
                  dstRoot: String): Seq[String] = {
    val missing = missingDatasets(spark, srcRoot, dstRoot)
    missing.foreach { name =>
      spark.read.parquet(s"$srcRoot/$name")
        .write.mode("overwrite").parquet(s"$dstRoot/$name")
    }
    missing
  }
}
