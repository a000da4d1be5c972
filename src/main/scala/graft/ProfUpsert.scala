package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: reproduce the sf1 st_upsert wave-separation divergence —
  * logs each foreachBatch's row count and wave composition so a merged
  * batch (two drops in one micro-batch) is visible directly.
  */
object ProfUpsert {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf1")
    val spark = GraftSession.builder(appName = "graft-prof-upsert",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type", "value")
    val root = java.nio.file.Files.createTempDirectory("prof_upsert")
    val dropDir = root.resolve("drop")
    java.nio.file.Files.createDirectories(dropDir)
    def drop(mod: Int): Unit = {
      ev.filter(col("event_id") % 3 === mod)
        .write.mode("append").parquet(dropDir.toString)
      println(s"[prof] dropped wave $mod; files now: " +
        java.nio.file.Files.list(dropDir).count())
    }
    drop(0)
    val q = spark.readStream.schema(ev.schema).parquet(dropDir.toString)
      .writeStream
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val byWave = batch.groupBy((col("event_id") % 3).as("wave"))
          .count().collect().map(r => s"wave${r.get(0)}=${r.getLong(1)}")
          .mkString(", ")
        println(s"[prof] batch $id: ${batch.count()} rows ($byWave)")
        ()
      }
      .start()
    try {
      q.processAllAvailable(); println("[prof] barrier after wave 0")
      drop(1); q.processAllAvailable(); println("[prof] barrier after wave 1")
      drop(2); q.processAllAvailable(); println("[prof] barrier after wave 2")
    } finally q.stop()
    graft.core.Scratch.deleteRecursively(root)
    spark.stop()
  }
}
