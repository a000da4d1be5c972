package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute dd_incremental_cluster cost (VERDICT r9 #5).
  * Times the gate query end-to-end (warm) and reports the star-round
  * count of the LABEL-graph closure the incremental path runs — the
  * measurement that says whether the iteration count (driver-actioned
  * rounds) or the per-round joins dominate.
  */
object ProfIncr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(appName = "graft-prof-incr",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val q = SparkEntry.queries("dd_incremental_cluster")
    for (r <- 1 to 3) t(s"r$r dd_incremental_cluster")(q(spark, sfDir).count())

    // label-graph round count: rebuild the same wave/stored fixture via
    // the public entry points (dd_fuzzy pairs as the wave-edge source)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val stored = graft.functions.Dedup.connectedComponents(
      graft.functions.Dedup.minhashLsh(docs.filter(col("doc_id") % 5 =!= 0), minEstSim = 0.25))
    val wave = graft.functions.Dedup.minhashLsh(docs, minEstSim = 0.25).filter(
      col("doc_a") % 5 === 0 || col("doc_b") % 5 === 0)
    val lbl = stored.select(col("v").cast("long").as("doc_id"),
      col("label").cast("long").as("lab"))
    val labelEdges = wave
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .join(lbl.select(col("doc_id").as("doc_a"), col("lab").as("la")),
        Seq("doc_a"), "left")
      .join(lbl.select(col("doc_id").as("doc_b"), col("lab").as("lb")),
        Seq("doc_b"), "left")
      .select(coalesce(col("la"), col("doc_a")).as("doc_a"),
        coalesce(col("lb"), col("doc_b")).as("doc_b"))
    t("label-edge build")(labelEdges.count())
    val t0 = System.nanoTime()
    val (merged, rounds) =
      graft.functions.Dedup.connectedComponentsWithRounds(labelEdges)
    val n = merged.count()
    println(f"[prof] label-graph closure: $rounds rounds, " +
      f"${(System.nanoTime() - t0) / 1e9}%6.3f s, $n labeled")
    spark.stop()
  }
}
