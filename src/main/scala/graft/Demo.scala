package graft

import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.functions.{ModeAgg, TextAnalysis}

/** Minimal library-surface example: fingerprint expressions (incl. the
  * custom codegen'd fnv1a64) and the typed mode aggregator.
  *
  *   runMain graft.Demo
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]",
      shufflePartitions = 4)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_demo_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("[demo] custom expression via the SQL front door:")
    spark.sql("SELECT fnv1a64('hello world') AS fnv").show(false)

    println("[demo] bucketed co-located join (no shuffle):")
    val l = (1 to 100).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val r = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    graft.pipeline.LayerWriter.writeBucketed(l, "demo_l", "k", 4)
    graft.pipeline.LayerWriter.writeBucketed(r, "demo_r", "k", 4)
    val j = spark.table("demo_l").join(spark.table("demo_r"), "k")
    j.collect()
    println("  exchanges in plan: " +
      j.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange hashpartitioning")))

    val docs = Seq((1L, "Hello  World"), (2L, "hello world"),
      (3L, "spark engine")).toDF("doc_id", "text")
    println("[demo] fingerprints:")
    TextAnalysis.fingerprints(docs).show(false)

    println("[demo] typed mode aggregator:")
    Seq(("a", "UPI"), ("a", "UPI"), ("a", "Cash"), ("b", "Cash"), ("b", "UPI"))
      .toDF("k", "v").as[(String, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(ModeAgg.toColumn.name("mode"))
      .orderBy("key")
      .show(false)
    spark.stop()
  }
}
