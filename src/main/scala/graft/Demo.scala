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
      shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

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
