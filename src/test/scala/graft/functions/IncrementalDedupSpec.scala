package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox"),
    (2L, "lorem ipsum dolor"),
    (3L, "The  Quick   Brown Fox") // normalizes equal to doc 1
  ).toDF("doc_id", "text")

  private def batch = Seq(
    (10L, "the quick brown fox"),  // corpus dup (of keeper 1)
    (11L, "brand new content"),    // novel
    (12L, "repeated in batch"),    // batch keeper
    (13L, "repeated  IN  batch"),  // batch dup of 12 after normalize
    (14L, "LOREM IPSUM DOLOR")     // corpus dup via normalization
  ).toDF("doc_id", "text")

  test("classifies corpus_dup / batch_dup / novel with right keepers") {
    val out = Dedup.incrementalExact(Dedup.exactIndex(corpus), batch)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(10L) == ("corpus_dup", 1L))
    assert(out(14L) == ("corpus_dup", 2L))
    assert(out(11L) == ("novel", 11L))
    assert(out(12L) == ("novel", 12L), "first batch sighting is the keeper")
    assert(out(13L) == ("batch_dup", 12L))
  }

  test("index update round-trip: next wave sees this wave's novelty") {
    val idx0 = Dedup.exactIndex(corpus)
    val wave1 = Dedup.incrementalExact(idx0, batch)
    val appended = batch.join(
      wave1.filter($"status" =!= "corpus_dup" && $"doc_id" === $"keeper_doc_id")
        .select("doc_id"), Seq("doc_id"))
    val idx1 = idx0.unionByName(Dedup.exactIndex(appended))
    val wave2 = Dedup.incrementalExact(idx1,
      Seq((20L, "brand  NEW content")).toDF("doc_id", "text"))
    val r = wave2.head
    assert(r.getString(1) == "corpus_dup" && r.getLong(2) == 11L,
      "wave-1 novel content is wave-2 corpus state")
  }

  test("empty batch and empty index are both legal") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.incrementalExact(Dedup.exactIndex(corpus), empty).isEmpty)
    val out = Dedup.incrementalExact(Dedup.exactIndex(empty), batch)
    assert(out.filter($"status" === "corpus_dup").isEmpty)
    assert(out.filter($"status" === "novel").count() == 4,
      "10, 11, 12, 14 are all first sightings without corpus state")
  }
}
