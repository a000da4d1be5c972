package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 1/2 exact dups (case), 3 near-dup of 1, 4 unrelated but clean,
  // 5 too short, 6 too low alpha-ratio
  private val docs = Seq(
    (1L, Array.fill(3)("the quick brown fox jumps over the lazy dog").mkString(" ")),
    (2L, Array.fill(3)("the quick brown fox jumps over the LAZY dog").mkString(" ")),
    (3L, (Array.fill(2)("the quick brown fox jumps over the lazy dog") :+
      "the quick brown fox jumps over the sleepy dog").mkString(" ")),
    (4L, Array.fill(3)("completely different content with no overlap here at all").mkString(" ")),
    (5L, "too short"),
    (6L, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 23 24 25 26"))
    .toDF("doc_id", "text")

  test("curation gates quality, dedups exactly and nearly, then splits") {
    val out = Curation.curate(docs, minAlpha = 0.5, minTokens = 25,
      nearDupSim = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(!out.contains(5L), "short doc gated")
    assert(!out.contains(6L), "low-alpha doc gated")
    assert(out.contains(1L) && !out.contains(2L), "exact dup keeps min id")
    assert(!out.contains(3L), "near-dup of 1 dropped (higher id)")
    assert(out.contains(4L), "clean unique doc survives")
    assert(out.values.toSet.subsetOf(Set("train", "validation", "test")))
  }

  test("qualityPrune keeps the floor(frac·n) best per source, not globally") {
    // source a all high-alpha, source b all low-alpha: a global top-half
    // cut would keep ONLY a-docs; per-source keeps the best of b too
    val docs = Seq(
      (1L, "abcdefgh", "a"),   // alpha 1.0
      (2L, "abcdef12", "a"),   // 0.75
      (3L, "abcd1234", "a"),   // 0.5
      (4L, "ab123456", "b"),   // 0.25
      (5L, "a1234567", "b"))   // 0.125
      .toDF("doc_id", "text", "source")
    val out = Curation.qualityPrune(docs, keepFrac = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getInt(3), r.getBoolean(4))))
      .toMap
    // a: n=3 → floor(1.5)=1 kept (doc 1); b: n=2 → floor(1.0)=1 (doc 4)
    assert(out(1L) == ((1, true)) && out(2L) == ((2, false)) &&
      out(3L) == ((3, false)))
    assert(out(4L) == ((1, true)) && out(5L) == ((2, false)))
  }

  test("protoPrune drops the floor(frac·n) most prototypical per cell") {
    val emb = Seq(
      (1L, Array(1.0, 0.0)),  // cell 100, proto 1.0      → dropped
      (2L, Array(0.9, 0.1)),  // cell 100, proto ≈ 0.994
      (3L, Array(0.5, 0.5)),  // cell 100, proto ≈ 0.707
      (4L, Array(0.6, 0.8)),  // cell 200, proto 0.8
      (5L, Array(0.0, 1.0)))  // cell 200, proto 1.0      → dropped
      .toDF("vec_id", "embedding")
    val cents = Seq((100L, Array(1.0, 0.0)), (200L, Array(0.0, 1.0)))
      .toDF("centroid_id", "cvec")
    val out = Curation.protoPrune(emb, cents, dropFrac = 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(3), r.getBoolean(4))))
      .toMap
    // cell 100: n=3 → floor(1.5)=1 drop; cell 200: n=2 → floor(1.0)=1
    assert(out(1L) == ((100L, 1, true)))
    assert(out(2L) == ((100L, 2, false)))
    assert(out(3L) == ((100L, 3, false)))
    assert(out(5L) == ((200L, 1, true)))
    assert(out(4L) == ((200L, 2, false)))
  }

  test("clusterBalance caps per cell by quality and rides WindowGroupLimit") {
    // two obvious semantic cells; alpha ratios arranged so the per-cell
    // winners differ from any global quality top-N
    val balDocs = Seq(
      (1L, "abcdef"), (2L, "abc 12"), (3L, "abcde1"),
      (4L, "zzzzzz"), (5L, "zzzzz5"), (6L, "z12345"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0, 0.01)), (2L, Array(0.99, 0.0)), (3L, Array(1.0, -0.01)),
      (4L, Array(0.01, 1.0)), (5L, Array(0.0, 0.98)), (6L, Array(-0.01, 1.0)))
      .toDF("vec_id", "embedding")
    val cents = Seq((100L, Array(1.0, 0.0)), (200L, Array(0.0, 1.0)))
      .toDF("centroid_id", "cvec")
    val out = Curation.clusterBalance(balDocs, emb, cents, perCell = 2)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(rows.count(_._1 == 100L) == 2 && rows.count(_._1 == 200L) == 2)
    assert(rows.filter(_._1 == 100L).map(_._2).toSet == Set(1L, 3L),
      "cell 100 keeps its two highest-alpha docs, not the global top")
    assert(rows.filter(_._1 == 200L).map(_._2).toSet == Set(4L, 5L))
    assert(rows.forall(_._3 <= 2))
    // the cap must pre-truncate per partition before the window shuffle
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "per-cell cap did not plan a WindowGroupLimit")
  }

  test("curation is deterministic across partitioning") {
    val a = Curation.curate(docs.repartition(7), minAlpha = 0.5,
      minTokens = 25).collect().map(_.getLong(0)).sorted.toSeq
    val b = Curation.curate(docs.coalesce(1), minAlpha = 0.5,
      minTokens = 25).collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }
}
