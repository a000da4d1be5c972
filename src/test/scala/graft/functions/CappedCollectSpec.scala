package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CappedCollectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("groups at or under the cap collect completely (sorted = collect_list)") {
    val df = Seq((1L, 10L), (1L, 30L), (1L, 20L), (2L, 5L))
      .toDF("k", "v").repartition(4)
    val got = df.groupBy("k")
      .agg(sort_array(CappedCollect.cappedLongList(col("v"), 4)).as("ds"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == Map(1L -> Seq(10L, 20L, 30L), 2L -> Seq(5L)))
  }

  test("overflowing groups surface exactly cap elements (the pigeonhole)") {
    // 100 values in one group with cap 5: buffer never exceeds 5, and
    // size == cap > maxDf is the discard signal the caller filters on
    val df = spark.range(100).select(lit(1L).as("k"), col("id").as("v"))
      .repartition(8)
    val sizes = df.groupBy("k")
      .agg(size(CappedCollect.cappedLongList(col("v"), 5)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(sizes == Map(1L -> 5))
  }

  test("winnowPairs output identical to an uncapped collect_list form " +
    "under a viral boilerplate fingerprint") {
    // 40 docs sharing one viral template sentence (fp df = 40 >> maxDf
    // = 16 → every template fp bucket must be DISCARDED identically by
    // both forms) plus near-dup pairs via a long shared passage
    val template = "all work and no play makes jack a dull boy " * 4
    val passage = "the quick brown fox jumps over the lazy dog again " * 5
    val docs = (0 until 40).map { i =>
      val body = if (i % 10 < 2) passage + s" unique tail $i"
      else s"document number $i with its own distinct content entirely $i"
      (i.toLong, template + body)
    }.toDF("doc_id", "text").repartition(8)

    val capped = Dedup.winnowPairs(docs, k = 8, w = 4)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Long)].collect().toSeq
    // uncapped reference: same plan with plain collect_list
    val wfp = TextAnalysis.winnow(docs, 8, 4)
    val uncapped = wfp.groupBy("fp")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")).between(2, 16))
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))),
          y => struct(x.as("a"), y.as("b")))))).as("pr"))
      .groupBy(col("pr.a").as("doc_a"), col("pr.b").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= 5)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(capped.nonEmpty, "fixture must produce at least one pair")
    assert(capped == uncapped)
  }
}
