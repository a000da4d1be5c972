package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ImportanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two sharply separated vocabularies: target docs speak "alpha beta
  // gamma", raw-only docs speak "zork quux blarg" — DSIR must pull the
  // alpha-speakers' weights above the zork-speakers'
  private val docs = Seq(
    (1L, "alpha beta gamma alpha beta", "en"),
    (2L, "beta gamma alpha gamma", "en"),
    (3L, "alpha gamma beta beta", "en"),
    (4L, "zork quux blarg zork", "xx"),
    (5L, "quux blarg zork blarg", "xx"),
    (6L, "alpha beta gamma beta", "xx")) // xx doc with target-like text
    .toDF("doc_id", "text", "lang")

  test("target-like text scores above raw-only text") {
    val w = Importance.dsirWeights(docs, col("lang") === "en", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 6)
    val tgt = Seq(1L, 2L, 3L).map(w)
    val raw = Seq(4L, 5L).map(w)
    assert(tgt.min > raw.max,
      s"every target doc must out-weigh every zork doc: $w")
    // the xx doc WRITTEN IN target vocabulary must score like the
    // target docs, not like its lang label — that is the whole point
    // of importance weighting over surface features
    assert(w(6L) > raw.max, s"target-vocab doc 6 must beat zork docs: $w")
  }

  test("sample: k rows, dense ranks, deterministic") {
    val s1 = Importance.dsirSample(docs, col("lang") === "en", k = 4,
      buckets = 64).collect()
    assert(s1.length == 4)
    assert(s1.map(_.getInt(4)).sorted.sameElements(1 to 4))
    val s2 = Importance.dsirSample(docs, col("lang") === "en", k = 4,
      buckets = 64).collect()
    assert(s1.map(_.toString).sameElements(s2.map(_.toString)),
      "Gumbel keys are md5-derived: two runs must be bit-identical")
  }

  test("degenerate target (no docs match) still yields finite weights") {
    val w = Importance.dsirWeights(docs, col("lang") === "nope",
      buckets = 64)
      .collect().map(_.getDouble(2))
    assert(w.length == 6)
    assert(w.forall(v => !v.isNaN && !v.isInfinite),
      "add-one smoothing must keep an empty target finite")
  }

  test("buckets < 2 fails loudly") {
    val ex = intercept[IllegalArgumentException](
      Importance.dsirWeights(docs, col("lang") === "en", buckets = 1))
    assert(ex.getMessage.contains("buckets"))
  }
}
