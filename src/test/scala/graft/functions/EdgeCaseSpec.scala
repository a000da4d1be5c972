package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Empty-corpus sweep: every text/dedup/similarity operator must treat
  * an EMPTY input as a normal production input (a fully-filtered
  * partition, a new source with no documents yet) — returning an empty
  * result, never throwing. The oracle fixtures are always non-empty, so
  * this entire failure class is invisible to the correctness gate
  * (the advisor's recurring "fixture-masked edge" finding); this spec
  * covers it mechanically for every operator at once.
  */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val noDocs: DataFrame =
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
  private lazy val noPairs: DataFrame =
    Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
  private lazy val noVecs: DataFrame =
    Seq.empty[(Long, Seq[Float], Int)].toDF("vec_id", "embedding", "label")
  private lazy val someCents: DataFrame =
    Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("centroid_id", "cvec")

  private def emptyCases: Seq[(String, () => DataFrame)] = Seq(
    "exact" -> (() => Dedup.exact(noDocs)),
    "chunkDedup" -> (() => Dedup.chunkDedup(noDocs)),
    "ngramJaccard" -> (() => Dedup.ngramJaccard(noDocs)),
    "minhashLsh" -> (() => Dedup.minhashLsh(noDocs)),
    "simhash" -> (() => Dedup.simhash(noDocs)),
    "simhashPairs" -> (() => Dedup.simhashPairs(noDocs)),
    "fuzzyPairs" -> (() => Dedup.fuzzyPairs(noDocs, "doc_id", "text", 2)),
    "contamination" -> (() => Dedup.contamination(noDocs, noDocs)),
    "canonicalDocs" -> (() => Dedup.canonicalDocs(noDocs, noPairs)),
    "dedupClusters" -> (() => Dedup.dedupClusters(noPairs)),
    "quality" -> (() => TextAnalysis.quality(noDocs)),
    "languageId" -> (() => TextAnalysis.languageId(noDocs)),
    "tokenCounts" -> (() => TextAnalysis.tokenCounts(noDocs)),
    "fingerprints" -> (() => TextAnalysis.fingerprints(noDocs)),
    "vocabulary" -> (() => TextAnalysis.vocabulary(noDocs)),
    "tfIdf" -> (() => TextAnalysis.tfIdf(noDocs)),
    "repetition" -> (() => TextAnalysis.repetition(noDocs)),
    "hashSplit" -> (() => TextAnalysis.hashSplit(noDocs)),
    "unigramLogProb" -> (() => TextAnalysis.unigramLogProb(noDocs)),
    "packSequences" -> (() => TextAnalysis.packSequences(noDocs)),
    "c4Filters" -> (() => TextAnalysis.c4Filters(noDocs)),
    "redactPii" -> (() => TextAnalysis.redactPii(noDocs)),
    "mixtureSample" -> (() =>
      TextAnalysis.mixtureSample(noDocs, Map("a" -> 10L), 5L)),
    "winnow" -> (() => TextAnalysis.winnow(noDocs)),
    "curate" -> (() => Curation.curate(noDocs)),
    "bruteTopK" -> (() => Similarity.bruteTopK(noVecs, noVecs, 5)),
    "semDedup" -> (() => Similarity.semDedup(noVecs, someCents, 0.5)),
    "signLshPairs" -> (() => Similarity.signLshPairs(noVecs, 0.5)),
    "quantizeInt8" -> (() => Similarity.quantizeInt8(noVecs)),
    "multimodal" -> (() =>
      Multimodal.extractFeatures(Multimodal.assets(noDocs)).toDF()))

  for ((name, mk) <- emptyCases)
    test(s"$name: empty input -> empty output, no crash") {
      assert(mk().count() == 0L, s"$name emitted rows from an empty corpus")
    }

  test("topkSketch: empty input -> empty token map, no crash") {
    val out = noDocs
      .select(explode(split(TextAnalysis.normalized(col("text")), " "))
        .as("token"))
      .agg(SpaceSavingTopK.topkSketch(col("token"), 100).as("m"))
      .selectExpr("explode(m) AS (token, est_count)")
    assert(out.count() == 0L)
  }

  test("profile: empty frame -> defined all-zero stats rows, no crash") {
    val rows = graft.quality.Raptor.profile(
      Seq.empty[(Double, Double)].toDF("a", "b"), Seq("a", "b")).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L),
      "n and n_null must be 0 on an empty frame")
  }
}
