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

  private def docCases(in: DataFrame): Seq[(String, () => DataFrame)] = Seq(
    "exact" -> (() => Dedup.exact(in)),
    "chunkDedup" -> (() => Dedup.chunkDedup(in)),
    "ngramJaccard" -> (() => Dedup.ngramJaccard(in)),
    "minhashLsh" -> (() => Dedup.minhashLsh(in)),
    "simhash" -> (() => Dedup.simhash(in)),
    "simhashPairs" -> (() => Dedup.simhashPairs(in)),
    "fuzzyPairs" -> (() => Dedup.fuzzyPairs(in, "doc_id", "text", 2)),
    "contamination" -> (() => Dedup.contamination(in, in)),
    "canonicalDocs" -> (() => Dedup.canonicalDocs(in, noPairs)),
    "quality" -> (() => TextAnalysis.quality(in)),
    "languageId" -> (() => TextAnalysis.languageId(in)),
    "tokenCounts" -> (() => TextAnalysis.tokenCounts(in)),
    "fingerprints" -> (() => TextAnalysis.fingerprints(in)),
    "vocabulary" -> (() => TextAnalysis.vocabulary(in)),
    "tfIdf" -> (() => TextAnalysis.tfIdf(in)),
    "repetition" -> (() => TextAnalysis.repetition(in)),
    "hashSplit" -> (() => TextAnalysis.hashSplit(in)),
    "unigramLogProb" -> (() => TextAnalysis.unigramLogProb(in)),
    "packSequences" -> (() => TextAnalysis.packSequences(in)),
    "c4Filters" -> (() => TextAnalysis.c4Filters(in)),
    "redactPii" -> (() => TextAnalysis.redactPii(in)),
    "mixtureSample" -> (() =>
      TextAnalysis.mixtureSample(in, Map("a" -> 10L), 5L)),
    "temperatureMix" -> (() => TextAnalysis.temperatureMix(in, 1000L)),
    "epochRepeat" -> (() => TextAnalysis.epochRepeat(in, Map("a" -> 2.5))),
    "winnow" -> (() => TextAnalysis.winnow(in)),
    "charEntropy" -> (() => TextAnalysis.charEntropy(in)),
    "winnowPairs" -> (() => Dedup.winnowPairs(in)),
    "bm25TopK" -> (() => Search.bm25TopK(in, Seq("anything"))),
    "stratifiedSample" -> (() => TextAnalysis.stratifiedSample(in)),
    "incrementalMinhash" -> (() =>
      Dedup.incrementalMinhash(Dedup.minhashBands(in), in)),
    "bigramLogProb" -> (() => TextAnalysis.bigramLogProb(in)),
    "lengthBucketBatches" -> (() => TextAnalysis.lengthBucketBatches(in)),
    "hybridRrf" -> (() => Search.hybridRrf(in, noVecs, Seq("anything"), noVecs)),
    "clusterBalance" -> (() => Curation.clusterBalance(in, noVecs, someCents)),
    "protoPrune" -> (() => Curation.protoPrune(noVecs, someCents)),
    "qualityPrune" -> (() => Curation.qualityPrune(in)),
    "curate" -> (() => Curation.curate(in)))

  private def vecCases: Seq[(String, () => DataFrame)] = Seq(
    "dedupClusters" -> (() => Dedup.dedupClusters(noPairs)),
    "bruteTopK" -> (() => Similarity.bruteTopK(noVecs, noVecs, 5)),
    "semDedup" -> (() => Similarity.semDedup(noVecs, someCents, 0.5)),
    "signLshPairs" -> (() => Similarity.signLshPairs(noVecs, 0.5)),
    "quantizeInt8" -> (() => Similarity.quantizeInt8(noVecs)),
    "pqEncode" -> (() => Similarity.pqEncode(noVecs, someCents, m = 2)),
    "pqTopK" -> (() => Similarity.pqTopK(noVecs, someCents, noVecs, 5, m = 2)),
    "prefixRerank" -> (() => Similarity.prefixRerank(noVecs, noVecs, 5, 50, 2)),
    "knnGraph" -> (() => Similarity.knnGraph(noVecs, someCents)),
    "probeAssign" -> (() => Similarity.probeAssign(noVecs, someCents, 2)),
    "skewSummary" -> (() => graft.operators.SkewProfile.summary(noDocs, "source")),
    "skewHotKeys" -> (() => graft.operators.SkewProfile.hotKeys(noDocs, "source")),
    "multimodal" -> (() =>
      Multimodal.extractFeatures(Multimodal.assets(noDocs)).toDF()))

  for ((name, mk) <- docCases(noDocs) ++ vecCases)
    test(s"$name: empty input -> empty output, no crash") {
      assert(mk().count() == 0L, s"$name emitted rows from an empty corpus")
    }

  // NULL text (and the empty string — its normalized cousin) rides along
  // real rows: operators may drop or null-propagate such rows, but must
  // never throw. The fixtures' text column is never null, so this class
  // is equally oracle-invisible.
  private lazy val nullDocs: DataFrame = {
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a normal document with plenty of ordinary words inside", "s0"),
        Row(2L, null, "s0"),
        Row(3L, "", "s1"))),
      noDocs.schema)
  }

  for ((name, mk) <- docCases(nullDocs))
    test(s"$name: null/empty text rows never throw") {
      assert(mk().count() >= 0L)
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
