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

  // ---- the LSH lift: near-dup classification against a stored index

  private def lshCorpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "totally unrelated corpus content sits in this row here")
  ).toDF("doc_id", "text")

  private def lshWave = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta"), // corpus dup of 1
    (11L, "fresh wave words that overlap with nothing else at all"), // novel
    (12L, "one two three four five six seven eight"), // wave keeper
    (13L, "one two three four five six seven eight"), // batch dup of 12
    (14L, "alpha beta gamma delta epsilon zeta eta theta") // corpus wins over wave pair (10,14)
  ).toDF("doc_id", "text")

  test("incrementalMinhash: corpus_dup / batch_dup / novel with keepers") {
    val idx = Dedup.minhashBands(lshCorpus)
    val out = Dedup.incrementalMinhash(idx, lshWave).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), Option(r.get(3)))).toMap
    assert(out(10L)._1 == "corpus_dup" && out(10L)._2 == 1L)
    assert(out(10L)._3.contains(1.0), "identical text estimates 1.0")
    assert(out(11L) == (("novel", 11L, None)))
    assert(out(12L)._1 == "novel" && out(12L)._2 == 12L,
      "first wave sighting is the keeper")
    assert(out(13L)._1 == "batch_dup" && out(13L)._2 == 12L)
    assert(out(14L)._1 == "corpus_dup" && out(14L)._2 == 1L,
      "an index match outranks a concurrent wave match")
  }

  test("incrementalMinhash index update: next wave sees wave-1 novelty") {
    val idx0 = Dedup.minhashBands(lshCorpus)
    val wave1 = Dedup.incrementalMinhash(idx0, lshWave)
    val novelKeepers = lshWave.join(
      wave1.filter($"status" === "novel").select("doc_id"), Seq("doc_id"))
    val idx1 = idx0.unionByName(Dedup.minhashBands(novelKeepers))
    val wave2 = Dedup.incrementalMinhash(idx1,
      Seq((20L, "one two three four five six seven eight"))
        .toDF("doc_id", "text"))
    val r = wave2.head
    assert(r.getString(1) == "corpus_dup" && r.getLong(2) == 12L,
      "wave-1 novel content is wave-2 corpus state")
  }

  test("incrementalMinhash: empty index classifies without corpus dups") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Dedup.incrementalMinhash(Dedup.minhashBands(empty), lshWave)
    assert(out.filter($"status" === "corpus_dup").isEmpty)
    // without corpus state, 13 pairs with 12 and 14 pairs with 10
    assert(out.filter($"status" === "batch_dup").count() == 2)
    assert(Dedup.incrementalMinhash(Dedup.minhashBands(lshCorpus), empty)
      .isEmpty)
  }

  // ---- Bloom pre-pruning over the exact index

  test("bloomPrunedIncremental: no false negatives, exact verdicts") {
    val out = Dedup.bloomPrunedIncremental(Dedup.exactIndex(corpus), batch)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getString(2), Option(r.get(3)))).toMap
    // a Bloom filter can lie "maybe", never "no": every true corpus dup
    // MUST be a bloom hit, and its verdict comes from the exact join
    assert(out(10L) == ((true, "corpus_dup", Some(1L))))
    assert(out(14L) == ((true, "corpus_dup", Some(2L))))
    // novel docs: status novel, no keeper, whatever the filter said
    for (id <- Seq(11L, 12L, 13L))
      assert(out(id)._2 == "novel" && out(id)._3.isEmpty)
    // at m=2^17 over a 2-fp index, the novel docs clear the filter —
    // the join input is exactly the dup set
    assert(Seq(11L, 12L, 13L).forall(!out(_)._1),
      "high-novelty wave must be pruned before the join")
  }

  test("bloom false positives cost a probe, never an answer") {
    // m=64, k=2 over a 3-fp index: ~9% of bits set, FP rate ~1% per
    // novel doc. Scan a 300-doc all-novel wave: any FPs that occur must
    // still classify novel (the exact join decides), and build/probe
    // must agree with a straight membership recomputation
    val wave = (100L until 400L).map(i => (i, s"unique text number $i"))
      .toDF("doc_id", "text")
    val out = Dedup.bloomPrunedIncremental(Dedup.exactIndex(corpus), wave,
      mBits = 64, k = 2).collect()
    assert(out.length == 300)
    assert(out.forall(r => r.getString(2) == "novel" && r.isNullAt(3)),
      "false positives must never change a verdict")
  }

  test("bloomBuild packs exactly the k·|index| derived bit positions") {
    val words = Dedup.bloomBuild(Dedup.exactIndex(corpus), mBits = 128, k = 4)
    assert(words.length == 2)
    val setBits = words.map(java.lang.Long.bitCount).sum
    // corpus has 2 distinct fingerprints → ≤ 8 positions (collisions
    // can only lower the count), and at least k (one fp sets k bits)
    assert(setBits >= 4 && setBits <= 8, s"unexpected bit count $setBits")
  }

  private def incLabels(stored: Seq[(Long, Long)],
                        wave: Seq[(Long, Long)],
                        universe: Seq[Long]): Map[Long, Long] =
    Dedup.incrementalClusters(
        stored.toDF("v", "label"), wave.toDF("doc_a", "doc_b"),
        universe.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incrementalClusters merges stored components through the wave") {
    // stored: {5,7}→5 and {10,11}→10; wave doc 2 links to 7 and edge
    // 11–7 bridges both old clusters → everything lands on min doc 2;
    // untouched docs 9 and 20 stay singletons
    val out = incLabels(
      stored = Seq((5L, 5L), (7L, 5L), (10L, 10L), (11L, 10L)),
      wave = Seq((2L, 7L), (11L, 7L)),
      universe = Seq(2L, 5L, 7L, 9L, 10L, 11L, 20L))
    assert(Seq(2L, 5L, 7L, 10L, 11L).forall(out(_) == 2L), s"$out")
    assert(out(9L) == 9L && out(20L) == 20L)
  }

  test("incrementalClusters equals a full recompute on a split edge set") {
    // path 1-2-3-4-5-6 plus clique {8,9}; edges touching docs 2 and 5
    // arrive as the wave, the rest are yesterday's corpus
    val all = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (8L, 9L))
    val isWave = (e: (Long, Long)) =>
      Set(2L, 5L).exists(d => e._1 == d || e._2 == d)
    val old = all.filterNot(isWave)
    val wave = all.filter(isWave)
    val universe = (1L to 9L).toSeq
    val stored = Dedup.connectedComponents(
        old.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val inc = incLabels(stored, wave, universe)
    val full = Dedup.connectedComponents(all.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    universe.foreach { d =>
      assert(inc(d) == full.getOrElse(d, d),
        s"doc $d: incremental ${inc(d)} vs full ${full.getOrElse(d, d)}")
    }
  }

  test("incrementalClusters: empty wave is the identity") {
    val out = incLabels(
      stored = Seq((5L, 5L), (7L, 5L)),
      wave = Seq.empty,
      universe = Seq(5L, 7L, 8L))
    assert(out == Map(5L -> 5L, 7L -> 5L, 8L -> 8L))
  }
}
