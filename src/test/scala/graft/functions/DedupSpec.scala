package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // d1/d2 exact dups (modulo case+whitespace), d3 near-dup of d1 (one
  // word changed), d4 unrelated
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "The quick  brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the sleepy dog again and again"),
    (4L, "completely different content with no overlap whatsoever here ok"))
    .toDF("doc_id", "text")

  test("exact dedup groups case/whitespace-normalized duplicates") {
    val groups = Dedup.exact(docs).collect()
    val dupGroup = groups.filter(_.getLong(2) > 1)
    assert(dupGroup.length == 1)
    assert(dupGroup.head.getLong(1) == 1L, "keeper is min doc_id")
    assert(dupGroup.head.getLong(2) == 2L)
  }

  test("shingles: n-word windows of normalized text") {
    val sh = docs.filter($"doc_id" === 4)
      .select(org.apache.spark.sql.functions.explode(
        Dedup.shingles($"text", 3)).as("s"))
      .as[String].collect()
    assert(sh.length == 7, "9 tokens -> 7 trigrams")
    assert(sh.head == "completely different content")
    assert(sh.last == "overlap whatsoever here ok".split(" ").drop(1).mkString(" "))
  }

  test("ngram jaccard: dups score 1.0, near-dups high, unrelated absent") {
    val pairs = Dedup.ngramJaccard(docs, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.3 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard prefix filter is exact vs the exhaustive join") {
    import org.apache.spark.sql.functions._
    // real corpus slice — enough shingle-df spread for prefixes to
    // actually prune — checked at the gate's threshold (0.2) and a
    // high-selectivity one (0.5)
    val corpus = graft.sources.Tables.documents(spark, TestSpark.sf)
      .limit(300)
    val ds = Dedup.docShingles(corpus, 3, 1000)
    val sizes = ds.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    for (t <- Seq(0.2, 0.5)) {
      val exhaustive = ds.toDF("doc_a", "shingle")
        .join(ds.toDF("doc_b", "shingle"), "shingle")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_common"))
        .join(sizes.toDF("doc_a", "size_a"), "doc_a")
        .join(sizes.toDF("doc_b", "size_b"), "doc_b")
        .withColumn("jaccard", col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")))
        .filter(col("jaccard") >= t)
        .select("doc_a", "doc_b", "n_common", "jaccard")
      // dict-encoded default: transient long shingle ids, same output
      val encoded = Dedup.ngramJaccard(corpus, 3, t, 1000)
      assert(encoded.exceptAll(exhaustive).isEmpty &&
        exhaustive.exceptAll(encoded).isEmpty,
        s"dict-encoded join must equal the string-keyed join at t=$t")
      // prefix-filtered variant: exact pruning, same output
      val prefixed = Dedup.ngramJaccardPrefix(corpus, 3, t, 1000)
      assert(prefixed.exceptAll(exhaustive).isEmpty &&
        exhaustive.exceptAll(prefixed).isEmpty,
        s"prefix-filtered join must equal the exhaustive join at t=$t")
    }
  }

  test("minhash LSH surfaces the duplicate pair with est 1.0") {
    val pairs = Dedup.minhashLsh(docs, minEstSim = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0, "identical shingle sets -> identical sigs")
    assert(!pairs.contains((1L, 4L)))
  }

  test("contamination flags docs sharing shingles with the benchmark") {
    val bench = Seq(
      (100L, "what is the capital of france paris is the capital"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains a 5-shingle benchmark passage → contaminated
      (1L, "trivia night answer what is the capital of france paris wins"),
      // no benchmark 3-grams at all → clean
      (2L, "completely unrelated corpus document about something else"))
      .toDF("doc_id", "text")
    val flagged = Dedup.contamination(corpus, bench, minOverlap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(flagged.keySet == Set((1L, 100L)), s"got $flagged")
    assert(flagged((1L, 100L)) >= 3)
  }

  test("fuzzy pairs: duplicate texts collapse, null texts drop") {
    val df = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"),      // identical → dist 0
      (3L, "alpha betz"),                          // 1 edit from 1/2
      (4L, null.asInstanceOf[String]),             // must not pair
      (5L, "alpha beta gamma delta epsilon"))      // same block, too far
      .toDF("id", "t")
    val pairs = Dedup.fuzzyPairs(df, "id", "t", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs == Map((1L, 2L) -> 0, (1L, 3L) -> 1, (2L, 3L) -> 1),
      s"got $pairs")
  }

  test("simhash: identical docs identical fp; near-dups within hamming 16") {
    val fp = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    val d13 = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val d14 = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(d13 < d14, "one-word change closer than unrelated text")
    val pairs = Dedup.simhashPairs(docs, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("chunk dedup: aligned repeats found, trailing partials dropped") {
    // 12-token docs: one full 10-token chunk each (tokens 1-10); the
    // 2-token tail is a partial chunk and must NOT participate.
    // d1/d2 share tokens 1-10 but differ in the tail -> duplicate chunk.
    // d3 shares d1's tail (a partial) but not the full chunk -> absent.
    val docs = Seq(
      (1L, "a b c d e f g h i j tail1 x"),
      (2L, "a b c d e f g h i j tail2 y"),
      (3L, "z z z z z z z z z z tail1 x"))
      .toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, chunkTokens = 10).collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_occurrences") == 2L)
    assert(r.getAs[Long]("keeper_doc_id") == 1L)
  }

  test("duplicateSpans: marked windows merge into maximal cross-doc spans") {
    // A and B share exactly the 7-token run "a b c d e f g": its 5-gram
    // windows sit at A positions 1-3 and B positions 3-5; C is disjoint
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x x a b c d e f g y"),
      (3L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    // one maximal island per doc, 3 windows wide = 7 duplicated tokens
    assert(spans == Set((1L, 1, 3, 7), (2L, 3, 5, 7)))
    // minTokens floors the island width (in windows): 3-window islands
    // survive a floor of 3 and fall to one of 4
    assert(Dedup.duplicateSpans(docs, k = 5, minTokens = 3).count() == 2)
    assert(Dedup.duplicateSpans(docs, k = 5, minTokens = 4).count() == 0)
  }

  test("scrubSpans removes exactly the covered tokens, keeps unique prose") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // A and B share the 7-token run "a b c d e f g"; C is untouched
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x x a b c d e f g y"),
      (3L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val out = Dedup.scrubSpans(docs, k = 5).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    // A: span windows 1-3 cover tokens 1..7 → keep "h i j"
    assert(out(1L) == ((3, 7, md5hex("h i j"))), s"A: ${out(1L)}")
    // B: windows 3-5 cover tokens 3..9 → keep "x x" + trailing "y"
    assert(out(2L) == ((3, 7, md5hex("x x y"))), s"B: ${out(2L)}")
    // C: no cross-doc grams — full text survives
    assert(out(3L) == ((8, 0, md5hex("p q r s t u v w"))), s"C: ${out(3L)}")
  }

  test("scrubSpans: fully duplicated documents scrub to empty") {
    val docs = Seq(
      (1L, "same text in every copy here"),
      (2L, "same text in every copy here"))
      .toDF("doc_id", "text")
    val out = Dedup.scrubSpans(docs, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    val emptyFp = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.empty[Byte]).map("%02x".format(_)).mkString
    Seq(1L, 2L).foreach { d =>
      assert(out(d) == ((0, 6, emptyFp)), s"doc $d: ${out(d)}")
    }
  }

  test("clusterSignatures: elementwise min equals the merged-set signature") {
    // the algebra under test: min over a cluster's doc signatures = the
    // signature of the UNION of their shingle sets (min associative)
    val sigs = Dedup.minhashSignatures(docs)
    val byDoc = sigs.collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getString(i))).toMap
    // force {1,3} into one cluster labeled 1; 2 and 4 singletons
    val labels = Seq((1L, 1L), (3L, 1L), (2L, 2L), (4L, 4L))
      .toDF("v", "label")
    val out = Dedup.clusterSignatures(sigs, labels).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), (2 to 9).map(i => r.getString(i)))))
      .toMap
    assert(out(1L)._1 == 2L)
    val expected = byDoc(1L).zip(byDoc(3L)).map(p => Seq(p._1, p._2).min)
    assert(out(1L)._2 == expected, "pairwise elementwise min")
    assert(out(2L) == ((1L, byDoc(2L))), "singleton keeps its own sig")
    assert(out(4L) == ((1L, byDoc(4L))))
  }

  test("duplicateSpans: disjoint shared runs stay separate islands") {
    // B lifts two NON-adjacent 5-token runs of A (positions 1-5 and
    // 11-15); the gap keeps them distinct spans in both docs
    val docs = Seq(
      (1L, "a b c d e m1 m2 m3 m4 m5 v w x y z"),
      (2L, "a b c d e q1 q2 q3 q4 q5 v w x y z"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(spans == Set((1L, 1, 1, 5), (1L, 11, 11, 5),
      (2L, 1, 1, 5), (2L, 11, 11, 5)))
  }

  test("connected components: path graph converges to min label") {
    // 0-1-2-3-4-5 as a path: diameter 5 forces multiple propagation
    // rounds (each round moves the min label one hop), plus a separate
    // 2-cycle component {10,11} and pair {20,21}
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L), s"got $got")
  }

  test("simhash band layout: some band matches for any pair within maxDist") {
    // pigeonhole recall proof, adversarially exercised: maxDist
    // differing bits spread across the fingerprint must still leave one
    // of the maxDist+1 bands untouched. (A fixed 4x16-bit layout fails
    // this for maxDist > 3 — the bug this layout replaced.)
    val rng = new scala.util.Random(42)
    for (maxDist <- Seq(0, 3, 8, 16); _ <- 1 to 500) {
      val layout = Dedup.simhashBands(maxDist)
      val a = rng.nextLong()
      val flips = rng.shuffle((0 until 64).toList).take(maxDist)
      val b = flips.foldLeft(a)((v, bit) => v ^ (1L << bit))
      val anyBand = layout.exists { case (_, start, mask) =>
        ((a >> start) & mask) == ((b >> start) & mask)
      }
      assert(anyBand, s"maxDist=$maxDist flips=$flips evaded every band")
    }
  }

  test("simhash r-subset layout: full recall and exactly-once lex-first dedup") {
    // the composite-key blocking simhashPairs runs on: maxDist+r bands,
    // keys = every r-subset of band buckets. Any pair within maxDist has
    // >= r clean bands (pigeonhole), so SOME subset matches — and the
    // lex-first filter (clean bands below the subset's max must be IN
    // the subset) must keep exactly ONE of the matching meetings.
    val rng = new scala.util.Random(7)
    for (maxDist <- Seq(0, 3, 8, 16); _ <- 1 to 300) {
      val r = Dedup.simhashCleanBands(maxDist)
      val layout = Dedup.simhashBandLayout(maxDist + r)
      val subsets = layout.combinations(r).toIndexedSeq
      val notAllow = subsets.map { s =>
        val inS = s.map(b => 1L << b._1).reduce(_ | _)
        ((1L << s.map(_._1).max) - 1) & ~inS
      }
      val a = rng.nextLong()
      val flips = rng.shuffle((0 until 64).toList).take(rng.nextInt(maxDist + 1))
      val b = flips.foldLeft(a)((v, bit) => v ^ (1L << bit))
      val xor = a ^ b
      def clean(band: (Int, Int, Long)) = ((xor >> band._2) & band._3) == 0L
      val cleanMask = layout.filter(clean).map(bd => 1L << bd._1)
        .foldLeft(0L)(_ | _)
      val matching = subsets.indices.filter(i => subsets(i).forall(clean))
      assert(matching.nonEmpty,
        s"maxDist=$maxDist r=$r flips=$flips evaded every subset")
      val kept = matching.filter(i => (cleanMask & notAllow(i)) == 0L)
      assert(kept.size == 1,
        s"maxDist=$maxDist r=$r flips=$flips kept ${kept.size} meetings")
    }
  }

  test("connected components: self-pairs label their vertex as a singleton") {
    val pairs = Seq((7L, 7L), (1L, 2L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 7L, 1L -> 1L, 2L -> 1L), s"got $got")
  }

  test("connected components: empty pair list yields empty labels, no crash") {
    // a clean corpus with no near-dup pairs is a normal production input
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(pairs).collect().isEmpty)
    assert(Dedup.dedupClusters(pairs).collect().isEmpty)
  }

  test("connected components: star rounds are logarithmic on a scrambled path") {
    // 2048-vertex path whose labels are scrambled (i*1031 mod 2048, 1031
    // coprime to 2048 → a permutation): the component min sits at an
    // arbitrary chain position, so naive min-label propagation needs
    // ~diameter (2047) rounds; the star algorithm must land in O(log n)
    val n = 2048
    val perm = (0 until n).map(i => (i.toLong * 1031L) % n)
    val pairs = (0 until n - 1).map(i => (perm(i), perm(i + 1)))
      .toDF("doc_a", "doc_b")
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(pairs, maxIter = 40)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == n)
    assert(got.forall(_._2 == 0L), "single component labeled by its min (0)")
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 4
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
  }

  test("connected components: checkpoint-dir seam produces identical labels") {
    // with a checkpoint dir configured the rounds must truncate through
    // fault-tolerant checkpoint() instead of executor-pinned blocks
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      val pairs = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("doc_a", "doc_b")
      val got = Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
    } finally {
      // Option(null) inside setCheckpointDir resets it to None — later
      // suites must exercise the default localCheckpoint path again
      sc.setCheckpointDir(null)
    }
  }

  test("strideSegments: exactly floor(len/n) aligned segments, no waste") {
    val df = Seq(
      (1L, (1 to 25).map(i => s"w$i").mkString(" ")), // 25 toks -> 2 segs
      (2L, (1 to 10).map(i => s"w$i").mkString(" ")), // exactly one
      (3L, "only nine tokens are here so none gets emitted"))
      .toDF("doc_id", "text")
    val segs = df
      .select($"doc_id", org.apache.spark.sql.functions.split($"text", " ").as("toks"))
      .repartition($"doc_id")
      .select($"doc_id",
        org.apache.spark.sql.functions.explode(
          Dedup.strideSegments($"toks", 10)).as("chunk"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = segs.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byDoc.getOrElse(1L, Nil).size == 2)
    assert(byDoc(1L).head == (1 to 10).map(i => s"w$i").mkString(" "))
    assert(byDoc(1L)(1) == (11 to 20).map(i => s"w$i").mkString(" "))
    assert(byDoc.getOrElse(2L, Nil) == Seq((1 to 10).map(i => s"w$i").mkString(" ")))
    assert(!byDoc.contains(3L), "9-token doc emits no segment")
  }

  test("connected components: bridge doc merges two LSH clusters") {
    // {1,2} and {3,4} would be separate pairwise clusters; 2-3 bridges
    // them — the transitivity near-dup pairs lack and closure restores
    val pairs = Seq((1L, 2L), (3L, 4L), (2L, 3L)).toDF("doc_a", "doc_b")
    val clusters = Dedup.dedupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(clusters.toSet ==
      Set((1L, 1L, 4L, true), (2L, 1L, 4L, false),
        (3L, 1L, 4L, false), (4L, 1L, 4L, false)))
  }

  test("canonical selection keeps the longest doc, not the min id") {
    // cluster {1,2,3}: doc 3 is longest -> keeper, despite max id;
    // cluster {5,6}: equal lengths -> tie falls to min id 5;
    // doc 4 is unclustered -> not emitted
    val corpus = Seq(
      (1L, "a b"), (2L, "a b c d"), (3L, "a b c d e f"),
      (4L, "unrelated text"), (5L, "x y z"), (6L, "p q r"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.canonicalDocs(corpus, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSet == Set(
      (1L, 1L, 2, 3L, false), (2L, 1L, 4, 3L, false), (3L, 1L, 6, 3L, true),
      (5L, 5L, 3, 2L, true), (6L, 5L, 3, 2L, false)))
  }

  test("softWeights: cluster mass sums to one, singletons keep weight 1") {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    // labels cover docs 1-3 as one component; 4 and 5 are unlabeled
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("v", "label")
    val out = Dedup.softWeights(corpus, labels).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((1L, 3L, 0.333333333)), s"decimal-9 third: $out")
    assert(out(2L)._3 == 0.333333333 && out(3L)._3 == 0.333333333)
    assert(out(4L) == ((4L, 1L, 1.0)), "singleton labels itself, weight 1")
    assert(out(5L) == ((5L, 1L, 1.0)))
    assert(out.size == 5, "every document keeps a row — nothing dropped")
  }

  test("chunk dedup: within-doc repetition counts occurrences, not docs") {
    // 20 tokens = two aligned chunks, both identical -> n_occurrences 2
    // in ONE doc; n_docs stays 1, so it is NOT a cross-doc duplicate
    val tokens = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, s"$tokens $tokens")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, chunkTokens = 10).collect()
    assert(out.isEmpty, "single-doc repeats must not be cross-doc groups")
  }
}
