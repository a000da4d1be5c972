package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.TestSpark
import graft.sources.Ingest

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference FNV-1a (property oracle for the codegen'd
    * Catalyst expression).
    */
  private def fnvRef(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    h
  }

  test("Fnv1a64 expression matches the reference implementation (property)") {
    val gen = Gen.listOfN(50, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.nonEmptyListOf(Gen.choose('\u0080', '\u4e50')).map(_.mkString)))
    val strs = (1 to 5).flatMap(i => gen.apply(
      Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).get)
    val got = strs.toDF("s")
      .select(Fnv1a64.fnv1a64(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(got == strs.map(fnvRef))
  }

  test("Fnv1a64 survives both codegen and interpreted paths, null-safe") {
    val df = Seq(Some("abc"), None, Some("")).toDF("s")
      .select(Fnv1a64.fnv1a64(col("s")).as("h"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == fnvRef("abc"))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getLong(0) == 0xcbf29ce484222325L, "empty = offset basis")
  }

  test("ModeAgg agrees with the window-based mode incl. tie-breaks") {
    val rows = Seq(
      (1, "UPI"), (1, "UPI"), (1, "Cash"),
      (2, "Cash"), (2, "UPI"),         // tie -> smaller value: Cash
      (3, "Card")).toDF("k", "v")
    val agg = rows.as[(Int, String)].groupByKey(_._1)
      .mapValues(_._2)
      .agg(ModeAgg.toColumn.name("mode"))
      .collect().toMap
    // window-based mode (the reference's W2 shape)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(desc("cnt"), asc("v"))
    val windowed = rows.groupBy("k", "v").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("k", "v").as[(Int, String)].collect().toMap
    assert(agg == windowed)
    assert(agg(2) == "Cash")
  }

  test("ModeAgg reduce/merge are associative-safe on splits") {
    val vals = Seq("a", "b", "a", "c", "a", "b")
    val whole = vals.foldLeft(ModeAgg.zero)(ModeAgg.reduce)
    val (l, r) = vals.splitAt(3)
    val merged = ModeAgg.merge(
      l.foldLeft(ModeAgg.zero)(ModeAgg.reduce),
      r.foldLeft(ModeAgg.zero)(ModeAgg.reduce))
    assert(ModeAgg.finish(whole) == ModeAgg.finish(merged))
    assert(ModeAgg.finish(whole) == "a")
  }

  test("Ingest: CSV with header+inference round-trips typed data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val f = dir.resolve("t.csv")
    java.nio.file.Files.writeString(f,
      "id,name,price\n1,widget,9.99\n2,gadget,19.5\n")
    val df = Ingest.readCsv(spark, f.toString)
    assert(df.schema.map(_.dataType.typeName) ==
      Seq("integer", "string", "double"))
    assert(df.count() == 2)
  }

  test("Ingest: ORC round-trip preserves schema and every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orcspec")
    try {
      val orig = graft.sources.Tables.orders(spark, TestSpark.sf)
      Ingest.writeOrc(orig, dir.toString)
      val back = Ingest.readOrc(spark, dir.toString)
      assert(back.schema == orig.schema,
        "ORC must carry the exact parquet schema through")
      assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty,
        "round-trip must preserve the exact multiset of rows")
    } finally graft.core.Scratch.deleteRecursively(dir)
  }

  test("Ingest: local JSON payload via Row reflection path") {
    val df = Ingest.readJsonPayload(spark, Seq(
      """{"id": 1, "tags": ["a", "b"], "score": 0.5}""",
      """{"id": 2, "tags": [], "score": 1.5}"""))
    assert(df.count() == 2)
    assert(df.select(sum("score")).first().getDouble(0) == 2.0)
  }

  test("sketch aggregates: HLL distinct and GK quantiles within bounds") {
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
    val exactD = li.select(countDistinct("l_partkey")).first().getLong(0)
    val approxD = li.select(approx_count_distinct("l_partkey")).first().getLong(0)
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"HLL $approxD vs exact $exactD")
    val exactP = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    val approxP = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.01)(0)
    assert(math.abs(approxP - exactP) / exactP < 0.05,
      s"GK median $approxP vs exact $exactP")
  }

  test("fingerprints: three hash families over normalized text") {
    val fps = TextAnalysis.fingerprints(
      Seq((1L, "Hello  World"), (2L, "hello world")).toDF("doc_id", "text"))
      .collect()
    assert(fps(0).getString(1) == fps(1).getString(1), "md5 normalized equal")
    assert(fps(0).getLong(3) == fps(1).getLong(3), "fnv normalized equal")
    assert(fps(0).getLong(3) == fnvRef("hello world"))
  }

  test("repetition metrics flag degenerate docs, pass varied ones") {
    val out = TextAnalysis.repetition(Seq(
      (1L, "spam spam spam spam"),        // fully degenerate
      (2L, "one two three four"),          // fully varied
      (3L, "solo"))                        // single token: no bigrams
      .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((4, 0.75, 1.0, 1.0)), s"got ${out(1L)}")
    assert(out(2L) == ((4, 0.0, 0.25, 1.0 / 3)), s"got ${out(2L)}")
    assert(out(3L) == ((1, 0.0, 1.0, 0.0)), "no bigrams -> coverage 0")
  }

  test("redactPii: adjacent and repeated PII all redacted, counts exact") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "mail a.b@x.io and c@d.org call 555-123-4567 from 10.0.0.1"),
      (2L, "no pii here at all"),
      (3L, "ip 192.168.1.1 twice 192.168.1.1 and 999-999-9999")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_emails") == 2)
    assert(out(0).getAs[Int]("n_phones") == 1)
    assert(out(0).getAs[Int]("n_ips") == 1)
    assert(out(1).getAs[Int]("n_emails") == 0 &&
      out(1).getAs[Int]("n_phones") == 0 && out(1).getAs[Int]("n_ips") == 0)
    assert(out(2).getAs[Int]("n_ips") == 2)
    assert(out(2).getAs[Int]("n_phones") == 1)
    // the redacted text no longer matches any PII pattern
    val re = TextAnalysis.redactPii(
      docs.select(col("doc_id"),
        org.apache.spark.sql.functions.concat_ws(" ",
          col("text"), col("text")).as("text")))
      .orderBy("doc_id").collect()
    assert(re(0).getAs[Int]("n_emails") == 4)
  }

  test("c4Filters: each rule flips keep independently") {
    val base = "This sentence has exactly eight small words here."
    val docs = Seq(
      (1L, base),                                  // keeps
      (2L, base.dropRight(1)),                     // no terminal punct
      (3L, s"$base lorem ipsum."),                 // boilerplate
      (4L, s"$base { code }."),                    // code marker
      (5L, "Tiny one.")).toDF("doc_id", "text")    // too few words
    val out = TextAnalysis.c4Filters(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("keep"))
    assert(!out(1).getAs[Boolean]("keep") &&
      !out(1).getAs[Boolean]("has_terminal_punct"))
    assert(!out(2).getAs[Boolean]("keep") && out(2).getAs[Boolean]("has_lorem"))
    assert(!out(3).getAs[Boolean]("keep") &&
      out(3).getAs[Boolean]("has_code_marker"))
    assert(!out(4).getAs[Boolean]("keep") && out(4).getAs[Int]("n_words") < 5)
  }

  test("unigramLogProb: rare-token documents score below common-token ones") {
    // 10 docs of corpus-dominant tokens, one of hapaxes: the unigram
    // model must rank the hapax doc far lower; a doc of the most common
    // token scores exactly ln(count/total) (single distinct token)
    val common = (1L to 10L).map(i => (i, "the cat sat on the mat"))
    val rare = Seq((99L, "zyx qwv jkl"))
    val docs = (common ++ rare).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out(99L)._1 == 3)
    assert(out(1L)._1 == 6)
    assert(out(99L)._2 < out(1L)._2 - 1.0,
      s"hapax doc must score far below: ${out(99L)._2} vs ${out(1L)._2}")
    // hand-check: hapax tokens each appear once in 63 total tokens
    val expected = math.log(1.0 / 63.0)
    assert(math.abs(out(99L)._2 - expected) < 1e-6)
  }

  test("charEntropy: hand-computed values, degenerate floor, prose band") {
    val docs = Seq(
      (1L, "aaaa"),            // single symbol: H = 0
      (2L, "abab"),            // two equiprobable symbols: H = ln 2
      (3L, "abcd"),            // four equiprobable: H = ln 4
      (4L, "the quick brown fox jumps over the lazy dog")) // prose-ish
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out(1L) == ((4, 0.0)))
    assert(math.abs(out(2L)._2 - math.log(2)) < 1e-8)
    assert(math.abs(out(3L)._2 - math.log(4)) < 1e-8)
    // natural English text sits in the 2.5-3.2 nat band — the signal a
    // gibberish threshold reads
    assert(out(4L)._2 > 2.5 && out(4L)._2 < 3.3, s"got ${out(4L)._2}")
    assert(out(1L)._2 < out(2L)._2 && out(2L)._2 < out(3L)._2)
  }

  test("stratifiedSample: balanced, order-independent, reproducible") {
    val docs = (1L to 50L).map(i => (i, if (i <= 40) "big" else "small"))
      .toDF("doc_id", "source")
    val pick = TextAnalysis.stratifiedSample(docs, n = 5).collect()
      .map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(pick("big").size == 5, "stratum larger than n truncates to n")
    assert(pick("small").size == 5, "stratum at n keeps all")
    // the draw is a property of the ids: reversing input order (and
    // therefore partition layout) must pick the identical subset
    val reversed = TextAnalysis.stratifiedSample(
      docs.orderBy(col("doc_id").desc), n = 5).collect()
      .map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(reversed == pick)
  }

  test("bm25: rare term outranks repeated common term; misses never rank") {
    // df(rare)=1 -> idf = ln(1 + 3.5/1.5) = 1.204; df(common)=3 -> idf =
    // ln(1 + 1.5/3.5) = 0.357. tf saturation (k1) caps doc 2's 6x common
    // count at 0.654 < one rare hit's 1.204; doc 4 matches nothing and
    // must not appear at all (the posting filter drops it at the scan)
    val docs = Seq(
      (1L, "rare common alpha beta gamma delta"),
      (2L, "common common common common common common"),
      (3L, "common alpha beta gamma delta epsilon"),
      (4L, "zeta eta theta iota kappa lambda"))
      .toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, Seq("rare", "common"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L), "only matching docs rank")
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L), "rare-hit doc first")
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(byDoc(1L)._2 == 2 && byDoc(2L)._2 == 1 && byDoc(3L)._2 == 1)
    assert(byDoc(1L)._3 - byDoc(3L)._3 > byDoc(2L)._3 - byDoc(3L)._3,
      "the rare-term contribution must exceed five extra saturated common hits")
    val scores = out.map(_._3).toSeq
    assert(scores == scores.sorted.reverse, "descending by score")
  }

  test("winnow guarantee holds on generated corpora (property form)") {
    // 20 generated pairs, one planted shared fragment of exactly
    // k+w-1 = 11 normalized chars each (the guarantee's minimum), at
    // random positions inside otherwise-independent random prose; all
    // 40 docs go through ONE winnow call. Every pair must share >= 1
    // fingerprint — the positional guarantee, not a hash accident.
    val rng = new scala.util.Random(4242)
    def word() = (1 to (2 + rng.nextInt(6)))
      .map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    def prose(n: Int) = Seq.fill(n)(word()).mkString(" ")
    val docs = (0 until 20).flatMap { i =>
      val frag = prose(4).take(11) // 11 normalized chars incl. spaces
      def host = {
        val (l, r) = (prose(3 + rng.nextInt(8)), prose(3 + rng.nextInt(8)))
        s"$l $frag $r"
      }
      Seq((i * 2L, host), (i * 2L + 1, host))
        .map { case (id, t) => (id, t) }
    }.toDF("doc_id", "text")
    val bySet = TextAnalysis.winnow(docs, k = 8, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 until 20).foreach { i =>
      val (a, b) = (i * 2L, i * 2L + 1)
      assert((bySet(a) & bySet(b)).nonEmpty,
        s"pair $i shares an 11-char fragment but no fingerprint")
    }
  }

  test("bpeTrain: merge order, merged symbols re-pair, left-to-right overlap") {
    import spark.implicits._
    val docs = Seq((1L, "abab abab cd"), (2L, "aaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (a,b) ×2 in each 'abab' = 4. Round 2: (ab,ab)=2 ties
    // (a,a)=2 from 'aaa' — lexicographic tie-break takes (a,a), and the
    // left-to-right merge folds ' a  a  a ' to ' aa  a ' (one merge
    // consumes the left overlap). Round 3: the MERGED symbol re-pairs —
    // (ab,ab)=2. Round 4: (aa,a)=1 ties (c,d)=1, tie-break on lhs.
    assert(out(0) == ((1, "a", "b", 4L)), out.mkString(","))
    assert(out(1) == ((2, "a", "a", 2L)), out.mkString(","))
    assert(out(2) == ((3, "ab", "ab", 2L)), "merged symbol must re-pair")
    assert(out(3) == ((4, "aa", "a", 1L)),
      "left-to-right merge leaves the overlap remainder")
  }

  test("phraseSearch: adjacency, order, overlap, repeated-term phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b"),        // "a b" twice
      (2L, "b a c"),            // reversed order — no match
      (3L, "a a a"),            // overlapping "a a" matches at 2 anchors
      (4L, "x y z"))            // no terms at all
      .toDF("doc_id", "text")
    val ab = Search.phraseSearch(docs, Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ab == Map(1L -> 2L), s"got $ab")
    val aa = Search.phraseSearch(docs, Seq("a", "a")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa == Map(3L -> 2L), "overlapping occurrences both count")
    val bac = Search.phraseSearch(docs, Seq("b", "a", "c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bac == Map(2L -> 1L), "3-term phrase chains both adjacencies")
    intercept[IllegalArgumentException](
      Search.phraseSearch(docs, Seq("a")))
  }

  test("winnow pair recall at the shipped config: measured, floored") {
    // The corpus-scale companion of the planted-fragment property test
    // above, at the dd_winnow_pairs operating point (k=8, w=4,
    // minShared=5, maxDf=16) on the sf0.01 documents: 50 KNOWN
    // containment pairs are planted — a unique 80-char fragment
    // appended to both members of each pair, in situ amid the natural
    // 500-doc corpus and its boilerplate — and recall is measured
    // against that ground truth. (An un-planted reference set does not
    // exist for this operator: on this corpus 64% of ALL doc pairs
    // share ≥ 5 winnow fingerprints through common phrasing, which is
    // exactly the noise the maxDf cap exists to suppress — the shipped
    // config keeps 77 of those 79 292, so the cap is the PRECISION
    // knob; recall comes from the planted fragments' rare prints.)
    import org.apache.spark.sql.functions._
    val sf01 = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.documents(spark, sf01)
      .select("doc_id", "text")
    val rng = new scala.util.Random(1117)
    def frag() = (1 to 80).map(_ =>
      if (rng.nextInt(6) == 0) ' ' else ('a' + rng.nextInt(26)).toChar)
      .mkString.replaceAll(" +", " ")
    val planted: Seq[(Long, Long, String)] =
      (0 until 50).map(i => (i.toLong, (i + 250).toLong, frag()))
    val frags = planted
      .flatMap { case (a, b, f) => Seq((a, f), (b, f)) }
      .toDF("doc_id", "frag")
    val corpus = docs.join(frags, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat_ws(" ", col("text"), col("frag")).as("text"))
    val found = Dedup.winnowPairs(corpus, k = 8, w = 4,
      minShared = 5, maxDf = 16)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = planted.count { case (a, b, _) => found.contains((a, b)) }
    val recall = hits.toDouble / planted.size
    info(f"planted-containment recall $recall%.3f ($hits/${planted.size})")
    // an 80-char unique fragment guarantees ~18 shared selected prints
    // at df 2 — every planted pair must surface at minShared 5
    assert(recall >= 0.98, s"planted-containment recall was $recall")
  }

  test("winnow: shared substrings guarantee shared fingerprints") {
    import org.apache.spark.sql.functions.col
    // k=8, w=4: any common substring of length >= 11 chars must yield a
    // common selected fingerprint (the winnowing guarantee); doc 3 is
    // unrelated; doc 4 is shorter than k+w-1 -> no full window, no fps
    val docs = Seq(
      (1L, "the shared fragment here sits inside completely different prose"),
      (2L, "unrelated words surround the shared fragment here as well ok"),
      (3L, "zq xv jk wm pl nb tr cd fg hs yu io"),
      (4L, "tiny text"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(docs, k = 8, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySet = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((bySet(1L) & bySet(2L)).nonEmpty,
      "docs sharing 'the shared fragment here' must share a fingerprint")
    assert((bySet(1L) & bySet.getOrElse(3L, Set.empty)).isEmpty,
      "no shared substring -> overlap would be a hash accident")
    assert(!bySet.contains(4L), "doc below k+w-1 chars has no full window")
    // determinism + identical docs give identical sets
    val twin = Seq((9L, "the shared fragment here sits inside completely different prose"))
      .toDF("doc_id", "text")
    val twinFps = TextAnalysis.winnow(twin, k = 8, w = 4).collect()
      .map(_.getLong(1)).toSet
    assert(twinFps == bySet(1L))
  }

  test("mixtureSample: rates hit every branch, draws are deterministic") {
    import org.apache.spark.sql.functions.col
    // keep_all: budget >> tokens (rate caps at 1); none: budget 0;
    // partial: budget = half the source's tokens; deflt: default budget
    val docs = (1L to 400L).map { i =>
      val src = Seq("keep_all", "none", "partial", "deflt")((i % 4).toInt)
      (i, "w1 w2 w3 w4 w5", src)
    }.toDF("doc_id", "text", "source")
    // each source: 100 docs x 5 tokens = 500 tokens
    val out = TextAnalysis.mixtureSample(docs,
      Map("keep_all" -> 99999L, "none" -> 0L, "partial" -> 250L),
      defaultBudget = 250L)
    val kept = out.filter(col("keep")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("keep_all") == 100, "rate 1 keeps every doc")
    assert(!bySrc.contains("none"), "rate 0 keeps nothing")
    // rate 0.5 over 100 md5-uniform draws: comfortably inside (20, 80)
    assert(bySrc("partial") > 20 && bySrc("partial") < 80)
    assert(bySrc("deflt") > 20 && bySrc("deflt") < 80)
    // deterministic: the same doc ids are kept on a re-run
    val again = TextAnalysis.mixtureSample(docs,
      Map("keep_all" -> 99999L, "none" -> 0L, "partial" -> 250L),
      defaultBudget = 250L)
      .filter(col("keep")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == again.toSet)
  }

  test("packSequences: per-shard contiguous layout matches a reference model") {
    // 40 docs with varying token counts; verify against an independent
    // in-memory packer: per shard in doc_id order, a doc's bin is the
    // budget window its start offset falls in
    val docs = (1L to 40L)
      .map(i => (i, (1L to (1 + i % 7)).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val budget = 10
    val out = TextAnalysis.packSequences(docs, budget).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 40)
    out.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, n, bin, off) =>
        assert(bin == cum / budget, s"doc $id bin")
        assert(off == cum % budget, s"doc $id offset")
        assert(off < budget)
        cum += n
      }
    }
    // shards are the hashSplit md5 shard — deterministic across runs
    val shardOf = out.map(r => r._1 -> r._2).toMap
    val again = TextAnalysis.packSequences(docs, budget).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(shardOf == again)
  }

  test("lengthBucketBatches: hand-checked buckets, fills, padding waste") {
    val docs = Seq(
      (1L, "a b c"),                                  // 3 tokens, bucket 2
      (2L, "d e"),                                    // 2 tokens, bucket 2
      (3L, "g h i"),                                  // 3 tokens, bucket 2
      (4L, (1 to 20).map(i => s"w$i").mkString(" "))) // 20 tokens, bucket 5
      .toDF("doc_id", "text")
    val out = TextAnalysis.lengthBucketBatches(docs, batchTokens = 4)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5))).toMap
    // bucket 2 in doc_id order: cum 0, 3, 5 → docs 1+2 fill batch 0
    // (max 3, sum 5 → pads 1), doc 3 spills to batch 1
    assert(out((2, 0L)) == ((2, 3, 5L, 1L)))
    assert(out((2, 1L)) == ((1, 3, 3L, 0L)))
    assert(out((5, 0L)) == ((1, 20, 20L, 0L)))
    assert(out.size == 3)
  }

  test("epochRepeat: floor copies plus deterministic fractional extra") {
    val docs = Seq((1L, "x", "a"), (2L, "x", "a"), (3L, "x", "b"),
      (4L, "x", "b"), (5L, "x", "c")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.epochRepeat(docs,
      Map("a" -> 2.5, "b" -> 0.25), defaultFactor = 1.0)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // md5 ':epoch' draws: d1 .968, d2 .461, d3 .527, d4 .163 —
    // a: 2 + (u<.5); b: 0 + (u<.25); c: exactly 1
    assert(out == Map(
      1L -> Seq(1, 2), 2L -> Seq(1, 2, 3), 4L -> Seq(1), 5L -> Seq(1)))
  }

  test("temperatureMix: alpha=0.5 flattens — tail source capped at rate 1") {
    val bText = Seq.fill(500)("w").mkString(" ")
    val docs = (Seq(1L, 2L).map(i => (i, "w w w w w", "a")) ++
      (10L to 17L).map(i => (i, bText, "b"))).toDF("doc_id", "text", "source")
    val out = TextAnalysis.temperatureMix(docs, budgetTokens = 1000L)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getBoolean(3))))
      .toMap
    // w_a=√10, w_b=√4000: rate_a = 1000·w_a/W/10 ≈ 4.76 → capped 1.0 ⇒
    // every tail-source doc kept (proportional sampling would keep ~25%)
    assert(Seq(1L, 2L).forall(out(_) == ((5, true))))
    // rate_b ≈ 0.2381 (tempered DOWN from 0.2494 proportional); the 8
    // fixture ids' md5 draws all sit above it — deterministic
    assert((10L to 17L).forall(out(_) == ((500, false))))
  }

  test("bigramLogProb: hand-computed interpolated scores; 1-token doc drops") {
    // corpus: unigrams a:3 b:3 z:1 (N=7); bigrams ab:3 ba:1
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val lpAb = math.log(0.7 * 3.0 / 3 + 0.3 * 3.0 / 7)
    val lpBa = math.log(0.7 * 1.0 / 3 + 0.3 * 3.0 / 7)
    assert(!out.contains(3L), "single-token doc has no transitions")
    assert(out(1L)._1 == 3 && out(2L)._1 == 1)
    assert(math.abs(out(2L)._2 - lpAb) < 1e-6)
    assert(math.abs(out(1L)._2 - (2 * lpAb + lpBa) / 3) < 1e-6)
    // the two-sided-gate rationale: all-repeated transitions score the
    // interpolation ceiling, diverse text sits below it
    assert(out(2L)._2 > out(1L)._2)
  }

  test("perplexityBuckets: per-lang terciles, tie-broken; scoreless drop") {
    // 6 scoreable en docs -> terciles of 2; 1 fr doc -> all three ntile
    // groups collapse onto one row (head); 1-token doc never bucketed
    val docs = Seq(
      (1L, "a b a b", "en"), (2L, "a b", "en"), (3L, "b a", "en"),
      (4L, "a b a", "en"), (5L, "b a b", "en"), (6L, "a b a b a", "en"),
      (7L, "a b", "fr"), (8L, "z", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityBuckets(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3),
        r.getString(4))).toMap
    assert(!out.contains(8L), "single-token doc has no LM score")
    assert(out(7L)._3 == "head", "lone doc in a language is its head")
    val en = out.filter(_._2._1 == "en").toSeq
    assert(en.count(_._2._3 == "head") == 2
      && en.count(_._2._3 == "middle") == 2
      && en.count(_._2._3 == "tail") == 2)
    // every head score >= every middle score >= every tail score
    def scores(b: String) = en.filter(_._2._3 == b).map(_._2._2)
    assert(scores("head").min >= scores("middle").max)
    assert(scores("middle").min >= scores("tail").max)
  }

  test("hybridRrf: fused ranks, one-sided hits still score") {
    val docs = Seq((1L, "fox fox jumps"), (2L, "fox runs"),
      (3L, "cat sleeps"), (4L, "dog barks")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, "q", Array(1.0, 0.0)), (1L, "a", Array(0.99, 0.1)),
      (2L, "b", Array(0.0, 1.0)), (3L, "c", Array(0.9, 0.2)),
      (4L, "d", Array(-1.0, 0.0))).toDF("vec_id", "label", "embedding")
    val out = Search.hybridRrf(docs, emb.filter(col("vec_id") =!= 0),
      Seq("fox"), emb.filter(col("vec_id") === 0), k = 10)
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    // doc 1: lexical rank 1 (two hits) AND vector rank 1 → both terms
    assert(out(1L)._1.contains(1) && out(1L)._2.contains(1))
    assert(math.abs(out(1L)._3 - math.floor(2.0 / 61 * 1e9) / 1e9) < 2e-9)
    // doc 3 never matched a query term: lexical side null, still ranked
    assert(out(3L)._1.isEmpty && out(3L)._2.contains(2))
    // doc 4 is anti-aligned: vector rank 4, no lexical hit
    assert(out(4L)._1.isEmpty && out(4L)._2.contains(4))
    // fusion puts the both-retriever doc first
    val best = out.maxBy(_._2._3)
    assert(best._1 == 1L)
  }

  test("weightedSample: A-ES top-k matches a driver recompute, skews long") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val out = TextAnalysis.weightedSample(docs, k = 50).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 50)
    // the distributed top-k must equal a full driver-side rank by the
    // same (key desc, id asc) order
    val all = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1).toDouble))
      .filter(_._2 > 0)
    def key(id: Long, w: Double): Double = {
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"ws:$id")
          .substring(0, 8), 16)
      val raw = math.log((h + 0.5) / 4294967296.0) / w
      // mirror roundSim exactly: double → DECIMAL(20,12) → round 9
      BigDecimal(raw).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = all.map { case (id, w) => (id, w, key(id, w)) }
      .sortBy(t => (-t._3, t._1)).take(50)
    assert(out.map(_._1).toSeq == expect.map(_._1).toSeq,
      "distributed top-k diverges from the reference ranking")
    // weight-proportional sampling must skew the sample long: the
    // sampled mean length exceeds the corpus mean (deterministic here)
    val corpusMean = all.map(_._2).sum / all.length
    val sampleMean = out.map(_._2).sum / out.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("ragChunks: overlapping windows cover every token, tail included") {
    // 10 tokens, width 4, stride 3: starts 1,4,7 (ceil((10-4)/3)*3+1 = 7)
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (2L, "a b"), // shorter than one window → exactly one chunk
      (3L, "x1 x2 x3 x4 x5")) // starts 1, 4 (tail window short)
      .toDF("doc_id", "text")
    val out = TextAnalysis.ragChunks(docs, width = 4, stride = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._1)
    assert(out(1L).map(t => (t._2, t._3, t._4)).sorted.toSeq ==
      Seq((1, 1, 4), (2, 4, 7), (3, 7, 10)))
    assert(out(2L).map(t => (t._2, t._3, t._4)).toSeq == Seq((1, 1, 2)))
    assert(out(3L).map(t => (t._2, t._3, t._4)).sorted.toSeq ==
      Seq((1, 1, 4), (2, 4, 5)))
    // every token of every doc is inside at least one chunk
    for ((d, chunks) <- out) {
      val sorted = chunks.sortBy(_._3).toSeq
      assert(sorted.head._3 == 1, s"doc $d must start at token 1")
      for (Seq(a, b) <- sorted.sliding(2) if sorted.length > 1)
        assert(b._3 <= a._4 + 1, s"coverage gap in doc $d after ${a._4}")
    }
  }

  test("noveltyScore: corpus-common phrasing scores below unique text") {
    val docs = Seq(
      // doc 1 and 2 share their first 4 tokens (2 shared 3-grams);
      // doc 3 is fully unique; docs with <3 tokens are absent
      (1L, "alpha beta gamma delta one1"),
      (2L, "alpha beta gamma delta two2"),
      (3L, "epsilon zeta eta theta iota"),
      (4L, "too short"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 1/2: 3 shingles each, "alpha beta gamma"/"beta gamma delta"
    // shared → 1 novel of 3
    assert(out(1L) == ((3L, 1L, 0.33)))
    assert(out(2L) == ((3L, 1L, 0.33)))
    assert(out(3L) == ((3L, 3L, 1.0)))
    assert(!out.contains(4L), "sub-shingle docs have no score")
  }

  test("decontaminate: eval-overlapping train docs flagged at threshold") {
    val docs = Seq(
      // doc 0 is the benchmark (doc_id % 97 == 0 in the gate; here the
      // explicit predicate); doc 1 copies 4 of its tokens (2 of 3
      // shingles hit -> 0.67 >= 0.5 flagged); doc 2 is clean; the
      // benchmark doc itself is excluded from the output
      (0L, "alpha beta gamma delta end0"),
      (1L, "alpha beta gamma delta one1"),
      (2L, "epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(docs, col("doc_id") === 0L)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(!out.contains(0L), "benchmark docs are not scored")
    assert(out(1L) == ((3L, 2L, 0.67, true)), s"got ${out(1L)}")
    assert(out(2L) == ((3L, 0L, 0.0, false)), s"got ${out(2L)}")
  }

  test("bpePairCounts: word-frequency-weighted adjacent pair counts") {
    val docs = Seq(
      (1L, "ab ab abc"),
      (2L, "ab x")) // "x" is single-char: no pairs, must not blow up
      .toDF("doc_id", "text")
    // wc = {ab: 3, abc: 1}; pairs: ab→"ab"×3, abc→"ab","bc" → ab:4, bc:1
    val out = TextAnalysis.bpePairCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq == Seq("ab" -> 4L, "bc" -> 1L))
  }

  test("shardAssign: hash-ranged shards, dense positions, split-stable") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val s8 = TextAnalysis.shardAssign(docs, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(s8.length == docs.count())
    assert(s8.forall(t => t._2 >= 0 && t._2 < 8))
    // positions are dense 1..n within each shard
    for ((_, g) <- s8.groupBy(_._2))
      assert(g.map(_._3).sorted.toSeq == (1 to g.length).toSeq)
    // hash-RANGED layout: doubling the shard count splits ranges —
    // every 8-shard nests inside the 4-shard covering its range
    val s4 = TextAnalysis.shardAssign(docs, nShards = 4).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(s8.forall { case (id, sh, _) => sh / 2 == s4(id) },
      "growing the shard count must only split ranges, never remap")
  }

  test("corpusProfile: per-source card with corpus-global dup exposure") {
    val docs = Seq(
      // src_a: 3 docs, langs en/en/de → top en 2/3; doc 3 dups doc 10
      (1L, "one two three", "en", "src_a"),
      (2L, "four five", "en", "src_a"),
      (3L, "Shared  Text", "de", "src_a"),
      // src_b: 2 docs; lang tie en/de broken alphabetically → de;
      // doc 10 dups ACROSS sources (both rows must count it)
      (10L, "shared text", "de", "src_b"),
      (11L, "unique content", "en", "src_b"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.corpusProfile(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("src_a")
    assert(a.getAs[Long]("n_docs") == 3L)
    // raw whitespace split (the ts_quality semantic): "Shared  Text"'s
    // double space yields an empty token → 3 + 2 + 3
    assert(a.getAs[Long]("n_tokens") == 8L)
    assert(a.getAs[Double]("avg_tokens") == 2.67)
    assert(a.getAs[Long]("n_langs") == 2L)
    assert(a.getAs[String]("top_lang") == "en")
    assert(a.getAs[Double]("top_lang_share") == 0.67)
    assert(a.getAs[Long]("dup_docs") == 1L)
    val b = out("src_b")
    assert(b.getAs[String]("top_lang") == "de", "tie breaks alphabetically")
    assert(b.getAs[Long]("dup_docs") == 1L,
      "cross-source copy counts in both sources")
    assert(b.getAs[Double]("dup_share") == 0.5)
  }

  test("subwordEncode: greedy trigram-or-char scan, hand-traced") {
    // corpus trigram counts (occurrence-weighted): "abc" appears twice
    // inside abcabc + once in abc + once in aabc = 4, every other gram
    // ≤ 1 → vocabSize=1 learns exactly ["abc"]
    val docs = Seq(
      (1L, "abcabc abc xy"),   // abc×2 | abc | char,char → 2+1+2 tokens
      (2L, "aabc"),            // char at pos1, then "abc" at pos2 → 2
      (3L, "zz")               // no trigram possible → 2 chars
    ).toDF("doc_id", "text")
    val out = TextAnalysis.subwordEncode(docs, vocabSize = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"))).toMap
    assert(out(1L) == (3L, 5L), out.toString)
    assert(out(2L) == (1L, 2L), "mid-word trigram match must consume 3 chars")
    assert(out(3L) == (1L, 2L), out.toString)
  }

  test("subwordEncode: empty vocab hit degenerates to char count") {
    // vocab learns the single most frequent trigram of a corpus that has
    // none ≥3 chars → vocab empty → every word encodes char-by-char
    val docs = Seq((1L, "ab cd e")).toDF("doc_id", "text")
    val r = TextAnalysis.subwordEncode(docs, vocabSize = 4).collect().head
    assert(r.getAs[Long]("n_tokens") == 5L, r.toString)
    assert(r.getAs[Long]("n_words") == 3L, r.toString)
  }
}
