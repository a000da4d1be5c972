package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Five families, in increasing fuzziness:
  *   1. exact       — hash-groupBy on a normalized-content fingerprint;
  *   2. ngramJaccard — word-shingle Jaccard over an inverted-index join
  *                     (candidate pairs share ≥1 shingle — never O(n²));
  *   3. minhash+LSH — per-doc signature of k min-hashes, banded into
  *                    buckets; only bucket-mates become candidates;
  *   4. simhash     — 64-bit weighted bit-vote fingerprint, near-dups =
  *                    small hamming distance within band buckets;
  *   5. embedding   — cosine near-dup with sign-LSH blocking (see
  *                    [[Similarity]] for the shared primitives).
  *
  * Everything is built from codegen'd native functions. Min-hashes and
  * simhash bit-votes both derive from md5 (identical hex rendering in
  * Spark and DuckDB — simhash votes on md5 nibbles, see [[simhash]]), so
  * the LSH and simhash pipelines are oracle-comparable end-to-end.
  *
  * Scale: the shuffles are (a) explode-shingles → groupBy shingle/bucket
  * (skew-guard: frequent shingles capped via a document-frequency
  * filter), (b) candidate-pair self-join co-partitioned on doc id. No
  * driver-side collection anywhere.
  */
object Dedup {

  /** n-word windows over a token array, built as a zip_with fold over
    * n shifted slices. Each slice references the token expression a
    * CONSTANT number of times per row; a naive
    * `transform((x, i) => … element_at(toks, i+j) …)` re-evaluates the
    * token expression per element (Catalyst inlines column aliases into
    * lambdas), which turns an inline `split(regexp_replace(…))` into a
    * quadratic regex blow-up.
    */
  def shinglesFromTokens(toks: Column, n: Int = 3): Column = {
    val width = greatest(size(toks) - (n - 1), lit(0))
    (2 to n).foldLeft(slice(toks, lit(1), width)) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j), width), (a, b) => concat_ws(" ", a, b))
    }
  }

  /** Shingles of a raw text column. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(split(TextAnalysis.normalized(text), " "), n)

  /** Exact dedup groups: normalized-md5 fingerprint → group, keeper =
    * min doc_id, group size. Downstream `filter(n_docs > 1)` is the
    * "drop duplicates" set; emitting all groups keeps the operator pure.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(TextAnalysis.normalized(col("text"))).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keeper_doc_id"), count(lit(1)).as("n_docs"))

  /** Exactly the `floor(len/n)` stride-aligned n-token segments of a
    * token array (the trailing partial segment is dropped). Builds ONLY
    * the kept segments — no overlapping-shingle construction followed by
    * a stride filter, which would concat ~n× the strings it keeps.
    *
    * CALLER CONTRACT: `toks` must be a materialized attribute (e.g. a
    * column that crossed an Exchange), not an inline expression —
    * Catalyst's CollapseProject inlines column aliases into lambdas, and
    * an inline `split(regexp_replace(…))` here would re-run the regex
    * once per SEGMENT (see [[shinglesFromTokens]]).
    */
  def strideSegments(toks: Column, n: Int): Column = {
    val nSeg = floor(size(toks) / n).cast("int")
    when(nSeg >= 1,
      transform(sequence(lit(1), nSeg),
        i => concat_ws(" ", slice(toks, (i - 1) * n + 1, lit(n)))))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** Corpus-level segment dedup (the training-data dedup of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"):
    * documents are cut into NON-overlapping `chunkTokens`-token segments
    * (the trailing partial segment is dropped — full segments only,
    * mirrored by the oracle) and segments repeated across documents are
    * reported with their occurrence counts and keeper. [[strideSegments]]
    * builds exactly the kept segments; grouping on the md5 fingerprint is
    * the standard inverted-index shape — no pairwise comparison anywhere.
    * Shuffles: the repartition spreading the (often single-file) corpus
    * scan across threads BEFORE the per-row tokenize work — raw text
    * crosses the exchange, so the regex+split pass parallelizes too and
    * the tokens projection lands above the Exchange, where it doubles as
    * the materialization barrier the strideSegments contract needs —
    * then the one real shuffle at segment grain for the groupBy.
    */
  def chunkDedup(docs: DataFrame, chunkTokens: Int = 10): DataFrame =
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        split(TextAnalysis.normalized(col("text")), " ").as("toks"))
      .select(col("doc_id"),
        explode(strideSegments(col("toks"), chunkTokens)).as("chunk"))
      .groupBy(md5(col("chunk")).as("fp"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min("doc_id").as("keeper_doc_id"))
      .filter(col("n_docs") > 1)

  /** Maximal duplicated-substring spans — the exact-substring criterion
    * of Lee et al. ("Deduplicating Training Data Makes Language Models
    * Better", ACL 2022), token-granular: a position is MARKED when the
    * `k`-token window starting there also occurs in some other document,
    * and runs of adjacent marked positions merge into maximal spans
    * `[start_pos, end_pos]` (token indices, 1-based; a span therefore
    * witnesses `end_pos − start_pos + k` tokens of cross-document
    * duplicated text). Spans shorter than `minTokens` windows are
    * dropped. Lee et al. find these spans with a monolithic suffix
    * array; the distributed equivalent is this k-gram position inverted
    * index — same marked set for duplicates of length ≥ k, built from
    * shuffles Spark already does well.
    *
    * Scale shape: (a) gram-grain groupBy for the cross-doc test (the
    * min≠max trick — no count-distinct, and the index frame is one row
    * per DISTINCT gram); (b) the corpus gram stream semi-joins that
    * index at gram grain; (c) one doc-grain window merges positions
    * into islands. Nothing quadratic, no skew beyond natural gram
    * frequency (a gram's group carries doc ids only, never text).
    */
  def duplicateSpans(docs: DataFrame, k: Int = 5,
                     minTokens: Int = 1): DataFrame = {
    // Gram identity is a 60-bit md5-prefix fingerprint, NOT the 32-char
    // hex string: the index groupBy and the marked join shuffle 8-byte
    // longs instead of strings (~4x fewer key bytes), and the twin
    // derives the identical prefix — a fingerprint collision (≈V²/2⁶¹,
    // the standard Lee et al. tradeoff) marks the same position on both
    // engines, so the gate can never see asymmetry. The frame is
    // memoized: the index aggregation AND the probe side both consume
    // it, and without the memo the normalize+explode+md5 chain ran
    // twice (measured +1.6 s of the query's 2.8 s at sf1, ProfSpans).
    val gramPlan = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        split(TextAnalysis.normalized(col("text")), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(shinglesFromTokens(col("toks"), k)))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("pos"),
        conv(substring(md5(col("col")), 1, 15), 16, 10).cast("long").as("g"))
    // the gram frame is TOKEN-grain (one row per token position of the
    // whole corpus) — memoizing it is the measured 1.6 s sf1 win, but
    // pinning a corpus-sized frame at 100 TB would spill heavily and
    // evict smaller hot memo entries. Gate on the doc scan's plan-stats
    // size (the ngramJaccard broadcast-gate idiom): past ~8 GB of
    // source docs the two consumers fall back to recomputing the
    // normalize+explode+md5 chain instead of caching it.
    val docBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val grams =
      if (docBytes < (8L << 30))
        graft.core.PlanMemo.cached(s"dedup.spanGrams$k", gramPlan)
      else gramPlan
    val crossDoc = grams.groupBy("g")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("g")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    grams.join(crossDoc, "g")
      .select("doc_id", "pos")
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) === 1, 0).otherwise(1))
      .withColumn("island", sum("brk").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("start_pos"),
        max("pos").cast("int").as("end_pos"))
      .filter(col("end_pos") - col("start_pos") + 1 >= minTokens)
      .select(col("doc_id"), col("start_pos"), col("end_pos"),
        (col("end_pos") - col("start_pos") + lit(k)).cast("int")
          .as("span_tokens"))
  }

  /** Span scrubbing — the REMOVAL half of the Lee et al. exact-substring
    * pass: every token covered by a [[duplicateSpans]] span (the span's
    * windows witness `end_pos + k − 1` token positions) is cut from the
    * document, and the cleaned text is re-emitted. This is the
    * conservative boilerplate scrub: text duplicated ANYWHERE else in
    * the corpus (headers, footers, lifted paragraphs) disappears from
    * every copy, while each document's unique prose survives verbatim.
    *
    * Scale shape: the span frame is span-grain (tiny next to the
    * corpus); it groups to one row per affected doc and joins back at
    * doc grain. The scrub itself is a PER-ROW higher-order `filter`
    * over the token array with an `exists` coverage probe against the
    * doc's own span list — no token-grain explode, no shuffle beyond
    * [[duplicateSpans]]' own gram index (the charEntropy lesson:
    * per-document rewrites stay inside the row).
    *
    * Output is (doc_id, n_kept, n_removed, clean_fp) — the md5 of the
    * scrubbed text rather than the text itself, which keeps the frame
    * narrow while still witnessing the exact reconstruction.
    */
  def scrubSpans(docs: DataFrame, k: Int = 5, minTokens: Int = 1): DataFrame = {
    val cover = duplicateSpans(docs, k, minTokens)
      .select(col("doc_id"),
        struct(col("start_pos").as("s"),
          (col("end_pos") + lit(k) - 1).cast("int").as("e")).as("sp"))
      .groupBy("doc_id")
      .agg(collect_list(col("sp")).as("spans"))
    docs
      .select(col("doc_id"),
        split(TextAnalysis.normalized(col("text")), " ").as("toks"))
      .join(cover, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        filter(col("toks"), (_, i) =>
          col("spans").isNull ||
            !exists(col("spans"), sp =>
              i + 1 >= sp.getField("s") && i + 1 <= sp.getField("e")))
          .as("kept"))
      .select(col("doc_id"),
        size(col("kept")).as("n_kept"),
        (size(col("toks")) - size(col("kept"))).as("n_removed"),
        md5(array_join(col("kept"), " ")).as("clean_fp"))
      .orderBy("doc_id")
  }

  /** The stored-index side of [[incrementalExact]]: the corpus's exact-
    * dedup fingerprint index, `(fp, keeper_doc_id)` — one row per
    * distinct normalized content. At production scale this frame lives
    * on disk bucketed by `fp` (it is the corpus's dedup state, written
    * once per ingest wave), so the daily-batch probe join below is a
    * bucket-local join with NO corpus-side shuffle.
    */
  def exactIndex(docs: DataFrame): DataFrame =
    exact(docs).select(col("fp"), col("keeper_doc_id"))

  /** Incremental exact dedup — the shape that actually runs at 100 TB:
    * a new ingest batch is classified against the EXISTING corpus
    * fingerprint index without rescanning (or re-hashing) the corpus.
    * Each batch document comes out as
    *   - `corpus_dup`: content already in the corpus (keeper = the
    *     corpus document),
    *   - `batch_dup`:  novel vs the corpus but repeated within the
    *     batch (keeper = the batch's min doc_id for that content),
    *   - `novel`:      first sighting anywhere (keeper = itself).
    * `filter(status != 'corpus_dup' AND doc_id = keeper_doc_id)` is the
    * set to append; `exactIndex(batch-novel-keepers)` unioned into the
    * stored index is the state update for the next wave.
    *
    * Shape: one shuffle to fingerprint-group the batch (batch-sized,
    * not corpus-sized) and one join against the index — bucket-local
    * when the index is stored bucketed by `fp` ([[exactIndex]]); the
    * batch side is always the small side, so at cluster scale this is
    * the textbook big-bucketed-build / small-probe layout.
    */
  def incrementalExact(index: DataFrame, batch: DataFrame): DataFrame = {
    val fps = batch.select(col("doc_id"),
      md5(TextAnalysis.normalized(col("text"))).as("fp"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val withMin = fps.withColumn("batch_min", min("doc_id").over(w))
    withMin.join(index.select(col("fp"),
        col("keeper_doc_id").as("corpus_keeper")), Seq("fp"), "left")
      .select(
        col("doc_id"),
        when(col("corpus_keeper").isNotNull, lit("corpus_dup"))
          .when(col("batch_min") < col("doc_id"), lit("batch_dup"))
          .otherwise(lit("novel")).as("status"),
        coalesce(col("corpus_keeper"), col("batch_min")).as("keeper_doc_id"))
  }

  /** Distinct (doc_id, shingle) pairs, with very frequent shingles
    * dropped (document frequency > maxDf) — the classic stop-shingle
    * skew guard: a shingle appearing in half the corpus would otherwise
    * generate a quadratic candidate blow-up on one key.
    */
  def docShingles(docs: DataFrame, n: Int = 3, maxDf: Long = 1000): DataFrame = {
    val ds = distinctShingles(docs, n)
    val df = ds.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    ds.join(df, "shingle").select("doc_id", "shingle")
  }

  /** Distinct (doc_id, shingle) pairs of the corpus — the corpus-stat
    * frame SHARED by the shingle consumers ([[docShingles]]/
    * [[ngramJaccard]]'s inverted index, [[TextAnalysis.noveltyScore]]'s
    * uniqueness test): one normalize+tokenize+explode pass memoized per
    * (session, corpus, n) instead of one per query AND per consumer
    * branch (each caller reads it at least twice — df-filter + join, or
    * gram-grain groupBy + join-back).
    *
    * The repartition matters: a small corpus arrives as ONE parquet
    * partition, which would run the whole shingle computation on a
    * single thread before the first shuffle. The memo is gated on the
    * doc scan's plan-stats size (the [[duplicateSpans]] discipline):
    * this frame is corpus-token grain, and pinning it at 100 TB would
    * spill heavily and evict smaller hot memo entries — past ~8 GB of
    * source docs consumers fall back to recomputing the chain.
    */
  private[graft] def distinctShingles(docs: DataFrame, n: Int): DataFrame = {
    val plan = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        split(TextAnalysis.normalized(col("text")), " ").as("toks"))
      .select(col("doc_id"),
        explode(shinglesFromTokens(col("toks"), n)).as("shingle"))
      .distinct()
    val docBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    if (docBytes < (8L << 30))
      graft.core.PlanMemo.cached(s"dedup.shingles$n", plan)
    else plan
  }

  /** N-gram Jaccard near-dup pairs via inverted-index candidate join:
    * |A∩B| from the shingle join, |A∪B| = |A|+|B|−|A∩B|.
    * Emits pairs (a < b) with jaccard ≥ threshold.
    *
    * The join runs over DICTIONARY-ENCODED postings: shingles map to
    * transient long ids via salted `xxhash64` — a PURE function of the
    * shingle text, so the encoding is recompute-stable by construction
    * (an earlier `monotonically_increasing_id` dictionary could hand
    * the self-join's two branches DIFFERENT ids if the memoized dict
    * frame was evicted and recomputed with a different reduce-side
    * fetch order — silently wrong n_common). One vocab-sized aggregate
    * guards the ≈V²/2⁶⁵ collision case by re-salting; the ids never
    * reach the output. The self-join and the (doc_a, doc_b) pair
    * aggregation shuffle 8-byte longs instead of multi-word strings —
    * measured at sf1: hot join+group stage 3.4 → 2.1 s warm at
    * identical output; at 100 TB the saved shuffle bytes are
    * proportionally larger (shingle text ~20-40 B vs 8 B). Hashing
    * also deletes the dict-assignment shuffle join the id scheme
    * needed: the encode is now a map-only projection.
    *
    * Candidate volume here is Σ df² over the capped vocabulary — on
    * corpora with a Zipfian shingle distribution and a high `maxDf`,
    * prefer [[ngramJaccardPrefix]], which prunes candidates exactly via
    * rarity-ordered prefixes. (This corpus' df tops out at 25, so the
    * exhaustive join is the cheaper shape: the prefix variant's exact
    * verify stage costs more than the pruned 30% of candidates saves —
    * measured, see ProfNgram.)
    */
  def ngramJaccard(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                   maxDf: Long = 1000): DataFrame = {
    // memo keyed by tag: the collision-check aggregate below is a
    // driver action run during plan CONSTRUCTION — keying on the
    // product plan would re-pay it on every call (cachedAs Scaladoc)
    val ds = graft.core.PlanMemo.cached("dedup.dfShingles",
      docShingles(docs, n, maxDf))
    val enc = graft.core.PlanMemo.cachedAs("dedup.encShingles", ds) {
      val salt = Iterator.range(0, 5).find { s =>
        val r = ds.agg(
          countDistinct(col("shingle")).as("v"),
          countDistinct(xxhash64(col("shingle"), lit(s))).as("h")).head()
        r.getLong(0) == r.getLong(1)
      }.getOrElse(sys.error(
        "ngramJaccard: xxhash64 sid collision persisted across 5 salts"))
      ds.select(col("doc_id"), xxhash64(col("shingle"), lit(salt)).as("sid"))
    }
    val sizes = enc.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val a = enc.toDF("doc_a", "sid")
    val b = enc.toDF("doc_b", "sid")
    val common = a.join(b, "sid")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"))
    // sizes is doc-grain (tiny next to the pair frame) — broadcasting
    // both probes keeps the candidate-pair frame from re-shuffling by
    // doc id. But a PER-DOCUMENT table is only broadcastable while the
    // corpus is: gate on the doc scan's plan-stats size (file-size
    // based, no action) so a billion-doc corpus degrades to the
    // shuffle join instead of OOMing the driver. ~8 GB of source docs
    // ≈ ≥16M docs ≈ ~256 MB of (id, count) rows — the usual broadcast
    // ceiling.
    val docBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val hint: DataFrame => DataFrame =
      if (docBytes < (8L << 30)) broadcast(_) else identity
    // the doc-grain size table has TWO broadcast consumers (a-side and
    // b-side probes); memoized under the same gate so each broadcast
    // build scans a doc-count-sized cache instead of re-aggregating the
    // posting cache twice (the dailyUnits multi-consumer pattern)
    val sizesM =
      if (docBytes < (8L << 30))
        graft.core.PlanMemo.cached("dedup.ngramSizes", sizes)
      else sizes
    common
      .join(hint(sizesM.toDF("doc_a", "size_a")), "doc_a")
      .join(hint(sizesM.toDF("doc_b", "size_b")), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }

  /** [[ngramJaccard]] with PREFIX FILTERING (AllPairs / PPJoin, Bayardo
    * et al. 2007; Xiao et al. 2008) — identical output, provably-exact
    * candidate pruning for corpora whose shingle df distribution is
    * skewed enough that Σ df² blows up (the usual 100 TB shape; the
    * bundled synthetic corpus is NOT it — see [[ngramJaccard]]'s note).
    *
    * Correctness of the pruning: under any global total order on
    * shingles, `J(A,B) ≥ t` implies
    * `|A∩B| ≥ t·|A∪B| ≥ max(ceil(t·|A|), ceil(t·|B|)) = α`, and two
    * sets with overlap ≥ α must share an element within both their
    * `(|X| − α + 1)`-prefixes: if they didn't, order the boundary
    * elements — say A's prefix ends no later than B's — then every
    * common element would have to lie strictly past A's boundary
    * (anything at or before it belongs to both prefixes), leaving at
    * most `ceil(t·|X|) − 1 < α` common elements. Each side's own
    * `|X| − ceil(t·|X|) + 1` prefix is ≥ the α-prefix, so joining the
    * per-doc prefixes loses nothing. Ordering RAREST-FIRST (df asc)
    * puts the high-fanout shingles in the suffixes where they never
    * join. Survivor pairs are re-verified EXACTLY on the full shingle
    * sets (`array_intersect` over set-valued arrays ≡ the exhaustive
    * join's group counts). Pinned equal to the exhaustive join by
    * DedupSpec at two thresholds.
    */
  def ngramJaccardPrefix(docs: DataFrame, n: Int = 3,
                         threshold: Double = 0.5,
                         maxDf: Long = 1000): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"ngramJaccardPrefix: threshold must be in (0,1], got $threshold")
    val ds = graft.core.PlanMemo.cached("dedup.dfShingles",
      docShingles(docs, n, maxDf))
    val w = org.apache.spark.sql.expressions.Window
    val dfTab = ds.groupBy("shingle").agg(count(lit(1)).as("df"))
    val byDoc = w.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    val ranked = ds.join(dfTab, "shingle")
      .select(col("doc_id"), col("shingle"),
        row_number().over(byDoc).as("pos"),
        count(lit(1)).over(w.partitionBy("doc_id")).as("sz"))
    // prefix length |X| − ceil(t·|X|) + 1; the 1e-9 nudge keeps FP error
    // from rounding ceil UP (a too-long prefix is safe, too-short isn't)
    val prefix = ranked.filter(col("pos") <=
      col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
    val candidates = prefix.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("shingle")),
        "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val sets = ds.groupBy("doc_id")
      .agg(collect_list(col("shingle")).as("sh"),
        count(lit(1)).as("n_shingles"))
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("n_shingles").as("size_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("n_shingles").as("size_b")), "doc_b")
      .withColumn("n_common",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }

  /** Per-doc MinHash signatures (k components, k ≤ 8).
    *
    * Component i is the min over shingles of an 8-hex-char (32-bit)
    * slice of md5(prefix || shingle): slices of one 128-bit hash are
    * independent 32-bit hash functions, so two md5 evaluations per
    * shingle yield 8 components — computed ONCE per row in a projection
    * (an md5 inside each min() aggregate would be re-evaluated per
    * aggregate). String min over fixed-width hex = numeric min;
    * identical in any engine with md5.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 8, n: Int = 3,
                        maxDf: Long = 1000): DataFrame = {
    require(k <= 8, "k > 8 needs more md5 prefixes")
    val hashed = docShingles(docs, n, maxDf).select(
      col("doc_id"),
      md5(concat(lit("0|"), col("shingle"))).as("h0"),
      md5(concat(lit("1|"), col("shingle"))).as("h1"))
    val comps = (0 until k).map { i =>
      min(substring(col(s"h${i / 4}"), 1 + 8 * (i % 4), 8)).as(s"mh_$i")
    }
    hashed.groupBy("doc_id").agg(comps.head, comps.tail: _*)
  }

  /** Band rows over a signature frame: (doc_id, band, bucket,
    * mh_0..mh_{k-1}) — the bands carry the full signature (the
    * single-join lesson every pair generator here follows).
    */
  private def bandsOf(sigs: DataFrame, k: Int, rowsPerBand: Int): DataFrame =
    (0 until k / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"mh_$i"))
      sigs.select(col("doc_id") +: lit(b).as("band") +:
        concat_ws("|", cols: _*).as("bucket") +:
        (0 until k).map(i => col(s"mh_$i")): _*)
    }.reduce(_ union _)

  /** Band-bucket index rows for a corpus: the STATE an incremental
    * near-dup pipeline stores between ingest waves (the LSH analogue of
    * [[exactIndex]]). Persist bucketed by (band, bucket) and the
    * per-wave probe join in [[incrementalMinhash]] is bucket-local.
    */
  def minhashBands(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
                   n: Int = 3, maxDf: Long = 1000): DataFrame =
    // memoized at band grain: the index side of an incremental probe is
    // re-read per wave (and per bench pass) — the signature aggregation
    // behind it must fill once, not per call
    graft.core.PlanMemo.cached("dedup.bands",
      bandsOf(minhashSignatures(docs, k, n, maxDf), k, rowsPerBand))

  /** Bench cold-attribution hook (the __sqllab_fill pattern):
    * materialize the memoized signature frame for `docs` — the
    * expensive half of [[minhashLsh]] — without running the pair join.
    * Must derive the IDENTICAL plan minhashLsh builds (same defaults)
    * so the PlanMemo entry hits on the subsequent query run.
    */
  def prefillSignatures(docs: DataFrame, k: Int = 8, n: Int = 3,
                        maxDf: Long = 1000): Unit = {
    graft.core.PlanMemo.cached("dedup.minhashSigs",
      minhashSignatures(docs, k, n, maxDf)).count()
    ()
  }

  /** MinHash-LSH candidate pairs: signatures banded (rowsPerBand hashes
    * per band); docs sharing any band bucket become candidates; then the
    * estimated similarity = fraction of matching signature components.
    */
  def minhashLsh(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
                 n: Int = 3, minEstSim: Double = 0.5,
                 maxDf: Long = 1000): DataFrame = {
    val sigs = graft.core.PlanMemo.cached("dedup.minhashSigs",
      minhashSignatures(docs, k, n, maxDf))
    // bands carry the full signature so the bucket self-join yields the
    // estimate directly — one shuffle join instead of candidate-distinct
    // plus two signature re-joins
    val bands = bandsOf(sigs, k, rowsPerBand)
    val aCols = Seq("doc_a", "band", "bucket") ++ (0 until k).map(i => s"a_$i")
    val bCols = Seq("doc_b", "band", "bucket") ++ (0 until k).map(i => s"b_$i")
    val simExpr = (0 until k)
      .map(i => when(col(s"a_$i") === col(s"b_$i"), 1).otherwise(0))
      .reduce(_ + _)
    bands.toDF(aCols: _*)
      .join(bands.toDF(bCols: _*), Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("est_jaccard", simExpr.cast("double") / k)
      .filter(col("est_jaccard") >= minEstSim)
      .select("doc_a", "doc_b", "est_jaccard")
      .distinct()
  }

  /** Incremental NEAR-dup classification — [[incrementalExact]]'s shape
    * lifted to MinHash-LSH: a new ingest wave is classified against the
    * stored band index ([[minhashBands]]) without re-hashing the corpus.
    * Each wave document comes out as
    *   - `corpus_dup`: est_jaccard ≥ `minEstSim` against some indexed
    *     document (keeper = the best match — highest estimate, lowest
    *     doc_id on ties),
    *   - `batch_dup`:  novel vs the index but near-duplicating an
    *     EARLIER wave document (keeper = the lowest matching doc_id —
    *     greedy first-occurrence, mirroring incrementalExact's
    *     batch_min; the full transitive closure is deliberately NOT
    *     rebuilt per wave — that is [[connectedComponents]]' job on the
    *     consolidated pair set),
    *   - `novel`:      neither (keeper = itself, est_jaccard null).
    * `minhashBands(novel keepers)` unioned into the stored index is the
    * state update for the next wave.
    *
    * Shape: wave signatures cost one batch-sized shingle pass; the probe
    * is a single join against the index on (band, bucket) — bucket-local
    * when the index is stored bucketed, and the wave side is always the
    * small side. Bands carry both signatures, so the estimate computes
    * at the join with no re-join. Note the stop-shingle `maxDf` caps are
    * population-local (index df over the corpus at index-build time,
    * wave df over the wave) — the standard incremental-LSH recall
    * caveat: a shingle that became hot AFTER indexing still probes.
    */
  def incrementalMinhash(indexBands: DataFrame, wave: DataFrame,
                         k: Int = 8, rowsPerBand: Int = 2, n: Int = 3,
                         minEstSim: Double = 0.5,
                         maxDf: Long = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val waveBands = minhashBands(wave, k, rowsPerBand, n, maxDf)
    val aCols = Seq("doc_id", "band", "bucket") ++ (0 until k).map(i => s"a_$i")
    val bCols = Seq("corpus_doc", "band", "bucket") ++ (0 until k).map(i => s"b_$i")
    val estExpr = (0 until k)
      .map(i => when(col(s"a_$i") === col(s"b_$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / k
    val cross = waveBands.toDF(aCols: _*)
      .join(indexBands.toDF(bCols: _*), Seq("band", "bucket"))
      .withColumn("est_jaccard", estExpr)
      .filter(col("est_jaccard") >= minEstSim)
      .select("doc_id", "corpus_doc", "est_jaccard").distinct()
    val xw = Window.partitionBy("doc_id")
      .orderBy(desc("est_jaccard"), asc("corpus_doc"))
    val xbest = cross.withColumn("__rn", row_number().over(xw))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("corpus_doc"),
        col("est_jaccard").as("x_est"))
    val pCols = Seq("doc_a", "band", "bucket") ++ (0 until k).map(i => s"a_$i")
    val qCols = Seq("doc_b", "band", "bucket") ++ (0 until k).map(i => s"b_$i")
    val wPairs = waveBands.toDF(pCols: _*)
      .join(waveBands.toDF(qCols: _*), Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("est_jaccard", estExpr)
      .filter(col("est_jaccard") >= minEstSim)
      .select("doc_a", "doc_b", "est_jaccard").distinct()
    val ww = Window.partitionBy("doc_b").orderBy(asc("doc_a"))
    val wbest = wPairs.withColumn("__rn", row_number().over(ww))
      .filter(col("__rn") === 1)
      .select(col("doc_b").as("doc_id"), col("doc_a").as("batch_keeper"),
        col("est_jaccard").as("w_est"))
    wave.select("doc_id")
      .join(xbest, Seq("doc_id"), "left")
      .join(wbest, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("corpus_doc").isNotNull, lit("corpus_dup"))
          .when(col("batch_keeper").isNotNull, lit("batch_dup"))
          .otherwise(lit("novel")).as("status"),
        coalesce(col("corpus_doc"), col("batch_keeper"), col("doc_id"))
          .as("keeper_doc_id"),
        coalesce(col("x_est"), col("w_est")).as("est_jaccard"))
  }

  /** 64-bit SimHash: per-token 64-bit hash, each bit votes +1/−1, the
    * fingerprint takes the sign of each bit's vote sum. Near-dups have
    * small hamming distance.
    *
    * The per-token hash is md5's leading 16 hex chars read as 16 nibbles
    * (bit b of the fingerprint comes from bit b%4 of nibble b/4) — md5
    * renders identically in any engine, so unlike an xxhash64-based
    * simhash the whole pipeline is oracle-comparable end-to-end. The 16
    * nibble ints are computed once per token in a projection; the 64
    * vote aggregates only read them.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = explode(split(TextAnalysis.normalized(col("text")), " "))
    val nibbles = docs.repartition(col("doc_id"))
      .select(col("doc_id"), tok.as("token"))
      .withColumn("h", md5(col("token")))
      .select(col("doc_id") +: (0 until 16).map(p =>
        conv(substring(col("h"), p + 1, 1), 16, 10).cast("int").as(s"nib_$p")): _*)
    val bitVotes = (0 until 64).map { b =>
      sum(when(shiftright(col(s"nib_${b / 4}"), b % 4).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"v_$b")
    }
    val votes = nibbles.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val fp = (0 until 64)
      .map(b => when(col(s"v_$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce(_.bitwiseOR(_))
    votes.select(col("doc_id"), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Fuzzy (edit-distance) near-dup pairs over a string column, blocked
    * on (first token, length band): candidates share their leading word,
    * then the levenshtein residual keeps pairs within `maxDist`. First-
    * token blocking is part of the operator's contract (as with any LSH
    * family): an edit inside the first token escapes the block — the
    * price of never computing O(n²) distances.
    *
    * The length band is a pure refinement, NOT an extra recall loss:
    * levenshtein ≥ |len(a)−len(b)|, so every pair within `maxDist` lands
    * within one band width. Each row is emitted into its own band and the
    * next (`floor(len/w)` and `+1`, w = maxDist), so cross-boundary pairs
    * still meet — results are identical to first-token-only blocking,
    * but a hot first token (common in product-name-like data where the
    * vocabulary is small) splits into many bounded blocks instead of one
    * quadratic one.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                 maxDist: Int): DataFrame = {
    val rows = df.select(col(idCol).as("id"), col(textCol).as("t"))
    // Edit distance depends only on the TEXT, so distances are computed
    // once per DISTINCT text and then expanded back to id pairs — with
    // duplicated strings (the common case in real corpora: boilerplate,
    // product names) the quadratic distance pass shrinks by the square
    // of the duplication factor, and with all-unique strings it costs
    // one extra distinct() shuffle over dimension-sized data.
    val crossText = fuzzyTextPairs(rows, maxDist)
    // identical texts are distance-0 near-dups of each other
    val selfText = rows.select("t").distinct()
      .select(col("t").as("t_a"), col("t").as("t_b"),
        lit(0).as("edit_dist"))
    selfText.unionByName(crossText)
      .join(rows.toDF("id_1", "t_a"), "t_a")
      .join(rows.toDF("id_2", "t_b"), "t_b")
      // within a same-text group keep each unordered id pair once; for
      // t_a < t_b every (id_1, id_2) combo appears exactly once already
      .filter(when(col("t_a") === col("t_b"), col("id_1") < col("id_2"))
        .otherwise(lit(true)))
      .select(least(col("id_1"), col("id_2")).as("id_a"),
        greatest(col("id_1"), col("id_2")).as("id_b"),
        col("edit_dist"))
  }

  /** The distinct-text candidate stage shared by [[fuzzyPairs]] and
    * [[fuzzyStarPairs]]: (first-token, length-band) blocked text pairs
    * within `maxDist` edits. The length band is a pure refinement (see
    * [[fuzzyPairs]]) — results are identical to first-token-only
    * blocking, which is what the oracle twins express.
    */
  private def fuzzyTextPairs(rows: DataFrame, maxDist: Int): DataFrame = {
    val w = math.max(maxDist, 1)
    val texts = rows.select("t").distinct()
      .select(col("t"), split(col("t"), " ").getItem(0).as("__tok"),
        floor(length(col("t")) / w).as("__f"))
    val banded = texts.select(col("t"), col("__tok"), col("__f"),
      explode(array(col("__f"), col("__f") + 1)).as("__band"))
    banded.toDF("t_a", "__tok", "__f_a", "__band")
      .join(banded.toDF("t_b", "__tok", "__f_b", "__band"),
        Seq("__tok", "__band"))
      .filter(col("t_a") < col("t_b"))
      // same-band pairs meet twice (native band and both-shifted band);
      // keeping only the meeting at greatest(native_a, native_b) emits
      // each text pair exactly once without a distinct() shuffle
      .filter(col("__band") === greatest(col("__f_a"), col("__f_b")))
      // levenshtein >= |len difference|: an O(1) reject before the
      // O(k·n) banded DP (the threshold form early-exits instead of
      // filling the full O(m·n) matrix, returning the exact distance
      // when <= maxDist and -1 past it)
      .filter(abs(length(col("t_a")) - length(col("t_b"))) <= maxDist)
      .withColumn("edit_dist", levenshtein(col("t_a"), col("t_b"), maxDist))
      .filter(col("edit_dist") >= 0)
      .select("t_a", "t_b", "edit_dist")
  }

  /** Fuzzy near-dup pairs in STAR form — the scale contract of the
    * fuzzy family. [[fuzzyPairs]] emits every id pair inside every
    * duplicate group, which is quadratic in group depth: a corpus with
    * d copies of one string emits d·(d−1)/2 rows — measured at 468M
    * output rows (33× wall for 10× data) on the 10× gate, and
    * unbounded on a boilerplate-heavy 100 TB corpus. The information
    * content is NOT quadratic: this form carries the same duplicate
    * structure in O(ids + distinct text pairs) rows as a star per
    * duplicate group —
    *   - (rep(t), id, 0) for every id whose text t has a smaller-id
    *     twin (rep(t) = lowest id holding t): the exact-duplicate
    *     membership, one row per duplicate id;
    *   - (rep(t_a), rep(t_b), dist) for every distinct text pair
    *     within `maxDist`: the fuzzy bridges, one row per TEXT pair
    *     (the candidate join is inverted-index-bounded, never n²).
    * The full pair set of [[fuzzyPairs]] is recoverable as the join
    * closure over the stars; downstream canonicalization (keep the
    * lowest id per component) consumes this form directly.
    */
  def fuzzyStarPairs(df: DataFrame, idCol: String, textCol: String,
                     maxDist: Int): DataFrame = {
    val rows = df.select(col(idCol).as("id"), col(textCol).as("t"))
    val reps = rows.groupBy("t").agg(min(col("id")).as("rep"))
    val members = rows.join(reps, "t")
      .filter(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"),
        lit(0).as("edit_dist"))
    val bridges = fuzzyTextPairs(rows, maxDist)
      .join(reps.select(col("t").as("t_a"), col("rep").as("rep_a")), "t_a")
      .join(reps.select(col("t").as("t_b"), col("rep").as("rep_b")), "t_b")
      .select(least(col("rep_a"), col("rep_b")).as("id_a"),
        greatest(col("rep_a"), col("rep_b")).as("id_b"),
        col("edit_dist"))
    members.unionByName(bridges)
  }

  /** Winnowing-fingerprint near-dup pairs: documents sharing at least
    * `minShared` selected k-gram fingerprints ([[TextAnalysis.winnow]]).
    * Where [[ngramJaccard]] compares WORD-shingle sets, winnowing selects
    * ~1/w of the CHARACTER k-grams with a positional guarantee (any
    * shared run of ≥ k+w−1 chars contributes a common fingerprint), so
    * this family catches partial-overlap/containment cases — a paragraph
    * lifted into an otherwise different document — that whole-document
    * similarity scores dilute away. Same inverted-index candidate shape
    * as every pair generator here: join on fingerprint, never O(n²),
    * with the [[docShingles]]-style stop-fingerprint cap (document
    * frequency > maxDf dropped) guarding the boilerplate-hot keys.
    *
    * The `maxDf` default is deliberately LOW (16, vs 1000 for word
    * shingles): a character k-gram fingerprint shared by more than a
    * handful of documents is template/boilerplate text, which is (a)
    * worthless as containment evidence and (b) quadratic join fuel —
    * on the template-heavy test corpus at sf0.1, cap 1000 leaves 144M
    * joined candidate rows where cap 16 leaves 283k, and the pairs the
    * high-df fps add are precisely the everything-matches-everything
    * noise. `minShared` = 5 ≈ a lifted run of ~80+ normalized chars
    * (each full window past the guarantee adds ~1 selected fp per w
    * positions).
    */
  def winnowPairs(docs: DataFrame, k: Int = 8, w: Int = 4,
                  minShared: Long = 5, maxDf: Long = 16): DataFrame = {
    val wfp = graft.core.PlanMemo.cached("dedup.winnowFps",
      TextAnalysis.winnow(docs, k, w))
    // Bucket pigeonhole: ONE fp-grain aggregation replaces the former
    // df table + join-back + posting self-join (whose two branches each
    // re-evaluated wfp ⋈ dfFilter — 4 stacked aggregate/join seams).
    // winnow's output is distinct (doc_id, fp) by construction, so the
    // per-fp doc list IS the bucket membership; pairs expand inside the
    // ≤ maxDf (=16) arrays — worst case 120 struct rows per bucket, far
    // below the row machinery of a relational self-join. Measured at
    // sf1 (same box A/B): 2.26 → 1.5 s warm, 8 → 5 jobs; identical
    // output (gate-green at sf0.01+sf1).
    //
    // The collect is CAPPED at maxDf+1 ([[CappedLongList]]): a viral
    // boilerplate fingerprint used to accumulate its FULL posting array
    // in the aggregation buffer before the size filter discarded it —
    // unbounded skew memory at scale. The cap pigeonholes overflow
    // (size = maxDf+1 > maxDf) into the same discard, with every
    // buffer O(maxDf); df ≤ maxDf buckets collect completely, so the
    // kept output is bit-identical to the uncapped form.
    val buckets = wfp.groupBy("fp")
      .agg(sort_array(
        CappedCollect.cappedLongList(col("doc_id").cast("long"),
          (maxDf + 1).toInt)).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
    buckets
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))),
          y => struct(x.as("a"), y.as("b")))))).as("pr"))
      .groupBy(col("pr.a").as("doc_a"), col("pr.b").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minShared)
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minOverlap` word shingles with any benchmark/eval document — the
    * n-gram-overlap contamination check every training pipeline runs
    * before a data release. Same inverted-index shape as
    * [[ngramJaccard]]: candidates must share a shingle, never O(n·m).
    * The corpus side keeps the `maxDf` stop-shingle skew cap; the
    * benchmark side is eval-sized and uncapped (a capped benchmark
    * shingle could hide real contamination).
    *
    * Recall tradeoff of the corpus-side cap: a document whose ONLY
    * shared shingles are high-DF boilerplate (df > maxDf in the corpus)
    * evades the flag — the cap drops those shingles before the join.
    * This is the standard precision/scale tradeoff (ubiquitous shingles
    * are near-useless contamination evidence AND quadratic join fuel);
    * callers that need full recall on boilerplate-heavy benchmarks
    * should raise `maxDf` (cost grows as Σ df² over kept shingles) or
    * lower `n` gram size so benchmark shingles are more specific.
    */
  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 3,
                    minOverlap: Long = 5, maxDf: Long = 1000): DataFrame = {
    val corpus = docShingles(docs, n, maxDf)
    val bench = benchmark
      .select(col("doc_id").as("bench_id"),
        split(TextAnalysis.normalized(col("text")), " ").as("toks"))
      .select(col("bench_id"),
        explode(shinglesFromTokens(col("toks"), n)).as("shingle"))
      .distinct()
    corpus.join(bench, "shingle")
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minOverlap)
  }

  /** Connected components over an undirected near-dup pair list — the
    * step every dedup family needs AFTER pair generation: near-duplicate
    * relations are not transitive pairwise, so "keep one doc per group"
    * requires the transitive closure. Returns one row per vertex that
    * appears in any pair: `(v, label)` where `label` is the component's
    * minimum vertex id (the canonical keeper); a vertex seen only in
    * self-pairs `(v, v)` is its own singleton component.
    *
    * Algorithm: alternating large-star/small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", 2014). The edge set
    * is kept canonical (larger → smaller endpoint, deduped); each round
    *   - LARGE-STAR: every node connects its strictly-larger neighbors
    *     to the minimum of its closed neighborhood, and
    *   - SMALL-STAR: every node rewires its smaller-or-equal neighbors
    *     (and itself) to that minimum,
    * which contracts components to stars rooted at their minimum vertex
    * in a logarithmic number of rounds — unlike naive min-label
    * propagation, whose round count is the component DIAMETER (O(n) on a
    * path graph). Convergence is exact: the round loop stops when the
    * canonical edge set reaches a fixpoint (a one-shuffle symmetric
    * difference probe per round), at which point the edge set is a star
    * forest and the labels are read off the star roots.
    *
    * Lineage truncation per round is mandatory (the plan doubles per
    * iteration otherwise and Catalyst analysis time dominates). The seam
    * is cluster-aware: when `spark.sparkContext.setCheckpointDir` has
    * been called, rounds truncate through fault-tolerant `checkpoint()`
    * (safe on a real cluster — a lost executor recomputes from the
    * checkpoint store); otherwise `localCheckpoint` (executor-pinned
    * blocks — fine for local mode, not for a 1000-executor job).
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b",
                          maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, aCol, bCol, maxIter)._1

  /** [[connectedComponents]] plus the number of star rounds it took —
    * the observable the convergence-rate spec pins (≤ 2·log₂(n) + c on
    * an adversarial scrambled path, vs O(n) for label propagation).
    */
  def connectedComponentsWithRounds(pairs: DataFrame, aCol: String = "doc_a",
                                    bCol: String = "doc_b",
                                    maxIter: Int = 50): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    def truncate(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()

    // canonical pairs (src = larger endpoint), deduped; self-pairs are
    // KEPT here — they carry vertices that must come out labeled as
    // their own singleton component — and filtered from the edge set
    // below. The upstream pair generator (often an expensive LSH
    // pipeline) is scanned exactly once: everything downstream reads
    // this one truncated frame.
    val canon = truncate(pairs
      .select(
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("src"),
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("dst"))
      .distinct())
    val vertsAll = canon.select(col("src").as("v"))
      .unionByName(canon.select(col("dst").as("v")))
      .distinct()
    var e = canon.filter(col("src") =!= col("dst"))
    // a clean corpus with no (or only self-) near-dup pairs is a normal
    // production input: the closure is the singletons, not a crash
    if (e.isEmpty)
      return (vertsAll.select(col("v"), col("v").as("label")), 0)
    val nVerts = vertsAll.count()

    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // large-star over the symmetric adjacency: for each u with closed-
      // neighborhood min m(u), emit (v → m(u)) for every neighbor v > u.
      // Every emitted edge stays canonical (v > u ≥ m(u)).
      val sym = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      val m1 = sym.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      val large = sym.join(m1, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
      // small-star over the (all-canonical) large output: each node a
      // rewires its smaller neighbors to their min m, keeping (a → m)
      val m2 = large.groupBy("src").agg(min("dst").as("m"))
      val small = large.join(m2, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .unionByName(m2.select(col("src"), col("m").as("dst")))
        .distinct()
      val eNew = truncate(small)
      // exact fixpoint probe: both sides are deduped canonical sets, so
      // the symmetric difference is the edges seen on exactly one side
      converged = eNew.select(col("src"), col("dst"), lit(1).as("side"))
        .unionByName(e.select(col("src"), col("dst"), lit(2).as("side")))
        .groupBy("src", "dst").agg(countDistinct("side").as("ns"))
        .filter(col("ns") === 1)
        .isEmpty
      e = eNew
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // fixpoint edge set is a star forest: leaves point at their root,
    // roots appear only as targets; vertices seen only in self-pairs
    // never entered the edge set and label themselves
    val leaf = e.groupBy("src").agg(min("dst").as("label"))
      .select(col("src").as("v"), col("label"))
    val roots = e.select(col("dst").as("v")).distinct()
      .join(leaf.select("v"), Seq("v"), "left_anti")
      .select(col("v"), col("v").as("label"))
    val inStars = leaf.unionByName(roots)
    val singletons = vertsAll.join(inStars.select("v"), Seq("v"), "left_anti")
      .select(col("v"), col("v").as("label"))
    val labels = truncate(inStars.unionByName(singletons))
    // every vertex that appeared in any pair must come out labeled — a
    // star-contraction bug must fail loudly, not drop documents
    val nLabeled = labels.count()
    require(nLabeled == nVerts,
      s"connectedComponents labeled $nLabeled of $nVerts vertices")
    (labels, round)
  }

  /** Cluster assignment for near-dup groups: every doc in a component,
    * its canonical cluster id (= min doc_id reachable), the component
    * size, and whether the doc is the keeper. Docs in no pair are their
    * own trivial cluster and are not emitted (callers union them back if
    * a total assignment is needed — they are by definition unchanged).
    */
  def dedupClusters(pairs: DataFrame): DataFrame =
    clustersOf(connectedComponents(pairs))

  /** [[dedupClusters]] over an already-computed `(v, label)` frame — the
    * fan-out entry point when one closure feeds several consumers (the
    * closure is the expensive iterative step; the assignments below are
    * one window over it).
    */
  /** Incremental duplicate-cluster maintenance — the cluster-level
    * counterpart of [[incrementalExact]]/the band-index probe: a stored
    * component labeling (the corpus's dedup state) is updated with a new
    * ingest wave's pair edges WITHOUT re-running connected components
    * over the historical edge set. Wave-edge endpoints collapse to
    * their stored labels, components are merged on the LABEL graph
    * (one node per touched component or new doc — index-sized, never
    * corpus-sized), and only rows of merged components are relabeled.
    *
    * EXACT by construction, not approximately: stored labels are the
    * min-doc of their component, the label-graph closure takes the min
    * over merged components, and min is associative — so the result
    * equals a full [[connectedComponents]] recompute over
    * old ∪ wave edges (which is precisely what the DuckDB twin does).
    * A wave doc smaller than an old cluster's keeper becomes the new
    * keeper, exactly as a full recompute would pick it.
    *
    * @param stored   (v, label) min-doc labeling of the current corpus
    *                 components ([[connectedComponents]] output)
    * @param waveEdges (doc_a, doc_b) new pairs — wave-internal and
    *                 wave-vs-corpus (from the stored band-index probe)
    * @param universe (doc_id) every document the output must label
    *                 (stored ∪ wave; unmatched docs label themselves)
    * @return (v, label) over the universe
    */
  def incrementalClusters(stored: DataFrame, waveEdges: DataFrame,
                          universe: DataFrame): DataFrame = {
    val lbl = stored.select(col("v").cast("long").as("doc_id"),
      col("label").cast("long").as("lab"))
    val labelEdges = waveEdges
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .join(lbl.select(col("doc_id").as("doc_a"), col("lab").as("la")),
        Seq("doc_a"), "left")
      .join(lbl.select(col("doc_id").as("doc_b"), col("lab").as("lb")),
        Seq("doc_b"), "left")
      .select(coalesce(col("la"), col("doc_a")).as("doc_a"),
        coalesce(col("lb"), col("doc_b")).as("doc_b"))
    // The label graph is index-sized by construction (one node per
    // touched component or new doc), and ProfIncr measured the whole
    // sf1 query cost sitting in the distributed closure's FIXED
    // per-round job overhead over a 2,443-edge graph (2.8 s of 3.0 s,
    // 3 star rounds). Below the cap (≤ ~4 MB collected, bounded by
    // contract) an exact driver union-find replaces it — identical
    // min-label output, microseconds of work; past the cap the star
    // closure runs as before, so a wave that touches millions of
    // components degrades to the proven distributed path instead of a
    // driver OOM.
    val edges = labelEdges.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merged =
      if (edges.count() <= SmallClosureEdgeCap) driverClosure(edges)
      else connectedComponents(edges)
    // both branches have fully materialized `edges` by the time they
    // return (driverClosure collects; connectedComponents eagerly
    // checkpoints its canonical frame), so the persist can be released
    // here — otherwise every ingest wave pins one more copy in executor
    // storage for the life of the session
    edges.unpersist(blocking = false)
    val remap = merged.select(col("v").as("lab"), col("label").as("nl"))
    val restitched = lbl.join(remap, Seq("lab"), "left")
      .select(col("doc_id").as("v"),
        coalesce(col("nl"), col("lab")).as("label"))
    val newDocs = universe.select(col("doc_id").cast("long"))
      .join(lbl.select("doc_id"), Seq("doc_id"), "left_anti")
    val newLabeled = newDocs
      .join(merged.select(col("v").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .select(col("doc_id").as("v"),
        coalesce(col("label"), col("doc_id")).as("label"))
    restitched.unionByName(newLabeled)
  }

  /** Edge cap for [[driverClosure]]: ≤ 2¹⁸ edges ≈ 4 MB collected —
    * the "bounded by contract" collect discipline (the Bloom-words /
    * centroid-ceiling pattern) applied to the label graph.
    * `GRAFT_DRIVER_CAP=0` forces the distributed star closure (the
    * bench's kernels-off leg; see `DriverGraph.DefaultEdgeCap`).
    */
  private final val SmallClosureEdgeCap: Long =
    graft.core.EnvKnobs.boundedLong("GRAFT_DRIVER_CAP", 1L << 18, 1L << 24)

  /** Exact driver-side min-label closure for index-sized edge sets:
    * union-find that always attaches the larger root under the
    * smaller, so every root IS the minimum member of its component —
    * the same (v, label = min reachable) contract as
    * [[connectedComponents]], without the per-round distributed-job
    * overhead that dominates tiny graphs.
    */
  private def driverClosure(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val rows = pairs
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    val verts = scala.collection.mutable.LinkedHashSet.empty[Long]
    rows.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      verts += a += b
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    verts.iterator.map(v => (v, find(v))).toSeq.toDF("v", "label")
  }

  /** Mergeable cluster-level MinHash signatures — the sketch-algebra
    * property that makes MinHash a 100 TB citizen: each component of a
    * doc signature is a MIN over the doc's hashed shingles, and min is
    * associative/commutative, so the elementwise min across a cluster's
    * doc signatures IS the signature of the union of their shingle sets
    * — computed WITHOUT re-shingling a single document. This is how
    * cluster-vs-cluster (or corpus-vs-corpus) near-dup comparison runs
    * at scale: merge index-sized signature rows, never raw text.
    *
    * One doc-keyed join (labels are co-grained with signatures) and one
    * cluster-grain aggregation of k tiny string mins.
    *
    * @param sigs   [[minhashSignatures]] output (doc_id, mh_0..mh_{k-1})
    * @param labels (v, label) component labeling over the same docs
    * @return (cluster_id, n_docs, mh_0..mh_{k-1}) ordered by cluster
    */
  def clusterSignatures(sigs: DataFrame, labels: DataFrame,
                        k: Int = 8): DataFrame = {
    val l = labels.select(col("v").as("doc_id"), col("label").as("cluster_id"))
    val aggs = count(lit(1)).as("n_docs") +:
      (0 until k).map(i => min(col(s"mh_$i")).as(s"mh_$i"))
    sigs.join(l, "doc_id")
      .groupBy("cluster_id")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("cluster_id")
  }

  def clustersOf(labels: DataFrame): DataFrame = {
    // sizes via a window, not a broadcast join: the cluster-count frame
    // grows with the corpus (it is NOT a dim table at 100 TB)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("label")
    labels
      .select(col("v").as("doc_id"), col("label").as("cluster_id"),
        count(lit(1)).over(w).as("cluster_size"),
        (col("v") === col("label")).as("is_keeper"))
  }

  /** Soft deduplication: instead of DROPPING near-duplicates, keep every
    * document and DOWN-WEIGHT each near-dup cluster to unit total mass —
    * weight 1/|cluster| per member (SoftDeDup, He et al. 2024: hard
    * dedup discards phrasing diversity the duplicates carry; reweighting
    * keeps it while removing the over-count bias in the training
    * objective). Docs outside every cluster weigh 1.0 (their own
    * singleton). The weights feed the sampler exactly where
    * [[graft.functions.TextAnalysis]]'s mixture/temperature weights do.
    *
    * Shape: one doc_id-keyed left join against the label closure and one
    * label-partitioned window — the closure is the expensive step and is
    * shared (memoized) with the cluster/canonical consumers; nothing
    * here exceeds one corpus-grain exchange on `cluster_id`.
    */
  def softWeights(docs: DataFrame, labels: DataFrame): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    docs.select(col("doc_id"))
      .join(labels.select(col("v").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("weight",
        round((lit(1.0) / col("cluster_size").cast("double")).cast(d2012), 9)
          .cast("double"))
  }

  /** Quality-aware canonical selection: the end of the dedup funnel.
    * [[dedupClusters]] keeps the MINIMUM doc_id of each component — fine
    * as a deterministic tie-break, but production pipelines keep the
    * BEST document of each near-dup cluster (longest, highest quality
    * score), not the one with the smallest id. Given the corpus and a
    * near-dup pair list, returns one row per clustered doc:
    * `(doc_id, cluster_id, n_tokens, cluster_size, is_keeper)` where the
    * keeper is the cluster's argmax of `n_tokens` (ties → min doc_id).
    * Callers union the un-clustered remainder back (unchanged by
    * definition) and filter `is_keeper` to materialize the deduped set.
    *
    * Scale: the component labels come from the O(log n)-round star
    * contraction; the quality join is doc_id-keyed (co-partitioned with
    * the label frame); both windows share ONE cluster_id shuffle — the
    * frame under the windows is cluster-member-sized, not corpus-sized.
    */
  def canonicalDocs(docs: DataFrame, pairs: DataFrame,
                    quality: Column = size(split(col("text"), " "))): DataFrame =
    canonicalOf(docs, connectedComponents(pairs), quality)

  /** [[canonicalDocs]] over an already-computed `(v, label)` closure —
    * shares one component computation with [[clustersOf]] consumers.
    */
  def canonicalOf(docs: DataFrame, labels: DataFrame,
                  quality: Column = size(split(col("text"), " "))): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labeled = labels
      .select(col("v").as("doc_id"), col("label").as("cluster_id"))
    val scored = docs.select(col("doc_id"), quality.as("n_tokens"))
    val w = Window.partitionBy("cluster_id")
    val byQuality = w.orderBy(col("n_tokens").desc, col("doc_id").asc)
    labeled.join(scored, "doc_id")
      .select(col("doc_id"), col("cluster_id"), col("n_tokens"),
        count(lit(1)).over(w).as("cluster_size"),
        (row_number().over(byQuality) === 1).as("is_keeper"))
  }

  /** The `maxDist+1` pigeonhole band layout over a 64-bit fingerprint:
    * band i covers bits `[i·64/nb, (i+1)·64/nb)`. A pair within hamming
    * `maxDist` has at most `maxDist` differing bits across `maxDist+1`
    * disjoint bands, so SOME band matches exactly — FULL recall, not the
    * probabilistic kind. Fixing the band count (e.g. 4×16 bits) while
    * letting maxDist grow past bands−1 would silently drop qualifying
    * pairs whose differing bits spread across all bands.
    */
  private[functions] def simhashBands(maxDist: Int): Seq[(Int, Int, Long)] = {
    require(0 <= maxDist && maxDist < 32, s"maxDist $maxDist out of range")
    simhashBandLayout(maxDist + 1)
  }

  /** `nb` contiguous bands over a 64-bit fingerprint: band i covers bits
    * `[i·64/nb, (i+1)·64/nb)`. */
  private[graft] def simhashBandLayout(nb: Int): Seq[(Int, Int, Long)] = {
    require(1 <= nb && nb <= 64, s"band count $nb out of range")
    (0 until nb).map { i =>
      val start = i * 64 / nb
      val width = (i + 1) * 64 / nb - start
      val mask = if (width == 64) -1L else (1L << width) - 1
      (i, start, mask)
    }
  }

  /** Auto-pick the clean-band requirement `r` for [[simhashPairs]]: the
    * smallest r whose composite join key carries ≥ 12 bits of
    * fingerprint (r·64/(maxDist+r)), backed off until the subset
    * enumeration C(maxDist+r, r) stays ≤ 256 exploded rows per doc.
    * maxDist=3 → r=1 (the classic 4×16-bit layout is already
    * selective); maxDist=8 → r=2 (10 bands, 45 band-pair keys of ~13
    * bits — the maxDist+1 layout's 7-bit keys admit n²/2⁷ chance
    * collisions per band, the measured 30×-scale blowup).
    */
  private[graft] def simhashCleanBands(maxDist: Int): Int = {
    def choose(n: Int, k: Int): Long =
      (1 to k).foldLeft(1L)((a, i) => a * (n - k + i) / i)
    val enough = (1 to 4).find(r => r * 64 / (maxDist + r) >= 12).getOrElse(4)
    (enough to 1 by -1).find(r => choose(maxDist + r, r) <= 256).getOrElse(1)
  }

  /** SimHash near-dup pairs within hamming ≤ maxDist, candidates blocked
    * on composite pigeonhole keys: the fingerprint splits into
    * `maxDist + r` bands, and each doc is keyed by every r-subset of its
    * band buckets (`r` = [[simhashCleanBands]], or `cleanBands` when
    * given). A pair within hamming maxDist has ≤ maxDist dirty bands out
    * of maxDist+r, hence ≥ r clean ones, so SOME enumerated subset
    * matches exactly — FULL recall, the same pigeonhole argument as the
    * classic maxDist+1 layout, but each join key now carries r bands'
    * bits. That selectivity is what survives scale: the maxDist=8
    * single-band layout keys on ~7 bits, admitting n²·9/2⁷ chance
    * candidates (the measured superlinear wall at 30×); the r=2 layout
    * keys on ~13 bits for an ~11× candidate cut at 45/9 = 5× the
    * (doc-grain, 3-long-wide) band rows.
    *
    * Execution: ONE shuffle (band rows repartitioned by bucket) into a
    * per-bucket primitive-array kernel — see the measurement note in the
    * body for why this beats the relational self-join here (candidate
    * volume is ~240× the output and each candidate needs 3 machine
    * ops; the join's row machinery was the whole 30×-scale wall). The
    * band rows CARRY the 64-bit fingerprint, so hamming is computed
    * in-kernel with no signature re-join, and a pair agreeing on
    * several subsets is emitted exactly once: only the meeting whose
    * subset is the LEX-FIRST r clean bands counts (read straight off
    * the XOR — every clean band below the subset's max must be IN the
    * subset).
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   cleanBands: Int = 0): DataFrame = {
    val r = if (cleanBands > 0) cleanBands else simhashCleanBands(maxDist)
    val layout = simhashBandLayout(maxDist + r)
    val subsets = layout.combinations(r).toIndexedSeq
    def bucketOf(c: Column, start: Int, mask: Long): Column =
      shiftright(c, start).bitwiseAND(mask)
    // both sides of the self-join read it
    val sh = graft.core.PlanMemo.cached("dedup.simhash", simhash(docs))
    // composite key per subset: the r band buckets packed side by side
    // (total width r·64/nb ≤ 64 bits — always one long)
    def keyOf(s: Seq[(Int, Int, Long)]): Column =
      s.foldLeft((lit(0L), 0)) { case ((acc, off), (_, start, mask)) =>
        (acc.bitwiseOR(shiftleft(
          bucketOf(col("simhash"), start, mask), off)),
          off + java.lang.Long.bitCount(mask))
      }._1
    val bands = sh.select(col("doc_id"), col("simhash"),
      posexplode(array(subsets.map(keyOf): _*)).as(Seq("sid", "bucket")))
    // lex-first dedup mask per subset: bands below the subset's max that
    // are NOT in the subset must all be dirty for this meeting to count
    val notAllow = subsets.map { s =>
      val inS = s.map(b => 1L << b._1).reduce(_ | _)
      val below = (1L << s.map(_._1).max) - 1
      below & ~inS
    }.toArray
    // Bucket-local pair kernel instead of a relational self-join.
    // MEASURED (ProfSimhash, sf3 = 30×, 150k docs): the bucket join
    // generates 1.13e9 candidate rows for 4.7M output pairs, and the
    // 12 s wall is the join's ROW MACHINERY, not predicate work —
    // reordering filters (hamming first) changed nothing, composite
    // r-subset keys cut candidates 2.7× but near-dup clusters meet on
    // every subset so wall stayed flat, and a df cap would drop 3.1M of
    // the 4.7M genuine pairs (their least-hot clean band sits in a
    // 1k–4k-df bucket — the corpus's near-dup mass lives IN the hot
    // buckets). A candidate here needs 3 machine ops (xor, popcount,
    // compare); the one shape that pays 3 ops and not a row
    // materialization is a per-bucket primitive-array loop: repartition
    // the (doc-grain, 4-long-wide) band rows by bucket, sort within
    // partitions so each bucket is a run, and stream runs through a
    // tight kernel that emits ONLY matches. Same exchange count as the
    // shuffle join (one), no candidate frame ever exists.
    val spark = docs.sparkSession
    import spark.implicits._
    val lay = layout.map { case (_, start, mask) => (start, mask) }.toArray
    val na = notAllow
    val md = maxDist
    val keyed = bands
      .select(col("sid").cast("int"), col("bucket"), col("doc_id"),
        col("simhash"))
      .repartition(col("sid"), col("bucket"))
      .sortWithinPartitions(col("sid"), col("bucket"))
      .as[(Int, Long, Long, Long)]
    keyed.mapPartitions { rows =>
      val buf = rows.buffered
      // consume one (sid, bucket) run into primitive arrays
      def nextRun(): (Int, Array[Long], Array[Long]) = {
        val (sid, bucket, id0, fp0) = buf.next()
        val ids = scala.collection.mutable.ArrayBuffer(id0)
        val fps = scala.collection.mutable.ArrayBuffer(fp0)
        while (buf.hasNext && buf.head._1 == sid && buf.head._2 == bucket) {
          val row = buf.next(); ids += row._3; fps += row._4
        }
        (sid, ids.toArray, fps.toArray)
      }
      Iterator.continually(()).takeWhile(_ => buf.hasNext).flatMap { _ =>
        val (sid, ids, fps) = nextRun()
        val deny = na(sid)
        val n = ids.length
        (0 until n - 1).iterator.flatMap { i =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          val fi = fps(i); val ii = ids(i)
          var j = i + 1
          while (j < n) {
            val xor = fi ^ fps(j)
            val h = java.lang.Long.bitCount(xor)
            if (h <= md) {
              // lex-first dedup: this meeting counts only when every
              // clean band outside (and below the max of) this subset
              // is denied — i.e. the subset IS the first r clean bands
              var cm = 0L
              var k = 0
              while (k < lay.length) {
                if (((xor >>> lay(k)._1) & lay(k)._2) == 0L) cm |= (1L << k)
                k += 1
              }
              if ((cm & deny) == 0L) {
                val jj = ids(j)
                out += ((math.min(ii, jj), math.max(ii, jj), h))
              }
            }
            j += 1
          }
          out
        }
      }
    }.toDF("doc_a", "doc_b", "hamming")
  }

  // ── Bloom-pruned incremental dedup ─────────────────────────────────
  //
  // The production shape for HIGH-NOVELTY ingest waves: when most batch
  // documents are genuinely new, [[incrementalExact]]'s index join does
  // a corpus-index-sized shuffle to discover mostly misses. A Bloom
  // filter over the index fingerprints — bounded bits, broadcast to
  // every executor — answers "definitely new" for the bulk of the batch
  // BEFORE the join, so only might-contain suspects (true dups + the
  // filter's false positives) reach the index at all. The final verdict
  // is still the exact join: false positives cost a probe, never an
  // answer.
  //
  // The k bit positions derive from md5 of the fingerprint (identical
  // hex arithmetic in Spark and DuckDB), so the filter itself — not
  // just the pruned result — is oracle-comparable.

  /** Bit position `i` of `fp`'s Bloom probe: the first 8 md5 hex chars
    * of `fp:i` read as an integer, mod `mBits`. Non-negative (8 hex
    * chars < 2^32), so `%` and `pmod` agree.
    */
  private def bloomPos(fp: Column, i: Int, mBits: Int): Column =
    conv(substring(md5(concat(fp, lit(s":$i"))), 1, 8), 16, 10)
      .cast("long") % mBits

  /** Build the filter: the distinct set bits of the index's
    * fingerprints, packed into `mBits / 64` longs. The collect is
    * by-contract bounded at `mBits` bits (16 KiB of words at the
    * default 2^17) — sketch-sized, like the ANN centroid/codebook
    * collects, NOT corpus-sized; the bit-position frame it reads is
    * already distinct-aggregated to ≤ mBits rows.
    */
  def bloomBuild(index: DataFrame, mBits: Int = 1 << 17,
                 k: Int = 4): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"bloomBuild: mBits $mBits")
    val pos = index.select(explode(array(
        (0 until k).map(i => bloomPos(col("fp"), i, mBits)): _*)).as("p"))
      .distinct()
      .collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    pos.foreach(p => words(p.toInt >> 6) |= 1L << (p.toInt & 63))
    words
  }

  /** Classify an ingest batch against a stored exact-fingerprint index
    * with Bloom pre-pruning: output one row per batch document with
    * `bloom_hit` (did the filter say "maybe"), `status`
    * (`corpus_dup` / `novel`) and the corpus keeper for dups. Documents
    * the filter clears skip the index join entirely — at scale the join
    * input shrinks to the dup rate plus the filter's false-positive
    * rate. Exactness is unconditional: the join, not the filter,
    * decides `status`.
    */
  def bloomPrunedIncremental(index: DataFrame, batch: DataFrame,
                             mBits: Int = 1 << 17, k: Int = 4): DataFrame = {
    // the stored index feeds BOTH the bloom-words collect and the
    // suspect join — uncached, an in-plan index (exactIndex over the
    // corpus) re-runs its md5 pass per consumer; memoized at fp grain,
    // size-gated like every corpus-adjacent memo
    val idx =
      if (index.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30))
        graft.core.PlanMemo.cached("dedup.bloomIndex", index)
      else index
    val words = bloomBuild(idx, mBits, k)
    val wordsLit = typedLit(words.toSeq)
    val fps = batch.select(col("doc_id"),
      md5(TextAnalysis.normalized(col("text"))).as("fp"))
    val mightContain = (0 until k).map { i =>
      val p = bloomPos(col("fp"), i, mBits)
      element_at(wordsLit, shiftright(p, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (p % 64).cast("int")))
        .=!=(0L)
    }.reduce(_ && _)
    val flagged = fps.withColumn("bloom_hit", mightContain)
    val suspects = flagged.filter(col("bloom_hit"))
      .join(idx.select(col("fp"),
        col("keeper_doc_id").as("corpus_keeper")), Seq("fp"), "left")
    val cleared = flagged.filter(!col("bloom_hit"))
      .withColumn("corpus_keeper", lit(null).cast("long"))
    suspects.unionByName(cleared)
      .select(col("doc_id"), col("bloom_hit"),
        when(col("corpus_keeper").isNotNull, lit("corpus_dup"))
          .otherwise(lit("novel")).as("status"),
        col("corpus_keeper").as("keeper_doc_id"))
  }
}
