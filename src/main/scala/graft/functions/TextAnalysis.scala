package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * quality scoring, token counting, language ID, fingerprinting.
  * All built from codegen'd native functions (no UDFs) so they stay
  * inside whole-stage codegen on the 100 TB path; every computed value is
  * reproducible in the DuckDB oracle.
  */
object TextAnalysis {

  /** Small multilingual stopword marker sets for the n-gram/stopword
    * language-ID heuristic (public common-word lists).
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "que"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人"))

  val englishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish lexical tokens: word pieces or single non-space symbols. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), lit(0))

  /** Per-document quality metrics (length / punctuation / stopword
    * ratios), one row per doc. Ratios are exact-rational-free doubles but
    * every operand is integer-derived, so cross-engine equality holds.
    */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val stopArr = array(englishStopwords.map(lit): _*)
    // nullif guards: a zero-length text (legal input the fixtures never
    // carry) must yield NULL ratios, not an ANSI DIVIDE_BY_ZERO crash —
    // downstream quality gates then drop the row, the right semantics
    val nChars = nullif(length(col("text")), lit(0))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      size(regexTokens(col("text"))).as("n_lex_tokens"),
      (length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("double") /
        nChars).as("punct_ratio"),
      (length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
        nChars).as("alpha_ratio"),
      (size(filter(toks, t => array_contains(stopArr, t))).cast("double") /
        nullif(size(toks), lit(0))).as("stopword_ratio"),
      (length(col("text")).cast("double") /
        nullif(size(toks), lit(0))).as("avg_token_len"))
  }

  /** Stopword-marker language ID: score = marker hits per language,
    * argmax with alphabetical tie-break, 'und' (undetermined) when no
    * marker hits at all.
    */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = docs.select(
      (col("doc_id") +: col("text") +:
        markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
          val arr = array(ws.map(lit): _*)
          size(filter(toks, t => array_contains(arr, t))).as(s"score_$lang")
        }): _*)
    val langs = markers.keys.toSeq.sorted
    val best = langs.map(l => col(s"score_$l")).reduce((a, b) => greatest(a, b))
    // argmax; the when-chain runs in alphabetical order so the first
    // language hitting the max wins ties deterministically
    val pick = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    scored.select(
      (col("doc_id") +: langs.map(l => col(s"score_$l")) :+
        pick.as("predicted_lang")): _*)
  }

  /** Token counts: whitespace tokens and BPE-ish lexical tokens. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("ws_tokens"),
      size(regexTokens(col("text"))).as("lex_tokens"))

  /** Per-source corpus profile — the data card a curation run publishes
    * with its output (what a 100 TB corpus's per-domain dashboard is
    * made of): document and token volumes, language spread (distinct
    * langs, dominant lang and its share), and exact-duplicate exposure
    * (documents whose normalized content fingerprint collides anywhere
    * in the corpus — the fp test is corpus-GLOBAL, so cross-source
    * copies count in both sources' rows).
    *
    * Scale shape: one fp-grain groupBy + join-back (the dd_exact
    * shuffle), then source-grain aggs — source cardinality is
    * dashboard-sized, the heavy frames never exceed corpus grain.
    */
  def corpusProfile(docs: DataFrame): DataFrame = {
    import graft.core.Money
    // the narrow (source, lang, n_tok, fp) projection is the expensive
    // pass (md5 + normalize over every document) and three consumers
    // read it (the dup-count, the per-source aggregate, the top-lang
    // rank) — memoized so the text is fingerprinted once; the corpus
    // dup count rides an fp-partitioned window (distributed, one
    // shuffle) instead of a count-aggregate + join-back (two)
    val basePlan = docs.select(col("source"), col("lang"),
      size(tokens(col("text"))).as("n_tok"),
      md5(normalized(col("text"))).as("fp"))
    val base =
      if (docs.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30))
        graft.core.PlanMemo.cached("text.corpusProfileBase", basePlan)
      else basePlan
    val agg = base.withColumn("n_fp", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        countDistinct("lang").as("n_langs"),
        sum(when(col("n_fp") > 1, 1L).otherwise(0L)).as("dup_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(desc("n"), asc("lang"))
    val top = base.groupBy("source", "lang").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("n").as("top_n"))
    agg.join(top, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        Money.ratio2(col("n_tokens"), col("n_docs")).as("avg_tokens"),
        col("n_langs"), col("top_lang"),
        Money.ratio2(col("top_n"), col("n_docs")).as("top_lang_share"),
        col("dup_docs"),
        Money.ratio2(col("dup_docs"), col("n_docs")).as("dup_share"))
  }

  /** Content fingerprints: md5 of the whitespace-normalized text (the
    * canonical exact-dedup key), Spark's block-based xxhash64, and the
    * engine's own codegen'd FNV-1a rolling hash ([[Fnv1a64]]). The
    * oracle-comparable fingerprint is the md5; the native hashes are
    * exercised by unit tests.
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val norm = normalized(col("text"))
    docs.select(
      col("doc_id"),
      md5(norm).as("md5_fp"),
      xxhash64(norm).as("xx64_fp"),
      Fnv1a64.fnv1a64(norm).as("fnv_fp"))
  }

  /** Corpus vocabulary: token → document frequency + total occurrences,
    * the vocab-building pass of a training-data pipeline. One explode +
    * one shuffle; `topK` bounds the result via TakeOrderedAndProject.
    */
  def vocabulary(docs: DataFrame, topK: Int = 100): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(normalized(col("text")), " ")).as("token"))
    tok.groupBy("token")
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("doc_frequency"))
      .orderBy(desc("occurrences"), asc("token"))
      .limit(topK)
  }

  /** TF-IDF scores per (doc, token): tf × ln(N / df). The logarithm is
    * rounded through decimal space (9 dp) so libm ulp differences can't
    * break cross-engine equality (same trick as Similarity.roundSim).
    */
  /** Corpus-token explode at (doc_id, token) OCCURRENCE grain — the
    * memoized frame the unigram-consuming family shares
    * ([[unigramLogProb]], [[bigramLogProb]]'s unigram leg,
    * [[graft.functions.Search.bm25TopK]]): one normalize+split pass per
    * (session, corpus) however many queries read it.
    */
  private[graft] def unigramToks(docs: DataFrame): DataFrame = {
    val plan = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(split(normalized(col("text")), " ")).as("token"))
    // corpus-token grain — size-gated like every corpus-grain memo
    // (consumers recompute past the gate instead of pinning ~100 TB)
    if (docs.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30))
      graft.core.PlanMemo.cached("text.unigramToks", plan)
    else plan
  }

  /** Per-document token counts at (doc_id, token) TYPE grain, memoized
    * — shared by [[tfIdf]] (tf leg + df leg) and [[subwordEncode]]
    * (vocab learn + encode join-back); layered over [[unigramToks]] so
    * the explode itself is also shared.
    */
  private[graft] def docTokenCounts(docs: DataFrame): DataFrame = {
    val plan = unigramToks(docs).groupBy("doc_id", "token")
      .agg(count(lit(1)).as("n"))
    if (docs.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30))
      graft.core.PlanMemo.cached("text.docTokenCounts", plan)
    else plan
  }

  def tfIdf(docs: DataFrame): DataFrame = {
    val tf = docTokenCounts(docs).withColumnRenamed("n", "tf")
    val df = tf.groupBy("token")
      .agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    graft.core.Scalars.crossBroadcast(tf.join(df, "token"), n)
      .withColumn("tf_idf",
        round((col("tf") * log(col("n_docs").cast("double") / col("df")))
          .cast(org.apache.spark.sql.types.DecimalType(20, 12)), 9)
          .cast("double"))
      .select("doc_id", "token", "tf", "df", "tf_idf")
  }

  /** Character-level Shannon entropy of the normalized text — the
    * gibberish/degenerate-content signal quality pipelines threshold on
    * (natural prose sits near the language's char entropy, ~2.5–3 nats
    * for English; keyboard mash and single-char runs fall far below,
    * base64/hex blobs above). H = −Σ (c/n)·ln(c/n) over per-doc char
    * counts.
    *
    * Shape: ZERO shuffle — the whole computation is per-document, so it
    * runs as one narrow projection over the corpus scan. Char counts
    * come from a sorted-chars run-length pass (array_sort, then run
    * boundaries via positions where s[i] ≠ s[i−1]); the earlier
    * explode-to-(doc, char)-grain form exchanged ~1 shuffle row per
    * input BYTE, per-row overhead dwarfing the payload at corpus scale.
    * Each entropy term still rounds 9 dp through decimal and the
    * per-doc sum folds AS DECIMAL — term order cannot move the result
    * (the BM25 pattern), so the fold equals the old aggregate exactly.
    */
  def charEntropy(docs: DataFrame): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    val d209 = org.apache.spark.sql.types.DecimalType(20, 9)
    val nt = docs.select(col("doc_id"), normalized(col("text")).as("t"))
      .filter(length(col("t")) >= 1)
    // sorted code-point array: split-by-empty-pattern is O(n) (substr
    // per position would re-seek the UTF-8 offset, O(n²) on long docs);
    // Java's zero-width split leaves a trailing "" under limit −1 —
    // the length filter drops it
    val sorted = nt.select(col("doc_id"),
      array_sort(filter(split(col("t"), ""), c => length(c) === 1)).as("cs"))
    val n = size(col("cs"))
    // 0-based positions opening a run of equal chars (ANSI-safe: all
    // element_at indices here are in [1, n])
    val runStarts = filter(sequence(lit(0), n - 1), i =>
      (i === 0) ||
        (element_at(col("cs"), i + 1) =!= element_at(col("cs"), i)))
    val withRuns = sorted.select(col("doc_id"), size(col("cs")).as("n"),
      runStarts.as("b"))
    // run length = next boundary − this boundary (last run ends at n)
    val m = size(col("b"))
    val runLens = transform(sequence(lit(0), m - 1), j =>
      when(j === m - 1, col("n")).otherwise(element_at(col("b"), j + 2))
        - element_at(col("b"), j + 1))
    val terms = transform(runLens, c => {
      val p = c.cast("double") / col("n")
      round((p * log(p)).cast(d2012), 9).cast(d209)
    })
    withRuns.select(col("doc_id"), col("n").cast("int").as("n_chars"),
      (-aggregate(terms, lit(0).cast(d209),
        (acc, x) => (acc + x).cast(d209))).cast("double").as("entropy"))
  }

  /** Repetition metrics, the Gopher/RefinedWeb-style filter signals for
    * boilerplate and degenerate generations: duplicate-token fraction
    * (1 − distinct/total), most-frequent-token coverage, and
    * most-frequent-bigram coverage. All ratios divide exact integer
    * counts, so the doubles are bit-identical in any engine. A corpus
    * filter drops documents above thresholds (e.g. top-bigram coverage
    * > 0.18 in Gopher's rules); the operator emits the raw signals.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val base = docs.repartition(col("doc_id"))
      .select(col("doc_id"), split(normalized(col("text")), " ").as("t"))
    val tokStats = base
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_tok"))
    val bigramStats = base
      .select(col("doc_id"),
        explode(Dedup.shinglesFromTokens(col("t"), 2)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_bigrams"),
        max("c").as("top_big"))
    tokStats.join(bigramStats, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
          .as("dup_token_frac"),
        (col("top_tok").cast("double") / col("n_tokens"))
          .as("top_token_frac"),
        coalesce(col("top_big").cast("double") / col("n_bigrams"), lit(0.0))
          .as("top_bigram_frac"))
  }

  /** Deterministic hash-based train/validation/test split: the md5 of
    * the id assigns each doc to a bucket in [0, 256); cut points carve
    * the split. Reproducible across engines, runs, and cluster layouts —
    * the property random `sample()` lacks. Also the primitive for
    * hash-systematic sampling (`bucket < pct * 256 / 100`).
    */
  def hashSplit(docs: DataFrame, idCol: String = "doc_id",
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = md5Shard(col(idCol))
    val trainCut = trainPct * 256 / 100
    val valCut = (trainPct + valPct) * 256 / 100
    docs.withColumn("split_bucket", bucket)
      .withColumn("split",
        when(col("split_bucket") < trainCut, "train")
          .when(col("split_bucket") < valCut, "validation")
          .otherwise("test"))
  }

  /** Stratified deterministic sample: the `n` documents per stratum
    * whose md5(id) ranks lowest — a balanced eval/inspection subset
    * (equal representation per source) that is REPRODUCIBLE: the hash
    * order is a property of the ids, not of partitioning, seed plumbing,
    * or engine version, so any engine draws the identical subset (unlike
    * `sampleBy`, whose draw depends on Spark's RNG stream). `id` breaks
    * md5 collisions so the rank is total.
    *
    * Scale: rank-per-stratum is a window, but Spark rewrites the
    * `row_number <= n` filter to a WindowGroupLimit — every partition
    * pre-truncates to its local top-n BEFORE the stratum shuffle, so
    * the exchange carries ≤ n·partitions rows, not the corpus. A few
    * giant strata therefore cost n·partitions, not |stratum| (the same
    * mechanism `q_window_topk` pins in PlanSpec).
    */
  def stratifiedSample(data: DataFrame, strata: String = "source",
                       id: String = "doc_id", n: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata)
      .orderBy(md5(col(id).cast("string")), col(id))
    data.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /** Weight-proportional sampling without replacement (Efraimidis &
    * Spirakis's A-ES, "Weighted random sampling with a reservoir",
    * IPL 2006): each row draws a deterministic md5 uniform u ∈ (0,1)
    * and ranks by ln(u)/w — the global top-k of that key is exactly a
    * weighted sample without replacement. ln(u)/w orders identically
    * to the paper's u^(1/w) (monotone in it) while staying far from
    * double rounding cliffs; the emitted key is decimal-rounded to 9
    * like every cross-engine score here.
    *
    * Scale: a per-row projection plus ONE top-k (TakeOrderedAndProject
    * — per-partition heaps, k rows to the driver stage, no sort of the
    * corpus). The classic reservoir formulation is sequential; the
    * rank-key formulation IS its distributed equivalent.
    */
  def weightedSample(docs: DataFrame, k: Int = 50,
                     weight: Column = col("n_chars")): DataFrame = {
    val u = (conv(substring(md5(concat(lit("ws:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double") +
        lit(0.5)) / lit(4294967296.0)
    docs.select(col("doc_id"), weight.cast("double").as("weight"),
        Similarity.roundSim(log(u) / weight.cast("double")).as("samp_key"))
      .filter(col("weight") > 0)
      .orderBy(desc("samp_key"), asc("doc_id"))
      .limit(k)
  }

  /** Data-mixture sampling: downsample each source/domain to a token
    * budget — the "mixture weights" step of assembling a pretraining
    * corpus from heterogeneous sources. Rate-based: per source the keep
    * rate is `min(1, budget / total_tokens)` and a document is kept when
    * its deterministic md5 uniform draw falls under its source's rate,
    * so expected kept tokens ≈ budget with zero per-source ordering.
    *
    * That design choice IS the 100 TB posture: the exact-prefix
    * alternative (sort each source by hash, cumulative-sum tokens, cut
    * at the budget) needs a total order per source — one reducer owns a
    * dominant source. Here the only aggregation is at SOURCE grain
    * (tiny), broadcast back over the corpus; the keep decision is a
    * per-row projection. Deterministic across runs and cluster layouts
    * (same md5 draw as [[hashSplit]]), reproducible by construction.
    *
    * Emits every doc with its `keep` verdict (filtering is the caller's
    * one-liner; emitting all keeps the operator pure and auditable).
    * A source absent from `budgets` gets `defaultBudget`.
    */
  def mixtureSample(docs: DataFrame, budgets: Map[String, Long],
                    defaultBudget: Long = 0L): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(tokens(col("text"))).as("n_tokens"))
    val budgetCol = budgets.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultBudget)) { case (acc, (src, b)) =>
        when(col("source") === src, lit(b)).otherwise(acc)
      }
    // integer token totals are exact; the rate division and comparison
    // use identical operands on both engines → identical IEEE doubles
    val rates = toks.groupBy("source")
      .agg(sum("n_tokens").as("total_tokens"))
      .select(col("source"),
        least(lit(1.0),
          budgetCol.cast("double") / col("total_tokens").cast("double"))
          .as("rate"))
    // md5 uniform draw in [0, 1): first 8 hex chars = 32 bits
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    toks.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (u < col("rate")).as("keep"))
  }

  /** Temperature-weighted mixture sampling — the multilingual-
    * pretraining rebalance (Conneau & Lample; XLM-R §3.1): source `s`
    * is sampled proportionally to `n_s^alpha` rather than `n_s`, so
    * `alpha < 1` flattens the source distribution and upweights tail
    * sources a proportional sample would starve. Per-source keep rate:
    * `rate_s = min(1, budget · w_s / W / n_s)` with `w_s = n_s^alpha`,
    * `W = Σ w_s` — the budget splits across sources by tempered share,
    * then converts to a rate against the source's own token mass. The
    * keep decision is the same per-row md5 uniform draw as
    * [[mixtureSample]].
    *
    * Scale: the only aggregation is at source grain (tiny, broadcast
    * back); the keep decision is a per-row projection. Parity: `pow` is
    * the one libm call — routed through the 9-dp decimal rounding guard
    * (the [[tfIdf]] ln discipline); `W` sums in decimal (exact,
    * order-independent); every other operand is an integer cast or an
    * IEEE-deterministic double op mirrored operand-for-operand in the
    * twin.
    */
  def temperatureMix(docs: DataFrame, budgetTokens: Long,
                     alpha: Double = 0.5): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    val toks = docs.select(col("doc_id"), col("source"),
      size(tokens(col("text"))).as("n_tokens"))
    val weighted = toks.groupBy("source")
      .agg(sum("n_tokens").as("total_tokens"))
      .withColumn("w",
        round(pow(col("total_tokens").cast("double"), lit(alpha))
          .cast(d2012), 9))
    // w_total windows over the source-grain frame (bounded by |sources|)
    // — the crossBroadcast form re-ran the corpus token count for its
    // broadcast side
    val rates = weighted
      .withColumn("w_total", sum("w").over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(0))))
      .select(col("source"),
        least(lit(1.0),
          lit(budgetTokens).cast("double") * col("w").cast("double") /
            col("w_total").cast("double") /
            col("total_tokens").cast("double")).as("rate"))
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    toks.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (u < col("rate")).as("keep"))
  }

  /** Deterministic fractional-epoch upsampling — pretraining data
    * schedules repeat high-value sources a FRACTIONAL number of times
    * (a source "seen for 2.5 epochs"): every document emits `floor(f)`
    * full copies plus one more when its md5 draw lands under
    * `frac(f)`, so each source contributes `f·n_s` documents in
    * expectation while staying bit-reproducible run-to-run (no RNG
    * state — the draw is a pure function of doc_id, salted `:epoch` so
    * it decorrelates from [[mixtureSample]]'s keep draw). A factor
    * below 1 downsamples the same way ([[temperatureMix]]'s rate
    * form, expressed as epochs).
    *
    * Scale: one narrow projection + a per-row `sequence` explode —
    * output rows = Σ f·n_s, no shuffle at all. The `when(n ≥ 1)` guard
    * matters: Spark's `sequence(1, 0)` counts DOWN (yielding [1, 0]),
    * it does not produce an empty array.
    */
  def epochRepeat(docs: DataFrame, factors: Map[String, Double],
                  defaultFactor: Double = 1.0): DataFrame = {
    val f = factors.toSeq.sortBy(_._1).foldLeft(lit(defaultFactor)) {
      case (acc, (src, x)) => when(col("source") === src, lit(x)).otherwise(acc)
    }
    val u = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":epoch"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    docs.select(col("doc_id"), col("source"))
      .withColumn("n_copies",
        floor(f).cast("int") + when(u < (f - floor(f)), 1).otherwise(0))
      .withColumn("copy", explode(when(col("n_copies") >= 1,
        sequence(lit(1), col("n_copies"))).otherwise(array())))
      .select(col("doc_id"), col("source"), col("copy").cast("int").as("copy"))
  }

  /** lower + collapse whitespace + trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Unigram log-probability quality score — the corpus-statistics
    * cousin of a KenLM perplexity filter, at unigram order: each token
    * scores `ln(count(token) / N)` against the corpus' own unigram
    * distribution, and a document's score is the mean over its tokens.
    * Documents full of corpus-rare tokens (OCR noise, mojibake, code
    * soup) score far below fluent text; curation pipelines threshold on
    * it next to the heuristic C4 flags.
    *
    * Shuffles: one at token grain for the counts, one token-grain join
    * back (vocab side is aggregate-sized; AQE broadcasts it when small),
    * one at doc grain for the mean. Cross-engine parity: each ln routes
    * through the 9-dp decimal rounding (libm ulp guard, as [[tfIdf]]),
    * the per-doc SUM runs in decimal space (exact, order-independent),
    * and the final mean divides as double then rounds through decimal.
    */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    val d2612 = org.apache.spark.sql.types.DecimalType(26, 12)
    val d3810 = org.apache.spark.sql.types.DecimalType(38, 10)
    val d90 = org.apache.spark.sql.types.DecimalType(9, 0)
    // (doc, token, n) TYPE grain off the shared memo — the log-prob
    // depends only on the token type, so each distinct (doc, token)
    // scores once and Σ n·logp rebuilds the per-occurrence sum exactly
    // in decimal (the bigramLogProb collapse, applied one order down).
    // The corpus total is a SCALAR aggregate over the (memoized) token
    // frame, attached to the vocab-grain counts by constant-key
    // broadcast join — a lit(0) window here would shuffle the ENTIRE
    // vocabulary to one task (vocab is corpus-dependent, not bounded by
    // contract like the ≤10-row frames where that pattern is fine).
    // When dtc is cached the broadcast side is a partial agg over
    // cached data; uncached (above the 8 GB memo gate) it re-runs the
    // token pass once — distributed, vs a single-task vocab sort.
    val dtc = docTokenCounts(docs)
    val tc = graft.core.Scalars.crossBroadcast(
      dtc.groupBy("token").agg(sum("n").as("c")),
      dtc.agg(sum("n").as("total")))
    dtc.join(tc, "token")
      .withColumn("logp",
        round(log(col("c").cast("double") / col("total")).cast(d2012), 9)
          .cast(d2612))
      .groupBy("doc_id")
      .agg(
        sum("n").cast("int").as("n_tokens"),
        round((sum(col("n").cast(d90) * col("logp")).cast("double")
          / sum("n")).cast(d3810), 6)
          .cast("double").as("avg_logprob"))
  }

  /** Interpolated bigram LM quality score — [[unigramLogProb]] taken to
    * bigram order, the shape of a real KenLM-style perplexity filter:
    * each transition scores `ln(λ·c(w₁w₂)/c(w₁) + (1−λ)·c(w₂)/N)`
    * (Jelinek–Mercer interpolation with the corpus unigram as the
    * back-off, so unseen-in-context words degrade smoothly instead of
    * hitting −∞), and a document's score is the mean over its
    * transitions. Repetitive machine junk scores artificially HIGH here
    * (its transitions are all high-count) and fluent-but-diverse text
    * sits in a narrow band — curation gates use it two-sided.
    *
    * Bigram extraction is a per-row zip of the token array with its own
    * tail — a narrow projection, no positional window and no shuffle
    * until the count aggregates. The log-prob depends only on the bigram
    * TYPE, so each distinct (w₁, w₂) scores once and the corpus-count
    * joins run at vocab² grain, not occurrence grain (the dd_fuzzy
    * collapse); the doc mean rebuilds exactly via the per-doc type count
    * `nb` — `Σ nb·lp` in exact decimal (lp DECIMAL(26,12) × nb
    * DECIMAL(9,0) → DECIMAL(36,12), no precision-loss rescale) is
    * bit-identical to summing lp per occurrence, which is what the
    * oracle twin still does. Shuffles: doc-bigram-type counts, the
    * type-grain count aggregates, the type-grain joins, and the
    * doc-grain mean — all key-grain, nothing corpus-crossing. Parity:
    * same 9-dp decimal ln rounding / exact decimal SUM / 6-dp mean
    * ladder as the unigram path.
    */
  def bigramLogProb(docs: DataFrame, lambda: Double = 0.7): DataFrame = {
    // the FINISHED doc-grain LM frame is memoized (3 columns, fully
    // deterministic — decimal-rounded lns over exact counts): both
    // ts_bigram_lp and ts_ccnet_buckets consume it, and without this
    // memo the tercile row re-ran the whole type-grain join stack on
    // top of the shared bgd memo (the ts_dsir finished-weights lesson).
    // Corpus-size-gated: a doc-grain frame is not pinnable at 100 TB.
    val docBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    if (docBytes < (8L << 30))
      graft.core.PlanMemo.cached(s"text.bigramLp.$lambda",
        bigramLogProbUncached(docs, lambda))
    else bigramLogProbUncached(docs, lambda)
  }

  private def bigramLogProbUncached(docs: DataFrame,
                                    lambda: Double): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    val d2612 = org.apache.spark.sql.types.DecimalType(26, 12)
    val d3810 = org.apache.spark.sql.types.DecimalType(38, 10)
    val d90 = org.apache.spark.sql.types.DecimalType(9, 0)
    val toksArr = split(normalized(col("text")), " ")
    // (doc, w1, w2, nb) — doc-bigram-TYPE grain; both the corpus count
    // aggregation and the final join-back consume it. Size-gated like
    // every corpus-grain memo (duplicateSpans rule): past ~8 GB of doc
    // scan the double-compute beats pinning a corpus-sized frame.
    val bgdPlan = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(zip_with(
          slice(toksArr, lit(1), size(toksArr) - 1),
          slice(toksArr, lit(2), size(toksArr) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .groupBy(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("nb"))
    val bgd =
      if (docs.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30))
        graft.core.PlanMemo.cached("text.bigramDocCounts", bgdPlan)
      else bgdPlan
    val bgc = bgd.groupBy("w1", "w2").agg(sum("nb").as("c2"))
    // unigram counts off the shared TYPE-grain memo (sum of per-doc
    // type counts == the occurrence count the old explode-grain groupBy
    // produced), with the corpus total as a scalar aggregate over the
    // SAME memoized frame attached by constant-key broadcast — not a
    // lit(0) window (which would single-task the whole vocabulary) and
    // not a total over a re-derived occurrence frame (which re-ran the
    // 10x-larger explode)
    val utc = docTokenCounts(docs)
    val uc = graft.core.Scalars.crossBroadcast(
      utc.groupBy("token").agg(sum("n").as("c1")),
      utc.agg(sum("n").as("total")))
    val lpByType =
      bgc
        .join(uc.select(col("token").as("w1"), col("c1").as("c1_w1"),
          col("total")), "w1")
        .join(uc.select(col("token").as("w2"), col("c1").as("c1_w2")), "w2")
      .select(col("w1"), col("w2"),
        round(log(
          lit(lambda) * col("c2").cast("double") / col("c1_w1") +
            lit(1.0 - lambda) * col("c1_w2").cast("double") / col("total"))
          .cast(d2012), 9).cast(d2612).as("lp"))
    bgd
      .join(lpByType, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(
        sum("nb").cast("int").as("n_bigrams"),
        round((sum(col("nb").cast(d90) * col("lp")).cast("double") /
          sum("nb")).cast(d3810), 6)
          .cast("double").as("avg_logprob"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): per LANGUAGE, documents split into head/middle/tail
    * terciles by LM score — CCNet trains on head, drops tail, and
    * re-reviews middle; the per-language split is the recipe's point
    * (a global cut would grade every non-English document against
    * English perplexity norms). The reference scorer is a per-language
    * KenLM; here it is the corpus bigram LM ([[bigramLogProb]] — the
    * engine's KenLM-shaped scorer, riding the shared type-grain memos,
    * so this adds zero corpus passes next to the LM-score rows).
    *
    * Buckets are `ntile(3)` over a TIE-BROKEN total order
    * (avg_logprob DESC, doc_id ASC) per language partition — ANSI NTILE
    * on a total order is engine-deterministic, the RFM/ntile rule.
    * Documents with no bigram (< 2 tokens) have no LM score and are not
    * bucketed (inner join — the scorer's contract, mirrored by the
    * twin). Scale: one doc-grain join + a per-language rank; at 100 TB
    * the ntile becomes range-partitioned ranking exactly as the
    * ts_quality_calibration decile documents.
    */
  def perplexityBuckets(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(desc("avg_logprob"), asc("doc_id"))
    docs.select(col("doc_id"), col("lang"))
      .join(bigramLogProb(docs), Seq("doc_id"))
      .withColumn("tercile", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("avg_logprob"),
        when(col("tercile") === 1, lit("head"))
          .when(col("tercile") === 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Winnowing document fingerprints (Schleimer et al., "Winnowing:
    * Local Algorithms for Document Fingerprinting" — the MOSS
    * algorithm): hash every character k-gram of the normalized text,
    * then keep the MINIMUM hash of each sliding window of `w`
    * consecutive positions. The selected set is position-robust — any
    * shared substring of length ≥ k+w−1 between two documents is
    * GUARANTEED to contribute a common fingerprint — which is what the
    * whole-document hashes in [[fingerprints]] cannot give: one edited
    * character changes those completely. Downstream near-dup detection
    * joins on `fp` exactly like [[Dedup.chunkDedup]]'s inverted index.
    *
    * Emits distinct `(doc_id, fp)`. The k-gram hash is the leading 32
    * bits of md5 (hex-rendered identically in any engine, as all the
    * dedup-family hashes here); md5's string churn dominates the
    * operator's runtime, so a production deployment should swap the
    * hash expression for `xxhash64(kgram)` (~10× cheaper, one line) —
    * the winnowing selection algebra is hash-agnostic, md5 is the
    * cross-engine-verifiability choice. Documents shorter than k+w−1
    * normalized chars yield no full window and therefore no
    * fingerprints — the algorithm's contract, mirrored by the oracle.
    *
    * Scale: normalization is materialized through the repartition
    * barrier (one regex pass per doc — the [[Dedup.strideSegments]]
    * lambda-inlining lesson); hashing and window-min selection both run
    * as array transforms INSIDE each document's row — per-doc work is
    * O(chars·w) with no corpus-wide shuffle beyond the final distinct
    * at fingerprint grain.
    */
  def winnow(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    val nt = docs.repartition(col("doc_id"))
      .select(col("doc_id"), normalized(col("text")).as("nt"))
    val nPos = length(col("nt")) - (k - 1)
    // whole selection stays in ARRAY land inside one row: k-gram hashes
    // in one projection, the trailing-window min as an array_min over a
    // w-slice per position, per-doc dedup BEFORE the explode. Earlier
    // revisions exploded every position and ran a doc-partitioned window
    // min — same answer, but it paid a 10M-row sort at sf0.1 and
    // materialized the per-position frame through the window operator;
    // this form has NO shuffle at all: array_distinct dedups each doc's
    // survivors (~1/w of positions) before the explode, and (doc, fp)
    // rows from distinct docs can't collide — the output is distinct by
    // construction, beyond-the-exchange-free.
    // nPos >= w ⟺ length >= k+w−1: the no-full-window contract, and it
    // keeps sequence(w, size) ascending (a shorter doc would flip it
    // descending and drive slice's start to 0 — a runtime error)
    val hashed = nt.filter(nPos >= w).select(col("doc_id"),
      transform(sequence(lit(1), nPos),
        p => conv(substring(md5(col("nt").substr(p, lit(k))), 1, 8), 16, 10)
          .cast("long")).as("hs"))
    hashed.select(col("doc_id"),
      explode(array_distinct(transform(sequence(lit(w), size(col("hs"))),
        j => array_min(slice(col("hs"), j - (w - 1), lit(w)))))).as("fp"))
  }

  /** 256-bucket md5 shard of an id column — the ONE sharding primitive
    * [[hashSplit]] and [[packSequences]] share (they must never
    * diverge: a packing shard is the same unit a split cut selects).
    */
  def md5Shard(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 2), 16, 10).cast("int")

  /** Overlapping retrieval chunks — the RAG ingestion shape: fixed
    * `size`-token windows advancing by `stride` tokens (overlap =
    * size − stride keeps a sentence that straddles a boundary whole in
    * at least one chunk), each chunk carrying its 1-based token span
    * and its own content fingerprint (the downstream embed/dedup key).
    * The last window of a document may be short (the tail), but a
    * document shorter than one stride still yields exactly one chunk.
    *
    * Pure narrow projection — tokenize, per-row `sequence` of window
    * starts, explode, slice — zero shuffle at any corpus size.
    */
  def ragChunks(docs: DataFrame, width: Int = 64,
                stride: Int = 48): DataFrame = {
    require(stride >= 1 && width >= stride,
      s"ragChunks: need 1 <= stride <= width, got width=$width stride=$stride")
    val toks = split(normalized(col("text")), " ")
    docs
      .select(col("doc_id"), toks.as("t"))
      // window starts 1, 1+stride, 1+2·stride, …; the LAST start is the
      // first one whose window reaches the end of the document
      // (ceil((L−width)/stride)·stride + 1), clamped to ≥ 1 so a short
      // document still yields its single chunk (sequence(1, 0) counts
      // DOWN in Spark — the clamp is load-bearing)
      .select(col("doc_id"), col("t"),
        posexplode(sequence(lit(1),
          greatest(ceil((size(col("t")) - width).cast("double") / stride)
            .cast("int") * stride + 1, lit(1)),
          lit(stride))))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("chunk_id"),
        col("col").cast("int").as("start_tok"),
        least(col("col") + width - 1, size(col("t"))).cast("int")
          .as("end_tok"),
        md5(concat_ws(" ",
          slice(col("t"), col("col"), lit(width)))).as("chunk_fp"))
  }

  /** N-gram novelty score — the inverse of boilerplate exposure: the
    * fraction of a document's DISTINCT n-gram shingles that occur in no
    * other document. Low novelty marks template/mirror content whose
    * phrasing is corpus-common even when no single document duplicates
    * it (the signal exact and near-dup both miss); it is also the
    * document-level summary a memorization analysis starts from.
    * Documents with fewer than `n` tokens have no shingles and are
    * absent from the output.
    *
    * Scale shape: the dedup family's shingle shuffles — gram-grain
    * groupBy with the min≠max single-doc test (no count-distinct), a
    * gram-grain join-back, one doc-grain agg. Only (doc_id, shingle)
    * pairs cross the wide shuffles.
    */
  def noveltyScore(docs: DataFrame, n: Int = 3): DataFrame = {
    import graft.core.Money
    // the shared memoized corpus-shingle frame (one normalize+explode
    // pass for this query's TWO consumers AND for the dedup family's
    // inverted indexes over the same corpus — same rows as the previous
    // per-query explode(array_distinct(...)) construction)
    val sh = Dedup.distinctShingles(docs, n)
    // a shingle is novel iff exactly one doc carries it ⇔ min==max doc
    // over the shingle group. Computed as a window over partitionBy(fp)
    // instead of the former groupBy(shingle)+join-back: the join
    // shuffled the corpus-shingle frame TWICE (agg build + probe); the
    // window shuffles it once and keeps every row, so the doc-grain
    // counts are unchanged bit-for-bit (r14, guide §2.4; same rewrite
    // class as ts_quality_calibration's dup flag).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shingle")
    sh.withColumn("mn", min("doc_id").over(w))
      .withColumn("mx", max("doc_id").over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("mn") === col("mx"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        Money.ratio2(col("n_novel"), col("n_shingles")).as("novelty"))
  }

  /** Benchmark decontamination — flag TRAINING documents that share
    * n-gram shingles with an EVALUATION set (the standard "remove eval
    * leakage before pretraining" pass; GPT-3 appendix C / PaLM-style
    * n-gram overlap, at this engine's shingle grain). For every
    * non-benchmark document: its distinct-shingle count, how many of
    * those shingles appear anywhere in the benchmark set, the overlap
    * ratio, and the `flagged` verdict at `threshold`.
    *
    * Scale shape: rides the SHARED [[Dedup.distinctShingles]] memo (the
    * novelty/inverted-index frame — zero extra corpus passes when
    * sibling queries already ran), one anti-join to split train from
    * benchmark, one shingle-grain left join against the DISTINCT
    * benchmark shingle set, one doc-grain agg. The benchmark shingle
    * frame is eval-set-sized, not corpus-sized — at 100 TB the join is
    * a broadcast in practice, but the plan stays a shuffle join unless
    * stats say otherwise (AQE decides).
    */
  def decontaminate(docs: DataFrame, isBenchmark: Column, n: Int = 3,
                    threshold: Double = 0.5): DataFrame = {
    import graft.core.Money
    val sh = Dedup.distinctShingles(docs, n)
    val benchIds = docs.filter(isBenchmark).select("doc_id")
    val benchShingles = sh.join(benchIds, Seq("doc_id"), "left_semi")
      .select("shingle").distinct()
      .withColumn("hit", lit(1L))
    sh.join(benchIds, Seq("doc_id"), "left_anti")
      .join(benchShingles, Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("hit")), lit(0L)).as("n_contaminated"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        Money.ratio2(col("n_contaminated"), col("n_shingles"))
          .as("contamination"))
      .withColumn("flagged", col("contamination") >= threshold)
  }

  /** One BPE-training statistics pass (Sennrich et al., "Neural Machine
    * Translation of Rare Words with Subword Units", ACL 2016): adjacent
    * symbol-pair frequencies weighted by word frequency. Real BPE
    * trainers loop count→merge; the distributed cost is THIS counting
    * pass (the merge decision is vocab-sized, driver territory), and it
    * runs over the DISTINCT-word frequency table, not the corpus —
    * exactly how production tokenizer trainers structure it, and why a
    * 100 TB corpus trains a tokenizer cheaply: the vocab frame is
    * millions of rows, not billions.
    *
    * Shuffles: the word-count groupBy (corpus-token grain, the ts_vocab
    * shuffle) then a pair-grain groupBy over the vocab-sized pair
    * explode. The `length ≥ 2` guard is load-bearing — Spark's
    * `sequence(1, 0)` counts DOWN, it does not yield [].
    */
  def bpePairCounts(docs: DataFrame, topK: Int = 50): DataFrame = {
    val words = docs
      .select(explode(split(normalized(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("n"))
    words
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"), col("n"))
      .groupBy("pair").agg(sum("n").as("n_occurrences"))
      .orderBy(desc("n_occurrences"), asc("pair"))
      .limit(topK)
  }

  /** BPE merge-rule TRAINING (Sennrich et al.) — the iterative loop
    * [[bpePairCounts]] is one step of: `rounds` times, count every
    * adjacent symbol pair over the DISTINCT-word frequency table, take
    * the most frequent pair (count desc, then lexicographic — the
    * deterministic tie-break), and merge it left-to-right in every
    * word. Emits the learned merge table `(round, lhs, rhs,
    * pair_count)` — the artifact a tokenizer ships; [[subwordEncode]]
    * is the corresponding APPLY stage.
    *
    * Distribution shape: the per-round pair count is a vocab-sized
    * aggregation (never corpus grain — word frequencies absorb the
    * corpus, [[bpePairCounts]]'s scaladoc argument); the merge DECISION
    * is one collected row per round — the same driver-scalar contract
    * as the clustering fixpoint probes, and exactly where production
    * trainers put the sequential step (the algorithm is inherently
    * sequential in merges). Word symbol strings use a canonical
    * double-space separator form, so a merge is a LITERAL
    * `replace(' l  r ', ' lr ')` — left-to-right non-overlapping in
    * both engines, no regex escaping — re-canonicalized each round.
    *
    * The word table rides [[graft.core.PlanMemo]] so the per-round
    * lineage replays narrow projections over a cached vocab-sized
    * frame, not five corpus scans.
    */
  def bpeTrain(docs: DataFrame, rounds: Int = 5): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"bpeTrain: bad rounds $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = graft.core.PlanMemo.cached("bpe_words",
      docs.select(explode(split(normalized(col("text")), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("freq")))
    def canonical(c: Column): Column =
      concat(lit(" "), array_join(split(trim(c), " +"), "  "), lit(" "))
    var state = words.select(col("freq"),
      concat(lit(" "),
        array_join(regexp_extract_all(col("w"), lit("."), lit(0)), "  "),
        lit(" ")).as("seq"))
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (round <- 1 to rounds) {
      val top = state
        .withColumn("s", split(trim(col("seq")), " +"))
        .filter(size(col("s")) >= 2) // sequence(1,0) counts DOWN, not []
        .select(col("freq"), explode(
          transform(sequence(lit(1), size(col("s")) - 1),
            i => struct(element_at(col("s"), i).as("l"),
              element_at(col("s"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      require(top.nonEmpty, s"bpeTrain: no pairs left at round $round")
      val (l, r, cnt) =
        (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
      merges += ((round, l, r, cnt))
      state = state.withColumn("seq", canonical(
        replace(col("seq"), lit(s" $l  $r "), lit(s" $l$r "))))
    }
    merges.toSeq.toDF("round", "lhs", "rhs", "pair_count")
      .orderBy("round")
  }

  /** Deterministic shard layout for a training run: every document gets
    * a reproducible pseudorandom `(shard_id, shard_pos)`. The salted-md5
    * order is the global shuffle (consecutive documents from one crawl
    * correlate; training wants them apart), and shards are HASH-RANGED —
    * `floor(bucket·n/256)` over the first hash byte — so growing the
    * shard count only splits ranges instead of remapping every document
    * the way `row_number % n` would.
    *
    * Scale shape: one narrow projection, then per-shard rank windows
    * (each sorts its own shard, all shards in parallel) — at corpus
    * scale this is `repartitionByRange(hash)` + within-partition sort,
    * which is exactly the plan Spark builds here.
    */
  def shardAssign(docs: DataFrame, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards >= 1 && nShards <= 256,
      s"shardAssign: nShards $nShards outside [1, 256]")
    val h = md5(concat(col("doc_id").cast("string"), lit(":shard")))
    val w = Window.partitionBy("shard_id").orderBy("h", "doc_id")
    docs.select(col("doc_id"), h.as("h"))
      .withColumn("shard_id",
        floor(conv(substring(col("h"), 1, 2), 16, 10).cast("int")
          * nShards / 256).cast("int"))
      .withColumn("shard_pos", row_number().over(w))
      .select(col("doc_id"), col("shard_id"), col("shard_pos"))
  }

  /** Sequence packing: assign documents to fixed-token-budget bins (the
    * context windows of a pretraining run) with the contiguous streaming
    * heuristic large-scale packers use — documents in a deterministic
    * order, running token offset, a document's bin is the budget-window
    * its START offset falls in. Whether an overflowing tail truncates or
    * continues into the next window is the consumer's policy; the
    * operator emits the exact `(bin_id, bin_offset)` layout either needs.
    *
    * Scale: packing is per-SHARD (the md5 hash-shard of [[hashSplit]]),
    * so the window sort parallelizes over 256 independent partitions
    * instead of one global order — the same sharding a distributed
    * packer uses, and deterministic across runs and cluster layouts.
    * All arithmetic is integer-exact, so the DuckDB twin matches
    * bit-for-bit.
    */
  def packSequences(docs: DataFrame, budget: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(
      col("doc_id"),
      md5Shard(col("doc_id")).as("shard"),
      size(tokens(normalized(col("text")))).as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("prev_cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"CAST(prev_cum DIV $budget AS BIGINT)").as("bin_id"),
        expr(s"CAST(prev_cum % $budget AS BIGINT)").as("bin_offset"))
  }

  /** Length-bucketed batching: group documents of similar token count
    * into token-budget batches so per-batch padding (every sequence in
    * a batch pads to the batch max) stays small — the batching strategy
    * sequence-to-sequence training stacks run to stop one long outlier
    * from wasting a whole batch of compute. Bucket = binary magnitude
    * of the token count (length of its base-2 rendering — an INTEGER
    * bucket key, deliberately not `floor(log2(…))`: ln-ratio floats can
    * land an exact power of two on the wrong side of floor at the ulp
    * level, and bucket keys must be engine-exact). Within a bucket,
    * documents fill batches in doc_id order by cumulative token count
    * (the [[packSequences]] window); emits per-batch occupancy and the
    * padding waste `n_docs·max_tokens − sum_tokens` a scheduler
    * minimizes.
    *
    * Shuffles: one bucket-grain window (buckets are few — doc length is
    * log-distributed — but each holds a doc-count-proportional slice;
    * the window is a running sum, so Spark streams each partition, no
    * full-buffer), one (bucket, batch)-grain aggregate. Nothing
    * corpus-crossing.
    */
  def lengthBucketBatches(docs: DataFrame, batchTokens: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(
      col("doc_id"),
      size(tokens(normalized(col("text")))).as("n_tokens"))
      .withColumn("bucket", length(bin(col("n_tokens"))).cast("int"))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("prev_cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("batch_id", expr(s"CAST(prev_cum DIV $batchTokens AS BIGINT)"))
      .groupBy("bucket", "batch_id")
      .agg(
        count(lit(1)).cast("int").as("n_docs"),
        max("n_tokens").as("max_tokens"),
        sum("n_tokens").cast("long").as("sum_tokens"),
        (count(lit(1)) * max("n_tokens") - sum("n_tokens")).cast("long")
          .as("pad_waste"))
      .orderBy("bucket", "batch_id")
  }

  /** C4-style heuristic quality filters (Raffel et al. §2.2, adapted to
    * single-line documents): terminal punctuation, boilerplate markers
    * (`lorem ipsum`), code markers (`javascript`, `{`), minimum word
    * count, mean word length band. Emits every flag plus the composed
    * `keep` verdict so downstream pipelines can audit WHICH rule dropped
    * a document — the operational requirement C4's own pipeline logs.
    * Pure narrow projection (predicates over the scan); the mean-length
    * ratio routes through the decimal pattern for cross-engine equality.
    */
  def c4Filters(docs: DataFrame): DataFrame = {
    val t = col("text")
    val nWords = size(tokens(t))
    docs.select(
      col("doc_id"),
      // \z (absolute end of input), not $: Java-regex $ also matches
      // BEFORE a final line terminator, so a document ending ".\n" would
      // count as terminally-punctuated here but not in an RE2-family
      // engine — \z means both engines agree on newline-terminated text
      t.rlike("[.!?\"]\\z").as("has_terminal_punct"),
      contains(lower(t), lit("lorem ipsum")).as("has_lorem"),
      (contains(lower(t), lit("javascript")) || contains(t, lit("{")))
        .as("has_code_marker"),
      nWords.as("n_words"),
      graft.core.Money.ratio2(
        length(regexp_replace(t, " ", "")), nWords).as("mean_word_len"))
      .withColumn("keep",
        col("has_terminal_punct") && !col("has_lorem") &&
          !col("has_code_marker") && col("n_words") >= 5 &&
          col("mean_word_len").between(3.0, 10.0))
  }

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"
  private val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrubbing for training corpora: regex redaction of emails,
    * phone numbers and IPv4 addresses (applied in that fixed order, so
    * both engines transform identical intermediates) plus per-kind match
    * counts for the scrub audit log. The patterns use the portable
    * regex subset (character classes, bounded repetition, `\b`) that
    * Java regex and RE2-family engines agree on.
    *
    * The audit counts are computed on the PROGRESSIVELY-REDACTED
    * intermediates (emails on the raw text, phones on the email-redacted
    * text, IPs on the phone-redacted text) — each count is the number of
    * replacements its redaction pass actually performed. Counting every
    * kind on the original text would double-count nested matches (an
    * IPv4 inside an email's domain is consumed by the `<EMAIL>`
    * replacement and never redacted as an IP), making the audit log
    * claim redactions that never happened.
    */
  def redactPii(docs: DataFrame): DataFrame = {
    val t = col("text")
    val afterEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    val redacted = regexp_replace(afterPhone, IpRe, "<IP>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(PhoneRe), lit(0))).as("n_phones"),
      size(regexp_extract_all(afterPhone, lit(IpRe), lit(0))).as("n_ips"),
      md5(redacted.cast("binary")).as("redacted_md5"))
  }

  /** Subword tokenization — the APPLY stage of a learned subword vocab
    * (the BPE/WordPiece family every LLM tokenizer lives in), with the
    * vocab learned from the corpus itself: the `vocabSize` most frequent
    * character trigrams (occurrence-weighted, ties broken
    * lexicographically). Encoding is greedy left-to-right longest-match:
    * at each position, consume a vocab trigram if one matches, else a
    * single character — one token either way. `ts_bpe_pairs` measures
    * which merges WOULD be learned; this operator closes the loop by
    * running a learned table over the corpus and reporting the
    * compression it buys (tokens_per_word ≤ 1 would mean every word is
    * one token; 1.0×word-length means no trigram ever hit).
    *
    * Shape, per the 100 TB posture: one tokenize pass over the corpus to
    * word counts; the vocab is a bounded `vocabSize`-row collect (the
    * centroid/codebook contract); the O(len) encode fold runs once per
    * DISTINCT word (word-grain, not corpus-grain — the same word is
    * never re-encoded), and docs get their token counts back via a
    * word-grain join of exact integer counts. The fold is a single
    * codegen'd `aggregate` over `sequence(1, len)` carrying (pos, ntok):
    * steps where i has been consumed by an earlier trigram pass through
    * untouched.
    *
    * @return (doc_id, n_words, n_tokens, tokens_per_word) per document
    */
  def subwordEncode(docs: DataFrame, vocabSize: Int = 64): DataFrame = {
    require(vocabSize >= 1, s"subwordEncode: bad vocabSize $vocabSize")
    // the finished frame is doc-grain and deterministic, and its PLAN
    // CONSTRUCTION runs a driver action (the bounded vocab-learn
    // collect) — memoize it keyed on the INPUT plan so repeat calls
    // skip construction entirely (the knnGraph/dsirWeights pattern),
    // gated on corpus size like every doc-grain memo
    // (doc, word, count) via the SHARED type-grain memo — the vocab
    // learn and the encode join-back both consume it (it used to be
    // rebuilt, corpus explode included, once per consumer). Resolved
    // OUTSIDE the cachedAs build: PlanMemo builds under the memo map's
    // compute lock, so a nested PlanMemo call from inside the build
    // throws ConcurrentHashMap's "Recursive update".
    val dwc = docTokenCounts(docs)
      .select(col("doc_id"), col("token").as("word"), col("n").as("n_occ"))
    val docBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    if (docBytes < (8L << 30))
      graft.core.PlanMemo.cachedAs(s"text.subword$vocabSize", docs)(
        subwordEncodeUncached(dwc, vocabSize))
    else subwordEncodeUncached(dwc, vocabSize)
  }

  private def subwordEncodeUncached(dwc: DataFrame,
                                    vocabSize: Int): DataFrame = {
    val wc = dwc.groupBy("word").agg(sum("n_occ").as("cnt"))
    // learn: occurrence-weighted trigram frequencies over distinct words
    val vocabRows = wc.filter(length(col("word")) >= 3)
      .select(explode(transform(sequence(lit(1), length(col("word")) - 2),
        i => col("word").substr(i, lit(3)))).as("gram"), col("cnt"))
      .groupBy("gram").agg(sum("cnt").as("c"))
      .orderBy(desc("c"), asc("gram"))
      .limit(vocabSize)
      .select("gram")
      .collect()                       // bounded by vocabSize, by contract
      .map(_.getString(0)).toSeq
    val vocab = typedLit(vocabRows)
    // encode each DISTINCT word once: greedy trigram-or-char fold
    val len = length(col("word"))
    val enc = wc.select(col("word"), aggregate(
      sequence(lit(1), len),
      struct(lit(1).as("pos"), lit(0).as("ntok")),
      (acc, i) => {
        val pos = acc.getField("pos")
        val ntok = acc.getField("ntok")
        val hit = (pos + 2 <= len) &&
          array_contains(vocab, col("word").substr(pos, lit(3)))
        when(i =!= pos, acc).otherwise(
          when(hit, struct((pos + 3).as("pos"), (ntok + 1).as("ntok")))
            .otherwise(struct((pos + 1).as("pos"), (ntok + 1).as("ntok"))))
      },
      acc => acc.getField("ntok")).as("word_toks"))
    dwc.join(enc, "word")
      .groupBy("doc_id")
      .agg(sum(col("n_occ")).as("n_words"),
        sum(col("n_occ") * col("word_toks")).as("n_tokens"))
      .withColumn("tokens_per_word",
        round((col("n_tokens").cast("double") / col("n_words").cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(20, 12)), 9)
          .cast("double"))
      .orderBy("doc_id")
  }
}
