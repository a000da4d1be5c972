package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * The dot-product primitive is a native codegen'd Catalyst expression
  * ([[VecDot]] — one fused loop, no UDF and no interpreted-HOF boxing);
  * it accumulates as a left-to-right double fold, so the same value is
  * computed by any engine folding sequentially (the HOF `zip_with` +
  * `aggregate` form it replaced is spec-pinned bit-identical);
  * similarity values are additionally rounded through a decimal cast
  * ([[roundSim]]) before ranking/thresholding so last-ulp noise can
  * never flip an ordering across engines.
  *
  * Three strategies:
  *   - [[bruteTopK]]: exact cosine top-k (the baseline; one scan, one
  *     TakeOrderedAndProject — no shuffle of the full corpus);
  *   - [[ivfTopK]]: IVF-style — vectors pre-assigned to their nearest
  *     centroid; queries probe only the nprobe nearest cells. At 100 TB
  *     the assignment is a materialized, partition-pruned column;
  *   - sign-LSH near-dup pairs ([[signLshPairs]]): random-hyperplane-
  *     style blocking on the sign pattern of the leading dimensions.
  */
object Similarity {

  def dot(a: Column, b: Column): Column = VecDot.vecDot(a, b)

  /** The interpreted-HOF dot this engine started with — kept as the
    * parity oracle for [[VecDot]] (same casts, same fold order; the
    * spec asserts bit-identical values over the corpus).
    */
  private[functions] def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Round a similarity to 9 decimals via decimal space (cross-engine
    * deterministic; see graft.core.Money for the rationale).
    */
  def roundSim(c: Column): Column =
    round(c.cast(org.apache.spark.sql.types.DecimalType(20, 12)), 9)
      .cast("double")

  import graft.core.Scalars.crossBroadcast

  /** Exact cosine top-k against a single query vector (1-row frame). */
  def bruteTopK(embeddings: DataFrame, query: DataFrame, k: Int): DataFrame =
    crossBroadcast(embeddings, query.select(col("embedding").as("qvec")))
      .select(col("vec_id"), col("label"),
        roundSim(cosine(col("embedding"), col("qvec"))).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)

  /** Maximal Marginal Relevance diversified reranking (Carbonell &
    * Goldstein) — the serving-tier step after retrieval: greedily pick
    * k results maximizing `λ·sim(q,d) − (1−λ)·max_{s∈selected}
    * sim(d,s)`, so near-duplicate hits don't crowd the result list.
    * Completes the retrieve → rerank chain next to [[hybridRrf]]
    * (which fuses rankings; MMR diversifies one).
    *
    * Distribution contract: the corpus-scale work is the candidate
    * scan (a TakeOrderedAndProject tail, like [[bruteTopK]]) and the
    * kCand² candidate-pair cosine frame — both in-plan. The greedy
    * LOOP runs on the driver over those ≤ kCand + kCand² collected
    * rows (by-contract small, the bounded-collect class): every
    * similarity it consumes was rounded in-plan by [[roundSim]], and
    * the λ-combination is two multiplies and a subtract on those
    * identical doubles, so the DuckDB twin's unrolled-round CTEs
    * reproduce the selection bit-for-bit. Emits (rnk, vec_id, qsim).
    */
  def mmrRerank(embeddings: DataFrame, query: DataFrame, kCand: Int = 50,
                k: Int = 10, lambda: Double = 0.7,
                oneMinusLambda: Double = 0.3): DataFrame = {
    require(k >= 1 && kCand >= k, s"mmrRerank: k $k, kCand $kCand")
    // the greedy loop collects kCand² pair sims to the driver — a
    // serving-tier rerank budget (50² = 2.5k rows), NOT a corpus knob.
    // A caller who passes a corpus-sized kCand must fail here, loudly,
    // instead of materializing an n² frame on the driver.
    require(kCand <= 1024,
      s"mmrRerank: kCand $kCand collects kCand^2 pair similarities to " +
        "the driver — bounded at 1024; rerank a retrieved candidate " +
        "list, not the corpus")
    // both weights arrive as PARSED literals (the ewmaSmooth pattern):
    // deriving 1−λ at runtime gives 0.30000000000000004, not the 0.3
    // the oracle text parses — a one-ulp scoring divergence
    require(lambda >= 0 && lambda <= 1 &&
      math.abs(lambda + oneMinusLambda - 1.0) < 1e-9,
      s"mmrRerank: lambda $lambda + $oneMinusLambda must be 1")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cand = crossBroadcast(embeddings,
        query.select(col("embedding").as("qvec")))
      .select(col("vec_id"), col("embedding"),
        roundSim(cosine(col("embedding"), col("qvec"))).as("qsim"))
      .orderBy(desc("qsim"), asc("vec_id"))
      .limit(kCand)
      .cache()
    try {
      val qsims = cand.select("vec_id", "qsim").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val a = cand.select(col("vec_id").as("a"),
        col("embedding").as("ea"))
      val b = cand.select(col("vec_id").as("b"),
        col("embedding").as("eb"))
      val pairSims = crossBroadcast(a, b)
        .filter(col("a") =!= col("b"))
        .select(col("a"), col("b"),
          roundSim(cosine(col("ea"), col("eb"))).as("sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      val selected = scala.collection.mutable.ArrayBuffer[Long]()
      val remaining = scala.collection.mutable.TreeSet[Long](
        qsims.keys.toSeq: _*)
      while (selected.length < k && remaining.nonEmpty) {
        val pick = remaining.iterator.map { v =>
          val pen =
            if (selected.isEmpty) 0.0
            else selected.iterator.map(s => pairSims((v, s))).max
          (v, lambda * qsims(v) - oneMinusLambda * pen)
        }.reduceLeft { (x, y) =>
          // argmax: score desc, vec_id asc — TreeSet iteration is id-
          // ascending, so strictly-greater keeps the smaller id on ties
          if (y._2 > x._2) y else x
        }._1
        selected += pick
        remaining -= pick
      }
      selected.toSeq.zipWithIndex
        .map { case (v, i) => (i + 1, v, qsims(v)) }
        .toDF("rnk", "vec_id", "qsim")
        .orderBy("rnk")
    } finally cand.unpersist(blocking = false)
  }

  /** Two-stage prefix-dimension retrieval (the Matryoshka/truncated-
    * embedding serving pattern): rank the WHOLE corpus by cosine over
    * only the first `prefixDims` dimensions — a dot product
    * `prefixDims/d` the width, so the full scan pays a fraction of the
    * FLOPs and, on a column store that can prune the vector prefix, a
    * fraction of the bytes — then re-rank the kCoarse survivors with the
    * exact full-width cosine. Complements IVF: no training step and no
    * index to maintain, at the cost of scanning every row (cheaply).
    *
    * Both stages are TakeOrderedAndProject tails — the exact stage runs
    * over kCoarse rows only. Recall is an empirical contract (spec'd
    * against brute force at the shipped config), not a guarantee: a
    * vector whose similarity mass lives past `prefixDims` can miss the
    * coarse cut.
    */
  def prefixRerank(embeddings: DataFrame, query: DataFrame, k: Int = 10,
                   kCoarse: Int = 50, prefixDims: Int = 16): DataFrame =
    crossBroadcast(embeddings, query.select(col("embedding").as("qvec")))
      .select(col("vec_id"), col("label"), col("embedding"), col("qvec"),
        roundSim(cosine(slice(col("embedding"), 1, prefixDims),
          slice(col("qvec"), 1, prefixDims))).as("coarse_sim"))
      .orderBy(desc("coarse_sim"), asc("vec_id"))
      .limit(kCoarse)
      .select(col("vec_id"), col("label"), col("coarse_sim"),
        roundSim(cosine(col("embedding"), col("qvec"))).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)

  /** Deterministic Rademacher (±1) Johnson–Lindenstrauss matrix:
    * entry (j, i) is +1 iff the first byte of md5("jl:j:i") is even.
    * Regenerating from the seed string on both engines (the oracle
    * embeds the same values as a SQL literal) keeps the projection
    * reproducible without shipping state.
    */
  def jlMatrix(outDims: Int, inDims: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until outDims).map { j =>
      (0 until inDims).map { i =>
        val h = md.digest(s"jl:$j:$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  /** Two-stage retrieval through a random projection: rank ALL vectors
    * by cosine in a JL-projected `outDims`-dim space (a ±1 Rademacher
    * sketch — distance-preserving in expectation, `outDims/inDims` of
    * the full-width compute), then re-rank the `kCoarse` survivors with
    * the exact full-width cosine. Unlike [[prefixRerank]] this works for
    * embeddings with NO matryoshka structure — the projection mixes
    * every input dimension into every output dimension.
    *
    * The projection is a narrow per-row map (a `transform` over the
    * literal matrix rows, each a codegen'd [[VecDot]]); the plan is the
    * bruteTopK plan with a cheaper rank key. At corpus scale the
    * projected vectors would be precomputed once and stored alongside
    * the index (the [[pqEncode]] layout), not recomputed per query.
    */
  def jlRerank(embeddings: DataFrame, query: DataFrame, k: Int = 10,
               kCoarse: Int = 100, outDims: Int = 32,
               inDims: Int = 64): DataFrame = {
    val rLit = typedLit(jlMatrix(outDims, inDims))
    def proj(v: Column): Column = transform(rLit, row => dot(v, row))
    crossBroadcast(embeddings, query.select(col("embedding").as("qvec")))
      .select(col("vec_id"), col("label"), col("embedding"), col("qvec"),
        roundSim(cosine(proj(col("embedding")), proj(col("qvec"))))
          .as("coarse_sim"))
      .orderBy(desc("coarse_sim"), asc("vec_id"))
      .limit(kCoarse)
      .select(col("vec_id"), col("label"), col("coarse_sim"),
        roundSim(cosine(col("embedding"), col("qvec"))).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** Ceiling on the centroid-set size the plan-literal path embeds. A
    * `typedLit` of C×d doubles is re-analyzed and re-codegen'd by every
    * operator that references it — fine to a few hundred centroids,
    * pathological at the C ~ 10⁴–10⁵ a 100 TB serving tier needs, which
    * is where the broadcast-struct path takes over. Tunable per session
    * via `spark.graft.ann.literalCentroidCeiling`.
    */
  private def literalCentroidCeiling(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get("spark.graft.ann.literalCentroidCeiling", "256").toInt

  /** Path selection and collection in ONE job: collect at most
    * `ceiling + 1` centroid rows — if the limit did not truncate, those
    * rows ARE the full set (returned sorted ascending-id for the
    * literal path); if it did, the set is too big for a plan literal
    * and the caller takes the broadcast path (which never collects).
    * Fails loudly on empty — an empty set would silently assign the
    * fold's initial accumulator (centroid_id = −1) to EVERY row, a
    * wrong-answer path (semDedup would treat the whole corpus as one
    * capped cell).
    */
  private def collectUpTo(centroids: DataFrame, ceiling: Int,
                          who: String): Option[Seq[(Int, Seq[Double])]] = {
    val rows = centroids
      .select(col("centroid_id").cast("int"),
        transform(col("cvec"), _.cast("double")))
      .limit(ceiling + 1).collect().toIndexedSeq
    require(rows.nonEmpty, s"$who: empty centroid set")
    if (rows.length <= ceiling)
      Some(rows.map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1))
    else None
  }

  /** Argmax-cosine fold over an array-of-struct centroid column
    * `(_1 = centroid_id, _2 = cvec doubles, _3 = ‖cvec‖)` — shared by
    * the plan-literal and broadcast-struct paths, so both compute
    * bit-identical assignments. Folding in ascending centroid_id order
    * with a strict `>` keeps the first (lowest-id) winner on ties — the
    * same tie-break as `ORDER BY csim DESC, centroid_id ASC`. A fold
    * that ends on the −1 sentinel (dim-mismatched embedding: zip_with
    * pads with nulls, every comparison is null) raises instead of
    * emitting a silent wrong cell.
    */
  private def bestCentroid(cents: Column): Column =
    aggregate(
      cents,
      struct(lit(-1).as("cid"), lit(Double.NegativeInfinity).as("sim")),
      (acc, c) => {
        val sim = roundSim(
          dot(col("embedding"), c.getField("_2")) /
            (col("__nrm") * c.getField("_3")))
        when(sim > acc.getField("sim"),
          struct(c.getField("_1").as("cid"), sim.as("sim")))
          .otherwise(acc)
      },
      // the guard lives in the FINISH lambda where the accumulator is a
      // computed value: a when(fold === -1, …).otherwise(fold) around
      // the aggregate would evaluate the whole fold TWICE (HOFs are
      // interpreted — no codegen CSE to rescue the duplicate)
      acc => when(acc.getField("cid") === -1, raise_error(lit(
        "assign: no centroid matched — embedding/centroid dim mismatch"))
        .cast("int"))
        .otherwise(acc.getField("cid")))

  /** One-row frame holding the whole centroid set as a sorted
    * array-of-struct column `(_1, _2, _3 = ‖cvec‖)`. The norm is the
    * same sequential left-to-right double fold as the SQL-side [[norm]]
    * and the literal path's driver fold — bit-identical values on every
    * path. array_sort orders by the leading (unique) centroid_id field.
    */
  private def centStructRow(centroids: DataFrame): DataFrame =
    centroids
      .select(col("centroid_id").cast("int").as("_1"),
        transform(col("cvec"), _.cast("double")).as("_2"))
      .select(struct(col("_1"), col("_2"), norm(col("_2")).as("_3")).as("c"))
      .agg(array_sort(collect_list(col("c"))).as("__cents"))

  /** Assign every vector to its nearest centroid (argmax cosine,
    * centroid_id tie-break) with ZERO shuffle of the corpus. Two paths,
    * chosen automatically by centroid-set size ([[probeSize]] vs
    * [[literalCentroidCeiling]]):
    *
    *   - C ≤ ceiling: the set is collected once and folded into the
    *     plan as an array-of-struct literal `(centroid_id, cvec,
    *     ‖cvec‖)`; the argmax is a single `aggregate` fold per corpus
    *     row — a narrow projection over the scan, no exchange anywhere
    *     (PlanSpec pins this). The previous form (cross-broadcast ×
    *     row_number window) shuffled a |corpus|·C-amplified frame; at
    *     100 TB with C=4096 that exchange IS the pipeline.
    *   - C > ceiling: the set aggregates to ONE row holding the same
    *     sorted struct array, broadcast-joined to the corpus on a
    *     constant key (Scalars.crossBroadcast — a BroadcastHashJoin,
    *     still no shuffle of the corpus side), and the identical fold
    *     runs over the joined column. This is the serving-tier path: a
    *     100 TB corpus wants C ~ 10⁴–10⁵ cells, far past what a plan
    *     literal tolerates.
    *
    * Determinism parity: both paths compute centroid norms with the
    * same sequential left-to-right double fold as the SQL-side [[norm]]
    * (driver `foldLeft` on the literal path, [[centStructRow]] on the
    * broadcast path), so every `csim` is bit-identical to the windowed
    * form and to the DuckDB oracle on either path.
    */
  def assign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val ceiling = literalCentroidCeiling(embeddings.sparkSession)
    collectUpTo(centroids, ceiling, "assign") match {
      case Some(collected) =>
        // native fused argmax ([[NearestCell]] — norm computed inside
        // the same primitive loop); bit-identical to the HOF fold on
        // the broadcast path below, parity-pinned in SimilaritySpec
        val cents: Seq[(Int, Seq[Double], Double)] = collected.map {
          case (cid, v) =>
            (cid, v, math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)))
        }
        embeddings.withColumn("centroid_id",
          CellProbe.nearestCell(col("embedding"), cents))
      case None =>
        // schema-preserving: input columns pass through untouched
        // (callers carry label/text/etc.), plus the assigned centroid_id
        crossBroadcast(
            embeddings.withColumn("__nrm", norm(col("embedding"))),
            centStructRow(centroids))
          .withColumn("centroid_id", bestCentroid(col("__cents")))
          .drop("__cents", "__nrm")
    }
  }

  // The assignment scan is identical for every query against the same
  // (embeddings, centroids) pair — memoize the cache()d frame per
  // session so repeated ivfTopK calls (a query stream, or bench passes)
  // pay it once. PlanMemo matches on sameResult AND the file-listing
  // fingerprint of the scans under the plan (both inputs are in the
  // assign output's plan), so a corpus path rewritten and re-read in
  // the same session misses the stale assignment instead of serving it
  // — the same staleness class its band-index memo closes — with the
  // same bounded-LRU unpersist discipline.
  private def assignCached(embeddings: DataFrame, centroids: DataFrame): DataFrame =
    graft.core.PlanMemo.cached("similarity.assign",
      assign(embeddings, centroids))

  /** Train IVF centroids: Lloyd's k-means with a deterministic seed (the
    * k lowest vec_ids) — each iteration is one zero-shuffle [[assign]]
    * pass plus one per-dimension mean (posexplode → groupBy(centroid,
    * pos) → re-assemble), i.e. 2 shuffles of dimension-expanded rows per
    * iteration, independent of query volume. At 100 TB one trains on a
    * sample (`embeddings.sample(…)`) exactly as FAISS does; the assign
    * pass that matters for serving stays zero-shuffle. Cells that end an
    * iteration empty simply drop (k can shrink — acceptable for
    * probe-style IVF; the recall spec measures the result, not the
    * intent).
    *
    * The per-dimension mean goes through DECIMAL space (exact
    * order-independent sum, double divide, 9-dp round — the Money /
    * roundSim discipline): a plain `avg(double)` depends on partial-
    * aggregation order, which would make the trained centroids vary
    * run-to-run and engine-to-engine. This determinism is what lets the
    * DuckDB oracle twins re-train the SAME centroids as unrolled CTEs
    * and is why trained cells can be the SHIPPED default config rather
    * than a recommended-but-unverifiable one.
    */
  def trainCentroids(embeddings: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    val d2812 = org.apache.spark.sql.types.DecimalType(28, 12)
    val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
    var cents = embeddings.orderBy("vec_id").limit(k)
      .select(row_number().over(w).as("centroid_id"),
        col("embedding").as("cvec"))
    for (_ <- 1 to iters) {
      cents = assign(embeddings, cents)
        .select(col("centroid_id"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg(roundSim(
          sum(col("x").cast("double").cast(d2812)).cast("double")
            / count(lit(1)).cast("double")).as("m"))
        .groupBy("centroid_id")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cvec"))
    }
    cents
  }

  /** IVF top-k: probe the nprobe centroids nearest to the query, then
    * exact top-k within their cells only.
    */
  def ivfTopK(embeddings: DataFrame, centroids: DataFrame, query: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    val assigned = assignCached(embeddings, centroids)
    val probes = crossBroadcast(centroids,
        query.select(col("embedding").as("qvec")))
      .select(col("centroid_id"),
        roundSim(cosine(col("cvec"), col("qvec"))).as("csim"))
      .orderBy(desc("csim"), asc("centroid_id"))
      .limit(nprobe)
      .select("centroid_id")
    crossBroadcast(
      assigned.join(broadcast(probes), "centroid_id"),
      query.select(col("embedding").as("qvec")))
      .select(col("vec_id"), col("label"),
        roundSim(cosine(col("embedding"), col("qvec"))).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** Semantic dedup (the SemDeDup recipe, Abbas et al. 2023): cluster
    * embeddings around centroids, then compare pairs ONLY within a
    * cluster — near-semantic-duplicates land in the same cell, so the
    * all-pairs comparison shrinks to Σ cell² instead of n². Emits pairs
    * (a < b) in the same cell with cosine ≥ threshold; downstream keeps
    * the lowest vec_id of each component (compose with
    * [[Dedup.connectedComponents]] for the closure).
    *
    * Cell assignment is the zero-shuffle [[assign]] fold; the only
    * shuffles are the window cap and the cell self-join. `maxCell` is
    * the same bounded-candidates skew guard as [[signLshPairs]]: a hot
    * cell (real embedding sets are anisotropic) is capped to its
    * `maxCell` lowest vec_ids, so per-cell pairs are ≤ maxCell²/2
    * always. At 100 TB one sizes k so |corpus|/k ≈ maxCell — SemDeDup's
    * own operating point (k ~ 100k cells for billions of docs).
    */
  def semDedup(embeddings: DataFrame, centroids: DataFrame,
               threshold: Double, maxCell: Int = 1024): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("centroid_id").orderBy("vec_id")
    // assignCached: an IVF serving stack and its dedup pass share one
    // materialized assignment of the same (embeddings, centroids) pair.
    // The norm rides the capped frame: computed once per VECTOR, not
    // once per candidate pair (same sequential fold, same division
    // order as cosine() — bit-identical values, 3× less fold work in
    // the self-join).
    val capped = assignCached(embeddings, centroids)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxCell)
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        norm(col("embedding")).as("__nrm"))
    capped.toDF("vec_a", "emb_a", "centroid_id", "nrm_a")
      .join(capped.toDF("vec_b", "emb_b", "centroid_id", "nrm_b"),
        "centroid_id")
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        col("centroid_id").cast("long").as("centroid_id"),
        roundSim(dot(col("emb_a"), col("emb_b")) /
          (col("nrm_a") * col("nrm_b"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Symmetric int8 quantization of the embedding column — the vector
    * storage path at scale (4× smaller than float32, 8× than float64;
    * IVF/brute rankings survive int8 with ~1e-3 cosine error). Per
    * vector: scale = max|x| / 127, q_i = round(x_i / scale). Both the
    * scale and the quotients round through decimal space so the outputs
    * are bit-identical in any engine (see [[roundSim]]); an all-zero
    * vector quantizes to zeros with scale 0 rather than dividing by it.
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(20, 12)
    val v = col("embedding")
    val scale = round(
      (array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0))
        .cast(d), 9).cast("double")
    val q = when(scale === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v, x =>
        round((x.cast("double") / scale)
          .cast(org.apache.spark.sql.types.DecimalType(20, 10)), 0)
          .cast("int")))
    embeddings.select(col("vec_id"), scale.as("scale"), q.as("q"))
  }

  /** Dequantize back to doubles: x_i ≈ q_i × scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Sign-LSH bucket of the first `dims` dimensions: 'PNNP…' pattern. */
  def signBucket(vec: Column, dims: Int): Column =
    concat((0 until dims).map(i =>
      when(element_at(vec, i + 1) >= 0, "P").otherwise("N")): _*)

  /** Embedding-cosine near-dup pairs, blocked by sign-LSH bucket:
    * pairs (a < b) in the same bucket with cosine ≥ threshold.
    *
    * Skew guard (real embedding sets are anisotropic — one sign pattern
    * can hold a large fraction of the corpus, turning the bucket
    * self-join quadratic on one key):
    *   1. buckets larger than `maxBucket` are REFINED: their key extends
    *      from the first `dims` sign bits to `refineDims`, splitting the
    *      hot bucket while small buckets keep full recall;
    *   2. any bucket still above `maxBucket` after refinement is capped
    *      to its `maxBucket` lowest vec_ids (deterministic row_number) —
    *      the same bounded-candidates contract as the shingle families'
    *      `maxDf` stop-shingle guard. Candidate pairs per bucket are
    *      therefore ≤ maxBucket·(maxBucket−1)/2, always.
    */
  def signLshPairs(embeddings: DataFrame, threshold: Double,
                   dims: Int = 8, refineDims: Int = 16,
                   maxBucket: Int = 256): DataFrame = {
    val capped = lshCapped(embeddings, dims, refineDims, maxBucket)
    capped.toDF("vec_a", "emb_a", "bucket", "nrm_a")
      .join(capped.toDF("vec_b", "emb_b", "bucket", "nrm_b"), "bucket")
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        roundSim(dot(col("emb_a"), col("emb_b")) /
          (col("nrm_a") * col("nrm_b"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** The sign-LSH blocked frame both pair generators share: one row per
    * vector with its refined-then-capped bucket and precomputed norm
    * (identical fold values, a third of the dot work in the bucket
    * self-join — see [[signLshPairs]]'s skew-guard scaladoc for why the
    * refine + cap sequence bounds any bucket's candidates).
    */
  private def lshCapped(embeddings: DataFrame, dims: Int, refineDims: Int,
                        maxBucket: Int): DataFrame = {
    val withBuckets = embeddings
      .select(col("vec_id"), col("embedding"),
        signBucket(col("embedding"), dims).as("__b0"),
        signBucket(col("embedding"), refineDims).as("__b1"))
    // ≤ 2^dims rows — broadcast to the refinement join
    val counts = withBuckets.groupBy("__b0").agg(count(lit(1)).as("__n"))
    val refined = withBuckets.join(broadcast(counts), "__b0")
      .select(col("vec_id"), col("embedding"),
        when(col("__n") > maxBucket, col("__b1")).otherwise(col("__b0"))
          .as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("vec_id")
    refined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBucket)
      .select(col("vec_id"), col("embedding"), col("bucket"),
        norm(col("embedding")).as("__nrm"))
  }

  /** Exact k-NN graph by full pairwise ranking — O(n²·d), the recall
    * oracle for [[knnGraph]] and the honest tool below ~10⁵ vectors
    * (deliberately a Cartesian product: that IS brute force; the
    * blocked [[knnGraph]] is the scale path).
    */
  def bruteKnnGraph(embeddings: DataFrame, k: Int): DataFrame = {
    val a = embeddings.select(col("vec_id").as("src"),
      col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("dst"),
      col("embedding").as("emb_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(desc("sim"), asc("dst"))
    a.crossJoin(b)
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        roundSim(cosine(col("emb_a"), col("emb_b"))).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("src"), col("dst"), col("sim"), col("rnk"))
  }

  /** Top-`nprobe` cells per vector with ZERO shuffle of the corpus —
    * the probe-side generalization of [[assign]] (`nprobe = 1` selects
    * exactly assign's argmax): per row, the same rounded csim computes
    * per centroid, the `(−csim, centroid_id)` structs `array_sort`
    * ascending (≡ `ORDER BY csim DESC, centroid_id ASC`), and the first
    * nprobe ids explode to rows. All narrow per-row ops on either
    * centroid path (plan literal or broadcast struct), so the corpus
    * never exchanges; output rows = |corpus|·nprobe. A dim-mismatched
    * embedding nulls every csim and raises through the per-element
    * guard instead of probing garbage cells (assign's fail-loud
    * contract).
    */
  def probeAssign(embeddings: DataFrame, centroids: DataFrame,
                  nprobe: Int): DataFrame = {
    val ceiling = literalCentroidCeiling(embeddings.sparkSession)
    val withNorm = embeddings.withColumn("__nrm", norm(col("embedding")))
    def probeIds(cents: Column): Column =
      transform(
        slice(transform(array_sort(transform(cents, c =>
          struct(
            (lit(0.0) - roundSim(dot(col("embedding"), c.getField("_2")) /
              (col("__nrm") * c.getField("_3")))).as("_1"),
            c.getField("_1").as("_2")))),
          s => s.getField("_2")), 1, nprobe),
        cid => when(cid.isNull, raise_error(lit(
          "probeAssign: null probe — embedding/centroid dim mismatch"))
          .cast("int")).otherwise(cid))
    val out = collectUpTo(centroids, ceiling, "probeAssign") match {
      case Some(collected) =>
        // native fused top-nprobe ([[ProbeCells]] — same nulls-first
        // mismatch semantics as the struct sort, parity-pinned)
        val cents: Seq[(Int, Seq[Double], Double)] = collected.map {
          case (cid, v) =>
            (cid, v, math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)))
        }
        embeddings.withColumn("centroid_id",
          explode(CellProbe.probeCells(col("embedding"), cents, nprobe)))
      case None =>
        crossBroadcast(withNorm, centStructRow(centroids))
          .withColumn("centroid_id", explode(probeIds(col("__cents"))))
          .drop("__cents")
          .drop("__nrm")
    }
    out
  }

  /** Approximate k-NN graph over the whole corpus — the neighbor-graph
    * build a SemDeDup-style semantic-dedup or graph-based clustering
    * pipeline starts from: every vector's top-k most-cosine-similar
    * neighbors among the members of its `nprobe` nearest centroid
    * cells (each vector is simultaneously a query probing nprobe cells
    * via [[probeAssign]] and an index entry in its own argmax cell via
    * [[assign]] — multi-probe on the query side buys recall that
    * single-cell blocking forfeits at cell boundaries). The graph is
    * directed: both (a→b) and (b→a) can appear, each ranked from its
    * own side. `nprobe = |cells|` degenerates to the exact brute k-NN
    * graph (spec-pinned); the shipped config's recall is a measured
    * contract (COVERAGE.md).
    *
    * Scale shape: both sides reach the join shuffled at CELL grain only
    * (the probe/assign passes are zero-shuffle projections); a dst
    * joins to the srcs probing its cell — inverted-index, never corpus
    * × corpus — with per-src candidates ≤ nprobe·maxCell by the
    * deterministic cell cap, and the rank filter rides
    * WindowGroupLimit so at most k rows per src cross the window
    * shuffle.
    */
  def knnGraph(embeddings: DataFrame, centroids: DataFrame, k: Int = 5,
               nprobe: Int = 4, maxCell: Int = 1024): DataFrame = {
    val wCap = org.apache.spark.sql.expressions.Window
      .partitionBy("centroid_id").orderBy("vec_id")
    val dst = assignCached(embeddings, centroids)
      .withColumn("__rn", row_number().over(wCap))
      .filter(col("__rn") <= maxCell)
      .select(col("vec_id").as("dst"), col("embedding").as("emb_b"),
        col("centroid_id"), norm(col("embedding")).as("nrm_b"))
    val src = probeAssign(embeddings, centroids, nprobe)
      .select(col("vec_id").as("src"), col("embedding").as("emb_a"),
        col("centroid_id"), norm(col("embedding")).as("nrm_a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(desc("sim"), asc("dst"))
    // memoized: ann_knn_graph materializes this frame, marginPairs
    // reads it THREE times (edge list + both sides of the stats join) —
    // without the memo each reference re-runs the cell join + rank
    val g = src.join(dst, Seq("centroid_id"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        roundSim(dot(col("emb_a"), col("emb_b")) /
          (col("nrm_a") * col("nrm_b"))).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("src"), col("dst"), col("sim"), col("rnk"))
    graft.core.PlanMemo.cached("similarity.knngraph", g)
  }

  /** Margin-scored neighbor pairs (Artetxe & Schwenk, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings",
    * ACL 2019 — the `ratio` variant): every [[knnGraph]] edge rescored
    *   margin(x,y) = cos(x,y) / ((avgK(x) + avgK(y)) / 2)
    * where avgK(v) is v's mean cosine to its own k nearest neighbors.
    * An absolute cosine threshold over-mines dense regions (hubs look
    * close to everything) and under-mines sparse ones; dividing by the
    * two local neighborhood densities is the standard correction for
    * mined-pair / bitext filtering. margin > 1 ⇔ the pair is closer
    * than either side's usual neighborhood.
    *
    * Determinism discipline: per-vector sims are already 9-decimal
    * rounded; their mean goes through an order-independent DECIMAL sum
    * before ONE double division per side, and the final ratio re-rounds
    * via [[roundSim]] — both engines derive identical doubles.
    * Neighborhoods whose mean cosine is ≤ [[minDensity]] are not scored
    * (a near-zero denominator turns FP noise into unbounded margins;
    * real mining pipelines threshold the same way).
    *
    * Scale shape: [[knnGraph]]'s inverted-index bound, then one
    * corpus-grain agg (k·n → n rows) and two joins of the k·n-row edge
    * list against the n-row stats frame — vec-grain shuffles, nothing
    * quadratic.
    */
  def marginPairs(embeddings: DataFrame, centroids: DataFrame, k: Int = 5,
                  nprobe: Int = 4, maxCell: Int = 1024,
                  minDensity: Double = 0.01): DataFrame = {
    val g = knnGraph(embeddings, centroids, k, nprobe, maxCell)
    val stats = g.groupBy(col("src").as("vid"))
      .agg((sum(col("sim").cast(org.apache.spark.sql.types
        .DecimalType(20, 12))).cast("double") / count(lit(1))).as("avgk"))
    g.join(stats.select(col("vid").as("src"), col("avgk").as("avg_a")), "src")
      .join(stats.select(col("vid").as("dst"), col("avgk").as("avg_b")), "dst")
      .filter(col("avg_a") > minDensity && col("avg_b") > minDensity)
      .select(col("src"), col("dst"), col("sim"),
        roundSim(col("sim") / ((col("avg_a") + col("avg_b")) / 2))
          .as("margin"))
  }

  /** Product quantization (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011): split the d-dim space into
    * `m` contiguous subspaces of d/m dims and quantize each subvector to
    * its nearest codebook entry (argmin squared L2, centroid_id
    * tie-break). A 64-dim float vector (256 B) becomes m=8 small codes —
    * the standard way a 100 TB embedding corpus fits its serving tier.
    * The codebook here reuses the corpus' own designated seed vectors
    * (the `centroids` frame), sliced per subspace; real deployments
    * train per-subspace k-means ([[trainCentroids]] on slices) — the
    * encode/search algebra is identical either way.
    *
    * Zero-shuffle by the [[assign]] construction: the codebook is
    * collected once (small by contract) and folded into the plan as a
    * literal; encoding is a narrow projection over the scan — no
    * exchange anywhere (PlanSpec pins this). Distances round through
    * decimal space ([[roundSim]]) so the argmin — and therefore every
    * code — is bit-identical in any engine; folding ascending-id with
    * strict `<` keeps the lowest-id winner on ties, the same tie-break
    * as `ORDER BY d2 ASC, centroid_id ASC`.
    */
  /** Argmin-L2 fold for one PQ subspace over an array-of-struct
    * sub-codebook column `(_1 = centroid_id, _2 = subvector)` — shared
    * by the literal and broadcast paths ([[bestCentroid]]'s twin).
    * Folding ascending-id with strict `<` keeps the lowest-id winner on
    * ties, the same tie-break as `ORDER BY d2 ASC, centroid_id ASC`. A
    * fold ending on the −1 sentinel (dim-mismatched embedding → null
    * comparisons all the way down) raises instead of emitting a silent
    * garbage code — the [[assign]] fail-loudly contract.
    */
  private def subCode(cb: Column, s: Int, sub: Int): Column = {
    val x = slice(col("embedding"), s * sub + 1, sub)
    aggregate(
      cb,
      struct(lit(-1).as("cid"), lit(Double.PositiveInfinity).as("d2")),
      (acc, c) => {
        val d2 = roundSim(aggregate(
          zip_with(x, c.getField("_2"),
            (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0), (t, e) => t + e))
        when(d2 < acc.getField("d2"),
          struct(c.getField("_1").as("cid"), d2.as("d2")))
          .otherwise(acc)
      },
      // guard in the finish lambda — see bestCentroid: wrapping the
      // aggregate itself would evaluate the fold twice
      acc => when(acc.getField("cid") === -1, raise_error(lit(
        "pqEncode: no codebook match — embedding/codebook dim mismatch"))
        .cast("int"))
        .otherwise(acc.getField("cid")))
  }

  /** The interpreted-HOF literal-path encoder, kept ONLY as the parity
    * oracle for [[PqCodes]] (same fold order, same decimal rounding,
    * same tie-break and raise; SimilaritySpec asserts bit-identical
    * codes over the corpus).
    */
  private[functions] def pqEncodeHof(embeddings: DataFrame,
                                     centroids: DataFrame,
                                     m: Int = 8): DataFrame = {
    val ceiling = literalCentroidCeiling(embeddings.sparkSession)
    val cents = collectUpTo(centroids, ceiling, "pqEncode")
      .getOrElse(sys.error("pqEncodeHof: codebook above literal ceiling"))
    require(cents.map(_._2.length).distinct.size == 1, "pq: ragged codebook")
    val dim = cents.head._2.length
    require(dim % m == 0, s"pqEncode: dim $dim not divisible by m=$m")
    val sub = dim / m
    val codes = array((0 until m).map { s =>
      val subCents: Seq[(Int, Seq[Double])] =
        cents.map { case (cid, v) => (cid, v.slice(s * sub, (s + 1) * sub)) }
      subCode(typedLit(subCents), s, sub)
    }: _*)
    embeddings.withColumn("codes", codes)
  }

  def pqEncode(embeddings: DataFrame, centroids: DataFrame,
               m: Int = 8): DataFrame = {
    val ceiling = literalCentroidCeiling(embeddings.sparkSession)
    collectUpTo(centroids, ceiling, "pqEncode") match {
      case Some(cents) =>
        require(cents.map(_._2.length).distinct.size == 1, "pq: ragged codebook")
        val dim = cents.head._2.length
        require(dim % m == 0, s"pqEncode: dim $dim not divisible by m=$m")
        // one fused native pass over all m subspaces ([[PqCodes]] — the
        // codegen'd twin of the per-subspace HOF argmin folds, parity-
        // pinned in SimilaritySpec); the HOF form below survives on the
        // broadcast path where the codebook exceeds the literal ceiling
        embeddings.withColumn("codes",
          PqCodes.pqCodes(col("embedding"), cents, m))
      case None =>
        // broadcast-struct path (see assign): the codebook aggregates to
        // one row holding m pre-sliced sub-codebooks — sliced ONCE in the
        // single-row frame, not per corpus row — broadcast-joined on a
        // constant key; the identical fold runs over the joined column
        val dims = centroids.select(org.apache.spark.sql.functions.size(col("cvec")).as("d"))
          .distinct().collect().map(_.getInt(0)).toIndexedSeq
        require(dims.size == 1, s"pqEncode: ragged codebook (dims $dims)")
        val dim = dims.head
        require(dim % m == 0, s"pqEncode: dim $dim not divisible by m=$m")
        val sub = dim / m
        val one = centroids
          .select(col("centroid_id").cast("int").as("_1"),
            transform(col("cvec"), _.cast("double")).as("_2"))
          .select(struct(col("_1"), col("_2")).as("c"))
          .agg(array_sort(collect_list(col("c"))).as("__cents"))
          .select(transform(sequence(lit(0), lit(m - 1)), s =>
            transform(col("__cents"), c =>
              struct(c.getField("_1").as("_1"),
                slice(c.getField("_2"), s * lit(sub) + 1, lit(sub)).as("_2"))))
            .as("__cb"))
        crossBroadcast(embeddings, one)
          .withColumn("codes", array((0 until m).map { s =>
            subCode(element_at(col("__cb"), s + 1), s, sub)
          }: _*))
          .drop("__cb")
    }
  }

  /** Reconstruction column over `codes`: per subspace, a literal map
    * lookup code → codebook subvector, concatenated back to full dim.
    */
  private def reconOf(cents: Seq[(Int, Seq[Double])], m: Int): Column = {
    val dim = cents.head._2.length
    val sub = dim / m
    flatten(array((0 until m).map { s =>
      val lut: Map[Int, Seq[Double]] =
        cents.map { case (cid, v) => cid -> v.slice(s * sub, (s + 1) * sub) }.toMap
      element_at(typedLit(lut), element_at(col("codes"), s + 1))
    }: _*))
  }

  /** Attach the ADC `__recon` column over `codes`, choosing the path by
    * codebook size exactly like [[assign]]/[[pqEncode]]: literal LUT
    * maps up to the ceiling; above it, ONE row of per-subspace
    * `map<code, subvector>` LUTs built in the codebook frame and
    * broadcast-joined on a constant key — the same lookup, no
    * codebook-sized plan literal in the serving tier.
    */
  private def withRecon(df: DataFrame, centroids: DataFrame,
                        m: Int): DataFrame = {
    val ceiling = literalCentroidCeiling(df.sparkSession)
    collectUpTo(centroids, ceiling, "recon") match {
      case Some(cents) =>
        df.withColumn("__recon", reconOf(cents, m))
      case None =>
        val dims = centroids
          .select(org.apache.spark.sql.functions.size(col("cvec")).as("d"))
          .distinct().collect().map(_.getInt(0)).toIndexedSeq
        require(dims.size == 1, s"recon: ragged codebook (dims $dims)")
        val dim = dims.head
        require(dim % m == 0, s"recon: dim $dim not divisible by m=$m")
        val sub = dim / m
        // the leading column is the crossBroadcast key source — it must
        // be hashable (xxhash64 rejects MAP types) and data-derived (a
        // literal would fold the join condition away); the codebook
        // size from the aggregate is both
        val one = centroids
          .select(col("centroid_id").cast("int").as("_1"),
            transform(col("cvec"), _.cast("double")).as("_2"))
          .agg(collect_list(struct(col("_1"), col("_2"))).as("cs"))
          .select(
            org.apache.spark.sql.functions.size(col("cs")).as("__nlut"),
            transform(sequence(lit(0), lit(m - 1)), s =>
              map_from_entries(transform(col("cs"), c =>
                struct(c.getField("_1"),
                  slice(c.getField("_2"), s * lit(sub) + 1, lit(sub))))))
              .as("__luts"))
        crossBroadcast(df, one)
          .withColumn("__recon", flatten(array((0 until m).map { s =>
            element_at(element_at(col("__luts"), s + 1),
              element_at(col("codes"), s + 1))
          }: _*)))
          .drop("__luts", "__nlut")
    }
  }

  /** IVF+PQ search — the composition a production ANN index actually
    * serves (the FAISS `IVFx,PQy` layout): coarse IVF cells prune the
    * corpus to `nprobe` probe cells, then ADC ranks ONLY the survivors
    * by cosine against their PQ reconstructions. At 100 TB the corpus
    * side stores one coarse cell id + m code bytes per vector — the
    * scan reads 1/|cells|·nprobe of the rows and none of the raw
    * vectors. Plan shape: the zero-shuffle cell assignment and code
    * projection, one broadcast semi-join on the probe set, one
    * TakeOrderedAndProject. Exact-rank parity with [[pqTopK]] on the
    * probed subset by construction (same reconstruction, same rounding,
    * same tie-break).
    */
  def ivfPqTopK(embeddings: DataFrame, centroids: DataFrame,
                query: DataFrame, k: Int, nprobe: Int,
                m: Int = 8): DataFrame = {
    val assigned = assignCached(embeddings, centroids)
    val probes = crossBroadcast(centroids,
        query.select(col("embedding").as("qvec")))
      .select(col("centroid_id"),
        roundSim(cosine(col("cvec"), col("qvec"))).as("csim"))
      .orderBy(desc("csim"), asc("centroid_id"))
      .limit(nprobe)
      .select("centroid_id")
    crossBroadcast(
      withRecon(
        pqEncode(assigned.join(broadcast(probes), "centroid_id"), centroids, m),
        centroids, m),
      query.select(col("embedding").as("qvec")))
      .select(col("vec_id"), col("label"),
        roundSim(cosine(col("__recon"), col("qvec"))).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** Persist the IVF+PQ index: one row per vector — coarse cell id, PQ
    * codes, and the columns a result needs (label) — written as parquet
    * PARTITIONED BY centroid_id. This is the storage layout the serving
    * path depends on: a probe of nprobe cells becomes a PARTITION-PRUNED
    * scan (the reader lists only nprobe directories), so query cost
    * scales with nprobe/|cells| of the index, not its size. The raw
    * embedding column is deliberately NOT stored — the index is the
    * compressed corpus (m code bytes + a cell id per vector, ~1/32 of
    * float32 at m=8/d=64).
    */
  def writeIndex(embeddings: DataFrame, centroids: DataFrame, path: String,
                 m: Int = 8): Unit =
    pqEncode(assign(embeddings, centroids), centroids, m)
      .select(col("vec_id"), col("label"), col("codes"), col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(path)

  /** Append a new wave of vectors to a stored [[writeIndex]] layout —
    * the "new crawl wave" maintenance path ([[Dedup]]'s incremental
    * shape applied to the serving index): the wave encodes against the
    * SAME frozen centroids and codebook (an index's geometry is fixed
    * between retrains — re-deriving it would silently re-bucket the
    * existing corpus) and its files land ONLY in the cell partitions
    * the wave actually touches; every other cell's files are untouched
    * bytes (spec-pinned), so a small wave costs a small write no
    * matter how large the index has grown. [[searchIndex]] probes then
    * see old and new vectors alike — its per-query read lists fresh.
    */
  def appendIndex(wave: DataFrame, centroids: DataFrame, path: String,
                  m: Int = 8): Unit =
    pqEncode(assign(wave, centroids), centroids, m)
      .select(col("vec_id"), col("label"), col("codes"), col("centroid_id"))
      .write.mode("append").partitionBy("centroid_id").parquet(path)

  /** Serve a query from a stored [[writeIndex]] layout: rank the probe
    * cells (centroid literals vs the query), scan ONLY those partitions
    * (`isin` over the partition column — partition pruning, pinned by
    * `PlanSpec`), reconstruct from codes, ADC-rank. No join anywhere:
    * the probe set folds into the scan as a partition filter and the
    * reconstruction is a literal map lookup.
    */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  centroids: DataFrame, query: DataFrame, k: Int,
                  nprobe: Int, m: Int = 8,
                  pred: Column = lit(true)): DataFrame = {
    val probeIds: Seq[Int] = crossBroadcast(centroids,
        query.select(col("embedding").as("qvec")))
      .select(col("centroid_id").cast("int").as("centroid_id"),
        roundSim(cosine(col("cvec"), col("qvec"))).as("csim"))
      .orderBy(desc("csim"), asc("centroid_id"))
      .limit(nprobe)
      .collect().map(_.getInt(0)).toIndexedSeq
    // `pred` is FILTERED search (the "top-k among label = x" shape):
    // a plain column predicate over stored metadata lands BEFORE the
    // reconstruction projection, so Catalyst pushes it into the parquet
    // scan (PushedFilters) — rows failing it never decode. Pre-filter,
    // not post-filter: the k results are the best MATCHING vectors, not
    // the matching subset of the unfiltered top-k.
    crossBroadcast(
      withRecon(
        spark.read.parquet(path)
          .filter(col("centroid_id").isin(probeIds: _*))
          .filter(pred),
        centroids, m),
      query.select(col("embedding").as("qvec")))
      .select(col("vec_id"), col("label"),
        roundSim(cosine(col("__recon"), col("qvec"))).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** Batched IVF+PQ serving: top-k for a whole FRAME of queries in one
    * pass — the shape an offline retrieval job (hard-negative mining,
    * k-NN graph construction, eval sweeps) actually runs, where
    * per-query invocation would re-scan the index |Q| times.
    *
    * Plan: probe ranking is a |Q|×C cross join (C small by contract)
    * cut to nprobe per query by a WindowGroupLimit; candidates come
    * from ONE scan of the encoded corpus joined to the broadcast probe
    * pairs on cell id — each index row is read once and fans out only
    * to the queries probing its cell; the final per-query top-k is
    * again rank ≤ k (WindowGroupLimit, no global sort). Query vectors
    * ride the broadcast probe pairs, so no second join against the
    * query frame is needed.
    */
  def searchBatch(embeddings: DataFrame, centroids: DataFrame,
                  queries: DataFrame, k: Int, nprobe: Int,
                  m: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probeRank = Window.partitionBy("qid")
      .orderBy(desc("csim"), asc("centroid_id"))
    val probes = crossBroadcast(
        queries.select(col("qid"), col("embedding").as("qvec")), centroids)
      .select(col("qid"), col("qvec"), col("centroid_id"),
        roundSim(cosine(col("cvec"), col("qvec"))).as("csim"))
      .withColumn("__pr", row_number().over(probeRank))
      .filter(col("__pr") <= nprobe)
      .select("qid", "qvec", "centroid_id")
    val resultRank = Window.partitionBy("qid")
      .orderBy(desc("sim"), asc("vec_id"))
    withRecon(pqEncode(assignCached(embeddings, centroids), centroids, m),
        centroids, m)
      .join(broadcast(probes), "centroid_id")
      .select(col("qid"), col("vec_id"), col("label"),
        roundSim(cosine(col("__recon"), col("qvec"))).as("sim"))
      .withColumn("rnk", row_number().over(resultRank))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "label", "sim")
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each corpus vector
    * is REPLACED by its reconstruction (the concatenation of its m
    * codebook subvectors — a literal map lookup per subspace, no join)
    * and ranked by exact cosine against the uncompressed query. This is
    * how a PQ index answers queries: the corpus side pays only the code
    * bytes; all full-precision work happens on the query side. Same
    * plan shape as [[bruteTopK]]: one scan, one TakeOrderedAndProject.
    */
  def pqTopK(embeddings: DataFrame, centroids: DataFrame, query: DataFrame,
             k: Int, m: Int = 8): DataFrame = {
    crossBroadcast(
      withRecon(pqEncode(embeddings, centroids, m), centroids, m),
      query.select(col("embedding").as("qvec")))
      .select(col("vec_id"), col("label"),
        roundSim(cosine(col("__recon"), col("qvec"))).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }
}
