package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)

  test("mmrRerank diversifies: a redundant near-copy loses to a distinct hit") {
    import spark.implicits._
    // q=(1,0); vec1=(4,3) and vec2=(8,6) are the SAME direction
    // (qsim 0.8, mutual sim 1.0); vec3=(0,1) is orthogonal to q
    // (qsim 0.0) but only 0.6-similar to vec1. Plain top-2 is {1,2};
    // MMR at λ=0.3 must pick {1,3}: score(2)=0.3·0.8−0.7·1.0=−0.46 <
    // score(3)=0.3·0.0−0.7·0.6=−0.42. Round 3 takes the copy last.
    val corpus = Seq(
      (1L, Array(4f, 3f)), (2L, Array(8f, 6f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val query = Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(corpus, query, kCand = 3, k = 3,
      lambda = 0.3, oneMinusLambda = 0.7).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2))))
    assert(out(0) == ((1, (1L, 0.8))), s"qsim tie breaks on id: ${out.toSeq}")
    assert(out(1)._2._1 == 3L, s"the distinct hit must outrank the copy: ${out.toSeq}")
    assert(out(2)._2._1 == 2L)
    intercept[IllegalArgumentException](
      Similarity.mmrRerank(corpus, query, lambda = 0.3,
        oneMinusLambda = 0.5))
    // corpus-sized kCand must fail loudly before collecting kCand² pair
    // sims to the driver (serving-tier rerank contract)
    val big = intercept[IllegalArgumentException](
      Similarity.mmrRerank(corpus, query, kCand = 100000, k = 10))
    assert(big.getMessage.contains("kCand"), big.getMessage)
  }

  test("mmrRerank at λ=1 is pure relevance — the brute ranking order") {
    import spark.implicits._
    val q = emb.filter(col("vec_id") === 0)
    val mmr = Similarity.mmrRerank(emb, q, kCand = 20, k = 10,
      lambda = 1.0, oneMinusLambda = 0.0)
      .collect().map(_.getLong(1)).toSeq
    val brute = Similarity.bruteTopK(emb, q, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(mmr == brute, "zero diversity weight must reduce to top-k")
  }

  test("self-similarity tops the brute-force ranking at 1.0") {
    val top = Similarity.bruteTopK(emb, emb.filter(col("vec_id") === 0), 5)
      .collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(2) - 1.0) < 1e-6)
    val sims = top.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse, "descending order")
  }

  test("IVF with full probe coverage equals brute force") {
    val centroids = emb.filter(col("vec_id").between(1, 4))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val q = emb.filter(col("vec_id") === 0)
    val ivfAll = Similarity.ivfTopK(emb, centroids, q, k = 5, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteTopK(emb, q, 5).collect().map(_.getLong(0)).toSeq
    assert(ivfAll == brute, "nprobe = all centroids ⇒ exact")
  }

  test("knnGraph: nprobe = all cells ≡ exact brute k-NN graph; shipped recalls") {
    val cents = Similarity.trainCentroids(emb, k = 16, iters = 2).cache()
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every src probes every cell ⇒ candidates = the whole corpus ⇒ exact
    val full = edges(Similarity.knnGraph(emb, cents, k = 5, nprobe = 16))
    val brute = edges(Similarity.bruteKnnGraph(emb, k = 5))
    assert(full == brute, "nprobe = |cells| must reproduce brute force")
    // SHIPPED config (trained k=16 cells, nprobe=4): measured recall
    // floor on worst-case near-uniform synthetic vectors — the fixed
    // first-16 cells this replaced measured 0.487 at sf0.01; trained
    // cells measure 0.573 (info line below prints the current value)
    val shipped = edges(Similarity.knnGraph(emb, cents, k = 5, nprobe = 4))
    val recall = (shipped intersect brute).size.toDouble / brute.size
    info(f"shipped trained-cell knn edge recall $recall%.3f")
    assert(recall >= 0.45, s"knn recall $recall below floor")
    cents.unpersist()
  }

  test("VecDot is bit-identical to the HOF fold; null semantics match") {
    import spark.implicits._
    // every corpus vector dotted against one fixed query — raw doubles
    // compared exactly, no rounding anywhere
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val both = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        Similarity.dot(col("embedding"), col("qvec")).as("fast"),
        Similarity.dotHof(col("embedding"), col("qvec")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
    // length mismatch and null elements → null, exactly like the
    // padded zip's poisoned fold
    val odd = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)))
      .toDF("id", "a", "b")
      .select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(odd == Map(1L -> None, 2L -> Some(5.0)))
  }

  test("PqCodes is bit-identical to the HOF sub-code folds; raise parity") {
    import spark.implicits._
    val cents = emb.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val fast = Similarity.pqEncode(emb, cents, m = 8)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = Similarity.pqEncodeHof(emb, cents, m = 8)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(fast.nonEmpty && fast == hof,
      s"native/HOF code divergence: ${fast.toSeq.diff(hof.toSeq).take(3)}")
    // a dim-mismatched embedding raises the fail-loudly error in both
    // forms instead of emitting a garbage code
    val bad = Seq((1L, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val eFast = intercept[Exception](
      Similarity.pqEncode(bad, cents, m = 8).collect())
    assert(eFast.getMessage.contains("no codebook match"), eFast.getMessage)
    val eHof = intercept[Exception](
      Similarity.pqEncodeHof(bad, cents, m = 8).collect())
    assert(eHof.getMessage.contains("no codebook match"), eHof.getMessage)
  }

  test("appendIndex: untouched cells byte-stable; search covers both waves") {
    import java.nio.file.{Files, Path}
    val cents = emb.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val base = emb.filter(col("vec_id") % 100 =!= 0)
    val wave = emb.filter(col("vec_id") % 100 === 0)
    val dir = Files.createTempDirectory("graft_appendspec")
    val full = Files.createTempDirectory("graft_fullspec")
    try {
      Similarity.writeIndex(base, cents, dir.toString)
      def listing(): Map[String, Set[(String, Long)]] = {
        val s = Files.list(dir).iterator()
        var m = Map.empty[String, Set[(String, Long)]]
        while (s.hasNext) {
          val cell: Path = s.next()
          if (Files.isDirectory(cell)) {
            val fs = Files.list(cell).iterator()
            var set = Set.empty[(String, Long)]
            while (fs.hasNext) {
              val f = fs.next()
              set += ((f.getFileName.toString, Files.size(f)))
            }
            m += cell.getFileName.toString -> set
          }
        }
        m
      }
      val before = listing()
      Similarity.appendIndex(wave, cents, dir.toString)
      val after = listing()
      val waveCells = Similarity.assign(wave, cents)
        .select("centroid_id").collect()
        .map(r => s"centroid_id=${r.getInt(0)}").toSet
      for ((cell, files) <- before if !waveCells.contains(cell))
        assert(after(cell) == files, s"untouched cell $cell changed")
      for (cell <- waveCells if before.contains(cell))
        assert(before(cell).subsetOf(after(cell)),
          s"append must not rewrite $cell's existing files")
      // the appended index answers exactly like a one-shot full index
      Similarity.writeIndex(emb, cents, full.toString)
      val q = emb.filter(col("vec_id") === 0)
      val appended = Similarity
        .searchIndex(spark, dir.toString, cents, q, k = 10, nprobe = 4)
        .collect().toSeq
      val oneShot = Similarity
        .searchIndex(spark, full.toString, cents, q, k = 10, nprobe = 4)
        .collect().toSeq
      assert(appended == oneShot)
    } finally {
      graft.core.Scratch.deleteRecursively(dir)
      graft.core.Scratch.deleteRecursively(full)
    }
  }

  test("marginPairs: every score recomputes from the graph + density guard") {
    val cents = emb.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val g = Similarity.knnGraph(emb, cents, k = 5, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val avgk = g.groupBy(_._1).map { case (v, es) =>
      // mirror the engine's decimal-sum-then-one-division discipline
      val s = es.map(e => BigDecimal(e._3)).sum
      v -> (s.toDouble / es.length)
    }
    val m = Similarity.marginPairs(emb, cents, k = 5, nprobe = 4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(m.nonEmpty)
    // every margin recomputes from the edge list and both sides' density
    for (((src, dst, sim)) <- g
         if avgk(src) > 0.01 && avgk.getOrElse(dst, 0.0) > 0.01) {
      val expect = BigDecimal(sim / ((avgk(src) + avgk(dst)) / 2))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(m((src, dst)) - expect) < 1e-9,
        s"margin mismatch for ($src,$dst)")
    }
    // exactly the density-qualified edges are scored — the low-density
    // guard drops edges, never invents them
    val qualified = g.count(e =>
      avgk(e._1) > 0.01 && avgk.getOrElse(e._2, 0.0) > 0.01)
    assert(m.size == qualified)
  }

  test("probeAssign: nprobe=1 equals assign's argmax cell") {
    val cents = emb.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val one = Similarity.probeAssign(emb, cents, nprobe = 1)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val argmax = Similarity.assign(emb, cents)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(one == argmax)
  }

  test("prefixRerank: full-width prefix ≡ brute force; shipped prefix recalls") {
    val q = emb.filter(col("vec_id") === 0)
    // prefix = full width and kCoarse = corpus ⇒ both stages exact
    val full = Similarity.prefixRerank(emb, q, k = 5, kCoarse = 1000,
      prefixDims = 64).collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteTopK(emb, q, 5).collect().map(_.getLong(0)).toSeq
    assert(full == brute, "degenerate config must reproduce brute force")
    // shipped config: measured recall@10 floor vs brute (empirical
    // contract, same discipline as IVF/SemDeDup)
    val shipped = Similarity.prefixRerank(emb, q, k = 10)
      .collect().map(_.getLong(0)).toSet
    val b10 = Similarity.bruteTopK(emb, q, 10).collect().map(_.getLong(0)).toSet
    val recall = (shipped intersect b10).size / 10.0
    assert(recall >= 0.5, s"prefix recall@10 $recall below floor")
  }

  test("broadcast-struct centroid path equals the plan-literal path") {
    // The serving-tier contract: when C exceeds the literal ceiling,
    // assign/pqEncode fold over a broadcast-joined struct-array column
    // instead of a typedLit — same sorted order, same sequential norm
    // fold, same argmax/argmin lambda, so results are BIT-identical.
    val centroids = emb.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val key = "spark.graft.ann.literalCentroidCeiling"
    val prev = spark.conf.get(key, "256")
    val q = emb.filter(col("vec_id") === 0)
    def run() = (
      Similarity.assign(emb, centroids)
        .select("vec_id", "centroid_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq,
      Similarity.pqEncode(emb, centroids, m = 8)
        .select(col("vec_id"), col("codes")).collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1).toSeq,
      // ADC ranking exercises the recon path (literal vs broadcast LUT)
      Similarity.pqTopK(emb, centroids, q, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq,
      // multi-probe exercises ProbeCells vs the struct-sort HOF
      Similarity.probeAssign(emb, centroids, nprobe = 4)
        .select("vec_id", "centroid_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq)
    try {
      val (litAssign, litCodes, litRank, litProbe) = run() // C=16 ≤ default ceiling
      spark.conf.set(key, "1") // force the broadcast path
      val (bcAssign, bcCodes, bcRank, bcProbe) = run()
      assert(bcAssign == litAssign, "assignments must be bit-identical")
      assert(bcCodes == litCodes, "PQ codes must be bit-identical")
      assert(bcRank == litRank, "ADC rankings must be bit-identical")
      assert(bcProbe == litProbe, "probe sets must be bit-identical")
      // path selection is observable in the plan: the broadcast form
      // joins (constant-key BroadcastHashJoin), the literal form must not
      val bcPlan = Similarity.assign(emb, centroids)
        .queryExecution.executedPlan.toString
      assert(bcPlan.contains("BroadcastHashJoin"),
        s"large-C assign must take the broadcast path:\n$bcPlan")
      spark.conf.set(key, prev)
      val litPlan = Similarity.assign(emb, centroids)
        .queryExecution.executedPlan.toString
      assert(!litPlan.contains("BroadcastHashJoin"),
        s"small-C assign must stay a plan-literal projection:\n$litPlan")
    } finally spark.conf.set(key, prev)
  }

  test("empty and dim-mismatched centroid sets fail loudly on both paths") {
    val empty = emb.filter(col("vec_id") < 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    intercept[IllegalArgumentException] { Similarity.assign(emb, empty) }
    intercept[IllegalArgumentException] { Similarity.pqEncode(emb, empty) }
    // a centroid of the wrong dimensionality nulls every zip_with
    // comparison; the fold must raise, not emit cid −1 silently
    val short = emb.filter(col("vec_id") === 1)
      .select(col("vec_id").as("centroid_id"),
        slice(col("embedding"), 1, 3).as("cvec"))
    val e = intercept[Exception] {
      Similarity.assign(emb.limit(5), short).collect()
    }
    assert(e.getMessage.contains("no centroid matched") ||
      Option(e.getCause).exists(_.getMessage.contains("no centroid matched")))
  }

  test("IVF with partial probing returns a subset of the corpus ranking") {
    val centroids = emb.filter(col("vec_id").between(1, 8))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val q = emb.filter(col("vec_id") === 0)
    val out = Similarity.ivfTopK(emb, centroids, q, k = 5, nprobe = 2).collect()
    assert(out.length == 5)
    val sims = out.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("sign-LSH pairs are symmetric-free (a < b) and above threshold") {
    val pairs = Similarity.signLshPairs(emb.limit(200), threshold = 0.2)
      .collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.2)
    }
  }

  test("int8 quantization preserves cosine geometry to ~1e-3") {
    import org.apache.spark.sql.functions._
    val deq = Similarity.quantizeInt8(emb.limit(100))
      .join(emb.limit(100), "vec_id")
      .select(col("vec_id"),
        Similarity.roundSim(Similarity.cosine(
          Similarity.dequantize(col("q"), col("scale")),
          col("embedding"))).as("self_cos"))
      .collect().map(_.getDouble(1))
    assert(deq.forall(c => c > 0.999), s"min self-cos ${deq.min}")
  }

  test("all-zero vectors quantize to zeros, not division by zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val z = Seq((1L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val row = Similarity.quantizeInt8(z).collect().head
    assert(row.getDouble(1) == 0.0)
    assert(row.getSeq[Int](2).forall(_ == 0))
  }

  test("sign-LSH skew guard bounds pairs in a degenerate bucket") {
    // 300 vectors with IDENTICAL signs in every dimension: refinement
    // can't split the bucket, so the cap must — pairs are bounded by
    // maxBucket*(maxBucket-1)/2 instead of 300*299/2 = 44850
    import spark.implicits._
    val skewed = (0 until 300)
      .map(i => (i.toLong, Array.fill(16)(1.0f + (i % 7) * 0.01f)))
      .toDF("vec_id", "embedding")
    val maxBucket = 20
    val pairs = Similarity.signLshPairs(skewed, threshold = -1.0,
      dims = 8, refineDims = 16, maxBucket = maxBucket)
    val n = pairs.count()
    assert(n <= maxBucket.toLong * (maxBucket - 1) / 2,
      s"cap breached: $n pairs")
    // deterministic: the survivors are the lowest vec_ids
    val ids = pairs.select("vec_a").union(pairs.select("vec_b"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ < maxBucket), s"non-lowest ids survived: $ids")
  }

  test("semDedup pairs only within a cell; near-identical pair found") {
    import spark.implicits._
    // two well-separated directions; 1/2 near-identical (same cell),
    // 3 the opposite direction (own cell) — cross-cell pairs must not
    // appear even though 1·3 cosine is a perfectly valid number
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq(
      (1, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2, Array(-1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("centroid_id", "cvec")
    val pairs = Similarity.semDedup(vecs, cents, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)), s"got ${pairs.toSeq}")
  }

  test("semDedup maxCell caps a hot cell deterministically") {
    import spark.implicits._
    // every vector in one cell; cap to 10 lowest vec_ids → ≤ 45 pairs
    val vecs = (0 until 100)
      .map(i => (i.toLong, Array(1.0f, (i % 5) * 0.001f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((1, Array(1.0f, 0.0f))).toDF("centroid_id", "cvec")
    val pairs = Similarity.semDedup(vecs, cents, threshold = -1.0, maxCell = 10)
    assert(pairs.count() == 45L)
    val ids = pairs.select("vec_a").union(pairs.select("vec_b"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 10L).toSet)
  }

  test("SemDeDup pair recall at the shipped config: measured, floored") {
    // The analogue of the IVF recall@10 contract, for the dd_semdedup
    // operating point (fixed first-16 centroids, threshold 0.25,
    // maxCell 256) on the sf0.01 embeddings. The reference pair set is
    // the UNCAPPED brute-force cosine pairs — obtained through semDedup
    // itself with a single centroid and maxCell = |corpus|, which puts
    // every vector in one uncapped cell (all 124 750 pairs scored).
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    val e = Tables.embeddings(spark, sf01).cache()
    try {
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val one = Seq((1, Array.fill(dim)(1.0f))).toDF("centroid_id", "cvec")
      def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("vec_a", "vec_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val n = e.count()
      val brute = pairSet(
        Similarity.semDedup(e, one, threshold = 0.25, maxCell = n.toInt))
      // SHIPPED config: k-means-trained cells (the dd_semdedup default
      // since round 7; the DuckDB twin re-trains the same cells in-oracle)
      val cents = Similarity.trainCentroids(e, k = 16, iters = 2).cache()
      val shipped = pairSet(
        Similarity.semDedup(e, cents, threshold = 0.25, maxCell = 256))
      assert(shipped.subsetOf(brute),
        "precision must be 1.0: exact cosines, same threshold")
      val biggestCell = Similarity.assign(e, cents)
        .groupBy("centroid_id").count().agg(max("count")).head().getLong(0)
      val recall = shipped.size.toDouble / brute.size
      info(f"shipped trained-cell pair recall $recall%.3f " +
        s"(${shipped.size}/${brute.size}), largest cell $biggestCell (cap 256)")
      // the cap is NOT the loss at this SF (largest cell ≪ 256): all
      // recall loss is cell blocking over near-random synthetic vectors —
      // the blocking-hostile case. Trained cells measured 0.224 here vs
      // 0.182 for the fixed first-16 cells they replaced; floored with
      // headroom for noise.
      assert(biggestCell <= 256,
        "cap binds at this SF — update the recall attribution above")
      assert(recall >= 0.18, s"pair recall was $recall")
      // the superseded fixed-cell config must not silently become
      // BETTER than the shipped trained one — if this flips, retrain
      // harder (more iters) rather than shipping the weaker default
      val fixed = pairSet(Similarity.semDedup(e,
        e.filter(col("vec_id").between(1, 16))
          .select(col("vec_id").as("centroid_id"),
            col("embedding").as("cvec")),
        threshold = 0.25, maxCell = 256))
      val fixedRecall = fixed.size.toDouble / brute.size
      info(f"fixed-cell pair recall $fixedRecall%.3f (superseded config)")
      assert(recall >= fixedRecall * 0.9,
        "trained cells should not be materially worse than fixed cells")
      cents.unpersist()
    } finally e.unpersist()
  }

  test("IVF recall@10 vs brute force: ≥0.9 at the documented config") {
    // The quality number every ANN user asks first. Corpus: the sf0.01
    // embeddings (500 × 64-dim synthetic vectors — near-random, i.e. the
    // ANN-HOSTILE case: weak cluster structure spreads true neighbors
    // across cells, so this is a recall floor, not a showcase). Config
    // under test: k-means-trained centroids (k=16, 2 Lloyd iterations,
    // deterministic seed) with nprobe=12 — measured 0.956 here; the
    // fixed-first-16 centroids of the ann_ivf oracle measure 0.536 at
    // nprobe=4 (documented in COVERAGE.md with the full curve).
    val sf01 = "/root/testdata/sf0.01"
    val e = Tables.embeddings(spark, sf01).cache()
    try {
      val cents = Similarity.trainCentroids(e, k = 16, iters = 2).cache()
      assert(cents.count() == 16)
      val qids = (0 until 500 by 25).map(_.toLong) // 20 queries
      def recall(nprobe: Int): Double = {
        val per = qids.map { q =>
          val qdf = e.filter(col("vec_id") === q)
          val brute = Similarity.bruteTopK(e, qdf, 10)
            .collect().map(_.getLong(0)).toSet
          val ivf = Similarity.ivfTopK(e, cents, qdf, 10, nprobe)
            .collect().map(_.getLong(0)).toSet
          brute.intersect(ivf).size / 10.0
        }
        per.sum / per.size
      }
      val r4 = recall(4)
      val r12 = recall(12)
      val r16 = recall(16)
      // nprobe=4 is the SHIPPED ann_ivf default (trained cells since
      // round 7 — the fixed first-16 cells measured 0.536 here)
      info(f"shipped trained-cell recall@10: nprobe=4 $r4%.3f, " +
        f"nprobe=12 $r12%.3f")
      assert(r4 >= 0.6, s"recall@10 at the shipped nprobe=4 was $r4")
      assert(r12 >= 0.9, s"recall@10 at nprobe=12 was $r12")
      assert(r16 == 1.0, s"full probe must be exact, got $r16")
      assert(r16 >= r12, "recall must not decrease with probe width")
      cents.unpersist()
    } finally e.unpersist()
  }

  test("PQ codes: seed vectors encode to themselves, codes in codebook") {
    val cents = emb.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val codes = Similarity.pqEncode(emb, cents, m = 8)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codes.values.foreach { cs =>
      assert(cs.length == 8)
      assert(cs.forall(c => c >= 1 && c <= 16), s"code outside codebook: $cs")
    }
    // a codebook vector's nearest sub-centroid in EVERY subspace is its
    // own slice at distance 0 — its code must be itself, all m times
    (1L to 16L).foreach { cid =>
      assert(codes(cid).forall(_ == cid.toInt),
        s"seed $cid must self-encode, got ${codes(cid)}")
    }
  }

  test("IVF+PQ with full probe coverage equals plain PQ ADC") {
    // the composition contract: probing every cell makes the IVF prune
    // a no-op, so the ADC ranking must be identical to pqTopK's
    val cents = emb.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val q = emb.filter(col("vec_id") === 0)
    val full = Similarity.ivfPqTopK(emb, cents, q, k = 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val plain = Similarity.pqTopK(emb, cents, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(full == plain)
    // partial probing returns a subset of the corpus, ranked the same way
    val pruned = Similarity.ivfPqTopK(emb, cents, q, k = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(pruned.size == 10)
  }

  test("batched search equals per-query IVF+PQ for every query") {
    val cents = emb.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val qids = Seq(0L, 17L, 42L)
    val qs = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding"))
    val batch = Similarity.searchBatch(emb, cents, qs, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    qids.foreach { q =>
      val single = Similarity.ivfPqTopK(emb, cents,
        emb.filter(col("vec_id") === q), k = 5, nprobe = 4)
        .collect().map(_.getLong(0)).toSeq
      assert(batch(q) == single, s"batch row for query $q diverges")
    }
  }

  test("jlMatrix: deterministic ±1 Rademacher, non-degenerate rows") {
    val a = Similarity.jlMatrix(32, 64)
    val b = Similarity.jlMatrix(32, 64)
    assert(a == b, "matrix must regenerate identically from the seed")
    assert(a.flatten.forall(v => v == 1.0 || v == -1.0))
    // rows are distinct sign patterns (md5 isn't accidentally constant)
    assert(a.distinct.length == 32, "degenerate repeated rows")
    // roughly balanced signs (each row is a fair coin at p=.5; a row
    // further than 16/64 off balance would signal a broken seed derivation)
    a.foreach { row =>
      val pos = row.count(_ > 0)
      assert(pos >= 16 && pos <= 48, s"sign balance off: $pos/64 positive")
    }
  }

  test("jlRerank: shipped config measured recall@10 floor vs brute") {
    // deterministic (fixed data, fixed seed matrix): 5 probe queries at
    // the shipped outDims=32 / kCoarse=100 measure min 0.5 / mean 0.72
    // on these structure-free near-random embeddings — JL's worst case;
    // clustered real embeddings can only do better
    val qids = Seq(0L, 7L, 13L, 21L, 33L)
    val recalls = qids.map { qid =>
      val q = emb.filter(col("vec_id") === qid)
      val brute = Similarity.bruteTopK(emb, q, 10)
        .collect().map(_.getLong(0)).toSet
      val jl = Similarity.jlRerank(emb, q, 10)
        .collect().map(_.getLong(0)).toSet
      (brute intersect jl).size / 10.0
    }
    assert(recalls.min >= 0.5, s"min recall ${recalls.min} below floor")
    assert(recalls.sum / recalls.size >= 0.7,
      s"mean recall ${recalls.sum / recalls.size} below floor")
  }

  test("jlRerank: kCoarse = corpus size ≡ exact brute top-k") {
    // with every vector surviving the coarse cut the rerank IS the
    // exact ranking — the approximation lives only in the cut
    val q = emb.filter(col("vec_id") === 0)
    val full = Similarity.jlRerank(emb, q, 10, kCoarse = 500)
      .collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteTopK(emb, q, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(full == brute)
  }

  test("PQ ADC ranking: reconstruction beats quantization noise floor") {
    // ADC top-10 for the corpus query must overlap the exact brute-force
    // top-10 — PQ with a 16-entry codebook per subspace is lossy, but on
    // near-random vectors the reconstruction keeps enough geometry to
    // recover a meaningful share of the true neighborhood.
    val cents = emb.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val q = emb.filter(col("vec_id") === 0)
    val adc = Similarity.pqTopK(emb, cents, q, k = 10, m = 8)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.bruteTopK(emb, q, 10)
      .collect().map(_.getLong(0)).toSet
    val overlap = (adc & brute).size
    assert(overlap >= 3, s"ADC top-10 shares only $overlap with brute")
  }
}
