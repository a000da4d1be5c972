package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.RunClock
import graft.marts.{CustomerSalesReport, SupplierPerformance}
import graft.sources.{Entities, Tables}

/** Physical-plan assertions: the properties that matter at 100 TB —
  * predicate pushdown into the parquet scan, column pruning, broadcast
  * of dimensions, whole-stage codegen on the hot path.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def formatted(df: org.apache.spark.sql.DataFrame): String = {
    val qe = df.queryExecution
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted") match {
      case m => qe.explainString(m)
    }
  }

  test("filters reach the parquet scan as PushedFilters") {
    val plan = formatted(
      Tables.lineitem(spark, sf)
        .filter(col("l_quantity") > 40 && col("l_returnflag") === "A")
        .select("l_orderkey", "l_quantity"))
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("IsNotNull(l_quantity)") ||
      plan.contains("GreaterThan(l_quantity"), plan)
  }

  test("projection prunes the scan schema to selected columns") {
    val plan = formatted(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice"))
    val readSchema = plan.linesIterator
      .find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipdate"),
      s"scan must not read unused columns: $readSchema")
  }

  test("supplier mart broadcasts its dimension joins") {
    val plan = formatted(SupplierPerformance.build(
      Entities.suppliers(spark, sf), Entities.products(spark, sf),
      Entities.sales(spark, sf), RunClock.fixed))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan)
  }

  test("aggregation pipeline stays inside whole-stage codegen") {
    // simple-mode plan marks codegen stages with "*(n)"; under AQE the
    // final plan only exists after execution
    val df = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("fuzzy dedup plans hash joins only — no nested-loop or cartesian") {
    val df = functions.Dedup.fuzzyPairs(
      Tables.part(spark, sf), "p_partkey", "p_name", maxDist = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"candidate generation must stay equi-join blocked:\n$plan")
    // the distance pass runs over DISTINCT texts: the levenshtein
    // operator must sit above the distinct aggregate, not the raw scan
    assert(plan.contains("levenshtein"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("no query in the inventory plans a nested-loop or cartesian join") {
    // STRICT invariant: scalar/tiny crossJoins go through
    // Scalars.crossBroadcast (constant-key BroadcastHashJoin), so any
    // BroadcastNestedLoopJoin or CartesianProduct in any plan is a bug.
    // Streaming queries are exercised by StreamingSpec instead (building
    // the plan here would drain a live stream).
    val streaming = Set("st_events_hourly", "st_click_purchase_join")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!streaming(name)) {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a CartesianProduct")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin")
      }
    }
  }

  test("segmentation windows run over key grain, never the fact") {
    // q_rfm/q_pareto rank with SINGLE-PARTITION windows — legitimate
    // only because their input is the customer-grain aggregate, not the
    // fact table. Pin that every Window in those plans sits ABOVE an
    // Aggregate (the grain reduction), so a refactor can't silently
    // move corpus-grain rows under a one-partition sort.
    Seq("q_rfm", "q_pareto").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.nonEmpty, s"$name should plan window ranks")
      windows.foreach { w =>
        val hasAggBelow = w.child.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.nonEmpty
        assert(hasAggBelow,
          s"$name plans a window over non-aggregated (fact-grain) input")
      }
    }
  }

  test("no query in the inventory emits a DECIMAL output column") {
    // STRICT invariant: DECIMAL cells serialize differently across the
    // correctness comparator's two read paths (proven in round 5 — four
    // value-identical rows hash-failed, all four DECIMAL-emitting, every
    // DOUBLE/BIGINT/STRING row green). Decimal stays the INTERNAL
    // accumulator type for exact money sums and overflow-safe checksums;
    // the emitted presentation cell must be double/long/string.
    import org.apache.spark.sql.types._
    def decimals(dt: DataType, path: String): Seq[String] = dt match {
      case _: DecimalType     => Seq(path)
      case s: StructType      => s.fields.toSeq.flatMap(f => decimals(f.dataType, s"$path.${f.name}"))
      case a: ArrayType       => decimals(a.elementType, s"$path[]")
      case m: MapType         => decimals(m.keyType, s"$path.key") ++ decimals(m.valueType, s"$path.value")
      case _                  => Nil
    }
    val streaming = Set("st_events_hourly", "st_click_purchase_join")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!streaming(name)) {
        val hits = decimals(fn(spark, sf).schema, name)
        assert(hits.isEmpty, s"DECIMAL output columns are hash-unstable: $hits")
      }
    }
  }

  test("chunk dedup evaluates the tokenize regex once per document") {
    // strideSegments' caller contract: the split(regexp_replace(...))
    // projection must not collapse into the per-segment lambda (Catalyst
    // inlines aliases into lambdas — the re-evaluation trap of
    // shinglesFromTokens). The Generate boundary prevents it; this pins
    // that against future refactors and optimizer changes.
    val plan = formatted(functions.Dedup.chunkDedup(
      Tables.documents(spark, sf), chunkTokens = 10))
    val regexCount = "regexp_replace".r.findAllIn(plan).size
    assert(regexCount == 1,
      s"tokenize regex must appear exactly once, found $regexCount:\n$plan")
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // The 100 TB shape: a shuffle join of a huge fact against a
    // selectively-filtered dim. Catalyst's InjectRuntimeFilter builds a
    // bloom filter from the dim's join keys and pushes a might_contain
    // probe onto the FACT scan — fact rows that cannot match are dropped
    // before the shuffle, the difference between shuffling 100 TB and
    // shuffling the matching slice. On a real cluster the default
    // thresholds (creation side <= 10 MB, application side >= 10 GB) arm
    // this automatically; the test lowers the application-side floor so
    // the rule fires at fixture scale and pins that our plain
    // filter-dim-then-join shape qualifies — no hint, no rewrite.
    val conf = spark.conf
    val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    val root = java.nio.file.Files.createTempDirectory("bloomspec")
    try {
      conf.set(keys(0), "0")
      conf.set(keys(1), "-1") // force a shuffle join: broadcast would not need the bloom
      val dir = root.toString
      spark.range(0, 1000)
        .select(col("id").as("k"), (col("id") % 7).as("grp"))
        .write.mode("overwrite").parquet(s"$dir/dim")
      spark.range(0, 100000)
        .select((col("id") % 5000).as("k"), col("id").as("v"))
        .write.mode("overwrite").parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("grp") === 3)
      val fact = spark.read.parquet(s"$dir/fact")
      val plan = fact.join(dim, "k").queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"runtime bloom filter was not injected:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("AQE splits a skewed shuffle join at runtime") {
    // The other half of the skew story: Salting.twoPhaseAgg handles
    // aggregation skew STATICALLY; for join skew the engine's posture
    // is AQE's OptimizeSkewedJoin — at runtime, a sort-merge join
    // partition that dwarfs the median is split into slices, each
    // joined against a replicated copy of the other side, so one hot
    // key cannot serialize a 1000-executor stage behind one reducer.
    // The session config ships with skewJoin enabled; this pins that a
    // manufactured hot key actually triggers the rewrite (thresholds
    // lowered to fixture scale — on a cluster the defaults arm at
    // 256 MB partitions) rather than trusting the conf name.
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "-1") // broadcast would dodge the skew entirely
      conf.set(keys(1), "32k")
      conf.set(keys(2), "16k")
      // one hot key carrying ~200k rows vs a uniform 32-key tail
      val left = spark.range(0, 200000)
        .select(when(col("id") < 196800, lit(0L)).otherwise(col("id") % 32)
          .as("k"), col("id").as("v"))
      val right = spark.range(0, 33).select(col("id").as("k"),
        (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
      // collect() executes THIS DataFrame's queryExecution (count()
      // would build its own, leaving this plan isFinalPlan=false)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skewed"), // "AQEShuffleRead … skewed"
        s"OptimizeSkewedJoin did not fire on the hot partition:\n" +
          plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("winnow evaluates the normalize regex once per document") {
    // winnow references its normalized-text column from both the
    // sequence bound and the per-position hash lambda; if Catalyst
    // inlined the alias (the shinglesFromTokens trap), the regex text
    // would appear once per REFERENCE and execute once per k-gram
    // position. The Generate boundary + repartition barrier keep it to
    // one evaluation per document.
    val plan = formatted(functions.TextAnalysis.winnow(
      Tables.documents(spark, sf)))
    val regexCount = "regexp_replace".r.findAllIn(plan).size
    assert(regexCount <= 2,
      s"normalize regex must not inline into the k-gram lambda:\n$plan")
  }

  test("simhash pair generation plans one exchange and zero joins") {
    // the band frame carries the fingerprint and pairs come out of the
    // per-bucket kernel, so the whole pipeline is one repartition — no
    // relational join ever materializes the candidate stream (measured
    // 1.13e9 candidate rows for 4.7M pairs at 30×; the join machinery
    // WAS the wall, see Dedup.simhashPairs)
    val df = functions.Dedup.simhashPairs(
      Tables.documents(spark, sf).limit(200), maxDist = 8)
    df.collect()
    // count only the executed plan — the AQE toString repeats operators
    // in its "== Initial Plan ==" section
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
      .findAllIn(plan).size
    assert(joins == 0, s"expected zero joins, got $joins:\n$plan")
    // the fingerprint memo's InMemoryRelation prints its own cached
    // child plan (with the simhash aggregation's exchanges) — count
    // only the pair pipeline above the cache scan
    val outer = plan.split("InMemoryRelation").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(outer).size
    assert(exchanges == 1, s"expected one hash exchange, got $exchanges:\n$outer")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("IVF centroid assignment plans zero exchanges") {
    // The assignment must be a narrow projection over the corpus scan
    // (argmax fold over a centroid literal) — the cross×window form it
    // replaced shuffled a |corpus|·C-amplified frame, the one flagged
    // scale-killer at 100 TB.
    val e = Tables.embeddings(spark, sf)
    val centroids = e.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val assigned = functions.Similarity.assign(e, centroids)
    assigned.collect()
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment subplan must contain no Exchange:\n$plan")
    assert(!plan.contains("Window"), plan)
  }

  test("stored ANN index probe is a partition-pruned scan") {
    // The serving contract of writeIndex/searchIndex: a probe of nprobe
    // cells must LIST only nprobe partition directories — query cost
    // scales with nprobe/|cells| of the index, not its size.
    val e = Tables.embeddings(spark, sf)
    val cents = e.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val root = java.nio.file.Files.createTempDirectory("annidxplan")
    try {
      val dir = root.toString + "/idx"
      functions.Similarity.writeIndex(e, cents, dir)
      val out = functions.Similarity.searchIndex(
        spark, dir, cents, e.filter(col("vec_id") === 0), k = 10, nprobe = 4)
      out.collect()
      // walk through AQE wrappers AND materialized query-stage
      // boundaries (collect() alone stops at QueryStageExec leaves)
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p.flatMap {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scansOf(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            scansOf(q.plan)
          case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
          case _ => Nil
        }
      val scans = scansOf(out.queryExecution.executedPlan)
      assert(scans.nonEmpty, "expected a file scan over the stored index")
      val parts = scans.map(_.selectedPartitions.partitionCount)
      assert(parts.exists(_ == 4),
        s"probe must read exactly nprobe=4 partitions, read $parts")
      // filtered search: the metadata predicate must reach the scan as
      // a pushed parquet filter, not a post-scan Filter over decoded rows
      val filtered = functions.Similarity.searchIndex(
        spark, dir, cents, e.filter(col("vec_id") === 0), k = 10,
        nprobe = 4, pred = col("label") === 2)
      filtered.collect()
      val fScans = scansOf(filtered.queryExecution.executedPlan)
      val pushed = fScans.map(_.metadata.getOrElse("PushedFilters", ""))
      assert(pushed.exists(_.contains("EqualTo(label,2)")),
        s"label predicate not pushed to the index scan: $pushed")
    } finally {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("top-1-per-group rides WindowGroupLimit") {
    // rank = 1 over a window must pre-truncate every partition to its
    // local top row BEFORE the window shuffle (Spark's WindowGroupLimit
    // rewrite) — without it the full per-group frame sorts through the
    // window operator at corpus scale.
    val df = SparkEntry.queries("q_window_topk")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank=1 filter did not plan a WindowGroupLimit:\n$plan")
  }

  test("char entropy plans zero exchanges") {
    // The computation is per-document; it must run as one narrow
    // projection over the corpus scan. The explode-to-(doc,char)-grain
    // form it replaced shuffled ~1 row per input byte — at corpus scale
    // the exchange dominates the arithmetic by orders of magnitude.
    val df = functions.TextAnalysis.charEntropy(Tables.documents(spark, sf))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"charEntropy must contain no Exchange:\n$plan")
    assert(!plan.contains("Generate"),
      s"charEntropy must not explode to char grain:\n$plan")
  }

  test("PQ encoding plans zero exchanges") {
    // Same contract as the IVF assignment: the codebook is a plan
    // literal, encoding is a narrow projection over the corpus scan —
    // compressing a 100 TB embedding corpus must not shuffle it.
    val e = Tables.embeddings(spark, sf)
    val centroids = e.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val encoded = functions.Similarity.pqEncode(e, centroids, m = 8)
    encoded.collect()
    val plan = encoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"PQ encode subplan must contain no Exchange:\n$plan")
    assert(!plan.contains("Window"), plan)
  }

  test("approxQuantile tier path (reference A10 mechanism) still tiers") {
    val out = CustomerSalesReport.build(
      Entities.customers(spark, sf), Entities.products(spark, sf),
      Entities.sales(spark, sf),
      SupplierPerformance.build(Entities.suppliers(spark, sf),
        Entities.products(spark, sf), Entities.sales(spark, sf),
        RunClock.fixed),
      RunClock.fixed, CustomerSalesReport.TierMode.DriverApprox)
    val tiers = out.select("LOYALTY_TIER").distinct()
      .collect().map(_.getString(0)).toSet
    assert(tiers.subsetOf(Set("GOLD", "SILVER", "BRONZE")) && tiers.size >= 2)
  }

  test("scale-mode CSR plan has no exact-percentile aggregate") {
    // Default TierMode.Approx must plan percentile_approx (bounded-memory
    // GK sketch); an exact percentile aggregate buffers every value of a
    // group in one buffer — the 10⁸-customer memory cliff.
    val out = CustomerSalesReport.build(
      Entities.customers(spark, sf), Entities.products(spark, sf),
      Entities.sales(spark, sf),
      SupplierPerformance.build(Entities.suppliers(spark, sf),
        Entities.products(spark, sf), Entities.sales(spark, sf),
        RunClock.fixed),
      RunClock.fixed)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("percentile_approx"), plan.take(2000))
    assert(!"""(?<!_)percentile\(""".r.findFirstIn(plan).isDefined,
      "exact percentile aggregate found in scale-mode plan")
    val tiers = out.select("LOYALTY_TIER").distinct()
      .collect().map(_.getString(0)).toSet
    assert(tiers.subsetOf(Set("GOLD", "SILVER", "BRONZE")) && tiers.size >= 2)
  }
}
