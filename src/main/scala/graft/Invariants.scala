package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-only invariant gate for scale factors past any local DuckDB
  * twin (VERDICT r10 #7): at 100× (~6 GB parquet) no oracle can run on
  * this box, but the heaviest operators' OUTPUTS have engine-internal
  * invariants that a wrong-at-scale implementation breaks — count
  * conservation, label minimality, pair canonicalization, rank
  * contiguity, monotone tier boundaries. Each check is a Spark
  * aggregation over the operator's own output (no second engine), so
  * the gate runs wherever the engine runs.
  *
  *   tools/runmain.sh graft.Invariants <sfDir>
  *
  * Prints one PASS/FAIL line per invariant; exits nonzero on any FAIL.
  */
object Invariants {
  private var failures = 0

  private def check(name: String)(cond: => Boolean): Unit = {
    val t0 = System.nanoTime()
    val ok = try cond catch {
      case e: Throwable =>
        println(s"[inv] ERR  $name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
        failures += 1
        return
    }
    val el = (System.nanoTime() - t0) / 1e9
    if (!ok) failures += 1
    println(f"[inv] ${if (ok) "PASS" else "FAIL"} $name%-46s $el%7.1f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(
      appName = "graft-invariants", master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = sources.Tables.documents(spark, sfDir)
    val nDocs = docs.count()

    // ── near-dup closure: every doc labeled exactly once; the label is
    //    a member of its own cluster AND its minimum (the CC min-label
    //    contract); sizes sum back to the corpus ───────────────────────
    val clusters = SparkEntry.queries("dd_reweight")(spark, sfDir).cache()
    check("dd_reweight: one row per doc, total = corpus")(
      clusters.count() == nDocs &&
        clusters.select("doc_id").distinct().count() == nDocs)
    check("dd_reweight: label minimality (label = min member)")(
      clusters.groupBy("cluster_id").agg(min("doc_id").as("mn"))
        .filter(col("cluster_id") =!= col("mn")).isEmpty)
    check("dd_reweight: cluster_size consistent with membership")(
      clusters.groupBy("cluster_id", "cluster_size")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") =!= col("cluster_size")).isEmpty)
    clusters.unpersist()

    // ── simhash pairs: canonical (a < b), no duplicate pairs, hamming
    //    bound holds, and hamming RECOMPUTES from the fingerprints ─────
    val fps = functions.Dedup.simhash(docs).cache()
    val pairs = SparkEntry.queries("dd_simhash_pairs")(spark, sfDir).cache()
    check("dd_simhash_pairs: canonical + deduped")(
      pairs.filter(col("doc_a") >= col("doc_b")).isEmpty &&
        pairs.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).isEmpty)
    check("dd_simhash_pairs: hamming <= 8 and recomputes from fps")(
      pairs
        .join(fps.toDF("doc_a", "sh_a"), "doc_a")
        .join(fps.toDF("doc_b", "sh_b"), "doc_b")
        .filter(col("hamming") > 8 ||
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) =!= col("hamming"))
        .isEmpty)
    pairs.unpersist(); fps.unpersist()

    // ── kNN graph: ranks are 1..k contiguous per src, sims monotone
    //    non-increasing along rank, no self-edges ──────────────────────
    val graph = SparkEntry.queries("ann_knn_graph")(spark, sfDir).cache()
    check("ann_knn_graph: no self-edges, rnk within 1..5")(
      graph.filter(col("src") === col("dst") ||
        col("rnk") < 1 || col("rnk") > 5).isEmpty)
    check("ann_knn_graph: rnk contiguous and sim monotone per src")({
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy("rnk")
      graph.withColumn("prn", lag("rnk", 1).over(w))
        .withColumn("psim", lag("sim", 1).over(w))
        .filter(
          (col("prn").isNull && col("rnk") =!= 1) ||
          (col("prn").isNotNull && col("rnk") =!= col("prn") + 1) ||
          (col("psim").isNotNull && col("sim") > col("psim")))
        .isEmpty
    })
    graph.unpersist()

    // ── pagerank: mass conservation (sum ≈ 1 within rounding), all
    //    positive, one row per graph node ───────────────────────────────
    val pr = SparkEntry.queries("graph_pagerank")(spark, sfDir).cache()
    check("graph_pagerank: positive, mass ~ 1")({
      val total = pr.agg(sum(col("pr").cast(
        org.apache.spark.sql.types.DecimalType(38, 12)))).head.getDecimal(0)
      pr.filter(col("pr") <= 0).isEmpty &&
        math.abs(total.doubleValue - 1.0) < 1e-4
    })
    check("graph_pagerank: one row per node")(
      pr.groupBy("node").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).isEmpty)
    pr.unpersist()

    // ── exact dedup group contract: group sizes conserve the corpus;
    //    keepers are distinct (one group per fingerprint) ──────────────
    val exact = functions.Dedup.exact(docs).cache()
    check("dd_exact: group sizes conserve the corpus; keepers distinct")({
      val total = exact.agg(sum("n_docs")).head.getLong(0)
      total == nDocs &&
        exact.select("keeper_doc_id").distinct().count() == exact.count()
    })
    exact.unpersist()

    // ── tier boundaries: quantile loyalty tiers partition customers by
    //    TOTAL spend — per-customer totals grouped by tier must form
    //    non-overlapping, ordered ranges ─────────────────────────────────
    val csr = SparkEntry.queries("m_customer_sales_report")(spark, sfDir)
      .groupBy(col("CUSTOMER_ID"), col("LOYALTY_TIER").as("tier"))
      .agg(sum(col("SALE_AMOUNT").cast(
        org.apache.spark.sql.types.DecimalType(38, 6))).as("spend"))
      .cache()
    check("m_customer_sales_report: loyalty-tier spend ranges ordered")({
      val ranges = csr.groupBy("tier")
        .agg(min(col("spend").cast("double")).as("lo"),
          max(col("spend").cast("double")).as("hi"))
        .collect().map(x => (x.getDouble(1), x.getDouble(2)))
        .sortBy(_._1)
      ranges.sliding(2).forall {
        case Array((_, hiPrev), (loNext, _)) => hiPrev <= loNext
        case _ => true
      }
    })
    csr.unpersist()

    // ── events stream: session windows cover every user with events,
    //    n_events conserve the event count ─────────────────────────────
    val events = sources.Tables.events(spark, sfDir)
    val sess = streaming.EventsStream.sessionWindowBatch(events).cache()
    check("sessions: per-user event counts conserved")({
      val a = sess.groupBy("user_id").agg(sum("n_events").as("n"))
      val b = events.groupBy("user_id").agg(count(lit(1)).as("m"))
      a.join(b, "user_id").filter(col("n") =!= col("m")).isEmpty &&
        a.count() == b.count()
    })
    sess.unpersist()

    // ── SCD2 merge: validity-interval discipline per business key —
    //    exactly one current row, open iff current, and the successor
    //    chain closes each row exactly where the next begins (the
    //    family whose fixture key-collision only surfaced at 30×) ──────
    val scd = SparkEntry.queries("k5_scd2")(spark, sfDir).cache()
    check("k5_scd2: exactly one current row per key")(
      scd.groupBy("c_custkey")
        .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("ncur"))
        .filter(col("ncur") =!= 1L).isEmpty)
    check("k5_scd2: open iff current; closed intervals well-formed")(
      scd.filter(
        (col("is_current") && col("valid_to").isNotNull) ||
          (!col("is_current") && (col("valid_to").isNull ||
            col("valid_from") >= col("valid_to")))).isEmpty)
    check("k5_scd2: successor chain — no overlap, no gap")({
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_custkey").orderBy("valid_from")
      scd.withColumn("next_from", lead("valid_from", 1).over(w))
        .filter(col("next_from").isNotNull &&
          !(col("valid_to") <=> col("next_from"))).isEmpty
    })
    scd.unpersist()

    // ── basket rules: canonical unique pairs, the min-support floor,
    //    count algebra (a pair can't co-occur more than either side
    //    occurs), and confidence ≡ n_pair/n_side at the 9-dp rounding ──
    val rules = SparkEntry.queries("q_assoc")(spark, sfDir).cache()
    check("q_assoc: canonical unique pairs, support floor")(
      rules.filter(col("part_a") >= col("part_b")).isEmpty &&
        rules.groupBy("part_a", "part_b").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).isEmpty &&
        rules.filter(col("n_pair") < 2).isEmpty)
    check("q_assoc: count algebra + confidence consistency")(
      rules.filter(col("n_pair") > col("n_a") ||
        col("n_pair") > col("n_b")).isEmpty &&
        rules.filter(abs(col("conf_ab") - col("n_pair").cast("double") /
          col("n_a").cast("double")) > 1e-8).isEmpty)
    rules.unpersist()

    println(s"[inv] ${if (failures == 0) "ALL PASS" else s"$failures FAILURES"}")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
