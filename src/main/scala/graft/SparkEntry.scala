package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.RunClock
import graft.marts._
import graft.sources.{Entities, OracleCtes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a pure function (SparkSession, sfDir) →
  * DataFrame; entries with an [[oracleSql]] twin are hash-compared against
  * DuckDB running that SQL over the same parquet tables. Results carry an
  * explicit ORDER BY on a unique key in both engines so the comparison is
  * row-order deterministic.
  */
object SparkEntry {
  private val clock = RunClock.fixed
  private val streamCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  // The tier-verification queries consume the customer-amounts frame
  // repeatedly (cutoff computation + verification aggregate); memoize
  // ONE cache()d frame per session, keyed by its sfDir. Keeping only the
  // last entry — unpersisting a superseded sfDir's frame on switch —
  // mirrors SqlLab.registerViews' discipline, so a long-lived session
  // iterating over scale factors cannot accumulate pinned executor
  // storage. Stopped sessions evicted before each lookup.
  private val csrAggMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]()

  private def csrAgg(s: SparkSession, d: String): DataFrame = {
    csrAggMemo.keySet.removeIf(k => k.sparkContext.isStopped)
    csrAggMemo.compute(s, (_, prev) =>
      Option(prev) match {
        case Some(hit @ (dir, _)) if dir == d => hit
        case stale =>
          stale.foreach(_._2.unpersist(blocking = false))
          (d, CustomerSalesReport.customerAmounts(
            Entities.customers(s, d), Entities.products(s, d),
            Entities.salesCached(s, d),
            SupplierPerformance.build(Entities.suppliers(s, d),
              Entities.products(s, d), Entities.salesCached(s, d), clock),
            clock).cache())
      })._2
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("m_supplier_performance")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.CoverageQueries.queries ++
      functions.TrainingQueries.queries ++
      sqllab.SqlLab.queries ++ baseQueries

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── mart pipelines (reference parity) ────────────────────────────
    "m_supplier_performance" -> ((s, d) =>
      SupplierPerformance.build(
        Entities.suppliers(s, d), Entities.products(s, d),
        Entities.salesCached(s, d), clock)
        .orderBy("SUPPLIER_ID")),
    "m_product_performance" -> ((s, d) =>
      ProductPerformance.build(
        Entities.products(s, d), Entities.salesCached(s, d), clock)
        .orderBy("PRODUCT_ID")),
    "m_customer_metrics" -> ((s, d) =>
      CustomerMetrics.build(
        Entities.customers(s, d), Entities.products(s, d),
        Entities.salesCached(s, d), clock)
        .orderBy("CUSTOMER_ID")),
    "m_customer_sales_report" -> ((s, d) =>
      CustomerSalesReport.build(
        Entities.customers(s, d), Entities.products(s, d),
        Entities.salesCached(s, d),
        SupplierPerformance.build(
          Entities.suppliers(s, d), Entities.products(s, d),
          Entities.salesCached(s, d), clock),
        clock,
        // oracle twin: DuckDB quantile_cont matches exact percentiles only
        CustomerSalesReport.TierMode.Exact)
        // sale_id is non-unique in the testdata (duplicate (orderkey,
        // linenumber) pairs), so total-order on value columns for the
        // row-deterministic oracle compare.
        .orderBy("SALE_ID", "CUSTOMER_ID", "PRODUCT_NAME", "QUANTITY",
          "PRICE", "SALE_AMOUNT")),
    // A10: the reference's tier mechanism verbatim — a driver-side
    // `approxQuantile(…, 0.01)` (Greenwald–Khanna sketch,
    // m_customer_sales_report_task.py:183-188). Approx cutoffs differ
    // between engines, so the oracle row checks the GK CONTRACT instead:
    // each returned cutoff's rank interval [lt+1, le] must intersect
    // [(q−ε)N, (q+ε)N]. The booleans hash-compare against literal TRUEs
    // — a boundary-tolerant oracle for an approximate operator.
    "m_csr_approx_tiers" -> ((s, d) => {
      // memoized + cached: the approxQuantile ACTION and the verification
      // aggregate both consume it (customer-grain, dim-sized — not the fact)
      val agg = csrAgg(s, d)
      val cuts = agg.stat.approxQuantile("agg_sales_amount",
        Array(0.5, 0.8), 0.01)
      def ok(q: Double) = {
        val pct = (q * 100).toInt
        val eps = lit(0.01) * col("n")
        val qn = lit(q) * col("n")
        (col(s"lt_$pct") - eps <= qn) && (qn <= col(s"le_$pct") + eps)
      }
      agg.agg(
        count(lit(1)).as("n"),
        sum(when(col("agg_sales_amount") < cuts(0), 1L).otherwise(0L)).as("lt_50"),
        sum(when(col("agg_sales_amount") <= cuts(0), 1L).otherwise(0L)).as("le_50"),
        sum(when(col("agg_sales_amount") < cuts(1), 1L).otherwise(0L)).as("lt_80"),
        sum(when(col("agg_sales_amount") <= cuts(1), 1L).otherwise(0L)).as("le_80"))
        .select(explode(array(
          struct(lit("gold").as("tier"), ok(0.8).as("within_bound")),
          struct(lit("silver").as("tier"), ok(0.5).as("within_bound"))))
          .as("t"))
        .select(col("t.tier").as("tier"), col("t.within_bound").as("within_bound"))
        .orderBy("tier")
    }),
    // A10 value-audit of the SHIPPED default: TierMode.Approx derives its
    // cutoffs from in-plan `percentile_approx(…, accuracy=100)`
    // (ApproximatePercentile's contract: rank error ≤ N/accuracy = ±1%).
    // This row recomputes those exact in-plan cutoffs (same function,
    // same accuracy, same aggregate CustomerSalesReport.build consumes)
    // and verifies each honors its rank interval — so the default tier
    // path is value-audited, not just plan-shape-audited
    // (m_csr_approx_tiers covers the reference's driver-side GK
    // mechanism; this row covers the engine's distributed default).
    "m_csr_inplan_tiers" -> ((s, d) => {
      val agg = csrAgg(s, d)
      val cuts = agg.agg(
        percentile_approx(col("agg_sales_amount"), lit(0.5), lit(100))
          .as("c50"),
        percentile_approx(col("agg_sales_amount"), lit(0.8), lit(100))
          .as("c80"))
      def ok(q: Double) = {
        val pct = (q * 100).toInt
        val eps = lit(0.01) * col("n")
        val qn = lit(q) * col("n")
        (col(s"lt_$pct") - eps <= qn) && (qn <= col(s"le_$pct") + eps)
      }
      core.Scalars.crossBroadcast(agg, cuts)
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("agg_sales_amount") < col("c50"), 1L).otherwise(0L)).as("lt_50"),
          sum(when(col("agg_sales_amount") <= col("c50"), 1L).otherwise(0L)).as("le_50"),
          sum(when(col("agg_sales_amount") < col("c80"), 1L).otherwise(0L)).as("lt_80"),
          sum(when(col("agg_sales_amount") <= col("c80"), 1L).otherwise(0L)).as("le_80"))
        .select(explode(array(
          struct(lit("gold").as("tier"), ok(0.8).as("within_bound")),
          struct(lit("silver").as("tier"), ok(0.5).as("within_bound"))))
          .as("t"))
        .select(col("t.tier").as("tier"), col("t.within_bound").as("within_bound"))
        .orderBy("tier")
    }),

    // ── end-to-end backfill replay (adhoc_reload_metamorph_pipeline.py:
    //    27-64): 5 sequential daily runs ending at the pinned clock, each
    //    stamping its own DAY_DT, through the REAL layered pipeline
    //    (ingest dup gates → marts → MERGE → partitioned legacy writes).
    //    The oracle reads back the accumulated supplier_performance
    //    history — 5 DAY_DT partitions — and hash-compares against a
    //    DuckDB twin that unions 5 parameterized single-day builds.
    //    Excluded from Bench (it is an ETL replay, not a query; see
    //    Bench.excluded).
    "pipeline_backfill" -> ((s, d) => {
      val root = graft.core.Scratch.fastTempDirectory("graft_backfill",
        (graft.core.Scratch.tableBytes(d, "orders")
          + graft.core.Scratch.tableBytes(d, "lineitem")) * 5)
      val catalog = pipeline.LayerCatalog(root.toString)
      pipeline.MetaMorphPipeline.backfill(s, d, catalog, clock, days = 5,
        idempotent = true)
      // mart-history-sized result: pin it, drop the scratch catalog
      // (repeated gate runs must not accumulate layered copies on disk)
      core.Scratch.materializeAndDelete(
        s.read.parquet(catalog.legacy("supplier_performance"))
          .select(col("DAY_DT").cast("date").as("DAY_DT"), col("SUPPLIER_ID"),
            col("SUPPLIER_NAME"), col("TOTAL_REVENUE"),
            col("TOTAL_PRODUCTS_SOLD"), col("TOTAL_STOCK_SOLD"),
            col("TOP_SELLING_PRODUCT"))
          .orderBy("DAY_DT", "SUPPLIER_ID"),
        root)
    }),

    // ── streaming (engine extension; batch twin = oracle) ────────────
    "st_events_hourly" -> ((s, d) =>
      streaming.EventsStream.hourlyAggStreaming(s, d,
        s"graft_hourly_${streamCounter.incrementAndGet()}")
        .orderBy("hour_start", "event_type")),
    "q_sessionize" -> ((s, d) =>
      streaming.EventsStream.sessionizeBatch(sources.Tables.events(s, d))
        .orderBy("user_id", "session_idx")),
    // sliding 1h/15min windowed counts+sums (each event in 4 windows)
    "q_sliding_window" -> ((s, d) =>
      streaming.EventsStream.slidingAggBatch(sources.Tables.events(s, d))
        .orderBy("window_start", "event_type")),
    // the same overlapping windows under readStream + watermark: the
    // state store holds one row per open (window, type); streaming
    // hash-equals batch (and shares its oracle) on a complete source
    "st_sliding" -> ((s, d) =>
      streaming.EventsStream.slidingAggStreaming(s, d, "graft_sliding")
        .orderBy("window_start", "event_type")),
    // ordered funnel: users reaching view → click → purchase, each
    // stage at-or-after the first reach of the previous one
    "q_funnel" -> ((s, d) =>
      operators.Analytics.funnel(sources.Tables.events(s, d),
        Seq("view", "click", "purchase"))),
    // weekly cohort retention over first-event cohorts
    "q_cohort" -> ((s, d) =>
      operators.Analytics.cohortRetention(sources.Tables.events(s, d))),
    // MI(event_type; value band): /64 bands are FP-exact (power-of-two
    // divisor), so the binning has no cross-engine boundary risk
    "q_mutual_info" -> ((s, d) =>
      operators.Analytics.mutualInformation(
        sources.Tables.events(s, d)
          .withColumn("value_band",
            least(floor(col("value") / 64), lit(7)).cast("long")),
        "event_type", "value_band")),
    // first-order Markov transitions over per-user event sequences
    "q_transitions" -> ((s, d) =>
      operators.Analytics.transitionMatrix(sources.Tables.events(s, d))),
    // per-mode OLS trend over the same daily units series q_ewma
    // smooths: closed form over exact BIGINT/DECIMAL moments
    "q_regression" -> ((s, d) =>
      operators.Analytics.dailySalesTrend(sources.Entities.salesCached(s, d))),
    // chi-squared independence + Cramér's V over q_mutual_info's
    // contingency table (same /64 FP-exact banding)
    "q_chi2" -> ((s, d) =>
      operators.Analytics.chiSquare(
        sources.Tables.events(s, d)
          .withColumn("value_band",
            least(floor(col("value") / 64), lit(7)).cast("long")),
        "event_type", "value_band")),
    // recency-decayed per-user value: 7-day half-life buckets, so every
    // decay weight is a power of two (exact division — no libm pow)
    "q_decay" -> ((s, d) =>
      operators.Analytics.recencyScore(sources.Tables.events(s, d),
        "user_id", "ts", "value",
        java.sql.Date.valueOf("2024-02-01"), 7)),
    // co-purchase association rules over order baskets (support /
    // confidence / lift, basket-size-capped candidate generation)
    "q_assoc" -> ((s, d) =>
      operators.Analytics.basketRules(sources.Tables.lineitem(s, d))),
    // two-proportion z-test over a parity A/B split (goal = purchase)
    "q_abtest" -> ((s, d) =>
      operators.Analytics.abTest(sources.Tables.events(s, d),
        col("user_id") % 2 === 0)),
    // Laplace-noised count release (deterministic md5 draws, b = 2)
    "q_dp_noise" -> ((s, d) =>
      operators.Analytics.laplaceNoisedCounts(
        sources.Tables.customer(s, d),
        Seq("c_mktsegment", "c_nationkey"), b = 2.0)),
    // Benford first-digit audit over order totals (string-exact digit)
    "q_benford" -> ((s, d) =>
      operators.Analytics.benford(sources.Tables.orders(s, d),
        "o_totalprice")),
    // RFM quintile segmentation over orders (tie-broken ntile orders)
    "q_rfm" -> ((s, d) =>
      operators.Analytics.rfm(sources.Tables.orders(s, d),
        java.sql.Date.valueOf("2001-09-01"))),
    // Pareto/ABC revenue concentration + Gini (decimal-exact cumsums)
    "q_pareto" -> ((s, d) =>
      operators.Analytics.paretoAbc(sources.Tables.orders(s, d))),
    // Holt's linear smoothing (level+trend) over the q_ewma daily series
    "q_holt" -> ((s, d) =>
      operators.Analytics.dailySalesHolt(sources.Entities.salesCached(s, d))),
    // one-sided CUSUM drift localization over the same daily series
    "q_cusum" -> ((s, d) =>
      operators.Analytics.dailySalesCusum(sources.Entities.salesCached(s, d))),
    // day-of-week seasonality profile (Monday-based on both engines)
    "q_seasonal" -> ((s, d) =>
      operators.Analytics.dailySalesSeasonality(
        sources.Entities.salesCached(s, d))),
    // running EWMA over per-mode daily revenue: the e=αx+(1−α)e
    // recursion as a per-key prefix fold — bit-identical doubles on
    // both engines (no pow(), no FP reassociation)
    "q_ewma" -> ((s, d) =>
      operators.Analytics.dailySalesEwma(sources.Entities.salesCached(s, d))),
    // EWMA-forecast anomaly flags: per-mode daily units z-scored
    // against the one-step forecast residual deviation, |r| > 3σ
    "q_anomaly" -> ((s, d) =>
      operators.Analytics.dailySalesAnomaly(sources.Entities.salesCached(s, d))),
    // streaming CDC apply: three update waves foreachBatch-MERGEd into
    // a stored dimension; stream-order semantics (last wave wins)
    "st_upsert" -> ((s, d) =>
      streaming.EventsStream.streamingUpsertReplay(s, d)
        .orderBy("user_id")),
    // the native session_window OPERATOR (SessionWindowing plan node);
    // exact-gap spacing merges (end-inclusive windows, spec-pinned)
    "q_session_window" -> ((s, d) =>
      streaming.EventsStream.sessionWindowBatch(sources.Tables.events(s, d))
        .orderBy("user_id", "session_start")),
    // the same session_window agg under readStream + watermark (state =
    // one row per open session); complete source ⇒ hash-equals batch
    "st_session" -> ((s, d) =>
      streaming.EventsStream.sessionWindowStreaming(s, d,
        s"graft_session_${streamCounter.incrementAndGet()}")
        .orderBy("user_id", "session_start")),
    // watermarked stream-stream interval join; the oracle is the batch
    // semantics (DuckDB) — on a fully-available source the watermark
    // drops nothing, so streaming == batch
    "st_click_purchase_join" -> ((s, d) =>
      streaming.EventsStream.clickPurchaseStreaming(s, d,
        s"graft_cpjoin_${streamCounter.incrementAndGet()}")
        .orderBy("click_id", "purchase_id")),
    // LEFT-OUTER stream-stream interval join: matched rows == the inner
    // join; unmatched clicks null-pad once the watermark passes their
    // match window (state EVICTION, the semantics the inner join never
    // exercises). Oracle = batch left join with the null-pad set gated
    // by the empirically-pinned terminal-watermark predicate.
    "st_left_join" -> ((s, d) =>
      streaming.EventsStream.clickPurchaseLeftStreaming(s, d,
        s"graft_cpleft_${streamCounter.incrementAndGet()}")
        .orderBy("click_id", "purchase_id")),
    // CHAINED stateful aggregation (Spark 3.4+ multi-stateful-operator):
    // hourly window agg feeding a daily rollup in ONE streaming query;
    // emitted set == complete days gated on day_end <= terminal
    // watermark (ProfChained pins stream ≡ batch-gated exactly)
    "st_chained" -> ((s, d) =>
      streaming.EventsStream.dailyOfHourlyStreaming(s, d,
        s"graft_chained_${streamCounter.incrementAndGet()}")
        .orderBy("day_start", "event_type")),
    // schema evolution across corpus waves: wave 1 written with the
    // original column set, wave 2 with a column the schema grew
    // mid-corpus; a mergeSchema read serves the union with NULLs where
    // the old wave predates the column — the drift case every
    // long-lived 100 TB store hits (an ETL replay; Bench-excluded)
    "src_schema_evolution" -> ((s, d) => {
      val root = graft.core.Scratch.fastTempDirectory("graft_schevo",
        graft.core.Scratch.tableBytes(d, "orders"))
      val dest = root.resolve("t").toString
      val o = sources.Tables.orders(s, d)
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("append").parquet(dest)
      o.filter(col("o_orderkey") % 2 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderpriority"))
        .write.mode("append").parquet(dest)
      core.Scratch.materializeAndDelete(
        s.read.option("mergeSchema", "true").parquet(dest)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").cast("double").as("price"),
            col("o_orderpriority"))
          .orderBy("o_orderkey"),
        root)
    }),
    // ARBITRARY stateful processing with EVENT-TIME TIMEOUT
    // (flatMapGroupsWithState + EventTimeTimeout): per-user sessions
    // closed by a successor gap emit in-line ('gap'); sessions with no
    // successor emit when the watermark passes last+gap ('timeout');
    // still-open sessions are withheld. Oracle = batch sessionization
    // gated by the ProfAbandon-pinned terminal-watermark predicate.
    "st_abandoned" -> ((s, d) =>
      streaming.EventsStream.abandonedStreaming(s, d,
        s"graft_abandon_${streamCounter.incrementAndGet()}")
        .orderBy("user_id", "session_start")),
    // streaming exact dedup (dropDuplicatesWithinWatermark — bounded
    // state): surviving fingerprint set must equal batch DISTINCT
    "st_dedup" -> ((s, d) =>
      streaming.EventsStream.dedupStreamReplay(s, d,
        s"graft_stdedup_${streamCounter.incrementAndGet()}")
        .orderBy("fp")),
    // stream-static enrichment: event stream left-joined to a selective
    // static customer dim (stateless — no state store, no watermark);
    // batch join semantics are the oracle
    "st_enrich" -> ((s, d) =>
      streaming.EventsStream.enrichStreaming(s, d,
        s"graft_enrich_${streamCounter.incrementAndGet()}")
        .orderBy("event_id")),
    // dirty-drop ingestion: a CSV wave with three injected
    // STRUCTURALLY malformed lines (short row, extra column, stray
    // text) — DROPMALFORMED serves the clean aggregate, the PERMISSIVE
    // line count attributes exactly the corrupt remainder. Cell-level
    // type drift is deliberately NOT injected here: it nulls the cell
    // rather than dropping the row (Ingest scaladoc + spec). ETL
    // replay, Bench-excluded.
    "src_badrecords" -> ((s, d) => {
      val sales = sources.Entities.salesCached(s, d)
        .filter(col("sale_id") % 97 === 0)
      val root = graft.core.Scratch.fastTempDirectory("graft_badcsv")
      val stage = root.resolve("stage")
      sales.coalesce(1).write.option("header", "true")
        .mode("overwrite").csv(stage.toString)
      val inDir = root.resolve("in")
      java.nio.file.Files.createDirectories(inDir)
      val csv = inDir.resolve("sales.csv")
      core.Scratch.moveSinglePart(stage, ".csv", csv)
      java.nio.file.Files.writeString(csv,
        "1,2\n" +                                              // short row
          "1,2,3,2020-01-01,5,0.1,0.2,a,b,EXTRA\n" +           // extra col
          "stray text without any commas\n",                   // garbage
        java.nio.file.StandardOpenOption.APPEND)
      val clean = sources.Ingest.readCsvDropMalformed(
        s, csv.toString, sales.schema)
      val everything = sources.Ingest.readCsv(s, csv.toString, sales.schema)
      val g = clean.groupBy("payment_mode")
        .agg(count(lit(1)).as("n_sales"),
          sum("quantity").cast("long").as("total_qty"))
      val t = clean.agg(count(lit(1)).as("n_clean"))
      val tl = everything.agg(count(lit(1)).as("n_lines"))
      core.Scratch.materializeAndDelete(
        core.Scalars.crossBroadcast(core.Scalars.crossBroadcast(g, t), tl)
          .select(col("payment_mode"), col("n_sales"), col("total_qty"),
            col("n_clean"), col("n_lines"),
            (col("n_lines") - col("n_clean")).as("n_corrupt"))
          .orderBy("payment_mode"),
        root)
    }),
    // checkpoint-restart exactly-once: two query incarnations over one
    // checkpoint + parquet sink; hash-equality vs the batch derivation
    // proves no duplicate and no loss across the restart
    "st_restart" -> ((s, d) =>
      streaming.EventsStream.restartReplay(s, d)),
    // watermark NEGATIVE path: a weeks-late wave must be dropped by the
    // stateful agg, and append finalizes exactly hour_end < watermark
    "st_late_drop" -> ((s, d) =>
      streaming.EventsStream.lateDropReplay(s, d,
        s"graft_late_${streamCounter.incrementAndGet()}")
        .orderBy("hour_start", "event_type")),
    // CSV-drop ingest replayed against a real drop directory (two of the
    // three files appear only mid-stream); batch sales derivation is the
    // oracle. sale_id is non-unique → full-row ORDER BY for determinism.
    "st_csv_drop" -> ((s, d) =>
      streaming.EventsStream.csvDropReplay(s, d,
        s"graft_csvdrop_${streamCounter.incrementAndGet()}")
        .orderBy("sale_id", "customer_id", "product_id", "sale_date",
          "quantity", "discount", "shipping_cost", "order_status",
          "payment_mode")),

    // ORC round-trip: the parquet orders table written through the ORC
    // sink, scanned back, and aggregated — the result must be
    // indistinguishable from querying the parquet original (the oracle
    // runs on the parquet table). Money through the decimal pattern.
    "src_orc_roundtrip" -> ((s, d) => {
      val root = graft.core.Scratch.fastTempDirectory("graft_orc",
        graft.core.Scratch.tableBytes(d, "orders") * 2)
      sources.Ingest.writeOrc(sources.Tables.orders(s, d), root.toString)
      val agg = sources.Ingest.readOrc(s, root.toString)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          core.Money.round2(core.Money.moneySum(col("o_totalprice")))
            .as("total_price"))
        .orderBy("o_orderpriority", "o_orderstatus")
      core.Scratch.materializeAndDelete(agg, root)
    }),

    // JSON-lines interchange round trip: schema re-applied on read so
    // dates/integrals survive exactly; same invisibility contract (and
    // oracle) as the ORC twin — the layout must not change the answer
    "src_json_roundtrip" -> ((s, d) => {
      val root = graft.core.Scratch.fastTempDirectory("graft_json",
        graft.core.Scratch.tableBytes(d, "orders") * 6)
      val orders = sources.Tables.orders(s, d)
      sources.Ingest.writeJsonLines(orders, root.toString)
      val agg = sources.Ingest.readJsonLines(s, root.toString, orders.schema)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          core.Money.round2(core.Money.moneySum(col("o_totalprice")))
            .as("total_price"))
        .orderBy("o_orderpriority", "o_orderstatus")
      core.Scratch.materializeAndDelete(agg, root)
    }),

    // ── correlated subqueries through the SQL front door (Catalyst
    //    decorrelates to a join; identical SQL runs on both engines) ───
    "q_correlated_subquery" -> ((s, d) => {
      sources.Tables.registerAll(s, d)
      s.sql(correlatedSql)
    }),
    // recursive CTE month series (identical text on both engines)
    "sql_recursive_months" -> ((s, d) => {
      sources.Tables.registerAll(s, d)
      s.sql(recursiveMonthsSql)
    }),
    // KMV/Theta distinct-overlap sketch: exact vs estimated
    // union/intersection of per-type active-user audiences; the DuckDB
    // twin re-derives the identical sketch relationally
    "q_kmv_overlap" -> ((s, d) =>
      functions.KmvOverlap.audienceOverlap(sources.Tables.events(s, d))
        .orderBy("type_a", "type_b")),

    // ── range join: orders falling inside 14-day promo windows drawn
    //    from every 100th order (banded bucketing, no nested loop).
    //    INTERVAL-GRAIN aggregate result: both join sides scale
    //    linearly with SF over a fixed date span, so the raw PAIR set
    //    is quadratic in SF (14k rows at sf0.01 → 1.26B at sf3 →
    //    ~14B/200 GB at sf10, where materializing it filled the disk —
    //    the r13 widened 100× gate caught exactly this). The pairs now
    //    stream through the banded join into a partial-aggregating
    //    hash agg (count + min/max/sum of the point keys per interval —
    //    an injective-in-practice checksum of the pair set), so the
    //    shuffle carries interval-grain partials at every SF while the
    //    join semantics stay fully pinned against the oracle. ─────────
    "q_range_join" -> ((s, d) => {
      val o = sources.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
      val points = o.select(col("o_orderkey").as("point_order"),
        datediff(col("od"), lit("1970-01-01").cast("date")).as("p_epoch"))
      val intervals = o.filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("interval_id"),
          datediff(col("od"), lit("1970-01-01").cast("date")).as("s_epoch"))
        .withColumn("e_epoch", col("s_epoch") + 14)
      // ssq_mod: second-moment-mod-p checksum — count+min/max/sum alone
      // admit a compensating-double-error cancellation (two wrong pairs
      // whose keys sum equal); adding Σ (k mod p)² mod p closes that
      // class with pure integer arithmetic both engines compute
      // identically (mod BEFORE squaring keeps every term < p² < 2⁶³
      // at any orderkey magnitude — no overflow at any SF)
      val P = lit(1000000007L)
      // r14: every aggregate here is associative-commutative over
      // disjoint point groups, so the pair-enumerating banded join +
      // groupBy (O(SF²) candidates for these two densifying sides —
      // 7.8 s at sf3, 47.7 s at sf10) collapses to the day-grain
      // partial-aggregate form: points pre-aggregate to ≤ span-days
      // partial rows at ANY SF, intervals explode to their 15 covered
      // days, and the combine sums/min/maxes ≤ 15 partials per
      // interval. Long/integer arithmetic throughout ⇒ bit-identical
      // output (RangeJoinSpec pins equivalence to the pair form).
      operators.RangeJoin.aggregatePointsByInterval(points, intervals,
        "p_epoch", "s_epoch", "e_epoch", "interval_id",
        partials = Seq(count(lit(1)).as("pc"),
          min("point_order").as("pmin"), max("point_order").as("pmax"),
          sum("point_order").as("psum"),
          sum((col("point_order") % P) * (col("point_order") % P) % P)
            .as("pssq")),
        combines = Seq(coalesce(sum("pc"), lit(0L)).as("n_orders"),
          min("pmin").as("first_order"), max("pmax").as("last_order"),
          sum("psum").as("sum_orders"), sum("pssq").as("ssq_mod")))
        .orderBy("interval_id")
    }),

    // ── as-of join: latest prior purchase per click (Spark lacks the
    //    operator; graft composes it scalably — operators/AsOfJoin) ────
    "q_asof_join" -> ((s, d) => {
      val ev = sources.Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max("value").as("purchase_value"))
      operators.AsOfJoin.asof(clicks, purchases, "user_id", "ts", "ts",
        Map("purchase_value" -> "last_purchase_value"))
        .orderBy("event_id")
    }),

    // ── window frames: lag/lead, running sums, rank family (the
    //    reference only ever uses bare row_number — SURVEY §2.6) ───────
    // the distribution-rank window family (§2.6 width): ntile buckets,
    // percent_rank, cume_dist over a tie-broken total order — the
    // divisions are exact small-integer→double, bit-stable both engines
    "q_rank_family" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      sources.Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .filter(col("o_orderkey") % 50 === 0)
        .orderBy("o_orderpriority", "o_orderkey")
    }),
    // explicit GROUPING SETS with grouping() indicators — the general
    // form cube/rollup specialize; same SQL text runs on both engines
    "q_grouping_sets" -> ((s, d) => {
      sources.Entities.salesCached(s, d).createOrReplaceTempView("sales_gs")
      s.sql(groupingSetsSql("sales_gs"))
    }),
    "q_window_frames" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = sources.Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("od"),
          col("o_totalprice"))
      val w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
      o.select(col("o_custkey"), col("o_orderkey"), col("od"),
          col("o_totalprice"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"),
          core.Money.round2(
            sum(col("o_totalprice").cast(core.Money.SumDec))
              .over(w.rowsBetween(Window.unboundedPreceding, 0)))
            .as("running_spend"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          row_number().over(w).as("rn"))
        .orderBy("o_custkey", "od", "o_orderkey")
    }),

    // ── grouping sets: rollup over region/nation (absent in reference,
    //    free from Spark/Catalyst — SURVEY §2.5 note) ──────────────────
    "q_rollup" -> ((s, d) => {
      import sources.Tables._
      val c = customer(s, d); val n = nation(s, d); val r = region(s, d)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          grouping_id().as("gid"))
        .orderBy(asc("gid"), asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    }),

    // ── grouping sets: CUBE over the lineitem flag/status pair — all
    //    four grouping combinations in one pass (one Expand, one agg) ──
    "q_cube" -> ((s, d) =>
      sources.Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          core.Money.round2(core.Money.moneySum(col("l_quantity")))
            .as("sum_qty"),
          grouping_id().as("gid"))
        .orderBy(asc("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))),

    // ── bucket-grain table checksum: the first stage of reconciling two
    //    100 TB tables without moving either (order-independent hash
    //    sums; only mismatching buckets need row-level Raptor). The
    //    accumulator stays DECIMAL(38,0) (overflow-safe at table scale);
    //    the EMITTED cell is its exact digit string — DECIMAL cells
    //    serialize differently across the comparator's read paths while
    //    strings are stable, and the digits lose nothing ───────────────
    "raptor_checksum" -> ((s, d) =>
      quality.Raptor.checksum(sources.Tables.orders(s, d), "o_orderkey",
        Seq("o_orderkey", "o_custkey", "o_orderstatus"),
        buckets = 16)
        .withColumn("checksum", col("checksum").cast("string"))
        .orderBy("bucket")),

    // ── pivot: payment-mode counts as columns ────────────────────────
    "q_pivot" -> ((s, d) =>
      sources.Entities.salesCached(s, d)
        .groupBy("order_status")
        .pivot("payment_mode",
          Seq("Credit Card", "Debit Card", "UPI", "Cash on Delivery"))
        .agg(count(lit(1)))
        .toDF("order_status", "credit_card", "debit_card", "upi", "cash_on_delivery")
        .na.fill(0)  // pivot yields NULL for absent combos; oracle yields 0
        .orderBy("order_status")),

    // ── unpivot (melt): the wide→long inverse of q_pivot, proving the
    //    round-trip — Dataset.unpivot plans a single Expand over the
    //    wide frame (no join, no shuffle beyond the source pivot's) ────
    "q_unpivot" -> ((s, d) => {
      val wide = sources.Entities.salesCached(s, d)
        .groupBy("order_status")
        .pivot("payment_mode",
          Seq("Credit Card", "Debit Card", "UPI", "Cash on Delivery"))
        .agg(count(lit(1)))
        .toDF("order_status", "credit_card", "debit_card", "upi", "cash_on_delivery")
        .na.fill(0)
      wide.unpivot(
        Array(col("order_status")),
        Array(col("credit_card"), col("debit_card"), col("upi"),
          col("cash_on_delivery")),
        "payment_mode", "n")
        .orderBy("order_status", "payment_mode")
    }),

    // ── §2.9 JSON functions over the events props payload ────────────
    "q_json_funcs" -> ((s, d) => {
      val ev = sources.Tables.events(s, d)
      ev.select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          max("k").as("max_k"))
        .orderBy("event_type")
    }),

    // ── operator coverage: aggregation (A2/A4, TPC-H Q1 shape) ───────
    "q1_agg" -> ((s, d) => {
      val li = sources.Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          core.Money.round2(core.Money.moneySum(
            col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ── headline: TPC-H Q3 shape (join + agg + top-k by revenue) ─────
    "q3_shipping_priority" -> ((s, d) => {
      import sources.Tables._
      val li = lineitem(s, d)
      val o = orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      li.filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi"
        )
        .groupBy(col("l_orderkey"))
        .agg(core.Money.round2(core.Money.moneySum(
          col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(20)
    }),

    // ── headline: TPC-H Q18 shape (agg + having semi-join back) ──────
    "q18_large_orders" -> ((s, d) => {
      import sources.Tables._
      val li = lineitem(s, d)
      val big = li.groupBy("l_orderkey")
        .agg(sum("l_quantity").as("total_qty"))
        .filter(col("total_qty") > 150)
      val o = orders(s, d)
      o.join(big, col("o_orderkey") === big("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("total_qty").cast("double").as("total_qty"))
        .orderBy(desc("total_qty"), asc("o_orderkey"))
        .limit(100)
    }),

    // ── operator coverage: multi-way join + agg (J15 shape) ──────────
    "q_revenue_by_region" -> ((s, d) => {
      import sources.Tables._
      val li = lineitem(s, d); val o = orders(s, d); val c = customer(s, d)
      val n = nation(s, d); val r = region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          core.Money.round2(core.Money.moneySum(
            col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy("r_name")
    }))

  def oracleSql: Map[String, String] = {
    val base = operators.CoverageQueries.oracles ++
      functions.TrainingQueries.oracles ++
      sqllab.SqlLab.oracles ++ baseOracles
    // the streaming sliding/session twins must equal their batch forms
    // bit-for-bit (fully-available source ⇒ the watermark drops
    // nothing), so each shares its batch row's oracle text verbatim
    base + ("st_sliding" -> base("q_sliding_window")) +
      ("st_session" -> base("q_session_window")) +
      // restart replay reconstitutes the full sales set exactly once —
      // the CSV-drop oracle text (full ordered sales) applies verbatim
      ("st_restart" -> base("st_csv_drop"))
  }

  /** GROUPING SETS text shared verbatim by the Spark entry and the
    * DuckDB twin (only the table name differs — Spark reads the temp
    * view, DuckDB the entity CTE).
    */
  private def groupingSetsSql(table: String): String =
    s"""SELECT coalesce(payment_mode, 'ALL') AS pm,
       |       coalesce(order_status, 'ALL') AS st,
       |       CAST(grouping(payment_mode) AS INT) AS g_pm,
       |       CAST(grouping(order_status) AS INT) AS g_st,
       |       count(*) AS n
       |FROM $table
       |GROUP BY GROUPING SETS ((payment_mode), (order_status), ())
       |ORDER BY g_pm, g_st, pm, st""".stripMargin

  /** Runs verbatim on Spark SQL and DuckDB: orders more than 2x their
    * customer's average, plus a NOT-EXISTS guard — correlated scalar and
    * existential subqueries in one statement.
    */
  /** Gap-filled monthly order counts via a RECURSIVE CTE (Spark 4's
    * `WITH RECURSIVE`, SPARK-24497) — the calendar-dimension idiom: the
    * recursion generates every month between the corpus' min and max
    * order month (carrying `hi` through the recursion instead of a
    * scalar subquery, which keeps the recursive term join-free), and a
    * left join zero-fills the months with no orders — the series shape
    * BI tools need (a plain GROUP BY silently skips empty months; the
    * corpus really has them, so the row proves the fill). One text, two
    * engines: DuckDB runs the IDENTICAL string. The recursion is
    * bounded by the month span (~100 rows), driver-free, and the only
    * corpus-scale work is the month-grain aggregate — recursion depth
    * never scales with data volume.
    */
  // Shipped form: `+1` stepping recursion. A binary range-split variant
  // (⌈log₂ N⌉ iterations) was built and A/B-measured on the hypothesis
  // that Spark schedules one job per recursive iteration — REJECTED:
  // ProfRecursive at sf0.1 measured step+1 at 7 jobs / 0.73 s vs
  // binary-split at 42 jobs / 1.10 s. Spark's UnionLoopExec executes a
  // simple-projection recursive term over a local anchor without
  // per-iteration scheduled jobs, while the split form's VALUES join in
  // the recursive term plans an exchange whose jobs stack PER iteration.
  // The rejected text lives in ProfRecursive for re-measurement.
  private val recursiveMonthsSql: String =
    """WITH RECURSIVE b AS (
      |  SELECT CAST(year(min(o_orderdate)) * 12 + month(min(o_orderdate)) - 1 AS INT) AS lo,
      |         CAST(year(max(o_orderdate)) * 12 + month(max(o_orderdate)) - 1 AS INT) AS hi
      |  FROM orders
      |),
      |mi(i, hi) AS (
      |  SELECT lo, hi FROM b
      |  UNION ALL
      |  SELECT i + 1, hi FROM mi WHERE i < hi
      |),
      |m AS (SELECT make_date(CAST(floor(i / 12) AS INT), CAST(i % 12 AS INT) + 1, 1) AS month_start FROM mi),
      |o AS (SELECT make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS mo,
      |             count(*) AS n_orders
      |      FROM orders GROUP BY 1)
      |SELECT m.month_start AS month_start, CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders
      |FROM m LEFT JOIN o ON m.month_start = o.mo
      |ORDER BY month_start""".stripMargin

  private val correlatedSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
      |                          WHERE o2.o_custkey = o.o_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders o3
      |                  WHERE o3.o_custkey = o.o_custkey
      |                    AND o3.o_totalprice > 2 * o.o_totalprice)
      |ORDER BY o_orderkey""".stripMargin

  private def baseOracles: Map[String, String] = Map(
    "q_correlated_subquery" -> correlatedSql,
    "sql_recursive_months" -> recursiveMonthsSql,
    // KMV twin: the engine's bounded-state sketch re-derived
    // relationally (rank window over distinct hashes); estimator
    // arithmetic mirrored operand-for-operand (ints → double, one
    // mult, one divide — no libm, no decimal round, raw doubles are
    // bit-portable)
    "q_kmv_overlap" ->
      """WITH mem AS (
        |  SELECT event_type, user_id
        |  FROM events GROUP BY 1, 2 HAVING count(*) >= 14),
        |hh AS (
        |  -- DISTINCT: the engine's sketch buffer is a hash SET, so a
        |  -- 48-bit md5-prefix collision between two user_ids must
        |  -- collapse here too, or theta/m_size diverge engine vs oracle
        |  SELECT DISTINCT event_type,
        |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM mem),
        |r AS (SELECT event_type, h,
        |             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |      FROM hh),
        |sk AS (SELECT event_type, h FROM r WHERE rn <= 128),
        |n AS (SELECT event_type, count(*) AS n_exact FROM mem GROUP BY 1),
        |pr AS (SELECT a.event_type AS ta, b.event_type AS tb
        |       FROM n a JOIN n b ON a.event_type < b.event_type),
        |u0 AS (
        |  SELECT pr.ta, pr.tb, sk.h FROM pr JOIN sk ON sk.event_type = pr.ta
        |  UNION
        |  SELECT pr.ta, pr.tb, sk.h FROM pr JOIN sk ON sk.event_type = pr.tb),
        |ur AS (SELECT ta, tb, h,
        |              row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn,
        |              count(*) OVER (PARTITION BY ta, tb) AS usz
        |       FROM u0),
        |m AS (SELECT * FROM ur WHERE rn <= 128),
        |mi AS (SELECT m.ta, m.tb, count(*) AS i_cnt
        |       FROM m JOIN sk a ON a.event_type = m.ta AND a.h = m.h
        |              JOIN sk b ON b.event_type = m.tb AND b.h = m.h
        |       GROUP BY 1, 2),
        |ms AS (SELECT ta, tb, count(*) AS m_size, max(usz) AS usz,
        |              max(h) AS theta
        |       FROM m GROUP BY 1, 2),
        |nin AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |               count(*) AS n_inter
        |        FROM mem a JOIN mem b ON a.user_id = b.user_id
        |                            AND a.event_type < b.event_type
        |        GROUP BY 1, 2),
        |est AS (
        |  SELECT ms.ta, ms.tb,
        |         na.n_exact AS n_a, nb.n_exact AS n_b,
        |         coalesce(nin.n_inter, 0) AS n_inter,
        |         CAST(ms.m_size AS INT) AS m_size,
        |         CASE WHEN ms.usz >= 128
        |              THEN (CAST(127 AS DOUBLE) * CAST(281474976710656 AS DOUBLE))
        |                     / CAST(ms.theta AS DOUBLE)
        |              ELSE CAST(ms.usz AS DOUBLE) END AS est_union,
        |         CAST(coalesce(mi.i_cnt, 0) AS DOUBLE)
        |           / CAST(ms.m_size AS DOUBLE) AS est_jaccard
        |  FROM ms
        |  JOIN n na ON na.event_type = ms.ta
        |  JOIN n nb ON nb.event_type = ms.tb
        |  LEFT JOIN mi ON mi.ta = ms.ta AND mi.tb = ms.tb
        |  LEFT JOIN nin ON nin.ta = ms.ta AND nin.tb = ms.tb)
        |SELECT ta AS type_a, tb AS type_b, n_a, n_b,
        |       n_a + n_b - n_inter AS n_union, n_inter, m_size,
        |       est_union, est_jaccard * est_union AS est_inter, est_jaccard
        |FROM est ORDER BY type_a, type_b""".stripMargin,
    "st_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |       count(*) AS n_events,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "st_click_purchase_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
        |             value AS purchase_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, click_id, click_ts, purchase_id, purchase_ts, purchase_value
        |FROM c JOIN p ON c.user_id = p.user_id
        | AND purchase_ts >= click_ts
        | AND purchase_ts <= click_ts + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,
    // left-outer twin: matched rows emit unconditionally; a null-pad
    // row emits iff the click is unmatched AND its match window closed
    // before the terminal watermark. Spark facts pinned by
    // ProfLeftJoin --micro: wm = floor_ms(min of the two stream maxes)
    // - 10 min (event-time stats are ms-floored), and eviction carries
    // a 1 ms safety margin — click_ts + 1h + 1ms <= wm, compared at µs
    // precision. NULLS FIRST matches Spark's asc default.
    "st_left_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user_id, event_id AS purchase_id,
        |             ts AS purchase_ts, value AS purchase_value
        |      FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT date_trunc('milliseconds',
        |                least((SELECT max(click_ts) FROM c),
        |                      (SELECT max(purchase_ts) FROM p)))
        |              - INTERVAL 10 MINUTE AS wm)
        |SELECT c.user_id, click_id, click_ts,
        |       purchase_id, purchase_ts, purchase_value
        |FROM c JOIN p ON c.user_id = p.p_user_id
        | AND purchase_ts >= click_ts
        | AND purchase_ts <= click_ts + INTERVAL 1 HOUR
        |UNION ALL
        |SELECT c.user_id, click_id, click_ts, NULL, NULL, NULL
        |FROM c CROSS JOIN wm
        |WHERE NOT EXISTS (
        |        SELECT 1 FROM p
        |        WHERE p.p_user_id = c.user_id
        |          AND purchase_ts >= click_ts
        |          AND purchase_ts <= click_ts + INTERVAL 1 HOUR)
        |  AND click_ts + INTERVAL 1 HOUR + INTERVAL 1 MILLISECOND
        |        <= wm.wm
        |ORDER BY click_id, purchase_id NULLS FIRST""".stripMargin,
    // chained twin: daily rollup of hourly counts, finalized once the
    // terminal watermark (ms-floored max ts - delay) passes the day
    // end — the same <= eviction predicate as st_late_drop, applied to
    // the OUTER of two chained stateful aggregations. DuckDB SUM(BIGINT)
    // returns HUGEINT; cast back so the schema matches Spark's longs.
    "st_chained" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour_start,
        |                  event_type, count(*) AS n_events
        |           FROM events GROUP BY 1, 2),
        |mx AS (SELECT date_trunc('milliseconds', max(ts))
        |              - INTERVAL 10 MINUTE AS wm FROM events),
        |d AS (SELECT date_trunc('day', hour_start) AS day_start,
        |             event_type,
        |             CAST(SUM(n_events) AS BIGINT) AS n_events,
        |             CAST(MAX(n_events) AS BIGINT) AS max_hourly,
        |             count(*) AS n_hours
        |      FROM h GROUP BY 1, 2)
        |SELECT day_start, event_type, n_events, max_hourly, n_hours
        |FROM d CROSS JOIN mx
        |WHERE day_start + INTERVAL 1 DAY <= wm
        |ORDER BY day_start, event_type""".stripMargin,
    // bad-records twin: clean per-mode aggregates from the uncorrupted
    // slice; exactly the three injected lines are the corrupt remainder
    "src_badrecords" -> (graft.sources.OracleCtes.withEntities("sales") +
      """, c AS (SELECT * FROM sales WHERE sale_id % 97 = 0),
        |g AS (SELECT payment_mode, count(*) AS n_sales,
        |             CAST(SUM(quantity) AS BIGINT) AS total_qty
        |      FROM c GROUP BY 1),
        |t AS (SELECT count(*) AS n_clean FROM c)
        |SELECT payment_mode, n_sales, total_qty, n_clean,
        |       n_clean + 3 AS n_lines, CAST(3 AS BIGINT) AS n_corrupt
        |FROM g CROSS JOIN t ORDER BY payment_mode""".stripMargin),
    // evolution twin: the merged read must equal the union with NULLs
    // where the old wave predates the grown column
    "src_schema_evolution" ->
      """SELECT o_orderkey, o_orderstatus,
        |       CAST(o_totalprice AS DOUBLE) AS price,
        |       CASE WHEN o_orderkey % 2 <> 0 THEN o_orderpriority END
        |         AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // streaming dedup twin: the deterministic invariant is the
    // surviving fingerprint SET (which duplicate wins is arrival order)
    "st_dedup" ->
      """SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |  AS fp
        |FROM documents ORDER BY fp""".stripMargin,
    // late-drop twin: wave 1 only (the late wave is dropped), hours
    // finalized once the terminal watermark has passed their end.
    // Spark's append-mode eviction predicate is `window.end <= watermark`
    // (WatermarkSupport emits a window the moment the watermark REACHES
    // its end), so the twin uses <= as well — with `<` the two engines
    // would diverge in the boundary case where max(ts) lands exactly
    // 10 minutes past an hour boundary (wm == some hour end).
    "st_late_drop" ->
      """WITH w1 AS (
        |  SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'),
        |mx AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm FROM w1)
        |SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |       count(*) AS n_events,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
        |         AS sum_value
        |FROM w1 CROSS JOIN mx
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm
        |GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "st_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_name, c.c_mktsegment
        |FROM events e
        |LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
        |  ON e.user_id = c.c_custkey
        |ORDER BY event_id""".stripMargin,
    "st_csv_drop" -> (graft.sources.OracleCtes.withEntities("sales") +
      """SELECT * FROM sales
        |ORDER BY sale_id, customer_id, product_id, sale_date, quantity,
        |         discount, shipping_cost, order_status, payment_mode""".stripMargin),
    // the ORC round-trip must be invisible: oracle aggregates the
    // parquet original
    "src_orc_roundtrip" ->
      s"""SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
         |       ${core.Money.Sql.round2(
                    core.Money.Sql.moneySum("o_totalprice"))} AS total_price
         |FROM orders
         |GROUP BY o_orderpriority, o_orderstatus
         |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "src_json_roundtrip" ->
      s"""SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
         |       ${core.Money.Sql.round2(
                    core.Money.Sql.moneySum("o_totalprice"))} AS total_price
         |FROM orders
         |GROUP BY o_orderpriority, o_orderstatus
         |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    // abandoned-session twin: q_sessionize's islands, with the
    // emission set gated by the pinned timeout predicate — non-last
    // sessions always emit ('gap'), each user's last session emits iff
    // its ms-floored end + gap lies STRICTLY before the ms-floored
    // terminal watermark ('timeout'), still-open sessions are withheld
    "st_abandoned" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |f AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |g AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM f),
        |h AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM g),
        |s AS (SELECT user_id, session_idx, count(*) AS n_events,
        |             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
        |             min(ts_us) AS start_us, max(ts_us) AS end_us
        |      FROM h GROUP BY 1, 2),
        |w AS (SELECT max(ts_us) // 1000 - 600000 AS wm_ms FROM e),
        |x AS (SELECT s.*, max(session_idx) OVER (PARTITION BY user_id) AS last_idx, w.wm_ms
        |      FROM s, w)
        |SELECT user_id,
        |       make_timestamp(start_us) AS session_start,
        |       make_timestamp(end_us) AS session_end,
        |       n_events, n_purchases,
        |       CASE WHEN session_idx < last_idx THEN 'gap' ELSE 'timeout' END AS end_reason
        |FROM x
        |WHERE session_idx < last_idx
        |   OR end_us // 1000 + 1800000 < wm_ms
        |ORDER BY user_id, session_start""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us FROM events),
        |f AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |g AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM f),
        |h AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM g)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM h GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,
    // sliding twin: expand each event into its 4 epoch-aligned window
    // starts (floor(µs / slide) − k); µs arithmetic matches Spark's
    // already-truncated timestamps
    "q_sliding_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS tu, event_type, value FROM events),
        |x AS (SELECT make_timestamp((tu // 900000000 - k) * 900000000)
        |               AS window_start,
        |             event_type, value
        |      FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
        |SELECT window_start, event_type, count(*) AS n_events,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
        |         AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // funnel twin: per-stage first-reach chains on epoch_us (Spark's
    // events carry µs precision — comparisons must not see DuckDB's ns)
    "q_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
         |s1 AS (SELECT user_id, min(tu) AS t FROM e
         |       WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(e.tu) AS t FROM e JOIN s1 USING (user_id)
         |       WHERE e.event_type = 'click' AND e.tu >= s1.t GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(e.tu) AS t FROM e JOIN s2 USING (user_id)
         |       WHERE e.event_type = 'purchase' AND e.tu >= s2.t GROUP BY 1),
         |c AS (SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM s1
         |      UNION ALL SELECT 2, 'click', count(*) FROM s2
         |      UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
         |SELECT c.stage_idx, c.stage, c.n_users,
         |       ${core.Money.Sql.ratio2("c.n_users",
                    "coalesce(p.n_users, c.n_users)")} AS conv_prev,
         |       ${core.Money.Sql.ratio2("c.n_users", "t.n_users")} AS conv_top
         |FROM c LEFT JOIN c p ON c.stage_idx = p.stage_idx + 1
         |CROSS JOIN (SELECT n_users FROM c WHERE stage_idx = 1) t
         |ORDER BY c.stage_idx""".stripMargin,
    // MI twin: same contingency cells, same PSI-style ln rounding
    "q_mutual_info" ->
      """WITH b AS (
        |  SELECT event_type AS x,
        |         least(CAST(floor(value / 64) AS BIGINT), 7) AS y
        |  FROM events),
        |cells AS (SELECT x, y, count(*) AS n FROM b GROUP BY 1, 2),
        |xm AS (SELECT x, CAST(SUM(n) AS BIGINT) AS nx FROM cells GROUP BY 1),
        |ym AS (SELECT y, CAST(SUM(n) AS BIGINT) AS ny FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
        |p AS (SELECT x, y, n,
        |        CAST(n AS DOUBLE) / CAST(nn AS DOUBLE) AS pxy,
        |        CAST(nx AS DOUBLE) / CAST(nn AS DOUBLE) AS px,
        |        CAST(ny AS DOUBLE) / CAST(nn AS DOUBLE) AS py
        |      FROM cells JOIN xm USING (x) JOIN ym USING (y) CROSS JOIN t),
        |terms AS (
        |  SELECT x, y, n,
        |         CAST(ROUND(CAST(pxy *
        |             CAST(ROUND(CAST(ln(pxy / (px * py)) AS DECIMAL(20,12)), 9)
        |               AS DOUBLE)
        |           AS DECIMAL(20,12)), 9) AS DOUBLE) AS term
        |  FROM p),
        |tot AS (SELECT CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE)
        |          AS mi FROM terms)
        |SELECT x, y, n, term, mi FROM terms CROSS JOIN tot
        |ORDER BY x, y""".stripMargin,
    // transition twin: lead over the same (ts, event_id) order
    "q_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |s AS (SELECT event_type AS from_type, to_type, count(*) AS n
        |      FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        |       FROM s GROUP BY 1)
        |SELECT from_type, to_type, n,
        |       CAST(ROUND(CAST(CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE)
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS p
        |FROM s JOIN ft USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    // OLS twin: identical exact moments (BIGINT x, DECIMAL(18,6) y —
    // products stay exact on both engines), then the same fixed IEEE
    // double sequence per fit column, decimal-9 rounded
    "q_regression" -> (graft.sources.OracleCtes.withEntities("sales") +
      """, daily AS (
        |  SELECT payment_mode, sale_date,
        |         CAST(SUM(quantity) AS DOUBLE) AS daily_total
        |  FROM sales GROUP BY 1, 2),
        |m AS (
        |  SELECT payment_mode, count(*) AS n,
        |         SUM(x) AS sx, SUM(x * x) AS sxx,
        |         -- y*y's operands are both width<=18, which DuckDB
        |         -- multiplies in INT64 and overflows once unscaled y
        |         -- passes sqrt(int64) (seen at 10x data); widening ONE
        |         -- side to width 19 forces the HUGEINT path. Exact
        |         -- either way - same value, wider accumulator.
        |         SUM(y) AS sy, SUM(y * x) AS sxy,
        |         SUM(CAST(y AS DECIMAL(19,6)) * y) AS syy
        |  FROM (SELECT payment_mode,
        |               CAST(date_diff('day', DATE '2000-01-01', sale_date)
        |                 AS BIGINT) AS x,
        |               CAST(daily_total AS DECIMAL(18,6)) AS y
        |        FROM daily)
        |  GROUP BY 1),
        |f AS (
        |  SELECT payment_mode, n,
        |         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
        |         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
        |         CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE) AS bnum
        |  FROM m)
        |SELECT payment_mode, n AS n_days,
        |       CASE WHEN den > 0 THEN
        |         CAST(ROUND(CAST(num / den AS DECIMAL(20,12)), 9)
        |           AS DOUBLE) END AS slope,
        |       CASE WHEN den > 0 THEN
        |         CAST(ROUND(CAST(bnum / den AS DECIMAL(20,12)), 9)
        |           AS DOUBLE) END AS intercept,
        |       CASE WHEN den > 0 AND deny > 0 THEN
        |         CAST(ROUND(CAST(num * num / (den * deny)
        |           AS DECIMAL(20,12)), 9) AS DOUBLE) END AS r2
        |FROM f ORDER BY payment_mode""".stripMargin),
    // chi-squared twin: q_mutual_info's contingency cells, expected
    // counts and terms decimal-9 rounded, decimal-summed chi2,
    // IEEE-exact sqrt for Cramér's V
    "q_chi2" ->
      """WITH b AS (
        |  SELECT event_type AS x,
        |         least(CAST(floor(value / 64) AS BIGINT), 7) AS y
        |  FROM events),
        |cells AS (SELECT x, y, count(*) AS n FROM b GROUP BY 1, 2),
        |xm AS (SELECT x, CAST(SUM(n) AS BIGINT) AS nx FROM cells GROUP BY 1),
        |ym AS (SELECT y, CAST(SUM(n) AS BIGINT) AS ny FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |             CAST(COUNT(DISTINCT x) AS BIGINT) AS r,
        |             CAST(COUNT(DISTINCT y) AS BIGINT) AS c FROM cells),
        |grid AS (SELECT xm.x, xm.nx, ym.y, ym.ny FROM xm CROSS JOIN ym),
        |g2 AS (SELECT g.x, g.y, COALESCE(c.n, 0) AS n, g.nx, g.ny
        |       FROM grid g LEFT JOIN cells c ON g.x = c.x AND g.y = c.y),
        |e AS (SELECT x, y, n, nn, r, c,
        |        CAST(ROUND(CAST(CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
        |          / CAST(nn AS DOUBLE) AS DECIMAL(20,12)), 9) AS DOUBLE)
        |          AS expected
        |      FROM g2 CROSS JOIN t),
        |terms AS (SELECT x, y, n, nn, r, c, expected,
        |        CAST(ROUND(CAST((CAST(n AS DOUBLE) - expected)
        |          * (CAST(n AS DOUBLE) - expected) / expected
        |          AS DECIMAL(20,12)), 9) AS DOUBLE) AS term
        |      FROM e),
        |tab AS (SELECT CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE)
        |          AS chi2,
        |               MAX((r - 1) * (c - 1)) AS dof,
        |               MAX(nn) AS nnx, MAX(r) AS rx, MAX(c) AS cx
        |        FROM terms),
        |v AS (SELECT chi2, dof,
        |        CAST(ROUND(CAST(sqrt(chi2 / (CAST(nnx AS DOUBLE)
        |          * CAST(least(rx - 1, cx - 1) AS DOUBLE)))
        |          AS DECIMAL(20,12)), 9) AS DOUBLE) AS cramers_v
        |      FROM tab)
        |SELECT x, y, n, expected, term, chi2, dof, cramers_v
        |FROM terms CROSS JOIN v ORDER BY x, y""".stripMargin,
    // Benford twin: DECIMAL(18,2)-string first digit (libm-free digit
    // extraction), exact counts, ln-ratio expectations decimal-9.
    // TRY_CAST + IS NOT NULL: values in (0, 0.005) render "0.00" with no
    // [1-9], which plain CAST('') would crash on — the Spark side drops
    // the same NULL digit group, keeping both engines total on any
    // positive input.
    "q_benford" ->
      """WITH c AS (
        |  SELECT TRY_CAST(regexp_extract(CAST(CAST(o_totalprice
        |           AS DECIMAL(18,2)) AS VARCHAR), '[1-9]') AS INT) AS digit
        |  FROM orders WHERE o_totalprice > 0),
        |g AS (SELECT digit, count(*) AS n FROM c
        |      WHERE digit IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM g),
        |s AS (SELECT digit, n,
        |        CAST(ROUND(CAST(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
        |          AS DECIMAL(20,12)), 9) AS DOUBLE) AS observed,
        |        CAST(ROUND(CAST(ln(1.0 + 1.0 / CAST(digit AS DOUBLE))
        |          / ln(10.0) AS DECIMAL(20,12)), 9) AS DOUBLE) AS expected
        |      FROM g CROSS JOIN t),
        |s2 AS (SELECT *,
        |        CAST(ROUND(CAST(abs(observed - expected)
        |          AS DECIMAL(20,12)), 9) AS DOUBLE) AS deviation
        |       FROM s),
        |m AS (SELECT CAST(ROUND(CAST(
        |        CAST(SUM(CAST(deviation AS DECIMAL(28,12))) AS DOUBLE)
        |          / CAST(count(*) AS DOUBLE)
        |        AS DECIMAL(20,12)), 9) AS DOUBLE) AS mad FROM s2)
        |SELECT digit, n, observed, expected, deviation, mad
        |FROM s2 CROSS JOIN m ORDER BY digit""".stripMargin,
    // Pareto twin: the same (18,2) decimal basis, tie-broken cumulative
    // window, rank-weighted Gini in one fixed double sequence
    "q_pareto" ->
      """WITH base AS (
        |  SELECT o_custkey AS customer_id,
        |         CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))),
        |           2) AS DOUBLE) AS DECIMAL(18,2)) AS m_dec
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT customer_id, m_dec,
        |         CAST(ROW_NUMBER() OVER (ORDER BY CAST(m_dec AS DOUBLE) ASC,
        |           customer_id ASC) AS DECIMAL(10,0)) AS j,
        |         SUM(m_dec) OVER (ORDER BY CAST(m_dec AS DOUBLE) DESC,
        |           customer_id ASC ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM base),
        |tot AS (
        |  SELECT SUM(m_dec) AS total, CAST(count(*) AS BIGINT) AS n,
        |         SUM(m_dec * j) AS rank_weighted
        |  FROM ranked)
        |SELECT customer_id, CAST(m_dec AS DOUBLE) AS monetary,
        |       CAST(ROUND(CAST(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS cum_share,
        |       CASE WHEN CAST(ROUND(CAST(CAST(cum AS DOUBLE)
        |                / CAST(total AS DOUBLE) AS DECIMAL(20,12)), 9)
        |                AS DOUBLE) <= 0.8 THEN 'A'
        |            WHEN CAST(ROUND(CAST(CAST(cum AS DOUBLE)
        |                / CAST(total AS DOUBLE) AS DECIMAL(20,12)), 9)
        |                AS DOUBLE) <= 0.95 THEN 'B'
        |            ELSE 'C' END AS abc_class,
        |       CAST(ROUND(CAST(2.0 * CAST(rank_weighted AS DOUBLE)
        |         / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
        |         - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS gini
        |FROM ranked CROSS JOIN tot
        |ORDER BY customer_id""".stripMargin,
    // RFM twin: identical tie-broken ntile orders (metric, then
    // customer key — a non-total order would be layout-dependent)
    "q_rfm" ->
      """WITH base AS (
        |  SELECT o_custkey AS customer_id,
        |         CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
        |           DATE '2001-09-01') AS INT) AS recency_days,
        |         count(*) AS frequency,
        |         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2)
        |           AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1),
        |q AS (SELECT *,
        |        CAST(ntile(5) OVER (ORDER BY recency_days ASC,
        |          customer_id ASC) AS INT) AS r_quintile,
        |        CAST(ntile(5) OVER (ORDER BY frequency DESC,
        |          customer_id ASC) AS INT) AS f_quintile,
        |        CAST(ntile(5) OVER (ORDER BY monetary DESC,
        |          customer_id ASC) AS INT) AS m_quintile
        |      FROM base)
        |SELECT customer_id, recency_days, frequency, monetary,
        |       r_quintile, f_quintile, m_quintile,
        |       CAST(r_quintile AS VARCHAR) || CAST(f_quintile AS VARCHAR)
        |         || CAST(m_quintile AS VARCHAR) AS segment
        |FROM q ORDER BY customer_id""".stripMargin,
    // DP twin: the same md5-uniform (hex8 + 0.5)/2^32 draw per group
    // key, the same inverse-CDF sequence, ln decimal-9 rounded
    "q_dp_noise" ->
      """WITH g AS (
        |  SELECT c_mktsegment, c_nationkey, count(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |u AS (
        |  SELECT *,
        |         (('0x' || substr(md5(c_mktsegment || ':' || c_nationkey
        |             || ':' || 'dp'), 1, 8))::BIGINT + 0.5)
        |           / 4294967296.0 AS uu
        |  FROM g),
        |n2 AS (
        |  SELECT *,
        |         CAST(ROUND(CAST(-2.0
        |           * (CASE WHEN uu >= 0.5 THEN 1.0 ELSE -1.0 END)
        |           * ln(1.0 - 2.0 * abs(uu - 0.5))
        |           AS DECIMAL(20,12)), 9) AS DOUBLE) AS noise
        |  FROM u)
        |SELECT c_mktsegment, c_nationkey, n, noise,
        |       CAST(ROUND(CAST(CAST(n AS DOUBLE) + noise
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS noised
        |FROM n2 ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    // A/B twin: identical parity assignment, exact counts, one fixed
    // IEEE sequence for rates / pooled SE / z, decimal-9 rounded
    "q_abtest" ->
      """WITH u AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS converted
        |  FROM events GROUP BY 1),
        |g AS (SELECT
        |        CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_a,
        |        CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_b,
        |        CAST(SUM(CASE WHEN user_id % 2 = 0 THEN converted ELSE 0 END)
        |          AS BIGINT) AS conv_a,
        |        CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN converted ELSE 0 END)
        |          AS BIGINT) AS conv_b
        |      FROM u),
        |f AS (SELECT *,
        |        CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        |        CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
        |        (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
        |          / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pooled
        |      FROM g),
        |f2 AS (SELECT *, sqrt(pooled * (1.0 - pooled)
        |         * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |         AS se
        |       FROM f)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  CASE WHEN n_a > 0 THEN
        |    CAST(ROUND(CAST(pa AS DECIMAL(20,12)), 9) AS DOUBLE) END AS p_a,
        |  CASE WHEN n_b > 0 THEN
        |    CAST(ROUND(CAST(pb AS DECIMAL(20,12)), 9) AS DOUBLE) END AS p_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(ROUND(CAST(pa - pb AS DECIMAL(20,12)), 9) AS DOUBLE)
        |    END AS lift,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0 THEN
        |    CAST(ROUND(CAST((pa - pb) / se AS DECIMAL(20,12)), 9) AS DOUBLE)
        |    END AS z
        |FROM f2""".stripMargin,
    // Holt twin: the same array-pair left fold ([level, trend] — see
    // holtSmooth's scaladoc for why a struct accumulator is unusable in
    // DuckDB 1.0), identical literals, decimal-9 re-round
    "q_holt" -> (graft.sources.OracleCtes.withEntities("sales") +
      """, daily AS (
        |  SELECT payment_mode, sale_date,
        |         CAST(SUM(quantity) AS DOUBLE) AS daily_total
        |  FROM sales GROUP BY 1, 2),
        |series AS (
        |  SELECT payment_mode,
        |         list(sale_date ORDER BY sale_date) AS ds,
        |         list(daily_total ORDER BY sale_date) AS vs
        |  FROM daily GROUP BY 1),
        |tr AS (
        |  SELECT payment_mode, ds, vs,
        |         list_reduce(
        |           list_prepend([dvs[1], CAST(0 AS DECIMAL(26,12))],
        |             list_transform(dvs[2:], v -> [v])),
        |           (a, x) -> list_concat(a,
        |             [CAST(ROUND(0.3 * x[1] + 0.7 * (a[-2] + a[-1]), 12)
        |                AS DECIMAL(26,12)),
        |              CAST(ROUND(0.2 * (
        |                  CAST(ROUND(0.3 * x[1] + 0.7 * (a[-2] + a[-1]), 12)
        |                    AS DECIMAL(26,12)) - a[-2])
        |                + 0.8 * a[-1], 12) AS DECIMAL(26,12))])) AS traj
        |  FROM (SELECT payment_mode, ds, vs,
        |          list_transform(vs, v -> CAST(v AS DECIMAL(26,12))) AS dvs
        |        FROM series) sd),
        |expanded AS (
        |  SELECT payment_mode, unnest(range(1, len(vs) + 1)) AS t,
        |         ds, vs, traj
        |  FROM tr)
        |SELECT payment_mode, ds[t] AS sale_date, vs[t] AS daily_total,
        |       CAST(ROUND(traj[2 * t - 1], 9)
        |         AS DOUBLE) AS level,
        |       CAST(ROUND(traj[2 * t], 9)
        |         AS DOUBLE) AS trend
        |FROM expanded
        |ORDER BY payment_mode, sale_date""".stripMargin),
    // CUSUM twin: same decimal-exact rounded mean, same trajectory
    // fold (seed 0.0, slot t+1 = Sₜ), flag compares the ROUNDED value
    "q_cusum" -> (graft.sources.OracleCtes.withEntities("sales") +
      """, daily AS (
        |  SELECT payment_mode, sale_date,
        |         CAST(SUM(quantity) AS DOUBLE) AS daily_total
        |  FROM sales GROUP BY 1, 2),
        |series AS (
        |  SELECT payment_mode,
        |         list(sale_date ORDER BY sale_date) AS ds,
        |         list(daily_total ORDER BY sale_date) AS vs,
        |         -- mu at SIX dp (see Analytics.cusum): it re-enters the
        |         -- fold via double->decimal, and DuckDB's conversion
        |         -- multiplies by 10^scale in DOUBLE space - lossy once
        |         -- mu*10^12 > 2^53 (hit at the sf10 rung, mu ~ 24k)
        |         CAST(ROUND(CAST(
        |           CAST(SUM(CAST(daily_total AS DECIMAL(28,6))) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE)
        |           AS DECIMAL(20,12)), 6) AS DOUBLE) AS mu
        |  FROM daily GROUP BY 1),
        |tr AS (
        |  SELECT payment_mode, mu, ds, vs,
        |         -- the 0-clamp is a CASE, NOT greatest(): DuckDB's
        |         -- greatest(DECIMAL, DECIMAL) returns DOUBLE, which
        |         -- round-trips the 16-significant-digit state through
        |         -- 53 bits and corrupts the last decimal.
        |         -- mu enters the fold through DECIMAL(26,6) (exact
        |         -- while mu*10^6 < 2^53), then promotes to the state
        |         -- scale decimal->decimal, which is lossless
        |         list_reduce(
        |           list_prepend([CAST(0 AS DECIMAL(26,12))],
        |             list_transform(dvs, v -> [v])),
        |           (a, x) -> list_concat(a,
        |             [CASE WHEN a[-1] + (x[1]
        |                     - CAST(CAST(mu AS DECIMAL(26,6)) AS DECIMAL(26,12))
        |                     - 5.0) < 0 THEN CAST(0 AS DECIMAL(26,12))
        |               ELSE CAST(a[-1] + (x[1]
        |                 - CAST(CAST(mu AS DECIMAL(26,6)) AS DECIMAL(26,12))
        |                 - 5.0) AS DECIMAL(26,12)) END])) AS traj
        |  FROM (SELECT payment_mode, mu, ds, vs,
        |          list_transform(vs, v -> CAST(v AS DECIMAL(26,12))) AS dvs
        |        FROM series) sd),
        |expanded AS (
        |  SELECT payment_mode, mu, unnest(range(1, len(vs) + 1)) AS t,
        |         ds, vs, traj
        |  FROM tr)
        |SELECT payment_mode, ds[t] AS sale_date, vs[t] AS daily_total, mu,
        |       CAST(ROUND(traj[t + 1], 9)
        |         AS DOUBLE) AS cusum,
        |       CAST(ROUND(traj[t + 1], 9)
        |         AS DOUBLE) > 200.0 AS is_change
        |FROM expanded
        |ORDER BY payment_mode, sale_date""".stripMargin),
    // seasonality twin: Monday-based weekday (isodow − 1 ↔ Spark
    // weekday), exact counts/decimal sums, fixed double sequence
    "q_seasonal" -> (graft.sources.OracleCtes.withEntities("sales") +
      """, daily AS (
        |  SELECT payment_mode, sale_date,
        |         CAST(SUM(quantity) AS DOUBLE) AS daily_total
        |  FROM sales GROUP BY 1, 2),
        |bydow AS (
        |  SELECT payment_mode, CAST(isodow(sale_date) - 1 AS INT) AS dow,
        |         count(*) AS n_days,
        |         SUM(CAST(daily_total AS DECIMAL(28,6))) AS sum_v
        |  FROM daily GROUP BY 1, 2),
        |tot AS (
        |  SELECT payment_mode, CAST(SUM(n_days) AS BIGINT) AS n_all,
        |         SUM(sum_v) AS sum_all
        |  FROM bydow GROUP BY 1)
        |SELECT b.payment_mode, b.dow, b.n_days,
        |       CAST(ROUND(CAST(CAST(b.sum_v AS DOUBLE)
        |         / CAST(b.n_days AS DOUBLE) AS DECIMAL(20,12)), 9)
        |         AS DOUBLE) AS mean_value,
        |       CAST(ROUND(CAST((CAST(b.sum_v AS DOUBLE)
        |           / CAST(b.n_days AS DOUBLE))
        |         / (CAST(t.sum_all AS DOUBLE) / CAST(t.n_all AS DOUBLE))
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS seasonal_index
        |FROM bydow b JOIN tot t USING (payment_mode)
        |ORDER BY payment_mode, dow""".stripMargin),
    // decay twin: the same power-of-two weights (1 << bucket — exact
    // exponent decrement, no libm; bucket clamped to 62, the shift-
    // mask overflow guard), decimal-summed, 2-dp render
    "q_decay" ->
      """WITH e AS (
        |  SELECT user_id,
        |         CAST(least(greatest(floor(CAST(date_diff('day',
        |           CAST(ts AS DATE),
        |           DATE '2024-02-01') AS DOUBLE) / 7), 0), 62) AS INT) AS b,
        |         value
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |       CAST(ROUND(SUM(CAST(value
        |         / CAST(CAST(1 AS BIGINT) << b AS DOUBLE)
        |         AS DECIMAL(38,12))), 2) AS DOUBLE) AS score
        |FROM e GROUP BY 1 ORDER BY user_id""".stripMargin,
    // basket twin: identical basket-size cap and min-support gate,
    // orderkey-keyed pair join, exact counts, decimal-9 ratios
    "q_assoc" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |sized AS (SELECT ok FROM items GROUP BY ok HAVING count(*) <= 100),
        |kept AS (SELECT i.ok, i.pk FROM items i JOIN sized USING (ok)),
        |nb AS (SELECT count(*) AS n_baskets FROM sized),
        |pairs AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_pair
        |  FROM kept a JOIN kept b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |ic AS (SELECT pk, count(*) AS n_item FROM kept GROUP BY 1)
        |SELECT part_a, part_b, n_pair, ia.n_item AS n_a, ib.n_item AS n_b,
        |       CAST(ROUND(CAST(CAST(n_pair AS DOUBLE)
        |         / CAST(n_baskets AS DOUBLE)
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS support,
        |       CAST(ROUND(CAST(CAST(n_pair AS DOUBLE)
        |         / CAST(ia.n_item AS DOUBLE)
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS conf_ab,
        |       CAST(ROUND(CAST(CAST(n_pair AS DOUBLE)
        |         / CAST(ib.n_item AS DOUBLE)
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS conf_ba,
        |       CAST(ROUND(CAST(CAST(n_pair AS DOUBLE)
        |         * CAST(n_baskets AS DOUBLE)
        |         / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE))
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS lift
        |FROM pairs
        |JOIN ic ia ON ia.pk = part_a
        |JOIN ic ib ON ib.pk = part_b
        |CROSS JOIN nb
        |ORDER BY part_a, part_b""".stripMargin,
    // EWMA twin: the same trajectory left fold (ONE list_reduce per key
    // appending each eₜ; the running value is the array's last slot —
    // mirrors ewmaSmooth's O(days) form, same per-step arithmetic as
    // the old per-t prefix refold so every eₜ is bit-identical),
    // α/1−α as the same parsed literals, decimal-9 re-round
    "q_ewma" -> (graft.sources.OracleCtes.withEntities("sales") +
      """, daily AS (
        |  SELECT payment_mode, sale_date,
        |         CAST(SUM(quantity) AS DOUBLE) AS daily_total
        |  FROM sales GROUP BY 1, 2),
        |series AS (
        |  SELECT payment_mode,
        |         list(sale_date ORDER BY sale_date) AS ds,
        |         list(daily_total ORDER BY sale_date) AS vs
        |  FROM daily GROUP BY 1),
        |tr AS (
        |  SELECT payment_mode, ds, vs,
        |         list_reduce(
        |           list_prepend([dvs[1]], list_transform(dvs[2:], v -> [v])),
        |           (a, x) -> list_concat(a,
        |             [CAST(ROUND(0.3 * x[1] + 0.7 * a[-1], 12)
        |                AS DECIMAL(26,12))])) AS traj
        |  FROM (SELECT payment_mode, ds, vs,
        |          list_transform(vs, v -> CAST(v AS DECIMAL(26,12))) AS dvs
        |        FROM series) sd),
        |expanded AS (
        |  SELECT payment_mode, unnest(range(1, len(vs) + 1)) AS t,
        |         ds, vs, traj
        |  FROM tr)
        |SELECT payment_mode, ds[t] AS sale_date, vs[t] AS daily_total,
        |       CAST(ROUND(traj[t], 9) AS DOUBLE)
        |         AS ewma
        |FROM expanded
        |ORDER BY payment_mode, sale_date""".stripMargin),
    // anomaly twin: the EWMA chain, lag-1 forecast, decimal-summed Σr²,
    // IEEE-exact sqrt, guarded z (NULL when σ is 0 or undersampled)
    "q_anomaly" -> (graft.sources.OracleCtes.withEntities("sales") +
      """, daily AS (
        |  SELECT payment_mode, sale_date,
        |         CAST(SUM(quantity) AS DOUBLE) AS daily_total
        |  FROM sales GROUP BY 1, 2),
        |series AS (
        |  SELECT payment_mode,
        |         list(sale_date ORDER BY sale_date) AS ds,
        |         list(daily_total ORDER BY sale_date) AS vs
        |  FROM daily GROUP BY 1),
        |tr AS (
        |  SELECT payment_mode, ds, vs,
        |         list_reduce(
        |           list_prepend([dvs[1]], list_transform(dvs[2:], v -> [v])),
        |           (a, x) -> list_concat(a,
        |             [CAST(ROUND(0.3 * x[1] + 0.7 * a[-1], 12)
        |                AS DECIMAL(26,12))])) AS traj
        |  FROM (SELECT payment_mode, ds, vs,
        |          list_transform(vs, v -> CAST(v AS DECIMAL(26,12))) AS dvs
        |        FROM series) sd),
        |expanded AS (
        |  SELECT payment_mode, unnest(range(1, len(vs) + 1)) AS t,
        |         ds, vs, traj
        |  FROM tr),
        |ew AS (
        |  SELECT payment_mode, ds[t] AS sale_date, vs[t] AS daily_total,
        |         CAST(ROUND(traj[t], 9) AS DOUBLE)
        |           AS ewma
        |  FROM expanded),
        |r AS (
        |  SELECT *, daily_total - forecast AS resid
        |  FROM (SELECT payment_mode, sale_date, daily_total, ewma,
        |               lag(ewma) OVER (PARTITION BY payment_mode
        |                 ORDER BY sale_date) AS forecast
        |        FROM ew) f),
        |st AS (
        |  SELECT payment_mode,
        |         sqrt(CAST(SUM(CAST(resid * resid AS DECIMAL(38,12)))
        |                AS DOUBLE) / (count(*) - 1)) AS sigma
        |  FROM r WHERE resid IS NOT NULL GROUP BY 1
        |  HAVING count(*) >= 2)
        |SELECT r.payment_mode, r.sale_date, r.daily_total, r.forecast,
        |       CASE WHEN st.sigma > 0
        |            THEN CAST(ROUND(CAST(r.resid / st.sigma
        |                   AS DECIMAL(20,12)), 9) AS DOUBLE) END AS z,
        |       coalesce(abs(r.resid) > 3 * st.sigma, false) AS is_anomaly
        |FROM r LEFT JOIN st USING (payment_mode)
        |ORDER BY payment_mode, sale_date""".stripMargin),
    // cohort twin: week-of-first-event cohorts; week grain is
    // ns/µs-truncation safe (see Analytics.cohortRetention)
    "q_cohort" ->
      s"""WITH first AS (
         |  SELECT user_id,
         |         CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
         |  FROM events GROUP BY 1),
         |act AS (
         |  SELECT DISTINCT e.user_id, f.cohort_week,
         |         CAST(date_diff('day', f.cohort_week,
         |           CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
         |           AS week_offset
         |  FROM events e JOIN first f USING (user_id)),
         |cells AS (SELECT cohort_week, week_offset, count(*) AS n_active
         |          FROM act GROUP BY 1, 2),
         |sizes AS (SELECT cohort_week, count(*) AS cohort_size
         |          FROM first GROUP BY 1)
         |SELECT c.cohort_week, c.week_offset, s.cohort_size, c.n_active,
         |       ${core.Money.Sql.ratio2("c.n_active", "s.cohort_size")}
         |         AS retention
         |FROM cells c JOIN sizes s USING (cohort_week)
         |ORDER BY cohort_week, week_offset""".stripMargin,
    // stream-order twin: a user's final row comes from their LAST wave
    // (wave = event_id % 3, applied 0 then 1 then 2), latest
    // (ts, event_id) within it
    "st_upsert" ->
      """WITH e AS (SELECT user_id, event_id, ts, event_type, value,
        |                  event_id % 3 AS wave FROM events),
        |mx AS (SELECT user_id, max(wave) AS wave FROM e GROUP BY 1),
        |w AS (SELECT e.* FROM e JOIN mx USING (user_id, wave))
        |SELECT user_id, last_event_id, last_ts, last_type, last_value FROM (
        |  SELECT user_id, event_id AS last_event_id, ts AS last_ts,
        |         event_type AS last_type, value AS last_value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM w) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // session_window twin: same islands as q_sessionize (session_window
    // merges sessions whose [ts, ts+gap] windows TOUCH — an event spaced
    // at exactly the gap still merges, pinned by StreamingSpec)
    "q_session_window" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us FROM events),
        |f AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |g AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM f),
        |h AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM g)
        |SELECT user_id, min(ts) AS session_start,
        |       count(*) AS n_events, max(ts) AS last_ts
        |FROM h GROUP BY user_id, session_idx
        |ORDER BY user_id, session_start""".stripMargin,
    "m_supplier_performance" -> SupplierPerformance.oracleSql,
    // 5 parameterized single-day builds, one per replayed DAY_DT
    "pipeline_backfill" -> {
      val days = (4 to 0 by -1).map(off =>
        RunClock.fixed.runDate.toLocalDate.minusDays(off.toLong))
      days.map(day =>
          s"SELECT * FROM (${SupplierPerformance.oracleSqlFor(s"DATE '$day'")})")
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY \"DAY_DT\", \"SUPPLIER_ID\"")
    },
    "m_product_performance" -> ProductPerformance.oracleSql,
    "m_customer_metrics" -> CustomerMetrics.oracleSql,
    "m_customer_sales_report" -> CustomerSalesReport.oracleSql,
    // approx-quantile verification: the Spark side emits whether each GK
    // cutoff honors its ±1% rank bound; the oracle is the contract
    "m_csr_approx_tiers" ->
      """SELECT 'gold' AS tier, TRUE AS within_bound
        |UNION ALL SELECT 'silver', TRUE ORDER BY tier""".stripMargin,
    // same boundary-tolerant contract oracle for the in-plan default path
    "m_csr_inplan_tiers" ->
      """SELECT 'gold' AS tier, TRUE AS within_bound
        |UNION ALL SELECT 'silver', TRUE ORDER BY tier""".stripMargin,
    "q_range_join" ->
      """WITH pts AS (
        |  SELECT o_orderkey AS point_order,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS p_epoch
        |  FROM orders),
        |iv AS (
        |  SELECT o_orderkey AS interval_id,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS s_epoch,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' + 14 AS e_epoch
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT interval_id, count(*) AS n_orders,
        |       min(point_order) AS first_order,
        |       max(point_order) AS last_order,
        |       CAST(sum(point_order) AS BIGINT) AS sum_orders,
        |       CAST(sum((point_order % 1000000007) * (point_order % 1000000007)
        |                % 1000000007) AS BIGINT) AS ssq_mod
        |FROM pts JOIN iv ON p_epoch >= s_epoch AND p_epoch <= e_epoch
        |GROUP BY interval_id
        |ORDER BY interval_id""".stripMargin,
    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |purch AS (
        |  SELECT user_id, ts, max(value) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.ts, c.value,
        |       p.purchase_value AS last_purchase_value
        |FROM clicks c
        |ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q_rank_family" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(ntile(4) OVER w AS INT) AS quartile,
        |         percent_rank() OVER w AS pct_rank,
        |         cume_dist() OVER w AS cume
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice, o_orderkey))
        |WHERE o_orderkey % 50 = 0
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_grouping_sets" ->
      (graft.sources.OracleCtes.withEntities("sales") +
        groupingSetsSql("sales")),
    "q_window_frames" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od, o_totalprice,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       lead(o_totalprice, 1) OVER w AS next_price,
        |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
        |         OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend,
        |       CAST(rank() OVER w AS INT) AS rnk,
        |       CAST(dense_rank() OVER w AS INT) AS drnk,
        |       CAST(row_number() OVER w AS INT) AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
        |ORDER BY o_custkey, od, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid ASC, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      ("""SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       """ + core.Money.Sql.round2(
        core.Money.Sql.moneySum("l_quantity")) + """ AS sum_qty,
        |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""").stripMargin,
    "raptor_checksum" ->
      """WITH h AS (
        |  SELECT o_orderkey % 16 AS bucket,
        |         CAST(('0x' || substr(md5(
        |           o_orderkey::VARCHAR || chr(1) || o_custkey::VARCHAR || chr(1) ||
        |           o_orderstatus), 1, 8)) AS BIGINT) AS h
        |  FROM orders)
        |SELECT bucket, count(*) AS n_rows, CAST(sum(h) AS VARCHAR) AS checksum
        |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_pivot" -> (graft.sources.OracleCtes.withEntities("sales") +
      """SELECT order_status,
        |       CAST(SUM(CASE WHEN payment_mode = 'Credit Card' THEN 1 ELSE 0 END) AS BIGINT) AS credit_card,
        |       CAST(SUM(CASE WHEN payment_mode = 'Debit Card' THEN 1 ELSE 0 END) AS BIGINT) AS debit_card,
        |       CAST(SUM(CASE WHEN payment_mode = 'UPI' THEN 1 ELSE 0 END) AS BIGINT) AS upi,
        |       CAST(SUM(CASE WHEN payment_mode = 'Cash on Delivery' THEN 1 ELSE 0 END) AS BIGINT) AS cash_on_delivery
        |FROM sales GROUP BY order_status ORDER BY order_status""".stripMargin),
    "q_unpivot" -> (graft.sources.OracleCtes.withEntities("sales") +
      """, w AS (
        |  SELECT order_status,
        |         CAST(SUM(CASE WHEN payment_mode = 'Credit Card' THEN 1 ELSE 0 END) AS BIGINT) AS credit_card,
        |         CAST(SUM(CASE WHEN payment_mode = 'Debit Card' THEN 1 ELSE 0 END) AS BIGINT) AS debit_card,
        |         CAST(SUM(CASE WHEN payment_mode = 'UPI' THEN 1 ELSE 0 END) AS BIGINT) AS upi,
        |         CAST(SUM(CASE WHEN payment_mode = 'Cash on Delivery' THEN 1 ELSE 0 END) AS BIGINT) AS cash_on_delivery
        |  FROM sales GROUP BY order_status)
        |SELECT order_status, payment_mode, n FROM (
        |  SELECT order_status, 'credit_card' AS payment_mode, credit_card AS n FROM w
        |  UNION ALL SELECT order_status, 'debit_card', debit_card FROM w
        |  UNION ALL SELECT order_status, 'upi', upi FROM w
        |  UNION ALL SELECT order_status, 'cash_on_delivery', cash_on_delivery FROM w)
        |ORDER BY order_status, payment_mode""".stripMargin),
    "q_json_funcs" ->
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
         |       ${core.Money.Sql.round2(core.Money.Sql.moneySum("l_extendedprice * (1 - l_discount)"))} AS sum_disc_price,
         |       COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey,
         |       ${core.Money.Sql.round2(core.Money.Sql.moneySum("l_extendedprice * (1 - l_discount)"))} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND EXISTS (SELECT 1 FROM customer
         |              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
         |GROUP BY l_orderkey
         |ORDER BY revenue DESC, l_orderkey ASC LIMIT 20""".stripMargin,
    "q18_large_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       CAST(total_qty AS DOUBLE) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(l_quantity) > 150) big
        |  ON o_orderkey = big.l_orderkey
        |ORDER BY total_qty DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q_revenue_by_region" ->
      s"""SELECT r_name,
         |       ${core.Money.Sql.round2(core.Money.Sql.moneySum("l_extendedprice * (1 - l_discount)"))} AS revenue,
         |       COUNT(*) AS n_lineitems
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name
         |ORDER BY r_name""".stripMargin)
}
