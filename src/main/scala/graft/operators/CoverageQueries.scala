package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Money
import graft.quality.{DuplicateChecker, Raptor}
import graft.sources.Tables

/** Operator-coverage queries: one verifiable query per operator class in
  * SURVEY.md §2 that the mart pipelines don't already exercise. Each
  * query has a DuckDB oracle twin and ends in a deterministic ORDER BY.
  */
object CoverageQueries {
  private type Q = (SparkSession, String) => DataFrame

  // ── Raptor fixture: deterministic source/target derived from orders ──
  // (SURVEY §2.11 Q2-Q6). Mutations/deletions keyed on o_orderkey modulo.
  private def raptorPair(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val proj = Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_orderstatus"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("o_totalprice"),
      col("o_orderdate").cast("date").as("o_orderdate"),
      col("o_orderpriority"))
    val src = proj.filter(col("o_orderkey") % 89 =!= 0)
    val tgt = proj.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice", col("o_totalprice") +
        when(col("o_orderkey") % 100 === 0, 1).otherwise(0))
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 101 === 0, lit("MUTATED"))
          .otherwise(col("o_orderpriority")))
    (src, tgt)
  }

  // five query entries consume one compare; memoize per (session, sf)
  // so the six summary count actions and the fingerprint cache fill run
  // once, not five times
  private val raptorMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Raptor.Result]()

  private def raptor(s: SparkSession, d: String): Raptor.Result = {
    // a stopped session's memo entries (and their cache()d fingerprint
    // frames) are dead weight — evict before (not after) the lookup so
    // the map never grows past live sessions × sfDirs
    raptorMemo.keySet.removeIf(k => k._1.sparkContext.isStopped)
    raptorMemo.computeIfAbsent((s, d), { _ =>
      val (src, tgt) = raptorPair(s, d)
      Raptor.compare(src, tgt, Seq("o_orderkey"),
        sourceSystem = "source", targetSystem = "target",
        datasetName = "orders_diff", preflightK = 128)
    })
  }

  // Shared oracle CTEs for the raptor fixture: string-normalized sides.
  private val raptorCtes: String =
    """WITH src0 AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
      |         CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 89 != 0),
      |tgt0 AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         CAST(o_totalprice AS DECIMAL(18,2)) +
      |           CASE WHEN o_orderkey % 100 = 0 THEN 1 ELSE 0 END AS o_totalprice,
      |         CAST(o_orderdate AS DATE) AS o_orderdate,
      |         CASE WHEN o_orderkey % 101 = 0 THEN 'MUTATED'
      |              ELSE o_orderpriority END AS o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 != 0),
      |srcs AS MATERIALIZED (
      |  SELECT COALESCE(CAST(o_orderkey AS VARCHAR), '') AS o_orderkey,
      |         COALESCE(CAST(o_orderstatus AS VARCHAR), '') AS c_status,
      |         COALESCE(CAST(o_totalprice AS VARCHAR), '') AS c_price,
      |         COALESCE(CAST(o_orderdate AS VARCHAR), '') AS c_date,
      |         COALESCE(CAST(o_orderpriority AS VARCHAR), '') AS c_prio
      |  FROM src0),
      |tgts AS MATERIALIZED (
      |  SELECT COALESCE(CAST(o_orderkey AS VARCHAR), '') AS o_orderkey,
      |         COALESCE(CAST(o_orderstatus AS VARCHAR), '') AS c_status,
      |         COALESCE(CAST(o_totalprice AS VARCHAR), '') AS c_price,
      |         COALESCE(CAST(o_orderdate AS VARCHAR), '') AS c_date,
      |         COALESCE(CAST(o_orderpriority AS VARCHAR), '') AS c_prio
      |  FROM tgt0),
      |common AS MATERIALIZED (
      |  SELECT s.o_orderkey,
      |         s.c_status AS ss, t.c_status AS ts,
      |         s.c_price AS sp, t.c_price AS tp,
      |         s.c_date AS sd, t.c_date AS td,
      |         s.c_prio AS spr, t.c_prio AS tpr
      |  FROM srcs s JOIN tgts t USING (o_orderkey)),
      |mis AS MATERIALIZED (
      |  SELECT o_orderkey, ss AS source_value, ts AS target_value,
      |         'o_orderstatus' AS mismatch_column_name FROM common WHERE ss != ts
      |  UNION ALL
      |  SELECT o_orderkey, sp, tp, 'o_totalprice' FROM common WHERE sp != tp
      |  UNION ALL
      |  SELECT o_orderkey, sd, td, 'o_orderdate' FROM common WHERE sd != td
      |  UNION ALL
      |  SELECT o_orderkey, spr, tpr, 'o_orderpriority' FROM common WHERE spr != tpr)
      |""".stripMargin

  private val sep = "chr(1)"

  def queries: Map[String, Q] = Map(
    // Salting.twoPhaseAgg on a deliberately skewed key (event_type has
    // ~4 values over the whole events fact — each key IS a hot key):
    // phase 1 sums decimal partials at (key, salt), phase 2 combines at
    // key grain. Hash-compared against DuckDB's DIRECT single-phase
    // aggregate — decimal addition is associative, so the salted split
    // is provably semantics-preserving on real data, not just fixtures.
    "q_salted_agg" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Salting.twoPhaseAgg(ev, "event_type", col("event_id"), factor = 8,
        partials = Seq(Money.moneySum(col("value")).as("v_dec"),
          count(lit(1)).as("n_part")),
        combines = Seq(Money.round2(sum(col("v_dec"))).as("sum_value"),
          sum(col("n_part")).as("n_events")))
        .orderBy("event_type")
    }),
    // approx_count_distinct (HyperLogLog++, the cardinality path at
    // 100 TB — exact countDistinct shuffles every distinct value; the
    // sketch merges fixed 2^p-byte registers). Like the quantile-sketch
    // rows, the oracle checks the CONTRACT, not the estimate: the
    // default rsd=0.05 estimate must sit within 3 sigma of the exact
    // count computed in the same plan. HLL register merge is max-based
    // (commutative/associative), so the estimate is partition-order
    // deterministic and the booleans are stable.
    "q_approx_distinct" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      def ok(a: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
        abs(a.cast("double") - e.cast("double")) <= lit(0.15) * e.cast("double")
      li.agg(
        approx_count_distinct(col("l_orderkey")).as("a_ok"),
        countDistinct(col("l_orderkey")).as("e_ok"),
        approx_count_distinct(col("l_partkey")).as("a_pk"),
        countDistinct(col("l_partkey")).as("e_pk"))
        .select(explode(array(
          struct(lit("l_orderkey").as("column_name"),
            ok(col("a_ok"), col("e_ok")).as("within_bound")),
          struct(lit("l_partkey").as("column_name"),
            ok(col("a_pk"), col("e_pk")).as("within_bound")))).as("t"))
        .select(col("t.column_name").as("column_name"),
          col("t.within_bound").as("within_bound"))
        .orderBy("column_name")
    }),
    // Q2/Q3: column-level mismatch attribution
    "raptor_col_mismatch" -> ((s, d) =>
      raptor(s, d).colMismatch
        .orderBy("o_orderkey", "mismatch_column_name", "source_value")),
    // Q4: extras each side (left_anti)
    "raptor_src_extra" -> ((s, d) =>
      raptor(s, d).sourceExtra.orderBy("o_orderkey")),
    "raptor_tgt_extra" -> ((s, d) =>
      raptor(s, d).targetExtra.orderBy("o_orderkey")),
    // Q5: run summary
    "raptor_summary" -> ((s, d) => raptor(s, d).summary.orderBy("ord")),
    // Q6: per-column mismatch summary
    "raptor_col_summary" -> ((s, d) => raptor(s, d).columnSummary),
    // numeric column profiling: one aggregate pass, long-format output.
    // lineitem carries no NULLs, so NULLs are injected in-query on both
    // engines (the ts_redact pattern) — the null-count and null-skipping
    // mean branches are exercised by the ORACLE, not just by specs
    "raptor_profile" -> ((s, d) =>
      graft.quality.Raptor.profile(
        Tables.lineitem(s, d).withColumn("l_quantity",
          when(col("l_orderkey") % 7 === 0, lit(null))
            .otherwise(col("l_quantity"))),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_name")),

    // population-stability drift (PSI) between the stored corpus and
    // the ingest wave (doc_id % 5 == 0): fixed 50-char length bins —
    // deterministic edges, never data-dependent quantiles — Laplace
    // smoothing, decimal-rounded ln terms (ln is libm-dependent)
    "raptor_psi" -> ((s, d) =>
      graft.quality.Drift.psi(Tables.documents(s, d),
        col("n_chars"), col("doc_id") % 5 === 0, binWidth = 50)),

    // sketch-based recon pre-flight: KMV key sketches of the two raptor
    // sides composed into union/intersection/Jaccard estimates — the
    // KmvSketch set-algebra capability consumed by the platform (a
    // persisted per-table sketch answers "how much of source is missing
    // from target" without the 100 TB anti-join). Exact counts ride
    // along as the proof both engines derive the identical sketch.
    "raptor_kmv_overlap" -> ((s, d) => {
      val (src, tgt) = raptorPair(s, d)
      graft.quality.Raptor.keyOverlapSketch(src, tgt, Seq("o_orderkey"))
    }),

    // compareTyped: the NULL≠'' hardening mode — native-type null-safe
    // compare, no string normalization. The fixture injects the exact
    // diff class the fingerprint mode CANNOT see (NULL on one side,
    // empty string on the other) plus decimal and date mutations, so a
    // green row proves typed semantics end-to-end, not just agreement.
    "raptor_typed_mismatch" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val src = o.select(
        col("o_orderkey"),
        when(col("o_orderkey") % 11 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderstatus")).as("status"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"),
        col("o_orderdate").cast("date").as("odate"))
      val tgt = o.select(
        col("o_orderkey"),
        when(col("o_orderkey") % 11 === 0, lit(""))
          .otherwise(col("o_orderstatus")).as("status"),
        (col("o_totalprice").cast(DecimalType(18, 2)) +
          when(col("o_orderkey") % 100 === 0, 1).otherwise(0)).as("price"),
        date_add(col("o_orderdate").cast("date"),
          when(col("o_orderkey") % 97 === 0, 1).otherwise(0)).as("odate"))
      Raptor.compareTyped(src, tgt, keys = Seq("o_orderkey"))
        .orderBy("o_orderkey", "mismatch_column_name")
    }),

    // K4: MERGE upsert rewrite on a deterministic stage/target pair
    "k4_merge_upsert" -> ((s, d) => {
      val c = Tables.customer(s, d).select(
        col("c_custkey"), col("c_name"),
        col("c_acctbal").cast(DecimalType(18, 2)).as("bal"))
      val target = c.filter(col("c_custkey") % 3 =!= 0)
        .withColumn("load_ts", lit(java.sql.Timestamp.valueOf("2001-11-01 00:00:00")))
        .withColumn("update_ts", lit(java.sql.Timestamp.valueOf("2001-11-01 00:00:00")))
      val stage = c.filter(col("c_custkey") % 2 === 0)
        .withColumn("bal", col("bal") + 10)
        .withColumn("load_ts", lit(java.sql.Timestamp.valueOf("2001-11-05 00:00:00")))
        .withColumn("update_ts", lit(java.sql.Timestamp.valueOf("2001-11-05 00:00:00")))
      // The merge itself keeps the target's DECIMAL(18,2) typing (spec-tested
      // in MergeUpsertSpec); only the comparison surface casts bal to DOUBLE,
      // matching the Money.round2 family every other money column uses —
      // raw DECIMAL is the one representation the driver's hash diverges on.
      MergeUpsert.merge(target, stage, keys = Seq("c_custkey"),
        preserved = Seq("load_ts"))
        .withColumn("bal", col("bal").cast("double"))
        .orderBy("c_custkey")
    }),

    // K4 at history-table scale: PARTITION-SCOPED MERGE through a real
    // write + read-back — the target is the orders table partitioned by
    // order month, the stage touches ONE month (updates %3 keys, inserts
    // %5 keys under fresh ids), and mergeIntoPartitioned rewrites only
    // that month's directory (WriterSpec proves untouched partitions
    // byte-identical; this row proves the merge SEMANTICS end-to-end).
    // An ETL replay like pipeline_backfill — excluded from Bench.
    "k4_merge_partitioned" -> ((s, d) => {
      val month = java.sql.Date.valueOf("1996-03-01")
      val o = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"),
        date_trunc("month", col("o_orderdate").cast("date")).cast("date")
          .as("DAY_DT"))
      val stage = o.filter(col("DAY_DT") === lit(month) &&
          col("o_orderkey") % 3 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("price", col("price") + 1000)
        .unionByName(o.filter(col("DAY_DT") === lit(month) &&
            col("o_orderkey") % 5 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
      val root = graft.core.Scratch.fastTempDirectory("graft_pmerge",
        graft.core.Scratch.tableBytes(d, "orders") * 2)
      val dest = root.resolve("t").toString
      graft.pipeline.LayerWriter.mergeIntoPartitioned(s, o, dest,
        Seq("o_orderkey"), Seq.empty, "DAY_DT")
      graft.pipeline.LayerWriter.mergeIntoPartitioned(s, stage, dest,
        Seq("o_orderkey"), Seq.empty, "DAY_DT")
      graft.core.Scratch.materializeAndDelete(
        s.read.parquet(dest)
          .select(col("o_orderkey"), col("o_orderstatus"), col("price"),
            col("DAY_DT").cast("date").as("DAY_DT"))
          .orderBy("o_orderkey"),
        root)
    }),

    // K5-family: SCD Type 2 merge — history rows pass through, changed
    // keys close+reopen, unchanged stage rows replay as a no-op, new
    // keys insert open. Every branch is exercised at every SF: %4 keys
    // change segment, %3-not-%4 keys replay unchanged, %25 keys arrive
    // under a fresh business key, %10 keys carry prior history.
    "k5_scd2" -> ((s, d) => {
      val c = Tables.customer(s, d).select(
        col("c_custkey"), col("c_name"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").cast(DecimalType(18, 2)).as("bal"))
      val t2000 = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
      val t2001 = java.sql.Timestamp.valueOf("2001-01-01 00:00:00")
      val hist = c.filter(col("c_custkey") % 10 === 0)
        .withColumn("segment", lit("LEGACY"))
        .withColumn("valid_from", lit(t2000))
        .withColumn("valid_to", lit(t2001))
        .withColumn("is_current", lit(false))
      val cur = c
        .withColumn("valid_from", lit(t2001))
        .withColumn("valid_to", lit(null).cast("timestamp"))
        .withColumn("is_current", lit(true))
      val stage = c
        .filter(col("c_custkey") % 4 === 0 || col("c_custkey") % 3 === 0)
        .withColumn("segment",
          when(col("c_custkey") % 4 === 0, lit("PROMO"))
            .otherwise(col("segment")))
        // synthetic-insert offset must clear EVERY ScaleUp replica's
        // key range (replica·10⁶ + key, factor ≤ 100 ⇒ keys < 10⁸):
        // the original +10⁷ collided with replica ≥ 10 keys at sf3,
        // handing the merge conflicting duplicate business keys —
        // caught by the 30× gate, invisible at ≤ 10×
        .unionByName(c.filter(col("c_custkey") % 25 === 0)
          .select((col("c_custkey") + 1000000000L).as("c_custkey"),
            col("c_name"), lit("NEWKEY").as("segment"), col("bal")))
      ScdType2.merge(hist.unionByName(cur), stage, Seq("c_custkey"),
        java.sql.Timestamp.valueOf("2002-06-01 00:00:00"))
        .withColumn("bal", col("bal").cast("double"))
        .orderBy("c_custkey", "valid_from")
    }),

    // W1-family: top-1 part per supplier by revenue (window + rnk=1).
    // Pre-partitioned on the WINDOW key: HashPartitioning(suppkey)
    // satisfies both the (suppkey, partkey) aggregate's and the window's
    // clustering, so the plan carries ONE exchange instead of two —
    // and the pair grain here is nearly row grain (little partial-agg
    // reduction), so exchanging raw rows costs the same bytes.
    "q_window_topk" -> ((s, d) => {
      val li = Tables.lineitem(s, d).repartition(col("l_suppkey"))
      val perPart = li.groupBy("l_suppkey", "l_partkey")
        .agg(Money.round2(Money.moneySum(
          col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
      val w = Window.partitionBy("l_suppkey")
        .orderBy(desc_nulls_last("rev"), asc("l_partkey"))
      perPart.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1).drop("rnk")
        .orderBy("l_suppkey")
    }),

    // W2-family: mode of event_type per user (count + window, tie asc).
    // Same one-exchange shape as q_window_topk: partitioned on the
    // window key up front, the (user, type) aggregate and the window
    // both run exchange-free on it.
    "q_mode_window" -> ((s, d) => {
      val ev = Tables.events(s, d).repartition(col("user_id"))
      val cnts = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("user_id")
        .orderBy(desc("cnt"), asc("event_type"))
      cnts.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1).drop("rnk")
        .orderBy("user_id")
    }),

    // J12/J13: anti join — customers with no orders
    "q_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      // Filter the orders side so the anti-join is non-vacuous at every
      // SF: unfiltered, every customer has orders in the synthetic data
      // and both engines agree on the empty set — a green row that can
      // never fail. Dropping custkeys ≡ 0 (mod 7) guarantees real rows.
      val o = Tables.orders(s, d).filter(col("o_custkey") % 7 =!= 0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J14: semi join — customers with at least one delivered ('F') order
    "q_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // O1/O3: global sort + limit (TakeOrderedAndProject top-k)
    "q_sort_limit" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)),

    // A12: distinct on a projection
    "q_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")),

    // A1/Q1: duplicate detection groups (the dup-check gate's inner query)
    "q_dup_check" -> ((s, d) =>
      DuplicateChecker.duplicates(
        Tables.lineitem(s, d), Seq("l_orderkey", "l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")),

    // P8-P11: compound/range/membership/null predicates
    "q_filters" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity").between(10, 20) &&
          col("l_returnflag").isin("A", "N") &&
          col("l_shipdate").isNotNull &&
          col("l_linestatus") =!= "X")
        .filter("l_tax > 0.02")  // SQL-string predicate (P11)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").cast("double").as("qty"))
        .orderBy("l_returnflag")),

    // §2.9 scalar functions: string/conditional/math family
    "q_scalar_string" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        trim(concat(lit("  "), col("p_type"), lit(" "))).as("type_trim"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("name_underscored"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        round(col("p_retailprice")).cast("double").as("price_round0"),
        when(col("p_size") > 25, "large").otherwise("small").as("size_class"),
        coalesce(when(col("p_brand") === "Brand#1", lit(null))
          .otherwise(col("p_brand")), lit("(top)")).as("brand_or_top"))
        .orderBy("p_partkey")),

    // §2.9 date/time functions
    "q_scalar_date" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        date_format(col("o_orderdate"), "MMMM").as("month_name"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(lit(java.sql.Date.valueOf("2001-11-05")),
          col("o_orderdate").cast("date")).as("age_days"))
        .orderBy("o_orderkey")),

    // §2.8 set operations (free from Spark; absent in the reference)
    "q_set_ops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val evens = o.filter(col("o_orderkey") % 2 === 0).select("o_orderkey")
      val byFour = o.filter(col("o_orderkey") % 4 === 0).select("o_orderkey")
      val threes = o.filter(col("o_orderkey") % 3 === 0).select("o_orderkey")
      evens.except(byFour).intersect(threes)
        .union(o.filter(col("o_orderkey") % 1000 === 0).select("o_orderkey"))
        .distinct()
        .orderBy("o_orderkey")
    }),

    // Z-order layout: per-target-file min/max envelopes of the Morton
    // layout over (partkey-bucket, shipdate-bucket) — the footer stats
    // a 100 TB scan prunes on. The full 64-file envelope set is pinned
    // cross-engine; ZOrderSpec asserts the tighter-than-linear-sort
    // quantitative claim.
    "q_zorder" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val day = datediff(col("l_shipdate").cast("date"),
        to_date(lit("1992-01-01")))
      val dims = Seq(
        "pk_bucket" -> pmod(col("l_partkey"), lit(64)),
        "day_bucket" -> least(greatest(floor(day / 40), lit(0)), lit(63)))
      ZOrder.fileStats(li, dims, bits = 6, fileBits = 6).orderBy("file_id")
    }),

    // key-skew diagnostics: the pre-flight measurement a salting/AQE
    // decision reads (SkewProfile scaladoc); nearest-rank percentiles
    // keep the distribution row integer-exact cross-engine
    "q_key_skew" -> ((s, d) =>
      SkewProfile.summary(Tables.lineitem(s, d), "l_partkey")),
    "q_key_hot" -> ((s, d) =>
      SkewProfile.hotKeys(Tables.lineitem(s, d), "l_partkey", n = 5)),

    // A3/A6: conditional aggregation + guarded ratio-of-sums
    "q_conditional_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
          count(lit(1)).as("n"),
          Money.ratio2(Money.moneySum(col("o_totalprice")), count(lit(1)))
            .as("avg_price"))
        .orderBy("o_orderpriority")),

    // Bucketed co-located join (the shuffle-once layout, Bucketing
    // scaladoc): orders and lineitem are staged as 8-bucket tables on
    // the order key, then joined and aggregated AT the bucket key with
    // zero Exchange under the join or the per-order aggregate
    // (BucketingSpec pins the plan); only the final tiny regroup to
    // (priority, n_items) shuffles. Hash-compared against DuckDB's
    // plain join — bucketing must be invisible to the answer. The
    // staging write is part of the operator (it IS the layout cost a
    // 100 TB pipeline pays once), so the entry stays out of the warm
    // bench like the other ETL replays.
    "q_bucketed_join" -> ((s, d) => {
      val root = graft.core.Scratch.fastTempDirectory("graft_bucket",
        graft.core.Scratch.tableBytes(d, "orders")
          + graft.core.Scratch.tableBytes(d, "lineitem"))
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("gross"))
      val out = Bucketing.withColocated(s, o, "o_orderkey",
        li, "l_orderkey", nBuckets = 8, dir = root) { (bo, bl) =>
        val perOrder = bl.join(bo, bl("l_orderkey") === bo("o_orderkey"))
          .groupBy("o_orderkey", "o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            Money.moneySum(col("gross")).as("rev_dec"))
        perOrder.groupBy("o_orderpriority", "n_items")
          .agg(count(lit(1)).as("n_orders"),
            Money.round2(sum(col("rev_dec"))).as("sum_revenue"))
          .orderBy("o_orderpriority", "n_items")
      }
      graft.core.Scratch.materializeAndDelete(out, root)
    }),

    // k-anonymity risk profile over quasi-identifiers (segment, nation,
    // coarse balance band): the PII-risk gate a training-data release
    // runs before shipping attribute columns — any QI combination
    // matching fewer than k individuals re-identifies them. One
    // aggregation at QI grain; k_anon (the table's overall k) rides
    // along via a 1-row broadcast. Exact small-group arithmetic — no
    // estimation, so the oracle is a plain SQL twin.
    "q_kanon" -> ((s, d) => {
      val g = Tables.customer(s, d)
        .groupBy(col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal").cast("double") / 2000).cast("long")
            .as("bal_band"))
        .agg(count(lit(1)).as("n_rows"))
      // the table-wide minimum windows over the QI-grain frame (bounded
      // by |segments|·|nations|·|bands| — a few hundred rows by
      // contract) BEFORE the <5 filter; the crossBroadcast form re-ran
      // the corpus aggregation for its broadcast side
      g.withColumn("k_anon", min("n_rows").over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(0))))
        .filter(col("n_rows") < 5)
        .select(col("c_mktsegment"), col("c_nationkey"), col("bal_band"),
          col("n_rows"), col("k_anon"))
        .orderBy("c_mktsegment", "c_nationkey", "bal_band")
    }),

    // Two-sample KS drift between the stored corpus and the ingest wave
    // (doc_id % 5 == 0) on document length — PSI's no-knob complement
    // (Drift.ks scaladoc: one corpus pass, distinct-value-grain tail).
    "q_ks_drift" -> ((s, d) =>
      graft.quality.Drift.ks(Tables.documents(s, d),
        col("n_chars"), col("doc_id") % 5 === 0)),

    // l-diversity audit next to q_kanon: a QI group can be k-anonymous
    // yet still leak its sensitive attribute if every member shares one
    // value (homogeneity attack — Machanavajjhala et al.). Per
    // (nation, balance-band) QI group: group size, count of DISTINCT
    // sensitive values (market segment), flagged below l = 3; the
    // table-wide minimum rides along as a 1-row broadcast. Exact
    // small-group arithmetic, one aggregation at QI grain.
    "q_ldiv" -> ((s, d) => {
      val g = Tables.customer(s, d)
        .groupBy(col("c_nationkey"),
          floor(col("c_acctbal").cast("double") / 2000).cast("long")
            .as("bal_band"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("c_mktsegment")).as("l_div"))
      // same windowed-minimum-before-filter shape as q_kanon (QI grain
      // bounded by |nations|·|bands|)
      g.withColumn("min_l", min("l_div").over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(0))))
        .filter(col("l_div") < 3)
        .select(col("c_nationkey"), col("bal_band"), col("n_rows"),
          col("l_div"), col("min_l"))
        .orderBy("c_nationkey", "bal_band")
    }),

    // Snapshot time travel: three commits (append, append, logical
    // overwrite) into a copy-on-write SnapshotTable, then every
    // HISTORICAL version read back through its pinned manifest and
    // aggregated — v1 must still answer from under v2/v3 (SnapshotSpec
    // proves its files stay byte-identical). An ETL replay like the
    // merges — Bench-excluded.
    "k7_timetravel" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_totalprice").cast("double").as("price"))
      val root = graft.core.Scratch.fastTempDirectory("graft_snap",
        graft.core.Scratch.tableBytes(d, "orders") * 2)
      val dest = root.resolve("t").toString
      graft.pipeline.SnapshotTable.commit(
        o.filter(col("o_orderkey") % 3 === 0), dest)
      graft.pipeline.SnapshotTable.commit(
        o.filter(col("o_orderkey") % 3 === 1), dest)
      graft.pipeline.SnapshotTable.commit(
        o.filter(col("o_orderkey") % 3 === 2), dest, append = false)
      def agg(v: Int) = graft.pipeline.SnapshotTable.read(s, dest, v)
        .agg(count(lit(1)).as("n_orders"),
          Money.round2(Money.moneySum(col("price"))).as("total_price"))
        .select(lit(v).as("version"), col("n_orders"), col("total_price"))
      graft.core.Scratch.materializeAndDelete(
        agg(1).unionByName(agg(2)).unionByName(agg(3)).orderBy("version"),
        root)
    }),

    // Manifest data skipping end-to-end: orders committed as two
    // range-laid-out appends with o_orderdate stats, then a one-year
    // range read served through readWhere — whole files whose recorded
    // [min,max] envelope misses the range never enter the scan
    // (SnapshotSpec proves files are actually skipped and that Z-order
    // layouts prune on every stats dimension at once); this row proves
    // the skipping is answer-invisible against the layout-blind oracle.
    // An ETL replay — Bench-excluded.
    "k8_skipping" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"),
        col("o_totalprice").cast("double").as("price"))
      val root = graft.core.Scratch.fastTempDirectory("graft_skip",
        graft.core.Scratch.tableBytes(d, "orders"))
      val dest = root.resolve("t").toString
      graft.pipeline.SnapshotTable.commit(
        o.filter(col("o_orderkey") % 2 === 0)
          .repartitionByRange(6, col("od")),
        dest, statsCols = Seq("od"))
      graft.pipeline.SnapshotTable.commit(
        o.filter(col("o_orderkey") % 2 =!= 0)
          .repartitionByRange(6, col("od")),
        dest, statsCols = Seq("od"))
      val pruned = graft.pipeline.SnapshotTable.readWhere(s, dest, "od",
        java.sql.Date.valueOf("1995-01-01"),
        java.sql.Date.valueOf("1995-12-31"))
      graft.core.Scratch.materializeAndDelete(
        pruned
          .groupBy(date_trunc("month", col("od")).cast("date").as("month"))
          .agg(count(lit(1)).as("n_orders"),
            Money.round2(Money.moneySum(col("price"))).as("total_price"))
          .orderBy("month"),
        root)
    }),

    // Right-to-erasure replay: orders written month-partitioned to a
    // scratch store, then every order of the deletion-queue customers
    // (custkey ≡ 0 mod 97) is forgotten via deleteKeysPartitioned —
    // only partitions containing a hit are rewritten (WriterSpec proves
    // untouched files byte-identical and emptied partitions cleared);
    // this row proves the delete SEMANTICS end-to-end through a real
    // write + read-back. An ETL replay — excluded from Bench's warm set.
    "k6_forget" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"),
        date_trunc("month", col("o_orderdate").cast("date")).cast("date")
          .as("DAY_DT"))
      val root = graft.core.Scratch.fastTempDirectory("graft_forget",
        graft.core.Scratch.tableBytes(d, "orders") * 2)
      val dest = root.resolve("t").toString
      o.write.mode("overwrite").partitionBy("DAY_DT").parquet(dest)
      val keys = Tables.customer(s, d)
        .filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey").as("o_custkey"))
      graft.pipeline.LayerWriter.deleteKeysPartitioned(
        s, dest, "o_custkey", keys, "DAY_DT")
      graft.core.Scratch.materializeAndDelete(
        s.read.parquet(dest)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("price"), col("DAY_DT").cast("date").as("DAY_DT"))
          .orderBy("o_orderkey"),
        root)
    }))

  def oracles: Map[String, String] = Map(
    // plain (layout-blind) join — bucketing must not change the answer
    "q_bucketed_join" ->
      """WITH per_order AS (
        |  SELECT o_orderkey, o_orderpriority, count(*) AS n_items,
        |         SUM(CAST((l_extendedprice * (1 - l_discount))
        |           AS DECIMAL(38,6))) AS rev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2)
        |SELECT o_orderpriority, n_items, count(*) AS n_orders,
        |       CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS sum_revenue
        |FROM per_order GROUP BY 1, 2
        |ORDER BY o_orderpriority, n_items""".stripMargin,
    "q_kanon" ->
      """WITH g AS (
        |  SELECT c_mktsegment, c_nationkey,
        |         CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 2000) AS BIGINT)
        |           AS bal_band,
        |         count(*) AS n_rows
        |  FROM customer GROUP BY 1, 2, 3),
        |k AS (SELECT min(n_rows) AS k_anon FROM g)
        |SELECT c_mktsegment, c_nationkey, bal_band, n_rows, k_anon
        |FROM g CROSS JOIN k WHERE n_rows < 5
        |ORDER BY c_mktsegment, c_nationkey, bal_band""".stripMargin,
    "q_ldiv" ->
      """WITH g AS (
        |  SELECT c_nationkey,
        |         CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 2000) AS BIGINT)
        |           AS bal_band,
        |         count(*) AS n_rows,
        |         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_div
        |  FROM customer GROUP BY 1, 2),
        |m AS (SELECT min(l_div) AS min_l FROM g)
        |SELECT c_nationkey, bal_band, n_rows, l_div, min_l
        |FROM g CROSS JOIN m WHERE l_div < 3
        |ORDER BY c_nationkey, bal_band""".stripMargin,
    // each version's read-back must equal the cumulative (append) or
    // replacing (overwrite) filter the commits applied
    "k7_timetravel" ->
      """WITH o AS (SELECT o_orderkey,
        |                  CAST(o_totalprice AS DOUBLE) AS price
        |           FROM orders)
        |SELECT 1 AS version, count(*) AS n_orders,
        |       CAST(ROUND(SUM(CAST(price AS DECIMAL(38,6))), 2) AS DOUBLE)
        |         AS total_price
        |FROM o WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT 2, count(*),
        |       CAST(ROUND(SUM(CAST(price AS DECIMAL(38,6))), 2) AS DOUBLE)
        |FROM o WHERE o_orderkey % 3 IN (0, 1)
        |UNION ALL
        |SELECT 3, count(*),
        |       CAST(ROUND(SUM(CAST(price AS DECIMAL(38,6))), 2) AS DOUBLE)
        |FROM o WHERE o_orderkey % 3 = 2
        |ORDER BY version""".stripMargin,
    // the file-skipping read must equal the layout-blind range filter —
    // stats can only remove files the predicate rejects wholesale
    "k8_skipping" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS od,
        |                  CAST(o_totalprice AS DOUBLE) AS price
        |           FROM orders)
        |SELECT CAST(date_trunc('month', od) AS DATE) AS month,
        |       count(*) AS n_orders,
        |       CAST(ROUND(SUM(CAST(price AS DECIMAL(38,6))), 2) AS DOUBLE)
        |         AS total_price
        |FROM o
        |WHERE od >= DATE '1995-01-01' AND od <= DATE '1995-12-31'
        |GROUP BY 1 ORDER BY month""".stripMargin,
    // the store after the forget must equal a plain anti-join of the
    // original — partition-scoped rewrite is invisible to the answer
    "k6_forget" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |       CAST(o_totalprice AS DOUBLE) AS price,
        |       CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
        |         AS DAY_DT
        |FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
        |                        WHERE c_custkey % 97 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    "q_ks_drift" ->
      """WITH t AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v, (doc_id % 5 = 0) AS w
        |  FROM documents),
        |c AS (
        |  SELECT v, SUM(CASE WHEN w THEN 0 ELSE 1 END) AS na,
        |         SUM(CASE WHEN w THEN 1 ELSE 0 END) AS nb
        |  FROM t GROUP BY v),
        |cum AS (
        |  SELECT v,
        |         CAST(SUM(na) OVER (ORDER BY v) AS BIGINT) AS ca,
        |         CAST(SUM(nb) OVER (ORDER BY v) AS BIGINT) AS cb
        |  FROM c),
        |tot AS (SELECT MAX(ca) AS t_ref, MAX(cb) AS t_wave FROM cum),
        |diff AS (
        |  SELECT v, ABS(CAST(ca AS DOUBLE) / CAST(t_ref AS DOUBLE)
        |            - CAST(cb AS DOUBLE) / CAST(t_wave AS DOUBLE)) AS d
        |  FROM cum CROSS JOIN tot),
        |mx AS (SELECT MAX(d) AS d_max FROM diff)
        |SELECT MAX(t_ref) AS n_ref, MAX(t_wave) AS n_wave,
        |       CAST(ROUND(CAST(MAX(d_max) AS DECIMAL(20,12)), 9) AS DOUBLE)
        |         AS ks_d,
        |       MIN(v) AS at_value
        |FROM diff CROSS JOIN tot CROSS JOIN mx WHERE d = d_max""".stripMargin,
    // the bit-interleave SQL is GENERATED from the same lattice as the
    // Spark expression (ZOrder.zvalueSql) — the two sides cannot drift
    "q_zorder" -> {
      val zsql = ZOrder.zvalueSql(Seq("pk_bucket", "day_bucket"), 6)
      s"""WITH b AS (
         |  SELECT l_partkey % 64 AS pk_bucket,
         |         LEAST(GREATEST(date_diff('day', DATE '1992-01-01',
         |           CAST(l_shipdate AS DATE)) // 40, 0), 63) AS day_bucket
         |  FROM lineitem)
         |SELECT ($zsql >> 6) AS file_id, count(*) AS n_rows,
         |       min(pk_bucket) AS min_pk_bucket,
         |       max(pk_bucket) AS max_pk_bucket,
         |       min(day_bucket) AS min_day_bucket,
         |       max(day_bucket) AS max_day_bucket
         |FROM b GROUP BY 1 ORDER BY file_id""".stripMargin
    },
    "q_key_skew" ->
      """WITH c AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
        |r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt) AS rn FROM c),
        |nk AS (SELECT count(*) AS nk FROM c)
        |SELECT max(nk) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
        |       max(cnt) AS max_cnt,
        |       max(CASE WHEN rn <= ceil(0.50 * nk) THEN cnt END) AS p50_cnt,
        |       max(CASE WHEN rn <= ceil(0.90 * nk) THEN cnt END) AS p90_cnt,
        |       max(CASE WHEN rn <= ceil(0.99 * nk) THEN cnt END) AS p99_cnt,
        |       CAST(ROUND(CAST(CAST(max(cnt) AS DOUBLE) * max(nk) / sum(cnt)
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS skew_ratio
        |FROM r CROSS JOIN nk""".stripMargin,
    "q_key_hot" ->
      """WITH c AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(cnt) AS n_rows FROM c)
        |SELECT l_partkey, cnt,
        |       CAST(ROUND(CAST(CAST(cnt AS DOUBLE) / n_rows
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS share
        |FROM c CROSS JOIN t
        |ORDER BY cnt DESC, l_partkey ASC LIMIT 5""".stripMargin,
    // direct (unsalted) aggregate: equality proves the two-phase salted
    // path computes the same answer as the textbook single groupBy
    "q_salted_agg" ->
      """SELECT event_type,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_value,
        |       count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // boundary-tolerant contract oracle, like the quantile-sketch rows
    "q_approx_distinct" ->
      """SELECT 'l_orderkey' AS column_name, TRUE AS within_bound
        |UNION ALL SELECT 'l_partkey', TRUE ORDER BY column_name""".stripMargin,
    "raptor_col_mismatch" -> (raptorCtes +
      """SELECT * FROM mis
        |ORDER BY o_orderkey, mismatch_column_name, source_value""".stripMargin),
    "raptor_src_extra" -> (raptorCtes +
      s"""SELECT o_orderkey,
         |       concat_ws($sep, o_orderkey, c_status, c_price, c_date, c_prio) AS "Source_Record"
         |FROM srcs WHERE o_orderkey NOT IN (SELECT o_orderkey FROM tgts)
         |ORDER BY o_orderkey""".stripMargin),
    "raptor_tgt_extra" -> (raptorCtes +
      s"""SELECT o_orderkey,
         |       concat_ws($sep, o_orderkey, c_status, c_price, c_date, c_prio) AS "Target_Record"
         |FROM tgts WHERE o_orderkey NOT IN (SELECT o_orderkey FROM srcs)
         |ORDER BY o_orderkey""".stripMargin),
    "raptor_summary" -> (raptorCtes +
      """, kvs AS MATERIALIZED (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key FROM src0),
        |kvt AS MATERIALIZED (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key FROM tgt0),
        |kvhs AS MATERIALIZED (SELECT DISTINCT ('0x' || substr(md5(key), 1, 12))::BIGINT AS h FROM kvs),
        |kvht AS MATERIALIZED (SELECT DISTINCT ('0x' || substr(md5(key), 1, 12))::BIGINT AS h FROM kvt),
        |kvska AS MATERIALIZED (SELECT h FROM kvhs ORDER BY h LIMIT 128),
        |kvskb AS MATERIALIZED (SELECT h FROM kvht ORDER BY h LIMIT 128),
        |kvmg AS MATERIALIZED (SELECT h FROM kvska UNION SELECT h FROM kvskb),
        |kvm AS MATERIALIZED (SELECT h FROM kvmg ORDER BY h LIMIT 128),
        |kvms AS (SELECT count(*) AS m_size, max(h) AS theta,
        |                (SELECT count(*) FROM kvmg) AS union_sz FROM kvm),
        |kvic AS (SELECT count(*) AS i_cnt FROM kvm
        |         WHERE h IN (SELECT h FROM kvska) AND h IN (SELECT h FROM kvskb)),
        |kvest0 AS MATERIALIZED (SELECT
        |  CASE WHEN kvms.union_sz >= 128
        |       THEN (CAST(127 AS DOUBLE) * CAST(281474976710656 AS DOUBLE))
        |              / CAST(kvms.theta AS DOUBLE)
        |       ELSE CAST(kvms.union_sz AS DOUBLE) END AS est_union,
        |  CAST(kvic.i_cnt AS DOUBLE) / CAST(kvms.m_size AS DOUBLE) AS est_jaccard,
        |  CASE WHEN (SELECT count(*) FROM kvhs) >= 128
        |       THEN (CAST(127 AS DOUBLE) * CAST(281474976710656 AS DOUBLE))
        |              / CAST((SELECT max(h) FROM kvska) AS DOUBLE)
        |       ELSE CAST((SELECT count(*) FROM kvhs) AS DOUBLE) END AS est_src
        |  FROM kvms, kvic),
        |kvest AS MATERIALIZED (SELECT est_union, est_jaccard,
        |  est_jaccard * est_union AS est_inter,
        |  (est_jaccard * est_union) / est_src AS est_contain_src
        |  FROM kvest0),
        |cnts AS (
        |  SELECT (SELECT count(*) FROM srcs) AS sc,
        |         (SELECT count(*) FROM tgts) AS tc,
        |         (SELECT count(*) FROM common) AS cc,
        |         (SELECT count(*) FROM common
        |          WHERE ss != ts OR sp != tp OR sd != td OR spr != tpr) AS mc_rows,
        |         (SELECT count(*) FROM srcs WHERE o_orderkey NOT IN (SELECT o_orderkey FROM tgts)) AS se,
        |         (SELECT count(*) FROM tgts WHERE o_orderkey NOT IN (SELECT o_orderkey FROM srcs)) AS te)
        |SELECT ord, "Description", "Value" FROM (
        |  SELECT 0 AS ord, 'Source System Name  ' AS "Description", 'source' AS "Value" FROM cnts
        |  UNION ALL SELECT 1, 'Target System Name  ', 'target' FROM cnts
        |  UNION ALL SELECT 2, 'DataSet Compared b/w Source & Target  ', 'orders_diff' FROM cnts
        |  UNION ALL SELECT 3, 'Primary Keys used to Compare b/w Source & Target  ', '[o_orderkey]' FROM cnts
        |  UNION ALL SELECT 4, 'Number of rows in Source [source]', format('{:,}', sc) FROM cnts
        |  UNION ALL SELECT 5, 'Number of rows in Target [target]', format('{:,}', tc) FROM cnts
        |  UNION ALL SELECT 6, 'Number of rows in common ', format('{:,}', cc) FROM cnts
        |  UNION ALL SELECT 7, 'Number of rows mismatch ', format('{:,}', mc_rows) FROM cnts
        |  UNION ALL SELECT 8, 'Row Mismatch Percentage ',
        |    CAST(((mc_rows*10000 + cc//2)//cc)//100 AS VARCHAR) || '.' ||
        |    lpad(CAST(((mc_rows*10000 + cc//2)//cc)%100 AS VARCHAR), 2, '0') || '%'
        |  FROM cnts WHERE mc_rows != 0
        |  UNION ALL SELECT 9, 'Number of rows in Source source but not in Target target', format('{:,}', se) FROM cnts
        |  UNION ALL SELECT 10, 'Number of rows in Target target but not in Source source', format('{:,}', te) FROM cnts
        |  UNION ALL SELECT 11, 'Column Level Mismatch DataSet            ', 'work.col_orders_diff' FROM cnts
        |  UNION ALL SELECT 12, 'Column Level Mismatch Percentage Summary ', 'work.col_lvl_orders_diff' FROM cnts
        |  UNION ALL SELECT 13, 'Source Extra DataSet                     ', 'work.src_orders_diff' FROM cnts
        |  UNION ALL SELECT 14, 'Target Extra DataSet                     ', 'work.tgt_orders_diff' FROM cnts
        |  UNION ALL SELECT 15, 'KMV Key Pre-Flight [k=128]: estimated distinct keys in union ',
        |    CAST(CAST(ROUND(CAST(est_union AS DECIMAL(20,12)), 6) AS DECIMAL(20,6)) AS VARCHAR) FROM kvest
        |  UNION ALL SELECT 16, 'KMV Key Pre-Flight [k=128]: estimated keys in common ',
        |    CAST(CAST(ROUND(CAST(est_inter AS DECIMAL(20,12)), 6) AS DECIMAL(20,6)) AS VARCHAR) FROM kvest
        |  UNION ALL SELECT 17, 'KMV Key Pre-Flight [k=128]: estimated key Jaccard ',
        |    CAST(CAST(ROUND(CAST(est_jaccard AS DECIMAL(20,12)), 6) AS DECIMAL(20,6)) AS VARCHAR) FROM kvest
        |  UNION ALL SELECT 18, 'KMV Key Pre-Flight [k=128]: estimated source-key containment in target ',
        |    CAST(CAST(ROUND(CAST(est_contain_src AS DECIMAL(20,12)), 6) AS DECIMAL(20,6)) AS VARCHAR) FROM kvest
        |) t ORDER BY ord""".stripMargin),
    "raptor_col_summary" -> (raptorCtes +
      """, cc AS (SELECT count(*) AS n FROM common)
        |SELECT mismatch_column_name AS "Mismatch_Column_Name",
        |       count(*) AS "Mismatch_Record_Count_Column_Level",
        |       CAST(((count(*)*10000 + (SELECT n FROM cc)//2)//(SELECT n FROM cc))//100 AS VARCHAR) || '.' ||
        |       lpad(CAST(((count(*)*10000 + (SELECT n FROM cc)//2)//(SELECT n FROM cc))%100 AS VARCHAR), 2, '0') || '%'
        |         AS "Percentage_Of_Mismatch"
        |FROM mis GROUP BY mismatch_column_name
        |ORDER BY "Percentage_Of_Mismatch" DESC, "Mismatch_Column_Name" ASC""".stripMargin),
    "raptor_profile" -> {
      def colSql(c: String) =
        s"""SELECT '$c' AS col_name,
           |       count($c) AS n,
           |       count(*) - count($c) AS n_null,
           |       count(DISTINCT $c) AS n_distinct,
           |       CAST(min($c) AS DOUBLE) AS min_value,
           |       CAST(max($c) AS DOUBLE) AS max_value,
           |       CAST(ROUND(CAST(CAST(SUM(CAST($c AS DECIMAL(38,9))) AS DOUBLE)
           |            / count($c) AS DECIMAL(38,12)), 9) AS DOUBLE) AS mean_value
           |FROM li""".stripMargin
      "WITH li AS (SELECT l_extendedprice, l_discount, l_tax,\n" +
        "  CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_quantity END AS l_quantity\n" +
        "  FROM lineitem)\n" +
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(colSql).mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
    },
    // KMV key-overlap twin: the engine's sketch re-derived relationally
    // (the q_kmv_overlap pattern over the raptor fixture's key sets);
    // estimator arithmetic mirrored operand-for-operand — ints → double,
    // one mult, one divide, raw doubles bit-portable
    "raptor_kmv_overlap" ->
      """WITH srck AS (
        |  SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |tgtk AS (
        |  SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |hs AS (SELECT DISTINCT ('0x' || substr(md5(key), 1, 12))::BIGINT AS h
        |       FROM srck),
        |ht AS (SELECT DISTINCT ('0x' || substr(md5(key), 1, 12))::BIGINT AS h
        |       FROM tgtk),
        |ska AS (SELECT h FROM hs ORDER BY h LIMIT 128),
        |skb AS (SELECT h FROM ht ORDER BY h LIMIT 128),
        |mg AS (SELECT h FROM ska UNION SELECT h FROM skb),
        |m AS (SELECT h FROM mg ORDER BY h LIMIT 128),
        |ms AS (SELECT count(*) AS m_size, max(h) AS theta,
        |              (SELECT count(*) FROM mg) AS union_sz
        |       FROM m),
        |ic AS (SELECT count(*) AS i_cnt FROM m
        |       WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)),
        |n AS (SELECT (SELECT count(*) FROM srck) AS n_src,
        |             (SELECT count(*) FROM tgtk) AS n_tgt,
        |             (SELECT count(*) FROM srck s JOIN tgtk t USING (key)) AS n_inter),
        |se AS (SELECT
        |  CASE WHEN (SELECT count(*) FROM hs) >= 128
        |       THEN (CAST(127 AS DOUBLE) * CAST(281474976710656 AS DOUBLE))
        |              / CAST((SELECT max(h) FROM ska) AS DOUBLE)
        |       ELSE CAST((SELECT count(*) FROM hs) AS DOUBLE) END AS est_src,
        |  CASE WHEN (SELECT count(*) FROM ht) >= 128
        |       THEN (CAST(127 AS DOUBLE) * CAST(281474976710656 AS DOUBLE))
        |              / CAST((SELECT max(h) FROM skb) AS DOUBLE)
        |       ELSE CAST((SELECT count(*) FROM ht) AS DOUBLE) END AS est_tgt),
        |est AS (SELECT
        |  CASE WHEN ms.union_sz >= 128
        |       THEN (CAST(127 AS DOUBLE) * CAST(281474976710656 AS DOUBLE))
        |              / CAST(ms.theta AS DOUBLE)
        |       ELSE CAST(ms.union_sz AS DOUBLE) END AS est_union,
        |  -- empty-side guards mirror the engine: 0.0, never NaN/Inf
        |  CASE WHEN ms.m_size > 0
        |       THEN CAST(ic.i_cnt AS DOUBLE) / CAST(ms.m_size AS DOUBLE)
        |       ELSE 0.0 END AS est_jaccard
        |  FROM ms, ic)
        |SELECT n.n_src, n.n_tgt,
        |       n.n_src + n.n_tgt - n.n_inter AS n_union, n.n_inter,
        |       CAST(ms.m_size AS INT) AS m_size,
        |       est.est_union,
        |       est.est_jaccard * est.est_union AS est_inter,
        |       est.est_jaccard,
        |       CASE WHEN se.est_src > 0
        |            THEN (est.est_jaccard * est.est_union) / se.est_src
        |            ELSE 0.0 END AS est_contain_src,
        |       CASE WHEN se.est_tgt > 0
        |            THEN (est.est_jaccard * est.est_union) / se.est_tgt
        |            ELSE 0.0 END AS est_contain_tgt
        |FROM n, ms, est, se""".stripMargin,

    // PSI twin: same fixed bins, same Laplace smoothing, ln decimal-
    // rounded to 9 before the multiply, order-free decimal total
    "raptor_psi" ->
      """WITH b AS (
        |  SELECT least(CAST(floor(n_chars / 50) AS BIGINT), 19) AS bucket,
        |         doc_id % 5 = 0 AS w
        |  FROM documents),
        |c AS (SELECT bucket,
        |        CAST(SUM(CASE WHEN w THEN 0 ELSE 1 END) AS BIGINT) AS n_ref,
        |        CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT) AS n_wave
        |      FROM b GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
        |             CAST(SUM(n_wave) AS BIGINT) AS t_wave FROM c),
        |pq AS (SELECT bucket, n_ref, n_wave,
        |        CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + 20 AS DOUBLE) AS p,
        |        CAST(n_wave + 1 AS DOUBLE) / CAST(t_wave + 20 AS DOUBLE) AS q
        |      FROM c CROSS JOIN t),
        |terms AS (
        |  SELECT *,
        |         CAST(ROUND(CAST((p - q) *
        |             CAST(ROUND(CAST(ln(p / q) AS DECIMAL(20,12)), 9)
        |               AS DOUBLE)
        |           AS DECIMAL(20,12)), 9) AS DOUBLE) AS term
        |  FROM pq),
        |tot AS (SELECT CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE)
        |          AS psi FROM terms)
        |SELECT bucket, n_ref, n_wave,
        |       CAST(ROUND(CAST(p AS DECIMAL(20,12)), 9) AS DOUBLE) AS p,
        |       CAST(ROUND(CAST(q AS DECIMAL(20,12)), 9) AS DOUBLE) AS q,
        |       term, psi
        |FROM terms CROSS JOIN tot ORDER BY bucket""".stripMargin,

    // Native-type diff — NO string normalization anywhere: IS DISTINCT
    // FROM on the native columns, values rendered to VARCHAR only for
    // display. NULL vs '' must survive as a real mismatch row.
    "raptor_typed_mismatch" ->
      """WITH src AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderstatus END AS status,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |         CAST(o_orderdate AS DATE) AS odate
        |  FROM orders),
        |tgt AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 11 = 0 THEN '' ELSE o_orderstatus END AS status,
        |         CAST(o_totalprice AS DECIMAL(18,2))
        |           + CASE WHEN o_orderkey % 100 = 0 THEN 1 ELSE 0 END AS price,
        |         CAST(o_orderdate AS DATE)
        |           + CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS odate
        |  FROM orders),
        |j AS (
        |  SELECT s.o_orderkey,
        |         s.status AS s_status, t.status AS t_status,
        |         s.price AS s_price, t.price AS t_price,
        |         s.odate AS s_odate, t.odate AS t_odate
        |  FROM src s JOIN tgt t ON s.o_orderkey = t.o_orderkey)
        |SELECT o_orderkey, source_value, target_value, mismatch_column_name FROM (
        |  SELECT o_orderkey, CAST(s_status AS VARCHAR) AS source_value,
        |         CAST(t_status AS VARCHAR) AS target_value,
        |         'status' AS mismatch_column_name
        |  FROM j WHERE s_status IS DISTINCT FROM t_status
        |  UNION ALL
        |  SELECT o_orderkey, CAST(s_price AS VARCHAR), CAST(t_price AS VARCHAR), 'price'
        |  FROM j WHERE s_price IS DISTINCT FROM t_price
        |  UNION ALL
        |  SELECT o_orderkey, CAST(s_odate AS VARCHAR), CAST(t_odate AS VARCHAR), 'odate'
        |  FROM j WHERE s_odate IS DISTINCT FROM t_odate)
        |ORDER BY o_orderkey, mismatch_column_name""".stripMargin,
    "k4_merge_upsert" ->
      """WITH c AS (
        |  SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer),
        |tgt AS (
        |  SELECT *, TIMESTAMP '2001-11-01 00:00:00' AS load_ts,
        |         TIMESTAMP '2001-11-01 00:00:00' AS update_ts
        |  FROM c WHERE c_custkey % 3 != 0),
        |stg AS (
        |  SELECT c_custkey, c_name, bal + 10 AS bal,
        |         TIMESTAMP '2001-11-05 00:00:00' AS load_ts,
        |         TIMESTAMP '2001-11-05 00:00:00' AS update_ts
        |  FROM c WHERE c_custkey % 2 = 0)
        |SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
        |       CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
        |       CAST(CASE WHEN s.c_custkey IS NOT NULL THEN s.bal ELSE t.bal END
        |            AS DOUBLE) AS bal,
        |       CASE WHEN t.c_custkey IS NOT NULL THEN t.load_ts ELSE s.load_ts END AS load_ts,
        |       CASE WHEN s.c_custkey IS NOT NULL THEN s.update_ts ELSE t.update_ts END AS update_ts
        |FROM tgt t FULL OUTER JOIN stg s ON t.c_custkey = s.c_custkey
        |ORDER BY c_custkey""".stripMargin,
    // the twin replays the merge over the WHOLE table — equivalent
    // because every stage key lives in the touched month, so untouched
    // months pass through the full-outer unchanged, exactly as the
    // partition-scoped engine path leaves their files untouched
    "k4_merge_partitioned" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CAST(o_totalprice AS DOUBLE) AS price,
        |         CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS DAY_DT
        |  FROM orders),
        |stg AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, price + 1000 AS price, DAY_DT
        |  FROM o WHERE DAY_DT = DATE '1996-03-01' AND o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_orderstatus, price, DAY_DT
        |  FROM o WHERE DAY_DT = DATE '1996-03-01' AND o_orderkey % 5 = 0)
        |SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
        |            ELSE t.o_orderstatus END AS o_orderstatus,
        |       CASE WHEN s.o_orderkey IS NOT NULL THEN s.price
        |            ELSE t.price END AS price,
        |       CAST(CASE WHEN s.o_orderkey IS NOT NULL THEN s.DAY_DT
        |            ELSE t.DAY_DT END AS DATE) AS DAY_DT
        |FROM o t FULL OUTER JOIN stg s ON t.o_orderkey = s.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "k5_scd2" ->
      """WITH c AS (
        |  SELECT c_custkey, c_name, c_mktsegment AS segment,
        |         CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer),
        |hist AS (
        |  SELECT c_custkey, c_name, 'LEGACY' AS segment, bal,
        |         TIMESTAMP '2000-01-01 00:00:00' AS valid_from,
        |         TIMESTAMP '2001-01-01 00:00:00' AS valid_to,
        |         FALSE AS is_current
        |  FROM c WHERE c_custkey % 10 = 0),
        |cur AS (
        |  SELECT c_custkey, c_name, segment, bal,
        |         TIMESTAMP '2001-01-01 00:00:00' AS valid_from,
        |         CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
        |  FROM c),
        |stg AS (
        |  SELECT c_custkey, c_name,
        |         CASE WHEN c_custkey % 4 = 0 THEN 'PROMO' ELSE segment END
        |           AS segment, bal
        |  FROM c WHERE c_custkey % 4 = 0 OR c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000000, c_name, 'NEWKEY', bal
        |  FROM c WHERE c_custkey % 25 = 0),
        |j AS (
        |  SELECT t.c_custkey AS t_key, s.c_custkey AS s_key,
        |         t.c_name AS t_name, s.c_name AS s_name,
        |         t.segment AS t_seg, s.segment AS s_seg,
        |         t.bal AS t_bal, s.bal AS s_bal,
        |         t.valid_from AS t_from, t.valid_to AS t_to,
        |         (t.c_name IS DISTINCT FROM s.c_name)
        |           OR (t.segment IS DISTINCT FROM s.segment)
        |           OR (t.bal IS DISTINCT FROM s.bal) AS changed
        |  FROM cur t FULL OUTER JOIN stg s ON t.c_custkey = s.c_custkey)
        |SELECT c_custkey, c_name, segment, CAST(bal AS DOUBLE) AS bal,
        |       valid_from, valid_to, is_current FROM (
        |  SELECT t_key AS c_custkey, t_name AS c_name, t_seg AS segment,
        |         t_bal AS bal, t_from AS valid_from, t_to AS valid_to,
        |         TRUE AS is_current
        |  FROM j WHERE t_key IS NOT NULL AND (s_key IS NULL OR NOT changed)
        |  UNION ALL
        |  SELECT t_key, t_name, t_seg, t_bal, t_from,
        |         TIMESTAMP '2002-06-01 00:00:00', FALSE
        |  FROM j WHERE t_key IS NOT NULL AND s_key IS NOT NULL AND changed
        |  UNION ALL
        |  SELECT s_key, s_name, s_seg, s_bal,
        |         TIMESTAMP '2002-06-01 00:00:00', CAST(NULL AS TIMESTAMP), TRUE
        |  FROM j WHERE s_key IS NOT NULL AND (t_key IS NULL OR changed)
        |  UNION ALL
        |  SELECT c_custkey, c_name, segment, bal, valid_from, valid_to,
        |         is_current
        |  FROM hist)
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "q_window_topk" ->
      s"""WITH per_part AS (
         |  SELECT l_suppkey, l_partkey,
         |         ${Money.Sql.round2(Money.Sql.moneySum("l_extendedprice * (1 - l_discount)"))} AS rev
         |  FROM lineitem GROUP BY l_suppkey, l_partkey)
         |SELECT l_suppkey, l_partkey, rev FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey
         |    ORDER BY rev DESC NULLS LAST, l_partkey ASC) AS rnk
         |  FROM per_part) r
         |WHERE rnk = 1 ORDER BY l_suppkey""".stripMargin,
    "q_mode_window" ->
      """SELECT user_id, event_type, cnt FROM (
        |  SELECT user_id, event_type, count(*) AS cnt,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY count(*) DESC, event_type ASC) AS rnk
        |  FROM events GROUP BY user_id, event_type) r
        |WHERE rnk = 1 ORDER BY user_id""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_custkey % 7 != 0)
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_dup_check" ->
      """SELECT l_orderkey, l_linenumber, count(*) AS cnt FROM lineitem
        |GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filters" ->
      """SELECT l_returnflag, count(*) AS n, CAST(SUM(l_quantity) AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_returnflag IN ('A', 'N')
        |  AND l_shipdate IS NOT NULL
        |  AND l_linestatus != 'X'
        |  AND l_tax > 0.02
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_scalar_string" ->
      """SELECT p_partkey,
        |       upper(p_name) AS name_upper,
        |       lower(p_brand) AS brand_lower,
        |       trim('  ' || p_type || ' ') AS type_trim,
        |       concat_ws('-', p_brand, p_type) AS brand_type,
        |       replace(p_name, ' ', '_') AS name_underscored,
        |       split_part(p_name, ' ', 1) AS first_word,
        |       substring(p_name, 1, 5) AS name_prefix,
        |       CAST(length(p_name) AS INT) AS name_len,
        |       CAST(round(p_retailprice) AS DOUBLE) AS price_round0,
        |       CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class,
        |       COALESCE(nullif(p_brand, 'Brand#1'), '(top)') AS brand_or_top
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_date" ->
      """SELECT o_orderkey,
        |       CAST(o_orderdate AS DATE) AS od,
        |       CAST(year(o_orderdate) AS INT) AS y,
        |       CAST(month(o_orderdate) AS INT) AS m,
        |       CAST(day(o_orderdate) AS INT) AS dom,
        |       strftime(o_orderdate, '%Y-%m') AS ym,
        |       strftime(o_orderdate, '%B') AS month_name,
        |       CAST(o_orderdate AS DATE) + 30 AS plus30,
        |       CAST(DATE '2001-11-05' - CAST(o_orderdate AS DATE) AS INT) AS age_days
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_set_ops" ->
      """SELECT DISTINCT o_orderkey FROM (
        |  (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0
        |   EXCEPT
        |   SELECT o_orderkey FROM orders WHERE o_orderkey % 4 = 0)
        |  INTERSECT
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0
        |  UNION
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 1000 = 0
        |) t ORDER BY o_orderkey""".stripMargin,
    "q_conditional_agg" ->
      s"""SELECT o_orderpriority,
         |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         |       count(*) AS n,
         |       ${Money.Sql.ratio2(Money.Sql.moneySum("o_totalprice"), "count(*)")} AS avg_price
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
