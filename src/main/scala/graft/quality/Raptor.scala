package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raptor — row/column-level source-vs-target reconciliation
  * (reference: `raptor/Raptor/Raptor.py`, submit flow :490-683).
  *
  * Decoupled from connectors: inputs are two DataFrames plus a key list
  * (the reference hardwires JDBC/parquet fetch, :112-137). The algebra is
  * preserved exactly:
  *   1. cast every column to string, null→'' (:551-557);
  *   2. row fingerprint `concat_ws('\u0001', cols…)` (:559-568);
  *   3. inner join on keys, keep fingerprint mismatches (:570-577);
  *   4. unpivot the two fingerprints to (source_value, target_value,
  *      column_name) — the reference does split + a SQL higher-order
  *      `transform` lambda + explode (:580-605); we use the native
  *      `posexplode(arrays_zip(...))`, same result without string
  *      re-parsing of the already-split arrays;
  *   5. extras on each side via anti-join semantics (:618-644 — the
  *      reference uses left/right joins + null filters; `left_anti` is
  *      the planner-native form, SURVEY §2.11 Q4);
  *   6. count summary (:295-436) and per-column mismatch summary
  *      (:440-473).
  *
  * Percentages use exact integer half-up arithmetic instead of
  * double-division + decimal cast so the rendering is engine-independent
  * (SURVEY §7.4(3) flags the reference's string-cast pitfalls).
  *
  * Known reference-faithful limitations (use [[compareTyped]] when they
  * matter): a data value CONTAINING the \u0001 separator shifts the split arrays and
  * misattributes that row's column diffs; `na.fill('')` conflates NULL
  * with empty string. The fingerprint frames are `cache()`d for the
  * multi-output pass and stay cached for the session — long-lived
  * sessions comparing many datasets should `spark.catalog.clearCache()`
  * between runs.
  *
  * Scale: both sides are fingerprinted map-side (narrow), the key join is
  * the only shuffle, and the unpivot explodes only mismatching rows —
  * at 100 TB the mismatch set is normally ≪ the input.
  */
object Raptor {

  final case class Result(
      colMismatch: DataFrame,
      sourceExtra: DataFrame,
      targetExtra: DataFrame,
      summary: DataFrame,
      columnSummary: DataFrame)

  private val Sep = "\u0001"

  /** Integral division via Catalyst's IntegralDivide (SQL `div`) — exact
    * on decimals at any magnitude, unlike a double `/` + floor() round
    * trip which goes wrong once intermediates pass 2^53.
    */
  private def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Exact half-up percentage with 2 decimals, as `NN.NN%`. All
    * arithmetic in DECIMAL(38,0) + integral division, so the rendering
    * is exact for any count a long can hold.
    */
  private[quality] def pctCol(numTimes100: Column, den: Column): Column = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val denD = den.cast(d38)
    val p = intDiv(
      numTimes100.cast(d38) * lit(10000L).cast(d38) + intDiv(denD, lit(2L).cast(d38)),
      denD)
    concat(intDiv(p, lit(100L)).cast("string"), lit("."),
      lpad(pmod(p, lit(100L)).cast("string"), 2, "0"), lit("%"))
  }

  private def pctStr(num: Long, den: Long): String = {
    val p = (num * 10000L + den / 2L) / den
    s"${p / 100L}.${"%02d".format(p % 100L)}%"
  }

  private def grouped(n: Long): String =
    String.format(java.util.Locale.US, "%,d", java.lang.Long.valueOf(n))

  def normalize(df: DataFrame, columns: Seq[String]): DataFrame =
    df.select(columns.map(c => col(c).cast("string").as(c)): _*).na.fill("")

  def fingerprint(df: DataFrame, columns: Seq[String], recordCol: String,
                  keys: Seq[String]): DataFrame =
    normalize(df, columns)
      .withColumn(recordCol, concat_ws(Sep, columns.map(col): _*))
      .select((keys :+ recordCol).map(col): _*)

  /** @param preflightK when > 0, append the [[keyOverlapSketch]]
    *   union/common/Jaccard/containment ESTIMATES to the summary (ords
    *   15–18) — the recon pre-flight a 100 TB run reads before paying
    *   for the full joins, surfaced in the report a user actually
    *   opens. Off (0) by default to keep the reference-shaped summary
    *   byte-stable for callers that pin it.
    */
  def compare(sourceDF: DataFrame, targetDF: DataFrame, keys: Seq[String],
              sourceSystem: String = "source", targetSystem: String = "target",
              datasetName: String = "dataset", preflightK: Int = 0): Result = {
    val colList = sourceDF.columns.toSeq

    // row-grain fingerprint frames: memoized for the multi-consumer
    // recon passes, size-gated on the input scan (a row-grain frame is
    // not pinnable at 100 TB — the duplicateSpans rule)
    def fpCached(tag: String, df: DataFrame, record: String) = {
      val plan = fingerprint(df, colList, record, keys)
      if (df.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30))
        graft.core.PlanMemo.cached(tag, plan)
      else plan
    }
    val source = fpCached("raptor.srcFp", sourceDF, "Source_Record")
    val target = fpCached("raptor.tgtFp", targetDF, "Target_Record")

    val validateData = source.join(target, keys)
      .where(col("Source_Record") =!= col("Target_Record"))
      .select(keys.map(col) :+
        split(col("Source_Record"), Sep).as("_2") :+
        split(col("Target_Record"), Sep).as("_3"): _*)

    val names = array(colList.map(lit): _*)
    val colMismatch = validateData
      .select(keys.map(col) :+
        posexplode(arrays_zip(col("_2"), col("_3"))): _*)
      .select(keys.map(col) :+
        col("col._2").as("source_value") :+
        col("col._3").as("target_value") :+
        names(col("pos")).as("mismatch_column_name"): _*)
      .filter(col("source_value") =!= col("target_value"))

    val sourceExtra = source.join(target, keys, "left_anti")
    val targetExtra = target.join(source, keys, "left_anti")

    // Counts in TWO jobs over the cached fingerprint frames (the
    // reference recomputes the joins per count, :276-289; round 1 here
    // ran six count actions). Job 1: one full-outer join + single
    // aggregate yields common/mismatch/extras — with duplicate keys the
    // full-outer join emits M×N rows for the matched part and M (resp.
    // N) for the unmatched sides, exactly matching the inner-join and
    // left_anti counts it replaces. Job 2: side-tagged union for the two
    // raw row counts (which are NOT derivable from the join when keys
    // duplicate).
    val cntRow = source.join(target, keys, "full_outer")
      .select(col("Source_Record").as("sr"), col("Target_Record").as("tr"))
      .agg(
        coalesce(sum(when(col("sr").isNotNull && col("tr").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("common"),
        coalesce(sum(when(col("sr").isNotNull && col("tr").isNotNull &&
          col("sr") =!= col("tr"), 1L).otherwise(0L)), lit(0L)).as("mismatch"),
        coalesce(sum(when(col("tr").isNull, 1L).otherwise(0L)), lit(0L))
          .as("src_extra"),
        coalesce(sum(when(col("sr").isNull, 1L).otherwise(0L)), lit(0L))
          .as("tgt_extra"))
      .head()
    val comparedCount = cntRow.getLong(0)
    val mismatchCount = cntRow.getLong(1)
    val sourceExtraCount = cntRow.getLong(2)
    val targetExtraCount = cntRow.getLong(3)
    val sideCounts = source.select(lit("s").as("side"))
      .union(target.select(lit("t").as("side")))
      .groupBy("side").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sourceCount = sideCounts.getOrElse("s", 0L)
    val targetCount = sideCounts.getOrElse("t", 0L)

    val spark = sourceDF.sparkSession
    import spark.implicits._
    // FIXED slot numbers (not a running index): the percentage row is
    // conditionally omitted per the reference (:378-395), and a running
    // index would renumber every later row — any consumer (or oracle)
    // addressing rows by ord would silently shift on a clean run.
    val base = Seq(
      (0, "Source System Name  ", sourceSystem),
      (1, "Target System Name  ", targetSystem),
      (2, "DataSet Compared b/w Source & Target  ", datasetName),
      (3, "Primary Keys used to Compare b/w Source & Target  ",
        keys.mkString("[", ", ", "]")),
      (4, s"Number of rows in Source [$sourceSystem]", grouped(sourceCount)),
      (5, s"Number of rows in Target [$targetSystem]", grouped(targetCount)),
      (6, "Number of rows in common ", grouped(comparedCount)),
      (7, "Number of rows mismatch ", grouped(mismatchCount))) ++
      (if (mismatchCount != 0)
        Seq((8, "Row Mismatch Percentage ", pctStr(mismatchCount, comparedCount)))
      else Seq.empty) ++ Seq(
      (9, s"Number of rows in Source $sourceSystem but not in Target $targetSystem",
        grouped(sourceExtraCount)),
      (10, s"Number of rows in Target $targetSystem but not in Source $sourceSystem",
        grouped(targetExtraCount)),
      (11, "Column Level Mismatch DataSet            ", s"work.col_$datasetName"),
      (12, "Column Level Mismatch Percentage Summary ", s"work.col_lvl_$datasetName"),
      (13, "Source Extra DataSet                     ", s"work.src_$datasetName"),
      (14, "Target Extra DataSet                     ", s"work.tgt_$datasetName"))
    // KMV pre-flight rows: estimates render through a fixed DECIMAL
    // chain (double → DECIMAL(20,12) → round 6 → DECIMAL(20,6) →
    // string) so both engines print the identical 6-decimal text —
    // raw double-to-string formatting is NOT cross-engine portable.
    val preflight: Seq[(Int, String, String)] =
      if (preflightK <= 0) Seq.empty
      else {
        val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
        val d206 = org.apache.spark.sql.types.DecimalType(20, 6)
        def dec6(c: Column) = round(c.cast(d2012), 6).cast(d206).cast("string")
        val e = keyOverlapSketch(sourceDF, targetDF, keys, preflightK)
          .select(dec6(col("est_union")), dec6(col("est_inter")),
            dec6(col("est_jaccard")), dec6(col("est_contain_src")))
          .head()
        val tag = s"KMV Key Pre-Flight [k=$preflightK]"
        Seq(
          (15, s"$tag: estimated distinct keys in union ", e.getString(0)),
          (16, s"$tag: estimated keys in common ", e.getString(1)),
          (17, s"$tag: estimated key Jaccard ", e.getString(2)),
          (18, s"$tag: estimated source-key containment in target ",
            e.getString(3)))
      }
    val summary = (base ++ preflight).toDF("ord", "Description", "Value")

    val columnSummary = colMismatch
      .groupBy(col("mismatch_column_name").as("Mismatch_Column_Name"))
      .agg(count(lit(1)).as("Mismatch_Record_Count_Column_Level"))
      .withColumn("Percentage_Of_Mismatch",
        pctCol(col("Mismatch_Record_Count_Column_Level"), lit(comparedCount)))
      .orderBy(desc("Percentage_Of_Mismatch"), asc("Mismatch_Column_Name"))

    Result(colMismatch, sourceExtra, targetExtra, summary, columnSummary)
  }

  /** Single-pass numeric column profiling — the "know your data before
    * you reconcile it" side of the quality module: per column, non-null
    * count, null count, exact distinct count, min/max, and mean. One
    * aggregate job over the table regardless of column count (the
    * reshape to long format explodes a 1-row frame); at 100 TB that is
    * one scan + one tiny final-combine, never a per-column pass.
    *
    * Cross-engine parity of the mean: values sum in DECIMAL(38,9) space
    * (exact, order-independent — a double sum would depend on partition
    * order), then one double division rounded through decimal.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile: empty column list")
    val d389 = org.apache.spark.sql.types.DecimalType(38, 9)
    val d3812 = org.apache.spark.sql.types.DecimalType(38, 12)
    // ONE shared row counter; per-column counters would each run on the
    // countDistinct-Expanded input stream for no information
    val aggs = count(lit(1)).as("__all") +: columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c"),
        sum(col(c).cast(d389)).as(s"__s_$c"))
    }
    val rows = columns.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__n_$c").as("n"),
        (col("__all") - col(s"__n_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"),
        round((col(s"__s_$c").cast("double") / col(s"__n_$c")).cast(d3812), 9)
          .cast("double").as("mean_value"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("p"))
      .select("p.*")
  }

  /** Bucket-grain table checksum — the first stage of reconciling two
    * 100 TB tables WITHOUT moving either: each side computes `buckets`
    * rows of (row count, sum of per-row content hashes), the tiny
    * checksum frames are exchanged and diffed, and only mismatching
    * buckets proceed to row-level [[compare]] on a key-range slice (the
    * Merkle-tree idea at one level). Hash sums are order-independent by
    * construction (addition commutes), so no sort anywhere; the per-row
    * hash is the leading 32 bits of md5 over the same ''-joined
    * string rendering [[fingerprint]] uses.
    */
  def checksum(df: DataFrame, keyCol: String, columns: Seq[String],
               buckets: Int = 1024): DataFrame = {
    // DECIMAL(38,0) sum: a LongType sum of ~2^31-mean hashes overflows
    // past ~4e9 rows per bucket, and under ANSI mode (this engine's
    // default) that is a job-killing ARITHMETIC_OVERFLOW at exactly the
    // table sizes the operator exists for
    val d380 = org.apache.spark.sql.types.DecimalType(38, 0)
    val rec = concat_ws(Sep,
      columns.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    df.select(pmod(col(keyCol), lit(buckets)).as("bucket"),
        conv(substring(md5(rec), 1, 8), 16, 10).cast(d380).as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), sum("h").as("checksum"))
  }

  /** Sketch-based source-vs-target KEY OVERLAP estimate — the
    * reconciliation pre-flight a 100 TB recon runs BEFORE committing to
    * the full fingerprint join: one pass per side builds a KMV/Theta
    * sketch of the key set ([[graft.functions.KmvSketch]], O(k) state,
    * map-side mergeable), and the union/intersection/Jaccard estimators
    * compose the two sketches without any cross-side join of the data.
    * Per-table key sketches can be PERSISTED by an ingest job and
    * compared later against any other table's sketch — set algebra HLL
    * cannot do — so "how much of source is missing from target" costs
    * k longs, not a 100 TB anti-join. The exact columns beside the
    * estimates (`n_src`/`n_tgt`/`n_union`/`n_inter`, from the real key
    * sets) are the gate's proof both engines derive the identical
    * sketch and estimator arithmetic; production callers read the
    * `est_*` columns.
    *
    * Hash: 48-bit md5 prefix of the `'|'`-joined key string (BIGINT-
    * exact on both engines, the q_kmv_overlap idiom). With k ≥ the true
    * key cardinality the estimators degrade to exact counts.
    */
  def keyOverlapSketch(sourceDF: DataFrame, targetDF: DataFrame,
                       keys: Seq[String], k: Int = 128): DataFrame = {
    require(keys.nonEmpty, "keyOverlapSketch: need at least one key column")
    val skey = concat_ws("|", keys.map(c => col(c).cast("string")): _*)
    def keySet(df: DataFrame) = df.select(skey.as("key")).distinct()
    val h = conv(substring(md5(col("key")), 1, 12), 16, 10).cast("long")
    def sketch(ks: DataFrame, skCol: String, nCol: String) = ks
      .agg(graft.functions.KmvSketch.kmvSketch(h, k).as(skCol),
        count(lit(1)).as(nCol))
    // each side's distinct key set feeds BOTH its sketch aggregate and
    // the exact-intersection join — uncached, that is two full distinct
    // passes over each input per call. Memoized (key grain, dim-sized
    // for recon inputs), size-gated on the input scan like every
    // corpus-adjacent memo.
    def cachedKeys(df: DataFrame, side: String) = {
      val ks = keySet(df)
      if (df.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30))
        graft.core.PlanMemo.cached(s"raptor.keySet.$side", ks)
      else ks
    }
    val srcKeys = cachedKeys(sourceDF, "src")
    val tgtKeys = cachedKeys(targetDF, "tgt")
    val inter = srcKeys.join(tgtKeys, "key")
      .agg(count(lit(1)).as("n_inter"))
    val joined = graft.core.Scalars.crossBroadcast(
      graft.core.Scalars.crossBroadcast(
        sketch(srcKeys, "ska", "n_src"), sketch(tgtKeys, "skb", "n_tgt")),
      inter)
    // per-side KMV estimate (θ = the side's k-th smallest hash = the
    // sketch's last element) feeds the CONTAINMENT estimates — "what
    // share of source keys does target hold" is the recon question the
    // Jaccard alone doesn't answer (asymmetric: a tiny subset has high
    // containment one way, near-zero the other)
    def sideEst(sk: String) =
      when(size(col(sk)) >= k,
        (lit((k - 1).toDouble) * lit(281474976710656.0))
          / element_at(col(sk), -1).cast("double"))
        .otherwise(size(col(sk)).cast("double"))
    // empty-side guards: m_size = 0 (both key sets empty) would make
    // est_jaccard NaN, and a 0.0 sideEst would push the containments to
    // NaN/Infinity — with preflightK > 0 those render as null Value
    // strings in the summary report. Emit 0.0 for empty sides instead
    // (the DuckDB twin mirrors the same CASE guards).
    graft.functions.KmvOverlap.withEstimates(joined, k)
      .withColumn("est_jaccard",
        when(col("m_size") > 0, col("est_jaccard")).otherwise(lit(0.0)))
      .withColumn("est_inter",
        when(col("m_size") > 0, col("est_inter")).otherwise(lit(0.0)))
      .withColumn("est_src", sideEst("ska"))
      .withColumn("est_tgt", sideEst("skb"))
      .select(col("n_src"), col("n_tgt"),
        (col("n_src") + col("n_tgt") - col("n_inter")).as("n_union"),
        col("n_inter"), col("m_size"),
        col("est_union"), col("est_inter"), col("est_jaccard"),
        when(col("est_src") > 0, col("est_inter") / col("est_src"))
          .otherwise(lit(0.0)).as("est_contain_src"),
        when(col("est_tgt") > 0, col("est_inter") / col("est_tgt"))
          .otherwise(lit(0.0)).as("est_contain_tgt"))
  }

  /** Typed column-wise compare (the hardening mode SURVEY §7.4(3) calls
    * for): no string canonicalization, no `na.fill('')` — each column is
    * compared with null-safe `<=>` on its NATIVE type, so NULL ≠ '' and
    * double/timestamp rendering differences can't mask or invent diffs.
    * Output matches the fingerprint mode's column-diff shape, with
    * values rendered to string only for display.
    */
  def compareTyped(sourceDF: DataFrame, targetDF: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val valueCols = sourceDF.columns.toSeq.filterNot(keys.contains)
    val src = sourceDF.alias("s")
    val tgt = targetDF.select(sourceDF.columns.toIndexedSeq.map(col): _*).alias("t")
    val joinCond = keys.map(k => col(s"s.$k") <=> col(s"t.$k")).reduce(_ && _)
    val joined = src.join(tgt, joinCond, "inner")
    val diffs = valueCols.map { c =>
      when(!(col(s"s.$c") <=> col(s"t.$c")),
        struct(col(s"s.$c").cast("string").as("source_value"),
          col(s"t.$c").cast("string").as("target_value"),
          lit(c).as("mismatch_column_name")))
    }
    joined
      .select(keys.map(k => col(s"s.$k").as(k)) :+
        explode(filter(array(diffs: _*), x => x.isNotNull)).as("d"): _*)
      .select(keys.map(col) :+
        col("d.source_value") :+ col("d.target_value") :+
        col("d.mismatch_column_name"): _*)
  }
}
