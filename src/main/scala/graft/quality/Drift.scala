package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift check between two document populations — the
  * Population Stability Index, the standard ML-ops alarm for "does the
  * new ingest wave look like the corpus the filters were tuned on?"
  * (a lang-mix or length-profile shift silently re-tunes every
  * downstream quality threshold). Sits next to Raptor's row-level
  * reconciliation: Raptor answers "are these the same rows", PSI
  * answers "is this the same DISTRIBUTION".
  *
  *   PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)
  *
  * with Laplace smoothing ((n_i + 1) / (N + B), B the bin count) so
  * empty bins never divide by zero. Conventional reading: < 0.1 stable,
  * 0.1–0.25 moderate shift, > 0.25 population change.
  *
  * Determinism discipline: proportions are exact integer→double
  * divisions; ln() is NOT correctly-rounded IEEE (libm-dependent), so
  * each ln output is decimal-rounded to 9 places before use — the same
  * absorption the DSIR/unigram scorers use — and each bin term
  * re-rounds after the multiply; the total crosses an order-free
  * DECIMAL sum. One corpus-grain aggregation at bin grain (counts for
  * both sides in a single pass), then bin-sized frames only.
  */
object Drift {

  private val Acc = DecimalType(28, 12)
  private def round9(c: Column): Column =
    round(c.cast(DecimalType(20, 12)), 9).cast("double")

  /** @param docs     input frame
    * @param value    numeric column to histogram
    * @param isWave   predicate splitting the frame: false side is the
    *                 reference population p, true side the wave q
    * @param binWidth fixed-width bin size (deterministic edges — no
    *                 data-dependent quantile edges, so two runs and two
    *                 engines bin identically)
    * @param nBins    cap: values beyond binWidth·nBins land in the top
    *                 bin; also the Laplace B
    * @return one row per OBSERVED bin (bucket, n_ref, n_wave, p, q,
    *         term) plus the repeated decimal-summed `psi` total,
    *         ordered by bucket
    */
  def psi(docs: DataFrame, value: Column, isWave: Column,
          binWidth: Int, nBins: Int = 20): DataFrame = {
    require(binWidth > 0 && nBins > 1, s"psi: bad bins $binWidth/$nBins")
    val binned = docs.select(
      least(floor(value / binWidth), lit(nBins - 1)).cast("long").as("bucket"),
      isWave.as("w"))
    val counts = binned.groupBy("bucket")
      .agg(sum(when(col("w"), 0L).otherwise(1L)).as("n_ref"),
        sum(when(col("w"), 1L).otherwise(0L)).as("n_wave"))
    // Totals and the PSI sum are whole-frame aggregates over the ≤nBins
    // bin frame, computed as unpartitioned windows OVER that frame so
    // the corpus scan runs exactly once. The previous nested
    // crossBroadcast form re-evaluated the counts subtree once per
    // broadcast side — four corpus scans for one bin-sized answer
    // (same finding as q_benford: 1.53 s → 0.48 s at sf1). ≤nBins rows
    // on one partition is the intended degenerate window.
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    counts
      .withColumn("p", (col("n_ref") + 1).cast("double") /
        (sum("n_ref").over(wAll) + nBins).cast("double"))
      .withColumn("q", (col("n_wave") + 1).cast("double") /
        (sum("n_wave").over(wAll) + nBins).cast("double"))
      .withColumn("term",
        round9((col("p") - col("q")) * round9(log(col("p") / col("q")))))
      .withColumn("psi",
        sum(col("term").cast(Acc)).over(wAll).cast("double"))
      .select(col("bucket"), col("n_ref"), col("n_wave"),
        round9(col("p")).as("p"), round9(col("q")).as("q"),
        col("term"), col("psi"))
      .orderBy("bucket")
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the reference
    * population (isWave false) and the ingest wave (isWave true):
    *
    *   D = max over v of |ECDF_ref(v) − ECDF_wave(v)|
    *
    * PSI's complement: PSI reads binned density shift (and needs a bin
    * width), KS reads the worst-case CDF gap at native value grain with
    * no tuning knob. The corpus is touched ONCE to count (value, side)
    * pairs; everything after runs at distinct-value grain, so the
    * global cumulative window is bounded by value cardinality, not
    * corpus size. For an unbounded-cardinality value (raw doubles),
    * bin first — same rule psi enforces via binWidth.
    *
    * Determinism: cumulative counts are exact long sums; each ECDF is
    * one long→double division (IEEE-exact, bit-identical cross-engine);
    * |diff| and max are exact. `at_value` is the smallest value
    * attaining D, found by exact bit-equality against the computed D —
    * safe because both engines derive the doubles through the identical
    * operation sequence. Output `ks_d` re-rounds through decimal like
    * every libm-adjacent emission.
    *
    * @return one row: n_ref, n_wave, ks_d, at_value
    */
  def ks(docs: DataFrame, value: Column, isWave: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.select(value.cast("long").as("v"), isWave.as("w"))
      .groupBy("v")
      .agg(sum(when(col("w"), 0L).otherwise(1L)).as("na"),
        sum(when(col("w"), 1L).otherwise(0L)).as("nb"))
    // distinct-value grain: the single-partition window is bounded by
    // |values|, not |docs| (see scaladoc)
    val cum = counts
      .withColumn("ca", sum("na").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cb", sum("nb").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // Totals and D are whole-frame aggregates over the distinct-value
    // frame — unpartitioned windows (the frame already crosses one for
    // the cumulative sums) so the corpus aggregation runs exactly once
    // instead of once per crossBroadcast side (the q_benford finding).
    val wAll = Window.partitionBy(lit(0))
    cum
      .withColumn("t_ref", max("ca").over(wAll))
      .withColumn("t_wave", max("cb").over(wAll))
      .withColumn("d", abs(col("ca").cast("double") / col("t_ref").cast("double")
        - col("cb").cast("double") / col("t_wave").cast("double")))
      .withColumn("d_max", max("d").over(wAll))
      .filter(col("d") === col("d_max"))
      .agg(max("t_ref").as("n_ref"), max("t_wave").as("n_wave"),
        round9(max("d_max")).as("ks_d"), min("v").as("at_value"))
  }
}
