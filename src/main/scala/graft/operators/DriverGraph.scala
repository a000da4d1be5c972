package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.DataFrame

/** Driver-side kernels for INDEX-sized graphs — the [[graft.functions
  * .Dedup]] `driverClosure` discipline applied to the whole graph
  * family. ProfIncr measured the shape: a 5-iteration distributed
  * power/peel/propagate loop over a bench-scale kNN graph spends nearly
  * all its wall on FIXED per-round job overhead (checkpoint seams,
  * scalar probes, shuffle scheduling), not on data — graph_pagerank's
  * per-query exponent is b ≈ 0 while costing ~2 s. Below
  * [[DefaultEdgeCap]] input pairs (probed with a bounded
  * `limit(cap+1).collect()` — ONE job, no count) the iteration runs as
  * an exact in-memory kernel; above it the proven distributed path runs
  * unchanged, so a billion-edge graph degrades to shuffles instead of a
  * driver OOM.
  *
  * Every kernel replicates the operators' cross-engine determinism
  * discipline BIT-FOR-BIT (the oracle gate enforces it): per-edge terms
  * are IEEE double ops in the operators' exact expression order, every
  * sum crosses an exact DECIMAL(28,16)-scale accumulator
  * (`BigDecimal.valueOf` = Spark's shortest-string double→decimal cast,
  * then HALF_UP to scale 16 — addition is exact, order-free), and the
  * per-iteration / final roundings are HALF_UP at the operators'
  * scales.
  */
private[operators] object DriverGraph {

  /** ≤ 2²⁰ input pairs ≈ 16 MB of longs — bounded by contract, the
    * Bloom-words / centroid-ceiling pattern. Covers the kNN graphs the
    * bench runs at every measured SF while a corpus-grain edge list
    * (100 TB territory) stays distributed.
    *
    * `GRAFT_DRIVER_CAP=0` forces every graph kernel distributed — the
    * bench's kernels-off leg (`tools/bench_distributed.sh` →
    * `BENCH_distributed.json`), which keeps the fixpoint paths that
    * actually run at 100 TB perf-regression-gated every round instead
    * of only at the 30× gate. Output parity between the two regimes is
    * spec-pinned (`DriverGraphSpec`).
    *
    * The hard ceiling is 16× the default (2²⁴ pairs ≈ 256 MB of longs
    * before tuple boxing): a deliberate raise for a bigger driver is
    * honored, a raise past what any driver heap can hold is clamped
    * WITH a stderr warning (EnvKnobs emits it).
    */
  final val DefaultEdgeCap: Int =
    graft.core.EnvKnobs.boundedInt("GRAFT_DRIVER_CAP", 1 << 20, 1 << 24)

  /** The whole edge list iff it has at most `cap` rows, in ONE job:
    * `limit(cap+1)` returns every row when the frame is smaller than
    * the limit, and any cap+1 rows otherwise — the length test tells
    * which happened without a separate count.
    */
  def collectUpTo(edges: DataFrame, cap: Int): Option[Array[(Long, Long)]] = {
    if (cap <= 0) return None
    val spark = edges.sparkSession
    import spark.implicits._
    val rows = edges
      .selectExpr("CAST(src AS LONG) AS src", "CAST(dst AS LONG) AS dst")
      .as[(Long, Long)]
      .limit(cap + 1).collect()
    if (rows.length > cap) None else Some(rows)
  }

  /** Spark's `cast(double AS DECIMAL(28,16))`: shortest-decimal-string
    * conversion, then HALF_UP to scale 16. */
  def d16(x: Double): JBD =
    JBD.valueOf(x).setScale(16, RoundingMode.HALF_UP)

  /** Spark's `round(cast(x AS DECIMAL(28,16)), s)` followed by a double
    * cast. */
  def roundVia16(x: Double, s: Int): Double =
    d16(x).setScale(s, RoundingMode.HALF_UP).doubleValue
}
