package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Join/aggregation key-skew diagnostics — the measurement that decides,
  * BEFORE a 100 TB run, whether a key needs [[Salting]] or AQE skew-join
  * handling: per-key count distribution (nearest-rank percentiles, max,
  * skew ratio) and the hottest keys with their row share.
  *
  * Scale shape: the only corpus-sized pass is the per-key count
  * aggregate (map-side partial combine, one shuffle at key grain).
  * Everything after runs at |distinct keys| grain — the windowed rank
  * is over the count frame, not the data, and is the documented cost:
  * fine up to tens of millions of keys; beyond that, sample keys or use
  * `approx_percentile` on the counts instead of exact ranks.
  *
  * Determinism: percentiles are NEAREST-RANK (the count value at rank
  * ⌈q·n_keys⌉) — pure integers, no interpolation arithmetic to diverge
  * across engines; ratio columns round 9 dp through decimal space.
  */
object SkewProfile {

  private val Dec = DecimalType(20, 12)
  private def round9(c: Column): Column = round(c.cast(Dec), 9).cast("double")

  private def counts(data: DataFrame, key: String): DataFrame =
    data.groupBy(key).agg(count(lit(1)).as("cnt"))

  /** One-row distribution summary of per-`key` counts: n_keys, n_rows,
    * max_cnt, p50/p90/p99 (nearest-rank), and skew_ratio = max/mean —
    * the number a salting decision reads (ratio ≈ 1 is uniform; ratio
    * ≥ partitions means one key dominates a whole task).
    */
  def summary(data: DataFrame, key: String): DataFrame = {
    val c = counts(data, key)
    // nk rides a second window over the already-single-partition ranked
    // frame (the rank window is the documented key-grain cost) — the
    // old crossBroadcast's broadcast side re-ran the corpus count
    // aggregation a second time for one scalar
    val ranked = c.select(col("cnt"),
      row_number().over(Window.orderBy("cnt")).as("rn"))
      .withColumn("nk", count(lit(1)).over(Window.partitionBy(lit(0))))
    def atRank(q: Double): Column =
      max(when(col("rn") <= ceil(lit(q) * col("nk")), col("cnt")))
    ranked
      .agg(
        max("nk").as("n_keys"),
        sum("cnt").as("n_rows"),
        max("cnt").as("max_cnt"),
        atRank(0.50).as("p50_cnt"),
        atRank(0.90).as("p90_cnt"),
        atRank(0.99).as("p99_cnt"))
      .withColumn("skew_ratio",
        round9(col("max_cnt").cast("double") * col("n_keys") / col("n_rows")))
      // a keyless (empty) input profiles to NO row, not an all-NULL row
      // (the global agg would otherwise emit one)
      .filter(col("n_keys").isNotNull)
  }

  /** The `n` hottest keys with count and row share (cnt/n_rows, 9 dp),
    * count-desc with key tie-break — the keys a salting rewrite (or an
    * AQE skew threshold) would target.
    */
  def hotKeys(data: DataFrame, key: String, n: Int = 5): DataFrame = {
    // top-n FIRST (TakeOrdered over the one key-grain aggregate, no
    // single-partition funnel), then the denominator joins in from a
    // plain column-pruned row count — Σ per-key cnt ≡ count(data)
    // exactly, and the old crossBroadcast's broadcast side re-ran the
    // whole groupBy for it
    val top = counts(data, key).orderBy(desc("cnt"), asc(key)).limit(n)
    graft.core.Scalars.crossBroadcast(top,
      data.agg(count(lit(1)).as("n_rows")))
      .select(col(key), col("cnt"),
        round9(col("cnt").cast("double") / col("n_rows")).as("share"))
      .orderBy(desc("cnt"), asc(key))
  }
}
