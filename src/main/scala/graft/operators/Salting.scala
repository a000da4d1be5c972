package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting for joins (SURVEY §7.4(9)).
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most
  * cases at runtime; explicit salting remains the tool when one side's
  * key distribution is so hot that even split partitions overwhelm a
  * task — e.g. a customer responsible for half the fact rows. The
  * skewed (large) side gets a random salt in [0, factor); the
  * replicated (small) side is exploded across all factor salts, then
  * the join key becomes (key, salt).
  *
  * Salt uses a deterministic hash of a provided tiebreak column rather
  * than rand() so results are reproducible and retries are safe.
  */
object Salting {

  def withSalt(df: DataFrame, tiebreak: Column, factor: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(tiebreak), lit(factor)).cast("int"))

  def replicated(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))

  /** Inner/left salted equi-join of a skewed fact against a dimension. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 tiebreak: Column, factor: Int,
                 joinType: String = "inner"): DataFrame =
    withSalt(fact, tiebreak, factor)
      .join(replicated(dim, factor), Seq(key, "__salt"), joinType)
      .drop("__salt")

  /** Two-phase salted aggregation of a skewed grouping key: phase 1
    * aggregates at (key, salt) — spreading one hot key across `factor`
    * reducers — phase 2 combines the per-salt partials at key grain.
    * Semantics-preserving only for aggregates that decompose into an
    * associative combine; callers pass the partial aggregates and the
    * matching combiners (e.g. decimal `sum` twice, `count` then `sum`).
    * Spark's own partial aggregation already map-side-combines, but its
    * final merge still routes ALL of a key's partials to one reducer —
    * with millions of map partitions at 100 TB, one hot key's merge
    * becomes a single-task straggler; the salt bounds any reducer's
    * input to |maps|/factor partials.
    */
  def twoPhaseAgg(df: DataFrame, key: String, tiebreak: Column, factor: Int,
                  partials: Seq[Column], combines: Seq[Column]): DataFrame =
    withSalt(df, tiebreak, factor)
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(combines.head, combines.tail: _*)
}
