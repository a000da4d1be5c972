package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, lit, pmod, xxhash64}

/** Scalar/tiny-frame joins.
  *
  * `df.crossJoin(broadcast(tiny))` plans as a BroadcastNestedLoopJoin —
  * harmless when `tiny` is a 1-row aggregate or a handful of centroids,
  * but it makes "no nested-loop join anywhere" impossible to assert
  * mechanically. Joining on a constant key instead produces a
  * BroadcastHashJoin with identical semantics (every left row matches
  * every broadcast row), so ANY BroadcastNestedLoopJoin appearing in a
  * plan is a bug by invariant (PlanSpec enforces it across the whole
  * query inventory).
  */
object Scalars {

  private val Key = "__graft_scalar_k"

  /** Cross-join `df` with a broadcast dimension-sized frame via a
    * constant equi-key (BroadcastHashJoin, not nested-loop). The key is
    * `pmod(xxhash64(first column), 1)` — always 0, but built from data
    * so constant folding can't erase the join condition (a literal key
    * folds to `ON true` and Catalyst re-plans the nested loop this
    * helper exists to avoid).
    */
  def crossBroadcast(df: DataFrame, tiny: DataFrame): DataFrame = {
    def key(d: DataFrame) = pmod(xxhash64(col(d.columns.head)), lit(1L))
    df.withColumn(Key, key(df))
      .join(broadcast(tiny.withColumn(Key, key(tiny))), Key)
      .drop(Key)
  }
}
