package graft.core

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session-scoped memo for operator-INTERNAL cached frames (shingle
  * sets, signature frames, band indexes): the factored form of the
  * assignMemo/SqlLab eviction discipline.
  *
  * A bare `.cache()` inside an operator leaks one pinned copy per CALL
  * — a bench pass or a query stream that re-invokes the operator
  * accumulates executor storage and re-pays the cache fill every time
  * (a cached frame is only reusable through the same DataFrame object).
  * Routing the frame through `cached(tag, df)` instead keys it by
  * (session, tag, semantic plan): a repeated call with a semantically
  * identical plan returns the ALREADY-cached frame; distinct plans
  * coexist up to `MaxPerTag` per (session, tag), beyond which the
  * least-recently-used entry is unpersisted — bounded storage, no
  * leak, warm reuse.
  *
  * Lookup matches with `sameResult` (a semantic-hash key alone could
  * collide and silently serve the wrong frame); entries of stopped
  * sessions are evicted before every lookup.
  */
object PlanMemo {
  private final val MaxPerTag = 4
  private val memo = new ConcurrentHashMap[(SparkSession, String),
    List[(LogicalPlan, DataFrame)]]()

  def cached(tag: String, df: DataFrame): DataFrame = {
    memo.keySet.removeIf(_._1.sparkContext.isStopped)
    val plan = df.queryExecution.analyzed
    var out: DataFrame = df
    memo.compute((df.sparkSession, tag), (_, prev) => {
      val entries = Option(prev).getOrElse(Nil)
      entries.find(_._1.sameResult(plan)) match {
        case Some(hit) =>
          out = hit._2
          hit :: entries.filterNot(_ eq hit) // move-to-front LRU
        case None =>
          val (keep, evict) = ((plan, df.cache()) :: entries).splitAt(MaxPerTag)
          evict.foreach(_._2.unpersist(blocking = false))
          out = keep.head._2
          keep
      }
    })
    out
  }
}
