package graft.core

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  * collide and silently serve the wrong frame) AND a fingerprint of the
  * file listings under the plan's scans. sameResult alone is NOT enough
  * for file sources: InMemoryFileIndex.equals compares only rootPaths,
  * so a parquet path re-read AFTER an append/overwrite canonicalizes
  * equal to the pre-write plan — the documented incremental workflow
  * (a stored band/fingerprint index updated per wave and re-probed in
  * the same session) would silently probe the PREVIOUS wave's index.
  * Spark writers emit unique part-file names, so any append or
  * overwrite changes the listing and therefore the fingerprint; a
  * post-write re-read misses the stale entry and caches fresh (the
  * stale one ages out of the LRU). [[invalidate]] additionally drops a
  * tag's entries eagerly for callers that know they just rewrote the
  * backing path.
  *
  * Entries of stopped sessions are evicted before every lookup.
  */
object PlanMemo {
  private final val MaxPerTag = 4
  private val memo = new ConcurrentHashMap[(SparkSession, String),
    List[(LogicalPlan, Long, DataFrame)]]()

  /** Order-independent hash of every file path + length + modification
    * time under the plan's file-source scans (the listing is pinned at
    * read time inside the relation's FileIndex, so this reflects what
    * the plan WILL read, not what the path holds now). Mtime matters:
    * names + total size alone would let an IN-PLACE rewrite that
    * preserves both (same part-file names, same byte count — e.g. an
    * external process overwriting a stored index) serve a stale cached
    * frame; any rewrite bumps mtime, so the lookup misses and re-reads.
    */
  private def fileFingerprint(plan: LogicalPlan): Long = {
    var h = 1125899906842597L
    plan.foreach {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            // sum, not fold: leaf iteration order must not matter
            var acc = 0L
            fs.location.listFiles(Nil, Nil).foreach { pd =>
              pd.files.foreach { f =>
                acc += f.getPath.toString.hashCode.toLong * 31 +
                  f.getModificationTime * 7 + f.getLen
              }
            }
            h = h * 31 + acc
            h = h * 31 + fs.location.sizeInBytes
          case _ => ()
        }
      case _ => ()
    }
    h
  }

  def cached(tag: String, df: DataFrame): DataFrame =
    cachedAs(tag, df)(df)

  /** [[cached]] with the memo KEY decoupled from the cached FRAME: the
    * lookup matches on `key`'s plan, but a miss caches (and a hit
    * returns) `build`'s frame. For operators whose cached product
    * contains a NONDETERMINISTIC expression (e.g. a transient
    * `monotonically_increasing_id` dictionary id): nondeterministic
    * expressions never compare `sameResult`, so keying the memo on the
    * product plan itself would miss on every call and re-pay the cache
    * fill per invocation (the round-7 graph-family regression's
    * signature) while stacking duplicate persisted copies into the LRU.
    * Keying on the deterministic INPUT plan makes the repeat call a
    * map read. `build` is by-name — a hit never constructs the product
    * plan at all.
    */
  /** WARNING: `build` runs under the memo map's `compute` lock — it
    * must NOT itself call into PlanMemo (ConcurrentHashMap throws
    * "Recursive update"). Resolve any nested memoized frames BEFORE the
    * call and close over the resolved DataFrames.
    */
  def cachedAs(tag: String, key: DataFrame)(build: => DataFrame): DataFrame = {
    memo.keySet.removeIf(_._1.sparkContext.isStopped)
    val plan = key.queryExecution.analyzed
    val fp = fileFingerprint(plan)
    var out: DataFrame = null
    memo.compute((key.sparkSession, tag), (_, prev) => {
      val entries = Option(prev).getOrElse(Nil)
      entries.find(e => e._2 == fp && e._1.sameResult(plan)) match {
        case Some(hit) =>
          out = hit._3
          hit :: entries.filterNot(_ eq hit) // move-to-front LRU
        case None =>
          val (keep, evict) = ((plan, fp, build.cache()) :: entries).splitAt(MaxPerTag)
          evict.foreach(_._3.unpersist(blocking = false))
          out = keep.head._3
          keep
      }
    })
    out
  }

  /** Eagerly drop (and unpersist) every entry under `tag` for the
    * session — for callers that just rewrote a backing path and want
    * the executor storage back immediately rather than via LRU aging.
    */
  def invalidate(spark: SparkSession, tag: String): Unit = {
    val dropped = memo.remove((spark, tag))
    Option(dropped).foreach(_.foreach(_._3.unpersist(blocking = false)))
  }
}
