package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (Seidman 1983) by iterative peeling — the
  * fourth member of the graph-analytics family: CC finds what is linked
  * at all, LPA finds dense regions, PageRank finds central nodes, the
  * k-core finds the maximal subgraph where EVERY member keeps at least
  * k neighbors after all weaker nodes are removed. On a kNN similarity
  * graph the k-core is the mutually-dense backbone (boilerplate/template
  * hubs and tight topic clusters survive; peripheral one-off documents
  * peel away) — a cheap integer-only structural signal for curation.
  *
  * Peeling is MONOTONE: once no node falls below k, further rounds are
  * identity. That gives the same oracle contract as
  * `connectedComponents`' fixpoint probe: Spark iterates until an edge
  * count stops changing (loud-fail past `maxRounds`), while the DuckDB
  * twin unrolls exactly `maxRounds` rounds — the extra rounds are
  * no-ops, so both engines land on the identical fixpoint.
  *
  * Distributed shape per round: one degree aggregation and two
  * semi-joins against the surviving-node set, all on node keys; one
  * driver-side `count()` per round reads a scalar (the same
  * convergence-probe pattern CC uses — not a data collect). Lineage
  * truncates per round through the cluster-aware checkpoint seam.
  */
object KCore {

  /** @param edges directed edge frame with `src`/`dst` (symmetrized
    *              internally; degrees are undirected-neighbor counts)
    * @param k minimum surviving degree
    * @param maxRounds loud-fail bound on peel rounds (each round removes
    *                  at least one node until the fixpoint, so the bound
    *                  only trips on adversarial chain-peel graphs)
    * @return (node, core_deg) for k-core members, ordered by node
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 12,
            driverCap: Int = DriverGraph.DefaultEdgeCap): DataFrame = {
    require(k >= 1, s"kCore: k $k < 1")
    require(maxRounds >= 1, s"kCore: maxRounds $maxRounds < 1")
    val spark = edges.sparkSession
    // index-sized graphs peel in memory (integer-only; same fixpoint
    // AND the same maxRounds loud-fail contract); see DriverGraph
    DriverGraph.collectUpTo(edges, driverCap) match {
      case Some(pairs) => return kCoreLocal(spark, pairs, k, maxRounds)
      case None => ()
    }
    def truncate(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()

    val dir = edges.select(col("src").cast("long"), col("dst").cast("long"))
    var sym = truncate(dir
      .unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct())
    var prev = sym.count()
    var converged = prev == 0L
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val alive = sym.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("src")
      val pruned = truncate(sym
        .join(alive, Seq("src"), "left_semi")
        .join(alive.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select("src", "dst"))
      val now = pruned.count()
      converged = now == prev
      prev = now
      sym = pruned
      rounds += 1
    }
    require(converged || prev == 0L,
      s"kCore: not converged after $maxRounds rounds ($prev edges live)")
    sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("int").as("core_deg"))
      .orderBy("node")
  }

  /** Exact in-memory [[kCore]]: same symmetrize, same peel-to-fixpoint
    * with the same `maxRounds` loud-fail — all integers.
    */
  private def kCoreLocal(spark: org.apache.spark.sql.SparkSession,
                         pairs: Array[(Long, Long)], k: Int,
                         maxRounds: Int): DataFrame = {
    import spark.implicits._
    var sym = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    var prev = sym.length.toLong
    var converged = prev == 0L
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val deg = scala.collection.mutable.HashMap.empty[Long, Long]
      sym.foreach { case (s, _) =>
        deg.updateWith(s)(c => Some(c.getOrElse(0L) + 1L))
      }
      val alive = deg.collect { case (v, d) if d >= k => v }.toSet
      val pruned = sym.filter { case (s, d) =>
        alive.contains(s) && alive.contains(d)
      }
      val now = pruned.length.toLong
      converged = now == prev
      prev = now
      sym = pruned
      rounds += 1
    }
    require(converged || prev == 0L,
      s"kCore: not converged after $maxRounds rounds ($prev edges live)")
    val core = scala.collection.mutable.HashMap.empty[Long, Int]
    sym.foreach { case (s, _) =>
      core.updateWith(s)(c => Some(c.getOrElse(0) + 1))
    }
    core.toArray.sortBy(_._1).toSeq.toDF("node", "core_deg")
  }
}
