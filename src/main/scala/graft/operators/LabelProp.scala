package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007) over an edge list — the third member of the graph-analytics
  * family: connected components answers "which documents are linked at
  * all", PageRank answers "which nodes are central", label propagation
  * answers "which DENSE region does each node belong to" (communities
  * split a component along sparse cuts — on a kNN similarity graph,
  * topic-ish clusters for balanced corpus sampling without training a
  * clusterer).
  *
  * Semantics, fully deterministic (no RNG, no float math): the graph is
  * symmetrized (an undirected kNN neighborhood); every node starts
  * labeled with its own id; each synchronous round every node adopts the
  * label most frequent among its neighbors AND itself — the self-vote is
  * the standard damping that breaks the two-coloring oscillation plain
  * synchronous LPA exhibits on bipartite regions (a 1–2 pair would swap
  * labels forever without it) — ties broken by the SMALLEST label. A
  * fixed round count keeps the DuckDB oracle expressible as unrolled
  * CTEs (production would fixpoint-probe like `connectedComponents`;
  * the update rule is identical).
  *
  * Distributed shape per round: one co-keyed join of the edge list
  * against the n-row label frame, one count at (node, label) grain, one
  * windowed top-1 at node grain (WindowGroupLimit — no full sort), all
  * integer-typed. Lineage truncates through the same cluster-aware seam
  * as CC/PageRank (`checkpoint()` when a checkpoint dir is configured,
  * else `localCheckpoint`), keeping the plan iteration-constant.
  */
object LabelProp {

  /** @param edges directed edge frame with `src` and `dst` columns
    *              (symmetrized internally)
    * @param iterations fixed synchronous round count
    * @return (node, community) ordered by node
    */
  def labelPropagate(edges: DataFrame, iterations: Int = 5,
                     driverCap: Int = DriverGraph.DefaultEdgeCap): DataFrame = {
    require(iterations >= 1, s"labelPropagate: iterations $iterations < 1")
    val spark = edges.sparkSession
    // index-sized graphs run the exact in-memory kernel (integer-only
    // update rule — trivially replicable); see DriverGraph for the
    // measured fixed-overhead rationale
    DriverGraph.collectUpTo(edges, driverCap) match {
      case Some(pairs) => return labelPropLocal(spark, pairs, iterations)
      case None => ()
    }
    def truncate(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()

    val dir = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val sym = truncate(dir
      .unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct())
    // symmetric closure ⇒ every participating node appears as a src
    val nodes = truncate(sym.select(col("src").as("node")).distinct())

    var lab = nodes.select(col("node"), col("node").as("lab"))
    val w = Window.partitionBy("node").orderBy(desc("c"), asc("lab"))
    for (_ <- 1 to iterations) {
      val counts = sym
        .join(lab.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("lab"))
        .unionByName(lab) // the self-vote
        .groupBy(col("node"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val best = counts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("node"), col("lab").as("blab"))
      // left join + coalesce: a node with no in-labels (impossible after
      // symmetrize, but cheap to keep correct for degenerate inputs)
      // keeps its current label
      lab = truncate(nodes
        .join(best, Seq("node"), "left")
        .join(lab, Seq("node"))
        .select(col("node"), coalesce(col("blab"), col("lab")).as("lab")))
    }
    lab.select(col("node"), col("lab").as("community")).orderBy("node")
  }

  /** Exact in-memory [[labelPropagate]]: same symmetrize + self-vote +
    * (count desc, label asc) adoption rule — all integers, so parity is
    * structural, not numeric.
    */
  private def labelPropLocal(spark: org.apache.spark.sql.SparkSession,
                             pairs: Array[(Long, Long)],
                             iterations: Int): DataFrame = {
    import spark.implicits._
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val nodes = sym.map(_._1).distinct
    var lab = nodes.iterator.map(v => v -> v).toMap
    for (_ <- 1 to iterations) {
      // votes at (node, label) grain: every in-neighbor's label + self
      val votes = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
      sym.foreach { case (s, d) =>
        votes.updateWith((d, lab(s)))(c => Some(c.getOrElse(0L) + 1L))
      }
      nodes.foreach { v =>
        votes.updateWith((v, lab(v)))(c => Some(c.getOrElse(0L) + 1L))
      }
      val best = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
      votes.foreach { case ((v, l), c) =>
        best.updateWith(v) {
          case Some((bc, bl)) if bc > c || (bc == c && bl < l) => Some((bc, bl))
          case _ => Some((c, l))
        }
      }
      lab = nodes.iterator.map(v => v -> best(v)._2).toMap
    }
    nodes.sorted.map(v => (v, lab(v))).toSeq.toDF("node", "community")
  }
}
