package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting + local clustering coefficient — the one-shot
  * (non-iterative) member of the graph-analytics family. On a mutual-
  * kNN document graph, a node's triangle density separates tight
  * template/boilerplate clusters (neighbors that also know each other)
  * from chain-like topical paths; the local clustering coefficient
  * `2·t / (deg·(deg−1))` is the normalized form.
  *
  * Scale shape (Schank & Wagner / "compact-forward"): edges are
  * ORIENTED from the (degree, id)-smaller endpoint to the larger one,
  * so every triangle is enumerated exactly once, and — the property
  * that matters at 100 TB — the join fan-out per node is bounded by its
  * ORIENTED out-degree, which the orientation caps near sqrt(m) even
  * for hub nodes: total work O(m^{3/2}) instead of sum-of-deg² that a
  * naive wedge join pays on skewed graphs. Three node-keyed hash joins,
  * no iteration, no driver-side data.
  */
object Triangles {

  /** @param edges directed edge frame with `src`/`dst`; symmetrized and
    *              de-duplicated internally (multigraph inputs collapse)
    * @return (node, degree, triangles, clustering_coeff) for every node
    *         of the symmetrized graph, ordered by node; coefficient is
    *         0.0 for degree < 2
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    // sym/deg/oriented each feed multiple joins below: materialize once
    // through the same cluster-aware seam as PageRank/KCore instead of
    // re-running the symmetrize shuffle per consumer
    val spark = edges.sparkSession
    def truncate(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()
    val dir = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val sym = truncate(dir
      .unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .filter(col("src") =!= col("dst")))
    val deg = truncate(sym.groupBy("src").agg(count(lit(1)).as("deg")))

    // total-order orientation key (deg, id): each undirected edge kept
    // exactly once, pointing at the larger endpoint
    val withDeg = sym
      .join(deg, Seq("src"))
      .join(
        deg.select(col("src").as("dst"), col("deg").as("ddeg")), Seq("dst"))
    val oriented = truncate(withDeg
      .filter(col("deg") < col("ddeg") ||
        (col("deg") === col("ddeg") && col("src") < col("dst")))
      .select(col("src"), col("dst")))

    // wedge a→b, b→c closed by a→c; orientation makes (a,b,c) unique
    val tri = oriented.as("ab")
      .join(oriented.as("bc"), col("ab.dst") === col("bc.src"))
      .join(oriented.as("ac"),
        col("ab.src") === col("ac.src") && col("bc.dst") === col("ac.dst"))
      .select(col("ab.src").as("a"), col("ab.dst").as("b"),
        col("bc.dst").as("c"))

    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("t"))

    deg.select(col("src").as("node"), col("deg"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        // one integer→double conversion per side and ONE IEEE division:
        // bit-identical on any engine, no decimal/double literal mixing
        when(col("deg") >= 2,
          (coalesce(col("t"), lit(0L)) * lit(2L)).cast("double") /
            (col("deg") * (col("deg") - lit(1L))).cast("double"))
          .otherwise(lit(0.0)).as("clustering_coeff"))
      .orderBy("node")
  }
}
