package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction — the one-shot graph-ML member next
  * to [[Triangles]]: for every NON-edge pair with at least one shared
  * neighbor, the count of shared neighbors and the neighborhood-Jaccard
  * score `cn / (deg_a + deg_c − cn)`. On the mutual-kNN document graph
  * this surfaces near-dup / same-topic pairs the kNN edges themselves
  * missed (two docs each close to the same clique but not to each
  * other) — candidate edges for graph densification, or retrieval
  * expansion beyond the stored k.
  *
  * Scale shape: wedges enumerate from each CENTER node over both of its
  * incident directions — fan-out deg² per center, which on a kNN graph
  * is bounded by construction (deg ≤ k after the mutual restriction;
  * 25 pairs per center at k=5). On a GENERAL graph a hub center fans
  * out deg² wedges — a single million-degree node is 10¹² pairs — so
  * wedge enumeration skips centers above `maxCenterDeg` (the standard
  * hub-suppression cut: a shared million-degree neighbor carries ~zero
  * affinity signal anyway, which is the same observation behind the
  * dedup stack's `maxDf` stop-shingle caps). True degrees still feed
  * the score. Everything else is node-keyed joins and pair-grain
  * aggregation; the existing-edge removal is one anti join.
  */
object LinkPred {

  /** @param edges directed edges (`src`, `dst`); symmetrized and
    *              de-duplicated internally
    * @param topK  result cap (score desc, then pair asc — total order)
    * @param maxCenterDeg hub cut: centers with degree above this emit
    *              no wedges, bounding per-center fan-out at
    *              maxCenterDeg² (default 256 → ≤ 64k pairs/center;
    *              far above any kNN graph's k, so kNN results are
    *              unaffected)
    * @return (node_a, node_b, common, deg_a, deg_b, score), node_a <
    *         node_b, none of them an existing edge
    */
  def commonNeighborPairs(edges: DataFrame, topK: Int = 100,
                          maxCenterDeg: Int = 256): DataFrame = {
    require(topK >= 1, s"commonNeighborPairs: topK $topK")
    require(maxCenterDeg >= 1, s"commonNeighborPairs: maxCenterDeg $maxCenterDeg")
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    // sym feeds FIVE consumers below (both wedge sides, the anti-join
    // probe, and deg which itself is read three times): materialize both
    // once through the same cluster-aware seam as PageRank/KCore, or
    // every consumer re-runs the symmetrize-distinct shuffle AND the
    // caller's upstream edge derivation
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
    // hub cut BEFORE the self-join: only sub-threshold centers enumerate
    // wedges (deg² bound); scores below still use true degrees
    val capped = sym.join(
      deg.filter(col("deg") <= maxCenterDeg).select("src"), Seq("src"))
    // wedges through center b: every unordered out-pair of b's
    // neighborhood — each shared neighbor of (a, c) counted exactly once
    val wedges = capped.as("e1")
      .join(capped.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.dst").as("node_a"), col("e2.dst").as("node_b"))
    val cn = wedges.groupBy("node_a", "node_b")
      .agg(count(lit(1)).as("common"))
    // drop pairs that are ALREADY edges (sym holds both directions, so
    // one directional probe suffices under node_a < node_b)
    val candidates = cn.join(sym,
      cn("node_a") === sym("src") && cn("node_b") === sym("dst"),
      "left_anti")
    candidates
      .join(deg.select(col("src").as("node_a"), col("deg").as("deg_a")),
        Seq("node_a"))
      .join(deg.select(col("src").as("node_b"), col("deg").as("deg_b")),
        Seq("node_b"))
      .select(col("node_a"), col("node_b"), col("common"),
        col("deg_a"), col("deg_b"),
        round((col("common").cast("double")
          / (col("deg_a") + col("deg_b") - col("common")).cast("double"))
          .cast(d2012), 9).cast("double").as("score"))
      .orderBy(desc("score"), asc("node_a"), asc("node_b"))
      .limit(topK)
  }
}
