package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Power-iteration PageRank over an edge list — the second half of the
  * graph-analytics pair next to [[graft.functions.Dedup
  * .connectedComponents]]: CC answers "which documents form one
  * duplicate cluster", PageRank answers "which nodes are central" (in a
  * kNN similarity graph, centrality ≈ prototypicality — hub documents /
  * canonical cluster exemplars; on a link graph it is literal citation
  * rank).
  *
  * Distributed shape per iteration: one co-keyed join of the edge list
  * against the n-row rank frame, one dst-grain aggregation, one
  * left-anti scalar for dangling mass — all shuffles on node keys, no
  * driver-side loops over data. Lineage truncates through the same
  * cluster-aware seam as CC (`checkpoint()` when a checkpoint dir is
  * configured, else `localCheckpoint`), so the plan stays iteration-
  * constant instead of doubling per round — the property that makes 20
  * iterations at 100 TB feasible.
  *
  * Determinism discipline (both engines derive bit-identical doubles):
  * per-edge contributions are IEEE double divisions; every sum crosses
  * an order-free DECIMAL(28,16) accumulator; each iteration's rank
  * re-rounds to 12 decimals in decimal space; teleport and damping are
  * the SAME parsed literals on both sides (never `1 − damping` computed
  * in one engine — 1.0−0.85 is not the double 0.15 parses to).
  */
object PageRank {

  private val Acc = DecimalType(28, 16)
  private def decSum(c: Column): Column = sum(c.cast(Acc)).cast("double")
  private def round12(c: Column): Column =
    round(c.cast(Acc), 12).cast("double")

  /** @param edges    directed edge frame with `src` and `dst` columns
    * @param iterations fixed power-iteration count (production runs
    *                   converge-test instead; a fixed count keeps the
    *                   oracle expressible as unrolled CTEs)
    * @param damping  walk-continuation probability, as a literal
    * @param teleport the restart mass, as a literal — passed (not
    *                 derived) for cross-engine double identity
    * @return (node, pr) with pr rounded to 9 decimals
    */
  def pageRank(edges: DataFrame, iterations: Int = 5,
               damping: Double = 0.85, teleport: Double = 0.15,
               driverCap: Int = DriverGraph.DefaultEdgeCap): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations $iterations < 1")
    val spark = edges.sparkSession
    // index-sized graphs run the exact in-memory kernel (see
    // DriverGraph: the distributed loop's wall is fixed per-round job
    // overhead at bench scale, b ≈ 0); bigger graphs fall through to
    // the proven distributed path
    DriverGraph.collectUpTo(edges, driverCap) match {
      case Some(pairs) =>
        return pageRankLocal(spark, pairs, iterations, damping, teleport)
      case None => ()
    }
    def truncate(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()

    val e = truncate(edges.select(col("src").cast("long"),
      col("dst").cast("long")).distinct())
    val nodes = truncate(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct())
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = truncate(e.join(deg, "src"))

    // n is a config-sized scalar (like the ANN centroid collect): the
    // teleport term needs it as a plan literal on both engines
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val invN = lit(1.0 / n)

    // the SET of dangling nodes (no out-edges) is iteration-independent
    // — only their mass varies. When the set is empty (every kNN graph:
    // each vector probes ≥ 1 cell), the per-iteration anti-join +
    // scalar broadcast is pure overhead: dang ≡ 0.0 and x + 0.0·invN
    // is bit-identical to x for the non-negative rank masses here, so
    // the fast path computes the exact same doubles with one fewer
    // shuffle and one fewer broadcast per iteration.
    val hasDangling = nodes
      .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
      .limit(1).count() > 0

    var pr = nodes.select(col("node"), invN.as("pr"))
    for (i <- 1 to iterations) {
      val sums = withDeg
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(decSum(col("pr") / col("deg")).as("m"))
      val next = if (hasDangling) {
        val dangling = pr
          .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
          .agg(coalesce(decSum(col("pr")), lit(0.0)).as("dang"))
        graft.core.Scalars.crossBroadcast(
            nodes.join(sums, Seq("node"), "left"), dangling)
          .select(col("node"),
            round12(lit(teleport) * invN + lit(damping) *
              (coalesce(col("m"), lit(0.0)) + col("dang") * invN)).as("pr"))
      } else {
        nodes.join(sums, Seq("node"), "left")
          .select(col("node"),
            round12(lit(teleport) * invN + lit(damping) *
              coalesce(col("m"), lit(0.0))).as("pr"))
      }
      // Truncation cadence: the dangling path references pr TWICE per
      // round (sums + dangling mass) — untruncated lineage doubles per
      // round, so it checkpoints every round. The fast path references
      // pr exactly once — lineage grows LINEARLY — so an eager
      // materialization every round is pure scheduler latency; every
      // 4th round bounds both plan depth and job count. Checkpointing
      // never changes values, only where the plan is cut.
      pr = if (hasDangling || i % 4 == 0) truncate(next) else next
    }
    pr.select(col("node"),
        round(col("pr").cast(Acc), 9).cast("double").as("pr"))
      .orderBy(desc("pr"), asc("node"))
  }

  /** Personalized PageRank (random walk with restart to a SEED set) —
    * the corpus-expansion primitive: seed a handful of curated
    * documents and the stationary distribution ranks the whole graph
    * by multi-hop similarity to them, which is how a small trusted set
    * bootstraps a much larger training subset ("find everything that
    * the seed neighborhood keeps linking to"). Identical distributed
    * shape and determinism discipline as [[pageRank]]; the only change
    * is WHERE restart mass lands — teleport AND dangling mass go to
    * the seeds (weight 1/|S∩V|) instead of uniformly to all nodes, so
    * unreachable nodes hold exactly 0.0 on both engines.
    *
    * @param seeds frame with a `node` column; restricted to graph
    *              nodes (mass must not leak to absent seeds)
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iterations: Int = 5, damping: Double = 0.85,
                           teleport: Double = 0.15,
                           driverCap: Int = DriverGraph.DefaultEdgeCap): DataFrame = {
    require(iterations >= 1, s"personalizedPageRank: iterations $iterations < 1")
    val spark = edges.sparkSession
    // same index-sized fast path as pageRank; the seed frame is
    // by-contract small (a curated set) and collected alongside
    DriverGraph.collectUpTo(edges, driverCap) match {
      case Some(pairs) =>
        val seedIds = seeds.select(col("node").cast("long"))
          .limit(driverCap + 1).collect().map(_.getLong(0))
        if (seedIds.length <= driverCap)
          return pprLocal(spark, pairs, seedIds, iterations, damping, teleport)
      case None => ()
    }
    def truncate(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()

    val e = truncate(edges.select(col("src").cast("long"),
      col("dst").cast("long")).distinct())
    val nodes = truncate(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct())
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = truncate(e.join(deg, "src"))

    val hasDangling = nodes
      .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
      .limit(1).count() > 0
    val seedNodes = nodes.join(
      seeds.select(col("node").cast("long")), Seq("node"), "left_semi")
    val nSeeds = seedNodes.count()
    require(nSeeds > 0, "personalizedPageRank: no seed overlaps the graph")
    val invS = lit(1.0 / nSeeds)
    // node frame carrying the restart weight: 1/|S| on seeds, 0 off
    val nodesW = truncate(nodes
      .join(seedNodes.withColumn("sw", invS), Seq("node"), "left")
      .select(col("node"), coalesce(col("sw"), lit(0.0)).as("sw")))

    var pr = nodesW.select(col("node"), col("sw").as("pr"))
    for (i <- 1 to iterations) {
      val sums = withDeg
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(decSum(col("pr") / col("deg")).as("m"))
      // same empty-dangling fast path as pageRank: (teleport +
      // damping·0.0)·sw ≡ teleport·sw bit-for-bit
      val next = if (hasDangling) {
        val dangling = pr
          .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
          .agg(coalesce(decSum(col("pr")), lit(0.0)).as("dang"))
        graft.core.Scalars.crossBroadcast(
            nodesW.join(sums, Seq("node"), "left"), dangling)
          .select(col("node"),
            round12((lit(teleport) + lit(damping) * col("dang")) * col("sw")
              + lit(damping) * coalesce(col("m"), lit(0.0))).as("pr"))
      } else {
        nodesW.join(sums, Seq("node"), "left")
          .select(col("node"),
            round12(lit(teleport) * col("sw")
              + lit(damping) * coalesce(col("m"), lit(0.0))).as("pr"))
      }
      // same truncation cadence as pageRank (see there)
      pr = if (hasDangling || i % 4 == 0) truncate(next) else next
    }
    pr.select(col("node"),
        round(col("pr").cast(Acc), 9).cast("double").as("pr"))
      .orderBy(desc("pr"), asc("node"))
  }

  /** Exact in-memory [[pageRank]] — identical doubles by construction:
    * same per-edge double division, same decimal-exact order-free sums
    * ([[DriverGraph.d16]]), same expression order and HALF_UP
    * roundings. The oracle gate holds both paths to the same hash.
    */
  private def pageRankLocal(spark: org.apache.spark.sql.SparkSession,
                            pairs: Array[(Long, Long)], iterations: Int,
                            damping: Double, teleport: Double): DataFrame = {
    import DriverGraph._
    import spark.implicits._
    val e = pairs.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.length
    require(n > 0, "pageRank: empty graph")
    val invN = 1.0 / n
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.length.toDouble }
    val hasDangling = nodes.exists(v => !deg.contains(v))
    var pr = nodes.iterator.map(v => v -> invN).toMap
    for (_ <- 1 to iterations) {
      val acc = scala.collection.mutable.HashMap.empty[Long, java.math.BigDecimal]
      e.foreach { case (s, d) =>
        val t = d16(pr(s) / deg(s))
        acc.updateWith(d) { prev => Some(prev.fold(t)(_.add(t))) }
      }
      val next =
        if (hasDangling) {
          var dangAcc = java.math.BigDecimal.ZERO
          nodes.foreach(v => if (!deg.contains(v)) dangAcc = dangAcc.add(d16(pr(v))))
          val dang = dangAcc.doubleValue
          nodes.iterator.map { v =>
            val m = acc.get(v).map(_.doubleValue).getOrElse(0.0)
            v -> roundVia16(teleport * invN + damping * (m + dang * invN), 12)
          }.toMap
        } else nodes.iterator.map { v =>
          val m = acc.get(v).map(_.doubleValue).getOrElse(0.0)
          v -> roundVia16(teleport * invN + damping * m, 12)
        }.toMap
      pr = next
    }
    nodes.map(v => (v, roundVia16(pr(v), 9)))
      .sortBy { case (v, p) => (-p, v) }
      .toSeq.toDF("node", "pr")
  }

  /** Exact in-memory [[personalizedPageRank]] — see [[pageRankLocal]]. */
  private def pprLocal(spark: org.apache.spark.sql.SparkSession,
                       pairs: Array[(Long, Long)], seedIds: Array[Long],
                       iterations: Int, damping: Double,
                       teleport: Double): DataFrame = {
    import DriverGraph._
    import spark.implicits._
    val e = pairs.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val nodeSet = nodes.toSet
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.length.toDouble }
    val hasDangling = nodes.exists(v => !deg.contains(v))
    val seedsIn = seedIds.distinct.filter(nodeSet.contains)
    require(seedsIn.nonEmpty, "personalizedPageRank: no seed overlaps the graph")
    val invS = 1.0 / seedsIn.length
    val seedSet = seedsIn.toSet
    def sw(v: Long): Double = if (seedSet.contains(v)) invS else 0.0
    var pr = nodes.iterator.map(v => v -> sw(v)).toMap
    for (_ <- 1 to iterations) {
      val acc = scala.collection.mutable.HashMap.empty[Long, java.math.BigDecimal]
      e.foreach { case (s, d) =>
        val t = d16(pr(s) / deg(s))
        acc.updateWith(d) { prev => Some(prev.fold(t)(_.add(t))) }
      }
      val next =
        if (hasDangling) {
          var dangAcc = java.math.BigDecimal.ZERO
          nodes.foreach(v => if (!deg.contains(v)) dangAcc = dangAcc.add(d16(pr(v))))
          val dang = dangAcc.doubleValue
          nodes.iterator.map { v =>
            val m = acc.get(v).map(_.doubleValue).getOrElse(0.0)
            v -> roundVia16((teleport + damping * dang) * sw(v) + damping * m, 12)
          }.toMap
        } else nodes.iterator.map { v =>
          val m = acc.get(v).map(_.doubleValue).getOrElse(0.0)
          v -> roundVia16(teleport * sw(v) + damping * m, 12)
        }.toMap
      pr = next
    }
    nodes.map(v => (v, roundVia16(pr(v), 9)))
      .sortBy { case (v, p) => (-p, v) }
      .toSeq.toDF("node", "pr")
  }
}
