package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute q_assoc's cost (VERDICT r9 #3 — slowest single
  * query at both SFs) before optimizing. Times each sub-plan of
  * [[graft.operators.Analytics.basketRules]] in isolation at the given
  * SF so the fix targets the measured bottleneck, not the guessed one.
  */
object ProfAssoc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(appName = "graft-prof-assoc",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val lineitem = graft.sources.Tables.lineitem(spark, sfDir)
    val basketsPlan = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
      .filter(size(col("ps")) <= 100)
    val rawPairs = basketsPlan
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("part_a"), y.as("part_b")))))).as("pr"))
    val pairs = rawPairs
      .groupBy(col("pr.part_a").as("part_a"), col("pr.part_b").as("part_b"))
      .agg(count(lit(1)).as("n_pair")).filter(col("n_pair") >= 2)

    val basketsCached = graft.core.PlanMemo.cached("prof_baskets", basketsPlan)
    val ex = basketsCached.select(col("ok"), explode(col("ps")).as("pk"))
    val exPairs = ex.select(col("ok"), col("pk").as("part_a"))
      .join(ex.select(col("ok"), col("pk").as("part_b")), Seq("ok"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 2)
    val packed = basketsCached
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => shiftleft(x, 32) + y)))).as("pp"))
      .groupBy("pp").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 2)
      .select(shiftright(col("pp"), 32).as("part_a"),
        col("pp").bitwiseAND(lit(0xffffffffL)).as("part_b"), col("n_pair"))

    for (round <- 1 to 2) {
      t(s"r$round baskets (collect_set, no memo)")(basketsPlan.count())
      t(s"r$round explode-selfjoin pairs (cached baskets)")(exPairs.count())
      t(s"r$round packed-long HOF pairs (cached baskets)")(packed.count())
      t(s"r$round rawPairs (expand, no memo)")(rawPairs.count())
      t(s"r$round pairs (expand+group, no memo)")(pairs.count())
      graft.core.PlanMemo.invalidate(spark, "basket_sets")
      t(s"r$round basketRules COLD memo")(
        operators.Analytics.basketRules(lineitem).count())
      t(s"r$round basketRules WARM memo")(
        operators.Analytics.basketRules(lineitem).count())
    }
    spark.stop()
  }
}
