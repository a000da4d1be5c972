package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** The property bucketing exists to buy at 100 TB: a join AND an
  * aggregation on the bucket key plan with ZERO shuffle exchange —
  * the layout write paid the shuffle once.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("colocated join + bucket-key aggregate: no Exchange anywhere") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val root = java.nio.file.Files.createTempDirectory("graft_bkt_spec")
    try {
      val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      val li = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity"))
      val joined = Bucketing.withColocated(spark, o, "o_orderkey",
        li, "l_orderkey", nBuckets = 4, dir = root) { (bo, bl) =>
        bl.join(bo, bl("l_orderkey") === bo("o_orderkey"))
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("qty"))
      }
      val rows = joined.collect()
      assert(rows.nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true") ||
        plan.contains("SelectedBucketsCount"), plan)

      // bucketing must be invisible to the answer
      val direct = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("qty"))
      assert(joined.orderBy("o_orderkey").collect().toSeq ==
        direct.orderBy("o_orderkey").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      graft.core.Scratch.deleteRecursively(root)
    }
  }
}
