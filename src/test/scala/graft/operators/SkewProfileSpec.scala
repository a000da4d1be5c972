package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SkewProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 keys with counts 1, 2, 3, 10: hand-checkable distribution
  private lazy val skewed =
    (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(10)("d")).zipWithIndex.toDF("k", "v")

  test("summary: nearest-rank percentiles and skew ratio, hand-checked") {
    val r = SkewProfile.summary(skewed, "k").collect().head
    assert(r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("n_rows") == 16L)
    assert(r.getAs[Long]("max_cnt") == 10L)
    // sorted counts (1,2,3,10); nearest rank ceil(q*4): p50 -> rank 2 = 2,
    // p90 -> rank 4 = 10, p99 -> rank 4 = 10
    assert(r.getAs[Long]("p50_cnt") == 2L)
    assert(r.getAs[Long]("p90_cnt") == 10L)
    assert(r.getAs[Long]("p99_cnt") == 10L)
    // max/mean = 10 / (16/4) = 2.5
    assert(r.getAs[Double]("skew_ratio") == 2.5)
  }

  test("hotKeys: count-desc with key tie-break, share sums the corpus") {
    val hot = SkewProfile.hotKeys(skewed, "k", n = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(hot.map(_._1).toSeq == Seq("d", "c", "b", "a"))
    assert(hot.head._2 == 10L && hot.head._3 == 0.625)
    assert(math.abs(hot.map(_._3).sum - 1.0) < 1e-9)
    // tie-break: equal counts order by key ascending
    val tied = Seq("x", "x", "y", "y", "z").zipWithIndex.toDF("k", "v")
    val t = SkewProfile.hotKeys(tied, "k", n = 2).collect().map(_.getString(0))
    assert(t.toSeq == Seq("x", "y"))
  }

  test("uniform keys profile to skew ratio 1.0") {
    val uni = (1 to 20).map(i => (s"k${i % 4}", i)).toDF("k", "v")
    val r = SkewProfile.summary(uni, "k").collect().head
    assert(r.getAs[Double]("skew_ratio") == 1.0)
    assert(r.getAs[Long]("p50_cnt") == r.getAs[Long]("max_cnt"))
  }
}
