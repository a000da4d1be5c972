package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the KMV sketch aggregate's contract: bounded state, merge
  * order-independence (the property that makes map-side partials safe),
  * exact degradation when k covers the domain, and estimator accuracy
  * within the published KMV error envelope when it does not.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val kmv = KmvSketch.kmvSketch _

  test("sketch holds the k smallest distinct hashes, sorted") {
    val df = Seq(9L, 7L, 7L, 5L, 3L, 1L, 8L, 1L).toDF("h")
    val got = df.agg(kmv(col("h"), 4)).head.getSeq[Long](0)
    assert(got == Seq(1L, 3L, 5L, 7L))
  }

  test("merge is order- and partitioning-independent") {
    val vals = (1L to 5000L).map(i => i * 2654435761L % 100003L)
    val one = vals.toDF("h").coalesce(1)
      .agg(kmv(col("h"), 64)).head.getSeq[Long](0)
    val many = scala.util.Random.shuffle(vals).toDF("h").repartition(13)
      .agg(kmv(col("h"), 64)).head.getSeq[Long](0)
    assert(one == many)
  }

  test("k >= |distinct| degrades to the exact distinct set") {
    val df = Seq(4L, 4L, 2L, 9L, 2L).toDF("h")
    val got = df.agg(kmv(col("h"), 128)).head.getSeq[Long](0)
    assert(got == Seq(2L, 4L, 9L))
  }

  test("estimator lands within the KMV envelope on a 48-bit-hash domain") {
    // 20k distinct users hashed the gate's way (12 md5 hex chars)
    val n = 20000
    val df = (1 to n).toDF("u")
      .select(conv(substring(md5(col("u").cast("string")), 1, 12), 16, 10)
        .cast("long").as("h"))
    val k = 256
    val sk = df.agg(kmv(col("h"), k)).head.getSeq[Long](0)
    assert(sk.size == k)
    val theta = sk.last.toDouble
    val est = (k - 1).toDouble * 281474976710656.0 / theta
    // published KMV relative error ~ 1/sqrt(k-2) (~6.3% here); allow 4 sigma
    assert(math.abs(est - n) / n < 4.0 / math.sqrt(k - 2.0),
      s"est $est vs exact $n")
  }

  test("audience overlap: exact columns are exact; estimates track them") {
    val events = graft.sources.Tables.events(spark, TestSpark.sf)
    val res = KmvOverlap.audienceOverlap(events).cache()
    val rows = res.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nA, nB, nU, nI) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_union"), r.getAs[Long]("n_inter"))
      // inclusion-exclusion holds by construction of the exact columns
      assert(nU == nA + nB - nI)
      // sketch estimates within the KMV envelope (k=128 → ~9%; 5 sigma)
      val (eU, eI) = (r.getAs[Double]("est_union"), r.getAs[Double]("est_inter"))
      assert(math.abs(eU - nU) / math.max(nU, 1L) < 0.45, s"union $eU vs $nU")
      assert(math.abs(eI - nI) / math.max(nU, 1L) < 0.45, s"inter $eI vs $nI")
    }
  }
}
