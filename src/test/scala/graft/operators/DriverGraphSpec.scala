package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The driver fast paths must be BIT-IDENTICAL to the distributed
  * iterations they replace (the oracle gate holds both to one hash):
  * random graphs, both paths forced (driverCap=0 disables the kernel),
  * exact equality on every row — doubles compared by bits, not
  * tolerance.
  */
class DriverGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomEdges(seed: Int, n: Int, m: Int): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    // allow self-loops, duplicates, and dangling receivers — the messy
    // shapes the operators' dedup/dangling handling must agree on
    Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n + 3).toLong))
  }

  test("pageRank: driver kernel == distributed path, bit for bit") {
    for (seed <- Seq(1, 2, 3)) {
      val e = randomEdges(seed, 30, 120).toDF("src", "dst")
      val fast = PageRank.pageRank(e, iterations = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val dist = PageRank.pageRank(e, iterations = 5, driverCap = 0)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(fast.toSeq == dist.toSeq, s"seed=$seed")
    }
  }

  test("personalizedPageRank: driver kernel == distributed path, bit for bit") {
    for (seed <- Seq(4, 5)) {
      val e = randomEdges(seed, 25, 100).toDF("src", "dst")
      val seeds = Seq(0L, 3L, 7L, 999L).toDF("node") // 999 off-graph
      val fast = PageRank.personalizedPageRank(e, seeds, iterations = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val dist = PageRank.personalizedPageRank(e, seeds, iterations = 5,
          driverCap = 0)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(fast.toSeq == dist.toSeq, s"seed=$seed")
    }
  }

  test("labelPropagate: driver kernel == distributed path") {
    for (seed <- Seq(6, 7)) {
      val e = randomEdges(seed, 40, 120).toDF("src", "dst")
      val fast = LabelProp.labelPropagate(e, iterations = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val dist = LabelProp.labelPropagate(e, iterations = 5, driverCap = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(fast.toSeq == dist.toSeq, s"seed=$seed")
    }
  }

  test("kCore: driver kernel == distributed path") {
    for (seed <- Seq(8, 9); k <- Seq(2, 3)) {
      val e = randomEdges(seed, 30, 150).toDF("src", "dst")
      val fast = KCore.kCore(e, k)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      val dist = KCore.kCore(e, k, driverCap = 0)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(fast.toSeq == dist.toSeq, s"seed=$seed k=$k")
    }
  }

  test("collectUpTo: returns None above the cap, all rows below") {
    val e = Seq.tabulate(100)(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    assert(DriverGraph.collectUpTo(e, 99).isEmpty)
    assert(DriverGraph.collectUpTo(e, 100).map(_.length).contains(100))
    assert(DriverGraph.collectUpTo(e, 0).isEmpty)
  }
}
