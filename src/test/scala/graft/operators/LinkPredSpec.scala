package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LinkPredSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("commonNeighborPairs: counts, Jaccard, edge removal, symmetry") {
    // path 1-2-3 plus hub 4 adjacent to 1,2,3:
    //   (1,3): common {2,4}, deg 2+2, jaccard 2/(2+2-2)=1.0? deg1=2
    //   wait: edges: 1-2, 2-3, 4-1, 4-2, 4-3
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 1L), (4L, 2L), (4L, 3L))
      .toDF("src", "dst")
    val out = LinkPred.commonNeighborPairs(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // degrees: 1→{2,4}=2, 2→{1,3,4}=3, 3→{2,4}=2, 4→{1,2,3}=3
    // non-edges with common neighbors: only (1,3) via {2,4}
    assert(out.keySet == Set((1L, 3L)), s"got ${out.keySet}")
    assert(out((1L, 3L)) == ((2L, 2L, 2L, 1.0)),
      s"2 shared of union {2,4}: ${out((1L, 3L))}")
  }

  test("commonNeighborPairs: direction duplicates collapse, topK caps") {
    // the same undirected triangle-free star given in both directions;
    // pairs (a,b) among leaves share only the hub
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (0L, 3L))
      .toDF("src", "dst")
    val out = LinkPred.commonNeighborPairs(edges, topK = 2).collect()
    // leaf pairs (1,2),(1,3),(2,3) all share hub 0 with jaccard 1/1=1.0
    assert(out.length == 2, "topK caps the output")
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (1L, 3L)), "ties order by pair")
    assert(out.forall(_.getDouble(5) == 1.0))
    intercept[IllegalArgumentException](
      LinkPred.commonNeighborPairs(edges, topK = 0))
  }

  test("commonNeighborPairs: hub centers above maxCenterDeg emit no wedges") {
    // star: hub 0 adjacent to leaves 1..10 (deg 10); every leaf pair
    // shares only the hub. With the hub cut at 5 the ONLY wedge center
    // (deg 10) is suppressed → empty result, proving the deg² fan-out
    // bound is enforced; uncapped, all 45 leaf pairs appear.
    val edges = (1L to 10L).map(l => (0L, l)).toDF("src", "dst")
    val uncapped = LinkPred.commonNeighborPairs(edges, topK = 1000)
    assert(uncapped.count() == 45, "10 choose 2 leaf pairs via the hub")
    val capped = LinkPred.commonNeighborPairs(edges, topK = 1000,
      maxCenterDeg = 5)
    assert(capped.count() == 0, "hub suppressed — no wedge centers left")
    // sub-threshold centers still enumerate: path 1-2-3 (center deg 2)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(LinkPred.commonNeighborPairs(path, topK = 10,
      maxCenterDeg = 5).count() == 1, "(1,3) via center 2 survives")
    intercept[IllegalArgumentException](
      LinkPred.commonNeighborPairs(edges, maxCenterDeg = 0))
  }
}
