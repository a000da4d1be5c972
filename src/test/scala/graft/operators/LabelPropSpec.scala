package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def communities(edges: Seq[(Long, Long)],
                          iters: Int = 5): Map[Long, Long] =
    LabelProp.labelPropagate(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles joined by one bridge split into two communities") {
    // {1,2,3} and {4,5,6} are dense; 3–4 is the sparse cut. LPA must
    // keep the triangles in separate communities — CC would merge them.
    val cs = communities(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L)))
    assert(cs.size == 6)
    assert(cs(1L) == cs(2L) && cs(2L) == cs(3L), s"left triangle: $cs")
    assert(cs(4L) == cs(5L) && cs(5L) == cs(6L), s"right triangle: $cs")
    assert(cs(1L) != cs(4L), s"bridge must not merge the triangles: $cs")
  }

  test("clique converges to its smallest node id") {
    // all-ties every round → smallest-label tie-break wins everywhere
    val cs = communities(Seq((7L, 8L), (8L, 9L), (9L, 7L)))
    assert(cs.values.toSet == Set(7L), s"clique labels: $cs")
  }

  test("disjoint components never share a label") {
    val cs = communities(Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L)))
    assert(cs(1L) == cs(2L) && cs(10L) == cs(11L))
    assert(cs(1L) != cs(10L))
  }

  test("direction does not matter: edges are symmetrized") {
    val fwd = communities(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val rev = communities(Seq((2L, 1L), (3L, 2L), (1L, 3L)))
    assert(fwd == rev)
  }

  test("deterministic across reruns") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L))
    assert(communities(edges) == communities(edges))
  }

  test("iteration count below one fails loudly") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException](
      LabelProp.labelPropagate(e, iterations = 0))
    assert(ex.getMessage.contains("iterations"))
  }
}
