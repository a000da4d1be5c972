package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Double)] =
    Triangles.triangleStats(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("single triangle: every node in one triangle, coefficient 1") {
    val s = stats(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(s.keySet == Set(1L, 2L, 3L))
    s.values.foreach { case (d, t, c) =>
      assert(d == 2L && t == 1L && c == 1.0)
    }
  }

  test("square has no triangles") {
    val s = stats(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    s.values.foreach { case (_, t, c) => assert(t == 0L && c == 0.0) }
  }

  test("K4: four triangles, each node in three, coefficient 1") {
    val s = stats(Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    s.values.foreach { case (d, t, c) =>
      assert(d == 3L && t == 3L && c == 1.0)
    }
    assert(s.values.map(_._2).sum == 12L, "4 triangles x 3 members")
  }

  test("pendant node: degree 1, zero triangles, coefficient 0") {
    val s = stats(Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)))
    assert(s(4L) == ((1L, 0L, 0.0)))
    // 1's coefficient: one closed pair of three — 2*1/(3*2)
    assert(s(1L)._1 == 3L && s(1L)._2 == 1L)
    assert(math.abs(s(1L)._3 - 1.0 / 3.0) < 1e-15)
  }

  test("edge direction and duplicates do not change the counts") {
    val fwd = stats(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val messy = stats(Seq(
      (2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (1L, 3L), (3L, 1L)))
    assert(fwd == messy)
  }

  test("self-loops are dropped, not counted as triangles") {
    val s = stats(Seq((1L, 1L), (1L, 2L), (2L, 3L), (3L, 1L)))
    assert(s(1L)._1 == 2L && s(1L)._2 == 1L)
  }
}
