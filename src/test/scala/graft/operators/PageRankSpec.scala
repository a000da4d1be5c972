package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 20): Map[Long, Double] =
    PageRank.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("cycle: rank is uniform and mass is conserved") {
    // 1→2→3→4→1: perfectly symmetric, so every node holds exactly 1/n
    // at every iteration — any drift is an arithmetic bug
    val pr = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(pr.size == 4)
    pr.values.foreach(v => assert(math.abs(v - 0.25) < 1e-9))
    assert(math.abs(pr.values.sum - 1.0) < 1e-6, "total mass 1")
  }

  test("star: the hub out-ranks every spoke") {
    // spokes 2..5 all point at 1; 1 points back at 2 so the graph has
    // no rank sink other than the dangling redistribution
    val pr = ranks(Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L)))
    val hub = pr(1L)
    (2L to 5L).foreach(s => assert(hub > pr(s), s"hub must out-rank spoke $s"))
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
  }

  test("dangling node: its mass is redistributed, total stays 1") {
    // 3 receives but never emits — without dangling handling the walk
    // leaks mass every iteration and the total decays below 1
    val pr = ranks(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(pr.size == 3)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6, s"mass conserved: $pr")
    assert(pr(3L) > pr(2L), "3 receives from both 1 and 2")
  }

  test("matches the textbook fixpoint on a worked example") {
    // Classic 3-node example: 1→2, 1→3, 2→3, 3→1. Power iteration to
    // convergence gives PR(1)≈0.3878, PR(2)≈0.2148, PR(3)≈0.3974
    // (damping 0.85). 30 rounds is far past convergence at n=3.
    val pr = ranks(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)), iters = 30)
    assert(math.abs(pr(1L) - 0.3878) < 5e-4, s"PR(1)=${pr(1L)}")
    assert(math.abs(pr(2L) - 0.2148) < 5e-4, s"PR(2)=${pr(2L)}")
    assert(math.abs(pr(3L) - 0.3974) < 5e-4, s"PR(3)=${pr(3L)}")
  }

  test("duplicate edges collapse: multigraph input does not double-count") {
    val once = ranks(Seq((1L, 2L), (2L, 1L)))
    val dup = ranks(Seq((1L, 2L), (1L, 2L), (2L, 1L)))
    once.foreach { case (n, v) => assert(math.abs(dup(n) - v) < 1e-12) }
  }

  test("empty graph fails loudly") {
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    val ex = intercept[IllegalArgumentException](PageRank.pageRank(e))
    assert(ex.getMessage.contains("empty graph"))
  }

  private def ppr(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  iters: Int = 20): Map[Long, Double] =
    PageRank.personalizedPageRank(edges.toDF("src", "dst"),
        seeds.toDF("node"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("personalized: restart mass concentrates around the seed") {
    // two IDENTICAL directed triangles bridged 3↔4: without seeding the
    // halves are symmetric, so seeding 1 is the only asymmetry — the
    // seed half must strictly dominate and the seed must rank first
    val p = ppr(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L), (4L, 3L)), seeds = Seq(1L))
    assert(p(1L) + p(2L) + p(3L) > p(4L) + p(5L) + p(6L))
    assert(p(1L) == p.values.max, s"seed ranks first: $p")
    assert(math.abs(p.values.sum - 1.0) < 1e-6, "mass conserved")
  }

  test("personalized: nodes unreachable from the seed hold exactly zero") {
    val p = ppr(Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)), seeds = Seq(1L))
    assert(p(3L) == 0.0 && p(4L) == 0.0)
    assert(math.abs(p.values.sum - 1.0) < 1e-6)
  }

  test("personalized with ALL nodes seeded equals uniform PageRank") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    val uni = ranks(edges, iters = 15)
    val p = ppr(edges, seeds = Seq(1L, 2L, 3L), iters = 15)
    uni.foreach { case (n, v) => assert(math.abs(p(n) - v) < 1e-9,
      s"node $n: ppr ${p(n)} vs pr $v") }
  }

  test("personalized: dangling mass returns to the seeds") {
    // 2 is dangling; its mass must restart at seed 1, not leak
    val p = ppr(Seq((1L, 2L)), seeds = Seq(1L))
    assert(math.abs(p.values.sum - 1.0) < 1e-6, s"mass conserved: $p")
  }

  test("personalized: seed disjoint from the graph fails loudly") {
    val ex = intercept[IllegalArgumentException](
      ppr(Seq((1L, 2L)), seeds = Seq(9L)))
    assert(ex.getMessage.contains("no seed"))
  }
}
