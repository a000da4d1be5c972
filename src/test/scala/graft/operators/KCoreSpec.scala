package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int,
                   maxRounds: Int = 12): Map[Long, Int] =
    KCore.kCore(edges.toDF("src", "dst"), k, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("cycle survives its own degree: every node kept with core_deg 2") {
    val c = core(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)), k = 2)
    assert(c == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2))
  }

  test("path peels from the endpoints until nothing remains") {
    // 1-2-3-4: endpoints have degree 1 < 2; removing them leaves a
    // 2-3 pair with degree 1 — the 2-core is empty, reached in rounds
    val c = core(Seq((1L, 2L), (2L, 3L), (3L, 4L)), k = 2)
    assert(c.isEmpty, s"2-core of a path must be empty: $c")
  }

  test("pendant peels, clique stays") {
    // K4 on 1..4 plus pendant 5-1: the 3-core is exactly the clique
    val c = core(Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L)), k = 3)
    assert(c == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3), s"got $c")
  }

  test("peeling cascades: pendant removal can drop a former core member") {
    // triangle 1,2,3 + node 4 attached to 1,2 + pendant 5-4: at k=2,
    // 5 peels first, then 4 still holds (deg 2 to 1,2) — everyone else
    // stays. The cascade stops exactly at the 2-core.
    val c = core(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (4L, 2L), (5L, 4L)), k = 2)
    assert(c.keySet == Set(1L, 2L, 3L, 4L), s"got $c")
    assert(c(4L) == 2 && c(1L) == 3)
  }

  test("loud-fail when the round bound cannot reach the fixpoint") {
    // a 5-path needs 2 peel rounds to empty at k=2; maxRounds=1 leaves
    // live edges unconverged
    val ex = intercept[IllegalArgumentException](
      core(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), k = 2,
        maxRounds = 1))
    assert(ex.getMessage.contains("not converged"))
  }

  test("empty input yields an empty core, no rounds run") {
    val c = core(Seq.empty, k = 2)
    assert(c.isEmpty)
  }
}
