package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ScdType2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val t0 = ts("2001-01-01 00:00:00")
  private val t1 = ts("2001-06-01 00:00:00")
  private val batchTs = ts("2002-01-01 00:00:00")

  // c1 current+history, c2 current, c3 current; stage changes c1,
  // repeats c2 unchanged, inserts c4 — every branch in one fixture
  private def dim = Seq(
    ("c1", "GOLD", Some(t0), Option(t1), false),
    ("c1", "SILVER", Some(t1), Option.empty[java.sql.Timestamp], true),
    ("c2", "IRON", Some(t0), None, true),
    ("c3", "TIN", Some(t0), None, true)
  ).toDF("id", "tier", "valid_from", "valid_to", "is_current")

  private def stage = Seq(
    ("c1", "BRONZE"), ("c2", "IRON"), ("c4", "LEAD")
  ).toDF("id", "tier")

  private def merged = ScdType2.merge(dim, stage, Seq("id"), batchTs)

  test("changed key closes the old version and opens a new one") {
    val c1 = merged.filter($"id" === "c1").orderBy("valid_from").collect()
    assert(c1.length == 3)
    val Array(hist, closed, opened) = c1
    assert(!hist.getBoolean(4) && hist.getTimestamp(3) == t1)
    assert(closed.getString(1) == "SILVER" && !closed.getBoolean(4) &&
      closed.getTimestamp(3) == batchTs, "old current closed at batch ts")
    assert(opened.getString(1) == "BRONZE" && opened.getBoolean(4) &&
      opened.getTimestamp(2) == batchTs && opened.isNullAt(3))
  }

  test("unchanged match and dim-only rows pass through; stage-only inserts") {
    val out = merged.collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(4))).toSet
    assert(out.contains(("c2", "IRON", true)), "replayed row: no new version")
    assert(merged.filter($"id" === "c2").count() == 1)
    assert(out.contains(("c3", "TIN", true)), "untouched dim-only row")
    assert(out.contains(("c4", "LEAD", true)), "brand-new key inserted open")
    assert(merged.filter($"id" === "c4" && $"valid_from" === batchTs).count() == 1)
  }

  test("duplicate stage keys: exact dupes collapse, conflicts fail loudly") {
    // a key twice in stage would full-outer-join the single current row
    // twice — two closed copies, two open versions. Fully identical rows
    // collapse losslessly (replay stays idempotent) …
    val exactDup = Seq(("c1", "BRONZE"), ("c1", "BRONZE"), ("c2", "IRON"))
      .toDF("id", "tier")
    val out = ScdType2.merge(dim, exactDup, Seq("id"), batchTs)
    assert(out.filter($"id" === "c1" && $"is_current").count() == 1,
      "one open version per key after an exact-duplicate stage")
    // … conflicting duplicates (same key, different attributes) have no
    // defensible winner and must not silently break the invariant
    val conflict = Seq(("c1", "BRONZE"), ("c1", "LEAD")).toDF("id", "tier")
    val e = intercept[IllegalArgumentException] {
      ScdType2.merge(dim, conflict, Seq("id"), batchTs)
    }
    assert(e.getMessage.contains("duplicate business keys"))
  }

  test("merge is idempotent: re-merging the same batch adds nothing") {
    val once = merged
    val twice = ScdType2.merge(once, stage, Seq("id"), ts("2002-02-01 00:00:00"))
    assert(twice.count() == once.count())
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
  }

  test("exactly one current version per live key; history is closed") {
    val cur = merged.filter($"is_current")
    assert(cur.groupBy("id").count().filter($"count" > 1).isEmpty)
    assert(merged.filter(!$"is_current" && $"valid_to".isNull).isEmpty,
      "every non-current row carries its close timestamp")
  }

  test("single key-grain shuffle: one join, no per-branch re-joins") {
    val plan = merged.queryExecution.executedPlan.toString
    val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).length
    assert(joins == 1, s"expected exactly 1 join, plan:\n$plan")
  }
}
