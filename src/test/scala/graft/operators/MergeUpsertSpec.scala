package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MergeUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val target = Seq(
    ("c1", "Ann", 10.0, "t1", "t1"),
    ("c2", "Bob", 20.0, "t1", "t1")).toDF("id", "name", "v", "load_ts", "upd_ts")
  private val stage = Seq(
    ("c2", "Bobby", 25.0, "t2", "t2"),
    ("c3", "Cat", 30.0, "t2", "t2")).toDF("id", "name", "v", "load_ts", "upd_ts")

  test("matched rows take stage data but keep target LOAD_TIMESTAMP") {
    val out = MergeUpsert.merge(target, stage, Seq("id"), preserved = Seq("load_ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    val c2 = out("c2")
    assert(c2.getString(1) == "Bobby" && c2.getDouble(2) == 25.0)
    assert(c2.getString(3) == "t1", "LOAD preserved from target")
    assert(c2.getString(4) == "t2", "UPDATE taken from stage")
  }

  test("unmatched stage rows insert fully; target-only rows untouched") {
    val out = MergeUpsert.merge(target, stage, Seq("id"), preserved = Seq("load_ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("c1", "c2", "c3"))
    assert(out("c3").getString(3) == "t2", "inserted row keeps stage LOAD")
    assert(out("c1").getString(1) == "Ann" && out("c1").getString(4) == "t1")
  }

  test("merge is idempotent when stage equals target") {
    val out = MergeUpsert.merge(target, target, Seq("id"), Seq("load_ts"))
    assert(out.except(target).isEmpty && target.except(out).isEmpty)
  }

  test("null keys match via <=> and presence markers, not key probes") {
    val t = Seq((Option("a"), 1.0), (None, 2.0)).toDF("id", "v")
    val s = Seq((Option.empty[String], 9.0), (Option("b"), 3.0)).toDF("id", "v")
    val out = MergeUpsert.merge(t, s, Seq("id"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(out(None) == 9.0, "null key matched null key, stage wins")
    assert(out(Some("a")) == 1.0 && out(Some("b")) == 3.0)
  }
}
