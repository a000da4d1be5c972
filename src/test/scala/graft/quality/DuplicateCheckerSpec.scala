package graft.quality

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DuplicateCheckerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clean dataset passes the gate") {
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    DuplicateChecker.assertNoDuplicates(df, Seq("id"))
    assert(!DuplicateChecker.hasDuplicates(df, Seq("id")))
  }

  test("duplicate PK raises DuplicateException") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("id", "v")
    assertThrows[DuplicateException] {
      DuplicateChecker.assertNoDuplicates(df, Seq("id"))
    }
  }

  test("composite key duplicates detected, distinct composites pass") {
    val clean = Seq((1, "x", 1.0), (1, "y", 2.0)).toDF("a", "b", "v")
    DuplicateChecker.assertNoDuplicates(clean, Seq("a", "b"))
    val dirty = clean.union(Seq((1, "x", 3.0)).toDF("a", "b", "v"))
    assert(DuplicateChecker.hasDuplicates(dirty, Seq("a", "b")))
    assert(DuplicateChecker.duplicates(dirty, Seq("a", "b")).count() == 1)
  }
}
