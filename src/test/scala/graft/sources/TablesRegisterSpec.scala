package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** registerAll's idempotence guard must not serve stale relations: the
  * guard key folds a names+mtime+length fingerprint of the directory,
  * so an in-place rewrite of a table file re-registers (the staleness
  * class the r12 session-lifetime pin introduced — ADVICE r12 medium).
  */
class TablesRegisterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("repeat call is a no-op; a rewritten table file re-registers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_regspec")
    val src = java.nio.file.Paths.get(TestSpark.sf)
    Tables.names.foreach { n =>
      java.nio.file.Files.copy(src.resolve(s"$n.parquet"),
        dir.resolve(s"$n.parquet"))
    }
    try {
      Tables.registerAll(spark, dir.toString)
      val n0 = spark.sql("SELECT count(*) FROM region").first().getLong(0)
      assert(n0 > 0)
      // idempotent repeat: same dir, unchanged contents
      Tables.registerAll(spark, dir.toString)
      assert(spark.sql("SELECT count(*) FROM region").first().getLong(0) == n0)
      // in-place rewrite: region shrinks to 1 row; the fingerprint in
      // the guard key must force re-registration
      val one = spark.read.parquet(s"${TestSpark.sf}/region.parquet").limit(1)
      val stage = java.nio.file.Files.createTempDirectory("graft_regspec_st")
      one.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      graft.core.Scratch.deleteRecursively(dir.resolve("region.parquet"))
      graft.core.Scratch.moveSinglePart(stage, ".parquet",
        dir.resolve("region.parquet"))
      Tables.registerAll(spark, dir.toString)
      val n1 = spark.sql("SELECT count(*) FROM region").first().getLong(0)
      assert(n1 == 1L,
        s"stale view served after in-place rewrite: $n1 rows, expected 1")
      graft.core.Scratch.deleteRecursively(stage)
    } finally {
      // restore the default test registration for any later suite that
      // runs SQL over the shared session's views
      Tables.registerAll(spark, TestSpark.sf)
      graft.core.Scratch.deleteRecursively(dir)
    }
  }
}
