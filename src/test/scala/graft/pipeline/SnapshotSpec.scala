package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withDir(f: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_snapspec")
    try f(root.toString + "/t")
    finally {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  private def files(dest: String, sub: String): Map[String, Seq[Byte]] = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(dest, sub)
    val walk = java.nio.file.Files.walk(dir)
    try walk.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .map(p => p.toString -> java.nio.file.Files.readAllBytes(p).toSeq)
      .toMap
    finally walk.close()
  }

  test("append and overwrite commits; every historical version queryable") {
    withDir { dest =>
      assert(SnapshotTable.versions(spark, dest).isEmpty)
      assert(SnapshotTable.commit(Seq((1, "a")).toDF("k", "v"), dest) == 1)
      val v1Files = files(dest, "data/v1")
      assert(v1Files.nonEmpty)
      assert(SnapshotTable.commit(Seq((2, "b")).toDF("k", "v"), dest) == 2)
      assert(SnapshotTable.commit(Seq((9, "z")).toDF("k", "v"), dest,
        append = false) == 3)
      assert(SnapshotTable.versions(spark, dest) == Seq(1, 2, 3))

      def keys(v: Int) = SnapshotTable.read(spark, dest, v)
        .select("k").as[Int].collect().toSet
      assert(keys(1) == Set(1), "v1 pinned after later commits")
      assert(keys(2) == Set(1, 2), "append accumulates the parent")
      assert(keys(3) == Set(9), "overwrite replaces logically")
      // latest = v3
      assert(SnapshotTable.read(spark, dest).select("k")
        .as[Int].collect().toSet == Set(9))
      // v1's files were never touched by v2/v3 — immutability is what
      // makes the history queryable and readers isolated
      assert(files(dest, "data/v1") == v1Files,
        "committed data files must be immutable")
    }
  }

  test("rollback is metadata-only: latest reverts, history survives") {
    withDir { dest =>
      SnapshotTable.commit(Seq((1, "a")).toDF("k", "v"), dest)
      SnapshotTable.commit(Seq((9, "z")).toDF("k", "v"), dest,
        append = false)
      assert(SnapshotTable.rollback(spark, dest, toVersion = 1) == 3)
      def keys(v: Int) = SnapshotTable.read(spark, dest, v)
        .select("k").as[Int].collect().toSet
      assert(SnapshotTable.read(spark, dest).select("k").as[Int]
        .collect().toSet == Set(1), "latest now serves v1's content")
      assert(keys(2) == Set(9), "the rolled-over version stays queryable")
      // no new data directory was written for the rollback commit
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dest, "data/v3")),
        "rollback must be metadata-only")
      intercept[IllegalArgumentException](
        SnapshotTable.rollback(spark, dest, toVersion = 9))
    }
  }

  test("reads of missing tables and unknown versions fail loudly") {
    withDir { dest =>
      intercept[IllegalArgumentException](SnapshotTable.read(spark, dest))
      SnapshotTable.commit(Seq((1, "a")).toDF("k", "v"), dest)
      intercept[IllegalArgumentException](
        SnapshotTable.read(spark, dest, version = 7))
    }
  }
}
