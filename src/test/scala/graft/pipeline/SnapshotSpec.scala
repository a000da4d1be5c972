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

  test("expire keeps referenced data alive; vacuum frees the rest byte-stably") {
    withDir { dest =>
      SnapshotTable.commit(Seq((1, "a")).toDF("k", "v"), dest) // v1
      SnapshotTable.commit(Seq((2, "b")).toDF("k", "v"), dest) // v2 = v1+v2
      SnapshotTable.commit(Seq((9, "z")).toDF("k", "v"), dest,
        append = false)                                        // v3 = v3 only
      // keepLast=2: v1's MANIFEST dies, but v2's append chain still
      // references data/v1 — the vacuum must not touch it
      val (dead1, removed1) = SnapshotTable.expire(spark, dest, keepLast = 2)
      assert(dead1 == Seq(1) && removed1.isEmpty,
        s"data/v1 is referenced by surviving v2: $removed1")
      assert(SnapshotTable.read(spark, dest, 2).select("k").as[Int]
        .collect().toSet == Set(1, 2), "v2 reads its full append chain")
      // keepLast=1: only the overwrite v3 survives → v1+v2 data freed
      val before = files(dest, "data/v3")
      val (dead2, removed2) = SnapshotTable.expire(spark, dest, keepLast = 1)
      assert(dead2 == Seq(2))
      assert(removed2.map(p => p.split('/').last).toSet == Set("v1", "v2"))
      assert(files(dest, "data/v3") == before,
        "live version's files must be byte-identical after GC")
      assert(SnapshotTable.versions(spark, dest) == Seq(3))
      assert(SnapshotTable.read(spark, dest).select("k").as[Int]
        .collect().toSet == Set(9), "latest unchanged by GC")
      intercept[IllegalArgumentException](
        SnapshotTable.read(spark, dest, version = 2))
      // idempotent: a re-run finds nothing to do
      assert(SnapshotTable.expire(spark, dest, keepLast = 1) ==
        ((Seq.empty, Seq.empty)))
      intercept[IllegalArgumentException](
        SnapshotTable.expire(spark, dest, keepLast = 0))
    }
  }

  test("compact rewrites latest into fewer files, row-identical") {
    withDir { dest =>
      val df = (1 to 100).map(i => (i, s"r$i")).toDF("k", "v")
      SnapshotTable.commit(df.repartition(8), dest)
      val v = SnapshotTable.compact(spark, dest, numFiles = 1)
      assert(v == 2)
      val parts = files(dest, "data/v2").keys
        .count(_.matches(".*part-.*\\.parquet$"))
      assert(parts == 1, s"compacted to one file, got $parts")
      assert(SnapshotTable.read(spark, dest).select("k").as[Int]
        .collect().sorted.toSeq == (1 to 100),
        "compaction must not change content")
      // fragmented history survives until expired
      assert(SnapshotTable.read(spark, dest, 1).count() == 100)
      val (_, removed) = SnapshotTable.expire(spark, dest, keepLast = 1)
      assert(removed.map(_.split('/').last) == Seq("v1"))
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
