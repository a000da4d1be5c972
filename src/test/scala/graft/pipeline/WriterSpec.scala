package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.TestSpark
import graft.streaming.EventsStream

class WriterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def day(s: String) = java.sql.Date.valueOf(s)

  test("overwriteDaily replaces only the written DAY_DT partitions") {
    val dest = java.nio.file.Files.createTempDirectory("graft_ow").toString + "/t"
    val d1 = Seq((1, day("2001-11-04")), (2, day("2001-11-04")))
      .toDF("id", "DAY_DT")
    val d2 = Seq((3, day("2001-11-05"))).toDF("id", "DAY_DT")
    LayerWriter.overwriteDaily(d1, dest)
    LayerWriter.overwriteDaily(d2, dest)
    assert(spark.read.parquet(dest).count() == 3, "both days present")
    // re-run day 2 with different content: replaces, never duplicates
    val d2b = Seq((4, day("2001-11-05")), (5, day("2001-11-05")))
      .toDF("id", "DAY_DT")
    LayerWriter.overwriteDaily(d2b, dest)
    val after = spark.read.parquet(dest)
    assert(after.count() == 4)
    assert(after.filter(col("DAY_DT") === day("2001-11-04")).count() == 2,
      "untouched partition intact")
    assert(after.filter(col("DAY_DT") === day("2001-11-05"))
      .select("id").as[Int].collect().toSet == Set(4, 5))
  }

  test("partition-scoped MERGE leaves untouched partition files byte-identical") {
    val root = java.nio.file.Files.createTempDirectory("graft_pmerge")
    try {
      val dest = root.toString + "/t"
      // three daily partitions of a keyed history
      val target = Seq(
        (1L, "a", day("2001-11-03"), "L1"),
        (2L, "b", day("2001-11-04"), "L2"),
        (3L, "c", day("2001-11-05"), "L3"))
        .toDF("id", "v", "DAY_DT", "LOAD_TSTMP")
      LayerWriter.mergeIntoPartitioned(spark, target, dest,
        Seq("id"), Seq("LOAD_TSTMP"), "DAY_DT")
      // fingerprint every file of the UNTOUCHED day-03 partition
      def files(sub: String): Map[String, Seq[Byte]] = {
        import scala.jdk.CollectionConverters._
        val dir = java.nio.file.Paths.get(dest, sub)
        val walk = java.nio.file.Files.walk(dir)
        try walk.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p))
          .map(p => p.toString -> java.nio.file.Files.readAllBytes(p).toSeq)
          .toMap
        finally walk.close()
      }
      val before = files("DAY_DT=2001-11-03")
      assert(before.nonEmpty, "expected files in the day-03 partition")
      // stage touches day 04 (update id=2) and day 06 (insert id=4)
      val stage = Seq(
        (2L, "b2", day("2001-11-04"), "IGNORED"),
        (4L, "d", day("2001-11-06"), "L4"))
        .toDF("id", "v", "DAY_DT", "LOAD_TSTMP")
      LayerWriter.mergeIntoPartitioned(spark, stage, dest,
        Seq("id"), Seq("LOAD_TSTMP"), "DAY_DT")
      assert(files("DAY_DT=2001-11-03") == before,
        "untouched partition files must be byte-identical after the merge")
      val after = spark.read.parquet(dest)
        .select(col("id"), col("v"), col("DAY_DT").cast("date").as("DAY_DT"),
          col("LOAD_TSTMP"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getDate(2).toString, r.getString(3))).toSet
      assert(after == Set(
        (1L, "a", "2001-11-03", "L1"),          // untouched
        (2L, "b2", "2001-11-04", "L2"),         // updated, LOAD preserved
        (3L, "c", "2001-11-05", "L3"),          // untouched
        (4L, "d", "2001-11-06", "L4")),         // inserted
        s"merged content wrong: $after")
    } finally {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("deleteKeysPartitioned rewrites only hit partitions, clears emptied ones") {
    val root = java.nio.file.Files.createTempDirectory("graft_forget")
    try {
      val dest = root.toString + "/t"
      // p=1 has a hit among survivors, p=2 is emptied entirely, p=3 untouched
      Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 2), (4L, "d", 3))
        .toDF("k", "v", "p")
        .write.mode("overwrite").partitionBy("p").parquet(dest)
      def files(sub: String): Map[String, Seq[Byte]] = {
        import scala.jdk.CollectionConverters._
        val dir = java.nio.file.Paths.get(dest, sub)
        if (!java.nio.file.Files.exists(dir)) return Map.empty
        val walk = java.nio.file.Files.walk(dir)
        try walk.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p))
          .map(p => p.toString -> java.nio.file.Files.readAllBytes(p).toSeq)
          .toMap
        finally walk.close()
      }
      val p3Before = files("p=3")
      assert(p3Before.nonEmpty)
      LayerWriter.deleteKeysPartitioned(spark, dest, "k",
        Seq(1L, 3L).toDF("k"), "p")
      assert(files("p=3") == p3Before,
        "partition with no hit must stay byte-identical")
      assert(files("p=2").isEmpty,
        "fully-deleted partition must not keep stale files")
      val after = spark.read.parquet(dest)
        .select("k", "v", "p").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(after == Set((2L, "b", 1), (4L, "d", 3)), s"got $after")
      // a keyset with no hits is a no-op: files untouched everywhere
      val p1After = files("p=1")
      LayerWriter.deleteKeysPartitioned(spark, dest, "k",
        Seq(99L).toDF("k"), "p")
      assert(files("p=1") == p1After && files("p=3") == p3Before,
        "no-hit delete must not rewrite anything")
    } finally {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("crash window: deleteKeysPartitioned leftover survives a crash, idempotent re-run heals") {
    // The documented crash window (Layers.scala scaladoc): a crash
    // between the dynamic overwrite and the emptied-directory cleanup
    // leaves the emptied partition's OLD files on disk — every
    // forgotten row silently resurrected on the next read. Defense (1)
    // is the contract under test: re-running the same delete re-finds
    // those rows and clears the directory. The spec reconstructs the
    // exact post-crash disk state (overwrite done, cleanup not).
    val root = java.nio.file.Files.createTempDirectory("graft_crash")
    try {
      val dest = root.toString + "/t"
      Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 2), (4L, "d", 2))
        .toDF("k", "v", "p")
        .write.mode("overwrite").partitionBy("p").parquet(dest)
      LayerWriter.deleteKeysPartitioned(spark, dest, "k",
        Seq(3L, 4L).toDF("k"), "p")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dest, "p=2")), "clean run clears p=2")
      // reconstruct the crash state: p=2's pre-delete files back on disk
      // (the overwrite never touched them; only the cleanup removes them)
      Seq((3L, "c", 2), (4L, "d", 2)).toDF("k", "v", "p")
        .write.mode("append").partitionBy("p").parquet(dest)
      val resurrected = spark.read.parquet(dest)
        .select("k").as[Long].collect().toSet
      assert(resurrected == Set(1L, 2L, 3L, 4L),
        s"the crash window must be observable before the re-run: $resurrected")
      // the recommended recovery: re-run the SAME delete — idempotent
      LayerWriter.deleteKeysPartitioned(spark, dest, "k",
        Seq(3L, 4L).toDF("k"), "p")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dest, "p=2")),
        "re-run must clear the leftover directory")
      val healed = spark.read.parquet(dest)
        .select("k", "v", "p").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(healed == Set((1L, "a", 1), (2L, "b", 1)), s"got $healed")
    } finally {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("crash window: mergeInto's swap leaves the merged data in __tmp; rename completes it") {
    // mergeInto's delete+rename swap is best-effort (Layers.scala
    // scaladoc): a crash between the two steps leaves dest MISSING and
    // the full merged result in <dest>__tmp. The documented recovery is
    // completing the rename — assert the tmp contents ARE the complete
    // merged state, not a partial write.
    val root = java.nio.file.Files.createTempDirectory("graft_swapcrash")
    try {
      val dest = root.toString + "/t"
      LayerWriter.mergeInto(spark,
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dest,
        keys = Seq("k"), preserved = Seq.empty)
      LayerWriter.mergeInto(spark,
        Seq((2L, "B"), (3L, "c")).toDF("k", "v"), dest,
        keys = Seq("k"), preserved = Seq.empty)
      val expected = spark.read.parquet(dest)
        .select("k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(expected == Set((1L, "a"), (2L, "B"), (3L, "c")))
      // reconstruct the crash state: merged data only under __tmp
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dest), spark.sparkContext.hadoopConfiguration)
      val destPath = new org.apache.hadoop.fs.Path(dest)
      val tmp = new org.apache.hadoop.fs.Path(dest + "__tmp")
      assert(fs.rename(destPath, tmp))
      assert(!fs.exists(destPath) && fs.exists(tmp),
        "post-crash state: dest missing, __tmp holds the merge")
      // the documented recovery: complete the rename
      assert(fs.rename(tmp, destPath))
      val recovered = spark.read.parquet(dest)
        .select("k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(recovered == expected,
        s"__tmp must hold the COMPLETE merged state: $recovered")
    } finally {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("deleteKeysPartitioned erases rows in the NULL partition too") {
    val root = java.nio.file.Files.createTempDirectory("graft_forget_null")
    try {
      val dest = root.toString + "/t"
      Seq((1L, "a", Some("x")), (2L, "b", None), (3L, "c", None))
        .toDF("k", "v", "p")
        .write.mode("overwrite").partitionBy("p").parquet(dest)
      // key 2 lives in the __HIVE_DEFAULT_PARTITION__ slice: isin()
      // alone would never match it and the row would survive
      LayerWriter.deleteKeysPartitioned(spark, dest, "k",
        Seq(2L).toDF("k"), "p")
      val after = spark.read.parquet(dest).select("k").as[Long]
        .collect().toSet
      assert(after == Set(1L, 3L), s"null-partition row must erase: $after")
      // emptying the null partition clears its directory
      LayerWriter.deleteKeysPartitioned(spark, dest, "k",
        Seq(3L).toDF("k"), "p")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dest, "p=__HIVE_DEFAULT_PARTITION__")),
        "emptied default partition must not keep stale files")
      assert(spark.read.parquet(dest).select("k").as[Long]
        .collect().toSet == Set(1L))
    } finally {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("deleteKeysPartitioned rejects partition types it cannot re-render") {
    val root = java.nio.file.Files.createTempDirectory("graft_forget_ts")
    try {
      val dest = root.toString + "/t"
      Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .toDF("k", "p")
        .write.mode("overwrite").partitionBy("p").parquet(dest)
      val ex = intercept[IllegalArgumentException](
        LayerWriter.deleteKeysPartitioned(spark, dest, "k",
          Seq(1L).toDF("k"), "p"))
      assert(ex.getMessage.contains("unsupported partition type"),
        "TIMESTAMP dirs encode differently than java toString — refuse " +
          "loudly instead of leaving stale files")
    } finally {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("deleteKeysPartitioned rejects a malformed keys frame") {
    val dest = java.nio.file.Files.createTempDirectory("graft_forget2")
    try {
      Seq((1L, 1)).toDF("k", "p")
        .write.mode("overwrite").partitionBy("p").parquet(dest.toString + "/t")
      val ex = intercept[IllegalArgumentException](
        LayerWriter.deleteKeysPartitioned(spark, dest.toString + "/t", "k",
          Seq((1L, "x")).toDF("k", "extra"), "p"))
      assert(ex.getMessage.contains("single-column"))
    } finally {
      val walk = java.nio.file.Files.walk(dest)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("CSV drop-dir streaming ingests files as they appear") {
    val drop = java.nio.file.Files.createTempDirectory("graft_drop")
    val schema = StructType(Seq(
      StructField("sale_id", LongType),
      StructField("amount", DoubleType)))
    java.nio.file.Files.writeString(drop.resolve("sales_1.csv"),
      "sale_id,amount\n1,10.5\n2,20.0\n")
    val stream = EventsStream.csvDropStream(spark, drop.toString, schema)
    assert(stream.isStreaming)
    val q = stream.groupBy().agg(count(lit(1)).as("n"), sum("amount").as("amt"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("drop_test").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("drop_test").first()
      assert(r1.getLong(0) == 2 && r1.getDouble(1) == 30.5)
      // second daily drop arrives
      java.nio.file.Files.writeString(drop.resolve("sales_2.csv"),
        "sale_id,amount\n3,9.5\n")
      q.processAllAvailable()
      val r2 = spark.table("drop_test").first()
      assert(r2.getLong(0) == 3 && r2.getDouble(1) == 40.0)
    } finally q.stop()
  }
}
