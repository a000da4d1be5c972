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

  test("manifest stats skip files; readWhere == read().filter exactly") {
    withDir { dest =>
      // range-partitioned layout → files tight in k → skippable; 50
      // nulls exercise the null-bound path
      val d1 = spark.range(0, 4000)
        .select(col("id").as("k"), (col("id") * 2).as("v"))
        .repartitionByRange(8, col("k"))
      SnapshotTable.commit(d1, dest, statsCols = Seq("k"))
      // second commit WITHOUT stats: its files must be kept
      // conservatively, never skipped
      val d2 = spark.range(4000, 4200)
        .select(when(col("id") < 4100, col("id")).as("k"),
          (col("id") * 2).as("v")).repartition(2)
      SnapshotTable.commit(d2, dest)
      val (kept, skipped) =
        SnapshotTable.pruneFiles(spark, dest, "k", 1000L, 1499L)
      assert(skipped.nonEmpty,
        "a selective range over a range layout must skip files")
      // no-stats (v2) files all survive pruning
      assert(kept.count(_.contains("/v2/")) ==
        (kept ++ skipped).count(_.contains("/v2/")))
      val pruned = SnapshotTable.readWhere(spark, dest, "k", 1000L, 1499L)
      val full = SnapshotTable.read(spark, dest)
        .filter(col("k") >= 1000L && col("k") <= 1499L)
      assert(pruned.count() == 500 &&
        pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
      // provably-empty range: no file can match → empty result, and the
      // second commit's null keys never resurface through skipping
      assert(SnapshotTable.readWhere(spark, dest, "k", 100000L, 200000L)
        .isEmpty)
    }
  }

  test("Z-order + manifest stats: one layout prunes range scans on BOTH dims") {
    withDir { dest =>
      // 2-D uniform grid, z-order laid out into range partitions: every
      // file is then tight in x AND y simultaneously — the multi-dim
      // claim ZOrder.fileStats makes, here proven against the REAL
      // written files via the snapshot stats rather than simulated
      // envelopes
      val grid = spark.range(0, 4096).select(
        (col("id") % 64).as("x"), (col("id") / 64).as("y"))
      val z = graft.operators.ZOrder.zvalue(Seq(col("x"), col("y")), 6)
      val laid = grid.withColumn("z", z)
        .repartitionByRange(16, col("z"))
        .sortWithinPartitions("z").drop("z")
      SnapshotTable.commit(laid, dest, statsCols = Seq("x", "y"))
      val (keptX, skippedX) =
        SnapshotTable.pruneFiles(spark, dest, "x", 0L, 7L)
      val (keptY, skippedY) =
        SnapshotTable.pruneFiles(spark, dest, "y", 0L, 7L)
      assert(skippedX.nonEmpty && skippedY.nonEmpty,
        s"z-order layout must prune BOTH dimensions: " +
          s"x ${keptX.size}/${keptX.size + skippedX.size}, " +
          s"y ${keptY.size}/${keptY.size + skippedY.size}")
      // and the pruned reads stay exact
      val px = SnapshotTable.readWhere(spark, dest, "x", 0L, 7L)
      assert(px.count() == 8L * 64 &&
        px.agg(max("x")).collect()(0).getLong(0) == 7L)
    }
  }

  test("stats survive rollback and die with expired versions") {
    withDir { dest =>
      val d1 = spark.range(0, 1000).select(col("id").as("k"))
        .repartitionByRange(4, col("k"))
      SnapshotTable.commit(d1, dest, statsCols = Seq("k"))          // v1
      SnapshotTable.commit(
        spark.range(1000, 2000).select(col("id").as("k"))
          .repartitionByRange(4, col("k")),
        dest, statsCols = Seq("k"))                                  // v2
      SnapshotTable.rollback(spark, dest, 1)                         // v3
      // rollback carried v1's stats: pruning still skips
      val (_, skipped) = SnapshotTable.pruneFiles(spark, dest, "k", 0L, 99L)
      assert(skipped.nonEmpty, "rollback must carry the stats forward")
      // v3 (rollback of v1) must not see v2's rows, pruned or not
      assert(SnapshotTable.readWhere(spark, dest, "k", 0L, 5000L).count()
        == 1000)
      SnapshotTable.expire(spark, dest, keepLast = 1)
      val stray = java.nio.file.Files.list(
        java.nio.file.Paths.get(dest, "_manifests"))
      try {
        import scala.jdk.CollectionConverters._
        val names = stray.iterator().asScala.map(_.getFileName.toString).toSet
        assert(!names.contains("v1.stats.tsv") &&
          !names.contains("v2.stats.tsv"),
          s"expired versions' stats files must be deleted: $names")
      } finally stray.close()
    }
  }

  test("string stats prune in Spark's UTF-8 binary order, not UTF-16") {
    withDir { dest =>
      // Spark computes min/max in UTF8String (code-point) order, so for
      // {U+E000, U+1F600, U+F000} the stored envelope is
      // [U+E000, U+1F600]. java.lang.String.compareTo (UTF-16 code
      // units) would put the surrogate-pair max U+1F600 (D83D DE00)
      // BELOW the lo bound U+F000 and skip the file — silently dropping
      // the U+F000 row. cmpStat must use unsigned UTF-8 bytes.
      val rows = Seq("", new String(Character.toChars(0x1F600)),
        "").toDF("s").coalesce(1)
      SnapshotTable.commit(rows, dest, statsCols = Seq("s"))
      val q = SnapshotTable.readWhere(spark, dest, "s", "", "")
      assert(q.count() == 1, "UTF-16 envelope compare would drop this row")
      val full = SnapshotTable.read(spark, dest)
        .filter(col("s") >= "" && col("s") <= "")
      assert(q.exceptAll(full).isEmpty && full.exceptAll(q).isEmpty)
    }
  }

  test("timestamp stats are zone-free epoch micros; DST fold cannot invert an envelope") {
    val oldTz = java.util.TimeZone.getDefault
    try {
      // under America/New_York, the 2024-11-03 01:30 wall time occurs
      // TWICE (05:30Z and 06:30Z); Timestamp.toString renders both
      // identically, so a toString-rendered envelope is not
      // order-preserving. Epoch-micros stats stay monotone.
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("America/New_York"))
      withDir { dest =>
        val base = java.time.Instant.parse("2024-11-03T04:00:00Z")
        val ts = (0 until 16).map(h =>
          Tuple1(java.sql.Timestamp.from(base.plusSeconds(h * 1800L))))
        val df = ts.toDF("t").repartitionByRange(4, col("t"))
        SnapshotTable.commit(df, dest, statsCols = Seq("t"))
        // stats must be stored numerically (epoch micros), not renders
        val statsTsv = files(dest, "_manifests").collect {
          case (p, bytes) if p.endsWith("v1.stats.tsv") =>
            new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
        }.head
        assert(statsTsv.linesIterator.forall { l =>
          val Array(_, _, mn, mx) = l.split('\t')
          mn.forall(_.isDigit) && mx.forall(_.isDigit)
        }, s"timestamp stats must be epoch micros, got:\n$statsTsv")
        // a range pinned across the fold prunes exactly
        val lo = java.sql.Timestamp.from(base.plusSeconds(5 * 1800L))
        val hi = java.sql.Timestamp.from(base.plusSeconds(8 * 1800L))
        val (kept, skipped) =
          SnapshotTable.pruneFiles(spark, dest, "t", lo, hi)
        assert(skipped.nonEmpty, "range layout must skip timestamp files")
        val q = SnapshotTable.readWhere(spark, dest, "t", lo, hi)
        val full = SnapshotTable.read(spark, dest)
          .filter(col("t") >= lit(lo) && col("t") <= lit(hi))
        assert(q.count() == 4 &&
          q.exceptAll(full).isEmpty && full.exceptAll(q).isEmpty)
      }
    } finally java.util.TimeZone.setDefault(oldTz)
  }

  test("pre-1970 fractional-second stats floor toward -inf; envelope stays monotone") {
    // 1969-12-31T23:59:59.999 under truncating division rendered as
    // +999000 µs (rounding toward zero) — AFTER epoch instants, so an
    // envelope holding it could invert and prune a live file. floorDiv
    // renders -1000 µs, keeping the numeric order equal to time order
    // (ADVICE r9). The fixture straddles the epoch with fractional
    // seconds on both sides.
    withDir { dest =>
      val epoch = java.time.Instant.EPOCH
      val ts = Seq(-3600_001L, -999L, -1L, 1L, 999L, 3600_001L).map(ms =>
        Tuple1(java.sql.Timestamp.from(epoch.plusMillis(ms))))
      val df = ts.toDF("t").repartitionByRange(3, col("t"))
      SnapshotTable.commit(df, dest, statsCols = Seq("t"))
      val statsTsv = files(dest, "_manifests").collect {
        case (p, bytes) if p.endsWith("v1.stats.tsv") =>
          new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
      }.head
      val envs = statsTsv.linesIterator.map { l =>
        val Array(_, _, mn, mx) = l.split('\t')
        (mn.toLong, mx.toLong)
      }.toSeq
      // every per-file envelope must be internally ordered, and the
      // global min must be the floored -3600.001 s, not a positive fold
      assert(envs.forall { case (mn, mx) => mn <= mx })
      assert(envs.map(_._1).min == -3600_001_000L,
        s"pre-1970 min must floor to -3600001000 us, got $envs")
      // a range query pinned just below the epoch prunes exactly
      val lo = java.sql.Timestamp.from(epoch.plusMillis(-999))
      val hi = java.sql.Timestamp.from(epoch.plusMillis(999))
      val q = SnapshotTable.readWhere(spark, dest, "t", lo, hi)
      val full = SnapshotTable.read(spark, dest)
        .filter(col("t") >= lit(lo) && col("t") <= lit(hi))
      assert(q.count() == 4 &&
        q.exceptAll(full).isEmpty && full.exceptAll(q).isEmpty)
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
