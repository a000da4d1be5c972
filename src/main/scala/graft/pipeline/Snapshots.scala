package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Copy-on-write snapshot table — the lakehouse versioning core
  * (Delta/Iceberg's table format, reduced to the piece a query engine
  * needs): every commit writes an IMMUTABLE data-file set plus a
  * manifest naming exactly the files that make up that version.
  * Readers pin a version by scanning only its manifest's paths, so
  *
  *  - **time travel**: any historical version stays queryable,
  *  - **reader isolation**: a reader holding version N never sees a
  *    concurrent commit's files (nothing it reads is ever mutated),
  *  - **rollback**: re-committing an old manifest is O(1) metadata.
  *
  * Layout under `dir`:
  * {{{
  *   data/v<N>/part-*.parquet   -- the files commit N added (immutable)
  *   _manifests/v<N>.txt        -- '\n'-joined data dirs of version N
  * }}}
  *
  * An APPEND commit's manifest = parent manifest + its new data dir; an
  * OVERWRITE commit's manifest = its new data dir alone — old files are
  * RETAINED either way (that is what keeps history queryable; vacuuming
  * expired versions is a separate GC concern, as in the real formats).
  *
  * Scale posture: manifests hold directory paths, not per-row state —
  * commit cost is one data write + one tiny metadata file; version
  * reads plan a plain multi-path parquet scan (pushdown/pruning intact).
  * Single-writer by contract: the real formats arbitrate concurrent
  * commits with an atomic swap on the manifest pointer (Delta's log
  * mutex, Iceberg's metadata CAS); this mini-format documents the same
  * assumption instead of implementing the arbitration.
  */
object SnapshotTable {

  private def fs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_manifests")

  private def manifestPath(dir: String, v: Int) =
    new org.apache.hadoop.fs.Path(manifestDir(dir), s"v$v.txt")

  private def statsPath(dir: String, v: Int) =
    new org.apache.hadoop.fs.Path(manifestDir(dir), s"v$v.stats.tsv")

  /** Committed versions, ascending (empty for a fresh table). */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toIndexedSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".txt") =>
        s.stripPrefix("v").stripSuffix(".txt").toInt }
      .sorted
  }

  private def readManifest(spark: SparkSession, dir: String,
                           v: Int): Seq[String] = {
    val f = fs(spark, dir)
    val in = f.open(manifestPath(dir, v))
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).split("\n").toIndexedSeq
      .filter(_.nonEmpty)
    finally in.close()
  }

  /** Commit `df` as the next version. `append = true` keeps the parent
    * version's files in the new manifest; `false` is a logical
    * overwrite (new manifest lists only this commit's files — the old
    * ones stay on disk for history). Returns the new version number.
    *
    * `statsCols` opts the commit into DATA SKIPPING (Iceberg's manifest
    * column stats / Delta's per-file minValues-maxValues, reduced to
    * the piece a scan prunes on): after the data write, ONE
    * commit-sized pass over the new files collects each file's min/max
    * per stats column, appended to the parent's stats so the manifest
    * knows every live file's envelope. [[readWhere]] then drops whole
    * files whose envelope cannot intersect a range predicate BEFORE the
    * scan is planned — at 100 TB, with a layout that keeps files tight
    * in the filter dimensions ([[graft.operators.ZOrder]]), this is the
    * difference between listing-and-skipping and reading the table.
    * Files committed without stats are kept conservatively, so stats
    * are always an optimization, never a correctness input.
    */
  def commit(df: DataFrame, dir: String, append: Boolean = true,
             statsCols: Seq[String] = Nil): Int = {
    val spark = df.sparkSession
    val prev = versions(spark, dir)
    val v = prev.lastOption.getOrElse(0) + 1
    val dataDir = s"$dir/data/v$v"
    df.write.mode("error").parquet(dataDir)
    val parent =
      if (append && prev.nonEmpty) readManifest(spark, dir, prev.last)
      else Seq.empty
    val lines = (parent :+ dataDir).mkString("\n")
    val f = fs(spark, dir)
    val parentStats =
      if (append && prev.nonEmpty) readStats(spark, dir, prev.last)
      else Seq.empty
    val newStats =
      if (statsCols.isEmpty) Seq.empty
      else collectFileStats(spark, dataDir, statsCols)
    val stats = parentStats ++ newStats
    if (stats.nonEmpty) {
      val out = f.create(statsPath(dir, v), false)
      try out.write(stats.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val out = f.create(manifestPath(dir, v), false)
    try out.write(lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    v
  }

  /** One aggregation over the JUST-WRITTEN commit directory: per file,
    * min/max of each stats column. Commit-sized work (never touches
    * parent data). TSV lines `fileKey \t col \t min \t max` with
    * percent-encoded fields; fileKey = `v<N>/<fileName>` — the last two
    * path segments, stable across URI-scheme differences between
    * `input_file_name()` and later directory listings. An all-NULL
    * column in a file renders the `\N` marker → no usable envelope →
    * the file is kept conservatively at prune time.
    */
  private def collectFileStats(spark: SparkSession, dataDir: String,
                               statsCols: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.functions._
    val enc = (s: String) =>
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val rows = spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.toIndexedSeq.flatMap { r =>
      val segs = r.getAs[String]("__file").split('/')
      val key = segs.takeRight(2).mkString("/")
      statsCols.map { c =>
        val mn = r.getAs[Any](s"__min_$c")
        val mx = r.getAs[Any](s"__max_$c")
        // Timestamps render as epoch MICROSECONDS (not Timestamp
        // .toString): the local-zone rendering is not order-preserving
        // across DST folds or across writer JVMs in different zones, so
        // an envelope written that way could invert and prune a live
        // file. Epoch micros are zone-free and compare numerically.
        val render = (x: Any) => x match {
          case null => "\\N"
          case t: java.sql.Timestamp =>
            (Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos.toLong / 1000L).toString
          case i: java.time.Instant =>
            (i.getEpochSecond * 1000000L + i.getNano.toLong / 1000L).toString
          case t: java.time.LocalDateTime => // TIMESTAMP_NTZ: pin to UTC
            (t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              t.getNano.toLong / 1000L).toString
          case other => enc(other.toString)
        }
        s"${enc(key)}\t${enc(c)}\t${render(mn)}\t${render(mx)}"
      }
    }
  }

  private def readStats(spark: SparkSession, dir: String,
                        v: Int): Seq[String] = {
    val f = fs(spark, dir)
    val p = statsPath(dir, v)
    if (!f.exists(p)) Seq.empty
    else {
      val in = f.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).split("\n").toIndexedSeq
        .filter(_.nonEmpty)
      finally in.close()
    }
  }

  /** Parsed stats of one version: fileKey -> col -> (min, max) as the
    * stored strings; `None` bound = the `\N` all-null marker.
    */
  private def statsMap(spark: SparkSession, dir: String, v: Int)
      : Map[String, Map[String, (Option[String], Option[String])]] = {
    val dec = (s: String) =>
      java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)
    readStats(spark, dir, v).flatMap { line =>
      line.split('\t') match {
        case Array(k, c, mn, mx) =>
          Some((dec(k), dec(c),
            if (mn == "\\N") None else Some(dec(mn)),
            if (mx == "\\N") None else Some(dec(mx))))
        case _ => None
      }
    }.groupBy(_._1).map { case (k, rows) =>
      k -> rows.map(r => r._2 -> (r._3, r._4)).toMap
    }
  }

  /** O(1)-metadata rollback: commit a NEW version whose manifest is a
    * copy of `toVersion`'s — no data files move, history stays intact
    * (the rolled-back-over versions remain queryable), and readers of
    * "latest" see the old content. Returns the new version number.
    */
  def rollback(spark: SparkSession, dir: String, toVersion: Int): Int = {
    val vs = versions(spark, dir)
    require(vs.contains(toVersion),
      s"SnapshotTable.rollback: version $toVersion not in ${vs.mkString(",")}")
    val v = vs.last + 1
    val lines = readManifest(spark, dir, toVersion).mkString("\n")
    val f = fs(spark, dir)
    // stats travel with the manifest they describe
    val stats = readStats(spark, dir, toVersion)
    if (stats.nonEmpty) {
      val so = f.create(statsPath(dir, v), false)
      try so.write(stats.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally so.close()
    }
    val out = f.create(manifestPath(dir, v), false)
    try out.write(lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    v
  }

  /** Read a pinned version (default: latest). Plans a plain multi-path
    * parquet scan over exactly that version's manifest — predicate
    * pushdown and column pruning apply as on any parquet read.
    */
  def read(spark: SparkSession, dir: String, version: Int = -1): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"SnapshotTable.read: no versions at $dir")
    val v = if (version == -1) vs.last else version
    require(vs.contains(v),
      s"SnapshotTable.read: version $v not in ${vs.mkString(",")}")
    val paths = readManifest(spark, dir, v)
    spark.read.parquet(paths: _*)
  }

  /** Type-faithful comparison of two stored stat strings under the
    * column's Spark type. Numerics go through exact decimal parsing so
    * "9" < "10" and double renderings round-trip; timestamps compare as
    * epoch micros; strings compare in Spark's own order — UTF8String is
    * ordered by UNSIGNED UTF-8 bytes (= code-point order), whereas
    * java.lang.String.compareTo is UTF-16 code-UNIT order, and the two
    * disagree for strings mixing supplementary-plane characters with
    * U+E000–U+FFFF. Pruning with the wrong order would silently drop
    * files whose envelope does intersect the predicate, breaking the
    * "stats are never a correctness input" contract.
    */
  private def cmpStat(dt: org.apache.spark.sql.types.DataType,
                      a: String, b: String): Int = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        BigInt(a).compare(BigInt(b))
      case FloatType | DoubleType =>
        java.lang.Double.compare(a.toDouble, b.toDouble)
      case _: DecimalType => BigDecimal(a).compare(BigDecimal(b))
      case TimestampType | TimestampNTZType =>
        java.lang.Long.compare(tsMicros(a), tsMicros(b))
      case DateType => a.compareTo(b) // ISO yyyy-MM-dd is order-preserving
      case _ => // StringType: unsigned UTF-8 bytes = Spark's binary order
        java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** Timestamp stat string → epoch micros. New-format stats are plain
    * longs; pruneFiles' predicate bounds (and any stats TSV written
    * before the epoch-micros change) arrive as `Timestamp.toString`
    * renders, parsed here in the JVM default zone — same zone the
    * caller's Timestamp literal lives in, so bound-vs-bound comparisons
    * stay consistent on one host.
    */
  private def tsMicros(s: String): Long =
    if (s.nonEmpty && s.forall(c => c.isDigit || c == '-') &&
        (s.length > 1 || s.head != '-'))
      s.toLong
    else {
      val t = java.sql.Timestamp.valueOf(s)
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos.toLong / 1000L
    }

  /** File-skipping decision for a version and a closed range predicate
    * `lo <= column <= hi`: lists the version's files and partitions
    * them into (kept, skipped) by their stats envelopes. A file is
    * skipped ONLY when it has a complete recorded envelope that
    * provably cannot intersect the range — no stats, or an all-null
    * bound, keeps the file. Exposed (not private) so specs and
    * operations tooling can report skipping effectiveness; readers use
    * [[readWhere]].
    */
  def pruneFiles(spark: SparkSession, dir: String, column: String,
                 lo: Any, hi: Any, version: Int = -1)
      : (Seq[String], Seq[String]) = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"SnapshotTable.pruneFiles: no versions at $dir")
    val v = if (version == -1) vs.last else version
    require(vs.contains(v),
      s"SnapshotTable.pruneFiles: version $v not in ${vs.mkString(",")}")
    val f = fs(spark, dir)
    val files = readManifest(spark, dir, v).flatMap { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      f.listStatus(p).toIndexedSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
    }
    val dt = read(spark, dir, v).schema(column).dataType
    val stats = statsMap(spark, dir, v)
    // render predicate bounds the same way stats are stored
    val boundStr = (x: Any) => x match {
      case t: java.sql.Timestamp =>
        (Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos.toLong / 1000L).toString
      case i: java.time.Instant =>
        (i.getEpochSecond * 1000000L + i.getNano.toLong / 1000L).toString
      case t: java.time.LocalDateTime =>
        (t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano.toLong / 1000L).toString
      case other => other.toString
    }
    val (loS, hiS) = (boundStr(lo), boundStr(hi))
    val (kept, skipped) = files.partition { p =>
      val key = s"${p.getParent.getName}/${p.getName}"
      stats.get(key).flatMap(_.get(column)) match {
        case Some((Some(mn), Some(mx))) =>
          // keep iff [mn, mx] intersects [lo, hi]
          cmpStat(dt, mx, loS) >= 0 && cmpStat(dt, mn, hiS) <= 0
        case _ => true // no stats / all-null bound: conservative keep
      }
    }
    (kept.map(_.toString), skipped.map(_.toString))
  }

  /** Range read with manifest data skipping: semantically IDENTICAL to
    * `read(...).filter(lo <= column && column <= hi)` — stats only
    * remove files the filter would reject wholesale — but the skipped
    * files never enter the scan's file index at all. With a
    * range/Z-order layout committed via `statsCols`, a selective range
    * predicate reads a handful of files out of a 100 TB table; the
    * residual filter still applies row-level inside kept files.
    */
  def readWhere(spark: SparkSession, dir: String, column: String,
                lo: Any, hi: Any, version: Int = -1): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val (kept, _) = pruneFiles(spark, dir, column, lo, hi, version)
    if (kept.isEmpty)
      // provably-empty result: Catalyst folds filter(false) to an empty
      // relation, so not even the kept-file listing is scanned
      read(spark, dir, version).filter(lit(false))
    else spark.read.parquet(kept: _*)
      .filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }

  /** Version expiry + vacuum — the GC a long-lived store needs (without
    * it every commit's files live forever; Delta's VACUUM / Iceberg's
    * `expire_snapshots` are the same two-step). Keeps the newest
    * `keepLast` versions; drops older manifests; then deletes every
    * `data/v*` directory no SURVIVING manifest references.
    *
    * Crash-safety ordering: manifests are deleted BEFORE data. A crash
    * mid-GC can only leave unreferenced data directories behind
    * (harmless garbage a re-run collects — the operation is
    * idempotent); it can never leave a live manifest pointing at
    * deleted files. Live versions' data files are never touched, let
    * alone rewritten — reads of surviving versions are byte-identical
    * before and after (SnapshotSpec pins this).
    *
    * @return (expired version numbers, deleted data directories)
    */
  def expire(spark: SparkSession, dir: String,
             keepLast: Int): (Seq[Int], Seq[String]) = {
    require(keepLast >= 1, s"SnapshotTable.expire: keepLast $keepLast")
    val vs = versions(spark, dir)
    val (dead, live) = vs.splitAt(math.max(0, vs.length - keepLast))
    val f = fs(spark, dir)
    // referenced BY SURVIVORS, computed before any deletion
    val referenced = live.flatMap(readManifest(spark, dir, _)).toSet
    dead.foreach { v =>
      f.delete(manifestPath(dir, v), false)
      f.delete(statsPath(dir, v), false) // no-op when absent
    }
    val dataRoot = new org.apache.hadoop.fs.Path(dir, "data")
    val removed =
      if (!f.exists(dataRoot)) Seq.empty[String]
      else f.listStatus(dataRoot).toIndexedSeq
        .map(_.getPath)
        .filterNot(p => referenced.exists(r =>
          new org.apache.hadoop.fs.Path(r).getName == p.getName))
        .map { p => f.delete(p, true); p.toString }
    (dead, removed)
  }

  /** Small-file compaction: rewrite the LATEST version's content as one
    * overwrite commit with `numFiles` files. Pure data reorganization —
    * the new version is row-identical to the old latest (SnapshotSpec
    * proves the read back equal), history keeps the fragmented
    * versions until [[expire]] collects them. The rewrite is one
    * repartition — at scale, run it per partition-predicate slice the
    * same way the real formats compact bin-packed file groups.
    */
  def compact(spark: SparkSession, dir: String, numFiles: Int,
              statsCols: Seq[String] = Nil): Int = {
    require(numFiles >= 1, s"SnapshotTable.compact: numFiles $numFiles")
    commit(read(spark, dir).repartition(numFiles), dir, append = false,
      statsCols = statsCols)
  }
}
