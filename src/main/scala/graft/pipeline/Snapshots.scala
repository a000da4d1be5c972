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
    */
  def commit(df: DataFrame, dir: String, append: Boolean = true): Int = {
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
    val out = f.create(manifestPath(dir, v), false)
    try out.write(lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    v
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
    dead.foreach(v => f.delete(manifestPath(dir, v), false))
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
  def compact(spark: SparkSession, dir: String, numFiles: Int): Int = {
    require(numFiles >= 1, s"SnapshotTable.compact: numFiles $numFiles")
    commit(read(spark, dir).repartition(numFiles), dir, append = false)
  }
}
