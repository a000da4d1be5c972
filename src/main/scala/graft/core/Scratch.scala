package graft.core

import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame

/** Scratch-directory hygiene for replay/serving entries that stage data
  * through a temp tree: repeated correctness/bench runs must not
  * accumulate parquet, checkpoint, and drop files on disk (csvDropReplay
  * already deletes its tree because the memory sink owns the rows; these
  * helpers give the same discipline to entries whose RESULT still points
  * at the tree).
  */
object Scratch {

  /** Root for REPLAY-EPHEMERAL scratch trees (stream checkpoints, state
    * deltas, drop/wave staging, sink parquet that is read back and
    * deleted within the same call). These trees carry no durability
    * contract — every byte is derived from the parquet inputs inside
    * one query invocation and deleted before it returns — so they
    * belong on the fastest local storage available, not on the
    * durable data disk: the HDFSBackedStateStore commits one delta
    * file per store instance per micro-batch and the checkpoint WAL
    * fsyncs offsets/commits, all tiny files where device latency, not
    * bandwidth, is the cost (guide §6). Default: `/dev/shm` when it is
    * a writable directory (Linux tmpfs), else `java.io.tmpdir`.
    * A deployment points `GRAFT_STREAM_SCRATCH` at its fast local
    * device (NVMe scratch, ramdisk); durable checkpoints for real
    * continuous streams are the caller's explicit
    * `checkpointLocation` and are NOT routed through this.
    * Measured (sf0.1, local[32], min-of-2-warm, this round): the
    * 9-row st_* bench family 14.99 → 12.52 s from this alone.
    */
  private lazy val fastRoot: Option[Path] =
    sys.env.get("GRAFT_STREAM_SCRATCH").filter(_.nonEmpty)
      .map(java.nio.file.Paths.get(_))
      .orElse(Some(java.nio.file.Paths.get("/dev/shm")))
      .filter(p => Files.isDirectory(p) && Files.isWritable(p))

  /** Free-space slack the fast root must retain BEYOND the estimated
    * tree size: tmpfs is RAM — filling it competes with executor heap
    * and fails with ENOSPC mid-stream, so the guard errs toward disk.
    */
  private val SlackBytes: Long = 512L << 20

  /** Does `root` have room for an `expectedBytes`-sized scratch tree?
    * 2× the estimate (state deltas + sink + checkpoint WAL routinely
    * exceed the input bytes they derive from) plus [[SlackBytes]]. A
    * probe failure (exotic filesystem) reads as "no room": correctness
    * never depends on WHERE the tree lands, only latency does.
    */
  private def hasRoom(root: Path, expectedBytes: Long): Boolean =
    try {
      val usable = Files.getFileStore(root).getUsableSpace
      val want = 2L * math.min(math.max(0L, expectedBytes),
        Long.MaxValue / 4) // clamp: no overflow on absurd estimates
      usable - SlackBytes >= want
    } catch { case _: Throwable => false }

  /** `Files.createTempDirectory` on the fast-scratch root (see
    * [[fastRoot]]); falls back to the JVM default tmpdir when no fast
    * root exists OR the root lacks usable space for `expectedBytes`
    * (2× + slack — see [[hasRoom]]): a replay whose staging tree
    * outgrows `/dev/shm` must degrade to disk latency, not die on
    * ENOSPC or squeeze the heap. `expectedBytes` is the caller's size
    * signal (typically the source-table bytes the tree derives from);
    * 0 = unknown-small (checkpoint/WAL-only trees), which only the
    * slack floor guards.
    */
  def fastTempDirectory(prefix: String, expectedBytes: Long = 0L): Path =
    fastRoot match {
      case Some(r) if hasRoom(r, expectedBytes) =>
        Files.createTempDirectory(r, prefix)
      case _ => Files.createTempDirectory(prefix)
    }

  /** Bytes on disk under `path` (file or directory tree). Directory
    * sizes walk RECURSIVELY to leaf files — a partitioned/nested table
    * dir would otherwise sum ~4 KiB directory entries and silently
    * understate the scale signal (the startAt8 store-count law and the
    * [[fastTempDirectory]] guard both key on it).
    */
  def pathBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(path))
  }

  /** [[pathBytes]] of one sf-table (`<sfDir>/<table>.parquet`) — the
    * usual size signal replay entries hand [[fastTempDirectory]].
    */
  def tableBytes(sfDir: String, table: String): Long =
    pathBytes(s"$sfDir/$table.parquet")

  def deleteRecursively(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => Files.deleteIfExists(p))
    finally walk.close()
  }

  /** Move the single part-file a `coalesce(1)` write produced from its
    * stage directory to `dest` — the shared tail of every
    * file-drop/wave replay (CSV drops, parquet waves, restart
    * fixtures). Fails loudly if no part with the suffix exists, rather
    * than silently streaming an empty wave.
    */
  def moveSinglePart(stage: Path, suffix: String, dest: Path): Unit = {
    val parts = Files.list(stage)
    try {
      val part = parts
        .filter(p => p.getFileName.toString.endsWith(suffix))
        .findFirst
        .orElseThrow(() => new IllegalStateException(
          s"no *$suffix part file under $stage"))
      Files.move(part, dest)
    } finally parts.close()
  }

  /** Materialize a result off its temp tree, then delete the tree.
    *
    * EXECUTOR-side pinning via `localCheckpoint(eager = true)`: the
    * plan's partitions compute and persist as blocks (spillable
    * MEMORY_AND_DISK), lineage is truncated, and the tree can go. The
    * original implementation collect()ed the rows into a driver
    * LocalRelation — corpus-sized results (the full-sales replays are
    * 6M rows at sf1) then re-serialized INTO the next job's task (an
    * 822 MB task binary), which is exactly the driver-side scaling
    * failure this engine is designed to avoid; at 8 GiB driver heap it
    * OOMed the dispatcher and wedged the sf1 gate. Partition-local
    * ordering survives checkpointing and every consumer either
    * re-sorts or writes through `coalesce(1)` (partition-id order), so
    * results are unchanged.
    *
    * Local-mode caveat (documented, not load-bearing here): a
    * localCheckpoint cannot recompute if an executor dies — fine on
    * local[n]; a multi-node deployment would use `checkpoint()` against
    * the cluster's checkpoint dir for the same seam.
    */
  def materializeAndDelete(df: DataFrame, root: Path): DataFrame = {
    val out = df.localCheckpoint(eager = true)
    deleteRecursively(root)
    out
  }
}
