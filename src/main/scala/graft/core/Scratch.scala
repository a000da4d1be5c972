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

  /** Pin a SMALL-BY-CONTRACT result into memory, then delete the temp
    * tree it reads from. The collect is bounded by the caller's contract
    * (a top-k result, a dimension snapshot) — never a corpus-sized
    * frame; the returned frame is a local-relation twin with the same
    * schema, safe to use after the tree is gone.
    */
  def materializeAndDelete(df: DataFrame, root: Path): DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    val out = df.sparkSession.createDataFrame(rows, df.schema)
    deleteRecursively(root)
    out
  }
}
