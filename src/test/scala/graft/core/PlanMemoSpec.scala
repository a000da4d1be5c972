package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PlanMemoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("re-read after an append misses the stale entry (incremental-index contract)") {
    // The wave-N/wave-N+1 workflow: a stored index is written, memoized
    // through cached(), appended to, and re-read in the SAME session.
    // sameResult alone canonicalizes both reads equal (the FileIndex
    // compares only rootPaths) — the file-listing fingerprint must force
    // a miss so wave N+1 probes the CURRENT index, not wave N's.
    val root = java.nio.file.Files.createTempDirectory("planmemo")
    try {
      val dir = root.toString + "/idx"
      spark.range(0, 10).select(col("id")).write.mode("overwrite").parquet(dir)
      val first = PlanMemo.cached("pmspec", spark.read.parquet(dir))
      assert(first.count() == 10)
      // identical re-read: must HIT (same frame object, no re-cache)
      val again = PlanMemo.cached("pmspec", spark.read.parquet(dir))
      assert(again eq first, "unchanged path must serve the memoized frame")
      // append a wave, re-read: must MISS and see the new rows
      spark.range(10, 15).select(col("id")).write.mode("append").parquet(dir)
      val updated = PlanMemo.cached("pmspec", spark.read.parquet(dir))
      assert(!(updated eq first), "post-append re-read must not be the stale frame")
      assert(updated.count() == 15,
        "post-append re-read must see the appended wave")
      // overwrite: again a distinct listing, again a fresh frame
      spark.range(0, 3).select(col("id")).write.mode("overwrite").parquet(dir)
      val overwritten = PlanMemo.cached("pmspec", spark.read.parquet(dir))
      assert(overwritten.count() == 3)
    } finally {
      PlanMemo.invalidate(spark, "pmspec")
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("in-place rewrite preserving names and total size misses via mtime") {
    // The round-11 advice case: an external process rewrites a stored
    // index IN PLACE — part-file names and byte counts unchanged, only
    // content (and mtime) differ. A name+size fingerprint would serve
    // the stale cached frame; the mtime term must force a miss. The
    // fixture bumps ONLY the mtime (the one term the old fingerprint
    // lacked): a re-read must miss and serve a FRESH frame — which, by
    // the append test above, reads the path's current bytes.
    val root = java.nio.file.Files.createTempDirectory("planmemo_mtime")
    try {
      val dirA = root.toString + "/a"
      spark.range(0, 10).select(col("id")).coalesce(1)
        .write.parquet(dirA)
      def part(dir: String) = {
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        try s.filter(p => p.getFileName.toString.startsWith("part-"))
          .findFirst().get()
        finally s.close()
      }
      val pa = part(dirA)
      val first = PlanMemo.cached("pmspec3", spark.read.parquet(dirA))
      assert(first.count() == 10)
      // unchanged path: HIT (the identity check the appended-wave test
      // also pins — repeated here as the control for the touch below)
      assert(PlanMemo.cached("pmspec3", spark.read.parquet(dirA)) eq first)
      // the in-place rewrite signature: same name, same size, new mtime
      val size0 = java.nio.file.Files.size(pa)
      java.nio.file.Files.setLastModifiedTime(pa,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + 5000))
      assert(java.nio.file.Files.size(pa) == size0)
      val fresh = PlanMemo.cached("pmspec3", spark.read.parquet(dirA))
      assert(!(fresh eq first),
        "same-name same-size rewrite must not serve the stale frame")
      assert(fresh.count() == 10)
    } finally {
      PlanMemo.invalidate(spark, "pmspec3")
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("invalidate drops a tag's entries eagerly") {
    val df = PlanMemo.cached("pmspec2", spark.range(0, 5).toDF("id"))
    assert(df.count() == 5)
    PlanMemo.invalidate(spark, "pmspec2")
    val fresh = PlanMemo.cached("pmspec2", spark.range(0, 5).toDF("id"))
    assert(!(fresh eq df), "invalidate must evict the cached frame")
    PlanMemo.invalidate(spark, "pmspec2")
  }
}
