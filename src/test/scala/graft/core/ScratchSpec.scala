package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pins the fast-scratch free-space guard: a replay whose estimated
  * tree size cannot fit the tmpfs root must fall back to the default
  * tmpdir (degrade to disk latency) instead of risking ENOSPC mid-
  * stream or squeezing executor heap out of RAM.
  */
class ScratchSpec extends AnyFunSuite {

  private def tmpdir = java.nio.file.Paths
    .get(System.getProperty("java.io.tmpdir")).toRealPath()

  test("oversized estimate forces fallback off the fast root") {
    // An estimate no filesystem can hold: the guard must reject the
    // fast root and create under java.io.tmpdir.
    val p = Scratch.fastTempDirectory("graft_spec_big", Long.MaxValue / 8)
    try assert(p.toRealPath().startsWith(tmpdir))
    finally Scratch.deleteRecursively(p)
  }

  test("small / unknown estimates use the fast root when one exists") {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val fastAvailable = sys.env.get("GRAFT_STREAM_SCRATCH") match {
      case Some(s) if s.nonEmpty => true // explicit root: trust it
      case _ => java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm)
    }
    assume(fastAvailable, "no fast scratch root on this host")
    val p = Scratch.fastTempDirectory("graft_spec_small", 1L << 20)
    // Wherever the root is, the call must succeed and be writable;
    // on the default /dev/shm root the tree must land there.
    try {
      if (sys.env.get("GRAFT_STREAM_SCRATCH").forall(_.isEmpty))
        assert(p.toRealPath().startsWith(shm.toRealPath()))
      val f = p.resolve("probe")
      java.nio.file.Files.writeString(f, "x")
      assert(java.nio.file.Files.size(f) == 1)
    } finally Scratch.deleteRecursively(p)
  }

  test("pathBytes walks nested directories to leaf files") {
    val root = java.nio.file.Files.createTempDirectory("graft_spec_pb")
    try {
      val sub = root.resolve("a/b")
      java.nio.file.Files.createDirectories(sub)
      java.nio.file.Files.writeString(root.resolve("f1"), "12345")
      java.nio.file.Files.writeString(sub.resolve("f2"), "1234567")
      assert(Scratch.pathBytes(root.toString) == 12L)
    } finally Scratch.deleteRecursively(root)
  }
}
