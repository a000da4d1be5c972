package graft

import graft.core.GraftSession

/** Plan inspection tool: print the formatted physical plan and timed
  * row count for one SparkEntry query.
  *
  *   runMain graft.Explain <queryName> [sfDir] [--plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.Explain <queryName> [sfDir] [--plan]")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = args.drop(1).find(!_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("--plan")) df.explain("formatted")
    var last = 0L
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      last = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[explain] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $last rows")
    }
    spark.stop()
  }
}
