package graft

import graft.core.{GraftSession, RunClock}
import graft.pipeline.{LayerCatalog, MetaMorphPipeline}

/** CLI entry: run the daily pipeline (or an N-day backfill) end-to-end.
  *
  *   runMain graft.RunPipeline <sfDir> <catalogRoot> [days] [--idempotent]
  *
  * `--conform-per-day` replays the legacy backfill shape (each day
  * re-derives + re-gates the source entities) instead of the
  * conform-once default — kept for A/B read-amplification measurement.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    if (positional.length < 2) {
      System.err.println(
        "usage: graft.RunPipeline <sfDir> <catalogRoot> [backfillDays] [--idempotent] [--conform-per-day]")
      sys.exit(2)
    }
    val Array(sfDir, root) = positional.take(2)
    val days = if (positional.length > 2) positional(2).toInt else 1
    val idempotent = args.contains("--idempotent")
    val perDay = args.contains("--conform-per-day")
    val spark = GraftSession.local()
    val catalog = LayerCatalog(root)
    val t0 = System.nanoTime()
    val runs =
      if (days <= 1)
        Seq(MetaMorphPipeline.runDaily(spark, sfDir, catalog, RunClock.fixed,
          idempotent))
      else if (perDay)
        (days - 1 to 0 by -1).map { offset =>
          val d = java.sql.Date.valueOf(
            RunClock.fixed.runDate.toLocalDate.minusDays(offset))
          MetaMorphPipeline.runDaily(spark, sfDir, catalog,
            RunClock(d, java.sql.Timestamp.valueOf(d.toLocalDate.atStartOfDay)),
            idempotent)
        }
      else MetaMorphPipeline.backfill(spark, sfDir, catalog, RunClock.fixed,
        days, idempotent)
    val secs = (System.nanoTime() - t0) / 1e9
    runs.zipWithIndex.foreach { case (order, i) =>
      println(s"[pipeline] run ${i + 1}/${runs.size}: ${order.mkString(" -> ")}")
    }
    Seq("supplier_performance", "product_performance", "customer_sales_report",
      "CUSTOMER_METRICS").foreach { t =>
      val n = spark.read.parquet(catalog.legacy(t)).count()
      println(s"[pipeline] legacy/$t rows=$n")
    }
    println(f"[pipeline] completed ${runs.size} run(s) in $secs%.1f s")
    spark.stop()
  }
}
