package graft.core

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Injected clock.
  *
  * The reference hardwires wall-clock everywhere (`current_date()` stamping
  * at `ingestion_tasks.py:57`, 4-day recency window at
  * `m_customer_metrics_task.py:163-170`, `current_timestamp()` audit columns
  * at `m_customer_metrics_task.py:171-172`), which makes its outputs
  * irreproducible. Our engine takes the clock as a parameter so every
  * pipeline is a pure function of (inputs, clock) — required for the DuckDB
  * oracle comparison and for deterministic backfill
  * (`adhoc/adhoc_reload_tables_task.py:62` stamps `current_date()-offset`;
  * here a backfill is just a different `RunClock`).
  */
final case class RunClock(runDate: Date, loadTs: Timestamp) {
  def runDateCol: Column = lit(runDate)
  def loadTsCol: Column = lit(loadTs)
}

object RunClock {
  /** Pinned test clock: the day after the max `l_shipdate` in the driver
    * testdata (1995-01-02 .. 2001-11-04, identical across scale factors),
    * so "today" is one day past the freshest sale — mirroring the
    * reference's daily-cadence semantics.
    */
  val fixed: RunClock = RunClock(
    Date.valueOf("2001-11-05"),
    Timestamp.valueOf("2001-11-05 00:00:00"))

  /** SQL literals for the DuckDB oracle — must render the same values. */
  val runDateSql = "DATE '2001-11-05'"
  val loadTsSql = "TIMESTAMP '2001-11-05 00:00:00'"
}
