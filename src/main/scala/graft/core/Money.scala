package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Money arithmetic helpers shared by every mart.
  *
  * The reference keeps money in DOUBLE and applies `round(x, 2)` at
  * aggregation time (e.g. `m_supplier_performance_task.py:113-119`). A
  * plain double `sum` is order-dependent (non-associative fp addition), so
  * the rounded cent can differ between Spark partial/final aggregation and
  * the DuckDB oracle — and between two Spark runs at different
  * parallelism. We therefore sum through an exact DECIMAL surrogate:
  * per-row expressions stay double (bit-identical across engines reading
  * the same parquet), the cast to DECIMAL(38,6) is exact for the ≤4-dp
  * money values involved, decimal addition is associative, and the final
  * round-to-2dp happens in decimal in both engines. Output type stays
  * DOUBLE to preserve the reference's schema.
  *
  * At 100 TB this also removes a correctness cliff: deterministic totals
  * regardless of partitioning, AQE coalescing, or speculative retries.
  */
object Money {
  val SumDec: DecimalType = DecimalType(38, 6)
  val RatioDec: DecimalType = DecimalType(38, 10)

  /** Exact, order-independent sum of a money expression. */
  def moneySum(e: Column): Column = sum(e.cast(SumDec))

  /** Decimal → 2-dp double (safe: round happens in decimal space). */
  def round2(c: Column): Column = round(c, 2).cast("double")

  /** Ratio rounded to 2dp. Double division (bit-identical both engines),
    * then decimal-space rounding to dodge the `round(double, 2)`
    * cross-engine half-case divergence.
    */
  def ratio2(num: Column, den: Column): Column =
    round((num.cast("double") / den.cast("double")).cast(RatioDec), 2)
      .cast("double")

  /** SQL (DuckDB) renderings of the same patterns — oracle side. */
  object Sql {
    def moneySum(e: String): String = s"SUM(CAST(($e) AS DECIMAL(38,6)))"
    def round2(e: String): String = s"CAST(ROUND($e, 2) AS DOUBLE)"
    def ratio2(num: String, den: String): String =
      s"CAST(ROUND(CAST(CAST($num AS DOUBLE) / CAST($den AS DOUBLE) AS DECIMAL(38,10)), 2) AS DOUBLE)"
  }
}
