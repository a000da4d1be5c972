package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `mode` aggregator (SURVEY §7.3's optional custom aggregate):
  * most frequent value, ties broken by the smaller value — the same
  * contract as the reference's count + `row_number` window
  * (`m_customer_metrics_task.py:176-195`), but as a single partial-
  * aggregable pass: one shuffle of (group → value counts) instead of a
  * full count aggregation followed by a window sort.
  *
  * At 100 TB the win is that the merge state is bounded by the value
  * cardinality (payment modes: 4), not the row count.
  */
object ModeAgg extends Aggregator[String, Map[String, Long], String] {
  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    y.foldLeft(x) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }

  override def finish(b: Map[String, Long]): String =
    if (b.isEmpty) null
    else b.minBy { case (k, v) => (-v, k) }._1

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
