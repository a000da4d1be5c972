package graft.quality

import org.apache.spark.sql.DataFrame

/** Raptor report rendering (Q7): the reference emails an HTML report of
  * the summary + top-N mismatch samples (`Raptor.py:141-262`, samples
  * `limit(15)`/`limit(5)` at :205,663,672). SMTP is an out-of-engine
  * adapter (SURVEY §7.5); the engine-side operator is the pure
  * Result → HTML rendering, driver-side over bounded `limit` samples.
  */
object RaptorReport {

  private def table(df: DataFrame, limit: Int): String = {
    val cols = df.columns
    val rows = df.limit(limit).collect()
    val head = cols.map(c => s"<th>$c</th>").mkString
    val body = rows.map(r =>
      (0 until cols.length).map { i =>
        val v = if (r.isNullAt(i)) "" else r.get(i).toString
        s"<td>${escape(v)}</td>"
      }.mkString("<tr>", "", "</tr>")).mkString
    s"<table><thead><tr>$head</tr></thead><tbody>$body</tbody></table>"
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** The reference's email body shape: run summary, column summary,
    * 15 mismatch samples, 5 extras per side.
    */
  def render(r: Raptor.Result, title: String = "Raptor Validation"): String =
    s"""<html><body>
       |<h2>${escape(title)}</h2>
       |<h3>Run Summary</h3>${table(r.summary.select("Description", "Value"), 20)}
       |<h3>Column Mismatch Summary</h3>${table(r.columnSummary, 20)}
       |<h3>Sample Mismatches</h3>${table(r.colMismatch, 15)}
       |<h3>Extra in Source</h3>${table(r.sourceExtra, 5)}
       |<h3>Extra in Target</h3>${table(r.targetExtra, 5)}
       |</body></html>""".stripMargin
}
