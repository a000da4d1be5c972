package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering — the multi-dimensional
  * data-layout primitive behind Delta's `OPTIMIZE ZORDER BY` and
  * Iceberg's sort-order z-curves. Sorting a 100 TB table by the
  * interleaved bits of several filter columns makes every written file
  * tight in EVERY one of those dimensions at once, so the parquet
  * min/max footer statistics prune scans for predicates on ANY of them —
  * a single-column sort only prunes its leading column.
  *
  * The engine piece is [[zvalue]]: a pure bitwise Catalyst expression
  * (codegen'd end-to-end, no UDF) mapping n already-bucketed integer
  * columns to their Morton code. Writing is then just
  * `df.repartitionByRange(col("z")).sortWithinPartitions("z")` into any
  * sink — layout is an ordering concern, not a new writer.
  *
  * [[fileStats]] is the verification half: group rows by their target
  * file (a z-value prefix) and report each file's per-dimension min/max
  * envelope — exactly the footer stats a scan would prune on. The
  * `q_zorder` oracle pins the full layout cross-engine, and the spec
  * asserts the quantitative point: z-ordered files have strictly
  * tighter average envelopes than a linear sort on the same data.
  */
object ZOrder {

  /** Morton code of `cols`: bit i of column c lands at output bit
    * `i * cols.length + c` (column 0 owns the least-significant lane).
    * Callers bucket each dimension into `[0, 2^bits)` first — rank,
    * quantile, or modulo, whatever the column's distribution needs;
    * inputs are range-checked so an out-of-range bucket fails loudly
    * instead of silently aliasing into a far z-cell.
    */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.length <= 63,
      s"need 1..63 total bits, got ${cols.length} cols x $bits")
    val n = cols.length
    val checked = cols.map { c =>
      val lc = c.cast("long")
      when(lc >= 0 && lc < (1L << bits), lc)
        .otherwise(raise_error(concat(
          lit(s"zvalue: bucket out of [0, ${1L << bits}): "), lc.cast("string"))))
    }
    val terms = for {
      i <- 0 until bits
      c <- 0 until n
    } yield shiftleft(shiftright(checked(c), i).bitwiseAND(1), i * n + c)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The DuckDB-dialect twin of [[zvalue]] over pre-bucketed integer
    * SQL expressions — generated from the same (i, c) lattice so the
    * two engines can never drift. (No range guard: the oracle runs on
    * the same bucketed inputs the Spark side already checked.)
    */
  def zvalueSql(cols: Seq[String], bits: Int): String = {
    val n = cols.length
    val terms = for {
      i <- 0 until bits
      c <- 0 until n
    } yield s"((((${cols(c)}) >> $i) & 1) << ${i * n + c})"
    terms.mkString("(", " | ", ")")
  }

  /** Per-target-file min/max envelopes under a z-value layout: rows are
    * assigned to `n_files = 2^fileBits` files by their z-value prefix
    * (the leading bits — exactly what a range-partitioned sort on z
    * produces), and each file reports its envelope in every dimension.
    * One aggregation at file grain; dims are (name, bucketExpr) pairs.
    */
  def fileStats(df: org.apache.spark.sql.DataFrame,
                dims: Seq[(String, Column)], bits: Int,
                fileBits: Int): org.apache.spark.sql.DataFrame = {
    val bucketed = df.select(dims.map { case (nm, c) => c.as(nm) }: _*)
    val z = zvalue(dims.map(d => col(d._1)), bits)
    val totalBits = bits * dims.length
    // fileBits > totalBits would make shiftright's amount negative,
    // which Java masks mod 64 into a garbage large shift — silent wrong
    // file groupings (zvalue's own range checks don't cover this)
    require(fileBits >= 1 && fileBits <= totalBits,
      s"fileStats: fileBits $fileBits outside [1, $totalBits]")
    bucketed
      .withColumn("file_id", shiftright(z, totalBits - fileBits))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        dims.flatMap(d => Seq(min(col(d._1)).as(s"min_${d._1}"),
          max(col(d._1)).as(s"max_${d._1}"))): _*)
  }
}
