package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD Type 2 merge — dimension history tracking, the companion to the
  * reference's Type-1 MERGE (`utils.py:339-451`, [[MergeUpsert]]): where
  * Type 1 overwrites a matched row in place, Type 2 CLOSES the old
  * version and appends the new one, so the dimension carries its full
  * change history under `(valid_from, valid_to, is_current)` validity
  * metadata. Every warehouse on the reference's model grows this the
  * moment an analyst asks "what segment was this customer in LAST
  * quarter" — the same staged-batch inputs, one more output shape.
  *
  * Semantics per business key in the stage batch, against the CURRENT
  * slice of the dimension:
  *   - matched and any tracked attribute changed (null-safely): the
  *     current row is closed (`valid_to = loadTs`, `is_current = false`)
  *     and a new open version of the stage row is appended
  *     (`valid_from = loadTs`);
  *   - matched and unchanged: the current row passes through untouched
  *     (no spurious versions from replayed batches — re-merging the same
  *     batch is a no-op, which makes the operator idempotent);
  *   - stage-only: inserted as a brand-new open version;
  *   - dimension-only: passes through untouched.
  * Historical (already-closed) rows always pass through. `loadTs` is a
  * caller-supplied literal — batch time is pipeline metadata, never
  * wall-clock read inside the operator (same rule as the backfill
  * pipeline's day parameter).
  *
  * Shape: ONE key-grain shuffle (the full-outer join of current slice vs
  * stage), then each joined row expands to 0/1/2 output rows through a
  * single conditionally-built `inline(array(struct(..)))` projection —
  * the matched-and-changed case emits its closed and new versions from
  * one pass instead of re-joining per output branch. History rows union
  * in shuffle-free. All codegen'd; no UDFs, no driver collection.
  *
  * The stage must carry exactly the dimension's business columns (keys +
  * tracked attributes); validity metadata is owned by this operator.
  */
object ScdType2 {

  val MetaCols: Seq[String] = Seq("valid_from", "valid_to", "is_current")

  /** @param dim     dimension with business cols + `valid_from`
    *                timestamp, `valid_to` timestamp (null = open),
    *                `is_current` boolean
    * @param stage   incoming batch: the business columns only
    * @param keys    business key columns
    * @param loadTs  batch timestamp literal (closes old versions, opens
    *                new ones)
    */
  def merge(dim: DataFrame, stage: DataFrame, keys: Seq[String],
            loadTs: java.sql.Timestamp): DataFrame = {
    val bizCols = dim.columns.filterNot(MetaCols.contains).toSeq
    require(stage.columns.sorted.sameElements(bizCols.sorted),
      s"stage must carry exactly the business columns ${bizCols.mkString(",")}")
    require(MetaCols.forall(dim.columns.contains),
      s"dim must carry validity metadata ${MetaCols.mkString(",")}")
    val attrs = bizCols.filterNot(keys.contains)
    val outCols = bizCols ++ MetaCols
    val ts = lit(loadTs)

    // A business key appearing twice in the stage would full-outer-join
    // the single current row TWICE — two closed copies and two open
    // versions, silently breaking the one-current-row-per-key invariant.
    // Fully identical stage rows collapse losslessly (replayed batches
    // stay idempotent); CONFLICTING duplicates — same key, different
    // attributes — have no defensible winner without an ordering column,
    // so they fail loudly (the caller owns per-batch collapse, the way
    // streamingUpsertReplay collapses on a sequence column).
    val stageUnique = stage.dropDuplicates()
    val dupKeys = stageUnique.groupBy(keys.map(col): _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dupKeys == 0,
      s"ScdType2.merge: stage carries conflicting duplicate business keys " +
        s"(${keys.mkString(",")}) — collapse to one row per key before merging")

    val history = dim.filter(!col("is_current")).select(outCols.map(col): _*)
    val current = dim.filter(col("is_current"))
      .withColumn("__t_present", lit(1)).alias("t")
    val s = stageUnique.withColumn("__s_present", lit(1)).alias("s")
    val joinCond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val tPresent = col("t.__t_present").isNotNull
    val sPresent = col("s.__s_present").isNotNull
    // null-safe change probe over the tracked attributes
    val changed = attrs.map(a => !(col(s"t.$a") <=> col(s"s.$a")))
      .reduceOption(_ || _).getOrElse(lit(false))

    def rowOf(side: String, from: org.apache.spark.sql.Column,
              to: org.apache.spark.sql.Column,
              cur: Boolean): org.apache.spark.sql.Column =
      struct(bizCols.map(c => col(s"$side.$c").as(c)) ++
        Seq(from.as("valid_from"), to.cast("timestamp").as("valid_to"),
          lit(cur).as("is_current")): _*)

    val tKept = rowOf("t", col("t.valid_from"), col("t.valid_to"), cur = true)
    val tClosed = rowOf("t", col("t.valid_from"), ts, cur = false)
    val sOpened = rowOf("s", ts, lit(null), cur = true)

    val expanded = current.join(s, joinCond, "full_outer")
      .select(inline(
        when(tPresent && sPresent && changed, array(tClosed, sOpened))
          .when(tPresent, array(tKept))
          .otherwise(array(sOpened))))
    expanded.unionByName(history)
  }
}
