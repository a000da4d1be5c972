package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE upsert (K4) as a pure DataFrame rewrite.
  *
  * The reference gets MERGE from Postgres (`utils.py:339-451`): stage rows
  * matched on the key update every data column plus UPDATE_TIMESTAMP but
  * keep the target's original LOAD_TIMESTAMP (:374-390); unmatched stage
  * rows insert everything (:392-411); target-only rows are untouched.
  *
  * On plain files there is no MERGE primitive, so the engine rewrites it
  * as a full-outer join + per-column conditional projection — no Catalyst
  * extension needed (SURVEY §7.3). Atomicity comes from the writer
  * (write-temp-then-swap), not from this operator.
  *
  * Scale: one shuffle on the key (or zero if both sides are bucketed on
  * it); the projection is codegen'd. This is exactly how Delta/Iceberg
  * implement copy-on-write MERGE internally.
  */
object MergeUpsert {

  /** @param preserved columns that keep the TARGET value for matched rows
    *                  (the reference's LOAD_TIMESTAMP semantics).
    */
  def merge(target: DataFrame, stage: DataFrame, keys: Seq[String],
            preserved: Seq[String] = Seq.empty): DataFrame = {
    require(target.columns.sameElements(stage.columns),
      "target and stage must share a schema")
    // presence markers (a key column itself may legally be NULL under
    // the <=> join, so key-null probes can't detect row presence)
    val t = target.withColumn("__t_present", lit(1)).alias("t")
    val s = stage.withColumn("__s_present", lit(1)).alias("s")
    val joinCond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val stageMatched = col("s.__s_present").isNotNull
    val targetMatched = col("t.__t_present").isNotNull
    // MERGE contract: the result carries the TARGET's schema. Without the
    // cast, when()/coalesce() type-widen across branches (a stage expression
    // like `bal + 10` is DECIMAL(19,2) vs the target's DECIMAL(18,2)), which
    // both diverges from SQL MERGE semantics and lets repeated merge
    // rewrites silently widen the on-disk table types.
    val targetType = target.schema.map(f => f.name -> f.dataType).toMap
    val outCols = target.columns.toSeq.map { c =>
      val merged =
        if (keys.contains(c))
          coalesce(col(s"s.$c"), col(s"t.$c"))
        else if (preserved.contains(c))
          when(targetMatched, col(s"t.$c")).otherwise(col(s"s.$c"))
        else
          when(stageMatched, col(s"s.$c")).otherwise(col(s"t.$c"))
      merged.cast(targetType(c)).as(c)
    }
    t.join(s, joinCond, "full_outer").select(outCols: _*)
  }
}
