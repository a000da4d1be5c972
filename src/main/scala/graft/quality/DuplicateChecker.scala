package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raised when a primary-key uniqueness gate fails (reference:
  * `DuplicateException`, `ETL-Airflow/dags/tasks/utils.py:85-90`).
  */
final class DuplicateException(
    message: String = "Duplicates are found in Dataset.")
  extends RuntimeException(message)

/** PK-uniqueness gate run before every mart write (reference
  * `DuplicateChecker.has_duplicates`, `utils.py:88-119`).
  *
  * The reference repartitions to 4 by PK, groups, filters `cnt > 1` and
  * probes `limit(1).count() > 0`. Spark-native version: the groupBy already
  * shuffles by the grouping keys, so the manual repartition is a redundant
  * extra shuffle — dropped; the existence probe is `isEmpty`, which pushes
  * a LocalLimit through the aggregate.
  */
object DuplicateChecker {

  /** Returns the duplicated key groups (empty when clean). */
  def duplicates(df: DataFrame, primaryKey: Seq[String]): DataFrame =
    df.groupBy(primaryKey.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Throws [[DuplicateException]] if `df` has duplicate PKs. */
  def assertNoDuplicates(df: DataFrame, primaryKey: Seq[String]): Unit =
    if (!duplicates(df, primaryKey).isEmpty)
      throw new DuplicateException(
        s"Duplicates are found in Dataset on key (${primaryKey.mkString(", ")}).")

  def hasDuplicates(df: DataFrame, primaryKey: Seq[String]): Boolean =
    !duplicates(df, primaryKey).isEmpty
}
