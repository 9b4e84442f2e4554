package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-driven data-quality validation (SURVEY.md §2.8).
  *
  * The reference validates each staged dataset with a dict of required
  * columns, dtype checks, null counts, duplicate counts, value whitelists and
  * range predicates, producing a pass/fail report
  * (reference: dags/etl/schema_check.py:27-52 declared schemas, :75-127 core
  * checks, :129-226 per-dataset rules, :229-256 report).
  *
  * Here every rule compiles to one aggregate `Column`, and a whole rule-set is
  * a SINGLE aggregation pass over the data — one scan, one (tiny) reduction,
  * no per-rule re-reads. At 100 TB this is the difference between one pass and
  * N passes.
  */
object Validation {

  /** A named metric: evaluates to one value over the whole dataset. */
  final case class Metric(name: String, agg: Column)

  def nullCount(c: String): Metric =
    Metric(s"null_$c", count(when(col(c).isNull, 1)).as(s"null_$c"))

  def rowCount: Metric = Metric("n_rows", count(lit(1)).as("n_rows"))

  /** Duplicate rows beyond the first per key — pandas `duplicated().sum()`
    * semantics (reference: dags/etl/schema_check.py:114-117,196-200). */
  def dupCount(keys: Seq[String]): Metric = {
    val name = s"dup_${keys.mkString("_")}"
    Metric(name,
      (count(lit(1)) - count_distinct(struct(keys.map(col): _*))).as(name))
  }

  /** Rows where `pred` holds (negative values, out-of-range durations, values
    * outside a whitelist, ... — reference: dags/etl/schema_check.py:176-181,
    * :213-224). */
  def violations(name: String, pred: Column): Metric =
    Metric(name, count(when(pred, 1)).as(name))

  /** Run all metrics in one aggregation pass → single-row report DataFrame. */
  def report(df: DataFrame, metrics: Seq[Metric]): DataFrame =
    df.agg(metrics.head.agg, metrics.tail.map(_.agg): _*)

  /** Hard gate: required columns must exist (the reference raises —
    * dags/etl/schema_check.py:94-98). Schema-level, so it is free (no job). */
  def requireColumns(df: DataFrame, required: Seq[String]): Either[Seq[String], DataFrame] = {
    val missing = required.filterNot(df.columns.contains)
    if (missing.nonEmpty) Left(missing) else Right(df)
  }
}
