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

  /** Declared-dtype conformance report (reference:
    * dags/etl/schema_check.py:100-107 — each declared column's actual dtype
    * checked against the expected one, mismatches reported as warnings).
    * One row per column: declared vs actual `DataType.simpleString`, a
    * conform flag, and a status in {ok, type_mismatch, missing,
    * undeclared}. Pure schema metadata — builds from `df.schema`, runs no
    * job, so it is free at any data scale. */
  def schemaReport(df: DataFrame, declared: Seq[(String, String)]): DataFrame = {
    val actual = df.schema.map(f => f.name -> f.dataType.simpleString)
    val actualMap = actual.toMap
    val declNames = declared.map(_._1).toSet
    val rows: Seq[(String, String, String, Boolean, String)] =
      declared.map { case (n, dt) =>
        actualMap.get(n) match {
          case Some(a) if a == dt => (n, dt, a, true, "ok")
          case Some(a)            => (n, dt, a, false, "type_mismatch")
          case None               => (n, dt, null, false, "missing")
        }
      } ++ actual.collect { case (n, a) if !declNames(n) =>
        (n, null, a, true, "undeclared")
      }
    import df.sparkSession.implicits._
    rows.toDF("col_name", "declared_type", "actual_type", "conforms", "status")
      .orderBy(col("col_name"))
  }

  /** The DISTINCT offending values for a whitelist rule, with counts — the
    * reference reports the invalid values themselves, not only a count
    * (dags/etl/schema_check.py:176-181, lowercased like the reference's
    * genre check). One hash aggregate over the filtered scan; the result is
    * bounded by value cardinality, not row count. */
  def invalidValues(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    df.where(col(c).isNotNull &&
        !lower(col(c)).isin(allowed.map(_.toLowerCase): _*))
      .groupBy(lower(col(c)).as("invalid_value"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("invalid_value"))
}
