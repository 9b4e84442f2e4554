package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** One-pass column profiler — the table-health primitive behind the
  * reference's ad-hoc `df.describe()`-style checks
  * (dags/etl/validate_data.py computes per-column null counts rule by
  * rule): every numeric column's min / max / null count / mean, computed
  * in ONE aggregation pass and unpivoted to long form (column, metric,
  * value).
  *
  * Scale posture: a single partial-aggregated scan — 4×C scalar
  * aggregates ride one reduce to a single row, then the unpivot explodes
  * that row driver-free. Never one job per column (the naive profiling
  * loop is C scans); never a shuffle of the data.
  *
  * Exact statistics only (min/max/null/mean are single-pass exact) — the
  * approximate family (distinct sketches, percentile digests) lives with
  * the other sketches, where spec-side error bounds do the verifying.
  */
object Profile {

  /** Long-form profile of `df`'s numeric columns (all of them by
    * default). Values are rounded to 4 dp so the mean is oracle-stable;
    * min/max/null_count are exact by nature. */
  def numericProfile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val numeric =
      if (cols.nonEmpty) cols
      else df.schema.fields
        .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
    require(numeric.nonEmpty, "numericProfile needs at least one numeric column")
    val aggs = numeric.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        avg(col(c)).as(s"__mean_$c"))
    }
    val oneRow = df.agg(aggs.head, aggs.tail: _*)
    val entries = numeric.flatMap { c =>
      Seq(
        struct(lit(c).as("column"), lit("min").as("metric"),
          round(col(s"__min_$c"), 4).as("value")),
        struct(lit(c).as("column"), lit("max").as("metric"),
          round(col(s"__max_$c"), 4).as("value")),
        struct(lit(c).as("column"), lit("null_count").as("metric"),
          col(s"__nulls_$c").cast("double").as("value")),
        struct(lit(c).as("column"), lit("mean").as("metric"),
          round(col(s"__mean_$c"), 4).as("value")))
    }
    oneRow.select(explode(array(entries: _*)).as("p"))
      .select(col("p.column"), col("p.metric"), col("p.value"))
      .orderBy(col("column"), col("metric"))
  }
}
