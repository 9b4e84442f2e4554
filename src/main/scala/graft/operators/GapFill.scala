package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Calendar-spine gap fill: periodic aggregates where EMPTY periods appear
  * explicitly with zero counts instead of being silently absent.
  *
  * The reference's hourly KPIs (dags/etl/kpi_processor.py) only emit hours
  * that have data — a dashboard or downstream window function over them
  * silently skips dead hours (an alerting bug: "no events" IS the signal).
  * The fix is the standard calendar-spine join.
  *
  * Scale shape: the spine is generated from the data's own [min, max]
  * bounds — a single-row aggregate exploded through sequence(), i.e. a
  * handful of rows per year regardless of input volume — and LEFT-joined
  * to the hourly aggregate; AQE broadcasts whichever side is smaller. No
  * driver-side date math, no collect; empty input yields an empty result
  * (not a null spine row).
  */
object GapFill {

  /** Hourly event counts over the dense hour spine spanning the data's own
    * range; hours with no rows appear with `n_events = 0`. */
  def hourlyCounts(df: DataFrame, tsCol: String): DataFrame = {
    val counts = df.select(date_trunc("hour", col(tsCol)).as("hour_start"))
      .groupBy(col("hour_start"))
      .agg(count(lit(1)).as("n_events"))
    // one-row bounds -> exploded sequence; when() guards the empty-input
    // case (sequence(null, null) would throw, an empty array explodes to
    // nothing). explode_outer: see Dedup.shingleRows. Bounds come from the
    // RAW input, not from `counts` — referencing the uncached aggregate
    // twice (spine + join) would run the truncate+groupBy subtree twice
    // per action; min/max commute with date_trunc so the results agree.
    val spine = df
      .agg(date_trunc("hour", min(col(tsCol))).as("mn"),
        date_trunc("hour", max(col(tsCol))).as("mx"))
      .select(explode_outer(
          when(col("mn").isNotNull,
            sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR")))
            .otherwise(array().cast("array<timestamp>")))
        .as("hour_start"))
      .where(col("hour_start").isNotNull)
    spine.join(counts, Seq("hour_start"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .orderBy(col("hour_start"))
  }
}
