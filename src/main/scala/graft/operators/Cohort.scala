package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — users grouped by their first-activity week, counted
  * in each later week they return: the (cohort_week, weeks_since) matrix
  * behind every retention curve. The reference's hourly/genre KPIs
  * (reference: dags/etl/kpi_processor.py:76-92) have no user-lifetime
  * dimension at all.
  *
  * Scale shape: two hash aggregates and one equi-join, all keyed on the
  * user — the cohort assignment (min ts per user) and the distinct
  * (user, week) activity set shuffle once each on the same key, and the
  * join co-locates on it (AQE broadcasts the cohort side when small).
  * Output cardinality is cohorts × weeks — tiny at any input scale. No
  * windows over the whole event table, no collect.
  */
object Cohort {

  /** Retention matrix: (cohort_week, weeks_since, n_users) where
    * `cohort_week` is the Monday-truncated week of the user's first
    * event and `n_users` counts cohort members active (>= 1 event) in
    * `cohort_week + weeks_since`. Week 0 is the cohort size itself. */
  def weeklyRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    // week starts stay TimestampType: engine-portable in the differential
    // check (date columns round-trip with engine-specific pandas dtypes)
    val cohorts = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val activity = events
      .select(col(userCol),
        date_trunc("week", col(tsCol)).as("active_week"))
      .distinct()
    activity.join(cohorts, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / 7)
          .cast("long").as("weeks_since"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("weeks_since"))
  }
}
