package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same user belong to
  * one session while the gap between neighbors stays within `gapSeconds`.
  *
  * Batch formulation (this file): the classic two-window pass —
  * lag() marks session starts, a running sum turns marks into session ids,
  * one groupBy aggregates per session. Two window passes + one aggregate
  * over the SAME (user, ts-sorted) partitioning: Spark plans a single
  * shuffle and reuses the sort. The streaming twin with explicit state
  * lives in [[graft.streaming.StreamingSessions]].
  */
object Sessionize {

  /** Tag each event with its session ordinal per user (1-based). */
  def withSessionId(events: DataFrame, userCol: String, tsCol: String,
                    gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val isNew = when(
      unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(byUser)
        <= gapSeconds * 1000000L, 0L).otherwise(1L)
    events.withColumn("__new", isNew)
      .withColumn("session_id",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__new")
  }

  /** One row per session: bounds, event count, value sum. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   valueCol: String, gapSeconds: Long): DataFrame =
    withSessionId(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 6).as("sum_value"))
      .drop("session_id")
      .orderBy(col(userCol), col("session_start"))
}
