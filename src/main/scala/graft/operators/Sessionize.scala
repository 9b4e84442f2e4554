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

  /** Peak CONCURRENCY per calendar hour — the occupancy/utilization
    * analytic (how many sessions were open at once?): a sweep line over
    * session endpoints. Each interval explodes to (+1 at start, −1 at
    * end), a running sum over the (time, delta) order is the live count,
    * and per-hour max is the answer. Ends sort before starts on
    * timestamp ties, so touching sessions never count as overlapping;
    * equal-delta ties produce the same running multiset in any order, so
    * the per-hour max is total-order deterministic. Hours appear iff
    * they contain an endpoint (a transition).
    *
    * Scale posture: the sweep's global window runs over session
    * ENDPOINTS — 2 rows per session, orders of magnitude fewer than
    * events, but still growing with the data: at extreme scale,
    * range-partition the sweep by time and carry partition prefix sums
    * in a second bounded pass (the standard distributed scan shape).
    * For hourly dashboards over bounded session counts the single sort
    * is the right call — don't pre-shard what fits one reducer. */
  def hourlyConcurrency(sessions: DataFrame, startCol: String,
                        endCol: String): DataFrame = {
    val deltas = sessions.select(explode(array(
        struct(col(startCol).as("t"), lit(1).as("d")),
        struct(col(endCol).as("t"), lit(-1).as("d")))).as("e"))
      .select(col("e.t"), col("e.d"))
    val sweep = Window.orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("__live", sum(col("d")).over(sweep))
      .groupBy(date_trunc("hour", col("t")).as("hour_start"))
      .agg(max(col("__live")).as("max_concurrent"))
      .orderBy(col("hour_start"))
  }
}
