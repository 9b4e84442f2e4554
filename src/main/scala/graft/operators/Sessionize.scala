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

  // unix_micros takes TIMESTAMP only; the cast makes the operators safe on
  // TIMESTAMP_NTZ inputs too (value-preserving under the engine's forced
  // UTC session timezone; no-op on TimestampType). Same pattern as
  // RangeJoin.pointInTimeWindow / AsOf's type dispatch.
  private def micros(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

  /** Tag each event with its session ordinal per user (1-based). */
  def withSessionId(events: DataFrame, userCol: String, tsCol: String,
                    gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val isNew = when(
      micros(col(tsCol)) - lag(micros(col(tsCol)), 1).over(byUser)
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
    * Scale posture — distributed two-pass scan, no global sort: endpoints
    * are bucketed by an equi-width slice of the observed time range (the
    * bucket function is a deterministic expression, so both passes agree
    * without caching). Pass 1 aggregates per-bucket delta TOTALS — at most
    * `buckets` rows — and turns them into exclusive prefix offsets with a
    * window over that bounded set. Pass 2 computes the running sum WITHIN
    * each bucket (partitioned window, parallel across buckets), broadcast-
    * joins the carried offset back, and takes the per-hour max. The only
    * unpartitioned window in the plan runs over the bucket totals, whose
    * row count is capped by cluster config, never by data volume. */
  def hourlyConcurrency(sessions: DataFrame, startCol: String,
                        endCol: String, buckets: Int = 0): DataFrame = {
    val nBuckets = if (buckets > 0) buckets
      else sessions.sparkSession.sessionState.conf.numShufflePartitions
    // The delta stream feeds THREE consumers (range bounds, bucket
    // offsets, the bucketed sweep itself), and `sessions` is typically
    // an expensive upstream window pipeline — materialize the
    // 2-rows-per-session scalar deltas once instead of replaying that
    // pipeline per consumer.
    val deltas = sessions.select(explode(array(
        struct(col(startCol).as("t"), lit(1).as("d")),
        struct(col(endCol).as("t"), lit(-1).as("d")))).as("e"))
      .select(col("e.t"), col("e.d"))
      .localCheckpoint(true)
    // Observed time range: one broadcast row; equi-width bucket of t.
    // Monotone in t and ties on t share a bucket, so per-bucket (t, d)
    // order concatenated in bucket order IS the global sweep order.
    val bounds = deltas.agg(
      min(micros(col("t"))).as("__lo"),
      max(micros(col("t"))).as("__hi"))
    val bucketed = deltas.crossJoin(broadcast(bounds))
      .withColumn("__bucket", least(lit(nBuckets - 1),
        floor((micros(col("t")) - col("__lo")) * nBuckets /
          greatest(col("__hi") - col("__lo") + 1L, lit(1L)))).cast("int"))
      .drop("__lo", "__hi")
    // Pass 1: bucket totals -> exclusive prefix offsets (<= nBuckets rows;
    // the unpartitioned window is bounded by construction).
    val offsets = bucketed.groupBy(col("__bucket"))
      .agg(sum(col("d")).as("__bsum"))
      .withColumn("__offset", coalesce(
        sum(col("__bsum")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    // Pass 2: per-bucket running sum + carried offset = global live count.
    val local = Window.partitionBy(col("__bucket"))
      .orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("__local", sum(col("d")).over(local))
      .join(broadcast(offsets), Seq("__bucket"))
      .groupBy(date_trunc("hour", col("t")).as("hour_start"))
      .agg(max(col("__local") + col("__offset")).as("max_concurrent"))
      .orderBy(col("hour_start"))
  }
}
