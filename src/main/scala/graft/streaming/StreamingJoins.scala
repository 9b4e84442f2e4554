package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY.md §2.7 beyond-reference breadth).
  *
  * The canonical shape is the watermarked INTERVAL join: both sides declare
  * event-time watermarks and the join condition bounds the event-time
  * distance between matching rows in BOTH directions. That pair of bounds is
  * what lets Spark expire buffered rows — each side's join state is capped
  * at (watermark horizon + interval width), so the query runs forever on
  * unbounded inputs with bounded memory. An unconstrained stream-stream
  * equi-join would have to buffer both streams in full.
  */
object StreamingJoins {

  /** Interval join: each `left` row matched to `right` rows satisfying
    * `keyEq` with rightTs in [leftTs - maxDelay, leftTs]. Inner append-mode
    * join; both sides get `watermark` as their lateness horizon.
    *
    * The classic instance is attribution — purchases (left) matched to the
    * clicks (right) that preceded them within the attribution window. */
  def intervalJoin(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   keyEq: Column, maxDelay: String,
                   watermark: String = "1 hour"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        keyEq
          && col(rightTs) >= col(leftTs) - expr(s"INTERVAL $maxDelay")
          && col(rightTs) <= col(leftTs))
}
