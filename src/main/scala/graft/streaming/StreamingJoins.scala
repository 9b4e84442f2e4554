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

  /** Left-outer interval join — the "no match" rows matter: purchases
    * with NO preceding click are exactly the organic-conversion signal
    * an attribution pipeline reports on. The semantics are the subtle
    * part: an unmatched left row cannot be emitted when it ARRIVES
    * (its match may still be in flight); it is emitted null-padded only
    * once the watermark passes the end of its interval and Spark can
    * PROVE no match will come. Downstream consumers therefore see
    * matches promptly but no-match rows one watermark horizon late —
    * that is the price of exactly-once no-match semantics on unbounded
    * input, not a bug (StreamingSpec pins the emission timing). */
  def intervalJoinLeftOuter(left: DataFrame, leftTs: String,
                            right: DataFrame, rightTs: String,
                            keyEq: Column, maxDelay: String,
                            watermark: String = "1 hour"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        keyEq
          && col(rightTs) >= col(leftTs) - expr(s"INTERVAL $maxDelay")
          && col(rightTs) <= col(leftTs),
        "leftOuter")
}
