package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion attribution over an event stream: credit each conversion
  * (e.g. purchase) to a touch event (view/click/…) of the same user —
  * the analytics layer the reference's KPI pipeline feeds downstream.
  *
  * Both models are one window over a single user-keyed exchange (the
  * carry-forward form of the as-of join specialised to self-attribution):
  *  - last-touch: the most recent touch STRICTLY BEFORE the conversion
  *    (`ROWS … 1 PRECEDING` — a touch sharing the conversion's timestamp
  *    counts only if it sorts earlier on the tie-break column).
  *  - first-touch: the user's earliest touch before the conversion.
  *
  * Conversions with no prior touch attribute to `organic`.
  *
  * Scale posture: no join — touches and conversions ride the same scan
  * and the same (user)-partitioned sort; state per row is one carried
  * string. Skewed users inflate a window partition, never a join side.
  */
object Attribution {

  /** Row-level attribution: conversions of `convType`, each with
    * `touch_type` (last-touch) and `first_touch_type` columns. `tieCol`
    * makes ordering total when timestamps collide. */
  def attributed(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, convType: String,
                 tieCol: String): DataFrame = {
    val isTouch = col(typeCol) =!= convType
    val touchOrNull: Column = when(isTouch, col(typeCol))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("touch_type",
        last(touchOrNull, ignoreNulls = true).over(before))
      .withColumn("first_touch_type",
        first(touchOrNull, ignoreNulls = true).over(before))
      .where(col(typeCol) === convType)
  }

  /** Per-channel rollup: conversions and converted value credited to each
    * touch type under the chosen model ("last" | "first"). */
  def report(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, convType: String, valueCol: String,
             tieCol: String, model: String = "last"): DataFrame = {
    val touch = model match {
      case "last" => col("touch_type")
      case "first" => col("first_touch_type")
      case other => throw new IllegalArgumentException(
        s"unknown attribution model: $other (want last|first)")
    }
    attributed(events, userCol, tsCol, typeCol, convType, tieCol)
      .groupBy(coalesce(touch, lit("organic")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(col(valueCol)), 2).as("attributed_value"))
      .orderBy(col("channel"))
  }
}
