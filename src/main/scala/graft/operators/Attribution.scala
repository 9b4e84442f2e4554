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
    * touch type under the chosen model ("last" | "first").
    *
    * `attributed_value` accumulates in integer CENTS (each value rounded
    * to cents per row, summed exactly, divided by 100 at the end) — the
    * same recipe as the micros/cents sums below and the registry's
    * money rollups: order-independent, so hash-identical across any
    * partitioning or replication. For cents-exact inputs (money columns
    * are) this equals the float `round(sum(v), 2)` everywhere that form
    * is well-defined; sub-cent input precision is quantized per row. */
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
        (sum(round(col(valueCol) * 100).cast("long")).cast("double") / 100.0)
          .as("attributed_value"))
      .orderBy(col("channel"))
  }

  /** Row-level MULTI-touch credit: one row per (conversion, touch) with
    * the touch's credit fraction under the linear and position-based
    * (U-shaped) models, plus one `organic` row per conversion that had no
    * prior touch in its journey.
    *
    * Journey scoping: a conversion's journey is the run of touches since
    * the user's PREVIOUS conversion (strictly before it in (ts, tie)
    * order) — the standard multi-touch window, so a touch credits exactly
    * one conversion. Touches after the user's last conversion credit
    * nothing and are dropped.
    *
    * Models (fractions sum to exactly 1 per conversion):
    *  - linear: 1/n to each of the journey's n touches.
    *  - position (U-shaped): 40% first touch, 40% last touch, 20% split
    *    evenly over the middles; degenerate journeys get 100% (n=1) or
    *    50/50 (n=2).
    *
    * Scale posture: ONE user-keyed exchange. Journey numbering is an
    * inclusive running count of conversions over the (user)-partitioned
    * sort; the per-journey window keys on (user, journey) — a SUPERSET of
    * the partitioning keys, so Catalyst satisfies it with the existing
    * hash partitioning and only a local re-sort (no second shuffle; the
    * AttributionSpec plan assertion pins this).
    *
    * Fraction arithmetic is emitted in integer micros (`frac_micros`) and
    * the credited value in integer cents (`value_cents`) — per-row
    * rounding is engine-deterministic, and integer sums are exact in any
    * aggregation order (same trick as rolling_7d_revenue). */
  /** Shared journey machinery for the multi-touch models: journey
    * numbering (inclusive conversion count over the user-keyed sort),
    * then per-journey stats over (user, journey) — a SUPERSET of the
    * partitioning keys, so both window passes ride ONE exchange. Output
    * adds __journey, __conv_value, __conv_ts, __has_conv, __n (touches
    * in journey), __pos (1..n for touches; the conversion sorts last). */
  private def journeyFrame(events: DataFrame, userCol: String,
                           tsCol: String, typeCol: String, convType: String,
                           valueCol: String, tieCol: String): DataFrame = {
    val isConv = col(typeCol) === convType
    val wUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    // Inclusive conversion count g: the j-th conversion sees g = j; a
    // touch between conversions j and j+1 sees g = j, so journey = g for
    // conversions, g+1 for touches — touches attach to the NEXT conversion.
    val g = sum(when(isConv, 1L).otherwise(0L)).over(wUser)
    val seqd = events.withColumn("__journey",
      when(isConv, g).otherwise(g + 1L))
    val wJ = Window.partitionBy(col(userCol), col("__journey"))
      .orderBy(col(tsCol), col(tieCol))
    val wJAll = wJ.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    seqd
      .withColumn("__conv_value", max(when(isConv, col(valueCol))).over(wJAll))
      .withColumn("__conv_ts", max(when(isConv, col(tsCol))).over(wJAll))
      .withColumn("__has_conv",
        max(when(isConv, 1).otherwise(0)).over(wJAll) === 1)
      .withColumn("__n",
        sum(when(isConv, 0L).otherwise(1L)).over(wJAll))
      // within a journey the conversion sorts last, so touch pos ∈ 1..n
      .withColumn("__pos", row_number().over(wJ).cast("long"))
  }

  /** channel column shared by the models: the touch's type for credited
    * touches, `organic` for zero-touch conversions, null (→ drop) for
    * everything else. */
  private def channelCol(typeCol: String, convType: String): Column = {
    val isConv = col(typeCol) === convType
    when(!isConv && col("__has_conv"), col(typeCol))
      .when(isConv && col("__n") === 0L, lit("organic"))
  }

  def multiTouchCredits(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, convType: String, valueCol: String,
                        tieCol: String): DataFrame = {
    val enriched = journeyFrame(events, userCol, tsCol, typeCol, convType,
      valueCol, tieCol)
    val n = col("__n")
    val organic = col("channel") === "organic"
    val linFrac = when(organic, lit(1.0)).otherwise(lit(1.0) / n)
    val posFrac = when(organic || n === 1L, lit(1.0))
      .when(n === 2L, lit(0.5))
      .when(col("__pos") === 1L || col("__pos") === n, lit(0.4))
      .otherwise(lit(0.2) / (n - 2L))
    enriched
      .withColumn("channel", channelCol(typeCol, convType))
      .where(col("channel").isNotNull)
      .select(col(userCol), col("__journey").as("journey"), col("channel"),
        col("__pos").as("touch_pos"), n.as("n_touches"),
        round(linFrac * 1000000.0).cast("long").as("linear_frac_micros"),
        round(posFrac * 1000000.0).cast("long").as("position_frac_micros"),
        round(col("__conv_value") * linFrac * 100.0).cast("long")
          .as("linear_value_cents"),
        round(col("__conv_value") * posFrac * 100.0).cast("long")
          .as("position_value_cents"))
  }

  /** Time-decay multi-touch credit: each touch in a journey weighs
    * `2^-floor(Δt / halfLife)` relative to the others — recent touches
    * dominate, with a STEPPED half-life (whole half-lives elapsed), not a
    * smooth exponential. The step is deliberate: weights become exact
    * integers (`1000000 >> k`), so credit arithmetic is bit-identical on
    * any engine — a smooth `pow(0.5, Δt/h)` differs in final ulps across
    * libm implementations and would poison a hash-level differential
    * check. Fractions are each touch's weight over the journey's weight
    * sum (sum to 1 per conversion); zero-touch conversions are `organic`
    * with full credit.
    *
    * Same ONE-user-keyed-exchange plan as [[multiTouchCredits]]: the
    * weight and its journey sum are two more expressions over the same
    * (user, journey) window. */
  def timeDecayCredits(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, convType: String, valueCol: String,
                       tieCol: String, halfLifeSec: Long): DataFrame = {
    require(halfLifeSec > 0, s"need positive half-life: $halfLifeSec")
    val isConv = col(typeCol) === convType
    val enriched = journeyFrame(events, userCol, tsCol, typeCol, convType,
      valueCol, tieCol)
    // Δt in exact integer microseconds (unix_micros ↔ DuckDB epoch_us);
    // k = whole half-lives elapsed, capped at 30 to bound the shift
    // argument (the weight itself floors at 1 µ-credit — see below).
    // Δt < 2^53 µs (≈285 years), so the double floor-division is exact.
    val stepUs = halfLifeSec * 1000000L
    val k = least(
      // cast: unix_micros takes TIMESTAMP only; NTZ inputs convert
      // value-preserving under the forced UTC session timezone.
      floor((unix_micros(col("__conv_ts").cast("timestamp"))
          - unix_micros(col(tsCol).cast("timestamp")))
        / lit(stepUs.toDouble)),
      lit(30L)).cast("int")
    val wJAll = Window.partitionBy(col(userCol), col("__journey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val weighted = enriched
      .withColumn("__k", k)
      // functions.shiftright only takes a literal shift; the SQL form
      // accepts a per-row column. Weight floors at 1 µ-credit: past 20
      // half-lives the shift underflows to 0, and an all-stale journey
      // would otherwise sum to 0 weight → 0/0 under ANSI mode.
      .withColumn("__w",
        when(!isConv,
          greatest(expr("shiftright(CAST(1000000 AS BIGINT), __k)"), lit(1L))))
      .withColumn("__sumw", sum(col("__w")).over(wJAll))
      .withColumn("channel", channelCol(typeCol, convType))
      .where(col("channel").isNotNull)
    val organic = col("channel") === "organic"
    val fracMicros =
      when(organic, lit(1000000.0))
        .otherwise(col("__w") * 1000000.0 / col("__sumw"))
    val frac = when(organic, lit(1.0))
      .otherwise(col("__w") / col("__sumw"))
    weighted.select(col(userCol), col("__journey").as("journey"),
      col("channel"), col("__pos").as("touch_pos"), col("__n").as("n_touches"),
      col("__w").as("weight_micros"),
      round(fracMicros).cast("long").as("decay_frac_micros"),
      round(col("__conv_value") * frac * 100.0).cast("long")
        .as("decay_value_cents"))
  }

  /** Per-channel rollup of [[timeDecayCredits]] — same exact-integer-sum
    * contract as [[multiTouchReport]]. */
  def timeDecayReport(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, convType: String, valueCol: String,
                      tieCol: String, halfLifeSec: Long): DataFrame =
    timeDecayCredits(events, userCol, tsCol, typeCol, convType, valueCol,
        tieCol, halfLifeSec)
      .groupBy(col("channel"))
      .agg(round(sum(col("decay_frac_micros")) / 1000000.0, 6)
          .as("credited_conversions"),
        round(sum(col("decay_value_cents")) / 100.0, 2)
          .as("attributed_value"))
      .orderBy(col("channel"))

  /** Per-channel rollup of [[multiTouchCredits]] under one model
    * ("linear" | "position"): credited conversions (fraction sum) and
    * attributed value. Exact integer sums, answer-sized output. */
  def multiTouchReport(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, convType: String, valueCol: String,
                       tieCol: String, model: String): DataFrame = {
    val (fracCol, centsCol) = model match {
      case "linear" => ("linear_frac_micros", "linear_value_cents")
      case "position" => ("position_frac_micros", "position_value_cents")
      case other => throw new IllegalArgumentException(
        s"unknown multi-touch model: $other (want linear|position)")
    }
    multiTouchCredits(events, userCol, tsCol, typeCol, convType, valueCol,
        tieCol)
      .groupBy(col("channel"))
      .agg(round(sum(col(fracCol)) / 1000000.0, 6).as("credited_conversions"),
        round(sum(col(centsCol)) / 100.0, 2).as("attributed_value"))
      .orderBy(col("channel"))
  }
}
