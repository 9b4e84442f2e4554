package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average per entity — the classic
  * recency-weighted feature (signal smoothing, user-level trend state,
  * "current" price/engagement level) the reference's per-hour means
  * (reference: dags/etl/kpi_processor.py:76-92) cannot express: an EWMA
  * is a sequential recurrence, not an algebraic aggregate.
  *
  * Determinism is the hard part of a recurrence: per-step DECIMAL
  * rounding lands on .5 boundaries often enough to drift engines apart
  * by an ulp (measured: 3 of 150 users at sf0.01 under round-6dp steps).
  * So the recurrence runs in EXACT integer micro-space instead — the
  * repo's integer-cents discipline applied to a fold:
  *
  *   m  = 1/α (a power of two);  x̃ = round(x·10⁶)  (quantize ONCE)
  *   s₁ = x̃₁;   sᵢ = floor((sᵢ₋₁·(m−1) + x̃ᵢ) / m)
  *
  * Every step is an integer multiply-add and a floor-divide by 2^k; all
  * intermediates stay far below 2⁵², so the identical floating floor
  * expression is EXACT in any engine — no rounding boundary exists
  * anywhere, and DuckDB replays the recurrence step by step (recursive
  * CTE) onto the same bits. The output maps back to value units as
  * s/10⁶ (micro-quantized by construction).
  *
  * Scale shape: ONE shuffle on the entity key; each entity's sequence is
  * gathered (`sort_array(collect_list(...))`, (ts, id)-total-ordered) and
  * folded in a single codegen'd `aggregate` pass — no window, no
  * per-step shuffle, no driver state. Memory is bounded by the per-entity
  * sequence length (fine for user/device/symbol keys; an unbounded key
  * would use a streaming stateful twin instead).
  */
object Ewma {

  private def micros(c: Column) = unix_micros(c.cast("timestamp"))

  /** (user, n_events, ewma): the final smoothed value per entity after
    * folding its full (tsCol, idCol)-ordered sequence of `valueCol`.
    * `alpha` must be a negative power of two (1/2, 1/4, …) so the
    * recurrence divides by an exact binary scale. */
  def perEntity(events: DataFrame, userCol: String, tsCol: String,
                idCol: String, valueCol: String,
                alpha: Double = 0.5): DataFrame = {
    val invAlpha = 1.0 / alpha
    require(alpha > 0 && alpha <= 0.5 &&
      invAlpha == math.rint(invAlpha) &&
      java.lang.Long.bitCount(invAlpha.toLong) == 1,
      s"alpha must be a negative power of two for exact scaling: $alpha")
    // Lower bound on alpha = upper bound on m: the fold's
    // floor((s·(m−1) + x̃)/m) runs in double division, exact only while
    // the numerator stays below 2⁵²; with m ≤ 2¹⁶ and micro-quantized
    // values up to ~2³⁵ (≈ 34k value units), s·(m−1)+x̃ < 2⁵¹+2³⁵ — safely
    // inside. Past this bound the batch fold would lose ulps while the
    // streaming twin's long multiply stays exact: a SILENT divergence.
    require(alpha >= 1.0 / 65536,
      s"alpha below 2^-16 overflows the exact integer fold: $alpha")
    val m = invAlpha.toLong
    val seq = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(
        micros(col(tsCol)).as("t"), col(idCol).as("i"),
        round(col(valueCol).cast("double") * lit(1000000.0))
          .cast("long").as("xm")))).as("__seq"))
    seq.select(col(userCol),
        size(col("__seq")).cast("long").as("n_events"),
        (aggregate(col("__seq"), lit(null).cast("long"), (acc, e) =>
          when(acc.isNull, e.getField("xm"))
            .otherwise(floor(
              (acc * lit(m - 1) + e.getField("xm")) / lit(m.toDouble))
              .cast("long")))
          / lit(1000000.0)).as("ewma"))
      .orderBy(col(userCol))
  }
}
