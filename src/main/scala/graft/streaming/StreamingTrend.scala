package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-entity OLS trend — the stateful twin of
  * [[graft.operators.Trend]]: the "is this key rising or falling"
  * regression maintained continuously from O(1) exact-integer state per
  * key (n, Σx, Σy, Σxy, Σx² — OLS over sums is algebraic, so streaming
  * needs no history buffer, only the five accumulators).
  *
  * Arithmetic is BIT-IDENTICAL to the batch operator's: y quantizes via
  * Spark SQL `round`'s own path ([[StreamingEwma.quantize]]), x is the
  * per-key arrival index continuing across batches, sums accumulate in
  * longs, and slope/intercept come from the same half-up INTEGER
  * division to micro resolution — the derived products (n·Σxy − Σx·Σy
  * and the intercept numerator) are formed in BigInt at emission, so
  * they can never overflow. The long STATE sums stay exact while
  * n²·max|y_micros| < 2⁶³ — ~300 M events per key at values ≤ 100,
  * 3 M at values ≤ 10⁶: comfortably beyond the bounded per-entity
  * sequences that are the batch operator's documented domain too. A
  * stream whose batches arrive in event-time order lands on exactly the
  * batch operator's values per key (spec-pinned).
  *
  * Emits ONE summary row per key per micro-batch that touched it (the
  * refreshed trend after folding that batch), in the
  * [[StreamingEnrich]]-family as-has-arrived contract.
  */
object StreamingTrend {

  final case class TrendInput(user_id: Long, ts: Timestamp, event_id: Long,
                              value: Double)

  /** Exact-integer OLS accumulators. */
  final case class TrendState(n: Long, sx: Long, sy: Long, sxy: Long,
                              sxx: Long)

  final case class TrendPoint(user_id: Long, n_events: Long, slope: Double,
                              intercept: Double)

  /** Half-up-away integer division, b > 0 — the batch operator's exact
    * rounding, overflow-proof in BigInt. */
  def halfUpDiv(a: BigInt, b: BigInt): Long = {
    val q = ((a.abs * 2 + b) / (b * 2)).toLong
    if (a < 0) -q else q
  }

  def smoothed(input: Dataset[TrendInput]): Dataset[TrendPoint] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TrendState, TrendPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[TrendInput], state: GroupState[TrendState]) =>
          var st = state.getOption.getOrElse(TrendState(0L, 0L, 0L, 0L, 0L))
          it.toSeq.sortBy(r => (r.ts.getTime, r.event_id)).foreach { r =>
            val x = st.n + 1L
            val ym = StreamingEwma.quantize(r.value)
            st = TrendState(x, st.sx + x, st.sy + ym, st.sxy + x * ym,
              st.sxx + x * x)
          }
          state.update(st)
          if (st.n == 0L) Iterator.empty
          else {
            val (slopeMic, intMic) =
              if (st.n < 2L) (0L, halfUpDiv(BigInt(st.sy), BigInt(st.n)))
              else {
                val (n, sx, sy, sxy, sxx) = (BigInt(st.n), BigInt(st.sx),
                  BigInt(st.sy), BigInt(st.sxy), BigInt(st.sxx))
                val num = n * sxy - sx * sy
                val denom = n * sxx - sx * sx
                val s = halfUpDiv(num, denom)
                (s, halfUpDiv(sy * denom - num * sx, n * denom))
              }
            Iterator.single(TrendPoint(key, st.n,
              slopeMic / 1000000.0, intMic / 1000000.0))
          }
      }
  }
}
