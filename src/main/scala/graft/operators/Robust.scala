package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) outlier detection — the heavy-tail-safe twin
  * of the z-score census: a single pathological value shifts a mean and
  * explodes a stddev, but moves a median by at most one order statistic,
  * so MAD flags outliers without the outliers polluting the yardstick.
  *
  * robust z = |x - median| / (1.4826 · MAD), MAD = median(|x - median|);
  * 1.4826 rescales MAD to estimate σ under normality, making the
  * threshold comparable to a classic z-score cut.
  *
  * Scale posture: two group-keyed aggregation passes (medians are exact
  * order statistics — they cannot be computed in one pass with the
  * deviations that depend on them) + two broadcast join-backs on group
  * cardinality. Exact `percentile` buffers each group's values on one
  * reducer; at 100 TB per-group, swap in `approx_percentile` (t-digest,
  * mergeable) — same plan shape, bounded memory.
  */
object Robust {

  /** Per-group census: n, median, MAD, and how many rows exceed
    * `threshold` robust z-scores. Groups where MAD = 0 (over half the
    * values identical) report zero outliers rather than dividing by
    * zero.
    *
    * @param exact true (default) computes exact order-statistic medians
    *              (`percentile` — buffers each group's values on one
    *              reducer; fine when per-group cardinality is bounded);
    *              false swaps in `approx_percentile` (t-digest at
    *              `accuracy`) — mergeable partial aggregation, bounded
    *              memory per group: the 100 TB path. Same plan shape.
    * @param accuracy t-digest accuracy for the approx path (1/accuracy
    *                 relative rank error). */
  def madOutlierCensus(df: DataFrame, groupCol: String, valueCol: String,
                       threshold: Double = 3.0, exact: Boolean = true,
                       accuracy: Int = 10000): DataFrame = {
    def median(c: Column): Column =
      if (exact) percentile(c, lit(0.5))
      else approx_percentile(c, lit(0.5), lit(accuracy))
    val med = df.groupBy(col(groupCol))
      .agg(median(col(valueCol)).as("__med"))
    val withDev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = withDev.groupBy(col(groupCol))
      .agg(median(col("__dev")).as("__mad"))
    withDev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        round(first(col("__med")), 4).as("median_value"),
        round(first(col("__mad")), 4).as("mad_value"),
        sum(when(col("__mad") > 0 &&
            col("__dev") > lit(threshold * 1.4826) * col("__mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col(groupCol))
  }

  /** Hash-matched witness for the approx census (the rank-witness
    * pattern price_percentiles_approx established): per group the EXACT
    * row count plus two booleans the t-digest must earn — the rank
    * fraction of rows at or below its median sits within 0.02 of 0.5,
    * and likewise for the MAD (the median of absolute deviations). The
    * 1/accuracy relative-rank guarantee bounds the drift at 1e-4; the
    * 0.02 slack absorbs the discrete 1/n rank step at small groups.
    * Same plan shape as the census itself — two mergeable aggregation
    * passes and two broadcast join-backs, nothing exact-order-statistic
    * anywhere, so the witness runs wherever the 100 TB path runs. */
  def madOutlierCensusApproxWitness(df: DataFrame, groupCol: String,
                                    valueCol: String,
                                    accuracy: Int = 10000): DataFrame = {
    def median(c: Column): Column =
      approx_percentile(c, lit(0.5), lit(accuracy))
    val med = df.groupBy(col(groupCol))
      .agg(median(col(valueCol)).as("__med"))
    val withDev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = withDev.groupBy(col(groupCol))
      .agg(median(col("__dev")).as("__mad"))
    def rankOk(le: Column) = abs(
      sum(when(le, 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double") - lit(0.5)) <= lit(0.02)
    withDev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        rankOk(col(valueCol) <= col("__med")).as("med_rank_ok"),
        rankOk(col("__dev") <= col("__mad")).as("mad_rank_ok"))
      .orderBy(col(groupCol))
  }
}
