package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-depth (quantile-bucketed) histogram — k buckets of near-equal
  * ROW count with exact value boundaries: the skew-honest complement of
  * the equi-width histograms (`token_histogram`, `price_buckets`) whose
  * bucket populations collapse under heavy tails. This is the histogram
  * a stats catalog stores for selectivity estimation.
  *
  * The naive formulation is `ntile() OVER (ORDER BY v)` — a
  * single-partition window, the canonical scan-stopper. Here bucket
  * assignment is pure arithmetic over the EXACT distributed global rank
  * ([[DistributedRank.globalRowNumber]] — range chunks + bounded
  * offsets): bucket = (rank−1)·k div n. Boundaries (per-bucket min/max)
  * are order statistics — no float arithmetic anywhere, so the output
  * is engine-exact with no rounding discipline needed.
  */
object Histogram {

  /** (bucket, n_rows, lo, hi) over `valueCol`, k buckets; `tieCol` must
    * make the (value, tie) order total. `totalRows` is the input row
    * count (a catalog statistic at scale; computed here when absent). */
  def equiDepth(df: DataFrame, valueCol: String, tieCol: String, k: Int,
                totalRows: Option[Long] = None): DataFrame = {
    require(k >= 2 && k <= 10000, s"unreasonable bucket count: $k")
    val n = totalRows.getOrElse(df.count())
    require(n > 0, "equi-depth histogram of an empty frame")
    val ranked = DistributedRank.globalRowNumber(
      df.select(col(valueCol).as("__v"), col(tieCol).as("__t")),
      "__r", col("__v").asc, col("__t").asc)
    ranked
      .withColumn("bucket", expr(s"((__r - 1) * $k) div $n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__v")).as("lo"), max(col("__v")).as("hi"))
      .orderBy(col("bucket"))
  }
}
