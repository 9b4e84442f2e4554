package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity trend — closed-form OLS of value against sequence position
  * (is this user's engagement/price/throughput rising or falling, and
  * how fast?): the feature-engineering primitive behind churn signals
  * and drift monitors, one closed form away from the per-hour means the
  * reference computes (dags/etl/kpi_processor.py:76-92).
  *
  * Determinism is engineered the library's usual way: x is the per-entity
  * sequence index (small integers from the (ts, id) total order), y
  * quantizes ONCE to integer micros, and every sum/product (Σx, Σy, Σxy,
  * Σx²) accumulates in EXACT decimal integer space — summation order
  * cannot matter. Even the final ratios never round a FLOAT (rounding
  * the same double to 6 dp split engines one ulp apart on a .5
  * boundary, measured at sf0.1): slope and intercept are produced at
  * micro resolution by HALF-UP INTEGER division of exact decimals —
  *
  *   slope_μ     = ⌈(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)⌋½
  *   intercept_μ = ⌈(Σy·denom − num·Σx) / (n·denom)⌋½
  *
  * (⌈·⌋½ = round-half-away via (2|a|+b) div 2b on non-negatives) — and
  * only then divide by 10⁶, an op both engines perform on identical
  * integers. Single-event entities report slope 0 and intercept = the
  * quantized value (the denominator is 0 by construction, never a NaN
  * in the output).
  *
  * Scale shape: one user-keyed window (the sequence index) feeding one
  * hash aggregate — two exchanges on the same key, output one row per
  * entity. No collect, no iteration: OLS over sums is a one-pass
  * algebraic aggregate.
  */
object Trend {

  /** (user, n_events, slope, intercept) per entity. */
  def perEntity(events: DataFrame, userCol: String, tsCol: String,
                idCol: String, valueCol: String): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val rows = events
      .withColumn("__x",
        row_number().over(byUser).cast("long").cast("decimal(12,0)"))
      .withColumn("__ym",
        round(col(valueCol).cast("double") * lit(1000000.0))
          .cast("long").cast("decimal(22,0)"))
    val agg = rows.groupBy(col(userCol)).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("sx"),
      sum(col("__ym")).as("sy"),
      sum(col("__x") * col("__ym")).as("sxy"),
      sum(col("__x") * col("__x")).as("sxx"))
    agg
      .withColumn("num", expr(
        "cast(n as decimal(12,0)) * sxy - sx * sy"))
      .withColumn("denom", expr(
        "cast(n as decimal(12,0)) * sxx - sx * sx"))
      // half-up-away integer division of exact decimals: `div` on
      // decimals is Spark's IntegralDivide (truncating — floor on the
      // non-negative operands used here), result fits a long
      .withColumn("slope_mic", expr(
        """CASE WHEN n < 2 THEN 0L
           ELSE (CASE WHEN num < 0 THEN -1L ELSE 1L END)
             * ((2 * abs(num) + denom) div (2 * denom)) END"""))
      .withColumn("inum", expr("sy * denom - num * sx"))
      .withColumn("int_mic", expr(
        """CASE WHEN n < 2 THEN
             (CASE WHEN sy < 0 THEN -1L ELSE 1L END)
               * ((2 * abs(sy) + n) div (2 * n))
           ELSE (CASE WHEN inum < 0 THEN -1L ELSE 1L END)
             * ((2 * abs(inum) + n * denom) div (2 * (n * denom))) END"""))
      .select(col(userCol), col("n").as("n_events"),
        (col("slope_mic") / lit(1000000.0)).as("slope"),
        (col("int_mic") / lit(1000000.0)).as("intercept"))
      .orderBy(col(userCol))
  }
}
