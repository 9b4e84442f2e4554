package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring — compare a categorical column's
  * distribution between two datasets (yesterday's corpus vs today's batch,
  * train vs eval split, source A vs source B). The alarm a continuously-
  * ingesting training pipeline needs: a language/source/length mix that
  * silently shifts between crawls changes the trained model.
  *
  * Report per category: counts, proportions, the absolute proportion
  * delta, and the pointwise KL term p·ln(p/q) (sum = D_KL(P||Q); emitted
  * per-category so the report localizes WHICH categories drive the
  * divergence). Laplace-style smoothing (+1 on each side) keeps the KL
  * defined when a category is absent from one side — categories from
  * EITHER side appear (full outer).
  *
  * Scale shape: one hash aggregate per side on the category key, a
  * full-outer join on category (category cardinality, not row count), and
  * two single-row totals broadcast in. No collect; row volume never
  * crosses the network.
  */
object Drift {

  def categoricalDrift(a: DataFrame, b: DataFrame, category: Column,
                       smoothing: Double = 1.0): DataFrame = {
    val ca = a.groupBy(category.as("category"))
      .agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(category.as("category"))
      .agg(count(lit(1)).as("n_b"))
    val joined = ca.join(cb, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // totals via an unpartitioned window over the CATEGORY-cardinality
    // frame (small by definition) — one pass; a separate totals aggregate
    // joined back would recompute both groupBys per action (the GapFill
    // double-scan lesson)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // smoothed proportions: (n + s) / (total + s*k); k = category count
    val withP = joined
      .withColumn("__ta", sum(col("n_a")).over(wAll))
      .withColumn("__tb", sum(col("n_b")).over(wAll))
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("p_a", (col("n_a") + smoothing) /
        (col("__ta") + lit(smoothing) * col("__k")))
      .withColumn("p_b", (col("n_b") + smoothing) /
        (col("__tb") + lit(smoothing) * col("__k")))
    withP.select(col("category"), col("n_a"), col("n_b"),
        round(col("p_a"), 6).as("p_a"),
        round(col("p_b"), 6).as("p_b"),
        round(abs(col("p_a") - col("p_b")), 6).as("abs_delta"),
        round(col("p_a") * log(col("p_a") / col("p_b")), 6).as("kl_term"))
      .orderBy(col("category"))
  }
}
