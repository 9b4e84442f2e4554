package graft

import org.apache.spark.sql.functions._

/** The store-the-sketch pattern: daily HLL sketches merged to coarser
  * grains without re-scanning the source. Engine-specific binary — the
  * query is rows-only in the oracle check, so accuracy vs exact distinct
  * is asserted here. */
class HllRollupSpec extends SparkSpec {
  import spark.implicits._

  test("union of daily sketches estimates the exact distinct within 5%") {
    val rows = for {
      day <- 1 to 14
      u <- 1 to 500 if (u * 31 + day * 7) % 3 != 0 // per-day overlap mix
    } yield (java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"),
      u.toLong)
    val events = rows.toDF("ts", "user_id")
    val daily = events.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    assert(daily.count() === 14)
    val est = daily.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"estimate $est too far from exact $exact")
  }

  test("estimates stay in tolerance under any partitioning (merge order)") {
    // DataSketches HLL's HIP estimator is merge-order-sensitive, so exact
    // equality across partitionings is NOT guaranteed — the contract is
    // bounded error for every merge order
    val events = (1 to 2000).map(u => (u % 7, u.toLong)).toDF("g", "user_id")
    def est(parts: Int): Long = events.repartition(parts)
      .groupBy(col("g")).agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    for (p <- Seq(1, 13)) {
      val e = est(p)
      assert(math.abs(e - 2000L).toDouble / 2000 < 0.05,
        s"estimate $e at $p partitions off exact 2000")
    }
  }
}
