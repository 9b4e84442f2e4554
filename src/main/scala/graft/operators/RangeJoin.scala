package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval (range) join.
  *
  * The reference has no range join (its only joins are equi merges,
  * `dags/etl/kpi_processor.py:59`), but a point-in-interval join is a core
  * capability the equi-join family can't express: match every point row
  * `p` to every interval row `[lo, hi)` that contains it, with NO equi key.
  *
  * Naive formulations and why they fail at 100 TB:
  *  - theta join `points JOIN intervals ON lo <= p AND p < hi` — Spark has
  *    no equi key to hash on, so this plans as BroadcastNestedLoopJoin
  *    (O(|P|·|I|) comparisons) or falls over when neither side broadcasts.
  *
  * The scale shape used here (the standard "binning" range join, as in
  * Spark's own range-join hints on Databricks and in postGIS-style spatial
  * binning): pick a bucket width W;
  *  1. each point hashes to exactly ONE bucket `floor(p / W)`;
  *  2. each interval explodes to the buckets it overlaps,
  *     `floor(lo/W) .. floor((hi-1)/W)` — ceil((hi-lo)/W)+1 rows, small
  *     when W ≈ typical interval length;
  *  3. equi-join on the bucket id (ordinary shuffled hash join — partial
  *     aggregation, AQE, skew handling all apply);
  *  4. residual predicate `lo <= p < hi` drops same-bucket non-overlaps.
  * Each matching (point, interval) pair meets in exactly one bucket (the
  * point's), so no dedup pass is needed. Cost is O(|P| + |I|·len/W) shuffle
  * rows instead of O(|P|·|I|) comparisons.
  */
object RangeJoin {

  /** Join `points` to the `intervals` rows whose `[lo, hi)` range contains
    * the point. All three columns must be numeric (cast timestamps to epoch
    * seconds first — see [[pointInTimeWindow]]). `bucketWidth` should be on
    * the order of the typical interval length: too small explodes the
    * interval side, too large degrades to a cross join within buckets.
    * Inner join; every output row satisfies lo <= point < hi.
    *
    * Precision: bucket ids go through double division; values must satisfy
    * |x| < 2^52 or bucket assignment can land one off (epoch SECONDS are
    * fine; epoch NANOS are not — divide them down first). The residual
    * predicate compares the original values, so a mis-bucketing could only
    * ever DROP a boundary match, never fabricate one. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    // sequence() is inclusive on both ends; the last bucket is floor(hi/W)
    // — NOT floor((hi-1)/W), which under-covers fractional bounds (e.g.
    // lo=9.5, hi=10.2, W=10 must reach bucket 1 where point 10.1 lives).
    // The residual predicate below already drops points >= hi, and each
    // matching pair still meets only in the point's single bucket, so the
    // extra bucket row costs one shuffle row and no dedup. Empty/inverted
    // intervals (hi <= lo) produce no buckets via the when() guard rather
    // than a descending sequence (same Spark pitfall as Dedup.docShingles).
    val iv = intervals
      .withColumn("__buckets",
        when(col(hiCol) > col(loCol),
          sequence(floor(col(loCol) / bucketWidth).cast("long"),
            floor(col(hiCol) / bucketWidth).cast("long")))
          .otherwise(array().cast("array<long>")))
      .select(intervals.columns.toIndexedSeq.map(col) :+
        explode_outer(col("__buckets")).as("__bucket"): _*)
      .where(col("__bucket").isNotNull)
    p.join(iv, Seq("__bucket"))
      .where(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Timestamp convenience: points with timestamp `tsCol` joined into
    * `[startCol, endCol)` timestamp windows, bucketing on whole days by
    * default. Comparisons happen on epoch MICROseconds — exact, since Spark
    * timestamps are integral microseconds; unix_timestamp() would truncate
    * to whole seconds and mis-place sub-second boundary rows (e.g. point
    * 12:00:00.7 vs a window starting 12:00:00.9 both truncate to 12:00:00
    * and wrongly match). Epoch micros (~1.7e15) stay under the 2^52 bucket
    * precision bound in [[pointInInterval]]. */
  def pointInTimeWindow(points: DataFrame, tsCol: String,
                        windows: DataFrame, startCol: String, endCol: String,
                        bucketSeconds: Long = 86400L): DataFrame = {
    // cast: unix_micros takes TIMESTAMP only; TIMESTAMP_NTZ inputs (e.g.
    // parquet dates) convert in the session zone — UTC, deterministic.
    def micros(c: String) = unix_micros(col(c).cast("timestamp"))
    val p = points.withColumn("__p", micros(tsCol))
    val w = windows
      .withColumn("__lo", micros(startCol))
      .withColumn("__hi", micros(endCol))
    pointInInterval(p, "__p", w, "__lo", "__hi", bucketSeconds * 1000000L)
      .drop("__p", "__lo", "__hi")
  }
}
