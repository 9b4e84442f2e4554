package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global row numbering WITHOUT the single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY collapses the
  * whole dataset into one task — the canonical scan-stopper at corpus
  * scale. The distributed equivalent (same shape as
  * [[graft.sources.TrainingShards.tokenBalancedAssign]]'s prefix sum):
  *
  *  1. range-partition on the order (Spark's sampled range exchange —
  *     partition i's rows all precede partition j's for i < j);
  *  2. row_number within each range chunk, in parallel;
  *  3. add each chunk's starting offset, computed from a per-chunk count
  *     aggregate run through the only unpartitioned window — bounded by
  *     construction at numPartitions rows — and broadcast back.
  *
  * The order columns MUST form a total order (end with a unique key such
  * as doc_id): ranks of rows tied on the full ordering tuple would
  * depend on which side of a range boundary they landed.
  */
object DistributedRank {

  /** Append 1-based global rank `rankCol` (Long) by `order`. */
  def globalRowNumber(df: DataFrame, rankCol: String,
                      order: Column*): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val chunked = df.repartitionByRange(parts, order: _*)
      .withColumn("__chunk", spark_partition_id())
    val wC = Window.orderBy(col("__chunk"))
    val offsets = chunked.groupBy(col("__chunk")).count()
      .withColumn("__off", coalesce(sum(col("count"))
        .over(wC.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__chunk"), col("__off"))
    val inChunk = Window.partitionBy(col("__chunk")).orderBy(order: _*)
    chunked.join(broadcast(offsets), Seq("__chunk"))
      .withColumn(rankCol,
        col("__off") + row_number().over(inChunk).cast("long"))
      .drop("__chunk")
  }
}
