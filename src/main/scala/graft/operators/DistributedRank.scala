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

  /** Append 1-based global rank `rankCol` (Long) by `order`.
    *
    * CONTRACT — eager, stored, lineage-truncated: the call materializes
    * the full range exchange AT CALL TIME via `localCheckpoint(true)`
    * (see the in-body rationale — both the offsets aggregate and the
    * join branch must read ONE execution of the exchange or ranks can
    * silently be wrong). Consequences callers must plan for: (1) this
    * is not a lazy plan fragment — composing it inside a larger lazy
    * pipeline pays the input scan here, not at the pipeline's action;
    * (2) the checkpointed blocks live in executor storage until the
    * returned frame's RDD is GC'd (the ContextCleaner frees them — a
    * long session calling this in a loop should drop references to the
    * returned frames promptly); (3) localCheckpoint truncates lineage,
    * so the job cannot recompute lost blocks on executor failure —
    * on an unreliable cluster use a reliable `checkpoint` directory
    * instead, at the cost of a distributed-FS write. The checkpoint is
    * NOT optional here: this is intrinsically the two-consumer case the
    * freeze exists for. */
  def globalRowNumber(df: DataFrame, rankCol: String,
                      order: Column*): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    val parts = df.sparkSession.sparkContext.defaultParallelism
    // Materialize the range exchange ONCE before both consumers read it.
    // `spark_partition_id()` over `repartitionByRange` is only stable
    // within a single execution of the exchange — RangePartitioner
    // samples its boundaries with an rdd.id-derived seed, so if the
    // offsets aggregate and the join branch each re-executed the subtree
    // (exchange reuse disabled, or non-identical canonicalized plans)
    // they could assign DIFFERENT __chunk ids to the same row and the
    // ranks would silently be wrong. localCheckpoint freezes the
    // partition assignment (the same reason the classic RDD
    // `sortBy(...).zipWithIndex()` caches between its two jobs); the
    // materialization is executor-local and is the price a global rank
    // already implies — the full sort exchange writes these bytes anyway.
    val chunked = df.repartitionByRange(parts, order: _*)
      .withColumn("__chunk", spark_partition_id())
      .localCheckpoint(true)
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
