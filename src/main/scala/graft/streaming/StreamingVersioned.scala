package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.SnapshotDiff
import graft.sources.VersionedTable

/** Streaming CDC applied onto the table's OWN history: each micro-batch
  * of change rows lands as a [[graft.sources.VersionedTable]] commit,
  * so every batch boundary is a time-travelable version and the lineage
  * between consecutive versions IS the batch's change set
  * (`SnapshotDiff(v_{n-1}, v_n)` reproduces it — witnessed in
  * StreamingVersionedSpec).
  *
  * Crash/replay posture: foreachBatch can re-deliver a batch after a
  * failure. A replayed batch re-applies onto the already-advanced state
  * and produces an IDENTICAL next state; the writer diffs before
  * committing and skips no-op commits, so replays converge instead of
  * minting duplicate versions. A crash between the data write and the
  * manifest write leaves an invisible orphan that [[VersionedTable]]'s
  * versioning skips past (commit chooses the next version PAST any
  * staged directory) and vacuum later reclaims.
  */
object StreamingVersioned {

  /** One CDC batch applied to a table state: change rows carry the
    * upsert values plus a boolean `deleteCol`; every changed key's old
    * row is dropped, non-delete rows are (re)inserted. One change row
    * per key per batch (the micro-batch is the deduplication unit —
    * upstream compaction picks the survivor). */
  def applyChanges(prev: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   deleteCol: String = "_deleted"): DataFrame = {
    val touched = changes.select(keyCols.map(col): _*).distinct()
    val upserts = changes.where(!col(deleteCol)).drop(deleteCol)
    prev.join(broadcast(touched), keyCols, "left_anti")
      .unionByName(upserts)
  }

  /** Latest committed state, or an empty frame with the upsert schema
    * before the first commit. */
  private def latestOrEmpty(spark: SparkSession, root: String,
                            like: DataFrame): DataFrame =
    if (VersionedTable.versions(spark, root).isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], like.schema)
    else VersionedTable.read(spark, root)

  /** Wire a stream of change rows into a versioned table: per trigger,
    * apply the batch onto the latest version and commit the result as
    * the next one — unless the state did not change (batch replay /
    * no-op batch), which commits nothing. */
  def cdcCommitWriter(changes: DataFrame, root: String, keyCols: Seq[String],
                      checkpoint: String, deleteCol: String = "_deleted",
                      onCommit: (Long, Long) => Unit = (_, _) => (),
                      trigger: Trigger = Trigger.AvailableNow())
      : DataStreamWriter[Row] =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val upsertShape = batch.drop(deleteCol)
          val prev = latestOrEmpty(spark, root, upsertShape)
          val next = applyChanges(prev, batch, keyCols, deleteCol)
          // replay guard: an already-applied batch changes nothing —
          // do not mint a duplicate version for it
          val changed = prev.isEmpty ||
            !SnapshotDiff.diff(prev, next, keyCols,
              nullSafeKeys = false).isEmpty
          if (changed) {
            val v = VersionedTable.commit(next, root)
            onCommit(batchId, v)
          }
        }
      }
}
