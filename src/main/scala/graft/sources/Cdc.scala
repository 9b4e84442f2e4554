package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental CDC load: apply a [[graft.operators.SnapshotDiff]]
  * classification to a JDBC target so the warehouse write shrinks from
  * full-table to delta-sized — the scale form of the reference's
  * re-load-everything-per-run upsert
  * (reference: dags/etl/load_to_redshift.py:186-203, which re-upserts
  * the whole KPI table each run; at 100 TB only the diff should move).
  *
  * Legs:
  *  - `added` + `changed` → one MERGE upsert of the new-side values
  *    ([[JdbcUpsertSink.mergeUpsertKeys]]; insert-or-update, key-unique
  *    by construction since the diff emits one row per key).
  *  - `removed` → one staged `DELETE WHERE EXISTS`
  *    ([[JdbcUpsertSink.deleteMatching]]).
  *
  * Idempotence contract (mirrors the reference's per-day idempotent
  * upsert): re-applying the SAME diff is a no-op — upserted rows merge
  * to identical values, deleted keys are already gone. CdcSpec proves
  * both directions on Derby.
  */
object Cdc {

  /** Rows written per leg, for load accounting. */
  final case class CdcResult(upserted: Long, deleted: Long)

  /** Apply a row-level diff (the output of `SnapshotDiff.diff`: key
    * columns, `diff_status`, `old_*`/`new_*` pairs) to `table`.
    *
    * Compared columns are inferred from the `new_*` columns, so the
    * apply stays in lockstep with whatever column set the diff was run
    * with. The two legs are two bounded actions over a delta-sized
    * frame; at 100 TB the diff itself is the only full-input work.
    */
  def cdcApply(diff: DataFrame, sink: JdbcUpsertSink, table: String,
               keyCols: Seq[String], numPartitions: Int = 4,
               batchSize: Int = 10000): CdcResult = {
    val valueCols = diff.columns.collect {
      case c if c.startsWith("new_") => c.stripPrefix("new_")
    }.toSeq
    require(valueCols.nonEmpty,
      "cdcApply needs a row-level diff with new_* value columns")
    val upserts = diff
      .where(col("diff_status").isin("added", "changed"))
      .select(keyCols.map(col) ++
        valueCols.map(c => col(s"new_$c").as(c)): _*)
    val removals = diff
      .where(col("diff_status") === "removed")
      .select(keyCols.map(col): _*)
    // The diff is recomputed per leg (two filters of one frame); both
    // legs are delta-sized, and callers applying a huge delta can
    // checkpoint the diff first. Count via the staged write itself.
    val nUp = upserts.count()
    if (nUp > 0)
      sink.mergeUpsertKeys(upserts, table, keyCols, numPartitions, batchSize)
    val nDel =
      if (removals.isEmpty) 0L
      else sink.deleteMatching(removals, table, keyCols, numPartitions,
        batchSize)
    CdcResult(nUp, nDel)
  }
}
