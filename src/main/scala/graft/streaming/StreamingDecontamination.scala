package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ext.DedupIndex
import graft.sources.VersionedTable

/** The streaming substring-decontamination loop: a continuous document
  * stream is cut against the PERSISTED span index
  * ([[graft.ext.DedupIndex.cutSeenSpans]]), each micro-batch's cut
  * report lands as a version of an audit-log table, and the batch's own
  * spans are ingested so batch N+1 dedups against everything through
  * batch N. Corpus text is never rescanned — each trigger touches the
  * batch and hash keys only, the streaming form of the span index's
  * whole point.
  *
  * Crash/replay posture (foreachBatch can re-deliver a batch): the
  * report computed against the CURRENT index would be wrong on replay —
  * if the crash hit after ingest, the batch's own spans read as "seen"
  * and the recomputed report would cut everything. The index being a
  * [[VersionedTable]] solves this: a marker under `indexRoot/_ingest/`
  * records each batch's PRE-ingest index version before the ingest
  * runs, and a replay recomputes the report against that version via
  * time travel — the same report, every time. Step order per batch
  * (report commit → marker → ingest) makes every crash window converge:
  *
  *  - before the report commit: full replay, identical outcome;
  *  - after the report commit: the recomputed report equals the stored
  *    one, and the append guard (no rows beyond the stored log) skips
  *    the duplicate commit;
  *  - after the marker: the index version still equals the marker's
  *    pre-version, so the ingest (the only remaining step) runs;
  *  - after the ingest: version > pre-version, everything skips.
  *
  * Single-writer contract: one stream owns the index and the report
  * table (the [[VersionedTable]] posture; batches within a stream are
  * already serial). A doc re-sent AFTER being fully cut reports
  * identically (n_after = 0) and appends nothing — re-delivering
  * already-decontaminated content is a no-op by design.
  *
  * Vacuum composes with one retention rule: only the LAST batch can
  * ever replay (the stream checkpoint), and its marker points at the
  * previous index version — so `vacuum(keepVersions >= 2)` between
  * triggers is always safe, while keep-1 could reclaim the version an
  * in-flight replay needs. (VersionedTable already forbids vacuum
  * concurrent with a writer; this is the cross-trigger rule.)
  */
object StreamingDecontamination {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def markerPath(indexRoot: String, batchId: Long) =
    new Path(new Path(indexRoot, "_ingest"), s"b$batchId")

  /** The recorded pre-ingest index version for a batch, if its marker
    * exists (0 = the index was empty). */
  private def markedPreVersion(spark: SparkSession, indexRoot: String,
                               batchId: Long): Option[Long] = {
    val p = markerPath(indexRoot, batchId)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  private def writeMarker(spark: SparkSession, indexRoot: String,
                          batchId: Long, preVersion: Long): Unit = {
    val p = markerPath(indexRoot, batchId)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    val out = f.create(p, false)
    try out.write(preVersion.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The index at version `v`, where 0 means "before any commit" — an
    * empty hash-key frame. */
  private def indexAt(spark: SparkSession, indexRoot: String,
                      v: Long): DataFrame =
    if (v == 0L)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("sh", StringType))))
    else VersionedTable.read(spark, indexRoot, Some(v))

  /** One batch through the loop — public so a redelivered batch can be
    * simulated in specs exactly as foreachBatch would replay it.
    * Returns the report committed (or re-derived, on replay) for the
    * batch. */
  def decontaminateBatch(batch: DataFrame, batchId: Long, indexRoot: String,
                         reportRoot: String, k: Int): DataFrame = {
    val spark = batch.sparkSession
    // replay-stable planning point: the index version this batch cuts
    // against is the one recorded at first delivery, else the current
    // latest
    val latest = VersionedTable.versions(spark, indexRoot)
      .lastOption.getOrElse(0L)
    val pre = markedPreVersion(spark, indexRoot, batchId).getOrElse(latest)
    val report = DedupIndex.cutSeenSpans(indexAt(spark, indexRoot, pre),
      batch, k)
    // append guard: skip the commit when the stored log already holds
    // every report row (the crash-after-report-commit replay)
    val isNew = VersionedTable.versions(spark, reportRoot).isEmpty ||
      !report.exceptAll(VersionedTable.read(spark, reportRoot)).isEmpty
    if (isNew) VersionedTable.commit(report, reportRoot, append = true)
    if (markedPreVersion(spark, indexRoot, batchId).isEmpty)
      writeMarker(spark, indexRoot, batchId, pre)
    // ingest exactly once: the marker pins pre, so version == pre means
    // the ingest has not happened yet (batches are serial per stream)
    val nowLatest = VersionedTable.versions(spark, indexRoot)
      .lastOption.getOrElse(0L)
    if (nowLatest == pre) {
      if (pre == 0L)
        VersionedTable.commit(DedupIndex.spanIndex(batch, k), indexRoot)
      else DedupIndex.ingestSpans(indexRoot, batch, k)
    }
    report
  }

  /** Wire a document stream (doc_id, text) into the loop: per trigger,
    * cut the batch against the persisted span index, append the cut
    * report as the audit log's next version, and ingest the batch's
    * spans for the next trigger. */
  def decontaminationWriter(docs: DataFrame, indexRoot: String,
                            reportRoot: String, k: Int, checkpoint: String,
                            onBatch: (Long, Long) => Unit = (_, _) => (),
                            trigger: Trigger = Trigger.AvailableNow())
      : DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          decontaminateBatch(batch.select(col("doc_id"), col("text")),
            batchId, indexRoot, reportRoot, k)
          val v = VersionedTable.versions(batch.sparkSession, indexRoot)
            .lastOption.getOrElse(0L)
          onBatch(batchId, v)
        }
      }
}
