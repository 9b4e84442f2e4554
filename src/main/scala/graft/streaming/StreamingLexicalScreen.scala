package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.ext.LexicalIndex
import graft.sources.VersionedTable

/** Streaming lexical decontamination: the training-document stream is
  * screened per micro-batch against the STATIC persisted BM25 index of
  * the eval set ([[LexicalIndex]]), and each batch's screen report
  * appends as a version of an audit-log table — the lexical sibling of
  * [[StreamingDecontamination]] (exact spans) and
  * [[StreamingSemanticDecontamination]] (embeddings).
  *
  * The replay story is STRUCTURALLY simpler than the other two loops:
  * production decontamination screens the stream against a FROZEN
  * eval/benchmark index — nothing ingests, so a replayed batch
  * recomputes a bit-identical report from the same index. The only
  * at-least-once hazard left is double-APPENDING that identical report,
  * closed by a per-batch marker recording the report log's pre-commit
  * version: a replay whose marker exists and whose log already moved
  * past it skips the commit (a version check, not a content diff —
  * O(1) at any log size, and a later batch that happens to produce
  * identical rows still commits). Single-writer per report root, as
  * with every [[VersionedTable]].
  */
object StreamingLexicalScreen {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def markerPath(reportRoot: String, batchId: Long) =
    new Path(new Path(reportRoot, "_screen"), s"b$batchId")

  private def markedReportPre(spark: SparkSession, reportRoot: String,
                              batchId: Long): Option[Long] = {
    val p = markerPath(reportRoot, batchId)
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

  private def writeMarker(spark: SparkSession, reportRoot: String,
                          batchId: Long, reportPre: Long): Unit = {
    val p = markerPath(reportRoot, batchId)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    val out = f.create(p, false)
    try out.write(s"$reportPre".getBytes("UTF-8")) finally out.close()
  }

  /** One batch through the screen — public so specs can replay it as
    * foreachBatch would. Returns the batch's report (committed at most
    * once). The report is computed ONCE (persisted before the commit
    * write, so a caller's count/collect hits the cache instead of
    * re-running the whole BM25 scoring); callers that are done with it
    * should `unpersist()` — [[screenWriter]] does. */
  def screenBatch(batch: DataFrame, batchId: Long,
                  si: LexicalIndex.ScreenIndex, reportRoot: String,
                  threshold: Double, probeTerms: Int): DataFrame = {
    val spark = batch.sparkSession
    val report = LexicalIndex.screenWith(si, batch, threshold, probeTerms)
      .persist()
    val reportLatest = VersionedTable.versions(spark, reportRoot)
      .lastOption.getOrElse(0L)
    val pre = markedReportPre(spark, reportRoot, batchId) match {
      case Some(v) => v
      case None => writeMarker(spark, reportRoot, batchId, reportLatest)
        reportLatest
    }
    if (VersionedTable.versions(spark, reportRoot)
        .lastOption.getOrElse(0L) == pre)
      VersionedTable.commit(report, reportRoot, append = true)
    report
  }

  /** [[screenBatch]] with per-call index stats — spec/one-shot form;
    * the streaming writer computes the stats once for the whole run. */
  def screenBatch(batch: DataFrame, batchId: Long, indexRoot: String,
                  reportRoot: String, threshold: Double,
                  probeTerms: Int = 16): DataFrame =
    screenBatch(batch, batchId,
      LexicalIndex.indexStats(batch.sparkSession, indexRoot),
      reportRoot, threshold, probeTerms)

  /** Wire a document stream (doc_id, text) into the screen. The frozen
    * index's derived stats (postings, lengths, document frequencies)
    * are loop invariants: computed and cached ONCE here, reused by
    * every micro-batch — not re-aggregated per trigger. */
  def screenWriter(docs: DataFrame, indexRoot: String, reportRoot: String,
                   threshold: Double, checkpoint: String,
                   probeTerms: Int = 16,
                   onBatch: (Long, Long) => Unit = (_, _) => (),
                   trigger: Trigger = Trigger.AvailableNow())
      : DataStreamWriter[Row] = {
    val si = LexicalIndex.indexStats(docs.sparkSession, indexRoot).persist()
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val r = screenBatch(batch.select(col("doc_id"), col("text")),
            batchId, si, reportRoot, threshold, probeTerms)
          try onBatch(batchId, r.count()) finally { r.unpersist(); () }
        }
      }
  }
}
