package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{Cdc, JdbcUpsertSink}
import graft.streaming.StreamingCdc

/** Streaming CDC end-to-end: each micro-batch is a fresh snapshot; the
  * batch hook diffs it against the live Derby table and applies only the
  * delta. The warehouse stays authoritative between triggers. */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftscdc;create=true"
  private val sink = JdbcUpsertSink(url)

  private def state(): Seq[(Long, String, Double)] =
    spark.read.jdbc(url, "dim_s", new java.util.Properties)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq

  test("per-trigger snapshots apply as delta-sized CDC loads") {
    sink.ensureTable(
      """CREATE TABLE dim_s (
         "id" BIGINT NOT NULL,
         "seg" VARCHAR(64),
         "bal" DOUBLE)""", "dim_s")
    val applied = scala.collection.concurrent.TrieMap[Long, Cdc.CdcResult]()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft_scdc").toString
    val q = StreamingCdc.cdcWriter(
      input.toDF().toDF("id", "seg", "bal"), url, "dim_s", Seq("id"),
      checkpoint, (id, r) => applied.put(id, r),
      trigger = Trigger.ProcessingTime(0)).start()
    try {
      // snapshot 1: cold start — everything is an insert
      val snap1 = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0))
      input.addData(snap1: _*)
      q.processAllAvailable()
      assert(state() === snap1)
      assert(applied(0L) === Cdc.CdcResult(upserted = 3, deleted = 0))

      // snapshot 2: 2 changed, 3 removed, 4 added, 1 untouched —
      // the applied delta must be 2 upserts + 1 delete, NOT 4 rows
      val snap2 = Seq((1L, "A", 10.0), (2L, "B", 25.0), (4L, "C", 40.0))
      input.addData(snap2: _*)
      q.processAllAvailable()
      assert(state() === snap2)
      assert(applied(1L) === Cdc.CdcResult(upserted = 2, deleted = 1))

      // identical snapshot re-sent: a zero-delta no-op
      input.addData(snap2: _*)
      q.processAllAvailable()
      assert(state() === snap2)
      assert(applied(2L) === Cdc.CdcResult(upserted = 0, deleted = 0))
    } finally q.stop()
  }
}
