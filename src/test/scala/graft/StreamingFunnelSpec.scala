package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.FunnelEvent

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stage advances emit incrementally, in order, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = StreamingFunnel.trackFunnel(input.toDS(),
      Seq("view", "click", "purchase"), watermark = "0 seconds")
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-funnel").toString
    val q = out.writeStream.format("memory").queryName("funnel_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // batch 1: u1 views+clicks; u2 purchases FIRST (must not advance)
    input.addData(
      FunnelEvent(1L, ts("2024-01-01 10:00:00"), "view"),
      FunnelEvent(1L, ts("2024-01-01 10:05:00"), "click"),
      FunnelEvent(2L, ts("2024-01-01 09:00:00"), "purchase"))
    q.processAllAvailable()
    def rows() = spark.sql(
      "SELECT user_id, stage_idx, stage FROM funnel_out ORDER BY user_id, stage_idx")
      .as[(Long, Int, String)].collect().toSeq
    assert(rows() === Seq((1L, 0, "view"), (1L, 1, "click")))

    // batch 2: u1 purchases (advances to stage 2); u2 finally views
    // (advances stage 0 only — the old purchase is not retro-credited);
    // u1's duplicate click is idempotent
    input.addData(
      FunnelEvent(1L, ts("2024-01-01 10:30:00"), "purchase"),
      FunnelEvent(1L, ts("2024-01-01 10:31:00"), "click"),
      FunnelEvent(2L, ts("2024-01-01 11:00:00"), "view"))
    q.processAllAvailable()
    assert(rows() === Seq(
      (1L, 0, "view"), (1L, 1, "click"), (1L, 2, "purchase"),
      (2L, 0, "view")))

    // batch 3: u2 clicks after its view -> stage 1
    input.addData(FunnelEvent(2L, ts("2024-01-01 11:30:00"), "click"))
    q.processAllAvailable()
    assert(rows().count(r => r._1 == 2L) === 2)
    q.stop()
  }

  test("a same-timestamp next-stage event does not advance (strictly after)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = StreamingFunnel.trackFunnel(input.toDS(), Seq("view", "click"),
      watermark = "0 seconds")
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-funnel2").toString
    val q = out.writeStream.format("memory").queryName("funnel_out2")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    input.addData(
      FunnelEvent(5L, ts("2024-01-01 10:00:00"), "view"),
      FunnelEvent(5L, ts("2024-01-01 10:00:00"), "click"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT stage FROM funnel_out2").as[String].collect()
    assert(rows.toSeq === Seq("view"))
    q.stop()
  }
}
