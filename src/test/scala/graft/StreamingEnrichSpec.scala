package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingEnrich
import graft.streaming.StreamingEnrich.EnrichInput

/** Latest-dim streaming enrichment: exact as-of within a batch,
  * as-of-what-has-arrived across batches, one dim version of state. */
class StreamingEnrichSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def dim(k: Long, t: String, v: String) =
    EnrichInput(k, ts(t), is_dim = true, dim_value = v, payload = 0.0)
  private def ev(k: Long, t: String, p: Double) =
    EnrichInput(k, ts(t), is_dim = false, dim_value = null, payload = p)

  test("events pick up the latest prior dim version; state carries over") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EnrichInput]
    val out = StreamingEnrich.latestDimEnrich(input.toDS())
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-enrich").toString
    val q = out.writeStream.format("memory").queryName("enrich_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    def rows() = spark.sql(
      """SELECT key, payload, dim_value FROM enrich_out
         ORDER BY key, payload""")
      .as[(Long, Double, Option[String])].collect().toSeq

    try {
      // batch 1: in-batch as-of — the event between two profile versions
      // sees v1, the later event sees v2; key 2 has no dim yet → null
      input.addData(
        dim(1L, "2024-01-01 09:00:00", "bronze"),
        ev(1L, "2024-01-01 10:00:00", 1.0),
        dim(1L, "2024-01-01 11:00:00", "gold"),
        ev(1L, "2024-01-01 12:00:00", 2.0),
        ev(2L, "2024-01-01 10:00:00", 9.0))
      q.processAllAvailable()
      assert(rows() === Seq(
        (1L, 1.0, Some("bronze")), (1L, 2.0, Some("gold")),
        (2L, 9.0, None)))

      // batch 2: state carried — key 1 events enrich with gold without a
      // dim row in this batch; key 2's dim arrives and applies in-batch
      input.addData(
        ev(1L, "2024-01-01 13:00:00", 3.0),
        dim(2L, "2024-01-01 11:00:00", "silver"),
        ev(2L, "2024-01-01 12:00:00", 8.0))
      q.processAllAvailable()
      assert(rows().filter(r => r._2 == 3.0 || r._2 == 8.0) === Seq(
        (1L, 3.0, Some("gold")), (2L, 8.0, Some("silver"))))

      // batch 3: a STALE dim update (older than held) must not regress
      // the state; a same-timestamp dim+event tie makes the new version
      // visible to the event (dim sorts first on ties)
      input.addData(
        dim(1L, "2024-01-01 10:30:00", "stale"),
        ev(1L, "2024-01-01 14:00:00", 4.0),
        dim(2L, "2024-01-01 15:00:00", "plat"),
        ev(2L, "2024-01-01 15:00:00", 7.0))
      q.processAllAvailable()
      assert(rows().filter(r => r._2 == 4.0 || r._2 == 7.0) === Seq(
        (1L, 4.0, Some("gold")), (2L, 7.0, Some("plat"))))
    } finally q.stop()
  }
}
