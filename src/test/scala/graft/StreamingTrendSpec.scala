package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Trend
import graft.streaming.StreamingTrend
import graft.streaming.StreamingTrend.TrendInput

/** Streaming OLS trend (streaming/StreamingTrend): in-order streams land
  * on the batch operator's exact values from O(1) integer state. */
class StreamingTrendSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("in-order batches reproduce the batch operator bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TrendInput]
    val out = StreamingTrend.smoothed(input.toDS())
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-trend").toString
    val q = out.writeStream.format("memory").queryName("trend_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val b1 = Seq(
      TrendInput(1L, ts("2024-01-01 10:00:00"), 1L, 3.0),
      TrendInput(1L, ts("2024-01-01 11:00:00"), 2L, 5.0),
      TrendInput(2L, ts("2024-01-01 10:00:00"), 3L, 4.25))
    val b2 = Seq(
      TrendInput(1L, ts("2024-01-01 12:00:00"), 4L, 7.0),
      TrendInput(2L, ts("2024-01-01 11:00:00"), 5L, 4.25))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      // key 1 after batch 1: perfect line 3 -> 5
      val t1 = spark.sql(
        """SELECT n_events, slope, intercept FROM trend_out
           WHERE user_id = 1""").as[(Long, Double, Double)].collect().toSeq
      assert(t1 === Seq((2L, 2.0, 1.0)))

      input.addData(b2: _*)
      q.processAllAvailable()
      // state carried: key 1 is now the 3-point perfect line 3, 5, 7
      val t2 = spark.sql(
        """SELECT n_events, slope, intercept FROM trend_out
           WHERE user_id = 1 AND n_events = 3""")
        .as[(Long, Double, Double)].collect().toSeq
      assert(t2 === Seq((3L, 2.0, 1.0)))

      // final per-key trend == the batch operator over the union
      val streamed = spark.sql(
        """SELECT user_id, max_by(slope, n_events) AS s,
             max_by(intercept, n_events) AS i, max(n_events) AS n
           FROM trend_out GROUP BY user_id""")
        .as[(Long, Double, Double, Long)].collect()
        .map(r => r._1 -> ((r._4, r._2, r._3))).toMap
      val batch = Trend.perEntity((b1 ++ b2).toDF(),
          "user_id", "ts", "event_id", "value")
        .as[(Long, Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("single-event key emits slope 0 and the quantized value") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TrendInput]
    val out = StreamingTrend.smoothed(input.toDS())
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-trend2").toString
    val q = out.writeStream.format("memory").queryName("trend_out2")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      input.addData(TrendInput(9L, ts("2024-01-01 10:00:00"), 1L,
        2.7182818281))
      q.processAllAvailable()
      val r = spark.sql("SELECT n_events, slope, intercept FROM trend_out2")
        .as[(Long, Double, Double)].collect().toSeq
      assert(r === Seq((1L, 0.0, 2.718282)))
    } finally q.stop()
  }

  test("halfUpDiv matches the batch operator's rounding on boundaries") {
    assert(StreamingTrend.halfUpDiv(BigInt(3), BigInt(6)) === 1L)   // .5 up
    assert(StreamingTrend.halfUpDiv(BigInt(-12), BigInt(18)) === -1L) // away
    assert(StreamingTrend.halfUpDiv(BigInt(2), BigInt(6)) === 0L)
  }
}
