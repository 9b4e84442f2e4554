package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton code interleaves bits (known values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
    val out = df.select(ZOrder.zorderCode2($"a", $"b", 4).as("z"))
      .as[Long].collect()
    // z(a,b): a bits at even positions, b bits at odd.
    // z(3,5) = a=0011 -> 0b00000101, b=0101 -> 0b00100010 shifted odd:
    //   a: 1*1 + 1*4 = 5; b: 1*2 + 1*32 = 34; total 39
    assert(out.toSeq === Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("z-order curve bounds BOTH dims per range-chunk; 1-D sort does not") {
    // 32x32 grid of points; cut the sorted order into 16 equal chunks and
    // measure each chunk's span in dim B. Z-order keeps both dims locally
    // bounded; sorting by A alone leaves B spanning the full range in
    // every chunk.
    val grid = for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong)
    val df = grid.toDF("a", "b")
    def avgChunkSpanB(sortCol: org.apache.spark.sql.Column): Double = {
      val chunked = df.orderBy(sortCol)
        .withColumn("rn", monotonically_increasing_id())
        .withColumn("chunk", (col("rn") / 64).cast("long")) // 1024/16
      val spans = chunked.groupBy("chunk")
        .agg((max("b") - min("b")).as("span"))
        .select(avg("span")).as[Double].head()
      spans
    }
    val zSpan = avgChunkSpanB(ZOrder.zorderCode2($"a", $"b", 5))
    val aSpan = avgChunkSpanB($"a")
    // sort-by-A chunks: every chunk spans b fully (31); z-order chunks
    // stay locally bounded (8x8 quadrants -> span ~7).
    assert(aSpan >= 30.0, s"1-D sort should not bound b: $aSpan")
    assert(zSpan <= 8.0, s"z-order should bound b per chunk: $zSpan")
  }

  test("clusterByZOrder writes files whose min/max bound both dims") {
    val grid = for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.clusterByZOrder(grid.toDF("a", "b"), $"a", $"b", bits = 5,
        numPartitions = 16)
      .write.mode("overwrite").parquet(dir)
    // per-file spans via input_file_name: every file bounds both dims to
    // a fraction of the 0..31 range
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .select(avg("sa"), avg("sb")).as[(Double, Double)].head()
    assert(spans._1 <= 12.0, s"dim a not bounded per file: $spans")
    assert(spans._2 <= 12.0, s"dim b not bounded per file: $spans")
  }
}
