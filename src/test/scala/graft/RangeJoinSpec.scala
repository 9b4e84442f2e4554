package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches the theta-join answer exactly") {
    val points = (0L to 100L).map(i => (i, i.toDouble)).toDF("pid", "p")
    val intervals = Seq(
      (1L, 0.0, 10.0),   // [0,10) -> 0..9
      (2L, 5.0, 7.0),    // overlaps interval 1
      (3L, 95.0, 200.0), // extends past the points domain
      (4L, 40.0, 40.0),  // empty (hi == lo)
      (5L, 60.0, 50.0)   // inverted (hi < lo) — must yield nothing
    ).toDF("iid", "lo", "hi")

    for (width <- Seq(1L, 3L, 10L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", width)
        .select($"iid", $"pid").as[(Long, Long)].collect().toSet
      val want = points.crossJoin(intervals)
        .where($"lo" <= $"p" && $"p" < $"hi")
        .select($"iid", $"pid").as[(Long, Long)].collect().toSet
      assert(got === want, s"width=$width")
      // 10 points in [0,10), 2 in [5,7), 6 in [95,200), none in the
      // empty/inverted intervals.
      assert(got.count(_._1 == 1L) === 10)
      assert(got.count(_._1 == 2L) === 2)
      assert(got.count(_._1 == 3L) === 6)
      assert(!got.exists(p => p._1 == 4L || p._1 == 5L))
    }
  }

  test("each matching pair appears exactly once (no bucket double-count)") {
    val points = Seq((1L, 14.0)).toDF("pid", "p")
    // interval spans many buckets at width=5; the point must match once.
    val intervals = Seq((1L, 0.0, 100.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 5L)
    assert(got.count() === 1L)
  }

  test("fractional interval bounds don't drop upper-bucket matches") {
    // lo=9.5, hi=10.2, W=10: the point 10.1 lives in bucket 1, which
    // floor((hi-1)/W) = 0 would never explode to — the true match
    // 9.5 <= 10.1 < 10.2 must survive.
    val points = Seq((1L, 10.1), (2L, 10.3), (3L, 9.4)).toDF("pid", "p")
    val intervals = Seq((1L, 9.5, 10.2)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 10L)
      .select($"pid").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("sub-second timestamps compare exactly (no whole-second truncation)") {
    // 12:00:00.7 is BEFORE a window starting 12:00:00.9 — second-truncated
    // comparison would wrongly match both; .95 is inside.
    val points = Seq((1L, "2024-01-01 12:00:00.700"),
      (2L, "2024-01-01 12:00:00.950"))
      .toDF("pid", "ts").withColumn("ts", to_timestamp($"ts"))
    val windows = Seq(("w1", "2024-01-01 12:00:00.900", "2024-01-01 12:00:01.100"))
      .toDF("wid", "ws", "we")
      .withColumn("ws", to_timestamp($"ws"))
      .withColumn("we", to_timestamp($"we"))
    val got = RangeJoin.pointInTimeWindow(points, "ts", windows, "ws", "we")
      .select($"pid").as[Long].collect().toSet
    assert(got === Set(2L))
  }

  test("pointInTimeWindow joins timestamps into [start, end) windows") {
    val points = Seq(
      (1L, "2024-01-01 00:00:00"),
      (2L, "2024-01-03 23:59:59"),
      (3L, "2024-01-04 00:00:00"), // == end, exclusive -> out
      (4L, "2023-12-31 23:59:59")  // < start -> out
    ).toDF("pid", "ts").withColumn("ts", to_timestamp($"ts"))
    val windows = Seq(("w1", "2024-01-01 00:00:00", "2024-01-04 00:00:00"))
      .toDF("wid", "ws", "we")
      .withColumn("ws", to_timestamp($"ws"))
      .withColumn("we", to_timestamp($"we"))
    val got = RangeJoin.pointInTimeWindow(points, "ts", windows, "ws", "we")
      .select($"pid").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }

  test("interval side explodes to ceil(len/width)+1 buckets at most") {
    // Plan-shape guard: the generate fan-out is bounded by the interval
    // length over the bucket width, not by the points side (floor(hi/W)
    // upper bucket, mirroring pointInInterval).
    val intervals = Seq((1L, 0.0, 100.0)).toDF("iid", "lo", "hi")
    val exploded = intervals
      .withColumn("b", explode(sequence(floor($"lo" / 10).cast("long"),
        floor($"hi" / 10).cast("long"))))
    assert(exploded.count() === 11L)
  }
}
