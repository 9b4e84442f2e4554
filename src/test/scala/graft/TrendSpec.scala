package graft

import java.sql.Timestamp

import graft.operators.Trend

/** Per-entity OLS trend (operators/Trend) — exact-decimal sums, half-up
  * integer division to micro resolution. */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def fit(values: Seq[Double]): (Long, Double, Double) =
    Trend.perEntity(values.zipWithIndex.map { case (v, i) =>
        (1L, ts(10L * (i + 1)), i.toLong, v) }
        .toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._2, r._3, r._4)).head

  test("perfect line recovers slope and intercept exactly") {
    assert(fit(Seq(3.0, 5.0, 7.0)) === ((3L, 2.0, 1.0)))
  }

  test("constant series: slope 0, intercept the value") {
    assert(fit(Seq(4.25, 4.25, 4.25, 4.25)) === ((4L, 0.0, 4.25)))
  }

  test("single event: slope 0, intercept the quantized value") {
    assert(fit(Seq(2.7182818281)) === ((1L, 0.0, 2.718282)))
  }

  test("exact .5-micro ratios round half-away in INTEGER space") {
    // values 0, 0, 1µ: num/denom = 3/6 = 0.5µ -> slope 1µ;
    // inum/idenom = -12/18 -> intercept -1µ (half-away from zero)
    assert(fit(Seq(0.0, 0.0, 0.000001)) ===
      ((3L, 0.000001, -0.000001)))
  }

  test("descending series: negative slope, micro-exact") {
    assert(fit(Seq(10.0, 8.0, 6.0, 4.0)) === ((4L, -2.0, 12.0)))
  }

  test("sequence order is (ts, id), not input order") {
    val df = Seq(
      (1L, ts(20), 2L, 5.0), // second point
      (1L, ts(10), 1L, 1.0)  // first point
    ).toDF("user_id", "ts", "event_id", "value")
    val r = Trend.perEntity(df, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Double, Double)].collect().head
    assert(r === ((1L, 2L, 4.0, -3.0))) // rising 1 -> 5, not falling
  }
}
