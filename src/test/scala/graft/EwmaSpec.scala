package graft

import java.sql.Timestamp

import graft.operators.Ewma

/** Per-entity EWMA fold (operators/Ewma) — the exact integer-micro
  * recurrence: x̃ = round(x·10⁶); s₁ = x̃₁; sᵢ = floor((sᵢ₋₁(m−1)+x̃ᵢ)/m). */
class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("alpha=1/2: hand-computed integer-micro fold") {
    val e = Seq(
      (1L, ts(10), 1L, 10.0),
      (1L, ts(20), 2L, 20.0), // (10M + 20M) / 2 = 15M
      (1L, ts(30), 3L, 1.0)   // floor((15M + 1M) / 2) = 8M
    ).toDF("user_id", "ts", "event_id", "value")
    val r = Ewma.perEntity(e, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Double)].collect()
    assert(r.toSeq === Seq((1L, 3L, 8.0)))
  }

  test("odd micro sums floor (never round): 1µ ++ 2µ stays 1µ") {
    val e = Seq((1L, ts(1), 1L, 0.000001), (1L, ts(2), 2L, 0.000002))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Ewma.perEntity(e, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Double)].collect()
    assert(r.toSeq === Seq((1L, 2L, 0.000001)))
  }

  test("alpha=1/4 weights the past 3:1") {
    val e = Seq((1L, ts(1), 1L, 8.0), (1L, ts(2), 2L, 4.0))
      .toDF("user_id", "ts", "event_id", "value")
    // floor((8M*3 + 4M) / 4) = 7M
    val r = Ewma.perEntity(e, "user_id", "ts", "event_id", "value",
        alpha = 0.25)
      .as[(Long, Long, Double)].collect()
    assert(r.toSeq === Seq((1L, 2L, 7.0)))
  }

  test("single event: the quantized value itself; users independent") {
    val e = Seq((1L, ts(1), 1L, 3.1415926535), (2L, ts(1), 2L, 2.5))
      .toDF("user_id", "ts", "event_id", "value")
    val byUser = Ewma.perEntity(e, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(byUser(1L) === 3.141593) // round(π·10⁶)/10⁶
    assert(byUser(2L) === 2.5)
  }

  test("sequence order is (ts, id): ties fold in id order") {
    val e = Seq(
      (1L, ts(10), 2L, 100.0), // id 2: SECOND despite row order
      (1L, ts(10), 1L, 0.0)    // id 1: first
    ).toDF("user_id", "ts", "event_id", "value")
    val r = Ewma.perEntity(e, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Double)].collect()
    // fold order 0.0 then 100.0 -> 50.0 (not 0.0 -> would be wrong order)
    assert(r.toSeq === Seq((1L, 2L, 50.0)))
  }

  test("non-power-of-two alpha is rejected") {
    val e = Seq((1L, ts(1), 1L, 1.0)).toDF("user_id", "ts", "event_id",
      "value")
    intercept[IllegalArgumentException] {
      Ewma.perEntity(e, "user_id", "ts", "event_id", "value", alpha = 0.3)
    }
  }

  test("alpha below 2^-16 is rejected (exact-fold overflow bound)") {
    val e = Seq((1L, ts(1), 1L, 1.0)).toDF("user_id", "ts", "event_id",
      "value")
    intercept[IllegalArgumentException] {
      Ewma.perEntity(e, "user_id", "ts", "event_id", "value",
        alpha = math.pow(2.0, -17))
    }
    // the boundary itself is allowed
    Ewma.perEntity(e, "user_id", "ts", "event_id", "value",
      alpha = math.pow(2.0, -16)).collect()
  }
}
