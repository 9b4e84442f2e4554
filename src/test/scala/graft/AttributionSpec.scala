package graft

import org.apache.spark.sql.functions._

import graft.operators.{Attribution, Robust}

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double, Long)*) =
    rows.toDF("user_id", "ts_s", "event_type", "value", "event_id")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

  test("last vs first touch credit different channels") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 0.0, 1L),
      (1L, "2024-01-01 10:05:00", "click", 0.0, 2L),
      (1L, "2024-01-01 10:10:00", "purchase", 50.0, 3L),
      (2L, "2024-01-01 11:00:00", "purchase", 10.0, 4L)) // no prior touch
    val lastT = Attribution.report(events, "user_id", "ts", "event_type",
      "purchase", "value", "event_id", model = "last")
      .as[(String, Long, Double)].collect()
    assert(lastT.map(_._1).toSet === Set("click", "organic"))
    val firstT = Attribution.report(events, "user_id", "ts", "event_type",
      "purchase", "value", "event_id", model = "first")
      .as[(String, Long, Double)].collect()
    assert(firstT.map(_._1).toSet === Set("view", "organic"))
  }

  test("touch at the conversion's own timestamp needs an earlier tie-break") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "click", 0.0, 1L), // same ts, id before
      (1L, "2024-01-01 10:00:00", "purchase", 5.0, 2L),
      (2L, "2024-01-01 10:00:00", "purchase", 5.0, 3L),
      (2L, "2024-01-01 10:00:00", "click", 0.0, 4L)) // same ts, id after
    val out = Attribution.attributed(events, "user_id", "ts", "event_type",
      "purchase", "event_id")
      .select("user_id", "touch_type")
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some("click")) // sorts before the conversion
    assert(out(2L) === None)          // sorts after: not yet seen
  }

  test("later purchases attribute to the latest intervening touch") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view", 0.0, 1L),
      (1L, "2024-01-01 10:10:00", "purchase", 1.0, 2L),
      (1L, "2024-01-01 10:20:00", "click", 0.0, 3L),
      (1L, "2024-01-01 10:30:00", "purchase", 2.0, 4L))
    val out = Attribution.attributed(events, "user_id", "ts", "event_type",
      "purchase", "event_id")
      .orderBy("event_id")
      .select("touch_type", "first_touch_type")
      .as[(String, String)].collect()
    assert(out.toSeq === Seq(("view", "view"), ("click", "view")))
  }

  test("unknown model is rejected") {
    assertThrows[IllegalArgumentException] {
      Attribution.report(ev((1L, "2024-01-01 10:00:00", "view", 0.0, 1L)),
        "user_id", "ts", "event_type", "purchase", "value", "event_id",
        model = "linear")
    }
  }
}

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("MAD census flags the planted outlier the mean-based z would dilute") {
    // group a: tight cluster around 10 plus one wild value
    val a = Seq(9.0, 10.0, 10.0, 10.0, 11.0, 1000.0).map(("a", _))
    // group b: all identical -> MAD 0 -> no outliers, no div-by-zero
    val b = Seq.fill(5)(("b", 7.0))
    val out = Robust.madOutlierCensus((a ++ b).toDF("g", "v"), "g", "v")
      .as[(String, Long, Double, Double, Long)].collect()
    val ga = out.find(_._1 == "a").get
    assert(ga._2 === 6L)
    assert(ga._3 === 10.0) // median ignores the 1000
    assert(ga._5 === 1L)   // exactly the wild value
    val gb = out.find(_._1 == "b").get
    assert(gb._4 === 0.0 && gb._5 === 0L)
  }

  test("threshold controls sensitivity") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("g", _)).toDF("g", "v")
    val loose = Robust.madOutlierCensus(df, "g", "v", threshold = 50.0)
      .select("n_outliers").as[Long].head()
    val tight = Robust.madOutlierCensus(df, "g", "v", threshold = 1.0)
      .select("n_outliers").as[Long].head()
    assert(loose <= tight)
    assert(tight >= 1L)
  }
}
