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
    assertThrows[IllegalArgumentException] {
      Attribution.multiTouchReport(
        ev((1L, "2024-01-01 10:00:00", "view", 0.0, 1L)),
        "user_id", "ts", "event_type", "purchase", "value", "event_id",
        model = "last")
    }
  }

  // -------------------------------------------------------- multi-touch ---

  private val journeyEvents = ev(
    // user 1, journey 1: three touches then a 60.0 purchase
    (1L, "2024-01-01 10:00:00", "view", 0.0, 1L),
    (1L, "2024-01-01 10:01:00", "click", 0.0, 2L),
    (1L, "2024-01-01 10:02:00", "view", 0.0, 3L),
    (1L, "2024-01-01 10:03:00", "purchase", 60.0, 4L),
    // user 1, journey 2: one touch then a 10.0 purchase, then a trailing
    // touch that must credit NOTHING (no following conversion)
    (1L, "2024-01-01 11:00:00", "click", 0.0, 5L),
    (1L, "2024-01-01 11:01:00", "purchase", 10.0, 6L),
    (1L, "2024-01-01 11:02:00", "view", 0.0, 7L),
    // user 2: organic purchase (no touches at all)
    (2L, "2024-01-01 12:00:00", "purchase", 5.0, 8L),
    // user 3: two touches then a 20.0 purchase (the n=2 position split)
    (3L, "2024-01-01 13:00:00", "view", 0.0, 9L),
    (3L, "2024-01-01 13:01:00", "click", 0.0, 10L),
    (3L, "2024-01-01 13:02:00", "purchase", 20.0, 11L))

  test("multi-touch credits: journey scoping, fractions, organic") {
    val rows = Attribution.multiTouchCredits(journeyEvents, "user_id", "ts",
        "event_type", "purchase", "value", "event_id")
      .orderBy($"user_id", $"journey", $"touch_pos")
      .as[(Long, Long, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // rows: user, journey, channel, pos, n, lin_micros, pos_micros,
    //       lin_cents, pos_cents
    // 3-touch journey: linear thirds, position 40/20/40
    val j1 = rows.filter(r => r._1 == 1L && r._2 == 1L)
    assert(j1.map(_._3) === Seq("view", "click", "view"))
    assert(j1.map(_._6) === Seq(333333L, 333333L, 333333L))
    assert(j1.map(_._7) === Seq(400000L, 200000L, 400000L))
    assert(j1.map(_._8) === Seq(2000L, 2000L, 2000L))    // 60 / 3 in cents
    assert(j1.map(_._9) === Seq(2400L, 1200L, 2400L))    // 40/20/40 of 60
    // fractions sum to 1 per conversion (within per-row rounding)
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, g) =>
      assert(math.abs(g.map(_._6).sum - 1000000L) <= g.size)
      assert(math.abs(g.map(_._7).sum - 1000000L) <= g.size)
    }
    // single-touch journey: full credit; trailing view dropped
    val j2 = rows.filter(r => r._1 == 1L && r._2 == 2L)
    assert(j2 === Seq((1L, 2L, "click", 1L, 1L, 1000000L, 1000000L,
      1000L, 1000L)))
    // organic purchase keeps its own value
    val org = rows.filter(_._1 == 2L)
    assert(org.map(_._3) === Seq("organic"))
    assert(org.head._6 === 1000000L && org.head._8 === 500L)
    // n=2 position model: 50/50, not 40/40
    val u3 = rows.filter(_._1 == 3L)
    assert(u3.map(_._7) === Seq(500000L, 500000L))
  }

  test("multi-touch report rolls credits up per channel (exact sums)") {
    val lin = Attribution.multiTouchReport(journeyEvents, "user_id", "ts",
        "event_type", "purchase", "value", "event_id", model = "linear")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // click: 1/3 of 60 + 1 of 10 + 1/2 of 20 = 20 + 10 + 10 = 40
    assert(lin("click") === ((1.833333, 40.0)))
    // view: 2/3 of 60 + 1/2 of 20 = 40 + 10 = 50
    assert(lin("view")._2 === 50.0)
    assert(lin("organic") === ((1.0, 5.0)))
    val pos = Attribution.multiTouchReport(journeyEvents, "user_id", "ts",
        "event_type", "purchase", "value", "event_id", model = "position")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // click: 0.2 of 60 + 1 of 10 + 0.5 of 20 = 12 + 10 + 10 = 32
    assert(pos("click") === ((1.7, 32.0)))
    // view: 0.8 of 60 + 0.5 of 20 = 48 + 10 = 58
    assert(pos("view")._2 === 58.0)
  }

  test("time-decay credits: halving per whole half-life, floor, organic") {
    val events = ev(
      // touches at 2h, 1h, 0s before the purchase; half-life 1h →
      // weights 250000 : 500000 : 1000000 (1:2:4)
      (1L, "2024-01-01 08:00:00", "view", 0.0, 1L),
      (1L, "2024-01-01 09:00:00", "click", 0.0, 2L),
      (1L, "2024-01-01 10:00:00", "view", 0.0, 3L),
      (1L, "2024-01-01 10:00:00", "purchase", 70.0, 4L),
      // user 2: all touches ≥ 30 half-lives stale → every weight floors
      // at 1 → equal split, no 0/0
      (2L, "2024-01-01 00:00:00", "view", 0.0, 5L),
      (2L, "2024-01-01 00:30:00", "click", 0.0, 6L),
      (2L, "2024-01-03 00:00:00", "purchase", 10.0, 7L),
      // user 3: organic
      (3L, "2024-01-01 12:00:00", "purchase", 5.0, 8L))
    val rows = Attribution.timeDecayCredits(events, "user_id", "ts",
        "event_type", "purchase", "value", "event_id", halfLifeSec = 3600L)
      .orderBy($"user_id", $"touch_pos")
      .select("user_id", "channel", "weight_micros", "decay_frac_micros",
        "decay_value_cents")
      .as[(Long, String, Option[Long], Long, Long)].collect().toSeq
    val u1 = rows.filter(_._1 == 1L)
    assert(u1.map(_._3) === Seq(Some(250000L), Some(500000L), Some(1000000L)))
    // fractions 1/7, 2/7, 4/7 of the 70.0 purchase → 10, 20, 40
    assert(u1.map(_._5) === Seq(1000L, 2000L, 4000L))
    assert(u1.map(_._4).sum === 1000000L) // 142857+285714+571429
    val u2 = rows.filter(_._1 == 2L)
    assert(u2.map(_._3) === Seq(Some(1L), Some(1L))) // floored, not 0/0
    assert(u2.map(_._4) === Seq(500000L, 500000L))
    val u3 = rows.filter(_._1 == 3L)
    assert(u3 === Seq((3L, "organic", None, 1000000L, 500L)))
  }

  test("multi-touch credits plan: ONE user-keyed exchange for both windows") {
    val p = Attribution.multiTouchCredits(journeyEvents, "user_id", "ts",
        "event_type", "purchase", "value", "event_id")
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    // the journey window keys on (user, journey) — a superset of the
    // user partitioning — so it must reuse the first window's exchange
    val userExchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userExchanges === 1, s"journey window re-shuffled:\n$p")
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

  test("approx (t-digest) census stays close to the exact one at sf0.01") {
    // the 100 TB path: approx_percentile medians must not drift the
    // census materially — bound median/MAD relative error at 1% and the
    // outlier counts at 5% of group size on real driver data
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val exact = Robust.madOutlierCensus(orders, "o_orderpriority",
        "o_totalprice")
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val approx = Robust.madOutlierCensus(orders, "o_orderpriority",
        "o_totalprice", exact = false)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(approx.length === exact.size)
    approx.foreach { case (g, n, med, mad, out) =>
      val (_, nE, medE, madE, outE) = exact(g)
      assert(n === nE)
      assert(math.abs(med - medE) / medE <= 0.01, s"$g median $med vs $medE")
      assert(math.abs(mad - madE) / madE <= 0.01, s"$g MAD $mad vs $madE")
      assert(math.abs(out - outE).toDouble / n <= 0.05,
        s"$g outliers $out vs $outE of $n")
    }
  }
}
