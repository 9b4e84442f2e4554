package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cohort, Funnel}

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // A: full ordered funnel; B: purchase BEFORE view (stage 2 must not
  // count); C: view+click only; D: click with no view (counts nowhere)
  private val events = Seq(
    (1L, "2024-01-01 10:00:00", "view"),
    (1L, "2024-01-01 10:05:00", "click"),
    (1L, "2024-01-01 10:10:00", "purchase"),
    (2L, "2024-01-02 09:00:00", "purchase"),
    (2L, "2024-01-02 10:00:00", "view"),
    (3L, "2024-01-03 08:00:00", "view"),
    (3L, "2024-01-03 08:30:00", "click"),
    (4L, "2024-01-04 12:00:00", "click"))
    .map { case (u, t, e) => (u, ts(t), e) }
    .toDF("user_id", "ts", "event_type")

  test("stages count only strictly-ordered completions") {
    val out = Funnel.conversionFunnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      (0L, "view", 3L, 1.0),       // A, B, C
      (1L, "click", 2L, 0.666667), // A, C (D has no view)
      (2L, "purchase", 1L, 0.5)))  // A only (B's purchase precedes view)
  }

  test("repeat events are idempotent: earliest qualifying ts wins") {
    val rep = Seq(
      (9L, ts("2024-01-01 10:00:00"), "view"),
      (9L, ts("2024-01-01 11:00:00"), "view"),
      (9L, ts("2024-01-01 10:30:00"), "click"),
      (9L, ts("2024-01-01 09:00:00"), "click")) // pre-view click ignored
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.conversionFunnel(rep, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .select("n_users").as[Long].collect().toSeq
    assert(out === Seq(1L, 1L))
  }

  test("funnel plans one exchange for the window + per-user rollup") {
    val p = Funnel.conversionFunnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // the groupBy(user) must reuse the window's hash partitioning: the
    // plan carries exactly ONE user-keyed repartitioning (the global
    // count rollup is single-partition, not user-keyed)
    val userExchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userExchanges === 1, s"per-user rollup re-shuffled:\n$p")
  }
}

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("retention matrix assigns users to first-week cohorts") {
    // 2024-01-01 and 2024-01-08 are Mondays
    val events = Seq(
      (1L, "2024-01-02 10:00:00"), // cohort w0
      (1L, "2024-01-10 10:00:00"), // active w1
      (2L, "2024-01-03 10:00:00"), // cohort w0, never returns
      (3L, "2024-01-09 10:00:00"), // cohort w1
      (3L, "2024-01-09 12:00:00")) // same week, counted once
      .map { case (u, t) => (u, ts(t)) }
      .toDF("user_id", "ts")
    val out = Cohort.weeklyRetention(events, "user_id", "ts")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    val w0 = ts("2024-01-01 00:00:00")
    val w1 = ts("2024-01-08 00:00:00")
    assert(out === Seq(
      (w0, 0L, 2L),  // users 1+2 active in their cohort week
      (w0, 1L, 1L),  // user 1 returns
      (w1, 0L, 1L))) // user 3's cohort
  }

  test("gap weeks stay absent: returning in week 2 does not backfill week 1") {
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")),  // cohort week 2024-01-01
      (1L, ts("2024-01-16 10:00:00")))  // returns in week 2, skips week 1
      .toDF("user_id", "ts")
    val out = Cohort.weeklyRetention(events, "user_id", "ts")
      .select("weeks_since").as[Long].collect().toSeq
    assert(out === Seq(0L, 2L)) // week 1 has no row, not a zero row
  }
}
