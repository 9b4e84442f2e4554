package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.operators.{Attribution, Sessionize}

/** The round-8 incident's operator-level guard: timestamp operators must
  * produce IDENTICAL results whether `ts` arrives as TimestampType or
  * TIMESTAMP_NTZ (the testdata regen can flip the physical encoding, and
  * `unix_micros` rejects NTZ unless the call site casts). Pins the
  * cast-hardened sites in Sessionize and Attribution directly, so a future
  * call site written without the cast fails here with the operator named —
  * not as a silent row drop in the driver's correctness artifact. */
class NtzEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // same instants, one frame per encoding (cast is value-preserving
  // under the suite's forced UTC session timezone)
  private lazy val asTs: DataFrame = Seq(
    (1L, ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
    (1L, ts("2024-01-01 10:10:00"), "view", 2.0, 2L),
    (1L, ts("2024-01-01 11:30:00"), "purchase", 4.0, 3L),
    (2L, ts("2024-01-01 09:00:00"), "click", 8.0, 4L),
    (2L, ts("2024-01-01 09:20:00"), "purchase", 3.0, 5L))
    .toDF("user_id", "ts", "event_type", "value", "event_id")
  private lazy val asNtz: DataFrame =
    asTs.withColumn("ts", col("ts").cast(TimestampNTZType))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("sessionStats is encoding-blind (TS vs NTZ)") {
    assert(asNtz.schema("ts").dataType == TimestampNTZType)
    val a = Sessionize.sessionStats(asTs, "user_id", "ts", "value", 1800)
    val b = Sessionize.sessionStats(asNtz, "user_id", "ts", "value", 1800)
    // session bounds come back in the input frame's own encoding; compare
    // on epoch micros + the non-temporal columns
    def canon(df: DataFrame) = rows(df.select(col("user_id"),
      unix_micros(col("session_start").cast(TimestampType)),
      unix_micros(col("session_end").cast(TimestampType)),
      col("n_events"), col("sum_value")))
    assert(canon(a) === canon(b))
    assert(canon(a).nonEmpty)
  }

  test("hourlyConcurrency is encoding-blind (TS vs NTZ)") {
    def sessions(df: DataFrame) =
      Sessionize.sessionStats(df, "user_id", "ts", "value", 1800)
    val a = Sessionize.hourlyConcurrency(sessions(asTs),
      "session_start", "session_end", buckets = 4)
    val b = Sessionize.hourlyConcurrency(sessions(asNtz),
      "session_start", "session_end", buckets = 4)
    def canon(df: DataFrame) = rows(df.select(
      unix_micros(col("hour_start").cast(TimestampType)),
      col("max_concurrent")))
    assert(canon(a) === canon(b))
    assert(canon(a).nonEmpty)
  }

  test("timeDecayCredits is encoding-blind (TS vs NTZ)") {
    def credits(df: DataFrame) = Attribution.timeDecayCredits(df,
      "user_id", "ts", "event_type", "purchase", "value", "event_id",
      halfLifeSec = 600L)
    val a = credits(asTs).drop("ts").drop("__conv_ts")
    val b = credits(asNtz).drop("ts").drop("__conv_ts")
    val tempFree = a.schema.fields.collect {
      case f if f.dataType != TimestampType
        && f.dataType != TimestampNTZType => f.name }
    assert(rows(a.select(tempFree.map(col).toIndexedSeq: _*))
      === rows(b.select(tempFree.map(col).toIndexedSeq: _*)))
  }
}
