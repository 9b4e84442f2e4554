package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Kpis
import graft.sources.Tables

/** Reference-fidelity replay (SURVEY.md §5.2.4): run the hourly-KPI
  * pipeline over the reference's own committed sample data
  * (/root/reference/data — read-only) and check structural invariants
  * against its committed golden output. The genre golden is not replayable
  * (songs.csv is a missing large blob), so only the songs-independent
  * hourly shape is asserted.
  */
class ReferenceReplaySpec extends SparkSpec {
  import spark.implicits._

  private val refData = "/root/reference/data"

  private def available: Boolean =
    new java.io.File(s"$refData/streams/archive/streams1.csv").isFile

  test("hourly KPI replay over reference streams reproduces the golden output") {
    assume(available, "reference sample data not present")
    val schema = StructType.fromDDL(
      "user_id BIGINT, track_id STRING, listen_time TIMESTAMP")
    // The golden output was computed from the committed staged batch (one
    // hourly window's file, per the reference's recency pruning) — replay
    // from data/staging/streaming_data_staged.csv, its actual KPI input.
    val streams = Tables.csv(spark, schema,
      s"$refData/staging/streaming_data_staged.csv")
    val deduped = streams.dropDuplicates(Seq("user_id", "track_id", "listen_time"))
    assert(deduped.count() === 11346)

    // The hourly golden (data/output/hourly_kpis.csv) is songs-independent
    // (unique listeners, mode of track_id, diversity ratio) — replay it
    // EXACTLY, column by column, including the pandas mode tie-break.
    val kpis = Kpis.hourlyKpisHod(deduped, "listen_time", "user_id", "track_id")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getString(3)))

    val golden = scala.io.Source.fromFile(s"$refData/output/hourly_kpis.csv")
      .getLines().drop(1).map { line =>
        val Array(h, ul, top, div) = line.split(",")
        (h.toInt, ul.toLong, div.toDouble, top)
      }.toSeq

    assert(kpis.length === 24 && golden.length === 24)
    kpis.zip(golden).foreach { case ((h, ul, div, top), (gh, gul, gdiv, gtop)) =>
      assert(h === gh)
      assert(ul === gul, s"unique_listeners mismatch at hour $h")
      assert(top === gtop, s"top track mismatch at hour $h")
      // our diversity is rounded to 6 dp for oracle comparability; the
      // golden is full precision -> tolerance is the rounding quantum.
      assert(math.abs(div - gdiv) <= 5e-7, s"diversity mismatch at hour $h")
    }
  }

  test("users metadata replay: D1+D3 cleaning matches reference row count") {
    assume(available, "reference sample data not present")
    val schema = StructType.fromDDL(
      "user_id BIGINT, user_name STRING, user_age INT, user_country STRING, created_at DATE")
    val users = Tables.csv(spark, schema, s"$refData/metadata/users.csv")
    val cleaned = users.na.drop(Seq("user_id")).dropDuplicates()
    assert(cleaned.count() === 50000) // 50,000 users, no dups in sample
  }
}
