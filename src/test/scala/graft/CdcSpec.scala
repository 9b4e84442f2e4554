package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff
import graft.sources.{Cdc, JdbcUpsertSink}

/** Incremental CDC load end-to-end: SnapshotDiff classifies the delta,
  * Cdc.cdcApply feeds it into the warehouse (Derby) — the composition
  * that shrinks the reference's full-table re-load to delta size. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftcdc;create=true"
  private val sink = JdbcUpsertSink(url)

  test("cdcApply converges the target to the new snapshot and is idempotent") {
    val ddl =
      """CREATE TABLE dim_cust (
         "id" BIGINT NOT NULL,
         "seg" VARCHAR(64),
         "bal" DOUBLE)"""
    sink.ensureTable(ddl, "dim_cust")

    val oldSnap = Seq(
      (1L, "AUTO", 10.0), (2L, "AUTO", 20.0), (3L, "BIKE", 30.0),
      (4L, "BIKE", 40.0), (5L, "SHIP", 50.0), (6L, "SHIP", 60.0))
      .toDF("id", "seg", "bal")
    val newSnap = Seq(
      (1L, "AUTO", 10.0), (2L, "AUTO", 20.0), // unchanged
      (4L, "BIKE", 40.0),                     // unchanged; 3 removed
      (5L, "SHIP", 55.5),                     // changed
      (6L, "RAIL", 60.0),                     // changed
      (9L, "AUTO", 90.0))                     // added
      .toDF("id", "seg", "bal")

    // seed the target with the old snapshot
    sink.mergeUpsertKeys(oldSnap, "dim_cust", Seq("id"), numPartitions = 2)
    assert(sink.countWhere("dim_cust", "1=1") === 6)

    val diff = SnapshotDiff.diff(oldSnap, newSnap, Seq("id"))
    val res = Cdc.cdcApply(diff, sink, "dim_cust", Seq("id"))
    assert(res.upserted === 3) // added 9, changed 5 + 6
    assert(res.deleted === 1)  // removed 3

    def readBack() = spark.read
      .jdbc(url, "dim_cust", new java.util.Properties)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val want = newSnap.as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(readBack() === want)

    // idempotence: re-applying the SAME diff is a no-op on the target
    // (upserts merge to identical values; removed keys already gone)
    val res2 = Cdc.cdcApply(diff, sink, "dim_cust", Seq("id"))
    assert(res2.deleted === 0)
    assert(readBack() === want)
  }

  test("cdcApply converges for ARBITRARY version pairs (property)") {
    // randomized convergence: whatever the old/new versions are, diff +
    // apply must leave the target exactly equal to the new snapshot, and
    // a second apply must change nothing
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val verGen = Gen.mapOf(Gen.zip(Gen.choose(0L, 15L), Gen.choose(0, 3)))
      .suchThat(_.nonEmpty)
    var case_i = 0
    val prop = Prop.forAll(verGen, verGen) { (oldM, newM) =>
      case_i += 1
      val table = s"dim_prop_$case_i" // fresh target per case
      sink.ensureTable(
        s"""CREATE TABLE $table ("id" BIGINT NOT NULL, "v" INTEGER)""",
        table)
      val oldDf = oldM.toSeq.toDF("id", "v")
      val newDf = newM.toSeq.toDF("id", "v")
      sink.mergeUpsertKeys(oldDf, table, Seq("id"), numPartitions = 1)
      val diff = SnapshotDiff.diff(oldDf, newDf, Seq("id"))
      Cdc.cdcApply(diff, sink, table, Seq("id"), numPartitions = 1)
      def state() = spark.read
        .jdbc(url, table, new java.util.Properties)
        .as[(Long, Int)].collect().sortBy(_._1).toSeq
      val converged = state() == newM.toSeq.sortBy(_._1)
      val res2 = Cdc.cdcApply(diff, sink, table, Seq("id"),
        numPartitions = 1)
      converged && res2.deleted == 0 &&
        state() == newM.toSeq.sortBy(_._1)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("snapshot diff over bucketed snapshots runs shuffle-free") {
    // SnapshotDiff's scaladoc claims bucketing makes the full-outer join
    // co-located at 100 TB; this is the witness. Both snapshot versions
    // are written bucketed on the key. Null-safe key equality would be
    // planned as (coalesce(key, 0), isnull(key)) join keys — expressions
    // bucketing can never satisfy — so the primary-key form
    // (nullSafeKeys = false) is what unlocks the ZERO-Exchange plan.
    spark.sql("DROP TABLE IF EXISTS snap_v1")
    spark.sql("DROP TABLE IF EXISTS snap_v2")
    val v1 = (1L to 400L).map(i => (i, s"seg${i % 5}", i * 1.0))
      .toDF("id", "seg", "bal")
    val v2 = (3L to 402L).map(i =>
        (i, s"seg${i % 5}", if (i % 7 == 0) i * 2.0 else i * 1.0))
      .toDF("id", "seg", "bal")
    v1.write.bucketBy(8, "id").sortBy("id").saveAsTable("snap_v1")
    v2.write.bucketBy(8, "id").sortBy("id").saveAsTable("snap_v2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val diff = SnapshotDiff.diff(
        spark.table("snap_v1"), spark.table("snap_v2"), Seq("id"),
        nullSafeKeys = false)
      val plan = diff.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge full outer join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed snapshot diff must not shuffle:\n$plan")
      // and the classification still holds on the bucketed path
      val byStatus = diff.groupBy($"diff_status").count()
        .as[(String, Long)].collect().toMap
      assert(byStatus("added") === 2)   // 401, 402
      assert(byStatus("removed") === 2) // 1, 2
      assert(byStatus("changed") ===
        (3L to 402L).count(_ % 7 == 0).toLong)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS snap_v1")
      spark.sql("DROP TABLE IF EXISTS snap_v2")
    }
  }
}
