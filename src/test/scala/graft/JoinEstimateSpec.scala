package graft

import org.apache.spark.sql.functions._

import graft.functions.JoinSizeSketch

/** AGMS join-size estimation accuracy: deterministic (seeded hash
  * family, fixed data), so the bounds are exact assertions, not flaky
  * statistics. */
class JoinEstimateSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame,
                     key: String): Seq[Long] =
    df.agg(JoinSizeSketch.agmsSketch(col(key), 256).as("s"))
      .as[Seq[Long]].head()

  test("estimates a heavy-overlap join within 50%") {
    // A: keys 1..100 ×100 rows; B: same keys ×10 rows → join = 100k
    val a = (0L until 10000L).map(i => i % 100 + 1).toDF("k")
    val b = (0L until 1000L).map(i => i % 100 + 1).toDF("k")
    val est = JoinSizeSketch.estimate(sketch(a, "k"), sketch(b, "k"))
    val truth = 100L * 100 * 10
    assert(est > truth / 2 && est < truth * 2,
      s"estimate $est vs true $truth")
  }

  test("self-join (F2) estimate lands within 35%") {
    val a = (0L until 1000L).map(i => i % 15).toDF("k")
    // 15 keys × ~67 rows → F2 ≈ Σf² = 10×67² + 5×66² (1000 = 15·66+10)
    val truth = 10L * 67 * 67 + 5L * 66 * 66
    val s = sketch(a, "k")
    val est = JoinSizeSketch.estimate(s, s)
    assert(math.abs(est - truth).toDouble / truth <= 0.35,
      s"self-join estimate $est vs true $truth")
  }

  test("disjoint keys estimate near zero; mergeable across partitions") {
    val a = (1L to 1000L).map(_ % 50).toDF("k")
    val b = (1L to 1000L).map(i => 10000L + i % 50).toDF("k")
    val est = JoinSizeSketch.estimate(sketch(a, "k"), sketch(b, "k"))
    assert(est < 2000L, s"disjoint estimate should be noise-level: $est")
    // partitioning independence: the sketch is a sum, so layout is moot
    assert(sketch(a.repartition(13), "k") === sketch(a, "k"))
  }

  test("registered query emits a sane estimate") {
    val row = SparkEntry.queries("join_size_estimate")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Boolean, String)].head()
    val (rowsA, rowsB, exact, withinBand, strategy) = row
    assert(rowsA === 1000L && rowsB === 150L)
    // every event user exists in customer → true join size = 1000
    assert(exact === 1000L)
    // the witness's own contract: the AGMS estimate landed within 2×
    assert(withinBand, "AGMS estimate left the 2x band")
    // the emitted strategy must agree with EstimatedJoin's rule
    // (customer is the smaller side; band ⇒ est ≤ 2·exact ≤ 4·rows_a)
    assert(strategy === "broadcast_right", s"strategy $strategy")
  }
}
