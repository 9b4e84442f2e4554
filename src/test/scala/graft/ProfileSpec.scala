package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("numericProfile: exact stats, null handling, long form") {
    val df = Seq(
      (Some(1.0), 10L, "x"),
      (Some(3.0), 20L, "y"),
      (None, 30L, "z")).toDF("a", "b", "s")
    val out = Profile.numericProfile(df)
      .as[(String, String, Double)].collect().toSeq
    // string column excluded; 2 numeric cols × 4 metrics, sorted
    assert(out.map(t => (t._1, t._2)) === Seq(
      ("a", "max"), ("a", "mean"), ("a", "min"), ("a", "null_count"),
      ("b", "max"), ("b", "mean"), ("b", "min"), ("b", "null_count")))
    val m = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("a", "min")) === 1.0 && m(("a", "max")) === 3.0)
    assert(m(("a", "null_count")) === 1.0)
    assert(m(("a", "mean")) === 2.0) // avg ignores the null
    assert(m(("b", "null_count")) === 0.0 && m(("b", "mean")) === 20.0)
  }

  test("numericProfile is one aggregation pass (single scan, no shuffle of data)") {
    val df = (1L to 100L).map(i => (i, i * 2.0)).toDF("x", "y")
    val plan = Profile.numericProfile(df)
      .queryExecution.executedPlan.toString
    // 8 aggregates, ONE scan: the naive per-column loop would show one
    // aggregate subtree per column
    assert("LocalTableScan|Scan ".r.findAllIn(plan).size <= 2,
      s"profile must not scan per column:\n$plan")
  }

  test("rejects frames with no numeric columns") {
    assertThrows[IllegalArgumentException] {
      Profile.numericProfile(Seq(("a", "b")).toDF("s1", "s2"))
    }
  }

  test("approx equi-depth buckets stay close to the exact deciles at sf0.01") {
    // the t-digest twin must put ~10% of rows in each bucket — bound the
    // worst bucket's deviation at 2% of the table (t-digest accuracy
    // 10000 is far tighter; the bound just catches gross regressions).
    // Built inline: the registered equi_depth_hist_approx query now emits
    // the rank-fraction witness (oracled as the constant decile grid), so
    // the histogram form lives here.
    val exact = SparkEntry.queries("equi_depth_hist")(
        spark, "/root/testdata/sf0.01")
      .select("bucket", "n_orders").as[(Long, Long)].collect().toMap
    val orders = graft.sources.Tables.table(spark,
      "/root/testdata/sf0.01", "orders")
    val bounds = orders.agg(approx_percentile(col("o_totalprice"),
      array((1 to 9).map(i => lit(i / 10.0)): _*), lit(10000)).as("bs"))
    val approx = orders.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        aggregate(col("bs"), lit(1L), (acc, b) =>
          acc + when(col("o_totalprice") > b, 1L).otherwise(0L)))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_orders"))
      .as[(Long, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    val total = exact.values.sum
    approx.foreach { case (b, n) =>
      assert(math.abs(n - exact(b)).toDouble / total <= 0.02,
        s"bucket $b: approx $n vs exact ${exact(b)}")
    }
    assert(approx.values.sum === total) // buckets partition the table
  }

  test("equi-depth sketch witness lands exactly on the decile grid") {
    val out = SparkEntry.queries("equi_depth_hist_approx")(
        spark, "/root/testdata/sf0.01")
      .as[(Long, Double)].collect()
    assert(out.toSeq === (1 to 9).map(i => (i.toLong, i / 10.0)))
  }

  test("k-anonymity census flags at-risk rows when groups are small") {
    // sf0.001: 150 customers over ~125 quasi-identifier combos → most
    // groups are below k=5 (the sf0.01 oracle run exercises the clean
    // path where n_rows_at_risk = 0)
    val out = SparkEntry.queries("k_anonymity_report")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long)].collect().head
    val (nGroups, nSmall, atRisk, minSize, k) = out
    assert(k === 5L && nGroups > 0L)
    assert(nSmall > 0L, "tiny SF must have sub-k groups")
    assert(atRisk > 0L && atRisk < 150L)
    assert(minSize >= 1L && minSize < 5L)
  }
}
