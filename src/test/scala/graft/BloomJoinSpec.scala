package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
  private lazy val urgent = spark.read.parquet(s"$sf/orders.parquet")
    .where(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"), col("o_totalprice"))

  test("pruned inner join returns exactly the plain join's rows") {
    val pruned = BloomJoin.prunedInnerJoin(lineitem, "l_orderkey",
        urgent, "o_orderkey", expectedItems = 10000L)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
    val plain = lineitem.join(urgent,
        lineitem("l_orderkey") === urgent("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
    assert(pruned.count() === plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("prune keeps every true match (no false negatives) and drops most rest") {
    val bloom = BloomJoin.bloomBuild(urgent, col("o_orderkey"), 10000L)
    val pruned = BloomJoin.prune(lineitem, col("l_orderkey"), bloom)
    val trueMatches = lineitem.join(urgent,
      lineitem("l_orderkey") === urgent("o_orderkey"), "left_semi")
    // superset of true matches...
    assert(trueMatches.exceptAll(pruned.select(trueMatches.columns.map(col): _*))
      .isEmpty)
    // ...and a real reduction: urgent is ~1/5 of orders, so the pruned
    // side must be well under half the fact table (fpp 0.03)
    assert(pruned.count() < lineitem.count() / 2)
    assert(pruned.count() >= trueMatches.count())
  }

  test("bloom predicate evaluates inside the big side's scan stage") {
    val bloom = BloomJoin.bloomBuild(urgent, col("o_orderkey"), 10000L)
    val p = BloomJoin.prune(lineitem, col("l_orderkey"), bloom)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("might_contain"), s"bloom filter missing from plan:\n$p")
    assert(p.contains("Subquery"), s"bloom should attach as a subquery:\n$p")
  }

  test("optimalNumBits matches the standard formula's magnitude") {
    // 1M items at 3% fpp needs ~7.3 bits/item
    val bits = BloomJoin.optimalNumBits(1000000L, 0.03)
    assert(bits > 7000000L && bits < 7500000L)
    intercept[IllegalArgumentException](BloomJoin.optimalNumBits(0L, 0.03))
    intercept[IllegalArgumentException](BloomJoin.optimalNumBits(10L, 0.0))
    intercept[IllegalArgumentException](BloomJoin.optimalNumBits(10L, 1.0))
  }

  test("bloom prune ships materially fewer shuffle records than plain") {
    // Wall-time is parity at local SF (in-memory shuffle is free — the
    // revenue_urgent twins in BENCH_FULL show all three forms ~equal);
    // the bloom's claim is exchange VOLUME at network scale, so measure
    // THAT: with a merge join, the pruned fact side must ship roughly
    // the urgent fraction (~1/5) of the plain form's records.
    val sf = "/root/testdata/sf0.001"
    def records(q: org.apache.spark.sql.DataFrame): Long = {
      q.queryExecution.toRdd.count()
      q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
      }.sum
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plain = records(SparkEntry.queries("revenue_urgent_plain")(
        spark, sf))
      val bloom = records(SparkEntry.queries("revenue_urgent_bloom_merge")(
        spark, sf))
      assert(plain > 0 && bloom > 0, s"metrics missing: $plain / $bloom")
      assert(bloom * 2 < plain,
        s"bloom should ship well under half the records: $bloom vs $plain")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
