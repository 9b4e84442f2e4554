package graft

import org.apache.spark.sql.functions._

/** The Zipf-skewed fixture behind the plain/salted bench twins
  * (VERDICT r4 item 1): result identity is proven here; the SPEED
  * comparison lives in BENCH_FULL.json, where both twins run on the
  * same skewed input at bench SF. */
class SkewFixtureSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).sorted.toSeq

  test("salted aggregation twin is result-identical to the plain one") {
    assert(run("skew_agg_salted") === run("skew_agg_plain"))
  }

  test("salted join twin is result-identical to the plain one") {
    assert(run("skew_join_salted") === run("skew_join_plain"))
  }

  test("the census flags the planted hot key at ~30% share") {
    // sf0.01 (150 users), where the modulo fold hits its design share of
    // 45/150 + key 7's own 1/150 ≈ 0.31 (at sf0.001 only 15 users exist
    // and the same fold captures ~0.47 — domain, not fixture, effect)
    val top = SparkEntry.queries("skewed_key_report")(
        spark, "/root/testdata/sf0.01")
      .select("skey", "share").collect()
    assert(top.head.getLong(0) === 7L, "hot key must lead the census")
    val share = top.head.getDouble(1)
    assert(share > 0.25 && share < 0.40, s"hot-key share $share")
    // and every other key is orders of magnitude lighter
    assert(top.tail.forall(_.getDouble(1) < 0.01))
  }

  test("the join twins both run sort-merge (broadcast would make skew moot)") {
    Seq("skew_join_plain", "skew_join_salted").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"$q must sort-merge:\n$p")
      assert(!p.contains("BroadcastHashJoin"), s"$q must not broadcast:\n$p")
    }
  }
}
