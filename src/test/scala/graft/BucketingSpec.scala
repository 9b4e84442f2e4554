package graft



import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY.md §4 "Shuffle/partitioning"):
  * writing both sides bucketed by the join key lets Spark join WITHOUT a
  * shuffle exchange — the 100 TB pattern for repeated fact⋈fact joins on a
  * stable key. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an Exchange") {
    // tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    // static conf and cannot be redirected on a live session
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")

    val orders = (1L to 500L).map(i => (i, s"o$i")).toDF("okey", "otag")
    val items = (1L to 2000L).map(i => (i % 500 + 1, i * 1.0)).toDF("okey", "price")
    orders.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_orders")
    items.write.bucketBy(8, "okey").saveAsTable("b_items")

    val joined = spark.table("b_items")
      .join(spark.table("b_orders"), "okey")
      .groupBy($"okey").agg(sum($"price").as("total"))
    // disable broadcast so a shuffle join WOULD appear if bucketing failed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // the join itself must not introduce a shuffle on either side: the
      // only allowed Exchange is the post-join aggregation... and since we
      // aggregate on the bucket key, there must be NO exchange at all.
      assert(!plan.contains("Exchange"),
        s"unexpected shuffle in bucketed join plan:\n$plan")
      assert(joined.count() === 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
