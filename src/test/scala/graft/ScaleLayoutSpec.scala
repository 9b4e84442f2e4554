package graft

import org.apache.spark.sql.functions._

import graft.ext.{SemanticDedup, Similarity}
import graft.sources.BucketedTable

/** Physical-layout witnesses ([[graft.sources.BucketedTable]]) and
  * SemDeDup semantic dedup ([[graft.ext.SemanticDedup]]): the plan-shape
  * claims the registered queries make (exchange-free co-bucketed join,
  * bucket pruning, partition pruning) pinned mechanically, plus the
  * pruning rule's contracts on a corpus with KNOWN duplicates. */
class ScaleLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- bucketed layout -------------------------------------------------

  test("co-bucketed orders⋈lineitem joins without any Exchange") {
    val o = BucketedTable.bucketed(spark, sf, "orders", "o_orderkey", 8)
    val l = BucketedTable.bucketed(spark, sf, "lineitem", "l_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"), col("l_extendedprice"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join on co-bucketed sides:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      // and the result is the same as joining the source tables directly
      val expected = graft.sources.Tables.table(spark, sf, "lineitem")
        .join(graft.sources.Tables.table(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("bucket-key point lookup prunes to the matching buckets") {
    val q = registry.ScaleQueries.queries("bucket_pruned_orders")(spark, sf)
    val p = q.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(p)
    assert(sel.isDefined, s"no bucket pruning in the scan:\n$p")
    assert(sel.get.group(1).toInt <= 2,
      s"two keys must prune to at most two buckets:\n$p")
    val rows = q.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(500L, 1000L))
  }

  test("bucket-key aggregation needs no exchange either") {
    // the scan's reported hash partitioning satisfies the groupBy's
    // distribution requirement — aggregation collapses in place
    val o = BucketedTable.bucketed(spark, sf, "orders", "o_orderkey", 8)
    val agg = o.groupBy(col("o_orderkey"))
      .agg(sum(col("o_totalprice")).as("t"))
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bucket-key aggregation must not shuffle:\n$p")
  }

  test("a fresh session re-registers an existing layout without rewriting") {
    // force the re-registration path: drop ONLY the catalog entry (the
    // table is external — files stay), then read again
    val before = BucketedTable.bucketed(spark, sf, "orders", "o_orderkey", 8)
      .count()
    val name = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_b_orders_")).collect()
      .map(_.name).head
    spark.sql(s"DROP TABLE $name")
    val again = BucketedTable.bucketed(spark, sf, "orders", "o_orderkey", 8)
    assert(again.count() === before)
    // still a real bucketed table: pruning metadata survived re-register
    val p = again.where(col("o_orderkey") === 500L)
      .queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount: 1 out of 8"),
      s"re-registered table lost its bucketing:\n$p")
  }

  test("partitioned read prunes on the partition filter") {
    val q = registry.ScaleQueries.queries("partitioned_events_prune")(spark, sf)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters:") && p.contains("event_type"),
      s"partition filter did not reach the scan:\n$p")
    // the data filter must NOT appear as a post-scan Filter on rows
    assert("PartitionFilters: \\[[^\\]]*event_type".r
      .findFirstIn(p).isDefined, s"event_type not a partition filter:\n$p")
  }

  // ---- semantic dedup --------------------------------------------------

  /** Corpus with KNOWN duplicates: two orthogonal base directions, 12
    * vectors each (small deterministic wiggle), plus exact copies of
    * vectors 0 and 12 — copies MUST be pruned regardless of how k-means
    * splits the groups. */
  private def corpus() = {
    val dim = 16
    def vec(base: Int, i: Int): Array[Float] = {
      val a = new Array[Float](dim)
      a(base) = 1f
      a((base + 2 + (i % 3)) % dim) = 0.05f * ((i % 5) + 1)
      a
    }
    val rows =
      (0 until 12).map(i => (i.toLong, vec(0, i))) ++
        (12 until 24).map(i => (i.toLong, vec(8, i))) ++
        Seq((24L, vec(0, 0)), (25L, vec(8, 12)))
    rows.toDF("vec_id", "embedding")
  }

  test("exact copies are pruned and keep their original as keeper") {
    val v = SemanticDedup.verdicts(corpus(), threshold = 0.95,
      targetClusterSize = 4).cache()
    val copies = v.where(col("vec_id").isin(24L, 25L)).collect()
    assert(copies.forall(_.getBoolean(2)), "exact copies must be pruned")
    // keeper is a strictly lower id with cosine >= threshold (here 1.0)
    val k24 = v.where(col("vec_id") === 24L).select(col("keeper_id"),
      col("keeper_cos")).head()
    assert(k24.getLong(0) < 24L && k24.getDouble(1) >= 0.95)
  }

  test("verdict contracts: subset of exact prunable, survivors clean") {
    val c = corpus()
    val v = SemanticDedup.verdicts(c, threshold = 0.95,
      targetClusterSize = 4).cache()
    val exactPrunable = Similarity.cosineNearDupPairs(c, 0.95)
      .select(col("vec_b").as("vec_id")).distinct()
    // pruned ⊆ exact prunable
    assert(v.where(col("pruned")).select(col("vec_id"))
      .join(exactPrunable, Seq("vec_id"), "left_anti").count() === 0)
    // survivors have no same-nearest-cluster pair at >= threshold
    val sv = v.where(!col("pruned")).select(col("cluster"), col("vec_id"))
      .join(c, Seq("vec_id"))
    val sa = sv.select(col("cluster"), col("vec_id").as("ia"),
      col("embedding").as("va"))
    val sb = sv.select(col("cluster"), col("vec_id").as("ib"),
      col("embedding").as("vb"))
    val bad = sa.join(sb, Seq("cluster")).where(col("ia") < col("ib"))
      .where(SemanticDedup.roundedCosine(col("va"), col("vb")) >= 0.95)
    assert(bad.count() === 0, "surviving near-dup pair within a cluster")
  }

  test("survivors() equals corpus minus pruned verdicts") {
    val c = corpus()
    val s = SemanticDedup.survivors(c, threshold = 0.95,
      targetClusterSize = 4)
    val v = SemanticDedup.verdicts(c, threshold = 0.95,
      targetClusterSize = 4)
    assert(s.count() === v.where(!col("pruned")).count())
    assert(s.join(v.where(col("pruned")), Seq("vec_id")).count() === 0)
  }

  test("multi-probe assignment emits the nearest list first") {
    val c = corpus()
    val cents = Similarity.ivfFit(c, nlist = 4)
    val withLists = c.select(col("vec_id"),
      SemanticDedup.ivfListIds(col("embedding"), cents, 2).as("ls"),
      Similarity.ivfListId(col("embedding"), cents).as("nearest"))
    assert(withLists.where(element_at(col("ls"), 1) =!= col("nearest"))
      .count() === 0)
    assert(withLists.where(size(col("ls")) =!= 2).count() === 0)
  }
}
