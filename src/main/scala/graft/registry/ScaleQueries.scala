package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{SemanticDedup, Similarity}
import graft.sources.BucketedTable
import OracleFrag.dotSql

/** Physical-layout witnesses (bucketed / partitioned storage —
  * [[graft.sources.BucketedTable]]) and SemDeDup semantic dedup
  * ([[graft.ext.SemanticDedup]]), registered in the oracle gate.
  *
  * The layout queries read MATERIALIZED layouts (tmpdir artifacts keyed
  * by source dir + layout spec) — their results must be byte-identical
  * to querying the source tables directly, which is exactly what the
  * DuckDB twins check by reading the ORIGINAL parquet. The plan-level
  * claims (no exchange under the bucketed join, bucket pruning on key
  * lookups, PartitionFilters on the partitioned read) are pinned in
  * PlanShapeSpec/BucketingSpec — correctness here, shape there. */
object ScaleQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Fact⋈fact join on co-bucketed sides: orders and lineitem both
    // bucketed by the order key into 8 buckets. At 100 TB this is the
    // join whose shuffle bucketing amortizes to ingest — every
    // subsequent orderkey join is exchange-free (the only shuffle left
    // is the answer-sized priority rollup). Result must equal the plain
    // join over the source tables, which the oracle computes.
    "bucketed_join_revenue" -> ((s, dir) => {
      val o = BucketedTable.bucketed(s, dir, "orders", "o_orderkey", 8)
      val l = BucketedTable.bucketed(s, dir, "lineitem", "l_orderkey", 8)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_orderpriority"))
    }),

    // Point lookup on the bucket key: the scan reads only the buckets
    // the IN-list keys hash to (SelectedBucketsCount in the plan) — the
    // O(1/buckets) no-index lookup path.
    "bucket_pruned_orders" -> ((s, dir) =>
      BucketedTable.bucketed(s, dir, "orders", "o_orderkey", 8)
        .where(col("o_orderkey").isin(500L, 1000L))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // Partition-pruned aggregate: events re-laid-out hive-partitioned on
    // event_type; the two-value filter lists two directories
    // (PartitionFilters), never scanning the other three partitions.
    "partitioned_events_prune" -> ((s, dir) =>
      BucketedTable.partitioned(s, dir, "events", "event_type")
        .where(col("event_type").isin("purchase", "signup"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("value_sum"))
        .orderBy(col("event_type"))),

    // SemDeDup witness (graduated-witness pattern: exact-side data as
    // real oracle columns + contracts the engine-seeded clustering must
    // EARN, re-verified in-plan from the outputs rather than assumed
    // from the construction):
    //  - n_vectors / n_prunable_exact: real data, hash-matched (the
    //    exact prunable set via the brute-force pair generator — also
    //    what DuckDB computes);
    //  - pruned_near_keeper: every pruned vector's named keeper is a
    //    LOWER id whose re-computed cosine >= τ;
    //  - pruned_is_subset: pruned ⊆ the exact prunable set (anti-join
    //    empty);
    //  - survivors_clean: no surviving same-cluster pair at >= τ (the
    //    greedy rule actually converged);
    //  - recall_ge_070: 2-probe cluster-local pruning caught >= 70% of
    //    the exactly-prunable set — the SemDeDup boundary-miss trade,
    //    measured 0.79/1.00/0.83 at sf0.001/0.01/0.1 (single-probe
    //    measured < 0.5, which is why verdicts() probes 2 lists),
    //    floored below the cross-scale minimum.
    // The exact side and the witness re-checks are test-scale-only by
    // nature (the operator a pipeline runs at 100 TB is
    // SemanticDedup.verdicts/survivors — one shuffle, cluster-bounded
    // pair work); brute force stays inside the BruteForceCap guard.
    "semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val v = SemanticDedup.verdicts(emb, threshold = 0.4)
      val prunableIds = Similarity.cosineNearDupPairs(emb, 0.4)
        .select(col("vec_b").as("vec_id")).distinct()
      val pruned = v.where(col("pruned"))
      val e1 = emb.select(col("vec_id"), col("embedding"))
      val e2 = emb.select(col("vec_id").as("keeper_id"),
        col("embedding").as("kv"))
      val nearKeeper = pruned.select(col("vec_id"), col("keeper_id"))
        .join(e1, Seq("vec_id")).join(e2, Seq("keeper_id"))
        .select((col("keeper_id") < col("vec_id") &&
          SemanticDedup.roundedCosine(col("embedding"), col("kv")) >= 0.4)
          .as("ok"))
        .agg(coalesce(min(col("ok")), lit(true)).as("pruned_near_keeper"))
      val subset = pruned.select(col("vec_id"))
        .join(prunableIds, Seq("vec_id"), "left_anti")
        .agg((count(lit(1)) === 0).as("pruned_is_subset"))
      val sv = v.where(!col("pruned")).select(col("cluster"), col("vec_id"))
        .join(e1, Seq("vec_id"))
      val sa = sv.select(col("cluster"), col("vec_id").as("vec_a"),
        col("embedding").as("va"))
      val sb = sv.select(col("cluster"), col("vec_id").as("vec_b"),
        col("embedding").as("vb"))
      val clean = sa.join(sb, Seq("cluster"))
        .where(col("vec_a") < col("vec_b") &&
          SemanticDedup.roundedCosine(col("va"), col("vb")) >= 0.4)
        .agg((count(lit(1)) === 0).as("survivors_clean"))
      val nPrunable = prunableIds
        .agg(count(lit(1)).as("n_prunable_exact"))
      val nPruned = pruned.agg(count(lit(1)).as("__np"))
      emb.agg(count(lit(1)).as("n_vectors"))
        .crossJoin(broadcast(nPrunable))
        .crossJoin(broadcast(nPruned))
        .crossJoin(broadcast(nearKeeper))
        .crossJoin(broadcast(subset))
        .crossJoin(broadcast(clean))
        .select(col("n_vectors"), col("n_prunable_exact"),
          col("pruned_is_subset"), col("pruned_near_keeper"),
          col("survivors_clean"),
          (col("__np").cast("double") >=
            lit(0.7) * col("n_prunable_exact").cast("double"))
            .as("recall_ge_070"))
    }))

  val oracle: Map[String, String] = Map(

    "bucketed_join_revenue" ->
      """SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "bucket_pruned_orders" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
         WHERE o_orderkey IN (500, 1000) ORDER BY o_orderkey""",

    "partitioned_events_prune" ->
      """SELECT event_type, count(*) AS n_events,
           round(sum(value), 2) AS value_sum
         FROM events WHERE event_type IN ('purchase', 'signup')
         GROUP BY event_type ORDER BY event_type""",

    // Exact side real (brute-force prunable set — same pair formula and
    // 6-dp rounding as the Spark baseline); earned contracts TRUE.
    "semantic_dedup" ->
      s"""WITH v AS (SELECT vec_id, embedding AS emb,
             ${dotSql("embedding", "embedding")} AS n2 FROM embeddings),
         p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
             round(CASE WHEN sqrt(a.n2) = 0.0 OR sqrt(b.n2) = 0.0 THEN 0.0
                        ELSE ${dotSql("a.emb", "b.emb")}
                             / (sqrt(a.n2) * sqrt(b.n2)) END, 6) AS cos_sim
           FROM v a JOIN v b ON a.vec_id < b.vec_id),
         pr AS (SELECT DISTINCT vb FROM p WHERE cos_sim >= 0.4)
         SELECT (SELECT count(*) FROM v) AS n_vectors,
           (SELECT count(*) FROM pr) AS n_prunable_exact,
           TRUE AS pruned_is_subset, TRUE AS pruned_near_keeper,
           TRUE AS survivors_clean, TRUE AS recall_ge_070""")
}
