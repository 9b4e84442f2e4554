package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{SemanticDedup, Similarity}
import graft.operators.{EstimatedJoin, IncrementalKpis}
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
          Money.revenueExact("l_extendedprice", "l_discount").as("revenue"),
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
          Money.sumMoneyExact("value").as("value_sum"))
        .orderBy(col("event_type"))),

    // Incremental KPI refresh × bucketed layout (the round-10 verdict's
    // composition item): the KPI group key IS the bucket key, so
    //  - prev-state and recompute aggregates are EXCHANGE-FREE (the
    //    bucketed scan already satisfies the groupBy distribution), and
    //  - the affected-group prune becomes BUCKET PRUNING: the delta's
    //    group keys — delta-sized by construction — inline as an IN
    //    literal, and the recompute scan reads only the buckets those
    //    keys hash to (SelectedBucketsCount in the plan; pinned on a
    //    single-group delta in ScaleLayoutSpec). The manual form of
    //    dynamic partition pruning, priced O(delta/buckets) of the
    //    corpus instead of a full scan.
    // Delta scenario: an APPEND-ONLY late batch (every row of parts
    // %97 == 0 arrives after the previous refresh) lifted through
    // IncrementalKpis.appendOnlyDiff — the streaming-ingest case, and
    // deliberately NOT a snapshot re-diff: this testdata's
    // (l_orderkey, l_linenumber) is not unique (4599 distinct over 6000
    // rows at sf0.001), so a row-keyed SnapshotDiff here would
    // cross-match duplicates and flag every group (the spec pins the
    // batch form localizing instead). The oracle is the full per-part
    // recompute the refresh must equal.
    "incremental_kpis_bucketed" -> ((s, dir) => {
      val li = BucketedTable.bucketed(s, dir, "lineitem", "l_partkey", 8)
      val batch = li.where(col("l_partkey") % 97 === 0)
      val prevFacts = li.where(col("l_partkey") % 97 =!= 0)
      // avg at 6 dp via INTEGER floor-division (micros of price units):
      // round() here would sit on engine-specific half-tie behavior
      // (partkey 148 at sf0.01 lands exactly on x.xxxxxx5 — Spark
      // HALF_UP vs DuckDB half-even), while `div` is exact everywhere
      def kpi(f: DataFrame): DataFrame =
        f.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n_lines"),
            sum(round(col("l_extendedprice") * 100).cast("long"))
              .as("sum_cents"))
          .withColumn("avg_price",
            expr("(sum_cents * 10000) div n_lines").cast("double")
              / 1000000.0)
      val prev = kpi(prevFacts)
      val rowDiff = IncrementalKpis.appendOnlyDiff(batch,
        Seq("l_orderkey", "l_linenumber"))
      val affected = IncrementalKpis
        .affectedGroups(rowDiff, Seq("l_partkey"))
      // capped prune: at most 256 keys land as an IN literal (what the
      // bucket pruner consumes — manual dynamic partition pruning); a
      // wider delta falls back to the broadcast semi join, so the plan
      // never inflates with a delta-sized literal (verdict r11 item 1)
      val recomputed = kpi(IncrementalKpis.prunedFacts(li, affected,
        Seq("l_partkey")))
      IncrementalKpis.refresh(prev, recomputed, affected, Seq("l_partkey"))
        .orderBy(col("l_partkey"))
    }),

    // TPC-H Q5 with the customer/supplier join strategies chosen by the
    // AGMS sketch planner (EstimatedJoin.estimatedMultiJoin) instead of
    // hand placement — the round-10 probe measured the hinted form's
    // broadcast→shuffle regime transition as its only >1.2-adjacent
    // exponent; here the transition is PLANNED: below broadcastMaxRows
    // the dims broadcast, beyond it the same query picks merge/bloom
    // from the sketch estimate (ScaleLayoutSpec pins both decisions).
    // The planning pass itself is one aggregate over the l⋈o fact
    // (sketches for both dim keys + heavy hitters in a single scan) and
    // one answer-sized aggregate per dim — at warehouse scale those are
    // stored write-time stats (VersionedStats), not a per-query cost.
    // The same-nation constraint becomes a post-join filter (inner-join
    // equivalent), letting the planner order the two dim joins freely.
    "tpch_q5_planned" -> ((s, dir) => {
      val r = t(s, dir, "region")
        .where(col("r_name") === "ASIA").select(col("r_regionkey"))
      val n = t(s, dir, "nation")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01")
          && col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val fact = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
      val dims = Seq(
        EstimatedJoin.DimSpec("customer",
          t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          "o_custkey", "c_custkey"),
        EstimatedJoin.DimSpec("supplier",
          t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          "l_suppkey", "s_suppkey"))
      val (joined, _) = EstimatedJoin.estimatedMultiJoin(fact, dims,
        broadcastMaxRows = 100000L)
      joined.where(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(Money.revenueExact("l_extendedprice", "l_discount")
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

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
      // Both shared frames are materialized ONCE (eager, executor-local):
      // the verdict frame feeds THREE witness legs (pruned checks,
      // survivor-clean self-join sides) and the brute prunable set TWO
      // (subset probe, exact count) — without the checkpoint each leg
      // re-plans and partially re-executes the pair-generation subtrees.
      // Both frames are verdict/duplicate-count-sized scalars, never
      // vector-carrying.
      val v = SemanticDedup.verdicts(emb, threshold = 0.4)
        .localCheckpoint(true)
      val prunableIds = Similarity.cosineNearDupPairs(emb, 0.4)
        .select(col("vec_b").as("vec_id")).distinct()
        .localCheckpoint(true)
      val e1 = emb.select(col("vec_id"), col("embedding"))
      val e2 = emb.select(col("vec_id").as("keeper_id"),
        col("embedding").as("kv"))
      // the pruned-branch contracts fold into ONE pass over the verdict
      // frame (keeper validity + subset membership + count as columns of
      // the same joined row set): v's pair-generation subtree is the
      // expensive part of this witness, and three separate consumers
      // re-executed it per aggregate (12 s on the refined twin's bench
      // row before the collapse)
      val prunedChecks = v.where(col("pruned"))
        .join(e1, Seq("vec_id")).join(e2, Seq("keeper_id"))
        .join(prunableIds.withColumn("__isp", lit(1)), Seq("vec_id"), "left")
        .select((col("keeper_id") < col("vec_id") &&
          SemanticDedup.roundedCosine(col("embedding"), col("kv")) >= 0.4)
          .as("ok"), col("__isp").isNotNull.as("isp"))
        .agg(coalesce(min(col("ok")), lit(true)).as("pruned_near_keeper"),
          coalesce(min(col("isp")), lit(true)).as("pruned_is_subset"),
          count(lit(1)).as("__np"))
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
      emb.agg(count(lit(1)).as("n_vectors"))
        .crossJoin(broadcast(nPrunable))
        .crossJoin(broadcast(prunedChecks))
        .crossJoin(broadcast(clean))
        .select(col("n_vectors"), col("n_prunable_exact"),
          col("pruned_is_subset"), col("pruned_near_keeper"),
          col("survivors_clean"),
          (col("__np").cast("double") >=
            lit(0.7) * col("n_prunable_exact").cast("double"))
            .as("recall_ge_070"))
    }),

    // The REFINED regime of the same operator (SemanticDedup.verdicts
    // with nlist over the flat cap: capped coarse k-means cells +
    // per-cell OR-amplified LSH refinement — the path a 100 TB corpus
    // takes, where the flat driver fit would be O(n²)). Forced at test
    // scale via targetClusterSize/flatNlistCap; same graduated-witness
    // pattern as `semantic_dedup`, minus survivors_clean (the refined
    // regime's clean guarantee is per-(cell, table, bucket), which the
    // verdict frame deliberately does not expose — recall and subset
    // are the operative contracts):
    //  - n_vectors / n_prunable_exact: real data, hash-matched;
    //  - pruned_near_keeper: every pruned vector's named keeper is a
    //    LOWER id whose re-computed cosine >= τ;
    //  - pruned_is_subset: pruned ⊆ the exact prunable set;
    //  - recall_ge_060: coarse-cell 2-probe + OR-LSH refinement caught
    //    >= 60% of the exactly-prunable set (measured 0.73/0.91/0.79 at
    //    sf0.001/0.01/0.1 with refineTablesFor's 0.8 in-bucket floor,
    //    floored below the cross-scale minimum — the hyperplane-split
    //    miss stacked on the cell-boundary miss is the refined regime's
    //    deliberate trade).
    "semantic_dedup_refined" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // Only the brute prunable set is checkpointed here: unlike
      // semantic_dedup, the refined witness consumes the verdict frame
      // in ONE leg (no survivor-clean self-join), so an eager verdict
      // materialization would add a job with nothing to reuse (measured
      // +0.2 s when tried in r16).
      val v = SemanticDedup.verdicts(emb, threshold = 0.4,
        targetClusterSize = 32, flatNlistCap = 8)
      val prunableIds = Similarity.cosineNearDupPairs(emb, 0.4)
        .select(col("vec_b").as("vec_id")).distinct()
        .localCheckpoint(true)
      val e1 = emb.select(col("vec_id"), col("embedding"))
      val e2 = emb.select(col("vec_id").as("keeper_id"),
        col("embedding").as("kv"))
      // one pass over the verdict frame for all pruned-branch contracts
      // (see semantic_dedup): the refined pair-gen subtree must not
      // re-execute per aggregate
      val prunedChecks = v.where(col("pruned"))
        .join(e1, Seq("vec_id")).join(e2, Seq("keeper_id"))
        .join(prunableIds.withColumn("__isp", lit(1)), Seq("vec_id"), "left")
        .select((col("keeper_id") < col("vec_id") &&
          SemanticDedup.roundedCosine(col("embedding"), col("kv")) >= 0.4)
          .as("ok"), col("__isp").isNotNull.as("isp"))
        .agg(coalesce(min(col("ok")), lit(true)).as("pruned_near_keeper"),
          coalesce(min(col("isp")), lit(true)).as("pruned_is_subset"),
          count(lit(1)).as("__np"))
      val nPrunable = prunableIds
        .agg(count(lit(1)).as("n_prunable_exact"))
      emb.agg(count(lit(1)).as("n_vectors"))
        .crossJoin(broadcast(nPrunable))
        .crossJoin(broadcast(prunedChecks))
        .select(col("n_vectors"), col("n_prunable_exact"),
          col("pruned_is_subset"), col("pruned_near_keeper"),
          (col("__np").cast("double") >=
            lit(0.6) * col("n_prunable_exact").cast("double"))
            .as("recall_ge_060"))
    }))

  val oracle: Map[String, String] = Map(

    "bucketed_join_revenue" ->
      s"""SELECT o_orderpriority,
           ${Money.revenueExactSql("l_extendedprice", "l_discount")} AS revenue,
           count(*) AS n_lines
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "bucket_pruned_orders" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
         WHERE o_orderkey IN (500, 1000) ORDER BY o_orderkey""",

    "partitioned_events_prune" ->
      s"""SELECT event_type, count(*) AS n_events,
           ${Money.sumMoneyExactSql("value")} AS value_sum
         FROM events WHERE event_type IN ('purchase', 'signup')
         GROUP BY event_type ORDER BY event_type""",

    // full per-part recompute — the bucket-pruned incremental refresh
    // must be indistinguishable from it
    "incremental_kpis_bucketed" ->
      """SELECT l_partkey, count(*) AS n_lines,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents,
         (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
           AS BIGINT) * 10000) // count(*) / 1000000.0 AS avg_price
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // identical to tpch_q5_local_supplier: planning must never change
    // the answer
    "tpch_q5_planned" ->
      s"""SELECT n_name,
         ${Money.revenueExactSql("l_extendedprice", "l_discount")} AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",

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
           TRUE AS survivors_clean, TRUE AS recall_ge_070""",

    // Refined-regime twin: same exact side, earned contracts TRUE
    // (no survivors_clean — see the query registration).
    "semantic_dedup_refined" ->
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
           TRUE AS recall_ge_060""")
}
