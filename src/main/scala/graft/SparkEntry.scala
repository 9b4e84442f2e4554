package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, SpanDedup, TextAnalysis}
import graft.operators.{Cleaning, Kpis, Validation}
import graft.sources.Tables
import graft.Pipeline

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * extensions) is registered here as a named query over the driver's parquet
  * tables, with an ANSI-SQL twin in [[oracleSql]] for the DuckDB differential
  * check. Determinism rules (SURVEY.md §7.5.1): explicit ORDER BY on both
  * sides, explicit tie-breaks in any top-1/top-k, floats rounded (6 dp for
  * ratios/averages, 2 dp for large sums), UTC everywhere, no wall-clock.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("genre_kpis")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    core ++ ext ++ ext3 ++ skewFixture ++ graft.registry.TpchCanon.queries

  // ---------------------------------------------------------------- core ---

  /** Reference-parity operators (SURVEY.md §2.1-2.8). */
  private val core: Map[String, (SparkSession, String) => DataFrame] = Map(

    // J1+A1+A2 (reference: dags/etl/kpi_processor.py:69-72): fact ⋈ broadcast
    // dim, hash agg on the genre-like key. streams→lineitem, songs→part.
    "genre_kpis" -> ((s, dir) =>
      Kpis.genreKpis(t(s, dir, "lineitem"), t(s, dir, "part"),
        "l_partkey", "p_partkey", "p_type", "l_extendedprice")),

    // Incremental KPI maintenance (reference: dags/etl/load_to_redshift.py
    // :186-203 — the daily idempotent upsert, generalized from per-day
    // slice to per-group slice and delta-sized refresh): a fact delta
    // (simulated: late-arriving orders %13, retracted orders %17, stale
    // prices on suppkey %11) is diffed, only delta-affected p_type groups
    // recompute from the new snapshot (broadcast-semi-pruned), untouched
    // groups carry forward from the previous KPI state without recompute.
    // The oracle is the FULL recompute over the new snapshot — the
    // incremental path must be indistinguishable from it.
    "incremental_kpis" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      // previous run's snapshot: %13 orders not yet arrived, and rows
      // with l_suppkey % 11 == 0 carried a stale price (+5.00)
      val oldFacts = li.where(col("l_orderkey") % 13 =!= 0)
        .withColumn("l_extendedprice",
          when(col("l_suppkey") % 11 === 0, col("l_extendedprice") + 5.0)
            .otherwise(col("l_extendedprice")))
      // current snapshot: %17 orders were retracted
      val newFacts = li.where(col("l_orderkey") % 17 =!= 0)
      // the KPI shape (exact integer cents; avg derived from them so the
      // carried and recomputed legs agree bit-for-bit with any engine)
      def kpi(f: DataFrame): DataFrame =
        f.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_type").as("genre"))
          .agg(count(lit(1)).as("listen_count"),
            sum(round(col("l_extendedprice") * 100).cast("long"))
              .as("sum_cents"))
          .withColumn("avg_price",
            round(col("sum_cents") / 100.0 / col("listen_count"), 6))
      val prev = kpi(oldFacts) // = the latest committed KPI version
      val rowDiff = graft.operators.SnapshotDiff.diff(
        oldFacts, newFacts, Seq("l_orderkey", "l_linenumber"),
        compareCols = Seq("l_partkey", "l_extendedprice"),
        nullSafeKeys = false) // PK join: bucketed layouts stay shuffle-free
      val affected = graft.operators.IncrementalKpis
        .affectedGroups(rowDiff, Seq("l_partkey"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .select(col("p_type").as("genre")).distinct()
      // group-pruned recompute: only parts of affected types reach the
      // join, so untouched groups never aggregate
      val prunedPart = part.join(broadcast(affected),
        part("p_type") === affected("genre"), "left_semi")
      val recomputed = kpi(newFacts.join(
        broadcast(prunedPart.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi"))
      graft.operators.IncrementalKpis
        .refresh(prev, recomputed, affected, Seq("genre"))
        .orderBy(col("genre"))
    }),

    // The hourly twin of incremental_kpis — the reference's per-day
    // delete+insert slice done literally, at hour granularity: the KPI
    // group IS the time bucket, so a fact delta touches only the hours
    // it lands in and every other hour carries forward untouched. The
    // KPI deliberately includes countDistinct(user_id): group recompute
    // refreshes NON-DECOMPOSABLE aggregates exactly (an arithmetic
    // kpi⊕delta maintenance scheme cannot — distinct doesn't subtract).
    "incremental_kpis_hourly" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val oldFacts = ev.where(col("event_id") % 19 =!= 0) // %19 late
        .withColumn("value",
          when(col("user_id") % 13 === 0, col("value") + 1.0)
            .otherwise(col("value"))) // stale values pre-correction
      val newFacts = ev.where(col("event_id") % 23 =!= 0) // %23 retracted
      def kpi(f: DataFrame): DataFrame =
        f.groupBy(date_trunc("hour", col("ts")).as("hour_start"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("unique_users"),
            sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      val prev = kpi(oldFacts)
      val rowDiff = graft.operators.SnapshotDiff.diff(
        oldFacts, newFacts, Seq("event_id"),
        compareCols = Seq("ts", "user_id", "value"), nullSafeKeys = false)
      val affected = graft.operators.IncrementalKpis
        .affectedGroups(rowDiff, Seq("ts"))
        .select(date_trunc("hour", col("ts")).as("hour_start")).distinct()
      val recomputed = kpi(newFacts.join(broadcast(affected),
        date_trunc("hour", newFacts("ts")) === affected("hour_start"),
        "left_semi"))
      graft.operators.IncrementalKpis
        .refresh(prev, recomputed, affected, Seq("hour_start"))
        .orderBy(col("hour_start"))
    }),

    // A3+A4+A5 (reference: dags/etl/kpi_processor.py:88-92): hour-of-day fold,
    // exact distinct, deterministic mode, diversity ratio.
    "hourly_kpis_hod" -> ((s, dir) =>
      Kpis.hourlyKpisHod(t(s, dir, "events"), "ts", "user_id", "event_type")),

    // Calendar-hour variant (SURVEY.md §2.7 "windows" row).
    "hourly_kpis_window" -> ((s, dir) =>
      Kpis.hourlyKpisWindow(t(s, dir, "events"), "ts", "user_id", "value")),

    // J1+J2 chain at scale: fact⋈fact shuffle join + broadcast dims
    // (reference: dags/etl/kpi_processor.py:59 chained merges).
    "revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_quantity") > 10)
      li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
             countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    // Same join tree under an explicit SHUFFLE_MERGE hint — the
    // physical-plan control twin of revenue_by_nation's broadcast()
    // (SURVEY.md §7.3.4): identical results, sort-merge execution, for
    // when the "dim" side is too big to broadcast.
    "revenue_by_nation_merge" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_quantity") > 10)
      li.join(t(s, dir, "orders").hint("SHUFFLE_MERGE"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").hint("SHUFFLE_MERGE"),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation").hint("SHUFFLE_MERGE"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
             countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    // Graph centrality as a curation signal: PageRank over the
    // symmetrized customer↔supplier trade graph (5 fixed iterations,
    // integer micro-units — bit-exact vs the oracle's unrolled CTEs).
    // All rounds compose into ONE job; ReuseExchange collapses the
    // per-round edge/degree subtrees (ext/PageRank scaladoc).
    "supplier_pagerank" -> ((s, dir) => {
      val e0 = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // no distinct after the union: forward edges are (even→odd) and
      // swapped ones (odd→even) — disjoint by the key encoding, and each
      // side is already distinct, so a second dedup is a wasted shuffle
      val edges = e0.union(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      graft.ext.PageRank.pageRank(edges, iterations = 5)
        .where(col("node") % 2 === 1)
        .select(expr("(node - 1) div 2").as("s_suppkey"), col("rank_micro"))
        .orderBy(col("s_suppkey"))
    }),

    // Stats-driven star-join ORDERING in a live query: the part dim is
    // filtered selective (p_size = 1 keeps ~2% of parts) while supplier
    // keeps every fact row, so the greedy planner joins part first and
    // the supplier join probes a ~2%-sized intermediate — the ordering
    // decision comes from AGMS sketches, not hand-placed hints
    // (operators/EstimatedJoin.estimatedMultiJoin; order + strategy
    // assertions live in EstimatedJoinSpec).
    "multi_join_revenue" -> ((s, dir) => {
      import graft.operators.EstimatedJoin
      val (joined, _) = EstimatedJoin.estimatedMultiJoin(
        t(s, dir, "lineitem"), Seq(
          EstimatedJoin.DimSpec("supplier", t(s, dir, "supplier"),
            "l_suppkey", "s_suppkey"),
          EstimatedJoin.DimSpec("part",
            t(s, dir, "part").where(col("p_size") === 1),
            "l_partkey", "p_partkey")))
      joined.groupBy(col("s_nationkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("s_nationkey"))
    }),

    // ISO-week calendar rollup (date_trunc breadth beyond hour/day).
    "weekly_order_revenue" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("week", col("o_orderdate")).as("week_start"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("week_start"))),

    // Left outer join + null-tolerant aggregation (SURVEY.md §2.3 breadth).
    "cust_order_stats" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
             coalesce(round(sum(col("o_totalprice")), 2), lit(0.0)).as("total_spend"))
        .orderBy(col("c_custkey"))),

    // Semi join (EXISTS): customers with at least one large order.
    "semi_join_customers" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").where(col("o_totalprice") > 400000)
                .select(col("o_custkey")),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    // Anti join (NOT EXISTS): customers with no orders at all.
    "anti_join_customers" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select(col("o_custkey")),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // D1-projected: distinct pairs (reference dedup surface, SURVEY §2.5).
    "distinct_user_types" -> ((s, dir) =>
      t(s, dir, "events").select(col("user_id"), col("event_type")).distinct()
        .orderBy(col("user_id"), col("event_type"))),

    // D2-deterministic: one survivor per key, order-independent (unlike
    // pandas positional "first" — reference: extract_stream_data.py:205-206).
    "first_event_per_user" -> ((s, dir) =>
      Cleaning.dedupFirstBy(t(s, dir, "events"), Seq("user_id"), Seq("ts", "event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy(col("user_id"))),

    // D5+D3+D1 pipeline: union-all → null-key drop → full-row dedup → agg
    // (reference: extract_stream_data.py:199-210 ingestion merge).
    "union_dedup_counts" -> ((s, dir) => {
      val e = Cleaning.dropNullKeys(t(s, dir, "events"), Seq("user_id"))
      Cleaning.dedupRows(Cleaning.unionAll(Seq(e, e)))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }),

    // D6 top-k with deterministic tie-break.
    "top_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(100)),

    // §2.6 window functions: ranking + running frame aggregate.
    "window_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_spend"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // §2.6 breadth: lag (inter-order gap in days) + ntile quartiles —
    // the navigation/distribution window families next to
    // window_running_total's ranking/frame families.
    "cust_order_gaps" -> ((s, dir) => {
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(byDate))
            .cast("long").as("days_since_prev"),
          ntile(4).over(byPrice).cast("long").as("price_quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Ordered event-path aggregation: per user, the first 5 events as a
    // "->"-joined path. The standard funnel/journey primitive. BOUND-FIRST
    // shape: a window row_number() <= 5 over (ts, event_id) keeps at most 5
    // rows per user BEFORE the collect_list, so the aggregation buffer
    // never holds a user's full history (a hot user with 10^7 events would
    // OOM the unbounded collect; the window operator spills its partition
    // buffer to disk instead). n_events comes from a whole-partition count
    // window over the same partitioning — same single shuffle.
    "user_event_paths" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
      val ordered = byUser.orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          row_number().over(ordered).as("rn"),
          count(lit(1)).over(byUser).as("n_events"))
        .where(col("rn") <= 5)
        .groupBy(col("user_id"))
        .agg(array_join(transform(
            sort_array(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            e => e.getField("event_type")), "->").as("path"),
          max(col("n_events")).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Statistical aggregates (sample stddev/variance, correlation,
    // covariance) per return flag — the moments family beyond sum/avg.
    "lineitem_stats" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(stddev_samp(col("l_extendedprice")), 4).as("price_stddev"),
          round(var_samp(col("l_quantity")), 4).as("qty_var"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4)
            .as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
            .as("qty_price_covar"))
        .orderBy(col("l_returnflag"))),

    // §2.8 validation rule engine: whole rule-set in ONE aggregation pass.
    "validation_report" -> ((s, dir) => {
      import Validation._
      report(t(s, dir, "events"), Seq(
        rowCount,
        nullCount("user_id"),
        nullCount("value"),
        dupCount(Seq("user_id", "ts")),
        violations("neg_value", col("value") < 0),
        violations("invalid_type",
          !col("event_type").isin("view", "click", "purchase"))))
    }),

    // §2.8 dtype-conformance: declared expected schema vs actual, per
    // column (reference schema_check.py:100-107). `value` is deliberately
    // declared string and `session_id` declared-but-absent so the
    // type_mismatch and missing statuses have live witnesses; `props` is
    // left undeclared.
    "schema_report" -> ((s, dir) =>
      Validation.schemaReport(t(s, dir, "events"), Seq(
        "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
        "event_type" -> "string", "value" -> "string",
        "session_id" -> "string"))),

    // §2.8 distinct-invalid-values: the offending values themselves, not
    // just a count (reference schema_check.py:176-181 reports the invalid
    // genre list). events carries 'signup'/'error' outside the KPI
    // whitelist — real witnesses.
    "invalid_event_types" -> ((s, dir) =>
      Validation.invalidValues(t(s, dir, "events"), "event_type",
        Seq("view", "click", "purchase"))),

    // Multimodal/JSON column extraction (events.props, SURVEY.md §1.2).
    "json_kpis" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("k")).as("sum_k"),
             max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // A3-approx: the 100 TB path for distinct counts (HLL sketch). Sketches
    // are not comparable across engines → no oracle entry (rows-only check).
    "hourly_uniques_approx" -> ((s, dir) =>
      Kpis.hourlyUniquesApprox(t(s, dir, "events"), "ts", "user_id")),

    // §3.1: the whole reference DAG as ONE lazy plan (Pipeline.run); this is
    // the genre-KPI output of the composed extract→validate→KPI pipeline.
    "pipeline_kpis" -> ((s, dir) =>
      Pipeline.run(s, t(s, dir, "events")).genreKpis),

    // As-of join (point-in-time enrichment; SURVEY.md §7.4a): each click
    // paired with the user's latest view at or before it.
    "asof_click_view" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("view_ts"))
        .agg(max(col("value")).as("view_value"))
      graft.operators.AsOf.asOfJoin(clicks, views,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "view_ts",
          rightValCols = Seq("view_ts", "view_value"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // Same as-of semantics through graft's CUSTOM PHYSICAL OPERATOR
    // (plans/AsOfJoinExec via GraftExtensions): sort-merge with O(1)
    // carried state instead of union+window. Same oracle as above.
    "asof_click_view_native" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("view_ts"))
        .agg(max(col("value")).as("view_value"))
      graft.operators.AsOf.asOfJoinNative(clicks, views,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "view_ts",
          rightValCols = Seq("view_ts", "view_value"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // Forward as-of: each click attributed to the NEXT view at-or-after it
    // (the mirror direction; DuckDB ASOF with <= is the oracle).
    "asof_next_view" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("view_ts"))
        .agg(max(col("value")).as("view_value"))
      graft.operators.AsOf.asOfJoinForward(clicks, views,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "view_ts",
          rightValCols = Seq("view_ts", "view_value"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // Nearest as-of: the time-closest view on either side (tie -> the
    // preceding one); oracled by joining DuckDB's backward and forward
    // ASOF results and picking per row by microsecond distance.
    "asof_nearest_view" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("view_ts"))
        .agg(max(col("value")).as("view_value"))
      graft.operators.AsOf.asOfJoinNearest(clicks, views,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "view_ts",
          rightValCols = Seq("view_ts", "view_value"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // Gap sessionization (30 min): lag-mark → running-sum session ids →
    // per-session aggregate; streaming twin uses flatMapGroupsWithState.
    "user_sessions" -> ((s, dir) =>
      graft.operators.Sessionize.sessionStats(
        t(s, dir, "events"), "user_id", "ts", "value", gapSeconds = 1800)),

    // Peak concurrent sessions per hour (Sessionize.hourlyConcurrency):
    // sweep line over the sessionized intervals' endpoints — occupancy,
    // the capacity-planning twin of the per-user session stats.
    "hourly_concurrency" -> ((s, dir) =>
      graft.operators.Sessionize.hourlyConcurrency(
        graft.operators.Sessionize.sessionStats(
          t(s, dir, "events"), "user_id", "ts", "value", gapSeconds = 1800),
        "session_start", "session_end")),

    // Hierarchical aggregation (ROLLUP): subtotals + grand total in one
    // pass — free Catalyst capability beyond the reference's flat groupBy.
    "returns_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("total_price"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // CUBE: all grouping-set combinations in one pass (ROLLUP's sibling).
    "cube_status_priority" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // PIVOT with an explicit value list (explicit = one pass, no extra
    // distinct-values job); absent combinations filled to 0.
    "pivot_priority_status" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy(col("o_orderpriority"))),

    // UNPIVOT (wide → long): the four lineitem measures melted to
    // (metric, value) rows, then the standard per-metric rollup. The
    // inverse surface of PIVOT; generates rows in-place, no shuffle until
    // the aggregate.
    "lineitem_metrics_long" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .unpivot(Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax")),
          "metric", "value")
        .groupBy(col("l_returnflag"), col("metric"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
        .orderBy(col("l_returnflag"), col("metric"))),

    // Arbitrary GROUPING SETS (neither ROLLUP nor CUBE): per-status and
    // per-priority subtotals only, no cross product, one pass; grouping_id
    // disambiguates which set each row came from.
    "grouping_sets_orders" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("graft_orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id() AS BIGINT) AS gid, count(*) AS n
               FROM graft_orders_gs
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
               ORDER BY gid, o_orderstatus NULLS FIRST,
                        o_orderpriority NULLS FIRST""")
    }),

    // Exact percentiles (order statistics with linear interpolation) —
    // one sort-based aggregate per group, unpivoted to long format.
    "price_percentiles" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.95D))")
            .as("qs"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"), col("n"),
          posexplode(col("qs")).as(Seq("q_idx", "q_value")))
        .select(col("o_orderpriority"), col("n"),
          col("q_idx").cast("long").as("q_idx"),
          round(col("q_value"), 4).as("q_value"))
        .orderBy(col("o_orderpriority"), col("q_idx"))),

    // The 100 TB percentile path: t-digest sketch (approx_percentile) —
    // single streaming pass, no per-group sort. Sketches are not
    // cross-engine comparable → rows-only check (accuracy vs the exact
    // query is asserted in OperatorsSpec instead).
    "price_percentiles_approx" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(expr("approx_percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.95D), 10000)")
            .as("qs"))
        .select(col("o_orderpriority"),
          posexplode(col("qs")).as(Seq("q_idx", "q_value")))
        .orderBy(col("o_orderpriority"), col("q_idx"))),

    // Set intersection (INTERSECT DISTINCT): users who both viewed and
    // purchased. Set-op breadth beyond the reference's union-only surface.
    "viewers_and_buyers" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.where(col("event_type") === "view").select(col("user_id"))
        .intersect(ev.where(col("event_type") === "purchase").select(col("user_id")))
        .orderBy(col("user_id"))
    }),

    // Set difference (EXCEPT DISTINCT): users with a high-value purchase
    // but no high-value view (the unfiltered variant is empty on this
    // dense synthetic stream — every user does everything).
    "big_buyers_no_big_view" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.where(col("event_type") === "purchase" && col("value") > 200)
        .select(col("user_id"))
        .except(ev.where(col("event_type") === "view" && col("value") > 200)
          .select(col("user_id")))
        .orderBy(col("user_id"))
    }),

    // Scalar subquery through the SQL surface (spark.sql + temp view):
    // orders above 1.8x the global average price.
    "orders_above_avg" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql("""SELECT o_orderkey, o_totalprice FROM graft_orders
               WHERE o_totalprice > (SELECT 1.8 * avg(o_totalprice) FROM graft_orders)
               ORDER BY o_orderkey""")
    }),

    // SCD type-2 dimension merge (operators/Scd): the customer segment
    // dimension versioned at 1995-01-01, merged with a snapshot where
    // every 10th customer changed segment as of 1996-01-01 — changed keys
    // get a closed-out old version + a new open one, the rest pass
    // through. One full-outer join; version rows emitted via explode (no
    // per-branch join recompute).
    "scd2_customer_dim" -> ((s, dir) => {
      import graft.operators.Scd
      val cust = t(s, dir, "customer")
      val dim = cust.select(col("c_custkey"),
          col("c_mktsegment").as("segment"))
        .withColumn("effective_from", lit("1995-01-01").cast("date"))
        .withColumn("effective_to", lit(null).cast("date"))
      val upd = cust.select(col("c_custkey"),
        when(col("c_custkey") % 10 === 0,
          concat(col("c_mktsegment"), lit("_V2")))
          .otherwise(col("c_mktsegment")).as("segment"))
      Scd.scd2Merge(dim, upd, keys = Seq("c_custkey"),
          attrs = Seq("segment"), asOf = lit("1996-01-01").cast("date"))
        // DATE surfaces as python `object` from Spark parquet but
        // datetime64 from DuckDB — emit timestamps for the comparator.
        .withColumn("effective_from", col("effective_from").cast("timestamp"))
        .withColumn("effective_to", col("effective_to").cast("timestamp"))
        .orderBy(col("c_custkey"), col("effective_from"))
    }),

    // Correlated EXISTS through the SQL surface: Catalyst rewrites it to a
    // left-semi hash join on o_custkey with the price/priority filter
    // pushed below — the declarative twin of semi_join_customers.
    "exists_urgent_cust" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("graft_customer_ex")
      t(s, dir, "orders").createOrReplaceTempView("graft_orders_ex")
      s.sql("""SELECT c_custkey, c_name FROM graft_customer_ex c
               WHERE EXISTS (SELECT 1 FROM graft_orders_ex o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_orderpriority = '1-URGENT'
                               AND o.o_totalprice > 300000)
               ORDER BY c_custkey""")
    }),

    // NOT IN subquery (null-aware anti join): parts never shipped in
    // near-full quantity. l_partkey is non-null so the null-aware check
    // degenerates to a plain anti join — the plan to verify at scale.
    "not_in_bulk_parts" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("graft_part_ni")
      t(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem_ni")
      s.sql("""SELECT p_partkey, p_name FROM graft_part_ni
               WHERE p_partkey NOT IN (SELECT l_partkey FROM graft_lineitem_ni
                                       WHERE l_quantity >= 49)
               ORDER BY p_partkey""")
    }),

    // Bucketized range join (operators/RangeJoin): lineitem ship dates
    // (points) into 7-day order windows (intervals) with NO equi key —
    // day-bucket equi-join + residual instead of a nested-loop theta join.
    "range_join_ship_windows" -> ((s, dir) => {
      val windows = t(s, dir, "orders")
        .where(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("window_key"),
          col("o_orderdate").as("w_start"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("w_end"))
      val points = t(s, dir, "lineitem")
        .select(col("l_shipdate"), col("l_quantity"))
      graft.operators.RangeJoin
        .pointInTimeWindow(points, "l_shipdate", windows, "w_start", "w_end")
        .groupBy(col("window_key"))
        .agg(count(lit(1)).as("n_shipments"),
          round(sum(col("l_quantity")), 2).as("total_qty"))
        .orderBy(col("window_key"))
    })
  )

  // ---------------------------------------------- LLM-pipeline extensions ---

  /** Training-data-pipeline operators over documents/embeddings
    * (SURVEY.md §7.3.7; ext/ package). */
  private val ext: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Corpus rollup: tokenization + one-pass aggregation.
    "text_stats" -> ((s, dir) => TextAnalysis.textStats(t(s, dir, "documents"))),

    // Vocabulary top-k with deterministic tie-break.
    "top_tokens" -> ((s, dir) => TextAnalysis.topTokens(t(s, dir, "documents"), 20)),

    // Language-ID heuristic (marker-word scoring) rolled up vs labels.
    "lang_id_confusion" -> ((s, dir) =>
      TextAnalysis.langIdConfusion(t(s, dir, "documents"))),

    // Per-doc quality scoring (length/stopword/token-shape ratios).
    "quality_scores" -> ((s, dir) =>
      TextAnalysis.qualityScores(t(s, dir, "documents"))),

    // Content fingerprint (md5 of normalized token stream) exact-dedup groups.
    "doc_fingerprints" -> ((s, dir) =>
      TextAnalysis.fingerprintDedup(t(s, dir, "documents"))),

    // Exact 5-gram Jaccard near-dup pairs (correctness baseline).
    "neardup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), k = 5, threshold = 0.8)),

    // MinHash+LSH banding candidates (the linear-ish 100 TB dedup path).
    "neardup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(t(s, dir, "documents"), k = 5, bands = 16)),

    // 64-bit SimHash near-dups (hamming <= 3) via the pigeonhole band
    // trick: bucket on exact 16-bit band collision, verify bit_count(xor).
    "neardup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), maxHamming = 3)),

    // Winnowing (MOSS) rolling-hash fingerprints: >= 10 shared selected
    // k-gram hashes → near-dup pair.
    "neardup_winnowing" -> ((s, dir) =>
      Dedup.winnowingPairs(t(s, dir, "documents"), k = 5, w = 4,
        minShared = 10)),

    // Sub-document duplication (Lee et al. substring dedup, k-gram form):
    // token spans repeated across >= 2 docs, most-shared first.
    "dup_span_report" -> ((s, dir) =>
      SpanDedup.dupSpanReport(t(s, dir, "documents"), k = 5)),

    // Per-doc duplicated-span coverage: fraction of each doc's tokens
    // lying inside a >= 5-token run that also occurs in another doc
    // (interval-union via gaps-and-islands, not position explode).
    "doc_span_dup_ratio" -> ((s, dir) =>
      SpanDedup.spanDupCoverage(t(s, dir, "documents"), k = 5)),

    // The corpus REWRITE the reports inform: every cross-doc duplicated
    // span keeps only its first (min doc_id) occurrence; other docs get
    // the covered token ranges cut. md5 of each rebuilt token stream is
    // compared, so the oracle checks every byte of every rewritten doc.
    "span_cut_docs" -> ((s, dir) =>
      SpanDedup.cutDuplicatedSpans(t(s, dir, "documents"), k = 5)),

    // Near-dup pairs → dedup GROUPS: connected components over the
    // winnowing edge list by iterative min-label propagation (ext/
    // Components); component = smallest doc_id in the cluster, i.e. the
    // survivor under keep-smallest dedup.
    "dedup_components" -> ((s, dir) =>
      graft.ext.Components.connectedComponents(
          Dedup.winnowingPairs(t(s, dir, "documents"), k = 5, w = 4,
            minShared = 10),
          "doc_a", "doc_b")
        .orderBy(col("doc_id"))),

    // The detect→group→drop loop end to end: winnowing pairs → components
    // → keep the min-doc_id survivor per cluster → anti-join rewrite of
    // the corpus. What a training pipeline actually ships: the deduped
    // corpus itself, not the pair/label diagnostics.
    "dedup_survivors" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ext.Components.dedupSurvivors(docs,
          Dedup.winnowingPairs(docs, k = 5, w = 4, minShared = 10))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Exact cosine top-5 for 10 probe vectors (brute-force ANN baseline).
    "knn_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.knnBruteForce(emb, emb.where(col("vec_id") < 10), k = 5)
    }),

    // Embedding-cosine near-dup pairs (brute-force baseline; LSH bucketing
    // is the scale path).
    "neardup_cosine" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), threshold = 0.4)),

    // LSH-bucketed cosine near-dup (the scale path made concrete): compare
    // only within hyperplane buckets — one shuffle, (N/2^P)² pairs/bucket.
    "neardup_cosine_lsh" -> ((s, dir) =>
      Similarity.cosineNearDupPairsLsh(t(s, dir, "embeddings"),
        threshold = 0.4, nPlanes = 4)),

    // LSH-bucketed ANN (sign-bit hyperplane buckets — the scale path).
    "knn_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.knnLsh(emb, emb.where(col("vec_id") < 10), k = 5)
    }),

    // OR-amplified LSH ANN (12 seeded plane tables, union of bucket
    // candidates): the recall fix for knn_lsh — 0.74 recall vs 0.16 at a
    // candidate budget within knn_ivf's nprobe/nlist coverage. The spec
    // (ExtSpec "OR-amplified LSH") pins recall >= 0.6 vs brute force.
    "knn_lsh_or" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.knnLshOr(emb, emb.where(col("vec_id") < 10), k = 5)
    }),

    // Hard-negative mining (ext/Similarity): the contrastive-pairs
    // counterpart to contrastive_negatives — same-LSH-bucket candidates
    // in the [0.05, 0.4) similarity band (informative but below the
    // near-dup cap), top-5 hardest per anchor. Same bucketed plan and
    // seeded-plane determinism as knn_lsh.
    "hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegativesLsh(emb, emb.where(col("vec_id") < 10),
        m = 5, lo = 0.05, hi = 0.4)
    }),

    // IVF-bucketed ANN (k-means inverted lists, nprobe search). Centroids
    // are engine-specific (mllib k-means) → rows-only check, no oracle;
    // recall vs brute force is asserted in the spec instead.
    "knn_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val centroids = Similarity.ivfFit(emb, nlist = 8)
      Similarity.knnIvf(emb, emb.where(col("vec_id") < 10), k = 5,
        centroids, nprobe = 3)
    }),

    // Multimodal plumbing: binary payload + partition-local feature extract.
    "media_feature_stats" -> ((s, dir) =>
      Multimodal.mediaFeatureStats(t(s, dir, "documents"))),

    // REAL image-header decode (PNG IHDR / JPEG SOF / GIF LSD byte
    // layouts) over synthesized spec-valid payloads; the oracle recomputes
    // dimensions from doc_id arithmetic, so the byte parser itself is what
    // is being checked.
    "media_dims_stats" -> ((s, dir) =>
      Multimodal.mediaDimsStats(t(s, dir, "documents"))),

    // Real AUDIO-header decode (functions/AudioDecode): WAV RIFF chunk
    // walk + FLAC STREAMINFO bit fields over synthesized spec-valid
    // headers; oracle recomputes every field from doc_id arithmetic.
    "media_audio_stats" -> ((s, dir) =>
      Multimodal.audioInfoStats(t(s, dir, "documents"))),

    // Custom TypedImperativeAggregate: per-label centroid via vec_sum
    // (single mutable double[dim] buffer per group — no posexplode
    // shuffle). First 8 dims in long format for the oracle.
    "label_centroids" -> ((s, dir) => {
      val agg = t(s, dir, "embeddings")
        .groupBy(col("label"))
        .agg(graft.functions.VectorAggregates.vecSum(col("embedding")).as("vs"),
          count(lit(1)).as("n"))
      agg.select(col("label"), col("n"),
          posexplode(slice(col("vs"), 1, 8)).as(Seq("dim", "s")))
        .select(col("label"), col("dim").cast("long").as("dim"),
          round(col("s") / col("n"), 4).as("centroid"))
        .orderBy(col("label"), col("dim"))
    }),

    // TF-IDF top-3 tokens for the first 20 docs (corpus-wide df).
    "tfidf_top_tokens" -> ((s, dir) =>
      TextAnalysis.tfIdf(t(s, dir, "documents"), topK = 3,
        docFilter = col("doc_id") < 20)),

    // from_json -> MapType extraction on events.props (SURVEY.md §1.2).
    "props_map_stats" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("k",
          element_at(from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING, INT>")), "k"))
        .groupBy(floor(col("k") / 10.0).cast("long").as("k_decile"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("k_decile"))),

    // Deterministic hash-bucket train/val/test split (ext/Sampling): split
    // assignment from row identity, stable across runs/engines/layouts —
    // the property df.sample()/TABLESAMPLE cannot give.
    "doc_splits" -> ((s, dir) =>
      graft.ext.Sampling.deterministicSplit(t(s, dir, "documents"),
          col("doc_id"), Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"))),

    // Token-count budgeting estimates per language (whitespace / BPE-ish
    // pre-tokenizer / chars-per-4) — one pass, no explode.
    "token_estimates" -> ((s, dir) =>
      TextAnalysis.tokenEstimates(t(s, dir, "documents"))),

    // TOKEN-balanced shards: equal token budget per shard (± one doc) via
    // a distributed prefix-sum cut over the md5 order, all integer math —
    // hash sharding balances rows, this balances what training consumes.
    "token_balanced_shards" -> ((s, dir) =>
      graft.sources.TrainingShards.tokenBalancedAssign(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          col("doc_id"), TextAnalysis.tokenCount(col("text")), nShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("weight")).as("sum_tokens"))
        .orderBy(col("shard"))),

    // Eval-set decontamination: (test doc, train doc) pairs sharing >= 5
    // 5-gram shingles across the deterministic 80/10/10 split — one scan,
    // one shuffle (the jaccard bucket-collect shape restricted to
    // cross-split pairs).
    "contamination_report" -> ((s, dir) =>
      Dedup.contaminationPairs(t(s, dir, "documents"), k = 5,
        weights = Seq("train" -> 80, "val" -> 10, "test" -> 10),
        minShared = 5)),

    // Per-doc repetition score: share of the doc taken by its most
    // frequent token (boilerplate/spam signal), argmax folded into the
    // aggregation via min(struct(-count, token)).
    "doc_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionScores(t(s, dir, "documents"))),

    // Z-order (Morton) codes: the multi-dim clustering key behind
    // ZORDER BY layouts, as a pure bit-arithmetic projection (operators/
    // ZOrder; ZOrderSpec proves the both-dims-bounded file property).
    "zorder_codes" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          graft.operators.ZOrder.zorderCode2(
            col("c_custkey") % 32, col("c_nationkey"), bits = 5).as("zcode"))
        .orderBy(col("c_custkey"))),

    // Calendar-spine gap fill: hourly counts of a SPARSE event subset
    // (big purchases) where dead hours appear explicitly with 0 — the
    // alerting/dashboarding shape the data-present-only rollup can't give.
    "hourly_gapfill" -> ((s, dir) =>
      graft.operators.GapFill.hourlyCounts(
        t(s, dir, "events")
          .where(col("event_type") === "purchase" && col("value") > 200),
        "ts")),

    // Blocked fuzzy matching (entity resolution): part names within one
    // edit of each other, blocked on the first name token; rolled up to
    // per-block pair counts (the synthetic catalog's tiny name space makes
    // raw pair lists huge — the rollup is the witness).
    "fuzzy_part_pairs" -> ((s, dir) =>
      graft.ext.Fuzzy.blockedNamePairs(t(s, dir, "part"),
          "p_partkey", "p_name",
          block = split(col("p_name"), " ").getItem(0), maxDist = 1)
        .groupBy(col("block"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(col("edit_dist")), 6).as("avg_dist"))
        .orderBy(col("block"))),

    // Jaro-Winkler-scored twin of fuzzy_part_pairs (ext/Fuzzy +
    // functions/StringSimilarity): transposition-tolerant prefix-boosted
    // similarity, bit-exact with DuckDB's jaro_winkler_similarity so the
    // oracle verifies pair sets AND scores.
    "fuzzy_part_pairs_jw" -> ((s, dir) =>
      graft.ext.Fuzzy.blockedNamePairsJw(t(s, dir, "part"),
          "p_partkey", "p_name",
          block = split(col("p_name"), " ").getItem(0), minSim = 0.9)
        .groupBy(col("block"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(col("jw_sim")), 6).as("avg_sim"))
        .orderBy(col("block"))),

    // Phonetic blocking (the third blocking strategy the Fuzzy scaladoc
    // names): Soundex of the first name token groups sound-alike
    // candidates that first-token equality misses, then Jaro-Winkler
    // scores inside the block. Oracled: DuckDB has no soundex builtin,
    // so the oracle SQL reproduces the algorithm with a list_reduce
    // character fold (Spark's exact mapping table incl. the h/w rule);
    // FuzzySpec pins the homophone behavior.
    "fuzzy_soundex_pairs" -> ((s, dir) =>
      graft.ext.Fuzzy.blockedNamePairsJw(t(s, dir, "part"),
          "p_partkey", "p_name",
          block = soundex(split(col("p_name"), " ").getItem(0)),
          minSim = 0.9)
        .groupBy(col("block"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(col("jw_sim")), 6).as("avg_sim"))
        .orderBy(col("block"))),

    // Heavy hitters WITHOUT a vocabulary-wide shuffle: Misra-Gries sketch
    // (capacity 64) -> top 20. The sketch family (like approx_count_
    // distinct / approx_percentile) is engine-specific -> rows-only check;
    // SketchSpec asserts the retention + error-bound guarantees vs exact.
    "top_tokens_sketch" -> ((s, dir) => {
      import graft.functions.SketchAggregates.freqItems
      t(s, dir, "documents")
        .select(explode_outer(TextAnalysis.tokens(col("text"))).as("token"))
        .where(col("token").isNotNull)
        .agg(freqItems(col("token"), 64).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item").as("token"), col("e.est").as("est_count"))
        .orderBy(col("est_count").desc, col("token"))
        .limit(20)
    }),

    // Source-mixture sampling: per-language keep rates (all of en, half of
    // de, a quarter of zh, 10% elsewhere), counted per lang.
    "mixture_counts" -> ((s, dir) =>
      graft.ext.Sampling.mixtureSample(t(s, dir, "documents"),
          col("doc_id"), col("lang"),
          Seq("en" -> 100, "de" -> 50, "zh" -> 25), defaultPercent = 10)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))),

    // Int8 embedding quantization quality: per-label mean/max
    // reconstruction error of absmax-scaled int8 codes.
    "embedding_quant_error" -> ((s, dir) =>
      Similarity.quantizeInt8(t(s, dir, "embeddings"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          round(avg(col("quant_mae")), 6).as("avg_abs_err"),
          round(max(col("quant_mae")), 6).as("max_abs_err"))
        .orderBy(col("label"))),

    // Context-window packing: 2048-token position-packing bins per lang
    // stream (ordered by doc_id), rolled up to per-bin doc/token counts.
    "context_packing" -> ((s, dir) =>
      graft.ext.Sampling.packByTokenBudget(
          t(s, dir, "documents")
            .select(col("lang"), col("doc_id"),
              TextAnalysis.tokenCount(col("text")).cast("long")
                .as("n_tokens")),
          orderCol = col("doc_id"), tokensCol = col("n_tokens"),
          budget = 2048, partitionCols = Seq(col("lang")))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("window_tokens"))
        .orderBy(col("lang"), col("bin"))),

    // Skew-safe two-phase salted aggregation (SURVEY.md §7.5.6): identical
    // result to a direct groupBy count, straggler-immune shape.
    "salted_hourly_counts" -> ((s, dir) =>
      graft.operators.Skew.saltedCount(
          t(s, dir, "events").withColumn("hour", hour(col("ts"))),
          keys = Seq("hour"), saltFrom = Seq("user_id"), salts = 32)
        .orderBy(col("hour")))
  )

  private lazy val ext3: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bloom-filter runtime join pruning: revenue of lineitems whose order
    // is URGENT — the big side is pre-filtered through a bloom of the
    // filtered orders' keys BEFORE the join shuffle (operators/BloomJoin;
    // no false negatives, so the result is exactly the plain join's).
    "bloom_pruned_revenue" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      graft.operators.BloomJoin.prunedInnerJoin(
          t(s, dir, "lineitem"), "l_orderkey", urgent, "o_orderkey",
          expectedItems = 400000L)
        .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("order_year"))
    }),

    // Measured bloom-on/off twin pair (same oracle as
    // bloom_pruned_revenue): both sides SHUFFLE_MERGE — the regime the
    // bloom prune exists for (a dimension too big to broadcast; under
    // broadcast the join is already a hash filter and the prune is
    // redundant). BENCH_FULL carries the comparison like the skew and
    // top-k pairs.
    "revenue_urgent_plain" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      t(s, dir, "lineitem")
        .join(urgent.hint("SHUFFLE_MERGE"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("order_year"))
    }),

    "revenue_urgent_bloom_merge" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      graft.operators.BloomJoin.prunedInnerJoin(
          t(s, dir, "lineitem"), "l_orderkey",
          urgent.hint("SHUFFLE_MERGE"), "o_orderkey",
          expectedItems = 400000L)
        .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("order_year"))
    }),

    // Pattern redaction (PII-scrub machinery, ext/Redaction): per-language
    // attrition report. The corpus is clean by construction, so the pii
    // counts double as a leak canary; the 'engine_term' pattern exercises
    // the nonzero path on real data.
    "redaction_stats" -> ((s, dir) =>
      graft.ext.Redaction.redactionStats(t(s, dir, "documents"), "text",
        groupCols = Seq("lang"),
        patterns = Seq(
          "email" -> graft.ext.Redaction.piiPatterns.head._2,
          "engine_term" -> "\\b(spark|stream)\\b"))),

    // Overlapping token-window chunking (ext/Chunking): every chunk row
    // with its token count and content hash — 32-token windows, stride 24.
    "doc_chunks" -> ((s, dir) =>
      graft.ext.Chunking.chunkByTokens(t(s, dir, "documents"), "text",
          idCols = Seq("doc_id"), chunkSize = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Gopher/C4-style hard quality rules: per-language per-rule attrition
    // funnel (ext/TextAnalysis.qualityFunnel).
    "quality_funnel" -> ((s, dir) =>
      TextAnalysis.qualityFunnel(t(s, dir, "documents"))),

    // Token-count histogram: docs per 10-token bucket — the length
    // distribution a packing/truncation policy is tuned against.
    "token_histogram" -> ((s, dir) =>
      t(s, dir, "documents")
        .select((floor(TextAnalysis.tokenCount(col("text")) / 10.0) * 10)
          .cast("long").as("bucket_lo"))
        .groupBy(col("bucket_lo")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("bucket_lo"))),

    // Incremental-ingest dedup: the deterministic 80/20 split plays the
    // existing-corpus / new-batch roles, and every 20th corpus doc is
    // "re-crawled" into the batch so the duplicate path has real
    // witnesses; the batch anti-matches the corpus's distinct fingerprint
    // set (batch-sized shuffle only).
    "incremental_new_docs" -> ((s, dir) => {
      val split = graft.ext.Sampling.deterministicSplit(
        t(s, dir, "documents"), col("doc_id"),
        Seq("corpus" -> 80, "batch" -> 20))
      val corpus = split.where(col("split") === "corpus")
      val batch = split.where(col("split") === "batch")
        .unionByName(corpus.where(col("doc_id") % 20 === 0))
      TextAnalysis.incrementalDedupReport(corpus, batch,
        groupCols = Seq("lang"))
    }),

    // The PERSISTED-INDEX twin of incremental_new_docs (same oracle):
    // the corpus's fingerprint set lives as a VersionedTable asset —
    // built on first touch (the only corpus-text scan, ever), READ on
    // every later ingest. The report path consumes only the 32-byte-key
    // index + the batch; at 100 TB this is the difference between
    // rescanning the corpus daily and a signature-table join
    // (IncrementalIndexSpec pins that corpus text is absent from the
    // report plan).
    "incremental_new_docs_indexed" -> ((s, dir) => {
      val split = graft.ext.Sampling.deterministicSplit(
        t(s, dir, "documents"), col("doc_id"),
        Seq("corpus" -> 80, "batch" -> 20))
      val corpus = split.where(col("split") === "corpus")
      val batch = split.where(col("split") === "batch")
        .unionByName(corpus.where(col("doc_id") % 20 === 0))
      val root = "/tmp/graft_dedup_index/" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "/fp"
      val index = graft.ext.DedupIndex.readOrBuild(s, root,
        graft.ext.DedupIndex.fingerprintIndex(corpus))
      graft.ext.DedupIndex.incrementalNewDocs(index, batch,
        groupCols = Seq("lang"))
    }),

    // Span-granular contamination vs the PERSISTED span index (third
    // index family in ext/DedupIndex): each batch doc's k-gram spans
    // probed against the corpus's distinct span-hash set — the exact
    // n-gram decontamination index production evals keep; corpus text
    // is scanned once ever (index build), never per batch.
    "span_contamination_indexed" -> ((s, dir) => {
      val split = graft.ext.Sampling.deterministicSplit(
        t(s, dir, "documents"), col("doc_id"),
        Seq("corpus" -> 80, "batch" -> 20))
      val root = "/tmp/graft_dedup_index/" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "/span"
      val index = graft.ext.DedupIndex.readOrBuild(s, root,
        graft.ext.DedupIndex.spanIndex(
          split.where(col("split") === "corpus"), k = 5))
      graft.ext.DedupIndex.spanContamination(index,
        split.where(col("split") === "batch"), k = 5)
    }),

    // The bloom-compressed probe of the same index (rows-only by
    // design: verdicts depend on Spark's bloom hash family, which no
    // SQL oracle reproduces; IncrementalIndexSpec bounds it against the
    // exact twin — superset verdicts, FP rate within the configured
    // fpp). expectedItems comes from the index's own row count, the
    // stored stat a catalog would hold.
    "span_contamination_bloom" -> ((s, dir) => {
      val split = graft.ext.Sampling.deterministicSplit(
        t(s, dir, "documents"), col("doc_id"),
        Seq("corpus" -> 80, "batch" -> 20))
      val root = "/tmp/graft_dedup_index/" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "/span"
      val index = graft.ext.DedupIndex.readOrBuild(s, root,
        graft.ext.DedupIndex.spanIndex(
          split.where(col("split") === "corpus"), k = 5))
      graft.ext.DedupIndex.spanContaminationBloom(index,
        split.where(col("split") === "batch"), k = 5,
        expectedItems = math.max(1L, index.count()))
    }),

    // The production substring-dedup shape: the batch CUT against the
    // persisted span index (corpus never rescanned, corpus owns all its
    // spans). Same byte-exact md5 witness as span_cut_docs.
    "span_cut_indexed" -> ((s, dir) => {
      val split = graft.ext.Sampling.deterministicSplit(
        t(s, dir, "documents"), col("doc_id"),
        Seq("corpus" -> 80, "batch" -> 20))
      val root = "/tmp/graft_dedup_index/" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "/span"
      val index = graft.ext.DedupIndex.readOrBuild(s, root,
        graft.ext.DedupIndex.spanIndex(
          split.where(col("split") === "corpus"), k = 5))
      graft.ext.DedupIndex.cutSeenSpans(index,
        split.where(col("split") === "batch"), k = 5)
    }),

    // Ordered conversion funnel: users clearing view -> click -> purchase
    // strictly in order (operators/Funnel; one shuffle + one sort, k
    // chained window-mins, no per-user history buffer).
    "conversion_funnel" -> ((s, dir) =>
      graft.operators.Funnel.conversionFunnel(t(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))),

    // Weekly cohort retention matrix (operators/Cohort): two user-keyed
    // aggregates + one user-keyed join; output is cohorts x weeks.
    "cohort_retention" -> ((s, dir) =>
      graft.operators.Cohort.weeklyRetention(t(s, dir, "events"),
        "user_id", "ts")),

    // Time-RANGE rolling window (feature engineering): each order's
    // trailing-7-day revenue for its customer — a VALUE-range frame over
    // epoch seconds, not a row frame. Cents-integer sum: exact arithmetic
    // in any engine regardless of windowed-sum accumulation order.
    "rolling_7d_revenue" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("__sec"))
        .rangeBetween(-7L * 86400, 0)
      t(s, dir, "orders")
        .withColumn("__sec", unix_timestamp(col("o_orderdate")))
        .withColumn("rev_7d_cents",
          sum(round(col("o_totalprice") * 100).cast("long")).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("rev_7d_cents"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Mergeable HLL rollup: daily user sketches union'd into per-type
    // distinct estimates WITHOUT re-scanning events — the store-the-
    // sketch pattern (Datasketches HLL; engine-specific -> rows-only
    // check, accuracy spec-asserted vs exact in HllRollupSpec).
    "uniques_hll_rollup" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("sk")))
            .as("est_distinct_users"))
        .orderBy(col("event_type"))
    }),

    // Point-in-time join against the SCD2 dimension: each order picks the
    // version valid AT its order date (equi key + validity range — plans
    // as a sort-merge join with a residual condition, never a nested
    // loop). Orders predating the dimension land in NO_VERSION: the PIT
    // contract makes missing history explicit instead of leaking the
    // current version backwards in time.
    "scd2_pit_join" -> ((s, dir) => {
      import graft.operators.Scd
      val cust = t(s, dir, "customer")
      val dim0 = cust.select(col("c_custkey"),
          col("c_mktsegment").as("segment"))
        .withColumn("effective_from", lit("1995-01-01").cast("date"))
        .withColumn("effective_to", lit(null).cast("date"))
      val upd = cust.select(col("c_custkey"),
        when(col("c_custkey") % 10 === 0,
          concat(col("c_mktsegment"), lit("_V2")))
          .otherwise(col("c_mktsegment")).as("segment"))
      val dim = Scd.scd2Merge(dim0, upd, keys = Seq("c_custkey"),
          attrs = Seq("segment"), asOf = lit("1996-01-01").cast("date"))
        .withColumn("effective_from", col("effective_from").cast("timestamp"))
        .withColumn("effective_to", col("effective_to").cast("timestamp"))
      val orders = t(s, dir, "orders")
      orders.join(dim,
          orders("o_custkey") === dim("c_custkey") &&
            col("effective_from") <= col("o_orderdate") &&
            (col("effective_to").isNull ||
              col("o_orderdate") < col("effective_to")),
          "left")
        .groupBy(coalesce(col("segment"), lit("NO_VERSION")).as("segment"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("segment"))
    }),

    // Deterministic k-per-stratum sample (ext/Sampling.samplePerStratum):
    // the reproducible "reservoir" — 3 docs per language, identical
    // selection on any engine/run/layout. The md5 < '8' candidate
    // pre-filter (keeps ~1/2) bounds the per-stratum sort volume — the
    // 100 TB shape, exercised here so the oracle covers it.
    "lang_doc_sample" -> ((s, dir) =>
      graft.ext.Sampling.samplePerStratum(
          t(s, dir, "documents").select(col("doc_id"), col("lang"),
            col("n_chars")),
          key = col("doc_id"), stratum = col("lang"), k = 3,
          hexPrefixBelow = Some("8"))
        .select(col("lang"), col("sample_rank"), col("doc_id"), col("n_chars"))
        .orderBy(col("lang"), col("sample_rank"))),

    // Time-weighted average over IRREGULAR samples (TWAP / sensor
    // integral): each observation holds its value until the next one, so
    // the mean weighs values by holding duration (micros), not by sample
    // count — burst-sampling cannot bias it. One user-keyed window
    // (lead) + one aggregate; integer-micro weights keep the weighted
    // sum engine-exact up to the final division.
    "twap_by_user" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("__hold",
          (unix_micros(lead(col("ts"), 1).over(w).cast("timestamp"))
            - unix_micros(col("ts").cast("timestamp")))
            .cast("double"))
        .where(col("__hold").isNotNull) // last sample holds nothing
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          round(sum(col("value") * col("__hold")) / sum(col("__hold")), 6)
            .as("twap"))
        .orderBy(col("user_id"))
    }),

    // Frame sampling (ext/Multimodal.sampleFrames): 64-byte windows,
    // every 2nd frame — the 1-item -> N-frames video shape with stubbed
    // decode; rolled up per kind (checksums are engine-portable byte
    // functions, so the fan-out itself is oracled).
    "frame_sample_stats" -> ((s, dir) =>
      graft.ext.Multimodal.sampleFrames(
          graft.ext.Multimodal.documentsAsMedia(t(s, dir, "documents")),
          frameSize = 64, everyNth = 2)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("frame_len")).as("total_frame_bytes"),
          sum(col("frame_checksum")).as("total_checksum"))
        .orderBy(col("kind"))),

    // Top-k per group WITHOUT a window sort: the bounded TopKByDouble
    // aggregate (functions/TopKAggregate) ships only O(groups x k)
    // tuples through the exchange — the window form shuffles every row.
    // Deterministic tie-break (value desc, id asc) makes it oracle-exact.
    "top3_orders_per_cust" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(graft.functions.TopKAggregate.topKBy(
          col("o_totalprice"), col("o_orderkey"), 3).as("top"))
        .select(col("o_custkey"),
          posexplode_outer(col("top")).as(Seq("pos", "e")))
        .where(col("e").isNotNull)
        .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rank"),
          col("e.id").as("o_orderkey"), col("e.v").as("o_totalprice"))
        .orderBy(col("o_custkey"), col("rank"))),

    // Built-in control twin of top3_orders_per_cust (same oracle): the
    // window form shuffles + sorts EVERY order row to rank it, where the
    // aggregate above ships only O(groups × k) structs through the
    // exchange — the measured pair for the custom-aggregate claim
    // (like the skew twins, the comparison lives in BENCH_FULL).
    "top3_orders_per_cust_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .select(col("o_custkey"), col("rank"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rank"))
    }),

    // Per-group feature standardization + outlier census: z-scores of
    // order totals within each priority. Shape: partial-aggregated group
    // stats (5 rows) broadcast-joined back — NOT a window partitioned by
    // the 5-value priority, which would sort the whole fact table on 5
    // reducers (the low-cardinality-window straggler at 100 TB). The
    // stats pass re-scans the cheap base relation, not a derived
    // pipeline (the PlanShape join-back rule is about recomputation).
    "zscore_outliers" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val stats = orders.groupBy(col("o_orderpriority"))
        .agg(avg(col("o_totalprice")).as("__mu"),
          stddev_samp(col("o_totalprice")).as("__sd"))
      orders.join(broadcast(stats), Seq("o_orderpriority"))
        .withColumn("z", (col("o_totalprice") - col("__mu")) / col("__sd"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(abs(col("z")) > 2.5, 1L).otherwise(0L)).as("n_outliers"),
          round(max(col("z")), 4).as("max_z"))
        .orderBy(col("o_orderpriority"))
    }),

    // Salted JOIN twin (operators/Skew.saltedJoin): hot-key-immune
    // (key, salt) join, row-identical to the plain join the oracle runs.
    "salted_join_segments" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.Skew.saltedJoin(t(s, dir, "events"), cust,
          "user_id", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("c_mktsegment"))
    }),

    // The stats CATALOG exercised end-to-end in the oracle gate: events
    // and the customer dim persist once as VersionedTables with stats +
    // heavy-hitter sidecars (commitWithStats — the write-time-maintained
    // catalog), and the join plans via adaptiveVersionedJoin entirely
    // from stored stats: zero scans happen before the physical strategy
    // is chosen. Same oracle as the salted/adaptive twins — the catalog
    // can only change speed. First run per SF dir pays the one-time
    // table build (same persisted-asset pattern as the dedup indexes).
    "catalog_join_segments" -> ((s, dir) => {
      val root = "/tmp/graft_catalog/" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val evRoot = root + "/events"; val custRoot = root + "/customer"
      if (graft.sources.VersionedTable.versions(s, evRoot).isEmpty)
        graft.sources.VersionedStats.commitWithStats(
          t(s, dir, "events"), evRoot, Seq("user_id"),
          hhCols = Seq("user_id"))
      if (graft.sources.VersionedTable.versions(s, custRoot).isEmpty)
        graft.sources.VersionedStats.commitWithStats(
          t(s, dir, "customer")
            .select(col("c_custkey").as("user_id"), col("c_mktsegment")),
          custRoot, Seq("user_id"))
      graft.sources.VersionedStats.adaptiveVersionedJoin(
          s, evRoot, custRoot, "user_id")._1
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("c_mktsegment"))
    }),

    // Adaptive twin of salted_join_segments (operators/AdaptiveJoin):
    // on this UNIFORM key distribution with a broadcastable dimension,
    // the four-way rule must land on the broadcast arm — the measured
    // counter-witness that the planner does NOT salt when a cheaper
    // strategy exists (salting's dim replication is pure cost here).
    // Same oracle as the salted twin: strategy never changes the answer.
    "adaptive_join_segments" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.AdaptiveJoin.adaptiveJoin(t(s, dir, "events"), cust,
          "user_id")._1
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("c_mktsegment"))
    }),

    // Categorical drift report (ext/Drift): language mix of the
    // deterministic corpus split vs the batch split, with per-category
    // smoothed KL terms — the crawl-to-crawl dataset-shift alarm.
    "lang_drift_report" -> ((s, dir) => {
      val split = graft.ext.Sampling.deterministicSplit(
        t(s, dir, "documents"), col("doc_id"),
        Seq("corpus" -> 80, "batch" -> 20))
      graft.ext.Drift.categoricalDrift(
        split.where(col("split") === "corpus"),
        split.where(col("split") === "batch"), col("lang"))
    }),

    // CDC-style snapshot diff (operators/SnapshotDiff): two synthetic
    // versions of the customer dimension (disjoint key drops + an acctbal
    // bump on every 5th key) classified added/removed/changed row-wise.
    // One full-outer key join; output is delta-sized.
    "snapshot_diff" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val prev = cust.where(pmod(col("c_custkey"), lit(10)) =!= 3)
      val next = cust.where(pmod(col("c_custkey"), lit(7)) =!= 2)
        .withColumn("c_acctbal",
          when(pmod(col("c_custkey"), lit(5)) === 0, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")))
      graft.operators.SnapshotDiff
        .diff(prev, next, Seq("c_custkey"), Seq("c_acctbal", "c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // Distribution window functions (percent_rank / cume_dist / ntile)
    // per priority partition — row-level, deterministic tie-break.
    // Scale note: 5 priority values = 5 window partitions, a straggler
    // shape at corpus scale — these EXACT distribution stats are the
    // oracle-able form; at 100 TB rank approximately against t-digest
    // quantiles (the equi_depth_hist_approx pattern).
    "order_price_ranks" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(10).over(w).cast("long").as("decile"))
        .orderBy(col("o_orderkey"))
    }),

    // Skew census (operators/Skew.keySkewReport): the 10 heaviest event
    // keys with share + cumulative share — the diagnostic that decides
    // whether the salted twins above are needed. Global window bounded
    // to the top-k rows by construction.
    "key_skew_report" -> ((s, dir) =>
      graft.operators.Skew.keySkewReport(t(s, dir, "events"), "user_id", 10)),

    // Last-touch conversion attribution (operators/Attribution): each
    // purchase credited to the user's most recent prior non-purchase
    // event — carry-forward window, no join, one user-keyed exchange.
    "attribution_last_touch" -> ((s, dir) =>
      graft.operators.Attribution.report(t(s, dir, "events"),
        "user_id", "ts", "event_type", convType = "purchase",
        valueCol = "value", tieCol = "event_id")),

    // Median/MAD robust outlier census (operators/Robust) — the
    // heavy-tail-safe twin of zscore_outliers above; exact order-stat
    // medians vs the DuckDB oracle.
    "mad_outliers" -> ((s, dir) =>
      graft.operators.Robust.madOutlierCensus(t(s, dir, "orders"),
        "o_orderpriority", "o_totalprice")),

    // The 100 TB path of the same census: approx_percentile (t-digest,
    // mergeable partial aggregation — bounded memory per group) instead
    // of exact order statistics. Rows-only in the driver; RobustSpec
    // bounds its divergence from the exact twin.
    "mad_outliers_approx" -> ((s, dir) =>
      graft.operators.Robust.madOutlierCensus(t(s, dir, "orders"),
        "o_orderpriority", "o_totalprice", exact = false)),

    // Multi-touch attribution (operators/Attribution.multiTouchReport):
    // each purchase's credit split across its journey's touches — linear
    // (1/n each) and U-shaped position (40/20/40) models. One user-keyed
    // exchange carries both window passes (the journey window keys on a
    // superset of the partitioning); fractions/values are summed in exact
    // integer micros/cents.
    "attribution_linear" -> ((s, dir) =>
      graft.operators.Attribution.multiTouchReport(t(s, dir, "events"),
        "user_id", "ts", "event_type", convType = "purchase",
        valueCol = "value", tieCol = "event_id", model = "linear")),

    "attribution_position" -> ((s, dir) =>
      graft.operators.Attribution.multiTouchReport(t(s, dir, "events"),
        "user_id", "ts", "event_type", convType = "purchase",
        valueCol = "value", tieCol = "event_id", model = "position")),

    // Time-decay multi-touch model: stepped half-life (1 h) weights as
    // exact integers (1e6 >> whole-half-lives) — recency-weighted credit
    // that still hash-matches a DuckDB oracle bit-for-bit.
    "attribution_decay" -> ((s, dir) =>
      graft.operators.Attribution.timeDecayReport(t(s, dir, "events"),
        "user_id", "ts", "event_type", convType = "purchase",
        valueCol = "value", tieCol = "event_id", halfLifeSec = 3600L)),

    // k-anonymity census (privacy ops, the structural complement of
    // ext/Redaction's PII scrubbing): how re-identifiable is the table
    // under a quasi-identifier set? One group pass on the QI columns,
    // then a bounded histogram of group sizes below k plus the count of
    // at-risk rows — the release/suppress decision input.
    "k_anonymity_report" -> ((s, dir) => {
      val k = 5
      val groups = t(s, dir, "customer")
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
      groups.agg(
          count(lit(1)).as("n_groups"),
          count(when(col("n") < k, 1)).as("n_small_groups"),
          coalesce(sum(when(col("n") < k, col("n"))), lit(0L))
            .as("n_rows_at_risk"),
          min(col("n")).as("min_group_size"))
        .withColumn("k", lit(k.toLong))
    }),

    // Markov transition matrix over user journeys: adjacent event-type
    // pairs per user (lag window on the same one user-keyed exchange) →
    // transition counts + per-source probabilities (exact long counts,
    // one deterministic double division).
    "event_transitions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = t(s, dir, "events")
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val totals = org.apache.spark.sql.expressions.Window
        .partitionBy(col("prev_type"))
      pairs
        .withColumn("p", round(col("n") / sum(col("n")).over(totals), 6))
        .orderBy(col("prev_type"), col("next_type"))
    }),

    // Bigram counts — the n-gram LM base layer over the token stream:
    // adjacent token pairs within each document, global top 25.
    "top_bigrams" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      t(s, dir, "documents")
        .select(explode_outer(zip_with(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
        .where(col("bigram").isNotNull)
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(25)
    }),

    // Equi-depth histogram (feature binning): 10 equal-population buckets
    // over order totals with exact bounds and counts — ntile over a
    // totally-ordered sort (tie-break on key), so bucket membership is
    // deterministic in any engine. The global ntile is the EXACT,
    // oracle-able form and serializes the sort onto one reducer; at
    // corpus scale swap the bounds to approx_percentile (t-digest) and
    // assign buckets by range — same output schema, rows-only verified,
    // like the other sketch twins.
    "equi_depth_hist" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_totalprice"), col("o_orderkey"))
        .withColumn("bucket", ntile(10).over(w).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("bucket"))
    }),

    // Count-Min point-frequency estimates (functions/CountMin): token
    // frequencies for a probe set chosen AFTER the scan, answered from
    // one mergeable fixed-size sketch — the any-key complement of the
    // Misra-Gries top-k sketch. Rows-only (seeded Spark-side hashes);
    // CountMinSpec carries the one-sided-error and εN bounds.
    "token_freq_cms" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.CountMinFunctions._
      val sketch = t(s, dir, "documents")
        .select(explode_outer(TextAnalysis.tokens(col("text"))).as("token"))
        .where(col("token").isNotNull)
        .agg(cmsSketch(col("token")).as("sk"))
      val probes = Seq("the", "of", "and", "la", "el", "und").toDF("token")
      probes.crossJoin(broadcast(sketch))
        .select(col("token"),
          cmsEstimate(col("sk"), col("token")).as("est_count"))
        .orderBy(col("token"))
    }),

    // AGMS join-size estimation (functions/JoinSizeSketch): the events ⋈
    // customer output size estimated from one cheap sketch per side —
    // the broadcast-vs-shuffle planning decision WITHOUT running the
    // join. Median-of-means computed fully in-plan (zip_with product,
    // sliced group means, array_sort median); rows-only (the ±1 hash
    // family is Spark-side; JoinEstimateSpec carries the accuracy bound).
    // The estimate is CONSULTED, not just printed: the same decision
    // rule operators/EstimatedJoin applies as a physical-plan hint
    // (broadcast small+clean, sort-merge otherwise) is emitted as the
    // `strategy` column, and EstimatedJoinSpec pins the chosen join
    // operator per fixture.
    "join_size_estimate" -> ((s, dir) => {
      import graft.functions.JoinSizeSketch.agmsSketch
      val sa = t(s, dir, "events")
        .agg(agmsSketch(col("user_id"), 256).as("sa"),
          count(lit(1)).as("rows_a"))
      val sb = t(s, dir, "customer")
        .agg(agmsSketch(col("c_custkey"), 256).as("sb"),
          count(lit(1)).as("rows_b"))
      val products = zip_with(col("sa"), col("sb"), (x, y) => x * y)
      val means = transform(sequence(lit(0), lit(7)), g =>
        aggregate(slice(products, g * 32 + 1, lit(32)), lit(0L), _ + _)
          .cast("double") / 32.0)
      val sorted = array_sort(means)
      val median = (element_at(sorted, 4) + element_at(sorted, 5)) / 2.0
      val est = greatest(round(median).cast("long"), lit(0L))
      // EstimatedJoin.estimateFromSketches's rule, in-plan: broadcast
      // the smaller side iff it fits AND the output does not explode
      val canBroadcast =
        least(col("rows_a"), col("rows_b")) <= lit(10000000L) &&
          est <= lit(4.0) * greatest(col("rows_a"), col("rows_b"), lit(1L))
      sa.crossJoin(sb).select(col("rows_a"), col("rows_b"),
        est.as("est_join_rows"),
        when(canBroadcast && col("rows_b") <= col("rows_a"),
            lit("broadcast_right"))
          .when(canBroadcast, lit("broadcast_left"))
          .when(est <= lit(0.1) * greatest(col("rows_a"), col("rows_b")),
            lit("bloom_merge"))
          .otherwise(lit("shuffle_merge")).as("strategy"))
    }),

    // CAPSTONE composition — the end-to-end training-data pipeline as
    // ONE lazy plan: Gopher-style quality gate → deterministic 90/10
    // train/eval split → exact-dedup within train (min-doc_id survivor
    // per fingerprint) → decontamination (drop train docs whose
    // fingerprint appears in eval) → temperature-T=2 mixture flattening
    // → per-language doc/token counts. Every stage is an
    // already-oracled operator; this verifies they COMPOSE (the run a
    // real corpus actually takes), hash-checked end to end.
    "training_pipeline_counts" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__fp")).orderBy(col("doc_id"))
      val kept = TextAnalysis.qualityFlags(t(s, dir, "documents"))
        .where(col("keep"))
        .select(col("doc_id"), col("lang"), col("text"))
      val split = graft.ext.Sampling.deterministicSplit(kept,
        col("doc_id"), Seq("train" -> 90, "eval" -> 10))
      val withFp = split.withColumn("__fp",
        md5(concat_ws(" ", TextAnalysis.tokens(col("text")))))
      val evalFps = withFp.where(col("split") === "eval")
        .select(col("__fp")).distinct()
      val survivors = withFp.where(col("split") === "train")
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
      val clean = survivors.join(evalFps, Seq("__fp"), "left_anti")
      graft.ext.Sampling.temperatureSample(clean, col("doc_id"), col("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .as("total_tokens"))
        .orderBy(col("lang"))
    }),

    // The corpus-scale twin the equi_depth_hist comment promises:
    // t-digest decile bounds (one mergeable aggregate, no global sort)
    // + range bucket assignment. Rows-only (sketch bounds are not
    // engine-comparable); ProfileSpec bounds its divergence from the
    // exact form.
    "equi_depth_hist_approx" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val bounds = orders.agg(approx_percentile(col("o_totalprice"),
        array((1 to 9).map(i => lit(i / 10.0)): _*), lit(10000))
        .as("bs"))
      orders.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          (aggregate(col("bs"),
            lit(1L), (acc, b) =>
              acc + when(col("o_totalprice") > b, 1L).otherwise(0L))))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("bucket"))
    }),

    // Deterministic negative sampling (ext/Sampling): contrastive
    // training pairs with hash-picked negatives — bucket reps broadcast,
    // anchors explode ×k and map-side join; no randomness, so the oracle
    // reproduces every pair through the shared md5-bucket family.
    "contrastive_negatives" -> ((s, dir) =>
      graft.ext.Sampling.contrastiveNegatives(
          t(s, dir, "documents"), col("doc_id"), k = 3, buckets = 16)
        .orderBy(col("anchor_doc_id"), col("neg_rank"))),

    // One-pass column profiler (operators/Profile): every numeric
    // lineitem column's min/max/null_count/mean from ONE aggregation
    // scan, unpivoted to long form — never a job per column.
    "numeric_profile" -> ((s, dir) =>
      graft.operators.Profile.numericProfile(t(s, dir, "lineitem"))),

    // Trailing-window spike census: each event's value vs its user's
    // trailing-20-event average, flagged when it jumps 4× (|v·n − s| >
    // 3s ⇔ v > 4·mean or v < −2·mean) — the comparison is multiplied out
    // so it is ALL-integer (cents), immune to sliding-frame float
    // accumulation order differing between engines. Requires ≥10 prior
    // events so cold-start rows never score.
    "value_spike_census" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-20, -1)
      t(s, dir, "events")
        .withColumn("vc", round(col("value") * 100).cast("long"))
        .withColumn("s", sum(col("vc")).over(w))
        .withColumn("n", count(col("vc")).over(w))
        .groupBy(col("user_id"))
        .agg(count(when(col("n") >= 10, 1)).as("n_scored"),
          count(when(col("n") >= 10 &&
            abs(col("vc") * col("n") - col("s")) > col("s") * 3, 1))
            .as("n_spikes"))
        .orderBy(col("user_id"))
    }),

    // Weighted sample without replacement (A-ES, ext/Sampling): 50 docs
    // drawn ∝ document length. Rows-only: the -ln(u)/w score is exactly
    // reproducible within Spark but ln is not bit-standardized across
    // engines (SamplingSpec proves the weight-proportional property).
    "weighted_doc_sample" -> ((s, dir) =>
      graft.ext.Sampling.weightedSample(
          t(s, dir, "documents")
            .select(col("doc_id"), col("lang"),
              length(col("text")).cast("double").as("w")),
          col("doc_id"), col("w"), k = 50)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // Temperature (α=1/2) mixture sampling (ext/Sampling.temperatureSample):
    // per-language kept counts + ppm thresholds — the training-mix
    // flattening pass; T=2 rates are sqrt (IEEE-exact on any engine).
    "temperature_mixture" -> ((s, dir) =>
      graft.ext.Sampling.temperatureSample(t(s, dir, "documents"),
          col("doc_id"), col("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), max(col("keep_ppm")).as("keep_ppm"))
        .orderBy(col("lang")))
  )

  // ------------------------------------------------- skewed-key fixture ---

  /** Deterministic Zipf-ish skew fixture (VERDICT r4 item 1): fold the
    * ~30% of event rows whose user_id ends in 0/1/2 onto hot key 7, and
    * inflate ×[[SkewRep]] in-plan so the straggler cost is measurable at
    * bench SF. Every query on it is registered plain/salted as a twin
    * pair with the SAME oracle — the bench then MEASURES what the salting
    * docs argue. The join twins hint SHUFFLE_MERGE to model the dimension
    * that outgrew the broadcast threshold (when it fits, broadcast and
    * skew is moot — Skew.saltedJoin's own scaladoc says so). */
  private val SkewRep = 32

  private def skewedEvents(s: SparkSession, dir: String,
                           rep: Int = SkewRep): DataFrame =
    t(s, dir, "events")
      // parallelize the generator: the base table is one small file (≤2
      // scan tasks), so without this the ×rep explode runs serially and
      // that SHARED cost would dilute the plain-vs-salted comparison.
      // Deterministic hash repartition (not round-robin) — retry-safe.
      .repartition(col("event_id"))
      .withColumn("skey",
        when(pmod(col("user_id"), lit(10)) < 3, lit(7L))
          .otherwise(col("user_id")))
      .withColumn("__rep", explode(sequence(lit(1), lit(rep))))
      .withColumn("value_cents", round(col("value") * 100).cast("long"))

  private def custDim(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey").as("skey"), col("c_mktsegment"))

  private lazy val skewFixture: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Census first: the diagnostic that justifies the salted twins below —
    // flags key 7 at ~30% share (inflation-invariant, so rep=1).
    "skewed_key_report" -> ((s, dir) =>
      graft.operators.Skew.keySkewReport(
        skewedEvents(s, dir, rep = 1), "skey", 5)),

    // Plain groupBy on the hot key. EXPECTED to stay healthy: partial
    // (map-side) aggregation collapses each partition's hot key to one
    // row before the shuffle, so decomposable aggs are skew-immune in
    // Spark — the honest finding the salted twin quantifies against.
    "skew_agg_plain" -> ((s, dir) =>
      skewedEvents(s, dir)
        .groupBy(col("skey"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_cents")).as("value_cents"))
        .orderBy(col("skey"))),

    // Salted two-phase twin of the same aggregation (result-identical).
    "skew_agg_salted" -> ((s, dir) =>
      graft.operators.Skew.saltedAgg(skewedEvents(s, dir),
          keys = Seq("skey"), saltFrom = Seq("event_id", "__rep"),
          salts = 32,
          partials = Seq(count(lit(1)).as("__c"),
            sum(col("value_cents")).as("__s")),
          finals = Seq(sum(col("__c")).as("n_events"),
            sum(col("__s")).as("value_cents")))
        .orderBy(col("skey"))),

    // Plain sort-merge join on the hot key: the hot key's ~30% of rows
    // sort-merge in ONE task (AQE's skew split declines here — the
    // downstream agg needs hash(skey) partitioning, and splitting would
    // force an extra shuffle).
    "skew_join_plain" -> ((s, dir) =>
      skewedEvents(s, dir)
        .join(custDim(s, dir).hint("SHUFFLE_MERGE"), Seq("skey"))
        .groupBy(col("skey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_cents")).as("value_cents"))
        .orderBy(col("skey"))),

    // Salted (key, salt) join twin: big side salts deterministically,
    // small side replicates ×16 — the hot key spreads over 16 tasks.
    // Result-identical to skew_join_plain (same oracle).
    "skew_join_salted" -> ((s, dir) =>
      graft.operators.Skew.saltedJoin(skewedEvents(s, dir),
          custDim(s, dir).hint("SHUFFLE_MERGE"), "skey", salts = 16)
        .groupBy(col("skey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_cents")).as("value_cents"))
        .orderBy(col("skey"))),

    // The PLANNED twin (operators/AdaptiveJoin): nobody told this query
    // the key is hot — a stats pass measures the heavy hitters, the
    // four-way rule picks the salted arm and sizes the salts from the
    // measured ~30% share (ceil(share × shuffle.partitions)). The pass
    // runs on the UNINFLATED fixture (rep=1): key SHARES are
    // inflation-invariant (same reason skewed_key_report censuses at
    // rep=1), and at scale this is the stored-stats posture —
    // adaptiveVersionedJoin plans from the catalog without touching the
    // fact at all. broadcastMaxRows=0 models the dimension that outgrew
    // the broadcast threshold, same posture as the twins' SHUFFLE_MERGE
    // hint. Same oracle as skew_join_plain — planning only changes speed.
    "skew_join_adaptive" -> ((s, dir) => {
      val aj = graft.operators.AdaptiveJoin
      val stats = aj.measure(skewedEvents(s, dir, rep = 1), "skey")
      val dimStats = aj.measure(custDim(s, dir), "skey", hhCapacity = 0)
      val d = aj.plan(stats, dimStats, broadcastMaxRows = 0L,
        shufflePartitions =
          s.conf.get("spark.sql.shuffle.partitions").toInt)
      aj.applyDecision(skewedEvents(s, dir), custDim(s, dir), "skey", d)
        .groupBy(col("skey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_cents")).as("value_cents"))
        .orderBy(col("skey"))
    })
  )

  /** DuckDB twins for the driver's differential check. Keys must mirror
    * [[queries]]; result column names and ORDER BY match exactly. */
  def oracleSql: Map[String, String] =
    coreOracle ++ extOracle ++ graft.registry.TpchCanon.oracle ++ Map(
    // the indexed twin must reproduce the recompute-the-corpus report
    // EXACTLY — one oracle serves both paths
    "incremental_new_docs_indexed" -> extOracle("incremental_new_docs"))

  private val coreOracle: Map[String, String] = Map(
    "genre_kpis" ->
      """SELECT p_type, count(l_partkey) AS listen_count,
         round(avg(l_extendedprice), 6) AS avg_duration
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_type ORDER BY p_type""",

    // full recompute over the new snapshot — the incremental refresh on
    // the Spark side must hash-match it exactly
    "incremental_kpis" ->
      """SELECT p_type AS genre, count(*) AS listen_count,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents,
         round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
           AS BIGINT) / 100.0 / count(*), 6) AS avg_price
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_orderkey % 17 <> 0
         GROUP BY 1 ORDER BY 1""",

    // full recompute over the new snapshot (see incremental_kpis)
    "incremental_kpis_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
         count(*) AS n_events, count(DISTINCT user_id) AS unique_users,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
         FROM events WHERE event_id % 23 <> 0
         GROUP BY 1 ORDER BY 1""",

    "hourly_kpis_hod" ->
      """WITH e AS (SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
                           user_id AS u, event_type AS v FROM events),
         a AS (SELECT hour, count(DISTINCT u) AS unique_listeners,
                      round(CAST(count(DISTINCT v) AS DOUBLE) / count(*), 6) AS diversity
               FROM e GROUP BY hour),
         m AS (SELECT hour, v AS top_value FROM (
                 SELECT hour, v, row_number() OVER (
                   PARTITION BY hour ORDER BY count(*) DESC, v ASC) AS rn
                 FROM e GROUP BY hour, v) WHERE rn = 1)
         SELECT a.hour, a.unique_listeners, a.diversity, m.top_value
         FROM a JOIN m USING (hour) ORDER BY hour""",

    "hourly_kpis_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
         count(*) AS n_events, count(DISTINCT user_id) AS unique_users,
         round(sum(value), 6) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",

    "revenue_by_nation" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(DISTINCT o_orderkey) AS n_orders
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_quantity > 10
         GROUP BY n_name ORDER BY n_name""",

    "supplier_pagerank" -> {
      // 5 unrolled iterations (no recursive aggregation needed): each
      // r{i} applies the same integer update to r{i-1}.
      val iters = (1 to 5).map { i =>
        s"""r$i AS (SELECT n.node,
           CAST(150000 + (85 * coalesce(s.sm, 0)) // 100 AS BIGINT) AS r
           FROM nodes n LEFT JOIN (
             SELECT e.dst AS node, sum(p.r // d.od) AS sm
             FROM r${i - 1} p JOIN edges e ON p.node = e.src
             JOIN deg d ON d.src = p.node
             GROUP BY e.dst) s USING (node))"""
      }.mkString(",\n           ")
      s"""WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
             l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         deg AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
         nodes AS (SELECT DISTINCT src AS node FROM edges),
         r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
         $iters
         SELECT (node - 1) // 2 AS s_suppkey, r AS rank_micro
         FROM r5 WHERE node % 2 = 1 ORDER BY s_suppkey"""
    },

    "multi_join_revenue" ->
      """SELECT s_nationkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN part ON l_partkey = p_partkey
         WHERE p_size = 1
         GROUP BY s_nationkey ORDER BY s_nationkey""",

    "revenue_by_nation_merge" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(DISTINCT o_orderkey) AS n_orders
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_quantity > 10
         GROUP BY n_name ORDER BY n_name""",

    "weekly_order_revenue" ->
      """SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
         FROM orders GROUP BY 1 ORDER BY 1""",

    "cust_order_stats" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
         coalesce(round(sum(o_totalprice), 2), 0.0) AS total_spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",

    "semi_join_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",

    "anti_join_customers" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "distinct_user_types" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",

    "first_event_per_user" ->
      """SELECT user_id, event_id, event_type FROM (
           SELECT user_id, event_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",

    "union_dedup_counts" ->
      """SELECT event_type, count(*) AS n_events FROM (
           SELECT DISTINCT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                           event_type, value, props FROM (
             SELECT * FROM events WHERE user_id IS NOT NULL
             UNION ALL
             SELECT * FROM events WHERE user_id IS NOT NULL))
         GROUP BY event_type ORDER BY event_type""",

    "top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "window_running_total" ->
      """SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn,
         round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
         FROM orders ORDER BY o_custkey, rn""",

    "user_event_paths" ->
      """SELECT user_id,
         array_to_string((list(event_type
           ORDER BY CAST(ts AS TIMESTAMP), event_id))[1:5], '->') AS path,
         count(*) AS n_events
         FROM events GROUP BY user_id ORDER BY user_id""",

    "lineitem_stats" ->
      """SELECT l_returnflag, count(*) AS n,
         round(stddev_samp(l_extendedprice), 4) AS price_stddev,
         round(var_samp(l_quantity), 4) AS qty_var,
         round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
         round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "cust_order_gaps" ->
      """SELECT o_custkey, o_orderkey,
         datediff('day',
           lag(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS days_since_prev,
         ntile(4) OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice, o_orderkey) AS price_quartile
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "validation_report" ->
      """SELECT count(*) AS n_rows,
         count(CASE WHEN user_id IS NULL THEN 1 END) AS null_user_id,
         count(CASE WHEN value IS NULL THEN 1 END) AS null_value,
         count(*) - count(DISTINCT (user_id, ts)) AS dup_user_id_ts,
         count(CASE WHEN value < 0 THEN 1 END) AS neg_value,
         count(CASE WHEN event_type NOT IN ('view', 'click', 'purchase')
                    THEN 1 END) AS invalid_type
         FROM events""",

    // Schema-metadata oracle: DuckDB's DESCRIBE over the same parquet view,
    // with DuckDB type names mapped to Spark simpleString names. The
    // declared list must stay in lockstep with the Spark query's.
    "schema_report" ->
      """WITH decl(col_name, declared_type) AS (VALUES
           ('event_id', 'bigint'), ('ts', 'timestamp'),
           ('user_id', 'bigint'), ('event_type', 'string'),
           ('value', 'string'), ('session_id', 'string')),
         act AS (SELECT column_name AS col_name,
             CASE column_type
               WHEN 'BIGINT' THEN 'bigint' WHEN 'VARCHAR' THEN 'string'
               WHEN 'DOUBLE' THEN 'double' WHEN 'TIMESTAMP' THEN 'timestamp'
               WHEN 'TIMESTAMP_NS' THEN 'timestamp'
               ELSE lower(column_type) END AS actual_type
           FROM (DESCRIBE events))
         SELECT col_name, d.declared_type AS declared_type,
           a.actual_type AS actual_type,
           CASE WHEN d.col_name IS NULL THEN TRUE
                WHEN a.col_name IS NULL THEN FALSE
                ELSE d.declared_type = a.actual_type END AS conforms,
           CASE WHEN d.col_name IS NULL THEN 'undeclared'
                WHEN a.col_name IS NULL THEN 'missing'
                WHEN d.declared_type = a.actual_type THEN 'ok'
                ELSE 'type_mismatch' END AS status
         FROM decl d FULL JOIN act a USING (col_name)
         ORDER BY col_name""",

    "invalid_event_types" ->
      """SELECT lower(event_type) AS invalid_value, count(*) AS n_rows
         FROM events
         WHERE event_type IS NOT NULL
           AND lower(event_type) NOT IN ('view', 'click', 'purchase')
         GROUP BY 1 ORDER BY 1""",

    "json_kpis" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
         max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "pipeline_kpis" ->
      """SELECT event_type, count(*) AS listen_count,
         round(avg(value), 6) AS avg_duration
         FROM events GROUP BY event_type ORDER BY event_type""",

    // DuckDB has a native ASOF JOIN — the perfect oracle for our
    // union-and-carry-forward implementation. CAST(ts AS TIMESTAMP)
    // truncates DuckDB's ns to the same microseconds Spark computes with.
    "asof_click_view" ->
      """WITH clicks AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                         FROM events WHERE event_type = 'click'),
         views AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts,
                          max(value) AS view_value
                   FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT c.user_id, c.event_id, c.ts, v.view_ts, v.view_value
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND c.ts >= v.view_ts
         ORDER BY c.user_id, c.ts, c.event_id""",

    "asof_next_view" ->
      """WITH clicks AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                         FROM events WHERE event_type = 'click'),
         views AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts,
                          max(value) AS view_value
                   FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT c.user_id, c.event_id, c.ts, v.view_ts, v.view_value
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND c.ts <= v.view_ts
         ORDER BY c.user_id, c.ts, c.event_id""",

    "asof_nearest_view" ->
      """WITH clicks AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                         FROM events WHERE event_type = 'click'),
         views AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts,
                          max(value) AS view_value
                   FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         b AS (SELECT c.event_id, v.view_ts AS b_ts, v.view_value AS b_val
               FROM clicks c ASOF LEFT JOIN views v
                 ON c.user_id = v.user_id AND c.ts >= v.view_ts),
         f AS (SELECT c.event_id, v.view_ts AS f_ts, v.view_value AS f_val
               FROM clicks c ASOF LEFT JOIN views v
                 ON c.user_id = v.user_id AND c.ts <= v.view_ts)
         SELECT c.user_id, c.event_id, c.ts,
           CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
                  epoch_us(c.ts) - epoch_us(b_ts)
                    <= epoch_us(f_ts) - epoch_us(c.ts))
                THEN b_ts ELSE f_ts END AS view_ts,
           CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
                  epoch_us(c.ts) - epoch_us(b_ts)
                    <= epoch_us(f_ts) - epoch_us(c.ts))
                THEN b_val ELSE f_val END AS view_value
         FROM clicks c JOIN b USING (event_id) JOIN f USING (event_id)
         ORDER BY c.user_id, c.ts, c.event_id""",

    "asof_click_view_native" ->
      """WITH clicks AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                         FROM events WHERE event_type = 'click'),
         views AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts,
                          max(value) AS view_value
                   FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT c.user_id, c.event_id, c.ts, v.view_ts, v.view_value
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND c.ts >= v.view_ts
         ORDER BY c.user_id, c.ts, c.event_id""",

    "user_sessions" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                    FROM events),
         f AS (SELECT user_id, ts, value,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS is_new
               FROM e),
         s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid FROM f)
         SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value), 6) AS sum_value
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",

    "hourly_concurrency" ->
      // session CTE shared verbatim with user_sessions; then the sweep:
      // ends before starts on ties, running sum, per-hour max
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events),
         f AS (SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS is_new
               FROM e),
         s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid FROM f),
         sess AS (SELECT user_id, min(ts) AS st, max(ts) AS en
                  FROM s GROUP BY user_id, sid),
         d AS (SELECT st AS t, 1 AS dd FROM sess
               UNION ALL SELECT en, -1 FROM sess),
         r AS (SELECT t, sum(dd) OVER (ORDER BY t, dd
                 ROWS UNBOUNDED PRECEDING) AS live FROM d)
         SELECT date_trunc('hour', t) AS hour_start,
           CAST(max(live) AS BIGINT) AS max_concurrent
         FROM r GROUP BY 1 ORDER BY 1""",

    "returns_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         round(sum(l_extendedprice), 2) AS total_price
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "cube_status_priority" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         round(sum(o_totalprice), 2) AS total_price
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "pivot_priority_status" ->
      """SELECT o_orderpriority,
         count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
         count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
         count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "lineitem_metrics_long" ->
      """WITH m AS (
           SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value
           FROM lineitem
           UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice
           FROM lineitem
           UNION ALL SELECT l_returnflag, 'l_discount', l_discount
           FROM lineitem
           UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
         SELECT l_returnflag, metric, count(*) AS n,
           round(avg(value), 6) AS avg_value
         FROM m GROUP BY 1, 2 ORDER BY 1, 2""",

    "grouping_sets_orders" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         count(*) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         ORDER BY gid, o_orderstatus NULLS FIRST,
                  o_orderpriority NULLS FIRST""",

    "price_percentiles" ->
      """SELECT o_orderpriority, n,
         generate_subscripts(qs, 1) - 1 AS q_idx,
         round(unnest(qs), 4) AS q_value
         FROM (SELECT o_orderpriority, count(*) AS n,
                 quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.95]) AS qs
               FROM orders GROUP BY o_orderpriority)
         ORDER BY o_orderpriority, q_idx""",

    "viewers_and_buyers" ->
      """SELECT user_id FROM events WHERE event_type = 'view'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'purchase'
         ORDER BY user_id""",

    "big_buyers_no_big_view" ->
      """SELECT user_id FROM events
         WHERE event_type = 'purchase' AND value > 200
         EXCEPT
         SELECT user_id FROM events
         WHERE event_type = 'view' AND value > 200
         ORDER BY user_id""",

    "orders_above_avg" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT 1.8 * avg(o_totalprice) FROM orders)
         ORDER BY o_orderkey""",

    "exists_urgent_cust" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT'
                         AND o.o_totalprice > 300000)
         ORDER BY c_custkey""",

    "scd2_customer_dim" ->
      """WITH dim AS (SELECT c_custkey, c_mktsegment AS seg,
             DATE '1995-01-01' AS eff_from, CAST(NULL AS DATE) AS eff_to
           FROM customer),
         upd AS (SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment || '_V2'
                  ELSE c_mktsegment END AS seg FROM customer),
         j AS (SELECT c_custkey, dim.seg AS dseg, upd.seg AS useg,
                 dim.eff_from
               FROM dim FULL JOIN upd USING (c_custkey)),
         out AS (
           SELECT c_custkey, dseg AS segment, eff_from, CAST(NULL AS DATE)
             AS eff_to FROM j WHERE useg IS NULL OR dseg = useg
           UNION ALL
           SELECT c_custkey, dseg, eff_from, DATE '1996-01-01' FROM j
           WHERE useg IS NOT NULL AND dseg IS NOT NULL AND dseg <> useg
           UNION ALL
           SELECT c_custkey, useg, DATE '1996-01-01', CAST(NULL AS DATE)
           FROM j WHERE useg IS NOT NULL AND (dseg IS NULL OR dseg <> useg))
         SELECT c_custkey, segment,
           CAST(eff_from AS TIMESTAMP) AS effective_from,
           CAST(eff_to AS TIMESTAMP) AS effective_to
         FROM out ORDER BY c_custkey, effective_from""",

    "not_in_bulk_parts" ->
      """SELECT p_partkey, p_name FROM part
         WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                                 WHERE l_quantity >= 49)
         ORDER BY p_partkey""",

    "range_join_ship_windows" ->
      """SELECT o_orderkey AS window_key, count(*) AS n_shipments,
         round(sum(l_quantity), 2) AS total_qty
         FROM orders JOIN lineitem
           ON l_shipdate >= o_orderdate
          AND l_shipdate < o_orderdate + INTERVAL 7 DAY
         WHERE o_orderkey % 100 = 0
         GROUP BY 1 ORDER BY 1"""
  )

  // ------------------------------------------------- extension oracles ---

  /** Shared DuckDB CTE fragments mirroring TextAnalysis.tokens /
    * Dedup.shingleRows exactly (token regex, k=5 shingles, distinct). */
  private val tokCte =
    "tok AS (SELECT doc_id, lang, source, n_chars, " +
      "regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents)"
  private val shCte =
    "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
      "generate_series(1, len(w)-4), i -> array_to_string(w[i:i+4], ' ')))) " +
      "AS shingle FROM tok WHERE len(w) >= 5)"

  /** Left-fold sum starting at 0.0 — same op order as Spark's
    * aggregate(..., 0.0, (acc, x) => acc + x). */
  private def foldSum(items: String, init: String = "0.0"): String =
    s"list_reduce(list_prepend($init, $items), (a, x) -> a + x)"

  /** DuckDB dot product of two float lists in doubles, index order. */
  private def dotSql(a: String, b: String): String =
    foldSum(s"list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))")

  private def planeLiteral(p: Array[Double]): String =
    p.map(v => f"$v%.3f").mkString("[", ", ", "]")

  private val extOracle: Map[String, String] = {
    val markers = TextAnalysis.langMarkers.map { case (l, ms) =>
      l -> ms.map(m => s"x = '$m'").mkString(" OR ")
    }.toMap
    val planes = Similarity.hyperplanes(4, 64)
    val bucketOf = (v: String) => planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotSql(v, planeLiteral(p))} >= 0.0 " +
        s"THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    // OR-amplified LSH: table t's plane set is seeded 42 + t, mirroring
    // Similarity.knnLshOr's defaults (12 tables x 5 planes)
    val orBucketOf = (v: String, t: Int) =>
      Similarity.hyperplanes(5, 64, 42L + t).zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN ${dotSql(v, planeLiteral(p))} >= 0.0 " +
          s"THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
      }.mkString(" + ")

    // Winnowing fingerprint pipeline (tok -> positional k-gram md5 ->
    // 32-bit ints -> window mins -> distinct per doc -> shared-fp pairs),
    // shared by neardup_winnowing and dedup_components.
    val winnowH32 = foldSum(
      "list_transform(generate_series(1, 8), i -> " +
        "CAST(CASE WHEN ascii(substr(m, i, 1)) <= 57 " +
        "THEN ascii(substr(m, i, 1)) - 48 " +
        "ELSE ascii(substr(m, i, 1)) - 87 END AS BIGINT) " +
        "* CAST(pow(16.0, 8 - i) AS BIGINT))",
      "CAST(0 AS BIGINT)")
    val winnowCtes =
      s"""$tokCte,
         sh AS (SELECT doc_id, list_transform(generate_series(1, len(w)-4),
             i -> md5(array_to_string(w[i:i+4], ' '))) AS mh
           FROM tok WHERE len(w) >= 5),
         h AS (SELECT doc_id, list_transform(mh, m -> $winnowH32) AS hs FROM sh),
         fp AS (SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(hs)-3, 1)),
             j -> list_min(hs[j:j+3])))) AS fp FROM h),
         fpfreq AS (SELECT fp, count(*) AS c FROM fp GROUP BY 1),
         fpp AS (SELECT fp.doc_id, fp.fp FROM fp JOIN fpfreq USING (fp)
                 WHERE c >= 2 AND c <= 1000),
         pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_shared_fp
           FROM fpp a JOIN fpp b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY 1, 2)"""

    Map(
      "text_stats" ->
        s"""WITH $tokCte
           SELECT lang, source, count(*) AS n_docs,
             CAST(sum(len(w)) AS BIGINT) AS total_tokens,
             round(avg(len(w)), 6) AS avg_tokens,
             round(avg(n_chars), 6) AS avg_chars
           FROM tok GROUP BY lang, source ORDER BY lang, source""",

      "top_tokens" ->
        """SELECT token, count(*) AS n FROM (
             SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
             FROM documents)
           GROUP BY token ORDER BY n DESC, token LIMIT 20""",

      "lang_id_confusion" ->
        s"""WITH $tokCte,
           s AS (SELECT lang,
             len(list_filter(w, x -> ${markers("de")})) AS s_de,
             len(list_filter(w, x -> ${markers("en")})) AS s_en,
             len(list_filter(w, x -> ${markers("es")})) AS s_es,
             len(list_filter(w, x -> ${markers("fr")})) AS s_fr
             FROM tok)
           SELECT lang,
             CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unk'
                  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                  WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS predicted_lang,
             count(*) AS n_docs
           FROM s GROUP BY 1, 2 ORDER BY lang, predicted_lang""",

      "quality_scores" ->
        s"""WITH $tokCte,
           q AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of'
               OR x = 'and' OR x = 'is' OR x = 'in')) AS BIGINT) AS stop_hits,
             CASE WHEN len(w) = 0 THEN 0.0
                  ELSE CAST(${foldSum("list_transform(w, x -> length(x))", "CAST(0 AS BIGINT)")} AS DOUBLE) / len(w)
             END AS atl
             FROM tok),
           q2 AS (SELECT doc_id, n_tokens,
             CASE WHEN n_tokens = 0 THEN 0.0
                  ELSE CAST(stop_hits AS DOUBLE) / n_tokens END AS stopword_ratio,
             atl FROM q)
           SELECT doc_id, n_tokens, stopword_ratio,
             round(atl, 6) AS avg_token_len,
             round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
               + stopword_ratio * 0.3 + least(atl / 8.0, 1.0) * 0.2, 6)
               AS quality_score
           FROM q2 ORDER BY doc_id""",

      "doc_fingerprints" ->
        """SELECT md5(array_to_string(
             regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fingerprint,
           count(*) AS n_copies, min(doc_id) AS survivor_doc_id
           FROM documents GROUP BY 1 ORDER BY fingerprint""",

      "neardup_jaccard" ->
        s"""WITH $tokCte, $shCte,
           sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
           freq AS (SELECT shingle, count(*) AS c FROM sh GROUP BY 1),
           pruned AS (SELECT sh.doc_id, sh.shingle FROM sh
                      JOIN freq USING (shingle) WHERE c <= 1000),
           common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        count(*) AS n_common
                      FROM pruned a JOIN pruned b
                      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
           SELECT doc_a, doc_b, n_common,
             round(CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common), 6) AS jaccard
           FROM common JOIN sizes na ON na.doc_id = doc_a
                       JOIN sizes nb ON nb.doc_id = doc_b
           WHERE round(CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common), 6) >= 0.8
           ORDER BY doc_a, doc_b""",

      "neardup_minhash" -> {
        // hex→int fold of md5 substring [off+1, off+8] (mirrors Spark's
        // conv(substring(md5(shingle), off+1, 8), 16, 10)).
        def h32(off: Int) = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            s"CAST(CASE WHEN ascii(substr(md5(shingle), $off + i, 1)) <= 57 " +
            s"THEN ascii(substr(md5(shingle), $off + i, 1)) - 48 " +
            s"ELSE ascii(substr(md5(shingle), $off + i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH $tokCte, $shCte,
           hashed AS (SELECT doc_id, ${h32(0)} AS h1, ${h32(8)} AS h2 FROM sh),
           bands AS (SELECT doc_id, band,
               min((h1 + band * h2) % 4294967296) AS sig
             FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS band)
             GROUP BY doc_id, band),
           freq AS (SELECT band, sig, count(*) AS c FROM bands GROUP BY 1, 2),
           pruned AS (SELECT bands.* FROM bands JOIN freq USING (band, sig)
                      WHERE c >= 2 AND c <= 1000)
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_shared_bands
           FROM pruned a JOIN pruned b
             ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING count(*) >= 1 ORDER BY doc_a, doc_b"""
      },

      "neardup_winnowing" ->
        s"""WITH $winnowCtes
           SELECT doc_a, doc_b, n_shared_fp FROM pairs
           WHERE n_shared_fp >= 10 ORDER BY doc_a, doc_b""",

      // Positional 5-grams (POSITIONS matter — no list_distinct, unlike
      // shCte): pos is 1-based to match Spark's posexplode index + 1.
      "dup_span_report" ->
        s"""WITH $tokCte,
           sp AS (SELECT doc_id, i AS pos,
                    array_to_string(w[i:i+4], ' ') AS span
                  FROM tok, LATERAL unnest(generate_series(1, len(w)-4)) t(i))
           SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_occ
           FROM sp GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
           ORDER BY n_docs DESC, n_occ DESC, span LIMIT 100""",

      // Non-owner occurrences cut, text rebuilt from surviving token
      // positions; md5 compares the full rebuilt stream per doc.
      "span_cut_docs" ->
        s"""WITH $tokCte,
           sp AS (SELECT doc_id, i AS pos,
                    array_to_string(w[i:i+4], ' ') AS span
                  FROM tok, LATERAL unnest(generate_series(1, len(w)-4)) t(i)),
           dup AS (SELECT span, min(doc_id) AS own FROM sp GROUP BY 1
                   HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= 10000),
           cuts AS (SELECT s.doc_id, s.pos FROM sp s JOIN dup USING (span)
                    WHERE s.doc_id <> dup.own),
           isl AS (SELECT doc_id, pos,
                     CASE WHEN pos > coalesce(max(pos + 4) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                     THEN 1 ELSE 0 END AS flag
                   FROM cuts),
           isl2 AS (SELECT doc_id, pos, sum(flag) OVER (
                      PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
           ivs AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 4 AS e
                   FROM isl2 GROUP BY doc_id, island),
           toks AS (SELECT t.doc_id, i, w[i] AS tk FROM tok t,
                      LATERAL unnest(generate_series(1, len(w))) u(i)),
           kept AS (SELECT k.doc_id, k.i, k.tk FROM toks k
                    WHERE NOT EXISTS (SELECT 1 FROM ivs v
                      WHERE v.doc_id = k.doc_id AND k.i BETWEEN v.s AND v.e))
           SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_before,
             CAST(coalesce(g.n_after, 0) AS BIGINT) AS n_after,
             md5(coalesce(g.clean, '')) AS clean_md5
           FROM tok t LEFT JOIN (
             SELECT doc_id, count(*) AS n_after,
                    string_agg(tk, ' ' ORDER BY i) AS clean
             FROM kept GROUP BY doc_id) g USING (doc_id)
           ORDER BY t.doc_id""",

      // Interval-union coverage by gaps-and-islands, mirroring the Spark
      // windows exactly (integer positions — deterministic cross-engine).
      "doc_span_dup_ratio" ->
        s"""WITH $tokCte,
           sp AS (SELECT doc_id, len(w) AS n_tokens, i AS pos,
                    array_to_string(w[i:i+4], ' ') AS span
                  FROM tok, LATERAL unnest(generate_series(1, len(w)-4)) t(i)),
           dup AS (SELECT span FROM sp GROUP BY 1
                   HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= 10000),
           hits AS (SELECT doc_id, n_tokens, pos FROM sp JOIN dup USING (span)),
           isl AS (SELECT doc_id, n_tokens, pos,
                     CASE WHEN pos > coalesce(max(pos + 4) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                     THEN 1 ELSE 0 END AS flag
                   FROM hits),
           isl2 AS (SELECT doc_id, n_tokens, pos, sum(flag) OVER (
                      PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
           per_isl AS (SELECT doc_id, n_tokens, island, min(pos) AS s,
                         max(pos) AS e, count(*) AS nh
                       FROM isl2 GROUP BY doc_id, n_tokens, island)
           SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(sum(nh) AS BIGINT) AS n_dup_spans,
             CAST(count(*) AS BIGINT) AS n_islands,
             CAST(sum(e - s + 5) AS BIGINT) AS covered_tokens,
             round(CAST(sum(e - s + 5) AS DOUBLE)
               / CAST(n_tokens AS DOUBLE), 6) AS dup_ratio
           FROM per_isl GROUP BY doc_id, n_tokens ORDER BY doc_id""",

      // Components via transitive closure (recursive CTE) — structurally
      // different from Spark's label propagation, same fixpoint.
      "dedup_components" ->
        s"""WITH RECURSIVE $winnowCtes,
           edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                     WHERE n_shared_fp >= 10
                     UNION SELECT doc_b, doc_a FROM pairs
                     WHERE n_shared_fp >= 10),
           reach AS (
             SELECT a, b FROM edges
             UNION
             SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
           SELECT a AS doc_id, least(a, min(b)) AS component
           FROM reach GROUP BY a ORDER BY doc_id""",

      "dedup_survivors" ->
        // same component CTEs; non-survivors (doc_id <> component = min
        // member) are dropped from the corpus by anti-join
        s"""WITH RECURSIVE $winnowCtes,
           edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                     WHERE n_shared_fp >= 10
                     UNION SELECT doc_b, doc_a FROM pairs
                     WHERE n_shared_fp >= 10),
           reach AS (
             SELECT a, b FROM edges
             UNION
             SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
           labels AS (SELECT a AS doc_id, least(a, min(b)) AS component
                      FROM reach GROUP BY a)
           SELECT d.doc_id, d.lang, d.source, d.n_chars
           FROM documents d
           WHERE d.doc_id NOT IN
             (SELECT doc_id FROM labels WHERE doc_id <> component)
           ORDER BY d.doc_id""",

      "neardup_simhash" -> {
        // 32-bit word of md5(t) at hex offset `off` (mirrors Spark's
        // conv(substring(md5(tok), off+1, 8), 16, 10)).
        def w32(off: Int) = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            s"CAST(CASE WHEN ascii(substr(md5(t), $off + i, 1)) <= 57 " +
            s"THEN ascii(substr(md5(t), $off + i, 1)) - 48 " +
            s"ELSE ascii(substr(md5(t), $off + i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        // ±1 vote sum for bit `bexp` of each 32-bit word in list `lst`.
        def vote(lst: String, bexp: String) = foldSum(
          s"list_transform($lst, hh -> CASE WHEN " +
            s"CAST(floor(hh / pow(2.0, $bexp)) AS BIGINT) % 2 = 1 " +
            "THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)",
          "CAST(0 AS BIGINT)")
        // 64-bit signature: bits 0-31 from word 1, 32-62 from word 2
        // (pow(2,j) is a power of two — exact in double, BIGINT-castable
        // through 2^62); bit 63 added as the Long.MIN_VALUE literal since
        // 2^63 overflows BIGINT.
        val lo = foldSum(
          "list_transform(generate_series(0, 31), j -> " +
            "CASE WHEN " + vote("hlo", "j") + " > 0 " +
            "THEN CAST(pow(2.0, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END)",
          "CAST(0 AS BIGINT)")
        val hi62 = foldSum(
          "list_transform(generate_series(32, 62), j -> " +
            "CASE WHEN " + vote("hhi", "j - 32") + " > 0 " +
            "THEN CAST(pow(2.0, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END)",
          "CAST(0 AS BIGINT)")
        val bit63 = "CASE WHEN " + vote("hhi", "31") + " > 0 " +
          "THEN (-9223372036854775807 - 1) ELSE CAST(0 AS BIGINT) END"
        s"""WITH toks AS (SELECT doc_id, list_distinct(
               regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents),
           h AS (SELECT doc_id,
               list_transform(w, t -> ${w32(0)}) AS hlo,
               list_transform(w, t -> ${w32(8)}) AS hhi
             FROM toks),
           sig AS (SELECT doc_id, $lo + $hi62 + $bit63 AS simhash FROM h),
           b AS (SELECT doc_id, simhash, band,
               ((simhash >> (band * 16)) & 65535) AS bsig
             FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band)),
           freq AS (SELECT band, bsig, count(*) AS c FROM b GROUP BY 1, 2),
           pruned AS (SELECT b.* FROM b JOIN freq USING (band, bsig)
                      WHERE c >= 2 AND c <= 1000),
           cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b2.simhash)) AS BIGINT) AS hamming
             FROM pruned a JOIN pruned b2
               ON a.band = b2.band AND a.bsig = b2.bsig
               AND a.doc_id < b2.doc_id)
           SELECT doc_a, doc_b, hamming FROM cand
           WHERE hamming <= 3 ORDER BY doc_a, doc_b"""
      },

      "knn_bruteforce" ->
        s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
           p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               ${dotSql("q.emb", "c.emb")} AS d,
               ${dotSql("q.emb", "q.emb")} AS qn2,
               ${dotSql("c.emb", "c.emb")} AS cn2
             FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
           s AS (SELECT query_id, cand_id,
               round(CASE WHEN sqrt(qn2) = 0.0 OR sqrt(cn2) = 0.0 THEN 0.0
                          ELSE d / (sqrt(qn2) * sqrt(cn2)) END, 6) AS cos_sim
             FROM p)
           SELECT query_id, cand_id, cos_sim, CAST(rn AS BIGINT) AS rank
           FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, cand_id) AS rn FROM s)
           WHERE rn <= 5 ORDER BY query_id, rank""",

      "neardup_cosine" ->
        s"""WITH v AS (SELECT vec_id, embedding AS emb,
               ${dotSql("embedding", "embedding")} AS n2 FROM embeddings),
           p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(CASE WHEN sqrt(a.n2) = 0.0 OR sqrt(b.n2) = 0.0 THEN 0.0
                          ELSE ${dotSql("a.emb", "b.emb")}
                               / (sqrt(a.n2) * sqrt(b.n2)) END, 6) AS cos_sim
             FROM v a JOIN v b ON a.vec_id < b.vec_id)
           SELECT vec_a, vec_b, cos_sim FROM p
           WHERE cos_sim >= 0.4 ORDER BY vec_a, vec_b""",

      "neardup_cosine_lsh" ->
        s"""WITH v AS (SELECT vec_id, embedding AS emb,
               ${dotSql("embedding", "embedding")} AS n2,
               ${bucketOf("embedding")} AS bucket FROM embeddings),
           p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
               round(CASE WHEN sqrt(a.n2) = 0.0 OR sqrt(b.n2) = 0.0 THEN 0.0
                          ELSE ${dotSql("a.emb", "b.emb")}
                               / (sqrt(a.n2) * sqrt(b.n2)) END, 6) AS cos_sim
             FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
           SELECT vec_a, vec_b, bucket, cos_sim FROM p
           WHERE cos_sim >= 0.4 ORDER BY vec_a, vec_b""",

      "knn_lsh" ->
        s"""WITH v AS (SELECT vec_id, embedding AS emb,
               ${bucketOf("embedding")} AS bucket FROM embeddings),
           p AS (SELECT q.vec_id AS query_id, q.bucket AS bucket,
               c.vec_id AS cand_id,
               ${dotSql("q.emb", "c.emb")} AS d,
               ${dotSql("q.emb", "q.emb")} AS qn2,
               ${dotSql("c.emb", "c.emb")} AS cn2
             FROM v q JOIN v c ON q.vec_id < 10 AND c.bucket = q.bucket
               AND c.vec_id <> q.vec_id),
           s AS (SELECT query_id, bucket, cand_id,
               round(CASE WHEN sqrt(qn2) = 0.0 OR sqrt(cn2) = 0.0 THEN 0.0
                          ELSE d / (sqrt(qn2) * sqrt(cn2)) END, 6) AS cos_sim
             FROM p)
           SELECT query_id, bucket, cand_id, cos_sim, CAST(rn AS BIGINT) AS rank
           FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, cand_id) AS rn FROM s)
           WHERE rn <= 5 ORDER BY query_id, rank""",

      // OR-amplified LSH: a candidate qualifies if it shares the query's
      // bucket in ANY of the 12 seeded tables; the single OR-join predicate
      // yields each (query, cand) pair once, mirroring Spark's post-score
      // dropDuplicates
      "knn_lsh_or" ->
        s"""WITH v AS (SELECT vec_id, embedding AS emb,
               ${(0 until 12).map(t =>
                  s"${orBucketOf("embedding", t)} AS b$t").mkString(", ")}
             FROM embeddings),
           p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               ${dotSql("q.emb", "c.emb")} AS d,
               ${dotSql("q.emb", "q.emb")} AS qn2,
               ${dotSql("c.emb", "c.emb")} AS cn2
             FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
               AND (${(0 until 12).map(t => s"q.b$t = c.b$t").mkString(" OR ")})),
           s AS (SELECT query_id, cand_id,
               round(CASE WHEN sqrt(qn2) = 0.0 OR sqrt(cn2) = 0.0 THEN 0.0
                          ELSE d / (sqrt(qn2) * sqrt(cn2)) END, 6) AS cos_sim
             FROM p)
           SELECT query_id, cand_id, cos_sim, CAST(rn AS BIGINT) AS rank
           FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, cand_id) AS rn FROM s)
           WHERE rn <= 5 ORDER BY query_id, rank""",

      "hard_negatives" ->
        s"""WITH v AS (SELECT vec_id, embedding AS emb,
               ${bucketOf("embedding")} AS bucket FROM embeddings),
           p AS (SELECT q.vec_id AS anchor_id, c.vec_id AS neg_id,
               ${dotSql("q.emb", "c.emb")} AS d,
               ${dotSql("q.emb", "q.emb")} AS qn2,
               ${dotSql("c.emb", "c.emb")} AS cn2
             FROM v q JOIN v c ON q.vec_id < 10 AND c.bucket = q.bucket
               AND c.vec_id <> q.vec_id),
           s AS (SELECT anchor_id, neg_id,
               round(CASE WHEN sqrt(qn2) = 0.0 OR sqrt(cn2) = 0.0 THEN 0.0
                          ELSE d / (sqrt(qn2) * sqrt(cn2)) END, 6) AS cos_sim
             FROM p)
           SELECT anchor_id, neg_id, cos_sim, CAST(rn AS BIGINT) AS neg_rank
           FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                   ORDER BY cos_sim DESC, neg_id) AS rn FROM s
                 WHERE cos_sim >= 0.05 AND cos_sim < 0.4)
           WHERE rn <= 5 ORDER BY anchor_id, neg_rank""",

      "tfidf_top_tokens" ->
        s"""WITH $tokCte,
           t AS (SELECT doc_id, unnest(w) AS token FROM tok),
           tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
           dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
           n AS (SELECT count(*) AS n_docs FROM documents),
           scored AS (SELECT doc_id, token, tf, df,
               round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
             FROM tf JOIN dfq USING (token) CROSS JOIN n
             WHERE doc_id < 20),
           r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, token) AS rank FROM scored)
           SELECT doc_id, token, tf, df, tfidf, CAST(rank AS BIGINT) AS rank
           FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",

      "props_map_stats" ->
        """SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INT)
             / 10.0) AS BIGINT) AS k_decile,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k
           FROM events GROUP BY 1 ORDER BY 1""",

      "salted_hourly_counts" ->
        """SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
           count(*) AS n
           FROM events GROUP BY 1 ORDER BY 1""",

      "contrastive_negatives" -> {
        // same md5-bucket family as doc_splits, applied twice: once to
        // the doc key (anchor bucket) and once to "key#rank" (the draw)
        def hex32(c: String) = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            s"CAST(CASE WHEN ascii(substr($c, i, 1)) <= 57 " +
            s"THEN ascii(substr($c, i, 1)) - 48 " +
            s"ELSE ascii(substr($c, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH d AS (SELECT doc_id,
               ${hex32("md5(CAST(doc_id AS VARCHAR))")} % 16 AS bucket
             FROM documents),
           reps AS (SELECT bucket AS nb, min(doc_id) AS neg_doc_id
                    FROM d GROUP BY 1),
           a AS (SELECT d.doc_id AS anchor_doc_id, d.bucket AS ab,
                   r AS neg_rank,
                   ${hex32("md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(r AS VARCHAR))")} % 16 AS nb
                 FROM d, LATERAL unnest(generate_series(1, 3)) t(r))
           SELECT anchor_doc_id, neg_rank, neg_doc_id
           FROM a JOIN reps USING (nb)
           WHERE nb != ab
           ORDER BY anchor_doc_id, neg_rank"""
      },

      "doc_splits" -> {
        // 32-bit int from the first 8 hex chars of md5 (mirrors Spark's
        // conv(substring(md5(...), 1, 8), 16, 10)).
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT doc_id, n_chars,
               md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents),
           h AS (SELECT doc_id, n_chars, $hex32 % 100 AS bucket FROM m)
           SELECT CASE WHEN bucket < 80 THEN 'train'
                       WHEN bucket < 90 THEN 'val'
                       ELSE 'test' END AS split,
             count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
           FROM h GROUP BY 1 ORDER BY split"""
      },

      // The shard formula is the plain global prefix-sum cut; Spark's
      // bucket-decomposed evaluation reconstructs the same integers.
      "token_balanced_shards" ->
        """WITH tokc AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS ord,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
             FROM documents),
           c AS (SELECT doc_id, w,
               sum(w) OVER (ORDER BY ord, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(w) OVER () AS total FROM tokc)
           SELECT least(CAST(7 AS BIGINT),
               CAST(((cum - w) * 8) // total AS BIGINT)) AS shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(w) AS BIGINT) AS sum_tokens
           FROM c GROUP BY 1 ORDER BY shard""",

      "token_estimates" ->
        """SELECT lang, count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
             AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text,
             '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]'))) AS BIGINT) AS bpe_tokens,
           CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)
             AS char_est_tokens
           FROM documents GROUP BY lang ORDER BY lang""",

      "contamination_report" -> {
        // hashBucket mirror (see doc_splits) on the shingle-row split.
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH $tokCte, $shCte,
           m AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS mh
                 FROM documents),
           spl AS (SELECT doc_id,
               CASE WHEN ($hex32 % 100) < 80 THEN 'train'
                    WHEN ($hex32 % 100) < 90 THEN 'val'
                    ELSE 'test' END AS split FROM m),
           shs AS (SELECT sh.doc_id, shingle, split
                   FROM sh JOIN spl USING (doc_id)
                   WHERE split IN ('train', 'test')),
           freq AS (SELECT shingle, count(*) AS c FROM shs GROUP BY 1),
           ok AS (SELECT shs.* FROM shs JOIN freq USING (shingle)
                  WHERE c <= 1000),
           pairs AS (SELECT a.doc_id AS test_doc, b.doc_id AS train_doc,
               count(*) AS n_shared
             FROM ok a JOIN ok b ON a.shingle = b.shingle
               AND a.split = 'test' AND b.split = 'train'
             GROUP BY 1, 2)
           SELECT test_doc, train_doc, n_shared FROM pairs
           WHERE n_shared >= 5 ORDER BY test_doc, train_doc"""
      },

      "doc_repetition" ->
        """WITH t2 AS (SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
           FROM documents),
           r AS (SELECT doc_id, token, count(*) AS c FROM t2 GROUP BY 1, 2),
           s AS (SELECT doc_id, token, c,
               max(c) OVER (PARTITION BY doc_id) AS mx,
               sum(c) OVER (PARTITION BY doc_id) AS tot FROM r)
           SELECT doc_id, CAST(tot AS BIGINT) AS n_tokens,
             min(CASE WHEN c = mx THEN token END) AS top_token,
             CAST(mx AS BIGINT) AS top_count,
             round(CAST(mx AS DOUBLE) / tot, 6) AS top_ratio
           FROM s GROUP BY doc_id, tot, mx ORDER BY doc_id""",

      "zorder_codes" -> {
        val z = (0 until 5).map(j =>
          s"(((a >> $j) & 1) * ${1L << (2 * j)} + " +
            s"((b >> $j) & 1) * ${1L << (2 * j + 1)})").mkString(" + ")
        s"""SELECT c_custkey, $z AS zcode
           FROM (SELECT c_custkey, c_custkey % 32 AS a,
                   CAST(c_nationkey AS BIGINT) AS b FROM customer)
           ORDER BY c_custkey"""
      },

      "hourly_gapfill" ->
        """WITH h AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP))
               AS hour_start, count(*) AS c
             FROM events WHERE event_type = 'purchase' AND value > 200
             GROUP BY 1),
           bounds AS (SELECT min(hour_start) mn, max(hour_start) mx FROM h),
           spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
               AS hour_start FROM bounds)
           SELECT hour_start, CAST(coalesce(c, 0) AS BIGINT) AS n_events
           FROM spine LEFT JOIN h USING (hour_start)
           ORDER BY hour_start""",

      "fuzzy_part_pairs" ->
        """WITH b AS (SELECT p_partkey, p_name,
             split_part(p_name, ' ', 1) AS block FROM part),
           pairs AS (SELECT a.block,
               levenshtein(a.p_name, c.p_name) AS edit_dist
             FROM b a JOIN b c
               ON a.block = c.block AND a.p_partkey < c.p_partkey
             WHERE levenshtein(a.p_name, c.p_name) <= 1)
           SELECT block, count(*) AS n_pairs,
             round(avg(edit_dist), 6) AS avg_dist
           FROM pairs GROUP BY block ORDER BY block""",

      "fuzzy_part_pairs_jw" ->
        """WITH b AS (SELECT p_partkey, p_name,
             split_part(p_name, ' ', 1) AS block FROM part),
           pairs AS (SELECT a.block,
               jaro_winkler_similarity(a.p_name, c.p_name) AS jw
             FROM b a JOIN b c
               ON a.block = c.block AND a.p_partkey < c.p_partkey
             WHERE jaro_winkler_similarity(a.p_name, c.p_name) >= 0.9)
           SELECT block, count(*) AS n_pairs,
             round(avg(jw), 6) AS avg_sim
           FROM pairs GROUP BY block ORDER BY block""",

      // American Soundex reproduced in DuckDB SQL (it has no builtin):
      // a list_reduce fold over the word's characters carrying
      // "code-so-far|last-code" state, with Spark's exact mapping table
      // ('7' = h/w, skipped without resetting the last code; '0' =
      // vowels, skipped but resetting it) — so the phonetic blocks
      // match Spark's builtin soundex byte-for-byte and the pairing
      // below is the same blocked-JW shape as fuzzy_part_pairs_jw.
      "fuzzy_soundex_pairs" -> {
        val sx =
          """CASE WHEN NOT regexp_matches(w, '^[a-zA-Z]') THEN w ELSE
             rpad(split_part(list_reduce(
               list_prepend(
                 upper(w[1]) || '|' ||
                   substr('01230127022455012623017202',
                          ascii(upper(w[1])) - 64, 1),
                 regexp_extract_all(substr(w, 2), '.')),
               (acc, ch) -> CASE
                 WHEN ascii(upper(ch)) < 65 OR ascii(upper(ch)) > 90
                   THEN split_part(acc, '|', 1) || '|0'
                 WHEN substr('01230127022455012623017202',
                        ascii(upper(ch)) - 64, 1) = '7'
                   THEN acc
                 WHEN substr('01230127022455012623017202',
                        ascii(upper(ch)) - 64, 1) = '0'
                   THEN split_part(acc, '|', 1) || '|0'
                 WHEN substr('01230127022455012623017202',
                        ascii(upper(ch)) - 64, 1) <> split_part(acc, '|', 2)
                      AND length(split_part(acc, '|', 1)) < 4
                   THEN split_part(acc, '|', 1) ||
                        substr('01230127022455012623017202',
                               ascii(upper(ch)) - 64, 1) ||
                        '|' || substr('01230127022455012623017202',
                                      ascii(upper(ch)) - 64, 1)
                 ELSE split_part(acc, '|', 1) || '|' ||
                      substr('01230127022455012623017202',
                             ascii(upper(ch)) - 64, 1)
                 END), '|', 1), 4, '0')
             END"""
        s"""WITH t AS (SELECT p_partkey, p_name,
               split_part(p_name, ' ', 1) AS w FROM part),
           b AS (SELECT p_partkey, p_name, $sx AS block FROM t),
           pairs AS (SELECT a.block,
               jaro_winkler_similarity(a.p_name, c.p_name) AS jw
             FROM b a JOIN b c
               ON a.block = c.block AND a.p_partkey < c.p_partkey
             WHERE jaro_winkler_similarity(a.p_name, c.p_name) >= 0.9)
           SELECT block, count(*) AS n_pairs,
             round(avg(jw), 6) AS avg_sim
           FROM pairs GROUP BY block ORDER BY block"""
      },

      "mixture_counts" -> {
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT lang, md5(CAST(doc_id AS VARCHAR)) AS mh
               FROM documents),
           h AS (SELECT lang, $hex32 % 100 AS bucket FROM m)
           SELECT lang, count(*) AS n_docs FROM h
           WHERE bucket < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50
                                    WHEN 'zh' THEN 25 ELSE 10 END
           GROUP BY 1 ORDER BY 1"""
      },

      "embedding_quant_error" ->
        """WITH s AS (SELECT vec_id, label, embedding,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
           FROM embeddings),
           e AS (SELECT label,
               CASE WHEN scale = 0 THEN 0.0 ELSE
                 list_reduce(list_prepend(0.0, list_transform(embedding,
                   x -> abs(floor(CAST(x AS DOUBLE) / scale + 0.5) * scale
                     - CAST(x AS DOUBLE)))), (a, b) -> a + b)
                 / len(embedding) END AS mae
             FROM s)
           SELECT label, count(*) AS n_vecs,
             round(avg(mae), 6) AS avg_abs_err,
             round(max(mae), 6) AS max_abs_err
           FROM e GROUP BY label ORDER BY label""",

      "context_packing" ->
        """WITH c AS (SELECT lang, doc_id,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
           FROM documents),
           b AS (SELECT lang, doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY lang
                 ORDER BY doc_id) - n_tokens) / 2048.0) AS BIGINT) AS bin
             FROM c)
           SELECT lang, bin, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS window_tokens
           FROM b GROUP BY 1, 2 ORDER BY 1, 2""",

      "label_centroids" ->
        """SELECT label, i - 1 AS dim, round(avg(e), 4) AS centroid
           FROM (SELECT label,
                   CAST(unnest(embedding[1:8]) AS DOUBLE) AS e,
                   generate_subscripts(embedding[1:8], 1) AS i
                 FROM embeddings)
           GROUP BY label, i ORDER BY label, dim""",

      "media_feature_stats" ->
        s"""WITH f AS (SELECT doc_id, source AS kind,
               CAST(length(text) AS BIGINT) AS byte_len,
               ${foldSum(
                 "list_transform(generate_series(1, length(text)), " +
                   "i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))",
                 "CAST(0 AS BIGINT)")} AS checksum
             FROM documents),
           g AS (SELECT kind, byte_len, checksum,
               CASE WHEN byte_len = 0 THEN 0.0
                    ELSE floor((CAST(checksum AS DOUBLE) / byte_len) * 1000000.0)
                         / 1000000.0 END AS feat_mean
             FROM f)
           SELECT kind, count(*) AS n_items,
             CAST(sum(byte_len) AS BIGINT) AS total_bytes,
             CAST(sum(checksum) AS BIGINT) AS total_checksum,
             round(avg(feat_mean), 4) AS avg_feat_mean
           FROM g GROUP BY kind ORDER BY kind""",

      "media_dims_stats" ->
        // ground truth is the doc_id arithmetic the payload generator
        // encodes into the headers; Spark's side decodes the actual bytes
        """WITH m AS (SELECT
             CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                  WHEN 2 THEN 'gif' ELSE 'unknown' END AS media_format,
             CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 16 + doc_id % 317 END AS w,
             CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 16 + doc_id % 211 END AS h
           FROM documents)
           SELECT media_format, count(*) AS n_items,
             CAST(sum(w) AS BIGINT) AS sum_width,
             CAST(sum(h) AS BIGINT) AS sum_height,
             CAST(min(w) AS BIGINT) AS min_width,
             CAST(max(h) AS BIGINT) AS max_height
           FROM m GROUP BY media_format ORDER BY media_format""",

      "media_audio_stats" ->
        // ground truth is the doc_id arithmetic the payload generator
        // encodes into the headers; Spark's side decodes the actual bytes.
        // duration: the parser computes declared_bytes*1000/byte_rate in
        // integer math; the shared block-align factor cancels, so
        // floor(frames*1000/rate) is the same value.
        """WITH m AS (SELECT
             CASE doc_id % 3 WHEN 0 THEN 'wav' WHEN 1 THEN 'flac'
                  ELSE 'unknown' END AS audio_format,
             CASE WHEN doc_id % 3 = 2 THEN 0
                  ELSE 8000 + (doc_id % 353) * 100 END AS rate,
             CASE WHEN doc_id % 3 = 2 THEN 0
                  ELSE 1 + doc_id % 2 END AS ch,
             CASE WHEN doc_id % 3 = 2 THEN 0
                  ELSE 8 * (1 + doc_id % 4) END AS bits,
             CASE WHEN doc_id % 3 = 2 THEN 0
                  ELSE CAST(floor((100 + doc_id % 1000) * 1000.0 /
                    (8000 + (doc_id % 353) * 100)) AS BIGINT) END AS dur
           FROM documents)
           SELECT audio_format, count(*) AS n_items,
             CAST(sum(rate) AS BIGINT) AS sum_sample_rate,
             CAST(sum(ch) AS BIGINT) AS sum_channels,
             CAST(sum(bits) AS BIGINT) AS sum_bits,
             CAST(sum(dur) AS BIGINT) AS sum_duration_ms
           FROM m GROUP BY audio_format ORDER BY audio_format""",

      "bloom_pruned_revenue" -> urgentRevenueOracle,
      // the twin pair shares it: the bloom prune is a no-false-negative
      // pre-filter, so all three forms must equal the plain join
      "revenue_urgent_plain" -> urgentRevenueOracle,
      "revenue_urgent_bloom_merge" -> urgentRevenueOracle,

      "redaction_stats" ->
        """WITH r AS (SELECT lang, text,
             len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             len(regexp_extract_all(text, '\b(spark|stream)\b'))
               AS n_engine_term,
             regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '[REDACTED]', 'g'),
               '\b(spark|stream)\b', '[REDACTED]', 'g') AS red
           FROM documents)
           SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN n_email > 0 OR n_engine_term > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_redacted,
             CAST(sum(n_email) AS BIGINT) AS total_email,
             CAST(sum(n_engine_term) AS BIGINT) AS total_engine_term,
             CAST(sum(length(text) - length(red)) AS BIGINT) AS chars_removed
           FROM r GROUP BY lang ORDER BY lang""",

      "doc_chunks" ->
        // chunk i covers tokens [i*24+1, i*24+32] (1-based inclusive) =
        // Spark's slice(toks, i*24+1, 32); last chunk idx =
        // ceil(max(n-32,0)/24) mirrors Chunking.chunkByTokens
        """WITH t AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
           n AS (SELECT doc_id, w, len(w) AS n FROM t),
           c AS (SELECT doc_id, w, unnest(generate_series(0,
               CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT))) AS chunk_id
             FROM n WHERE n > 0)
           SELECT doc_id, chunk_id,
             CAST(len(w[chunk_id*24 + 1 : chunk_id*24 + 32]) AS BIGINT)
               AS n_tokens,
             md5(array_to_string(w[chunk_id*24 + 1 : chunk_id*24 + 32], ' '))
               AS chunk_hash
           FROM c ORDER BY doc_id, chunk_id""",

      "quality_funnel" -> {
        val lenSum = foldSum(
          "list_transform(w, x -> CAST(length(x) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH q AS (SELECT lang, len(w) AS n_tokens,
             len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of'
               OR x = 'and' OR x = 'is' OR x = 'in')) AS stop_hits,
             CASE WHEN len(w) = 0 THEN 0.0
                  ELSE CAST($lenSum AS DOUBLE) / len(w) END AS avg_len
           FROM (SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+')
                   AS w FROM documents))
           SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_min_tokens,
             CAST(sum(CASE WHEN avg_len >= 3.0 AND avg_len <= 10.0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_avg_len,
             CAST(sum(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_stopwords,
             CAST(sum(CASE WHEN n_tokens >= 20 AND avg_len >= 3.0
               AND avg_len <= 10.0 AND stop_hits >= 2
               THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
           FROM q GROUP BY lang ORDER BY lang"""
      },

      "token_histogram" ->
        """SELECT CAST(floor(len(regexp_extract_all(lower(text),
             '[a-z0-9]+')) / 10.0) * 10 AS BIGINT) AS bucket_lo,
           count(*) AS n_docs
           FROM documents GROUP BY 1 ORDER BY 1""",

      "span_contamination_indexed" -> {
        // same 80/20 hashBucket split; the oracle joins span TEXT where
        // Spark joins md5(span) — identical verdicts, md5 is injective
        // on these keys
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT doc_id, text,
               md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents),
           d AS (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
               $hex32 % 100 AS bucket FROM m),
           csp AS (SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS span
                   FROM d, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
                   WHERE bucket < 80),
           bsp AS (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS span
                   FROM d, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
                   WHERE bucket >= 80)
           SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(CASE WHEN c.span IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_seen,
             round(CAST(sum(CASE WHEN c.span IS NULL THEN 0 ELSE 1 END)
                 AS DOUBLE) / count(*), 6) AS seen_ratio
           FROM bsp b LEFT JOIN csp c USING (span)
           GROUP BY b.doc_id ORDER BY b.doc_id"""
      },

      "span_cut_indexed" -> {
        // corpus spans own everything; batch hits -> islands -> rebuild
        // (same algebra as span_cut_docs, corpus side from the split)
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT doc_id, text,
               md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents),
           d AS (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
               $hex32 % 100 AS bucket FROM m),
           csp AS (SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS span
                   FROM d, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
                   WHERE bucket < 80),
           bsp AS (SELECT doc_id, i AS pos,
                     array_to_string(w[i:i+4], ' ') AS span
                   FROM d, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
                   WHERE bucket >= 80),
           cuts AS (SELECT b.doc_id, b.pos FROM bsp b
                    JOIN csp c USING (span)),
           isl AS (SELECT doc_id, pos,
                     CASE WHEN pos > coalesce(max(pos + 4) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                     THEN 1 ELSE 0 END AS flag
                   FROM cuts),
           isl2 AS (SELECT doc_id, pos, sum(flag) OVER (
                      PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
           ivs AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 4 AS e
                   FROM isl2 GROUP BY doc_id, island),
           btoks AS (SELECT b.doc_id, i, w[i] AS tk
                     FROM d b, LATERAL unnest(generate_series(1, len(w))) u(i)
                     WHERE bucket >= 80),
           kept AS (SELECT k.doc_id, k.i, k.tk FROM btoks k
                    WHERE NOT EXISTS (SELECT 1 FROM ivs v
                      WHERE v.doc_id = k.doc_id AND k.i BETWEEN v.s AND v.e))
           SELECT b.doc_id, CAST(len(b.w) AS BIGINT) AS n_before,
             CAST(coalesce(g.n_after, 0) AS BIGINT) AS n_after,
             md5(coalesce(g.clean, '')) AS clean_md5
           FROM d b LEFT JOIN (
             SELECT doc_id, count(*) AS n_after,
                    string_agg(tk, ' ' ORDER BY i) AS clean
             FROM kept GROUP BY doc_id) g USING (doc_id)
           WHERE b.bucket >= 80 ORDER BY b.doc_id"""
      },

      "incremental_new_docs" -> {
        // hashBucket mirror (see doc_splits): 80/20 corpus/batch split,
        // then batch fingerprints left-join the corpus's distinct set
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT doc_id, lang, text,
               md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents),
           d AS (SELECT doc_id, lang,
               md5(array_to_string(
                 regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp,
               $hex32 % 100 AS bucket FROM m),
           corpus AS (SELECT DISTINCT fp FROM d WHERE bucket < 80),
           batch AS (SELECT lang, fp FROM d WHERE bucket >= 80
             UNION ALL
             SELECT lang, fp FROM d WHERE bucket < 80 AND doc_id % 20 = 0)
           SELECT b.lang, count(*) AS n_batch,
             CAST(sum(CASE WHEN c.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new
           FROM batch b LEFT JOIN corpus c ON b.fp = c.fp
           GROUP BY b.lang ORDER BY b.lang"""
      },

      "conversion_funnel" ->
        // chained window-mins: stage i's min only ranges over events
        // strictly after the user's stage i-1 time
        """WITH w0 AS (SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS s0 FROM events),
           w1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > s0
               THEN ts END) OVER (PARTITION BY user_id) AS s1 FROM w0),
           w2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s1
               THEN ts END) OVER (PARTITION BY user_id) AS s2 FROM w1),
           u AS (SELECT user_id, min(s0) AS s0, min(s1) AS s1, min(s2) AS s2
             FROM w2 GROUP BY user_id),
           c AS (SELECT
               count(CASE WHEN s0 IS NOT NULL THEN 1 END) AS n0,
               count(CASE WHEN s1 IS NOT NULL THEN 1 END) AS n1,
               count(CASE WHEN s2 IS NOT NULL THEN 1 END) AS n2 FROM u)
           SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
             n0 AS n_users, CASE WHEN n0 = 0 THEN 0.0
               ELSE round(CAST(n0 AS DOUBLE) / n0, 6) END AS rate_vs_prev
           FROM c
           UNION ALL SELECT 1, 'click', n1, CASE WHEN n0 = 0 THEN 0.0
             ELSE round(CAST(n1 AS DOUBLE) / n0, 6) END FROM c
           UNION ALL SELECT 2, 'purchase', n2, CASE WHEN n1 = 0 THEN 0.0
             ELSE round(CAST(n2 AS DOUBLE) / n1, 6) END FROM c
           ORDER BY stage_idx""",

      "cohort_retention" ->
        // week-truncated dates make the day diff an exact multiple of 7
        """WITH c AS (SELECT user_id,
             date_trunc('week', min(ts)) AS cohort_week
           FROM events GROUP BY user_id),
           a AS (SELECT DISTINCT user_id,
               date_trunc('week', ts) AS active_week
             FROM events)
           SELECT cohort_week,
             CAST(date_diff('day', cohort_week, active_week) // 7 AS BIGINT)
               AS weeks_since,
             count(*) AS n_users
           FROM a JOIN c USING (user_id)
           GROUP BY 1, 2 ORDER BY 1, 2""",

      "lang_doc_sample" ->
        """WITH r AS (SELECT lang, doc_id, n_chars,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
               AS sample_rank
           FROM documents
           WHERE md5(CAST(doc_id AS VARCHAR)) < '8')
           SELECT lang, sample_rank, doc_id, n_chars FROM r
           WHERE sample_rank <= 3 ORDER BY lang, sample_rank""",

      "twap_by_user" ->
        """WITH h AS (SELECT user_id, value,
             CAST(epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id))
               - epoch_us(ts) AS DOUBLE) AS hold
           FROM events)
           SELECT user_id, count(*) AS n_intervals,
             round(sum(value * hold) / sum(hold), 6) AS twap
           FROM h WHERE hold IS NOT NULL
           GROUP BY user_id ORDER BY user_id""",

      "frame_sample_stats" -> {
        // frame k covers bytes [k*128+1, k*128+least(64, n-k*128)]; the
        // ascii fold mirrors the stub's unsigned-byte checksum (text is
        // ascii, so char == byte)
        val frameSum = foldSum(
          "list_transform(generate_series(1, least(64, n - k*128)), " +
            "i -> CAST(ascii(substr(text, CAST(k*128 + i AS INTEGER), 1)) " +
            "AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH f AS (SELECT source AS kind, text, length(text) AS n
               FROM documents),
           e AS (SELECT kind, text, n,
               unnest(generate_series(0,
                 CAST(ceil(n / 128.0) AS BIGINT) - 1)) AS k
             FROM f WHERE n > 0),
           fr AS (SELECT kind,
               CAST(least(64, n - k*128) AS BIGINT) AS frame_len,
               $frameSum AS checksum
             FROM e)
           SELECT kind, count(*) AS n_frames,
             CAST(sum(frame_len) AS BIGINT) AS total_frame_bytes,
             CAST(sum(checksum) AS BIGINT) AS total_checksum
           FROM fr GROUP BY kind ORDER BY kind"""
      },

      "top3_orders_per_cust" ->
        // the aggregate's (v desc, id asc) order == this window's order
        """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
           FROM orders)
           SELECT o_custkey, rank, o_orderkey, o_totalprice FROM r
           WHERE rank <= 3 ORDER BY o_custkey, rank""",

      "top3_orders_per_cust_window" ->
        // result-identical control twin: same SQL as the aggregate form
        """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
           FROM orders)
           SELECT o_custkey, rank, o_orderkey, o_totalprice FROM r
           WHERE rank <= 3 ORDER BY o_custkey, rank""",

      "zscore_outliers" ->
        """WITH z AS (SELECT o_orderpriority,
             (o_totalprice - avg(o_totalprice)
               OVER (PARTITION BY o_orderpriority)) /
             stddev_samp(o_totalprice)
               OVER (PARTITION BY o_orderpriority) AS z
           FROM orders)
           SELECT o_orderpriority, count(*) AS n_orders,
             CAST(sum(CASE WHEN abs(z) > 2.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
             round(max(z), 4) AS max_z
           FROM z GROUP BY 1 ORDER BY 1""",

      "salted_join_segments" ->
        // the salt is internal plumbing: the oracle is the PLAIN join
        """SELECT c_mktsegment, count(*) AS n_events,
           round(sum(value), 2) AS total_value
           FROM events e JOIN customer c ON e.user_id = c.c_custkey
           GROUP BY 1 ORDER BY 1""",

      "adaptive_join_segments" ->
        // strategy choice is internal plumbing: same plain-join oracle
        """SELECT c_mktsegment, count(*) AS n_events,
           round(sum(value), 2) AS total_value
           FROM events e JOIN customer c ON e.user_id = c.c_custkey
           GROUP BY 1 ORDER BY 1""",

      "catalog_join_segments" ->
        // the catalog is internal plumbing too: same plain-join oracle
        """SELECT c_mktsegment, count(*) AS n_events,
           round(sum(value), 2) AS total_value
           FROM events e JOIN customer c ON e.user_id = c.c_custkey
           GROUP BY 1 ORDER BY 1""",

      "scd2_pit_join" ->
        // same SCD2 construction as scd2_customer_dim, then each order
        // left-joins the version whose [eff_from, eff_to) covers its date
        """WITH dim AS (SELECT c_custkey, c_mktsegment AS seg,
             DATE '1995-01-01' AS eff_from, CAST(NULL AS DATE) AS eff_to
           FROM customer),
         upd AS (SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment || '_V2'
                  ELSE c_mktsegment END AS seg FROM customer),
         j AS (SELECT c_custkey, dim.seg AS dseg, upd.seg AS useg,
                 dim.eff_from
               FROM dim FULL JOIN upd USING (c_custkey)),
         ver AS (
           SELECT c_custkey, dseg AS segment, eff_from, CAST(NULL AS DATE)
             AS eff_to FROM j WHERE useg IS NULL OR dseg = useg
           UNION ALL
           SELECT c_custkey, dseg, eff_from, DATE '1996-01-01' FROM j
           WHERE useg IS NOT NULL AND dseg IS NOT NULL AND dseg <> useg
           UNION ALL
           SELECT c_custkey, useg, DATE '1996-01-01', CAST(NULL AS DATE)
           FROM j WHERE useg IS NOT NULL AND (dseg IS NULL OR dseg <> useg))
         SELECT coalesce(v.segment, 'NO_VERSION') AS segment,
           count(*) AS n_orders
         FROM orders o LEFT JOIN ver v
           ON o.o_custkey = v.c_custkey
           AND CAST(v.eff_from AS TIMESTAMP) <= o.o_orderdate
           AND (v.eff_to IS NULL
                OR o.o_orderdate < CAST(v.eff_to AS TIMESTAMP))
         GROUP BY 1 ORDER BY 1""",

      "rolling_7d_revenue" ->
        """SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rev_7d_cents
           FROM orders ORDER BY o_custkey, o_orderkey""",

      "lang_drift_report" -> {
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT lang, md5(CAST(doc_id AS VARCHAR)) AS mh
               FROM documents),
           d AS (SELECT lang, $hex32 % 100 AS bucket FROM m),
           j AS (SELECT lang,
               count(CASE WHEN bucket < 80 THEN 1 END) AS n_a,
               count(CASE WHEN bucket >= 80 THEN 1 END) AS n_b
             FROM d GROUP BY lang),
           t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS k FROM j),
           p AS (SELECT lang, n_a, n_b,
               (n_a + 1.0) / (ta + k) AS p_a,
               (n_b + 1.0) / (tb + k) AS p_b
             FROM j, t)
           SELECT lang AS category, CAST(n_a AS BIGINT) AS n_a,
             CAST(n_b AS BIGINT) AS n_b,
             round(p_a, 6) AS p_a, round(p_b, 6) AS p_b,
             round(abs(p_a - p_b), 6) AS abs_delta,
             round(p_a * ln(p_a / p_b), 6) AS kl_term
           FROM p ORDER BY category"""
      },

      "snapshot_diff" ->
        // same synthetic versions; null-safe IS DISTINCT FROM on both
        // compared columns, unchanged rows dropped
        """WITH o AS (SELECT c_custkey, c_acctbal, c_mktsegment
                      FROM customer WHERE c_custkey % 10 <> 3),
           n AS (SELECT c_custkey,
                   CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
                        ELSE c_acctbal END AS c_acctbal,
                   c_mktsegment
                 FROM customer WHERE c_custkey % 7 <> 2),
           j AS (SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
               CASE WHEN o.c_custkey IS NULL THEN 'added'
                    WHEN n.c_custkey IS NULL THEN 'removed'
                    WHEN (o.c_acctbal IS DISTINCT FROM n.c_acctbal)
                      OR (o.c_mktsegment IS DISTINCT FROM n.c_mktsegment)
                    THEN 'changed' ELSE 'unchanged' END AS diff_status,
               o.c_acctbal AS old_c_acctbal, n.c_acctbal AS new_c_acctbal,
               o.c_mktsegment AS old_c_mktsegment,
               n.c_mktsegment AS new_c_mktsegment
             FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey)
           SELECT * FROM j WHERE diff_status <> 'unchanged'
           ORDER BY c_custkey""",

      "order_price_ranks" ->
        """SELECT o_orderkey, o_orderpriority,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume,
             ntile(10) OVER w AS decile
           FROM orders
           WINDOW w AS (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey)
           ORDER BY o_orderkey""",

      "key_skew_report" ->
        """WITH c AS (SELECT user_id, count(*) AS n_rows
                      FROM events GROUP BY user_id),
           t AS (SELECT sum(n_rows) AS total FROM c),
           top AS (SELECT * FROM c ORDER BY n_rows DESC, user_id LIMIT 10)
           SELECT user_id, n_rows,
             round(n_rows / total, 6) AS share,
             round(sum(n_rows) OVER (ORDER BY n_rows DESC, user_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / total,
               6) AS cum_share
           FROM top, t ORDER BY n_rows DESC, user_id""",

      "attribution_last_touch" ->
        // strictly-preceding frame: a touch at the conversion's own
        // timestamp counts only when the tie-break orders it earlier
        """WITH a AS (SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type
           FROM events)
           SELECT coalesce(touch_type, 'organic') AS channel,
             count(*) AS n_conversions,
             round(sum(value), 2) AS attributed_value
           FROM a WHERE event_type = 'purchase'
           GROUP BY 1 ORDER BY 1""",

      "mad_outliers" ->
        // count(CASE...) not sum(CASE...): DuckDB sum(int) widens to
        // HUGEINT, which would break the BIGINT dtype match
        """WITH med AS (SELECT o_orderpriority,
                          median(o_totalprice) AS med
                        FROM orders GROUP BY 1),
           d AS (SELECT o.o_orderpriority,
                   abs(o.o_totalprice - med.med) AS dev, med.med
                 FROM orders o JOIN med USING (o_orderpriority)),
           m2 AS (SELECT o_orderpriority, median(dev) AS mad
                  FROM d GROUP BY 1)
           SELECT d.o_orderpriority, count(*) AS n_rows,
             round(any_value(d.med), 4) AS median_value,
             round(any_value(m2.mad), 4) AS mad_value,
             count(CASE WHEN m2.mad > 0
                        AND d.dev > 3.0 * 1.4826 * m2.mad
                        THEN 1 END) AS n_outliers
           FROM d JOIN m2 USING (o_orderpriority)
           GROUP BY 1 ORDER BY 1""",

      "attribution_linear" -> multiTouchOracle(
        "CASE WHEN channel = 'organic' THEN 1.0 ELSE 1.0 / n END"),

      "attribution_position" -> multiTouchOracle(
        """CASE WHEN channel = 'organic' OR n = 1 THEN 1.0
                WHEN n = 2 THEN 0.5
                WHEN pos = 1 OR pos = n THEN 0.4
                ELSE 0.2 / (n - 2) END"""),

      "attribution_decay" -> timeDecayOracle(halfLifeSec = 3600L),

      "training_pipeline_counts" -> {
        // fragments reused verbatim from the stage oracles:
        // quality_funnel (gate), doc_splits (hash bucket), doc_fingerprints
        // (md5 of token stream), temperature_mixture (sqrt rates)
        val lenSum = foldSum(
          "list_transform(w, x -> CAST(length(x) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH q AS (SELECT doc_id, lang,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
           k AS (SELECT doc_id, lang, w FROM q
             WHERE len(w) >= 20
               AND len(list_filter(w, x -> x = 'the' OR x = 'a'
                 OR x = 'of' OR x = 'and' OR x = 'is' OR x = 'in')) >= 2
               AND (CASE WHEN len(w) = 0 THEN 0.0
                    ELSE CAST($lenSum AS DOUBLE) / len(w) END)
                 BETWEEN 3.0 AND 10.0),
           h AS (SELECT doc_id, lang, w,
                   md5(CAST(doc_id AS VARCHAR)) AS mh,
                   md5(array_to_string(w, ' ')) AS fp
                 FROM k),
           b AS (SELECT doc_id, lang, w, fp,
                   $hex32 % 100 AS b100, $hex32 % 1000000 AS bppm
                 FROM h),
           ev AS (SELECT DISTINCT fp FROM b WHERE b100 >= 90),
           d AS (SELECT doc_id, lang, w, fp, bppm,
                   row_number() OVER (PARTITION BY fp ORDER BY doc_id)
                     AS rn
                 FROM b WHERE b100 < 90),
           cl AS (SELECT doc_id, lang, w, bppm FROM d
                  WHERE rn = 1 AND fp NOT IN (SELECT fp FROM ev)),
           c AS (SELECT lang, count(*) AS n FROM cl GROUP BY lang),
           m AS (SELECT min(n) AS nmin FROM c),
           t AS (SELECT lang,
                   CAST(floor(sqrt(CAST(nmin AS DOUBLE) / n) * 1000000.0)
                     AS BIGINT) AS keep_ppm
                 FROM c, m),
           fin AS (SELECT cl.lang, cl.w FROM cl JOIN t USING (lang)
                   WHERE cl.bppm < t.keep_ppm)
           SELECT lang, count(*) AS n_docs,
             CAST(sum(len(w)) AS BIGINT) AS total_tokens
           FROM fin GROUP BY lang ORDER BY lang"""
      },

      "k_anonymity_report" ->
        """WITH g AS (SELECT c_mktsegment, c_nationkey, count(*) AS n
                      FROM customer GROUP BY 1, 2)
           SELECT count(*) AS n_groups,
             count(CASE WHEN n < 5 THEN 1 END) AS n_small_groups,
             coalesce(CAST(sum(CASE WHEN n < 5 THEN n END) AS BIGINT), 0)
               AS n_rows_at_risk,
             CAST(min(n) AS BIGINT) AS min_group_size,
             CAST(5 AS BIGINT) AS k
           FROM g""",

      "event_transitions" ->
        """WITH p AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
           FROM events),
           c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
                 FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
           SELECT prev_type, next_type, n,
             round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS p
           FROM c ORDER BY prev_type, next_type""",

      "top_bigrams" ->
        // same tokenizer as top_tokens; adjacent pairs via index zip
        """WITH w AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+')
                        AS t FROM documents),
           b AS (SELECT unnest(list_transform(
                   generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1])) AS bigram
                 FROM w)
           SELECT bigram, count(*) AS n FROM b
           GROUP BY bigram ORDER BY n DESC, bigram LIMIT 25""",

      "equi_depth_hist" ->
        """WITH t AS (SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
           FROM orders)
           SELECT bucket, count(*) AS n_orders,
             round(min(o_totalprice), 2) AS lo,
             round(max(o_totalprice), 2) AS hi
           FROM t GROUP BY bucket ORDER BY bucket""",

      "numeric_profile" -> {
        // one-row aggregate CTE + generated UNION ALL unpivot, mirroring
        // the Spark side's single-pass + explode
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
          "l_tax")
        val aggs = cols.flatMap(c => Seq(
          s"CAST(min($c) AS DOUBLE) AS min_$c",
          s"CAST(max($c) AS DOUBLE) AS max_$c",
          s"CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS DOUBLE) AS nulls_$c",
          s"avg($c) AS mean_$c")).mkString(", ")
        val branches = cols.flatMap(c => Seq(
          s"""SELECT '$c' AS "column", 'min' AS metric, round(min_$c, 4) AS value FROM a""",
          s"""SELECT '$c', 'max', round(max_$c, 4) FROM a""",
          s"""SELECT '$c', 'null_count', nulls_$c FROM a""",
          s"""SELECT '$c', 'mean', round(mean_$c, 4) FROM a"""))
          .mkString("\n UNION ALL ")
        s"""WITH a AS (SELECT $aggs FROM lineitem)
           $branches
           ORDER BY "column", metric"""
      },

      "value_spike_census" ->
        """WITH e AS (SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS vc FROM events),
           w AS (SELECT user_id, vc,
               sum(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS s,
               count(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS n
             FROM e)
           SELECT user_id,
             count(CASE WHEN n >= 10 THEN 1 END) AS n_scored,
             count(CASE WHEN n >= 10 AND abs(vc * n - s) > s * 3 THEN 1 END)
               AS n_spikes
           FROM w GROUP BY user_id ORDER BY user_id""",

      "temperature_mixture" -> {
        // same hex32 md5-bucket fold as mixture_counts, mod 1e6 ppm space
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH c AS (SELECT lang, count(*) AS n FROM documents
                       GROUP BY lang),
           m AS (SELECT min(n) AS nmin FROM c),
           t AS (SELECT lang,
                   CAST(floor(sqrt(CAST(nmin AS DOUBLE) / n) * 1000000.0)
                     AS BIGINT) AS keep_ppm
                 FROM c, m),
           h AS (SELECT d.lang, t.keep_ppm,
                   md5(CAST(d.doc_id AS VARCHAR)) AS mh
                 FROM documents d JOIN t USING (lang)),
           b AS (SELECT lang, keep_ppm, $hex32 % 1000000 AS bucket FROM h)
           SELECT lang, count(CASE WHEN bucket < keep_ppm THEN 1 END)
               AS n_kept,
             any_value(keep_ppm) AS keep_ppm
           FROM b GROUP BY lang ORDER BY lang"""
      },

      "skewed_key_report" ->
        """WITH f AS (SELECT CASE WHEN user_id % 10 < 3 THEN 7
                                  ELSE user_id END AS skey
                      FROM events),
           c AS (SELECT skey, count(*) AS n_rows FROM f GROUP BY skey),
           t AS (SELECT sum(n_rows) AS total FROM c),
           top AS (SELECT * FROM c ORDER BY n_rows DESC, skey LIMIT 5)
           SELECT skey, n_rows,
             round(n_rows / total, 6) AS share,
             round(sum(n_rows) OVER (ORDER BY n_rows DESC, skey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / total,
               6) AS cum_share
           FROM top, t ORDER BY n_rows DESC, skey""",

      "skew_agg_plain" -> skewAggOracle,
      "skew_agg_salted" -> skewAggOracle,
      "skew_join_plain" -> skewJoinOracle,
      "skew_join_salted" -> skewJoinOracle,
      "skew_join_adaptive" -> skewJoinOracle
    )
  }

  /** Shared multi-touch attribution oracle: journey numbering by an
    * inclusive conversion count, per-journey touch stats, then the
    * model's credit fraction (`fracSql` over columns channel/n/pos) —
    * micros/cents integer sums exactly as the Spark side emits them. */
  private def multiTouchOracle(fracSql: String): String =
    s"""WITH e AS (
         SELECT user_id, ts, event_id, event_type, value,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
         FROM events),
       s AS (SELECT *, CASE WHEN event_type = 'purchase' THEN g
                            ELSE g + 1 END AS journey FROM e),
       j AS (SELECT *,
           max(CASE WHEN event_type = 'purchase' THEN value END)
             OVER (PARTITION BY user_id, journey) AS conv_value,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id, journey) AS has_conv,
           sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
             OVER (PARTITION BY user_id, journey) AS n,
           row_number() OVER (PARTITION BY user_id, journey
                              ORDER BY ts, event_id) AS pos
         FROM s),
       c AS (SELECT
           CASE WHEN event_type <> 'purchase' AND has_conv = 1
                  THEN event_type
                WHEN event_type = 'purchase' AND n = 0 THEN 'organic'
           END AS channel, n, pos, conv_value
         FROM j),
       f AS (SELECT channel, conv_value, $fracSql AS frac
             FROM c WHERE channel IS NOT NULL)
       SELECT channel,
         round(sum(CAST(round(frac * 1000000.0) AS BIGINT)) / 1000000.0, 6)
           AS credited_conversions,
         round(sum(CAST(round(conv_value * frac * 100.0) AS BIGINT)) / 100.0, 2)
           AS attributed_value
       FROM f GROUP BY channel ORDER BY channel"""

  /** Time-decay attribution oracle: journey machinery as in
    * [[multiTouchOracle]], weights as exact integer bit-shifts
    * (1000000 >> whole-half-lives) mirroring the Spark side — Δt in
    * exact integer microseconds (epoch_us ↔ unix_micros), double ops in
    * the same order on both sides. */
  private def timeDecayOracle(halfLifeSec: Long): String = {
    val stepUs = halfLifeSec * 1000000L
    s"""WITH e AS (
         SELECT user_id, ts, event_id, event_type, value,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
         FROM events),
       s AS (SELECT *, CASE WHEN event_type = 'purchase' THEN g
                            ELSE g + 1 END AS journey FROM e),
       j AS (SELECT *,
           max(CASE WHEN event_type = 'purchase' THEN value END)
             OVER (PARTITION BY user_id, journey) AS conv_value,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id, journey) AS has_conv,
           sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
             OVER (PARTITION BY user_id, journey) AS n,
           max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
             OVER (PARTITION BY user_id, journey) AS conv_us
         FROM s),
       t AS (SELECT *,
           CASE WHEN event_type <> 'purchase' THEN
             greatest(1000000 >> CAST(least(floor(
               (conv_us - epoch_us(ts)) / $stepUs.0), 30) AS INT), 1)
           END AS w
         FROM j),
       t2 AS (SELECT *,
           sum(w) OVER (PARTITION BY user_id, journey) AS sum_w FROM t),
       c AS (SELECT
           CASE WHEN event_type <> 'purchase' AND has_conv = 1
                  THEN event_type
                WHEN event_type = 'purchase' AND n = 0 THEN 'organic'
           END AS channel, w, sum_w, conv_value
         FROM t2)
       SELECT channel,
         round(sum(CAST(round(CASE WHEN channel = 'organic' THEN 1000000.0
             ELSE w * 1000000.0 / sum_w END) AS BIGINT)) / 1000000.0, 6)
           AS credited_conversions,
         round(sum(CAST(round(conv_value *
             (CASE WHEN channel = 'organic' THEN 1.0 ELSE w / sum_w END)
             * 100.0) AS BIGINT)) / 100.0, 2) AS attributed_value
       FROM c WHERE channel IS NOT NULL GROUP BY channel ORDER BY channel"""
  }

  /** Urgent-order revenue as the PLAIN join (shared by the bloom on/off
    * twins — any divergence means the bloom dropped a match). A def for
    * the same init-order reason as [[skewFixtureSql]]. */
  private def urgentRevenueOracle: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderpriority = '1-URGENT'
       GROUP BY 1 ORDER BY 1"""

  /** The skewed fixture in SQL (shared by the plain/salted twins — they
    * are result-identical by construction). A def, not a val: extOracle
    * initializes earlier in the object, and a forward val reference would
    * interpolate as null. */
  private def skewFixtureSql: String =
    """SELECT CASE WHEN user_id % 10 < 3 THEN 7 ELSE user_id END AS skey,
         CAST(round(value * 100) AS BIGINT) AS value_cents
       FROM events, generate_series(1, 32)"""

  private def skewAggOracle: String =
    s"""WITH f AS ($skewFixtureSql)
       SELECT skey, count(*) AS n_events,
         CAST(sum(value_cents) AS BIGINT) AS value_cents
       FROM f GROUP BY skey ORDER BY skey"""

  private def skewJoinOracle: String =
    s"""WITH f AS ($skewFixtureSql)
       SELECT skey, c_mktsegment, count(*) AS n_events,
         CAST(sum(value_cents) AS BIGINT) AS value_cents
       FROM f JOIN customer ON skey = c_custkey
       GROUP BY skey, c_mktsegment ORDER BY skey"""
}
