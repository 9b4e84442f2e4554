package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Cleaning, Kpis, Validation}
import graft.sources.Tables

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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = core

  // ---------------------------------------------------------------- core ---

  /** Reference-parity operators (SURVEY.md §2.1-2.8). */
  private val core: Map[String, (SparkSession, String) => DataFrame] = Map(

    // J1+A1+A2 (reference: dags/etl/kpi_processor.py:69-72): fact ⋈ broadcast
    // dim, hash agg on the genre-like key. streams→lineitem, songs→part.
    "genre_kpis" -> ((s, dir) =>
      Kpis.genreKpis(t(s, dir, "lineitem"), t(s, dir, "part"),
        "l_partkey", "p_partkey", "p_type", "l_extendedprice")),

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
      Kpis.hourlyUniquesApprox(t(s, dir, "events"), "ts", "user_id"))
  )

  /** DuckDB twins for the driver's differential check. Keys must mirror
    * [[queries]]; result column names and ORDER BY match exactly. */
  def oracleSql: Map[String, String] = Map(
    "genre_kpis" ->
      """SELECT p_type, count(l_partkey) AS listen_count,
         round(avg(l_extendedprice), 6) AS avg_duration
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_type ORDER BY p_type""",

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

    "validation_report" ->
      """SELECT count(*) AS n_rows,
         count(CASE WHEN user_id IS NULL THEN 1 END) AS null_user_id,
         count(CASE WHEN value IS NULL THEN 1 END) AS null_value,
         count(*) - count(DISTINCT (user_id, ts)) AS dup_user_id_ts,
         count(CASE WHEN value < 0 THEN 1 END) AS neg_value,
         count(CASE WHEN event_type NOT IN ('view', 'click', 'purchase')
                    THEN 1 END) AS invalid_type
         FROM events""",

    "json_kpis" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
         max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type"""
  )
}
