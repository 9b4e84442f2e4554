package graft.registry

/** DuckDB twins for the reference-parity queries. */
object CoreOracle {
  val oracle: Map[String, String] = Map(
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

    // HLL band witness: exact per-hour distincts are the real data; the
    // within-3×rsd boolean is the contract the sketch must earn.
    "hourly_uniques_approx" ->
      """SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
           count(DISTINCT user_id) AS n_unique_users,
           TRUE AS hll_within_band
         FROM events GROUP BY 1 ORDER BY hour""",

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
         CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) // 100
           AS DOUBLE) / 100.0 AS revenue,
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
         CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) // 100
           AS DOUBLE) / 100.0 AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN part ON l_partkey = p_partkey
         WHERE p_size = 1
         GROUP BY s_nationkey ORDER BY s_nationkey""",

    "revenue_by_nation_merge" ->
      """SELECT n_name,
         CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) // 100
           AS DOUBLE) / 100.0 AS revenue,
         count(DISTINCT o_orderkey) AS n_orders
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_quantity > 10
         GROUP BY n_name ORDER BY n_name""",

    "weekly_order_revenue" ->
      s"""SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
         count(*) AS n_orders,
         ${Money.sumMoneyExactSql("o_totalprice")} AS revenue
         FROM orders GROUP BY 1 ORDER BY 1""",

    "cust_order_stats" ->
      s"""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
         coalesce(${Money.sumMoneyExactSql("o_totalprice")}, 0.0) AS total_spend
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
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE) / 100.0 AS running_spend
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
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         ${Money.sumMoneyExactSql("l_extendedprice")} AS total_price
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "cube_status_priority" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         ${Money.sumMoneyExactSql("o_totalprice")} AS total_price
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

    // Tolerance band as an exact hash (equi_depth_hist_approx pattern):
    // the query emits each group's exact rank fraction at the sketch's
    // quantile bounds; the accuracy guarantee forces them onto the
    // requested grid, which DuckDB produces as constants per group.
    "price_percentiles_approx" ->
      """SELECT o_orderpriority, CAST(t.i AS BIGINT) AS q_idx,
           CAST(t.q AS DOUBLE) AS rank_frac
         FROM (SELECT DISTINCT o_orderpriority FROM orders),
              (VALUES (0, 0.25), (1, 0.5), (2, 0.75), (3, 0.95)) t(i, q)
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
      s"""SELECT o_orderkey AS window_key, count(*) AS n_shipments,
         ${Money.sumIntExactSql("l_quantity")} AS total_qty
         FROM orders JOIN lineitem
           ON l_shipdate >= o_orderdate
          AND l_shipdate < o_orderdate + INTERVAL 7 DAY
         WHERE o_orderkey % 100 = 0
         GROUP BY 1 ORDER BY 1"""
  )
}
