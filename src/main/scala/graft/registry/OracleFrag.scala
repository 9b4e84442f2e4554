package graft.registry

/** Shared DuckDB SQL fragments used by the extension oracle maps. */
private[registry] object OracleFrag {
  /** Shared DuckDB CTE fragments mirroring TextAnalysis.tokens /
    * Dedup.shingleRows exactly (token regex, k=5 shingles, distinct). */
  val tokCte =
    "tok AS (SELECT doc_id, lang, source, n_chars, " +
      "regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents)"
  val shCte =
    "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
      "generate_series(1, len(w)-4), i -> array_to_string(w[i:i+4], ' ')))) " +
      "AS shingle FROM tok WHERE len(w) >= 5)"

  /** Left-fold sum starting at 0.0 — same op order as Spark's
    * aggregate(..., 0.0, (acc, x) => acc + x). */
  def foldSum(items: String, init: String = "0.0"): String =
    s"list_reduce(list_prepend($init, $items), (a, x) -> a + x)"

  /** DuckDB dot product of two float lists in doubles, index order. */
  def dotSql(a: String, b: String): String =
    foldSum(s"list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))")

  def planeLiteral(p: Array[Double]): String =
    p.map(v => f"$v%.3f").mkString("[", ", ", "]")

  /** Shared multi-touch attribution oracle: journey numbering by an
    * inclusive conversion count, per-journey touch stats, then the
    * model's credit fraction (`fracSql` over columns channel/n/pos) —
    * micros/cents integer sums exactly as the Spark side emits them. */
  def multiTouchOracle(fracSql: String): String =
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
  def timeDecayOracle(halfLifeSec: Long): String = {
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
    * the same init-order reason as SkewFixture's fixture SQL. */
  def urgentRevenueOracle: String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       count(*) AS n_items,
       ${Money.revenueExactSql("l_extendedprice", "l_discount")} AS revenue
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderpriority = '1-URGENT'
       GROUP BY 1 ORDER BY 1"""
}
