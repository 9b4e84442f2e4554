package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytical core, re-expressed as declarative Spark plans
  * (reference: dags/etl/kpi_processor.py:40-101; SURVEY.md §2.3-2.4, §3.2).
  *
  * Scale posture: dimension sides of J1/J2-shaped joins are broadcast — at
  * 100 TB the fact table never shuffles for the join; the only shuffle per KPI
  * is the partial→final hash aggregate on the group key. `avg`/`count` get
  * map-side partial aggregation for free. The deterministic mode (A4) costs
  * one extra shuffle (groupBy key+value, then window on key) — same asymptotic
  * shape as any top-1-per-group.
  */
object Kpis {

  /** A1+A2 (reference: dags/etl/kpi_processor.py:69-72): per-genre count and
    * mean over the fact⋈dim join (J1). Float output rounded to 6 decimals for
    * cross-engine comparability (SURVEY.md §7.5.1c).
    */
  def genreKpis(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                genreCol: String, durationCol: String): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey))
      .groupBy(col(genreCol))
      .agg(count(col(factKey)).as("listen_count"),
           round(avg(col(durationCol)), 6).as("avg_duration"))
      .orderBy(col(genreCol))

  /** Deterministic mode: most frequent `value` per `key`, ties broken to the
    * smallest value — reproduces pandas `mode().iloc[0]`
    * (reference: dags/etl/kpi_processor.py:90; SURVEY.md §2.4 A4). Spark's
    * builtin `mode()` has no tie guarantee, so we use an explicit window.
    */
  def modeTop1(df: DataFrame, key: String, value: String, out: String): DataFrame = {
    val counted = df.groupBy(col(key), col(value)).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(key)).orderBy(col("__cnt").desc, col(value).asc)
    counted.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col(key), col(value).as(out))
  }

  /** A3+A4+A5 (reference: dags/etl/kpi_processor.py:88-92): per hour-of-day
    * (all dates folded into 24 buckets — the reference's actual semantics,
    * SURVEY.md §2.7), exact distinct users, deterministic mode of `valueCol`,
    * and the distinct ratio ("diversity").
    */
  def hourlyKpisHod(events: DataFrame, tsCol: String, userCol: String,
                    valueCol: String): DataFrame = {
    val e = events.select(hour(col(tsCol)).as("hour"),
      col(userCol).as("__u"), col(valueCol).as("__v"))
    val aggs = e.groupBy(col("hour")).agg(
      countDistinct(col("__u")).as("unique_listeners"),
      round(countDistinct(col("__v")).cast("double") / count(lit(1)), 6)
        .as("diversity"))
    val top = modeTop1(e, "hour", "__v", "top_value")
    aggs.join(top, Seq("hour")).orderBy(col("hour"))
  }

  /** Calendar-correct variant (SURVEY.md §7.5.3): tumbling 1-hour windows on
    * the actual timeline, not folded by hour-of-day. */
  def hourlyKpisWindow(events: DataFrame, tsCol: String, userCol: String,
                       valueCol: String): DataFrame =
    events.groupBy(date_trunc("hour", col(tsCol)).as("hour_start"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col(userCol)).as("unique_users"),
           round(sum(col(valueCol)), 6).as("sum_value"))
      .orderBy(col("hour_start"))

  /** Scalable distinct-count variant (SURVEY.md §2.4 A3): HLL sketch instead
    * of exact shuffle-distinct — the 100 TB path. Emitted as a hash-matched
    * band witness (the tolerance-band-as-exact-hash pattern): per hour the
    * EXACT distinct count (real oracle data) plus the sketch's accuracy
    * contract — within 3× the configured rsd (0.05) of truth — as a boolean
    * the HLL must earn. Deterministic: HLL++'s hash is seedless-stable and
    * the corpus is canary-pinned. At 100 TB only the sketch column survives;
    * the exact twin here is what makes the witness checkable. */
  def hourlyUniquesApprox(events: DataFrame, tsCol: String, userCol: String): DataFrame =
    events.groupBy(hour(col(tsCol)).as("hour"))
      .agg(approx_count_distinct(col(userCol)).as("__approx"),
        countDistinct(col(userCol)).as("n_unique_users"))
      .select(col("hour"), col("n_unique_users"),
        (abs(col("__approx") - col("n_unique_users")).cast("double") <=
          lit(0.15) * col("n_unique_users").cast("double"))
          .as("hll_within_band"))
      .orderBy(col("hour"))
}
