package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, SpanDedup, TextAnalysis}
import graft.operators.{Cleaning, Kpis, Validation}
import graft.Pipeline

/** Deterministic skewed-key fixture and its plain/salted twin queries
  * (docs on the fixture below). */
object SkewFixture {
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

  /** The skewed fixture in SQL (shared by the plain/salted twins — they
    * are result-identical by construction). A def, not a val, so the
    * oracle map below can sit anywhere in object init order. */
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

  val oracle: Map[String, String] = Map(
    "skew_agg_plain" -> skewAggOracle,
    "skew_agg_salted" -> skewAggOracle,
    "skew_join_plain" -> skewJoinOracle,
    "skew_join_salted" -> skewJoinOracle,
    "skew_join_adaptive" -> skewJoinOracle)
}
