package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot group keys (SURVEY.md §7.5.6).
  *
  * The reference folds all history into 24 hour-of-day buckets
  * (dags/etl/kpi_processor.py:61) — at 100 TB that is 24 reduce keys, i.e.
  * a guaranteed straggler per hot hour. AQE's skew-join handling covers
  * joins; for AGGREGATIONS over decomposable functions (count/sum/min/max)
  * the standard fix is two-phase salted aggregation: shard each key across
  * `salts` deterministic sub-keys, partially aggregate, then combine.
  *
  * The salt must be deterministic (repartition-safe, retry-safe): derived
  * by hashing salt-source columns, NOT rand() — a rand() salt changes on
  * task retry and can double-count under speculative execution.
  */
object Skew {

  /** Two-phase salted aggregation. `partials` are the phase-1 aggregates
    * per (keys, salt); `finals` combine them per keys. Example — a salted
    * count: partials = count(*) as c, finals = sum(c) as n. */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFrom: Seq[String],
                salts: Int, partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(saltFrom.map(col): _*), lit(salts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted count(*) per key — result identical to a direct groupBy count,
    * shape immune to hot keys. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltFrom: Seq[String],
                  salts: Int = 64, out: String = "n"): DataFrame =
    saltedAgg(df, keys, saltFrom, salts,
      Seq(count(lit(1)).as("__c")),
      Seq(sum(col("__c")).as(out)))

  /** Salted sum per key. */
  def saltedSum(df: DataFrame, keys: Seq[String], sumCol: String,
                saltFrom: Seq[String], salts: Int = 64,
                out: String = "total"): DataFrame =
    saltedAgg(df, keys, saltFrom, salts,
      Seq(sum(col(sumCol)).as("__s")),
      Seq(sum(col("__s")).as(out)))
}
