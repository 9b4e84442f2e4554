package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.registry._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * extensions) is registered here as a named query over the driver's parquet
  * tables, with an ANSI-SQL twin in [[oracleSql]] for the DuckDB differential
  * check. Determinism rules (SURVEY.md §7.5.1): explicit ORDER BY on both
  * sides, explicit tie-breaks in any top-1/top-k, floats rounded (6 dp for
  * ratios/averages, 2 dp for large sums), UTC everywhere, no wall-clock.
  *
  * The maps themselves live in per-domain registry objects
  * ([[graft.registry.CoreQueries]], [[graft.registry.ExtQueries]],
  * [[graft.registry.Ext3Queries]], [[graft.registry.SkewFixture]],
  * [[graft.registry.TpchCanon]] and their oracle twins) — this object is
  * only the composition the driver calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("genre_kpis")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtQueries.queries ++ Ext3Queries.queries ++
      SkewFixture.queries ++ TpchCanon.queries ++ TpchCanon2.queries ++
      ScaleQueries.queries

  private lazy val extOracle: Map[String, String] =
    ExtOracleA.oracle ++ ExtOracleB.oracle

  /** DuckDB twins for the driver's differential check. Keys must mirror
    * [[queries]]; result column names and ORDER BY match exactly. */
  def oracleSql: Map[String, String] =
    CoreOracle.oracle ++ extOracle ++ SkewFixture.oracle ++
      TpchCanon.oracle ++ TpchCanon2.oracle ++ ScaleQueries.oracle ++ Map(
        // the indexed twin must reproduce the recompute-the-corpus report
        // EXACTLY — one oracle serves both paths
        "incremental_new_docs_indexed" -> extOracle("incremental_new_docs"))
}
