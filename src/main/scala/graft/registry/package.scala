package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-domain query/oracle registries composed by [[graft.SparkEntry]]
  * into the driver's single `queries`/`oracleSql` contract (round-9 split
  * of the 3,900-line SparkEntry; maps byte-identical by construction). */
package object registry {
  /** Driver test-table reader (normalizing boundary — see Tables.table). */
  private[registry] def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.table(s, dir, name)
}
