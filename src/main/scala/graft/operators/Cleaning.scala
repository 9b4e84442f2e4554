package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingestion-time cleaning operators (SURVEY.md §2.5).
  *
  * Reference behavior reimplemented:
  *  - D1 full-row dedup (reference: dags/etl/extract_metadata.py:120-121)
  *  - D2 keyed dedup      (reference: dags/etl/extract_stream_data.py:205-206)
  *  - D3 null-key drop    (reference: dags/etl/extract_metadata.py:120-121)
  *  - D4 sort             (reference: dags/etl/extract_stream_data.py:208-210)
  *  - D5 union-all        (reference: dags/etl/extract_stream_data.py:199-200)
  *
  * Scale posture: `dropDuplicates` is a hash aggregate on the dedup key — one
  * shuffle, map-side partial dedup first; no full-row comparison loops. The
  * deterministic keyed dedup uses a window over the key partition, which also
  * shuffles once on the key.
  */
object Cleaning {

  /** D1: exact full-row dedup. */
  def dedupRows(df: DataFrame): DataFrame = df.dropDuplicates()

  /** D2: keyed dedup, arbitrary survivor — correct when non-key columns are
    * functionally dependent on the key (the reference's event-identity case).
    */
  def dedupByKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** D2-deterministic: keep exactly one row per key, smallest by `order`
    * columns. Unlike pandas' positional "first", this is order-independent and
    * therefore stable under distributed/partitioned execution — required for
    * oracle comparison and for reproducibility at scale.
    */
  def dedupFirstBy(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col(_).asc): _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** D3: drop rows with nulls in any of the key columns. */
  def dropNullKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.na.drop(keys)

  /** D5: schema-aligned union; tolerates per-file schema drift the way the
    * reference's pd.concat does, without materializing every frame in memory.
    */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
}
