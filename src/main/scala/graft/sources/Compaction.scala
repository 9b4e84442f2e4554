package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Small-files compaction — rewrite a table into right-sized,
  * range-clustered parquet files.
  *
  * The reference ingests up to 100 small CSV objects per hourly run
  * (reference: dags/etl/extract_stream_data.py:31-45) and archives them
  * as-is; at 100 TB that ingestion pattern produces millions of KB-sized
  * files, and file-open overhead (not bytes) starts dominating scan time.
  * The standard fix is a periodic compaction pass: read the small files,
  * range-repartition on the query-predicate columns, write ~target-sized
  * files capped with `maxRecordsPerFile`.
  *
  * Clustering matters as much as sizing: `repartitionByRange` +
  * `sortWithinPartitions` makes each output file a contiguous key range,
  * so parquet footer min/max statistics prune files for range predicates
  * (same motivation as `operators/ZOrder`, which generalizes the
  * clustering key to multiple dimensions — use that for multi-column
  * predicate sets).
  */
object Compaction {

  /** Compact `df` into files of at most `targetRowsPerFile` rows,
    * range-clustered on `clusterCols`. Returns the partition count used.
    *
    * Sizing does one extra `count()` — metadata-only on parquet sources
    * (statistics scan, no data read). Files may exceed the partition
    * count when a range partition lands over the cap (`maxRecordsPerFile`
    * splits it into contiguous runs, preserving per-file key ranges). */
  def compactedWrite(df: DataFrame, path: String, clusterCols: Seq[Column],
                     targetRowsPerFile: Long): Int = {
    require(targetRowsPerFile > 0, s"need positive target: $targetRowsPerFile")
    val n = df.count()
    val parts = math.max(1, math.ceil(n.toDouble / targetRowsPerFile)).toInt
    df.repartitionByRange(parts, clusterCols: _*)
      .sortWithinPartitions(clusterCols: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(path)
    parts
  }

  /** Lakehouse OPTIMIZE: rewrite a versioned table's latest snapshot
    * into right-sized range-clustered files and commit the rewrite as
    * the NEXT version — content-identical (a pure layout change), fully
    * transactional (readers see either the fragmented or the compacted
    * version, never a mix), and reversible via time travel until
    * [[VersionedTable.vacuum]] reclaims the small files. This is how
    * compaction must work under concurrent readers: never rewrite files
    * in place — a reader holding the old manifest keeps its exact file
    * set.
    *
    * Many-small-files versions arise naturally here from streaming CDC
    * commits (per-trigger versions) and append commits; running this
    * periodically bounds file-count growth the same way the reference's
    * archive step would need at scale.
    *
    * Returns the committed version. */
  def compactVersioned(spark: SparkSession, root: String,
                       clusterCols: Seq[Column],
                       targetRowsPerFile: Long,
                       rangeStatCol: Option[String] = None): Long = {
    require(targetRowsPerFile > 0, s"need positive target: $targetRowsPerFile")
    val latest = VersionedTable.read(spark, root)
    val n = latest.count()
    val parts = math.max(1, math.ceil(n.toDouble / targetRowsPerFile)).toInt
    val prior = VersionedTable.versions(spark, root).last
    val clustered = latest
      .repartitionByRange(parts, clusterCols: _*)
      .sortWithinPartitions(clusterCols: _*)
    // one file per range partition — the partition count already sizes
    // files to the target; commit() stages them under a fresh
    // data/v{N+1} directory and manifests atomically
    val v = VersionedTable.commit(clustered, root)
    // a layout rewrite is content-identical, so the stats sidecar (when
    // maintained) carries forward EXACTLY — OPTIMIZE must not demote
    // the catalog to on-demand estimation
    VersionedStats.carryForward(spark, root, prior, v)
    // the rewrite is exactly when per-file key ranges become disjoint
    // contiguous runs — register them so small-probe readers can skip
    // files ([[VersionedStats.writeFileRanges]])
    rangeStatCol.foreach(c => VersionedStats.writeFileRanges(spark, root, v, c))
    v
  }
}
