package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-committed versioned parquet table — the minimal
  * transactional-commit / time-travel primitive (the core idea of the
  * modern table formats, reduced to its essentials): data files land
  * under `data/`, but a version EXISTS only once its manifest (the full
  * file list for that snapshot) is written. Readers resolve a manifest
  * and load exactly its files, so
  *
  *  - a failed/partial write leaves ORPHAN data files that no reader
  *    ever sees (no half-written snapshots — the reference's CSV
  *    staging ports over with none of its torn-read risk),
  *  - every committed version stays readable (time travel), and
  *  - two versions diff with [[graft.operators.SnapshotDiff]] — the CDC
  *    loop over table HISTORY instead of externally-kept snapshots.
  *
  * The manifest write is the commit point: a single file creation,
  * atomic on local/HDFS semantics. On S3-style stores a deployment
  * would use a conditional put / rename for the same effect; the
  * reader-side contract (manifest = source of truth) is unchanged.
  * Concurrent writers are out of scope (single-writer contract, like
  * the reference's one-DAG-at-a-time loads).
  */
object VersionedTable {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(root: String) = new Path(root, "_manifests")

  /** Committed version numbers, ascending (empty for a fresh path). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = manifestDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted.toSeq
  }

  /** Commit `df` as the next version. `append = true` carries the
    * previous version's files forward (the new snapshot = old + new
    * files); `false` makes the new manifest list only this commit's
    * files (logical overwrite — old files stay for time travel).
    * Returns the committed version number. */
  def commit(df: DataFrame, root: String, append: Boolean = false): Long = {
    val spark = df.sparkSession
    val prior = versions(spark, root)
    val v = prior.lastOption.getOrElse(0L) + 1
    // stage this commit's data under a version-unique directory: never
    // overwrites another version's files, and a crash before the
    // manifest write below leaves only invisible orphans
    val dataDir = new Path(root, s"data/v$v")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val f = fs(spark, dataDir)
    val newFiles = f.listStatus(dataDir)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toUri.toString).sorted
    val carried =
      if (append && prior.nonEmpty) manifestFiles(spark, root, prior.last)
      else Seq.empty
    val all = carried ++ newFiles
    val mDir = manifestDir(root)
    f.mkdirs(mDir)
    // the COMMIT POINT: one create of the manifest file
    val out = f.create(new Path(mDir, s"v$v.json"), false)
    try out.write(
      all.mkString("{\"files\": [\"", "\", \"", "\"]}").getBytes("UTF-8"))
    finally out.close()
    v
  }

  private def manifestFiles(spark: SparkSession, root: String,
                            v: Long): Seq[String] = {
    val p = new Path(manifestDir(root), s"v$v.json")
    val f = fs(spark, p)
    require(f.exists(p), s"no such version $v under $root")
    val in = f.open(p)
    val json = try {
      val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
    // manifests are machine-written (above): a flat {"files": [...]}
    "\"(file:[^\"]+|hdfs:[^\"]+|[^\",\\[\\]{}]+\\.parquet)\"".r
      .findAllMatchIn(json).map(_.group(1)).toSeq
  }

  /** Read a committed snapshot: the latest version, or `version`. Only
    * manifested files load — orphans from failed writes are invisible. */
  def read(spark: SparkSession, root: String,
           version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions under $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not committed (have $vs)")
    spark.read.parquet(manifestFiles(spark, root, v): _*)
  }

  /** Retention: keep the newest `keepVersions` manifests, delete older
    * manifests and every data file no kept manifest references —
    * including orphans from crashed writers. Returns the number of data
    * files deleted. Readers of kept versions are unaffected (their file
    * sets are untouched); time travel past the horizon is given up
    * explicitly, never silently. */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int): Long = {
    require(keepVersions >= 1, s"must keep at least one version: $keepVersions")
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions under $root")
    val keep = vs.takeRight(keepVersions)
    val referenced = keep.flatMap(manifestFiles(spark, root, _)).toSet
    val dataRoot = new Path(root, "data")
    val f = fs(spark, dataRoot)
    val all = f.listStatus(dataRoot).flatMap { d =>
      if (d.isDirectory) f.listStatus(d.getPath).toSeq else Seq(d)
    }.map(_.getPath).filter(_.getName.endsWith(".parquet"))
    var deleted = 0L
    all.foreach { p =>
      if (!referenced.contains(p.toUri.toString)) {
        f.delete(p, false); deleted += 1
      }
    }
    vs.dropRight(keepVersions).foreach { v =>
      f.delete(new Path(manifestDir(root), s"v$v.json"), false)
    }
    deleted
  }
}
