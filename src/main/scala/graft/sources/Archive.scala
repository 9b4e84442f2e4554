package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Post-load file archival (SURVEY.md §2.1 S10/S11): move processed staging
  * objects to an archive prefix. The reference does copy_object +
  * delete_object per key with 404s tolerated
  * (reference: dags/etl/load_to_redshift.py:350-388) and a disabled local
  * variant (dags/etl/archive_files.py:11-36). Here it is one Hadoop
  * FileSystem call per file — the same code path works on local FS, HDFS,
  * and S3A (where rename = server-side copy + delete, exactly the
  * reference's semantics).
  *
  * Not a query operator — a data-plane utility with no Spark job attached.
  */
object Archive {

  /** Move every file matching `glob` under `srcDir` into `dstDir`
    * (created if missing). Missing/concurrent-deleted sources are skipped,
    * mirroring the reference's 404 tolerance. Returns destination paths of
    * the files actually moved. */
  def moveMatching(spark: SparkSession, srcDir: String, dstDir: String,
                   glob: String = "*"): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val fs = src.getFileSystem(conf)
    val dst = new Path(dstDir)
    if (!fs.exists(dst)) fs.mkdirs(dst)
    val matches =
      try fs.globStatus(new Path(src, glob)) catch { case _: Throwable => null }
    Option(matches).getOrElse(Array.empty).toSeq
      .filter(_.isFile)
      .flatMap { st =>
        val target = new Path(dst, st.getPath.getName)
        try {
          if (fs.rename(st.getPath, target)) Some(target.toString) else None
        } catch { case _: java.io.FileNotFoundException => None }
      }
  }
}
