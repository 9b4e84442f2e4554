package graft

import org.apache.spark.sql.SparkSession

/** Standalone entry for [[ScaleProbe.generate]]: build a k-replica
  * blowup of a base SF directory without running the probe (and without
  * touching SCALEPROBE.json). Used for the full-surface sf1 sweep
  * (VERDICT r11 #1): `runMain graft.ScaleGen <k> <outDir> [baseDir]`.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val k = args(0).toInt
    val out = args(1)
    val base =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleProbe.generate(spark, base, out, k)
    println(s"generated ${k}x of $base at $out")
    spark.stop()
  }
}
