package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-job profiling probe (dev tooling, like ScaleProbe/RecallProbe —
  * not part of the driver contract): runs named SparkEntry queries at a
  * given SF with a job listener, printing per-job wall times + total
  * job count so launch-overhead-bound queries can be dissected.
  *
  * A/B mode (`GRAFT_PROBE_AB="conf=v1,v2"`, `GRAFT_PROBE_REPS=N`):
  * alternates a session conf across N interleaved timed passes per
  * value WITHIN one JVM and reports best-of per arm — the round-17
  * measurement lesson: back-to-back single-shot JVM runs on this box
  * drift ±30% (page cache, co-tenant, thermal), swamping config
  * effects, while interleaved in-JVM passes share their warm state.
  * `GRAFT_PROBE_CLEARCACHE=1` clears the CacheManager between passes so
  * a query-internal .persist() cannot feed later passes through
  * plan-identity. */
object Probe17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("GRAFT_PROBE_OHA", "128"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.sources.BucketedTable.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(e.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        if (s != null) jobs.synchronized {
          jobs += ((e.jobId, s._1, System.nanoTime(), s._2))
        }
      }
    })
    // warm-up: same two stages as Bench
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir)
        .queryExecution.toRdd.count() catch { case _: Throwable => () }
      try SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.toRdd.count() catch { case _: Throwable => () }
    }
    // GRAFT_PROBE_AB="conf=v1,v2[;reps=N]": alternate a session conf
    // across N interleaved timed passes per value WITHIN this one JVM
    // (same page cache, same JIT state) and report best-of — separate
    // JVM runs drift ±30% back-to-back, swamping config effects.
    val ab = sys.env.get("GRAFT_PROBE_AB")
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "3").toInt
    names.foreach { n =>
      ab match {
        case Some(spec) =>
          val Array(conf, vals) = spec.split("=", 2)
          val timings = scala.collection.mutable.Map
            .empty[String, List[Double]].withDefaultValue(Nil)
          for (_ <- 1 to reps; v <- vals.split(",")) {
            spark.conf.set(conf, v)
            // honest repeat: a .persist() inside a query leaks into
            // CacheManager and would feed later passes (plan-identity)
            if (sys.env.contains("GRAFT_PROBE_CLEARCACHE"))
              spark.sharedState.cacheManager.clearCache()
            val t0 = System.nanoTime()
            SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
            timings(v) = ((System.nanoTime() - t0) / 1e9) :: timings(v)
          }
          timings.toSeq.sortBy(_._1).foreach { case (v, ts) =>
            println(f"===== $n $conf=$v: best ${ts.min}%.3f s  " +
              ts.reverse.map(t => f"$t%.3f").mkString("[", " ", "]"))
          }
        case None =>
          jobs.synchronized { jobs.clear() }
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
          val wall = (System.nanoTime() - t0) / 1e9
          val snap = jobs.synchronized { jobs.toSeq }
          println(f"\n===== $n: wall $wall%.3f s, ${snap.size} jobs =====")
          snap.sortBy(_._2).foreach { case (id, s, e, d) =>
            println(f"  job $id%3d  start+${(s - t0) / 1e9}%7.3f  " +
              f"dur ${(e - s) / 1e9}%6.3f  $d")
          }
      }
    }
    spark.stop()
  }
}
