package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{KnnGraph, Similarity}

/** Recall-at-scale probe for the corpus-wide kNN graph: builds
  * [[graft.ext.KnnGraph.knnGraphDescent]] on a (possibly replica-
  * generated, see [[ScaleProbe]]) embeddings dir and prints ONE JSON
  * line with the tie-aware recall@k of a deterministic probe subset vs
  * in-plan brute force ([[graft.ext.Similarity.recallFraction]] —
  * linear: |queries| × corpus) plus the build/witness walls. The
  * registered `knn_graph_refined` carries a thresholded witness; this
  * probe exists for SIZING sweeps, where the distance to the floor is
  * the signal (a fixed internal degree decays with n on isotropic
  * vectors — the KnnGraph Scaladoc's caveat — and this is the tool
  * that measures which degree earns the floor at which corpus size).
  *
  * Usage: runMain graft.RecallProbe <dir> [degree; 0/absent = the
  *          count-scaled rule [[graft.ext.KnnGraph.degreeFor]]] [iters]
  *          [nprobe] [nQueries] [k]
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val degreeArg = args.lift(1).map(_.toInt).filter(_ > 0)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val nprobe = args.lift(3).map(_.toInt).getOrElse(3)
    val nQueries = args.lift(4).map(_.toInt).getOrElse(30)
    val k = args.lift(5).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.table(spark, dir, "embeddings")
    val n = emb.count()
    // registered sizing: nlist from the corpus-count stat, fit-capped;
    // degree from the measured count-scaled rule unless pinned (pass a
    // positive 2nd arg to sweep a fixed degree, 0/absent for the rule)
    val degree = degreeArg.getOrElse(KnnGraph.degreeFor(n))
    val nlist = math.min(Similarity.IvfFitNlistCap.toLong,
      math.max(8L, n / 512L)).toInt
    val t0 = System.nanoTime()
    val centroids = Similarity.ivfFit(emb, nlist = nlist)
    val graph = KnnGraph.knnGraphDescent(emb, k, centroids,
      nprobe = nprobe, degree = degree, iters = iters)
    val t1 = System.nanoTime()
    val queries = emb.where(col("vec_id") < nQueries)
    val row = Similarity.recallFraction(
      graph.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"),
          col("neighbor_id").as("cand_id")),
      emb, queries, k, force = true).head
    val t2 = System.nanoTime()
    def f3(d: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    println(s"""{"metric":"knn_graph_recall","dir":"$dir","n":$n""" +
      s""","nlist":$nlist,"degree":$degree,"iters":$iters""" +
      s""","nprobe":$nprobe,"n_queries":${row.getLong(0)},"k":$k""" +
      s""","hits":${row.getLong(2)},"recall":${row.getDouble(3)}""" +
      s""","build_sec":${f3((t1 - t0) / 1e9)}""" +
      s""","witness_sec":${f3((t2 - t1) / 1e9)}}""")
    spark.stop()
  }
}
