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
  * Corpus families: a directory argument probes driver testdata (or a
  * [[ScaleProbe]] sign-flip replica blowup — the ISOTROPIC worst case,
  * which [[graft.ext.KnnGraph.degreeFor]] is calibrated on). The
  * `gen:clustered:N[:C[:SIGMA]]` argument instead synthesizes N
  * deterministic vectors from a C-center mixture (hash-seeded ±1
  * hypercube centers, per-dim uniform noise of width SIGMA — the
  * kmeans fixture's geometry at probe scale): the CLUSTERED family,
  * where neighbors concentrate inside coarse cells and the
  * count-scaled degree rule is expected to overpay (VERDICT r13 #6 —
  * this lane is the measurement that decides whether the rule can be
  * structure-aware).
  *
  * Usage: runMain graft.RecallProbe <dir|gen:clustered:N[:C[:SIGMA]]>
  *          [degree; 0/absent = the
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
    val emb =
      if (dir.startsWith("gen:clustered:")) {
        val parts = dir.stripPrefix("gen:clustered:").split(":")
        clusteredCorpus(spark, parts(0).toLong,
          parts.lift(1).map(_.toInt).getOrElse(256),
          parts.lift(2).map(_.toDouble).getOrElse(0.25))
      } else graft.sources.Tables.table(spark, dir, "embeddings")
    val n = emb.count()
    // registered sizing: nlist from the corpus-count stat, fit-capped;
    // degree from the measured structure-aware rule unless pinned (pass
    // a positive 2nd arg to sweep a fixed degree, 0/absent for the rule)
    val nlist = math.min(Similarity.IvfFitNlistCap.toLong,
      math.max(8L, n / 512L)).toInt
    val t0 = System.nanoTime()
    val centroids = Similarity.ivfFit(emb, nlist = nlist)
    val compact = KnnGraph.compactness(emb, centroids)
    val degree = degreeArg.getOrElse(KnnGraph.degreeForCorpus(n, compact))
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
      s""","nlist":$nlist,"compactness":${f3(compact)}""" +
      s""","degree":$degree,"iters":$iters""" +
      s""","nprobe":$nprobe,"n_queries":${row.getLong(0)},"k":$k""" +
      s""","hits":${row.getLong(2)},"recall":${row.getDouble(3)}""" +
      s""","build_sec":${f3((t1 - t0) / 1e9)}""" +
      s""","witness_sec":${f3((t2 - t1) / 1e9)}}""")
    spark.stop()
  }

  /** Deterministic C-center mixture corpus (vec_id, embedding[dim]):
    * center c sits on a hash-seeded ±1 hypercube corner, each vector
    * adds per-dim uniform noise of half-width `sigma` — all from
    * xxhash64, no RNG state, so any (n, c, sigma) names ONE corpus.
    * Codegen-friendly: one spark.range, transforms over a sequence,
    * no driver arrays, no UDFs. */
  private[graft] def clusteredCorpus(spark: SparkSession, n: Long,
                                     centers: Int, sigma: Double,
                                     dim: Int = 64) = {
    val c = pmod(xxhash64(lit("cl-c"), col("id")), lit(centers.toLong))
    spark.range(n)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), d => {
          val corner = (pmod(xxhash64(lit("cl-d"), c, d), lit(2L))
            .cast("double") * 2.0 - 1.0)
          val noise = (pmod(xxhash64(lit("cl-n"), col("id"), d),
            lit(2000L)).cast("double") / 1000.0 - 1.0) * sigma
          (corner + noise).cast("float")
        }).as("embedding"))
  }
}
