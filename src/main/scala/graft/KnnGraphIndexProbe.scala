package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{KnnGraphIndex, Similarity}

/** Ingest-vs-rebuild probe for the persisted kNN graph
  * ([[graft.ext.KnnGraphIndex]]): the asset's economic claim is that
  * absorbing a batch costs a FRACTION of rebuilding, at held recall.
  * This harness builds the index on 90% of a corpus, times `ingest` of
  * the held-out 10%, times a full `create` on 100% for comparison, and
  * prints ONE JSON line with both walls, their ratio, and the tie-aware
  * recall@k of the INGESTED vectors' edges vs in-plan brute force over
  * the full corpus.
  *
  * Usage: runMain graft.KnnGraphIndexProbe
  *          <dir|gen:clustered:N[:C[:SIGMA]]> [nQueries] [k]
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object KnnGraphIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(30)
    val k = args.lift(2).map(_.toInt).getOrElse(3)
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
    val emb = (
      if (dir.startsWith("gen:clustered:")) {
        val parts = dir.stripPrefix("gen:clustered:").split(":")
        RecallProbe.clusteredCorpus(spark, parts(0).toLong,
          parts.lift(1).map(_.toInt).getOrElse(256),
          parts.lift(2).map(_.toDouble).getOrElse(0.25))
      } else graft.sources.Tables.table(spark, dir, "embeddings")
    ).select(col("vec_id"), col("embedding")).persist()
    val n = emb.count()
    val base = emb.where(col("vec_id") % 10 =!= 0)
    val batch = emb.where(col("vec_id") % 10 === 0)
    def tmp(tag: String) = java.nio.file.Files
      .createTempDirectory(s"kgi-probe-$tag").toString + "/root"
    // build the 90% asset, then time the 10% ingest against it
    val root = tmp("base")
    val t0 = System.nanoTime()
    KnnGraphIndex.create(base, root)
    val t1 = System.nanoTime()
    KnnGraphIndex.ingest(root, emb, batch)
    val t2 = System.nanoTime()
    // the comparison rebuild: a fresh create over the FULL corpus —
    // what a user without the asset pays on every batch arrival
    KnnGraphIndex.create(emb, tmp("full"))
    val t3 = System.nanoTime()
    // recall of the ingested vectors' edges vs brute force (the batch's
    // first nQueries ids)
    val g = KnnGraphIndex.topK(spark, root)
    val queries = batch.orderBy(col("vec_id")).limit(nQueries)
    val row = Similarity.recallFraction(
      g.join(queries.select(col("vec_id")), Seq("vec_id"), "left_semi")
        .select(col("vec_id").as("query_id"),
          col("neighbor_id").as("cand_id")),
      emb, queries, k, force = true).head
    def f3(d: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val ingestSec = (t2 - t1) / 1e9
    val rebuildSec = (t3 - t2) / 1e9
    println(s"""{"metric":"knn_graph_ingest_probe","dir":"$dir","n":$n""" +
      s""","batch_frac":0.1,"k":$k,"n_queries":${row.getLong(0)}""" +
      s""","hits":${row.getLong(2)},"ingest_recall":${row.getDouble(3)}""" +
      s""","create90_sec":${f3((t1 - t0) / 1e9)}""" +
      s""","ingest_sec":${f3(ingestSec)}""" +
      s""","rebuild_sec":${f3(rebuildSec)}""" +
      s""","ingest_over_rebuild":${f3(ingestSec / math.max(rebuildSec, 1e-9))}}""")
    spark.stop()
  }
}
