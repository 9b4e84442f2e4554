package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Corpus-wide kNN graph ([[Similarity.knnGraphIvf]]): the IVF-cell
  * self-join form whose query side is the corpus itself (no broadcast).
  * The load-bearing pin: with FULL probe coverage (nprobe = nlist) the
  * candidate set per vector is every other vector, so the graph must
  * equal exact brute-force top-k for EVERY vector — same rounding, same
  * (cos desc, id asc) tie order, topKBy vs window-rank agreeing row for
  * row. Partial probing is then only a recall question (witnessed
  * tie-aware by the registered query). */
class KnnGraphSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("full-probe graph equals exact brute-force top-k for every vector") {
    val emb = graft.sources.Tables.table(spark, sf, "embeddings")
    val centroids = Similarity.ivfFit(emb, nlist = 4)
    val graph = Similarity.knnGraphIvf(emb, k = 3, centroids, nprobe = 4)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val bf = Similarity.knnBruteForce(emb, emb, k = 3, force = true)
      .select(col("query_id"), col("cand_id"), col("rank"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(graph === bf)
  }

  test("partial probe: <= k edges per vector, candidates from probed cells only") {
    val emb = graft.sources.Tables.table(spark, sf, "embeddings")
    val centroids = Similarity.ivfFit(emb, nlist = 8)
    val graph = Similarity.knnGraphIvf(emb, k = 3, centroids, nprobe = 2)
    val degs = graph.groupBy(col("vec_id")).count()
      .agg(max(col("count")).as("mx")).head.getLong(0)
    assert(degs <= 3L)
    // subset of the full-probe (= exact) edges' candidate space: every
    // partial-probe neighbor must be a real corpus vector other than
    // the query, at the exact rounded cosine the brute-force path
    // computes — spot-checked via join
    val bf = Similarity.cosineNearDupPairs(emb, threshold = -1.0,
      force = true)
      .select(col("vec_a"), col("vec_b"), col("cos_sim").as("__exact"))
    val ab = graph
      .withColumn("vec_a", least(col("vec_id"), col("neighbor_id")))
      .withColumn("vec_b", greatest(col("vec_id"), col("neighbor_id")))
      .join(bf, Seq("vec_a", "vec_b"), "left")
    assert(ab.where(col("__exact").isNull ||
      col("__exact") =!= col("cos_sim")).count() === 0L)
  }

  test("deterministic: two runs produce identical edges") {
    val emb = graft.sources.Tables.table(spark, sf, "embeddings")
    val centroids = Similarity.ivfFit(emb, nlist = 8)
    def run() = Similarity.knnGraphIvf(emb, k = 3, centroids, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(run() === run())
  }
}
