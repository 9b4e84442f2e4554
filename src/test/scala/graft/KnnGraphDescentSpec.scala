package graft

import org.apache.spark.sql.functions._

import graft.ext.{KnnGraph, SemanticDedup, Similarity}

/** NN-descent kNN graph ([[KnnGraph.knnGraphDescent]]): the
  * coverage-robust sibling of [[Similarity.knnGraphIvf]]. Pins:
  *
  *  - FULL coverage ≡ brute force: when the seed already offers every
  *    pair (nprobe = nlist, no cell splits), descent can only re-score
  *    known pairs, so the output must equal exact brute-force top-k row
  *    for row — the same load-bearing pin KnnGraphSpec keeps for the
  *    IVF form.
  *  - Descent IMPROVES a starved seed: from a deliberately poor seed
  *    (nprobe = 1), two rounds must reach at-least-brute-force-tie
  *    recall ≥ 0.6 on the spec corpus — the operator's whole contract.
  *  - Split cells (targetCell forced tiny) keep the graph valid and
  *    deterministic: the in-cell OR-LSH seed is a subset of the flat
  *    seed, never an invalid edge.
  */
class KnnGraphDescentSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def emb = graft.sources.Tables.table(spark, sf, "embeddings")

  test("degreeFor: 18 through 20k, +12/decade after, monotone") {
    // the measured sizing table (see KnnGraph.degreeFor's Scaladoc):
    // gate SFs stay at the floor (bit-identical registered results),
    // the replica factors match the validated sweep points
    assert(KnnGraph.degreeFor(500L) === 18)
    assert(KnnGraph.degreeFor(2000L) === 18)
    assert(KnnGraph.degreeFor(20000L) === 18)
    assert(KnnGraph.degreeFor(60000L) === 24)
    assert(KnnGraph.degreeFor(200000L) === 30)
    assert(KnnGraph.degreeFor(400000L) === 34)
    val pts = Seq(1L, 100L, 20000L, 50000L, 100000L, 1000000L, 100000000L)
    assert(pts.map(KnnGraph.degreeFor(_)) === pts.map(KnnGraph.degreeFor(_)).sorted)
  }

  test("full-coverage descent graph equals exact brute-force top-k") {
    val centroids = Similarity.ivfFit(emb, nlist = 4)
    val graph = KnnGraph.knnGraphDescent(emb, k = 3, centroids,
        nprobe = 4, degree = 6, iters = 1)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val bf = Similarity.knnBruteForce(emb, emb, k = 3, force = true)
      .select(col("query_id"), col("cand_id"), col("rank"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(graph === bf)
  }

  test("descent lifts a starved cross-cell seed to >= 0.6 tie-aware recall") {
    // nlist = 32 on the 500-vector corpus → ~6% probe coverage: the
    // seed alone measured 13/30 probe hits (floor FALSE — the exact
    // x10 failure shape the operator exists for); two rounds measured
    // 27/30. The floor assert keeps margin for data regens.
    val centroids = Similarity.ivfFit(emb, nlist = 32)
    def recallOf(graph: org.apache.spark.sql.DataFrame): Boolean = {
      val queries = emb.where(col("vec_id") < 10)
      Similarity.recallWitness(
        graph.where(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"),
            col("neighbor_id").as("cand_id")),
        emb, queries, k = 3).head.getBoolean(2)
    }
    val starved = KnnGraph.knnGraphDescent(emb, k = 3, centroids,
      nprobe = 2, degree = 12, iters = 0)
    val refined = KnnGraph.knnGraphDescent(emb, k = 3, centroids,
      nprobe = 2, degree = 12, iters = 2)
    assert(!recallOf(starved),
      "seed alone should fail the floor here — if it passes, the " +
        "starvation setup no longer exercises descent")
    assert(recallOf(refined), "descent recall floor failed")
  }

  test("1-probe seed is cell-disconnected: descent is provably a no-op") {
    // With nprobe = 1 every seed edge joins two vectors of the SAME
    // home cell, so the neighbor-of-neighbor closure never leaves the
    // cell and descent cannot add candidates — the documented regime
    // requirement (nprobe >= 2) pinned as an invariant.
    val centroids = Similarity.ivfFit(emb, nlist = 8)
    def run(iters: Int) = KnnGraph.knnGraphDescent(emb, k = 3, centroids,
        nprobe = 1, degree = 12, iters = iters)
      .collect().map(_.toString).sorted.toSeq
    assert(run(0) === run(2))
  }

  test("forced cell splits: valid exact-cosine edges, full degree, deterministic") {
    val centroids = Similarity.ivfFit(emb, nlist = 4)
    // targetCell = 8 forces refinePlanesFor > 0 on every cell of the
    // ~60-vector spec corpus → the per-cell OR-LSH seed path runs
    assert(SemanticDedup.refinePlanesFor(15, 8) > 0)
    def run() = KnnGraph.knnGraphDescent(emb, k = 3, centroids,
      nprobe = 2, degree = 8, iters = 2, targetCell = 8)
    val g = run()
    val rows = g.collect().map(_.toString).sorted.toSeq
    assert(rows === run().collect().map(_.toString).sorted.toSeq)
    // every vector present with exactly k edges at ranks 1..k
    val degs = g.groupBy(col("vec_id")).count()
    assert(degs.where(col("count") =!= 3L).count() === 0L)
    assert(degs.count() === emb.count())
    // every edge carries the exact rounded cosine of a real pair
    val bf = Similarity.cosineNearDupPairs(emb, threshold = -1.0,
        force = true)
      .select(col("vec_a"), col("vec_b"), col("cos_sim").as("__exact"))
    val ab = g
      .withColumn("vec_a", least(col("vec_id"), col("neighbor_id")))
      .withColumn("vec_b", greatest(col("vec_id"), col("neighbor_id")))
      .join(bf, Seq("vec_a", "vec_b"), "left")
    assert(ab.where(col("__exact").isNull ||
      col("__exact") =!= col("cos_sim")).count() === 0L)
  }
}
