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

  test("compactness separates clustered from isotropic-like corpora; " +
      "degreeForCorpus interpolates on it") {
    import spark.implicits._
    val dim = 16
    // strongly clustered: 4 tight clusters around +-1 corners
    val clustered = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(dim)(d =>
        (if ((d + c) % 2 == 0) 1f else -1f) +
          ((i * 31 + d * 7) % 11).toFloat / 100f))
    }.toDF("vec_id", "embedding")
    // isotropic-like: well-mixed hash-valued dims, no cluster structure
    val iso = (0L until 200L).map { i =>
      (i, Array.tabulate(dim) { d =>
        var x = (i + 1) * 0x9E3779B97F4A7C15L + (d + 1) * 0xBF58476D1CE4E5B9L
        x ^= (x >>> 31); x *= 0x94D049BB133111EBL; x ^= (x >>> 29)
        ((x % 1024L).toFloat / 512f)
      })
    }.toDF("vec_id", "embedding")
    val cClu = graft.ext.KnnGraph.compactness(clustered,
      Similarity.ivfFit(clustered, nlist = 4))
    val cIso = graft.ext.KnnGraph.compactness(iso,
      Similarity.ivfFit(iso, nlist = 4))
    assert(cClu < 0.25, s"clustered compactness $cClu not small")
    assert(cIso > 0.5, s"isotropic compactness $cIso not large")
    // rule arms: floor on clustered geometry, the isotropic
    // count-scaled rule on no-structure geometry, floor at gate sizes
    // regardless (registered results stay bit-identical)
    import graft.ext.KnnGraph.{degreeFor, degreeForCorpus}
    assert(degreeForCorpus(200000L, 0.02) === 18)
    assert(degreeForCorpus(200000L, 0.99) === degreeFor(200000L))
    assert(degreeForCorpus(2000L, 0.02) === 18)
    assert(degreeForCorpus(2000L, 0.99) === 18)
    // monotone interpolation in between
    val mid = degreeForCorpus(200000L, 0.5)
    assert(mid >= 18 && mid <= degreeFor(200000L))
  }
}
