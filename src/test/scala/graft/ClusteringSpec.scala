package graft

import org.apache.spark.sql.functions._

import graft.ext.Clustering

/** Distributed Lloyd k-means (ext/Clustering): hand-sized fits with
  * exactly predictable centroids, the empty-cluster policy, and the
  * inertia diagnostics. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("two clean clusters converge to the group means") {
    val v = vecs(
      0L -> Array(0f, 0f), 1L -> Array(10f, 10f),
      2L -> Array(0.2f, 0f), 3L -> Array(9.8f, 10f),
      4L -> Array(0.1f, 0.1f), 5L -> Array(10.1f, 9.9f))
    val cent = Clustering.lloydFit(v, k = 2, rounds = 3)
    assert(cent(0).map(x => math.rint(x * 1e6) / 1e6).toSeq
      === Seq(0.1, 0.033333))
    assert(math.abs(cent(1)(0) - 9.966667) < 1e-9)
    val a = Clustering.assignments(v, cent)
      .as[(Long, Int)].collect().toMap
    assert(Seq(0L, 2L, 4L).forall(a(_) == 0))
    assert(Seq(1L, 3L, 5L).forall(a(_) == 1))
  }

  test("an emptied cluster keeps its previous centroid") {
    // init = 3 lowest ids; c0 and c1 start identical, ties go to the
    // lowest cid, so c1 never receives a vector and must not move
    val v = vecs(
      0L -> Array(0f, 0f), 1L -> Array(0f, 0f), 2L -> Array(5f, 5f),
      3L -> Array(1f, 0f))
    val cent = Clustering.lloydFit(v, k = 3, rounds = 2)
    assert(cent(1).toSeq === Seq(0.0, 0.0))
    assert(cent(0)(0) > 0.0) // c0 absorbed vec 3 and moved
  }

  test("clusterStats: sizes and hand-computed inertia") {
    val v = vecs(
      0L -> Array(0f, 0f), 1L -> Array(2f, 0f), 2L -> Array(10f, 0f))
    val cent = Array(Array(1.0, 0.0), Array(10.0, 0.0))
    val s = Clustering.clusterStats(v, cent)
      .as[(Int, Long, Double)].collect()
      .map { case (c, n, i) => c -> ((n, i)) }.toMap
    assert(s(0) === ((2L, 2.0))) // (0−1)² + (2−1)²
    assert(s(1) === ((1L, 0.0)))
  }

  test("centroidsFrame shape: k×dim rows, cluster-major") {
    val v = vecs(
      0L -> Array(0f, 1f), 1L -> Array(4f, 5f), 2L -> Array(0f, 1f))
    val f = Clustering.centroidsFrame(v, k = 2, rounds = 1)
      .as[(Long, Long, Double)].collect()
    assert(f.length === 4)
    assert(f.map(r => (r._1, r._2)).toSeq ===
      Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
  }
}
