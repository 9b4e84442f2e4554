package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorAggregates.vecSum

/** Distributed Lloyd k-means over an embedding corpus — clustering as a
  * first-class, exactly-reproducible operator (the curriculum/mixing and
  * SemDeDup-style curation passes all start from one of these fits).
  *
  * Scale shape (the [[Bpe]] discipline applied to Lloyd): every round is
  * ONE corpus scan — nearest-centroid assignment is a pure projection
  * over inlined centroid literals ([[Similarity.ivfListId]], bounded at
  * k×dim values), and the centroid update is a single hash aggregate
  * through the [[graft.functions.VectorAggregates.vecSum]] typed buffer
  * (map-side combine; k rows × dim doubles cross the exchange; only the
  * k-row result reaches the driver). Driver state is the k×dim centroid
  * table — never corpus-sized. For k beyond plan-literal comfort
  * (≳ [[Similarity.IvfFitNlistCap]]) the same two-regime answer as
  * [[SemanticDedup]] applies: coarse-quantize first; this operator keeps
  * the caller-chosen-k regime.
  *
  * Exact cross-engine reproducibility (what makes the fit ORACLE-able,
  * not just spec-checked):
  *  - deterministic init: the k lowest-vec_id embeddings;
  *  - centroids ROUND to `dp` decimals after init and after every
  *    update — float sums are merge-order-dependent at ~1e-15, and
  *    rounding re-synchronizes both engines before the values feed the
  *    next round's distances;
  *  - assignment distances run in one fixed op order (−2·v·c + |c|²,
  *    left-fold dot — [[Similarity.dotN]]) over identical rounded
  *    centroids, so argmins are bit-identical; ties break to the lowest
  *    centroid id;
  *  - an emptied cluster keeps its previous centroid (both engines).
  */
object Clustering {

  /** Lloyd fit: `rounds` full rounds from the deterministic init.
    * Returns the k×dim centroid table (rounded to `dp`).
    *
    * The (vec_id, embedding) working set is persisted for the duration
    * of the fit — every round is one aggregate over the SAME projection,
    * and re-deriving it from the source per round re-pays the scan
    * `rounds`+1 times (the [[graft.ext.PageRank]] working-set pattern,
    * guide §5: reuse + recompute-cost both in favor). The cache is
    * contained: unpersisted before returning, so no state outlives the
    * call. */
  def lloydFit(vecs: DataFrame, k: Int, rounds: Int,
               dp: Int = 6): Array[Array[Double]] = {
    val work = vecs.select(col("vec_id"), col("embedding")).persist()
    try lloydFitOn(work, k, rounds, dp)
    finally work.unpersist(false)
  }

  /** Fit core over an already-persisted working set — shared by
    * [[lloydFit]] and [[elbowFrame]] (which runs several fits over ONE
    * cached projection, concurrently). */
  private def lloydFitOn(vecs: DataFrame, k: Int, rounds: Int,
                         dp: Int = 6): Array[Array[Double]] = {
    require(k >= 2 && k <= 4096, s"unreasonable k: $k")
    require(rounds >= 0 && rounds <= 64, s"unreasonable rounds: $rounds")
    // ALL rounding happens through Spark's own `round` (HALF_UP with
    // Spark's exact decimal semantics) inside the plans, never a
    // driver-side reimplementation — the oracle pairs Spark round with
    // DuckDB round across the whole library, and a subtly different
    // BigDecimal construction here would desynchronize the fits at
    // exact .5 ulp boundaries.
    var cent: Array[Array[Double]] = vecs.orderBy(col("vec_id")).limit(k)
      .select(transform(col("embedding"),
        x => round(x.cast("double"), dp)).as("c"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(cent.length == k, s"corpus has fewer than k=$k vectors")
    for (_ <- 1 to rounds) {
      val means = vecs
        .select(Similarity.ivfListId(col("embedding"), cent).as("cluster"),
          col("embedding"))
        .groupBy(col("cluster"))
        .agg(vecSum(col("embedding")).as("s"), count(lit(1)).as("n"))
        .select(col("cluster"),
          transform(col("s"), x => round(x / col("n"), dp)).as("m"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toMap
      cent = cent.zipWithIndex.map { case (prev, cid) =>
        means.getOrElse(cid, prev) // emptied cluster keeps its centroid
      }
    }
    cent
  }

  /** Per-vector assignment under a fitted model: (vec_id, cluster). */
  def assignments(vecs: DataFrame,
                  centroids: Array[Array[Double]]): DataFrame =
    vecs.select(col("vec_id"),
      Similarity.ivfListId(col("embedding"), centroids).as("cluster"))

  /** Per-cluster fit diagnostics: size and inertia (Σ‖v−c‖², the k-picking
    * elbow number), inertia rounded to 4 dp. Distances accumulate per-dim
    * in index order — the cross-engine-stable form. */
  def clusterStats(vecs: DataFrame,
                   centroids: Array[Array[Double]]): DataFrame = {
    val dim = centroids(0).length
    val distSq: Column = {
      val cl = typedLit(centroids.map(_.toSeq).toSeq)
      // (a−b)·(a−b), not pow(a−b, 2): pow is only ≤1-ulp-correct and the
      // two engines' libm may round differently; multiplication is exact
      aggregate(sequence(lit(1), lit(dim)), lit(0.0), (acc, i) => {
        val d = element_at(col("embedding"), i).cast("double") -
          element_at(element_at(cl, col("cluster") + 1), i)
        acc + d * d
      })
    }
    // cluster AND embedding in ONE projection over the scan: the earlier
    // shape re-attached the embedding via assignments ⋈ vecs on vec_id —
    // a corpus-sized self-join (2 Exchange + join) buying a column the
    // projection already had (guide §2.4: remove shuffles outright).
    vecs.select(
        Similarity.ivfListId(col("embedding"), centroids).as("cluster"),
        col("embedding"))
      .select(col("cluster"), distSq.as("d2"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), round(sum(col("d2")), 4).as("inertia"))
      .orderBy(col("cluster"))
  }

  /** Euclidean distance from the embedding column to one centroid
    * literal — per-dim (a−b)·(a−b) in index order (exact, unlike pow),
    * then one correctly-rounded sqrt: bit-identical in any engine. */
  private def distTo(c: Array[Double]): Column = {
    val cl = typedLit(c.toSeq)
    sqrt(aggregate(sequence(lit(1), lit(c.length)), lit(0.0), (acc, i) => {
      val d = element_at(col("embedding"), i).cast("double") -
        element_at(cl, i)
      acc + d * d
    }))
  }

  /** Per-cluster simplified silhouette (Hruschka et al.'s
    * centroid-based variant — a = distance to own centroid, b = nearest
    * OTHER centroid, s = (b−a)/max(a,b), 0 when both are 0): size and
    * mean silhouette rounded 6 dp. One scan, pure projection over k×dim
    * literals — the O(n·k) diagnostic, never the O(n²) pairwise
    * original (which is the same trade SemDeDup makes). */
  def silhouette(vecs: DataFrame,
                 centroids: Array[Array[Double]]): DataFrame = {
    val dists = array(centroids.map(distTo).toIndexedSeq: _*)
    val a = element_at(col("__d"), col("cluster") + 1)
    // own-cluster slot nulled; array_min skips nulls
    val b = array_min(zip_with(col("__d"),
      typedLit(centroids.indices.map(_.toLong)),
      (d, i) => when(i === col("cluster").cast("long"), lit(null)
        .cast("double")).otherwise(d)))
    // same fused-projection shape as [[clusterStats]]: no re-attach join
    vecs.select(
        Similarity.ivfListId(col("embedding"), centroids).as("cluster"),
        col("embedding"))
      .select(col("cluster"), dists.as("__d"))
      .select(col("cluster"),
        when(greatest(a, b) > 0.0, (b - a) / greatest(a, b))
          .otherwise(lit(0.0)).as("s"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), round(avg(col("s")), 6).as("silhouette"))
      .orderBy(col("cluster"))
  }

  /** Elbow curve: total inertia after `rounds` Lloyd rounds for each k —
    * one independent fit per k, each one aggregate row.
    *
    * The fits share ONE persisted working set and run CONCURRENTLY
    * (guide §2.6 — independent jobs submitted from a small thread pool
    * back-fill each other's stragglers; each fit is a chain of tiny
    * collect jobs, so serializing them left the cluster idle between
    * rounds). Results are unchanged: the fits are independent and each
    * is deterministic. The cache is contained — unpersisted once every
    * fit has collected; the returned inertia legs re-derive from the
    * source (fused projection, no join). */
  def elbowFrame(vecs: DataFrame, ks: Seq[Int], rounds: Int): DataFrame = {
    val work = vecs.select(col("vec_id"), col("embedding")).persist()
    // try/finally: a throwing fit (lloydFitOn's k-cap require, corpus
    // smaller than k) must not leak the persisted working set for the
    // rest of the session (ADVICE r16). Pool capped at 8 — "small thread
    // pool" per §2.6: enough concurrent job chains to back-fill
    // stragglers, not one scheduler fight per requested k.
    val cents: Seq[(Int, Array[Array[Double]])] =
      try {
        if (ks.size <= 1) ks.map(k => k -> lloydFitOn(work, k, rounds))
        else {
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(ks.size, 8))
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutorService(pool)
          try scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(
              ks.map(k => scala.concurrent.Future(k -> lloydFitOn(work, k, rounds)))),
            scala.concurrent.duration.Duration.Inf)
          finally pool.shutdown()
        }
      } finally work.unpersist(false)
    cents.map { case (k, cent) =>
      val dim = cent(0).length
      val cl = typedLit(cent.map(_.toSeq).toSeq)
      val d2 = aggregate(sequence(lit(1), lit(dim)), lit(0.0), (acc, i) => {
        val d = element_at(col("embedding"), i).cast("double") -
          element_at(element_at(cl, col("cluster") + 1), i)
        acc + d * d
      })
      vecs.select(
          Similarity.ivfListId(col("embedding"), cent).as("cluster"),
          col("embedding"))
        .select(d2.as("d2"))
        .agg(round(sum(col("d2")), 4).as("inertia"))
        .select(lit(k.toLong).as("k"), col("inertia"))
    }.reduce(_ unionByName _)
  }

  /** Final centroid table as a frame: (cluster, dim, centroid). */
  def centroidsFrame(vecs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    lloydFit(vecs, k, rounds).zipWithIndex.flatMap { case (c, cid) =>
      c.zipWithIndex.map { case (x, d) => (cid.toLong, d.toLong, x) }
    }.toSeq.toDF("cluster", "dim", "centroid")
  }
}
