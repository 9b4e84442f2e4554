package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dotNative

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): prune near-identical embeddings WITHIN k-means
  * clusters instead of over all pairs. Complements the document-text
  * family (MinHash/SimHash/winnowing in [[Dedup]]) and the LSH cosine
  * path ([[Similarity.cosineNearDupPairsLshAdaptive]]) — k-means lists
  * give semantically-coherent buckets, so the within-bucket comparison
  * catches paraphrase-level duplicates that shingle hashing cannot see.
  *
  * Scale shape (the reason SemDeDup exists at corpus scale): the corpus
  * shuffles ONCE on the cluster id and pairs are generated per cluster —
  * expected pair work is N·clusterSize/2, not N²/2. The cluster count
  * adapts to the corpus (`ceil(n / targetClusterSize)`, floor 8) exactly
  * like the adaptive-LSH sizing rule, so per-cluster occupancy — and with
  * it per-task pair fan-out — stays bounded as the corpus grows; the
  * centroid fit itself is the bounded driver-side sample k-means already
  * used by the IVF index ([[Similarity.ivfFit]]). At 100 TB the `count()`
  * here is a table-catalog statistic, and the centroid array (nlist·dim
  * doubles) rides the plan as literals — no side channel, no second scan.
  *
  * Pruning rule (deterministic, order-free): a vector is PRUNED iff some
  * LOWER-ID vector in the same cluster has rounded cosine ≥ threshold
  * with it; its `keeper_id` is the smallest such id. Consequences the
  * witness query verifies in-plan rather than trusts:
  *  - every pruned vector is also globally prunable (a lower-id in-cluster
  *    neighbor is a lower-id global neighbor), so pruned ⊆ the exact
  *    brute-force prunable set;
  *  - survivors are pairwise non-duplicate within every cluster (if two
  *    survivors matched, the higher id would have been pruned);
  *  - recall vs the exact set is bounded by the cluster split (near-dups
  *    straddling a k-means boundary are missed) — the deliberate
  *    SemDeDup trade, measured and floored in the registered witness.
  *
  * Cosine uses the same 6-dp rounding as [[Similarity.cosineNearDupPairs]]
  * so the subset relation holds exactly at the threshold boundary.
  *
  * Reference scope: the reference pipeline has no embedding operators —
  * this is part of the beyond-reference LLM-curation surface (SURVEY.md
  * §2 extensions), built only from the published SemDeDup/FAISS ideas.
  */
object SemanticDedup {

  /** The `probes` nearest-centroid list ids (squared-L2 argmin expanded
    * as −2·v·c + |c|², |v|² constant per row), as an array — the
    * multi-probe assignment that rescues near-dup pairs straddling a
    * k-means boundary (single-assignment recall measured < 0.5 on the
    * test corpus; 2-probe 0.79–1.0). Pure projection over inlined centroid
    * literals, like [[Similarity.ivfListId]]. */
  def ivfListIds(v: Column, centroids: Array[Array[Double]],
                 probes: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(-2.0) * Similarity.dotN(v, typedLit(c.toSeq), c.length)
        + lit(c2)).as("d"), lit(i).as("i"))
    }
    transform(slice(array_sort(array(scored.toIndexedSeq: _*)),
      1, math.min(probes, centroids.length)), s => s.getField("i"))
  }

  /** Per-vector verdict frame: `vec_id`, `cluster` (nearest k-means list
    * id), `pruned` (boolean), `keeper_id`/`keeper_cos` (smallest
    * qualifying lower-id neighbor and its rounded cosine; null for
    * survivors). Pairs are generated within each of the `probes` nearest
    * lists per vector (expected pair work probes²·N·clusterSize/2 —
    * still linear in N, never all-pairs). */
  def verdicts(corpus: DataFrame, threshold: Double,
               targetClusterSize: Int = 1024, seed: Long = 42L,
               probes: Int = 2, dim: Int = 64): DataFrame = {
    // metadata-cheap on a scan-rooted corpus; a catalog stat at scale
    val n = math.max(1L, corpus.count())
    val nlist = math.max(8, math.ceil(n.toDouble / targetClusterSize).toInt)
    val centroids = Similarity.ivfFit(corpus, nlist, seed)
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val v0 = corpus.repartition(par)
      .select(col("vec_id"), col("embedding"),
        dotNative(col("embedding"), col("embedding")).as("n2"))
      .withColumn("__lists",
        ivfListIds(col("embedding"), centroids, probes))
    // all probed lists feed pair-gen; the nearest (first) is the
    // reported cluster on the verdict row
    val v = v0.withColumn("plist", explode(col("__lists")))
    val a = v.select(col("plist"), col("vec_id").as("vec_a"),
      col("embedding").as("va"), col("n2").as("n2a"))
    val b = v.select(col("plist"), col("vec_id").as("vec_b"),
      col("embedding").as("vb"), col("n2").as("n2b"))
    // one shuffle on list id; pairs never leave their list partition. A
    // pair sharing several probed lists is sighted more than once — the
    // keeper struct-min below collapses sightings, so no distinct pass.
    val dupPairs = a.join(b, Seq("plist"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(Similarity.pairCosine(dotNative(col("va"), col("vb")),
          col("n2a"), col("n2b")), 6).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
    // smallest qualifying keeper, its cosine riding the same struct-min
    val pruned = dupPairs
      .groupBy(col("vec_b").as("vec_id"))
      .agg(min(struct(col("vec_a"), col("cos_sim"))).as("__k"))
      .select(col("vec_id"), col("__k.vec_a").as("keeper_id"),
        col("__k.cos_sim").as("keeper_cos"))
    v0.select(col("vec_id"), element_at(col("__lists"), 1).as("cluster"))
      .join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        col("keeper_id").isNotNull.as("pruned"),
        col("keeper_id"), col("keeper_cos"))
  }

  /** Surviving corpus after [[verdicts]]-based pruning (the operator a
    * pipeline actually chains): anti-join on the pruned ids — one
    * broadcast-able verdict side at real scale since pruned ids are a
    * fraction of the corpus, but written as a plain left-anti so AQE
    * decides. */
  def survivors(corpus: DataFrame, threshold: Double,
                targetClusterSize: Int = 1024, seed: Long = 42L): DataFrame = {
    val pruned = verdicts(corpus, threshold, targetClusterSize, seed)
      .where(col("pruned")).select(col("vec_id"))
    corpus.join(pruned, Seq("vec_id"), "left_anti")
  }

  /** In-plan cosine between two embedding columns with the library's
    * 6-dp rounding — for witness queries re-verifying pruned pairs. */
  def roundedCosine(a: Column, b: Column): Column =
    round(Similarity.pairCosine(dotNative(a, b),
      dotNative(a, a), dotNative(b, b)), 6)
}
