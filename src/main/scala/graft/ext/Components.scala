package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns pairwise
  * near-dup DETECTION (`Dedup.*Pairs`) into dedup GROUPS: docs joined by
  * any chain of near-dup pairs belong to one cluster, from which a single
  * survivor (e.g. min doc_id) is kept.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the minimum of its own and
  * its neighbors' labels; fixpoint = components labeled by their smallest
  * member. Converges in O(component diameter) rounds — for near-dup
  * clusters (dense, tiny diameter) a handful; the driver loop only runs a
  * per-round distributed join + aggregate and checks a changed-row count,
  * so each round is one shuffle on the edge key. This is the
  * GraphX/Pregel-free formulation (cf. the map-reduce CC literature's
  * label-propagation baseline; small-star/large-star halves rounds on
  * high-diameter graphs but near-dup clusters don't have them).
  *
  * Scale posture: edges are persisted once (re-read every round); each
  * round's labels are EAGERLY localCheckpoint'ed. The checkpoint is what
  * makes driver-side iteration viable: without it every round's plan
  * nests the previous round's, and Catalyst re-analysis/optimization time
  * grows superlinearly with depth (observed: minutes of pure planning by
  * round ~20). With it, each round plans against a materialized leaf.
  * Determinism: min() is order-insensitive.
  */
object Components {

  /** (node, component) for every node appearing in `edges`; `component` is
    * the smallest node id reachable through the undirected edge set.
    * `maxIter` caps rounds (= propagation hops); components wider than the
    * cap come out under-merged, so size it above the expected diameter —
    * near-dup clusters are dense and shallow, so the default is generous. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // each node's best neighbor label this round
      val nbr = sym
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels
        .join(nbr, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .localCheckpoint(true) // truncate lineage: see scaladoc
      changed = next.as("n")
        .join(labels.as("p"), col("n.node") === col("p.node"))
        .where(col("n.label") =!= col("p.label"))
        .count()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels.select(col("node").as("doc_id"), col("label").as("component"))
  }
}
