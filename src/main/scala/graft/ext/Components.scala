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
  * member. Each round ALSO pointer-jumps through the previous round's
  * labels (label ← label-of-label — the short-cutting idea of the
  * map-reduce CC literature's small-star/large-star family), so the
  * reachable distance doubles per round and convergence is O(log
  * component diameter) rounds, not O(diameter): dense near-dup clusters
  * still finish in a handful, and the 16-hop chains the semantic
  * near-dup graph produces (measured at sf0.1, threshold 0.4) finish in
  * ~5 instead of 16. The driver loop only runs a per-round distributed
  * join + aggregate and checks a changed-row count, so each round is one
  * shuffle on the edge key plus a node-count-sized label lookup.
  *
  * Scale posture: edges are persisted once (re-read every round). Each
  * round's labels are checkpointed LAZILY and the convergence count is the
  * materializing action, so a round costs exactly ONE job (the earlier
  * eager-checkpoint + separate join-and-count shape ran two, the second a
  * full next-vs-prev join). The checkpoint is what makes driver-side
  * iteration viable: without it every round's plan nests the previous
  * round's, and Catalyst re-analysis/optimization time grows superlinearly
  * with depth (observed: minutes of pure planning by round ~20). With it,
  * each round plans against a materialized leaf.
  *
  * Durability: `localCheckpoint` (default) stores round state on executor
  * block managers — if an executor is lost, the *job* fails and the caller
  * retries, which is acceptable because rounds are cheap and the input
  * `edges` plan is recomputable; Spark task-level retry still covers the
  * common failure mode (single task death) because each round's lineage
  * root is the previous checkpoint, still resident. For long multi-hour
  * runs on preemptible fleets, pass `reliableCheckpoint = true` (requires
  * `spark.sparkContext.setCheckpointDir(...)`) to write round state to the
  * checkpoint dir (HDFS/object store) so executor loss survives without a
  * restart. Determinism: min() is order-insensitive.
  */
object Components {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** (node, component) for every node appearing in `edges`; `component` is
    * the smallest node id reachable through the undirected edge set.
    * `maxIter` caps rounds (= propagation hops); components wider than the
    * cap come out under-merged, so size it above the expected diameter —
    * near-dup clusters are dense and shallow, so the default is generous.
    * Hitting the cap unconverged logs a warning (or throws when
    * `failOnNonConvergence`) rather than silently returning under-merged
    * labels. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25,
                          reliableCheckpoint: Boolean = false,
                          failOnNonConvergence: Boolean = false): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()
    // Lazy checkpoint: the count() below materializes the blocks AND
    // computes the convergence aggregate in the SAME job.
    def snapshot(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)
    var labels = snapshot(sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")))
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val roundT0 = System.nanoTime()
      // each node's best neighbor label this round
      val nbr = sym
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      // `ch` rides along in the snapshot so convergence needs no
      // next-vs-prev join: labels only ever decrease, so changed ⟺ some
      // hop improved the current label.
      val next = snapshot(labels
        .join(nbr, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("l1"),
          coalesce(col("nbr_label") < col("label"), lit(false)).as("ch1"))
        // SHORT-CUT (pointer jumping): a second hop through the PREVIOUS
        // round's materialized labels — l1 is itself a node id, and its
        // stored label pulls the min within last round's reach, so the
        // per-round reachable distance DOUBLES (O(log diameter) rounds,
        // not O(diameter)) for one extra node-count-sized join against a
        // checkpointed leaf; the round still materializes in ONE job.
        // This stopped being a theoretical nicety in r14: the semantic
        // near-dup graph at 0.4 forms 16-hop chains (measured), and the
        // plain propagation paid 16 rounds within a 25-round cap.
        .join(labels.select(col("node").as("l1"), col("label").as("l2")),
          Seq("l1"), "left")
        .select(col("node"),
          least(col("l1"), coalesce(col("l2"), col("l1"))).as("label"),
          (col("ch1") ||
            coalesce(col("l2") < col("l1"), lit(false))).as("ch")))
      changed = next.where(col("ch")).count() // materializes the snapshot
      labels = next.drop("ch")
      iter += 1
      // Round telemetry at debug: at cluster scale the round count and
      // per-round cost are the two numbers that explain CC wall time
      // (rounds = diameter; cost = one shuffle over edges+labels).
      if (log.isDebugEnabled)
        log.debug(s"CC round $iter: changed=$changed " +
          f"(${(System.nanoTime() - roundT0) / 1e9}%.2fs)")
    }
    sym.unpersist()
    if (changed > 0) {
      val msg = s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing) — results are under-merged; " +
        "raise maxIter above the component diameter"
      if (failOnNonConvergence) throw new IllegalStateException(msg)
      log.warn(msg)
    }
    labels.select(col("node").as("doc_id"), col("label").as("component"))
  }

  /** The detect → group → drop loop closed end to end: group the near-dup
    * `pairs` into components, keep one survivor per component (the
    * smallest id — which IS the component label, by min-propagation
    * construction), and rewrite `corpus` with every non-survivor removed.
    * Docs in no pair are untouched.
    *
    * Scale posture: the non-survivor set is duplicate-count-sized (never
    * corpus-sized), so the final `left_anti` join is the only corpus-wide
    * op and AQE broadcasts the loser side when the dup rate is low; the
    * rewrite streams the corpus through one scan. */
  def dedupSurvivors(corpus: DataFrame, pairs: DataFrame,
                     aCol: String = "doc_a", bCol: String = "doc_b",
                     idCol: String = "doc_id",
                     maxIter: Int = 25): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol, maxIter)
      .where(col("doc_id") =!= col("component"))
      .select(col("doc_id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }
}
