package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — graph centrality as a
  * corpus-curation signal (link/interaction authority is a standard
  * quality weight for web-scale training data, the same role the
  * original used for search ranking). Second member of the iterative-
  * dataflow family next to [[Components.connectedComponents]], sharing
  * its execution posture: the degree-annotated edge working set is
  * persisted ONCE and re-read every round (re-deriving it per round
  * re-expands the whole upstream join into every iteration's plan —
  * measured 5× on the trade graph), and lineage is truncated on an
  * every-2-rounds cadence (eager localCheckpoint) so AQE never replans
  * a deeper-than-2-round tree while the job-launch count stays
  * ≈ iterations/2.
  *
  * Execution shape (round 17, guide §2.4 — remove shuffles outright):
  *  - out-degree attaches via `count() OVER (PARTITION BY src)` — ONE
  *    exchange of the edge list, where the former groupBy+join spent an
  *    aggregate exchange plus a two-sided join (and re-expanded the
  *    edge subtree into both join inputs);
  *  - nodes with no in-edge (= src-set ∖ dst-set) keep rank = base
  *    after round 1, so their per-round share contribution
  *    `base div outdeg` is a CONSTANT frame — computed once off the
  *    cached working set, cached, and unioned into each round's grouped
  *    sum instead of re-deriving it through a per-round
  *    nodes ⋈ sums left join (on a symmetrized graph, the registered
  *    query's case, both frames are simply empty);
  *  - round 1's shares are `unit div outdeg` straight off the cached
  *    edge set (no join at all); every later round is exactly one
  *    ranks ⋈ edges hash join plus the ONE unavoidable edge-sized
  *    grouped-sum exchange;
  *  - the no-in-edge rows union the output once, at the end.
  * Arithmetic is unchanged everywhere: {has-in-edge srcs} ∪
  * {no-in-edge srcs} partitions the edge sources, integer sums are
  * associative, and `coalesce(s, 0)` on a no-in-edge node is exactly
  * `base` — the unrolled-CTE oracle replays bit-identically.
  *
  * This is an EAGER builder (round 17): the returned ranks frame is
  * materialized (localCheckpoint) before the function returns, and the
  * working sets are unpersisted in a `finally`, mirroring
  * [[KnnGraph.descentAdjacency]]'s contained-lifetime pattern. Nothing
  * this function persists survives its return — no executor memory held
  * hostage, and no CacheManager plan-identity silently feeding a later
  * invocation (the round-16 shape left `withDeg` cached, so a bench's
  * warm-up pass pre-built the edge working set for the timed pass —
  * measurements understated the query's honest cost).
  *
  * All arithmetic is INTEGER (ranks in `unit` micro-units, damping as a
  * percentage, every division a truncating `div`), so the result is
  * bit-identical across engines and the oracle can replay the exact
  * iterations as unrolled SQL CTEs — the same trick that makes the
  * incremental-KPI and sampling families hash-checkable.
  *
  * Contract: nodes are the endpoints of `edges`; a node with no OUT
  * edges sheds its rank mass (standard dangling behavior) — pass a
  * symmetrized edge list (every edge both ways) for random-walk
  * centrality with no dangling nodes, which is what the registered
  * query does.
  */
object PageRank {

  /** Returns (node, rank_micro) after exactly `iterations` rounds of
    * r'(v) = (100-d)%·unit + d%·Σ_{u→v} (r(u) div outdeg(u)),
    * starting from r = unit everywhere. `edges` needs integral columns
    * (src, dst); duplicate edges count as parallel edges (dedupe first
    * for an unweighted graph).
    *
    * `symmetric = true` DECLARES every edge is present in both
    * directions (a caller that built `e ∪ e.swap` knows this by
    * construction): the dangling-node split is then provably empty, so
    * its derivation (two distinct projections + an anti join + an
    * emptiness probe — measured ~1 s of the registered query's wall)
    * is skipped outright. Results are identical to the default path on
    * any symmetric graph (spec-pinned); declaring it on a graph that
    * is NOT symmetric silently treats dangling nodes as absent — the
    * caller owns the claim, like [[KnnGraph.degreeForCorpus]]'s
    * structure declaration.
    *
    * NOTE eager: rounds materialize at call time — this is an iterative
    * builder, not a lazy plan fragment (see the object doc). */
  def pageRank(edges: DataFrame, iterations: Int, dampingPct: Int = 85,
               unit: Long = 1000000L, symmetric: Boolean = false): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100]: $dampingPct")
    // Degree-annotated edge working set: one window over one exchange
    // (bounded per-src partitions — the per-node fan-out of a trade
    // graph, not a corpus-sized single-partition window).
    val withDeg = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .withColumn("outdeg",
        count(lit(1)).over(Window.partitionBy(col("src"))))
      .persist()
    val base = unit * (100 - dampingPct) / 100
    // No-in-edge nodes = src-set ∖ dst-set (a node missing from dst has
    // an empty neighbor sum): rank = base from round 1 on, so their
    // outgoing shares are a CONSTANT frame for every round >= 2. On a
    // DECLARED-symmetric graph both frames are provably empty and are
    // never built at all.
    val noIn =
      if (symmetric) None
      else Some(withDeg.select(col("src").as("node")).distinct()
        .join(withDeg.select(col("dst")).distinct(),
          col("node") === col("dst"), "left_anti")
        .select(col("node"), lit(base).as("rank_micro")).persist())
    val noInShare = noIn.map(_
      .join(withDeg, col("node") === col("src"))
      .select(col("dst"), expr(s"$base div outdeg").as("share")).persist())
    try {
      if (iterations == 0) {
        val nodes = withDeg.select(col("src").as("node"))
          .union(withDeg.select(col("dst").as("node"))).distinct()
        return nodes.withColumn("rank_micro", lit(unit))
          .localCheckpoint(true)
      }
      // One node-set-sized action on the undeclared path: a fully
      // symmetrized graph has NO dangling split, and knowing that here
      // drops the per-round and final unions from the plans entirely —
      // the same results (union with an empty frame) minus its stages.
      // The probe reads the persisted noIn this loop consumes anyway.
      val hasNoIn = noIn.exists(n => !n.isEmpty)
      // Round 1: every rank is `unit` — shares come straight off the
      // cached edge set, no join.
      def finish(sums: DataFrame): DataFrame = sums
        .select(col("dst").as("node"),
          (lit(base) + expr(s"($dampingPct * s) div 100")).as("rank_micro"))
      var inRanks = finish(withDeg
        .select(col("dst"), expr(s"$unit div outdeg").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("s")))
      for (i <- 2 to iterations) {
        val shares = inRanks
          .join(withDeg, col("node") === col("src"))
          .select(col("dst"), expr("rank_micro div outdeg").as("share"))
        inRanks = finish(
          (if (hasNoIn) shares.unionByName(noInShare.get) else shares)
            .groupBy(col("dst")).agg(sum(col("share")).as("s")))
        // Lineage truncation every SECOND round: AQE re-optimizes the
        // REMAINING plan after every finished stage, so a deep
        // multi-round tree is replanned superlinearly at run time —
        // while a checkpoint EVERY round pays a job launch per round
        // (the measured-slower round-10 shape). Every-2 bounds both:
        // plan depth <= 2 rounds, extra jobs = iterations/2
        // (node-count-sized scalar rows).
        if (i % 2 == 0 && i < iterations)
          inRanks = inRanks.localCheckpoint(true)
      }
      // No-in-edge nodes surface once, here — not re-unioned per round.
      (if (hasNoIn) inRanks.unionByName(noIn.get) else inRanks)
        .localCheckpoint(true)
    } finally {
      // Contained lifetime (KnnGraph's pattern): every returned row
      // lives in the final localCheckpoint.
      noInShare.foreach(_.unpersist(false))
      noIn.foreach(_.unpersist(false))
      withDeg.unpersist(false)
      ()
    }
  }
}
