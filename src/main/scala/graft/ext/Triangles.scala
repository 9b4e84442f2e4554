package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting and the global clustering coefficient — the third
  * classic graph primitive next to [[PageRank]] and [[Components]]
  * (community cohesion, spam/collusion signals, graph-health metrics).
  * The reference has no graph view at all; this extends the same
  * trade-graph family `supplier_pagerank` curates on.
  *
  * Algorithm: degree orientation (the MapReduce-era standard — Suri &
  * Vassilvitskii WWW'11 / Cohen 2009). Each undirected edge is oriented
  * from its (degree, id)-smaller endpoint to the larger; every triangle
  * then has exactly ONE node with two outgoing oriented edges, so
  * counting (wedge from oriented pairs) ⋈ (closing edge) counts each
  * triangle once — and the wedge fan-out per node is bounded by its
  * ORIENTED out-degree ≤ O(√m) on any graph, not its raw degree: the
  * celebrity node that breaks the naive wedge join never materializes
  * its fan squared.
  *
  * Scale shape: distinct-edge normalization (one shuffle), a node-keyed
  * degree aggregate, two edge⋈degree joins (degree side is node-sized —
  * broadcastable), the oriented self-join on the wedge center, and ONE
  * closing-edge join. Everything is exact integer arithmetic; the only
  * rounded value is the final clustering ratio (6 dp).
  */
object Triangles {

  /** Normalize an arbitrary (src, dst) edge list to distinct undirected
    * (a < b) edges; self-loops drop. */
  def undirect(edges: DataFrame): DataFrame =
    edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") < col("b"))
      .distinct()

  /** Node degrees of the normalized graph: (node, deg). */
  private def degrees(und: DataFrame): DataFrame =
    und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** Every triangle exactly once as its three corners (u, x, y): u is
    * the unique node with two OUTGOING oriented edges, x < y. */
  private def triangleCorners(und: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    // orient low (degree, id) -> high; a < b already, so ties keep a -> b
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // The oriented edge list feeds BOTH sides of the wedge self-join —
    // one eager executor-local materialization (edge-count scalar rows)
    // instead of re-running the two degree joins per side (guide §2.4).
    val oriented = withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("u"),
      when(lowFirst, col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint(true)
    val cand = oriented.select(col("u"), col("v").as("x"))
      .join(oriented.select(col("u"), col("v").as("y")), "u")
      .where(col("x") < col("y"))
    // closing-edge probe via a renamed projection: und sits in cand's own
    // lineage, so a direct column-reference join would be self-join
    // ambiguous
    val closing = und.select(col("a").as("x"), col("b").as("y"))
    cand.join(closing, Seq("x", "y")).select(col("u"), col("x"), col("y"))
  }

  /** One-row global report: (n_nodes, n_edges, n_wedges, n_triangles,
    * clustering) where n_wedges = Σ_v C(deg v, 2) (paths of length 2,
    * open or closed) and clustering = 3·triangles / wedges (0 when the
    * graph has no wedge). */
  def triangleStats(edges: DataFrame): DataFrame = {
    // `edges` is typically an expensive upstream build (the registered
    // queries derive it from a fact-table self-join + aggregate) and the
    // normalized frame feeds THREE consumers (degrees, orientation,
    // closing-edge probe): materialize it once, edge-sized scalar rows.
    val und = undirect(edges).localCheckpoint(true)
    val deg = degrees(und)
    val tris = triangleCorners(und, deg)
      .agg(count(lit(1)).as("n_triangles"))
    val degStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val edgeStats = und.agg(count(lit(1)).as("n_edges"))
    degStats
      .crossJoin(broadcast(edgeStats))
      .crossJoin(broadcast(tris))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise(round(lit(3.0) * col("n_triangles") / col("n_wedges"),
            6)).as("clustering"))
  }

  /** Per-node view: (node, deg, n_triangles, local_clustering) — each
    * triangle credits its three corners; local clustering =
    * 2·t_v / (deg_v·(deg_v − 1)), 0 for degree-<2 nodes. The Watts-
    * Strogatz per-node cohesion signal (ego-net density). */
  def localClustering(edges: DataFrame): DataFrame = {
    // same one-execution normalization as [[triangleStats]]
    val und = undirect(edges).localCheckpoint(true)
    val deg = degrees(und)
    val perNode = triangleCorners(und, deg)
      .select(explode_outer(array(col("u"), col("x"), col("y")))
        .as("node"))
      .where(col("node").isNotNull)
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .select(col("node"), col("deg"), col("n_triangles"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(round(lit(2.0) * col("n_triangles")
            / (col("deg") * (col("deg") - 1)), 6))
          .as("local_clustering"))
  }
}
