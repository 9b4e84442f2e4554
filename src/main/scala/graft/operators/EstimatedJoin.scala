package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.JoinSizeSketch

/** Sketch-driven join planning: the AGMS join-size estimate
  * ([[graft.functions.JoinSizeSketch]]) consulted BEFORE the join runs,
  * choosing the physical strategy the way a cost-based planner would —
  * but from a 256-counter sketch per side instead of full statistics.
  *
  * Decision rule (the two failure modes it guards against):
  *  - a side small enough to broadcast AND an output that does not
  *    explode → broadcast the smaller side (no fact-side shuffle);
  *  - everything else → explicit SHUFFLE_MERGE. The explosion guard is
  *    where the JOIN-SIZE estimate (not mere row counts) is
  *    load-bearing: a small dim with hot duplicated keys can pass any
  *    rows/bytes threshold yet fan the output out by orders of
  *    magnitude — sort-merge streams and spills that case, a broadcast
  *    hash probe amplifies it in memory.
  *
  * Cost posture: [[estimate]] runs one cheap aggregate per side (a
  * map-side-combining sketch + count, answer-sized result to the
  * driver — planner statistics, same justification as the IVF
  * quantizer sample). At warehouse scale the sketches would not be
  * computed on demand at all: they are element-wise mergeable, so each
  * table's sketch is maintained at write time and joins plan from
  * stored stats — [[estimateFromSketches]] is that entry point.
  */
object EstimatedJoin {

  final case class JoinEstimate(rowsLeft: Long, rowsRight: Long,
                                estJoinRows: Long, strategy: String)

  /** Pure decision from already-known statistics (stored table sketches
    * at scale; [[estimate]] computes them on demand). Three-way:
    * broadcast when a side fits and the output does not explode;
    * otherwise bloom-pruned merge when the estimate says the join is
    * SELECTIVE (output ≤ `bloomSelectivity` × the bigger side — few big
    * rows can match, so a bloom of the smaller side's keys drops the
    * rest before the shuffle); plain sort-merge for everything else. */
  def estimateFromSketches(sketchLeft: Seq[Long], rowsLeft: Long,
                           sketchRight: Seq[Long], rowsRight: Long,
                           broadcastMaxRows: Long,
                           fanoutCap: Double,
                           bloomSelectivity: Double = 0.1): JoinEstimate = {
    val est = JoinSizeSketch.estimate(sketchLeft, sketchRight)
    val small = math.min(rowsLeft, rowsRight)
    val big = math.max(rowsLeft, rowsRight)
    val strategy =
      if (small <= broadcastMaxRows && est <= fanoutCap * math.max(1L, big)) {
        if (rowsRight <= rowsLeft) "broadcast_right" else "broadcast_left"
      } else if (est <= bloomSelectivity * big) "bloom_merge"
      else "shuffle_merge"
    JoinEstimate(rowsLeft, rowsRight, est, strategy)
  }

  /** Sketch both sides and decide. One aggregate job per side. */
  def estimate(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               broadcastMaxRows: Long = 10000000L,
               fanoutCap: Double = 4.0,
               counters: Int = 256): JoinEstimate = {
    def side(df: DataFrame, key: String): (Seq[Long], Long) = {
      val r: Row = df.agg(
        JoinSizeSketch.agmsSketch(col(key), counters).as("s"),
        count(lit(1)).as("n")).head()
      (r.getSeq[Long](0), r.getLong(1))
    }
    val (sl, nl) = side(left, leftKey)
    val (sr, nr) = side(right, rightKey)
    estimateFromSketches(sl, nl, sr, nr, broadcastMaxRows, fanoutCap)
  }

  /** The join, with the sketch-chosen strategy applied as a plan hint.
    * Returns the joined frame plus the estimate that chose its shape
    * (load accounting + plan audit). */
  def estimatedJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    joinType: String = "inner",
                    broadcastMaxRows: Long = 10000000L,
                    fanoutCap: Double = 4.0,
                    counters: Int = 256): (DataFrame, JoinEstimate) = {
    val e = estimate(left, right, leftKey, rightKey,
      broadcastMaxRows, fanoutCap, counters)
    (applyStrategy(left, right, leftKey, rightKey, joinType, e), e)
  }

  /** Materialize a [[JoinEstimate]]'s decision as the physical plan —
    * shared by the on-demand path above and the stored-stats path
    * ([[graft.sources.VersionedStats.estimatedVersionedJoin]]). */
  def applyStrategy(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    joinType: String, e: JoinEstimate): DataFrame = {
    val cond = left(leftKey) === right(rightKey)
    e.strategy match {
      case "broadcast_right" => left.join(broadcast(right), cond, joinType)
      case "broadcast_left" => broadcast(left).join(right, cond, joinType)
      // bloom pruning drops non-matching rows of the BIG side before
      // its shuffle — sound only for inner joins (an outer join must
      // keep them); non-inner falls through to plain sort-merge
      case "bloom_merge" if joinType == "inner" =>
        val bloomed =
          if (e.rowsRight <= e.rowsLeft)
            BloomJoin.prunedInnerJoin(left, leftKey, right, rightKey,
              expectedItems = math.max(1L, e.rowsRight))
          else
            BloomJoin.prunedInnerJoin(right, rightKey, left, leftKey,
              expectedItems = math.max(1L, e.rowsLeft))
        // restore left-then-right column order regardless of which side
        // was pruned (column names are distinct by this API's contract:
        // the condition references each side's own key name)
        bloomed.select((left.columns ++ right.columns).map(col).toSeq: _*)
      case _ => left.join(right.hint("SHUFFLE_MERGE"), cond, joinType)
    }
  }
}
