package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.{JoinSizeSketch, SketchAggregates}

/** Skew-aware, stats-driven join planning — the unified four-way rule
  * that [[EstimatedJoin]] (broadcast / bloom / merge from AGMS sketches)
  * and [[Skew.saltedJoin]] (the straggler fix) each cover half of.
  *
  * Motivation: [[Skew]]'s fixture twins MEASURED the salted join 2.5×
  * faster than plain sort-merge on a 30 %-hot-key input, but choosing it
  * still required the user to know their key distribution. The
  * distribution is itself cheap planner statistics: a Misra-Gries
  * heavy-hitters summary ([[graft.functions.FrequentItemsSketch]]) is one
  * map-side-combining aggregate with an O(capacity) result, and any key
  * whose share exceeds 1/capacity is guaranteed to surface. This
  * operator consults it — alongside the AGMS join-size estimate — the
  * way [[EstimatedJoin]] consults size stats, closing the last manual
  * step in the skew story.
  *
  * Decision rule, in priority order (fact `big` ⋈ dimension `small`,
  * inner equi-join on a shared key name — [[Skew.saltedJoin]]'s
  * contract):
  *
  *  1. `broadcast_small` — the dim fits the broadcast threshold and the
  *     AGMS estimate shows no fan-out explosion. No shuffle at all beats
  *     every salted shuffle; a broadcast hash probe streams the hot key,
  *     so skew is moot (Skew.saltedJoin's own scaladoc).
  *  2. `salted` — some big-side key's share ≥ `hotShareThreshold`. A hot
  *     key serializes one reducer REGARDLESS of output selectivity, so
  *     the skew arm outranks bloom: pruning cannot split a straggler,
  *     salting can. Salt count is sized from the measured share —
  *     `ceil(maxShare × shufflePartitions)` spreads the hot key to
  *     roughly the fair per-reducer share — then clamped to
  *     [2, maxSalts] (the replicate-×-salts cost on the dim side is the
  *     price, so no more salts than the share warrants).
  *  3. `bloom_merge` — the AGMS estimate says the join is selective
  *     (output ≤ bloomSelectivity × big rows): bloom-prune the big side
  *     before its shuffle ([[BloomJoin]]).
  *  4. `shuffle_merge` — the honest default.
  *
  * The share from a Misra-Gries estimate is an UNDER-count by at most
  * rows/capacity, so a key at the threshold needs
  * `hotShareThreshold ≥ 1/capacity + margin` to trigger reliably; the
  * defaults (0.10 vs 1/64 ≈ 0.016) leave 6× margin. An undercount can
  * only make the planner pick a non-salted arm — every arm is
  * result-identical, so stats error degrades speed, never answers
  * (same posture as [[EstimatedJoin]]).
  *
  * Cost: one answer-sized aggregate per side (count + AGMS sketch, plus
  * the heavy-hitter summary on the big side). At warehouse scale both
  * live in the stats sidecar instead —
  * [[graft.sources.VersionedStats.adaptiveVersionedJoin]] plans from
  * STORED stats with zero pre-join scans.
  */
object AdaptiveJoin {

  /** One side's planner statistics. `hh` is sorted by estimate
    * descending (the aggregate's eval order); empty when not measured
    * (dim side). */
  final case class SideStats(rows: Long, sketch: Seq[Long],
                             hh: Seq[(String, Long)])

  /** The decision and everything that drove it (plan-audit trail, same
    * role as [[EstimatedJoin.JoinEstimate]]). `hotKey`/`hotShare` are
    * the biggest measured heavy hitter on the big side; `salts` is 0
    * unless the salted arm was chosen. */
  final case class AdaptiveDecision(rowsBig: Long, rowsSmall: Long,
                                    estJoinRows: Long,
                                    hotKey: Option[String], hotShare: Double,
                                    salts: Int, strategy: String)

  /** Measure one side in a single aggregate pass: row count, AGMS
    * sketch, and (when `hhCapacity` > 0) the Misra-Gries heavy-hitter
    * summary. The key is hashed/summarized as its canonical string form
    * — the summary sizes salts and labels the audit trail, it never
    * filters data, so the cast is lossless for planning. */
  def measure(df: DataFrame, key: String, counters: Int = 256,
              hhCapacity: Int = 64): SideStats = {
    val base = Seq(
      count(lit(1)).as("n"),
      JoinSizeSketch.agmsSketch(col(key), counters).as("sk"))
    val aggs =
      if (hhCapacity > 0)
        base :+ SketchAggregates.freqItems(col(key).cast("string"),
          hhCapacity).as("hh")
      else base
    val r: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val hh =
      if (hhCapacity > 0)
        r.getSeq[Row](2).map(x => (x.getString(0), x.getLong(1)))
      else Seq.empty
    SideStats(r.getLong(0), r.getSeq[Long](1), hh)
  }

  /** The four-way rule alone, from an already-known output estimate and
    * hot share — [[EstimatedJoin.estimatedMultiJoin]] calls this with
    * selectivity-SCALED estimates. Returns (strategy, salts). */
  def decide(estJoinRows: Long, rowsBig: Long, rowsSmall: Long,
             hotShare: Double,
             broadcastMaxRows: Long = 10000000L,
             fanoutCap: Double = 4.0,
             bloomSelectivity: Double = 0.1,
             hotShareThreshold: Double = 0.10,
             shufflePartitions: Int = 32,
             maxSalts: Int = 64): (String, Int) = {
    require(hotShareThreshold > 0 && hotShareThreshold <= 1,
      s"hot-share threshold must be in (0,1]: $hotShareThreshold")
    require(shufflePartitions > 0 && maxSalts >= 2,
      s"need positive partitions and maxSalts >= 2: $shufflePartitions, $maxSalts")
    val strategy =
      if (rowsSmall <= broadcastMaxRows &&
        estJoinRows <= fanoutCap * math.max(1L, rowsBig)) "broadcast_small"
      else if (hotShare >= hotShareThreshold) "salted"
      else if (estJoinRows <= bloomSelectivity * math.max(1L, rowsBig))
        "bloom_merge"
      else "shuffle_merge"
    val salts =
      if (strategy == "salted")
        math.min(maxSalts,
          math.max(2, math.ceil(hotShare * shufflePartitions).toInt))
      else 0
    (strategy, salts)
  }

  /** Pure decision from already-known statistics — the stored-stats path
    * calls this directly. */
  def plan(big: SideStats, small: SideStats,
           broadcastMaxRows: Long = 10000000L,
           fanoutCap: Double = 4.0,
           bloomSelectivity: Double = 0.1,
           hotShareThreshold: Double = 0.10,
           shufflePartitions: Int = 32,
           maxSalts: Int = 64): AdaptiveDecision = {
    val est = JoinSizeSketch.estimate(big.sketch, small.sketch)
    val hot = big.hh.headOption
    val hotShare = hot match {
      case Some((_, c)) if big.rows > 0 => c.toDouble / big.rows
      case _ => 0.0
    }
    val (strategy, salts) = decide(est, big.rows, small.rows, hotShare,
      broadcastMaxRows, fanoutCap, bloomSelectivity, hotShareThreshold,
      shufflePartitions, maxSalts)
    AdaptiveDecision(big.rows, small.rows, est, hot.map(_._1), hotShare,
      salts, strategy)
  }

  /** Materialize a decision. Every arm returns the SAME rows and columns
    * (big columns then small's non-key columns, one copy of the key) —
    * strategy choice can never change the answer. Inner joins only: the
    * bloom and salted arms both require it. */
  def applyDecision(big: DataFrame, small: DataFrame, key: String,
                    d: AdaptiveDecision): DataFrame = d.strategy match {
    case "broadcast_small" => big.join(broadcast(small), Seq(key))
    case "salted" => Skew.saltedJoin(big, small, key, d.salts)
    case "bloom_merge" =>
      BloomJoin.prune(big, col(key),
          BloomJoin.bloomBuild(small, col(key),
            expectedItems = math.max(1L, d.rowsSmall)))
        .join(small, Seq(key))
    case _ => big.join(small.hint("SHUFFLE_MERGE"), Seq(key))
  }

  /** Measure both sides, decide, join. Returns the joined frame plus the
    * decision that shaped it. `shufflePartitions` ≤ 0 (the default)
    * resolves to the session's `spark.sql.shuffle.partitions` — salt
    * sizing should track the real reducer count. */
  def adaptiveJoin(big: DataFrame, small: DataFrame, key: String,
                   broadcastMaxRows: Long = 10000000L,
                   fanoutCap: Double = 4.0,
                   bloomSelectivity: Double = 0.1,
                   hotShareThreshold: Double = 0.10,
                   shufflePartitions: Int = 0,
                   maxSalts: Int = 64,
                   counters: Int = 256,
                   hhCapacity: Int = 64): (DataFrame, AdaptiveDecision) = {
    val parts =
      if (shufflePartitions > 0) shufflePartitions
      else big.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val bs = measure(big, key, counters, hhCapacity)
    val ss = measure(small, key, counters, hhCapacity = 0)
    val d = plan(bs, ss, broadcastMaxRows, fanoutCap, bloomSelectivity,
      hotShareThreshold, parts, maxSalts)
    (applyDecision(big, small, key, d), d)
  }
}
