package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge

/** Explicit bloom-filter join pruning — the "runtime filter" / semi-join
  * reduction that keeps a 100 TB fact scan from shuffling rows that cannot
  * possibly match the (filtered) dimension side.
  *
  * The reference joins its full stream table against the user dimension
  * with no pre-reduction (reference: dags/etl/kpi_processor.py:69-74 —
  * pandas merge of the whole frame). At warehouse scale the standard fix
  * is: aggregate the SMALL (filtered) side's join keys into a bloom
  * filter, broadcast it, and filter the BIG side *before* the shuffle /
  * join — no false negatives, so `prunedInnerJoin` returns exactly the
  * plain join's rows; false positives only cost wasted shuffle, bounded
  * by `fpp`.
  *
  * Spark-first notes: Catalyst's own `InjectRuntimeFilter` does this
  * automatically, but only within one query plan, behind
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, and only when its
  * selectivity heuristics fire. This operator is the EXPLICIT form: the
  * bloom build is a one-row aggregate attached as a scalar subquery (the
  * exact shape `InjectRuntimeFilter` emits), so it composes with any
  * downstream plan, survives into cached/bucketed intermediates, and can
  * prune a scan feeding a different query than the one that built it.
  * Both sides hash with `xxhash64` (codegen'd); the filter itself is
  * Spark's `util.sketch.BloomFilter` via the native
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions — no
  * UDFs, no driver-side collect (the subquery result is broadcast by the
  * engine).
  */
object BloomJoin {

  /** Optimal bloom bit count for `n` items at false-positive rate `fpp`
    * (standard formula: -n·ln p / ln²2). */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n > 0, 0 < fpp < 1: $n, $fpp")
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** One-row DataFrame holding the bloom filter of `xxhash64(key)` over
    * `df` as a binary column `bloom`. Partial-aggregated: each partition
    * builds a local filter, merge is a bitwise OR. */
  def bloomBuild(df: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double = 0.03): DataFrame =
    df.select(Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(xxhash64(key)),
        Literal(expectedItems),
        Literal(optimalNumBits(expectedItems, fpp))).toAggregateExpression())
      .as("bloom"))

  /** The membership probe itself, as a boolean column — for callers
    * that need the verdict rather than the filter (e.g. per-row "seen"
    * flags feeding an aggregate). Same subquery attachment as
    * [[prune]]: the bloom is computed once, broadcast, and the probe
    * stays inside whole-stage codegen. No false negatives; false
    * positives within the build's `fpp`. */
  def mightContain(key: Column, bloom: DataFrame): Column =
    Bridge.column(BloomFilterMightContain(
      ScalarSubquery(Bridge.analyzedPlan(bloom)),
      Bridge.expression(xxhash64(key))))

  /** Filter `big` to rows whose `key` *might* be in the bloom built by
    * [[bloomBuild]] — attached as a scalar subquery, so the bloom is
    * computed once, broadcast, and the predicate stays inside whole-stage
    * codegen on the big side. Guaranteed superset of the true matches. */
  def prune(big: DataFrame, key: Column, bloom: DataFrame): DataFrame =
    big.where(mightContain(key, bloom))

  /** Inner equi-join with bloom pre-reduction of the big side: exactly
    * `big.join(small, big(bigKey) === small(smallKey))`, but rows of `big`
    * that cannot match are dropped before the join's shuffle. Use when
    * `small` is too big to broadcast-join outright (else Spark's broadcast
    * hash join already prunes) yet its key set fits a few MB of bloom
    * bits — the classic selective-dimension × huge-fact shape. `small` is
    * evaluated twice (bloom build + join side) — deliberate: it is the
    * cheap side by precondition, and the payoff is shuffling a fraction
    * of the expensive side. Persist `small` if its lineage is itself
    * costly. */
  def prunedInnerJoin(big: DataFrame, bigKey: String,
                      small: DataFrame, smallKey: String,
                      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val pruned = prune(big, col(bigKey), bloomBuild(small, col(smallKey),
      expectedItems, fpp))
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }
}
