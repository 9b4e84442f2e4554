package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k-per-group as ONE aggregation pass — the scale-correct
  * replacement for `row_number() OVER (PARTITION BY g ORDER BY v) <= k`.
  *
  * Why (SURVEY.md §7.4 escalation (b)): the window form shuffles EVERY row
  * of every group to its group's reducer and sorts there (Spark's
  * WindowGroupLimit prunes the sort's output, not the exchange's input).
  * This aggregate keeps at most 2k entries per group per partition,
  * map-side combines, and ships only O(groups × k) tuples through the
  * exchange — at 100 TB the shuffle shrinks from the table size to the
  * answer size.
  *
  * Per-row cost (round 17, guide §1.2 step 2 — per-task work): the buffer
  * is a pair of PRIMITIVE arrays plus a running threshold — the k-th best
  * entry seen so far (post-dedup for [[TopKAggregate.topKByDistinct]]).
  * Once k entries are established, a candidate that loses to the
  * threshold is rejected with ONE comparison and ZERO allocation — the
  * common case for the ANN/retrieval pair streams this aggregate fronts
  * (millions of scored pairs per group funneling into a 3-36-entry
  * answer). The rejection is exact: the k entries that beat the
  * threshold can only ever be displaced by still-better entries, so a
  * loser can never re-enter the final top-k. Amortized compaction is
  * unchanged — append, re-sort + trim at 2k — so results are
  * bit-identical to the round-16 buffer on every input.
  *
  * Deterministic total order: value DESC, then id ASC on ties — results
  * are exactly reproducible and engine-comparable (unlike heap-based
  * top-k with nondeterministic tie survival). Null values or ids are
  * skipped. Result: array<struct<v double, id long>> sorted best-first.
  */
case class TopKByDouble(valueExpr: Expression, idExpr: Expression, k: Int,
                        distinctIds: Boolean = false,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByDouble.Buf] {

  import TopKByDouble.Buf

  require(k > 0, s"top_k_by k must be positive: $k")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (valueExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (v, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by expects (double, bigint), got (${v.catalogString}, ${i.catalogString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  // Spark-consistent double ordering (java.lang.Double.compare): NaN
  // sorts greatest (best under DESC), 0.0 > -0.0 — so results agree with
  // the row_number()-window form on every input, not just finite ones
  private def beats(x: (Double, Long), y: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(x._1, y._1)
    if (c != 0) c > 0 else x._2 < y._2
  }

  // amortized compaction: append freely, re-sort + trim whenever the
  // buffer fills to 2k — O(n log k) total, no per-row sorting.
  // distinctIds additionally keeps ONE entry per id (the best — and
  // when every sighting of an id carries the same value, as the kNN
  // graph's deterministic rounded cosines do, dedup is exact): the
  // top-k then never wastes slots on duplicate sightings, which lets
  // pair-generating callers drop their pair-level dropDuplicates —
  // a whole unspillable hash-aggregation map per stage — entirely.
  // After a compaction that leaves exactly k (post-dedup) entries, the
  // buffer's last entry IS the k-th best so far and becomes the
  // rejection threshold for later appends. Once established, the
  // distinct-entry count can never drop below k, so the threshold only
  // ever tightens.
  private def compact(buf: Buf): Unit =
    if (buf.len > k) {
      val ordered = mutable.ArrayBuffer.tabulate(buf.len)(i =>
        (buf.vs(i), buf.ids(i))).sortWith(beats)
      if (distinctIds && TopKByDouble.checkDistinctContract)
        assertDistinctContract(ordered)
      val best = (if (distinctIds) ordered.distinctBy(_._2) else ordered)
        .take(k)
      var i = 0
      while (i < best.length) {
        buf.vs(i) = best(i)._1; buf.ids(i) = best(i)._2; i += 1
      }
      buf.len = best.length
      if (buf.len == k) {
        buf.hasThreshold = true
        buf.tv = buf.vs(k - 1)
        buf.tid = buf.ids(k - 1)
      }
    }

  // Debug-only contract check (-Dgraft.topk.checkDistinctContract=true,
  // on in the test harness): distinctIds is equivalent to
  // dedup-then-top-k ONLY when every sighting of an id carries an
  // identical value — a caller violating that silently gets
  // best-value-per-id semantics. Best-effort by design: a conflicting
  // sighting already trimmed (or threshold-rejected) below an earlier
  // compaction's top-k is gone before any pair meets; the check exists
  // to catch contract violations in tests, not to police production
  // (where it stays off and costs nothing).
  private def assertDistinctContract(
      ordered: mutable.ArrayBuffer[(Double, Long)]): Unit = {
    val firstV = mutable.LongMap.empty[Double]
    ordered.foreach { case (v, id) =>
      val prev = firstV.getOrElseUpdate(id, v)
      if (java.lang.Double.compare(prev, v) != 0)
        throw new IllegalStateException(
          s"top_k_by(distinctIds) contract violation: id $id sighted " +
            s"with differing values $prev and $v — distinctIds keeps " +
            "the best value per id, which is dedup-equivalent only " +
            "when all sightings of an id agree")
    }
  }

  override def createAggregationBuffer(): Buf = new Buf(2 * k)

  private def append(buf: Buf, v: Double, id: Long): Unit = {
    if (buf.hasThreshold) {
      // reject iff the threshold strictly beats the candidate: the k
      // (distinct) entries at or above it persist to the end, so the
      // candidate can never enter the final top-k. Ties with the
      // threshold entry itself (same v AND same id — a duplicate
      // sighting) pass through and dedup at the next compaction.
      val c = java.lang.Double.compare(buf.tv, v)
      if (c > 0 || (c == 0 && buf.tid < id)) return
    }
    buf.ensureRoom()
    buf.vs(buf.len) = v
    buf.ids(buf.len) = id
    buf.len += 1
    if (buf.len == buf.cap) compact(buf)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      append(buf, v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < b.len) { append(a, b.vs(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: Buf): Any = {
    // compact() is a no-op at <= k entries, so a small buffer can still
    // hold duplicate ids here — dedup unconditionally before emitting
    val sorted0 = mutable.ArrayBuffer.tabulate(buf.len)(i =>
      (buf.vs(i), buf.ids(i))).sortWith(beats)
    if (distinctIds && TopKByDouble.checkDistinctContract)
      assertDistinctContract(sorted0)
    val sorted = (if (distinctIds) sorted0.distinctBy(_._2) else sorted0)
      .take(k)
    new GenericArrayData(sorted.map { case (v, id) => InternalRow(v, id) })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.len)
    var i = 0
    while (i < buf.len) {
      out.writeDouble(buf.vs(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf(2 * k)
    var i = 0
    while (i < n) {
      buf.ensureRoom()
      buf.vs(i) = in.readDouble(); buf.ids(i) = in.readLong(); i += 1
      buf.len = i
    }
    // threshold stays UNSET deliberately: a deserialized buffer is only
    // ever the SOURCE side of merge() (Spark's object aggregation
    // accumulates into a createAggregationBuffer() target), so its
    // threshold is never consulted — and restoring one from the bytes
    // would be wrong anyway: a buffer serialized at len == k never
    // compacted, so its entries are in INSERTION order (and may still
    // carry duplicate ids under distinctIds) — entry k-1 is not the
    // k-th best. The target re-establishes its own threshold at its
    // next compaction.
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByDouble =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByDouble =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByDouble =
    copy(valueExpr = c(0), idExpr = c(1))
}

object TopKByDouble {
  /** Primitive-array aggregation buffer: parallel (value, id) arrays
    * grown by doubling up to capacity 2k, plus the live rejection
    * threshold (the k-th best entry after the latest compaction that
    * held k). Growth is lazy because a map-side partial aggregation
    * holds ONE buffer per distinct group in its partition — for
    * many-group partitions most buffers stay at a handful of entries,
    * and eagerly sizing each to 2k would multiply the per-partition
    * footprint by k. */
  final class Buf(val cap: Int) {
    var vs: Array[Double] = new Array[Double](math.min(cap, 8))
    var ids: Array[Long] = new Array[Long](math.min(cap, 8))
    var len: Int = 0
    var hasThreshold: Boolean = false
    var tv: Double = 0.0
    var tid: Long = 0L

    def ensureRoom(): Unit =
      if (len == vs.length && len < cap) {
        val next = math.min(cap, vs.length * 2)
        vs = java.util.Arrays.copyOf(vs, next)
        ids = java.util.Arrays.copyOf(ids, next)
      }
  }

  /** Read per call, not cached at class load: the test harness sets the
    * property in its constructor and suite/class init order must not
    * matter. Boolean.getBoolean is a map lookup — noise next to the
    * sort the checked path just ran. */
  private[functions] def checkDistinctContract: Boolean =
    java.lang.Boolean.getBoolean("graft.topk.checkDistinctContract")
}

object TopKAggregate {

  /** Column entry point: top-k (value DESC, id ASC) pairs per group as
    * array<struct<v, id>>. */
  def topKBy(value: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByDouble(
      Bridge.expression(value), Bridge.expression(id), k)
      .toAggregateExpression())

  /** [[topKBy]] keeping ONE entry per id (best value wins; exact when
    * every sighting of an id carries the same value) — the in-aggregate
    * dedup that replaces a pair-level dropDuplicates: candidate streams
    * with repeated sightings fold straight into the bounded buffer, so
    * no stage ever holds an unspillable dedup hash map beside the
    * aggregate's (spillable) sort fallback. */
  def topKByDistinct(value: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByDouble(
      Bridge.expression(value), Bridge.expression(id), k,
      distinctIds = true)
      .toAggregateExpression())
}
