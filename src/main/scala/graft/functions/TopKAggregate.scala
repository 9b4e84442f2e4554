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
  * Deterministic total order: value DESC, then id ASC on ties — results
  * are exactly reproducible and engine-comparable (unlike heap-based
  * top-k with nondeterministic tie survival). Null values or ids are
  * skipped. Result: array<struct<v double, id long>> sorted best-first.
  */
case class TopKByDouble(valueExpr: Expression, idExpr: Expression, k: Int,
                        distinctIds: Boolean = false,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

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
  // buffer doubles past k — O(n log k) total, no per-row sorting.
  // distinctIds additionally keeps ONE entry per id (the best — and
  // when every sighting of an id carries the same value, as the kNN
  // graph's deterministic rounded cosines do, dedup is exact): the
  // top-k then never wastes slots on duplicate sightings, which lets
  // pair-generating callers drop their pair-level dropDuplicates —
  // a whole unspillable hash-aggregation map per stage — entirely.
  private def compact(buf: mutable.ArrayBuffer[(Double, Long)]): Unit =
    if (buf.length > k) {
      val ordered = buf.sortWith(beats)
      if (distinctIds && TopKByDouble.checkDistinctContract)
        assertDistinctContract(ordered)
      val best = (if (distinctIds) ordered.distinctBy(_._2) else ordered)
        .take(k)
      buf.clear()
      buf ++= best
    }

  // Debug-only contract check (-Dgraft.topk.checkDistinctContract=true,
  // on in the test harness): distinctIds is equivalent to
  // dedup-then-top-k ONLY when every sighting of an id carries an
  // identical value — a caller violating that silently gets
  // best-value-per-id semantics. Best-effort by design: a conflicting
  // sighting already trimmed below an earlier compaction's top-k is
  // gone before any pair meets; the check exists to catch contract
  // violations in tests, not to police production (where it stays off
  // and costs nothing).
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

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Double, Long)],
                      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null) {
      buf += ((v.asInstanceOf[Double], id.asInstanceOf[Long]))
      if (buf.length >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[(Double, Long)],
                     b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    a ++= b
    compact(a)
    a
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any = {
    // compact() is a no-op at <= k entries, so a small buffer can still
    // hold duplicate ids here — dedup unconditionally before emitting
    val sorted0 = buf.sortWith(beats)
    if (distinctIds && TopKByDouble.checkDistinctContract)
      assertDistinctContract(sorted0)
    val sorted = (if (distinctIds) sorted0.distinctBy(_._2) else sorted0)
      .take(k)
    new GenericArrayData(sorted.map { case (v, id) => InternalRow(v, id) })
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
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
