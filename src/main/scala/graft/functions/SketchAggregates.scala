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
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary over a string column — the heavy-
  * hitters sketch (Misra & Gries '82; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12).
  *
  * Why a sketch (SURVEY.md §7.4 escalation (b)): the exact formulation
  * (`groupBy(token).count.orderBy.limit`) shuffles the ENTIRE vocabulary —
  * at 100 TB of text that is billions of distinct grouping keys through the
  * exchange just to keep 20. This aggregate keeps a bounded `capacity`-entry
  * map per partition, merges maps pairwise, and moves only
  * O(partitions × capacity) tiny buffers — no vocabulary-wide shuffle
  * exists in the plan.
  *
  * Guarantees (capacity c, stream size N): every item with true frequency
  * > N/c is retained, and each reported estimate is an UNDER-count within
  * [true − N/c, true]. Items below the threshold may appear with small
  * counts — callers take the top-k they need. Estimates (not membership)
  * can vary with partition merge order; treat counts as bounded
  * approximations, not exact values (same contract as approx_count_distinct
  * / approx_percentile — the engine-specific sketch family).
  *
  * Null inputs are ignored. Result: array<struct<item string, est long>>
  * sorted by estimate desc then item asc (deterministic given the final
  * map).
  */
case class FrequentItemsSketch(child: Expression, capacity: Int,
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, s"freq_items capacity must be positive: $capacity")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"freq_items expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < capacity => buf.update(item, 1L)
      case None =>
        // classic MG step: a full summary and an untracked arrival decrement
        // every counter; zeros free their slots.
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // mergeable-summaries step: subtract the (capacity+1)-th largest
      // count from everything; at most `capacity` survive.
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - m)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  // length-prefixed UTF-8, NOT writeUTF: writeUTF throws
  // UTFDataFormatException past 65535 bytes, so one pathological token
  // would fail the job at partial-aggregate shuffle time.
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FrequentItemsSketch = copy(child = c.head)
}

object SketchAggregates {

  /** Column entry point: Misra-Gries heavy hitters with `capacity` tracked
    * slots. Take the top-k (k << capacity) from the result array. */
  def freqItems(c: Column, capacity: Int): Column =
    Bridge.column(
      FrequentItemsSketch(Bridge.expression(c), capacity).toAggregateExpression())

  /** Merge two already-evaluated Misra-Gries summaries — the same
    * Agarwal-et-al. rule as [[FrequentItemsSketch.merge]], exposed for
    * DRIVER-side summary maintenance (the stats sidecar merges a stored
    * summary with a delta batch's summary on append; error bounds add:
    * capacity c over N₁+N₂ total rows still under-counts by ≤ (N₁+N₂)/c).
    * Result sorted by estimate desc then item asc, ≤ capacity entries. */
  def mgMerge(a: Seq[(String, Long)], b: Seq[(String, Long)],
              capacity: Int): Seq[(String, Long)] = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val m = mutable.HashMap.empty[String, Long]
    (a.iterator ++ b.iterator).foreach { case (k, c) =>
      m.update(k, m.getOrElse(k, 0L) + c)
    }
    if (m.size > capacity) {
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      m.filterInPlace((_, c) => c - cut > 0)
      m.mapValuesInPlace((_, c) => c - cut)
    }
    m.toSeq.sortBy { case (item, est) => (-est, item) }
  }
}
