package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.DataType

/** Collect aggregates whose BUFFER is bounded, not just their output.
  *
  * Every bucket-collect family (jaccard/minhash/winnowing/simhash/fuzzy
  * pair-gen, span occurrence lists, contamination doc sets) drops
  * over-cap buckets with a `count <= maxBucket` filter — but a plain
  * `collect_set`/`collect_list` still MATERIALIZES the whole hot bucket
  * in its aggregation buffer before that filter reads the count. At
  * 100 TB a stop-shingle shared by 10⁸ docs would build a 10⁸-element
  * buffer on one reducer (and on every map-side partial) only to be
  * thrown away.
  *
  * These variants stop growing at `cap` elements: update and merge are
  * no-ops once the buffer is full. For any group the caller KEEPS
  * (count <= cap), the buffer never fills, so the result is
  * element-for-element identical to the uncapped aggregate — the
  * truncation only ever touches groups the cap-filter discards, whose
  * content is never read. That equivalence is what keeps the DuckDB
  * oracles (which run plain uncapped SQL) hash-identical.
  *
  * Buffers inherit [[Collect]]'s generic element serialization, so any
  * child type the built-ins support works here.
  */
object BoundedCollect {

  case class CollectListCapped(child: Expression, cap: Int,
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
    extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

    require(cap > 0, s"collect_list_capped cap must be positive: $cap")

    override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
      mutable.ArrayBuffer.empty

    override def convertToBufferElement(value: Any): Any =
      InternalRow.copyValue(value)

    override protected lazy val bufferElementType: DataType = child.dataType

    override def update(buffer: mutable.ArrayBuffer[Any],
                        input: InternalRow): mutable.ArrayBuffer[Any] =
      if (buffer.length >= cap) buffer else super.update(buffer, input)

    override def merge(buffer: mutable.ArrayBuffer[Any],
                       other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
      val room = cap - buffer.length
      if (room > 0) buffer ++= other.take(room)
      buffer
    }

    override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
      new GenericArrayData(buffer.toSeq)

    override def prettyName: String = "collect_list_capped"
    override def withNewMutableAggBufferOffset(o: Int): CollectListCapped =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CollectListCapped =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): CollectListCapped =
      copy(child = c)
  }

  case class CollectSetCapped(child: Expression, cap: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends Collect[mutable.HashSet[Any]] with UnaryLike[Expression] {

    require(cap > 0, s"collect_set_capped cap must be positive: $cap")

    override def createAggregationBuffer(): mutable.HashSet[Any] =
      mutable.HashSet.empty

    override def convertToBufferElement(value: Any): Any =
      InternalRow.copyValue(value)

    override protected lazy val bufferElementType: DataType = child.dataType

    override def update(buffer: mutable.HashSet[Any],
                        input: InternalRow): mutable.HashSet[Any] =
      if (buffer.size >= cap) buffer else super.update(buffer, input)

    override def merge(buffer: mutable.HashSet[Any],
                       other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
      val it = other.iterator
      while (buffer.size < cap && it.hasNext) buffer += it.next()
      buffer
    }

    override def eval(buffer: mutable.HashSet[Any]): Any =
      new GenericArrayData(buffer.toSeq)

    override def prettyName: String = "collect_set_capped"
    override def withNewMutableAggBufferOffset(o: Int): CollectSetCapped =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CollectSetCapped =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): CollectSetCapped =
      copy(child = c)
  }

  /** collect_list that stops buffering past `cap` elements. Identical to
    * `collect_list` for every group with at most `cap` rows. */
  def collectListCapped(e: Column, cap: Int): Column =
    Bridge.column(CollectListCapped(Bridge.expression(e), cap)
      .toAggregateExpression())

  /** collect_set that stops buffering past `cap` distinct elements.
    * Identical to `collect_set` for every group with at most `cap`
    * distinct values (set iteration order is undefined either way —
    * pair callers sort downstream, exactly as with the built-in). */
  def collectSetCapped(e: Column, cap: Int): Column =
    Bridge.column(CollectSetCapped(Bridge.expression(e), cap)
      .toAggregateExpression())
}
