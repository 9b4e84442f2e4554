package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

/** Distributed as-of join — for each left row, the latest right row with
  * `rightTs <= leftTs` in the same key group (time-series point-in-time
  * enrichment). Spark has no native ASOF join; the reference has none
  * either — this is a SURVEY.md §7.4(a) "compose existing ops" operator:
  * the union-and-carry-forward formulation used by every distributed
  * engine that lacks the physical operator.
  *
  * Shape: union both sides tagged, ONE shuffle on the keys, one
  * in-partition sort by (ts, side), then last_value(ignoreNulls) carries
  * the most recent right values forward onto each left row. No join
  * explosion, no per-left-row range scan; state is one row of carried
  * values per partition stream — the same asymptotics as a merge as-of.
  *
  * Right rows must be unique per (keys, rightTs) for deterministic output
  * (pre-aggregate the right side; ties inside a timestamp are otherwise
  * engine-defined — DuckDB ASOF picks an arbitrary one).
  */
object AsOf {

  /** Native-operator variant: same semantics as [[asOfJoin]], planned as
    * graft's custom [[graft.plans.AsOfJoinExec]] (sort-merge, O(1) carried
    * state — see the Scaladoc there). Requires
    * [[graft.plans.GraftExtensions]] on the session. The right side is
    * internally re-aliased so self-derived frames (both sides projected
    * from the same source) do not collide on expression ids. */
  def asOfJoinNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     rightValCols: Seq[String]): DataFrame = {
    import graft.plans.AsOfJoinNode
    import org.apache.spark.sql.graft.Bridge
    // fresh exprIds on the right (self-join safety)
    val r2 = right.toDF(right.columns.toIndexedSeq.map("__r_" + _): _*)
    val lPlan = Bridge.analyzedPlan(left)
    val rPlan = Bridge.analyzedPlan(r2)
    def lAttr(n: String) = lPlan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"left column not found: $n"))
    def rAttr(n: String) = rPlan.output.find(_.name == "__r_" + n).getOrElse(
      throw new IllegalArgumentException(s"right column not found: $n"))
    val node = AsOfJoinNode(lPlan, rPlan,
      keys.map(lAttr), keys.map(rAttr), lAttr(leftTs), rAttr(rightTs),
      rightValCols.map(rAttr))
    Bridge.ofRows(left.sparkSession, node)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightValCols.map(c => col("__r_" + c).as(c)): _*)
  }

  /** @param rightValCols right columns carried onto left rows (must not
    *                     collide with left column names)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightValCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightSchema = right.schema

    def nullOf(f: StructField) = lit(null).cast(f.dataType)

    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__isR", lit(0))
      .select((leftCols.map(col) :+ col("__t") :+ col("__isR")) ++
        rightValCols.map(c =>
          nullOf(rightSchema(c)).as(c)): _*)
    val r = right
      .withColumn("__t", col(rightTs))
      .withColumn("__isR", lit(1))
      .select((leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__t") :+ col("__isR")) ++ rightValCols.map(col): _*)

    // right rows sort BEFORE left rows at equal ts (isR desc) so an exact
    // timestamp match is visible to the left row (l.ts >= r.ts semantics).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightValCols.foldLeft(l.unionByName(r)) { case (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .where(col("__isR") === 0)
      .drop("__t", "__isR")
  }

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `rightTs >= leftTs` in the key group — next-event attribution (the
    * mirror of [[asOfJoin]]'s latest-preceding semantics). Identical
    * union-and-carry shape, iterated in DESCENDING time order; right rows
    * still sort before left rows at equal ts so exact matches are seen. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightValCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightSchema = right.schema
    def nullOf(f: StructField) = lit(null).cast(f.dataType)
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__isR", lit(0))
      .select((leftCols.map(col) :+ col("__t") :+ col("__isR")) ++
        rightValCols.map(c => nullOf(rightSchema(c)).as(c)): _*)
    val r = right
      .withColumn("__t", col(rightTs))
      .withColumn("__isR", lit(1))
      .select((leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__t") :+ col("__isR")) ++ rightValCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightValCols.foldLeft(l.unionByName(r)) { case (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .where(col("__isR") === 0)
      .drop("__t", "__isR")
  }

  /** Nearest as-of: the right row closest in time on EITHER side (tie →
    * the preceding one). One shuffle on the keys; the backward and
    * forward carries are two window passes over the same partitioning
    * (second pass re-sorts in-partition, no extra exchange), then a
    * per-row distance pick. */
  def asOfJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightValCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val leftCols = left.columns.toSeq
    val rightSchema = right.schema
    // reject BEFORE any plan construction: analysis (union coercion) is
    // eager and would otherwise throw its own, less actionable error
    def isTime(dt: org.apache.spark.sql.types.DataType) = dt match {
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    require(
      isTime(left.schema(leftTs).dataType) == isTime(rightSchema(rightTs).dataType),
      s"asOfJoinNearest: leftTs '$leftTs' (${left.schema(leftTs).dataType}) and " +
        s"rightTs '$rightTs' (${rightSchema(rightTs).dataType}) must both be " +
        "timestamps or both be numeric — their distance is otherwise undefined")
    def nullOf(f: StructField) = lit(null).cast(f.dataType)
    val vals = rightValCols :+ "__rts"
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__isR", lit(0))
      .select((leftCols.map(col) :+ col("__t") :+ col("__isR")) ++
        rightValCols.map(c => nullOf(rightSchema(c)).as(c)) :+
        nullOf(rightSchema(rightTs)).as("__rts"): _*)
    val r = right
      .withColumn("__t", col(rightTs))
      .withColumn("__isR", lit(1))
      .select((leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__t") :+ col("__isR")) ++
        rightValCols.map(col) :+ col(rightTs).as("__rts"): _*)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all backward carries first, then all forward: adjacent same-spec
    // window expressions collapse into ONE Window operator each
    // (interleaving b/f would defeat CollapseWindow -> 2N sorts).
    val u = l.unionByName(r)
    val withB = vals.foldLeft(u)((df, c) =>
      df.withColumn(s"__b_$c", last(col(c), ignoreNulls = true).over(wB)))
    val withF = vals.foldLeft(withB)((df, c) =>
      df.withColumn(s"__f_$c", last(col(c), ignoreNulls = true).over(wF)))
    // exact micros for timestamps; plain numeric distance otherwise.
    // The conversion is derived PER COLUMN from the unioned schema (union
    // coercion has already reconciled each side's contribution); the
    // timestamp-vs-numeric mix was rejected up front.
    def num(c: org.apache.spark.sql.Column, dt: org.apache.spark.sql.types.DataType) =
      dt match {
        case TimestampType => unix_micros(c)
        case TimestampNTZType => unix_micros(c.cast("timestamp"))
        case _ => c.cast("double")
      }
    val tDt = withF.schema("__t").dataType
    val rtsDt = withF.schema("__b___rts").dataType
    val db = num(col("__t"), tDt) - num(col("__b___rts"), rtsDt)
    val df_ = num(col("__f___rts"), rtsDt) - num(col("__t"), tDt)
    val useB = col("__b___rts").isNotNull &&
      (col("__f___rts").isNull || db <= df_)
    rightValCols.foldLeft(withF.where(col("__isR") === 0)) { (d, c) =>
        d.withColumn(c, when(useB, col(s"__b_$c")).otherwise(col(s"__f_$c")))
      }
      .select(leftCols.map(col) ++ rightValCols.map(col): _*)
  }
}
