package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two float vectors.
  *
  * Why a custom Expression (SURVEY.md §7.4 escalation path (b)): the
  * built-in higher-order `aggregate`/`zip_with` formulation is correct but
  * evaluates its lambda INTERPRETED, outside whole-stage codegen — every
  * element access walks an expression tree. For N²-pair similarity scoring
  * that interpreter overhead dominates. This expression compiles to a tight
  * Java loop via doGenCode (and stays inside the surrounding
  * WholeStageCodegen span), while producing BIT-IDENTICAL results to the
  * fold formulation: elements are widened float→double and accumulated
  * left-to-right in index order, the same IEEE754 op sequence, so DuckDB
  * oracle comparability is unaffected.
  *
  * Null semantics match the higher-order fold: null array → null; any null
  * element → null. Lengths may differ; the shorter bound wins (callers
  * validate dimensions upstream).
  */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<float>, array<float>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  // A null ELEMENT also yields null, so nullability must include the
  // arrays' containsNull — and when elements CANNOT be null, the
  // generated code must not reference ev.isNull at all: nullSafeCodeGen's
  // non-nullable branch never declares it, janino rejects the undeclared
  // name, and the whole projection silently drops to the interpreter
  // (the round-11 text_knn_hashed fallback).
  private def elemsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })
  override def nullable: Boolean =
    !childrenResolved || left.nullable || right.nullable || elemsNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  // Local names MUST be freshName'd: two dot products fused into the same
  // WholeStageCodegen function otherwise redeclare `i`/`n`/`sum`, janino
  // throws "Redefinition of local variable", and the WHOLE projection
  // silently falls back to interpreter mode — the exact overhead this
  // expression exists to remove.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotN")
      val sum = ctx.freshName("dotSum")
      val i = ctx.freshName("dotI")
      // emitted only when an element CAN be null: ev.isNull is undeclared
      // otherwise, and the dead branch would cost a test per element
      val nullCheck = if (elemsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Native PQ asymmetric-distance computation: Σ_s lut[s·ksub + code_s]
  * where code_s = (packed >>> s·bits) & (2^bits − 1) — the inner loop of
  * every ADC scan ([[graft.ext.ProductQuant]]), executed per
  * (candidate × query) pair.
  *
  * Why a custom Expression (same §7.4 path (b) rationale as
  * [[DotProductExpr]]): the composable form — m nested
  * `element_at(element_at(lut,·), unpack(·))` subtrees — evaluates
  * INTERPRETED (8-ish tree-node dispatches and two boxings per lookup);
  * at ~5M pairs × m=16 per streaming trigger that interpreter overhead
  * IS the trigger time. This compiles to one tight loop of shifts,
  * masks, and array reads inside WholeStageCodegen. Accumulation is
  * left-to-right over s — the same order as the fold it replaces, so
  * results are bit-identical.
  *
  * Null semantics: null lut or packed → null; a null lut ELEMENT → null
  * (matching `element_at`'s propagation in the fold form). An
  * out-of-range code (lut shorter than m·ksub) throws — that is a
  * caller bug (mismatched m/ksub vs the packing), not data. */
case class AdcDistExpr(lut: Expression, packed: Expression,
                       m: Int, ksub: Int)
  extends BinaryExpression {

  private val bits: Int =
    math.max(1, 32 - Integer.numberOfLeadingZeros(ksub - 1))
  private val mask: Long = (1L << bits) - 1

  override def left: Expression = lut
  override def right: Expression = packed

  override def checkInputDataTypes(): TypeCheckResult =
    (lut.dataType, packed.dataType) match {
      case (ArrayType(DoubleType, _), org.apache.spark.sql.types.LongType) =>
        if (m >= 1 && ksub >= 2 && m * bits <= 64)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_adc m=$m ksub=$ksub do not fit one packed long")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_adc expects (array<double>, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_adc"

  // same containsNull contract as DotProductExpr: a null lut ELEMENT
  // yields null, and codegen must not touch ev.isNull when it can't
  private def lutElemsNullable: Boolean = lut.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean =
    !childrenResolved || lut.nullable || packed.nullable || lutElemsNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val l = a.asInstanceOf[ArrayData]
    val p = b.asInstanceOf[java.lang.Long].longValue()
    var s = 0.0
    var i = 0
    while (i < m) {
      val idx = i * ksub + ((p >>> (i * bits)) & mask).toInt
      if (l.isNullAt(idx)) return null
      s += l.getDouble(idx)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, p) => {
      val sum = ctx.freshName("adcSum")
      val i = ctx.freshName("adcI")
      val idx = ctx.freshName("adcIdx")
      val nullCheck = if (lutElemsNullable)
        s"if ($l.isNullAt($idx)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |double $sum = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  int $idx = $i * $ksub + (int) (($p >>> ($i * $bits)) & ${mask}L);
         |  $nullCheck
         |  $sum += $l.getDouble($idx);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistExpr =
    copy(lut = newLeft, packed = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {

  /** Compiled float-vector dot product (see [[DotProductExpr]]). Results
    * are bit-identical to the higher-order fold `Similarity.dotN`. */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Compiled PQ ADC distance (see [[AdcDistExpr]]): `lutFlat` is the
    * row-major m×ksub table, `packed` the bit-packed code word. */
  def adcNative(lutFlat: Column, packed: Column, m: Int, ksub: Int): Column =
    Bridge.column(AdcDistExpr(Bridge.expression(lutFlat),
      Bridge.expression(packed), m, ksub))
}
