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
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {

  /** Compiled float-vector dot product (see [[DotProductExpr]]). Results
    * are bit-identical to the higher-order fold `Similarity.dotN`. */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))
}
