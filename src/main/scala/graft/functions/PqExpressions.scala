package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native PQ encode/LUT kernels — the per-ROW halves of the ADC stack
  * ([[AdcDistExpr]] is the per-PAIR half). Both walk the same codebook
  * geometry: m subspaces × ksub centroids × dsub dims, codebook flat
  * row-major (sub, code, dim).
  *
  * Why custom Expressions (§7.4 path (b), the [[DotProductExpr]]
  * rationale at one level up): the composable form — a `transform` over
  * the codebook literal with an `aggregate` fold per centroid —
  * evaluates ~m·ksub·dsub interpreted tree nodes per row. Encoding is
  * THE full-corpus scan of a PQ pipeline (every ingested vector runs
  * it once), and the LUT runs per (query × probed cell) per trigger in
  * the streaming screen; both deserve the compiled loop. The codebook
  * rides along as a REFERENCE OBJECT (`ctx.addReferenceObj`), not an
  * expression child — no giant literal in the plan tree, no per-row
  * ArrayData walk of the codebook.
  *
  * Bit-identity with the higher-order forms (which the specs pin by
  * comparing both paths): distances accumulate left-to-right over the
  * dsub dims; argmin keeps the FIRST index at ties (strict `<`), the
  * `array_position(dists, array_min(dists))` contract.
  *
  * Null semantics: null input array → null; a null ELEMENT → null
  * (matching arithmetic propagation through the folds). */
abstract class PqKernelExpr extends UnaryExpression {
  def m: Int
  def ksub: Int
  def dsub: Int
  def codebook: Array[Double] // flat (sub, code, dim), length m·ksub·dsub

  // A null ELEMENT yields null even when the array itself cannot be
  // null, so nullability must include containsNull — and when elements
  // cannot be null the generated code must not reference ev.isNull:
  // nullSafeCodeGen's non-nullable branch never declares it, janino
  // rejects the undeclared name, and the whole projection silently drops
  // to the interpreter (the round-11 text_knn_hashed fallback).
  protected def elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean =
    !childrenResolved || child.nullable || elemsNullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        if (codebook.length == m * ksub * dsub) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName codebook length ${codebook.length} != m*ksub*dsub")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.catalogString}")
    }
}

/** Flat m×ksub LUT of squared subvector-to-centroid distances:
  * lut[s·ksub + j] = ‖v[s·dsub ..][0..dsub] − c_{s,j}‖². */
case class PqLutExpr(child: Expression, codebook: Array[Double],
                     m: Int, ksub: Int, dsub: Int) extends PqKernelExpr {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val off = s * dsub
      var j = 0
      while (j < ksub) {
        val cOff = (s * ksub + j) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          if (v.isNullAt(off + t)) return null
          val x = v.getDouble(off + t) - codebook(cOff + t)
          d += x * x
          t += 1
        }
        out(s * ksub + j) = d
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCb", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("lutOut")
      val s = ctx.freshName("lutS")
      val j = ctx.freshName("lutJ")
      val t = ctx.freshName("lutT")
      val d = ctx.freshName("lutD")
      val x = ctx.freshName("lutX")
      val nullCheck = if (elemsNullable)
        s"if ($v.isNullAt($s * $dsub + $t)) { ${ev.isNull} = true; break lutLoop; }"
      else ""
      s"""
         |double[] $out = new double[${m * ksub}];
         |lutLoop: {
         |  for (int $s = 0; $s < $m; $s++) {
         |    for (int $j = 0; $j < $ksub; $j++) {
         |      double $d = 0.0;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        $nullCheck
         |        double $x = $v.getDouble($s * $dsub + $t)
         |          - $cb[($s * $ksub + $j) * $dsub + $t];
         |        $d += $x * $x;
         |      }
         |      $out[$s * $ksub + $j] = $d;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** Packed PQ code word: for each subspace the FIRST argmin centroid
  * index, packed at bit s·bits (bits = ⌈log2 ksub⌉). One compiled loop
  * replaces the m-argmin + shift/or expression forest. */
case class PqCodeExpr(child: Expression, codebook: Array[Double],
                      m: Int, ksub: Int, dsub: Int) extends PqKernelExpr {

  private val bits: Int =
    math.max(1, 32 - Integer.numberOfLeadingZeros(ksub - 1))
  require(m * bits <= 64, s"$m sub-codes × $bits bits do not fit one long")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_code"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    var packed = 0L
    var s = 0
    while (s < m) {
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val cOff = (s * ksub + j) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          if (v.isNullAt(off + t)) return null
          val x = v.getDouble(off + t) - codebook(cOff + t)
          d += x * x
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      packed |= best.toLong << (s * bits)
      s += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCb", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val packed = ctx.freshName("pqPacked")
      val s = ctx.freshName("pqS")
      val j = ctx.freshName("pqJ")
      val t = ctx.freshName("pqT")
      val d = ctx.freshName("pqD")
      val x = ctx.freshName("pqX")
      val best = ctx.freshName("pqBest")
      val bestD = ctx.freshName("pqBestD")
      val nullCheck = if (elemsNullable)
        s"if ($v.isNullAt($s * $dsub + $t)) { ${ev.isNull} = true; break codeLoop; }"
      else ""
      s"""
         |long $packed = 0L;
         |codeLoop: {
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $best = 0;
         |    double $bestD = Double.MAX_VALUE;
         |    for (int $j = 0; $j < $ksub; $j++) {
         |      double $d = 0.0;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        $nullCheck
         |        double $x = $v.getDouble($s * $dsub + $t)
         |          - $cb[($s * $ksub + $j) * $dsub + $t];
         |        $d += $x * $x;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $j; }
         |    }
         |    $packed |= ((long) $best) << ($s * $bits);
         |  }
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodeExpr =
    copy(child = newChild)
}

/** Column-level entry points. `codebooks` in the
  * [[graft.ext.ProductQuant]] nested shape; flattened here once. */
object PqFunctions {
  private def flat(cb: Array[Array[Array[Double]]]): Array[Double] =
    cb.flatMap(_.flatMap(_.toSeq))

  def pqLutNative(vn: Column, cb: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqLutExpr(Bridge.expression(vn), flat(cb),
      cb.length, cb(0).length, cb(0)(0).length))

  def pqCodeNative(vn: Column, cb: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqCodeExpr(Bridge.expression(vn), flat(cb),
      cb.length, cb(0).length, cb(0)(0).length))
}
