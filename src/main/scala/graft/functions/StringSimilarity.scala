package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity — the entity-resolution scorer for
  * SHORT strings (names, codes) where levenshtein's integer distance is
  * too coarse: transposition-tolerant, prefix-boosted, in [0, 1].
  *
  * Standard definition (Winkler 1990): Jaro similarity from the match
  * count m inside a ⌊max(|a|,|b|)/2⌋−1 window and half-transposition
  * count t, `(m/|a| + m/|b| + (m−t)/m) / 3`; then the Winkler boost
  * `jw = j + ℓ·0.1·(1−j)` for a common prefix of ℓ ≤ 4 chars, applied
  * ONLY when j > 0.7 (Winkler's boost threshold — and DuckDB's
  * `jaro_winkler_similarity` behavior, which this implementation is
  * differentially tested against: e.g. jw("abcccccc","abdddddd") must
  * stay at its jaro value 0.5, not boost to 0.6).
  */
object StringSimilarity {

  /** O(|a|·window) two-pass match/transposition count; null-safe at the
    * expression layer. Operates on UTF-16 code units (names in catalogs
    * are BMP text; matches DuckDB on ASCII, which the oracle data is). */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    // empty input → 0, INCLUDING both-empty: matches DuckDB's
    // jaro_winkler_similarity (the differential oracle); an empty name
    // carries no resolution signal anyway
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val win = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val aMatch = new Array[Boolean](a.length)
    val bMatch = new Array[Boolean](b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - win)
      val hi = math.min(b.length - 1, i + win)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars out of relative order
    var t = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / a.length + md / b.length + (md - t / 2.0) / md) / 3.0
    // boost threshold: below 0.7 the prefix carries no signal (Winkler
    // 1990; DuckDB gates identically — verified on low-similarity pairs)
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < math.min(4, math.min(a.length, b.length)) &&
      a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)` → double in [0, 1]; codegen'd static call, no
  * UDF. Null inputs → null. */
case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"(${a.catalogString}, ${b.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.StringSimilarity.jaroWinkler($a, $b);"
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinklerExpr = copy(left = l, right = r)
}

object StringFunctions {
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerExpr(Bridge.expression(a), Bridge.expression(b)))
}
