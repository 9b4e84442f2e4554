package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lints the assembled oracle-SQL map against the two recurring
  * registry-construction traps (no Spark session needed):
  *
  *  1. Scala val-init-order: a helper `val` declared AFTER the query map
  *     that references it interpolates as the string "null" into the SQL
  *     (bit us twice: dsirCtes round 10, kmeansV round 11 — both now
  *     `lazy val`s). All legitimate SQL here writes NULL uppercase, so a
  *     lowercase `null` token is always the interpolation signature.
  *  2. Coverage drift: every oracleSql key must have a queries entry and
  *     vice versa (a rows-only query would silently weaken the gate).
  */
class OracleSqlLintSpec extends AnyFunSuite {

  test("no oracle SQL carries an interpolated Scala null") {
    val nullTok = "(?i)(?<![A-Za-z_])null(?![A-Za-z_])".r
    val bad = SparkEntry.oracleSql.flatMap { case (name, sql) =>
      nullTok.findAllMatchIn(sql).collect {
        case m if m.matched != "NULL" =>
          val lo = math.max(0, m.start - 30)
          s"$name: ...${sql.substring(lo, math.min(sql.length, m.end + 10))
            .replace('\n', ' ')}..."
      }
    }
    assert(bad.isEmpty, s"lowercase null in oracle SQL (init-order " +
      s"trap — make the helper lazy):\n${bad.mkString("\n")}")
  }

  test("queries and oracleSql cover exactly the same names") {
    // EVERY declared query carries a DuckDB oracle — no exemptions.
    // (round 17: the one former rows-only query, index_health, now
    // ensures its reported families exist and emits only the
    // deterministic columns, so it is exactly oracled like the rest;
    // its layout-dependent file/row counts live in IndexHealthSpec.)
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle without query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty,
      s"query without oracle: ${(q -- o).toSeq.sorted}")
  }
}
