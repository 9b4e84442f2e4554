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
    // The one DELIBERATE rows-only query: index_health reports
    // manifest file counts and sidecar rows — layout/machine-dependent
    // values a SQL oracle cannot predict (the span_probe_file_skip
    // lesson: layout witnesses live in specs — IndexHealthSpec pins
    // the deterministic semantics). Everything else must be exactly
    // oracled, and an oracle-less query NOT on this list still fails.
    val rowsOnly = Set("index_health")
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle without query: ${(o -- q).toSeq.sorted}")
    assert((q -- o) === rowsOnly,
      s"rows-only queries beyond the documented exception: " +
        s"${(q -- o -- rowsOnly).toSeq.sorted}")
  }
}
