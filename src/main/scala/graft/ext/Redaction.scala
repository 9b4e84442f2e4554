package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern redaction — the PII-scrubbing pass a training-data pipeline runs
  * before any text leaves the ingest zone: find configured regex patterns
  * (emails, phone numbers, IPs, SSNs, …), count them per document, and
  * replace them with a redaction token.
  *
  * The reference has no scrubbing surface (its only text ops are lowercase
  * + whitelist — reference: dags/etl/schema_check.py:176-181); this is a
  * SURVEY.md §7.3.7-class extension. Built-in-only: `regexp_extract_all`
  * for counts, chained `regexp_replace` for the scrub — both codegen'd
  * projections, embarrassingly parallel at any corpus size (no shuffle, no
  * UDF, no collect). Patterns are Java regexes kept inside the
  * RE2-compatible subset (no backrefs/lookahead) so the DuckDB oracle
  * evaluates them identically.
  */
object Redaction {

  /** Production-shaped PII patterns (the unit spec exercises these; the
    * synthetic corpus contains none by construction, which is itself the
    * expected steady-state — a nonzero count is the alarm). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b")

  /** Per-row redaction: adds `n_<name>` match counts for every pattern and
    * `<textCol>_redacted` with all patterns replaced by `token`. Patterns
    * apply in order (earlier replacements can consume later matches —
    * list the most specific first, as piiPatterns does). */
  def redact(df: DataFrame, textCol: String,
             patterns: Seq[(String, String)] = piiPatterns,
             token: String = "[REDACTED]"): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    val withCounts = patterns.foldLeft(df) { case (d, (name, pat)) =>
      d.withColumn(s"n_$name",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
    }
    val scrubbed = patterns.foldLeft(col(textCol)) { case (c, (_, pat)) =>
      regexp_replace(c, pat, token)
    }
    withCounts.withColumn(s"${textCol}_redacted", scrubbed)
  }

  /** Attrition report: per group, documents scanned, documents touched,
    * per-pattern match totals and characters removed — the audit artifact
    * a scrubbing pass must emit (how much PII, where, how much text was
    * destroyed). One projection + one hash aggregate. */
  def redactionStats(df: DataFrame, textCol: String, groupCols: Seq[String],
                     patterns: Seq[(String, String)] = piiPatterns,
                     token: String = "[REDACTED]"): DataFrame = {
    val r = redact(df, textCol, patterns, token)
    val anyHit = patterns.map(p => col(s"n_${p._1}") > 0).reduce(_ || _)
    val aggs =
      count(lit(1)).as("n_docs") +:
        sum(when(anyHit, 1L).otherwise(0L)).as("n_docs_redacted") +:
        patterns.map { case (name, _) =>
          sum(col(s"n_$name")).as(s"total_$name")
        } :+
        sum(length(col(textCol)) - length(col(s"${textCol}_redacted")))
          .cast("long").as("chars_removed")
    r.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(groupCols.map(col): _*)
  }
}
