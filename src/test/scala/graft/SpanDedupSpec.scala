package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SpanDedup

/** Span-level dedup on hand-built corpora where every island boundary is
  * known, plus the plan-shape pins that keep it one-scan at any corpus
  * size (see PlanShapeSpec for the family-wide convention). */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("spanRows emits 1-based positional k-grams; short docs emit none") {
    val sp = SpanDedup.spanRows(corpus(1L -> "a b c d", 2L -> "x y"), 3)
      .orderBy("doc_id", "pos").collect()
    assert(sp.map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq ===
      Seq((1L, 1L, "a b c"), (1L, 2L, "b c d")))
    assert(sp.forall(_.getLong(1) == 4L)) // n_tokens of the surviving doc
  }

  test("dupSpanReport ranks shared spans by reach, deterministically") {
    // docs 1 and 4 identical; doc 2 shares the "a b c d" run; doc 3 unique
    val docs = corpus(1L -> "a b c d e f", 2L -> "x y a b c d q",
      3L -> "p q r s t u", 4L -> "a b c d e f")
    val rep = SpanDedup.dupSpanReport(docs, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.toSeq === Seq(
      ("a b c", 3L, 3L), ("b c d", 3L, 3L), // ties broken by span text
      ("c d e", 2L, 2L), ("d e f", 2L, 2L)))
  }

  test("coverage merges overlapping hits into islands (interval union)") {
    val docs = corpus(1L -> "a b c d e f", 2L -> "x y a b c d q",
      3L -> "p q r s t u", 4L -> "a b c d e f")
    val cov = SpanDedup.spanDupCoverage(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    // doc 1/4: hits at pos 1..4 -> ONE island [1, 6]: covered 6 of 6
    // doc 2: hits at pos 3,4 -> island [3, 6]: covered 4 of 7
    // docs 3 (unique) and none-below-k: absent
    assert(cov === Seq(
      (1L, 6L, 4L, 1L, 6L, 1.0),
      (2L, 7L, 2L, 1L, 4L, 0.571429),
      (4L, 6L, 4L, 1L, 6L, 1.0)))
  }

  test("disjoint duplicated runs stay separate islands") {
    // shared prefix "a b c" and shared suffix "d e f" with distinct middles:
    // two islands of 3, a 3-token gap between them
    val docs = corpus(1L -> "a b c m1 m2 m3 d e f",
      2L -> "a b c w1 w2 w3 d e f")
    val cov = SpanDedup.spanDupCoverage(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(cov.toSeq === Seq((1L, 2L, 6L, 0.666667), (2L, 2L, 6L, 0.666667)))
  }

  test("maxOcc cap drops stop-spans from coverage (documented lower bound)") {
    val docs = corpus(1L -> "a b c d", 2L -> "a b c e", 3L -> "a b c f")
    // "a b c" occurs 3 times; cap at 2 removes it entirely
    assert(SpanDedup.spanDupCoverage(docs, k = 3, maxOcc = 2).count() === 0L)
    assert(SpanDedup.spanDupCoverage(docs, k = 3, maxOcc = 3).count() === 3L)
  }

  test("cutDuplicatedSpans keeps the owner, cuts everyone else") {
    val docs = corpus(1L -> "a b c d e f", 2L -> "x y a b c d q",
      3L -> "p q r s t u", 4L -> "a b c d e f")
    val out = SpanDedup.cutDuplicatedSpans(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def h(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    // doc 1 owns every shared span (min doc_id): untouched.
    // doc 2 loses "a b c d" (pos 3..6): "x y q" remains.
    // doc 3 shares nothing: untouched. doc 4 loses EVERYTHING.
    assert(out.toSeq === Seq(
      (1L, 6L, 6L, h("a b c d e f")),
      (2L, 7L, 3L, h("x y q")),
      (3L, 6L, 6L, h("p q r s t u")),
      (4L, 6L, 0L, h(""))))
  }

  test("cut islands merge across overlapping spans of different owners") {
    // doc 3 shares "a b c" with doc 1 and "b c z" with doc 2; its hits at
    // pos 1 and 2 overlap -> ONE island [1, 4], leaving only "t"
    val docs = corpus(1L -> "a b c m", 2L -> "b c z w", 3L -> "a b c z t")
    val out = SpanDedup.cutDuplicatedSpans(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out === Map(1L -> 4L, 2L -> 4L, 3L -> 1L))
  }

  test("plan: one corpus scan, no nested loop, one doc_id exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for ((name, df) <- Seq(
      "report" -> SpanDedup.dupSpanReport(docs, 5),
      "coverage" -> SpanDedup.spanDupCoverage(docs, 5))) {
      val p = plan(df)
      assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).toSeq.distinct.size === 1,
        s"$name should scan the corpus once:\n$p")
      assert(!p.contains("NestedLoop"), s"$name has a nested-loop join")
    }
    // both windows and both post-window groupBys ride ONE doc_id exchange
    val p = plan(SpanDedup.spanDupCoverage(docs, 5))
    assert("hashpartitioning\\(doc_id".r.findAllIn(p).size === 1,
      s"coverage should have exactly one doc_id exchange:\n$p")
  }
}
