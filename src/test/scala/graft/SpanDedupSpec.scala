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

  test("PROPERTY: island algebra == brute-force position-set union") {
    // Random corpora over a 3-token vocab force dense span collisions.
    // The reference computation is deliberately different machinery:
    // explicit per-position sets instead of windows and intervals.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val k = 3
    val corpusGen: Gen[List[(Long, String)]] = Gen.listOfN(6,
      Gen.choose(0, 10).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    def brute(rows: List[(Long, String)]) = {
      val toks = rows.map { case (d, t) =>
        d -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
      val occ = (for {
        (d, w) <- toks.toSeq; i <- 1 to w.length - k + 1
      } yield (w.slice(i - 1, i - 1 + k).mkString(" "), d, i))
      val byspan = occ.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
      val cover = byspan.values.flatten.toSeq
        .flatMap { case (_, d, p) => (p until p + k).map(d -> _) }.distinct
        .groupBy(_._1).map { case (d, ps) => d -> ps.size.toLong }
      val cut = byspan.values.toSeq.flatMap { v =>
        val own = v.map(_._2).min
        v.filter(_._2 != own)
      }.flatMap { case (_, d, p) => (p until p + k).map(d -> _) }.distinct
        .groupBy(_._1).map { case (d, ps) => d -> ps.size.toLong }
      val clean = toks.map { case (d, w) =>
        val cutPos = byspan.values.toSeq.flatMap { v =>
          val own = v.map(_._2).min
          v.filter(_._2 != own)
        }.filter(_._2 == d).flatMap { case (_, _, p) => p until p + k }.toSet
        d -> w.zipWithIndex.collect {
          case (t, i) if !cutPos(i + 1) => t }.mkString(" ")
      }
      (cover, cut, clean)
    }
    val prop = Prop.forAll(corpusGen) { rows =>
      val docs = corpus(rows: _*)
      val (cover, _, clean) = brute(rows)
      val gotCover = SpanDedup.spanDupCoverage(docs, k).collect()
        .map(r => r.getLong(0) -> r.getLong(4)).toMap
      val gotClean = SpanDedup.cutDuplicatedSpans(docs, k).collect()
        .map(r => r.getLong(0) -> r.getString(3)).toMap
      val cleanMd5 = clean.map { case (d, s) =>
        d -> org.apache.commons.codec.digest.DigestUtils.md5Hex(s) }
      (gotCover == cover) :| s"coverage $gotCover != brute $cover" &&
        (gotClean == cleanMd5) :| s"cut $gotClean != brute $cleanMd5"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
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
