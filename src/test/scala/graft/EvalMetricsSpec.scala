package graft

import org.apache.spark.sql.functions._

import graft.ext.{QualityClassifier, TextAnalysis}

/** Rank-sum ROC-AUC (QualityClassifier.aucRoc) and Jensen–Shannon token
  * divergence (TextAnalysis.tokenDivergence): hand-computed closed forms,
  * tie and edge semantics. */
class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def scored(rows: (Long, Double)*) =
    rows.zipWithIndex.map { case ((y, s), i) => (i.toLong, y, s) }
      .toDF("doc_id", "label", "logodds")

  test("aucRoc: perfect separation = 1, anti-separation = 0") {
    val perfect = scored((0L, -2.0), (0L, -1.0), (1L, 1.0), (1L, 2.0))
    val r = QualityClassifier.aucRoc(perfect, "label").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((2L, 2L, 1.0)))
    val inverted = scored((1L, -2.0), (1L, -1.0), (0L, 1.0), (0L, 2.0))
    assert(QualityClassifier.aucRoc(inverted, "label")
      .collect()(0).getDouble(2) === 0.0)
  }

  test("aucRoc: all-tied scores give 0.5 (average-rank convention)") {
    val tied = scored((1L, 0.5), (0L, 0.5), (1L, 0.5), (0L, 0.5))
    assert(QualityClassifier.aucRoc(tied, "label")
      .collect()(0).getDouble(2) === 0.5)
  }

  test("aucRoc: hand-computed mixed case with a cross-class tie") {
    // scores: pos {3, 2}, neg {2, 1}; ranks on sorted [1,2,2,3] =
    // [1, 2.5, 2.5, 4]; rank-sum(pos) = 4 + 2.5 = 6.5
    // AUC = (6.5 - 2*3/2) / (2*2) = 3.5/4 = 0.875
    val df = scored((1L, 3.0), (1L, 2.0), (0L, 2.0), (0L, 1.0))
    val r = QualityClassifier.aucRoc(df, "label").collect()(0)
    assert(r.getDouble(2) === 0.875)
  }

  test("aucRoc ranks on the ROUNDED score (ulp ties stay ties)") {
    // two scores that differ below 1e-6 must tie
    val df = scored((1L, 1.0000000001), (0L, 1.0), (1L, 2.0), (0L, 0.0))
    val r = QualityClassifier.aucRoc(df, "label").collect()(0)
    // ranks on rounded [0,1,1,2] = [1, 2.5, 2.5, 4]; pos sum = 2.5+4=6.5
    assert(r.getDouble(2) === 0.875)
  }

  test("aucRoc: single-class split yields explicit null, not NaN/Inf") {
    // AUC is undefined when either class is absent (U divides by n₁·n₀);
    // the guard must produce a REAL null — a raw zero division would
    // give engine-specific NaN/Inf and the oracle gate would compare
    // garbage to garbage instead of failing loudly.
    for (cls <- Seq(0L, 1L)) {
      val df = scored((cls, 1.0), (cls, 2.0), (cls, 3.0))
      val r = QualityClassifier.aucRoc(df, "label").collect()(0)
      assert(r.isNullAt(2), s"all-$cls split must null the AUC")
    }
  }

  test("calibrationTable: buckets, probs, and empirical rates") {
    // logodds 0 → p=0.5 (bucket 5); large +/- saturate to buckets 9/0
    val df = scored((1L, 0.0), (0L, 0.0), (1L, 20.0), (0L, -20.0))
    val r = QualityClassifier.calibrationTable(df, "label")
      .as[(Long, Long, Double, Double)].collect()
    assert(r.map(_._1).toSeq === Seq(0L, 5L, 9L))
    val b0 = r(0); val b5 = r(1); val b9 = r(2)
    assert(b0._2 === 1L && b0._3 === 0.0 && b0._4 === 0.0)
    assert(b5._2 === 2L && b5._3 === 0.5 && b5._4 === 0.5)
    assert(b9._2 === 1L && b9._3 === 1.0 && b9._4 === 1.0)
  }

  test("collocationsPmi: hand-computed PMI and min-count gate") {
    // "a b" ×5 (collocated), "x"/"y" tokens also appear separately
    val d = (0 until 5).map(i => (i.toLong, "a b x y"))
      .toDF("doc_id", "text")
    // bigrams per doc: (a b), (b x), (x y) ×5 → all pass minCount=5
    val r = TextAnalysis.collocationsPmi(d, minCount = 5, topK = 10)
      .as[(Long, String, String, Long, Double)].collect()
    assert(r.length === 3)
    val t2 = 15.0; val t1 = 20.0
    val exp = math.log((5.0 / t2) / ((5.0 / t1) * (5.0 / t1)))
    r.foreach { case (_, _, _, c2, pmi) =>
      assert(c2 === 5L)
      assert(math.abs(pmi - exp) < 1e-6) // all pairs same counts → same PMI
    }
    // ties broke (w1, w2) ascending
    assert(r.map(x => (x._2, x._3)).toSeq ===
      Seq(("a", "b"), ("b", "x"), ("x", "y")))
    // raising minCount above 5 filters everything
    assert(TextAnalysis.collocationsPmi(d, minCount = 6, topK = 10)
      .count() === 0)
  }

  private def docs(rows: (String, String)*) =
    rows.zipWithIndex.map { case ((g, t), i) => (i.toLong, t, g) }
      .toDF("doc_id", "text", "lang")

  test("vocabGrowth: cumulative distinct tokens per prefix") {
    val d = Seq((0L, "a b"), (1L, "b c"), (2L, "c d e"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.vocabGrowth(d, Seq(1L, 2L, 3L))
      .as[(Long, Long)].collect()
    assert(r.toSeq === Seq((1L, 2L), (2L, 3L), (3L, 5L)))
  }

  test("tokenDivergence: identical distributions diverge 0") {
    val d = docs(("a", "x y z"), ("b", "x y z"), ("b", "z y x"))
    val r = TextAnalysis.tokenDivergence(d).collect()(0)
    assert(r.getString(0) === "a" && r.getString(1) === "b")
    assert(r.getLong(2) === 3L && r.getDouble(3) === 0.0)
  }

  test("tokenDivergence: disjoint vocabularies diverge ln 2") {
    val d = docs(("a", "x x y"), ("b", "u v w"))
    val r = TextAnalysis.tokenDivergence(d).collect()(0)
    assert(r.getLong(2) === 5L)
    assert(math.abs(r.getDouble(3) - math.log(2.0)) < 1e-6)
  }

  test("bigramPerplexity: hand-computed closed form; short docs absent") {
    // corpus bigrams: d0 "a b a" → {ab, ba}; d1 "a b" → {ab}; d2 "x" → none
    // c2: ab=2, ba=1; c1(a)=2, c1(b)=1; V = 3 (a, b, x)
    val d = Seq((0L, "a b a"), (1L, "a b"), (2L, "x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramPerplexity(d).orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq === Seq(0L, 1L)) // d2 has no bigrams
    val pAb = (2 + 0.5) / (2 + 0.5 * 3)
    val pBa = (1 + 0.5) / (1 + 0.5 * 3)
    val ppl0 = math.exp(-(math.log(pAb) + math.log(pBa)) / 2.0)
    val ppl1 = math.exp(-math.log(pAb))
    assert(math.abs(got(0)._3 - ppl0) < 1e-5 && got(0)._2 === 2L)
    assert(math.abs(got(1)._3 - ppl1) < 1e-5 && got(1)._2 === 1L)
  }

  test("bigramPerplexity: scrambled token order explodes vs fluent order") {
    // many fluent copies establish the LM; one doc reverses the pattern
    val fluent = (0L until 20L).map(i => (i, "the quick fox jumps"))
    val scrambled = Seq((99L, "jumps the fox quick"))
    val d = (fluent ++ scrambled).toDF("doc_id", "text")
    val ppl = TextAnalysis.bigramPerplexity(d)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(ppl(99L) > 3.0 * ppl(0L),
      s"scrambled ${ppl(99L)} not >> fluent ${ppl(0L)}")
  }

  test("tokenDivergence: hand-computed partial overlap, all pairs emitted") {
    // a: {x:1, y:1}  p = (.5, .5, 0) ; b: {x:1, z:1}  q = (.5, 0, .5)
    // m = (.5, .25, .25); JS = .5*[.5 ln1 + .5 ln2] + .5*[.5 ln1 + .5 ln2]
    //    = .5 ln 2 ≈ 0.346574
    val d = docs(("a", "x y"), ("b", "x z"), ("c", "x y"))
    val rows = TextAnalysis.tokenDivergence(d)
      .as[(String, String, Long, Double)].collect()
    assert(rows.length === 3) // (a,b) (a,c) (b,c)
    val ab = rows.find(r => r._1 == "a" && r._2 == "b").get
    assert(math.abs(ab._4 - 0.5 * math.log(2.0)) < 1e-6)
    val ac = rows.find(r => r._1 == "a" && r._2 == "c").get
    assert(ac._4 === 0.0) // identical
  }
}
