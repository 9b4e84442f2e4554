package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.QualityClassifier

/** Bernoulli NB quality filter: weights vs the hand-computed closed
  * form, scoring edge cases (unseen tokens, token-less docs), a
  * provably-separable label learned to accuracy 1.0, and the
  * broadcast-model plan pin. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def fixture: DataFrame = Seq(
    (1L, "good clean text", 1L),
    (2L, "good text", 1L),
    (3L, "spam junk", 0L),
    (4L, "junk junk text", 0L)).toDF("doc_id", "text", "label")

  test("fitted weights match the closed form by hand") {
    val m = QualityClassifier.fitBernoulliNb(fixture, "label")
    val w = m.tokenWeights.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    // 'good': df1=2 of n1=2 → p1=(2+1)/(2+2)=0.75, w1=ln(3);
    //         df0=0 of n0=2 → p0=0.25, w0=-ln(3)
    val (df1, df0, w1, w0) = w("good")
    assert(df1 === 2L && df0 === 0L)
    assert(math.abs(w1 - math.log(3.0)) < 1e-12)
    assert(math.abs(w0 + math.log(3.0)) < 1e-12)
    // 'junk' mirrors it ('junk junk' counts ONCE — presence, not count)
    val (jd1, jd0, jw1, jw0) = w("junk")
    assert(jd1 === 0L && jd0 === 2L)
    assert(math.abs(jw1 + math.log(3.0)) < 1e-12)
    assert(math.abs(jw0 - math.log(3.0)) < 1e-12)
    assert(w.keySet === Set("good", "clean", "text", "spam", "junk"))
  }

  test("scoring ignores unseen tokens; token-less docs fall back to priors+baseline") {
    val m = QualityClassifier.fitBernoulliNb(fixture, "label")
    val scored = QualityClassifier.scoreBernoulliNb(
      Seq((10L, "good good zzzunseen"), (11L, "")).toDF("doc_id", "text"), m)
      .select("doc_id", "logodds").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent driver-side reference: per-token p with α=1, n_c=2
    def p(df: Long) = (df + 1.0) / (2.0 + 2.0)
    val dfs = Map("good" -> (2L, 0L), "clean" -> (1L, 0L),
      "text" -> (2L, 1L), "spam" -> (0L, 1L), "junk" -> (0L, 2L))
    val base1 = dfs.values.map { case (d1, _) => math.log(1 - p(d1)) }.sum
    val base0 = dfs.values.map { case (_, d0) => math.log(1 - p(d0)) }.sum
    val c1 = math.log(0.5) + base1
    val c0 = math.log(0.5) + base0
    def wdiff(t: String) = {
      val (d1, d0) = dfs(t)
      (math.log(p(d1)) - math.log(1 - p(d1))) -
        (math.log(p(d0)) - math.log(1 - p(d0)))
    }
    // doc 10: only 'good' is in-vocab (presence once); zzzunseen ignored
    assert(math.abs(scored(10L) - ((c1 - c0) + wdiff("good"))) < 1e-9)
    // doc 11: no tokens at all → pure priors + all-absent baseline
    assert(math.abs(scored(11L) - (c1 - c0)) < 1e-9)
  }

  test("a separable presence label is learned to accuracy 1.0") {
    // marker docs share filler 'the' with the negatives, so the filler
    // weight difference is EXACTLY zero and the margin is pure marker
    val docs = ((1L to 10L).map(i => (i, "mark the", 1L)) ++
      (11L to 20L).map(i => (i, "the", 0L))).toDF("doc_id", "text", "label")
    val m = QualityClassifier.fitBernoulliNb(docs, "label")
    val eval = QualityClassifier.evaluate(
      QualityClassifier.scoreBernoulliNb(docs, m), "label").collect()(0)
    assert(eval.getAs[Long]("n_test") === 20L)
    assert(eval.getAs[Long]("n_correct") === 20L)
    assert(eval.getAs[Double]("accuracy") === 1.0)
    assert(eval.getAs[Double]("baseline_accuracy") === 0.5)
  }

  test("the model joins broadcast at score time") {
    val m = QualityClassifier.fitBernoulliNb(fixture, "label")
    val scored = QualityClassifier.scoreBernoulliNb(
      fixture.select("doc_id", "text"), m)
    scored.count() // materialize through AQE
    val p = scored.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast:\n$p")
  }
}
