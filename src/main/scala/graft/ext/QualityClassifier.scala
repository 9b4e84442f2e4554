package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fitted Bernoulli NB model, kept as LAZY frames so fit+score compose
  * into one plan. `tokenWeights` is vocabulary-sized
  * (token, df1, df0, w1, w0) — the broadcast side at score time;
  * `consts` is ONE row (c1, c0) folding the class log-priors and the
  * all-absent baseline Σ_t ln(1−p_t|c) together. */
final case class NbModel(tokenWeights: DataFrame, consts: DataFrame)

/** Model-based quality filtering: a distributed-trainable Bernoulli
  * Naive Bayes classifier over token-presence features — the classic
  * CCNet / fastText-style "does this doc look like the high-quality
  * class" gate a training-data pipeline runs after the heuristic
  * quality flags ([[TextAnalysis.qualityScored]]).
  *
  * The reference has no ML surface at all (its quality checks are the
  * rule table at dags/etl/schema_check.py:170-190); this is a SURVEY.md
  * §7.3.7 pipeline extension.
  *
  * Why Bernoulli (presence/absence) and not multinomial: the quality
  * gate's signal is "which words appear at all" (boilerplate markers,
  * spam vocabulary), and Bernoulli also scores the ABSENCE of every
  * vocab token — `score_c = ln P(c) + Σ_{t∈V} [x_t ln p + (1−x_t)
  * ln(1−p)]` — which rewrites to a per-class constant plus a sum over
  * only the PRESENT tokens: `c_c + Σ_{t∈doc} w_{t,c}` with
  * `w = ln p − ln(1−p)`. That rewrite is what makes it a Spark-native
  * operator: fit is ONE token aggregation, scoring is one explode +
  * one broadcast join + one per-doc sum.
  *
  * Scale posture (100 TB): fit shuffles (token) pairs once — map-side
  * combine collapses to vocabulary size before the exchange; the class
  * totals are a 1-row aggregate crossJoined back (broadcast by AQE).
  * Scoring never shuffles the corpus for the MODEL (vocabulary-sized
  * broadcast; cap the vocab with `minDf` when it would not fit) — the
  * only corpus-sized exchange is the per-doc weight-sum groupBy, keyed
  * by doc_id. No collect, no driver state, no iteration: NB's
  * closed-form fit is the reason to pick it over SGD models here.
  */
object QualityClassifier {

  /** Fit on `docs` (needs `text` and a 0/1 `labelCol`). Presence
    * features over `array_distinct(tokens(text))`; add-α smoothing
    * `p_{t,c} = (df_{t,c}+α)/(n_c+2α)` (never 0 or 1, so every log is
    * finite — even for a class with zero docs, where p degenerates to
    * ½ and the token contributes nothing to the odds). Tokens are the
    * TRAIN vocabulary; score-time tokens outside it are ignored (the
    * standard Bernoulli convention). `minDf` drops tokens seen in
    * fewer than that many train docs — the vocab cap that keeps the
    * broadcast side bounded on an open-vocabulary corpus. */
  def fitBernoulliNb(docs: DataFrame, labelCol: String,
                     alpha: Double = 1.0, minDf: Long = 1L): NbModel = {
    val base = docs.select(
      col(labelCol).cast("long").as("y"),
      array_distinct(TextAnalysis.tokens(col("text"))).as("toks"))
    // one row: class doc counts (computed BEFORE the explode, so
    // token-less docs still count toward the priors)
    val classes = base.agg(
      sum(col("y")).as("n1"),
      (count(lit(1)) - sum(col("y"))).as("n0"))
    val pres = base
      .select(col("y"), explode_outer(col("toks")).as("token"))
      .where(col("token").isNotNull)
    val dft = pres.groupBy(col("token"))
      .agg(sum(col("y")).as("df1"),
        (count(lit(1)) - sum(col("y"))).as("df0"))
      .where(col("df1") + col("df0") >= minDf)

    def p(dfc: Column, nc: Column): Column =
      (dfc.cast("double") + lit(alpha)) /
        (nc.cast("double") + lit(2.0 * alpha))

    val w = dft.crossJoin(broadcast(classes)).select(
      col("token"), col("df1"), col("df0"), col("n1"), col("n0"),
      (log(p(col("df1"), col("n1"))) -
        log(lit(1.0) - p(col("df1"), col("n1")))).as("w1"),
      (log(p(col("df0"), col("n0"))) -
        log(lit(1.0) - p(col("df0"), col("n0")))).as("w0"),
      log(lit(1.0) - p(col("df1"), col("n1"))).as("a1"),
      log(lit(1.0) - p(col("df0"), col("n0"))).as("a0"))
    // group on the (constant) class counts: one output row, and n1/n0
    // survive into the prior term without a second pass over docs
    val consts = w.groupBy(col("n1"), col("n0"))
      .agg(sum(col("a1")).as("base1"), sum(col("a0")).as("base0"))
      .select(
        (log(col("n1").cast("double") /
          (col("n1") + col("n0")).cast("double")) + col("base1")).as("c1"),
        (log(col("n0").cast("double") /
          (col("n1") + col("n0")).cast("double")) + col("base0")).as("c0"))
    NbModel(w.select("token", "df1", "df0", "w1", "w0"), consts)
  }

  /** Score `docs` (needs `doc_id`, `text`): every input column plus
    * `logodds` (= score₁ − score₀) and `pred` (0/1). A doc with no
    * in-vocabulary tokens falls back to priors + all-absent baseline
    * (both sums coalesce to 0). The join back to `docs` is
    * doc_id-keyed — pre-project `docs` to the columns you need
    * downstream so the text payload doesn't ride the exchange (on a
    * doc_id-bucketed layout it is exchange-free). */
  def scoreBernoulliNb(docs: DataFrame, model: NbModel): DataFrame = {
    val pres = docs.select(col("doc_id"),
        explode_outer(array_distinct(TextAnalysis.tokens(col("text"))))
          .as("token"))
      .where(col("token").isNotNull)
    val sums = pres
      .join(broadcast(model.tokenWeights.select("token", "w1", "w0")),
        Seq("token"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w1")).as("__s1"), sum(col("w0")).as("__s0"))
    docs.join(sums, Seq("doc_id"), "left")
      .crossJoin(broadcast(model.consts))
      .withColumn("logodds",
        (col("c1") + coalesce(col("__s1"), lit(0.0))) -
          (col("c0") + coalesce(col("__s0"), lit(0.0))))
      .withColumn("pred", (col("logodds") > 0).cast("int"))
      .drop("__s1", "__s0", "c1", "c0")
  }

  /** Held-out evaluation frame: one row with the confusion counts,
    * accuracy, and the majority-class baseline — the "did the model
    * actually learn anything" witness a pipeline gates promotion on. */
  def evaluate(scored: DataFrame, labelCol: String): DataFrame = {
    val y = col(labelCol).cast("int")
    scored.agg(
      count(lit(1)).as("n_test"),
      sum(when(col("pred") === y, 1L).otherwise(0L)).as("n_correct"),
      sum(when(col("pred") === 1 && y === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") === 1 && y === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("pred") === 0 && y === 1, 1L).otherwise(0L)).as("fn"),
      greatest(sum(y.cast("long")),
        count(lit(1)) - sum(y.cast("long"))).as("n_majority"))
      .select(col("n_test"), col("n_correct"), col("tp"), col("fp"),
        col("fn"),
        round(col("n_correct").cast("double") /
          col("n_test").cast("double"), 6).as("accuracy"),
        round(col("n_majority").cast("double") /
          col("n_test").cast("double"), 6).as("baseline_accuracy"))
  }

  /** Calibration (reliability) table: score → σ(logodds) probability,
    * bucketed to deciles; per bucket the count, mean predicted
    * probability, and empirical positive rate. A well-calibrated gate
    * has mean_prob ≈ frac_pos per bucket — the diagram a production
    * threshold is actually read off. Exact arithmetic mirrors in SQL
    * (σ is one exp; probabilities round to 6 dp BEFORE bucketing so the
    * decile assignment can't straddle engines). */
  def calibrationTable(scored: DataFrame, labelCol: String,
                       scoreCol: String = "logodds"): DataFrame = {
    val p = round(lit(1.0) / (lit(1.0) + exp(-col(scoreCol))), 6)
    val y = col(labelCol).cast("long")
    scored
      .select(least(floor(p * 10).cast("long"), lit(9L)).as("bucket"),
        p.as("p"), y.as("y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("p")), 6).as("mean_prob"),
        round(sum(col("y")).cast("double") / count(lit(1)), 6)
          .as("frac_pos"))
      .orderBy(col("bucket"))
  }

  /** ROC-AUC of a scored frame via the rank-sum (Mann–Whitney U)
    * identity — threshold-free classifier quality, the number a
    * calibration sweep optimizes before picking the gate's cutoff:
    *
    *   AUC = (Σ_{y=1} avgRank(score) − n₁(n₁+1)/2) / (n₁·n₀)
    *
    * with ties carrying their AVERAGE rank (minRank + (tieCount−1)/2),
    * so tied scores contribute exactly ½ per tied (pos, neg) pair — the
    * standard U-statistic convention. Ranks are taken on the score
    * ROUNDED to 6 dp: the raw double can differ by an ulp across
    * engines, silently turning a tie into an ordering and shifting both
    * rank columns — the rounded value is what the oracle already proves
    * bit-identical (`nb_doc_logodds`).
    *
    * A SINGLE-CLASS held-out split (n_pos or n_neg = 0) has no defined
    * AUC — the U-statistic divides by n₁·n₀ — so the ratio is guarded
    * to an EXPLICIT null (mirrored in the oracle SQL) rather than the
    * engine-specific NaN/Inf a raw zero division would produce.
    *
    * Scale note: ranking is a global sort of the SCORED EVAL SET (the
    * held-out split a gate is calibrated on), not the corpus; avg-ranks
    * are half-integers, so their sums are exact in doubles up to 2⁵³.
    */
  def aucRoc(scored: DataFrame, labelCol: String,
             scoreCol: String = "logodds"): DataFrame = {
    val sc = round(col(scoreCol), 6)
    val y = col(labelCol).cast("long")
    // rank() = min rank within a tie group; + (tieCount−1)/2 = avg rank
    val avgRank = rank().over(Window.orderBy(sc)).cast("double") +
      (count(lit(1)).over(Window.partitionBy(sc)).cast("double") - 1.0) / 2.0
    scored
      .select(y.as("__y"), avgRank.as("__ar"))
      .agg(sum(col("__y")).as("n_pos"),
        (count(lit(1)) - sum(col("__y"))).as("n_neg"),
        sum(when(col("__y") === 1, col("__ar")).otherwise(0.0)).as("__rs"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("__rs") - col("n_pos").cast("double")
              * (col("n_pos") + 1).cast("double") / 2.0)
            / (col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .otherwise(lit(null).cast("double"))
          .as("auc"))
  }
}
