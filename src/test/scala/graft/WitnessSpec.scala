package graft

import org.apache.spark.sql.DataFrame

/** The 8 graduated sketch witnesses (round 10) each emit contract
  * booleans the sketch must EARN at evaluation time (tolerance-band /
  * rank-witness pattern). The driver's DuckDB gate checks them at
  * sf0.01; this spec locks the same contracts in CI at sf0.001 — a
  * second corpus scale, so a sketch regression that happens to hold at
  * one scale still fails the build. Boolean columns are recognized by
  * dtype, so a witness gaining a contract column is auto-covered.
  */
class WitnessSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val witnesses = Seq(
    "hourly_uniques_approx", "uniques_hll_rollup", "mad_outliers_approx",
    "join_size_estimate", "token_freq_cms", "knn_ivf",
    "span_contamination_bloom")

  private def boolCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.BooleanType => f.name
    }.toSeq

  for (name <- witnesses)
    test(s"$name: every contract boolean holds at sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf)
      val cols = boolCols(df)
      assert(cols.nonEmpty, s"$name emits no contract booleans")
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name returned no rows")
      for (r <- rows; c <- cols)
        assert(r.getAs[Boolean](c),
          s"$name: contract '$c' is false in row $r")
    }

  test("top_tokens_sketch: MG estimates are exact while vocab <= capacity") {
    // The direct-oracle graduation's precondition and consequence, locked
    // locally: distinct tokens <= 64 and est_count == exact count.
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val exact = docs
      .select(explode_outer(graft.ext.TextAnalysis.tokens(col("text")))
        .as("token"))
      .where(col("token").isNotNull)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val vocab = exact.count()
    assert(vocab <= 64L, s"vocab $vocab outgrew MG capacity — the " +
      "top_tokens_sketch direct oracle no longer holds; re-derive it")
    val sketch = SparkEntry.queries("top_tokens_sketch")(spark, sf)
    val mismatches = sketch.join(exact, Seq("token"))
      .where(col("est_count") =!= col("n")).count()
    assert(mismatches === 0L, s"$mismatches MG estimates diverged from exact")
  }
}
