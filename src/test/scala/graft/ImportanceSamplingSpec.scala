package graft

import org.apache.spark.sql.functions._

import graft.ext.ImportanceSampling
import graft.operators.DistributedRank

/** DSIR importance resampling (ext/ImportanceSampling) and the
  * distributed global row number it selects with. */
class ImportanceSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber: identical to the single-window rank") {
    val df = Seq((5L, 0.5), (1L, 0.9), (3L, 0.9), (2L, 0.1), (4L, 0.5),
      (9L, 2.0), (7L, -1.0), (6L, 0.5))
      .toDF("id", "w")
    val got = DistributedRank.globalRowNumber(df, "r",
        col("w").desc, col("id").asc)
      .select(col("id"), col("r")).as[(Long, Long)].collect().toMap
    val want = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, w) => (-w, id) }
      .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }.toMap
    assert(got === want)
  }

  test("globalRowNumber: ranks are a permutation of 1..n at scale") {
    val df = spark.range(0, 10000)
      .select(col("id"), (col("id") * 2654435761L % 997L).as("w"))
    val r = DistributedRank.globalRowNumber(df, "r",
        col("w").desc, col("id").asc)
      .select(col("r")).as[Long].collect().sorted
    assert(r.toSeq === (1L to 10000L))
  }

  private def corpus = Seq(
    (0L, "alpha beta alpha", "tgt"),
    (1L, "alpha beta gamma", "tgt"),
    (2L, "delta epsilon zeta", "other"),
    (3L, "delta epsilon eta", "other"),
    (4L, "alpha beta gamma delta", "other"), // target-like, other source
    (5L, "", "other")
  ).toDF("doc_id", "text", "source")

  test("weights: target-vocabulary docs score above disjoint-vocab docs") {
    val w = ImportanceSampling.importanceWeights(corpus,
        col("source") === "tgt", dim = 64)
      .as[(Long, Double)].collect().toMap
    // docs sharing the target's vocabulary outrank the disjoint ones,
    // regardless of their own source label — the point of DSIR
    assert(Seq(0L, 1L, 4L).map(w).min > Seq(2L, 3L).map(w).max)
    // no tokens → weight exactly 0
    assert(w(5L) === 0.0)
  }

  test("selectTopFraction: exactly ceil(frac·n), the top by the order") {
    val sel = ImportanceSampling.selectTopFraction(corpus,
        col("source") === "tgt", frac = 0.5, dim = 64)
      .select(col("doc_id"), col("weight"), col("selected"))
      .as[(Long, Double, Boolean)].collect()
    assert(sel.count(_._3) === 3) // ceil(0.5 * 6)
    val worstSel = sel.filter(_._3).map(s => (-s._2, s._1)).max
    val bestUnsel = sel.filterNot(_._3).map(s => (-s._2, s._1)).min
    assert(Ordering[(Double, Long)].lt(worstSel, bestUnsel),
      s"selection not the rank prefix: $worstSel vs $bestUnsel")
  }

  test("mixtureShift: target source over-represented in the selection") {
    val m = ImportanceSampling.mixtureShift(corpus,
        col("source") === "tgt", frac = 0.5, dim = 64)
      .select(col("source"), col("n_docs"), col("n_selected"))
      .as[(String, Long, Long)].collect()
      .map { case (s, n, k) => s -> (n, k) }.toMap
    val (nT, kT) = m("tgt")
    val (nO, kO) = m("other")
    assert(kT.toDouble / nT > kO.toDouble / nO)
  }
}
