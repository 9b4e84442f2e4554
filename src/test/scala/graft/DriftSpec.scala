package graft

import org.apache.spark.sql.functions._

import graft.ext.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("categories absent from one side stay defined via smoothing") {
    val a = Seq("en", "en", "en", "de").toDF("lang")
    val b = Seq("en", "fr").toDF("lang") // fr absent from a, de from b
    val out = Drift.categoricalDrift(a, b, col("lang"))
      .orderBy("category").collect()
    assert(out.map(_.getAs[String]("category")).toSeq === Seq("de", "en", "fr"))
    val fr = out(2)
    assert(fr.getAs[Long]("n_a") === 0L && fr.getAs[Long]("n_b") === 1L)
    assert(!fr.getAs[Double]("kl_term").isNaN)
    assert(!fr.getAs[Double]("kl_term").isInfinite)
    // smoothed proportions on each side sum to ~1
    val pa = out.map(_.getAs[Double]("p_a")).sum
    val pb = out.map(_.getAs[Double]("p_b")).sum
    assert(math.abs(pa - 1.0) < 1e-4 && math.abs(pb - 1.0) < 1e-4)
  }

  test("identical distributions give zero deltas; KL total is non-negative") {
    val a = (Seq.fill(30)("en") ++ Seq.fill(10)("de")).toDF("lang")
    val same = Drift.categoricalDrift(a, a, col("lang")).collect()
    assert(same.forall(_.getAs[Double]("abs_delta") === 0.0))
    assert(same.forall(_.getAs[Double]("kl_term") === 0.0))
    val b = (Seq.fill(10)("en") ++ Seq.fill(30)("de")).toDF("lang")
    val skewed = Drift.categoricalDrift(a, b, col("lang")).collect()
    assert(skewed.map(_.getAs[Double]("kl_term")).sum > 0.0)
  }
}
