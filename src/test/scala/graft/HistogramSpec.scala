package graft

import graft.operators.Histogram

/** Equi-depth histogram (operators/Histogram) — rank-arithmetic buckets,
  * exact order-statistic boundaries. */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("even split: k buckets of exactly n/k rows, tight boundaries") {
    val df = (1 to 10).map(i => (i * 10.0, i.toLong)).toDF("v", "id")
    val r = Histogram.equiDepth(df, "v", "id", k = 5)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(r === Seq((0L, 2L, 10.0, 20.0), (1L, 2L, 30.0, 40.0),
      (2L, 2L, 50.0, 60.0), (3L, 2L, 70.0, 80.0), (4L, 2L, 90.0, 100.0)))
  }

  test("n not divisible by k: floor-rank sizes 3/2/2, no gaps") {
    val df = (1 to 7).map(i => (i.toDouble, i.toLong)).toDF("v", "id")
    val r = Histogram.equiDepth(df, "v", "id", k = 3)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(r.map(x => (x._1, x._2)) === Seq((0L, 3L), (1L, 2L), (2L, 2L)))
    // boundaries partition the sorted order: each lo follows the prior hi
    assert(r.map(_._3) === Seq(1.0, 4.0, 6.0))
    assert(r.map(_._4) === Seq(3.0, 5.0, 7.0))
  }

  test("heavy ties: the tie column keeps bucket sizes exact") {
    val df = Seq.fill(9)(42.0).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val r = Histogram.equiDepth(df, "v", "id", k = 3)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(r.map(x => (x._1, x._2)) === Seq((0L, 3L), (1L, 3L), (2L, 3L)))
  }
}
