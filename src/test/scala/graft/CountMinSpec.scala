package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMinFunctions._

/** Count-Min sketch guarantees, checked deterministically (seeded
  * hashes, fixed data): one-sided error, the εN bound, mergeability. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // 10k tokens: token_i occurs (i+1)× for i in 0..139 → N = 9870
  private lazy val tokens = (0 until 140)
    .flatMap(i => Seq.fill(i + 1)(s"tok_$i")).toDF("t")
  private lazy val truth = (0 until 140).map(i => s"tok_$i" -> (i + 1L)).toMap
  private lazy val n = truth.values.sum

  test("estimates are never below the true count and within eps*N above") {
    val sk = tokens.agg(cmsSketch($"t", depth = 5, width = 2048).as("sk"))
    val probes = truth.keys.toSeq.toDF("t")
    val est = probes.crossJoin(broadcast(sk))
      .select($"t", cmsEstimate($"sk", $"t", depth = 5, width = 2048)
        .as("est"))
      .as[(String, Long)].collect().toMap
    est.foreach { case (t, e) =>
      assert(e >= truth(t), s"$t: CMS must never under-count: $e < ${truth(t)}")
      // ε = e/width ≈ 0.13% → εN ≈ 13; allow 3× slack for the tiny width
      assert(e - truth(t) <= 3 * math.E * n / 2048,
        s"$t: over-count ${e - truth(t)} beyond the CMS bound")
    }
    // an unseen key estimates (near) zero
    val ghost = Seq("never_seen_token").toDF("t")
      .crossJoin(broadcast(sk))
      .select(cmsEstimate($"sk", $"t", depth = 5, width = 2048))
      .as[Long].head()
    assert(ghost <= 3 * math.E * n / 2048)
  }

  test("sketch is mergeable: partitioning never changes it") {
    val a = tokens.coalesce(1)
      .agg(cmsSketch($"t").as("sk")).as[Seq[Long]].head()
    val b = tokens.repartition(11)
      .agg(cmsSketch($"t").as("sk")).as[Seq[Long]].head()
    assert(a === b)
  }
}
