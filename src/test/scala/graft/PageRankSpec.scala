package graft

import org.apache.spark.sql.functions._

import graft.ext.PageRank

/** Integer PageRank on graphs small enough to iterate by hand. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two hand-computed iterations on the 3-star") {
    // 1↔2, 1↔3: deg(1)=2, deg(2)=deg(3)=1, unit=1e6, damping 85%
    val star = Seq(1L -> 2L, 2L -> 1L, 1L -> 3L, 3L -> 1L)
    // iter1: r(1) = 150000 + 85%·(1e6 + 1e6)      = 1850000
    //        r(2) = r(3) = 150000 + 85%·(1e6 div 2) = 575000
    assert(ranksOf(star, 1) ===
      Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
    // iter2: r(1) = 150000 + 85%·(575000 + 575000)  = 1127500
    //        r(2) = r(3) = 150000 + 85%·(1850000 div 2) = 936250
    assert(ranksOf(star, 2) ===
      Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L))
  }

  test("zero iterations = uniform unit; every rank >= the base term") {
    val star = Seq(1L -> 2L, 2L -> 1L, 1L -> 3L, 3L -> 1L)
    assert(ranksOf(star, 0).values.toSet === Set(1000000L))
    val r = ranksOf(star, 7)
    assert(r.values.forall(_ >= 150000L))
    // truncating division only LOSES mass: total never exceeds n·unit
    assert(r.values.sum <= 3L * 1000000L)
  }

  test("dangling node sheds mass on a directed edge") {
    // 1 → 2 only: node 1 receives nothing (base), node 2 gets 1's share
    assert(ranksOf(Seq(1L -> 2L), 1) ===
      Map(1L -> 150000L, 2L -> 1000000L))
    // next round node 2 has no out-edge: its mass vanishes, 1 stays base
    assert(ranksOf(Seq(1L -> 2L), 2) ===
      Map(1L -> 150000L, 2L -> 277500L)) // 150000 + 85%·150000
  }

  test("layout-independent: repartitioned edges give identical ranks") {
    val edges = (1L to 40L).flatMap(i =>
      Seq(i -> (i % 7 + 1), (i % 7 + 1) -> i))
    val a = ranksOf(edges, 4)
    val b = PageRank.pageRank(
        edges.toDF("src", "dst").repartition(13), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("contained lifetime: no persisted frame survives pageRank()") {
    // VERDICT r16 #4: the working sets (degree-annotated edges, the
    // dangling split and its constant share frame) must be unpersisted
    // before return — a surviving cache holds executor memory hostage
    // and silently feeds later invocations through CacheManager
    // plan-identity, which made the round-16 bench understate the
    // query's honest cost.
    spark.sharedState.cacheManager.clearCache()
    val edges = Seq(1L -> 2L, 2L -> 1L, 1L -> 3L, 3L -> 4L)
    val r = PageRank.pageRank(edges.toDF("src", "dst"), 3)
    assert(r.count() === 4)
    assert(spark.sharedState.cacheManager.isEmpty,
      "pageRank leaked persisted working sets into the session cache")
    // the zero-iterations early return must be contained too
    val r0 = PageRank.pageRank(edges.toDF("src", "dst"), 0)
    assert(r0.count() === 4)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("declared-symmetric path gives identical ranks on a symmetrized " +
      "graph (and stays contained)") {
    // the registered query's case: edges = e ∪ e.swap by construction —
    // symmetric = true must skip the dangling machinery without
    // changing a single rank
    spark.sharedState.cacheManager.clearCache()
    val half = (1L to 30L).map(i => i -> (i % 11 + 1))
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val a = PageRank.pageRank(edges, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.pageRank(edges, 4, symmetric = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
