package graft

import graft.ext.Triangles

/** Triangle counting via degree orientation (ext/Triangles). */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) =
    Triangles.triangleStats(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Double)].collect().head

  test("triangle plus pendant: hand-computed wedges and clustering") {
    // 1-2-3 triangle, 4 hangs off 3: deg = (2,2,3,1), wedges = 1+1+3 = 5
    val r = stats(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(r === ((4L, 4L, 5L, 1L, 0.6)))
  }

  test("complete K4: 4 triangles, clustering exactly 1") {
    val r = stats(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
    assert(r === ((4L, 6L, 12L, 4L, 1.0)))
  }

  test("star has wedges but no triangles; clustering 0") {
    val r = stats(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    assert(r === ((5L, 4L, 6L, 0L, 0.0)))
  }

  test("duplicate, reversed, and self-loop edges normalize away") {
    val r = stats(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L)))
    assert(r === ((3L, 3L, 3L, 1L, 1.0)))
  }

  test("single edge: no wedge, clustering reported 0 (not null/NaN)") {
    val r = stats(Seq((7L, 9L)))
    assert(r === ((2L, 1L, 0L, 0L, 0.0)))
  }

  test("local clustering: per-node credit and the deg<2 guard") {
    // 1-2-3 triangle with pendant 4 on 3: nodes 1,2 close their only
    // wedge (1.0); node 3 closes 1 of C(3,2)=3 (0.333333); node 4 deg 1
    val m = Triangles.localClustering(
        Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m(1L) === ((2L, 1L, 1.0)))
    assert(m(2L) === ((2L, 1L, 1.0)))
    assert(m(3L) === ((3L, 1L, 0.333333)))
    assert(m(4L) === ((1L, 0L, 0.0)))
  }

  test("local clustering on the star: center 0, leaves deg<2 guard") {
    val m = Triangles.localClustering(
        Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(m === Map(1L -> 0.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0))
  }
}
