package graft

import org.apache.spark.sql.functions._

import graft.ext.Retrieval

/** BM25 retrieval (ext/Retrieval): hand-computed closed form on a tiny
  * corpus, OOV/edge semantics, tie-break determinism, and the
  * inverted-index plan shape (broadcast query-term probe). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // corpus: 4 docs with known token stats
  //   d0 "a b a"     dl=3   d1 "b c"   dl=2
  //   d2 "a c c d"   dl=4   d3 "d"     dl=1
  // N=4, avgdl=2.5; df: a=2, b=2, c=2, d=2
  private def docs = Seq(
    (0L, "a b a"), (1L, "b c"), (2L, "a c c d"), (3L, "d"))
    .toDF("doc_id", "text")

  private def queries = Seq((0L, "a c"), (1L, "zz")).toDF("query_id", "query_text")

  private val k1 = 1.2
  private val b = 0.75

  private def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  private def w(tf: Long, dl: Long, avgdl: Double): Double =
    tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))

  test("bm25Scores matches the hand-computed closed form") {
    val got = Retrieval.bm25Scores(docs, queries)
      .orderBy("query_id", "doc_id")
      .as[(Long, Long, Long, Double)].collect()
    val i = idf(4, 2)
    val exp = Seq(
      // q0 "a c": d0 matches a(tf=2), d1 matches c(1), d2 matches a(1)+c(2)
      (0L, 0L, 1L, i * w(2, 3, 2.5)),
      (0L, 1L, 1L, i * w(1, 2, 2.5)),
      (0L, 2L, 2L, i * w(1, 4, 2.5) + i * w(2, 4, 2.5)))
    assert(got.length === exp.length) // q1 "zz" matches nothing — zero rows
    got.zip(exp).foreach { case ((qg, dg, ng, sg), (qe, de, ne, se)) =>
      assert((qg, dg, ng) === (qe, de, ne))
      assert(math.abs(sg - BigDecimal(se).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("longer documents score below shorter ones at equal tf (dl penalty)") {
    val d = Seq((0L, "x y"), (1L, "x y z w v u t s")).toDF("doc_id", "text")
    val q = Seq((0L, "x")).toDF("query_id", "query_text")
    val rows = Retrieval.bm25Scores(d, q).orderBy("doc_id")
      .select("score").as[Double].collect()
    assert(rows.length === 2 && rows(0) > rows(1))
  }

  test("bm25TopK ranks by score desc with doc_id tie-break and respects k") {
    // two identical docs -> identical scores; tie must break by doc_id asc
    val d = Seq((5L, "a b"), (3L, "a b"), (7L, "a")).toDF("doc_id", "text")
    val q = Seq((0L, "a")).toDF("query_id", "query_text")
    val top = Retrieval.bm25TopK(d, q, k = 2)
      .orderBy("rank").select("rank", "doc_id").as[(Long, Long)].collect()
    // d7 ("a", dl=1) outranks the dl=2 docs; then doc 3 before doc 5
    assert(top.toSeq === Seq((1L, 7L), (2L, 3L)))
  }

  test("corpus stats: exact integers and avgdl") {
    val r = Retrieval.bm25CorpusStats(docs).collect().head
    assert(r.getLong(0) === 4L)        // n_docs
    assert(r.getLong(1) === 10L)       // total tokens
    assert(r.getDouble(2) === 2.5)     // avgdl
    assert(r.getLong(3) === 4L)        // vocab a,b,c,d
    assert(r.getLong(4) === 8L)        // postings (distinct doc,token pairs)
  }

  test("plan shape: query-term probe broadcasts; corpus side never " +
    "broadcast") {
    val plan = Retrieval.bm25Scores(docs, queries).queryExecution
      .executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // the corpus-sized tf frame must not appear as a broadcast build side
    // for the doc-length join — that join is doc-keyed on aggregated rows
    assert(!plan.contains("CartesianProduct"))
  }

  test("hashedDenseTopK: exact integer dots, tie-break by doc_id, k cap") {
    // d0 repeats the query text twice -> every query-bucket weight
    // doubles -> dot = 2·|q|²; d5 is the query verbatim -> dot = |q|²;
    // d9 and d7 are identical -> identical dots, doc_id breaks the tie
    val d = Seq((0L, "a b a b"), (5L, "a b"), (9L, "a"), (7L, "a"))
      .toDF("doc_id", "text")
    val q = Seq((0L, "a b")).toDF("query_id", "query_text")
    val top = Retrieval.hashedDenseTopK(d, q, k = 3)
      .orderBy("rank").select("rank", "doc_id", "dot")
      .as[(Long, Long, Long)].collect()
    assert(top.length === 3) // k caps the 4 candidates
    assert(top(0)._2 === 0L && top(0)._3 === 4L)
    assert(top(1)._2 === 5L && top(1)._3 === 2L)
    assert(top(2)._2 === 7L) // tie with d9 at dot 1 -> lower id first
  }

  test("rrfFuse: both-list docs outrank single-list docs; absent rank " +
    "surfaces as 0") {
    val lex = Seq((0L, 1L, 10L), (0L, 2L, 11L))
      .toDF("query_id", "rank", "doc_id")
    val dense = Seq((0L, 1L, 10L), (0L, 2L, 12L))
      .toDF("query_id", "rank", "doc_id")
    val f = Retrieval.rrfFuse(lex, dense)
      .select("fused_rank", "doc_id", "lex_rank", "dense_rank", "rrf_score")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // doc 10: rank 1 in both = 2/61; docs 11/12: 1/62 each, id tie-break
    assert(f.map(r => (r._1, r._2)).toSeq ===
      Seq((1L, 10L), (2L, 11L), (3L, 12L)))
    assert(f(0)._5 === BigDecimal(2.0 / 61.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(f(1)._3 === 2L && f(1)._4 === 0L) // doc 11: lex-only
    assert(f(2)._3 === 0L && f(2)._4 === 2L) // doc 12: dense-only
  }

  test("hybridRrfTopDocs (shared postings frame) equals the two-tokenize " +
    "composition row for row") {
    // multi-token docs with repeats so tf > 1 exercises the
    // ±1-per-occurrence ≡ ±tf-per-distinct-token equivalence of
    // hashedFeaturesFromTf, and enough docs that both legs rank
    val d = Seq((0L, "a b a b c"), (1L, "b c"), (2L, "a c c d"),
      (3L, "d d d a"), (4L, "e f a"), (5L, "a b"))
      .toDF("doc_id", "text")
    val q = Seq((0L, "a c"), (1L, "b d"), (2L, "zz")).toDF("query_id", "query_text")
    val fused = Retrieval.hybridRrfTopDocs(d, q, k = 3)
      .orderBy("query_id", "fused_rank").collect().toSeq
    val composed = Retrieval.rrfFuse(
        Retrieval.bm25TopK(d, q, k = 3),
        Retrieval.hashedDenseTopK(d, q, k = 3))
      .orderBy("query_id", "fused_rank").collect().toSeq
    assert(fused === composed)
  }
}
