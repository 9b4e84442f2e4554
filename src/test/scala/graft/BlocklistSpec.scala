package graft

import graft.ext.Blocklist

/** Phrase-blocklist screening (ext/Blocklist): consecutive-token match
  * semantics, boundary handling, overlap counting, zero-hit totality. */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def report(docs: Seq[(Long, String)],
                     phrases: Seq[(Long, String)]) =
    Blocklist.screenReport(docs.toDF("doc_id", "text"),
        phrases.toDF("phrase_id", "phrase"))
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap

  test("consecutive tokens only; punctuation/case fold through the " +
    "tokenizer") {
    val m = report(
      Seq((0L, "Bad, PHRASE here"), (1L, "bad thing phrase"),
        (2L, "phrase bad")),
      Seq((0L, "bad phrase")))
    // doc 0 matches (tokenizer strips the comma, folds case); doc 1 has
    // both words but not adjacent; doc 2 has them reversed
    assert(m(0L) === ((1L, 1L)))
  }

  test("token boundary: 'cat' must not match inside 'catalog'") {
    val m = report(
      Seq((0L, "the catalog page"), (1L, "the cat sat")),
      Seq((0L, "the cat")))
    assert(m(0L) === ((1L, 1L)))
  }

  test("overlapping occurrences each count; doc counted once") {
    val m = report(Seq((0L, "a a a a")), Seq((0L, "a a")))
    assert(m(0L) === ((1L, 3L)))
  }

  test("phrase at end of doc matches; longer-than-doc phrase cannot") {
    val m = report(
      Seq((0L, "ends with bad phrase"), (1L, "bad")),
      Seq((0L, "bad phrase"), (1L, "bad phrase extra")))
    assert(m(0L) === ((1L, 1L)))
    assert(m(1L) === ((0L, 0L)))
  }

  test("zero-hit and multi-phrase blocklists report totally") {
    val m = report(
      Seq((0L, "x y z"), (1L, "y z w")),
      Seq((0L, "y z"), (1L, "never here"), (2L, "x y z")))
    assert(m === Map(0L -> ((2L, 2L)), 1L -> ((0L, 0L)),
      2L -> ((1L, 1L))))
  }
}
