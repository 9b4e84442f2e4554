package graft

import org.apache.spark.sql.functions._

import graft.ext.{Chunking, Redaction, TextAnalysis}

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "contact bob@example.com or alice@corp.io today", "en"),
    (2L, "call 555-867-5309 from 10.0.0.1 re ssn 123-45-6789", "en"),
    (3L, "nothing sensitive here", "de"))
    .toDF("doc_id", "text", "lang")

  test("redact counts every pattern and scrubs all occurrences") {
    val r = Redaction.redact(docs, "text").orderBy("doc_id").collect()
    // doc 1: two emails, nothing else
    assert(r(0).getAs[Long]("n_email") === 2L)
    assert(r(0).getAs[Long]("n_phone") === 0L)
    assert(r(0).getAs[String]("text_redacted") ===
      "contact [REDACTED] or [REDACTED] today")
    // doc 2: phone + ip + ssn
    assert(r(1).getAs[Long]("n_phone") === 1L)
    assert(r(1).getAs[Long]("n_ipv4") === 1L)
    assert(r(1).getAs[Long]("n_ssn") === 1L)
    assert(!r(1).getAs[String]("text_redacted").exists(_.isDigit))
    // doc 3: untouched
    assert(r(2).getAs[String]("text_redacted") === "nothing sensitive here")
  }

  test("patterns apply in declared order: earlier scrubs consume later matches") {
    // the email eats its digits before the phone pattern ever sees them;
    // reversing the list would double-redact — order is part of the API
    val df = Seq((1L, "mail 555-867-5309@x.co now", "en"))
      .toDF("doc_id", "text", "lang")
    val r = Redaction.redact(df, "text").collect().head
    assert(r.getAs[Long]("n_email") === 1L)
    assert(r.getAs[String]("text_redacted") === "mail [REDACTED] now")
    // count columns are computed on the ORIGINAL text, so the phone
    // pattern still reports its (overlapping) match for auditing
    assert(r.getAs[Long]("n_phone") === 1L)
  }

  test("redactionStats aggregates touched docs and net chars removed") {
    val s = Redaction.redactionStats(docs, "text", Seq("lang"))
      .orderBy("lang").collect()
    assert(s.map(_.getAs[String]("lang")).toSeq === Seq("de", "en"))
    val en = s(1)
    assert(en.getAs[Long]("n_docs") === 2L)
    assert(en.getAs[Long]("n_docs_redacted") === 2L)
    assert(en.getAs[Long]("total_email") === 2L)
    val de = s(0)
    assert(de.getAs[Long]("n_docs_redacted") === 0L)
    assert(de.getAs[Long]("chars_removed") === 0L)
  }
}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int) =
    Chunking.chunkByTokens(Seq((1L, text)).toDF("doc_id", "text"), "text",
        Seq("doc_id"), size, stride)
      .orderBy("chunk_id")
      .select("chunk_id", "n_tokens").as[(Long, Long)].collect().toSeq

  test("chunk boundaries: empty, short, exact and overhanging docs") {
    assert(chunksOf("", 4, 2) === Seq.empty)          // no tokens -> no chunks
    assert(chunksOf("a b", 4, 2) === Seq((0L, 2L)))   // n < size -> one chunk
    assert(chunksOf("a b c d", 4, 2) === Seq((0L, 4L))) // n == size -> one
    // n=6, size=4, stride=2: chunks [0,4) [2,6) -> full coverage w/ overlap
    assert(chunksOf("a b c d e f", 4, 2) === Seq((0L, 4L), (1L, 4L)))
    // n=7: last chunk starts at 4, holds 3
    assert(chunksOf("a b c d e f g", 4, 2) ===
      Seq((0L, 4L), (1L, 4L), (2L, 3L)))
  }

  test("stride == chunkSize gives non-overlapping exact partitioning") {
    assert(chunksOf("a b c d e f g h", 4, 4) === Seq((0L, 4L), (1L, 4L)))
    assert(chunksOf("a b c d e", 4, 4) === Seq((0L, 4L), (1L, 1L)))
  }

  test("every token is covered and consecutive chunks overlap by size-stride") {
    val text = (1 to 53).map(i => s"tok$i").mkString(" ")
    val rows = Chunking.chunkByTokens(Seq((1L, text)).toDF("doc_id", "text"),
        "text", Seq("doc_id"), chunkSize = 16, stride = 12)
      .orderBy("chunk_id").collect()
    // starts at 0,12,24,36,48; last covers tokens 49-53
    assert(rows.length === 5)
    assert(rows.map(_.getAs[Long]("n_tokens")).toSeq ===
      Seq(16L, 16L, 16L, 16L, 5L))
    // full coverage: the last chunk's window reaches exactly token n
    val last = rows.last
    assert(last.getAs[Long]("chunk_id") * 12 + last.getAs[Long]("n_tokens")
      === 53L)
  }

  test("chunk hashes are content-derived: same window, same hash") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "a b c x y z"))
      .toDF("doc_id", "text")
    val h = Chunking.chunkByTokens(df, "text", Seq("doc_id"), 4, 2)
      .where(col("chunk_id") === 0)
      .select("doc_id", "chunk_hash").as[(Long, String)].collect().toMap
    assert(h(1L) === h(2L))
    assert(h(1L) !== h(3L))
  }

  test("CDC: chunks partition the token stream; short docs are one chunk") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val rows = Chunking.chunkContentDefined(
        Seq((1L, text), (2L, "a b"), (3L, "")).toDF("doc_id", "text"),
        "text", Seq("doc_id"))
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    // doc 1: chunks cover all 200 tokens, ids are 0..k contiguous
    val d1 = byDoc(1L)
    assert(d1.map(_.getAs[Long]("n_tokens")).sum === 200L)
    assert(d1.map(_.getAs[Long]("chunk_id")).toSeq ===
      (0L until d1.length).toSeq)
    assert(d1.length > 3) // divisor 16 over 200 tokens must cut somewhere
    // doc 2: below the window -> exactly one whole-doc chunk
    assert(byDoc(2L).map(r => (r.getAs[Long]("chunk_id"),
      r.getAs[Long]("n_tokens"))).toSeq === Seq((0L, 2L)))
    // doc 3: no tokens -> no chunks
    assert(!byDoc.contains(3L))
  }

  test("CDC re-synchronizes after a prefix edit; fixed-size loses all") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val pert = Seq((1L, "zz9 " + text)).toDF("doc_id", "text")
    def hashes(df: org.apache.spark.sql.DataFrame,
               cdc: Boolean): Set[String] = {
      val c = if (cdc) Chunking.chunkContentDefined(df, "text", Seq("doc_id"))
      else Chunking.chunkByTokens(df, "text", Seq("doc_id"), 16, 16)
      c.select("chunk_hash").as[String].collect().toSet
    }
    val cdcShared = hashes(docs, cdc = true)
      .intersect(hashes(pert, cdc = true)).size
    val cdcTotal = hashes(docs, cdc = true).size
    val fixShared = hashes(docs, cdc = false)
      .intersect(hashes(pert, cdc = false)).size
    // fixed-size: every window shifts by one token -> zero survivors;
    // CDC: only the pre-first-boundary chunk changes
    assert(fixShared === 0)
    assert(cdcShared === cdcTotal - 1)
  }
}

class QualityFlagsSpec extends SparkSpec {
  import spark.implicits._

  test("each rule gates independently and keep is their conjunction") {
    val docs = Seq(
      // passes everything: 25 tokens, avg len ~4.4, stopwords present
      (1L, (("the quick brown fox and lazy dog " * 4) + "in a barn").trim, "en"),
      (2L, "too short but the and is in", "en"),   // fails min_tokens only
      // 25 long tokens, no stopwords: fails avg_len + stopwords
      (3L, (1 to 25).map(_ => "extraordinarily").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val f = TextAnalysis.qualityFlags(docs).orderBy("doc_id")
      .select("pass_min_tokens", "pass_avg_len", "pass_stopwords", "keep")
      .as[(Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(f === Seq(
      (true, true, true, true),
      (false, true, true, false),
      (true, false, false, false)))
    val funnel = TextAnalysis.qualityFunnel(docs).collect().head
    assert(funnel.getAs[Long]("n_docs") === 3L)
    assert(funnel.getAs[Long]("n_keep") === 1L)
  }
}
