package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis}

/** Pins the SimhashVotes aggregate to the 64-column sum(when(...))
  * formulation it replaced: identical signatures on real docs and on the
  * degenerate empty-doc row. */
class SimhashSpec extends SparkSpec {
  import spark.implicits._

  /** The original 64-aggregate-expression formulation, kept here as the
    * reference implementation. */
  private def referenceSignatures(docs: org.apache.spark.sql.DataFrame) = {
    val toks = docs.select(col("doc_id"),
      explode_outer(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))
    val hashed = toks
      .withColumn("hLo", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
      .withColumn("hHi", conv(substring(md5(col("tok")), 9, 8), 16, 10).cast("long"))
    val bitVotes = (0 until 64).map { j =>
      val (h, s) = if (j < 32) (col("hLo"), j) else (col("hHi"), j - 32)
      sum(when(shiftright(h, s) % 2 === 1, 1L).otherwise(-1L)).as(s"v$j")
    }
    val votes = hashed.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until 64).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    votes.select(col("doc_id"), sig.as("simhash"))
  }

  test("aggregate signatures equal the 64-column reference formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = Dedup.simhashSignatures(docs)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val ref = referenceSignatures(docs)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(fast.nonEmpty && fast === ref)
  }

  test("empty and single-token docs keep the reference semantics") {
    val docs = Seq(
      (1L, ""),               // no tokens: all votes -1 → signature 0
      (2L, "hello"),          // single token: signature = its hash bits
      (3L, "hello hello"),    // dedup'd tokens: same as single
      (4L, "a b c d e")).toDF("doc_id", "text")
    val fast = Dedup.simhashSignatures(docs)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val ref = referenceSignatures(docs)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(fast === ref)
    assert(fast.find(_._1 == 1L).get._2 === 0L)
    assert(fast.find(_._1 == 2L).get._2 === fast.find(_._1 == 3L).get._2)
  }

  test("simhash votes are mergeable: result independent of partitioning") {
    val docs = (0L until 50L)
      .map(i => (i % 5, s"tok${i} alpha beta gamma tok${i % 7}"))
      .toDF("doc_id", "text")
    val one = Dedup.simhashSignatures(docs.coalesce(1))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val many = Dedup.simhashSignatures(docs.repartition(7))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(one === many)
  }
}
