package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection over `documents` — the LLM-training-data dedup
  * suite (SURVEY.md §7.3.7). Exact dedup lives in
  * [[graft.operators.Cleaning]] / [[TextAnalysis.fingerprintDedup]]; this file
  * is the *near*-dup family: n-gram Jaccard (exact), MinHash+LSH banding
  * (approximate, the 100 TB path), and SimHash bucketing.
  *
  * All hashes are md5 (hex string) so results are engine-portable and
  * oracle-checkable; a production deployment would swap in xxhash64 (also a
  * Spark built-in) for speed without changing any shapes.
  *
  * Scale posture:
  *  - Jaccard is quadratic in the worst case (self-join on shingle); it is
  *    the correctness baseline. Its join key is the shingle, so co-grouping
  *    is a single shuffle and skew is bounded by shingle frequency —
  *    a real corpus caps bucket size (stop-shingle removal) exactly like
  *    the `maxBucket` guard here.
  *  - MinHash+LSH is the linear-ish path: per doc, B band signatures (one
  *    shuffle to group per band value); candidate generation never compares
  *    non-colliding docs. This is the standard shingle→minhash→band→bucket
  *    pipeline (Broder; Leskovec et al. MMDS ch.3) on DataFrame ops only.
  *  - SimHash: one projection per doc → 32-bit signature; near-dups collide
  *    on the exact signature. One groupBy. (Production: 64-bit + rotation
  *    tables for hamming<=k; the bucketing shape is identical.)
  */
object Dedup {

  /** (doc_id, shingle) rows: distinct k-gram word shingles per document.
    * Explode fan-out is ~tokens/doc; distinct-per-doc keeps the join
    * fan-in bounded. */
  def shingleRows(docs: DataFrame, k: Int): DataFrame = {
    val w = TextAnalysis.tokens(col("text"))
    // NB: docs with < k tokens are filtered BEFORE the sequence() — Spark's
    // sequence(1, n) turns *descending* for n < 1 rather than empty.
    docs.select(col("doc_id"), w.as("w"))
      .where(size(col("w")) >= k)
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("w")) - (k - 1)),
          i => array_join(slice(col("w"), i, lit(k)), " "))).as("shingles"))
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
  }

  /** Exact n-gram Jaccard near-dup pairs: |A∩B| / |A∪B| >= threshold.
    * `maxBucket` drops stop-shingles (shared by too many docs) before the
    * self-join — the standard skew guard that keeps this from going
    * quadratic on boilerplate text. */
  def jaccardPairs(docs: DataFrame, k: Int, threshold: Double,
                   maxBucket: Int = 1000): DataFrame = {
    val sh = shingleRows(docs, k)
    val pruned = sh.withColumn("__freq",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shingle"))))
      .where(col("__freq") <= maxBucket).drop("__freq")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val a = pruned.as("a")
    val b = pruned.as("b")
    val common = a.join(b, col("a.shingle") === col("b.shingle")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "n_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_shingles", "n_b"), Seq("doc_b"))
      .withColumn("jaccard", round(col("n_common").cast("double")
        / (col("n_a") + col("n_b") - col("n_common")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash signatures, one row per (doc, band): the band's signature is
    * min(md5(band || '|' || shingle)) over the doc's shingles — md5 keyed by
    * band index plays the role of B independent hash functions. */
  def minhashBands(docs: DataFrame, k: Int, bands: Int): DataFrame =
    shingleRows(docs, k)
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .groupBy(col("doc_id"), col("band"))
      .agg(min(md5(concat(col("band").cast("string"), lit("|"), col("shingle"))))
        .as("sig"))

  /** LSH candidate pairs: docs colliding on >= `minBands` band signatures.
    * Only colliding docs are ever paired — the linear-ish 100 TB path. */
  def minhashPairs(docs: DataFrame, k: Int, bands: Int,
                   minBands: Int = 1): DataFrame = {
    val sig = minhashBands(docs, k, bands)
    val a = sig.as("a")
    val b = sig.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .where(col("n_shared_bands") >= minBands)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 32-bit SimHash over the document's distinct tokens, computed from the
    * first 8 hex digits of md5(token): bit j of the signature is 1 iff the
    * sum over tokens of (bit j present ? +1 : -1) is positive. Pure
    * projection (higher-order lambdas, no UDF, no shuffle). All bit ops are
    * expressed as pow/floor/mod arithmetic (exact in doubles below 2^53) so
    * the identical formula runs on any ANSI SQL engine for the oracle check.
    */
  def withSimhash(docs: DataFrame): DataFrame = {
    val toks = array_distinct(TextAnalysis.tokens(col("text")))
    // hex digit char -> value: '0'..'9' = 48..57, 'a'..'f' = 97..102.
    val hexVal = (c: org.apache.spark.sql.Column) =>
      when(ascii(c) <= 57, ascii(c) - 48).otherwise(ascii(c) - 87)
    // per token: 32-bit int from the first 8 md5 hex digits.
    val tokenHash = (t: org.apache.spark.sql.Column) =>
      aggregate(
        transform(sequence(lit(1), lit(8)),
          i => hexVal(substring(md5(t), 1, 8).substr(i, lit(1))).cast("long")
            * pow(lit(16.0), (lit(8) - i).cast("double")).cast("long")),
        lit(0L), (acc, x) => acc + x)
    // bit j of h  =  floor(h / 2^j) % 2   (h >= 0 < 2^32).
    docs.withColumn("__hashes", transform(toks, t => tokenHash(t)))
      .withColumn("simhash",
        aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, j) =>
          acc + when(
            aggregate(col("__hashes"), lit(0L),
              (s, h) => s + when(
                floor(h.cast("double") / pow(lit(2.0), j.cast("double")))
                  .cast("long") % 2 === 1, 1L).otherwise(-1L)) > 0,
            pow(lit(2.0), j.cast("double")).cast("long")).otherwise(0L)))
      .drop("__hashes")
  }

  /** SimHash near-dup pairs: exact 32-bit signature collision. */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val sig = withSimhash(docs).select(col("doc_id"), col("simhash"))
    val a = sig.as("a")
    val b = sig.as("b")
    a.join(b, col("a.simhash") === col("b.simhash")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("simhash"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
