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

  /** (doc_id, shingles: array<string>) — distinct k-gram shingles per doc as
    * ONE projection, so multiple consumers (explode, sizes) branch off a
    * single tokenization instead of re-running the regexp per branch. */
  def docShingles(docs: DataFrame, k: Int): DataFrame = {
    val w = TextAnalysis.tokens(col("text"))
    // The shingle transform fans out ~tokens× work per row; a small input
    // (one parquet file => one partition) would otherwise run it on a single
    // core. Rebalance to the cluster's parallelism first — at corpus scale
    // the scan is already many-partitioned and this shuffle is one tiny
    // extra exchange of raw text.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // NB: the < k-token case must be handled INSIDE the expression (empty
    // array), not only by a preceding filter — Spark's sequence(1, n) turns
    // *descending* for n < 1 rather than empty, and the optimizer may
    // evaluate the projection on rows the filter would drop.
    // No size()>0 filter here: a filter on the computed column would make
    // Catalyst evaluate the whole shingle transform a second time (once for
    // the predicate, once for the projection); downstream explode() already
    // drops empty arrays for free.
    docs.repartition(par).select(col("doc_id"), w.as("w"))
      .select(col("doc_id"),
        when(size(col("w")) >= k, array_distinct(
          transform(sequence(lit(1), size(col("w")) - (k - 1)),
            i => array_join(slice(col("w"), i, lit(k)), " "))))
          .otherwise(array().cast("array<string>")).as("shingles"))
  }

  // explode_outer + isNotNull instead of explode: InferFiltersFromGenerate
  // would add size(shingles)>0 under an inner explode and predicate
  // pushdown then INLINES the whole tokenize->shingle expression into a
  // Filter below the repartition (recomputed, single-partition). The outer
  // variant is exempt; the null filter runs on the generated output.
  def shingleRows(docs: DataFrame, k: Int): DataFrame =
    docShingles(docs, k)
      .select(col("doc_id"), explode_outer(col("shingles")).as("shingle"))
      .where(col("shingle").isNotNull)

  /** Exact n-gram Jaccard near-dup pairs: |A∩B| / |A∪B| >= threshold.
    * `maxBucket` drops stop-shingles (shared by too many docs) before the
    * self-join — the standard skew guard that keeps this from going
    * quadratic on boilerplate text. */
  def jaccardPairs(docs: DataFrame, k: Int, threshold: Double,
                   maxBucket: Int = 1000): DataFrame = {
    val ds = docShingles(docs, k)
    val sh = ds.select(col("doc_id"), explode_outer(col("shingles")).as("shingle"))
      .where(col("shingle").isNotNull) // outer: see shingleRows
    // Bucket-collect instead of self-join: ONE shuffle groups the doc ids
    // sharing each shingle; pairs are generated inside the bucket. A
    // self-join on shingle recomputes the whole tokenize->shingle->explode
    // pipeline on both sides (Spark does not reuse the exchange across the
    // aliased branches) and shuffles the corpus twice. collect_set spills
    // via ObjectHashAggregate; the maxBucket cap drops boilerplate
    // stop-shingles. (At extreme skew, pre-filter hot shingles with a
    // count-only pass before collecting — same shapes, one more shuffle.)
    val buckets = sh.groupBy(col("shingle"))
      .agg(sort_array(collect_set(col("doc_id"))).as("d"),
        count(lit(1)).as("c"))
      .where(col("c") >= 2 && col("c") <= maxBucket)
    val pairs = buckets.select(explode_outer(
        flatten(transform(col("d"), (x, i) =>
          transform(slice(col("d"), i + 2, size(col("d"))),
            y => struct(x.as("_1"), y.as("_2"))))))
        .as("p"))
      .where(col("p").isNotNull) // outer: see shingleRows
    // Per-doc set sizes are a PROJECTION off the shingle arrays (no explode,
    // no groupBy). One row per doc: small enough that AQE broadcasts it at
    // test scale, correctly shuffle-joins on doc_id at corpus scale.
    val sizes =
      ds.select(col("doc_id"), size(col("shingles")).cast("long").as("n_shingles"))
    val common = pairs
      .groupBy(col("p._1").as("doc_a"), col("p._2").as("doc_b"))
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
    * band index plays the role of B independent hash functions.
    *
    * Perf shape: ONE md5 per (band, shingle) pair would be bands×|shingles|
    * hash evaluations; instead we hash each shingle once and derive the B
    * band hashes by Kirsch-Mitzenmacher double hashing (h1 + b·h2 mod 2^32,
    * h1/h2 = two 32-bit halves of one md5) — a standard Bloom/MinHash
    * construction. The per-band mins are B parallel `min` aggregates in one
    * partial-aggregated groupBy (map-side combine, one shuffle on doc_id),
    * then unpivoted to (doc, band, sig) rows for the LSH bucket join. */
  def minhashBands(docs: DataFrame, k: Int, bands: Int): DataFrame = {
    val hashed = shingleRows(docs, k)
      .withColumn("h1", conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(md5(col("shingle")), 9, 8), 16, 10).cast("long"))
    val M = 4294967296L // 2^32
    val sigCols = (0 until bands).map(b =>
      min((col("h1") + lit(b.toLong) * col("h2")) % M).as(s"sig_$b"))
    val wide = hashed.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val stackExpr = (0 until bands).map(b => s"${b}L, sig_$b").mkString(", ")
    wide.selectExpr("doc_id", s"stack($bands, $stackExpr) AS (band, sig)")
  }

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

  /** 32-bit SimHash over the document's distinct tokens: token hash = first
    * 8 hex digits of md5(token) as a 32-bit int; bit j of the signature is 1
    * iff the sum over tokens of (bit j present ? +1 : -1) is positive.
    *
    * Perf shape: explode(distinct tokens) → one md5 + conv per token → 32
    * static-shift bit votes as parallel `sum` aggregates in ONE
    * partial-aggregated groupBy. Everything stays in WholeStageCodegen with
    * map-side combine; the earlier nested-lambda formulation (aggregate
    * inside aggregate over 32 bits × tokens) evaluated interpreted and was
    * ~50× slower at sf0.1. Semantics unchanged (same md5-derived hash, same
    * votes; token-less docs get signature 0 via the left join). */
  def withSimhash(docs: DataFrame): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val toks = docs.repartition(par).select(col("doc_id"),
        explode_outer(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))
      .where(col("tok").isNotNull) // outer: see shingleRows re InferFiltersFromGenerate
    val hashed = toks.withColumn("h",
      conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val bitVotes = (0 until 32).map(j =>
      sum(when(shiftright(col("h"), j) % 2 === 1, 1L).otherwise(-1L)).as(s"v$j"))
    val votes = hashed.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until 32).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    docs.join(votes.select(col("doc_id"), sig.as("simhash")), Seq("doc_id"), "left")
      .withColumn("simhash", coalesce(col("simhash"), lit(0L)))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken '03 — the MOSS
    * algorithm): positional k-gram hashes → minimum of each w-hash sliding
    * window → the distinct selected values are the document's fingerprint
    * set. Guarantee: any shared token run of length >= w+k-1 contributes at
    * least one shared fingerprint, while only ~2/(w+1) of all k-gram hashes
    * are kept — rolling-hash dedup with a provable detection floor at a
    * fraction of the index size.
    *
    * Unlike [[docShingles]] the k-gram hashes here are POSITIONAL (no
    * array_distinct before windowing — winnowing's guarantee depends on
    * hash order); selection dedups afterwards. One projection per doc, no
    * explode until the (doc, fingerprint) rows. */
  def winnowingFingerprints(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val toks = docs.repartition(par)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
    val hashed = toks.select(col("doc_id"),
      when(size(col("w")) >= k,
        transform(sequence(lit(1), size(col("w")) - (k - 1)),
          i => conv(substring(md5(array_join(slice(col("w"), i, lit(k)), " ")),
            1, 8), 16, 10).cast("long")))
        .otherwise(array().cast("array<long>")).as("hs"))
    // Window min as least(hs[j], ..., hs[j+w-1]) — element_at chains, no
    // per-position slice allocation (array_min(slice(...)) materializes a
    // w-array per window; least() is a flat codegen'd comparison tree).
    // try_element_at (NOT element_at: ANSI mode is on, out-of-bounds would
    // throw) yields null past the end and least() ignores nulls, so the
    // short-doc window (fewer than w hashes) falls out for free.
    def windowMin(hs: org.apache.spark.sql.Column,
                  j: org.apache.spark.sql.Column) =
      (0 until w).map(o => try_element_at(hs, j + o))
        .reduce((a, b) => least(a, b))
    hashed.select(col("doc_id"),
        explode_outer(when(size(col("hs")) === 0, array().cast("array<long>"))
          .otherwise(array_distinct(transform(
            sequence(lit(1), greatest(size(col("hs")) - (w - 1), lit(1))),
            j => windowMin(col("hs"), j)))))
          .as("fp"))
      .where(col("fp").isNotNull) // outer: see shingleRows
  }

  /** Near-dup pairs by shared winnowing fingerprints (>= `minShared`).
    * Same bucket-collect shape as [[jaccardPairs]] — one shuffle groups
    * doc ids per fingerprint, pairs generate inside the bucket. */
  def winnowingPairs(docs: DataFrame, k: Int = 5, w: Int = 4,
                     minShared: Long = 10, maxBucket: Int = 1000): DataFrame = {
    val fp = winnowingFingerprints(docs, k, w)
    val buckets = fp.groupBy(col("fp"))
      .agg(sort_array(collect_set(col("doc_id"))).as("d"), count(lit(1)).as("c"))
      .where(col("c") >= 2 && col("c") <= maxBucket)
    val pairs = buckets.select(explode_outer(
        flatten(transform(col("d"), (x, i) =>
          transform(slice(col("d"), i + 2, size(col("d"))),
            y => struct(x.as("_1"), y.as("_2"))))))
        .as("p"))
      .where(col("p").isNotNull)
    pairs.groupBy(col("p._1").as("doc_a"), col("p._2").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_fp"))
      .where(col("n_shared_fp") >= minShared)
      .orderBy(col("doc_a"), col("doc_b"))
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
