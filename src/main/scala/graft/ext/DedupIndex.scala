package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** The near-dup index as a MAINTAINED ASSET: at 100 TB the corpus's
  * dedup signatures (content fingerprints, minhash band signatures) are
  * not recomputed per ingest — they persist as a
  * [[graft.sources.VersionedTable]], each daily batch is matched
  * against the index READ (signature-sized, never corpus-text-sized),
  * and the batch's own signatures append as the next index version.
  * The corpus text is scanned exactly once ever (at index build); every
  * later ingest touches only signatures.
  *
  * Two index families, matching the two dedup regimes:
  *  - [[fingerprintIndex]]: the distinct canonical-content md5 set —
  *    exact dedup ([[TextAnalysis.fingerprint]] semantics, so reports
  *    computed against the index are bit-identical to the
  *    recompute-the-corpus path in
  *    [[TextAnalysis.incrementalDedupReport]]).
  *  - [[minhashIndex]]: per-doc LSH band signatures
  *    ([[Dedup.minhashBands]]) — near-dup candidate generation by band
  *    bucket collision, batch-vs-index, never all-pairs.
  */
object DedupIndex {

  /** Exact-content index: the corpus's distinct fingerprint set (column
    * `fp`). 32-byte keys — the 100 TB corpus reduces to a
    * fingerprint-cardinality table, persisted bucketed on `fp`. */
  def fingerprintIndex(corpus: DataFrame): DataFrame =
    corpus.select(TextAnalysis.fingerprint(col("text")).as("fp")).distinct()

  /** Near-dup index: (doc_id, band, sig) minhash band signatures. */
  def minhashIndex(corpus: DataFrame, k: Int, bands: Int): DataFrame =
    Dedup.minhashBands(corpus, k, bands)

  /** Read the latest committed index version, or build it from the
    * corpus and commit v1 if the table is empty — the only path that
    * ever scans corpus text, paid once per corpus. */
  def readOrBuild(spark: SparkSession, root: String,
                  build: => DataFrame): DataFrame = {
    // In-JVM: same-root builders serialize (first builds, rest read) —
    // a shared session's concurrent queries otherwise race the
    // check-then-commit and the loser throws instead of reading the
    // winner. Cross-process: the commit's create-no-overwrite manifest
    // stays the arbiter — a lost race here means another PROCESS
    // committed first, so fall through to reading its version.
    graft.sources.KeyedLocks.withLock(root) {
      if (VersionedTable.versions(spark, root).isEmpty)
        try VersionedTable.commit(build, root)
        catch {
          case e: IllegalStateException =>
            if (VersionedTable.versions(spark, root).isEmpty) throw e
        }
    }
    VersionedTable.read(spark, root)
  }

  /** [[TextAnalysis.incrementalDedupReport]] with the corpus leg
    * replaced by the PERSISTED fingerprint index: same per-group
    * (n_batch, n_new) report, same oracle, but the only corpus-sized
    * input is the 32-byte-key index read — corpus text is not
    * rescanned (IncrementalIndexSpec pins the plan). */
  def incrementalNewDocs(index: DataFrame, batch: DataFrame,
                         groupCols: Seq[String]): DataFrame = {
    val seen = index.select(col("fp")).distinct()
      .withColumn("__seen", lit(1))
    batch.withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .join(seen, Seq("fp"), "left")
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_batch"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_new"))
      .orderBy(groupCols.map(col): _*)
  }

  /** Ingest one batch into a fingerprint index: append the batch's
    * not-yet-indexed fingerprints as the next version (so re-ingesting
    * the same batch reports 0 new — the index absorbs each batch
    * exactly once). Returns the committed version. */
  def ingestFingerprints(root: String, batch: DataFrame): Long = {
    val spark = batch.sparkSession
    val index = VersionedTable.read(spark, root)
    val fresh = batch
      .select(TextAnalysis.fingerprint(col("text")).as("fp")).distinct()
      .join(index.select(col("fp")), Seq("fp"), "left_anti")
    VersionedTable.commit(fresh, root, append = true)
  }

  /** Near-dup candidates of `batch` against the persisted minhash
    * index: docs colliding with an indexed doc on >= `minBands` band
    * signatures. One equi-join on (band, sig) — batch-signature-sized
    * against index buckets, never all-pairs. Degenerate buckets (a
    * signature shared by > `maxBucket` indexed docs — boilerplate
    * shingles) are dropped with the same skew rationale as
    * [[Dedup.minhashPairs]]: such collisions carry no discrimination
    * and would square the join. */
  def minhashCandidatesVsIndex(index: DataFrame, batch: DataFrame,
                               k: Int, bands: Int, minBands: Int,
                               maxBucket: Int = 1000): DataFrame = {
    val bucketSize = index.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("__n"))
    val prunedIndex = index.join(
        bucketSize.where(col("__n") <= maxBucket), Seq("band", "sig"))
      .select(col("doc_id").as("corpus_doc_id"), col("band"), col("sig"))
    Dedup.minhashBands(batch, k, bands)
      .withColumnRenamed("doc_id", "batch_doc_id")
      .join(prunedIndex, Seq("band", "sig"))
      .groupBy(col("batch_doc_id"), col("corpus_doc_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .where(col("n_shared_bands") >= minBands)
      .orderBy(col("batch_doc_id"), col("corpus_doc_id"))
  }

  /** Append a batch's minhash signatures as the next index version
    * (run after [[minhashCandidatesVsIndex]] has filtered the batch to
    * its survivors). */
  def ingestMinhash(root: String, survivors: DataFrame,
                    k: Int, bands: Int): Long =
    VersionedTable.commit(Dedup.minhashBands(survivors, k, bands),
      root, append = true)

  /** Span-level (substring) index — third index family, for the
    * [[SpanDedup]] granularity: the corpus's DISTINCT k-gram hashes
    * (column `sh`, md5). This is the exact form of the n-gram
    * decontamination index production pipelines keep for eval-set
    * leakage checks; it is corpus-token-sized (the honest cost of exact
    * substring matching — a Bloom filter over the same keys is the
    * lossy shrink, at the price of false "seen" verdicts, and would
    * slot in here unchanged). Hashes, not span text: the index never
    * stores corpus content, only 32-hex-char keys. */
  def spanIndex(corpus: DataFrame, k: Int): DataFrame =
    SpanDedup.spanRows(corpus, k).select(md5(col("span")).as("sh"))
      .distinct()

  /** Batch-bloom sizing for [[prunedSeen]]: fixed, so the per-probe
    * bloom build needs NO batch pre-count (no extra job per streaming
    * trigger). ~4M expected keys at 2% fpp ≈ 4 MB of bits — a typical
    * micro-batch (≤ a few hundred k spans) sits far under capacity and
    * enjoys a lower effective fpp; a batch-mode caller far OVER it only
    * raises the false-positive rate, which costs wasted exchange rows,
    * never correctness. */
  private val ProbeBloomItems = 1L << 22

  /** The index side of a per-batch span probe, bloom-pruned by the
    * BATCH's own span hashes — the r13 fix for the measured
    * per-trigger growth (BENCH_MIXED: trigger p50 2.8 → 7.0 s as the
    * index grew): the probe joins (`left_semi`/`left`/`left_anti`,
    * batch on the left) planned as sort-merge, so the INDEX side —
    * the side that grows with the corpus — was scanned AND shuffled in
    * full on every trigger. A bloom of the batch's span hashes
    * (runtime-filter shape, [[graft.operators.BloomJoin]]) prunes the
    * index scan BEFORE its exchange: index rows outside the bloom
    * match no batch span (no false negatives), so every probe's result
    * is bit-identical, while the index-side exchange carries ≈ true
    * hits + fpp·|index| rows and AQE collapses the join to a broadcast
    * of those survivors. Per-trigger cost falls from
    * scan+shuffle+sort(index) to a columnar scan with an in-codegen
    * bloom probe — the scan itself is the remaining O(index) term (the
    * honest floor for exact confirmation on a shared-nothing engine;
    * a lossy gate for the scan too is [[spanContaminationBloom]]).
    * Price: the batch spans evaluate twice (once in the bloom
    * subquery, once in the probe) — batch-sized, the term that does
    * NOT grow. */
  private def prunedSeen(index: DataFrame,
                         batchSpans: DataFrame): DataFrame =
    graft.operators.BloomJoin.prune(
      index.select(col("sh")), col("sh"),
      graft.operators.BloomJoin.bloomBuild(
        batchSpans.select(col("sh")), col("sh"),
        expectedItems = ProbeBloomItems, fpp = 0.02))

  /** Per-batch-doc span contamination against the PERSISTED index: how
    * many of each doc's k-gram spans already exist anywhere in the
    * corpus. The batch side is batch-sized, the index side is a
    * hash-key semi-join probe — corpus text is never rescanned
    * (IncrementalIndexSpec pins the plan). The seen_ratio is the
    * span-granular analog of [[Dedup.contaminationPairs]]' shingle
    * overlap, usable directly as an eval-decontamination gate. */
  def spanContamination(index: DataFrame, batch: DataFrame,
                        k: Int): DataFrame = {
    val batchSpans = SpanDedup.spanRows(batch, k)
      .withColumn("sh", md5(col("span")))
    // distinct AFTER the bloom prune: it exists only as left-join
    // row-duplication safety against a malformed index, and on the
    // pruned survivors it is candidate-sized, not index-sized
    val seen = prunedSeen(index, batchSpans).distinct()
      .withColumn("__seen", lit(1))
    batchSpans
      .join(seen, Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__seen").isNotNull, 1L).otherwise(0L)).as("n_seen"))
      .withColumn("seen_ratio", round(col("n_seen").cast("double")
        / col("n_spans").cast("double"), 6))
      .orderBy(col("doc_id"))
  }

  /** [[spanContamination]] probed through a BLOOM FILTER of the index
    * keys instead of the key set itself — the lossy shrink the span
    * index's own doc points at: the corpus-token-sized hash table
    * compresses to `-n·ln(fpp)/ln²2` bits (a few GB per trillion spans
    * at 3 %), broadcast once, at the price of false "seen" verdicts.
    * The asymmetry is exactly right for a decontamination GATE: no
    * false negatives ever (a contaminated span can never slip through),
    * so per doc `n_seen` is an over-count within fpp of the clean-span
    * count and `seen_ratio` is a sound UPPER bound — a doc passing the
    * bloom gate passes the exact gate. Same report shape as the exact
    * twin; `expectedItems` is the indexed-key cardinality (a stored
    * stat at scale — the index's row count). */
  def spanContaminationBloom(index: DataFrame, batch: DataFrame, k: Int,
                             expectedItems: Long,
                             fpp: Double = 0.03): DataFrame = {
    val bloom = graft.operators.BloomJoin.bloomBuild(
      index.select(col("sh")), col("sh"), expectedItems, fpp)
    SpanDedup.spanRows(batch, k)
      .withColumn("sh", md5(col("span")))
      .withColumn("__seen",
        graft.operators.BloomJoin.mightContain(col("sh"), bloom))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__seen"), 1L).otherwise(0L)).as("n_seen"))
      .withColumn("seen_ratio", round(col("n_seen").cast("double")
        / col("n_spans").cast("double"), 6))
      .orderBy(col("doc_id"))
  }

  /** Append a batch's not-yet-indexed span hashes as the next version;
    * re-ingesting the same batch appends nothing (the index absorbs
    * each batch exactly once). Returns the committed version. */
  def ingestSpans(root: String, batch: DataFrame, k: Int): Long = {
    val spark = batch.sparkSession
    val index = VersionedTable.read(spark, root)
    val batchSpans = SpanDedup.spanRows(batch, k)
      .select(md5(col("span")).as("sh")).distinct()
    // anti-probe through the same bloom-pruned index side as the screen
    // ([[prunedSeen]]): index rows outside the batch bloom eliminate
    // nothing, so the anti result is unchanged while the per-trigger
    // index exchange stays batch-sized
    val fresh = batchSpans
      .join(prunedSeen(index, batchSpans), Seq("sh"), "left_anti")
    VersionedTable.commit(fresh, root, append = true)
  }

  /** The production shape of substring dedup at 100 TB: cut an incoming
    * batch against the PERSISTED span index — every batch token run
    * already present anywhere in the corpus is removed, the corpus is
    * never rescanned, and ownership needs no arbitration (the corpus,
    * being first, owns everything it contains). This is
    * [[SpanDedup.cutDuplicatedSpans]] with "seen in index" replacing
    * "non-owner occurrence": batch spans hash-probe the index, hits
    * merge into gaps-and-islands intervals per doc, and the rebuild is
    * the same indexed-filter token drop. Output mirrors
    * `cutDuplicatedSpans`: (doc_id, n_before, n_after, clean_md5) for
    * every batch doc. Run [[ingestSpans]] AFTER cutting so the next
    * batch also dedups against what this one contributed. */
  def cutSeenSpans(index: DataFrame, batch: DataFrame,
                   k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NO distinct on the index side: a LEFT SEMI join never duplicates
    // its left rows, so deduplicating the (already-distinct-by-
    // construction — spanIndex/ingestSpans both dedup) index here only
    // added a full index-sized aggregation to EVERY streaming trigger —
    // the soak lane measured the per-trigger time climbing with index
    // growth from exactly this kind of avoidable O(index) pass. The
    // index side is bloom-pruned by the batch's own span hashes
    // ([[prunedSeen]]) so the per-trigger exchange stops growing with
    // the corpus.
    val batchSpans = SpanDedup.spanRows(batch, k)
      .withColumn("sh", md5(col("span")))
    val hits = batchSpans
      .join(prunedSeen(index, batchSpans), Seq("sh"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevEnd = max(col("pos") + (k - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val ivs = hits
      .withColumn("flag",
        when(col("pos") > coalesce(prevEnd, lit(-1L)), 1L).otherwise(0L))
      .withColumn("island", sum(col("flag")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"))
      .groupBy(col("doc_id"))
      // bounded buffer: one interval per cut island, at most n_tokens/k
      // per doc — the same per-row bound as the doc's own token array
      .agg(collect_list(struct(col("s"), col("e"))).as("ivs"))
    batch
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .join(ivs, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("w")).cast("long").as("n_before"),
        when(col("ivs").isNull, col("w")).otherwise(
          filter(col("w"), (_, i) => !exists(col("ivs"),
            iv => (i + 1) >= iv.getField("s") &&
              (i + 1) <= iv.getField("e")))).as("kept"))
      .select(col("doc_id"), col("n_before"),
        size(col("kept")).cast("long").as("n_after"),
        md5(array_join(col("kept"), " ")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }
}
