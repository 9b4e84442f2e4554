package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Persisted lexical (BM25) eval-decontamination index — the fifth index
  * family (after DedupIndex's fingerprint/minhash/span and PqIndex):
  * the EVAL set's per-(doc, token) term frequencies as a
  * [[VersionedTable]], probed by training batches for near-duplicate
  * leakage the exact-span screen misses (paraphrase, re-punctuation,
  * partial overlap — cf. the fuzzy-dedup tier of training-data hygiene).
  *
  * Direction matters: production decontamination indexes the SMALL
  * frozen eval/benchmark set once and screens the 100 TB training
  * stream against it — so this index is STATIC by design (create-once;
  * no ingest path, hence none of the replay machinery the span/PQ
  * streaming loops need — a replayed screen recomputes bit-identical
  * reports against the frozen index).
  *
  * Probing is idf-capped: each batch doc queries with its `probeTerms`
  * RAREST index terms (lowest df, deterministic (df, token) order).
  * That bounds the postings fan-out per doc — the skew-safe choice: a
  * stop-word-ish term's postings list is the entire eval set, and
  * probing with rare terms is both cheaper AND more selective (max
  * idf). OOV batch terms match no postings and drop out in the join.
  *
  * Every score is the standard BM25 closed form over the probe terms
  * ([[Retrieval]]'s variant, same literal params), so an external
  * engine reproduces the whole report exactly — the screen is oracled
  * end to end, not contract-checked.
  */
object LexicalIndex {

  /** Build the index at `root` from the eval documents: one commit of
    * (doc_id, token, tf). No-op if it already exists. */
  def create(evalDocs: DataFrame, root: String): Unit = {
    val spark = evalDocs.sparkSession
    // same-root creators serialize in-JVM (KeyedLocks doc); a lost
    // CROSS-process commit race means another writer built the same
    // frozen index — absorbed, not rethrown
    graft.sources.KeyedLocks.withLock(root) {
      if (VersionedTable.versions(spark, root).isEmpty) {
        val tf = evalDocs
          .select(col("doc_id"),
            explode_outer(TextAnalysis.tokens(col("text"))).as("token"))
          .where(col("token").isNotNull)
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        try VersionedTable.commit(tf, root)
        catch {
          case e: IllegalStateException =>
            if (VersionedTable.versions(spark, root).isEmpty) throw e
        }
      }
    }
    ()
  }

  /** The screen-side derived statistics of a frozen index — postings,
    * per-eval-doc lengths, document frequencies — bundled so a STREAM
    * computes them ONCE and screens every micro-batch against the cached
    * copies, instead of re-aggregating the index per trigger (the
    * round-11 lexical_screen bench showed the per-trigger rebuild
    * dominating: the index is frozen, its stats are loop invariants). */
  final case class ScreenIndex(postings: DataFrame, dl: DataFrame,
                               dfreq: DataFrame, totals: DataFrame) {
    /** Cache the three index-sized frames (totals is derived from the
      * cached dl, one row). Returns this for chaining. */
    def persist(): ScreenIndex = {
      postings.persist(); dl.persist(); dfreq.persist(); this
    }
    def unpersist(): Unit = {
      postings.unpersist(); dl.unpersist(); dfreq.unpersist(); ()
    }
  }

  /** Derive [[ScreenIndex]] stats from the persisted index at `root`. */
  def indexStats(spark: SparkSession, root: String): ScreenIndex = {
    val idx = VersionedTable.read(spark, root)
    val dl = idx.groupBy(col("doc_id").as("eval_doc_id"))
      .agg(sum(col("tf")).as("dl"))
    val totals = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dfreq = idx.groupBy(col("token")).agg(count(lit(1)).as("df"))
    ScreenIndex(idx, dl, dfreq, totals)
  }

  /** Screen a batch of documents against the index: per batch doc, the
    * best-matching eval doc by BM25 over the doc's `probeTerms` rarest
    * index terms, and the contamination flag. Deterministic tie-break:
    * highest score, then lowest eval doc id.
    *
    * Output: (doc_id, eval_doc_id, n_probe_terms, score, contaminated)
    * — one row per batch doc that matched ANY index term; docs sharing
    * nothing with the eval set are absent (they cannot be contaminated
    * lexically). */
  def screen(spark: SparkSession, batch: DataFrame, root: String,
             threshold: Double, probeTerms: Int = 16,
             k1: Double = 1.2, b: Double = 0.75): DataFrame =
    screenWith(indexStats(spark, root), batch, threshold, probeTerms, k1, b)

  /** [[screen]] against precomputed (typically cached) index stats —
    * the per-trigger form of the streaming screen. The index side of
    * every join is broadcast EXPLICITLY: the production shape is a small
    * frozen eval index against an unbounded training stream, so the
    * batch side must never shuffle on token. */
  def screenWith(si: ScreenIndex, batch: DataFrame,
                 threshold: Double, probeTerms: Int = 16,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(probeTerms > 0 && threshold > 0, "bad screen params")
    // batch probe terms: distinct doc terms ∩ index vocab, rarest first
    val wRare = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("token").asc)
    val probes = batch
      .select(col("doc_id"),
        explode_outer(array_distinct(TextAnalysis.tokens(col("text"))))
          .as("token"))
      .where(col("token").isNotNull)
      .join(broadcast(si.dfreq), "token") // inner: OOV terms match nothing
      .withColumn("__r", row_number().over(wRare))
      .where(col("__r") <= probeTerms)
      .drop("__r")
    val scored = probes
      .join(broadcast(si.postings.select(col("doc_id").as("eval_doc_id"),
        col("token"), col("tf"))), "token")
      .join(broadcast(si.dl), "eval_doc_id")
      .crossJoin(broadcast(si.totals))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy(col("doc_id"), col("eval_doc_id"))
      .agg(count(lit(1)).as("n_probe_terms"),
        round(sum(col("contrib")), 6).as("score"))
    scored.groupBy(col("doc_id"))
      .agg(max(struct(col("score"), (-col("eval_doc_id")).as("neg"),
        col("n_probe_terms").as("npt"))).as("best"))
      .select(col("doc_id"), (-col("best.neg")).as("eval_doc_id"),
        col("best.npt").as("n_probe_terms"), col("best.score").as("score"),
        (col("best.score") >= threshold).as("contaminated"))
  }
}
