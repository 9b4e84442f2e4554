package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — fixed-size overlapping token windows, the pass that
  * turns variable-length documents into model-sized training/retrieval
  * chunks (RAG indexing, context-window packing inputs, embedding batches).
  *
  * Chunk `i` of a doc covers tokens `[i·stride, i·stride + chunkSize)`;
  * `stride < chunkSize` gives overlap so no span longer than
  * `chunkSize - stride` is ever split across a chunk boundary. The last
  * chunk starts at the last multiple of `stride` below `n` (it may be
  * short); a doc with no tokens yields no chunks.
  *
  * Scale shape: pure projection + one explode whose fan-out is
  * `ceil(n_tokens / stride)` per document — bounded, data-independent,
  * no shuffle, no UDFs (`sequence`/`slice`/`array_join` are codegen'd
  * built-ins). The full chunk text never materializes unless selected;
  * downstream passes that only need ids/counts/hashes stay narrow.
  */
object Chunking {

  /** Chunk rows: (carried id/meta columns, chunk_id, n_tokens, chunk_hash).
    * `chunk_hash` is the md5 of the space-joined token window — the stable
    * chunk identity used for incremental re-indexing (re-chunk only docs
    * whose hashes changed). */
  def chunkByTokens(docs: DataFrame, textCol: String, idCols: Seq[String],
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize: chunkSize=$chunkSize stride=$stride")
    val withToks = docs
      .select((idCols.map(col) :+ TextAnalysis.tokens(col(textCol)).as("__toks")): _*)
      .withColumn("__n", size(col("__toks")))
    // last chunk index = ceil(max(n - chunkSize, 0) / stride); explode_outer
    // + isNotNull, NOT explode: see Dedup.shingleRows (pushdown would
    // re-evaluate the computed sequence below the Generate).
    val ids = when(col("__n") > 0,
      sequence(lit(0L),
        ceil(greatest(col("__n") - chunkSize, lit(0)).cast("double") / stride)
          .cast("long")))
    withToks
      .withColumn("chunk_id", explode_outer(ids))
      .where(col("chunk_id").isNotNull)
      .withColumn("__w",
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize)))
      .select((idCols.map(col) :+ col("chunk_id") :+
        size(col("__w")).cast("long").as("n_tokens") :+
        md5(array_join(col("__w"), " ")).as("chunk_hash")): _*)
  }

  /** Content-defined chunking (CDC — the rsync/LBFS/restic boundary
    * discipline applied to token streams): a chunk boundary falls AFTER
    * token position p whenever the md5-hex32 of the `window`-token
    * window ending at p is ≡ 0 (mod `divisor`) — so boundaries are a
    * function of local CONTENT, not absolute position. Insert a token
    * at the front of a document and fixed-size chunking re-hashes every
    * chunk; CDC boundaries re-synchronize at the first content boundary
    * and every later chunk keeps its identity — the property that makes
    * chunk-hash dedup/incremental-indexing robust to edits
    * (`cdc_stability` measures it; production implementations add
    * min/max chunk-size guards, orthogonal to the boundary rule).
    *
    * Expected chunk length ≈ `divisor` tokens. Same scale shape as
    * [[chunkByTokens]]: all boundary work happens INSIDE the token
    * array (filter/transform over a sequence — codegen'd, no UDF, no
    * shuffle), then ONE explode of the finished chunk list.
    */
  def chunkContentDefined(docs: DataFrame, textCol: String,
                          idCols: Seq[String], window: Int = 3,
                          divisor: Int = 16): DataFrame = {
    require(window >= 1 && window <= 16, s"unreasonable window: $window")
    require(divisor >= 2 && divisor <= 65536,
      s"unreasonable divisor: $divisor")
    val hex32 = (s: org.apache.spark.sql.Column) =>
      conv(substring(md5(s), 1, 8), 16, 10).cast("long")
    val withToks = docs
      .select((idCols.map(col) :+
        TextAnalysis.tokens(col(textCol)).as("__toks")): _*)
      .withColumn("__n", size(col("__toks")))
      // boundary candidates p ∈ [window, n-1] (1-based; a boundary after
      // the last token is meaningless). sequence() steps BACKWARDS when
      // start > stop — guard the degenerate short-doc case explicitly.
      .withColumn("__bpos",
        when(col("__n") - 1 >= window,
          filter(sequence(lit(window), col("__n") - 1), p =>
            hex32(array_join(
              slice(col("__toks"), p - (window - 1), lit(window)), " "))
              % divisor === 0))
          .otherwise(array().cast("array<int>")))
      .withColumn("__starts",
        concat(array(lit(1)), transform(col("__bpos"), p => p + 1)))
      .withColumn("__ends",
        concat(col("__bpos"), array(col("__n"))))
    val chunks = when(col("__n") > 0,
      transform(sequence(lit(0), size(col("__bpos"))), i =>
        struct(i.cast("long").as("chunk_id"),
          slice(col("__toks"), element_at(col("__starts"), i + 1),
            element_at(col("__ends"), i + 1)
              - element_at(col("__starts"), i + 1) + 1).as("w"))))
    withToks
      .withColumn("__c", explode_outer(chunks))
      .where(col("__c").isNotNull)
      .select((idCols.map(col) :+ col("__c.chunk_id").as("chunk_id") :+
        size(col("__c.w")).cast("long").as("n_tokens") :+
        md5(array_join(col("__c.w"), " ")).as("chunk_hash")): _*)
  }
}
