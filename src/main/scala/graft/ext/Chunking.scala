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
}
