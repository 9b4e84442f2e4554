package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BoundedCollect.collectSetCapped

/** Blocked fuzzy matching (entity resolution) — near-identical NAMES, not
  * near-identical documents: catalog/vendor/author strings that differ by
  * a typo or a token. Complements [[Dedup]] (content near-dup) with the
  * string-edit-distance family.
  *
  * Scale shape — the standard ER pipeline: a cheap BLOCKING key bounds the
  * quadratic comparison to block-local pairs (never all-pairs), and the
  * comparison itself runs as bucket-collect: ONE shuffle groups each
  * block's (id, name) set, pairs generate inside the bucket, and the
  * edit-distance filter prunes them — the same exchange-reuse-safe shape
  * as [[Dedup.jaccardPairs]]. `maxBucket` guards degenerate blocks (a
  * blocking key shared by everything is a key-design bug, not a reason to
  * go quadratic). Good blocking keys at 100 TB: first token, phonetic
  * code, length bucket, or a MinHash band for token-set blocking.
  */
object Fuzzy {

  /** Bucket-collect pair generation shared by the scorers: same-block
    * (id, name) pairs with id_a < id_b, blocks capped at `maxBucket`. */
  private def blockPairs(df: DataFrame, idCol: String, nameCol: String,
                         block: Column, maxBucket: Int): DataFrame = {
    val rows = df.select(block.as("block"), col(idCol).as("id"),
      col(nameCol).as("name"))
    val buckets = rows.groupBy(col("block"))
      .agg(sort_array(collectSetCapped(struct(col("id"), col("name")), maxBucket)).as("d"),
        count(lit(1)).as("c"))
      .where(col("c") >= 2 && col("c") <= maxBucket)
    buckets.select(col("block"), explode_outer(
        flatten(transform(col("d"), (x, i) =>
          transform(slice(col("d"), i + 2, size(col("d"))),
            y => struct(x.getField("id").as("id_a"),
              y.getField("id").as("id_b"),
              x.getField("name").as("name_a"),
              y.getField("name").as("name_b"))))))
        .as("p"))
      .where(col("p").isNotNull) // outer: see Dedup.shingleRows
      .select(col("block"), col("p.id_a").as("id_a"),
        col("p.id_b").as("id_b"), col("p.name_a").as("name_a"),
        col("p.name_b").as("name_b"))
  }

  /** Same-block pairs with `levenshtein(name_a, name_b) <= maxDist`.
    * Output: (block, id_a, id_b, name_a, name_b, edit_dist), id_a < id_b.
    */
  def blockedNamePairs(df: DataFrame, idCol: String, nameCol: String,
                       block: Column, maxDist: Int,
                       maxBucket: Int = 1000): DataFrame =
    blockPairs(df, idCol, nameCol, block, maxBucket)
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("edit_dist") <= maxDist)

  /** Same-block pairs scored by Jaro-Winkler ≥ `minSim` — the
    * transposition-tolerant, prefix-boosted scorer for SHORT strings
    * where levenshtein's integer steps are too coarse
    * ([[graft.functions.StringSimilarity]]; bit-exact with DuckDB's
    * `jaro_winkler_similarity`, so the oracle checks the pair set AND
    * the scores). */
  def blockedNamePairsJw(df: DataFrame, idCol: String, nameCol: String,
                         block: Column, minSim: Double,
                         maxBucket: Int = 1000): DataFrame =
    blockPairs(df, idCol, nameCol, block, maxBucket)
      .withColumn("jw_sim",
        graft.functions.StringFunctions
          .jaroWinkler(col("name_a"), col("name_b")))
      .where(col("jw_sim") >= minSim)
}
