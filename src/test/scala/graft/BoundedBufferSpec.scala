package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.functions.BoundedCollect.{collectListCapped, collectSetCapped}

/** Bounded-buffer audit: every buffering aggregate in main
  * holds a bound, and the bound's enforcement point is the BUFFER, not a
  * post-aggregation filter.
  *
  * The bucket-collect families (jaccard/minhash/winnowing/simhash/fuzzy
  * pair-gen, span occurrence lists, contamination doc sets) use
  * [[graft.functions.BoundedCollect]] — buffers stop growing at the
  * family's maxBucket/maxOcc cap, and since the caller drops over-cap
  * groups anyway, results are identical to the uncapped form (the DuckDB
  * oracles prove that corpus-wide every round).
  *
  * The remaining raw collect_list/collect_set call sites each carry a
  * structural bound, inventoried in the allowlist below; a NEW raw call
  * site fails this spec until it is either converted to a capped collect
  * or registered here with its bound.
  */
class BoundedBufferSpec extends SparkSpec {
  import spark.implicits._

  test("capped collects equal the built-ins for under-cap groups") {
    val df = spark.range(1000)
      .select((col("id") % 10).as("g"), (col("id") * 7 % 97).as("v"))
    // set: distinct values per group < cap -> element-identical
    val s1 = df.groupBy("g")
      .agg(sort_array(collectSetCapped(col("v"), 200)).as("s"))
    val s2 = df.groupBy("g").agg(sort_array(collect_set(col("v"))).as("s"))
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    // list: rows per group < cap -> element-identical (sorted compare;
    // built-in collect_list order is partition-dependent either way)
    val l1 = df.groupBy("g")
      .agg(sort_array(collectListCapped(col("v"), 200)).as("s"))
    val l2 = df.groupBy("g").agg(sort_array(collect_list(col("v"))).as("s"))
    assert(l1.exceptAll(l2).isEmpty && l2.exceptAll(l1).isEmpty)
    // struct elements round-trip the buffer serialization too
    val t1 = df.groupBy("g")
      .agg(sort_array(collectSetCapped(struct(col("v"), col("g")), 200)).as("s"))
    val t2 = df.groupBy("g")
      .agg(sort_array(collect_set(struct(col("v"), col("g")))).as("s"))
    assert(t1.exceptAll(t2).isEmpty && t2.exceptAll(t1).isEmpty)
  }

  test("capped collects stop buffering at the cap") {
    val df = spark.range(10000).select(lit(0L).as("g"), col("id").as("v"))
    val sizes = df.groupBy("g").agg(
        size(collectSetCapped(col("v"), 7)).as("ns"),
        size(collectListCapped(col("v"), 7)).as("nl"),
        count(lit(1)).as("c"))
      .as[(Long, Int, Int, Long)].head()
    assert(sizes._2 === 7 && sizes._3 === 7 && sizes._4 === 10000L)
  }

  test("capped collect skips nulls like the built-in (contamination shape)") {
    val df = Seq(("train", 1L), ("test", 2L), ("train", 3L))
      .toDF("split", "doc_id")
    val out = df.groupBy(lit(1))
      .agg(sort_array(collectSetCapped(
        when(col("split") === "train", col("doc_id")), 10)).as("tr"))
      .select("tr").as[Seq[Long]].head()
    assert(out === Seq(1L, 3L))
  }

  test("every raw collect_list/collect_set call site is inventoried with its bound") {
    // file -> (expected raw call-site count, documented bound)
    val allow = Map(
      "CoreQueries.scala" -> (1,
        "user_event_paths: row_number() <= 5 filter runs BEFORE the " +
          "collect — the buffer never holds more than 5 rows per user"),
      "SpanDedup.scala" -> (1,
        "per-doc cut-interval list: at most one interval per cut island " +
          "(<= n_tokens/k), the same per-row bound as the doc itself"),
      "DedupIndex.scala" -> (1,
        "per-doc cut-interval list (streaming twin of SpanDedup's): " +
          "bounded by the batch doc's own size"),
      "TextAnalysis.scala" -> (1,
        "hashingVectorizer densify: grouped by doc_id over bucket in " +
          "[0, dim) — the list can never exceed dim (=64) entries"),
      "Ewma.scala" -> (2, // one call site + its scaladoc mention
        "perEntity sequence gather: bounded by the per-entity sequence " +
          "length (user/device/symbol keys — the operator's documented " +
          "domain; an unbounded key belongs to StreamingEwma's O(1) " +
          "state instead)"))
    val call = "collect_(list|set)\\s*\\(".r
    val found = Files.walk(Paths.get("src/main/scala")).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val n = call.findAllIn(new String(Files.readAllBytes(p), "UTF-8")).size
        if (n == 0) None else Some(p.getFileName.toString -> n)
      }.toMap
    assert(found === allow.view.mapValues(_._1).toMap,
      s"raw collect call sites drifted from the bounded-buffer inventory:\n" +
        s"found $found\nallow ${allow.view.mapValues(_._1).toMap}\n" +
        "convert new sites to BoundedCollect or register their bound here")
  }
}
