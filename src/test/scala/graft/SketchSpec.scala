package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchAggregates.freqItems

/** Misra-Gries guarantees, asserted against exact counts: items above the
  * N/capacity frequency threshold are always retained; estimates are
  * under-counts within N/capacity of truth; results survive arbitrary
  * repartitioning (mergeability). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: item i repeated (21-i)*40 times, plus 400 singletons
  private lazy val stream = {
    val heavy = (1 to 20).flatMap(i => Seq.fill((21 - i) * 40)(f"h$i%02d"))
    val tail = (1 to 400).map(i => s"t$i")
    scala.util.Random.shuffle(heavy ++ tail)
  }

  test("heavy hitters above N/capacity survive with bounded under-counts") {
    val df = stream.toDF("item")
    val n = stream.size.toLong
    val cap = 64
    val got = df.agg(freqItems(col("item"), cap).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)]
      .collect().toMap
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val threshold = n / cap
    for ((item, c) <- exact if c > threshold) {
      assert(got.contains(item), s"$item (true $c > N/c $threshold) missing")
      assert(got(item) <= c, s"$item over-counted: ${got(item)} > $c")
      assert(got(item) >= c - threshold,
        s"$item estimate ${got(item)} below bound ${c - threshold}")
    }
  }

  test("top-k membership is stable under repartitioning (mergeable)") {
    def topK(parts: Int): Seq[String] = stream.toDF("item").repartition(parts)
      .agg(freqItems(col("item"), 64).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)]
      .collect().sortBy { case (i, c) => (-c, i) }.take(10).map(_._1).toSeq
    val expected = (1 to 10).map(i => f"h$i%02d")
    assert(topK(1) === expected)
    assert(topK(7) === expected)
    assert(topK(32) === expected)
  }

  test("items longer than 65535 UTF-8 bytes survive the shuffle serializer") {
    // writeUTF would throw UTFDataFormatException at partial-aggregate
    // shuffle time; the length-prefixed form must round-trip it
    val big = "x" * 70000
    val df = (Seq.fill(50)(big) ++ (1 to 10).map(i => s"small$i"))
      .toDF("item").repartition(8) // force a partial/merge shuffle
    val got = df.agg(freqItems(col("item"), 16).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)]
      .collect().toMap
    assert(got(big) === 50L)
  }

  test("SQL surface: freq_items registered via GraftExtensions") {
    stream.toDF("item").createOrReplaceTempView("sk_items")
    val top = spark.sql(
      """SELECT e.item FROM (
           SELECT explode(freq_items(item, 64)) AS e FROM sk_items)
         ORDER BY e.est DESC, e.item LIMIT 3""").as[String].collect()
    assert(top.toSeq === Seq("h01", "h02", "h03"))
  }
}
