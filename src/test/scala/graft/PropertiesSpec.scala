package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Cleaning, Kpis, Skew}

/** Property-based invariants (SURVEY.md §5.2.3) via raw ScalaCheck (the
  * scalatest bridge is not in the offline cache). Row counts are kept
  * small: each property case is a Spark job. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 5), Gen.oneOf("a", "b", "c")))

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("dedup is idempotent and bounded by input size") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val once = Cleaning.dedupRows(df)
      val n1 = once.count()
      n1 == Cleaning.dedupRows(once).count() &&
        n1 <= rows.size && n1 == rows.distinct.size
    })
  }

  test("union count equals sum of counts; dedup(union(x,x)) == dedup(x)") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val u = Cleaning.unionAll(Seq(df, df))
      u.count() == 2L * rows.size &&
        Cleaning.dedupRows(u).count() == rows.distinct.size
    })
  }

  test("salted count equals direct count for arbitrary key skew") {
    check(Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v")
        val direct = df.groupBy($"k").count().orderBy($"k")
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
        val salted = Skew.saltedCount(df, Seq("k"), Seq("v"), salts = 4)
          .orderBy($"k").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
        salted == direct
      }
    })
  }

  test("context packing: bins contiguous from 0, sums bounded by budget+straddle") {
    val tokGen = Gen.listOfN(25, Gen.choose(1L, 40L))
    check(Prop.forAll(tokGen) { toks =>
      toks.isEmpty || {
        val budget = 64L
        val df = toks.zipWithIndex.map { case (n, i) => (i.toLong, n) }
          .toDF("doc_id", "n")
        val out = graft.ext.Sampling.packByTokenBudget(df, $"doc_id", $"n",
            budget).groupBy($"bin")
          .agg(sum($"n").as("tot")).orderBy($"bin")
          .as[(Long, Long)].collect()
        val bins = out.map(_._1)
        val maxDoc = toks.max
        // bins are 0..k consecutive; each bin holds < budget + the one
        // straddling doc (position packing: a doc belongs where its first
        // token lands)
        bins.toSeq == (0L until bins.length).toSeq &&
          out.forall { case (_, tot) => tot < budget + maxDoc } &&
          out.map(_._2).sum == toks.sum
      }
    })
  }

  test("salted join equals the plain join for arbitrary skew and dup keys") {
    val bigGen = Gen.listOfN(60,
      Gen.zip(Gen.oneOf(1, 1, 1, 1, 2, 3), Gen.choose(0, 99))) // hot key 1
    val smallGen = Gen.listOfN(6,
      Gen.zip(Gen.choose(1, 4), Gen.alphaLowerStr.map(_.take(3))))
    check(Prop.forAll(bigGen, smallGen) { (big, small) =>
      val b = big.toDF("k", "v")
      val s = small.toDF("k", "tag") // may contain dup keys -> dup matches
      val plain = b.join(s, "k").groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
        .orderBy($"k").as[(Int, Long, Long)].collect().toSeq
      val salted = Skew.saltedJoin(b, s, "k", salts = 4).groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
        .orderBy($"k").as[(Int, Long, Long)].collect().toSeq
      salted == plain
    })
  }

  test("chunking covers every token with the expected chunk count and sizes") {
    val cfgGen = for {
      n <- Gen.choose(0, 120)
      size <- Gen.choose(1, 40)
      stride <- Gen.choose(1, size)
    } yield (n, size, stride)
    check(Prop.forAll(cfgGen) { case (n, size, stride) =>
      val text = (0 until n).map(i => s"t$i").mkString(" ")
      val out = graft.ext.Chunking.chunkByTokens(
          Seq((1L, text)).toDF("doc_id", "text"), "text", Seq("doc_id"),
          size, stride)
        .orderBy("chunk_id").select("chunk_id", "n_tokens")
        .as[(Long, Long)].collect().toSeq
      val expected = if (n == 0) 0L
        else 1L + math.ceil(math.max(n - size, 0).toDouble / stride).toLong
      out.length == expected &&
        out.forall { case (id, len) =>
          len == math.min(size.toLong, n - id * stride) } &&
        (n == 0 || out.last._1 * stride + out.last._2 == n)
    })
  }

  test("gap-fill spine is dense, zero-filled, and count-preserving") {
    val evGen = Gen.listOfN(12, Gen.choose(0, 200)) // sparse hours over ~8 days
    check(Prop.forAll(evGen) { hours =>
      hours.isEmpty || {
        val df = hours.zipWithIndex.map { case (h, i) =>
          (java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
            .plusSeconds(h * 3600L + i)), 1L)
        }.toDF("ts", "x")
        val out = graft.operators.GapFill.hourlyCounts(df, "ts")
          .as[(java.sql.Timestamp, Long)].collect()
        val span = hours.max - hours.min + 1
        out.length == span &&                      // dense: every hour present
          out.map(_._2).sum == hours.size &&       // nothing lost
          out.exists(_._2 == 0L) == (span > hours.distinct.size) // zeros iff gaps
      }
    })
  }

  test("diversity ratio always lands in (0, 1]") {
    val evGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0, 23), Gen.choose(1L, 5L), Gen.oneOf("x", "y", "z")))
    check(Prop.forAll(evGen) { rows =>
      rows.isEmpty || {
        val df = rows.map { case (h, u, v) =>
          (java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), u, v)
        }.toDF("ts", "user_id", "event_type")
        val out = Kpis.hourlyKpisHod(df, "ts", "user_id", "event_type")
          .select("diversity").as[Double].collect()
        out.forall(d => d > 0.0 && d <= 1.0)
      }
    })
  }

  test("snapshot diff statuses obey set algebra for arbitrary versions") {
    val verGen = Gen.mapOf(Gen.zip(Gen.choose(0L, 20L), Gen.choose(0, 3)))
    check(Prop.forAll(verGen, verGen) { (oldM, newM) =>
      val got = graft.operators.SnapshotDiff
        .diff(oldM.toSeq.toDF("k", "v"), newM.toSeq.toDF("k", "v"), Seq("k"))
        .select("k", "diff_status").as[(Long, String)].collect()
        .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      got.getOrElse("added", Set.empty) ==
        newM.keySet.diff(oldM.keySet) &&
      got.getOrElse("removed", Set.empty) ==
        oldM.keySet.diff(newM.keySet) &&
      got.getOrElse("changed", Set.empty) ==
        oldM.keySet.intersect(newM.keySet)
          .filter(k => oldM(k) != newM(k))
    })
  }

  test("temperature sampling invariants for arbitrary strata") {
    // (a) the smallest stratum always keeps everything; (b) keep RATES
    // are monotone non-increasing in stratum size (bigger → flattened
    // harder); (c) k >= population in weightedSample returns every
    // positive-weight row
    val strataGen = Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(20, 300)))
    check(Prop.forAll(strataGen) { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(i => (s.toLong * 100000 + i, s"src$s"))
      }
      val df = rows.toDF("id", "src")
      val kept = graft.ext.Sampling
        .temperatureSample(df, col("id"), col("src"))
        .groupBy("src").count().as[(String, Long)].collect().toMap
      val bySize = sizes.zipWithIndex.map { case (n, s) =>
        n -> kept.getOrElse(s"src$s", 0L) }
      val minSize = sizes.min
      val minKeepsAll = bySize.filter(_._1 == minSize)
        .forall { case (n, k) => k == n }
      // rates monotone in expectation — allow hash-noise slack of 15%
      val rates = bySize.sortBy(_._1)
        .map { case (n, k) => k.toDouble / n }
      val monotone = rates.sliding(2).forall {
        case Seq(a, b) => b <= a + 0.15
        case _ => true
      }
      minKeepsAll && monotone
    })
    val all = graft.ext.Sampling.weightedSample(
      (1L to 20L).map((_, 1.0)).toDF("id", "w"), col("id"), col("w"),
      k = 100)
    assert(all.count() === 20L)
  }

  test("attribution credit is conserved under every model") {
    // invariant: per-channel credited conversions sum to the TOTAL number
    // of conversions (each conversion hands out exactly 1.0 of credit,
    // organic included) and attributed value sums to the total converted
    // value — within per-row integer rounding (≤1 µ / ≤1 ¢ per credit row)
    val evGen = Gen.listOfN(40, Gen.zip(
      Gen.choose(1L, 4L),                       // user
      Gen.choose(0, 5000),                      // seconds offset
      Gen.oneOf("view", "click", "view", "purchase"),
      Gen.choose(1, 200)))                      // value in whole units
    check(Prop.forAll(evGen) { rows =>
      rows.isEmpty || {
        val df = rows.zipWithIndex.map { case ((u, s, t, v), i) =>
          (u, new java.sql.Timestamp(1704067200000L + s * 1000L), t,
            v.toDouble, i.toLong)
        }.toDF("user_id", "ts", "event_type", "value", "event_id")
        val nConv = rows.count(_._3 == "purchase")
        val convValue = rows.filter(_._3 == "purchase").map(_._4).sum
        val models = Seq(
          graft.operators.Attribution.multiTouchReport(df, "user_id", "ts",
            "event_type", "purchase", "value", "event_id", "linear"),
          graft.operators.Attribution.multiTouchReport(df, "user_id", "ts",
            "event_type", "purchase", "value", "event_id", "position"),
          graft.operators.Attribution.timeDecayReport(df, "user_id", "ts",
            "event_type", "purchase", "value", "event_id",
            halfLifeSec = 600L))
        models.forall { rep =>
          val rows2 = rep.as[(String, Double, Double)].collect()
          val credits = rows2.map(_._2).sum
          val value = rows2.map(_._3).sum
          math.abs(credits - nConv) < 0.001 &&
            math.abs(value - convValue) < 0.01 * math.max(1, nConv * 20)
        }
      }
    })
  }

  test("mgMerge: Misra-Gries merge bounds hold for arbitrary streams") {
    // pure driver-side property — no Spark jobs, so many cases are cheap
    val streamGen = Gen.listOf(Gen.oneOf(
      ('a' to 'j').map(_.toString)))
    val prop = Prop.forAll(streamGen, streamGen) { (s1, s2) =>
      val cap = 4
      def exact(s: List[String]) =
        s.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      // an exact count map IS a valid MG summary of its stream when it
      // fits the capacity; trim to a valid one otherwise via mgMerge
      // with the empty summary (exercises the trim rule itself)
      def summarize(s: List[String]) =
        graft.functions.SketchAggregates.mgMerge(
          exact(s).toSeq, Seq.empty, cap)
      val merged = graft.functions.SketchAggregates
        .mgMerge(summarize(s1), summarize(s2), cap).toMap
      val ex = (s1 ++ s2).groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      val n = (s1.size + s2.size).toLong
      val slack = n / (cap + 1) * 2 // one trim per summarize + one per merge
      merged.size <= cap &&
        merged.values.forall(_ > 0) &&
        merged.forall { case (k, c) => c <= ex(k) } &&           // under-count only
        ex.forall { case (k, c) =>
          c - merged.getOrElse(k, 0L) <= slack } &&              // bounded error
        ex.forall { case (k, c) => c <= slack || merged.contains(k) } // heavy survives
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("adaptive decide: rule invariants for arbitrary statistics") {
    import graft.operators.AdaptiveJoin
    val prop = Prop.forAll(
      Gen.choose(0L, 1000000L), Gen.choose(1L, 1000000L),
      Gen.choose(1L, 100000L), Gen.choose(0.0, 1.0)) {
      (est, big, small, share) =>
        val (s1, k1) = AdaptiveJoin.decide(est, big, small, share,
          broadcastMaxRows = 10000L, shufflePartitions = 32, maxSalts = 64)
        val arms = Set("broadcast_small", "salted", "bloom_merge",
          "shuffle_merge")
        val fits = small <= 10000L && est <= 4.0 * math.max(1L, big)
        arms.contains(s1) &&
          (if (s1 == "salted") k1 >= 2 && k1 <= 64 else k1 == 0) &&
          (!fits || s1 == "broadcast_small") &&                 // arm 1 total
          (fits || share < 0.10 || s1 == "salted") &&           // arm 2 next
          // salts monotone in the measured share
          (s1 != "salted" || {
            val (s2, k2) = AdaptiveJoin.decide(est, big, small,
              math.min(1.0, share * 1.5), broadcastMaxRows = 10000L,
              shufflePartitions = 32, maxSalts = 64)
            s2 == "salted" && k2 >= k1
          })
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
