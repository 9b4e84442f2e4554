package graft

import org.apache.spark.sql.functions._

import graft.ext.ProductQuant
import graft.functions.PqFunctions.{pqCodeNative, pqLutNative}
import graft.functions.VectorFunctions.adcNative

/** Fuzz the native PQ kernels (functions/PqExpressions, AdcDistExpr)
  * against an INDEPENDENT driver-side reimplementation — not against
  * the HOF forms, which could share a bug. Equality is exact (==, no
  * tolerance): both sides normalize, accumulate, and tie-break in the
  * same IEEE754 op order, so any divergence is a real kernel defect.
  * Geometries cover m=1 (the coarse-assignment instance),
  * non-power-of-two ksub (bits ≠ log2), dsub=1, the full 64-bit
  * packing (16×16 and 8×256), plus zero vectors (norm-0 guard). */
class PqKernelFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  private def normalize(v: Array[Float]): Array[Double] = {
    var n2 = 0.0
    var i = 0
    while (i < v.length) { n2 += v(i).toDouble * v(i).toDouble; i += 1 }
    val n = math.sqrt(n2)
    if (n == 0.0) new Array[Double](v.length)
    else v.map(_.toDouble / n)
  }

  private def refLut(vn: Array[Double], cb: Array[Array[Array[Double]]]): Array[Double] = {
    val m = cb.length; val ksub = cb(0).length; val dsub = cb(0)(0).length
    val out = new Array[Double](m * ksub)
    for (s <- 0 until m; j <- 0 until ksub) {
      var d = 0.0
      var t = 0
      while (t < dsub) {
        val x = vn(s * dsub + t) - cb(s)(j)(t); d += x * x; t += 1
      }
      out(s * ksub + j) = d
    }
    out
  }

  private def refCode(vn: Array[Double], cb: Array[Array[Array[Double]]]): Long = {
    val m = cb.length; val ksub = cb(0).length
    val bits = math.max(1, 32 - Integer.numberOfLeadingZeros(ksub - 1))
    val lut = refLut(vn, cb)
    var packed = 0L
    for (s <- 0 until m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        if (lut(s * ksub + j) < bestD) { bestD = lut(s * ksub + j); best = j }
        j += 1
      }
      packed |= best.toLong << (s * bits)
    }
    packed
  }

  private def refAdc(lut: Array[Double], packed: Long, m: Int, ksub: Int): Double = {
    val bits = math.max(1, 32 - Integer.numberOfLeadingZeros(ksub - 1))
    val mask = (1L << bits) - 1
    var s2 = 0.0
    for (s <- 0 until m)
      s2 += lut(s * ksub + ((packed >>> (s * bits)) & mask).toInt)
    s2
  }

  private def randomCb(m: Int, ksub: Int, dsub: Int): Array[Array[Array[Double]]] =
    Array.fill(m, ksub, dsub)(rnd.nextDouble() - 0.5)

  test("code/LUT/ADC kernels match the driver reimplementation exactly") {
    val geoms = Seq((16, 16, 4), (1, 8, 64), (8, 256, 8), (4, 5, 2),
      (16, 3, 1), (2, 20, 16))
    for ((m, ksub, dsub) <- geoms) {
      val dim = m * dsub
      val cb = randomCb(m, ksub, dsub)
      val vecs = (0 until 40).map { i =>
        val v =
          if (i == 0) new Array[Float](dim) // zero vector: norm-0 guard
          else Array.fill(dim)((rnd.nextFloat() - 0.5f) * 4f)
        (i.toLong, v)
      }
      val df = vecs.toDF("vec_id", "embedding")
        .withColumn("__vn",
          when(sqrt(graft.functions.VectorFunctions
            .dotNative(col("embedding"), col("embedding"))) === 0.0,
            transform(col("embedding"), _ => lit(0.0)))
            .otherwise(transform(col("embedding"),
              x => x.cast("double") / sqrt(graft.functions.VectorFunctions
                .dotNative(col("embedding"), col("embedding"))))))
      val got = df.select(col("vec_id"),
          pqCodeNative(col("__vn"), cb).as("packed"),
          pqLutNative(col("__vn"), cb).as("lut"))
        .as[(Long, Long, Seq[Double])].collect()
      assert(got.length === vecs.length)
      val byId = vecs.toMap
      got.foreach { case (id, packed, lut) =>
        val vn = normalize(byId(id))
        assert(packed === refCode(vn, cb),
          s"code mismatch at geom ($m,$ksub,$dsub) vec $id")
        assert(lut.toArray.toSeq === refLut(vn, cb).toSeq,
          s"LUT mismatch at geom ($m,$ksub,$dsub) vec $id")
      }
      // ADC: pair every vector's LUT with every other's packed code
      val luts = got.map(g => g._1 -> g._3.toArray).toMap
      val codes = got.map(g => g._1 -> g._2).toMap
      val pairs = df.select(col("vec_id"), pqLutNative(col("__vn"), cb).as("lut"))
        .crossJoin(df.select(col("vec_id").as("cid"),
          pqCodeNative(col("__vn"), cb).as("packed")))
        .select(col("vec_id"), col("cid"),
          adcNative(col("lut"), col("packed"), m, ksub).as("adc"))
        .as[(Long, Long, Double)].collect()
      assert(pairs.length === vecs.length * vecs.length)
      pairs.foreach { case (q, c, adc) =>
        assert(adc === refAdc(luts(q), codes(c), m, ksub),
          s"ADC mismatch at geom ($m,$ksub,$dsub) pair ($q,$c)")
      }
    }
  }

  test("null elements propagate to null, never throw") {
    val df = Seq((1L, Seq[java.lang.Double](0.5, null, 0.25, 0.1)))
      .toDF("vec_id", "vn")
    val cb = randomCb(2, 4, 2)
    val out = df.select(
        pqCodeNative(col("vn"), cb).as("c"),
        pqLutNative(col("vn"), cb).as("l"))
      .collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("kernels COMPILE over non-nullable arrays (no interpreter fallback)") {
    // GenerateUnsafeProjection.generate throws on janino failure — no
    // CodeGeneratorWithInterpretedFallback rescue — so this pins the
    // round-11 bug where ev.isNull was referenced but undeclared for
    // containsNull=false inputs (derived vectors, e.g. the hashing
    // vectorizer) and every consuming projection fell back interpreted.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}
    import graft.functions.{AdcDistExpr, DotProductExpr, PqCodeExpr, PqLutExpr}
    val cb = randomCb(2, 4, 2)
    val flat = cb.flatMap(_.flatMap(_.toSeq))
    val arrD = BoundReference(0, ArrayType(DoubleType, containsNull = false),
      nullable = false)
    val arrF = BoundReference(0, ArrayType(FloatType, containsNull = false),
      nullable = false)
    for (sub <- Seq(false, true)) {
      GenerateUnsafeProjection.generate(Seq(
        PqLutExpr(arrD, flat, 2, 4, 2),
        PqCodeExpr(arrD, flat, 2, 4, 2),
        DotProductExpr(arrF, arrF),
        AdcDistExpr(BoundReference(0, ArrayType(DoubleType, containsNull = false),
          nullable = false), BoundReference(1, LongType, nullable = false), 2, 4)),
        subexpressionEliminationEnabled = sub)
    }
    // and the nullable variants still declare + compile
    val arrDN = BoundReference(0, ArrayType(DoubleType, containsNull = true),
      nullable = true)
    GenerateUnsafeProjection.generate(Seq(
      PqLutExpr(arrDN, flat, 2, 4, 2), PqCodeExpr(arrDN, flat, 2, 4, 2)))
  }

  test("the packed form IS what encodePacked produces (end-to-end tie)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    val cb = ProductQuant.pqFit(emb)
    val fromOp = ProductQuant.encodePacked(emb, cb)
      .select(col("vec_id"), col("pq_packed")).as[(Long, Long)].collect().toMap
    emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().foreach { case (id, v) =>
        assert(fromOp(id) === refCode(normalize(v), cb),
          s"operator packed code diverges from reference at vec $id")
      }
  }
}
