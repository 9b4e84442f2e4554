package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.JoinSizeSketch
import graft.operators.EstimatedJoin

/** Table statistics MAINTAINED AT WRITE TIME — the missing half of
  * sketch-driven join planning: [[graft.operators.EstimatedJoin]] can
  * sketch both sides on demand, but at warehouse scale the sketch is
  * computed once per commit (it is element-wise mergeable, so an
  * append's sketch is old + delta) and stored beside the version
  * manifest. Joins then plan from STORED stats — zero scans before the
  * decision, the way a cost-based optimizer consults its catalog.
  *
  * Layout: `root/_stats/v{N}.json` holds the version's row count and
  * one AGMS sketch per declared join-key column. The sidecar is written
  * AFTER the manifest commit: stats are advisory, so a crash between
  * the two leaves a valid version that merely falls back to on-demand
  * estimation ([[statsFor]] returns None and callers degrade
  * gracefully) — never the reverse (stats for a version that does not
  * exist).
  */
object VersionedStats {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def statsPath(root: String, v: Long) =
    new Path(new Path(root, "_stats"), s"v$v.json")

  /** Commit `df` as the next version of `root` AND write its stats
    * sidecar (row count + one AGMS sketch per key column) — computed in
    * ONE aggregate pass. The pass runs over the DELTA only whenever it
    * can: on an append whose previous version has stats for the same
    * keys, the new sidecar is stored-sketch + delta-sketch (element-wise
    * add — AGMS counters are exact sums, so the merged sidecar is
    * BIT-IDENTICAL to a from-scratch recompute) and stored-rows +
    * delta-rows. That is the 100 TB contract: stats maintenance costs
    * the batch, never the table. Returns the version. */
  def commitWithStats(df: DataFrame, root: String, keyCols: Seq[String],
                      counters: Int = 256,
                      append: Boolean = false): Long = {
    require(keyCols.nonEmpty, "declare at least one join-key column")
    val spark = df.sparkSession
    val prior =
      if (append) statsFor(spark, root).filter { case (_, sk) =>
        keyCols.forall(k => sk.get(k).exists(_.length == counters))
      } else None
    val v = VersionedTable.commit(df, root, append)
    // delta-only pass when prior stats merge; else the committed
    // snapshot (which IS the delta for a non-append commit)
    val scanned =
      if (prior.isDefined) df
      else VersionedTable.read(spark, root, Some(v))
    val aggs = keyCols.map(k =>
      JoinSizeSketch.agmsSketch(col(k), counters).as(s"__sk_$k")) :+
      count(lit(1)).as("__rows")
    val row = scanned.agg(aggs.head, aggs.tail: _*).head()
    val deltaRows = row.getLong(keyCols.length)
    val (rows, sketchOf) = prior match {
      case Some((priorRows, priorSk)) =>
        (priorRows + deltaRows, (k: String, i: Int) =>
          priorSk(k).zip(row.getSeq[Long](i)).map { case (a, b) => a + b })
      case None =>
        (deltaRows, (_: String, i: Int) => row.getSeq[Long](i))
    }
    val sketches = keyCols.zipWithIndex.map { case (k, i) =>
      s""""$k": [${sketchOf(k, i).mkString(",")}]"""
    }.mkString(",")
    val json = s"""{"rows": $rows, "sketches": {$sketches}}"""
    val p = statsPath(root, v)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    val out = f.create(p, false)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    v
  }

  /** Stored stats for a version (latest by default): (row count, sketch
    * per key column). None when the sidecar is missing — callers fall
    * back to on-demand estimation. */
  def statsFor(spark: SparkSession, root: String,
               version: Option[Long] = None)
      : Option[(Long, Map[String, Seq[Long]])] = {
    val vs = VersionedTable.versions(spark, root)
    if (vs.isEmpty) return None
    val v = version.getOrElse(vs.last)
    val p = statsPath(root, v)
    val f = fs(spark, p)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val json = try {
      val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
    val rows = "\"rows\":\\s*(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(return None)
    val sketches = "\"([^\"]+)\":\\s*\\[([-0-9,\\s]*)\\]".r
      .findAllMatchIn(json).map { m =>
        m.group(1) -> m.group(2).split(",").map(_.trim.toLong).toSeq
      }.toMap
    Some((rows, sketches))
  }

  /** Join two versioned tables planning from their STORED stats — no
    * scan happens before the physical strategy is chosen. Falls back to
    * [[EstimatedJoin.estimatedJoin]]'s on-demand sketching when either
    * sidecar is missing. The sketch hash family is deterministic, so
    * the stored-stats decision is bit-identical to the on-demand one. */
  def estimatedVersionedJoin(spark: SparkSession,
                             leftRoot: String, rightRoot: String,
                             leftKey: String, rightKey: String,
                             joinType: String = "inner",
                             broadcastMaxRows: Long = 10000000L,
                             fanoutCap: Double = 4.0)
      : (DataFrame, EstimatedJoin.JoinEstimate) = {
    val left = VersionedTable.read(spark, leftRoot)
    val right = VersionedTable.read(spark, rightRoot)
    (for {
      (nl, skl) <- statsFor(spark, leftRoot)
      sl <- skl.get(leftKey)
      (nr, skr) <- statsFor(spark, rightRoot)
      sr <- skr.get(rightKey)
    } yield {
      val e = EstimatedJoin.estimateFromSketches(sl, nl, sr, nr,
        broadcastMaxRows, fanoutCap)
      (EstimatedJoin.applyStrategy(left, right, leftKey, rightKey,
        joinType, e), e)
    }).getOrElse(EstimatedJoin.estimatedJoin(left, right, leftKey, rightKey,
      joinType, broadcastMaxRows, fanoutCap))
  }
}
