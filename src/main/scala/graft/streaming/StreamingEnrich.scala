package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming dimension enrichment — events joined to the LATEST KNOWN
  * version of a slowly-changing dimension, per key, with O(1) state: the
  * continuous counterpart of the batch as-of join
  * ([[graft.operators.AsOf]]) for the "enrich clicks with the user's
  * current profile" pattern the reference runs as a batch merge per hour
  * (dags/etl/kpi_processor.py:59).
  *
  * Both inputs ride ONE keyed stateful operator: dimension updates and
  * events union into a single stream, group by key, and each micro-batch
  * folds its rows in event-time order — a dim row updates the state iff
  * it is newer than the held version; an event row emits enriched with
  * the state at its position in the fold. State per key is exactly one
  * dimension version (the latest), never a buffer.
  *
  * Semantics contract (the honest streaming tradeoff, same family as
  * [[StreamingFunnel]]): WITHIN a micro-batch the fold is exact
  * event-time as-of; ACROSS batches it is as-of-what-has-arrived — a dim
  * update arriving in a later batch than an event it precedes in event
  * time does not retroactively re-enrich (append mode never retracts).
  * Batch [[graft.operators.AsOf]] gives the exact retrospective answer;
  * this gives the low-latency flowing one.
  */
object StreamingEnrich {

  /** One input row: a dimension update (`dim_value` set, `is_dim` true)
    * or an event (`payload` set). */
  final case class EnrichInput(key: Long, ts: Timestamp, is_dim: Boolean,
                               dim_value: String, payload: Double)

  /** Latest dimension version held per key. */
  final case class DimState(ts: Long, value: String)

  final case class Enriched(key: Long, ts: Timestamp, payload: Double,
                            dim_value: Option[String], dim_ts: Option[Timestamp])

  /** Tag + union helper: build the single input stream from separate
    * event and dim-update streams. */
  def union(events: Dataset[(Long, Timestamp, Double)],
            dimUpdates: Dataset[(Long, Timestamp, String)]): Dataset[EnrichInput] = {
    val spark = events.sparkSession
    import spark.implicits._
    val e = events.map { case (k, ts, p) =>
      EnrichInput(k, ts, is_dim = false, dim_value = null, payload = p) }
    val d = dimUpdates.map { case (k, ts, v) =>
      EnrichInput(k, ts, is_dim = true, dim_value = v, payload = 0.0) }
    e.unionByName(d)
  }

  /** Enrich the unioned stream: events emit with the latest dim version
    * at their fold position; `null` dim fields when no version has
    * arrived yet (emit-always — a quality filter downstream can drop
    * un-enriched rows, mirroring the batch left join). */
  def latestDimEnrich(input: Dataset[EnrichInput]): Dataset[Enriched] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .groupByKey(_.key)
      .flatMapGroupsWithState[DimState, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[EnrichInput], state: GroupState[DimState]) =>
          var held = state.getOption.orNull
          val out = Seq.newBuilder[Enriched]
          // event-time fold; dim updates sort before events on ties so a
          // same-timestamp profile change is visible to the event
          it.toSeq.sortBy(r => (r.ts.getTime, !r.is_dim)).foreach { r =>
            if (r.is_dim) {
              if (held == null || r.ts.getTime >= held.ts)
                held = DimState(r.ts.getTime, r.dim_value)
            } else {
              out += Enriched(key, r.ts, r.payload,
                Option(held).map(_.value),
                Option(held).map(h => new Timestamp(h.ts)))
            }
          }
          if (held != null) state.update(held)
          out.result().iterator
      }
  }
}
