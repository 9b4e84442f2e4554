package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel tracking — the continuous twin of
  * [[graft.operators.Funnel]] (SURVEY.md §2.7 stateful ops): emit a row
  * the moment a user ADVANCES a stage, instead of recomputing the whole
  * funnel per batch run.
  *
  * State per user is one `Long` per stage (earliest committed completion
  * time) — O(stages), never a buffer of events. Each micro-batch folds
  * its events in event-time order: an event of type `stages(i)` advances
  * a user iff stage i is still open and stage i-1 committed strictly
  * earlier. Append-mode contract: completions are emitted at the first
  * observed qualifying event and never retracted — a late (in-watermark)
  * event with an earlier timestamp does not revise an already-emitted
  * completion, which is the standard streaming-funnel tradeoff vs the
  * batch operator's global min (batch and stream agree whenever events
  * arrive in event-time order across batches).
  */
object StreamingFunnel {

  final case class FunnelEvent(user_id: Long, ts: Timestamp,
                               event_type: String)
  /** `completed(i)` = epoch-millis of stage i's committed completion;
    * -1 = still open. */
  final case class FunnelState(completed: Seq[Long])
  final case class StageAdvance(user_id: Long, stage_idx: Int,
                                stage: String, ts: Timestamp)

  def trackFunnel(events: Dataset[FunnelEvent], stages: Seq[String],
                  watermark: String = "2 hours"): Dataset[StageAdvance] = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          val completed = state.getOption
            .map(_.completed.toArray)
            .getOrElse(Array.fill(stages.size)(-1L))
          val advances = Seq.newBuilder[StageAdvance]
          // fold in event-time order; only events typed as a stage matter
          it.toSeq.filter(e => stageIdx.contains(e.event_type))
            .sortBy(_.ts.getTime)
            .foreach { e =>
              val i = stageIdx(e.event_type)
              val t = e.ts.getTime
              val prevOk = i == 0 ||
                (completed(i - 1) >= 0 && completed(i - 1) < t)
              if (completed(i) < 0 && prevOk) {
                completed(i) = t
                advances += StageAdvance(user, i, stages(i), new Timestamp(t))
              }
            }
          val out = advances.result() // Builder.result() is single-shot
          if (out.nonEmpty) state.update(FunnelState(completed.toSeq))
          out.iterator
      }
  }
}
