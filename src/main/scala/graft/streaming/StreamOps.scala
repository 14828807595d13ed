package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.etl.model.RepoFileChange

/** Structured-Streaming operators beyond the CDC merge (builder mandate:
  * watermarks + windowed aggs; `mapGroupsWithState` for custom state).
  *
  * The reference is a bounded batch tool (SURVEY.md §2.9); these are the
  * streaming-native forms its semantics take in this engine.
  */
object StreamOps {

  /** Event-time windowed counts with a watermark: late rows beyond
    * `watermarkDelay` are dropped, state for closed windows is evicted —
    * the standard unbounded-stream aggregation shape (works identically on
    * a batch DataFrame, where the watermark is a no-op). */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowLen: String = "10 minutes",
      slide: String = "10 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n"), approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"), col("approx_users"))

  /** Streaming LWW dedup via `mapGroupsWithState`: per key `(repo, path)`
    * keep the max `commitSeq` seen; emit a row only when the incoming change
    * advances the state (CDC dedupe-before-sink). State is one Long per key
    * — the minimal stateful-operator shape for the north rule's
    * change-stream tail. `GroupStateTimeout.NoTimeout` keeps keys forever;
    * swap for event-time timeout when keys are evictable. */
  def statefulLww(
      changes: Dataset[RepoFileChange]): Dataset[RepoFileChange] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(c => (c.repo, c.path))
      .flatMapGroupsWithState[Long, RepoFileChange](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[Long]) =>
          val prevMax = state.getOption.getOrElse(Long.MinValue)
          // within the micro-batch: keep only the winning change, and only
          // if it beats the stored state
          val best = rows.maxBy(_.commitSeq)
          if (best.commitSeq > prevMax) {
            state.update(best.commitSeq)
            Iterator.single(best)
          } else Iterator.empty
      }
  }
}
