package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.tables.LakeTable

/** Structured-Streaming CDC driver (SURVEY.md §7 module 6; north rule):
  * a change stream tailed from a directory → exactly-once LWW MERGE into a
  * [[LakeTable]] under `foreachBatch`.
  *
  * Exactly-once story: Spark's checkpoint gives at-least-once re-delivery of
  * each micro-batch with a stable monotonic `batchId`; the table's
  * `(pipelineId → batchId)` txn watermark makes the MERGE idempotent — a
  * re-delivered batch after crash/restart is a no-op, and the bookkeeping is
  * O(#pipelines), not O(#batches). Per-batch counters (rows_in, upserts +
  * caller-supplied dead-letter/enrichment counters, ≙ the reference's
  * running counters sqlite.rs:404-435) land in the table snapshot lineage.
  */
object CdcPipeline {

  /** Tail `changeDir` (parquet change-event files) into `table`.
    *
    * @param pipelineId stable id scoping batch ids across checkpoints —
    *                   MUST change if `checkpointDir` is wiped, must not
    *                   change across resumes of the same checkpoint.
    * @param maxFilesPerTrigger backpressure (≙ the reference's bounded
    *                   channel, parallel.rs:23)
    * @param mor ingest micro-batches MERGE-ON-READ: each batch appends a
    *                   layer (write ∝ batch) instead of rewriting touched
    *                   buckets (write ∝ table) — the difference between a
    *                   sustainable high-frequency upsert stream and one
    *                   whose per-batch cost grows with the table
    * @param compactEveryBatches with `mor`, run `table.compact()` after
    *                   every N batches (bounds read-time layer debt);
    *                   `None` leaves compaction to the caller
    */
  def start(
      spark: SparkSession,
      table: LakeTable,
      changeDir: String,
      changeSchema: StructType,
      checkpointDir: String,
      pipelineId: String,
      salted: Boolean = false,
      maxFilesPerTrigger: Int = 64,
      availableNow: Boolean = true,
      counterCols: Map[String, org.apache.spark.sql.Column] = Map.empty,
      autoExpireKeepVersions: Option[Int] = Some(8),
      mor: Boolean = false,
      compactEveryBatches: Option[Int] = Some(16)): StreamingQuery = {
    val stream = spark.readStream
      .schema(changeSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(changeDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("500 milliseconds"))
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        table.merge(df, s"$pipelineId-$batchId", salted = salted,
          txn = Some((pipelineId, batchId)), counterCols = counterCols, mor = mor)
        // periodic MOR debt collection (idempotent; a compaction interrupted
        // before its commit simply re-runs after the next batch)
        if (mor) compactEveryBatches.foreach { n =>
          if (n > 0 && batchId % n == n - 1) table.compact()
        }
        // long-running CDC self-maintains: retire snapshots/commit dirs
        // beyond the retention window after every merge (cheap driver-side
        // fs work; single writer, so always safe here)
        autoExpireKeepVersions.foreach(k => table.expire(k))
        () // discard count: Unit-returning closure keeps the 2.13 overload unambiguous
      }
      .start()
  }

  /** Run one AvailableNow pass to completion (tests / batch-replay mode). */
  def runOnce(
      spark: SparkSession,
      table: LakeTable,
      changeDir: String,
      changeSchema: StructType,
      checkpointDir: String,
      pipelineId: String,
      salted: Boolean = false,
      maxFilesPerTrigger: Int = 64,
      counterCols: Map[String, org.apache.spark.sql.Column] = Map.empty,
      autoExpireKeepVersions: Option[Int] = Some(8),
      mor: Boolean = false,
      compactEveryBatches: Option[Int] = Some(16)): Unit = {
    val q = start(spark, table, changeDir, changeSchema, checkpointDir, pipelineId,
      salted = salted, maxFilesPerTrigger = maxFilesPerTrigger,
      counterCols = counterCols,
      autoExpireKeepVersions = autoExpireKeepVersions,
      mor = mor, compactEveryBatches = compactEveryBatches)
    q.awaitTermination()
    // an AvailableNow run can terminate between periodic compaction
    // boundaries; a bounded run must not leave layer debt behind (callers of
    // start() own their final compaction — a live stream has no "end")
    if (mor) table.compact()
  }
}
