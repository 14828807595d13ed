package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** S9 — read-progress instrumentation (SURVEY.md §2.1; reference
  * `ReadProgressTracking`, lib.rs:92-107 + the indicatif bars in
  * main.rs:124-175). The reference wraps its manifest reader and bumps a
  * progress bar every read; the Spark-native translation is a
  * `SparkListener`: task-end read metrics (records + bytes) aggregated per
  * stage and reported at a bounded cadence — the same "update every N"
  * batching the reference applies to its counters (sqlite.rs:421-426).
  *
  * Attach with [[Progress.attach]]; `report` goes to stderr by default
  * (swap for a metrics sink in production). The streaming path additionally
  * exposes per-batch counters through the LakeTable lineage
  * (CdcPipeline `counterCols`).
  */
final class Progress(report: String => Unit = s => System.err.println(s"[graft-progress] $s"))
    extends SparkListener {

  private val records = new AtomicLong(0)
  private val bytes = new AtomicLong(0)
  private val lastReported = new AtomicLong(0)

  /** Report cadence in records (reference updates every 1024 rows). */
  final val Cadence = 1L << 20

  def recordsRead: Long = records.get()
  def bytesRead: Long = bytes.get()

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      val r = records.addAndGet(m.inputMetrics.recordsRead)
      bytes.addAndGet(m.inputMetrics.bytesRead)
      val last = lastReported.get()
      if (r - last >= Cadence && lastReported.compareAndSet(last, r))
        report(f"read $r%,d records (${bytes.get() / (1 << 20)}%,d MiB)")
    }
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val info = sc.stageInfo
    if (info.taskMetrics != null && info.taskMetrics.inputMetrics.recordsRead > 0)
      report(s"stage ${info.stageId} '${info.name.takeWhile(_ != '\n')}' done: " +
        f"${info.taskMetrics.inputMetrics.recordsRead}%,d records in ${info.numTasks} tasks")
  }
}

object Progress {
  /** Attach a fresh listener to the session; returns it for counter reads. */
  def attach(spark: SparkSession,
      report: String => Unit = s => System.err.println(s"[graft-progress] $s")): Progress = {
    val p = new Progress(report)
    spark.sparkContext.addSparkListener(p)
    p
  }
}
