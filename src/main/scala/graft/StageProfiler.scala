package graft

import scala.collection.mutable

import org.apache.spark.scheduler._

/** Dev-time stage profiler (enable with `GRAFT_STAGE_PROFILE=1` in
  * ScalingBench/SkewBench): per-stage wall clock, summed task time, GC time,
  * input/output and shuffle bytes — the data behind BASELINE.md's
  * phase-scaling decomposition (which replay stage stops scaling, and
  * whether it is compute, GC, or bytes-bound). */
final class StageProfiler extends SparkListener {

  final private class S {
    var name: String = ""
    var submitted: Long = 0L
    var taskMs: Long = 0L
    var gcMs: Long = 0L
    var shufWrite: Long = 0L
    var shufRead: Long = 0L
    var outBytes: Long = 0L
    var inBytes: Long = 0L
    var tasks: Int = 0
  }

  private val stages = mutable.HashMap[Int, S]()

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = synchronized {
    val s = stages.getOrElseUpdate(e.stageInfo.stageId, new S)
    s.name = e.stageInfo.name
    s.submitted = System.currentTimeMillis()
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
    val s = stages.getOrElseUpdate(e.stageId, new S)
    val m = e.taskMetrics
    if (m != null) {
      s.taskMs += m.executorRunTime
      s.gcMs += m.jvmGCTime
      s.shufWrite += m.shuffleWriteMetrics.bytesWritten
      s.shufRead += m.shuffleReadMetrics.totalBytesRead
      s.outBytes += m.outputMetrics.bytesWritten
      s.inBytes += m.inputMetrics.bytesRead
      s.tasks += 1
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
    val s = stages.getOrElseUpdate(e.stageInfo.stageId, new S)
    val wall = (System.currentTimeMillis() - s.submitted) / 1e3
    def mb(b: Long) = f"${b / 1048576.0}%.0f"
    System.err.println(
      f"[stage ${e.stageInfo.stageId}%3d] wall=$wall%6.2fs task=${s.taskMs / 1e3}%7.1fs " +
        f"gc=${s.gcMs / 1e3}%5.1fs in=${mb(s.inBytes)}MB out=${mb(s.outBytes)}MB " +
        f"sw=${mb(s.shufWrite)}MB sr=${mb(s.shufRead)}MB n=${s.tasks}%3d " +
        s.name.take(70))
  }
}

object StageProfiler {
  /** Attach when `GRAFT_STAGE_PROFILE=1`. */
  def maybeAttach(spark: org.apache.spark.sql.SparkSession): Unit =
    if (sys.env.get("GRAFT_STAGE_PROFILE").contains("1"))
      spark.sparkContext.addSparkListener(new StageProfiler)
}
