package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.etl.model.{AccountUpdate, RepoFileChange}
import graft.streaming.PushSink

class StreamOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("windowed counts with watermark over a real stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Long)]
    val df = mem.toDF().toDF("ts", "event_type", "user_id")
    val out = StreamOps.windowedEventCounts(df, windowLen = "10 minutes",
      slide = "10 minutes", watermarkDelay = "5 minutes")
    val q = out.writeStream.format("memory").queryName("winagg")
      .outputMode(OutputMode.Append()).start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    mem.addData((ts(1), "click", 1L), (ts(2), "click", 2L), (ts(5), "view", 1L))
    q.processAllAvailable()
    // advance watermark far enough to close the 10:00 window
    mem.addData((ts(59), "click", 3L))
    q.processAllAvailable()
    mem.addData((ts(59), "click", 4L)) // nudge commit of closed windows
    q.processAllAvailable()
    val rows = spark.table("winagg")
      .select(col("window_start").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    q.stop()
    assert(rows.contains(("2024-01-01 10:00:00", "click", 2L)))
    assert(rows.contains(("2024-01-01 10:00:00", "view", 1L)))
  }

  test("statefulLww emits only state-advancing changes across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RepoFileChange]
    val out = StreamOps.statefulLww(mem.toDS())
    val cp = Files.createTempDirectory("lww-cp").toString
    val q = out.writeStream.format("memory").queryName("lwwstream")
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append()).start()
    def chg(path: String, seq: Long, content: String) =
      RepoFileChange("r1", path, s"c$seq", seq, "scala", content)
    mem.addData(chg("a", 1, "v1"), chg("a", 3, "v3"), chg("b", 1, "b1"))
    q.processAllAvailable()
    mem.addData(chg("a", 2, "stale"), chg("b", 2, "b2")) // a@2 must NOT emit
    q.processAllAvailable()
    val rows = spark.table("lwwstream").as[RepoFileChange].collect()
      .map(c => (c.path, c.commitSeq)).sorted.toSeq
    q.stop()
    assert(rows === Seq(("a", 3L), ("b", 1L), ("b", 2L)))
  }

  test("push sink delivers every row through the handler lifecycle (K3)") {
    val recs = (1 to 10).map(i => AccountUpdate(
      graft.sources.SnapshotFixture.pkFromLong(i.toLong), 1L, i.toLong, 0L,
      graft.sources.SnapshotFixture.pkFromLong(99L), i * 10L, false, 7L,
      graft.sources.SnapshotFixture.pkFromLong(0L), Array.emptyByteArray))
    val ds = spark.createDataset(recs)
    PushSink.push(ds, CollectingHandler)
    assert(CollectingHandler.seen.size === 10)
    assert(CollectingHandler.loads.get() > 0)
    assert(CollectingHandler.unloads.get() === CollectingHandler.loads.get())
  }
}

/** Must be an object: executed on executor threads of local mode. */
object CollectingHandler extends graft.streaming.AccountPushHandler {
  val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
  val loads = new java.util.concurrent.atomic.AtomicInteger()
  val unloads = new java.util.concurrent.atomic.AtomicInteger()
  override def onLoad(pid: Long): Unit = { loads.incrementAndGet(); () }
  override def updateAccount(u: graft.etl.model.AccountUpdate, isStartup: Boolean): Unit = {
    seen.add(u.writeVersion); ()
  }
  override def onUnload(): Unit = { unloads.incrementAndGet(); () }
}
