package graft.tables.dsv2

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.SparkTestBase
import graft.tables.LakeTable

/** The standard `writeStream.format("lake")` sink: every micro-batch is an
  * exactly-LWW merge, batch ids ride the table's txn watermark, so crashed /
  * wiped-checkpoint re-deliveries are commit-free no-ops. */
class LakeSinkSpec extends SparkTestBase {

  private val schema = StructType.fromDDL("k BIGINT, v BIGINT, payload STRING")

  private def writeWave(dir: String, rows: Seq[(Long, Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("k", "v", "payload").coalesce(1).write.mode("append").parquet(dir)
  }

  private def drain(inDir: String, root: String, ckpt: String,
      extra: Map[String, String] = Map.empty): Unit = {
    val w = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .writeStream.format("lake") // service-registry shortName
      .option("root", root)
      .option("checkpointLocation", ckpt)
      .option("keys", "k").option("orders", "v")
      .trigger(Trigger.AvailableNow())
    extra.foreach { case (k, v) => w.option(k, v) }
    w.start().awaitTermination()
  }

  private def state(root: String): Map[Long, (Long, String)] =
    LakeTable.open(spark, root).read()
      .select(col("k"), col("v"), col("payload")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("micro-batches merge LWW; resume applies only new files; " +
      "a wiped checkpoint re-delivers as watermarked no-ops") {
    val work = Files.createTempDirectory("lakesink").toString
    val (in, root, ckpt) = (s"$work/in", s"$work/table", s"$work/ckpt")

    writeWave(in, Seq((1L, 10L, "a"), (2L, 10L, "b")))
    writeWave(in, Seq((1L, 20L, "a2"), (3L, 10L, "c")))
    drain(in, root, ckpt)
    assert(state(root) === Map(1L -> (20L, "a2"), 2L -> (10L, "b"), 3L -> (10L, "c")))

    // resume with nothing new: no batches, no commits
    val v1 = LakeTable.open(spark, root).currentVersion()
    drain(in, root, ckpt)
    assert(LakeTable.open(spark, root).currentVersion() === v1)

    // resume with one new file: exactly the new data lands (an OLD row for
    // k=1 arriving late loses to the stored LWW winner)
    writeWave(in, Seq((1L, 5L, "stale"), (4L, 10L, "d")))
    drain(in, root, ckpt)
    val s2 = state(root)
    assert(s2(1L) === ((20L, "a2")) && s2(4L) === ((10L, "d")))

    // wiped checkpoint: the engine re-delivers every file under fresh batch
    // ids 0..n, all ≤ the recorded (txnApp, batchId) watermark for this
    // checkpoint path — every merge must no-op, state and version unchanged
    val v2 = LakeTable.open(spark, root).currentVersion()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    drain(in, root, ckpt)
    assert(LakeTable.open(spark, root).currentVersion() === v2)
    assert(state(root) === s2)
  }

  test("mor mode converges to the identical state and compacts on schedule") {
    val work = Files.createTempDirectory("lakesinkmor").toString
    val in = s"$work/in"
    writeWave(in, Seq((1L, 10L, "a"), (2L, 10L, "b")))
    writeWave(in, Seq((1L, 20L, "a2"), (2L, 5L, "stale")))
    writeWave(in, Seq((3L, 10L, "c")))
    drain(in, s"$work/cow", s"$work/ckptCow")
    drain(in, s"$work/mor", s"$work/ckptMor",
      Map("mor" -> "true", "compactEvery" -> "2"))
    assert(state(s"$work/mor") === state(s"$work/cow"))
    // batch id 1 hit the compactEvery=2 boundary, so at most the final
    // batch's layer debt can be outstanding
    assert(LakeTable.open(spark, s"$work/mor").snapshot().morBuckets.size <= 16)
    // boolean options parse case-insensitively ("True" must not silently
    // fall back to copy-on-write) and reject garbage loudly
    drain(in, s"$work/morTitle", s"$work/ckptTitle", Map("mor" -> "True"))
    assert(state(s"$work/morTitle") === state(s"$work/cow"))
    intercept[Exception] {
      drain(in, s"$work/morBad", s"$work/ckptBad", Map("mor" -> "yes"))
    }
  }

  test("create-on-first-batch honors the sort/targetFileRows write options " +
      "(option keys are lowercased by the provider — a mixed-case lookup " +
      "would silently drop them)") {
    val work = Files.createTempDirectory("lakesink-sort").toString
    writeWave(s"$work/in", Seq((1L, 10L, "a"), (2L, 10L, "b")))
    drain(s"$work/in", s"$work/table", s"$work/ckpt",
      Map("sort" -> "v", "targetFileRows" -> "1000"))
    val snap = LakeTable.open(spark, s"$work/table").snapshot()
    assert(snap.sortOrder === Seq("v"))
    assert(snap.targetFileRows === 1000L)
  }

  test("option validation fails loudly") {
    val provider = new LakeSinkProvider
    val ctx = spark.sqlContext
    intercept[IllegalArgumentException] {
      provider.createSink(ctx, Map("root" -> "/tmp/x"), Nil, OutputMode.Complete())
    }
    intercept[IllegalArgumentException] {
      provider.createSink(ctx, Map("root" -> "/tmp/x"), Seq("k"), OutputMode.Append())
    }
    intercept[IllegalArgumentException] {
      provider.createSink(ctx, Map.empty, Nil, OutputMode.Append())
    }
    // creating a table through the sink requires the key/order layout
    val work = Files.createTempDirectory("lakesinkerr").toString
    writeWave(s"$work/in", Seq((1L, 10L, "a")))
    val q = spark.readStream.schema(schema).parquet(s"$work/in")
      .writeStream.format("lake")
      .option("root", s"$work/table")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(err.getMessage.contains("keys") ||
      Option(err.getCause).exists(_.getMessage.contains("keys")))
  }
}
