package graft

import org.apache.spark.sql.SparkSession

/** Driver bench harness: times every `SparkEntry.queries` entry on
  * `$SPARK_GRAFT_SF_DIR` at `local[$SPARK_GRAFT_CPUS]` and prints ONE JSON
  * line. A full warmup pass runs first (JIT + codegen caches + parquet
  * footer caches), then the timed pass — per-query numbers otherwise mostly
  * measure first-job session warmup.
  *
  * `cdc_replay` is the headline north-rule metric: decode+merge throughput
  * of a deterministic full+incremental snapshot stream into the lake table
  * (events/sec in `extra.cdc_replay_events_per_sec`; scaling efficiency
  * across parallelism levels is measured separately by graft.ScalingBench —
  * see BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup pass (not timed)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // timed pass
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline CDC replay throughput (generation excluded from timing)
    val work = java.nio.file.Files.createTempDirectory("graft-bench-cdc").toString
    val (fixtures, _) = graft.sources.SnapshotFixture.generateStream(
      seed = 42L, increments = 2,
      spec = graft.sources.SnapshotFixture.Spec(accountsPerVec = 800, pubkeyPool = 40000))
    fixtures.foreach(fx => graft.sources.SnapshotFixture.writeArchive(
      fx, s"$work/snap-${fx.manifest.slot}.tar.zst"))
    val events = fixtures.map(_.allRecords.size).sum
    val table = graft.streaming.SnapshotReplay.createTable(spark, s"$work/table", 16)
    val t0 = System.nanoTime()
    graft.streaming.SnapshotReplay.replayDir(spark, table, work)
    val replaySec = (System.nanoTime() - t0) / 1e9
    val replayThroughput = (events / replaySec).round

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + replaySec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""extra":{"cdc_replay_events":$events,"cdc_replay_sec":$replaySec,""" +
      s""""cdc_replay_events_per_sec":$replayThroughput},"sf":"$sfDir"}""")
    spark.stop()
  }
}
