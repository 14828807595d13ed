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

    // headline CDC replay throughput: full + 2 incremental UNPACKED
    // snapshots in tmpfs (decode parallelism = vec count; archives are
    // sequential by format), sized so merge work dominates fixed per-batch
    // costs (12.3M events ≈ 3 GiB; ≥ 60 s at the scaling bench's local[4],
    // see SCALING.json). Generation is excluded from timing and cached in
    // tmpfs across runs via a DONE marker.
    val work = ScalingBench.defaultWorkDir("graft-bench-cdc")
    val perVec = sys.env.getOrElse("SPARK_GRAFT_BENCH_VEC", "128000").toInt
    val events = ScalingBench.ensureInput(s"$work/input", perVec)
    val tableDir = s"$work/table-${System.nanoTime()}"
    val table = graft.streaming.SnapshotReplay.createTable(spark, tableDir, 32)
    val t0 = System.nanoTime()
    Seq("snap-full", "snap-inc1", "snap-inc2").foreach { name =>
      graft.streaming.SnapshotReplay.applySnapshot(spark, table, s"$work/input/$name")
    }
    val replaySec = (System.nanoTime() - t0) / 1e9
    val finalRows = table.read().count()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
    val replayThroughput = (events / replaySec).round

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + replaySec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""extra":{"cdc_replay_events":$events,"cdc_replay_sec":$replaySec,""" +
      s""""cdc_replay_events_per_sec":$replayThroughput,""" +
      s""""cdc_replay_final_rows":$finalRows},"sf":"$sfDir"}""")
    spark.stop()
  }
}
