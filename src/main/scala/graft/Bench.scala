package graft

import org.apache.spark.sql.SparkSession

/** Driver bench harness: times every `SparkEntry.queries` entry on
  * `$SPARK_GRAFT_SF_DIR` at `local[$SPARK_GRAFT_CPUS]` and prints ONE JSON
  * line. A full warmup pass runs first (JIT + codegen caches + parquet
  * footer caches), then the timed pass — per-query numbers otherwise mostly
  * measure first-job session warmup.
  *
  * `cdc_replay` is the headline north-rule metric: decode+merge throughput
  * of a deterministic full+incremental snapshot stream into the lake table.
  * It uses the SAME protocol as graft.ScalingBench: `$SPARK_GRAFT_BENCH_REPS`
  * (default 3) repetitions on fresh tables, headline = the FASTEST rep —
  * a single sample on this shared box can land on a co-tenant noise spike
  * (BENCH_r02's 113 s sample vs SCALING.json's 20-40 s band); per-rep walls
  * are recorded in `extra.cdc_replay_rep_secs` so outliers are visible.
  *
  * Query failures are NOT swallowed: a crashing query reports -1 seconds AND
  * lands in `extra.errors`, so a regression cannot ship a green-looking
  * artifact.
  */
object Bench {

  /** Drop state a finished query leaves in the shared JVM: localCheckpoint
    * blocks (connected components, IVF), lingering broadcasts, and GC debt.
    * 90+ back-to-back heterogeneous executions otherwise degrade later
    * timings 2-3× (measured: q23 7.5s in-sweep vs 2.1s isolated) — real
    * drivers don't run the whole suite in one session, so the harnesses run
    * this OUTSIDE the timed window to measure queries, not accumulation.
    * unpersist BLOCKS until the storage is actually dropped, so the
    * following GC reclaims it and none of the cleanup bleeds into the next
    * measurement. Shared by Bench and QueryBench so their numbers agree. */
  def drainSessionState(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // off-heap Tungsten pages: the replay's reduce stage is GC-bound
      // on-heap at high thread counts (see ScalingBench scaladoc)
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def note(name: String, e: Throwable): Unit = {
      val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
      errors.getOrElseUpdate(name, msg)
      System.err.println(s"[bench] $name FAILED: $msg")
    }

    def drainSessionState(): Unit = Bench.drainSessionState(spark)

    // warmup pass (not timed; failures still recorded)
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).count() catch { case e: Throwable => note(name, e) }
    }
    drainSessionState()
    // timed pass
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val r =
        try { fn(spark, sfDir).count(); name -> (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable => note(name, e); name -> -1.0 }
      drainSessionState()
      r
    }

    // headline CDC replay throughput: full + 2 incremental UNPACKED
    // snapshots in tmpfs (decode parallelism = vec count; archives are
    // sequential by format), sized so merge work dominates fixed per-batch
    // costs (12.3M events ≈ 3 GiB). Generation is excluded from timing and
    // cached in tmpfs across runs via a DONE marker. Headline = min of reps.
    val work = ScalingBench.defaultWorkDir("graft-bench-cdc")
    val perVec = sys.env.getOrElse("SPARK_GRAFT_BENCH_VEC", "128000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val events = ScalingBench.ensureInput(s"$work/input", perVec)
    def replayRun(rep: Int, mor: Boolean): (Double, Long) = {
      val tableDir = s"$work/table-$mor-$rep-${System.nanoTime()}"
      val table = graft.streaming.SnapshotReplay.createTable(spark, tableDir, 32)
      val t0 = System.nanoTime()
      Seq("snap-full", "snap-inc1", "snap-inc2").foreach { name =>
        graft.streaming.SnapshotReplay.applySnapshot(spark, table, s"$work/input/$name", mor = mor)
      }
      if (mor) table.compact() // same fully-resolved final state as COW
      val sec = (System.nanoTime() - t0) / 1e9
      val finalRows = table.read().count()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      System.err.println(f"[bench] cdc_replay(mor=$mor) rep $rep: $sec%.1fs (${(events / sec).round} ev/s)")
      (sec, finalRows)
    }
    // interleaved COW + MOR reps; headline stays the COW replay (round-over-
    // round comparability), the MOR ingest path is reported alongside
    val runs = (1 to reps).map(replayRun(_, mor = false))
    val morRuns = (1 to reps).map(replayRun(_, mor = true))
    require((runs ++ morRuns).map(_._2).distinct.size == 1,
      s"divergent final state across reps: ${(runs ++ morRuns).map(_._2)}")
    val replaySec = runs.map(_._1).min
    val morReplaySec = morRuns.map(_._1).min
    val finalRows = runs.head._2
    val replayThroughput = (events / replaySec).round
    val morReplayThroughput = (events / morReplaySec).round

    // full JSON string escape incl. control chars — exception messages
    // (e.g. AnalysisException plan fragments) routinely embed newlines, and
    // an invalid artifact exactly when a query FAILS would defeat the
    // errors field's purpose
    def jstr(s: String) = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val repSecs = runs.map(_._1).mkString("[", ",", "]")
    val total = results.map(_._2).sum + replaySec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""extra":{"cdc_replay_events":$events,"cdc_replay_sec":$replaySec,""" +
      s""""cdc_replay_events_per_sec":$replayThroughput,""" +
      s""""cdc_replay_mor_sec":$morReplaySec,""" +
      s""""cdc_replay_mor_events_per_sec":$morReplayThroughput,""" +
      s""""cdc_replay_mor_rep_secs":${morRuns.map(_._1).mkString("[", ",", "]")},""" +
      s""""cdc_replay_rep_secs":$repSecs,""" +
      s""""cdc_replay_final_rows":$finalRows,"errors":$errJson},"sf":"$sfDir"}""")
    spark.stop()
  }
}
