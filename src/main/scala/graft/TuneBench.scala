package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.SnapshotReplay

/** Dev harness for the saturated-parallelism investigation (round-4 verdict
  * #6): replay the scaling input at a FIXED thread count under a matrix of
  * codec / caching configurations and print one wall per configuration —
  * the box ceiling is memory bandwidth, so the question each arm answers is
  * "does moving fewer (or cheaper) bytes buy the 16-thread level anything".
  *
  * Arms:
  *  - parquet write codec (snappy default vs zstd / lz4 / uncompressed):
  *    trades encode CPU against tmpfs write bandwidth;
  *  - shuffle codec (lz4 default vs zstd / snappy): same trade on the
  *    exchange;
  *  - merge-cache: persist the aligned batch so COW merges decode once
  *    (stats + write passes share it) at the cost of cache encode traffic.
  *
  * Usage: runMain graft.TuneBench [accountsPerVec] (default = the Bench
  * cdc_replay size). Env: SPARK_GRAFT_CPUS (default 16),
  * SPARK_GRAFT_TUNE_REPS (default 2), SPARK_GRAFT_TUNE_ARMS (comma list to
  * subset). Reps interleave across arms; per-arm result is the min.
  */
object TuneBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val accountsPerVec = if (args.nonEmpty) args(0).toInt else 128000
    val work = ScalingBench.defaultWorkDir("graft-tune")
    val total = ScalingBench.ensureInput(s"$work/input", accountsPerVec)
    val reps = sys.env.getOrElse("SPARK_GRAFT_TUNE_REPS", "2").toInt

    // (name, session confs, sysprops)
    val allArms: Seq[(String, Map[String, String], Map[String, String])] = Seq(
      ("base", Map.empty, Map.empty),
      ("parquet-zstd", Map("spark.sql.parquet.compression.codec" -> "zstd"), Map.empty),
      ("parquet-lz4", Map("spark.sql.parquet.compression.codec" -> "lz4"), Map.empty),
      ("parquet-uncompressed",
        Map("spark.sql.parquet.compression.codec" -> "uncompressed"), Map.empty),
      ("shuffle-zstd", Map("spark.io.compression.codec" -> "zstd"), Map.empty),
      ("shuffle-snappy", Map("spark.io.compression.codec" -> "snappy"), Map.empty),
      ("merge-cache", Map.empty, Map("graft.merge.cache" -> "1")))
    val subset = sys.env.get("SPARK_GRAFT_TUNE_ARMS").map(_.split(',').toSet)
    val arms = allArms.filter(a => subset.forall(_.contains(a._1)))
    require(arms.nonEmpty,
      s"SPARK_GRAFT_TUNE_ARMS matched no arm; valid: ${allArms.map(_._1).mkString(",")}")

    def run(name: String, confs: Map[String, String],
        props: Map[String, String]): Double = {
      props.foreach { case (k, v) => sys.props(k) = v }
      val builder = SparkSession.builder()
        .appName(s"graft-tune-$name")
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", s"$work/spark-local")
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", "8g")
      confs.foreach { case (k, v) => builder.config(k, v) }
      val spark = builder.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val tableDir = s"$work/table-$name-${System.nanoTime()}"
        val table = SnapshotReplay.createTable(spark, tableDir, numBuckets = 32)
        val t0 = System.nanoTime()
        Seq("snap-full", "snap-inc1", "snap-inc2").foreach { n =>
          SnapshotReplay.applySnapshot(spark, table, s"$work/input/$n")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
        System.err.println(f"[tune] $name sec=$sec%.2f")
        sec
      } finally {
        spark.stop()
        props.keys.foreach(sys.props.remove)
      }
    }

    run("warmup", Map.empty, Map.empty)
    val walls = (1 to reps).flatMap(_ => arms.map { case (n, c, p) => n -> run(n, c, p) })
    val best = arms.map { case (n, _, _) =>
      s""""$n":${f"${walls.filter(_._1 == n).map(_._2).min}%.2f"}"""
    }
    println(s"""{"metric":"tune_replay","cpus":$cpus,"events":$total,${best.mkString(",")}}""")
  }
}
