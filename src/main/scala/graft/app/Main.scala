package graft.app

import org.apache.spark.sql.SparkSession

import graft.operators.{Enrich, OpcodeStats, Programs}
import graft.streaming.SnapshotReplay

/** spark-submit entry point mirroring the reference CLI
  * (/root/reference/src/bin/solana-snapshot-etl/main.rs:25-47): one snapshot
  * source, exactly ONE sink mode per run (ArgGroup semantics, main.rs:27-31).
  *
  * Usage:
  *   graft.app.Main <snapshot-path-or-dir> --table-out DIR [--buckets N]
  *   graft.app.Main <snapshot>             --csv-out DIR
  *   graft.app.Main <snapshot>             --programs-out DIR
  *   graft.app.Main <programs-dir-table>   --opcode-stats-out DIR
  *   graft.app.Main <replay-dir>           --replay-table DIR   (full+incs)
  *
  * Source dispatch (http(s) URL vs dir vs .tar.zst archive) follows
  * main.rs:183-213; HTTP bodies stream straight into the archive decoder
  * (tested against a localhost server — the sandbox has no egress).
  */
object Main {

  def main(args: Array[String]): Unit = {
    if (args.length < 3) { System.err.println(usage); sys.exit(2) }
    val source = args(0)
    val mode = args(1)
    val out = args(2)
    val buckets = args.drop(3).sliding(2).collectFirst {
      case Array("--buckets", n) => n.toInt
    }.getOrElse(64)

    // embedded callers (tests, notebooks) keep their session; only a
    // session this CLI itself created is stopped on exit
    val preExisting = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = SparkSession.builder()
      .appName("graft-etl")
      // spark-submit injects spark.master as a system property; standalone
      // runs (tests, runMain) fall back to local
      .master(sys.props.getOrElse("spark.master", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // S9: read-progress reporting (≙ ReadProgressTracking, lib.rs:92-107)
    graft.streaming.Progress.attach(spark)

    try mode match {
      case "--table-out" => // flagship: K1 keyed-upsert table (≙ --sqlite-out)
        val table = SnapshotReplay.createTable(spark, out, buckets)
        val n = SnapshotReplay.applySnapshot(spark, table, source)
        System.err.println(s"[graft] $n upserts -> $out (version ${table.currentVersion()})")
      case "--replay-table" => // full + incrementals CDC replay
        val table = SnapshotReplay.createTable(spark, out, buckets)
        val n = SnapshotReplay.replayDir(spark, table, source)
        System.err.println(s"[graft] replayed $n upserts -> $out")
      case "--csv-out" => // K2: duplicates preserved, base58 keys (csv.rs)
        val accounts = graft.sources.SnapshotSource.open(spark, source).accountUpdates(spark)
        Enrich.csvProjection(SnapshotReplay.toDF(accounts))
          .write.option("header", "true").mode("overwrite").csv(out)
      case "--programs-out" => // K4: one <base58>.so per program (programs.rs)
        val accounts = graft.sources.SnapshotSource.open(spark, source).accountUpdates(spark)
        Programs.writeProgramsDir(Programs.programs(SnapshotReplay.toDF(accounts)), out)
      case "--programs-tar" => // K4 tar form: ustar of <base58>.so, mode 0644
        val accounts = graft.sources.SnapshotSource.open(spark, source).accountUpdates(spark)
        Programs.writeProgramsTar(Programs.programs(SnapshotReplay.toDF(accounts)), out)
      case "--geyser" => // K3: plugin push (geyser_plugin.rs:25-60); out = config json
        val handler = graft.streaming.GeyserPluginLoader.load(out)
        val accounts = graft.sources.SnapshotSource.open(spark, source).accountUpdates(spark)
        graft.streaming.PushSink.push(accounts, handler, isStartup = false)
      case "--opcode-stats-out" => // solana-opcode-stats main; source is a
        // programs tar (the reference pipes --programs-out into its stdin,
        // solana-opcode-stats/main.rs:30-53) or a snapshot to scan directly
        val programs =
          if (source.endsWith(".tar")) Programs.readProgramsTar(spark, Seq(source))
          else Programs.programs(SnapshotReplay.toDF(
            graft.sources.SnapshotSource.open(spark, source).accountUpdates(spark)))
        OpcodeStats.histogram(programs)
          .coalesce(1).write.option("header", "true").mode("overwrite").csv(out)
      case other =>
        System.err.println(s"unknown sink mode $other\n$usage"); sys.exit(2)
    } finally if (preExisting.isEmpty) spark.stop()
  }

  private val usage: String =
    """usage: graft.app.Main <snapshot|dir|programs.tar> <sink-mode> <out> [--buckets N]
      |  sink-mode: --table-out | --replay-table | --csv-out | --programs-out
      |           | --programs-tar | --opcode-stats-out | --geyser
      |  exactly one sink mode per run (reference main.rs:27-31);
      |  --opcode-stats-out accepts a --programs-tar output as its source
      |  (≙ the reference's programs-tar → opcode-stats stdin pipe)""".stripMargin
}
