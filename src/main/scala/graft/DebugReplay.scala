package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.SnapshotReplay

/** Scratch profiling main (not part of the driver contract). */
object DebugReplay {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "8"
    val inputDir = sys.env.getOrElse("GRAFT_INPUT", "/dev/shm/graft-scaling/input")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val table = SnapshotReplay.createTable(spark,
      s"/dev/shm/graft-dbg-table-${System.nanoTime()}", numBuckets = 32)
    Seq("snap-full", "snap-inc1", "snap-inc2").foreach { name =>
      val t0 = System.nanoTime()
      val n = SnapshotReplay.applySnapshot(spark, table, s"$inputDir/$name", salted = false)
      println(f"[dbg] $name upserts=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    // decode-only baseline
    val t0 = System.nanoTime()
    val cnt = graft.sources.SnapshotSource.open(spark, s"$inputDir/snap-full")
      .accountUpdates(spark).count()
    println(f"[dbg] decode-only full snapshot rows=$cnt sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
