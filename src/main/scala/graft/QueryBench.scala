package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time ONE `SparkEntry.queries` entry repeatedly.
  * Usage: runMain graft.QueryBench <queryName> [reps] — honors
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / GRAFT_STAGE_PROFILE. */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StageProfiler.maybeAttach(spark)
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      System.err.println(f"[qbench] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
