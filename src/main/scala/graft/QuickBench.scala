package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected `SparkEntry.queries` by name (args) on
  * `$SPARK_GRAFT_SF_DIR` (default sf0.1). One warmup + one timed run each.
  * Usage: sbt "runMain graft.QuickBench q24_ngram_jaccard q29_winnow_dedup"
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val w0 = System.nanoTime()
      val warmRows = fn(spark, sfDir).count()
      val warm = (System.nanoTime() - w0) / 1e9
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[quickbench] $name rows=$rows warm=$warm%.2fs timed=$sec%.2fs")
    }
    spark.stop()
  }
}
