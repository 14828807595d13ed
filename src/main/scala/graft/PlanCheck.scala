package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints formatted physical plans for selected
  * queries so scan pruning / pushdown / broadcast / codegen spans can be
  * reviewed (builder mandate: iterate on `.explain` until the plan is the
  * one you'd want at 100 TB). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_lww_dedup", "q03_manifest_join", "q06_owner_filter")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"========== $n ==========")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
