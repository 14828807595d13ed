package graft.tables.dsv2

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkTestBase
import graft.tables.LakeTable

class LakeBucketScanSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType.fromDDL("k STRING, wv BIGINT, v STRING")

  private def newTable(buckets: Int = 8): LakeTable =
    LakeTable.createOrOpen(spark, Files.createTempDirectory("lbscan").toString,
      schema, keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = buckets)

  private def scanDF(t: LakeTable, buckets: Seq[Int]): DataFrame =
    spark.read.format(LakeBucketSource.Name)
      .option("root", t.root)
      .option("version", t.currentVersion().toString)
      .option("buckets", buckets.mkString(","))
      .load()

  private def withSpjConfs[A](f: => A): A = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.shuffle.enabled")
    val old = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "true"))
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def executedPlan(df: DataFrame): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      // collect() does not descend into AQE's inner plan — unwrap it, else
      // every plan-shape assert is vacuously true
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def collectOverScan(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[ShuffleExchangeExec] = {
    // exchanges whose subtree contains the LakeBucketScan (= existing side)
    def containsScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.scan.isInstanceOf[LakeBucketScan] => b }.nonEmpty
    plan.collect { case s: ShuffleExchangeExec if containsScan(s.child) => s }
  }

  test("scan reads table rows with correct bucket ids, empty buckets included") {
    val t = newTable(buckets = 4)
    t.merge((0 until 32).map(i => (s"k$i", 1L, s"v$i")).toDF("k", "wv", "v"), "full")
    val df = scanDF(t, 0 until 4)
    assert(df.columns.toSeq === Seq("k", "wv", "v", "_gbucket"))
    assert(df.count() === 32L)
    // reported bucket equals the table's bucket function
    val bad = df.filter(
      col("_gbucket") =!= pmod(xxhash64(col("k")), lit(4)).cast("int")).count()
    assert(bad === 0L)
    // pruned scan: only requested buckets appear
    val some = scanDF(t, Seq(1, 2))
    assert(some.select("_gbucket").distinct().as[Int].collect().sorted.toSeq === Seq(1, 2))
    // a bucket with no files contributes an empty partition, not a failure
    val t2 = newTable(buckets = 4)
    assert(scanDF(t2, 0 until 4).count() === 0L)
  }

  test("storage-partitioned join: existing side stays unshuffled, batch side " +
      "shuffles into the scan's key-grouped partitioning") {
    val t = newTable(buckets = 4)
    t.merge((0 until 64).map(i => (s"k$i", 1L, s"v$i")).toDF("k", "wv", "v"), "full")
    withSpjConfs {
      // forbid broadcast so the assertion exercises the real at-scale shape
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val existing = scanDF(t, 0 until 4)
        val batch = (0 until 8).map(i => (s"k$i", 2L, s"b$i")).toDF("k", "wv", "v")
          .withColumn("_gbucket", pmod(xxhash64(col("k")), lit(4)).cast("int"))
        val joined = existing.as("e").join(batch.as("b"),
          Seq("k", "_gbucket"), "full_outer")
        val plan = executedPlan(joined)
        assert(collectOverScan(plan).isEmpty,
          s"existing side was shuffled:\n${plan.treeString}")
        // it IS a sort-merge join fed by exactly one exchange (the batch
        // side shuffling into the scan's KeyGroupedPartitioning), not a
        // broadcast that would vacuously satisfy the no-shuffle assert
        assert(plan.collect {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        }.nonEmpty, s"expected SMJ:\n${plan.treeString}")
        val allShuffles = plan.collect { case s: ShuffleExchangeExec => s }
        assert(allShuffles.size === 1, s"expected ONE shuffle (batch side):\n${plan.treeString}")
        assert(allShuffles.head.outputPartitioning.toString.contains("keygroupedpartitioning") ||
          allShuffles.head.outputPartitioning.getClass.getSimpleName
            .toLowerCase.contains("keygrouped"),
          s"batch side not shuffled into KeyGroupedPartitioning: " +
            s"${allShuffles.head.outputPartitioning}")
        // the join result is correct
        assert(joined.count() === 64L)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
  }
}
