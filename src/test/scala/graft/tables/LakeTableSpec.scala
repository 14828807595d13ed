package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

class LakeTableSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType.fromDDL("k STRING, wv BIGINT, v STRING")

  private def newTable(buckets: Int = 8): LakeTable =
    LakeTable.createOrOpen(spark, Files.createTempDirectory("laketbl").toString,
      schema, keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = buckets)

  test("merge applies LWW upserts across batches") {
    val t = newTable()
    assert(t.merge(Seq(("a", 1L, "a1"), ("b", 1L, "b1")).toDF("k", "wv", "v"), "b1") === 2L)
    // 3 incoming rows dedup to 2 upserts (a@2 beats a@0 in-batch)
    assert(t.merge(Seq(("a", 2L, "a2"), ("c", 3L, "c1"), ("a", 0L, "stale")).toDF("k", "wv", "v"), "b2") === 2L)
    val state = t.read().as[(String, Long, String)].collect().sortBy(_._1)
    // a: wv2 wins in-batch and over table's wv1; stale wv0 loses
    assert(state.toSeq === Seq(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 3L, "c1")))
    assert(t.snapshot().rowCount === 3L)
  }

  test("re-delivered batch id is a no-op (exactly-once)") {
    val t = newTable()
    t.merge(Seq(("a", 1L, "a1")).toDF("k", "wv", "v"), "batch-1")
    val v = t.currentVersion()
    assert(t.merge(Seq(("a", 99L, "SHOULD NOT APPLY")).toDF("k", "wv", "v"), "batch-1") === 0L)
    assert(t.currentVersion() === v)
    assert(t.read().as[(String, Long, String)].collect().toSeq === Seq(("a", 1L, "a1")))
  }

  test("stale updates never regress table state (MERGE condition)") {
    val t = newTable()
    t.merge(Seq(("a", 5L, "new")).toDF("k", "wv", "v"), "b1")
    t.merge(Seq(("a", 3L, "old")).toDF("k", "wv", "v"), "b2")
    assert(t.read().as[(String, Long, String)].collect().toSeq === Seq(("a", 5L, "new")))
  }

  test("bucket pruning: untouched buckets carry files forward unchanged") {
    val t = newTable(buckets = 8)
    val big = (0 until 64).map(i => (s"k$i", 1L, s"v$i"))
    t.merge(big.toDF("k", "wv", "v"), "full")
    val before = t.snapshot().bucketFiles
    // single-key delta: touches exactly one bucket
    t.merge(Seq(("k7", 2L, "v7b")).toDF("k", "wv", "v"), "delta")
    val after = t.snapshot()
    val touched = after.lineage("delta")._2
    assert(touched.size === 1)
    before.foreach { case (b, files) =>
      if (!touched.contains(b)) assert(after.bucketFiles(b) === files, s"bucket $b rewritten")
      else assert(after.bucketFiles(b) !== files)
    }
    val k7 = t.read().as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap.apply("k7")
    assert(k7 === ((2L, "v7b")))
    assert(after.rowCount === 64L)
  }

  test("schema evolution: new nullable columns without rewrite") {
    val t = newTable()
    t.merge(Seq(("a", 1L, "a1"), ("b", 1L, "b1")).toDF("k", "wv", "v"), "b1")
    // batch adds an enrichment column
    t.merge(Seq(("b", 2L, "b2", "ENRICHED")).toDF("k", "wv", "v", "extra"), "b2")
    val state = t.read().select("k", "v", "extra")
      .as[(String, String, Option[String])].collect().sortBy(_._1)
    assert(state.toSeq === Seq(("a", "a1", None), ("b", "b2", Some("ENRICHED"))))
    assert(t.schema.fieldNames.toSeq === Seq("k", "wv", "v", "extra"))
  }

  test("reopen from disk preserves state and ledger") {
    val root = Files.createTempDirectory("laketbl-reopen").toString
    val t = LakeTable.createOrOpen(spark, root, schema, Seq("k"), Seq("wv"), 4)
    t.merge(Seq(("a", 1L, "a1")).toDF("k", "wv", "v"), "b1")
    val t2 = LakeTable.open(spark, root)
    assert(t2.read().count() === 1L)
    assert(t2.snapshot().appliedBatches === Seq("b1"))
    assert(t2.merge(Seq(("a", 9L, "dup")).toDF("k", "wv", "v"), "b1") === 0L)
  }
}
