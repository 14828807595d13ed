package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

/** Concurrent INGEST writers (disjoint-bucket OCC rebase): two merges from
  * independent handles racing the same version both commit when their
  * touched bucket sets are disjoint; overlapping merges still fail loudly.
  * Races are made deterministic via the onBeforeCommit seam — the competing
  * merge runs at the exact commit window, no thread timing involved. */
class LakeConcurrentWritersSpec extends SparkTestBase {

  import spark.implicits._

  private val schema = StructType.fromDDL("k STRING, wv BIGINT, v STRING")
  private val B = 8

  /** keys grouped by their table bucket (the table's own hash rule) */
  private def keysByBucket(n: Int): Map[Int, Seq[String]] =
    (0 until n).map(i => s"key$i")
      .toDF("k").withColumn("b", pmod(xxhash64(col("k")), lit(B)).cast("int"))
      .as[(String, Int)].collect().toSeq.groupMap(_._2)(_._1)

  private def newTable(): LakeTable =
    LakeTable.createOrOpen(spark, Files.createTempDirectory("lakeconc").toString,
      schema, Seq("k"), Seq("wv"), B)

  test("disjoint-bucket merges from two writers both commit via rebase") {
    val t1 = newTable()
    val t2 = LakeTable.createOrOpen(spark, t1.root, schema, Seq("k"), Seq("wv"), B)
    val byBucket = keysByBucket(64)
    val bucketsA = byBucket.keys.toSeq.sorted.take(3)
    val bucketsB = byBucket.keys.toSeq.sorted.drop(3).take(3)
    val batchA = bucketsA.flatMap(byBucket).map(k => (k, 1L, s"$k-A")).toDF("k", "wv", "v")
    val batchB = bucketsB.flatMap(byBucket).map(k => (k, 1L, s"$k-B")).toDF("k", "wv", "v")

    // writer B lands exactly inside writer A's commit window
    var fired = false
    t1.onBeforeCommit = () => {
      if (!fired) { fired = true; t2.merge(batchB, "batchB", txn = Some(("writerB", 1L))) }
    }
    t1.merge(batchA, "batchA", txn = Some(("writerA", 1L)))

    assert(fired)
    val s = t1.snapshot()
    assert(s.version === 2L) // both merges committed, one version each
    assert(s.txns === Map("writerA" -> 1L, "writerB" -> 1L)) // both ledgers kept
    assert(s.appliedBatches.toSet === Set("batchA", "batchB"))
    val state = t1.read().as[(String, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(state.size === (bucketsA ++ bucketsB).flatMap(byBucket).size)
    assert(bucketsA.flatMap(byBucket).forall(k => state(k) == s"$k-A"))
    assert(bucketsB.flatMap(byBucket).forall(k => state(k) == s"$k-B"))
  }

  test("overlapping-bucket merges fail loudly (the loser must rerun)") {
    val t1 = newTable()
    val t2 = LakeTable.createOrOpen(spark, t1.root, schema, Seq("k"), Seq("wv"), B)
    val byBucket = keysByBucket(64)
    val shared = byBucket.keys.toSeq.sorted.head
    val batchA = byBucket(shared).map(k => (k, 1L, s"$k-A")).toDF("k", "wv", "v")
    val batchB = byBucket(shared).map(k => (k, 2L, s"$k-B")).toDF("k", "wv", "v")
    var fired = false
    t1.onBeforeCommit = () => {
      if (!fired) { fired = true; t2.merge(batchB, "batchB", txn = Some(("writerB", 1L))) }
    }
    val e = intercept[java.util.ConcurrentModificationException] {
      t1.merge(batchA, "batchA", txn = Some(("writerA", 1L)))
    }
    assert(e.getMessage.contains("overlapping-bucket merge must rerun"))
    // the loser reruns against the new version and LWW applies as normal
    t1.onBeforeCommit = () => ()
    t1.merge(batchA, "batchA-retry", txn = Some(("writerA", 2L)))
    val state = t1.read().as[(String, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(byBucket(shared).forall(k => state(k) == s"$k-B")) // wv=2 wins
  }

  test("disjoint rebase over a schema-evolving merge unions the schemas") {
    val t1 = newTable()
    val t2 = LakeTable.createOrOpen(spark, t1.root, schema, Seq("k"), Seq("wv"), B)
    val byBucket = keysByBucket(64)
    val bucketsA = byBucket.keys.toSeq.sorted.take(2)
    val bucketsB = byBucket.keys.toSeq.sorted.drop(2).take(2)
    val batchA = bucketsA.flatMap(byBucket).map(k => (k, 1L, s"$k-A")).toDF("k", "wv", "v")
    // writer B evolves the schema with a new nullable column mid-flight
    val batchB = bucketsB.flatMap(byBucket).map(k => (k, 1L, s"$k-B", "noteB"))
      .toDF("k", "wv", "v", "note")
    var fired = false
    t1.onBeforeCommit = () => {
      if (!fired) { fired = true; t2.merge(batchB, "batchB", txn = Some(("writerB", 1L))) }
    }
    t1.merge(batchA, "batchA", txn = Some(("writerA", 1L)))
    // neither writer's columns were dropped
    assert(t1.schema.fieldNames.toSeq === Seq("k", "wv", "v", "note"))
    val rows = t1.read().select("k", "note").as[(String, Option[String])].collect().toMap
    assert(bucketsA.flatMap(byBucket).forall(k => rows(k).isEmpty)) // A's rows: null note
    assert(bucketsB.flatMap(byBucket).forall(k => rows(k).contains("noteB")))
  }

  test("merge rebasing over a concurrent DROP COLUMN does not resurrect it") {
    val t1 = newTable()
    val t2 = LakeTable.createOrOpen(spark, t1.root, schema, Seq("k"), Seq("wv"), B)
    val byBucket = keysByBucket(64)
    val bucketsA = byBucket.keys.toSeq.sorted.take(2)
    t1.merge(byBucket.values.flatten.map(k => (k, 1L, s"$k-0")).toSeq.toDF("k", "wv", "v"),
      "seed", txn = Some(("writerA", 1L)))
    // writer A's second merge (carrying column v) races a DROP COLUMN v that
    // lands inside its commit window: the drop committed first, so it wins —
    // the rebased merge must NOT union the stale schema's v back in
    val batchA = bucketsA.flatMap(byBucket).map(k => (k, 2L, s"$k-A")).toDF("k", "wv", "v")
    var fired = false
    t1.onBeforeCommit = () => {
      if (!fired) { fired = true; t2.dropColumns(Seq("v")) }
    }
    t1.merge(batchA, "batchA", txn = Some(("writerA", 2L)))
    val s = t1.snapshot()
    assert(s.version === 3L) // seed, drop, rebased merge
    assert(t1.schema.fieldNames.toSeq === Seq("k", "wv")) // v stays dropped
    assert(s.droppedCols === Seq("v")) // ledger carried through the rebase
    // the merge itself landed (LWW state advanced on its buckets)
    val state = t1.read().as[(String, Long)].collect().toMap
    assert(bucketsA.flatMap(byBucket).forall(k => state(k) == 2L))
    // and re-introducing the name still refuses — the resurrection guard holds
    val e = intercept[IllegalArgumentException] {
      t1.addColumns(Seq(org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    }
    assert(e.getMessage.contains("DROPPED"))
    // and the rebased merge's harvested file bounds were scrubbed of the
    // dropped column — dropColumns scrubbed the table's stats, so the
    // racing batch (written with the stale wide schema) must not
    // re-publish bounds for a schema-absent column
    assert(s.fileStats.values.forall(st => !st.cols.keys.exists(_.equalsIgnoreCase("v"))),
      "rebased merge re-published file bounds for the dropped column")
  }

  test("merge-on-read layers from disjoint writers land concurrently too") {
    val t1 = newTable()
    val t2 = LakeTable.createOrOpen(spark, t1.root, schema, Seq("k"), Seq("wv"), B)
    val byBucket = keysByBucket(64)
    val bucketsA = byBucket.keys.toSeq.sorted.take(2)
    val bucketsB = byBucket.keys.toSeq.sorted.drop(2).take(2)
    def df(bs: Seq[Int], wv: Long, tag: String) =
      bs.flatMap(byBucket).map(k => (k, wv, s"$k-$tag")).toDF("k", "wv", "v")
    t1.merge(df(bucketsA, 1L, "A1"), "a1", mor = true)
    t1.merge(df(bucketsB, 1L, "B1"), "b1", mor = true)
    var fired = false
    t1.onBeforeCommit = () => {
      if (!fired) { fired = true; t2.merge(df(bucketsB, 2L, "B2"), "b2", mor = true) }
    }
    t1.merge(df(bucketsA, 2L, "A2"), "a2", mor = true)
    val state = t1.read().as[(String, Long, String)].collect().map(r => r._1 -> r._2).toMap
    assert(state.values.forall(_ == 2L)) // both writers' second layers win
    t1.compact()
    assert(t1.snapshot().morBuckets.isEmpty)
  }
}
