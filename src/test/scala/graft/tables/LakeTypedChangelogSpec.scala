package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

/** Typed changelog (readChangesTyped ≙ Delta CDF): insert / update pre+post
  * images / delete classification, retraction-based downstream aggregation,
  * purge tolerance, rebucket fallback. */
class LakeTypedChangelogSpec extends SparkTestBase {

  import spark.implicits._

  private def newTable(tombstone: Boolean, buckets: Int = 4): LakeTable = {
    val root = Files.createTempDirectory("laketyped").toString
    val ddl = if (tombstone) "k STRING, wv BIGINT, v STRING, deleted BOOLEAN"
    else "k STRING, wv BIGINT, v STRING"
    LakeTable.createOrOpen(spark, root, StructType.fromDDL(ddl),
      Seq("k"), Seq("wv"), buckets,
      tombstoneCol = if (tombstone) Some("deleted") else None)
  }

  private def typed(t: LakeTable, v1: Long, v2: Long): Set[(String, String, Long)] =
    t.readChangesTyped(v1, v2).select("_change_type", "k", "wv")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("insert / update pre+post / delete classification") {
    val t = newTable(tombstone = true)
    def df(rows: (String, Long, String, Boolean)*) = rows.toDF("k", "wv", "v", "deleted")
    t.merge(df(("a", 1L, "a1", false), ("b", 1L, "b1", false), ("c", 1L, "c1", false)), "b1")
    val v1 = t.currentVersion()
    // a updated, b deleted, c untouched, d inserted, e insert-then-shadowed
    t.merge(df(("a", 2L, "a2", false), ("b", 2L, null, true),
      ("d", 1L, "d1", false)), "b2", mor = true)
    val v2 = t.currentVersion()
    assert(typed(t, v1, v2) === Set(
      ("update_preimage", "a", 1L), ("update_postimage", "a", 2L),
      ("delete", "b", 1L),
      ("insert", "d", 1L)))
    // delete carries the PREIMAGE payload, not the tombstone marker
    val del = t.readChangesTyped(v1, v2).filter($"_change_type" === "delete").collect()
    assert(del.map(_.getAs[String]("v")).toSeq === Seq("b1"))
    // a delete followed by a re-insert in a later window is an insert
    t.merge(df(("b", 3L, "b3", false)), "b3")
    assert(typed(t, v2, t.currentVersion()) === Set(("insert", "b", 3L)))
    // empty window, identical versions
    assert(t.readChangesTyped(v2, v2).count() === 0L)
  }

  test("typed feed drives exact incremental aggregation (retraction-based)") {
    val t = newTable(tombstone = true)
    def df(rows: (String, Long, String, Boolean)*) = rows.toDF("k", "wv", "v", "deleted")
    // maintain `count of live keys whose v starts with 'x'` incrementally
    var agg = 0L
    var last = t.currentVersion()
    def applyWindow(): Unit = {
      val c = t.readChangesTyped(last, t.currentVersion())
        .selectExpr("""sum(CASE
          | WHEN _change_type IN ('insert', 'update_postimage') AND v LIKE 'x%' THEN 1
          | WHEN _change_type IN ('delete', 'update_preimage') AND v LIKE 'x%' THEN -1
          | ELSE 0 END) AS d""".stripMargin)
        .head().getAs[Any]("d")
      agg += Option(c).map(_.asInstanceOf[Long]).getOrElse(0L)
      last = t.currentVersion()
    }
    def oracle(): Long = t.read().filter($"v".startsWith("x")).count()

    t.merge(df(("a", 1L, "x-a", false), ("b", 1L, "y-b", false), ("c", 1L, "x-c", false)), "b1")
    applyWindow(); assert(agg === oracle())
    t.merge(df(("a", 2L, "y-a", false), ("b", 2L, "x-b", false), ("d", 1L, "x-d", false)), "b2")
    applyWindow(); assert(agg === oracle())
    t.merge(df(("c", 2L, null, true), ("d", 2L, "x-d2", false)), "b3", mor = true)
    applyWindow(); assert(agg === oracle())
    assert(agg === 2L) // x-b, x-d2
  }

  test("a window spanning a purge synthesizes deletes from the old side") {
    val t = newTable(tombstone = true)
    def df(rows: (String, Long, String, Boolean)*) = rows.toDF("k", "wv", "v", "deleted")
    t.merge(df(("a", 1L, "a1", false), ("b", 1L, "b1", false)), "b1")
    val v1 = t.currentVersion()
    t.merge(df(("b", 2L, null, true)), "b2")
    t.purgeTombstones()
    val v3 = t.currentVersion()
    // untyped readChanges refuses this window; the typed feed reports the
    // delete with its pre-purge winner
    intercept[IllegalArgumentException](t.readChanges(v1, v3).collect())
    assert(typed(t, v1, v3) === Set(("delete", "b", 1L)))
  }

  test("upsert-only table: inserts and updates only") {
    val t = newTable(tombstone = false)
    t.merge(Seq(("a", 1L, "a1"), ("b", 1L, "b1")).toDF("k", "wv", "v"), "b1")
    val v1 = t.currentVersion()
    t.merge(Seq(("a", 2L, "a2"), ("c", 1L, "c1")).toDF("k", "wv", "v"), "b2")
    assert(typed(t, v1, t.currentVersion()) === Set(
      ("update_preimage", "a", 1L), ("update_postimage", "a", 2L),
      ("insert", "c", 1L)))
    // full-history window: everything is an insert or an update from nothing
    assert(typed(t, 0L, v1) === Set(("insert", "a", 1L), ("insert", "b", 1L)))
  }

  test("rebucket inside the window falls back to the logical key join") {
    val t = newTable(tombstone = false, buckets = 4)
    t.merge((1 to 20).map(i => (s"k$i", 1L, s"v$i")).toDF("k", "wv", "v"), "b1")
    val v1 = t.currentVersion()
    t.rebucket(8)
    t.merge(Seq(("k1", 2L, "k1@2"), ("new", 1L, "n1")).toDF("k", "wv", "v"), "b2")
    assert(typed(t, v1, t.currentVersion()) === Set(
      ("update_preimage", "k1", 1L), ("update_postimage", "k1", 2L),
      ("insert", "new", 1L)))
  }
}
