package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

/** Named tags (Iceberg refs analog): immutable name → version pointers on
  * the head snapshot. Tagged versions survive expiry, resolve in
  * `readAt(tag)` / SQL `VERSION AS OF '<tag>'`, and ride across rollback. */
class TagSpec extends SparkTestBase {

  import spark.implicits._

  private val schema = StructType.fromDDL("k STRING, wv BIGINT, v STRING")

  private def newTable(): LakeTable =
    LakeTable.createOrOpen(spark, Files.createTempDirectory("tags").toString,
      schema, keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2)

  private def wave(t: LakeTable, wv: Long, suffix: String): Unit =
    t.merge(Seq(("a", wv, s"a$suffix"), ("b", wv, s"b$suffix"))
      .toDF("k", "wv", "v"), s"b$wv")

  test("create, resolve, read, idempotence, immutability, drop") {
    val t = newTable()
    wave(t, 1L, "1")
    val v1 = t.currentVersion()
    assert(t.createTag("release-1") > v1) // metadata-only commit bumps head
    wave(t, 2L, "2")
    assert(t.resolveTag("release-1") === v1)
    assert(t.readAt("release-1").collect().map(_.getString(2)).toSet === Set("a1", "b1"))
    assert(t.read().collect().map(_.getString(2)).toSet === Set("a2", "b2"))
    // idempotent re-tag of the same version is a commit-free no-op
    val head = t.currentVersion()
    assert(t.createTag("release-1", v1) === head)
    // moving an existing tag refuses
    val e = intercept[IllegalArgumentException](t.createTag("release-1"))
    assert(e.getMessage.contains("immutable"))
    // validation: all-digit and empty names refuse; unknown resolves refuse
    intercept[IllegalArgumentException](t.createTag("42"))
    intercept[IllegalArgumentException](t.createTag("no spaces"))
    intercept[IllegalArgumentException](t.resolveTag("nope"))
    intercept[IllegalArgumentException](t.dropTag("nope"))
    t.dropTag("release-1")
    intercept[IllegalArgumentException](t.resolveTag("release-1"))
    // tagging a never-retained version refuses
    intercept[IllegalArgumentException](t.createTag("x", 999L))
  }

  test("expire keeps tagged versions — metadata AND data — until dropped") {
    val t = newTable()
    wave(t, 1L, "1")
    val v1 = t.currentVersion()
    t.createTag("pin", v1)
    (2L to 6L).foreach(i => wave(t, i, i.toString))
    val (metaGone1, _) = t.expire(keepVersions = 2)
    assert(metaGone1 > 0)
    // the tagged version still reads — time travel through the pin works
    assert(Files.exists(Paths.get(t.root, "meta", s"v$v1.json")))
    assert(t.readAt("pin").collect().map(_.getString(2)).toSet === Set("a1", "b1"))
    assert(t.readAt(v1).count() === 2L)
    // dropping the tag returns the version to normal retention
    t.dropTag("pin")
    t.expire(keepVersions = 2)
    assert(!Files.exists(Paths.get(t.root, "meta", s"v$v1.json")))
    intercept[IllegalArgumentException](t.readAt(v1))
  }

  test("rollback carries tags across (refs on the history, not state)") {
    val t = newTable()
    wave(t, 1L, "1")
    val v1 = t.currentVersion()
    wave(t, 2L, "2")
    t.createTag("after", t.currentVersion())
    t.rollback(v1)
    // the restored head still knows the tag created after v1
    assert(t.resolveTag("after") > v1)
    assert(t.read().collect().map(_.getString(2)).toSet === Set("a1", "b1"))
  }

  test("SQL: VERSION AS OF '<tag>', history tags column, procedures") {
    val wh = Files.createTempDirectory("tags-sql").toString
    spark.conf.set("spark.sql.catalog.tag_sql",
      classOf[graft.tables.dsv2.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.tag_sql.warehouse", wh)
    val t = LakeTable.createOrOpen(spark, s"$wh/evts", schema,
      keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2)
    wave(t, 1L, "1")
    val res = spark.sql("CALL tag_sql.system.create_tag('evts', 'v1-load')").collect()
    assert(res.head.getLong(0) === t.resolveTag("v1-load"))
    wave(t, 2L, "2")
    val atTag = spark.sql("SELECT v FROM tag_sql.evts VERSION AS OF 'v1-load'")
      .as[String].collect().toSet
    assert(atTag === Set("a1", "b1"))
    assert(spark.sql("SELECT v FROM tag_sql.evts").as[String].collect().toSet
      === Set("a2", "b2"))
    // unknown tag names error with the available tags listed
    val e = intercept[Exception](
      spark.sql("SELECT * FROM tag_sql.evts VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("v1-load"))
    // the history metadata table shows which version each head tag pins
    val hist = spark.sql(
      "SELECT version, tags FROM tag_sql.evts.history WHERE tags <> ''").collect()
    assert(hist.map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((t.resolveTag("v1-load"), "v1-load")))
    spark.sql("CALL tag_sql.system.drop_tag('evts', 'v1-load')").collect()
    assert(spark.sql("SELECT count(*) FROM tag_sql.evts.history WHERE tags <> ''")
      .head().getLong(0) === 0L)
  }
}
