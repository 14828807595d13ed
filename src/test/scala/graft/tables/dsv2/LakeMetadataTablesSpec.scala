package graft.tables.dsv2

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.StructType

import graft.SparkTestBase
import graft.tables.LakeTable

/** SQL metadata tables: `lake.t.history` / `lake.t.files` — Iceberg-style
  * inspection tables resolved by the catalog under a table identifier and
  * served as LocalScans (driver-side metadata, no executor tasks). */
class LakeMetadataTablesSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("lake-meta-warehouse").toString
    spark.conf.set("spark.sql.catalog.metacat", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.metacat.warehouse", w)
    w
  }

  private def makeTable(name: String): LakeTable =
    LakeTable.createOrOpen(spark, s"$warehouse/$name",
      StructType.fromDDL("k STRING, wv BIGINT, v STRING"),
      Seq("k"), Seq("wv"), 4)

  test("history lists every retained version with its stored state") {
    val t = makeTable("mt1")
    t.merge(Seq(("a", 1L, "a1"), ("b", 1L, "b1")).toDF("k", "wv", "v"), "b1")
    t.merge(Seq(("a", 2L, "a2"), ("c", 1L, "c1")).toDF("k", "wv", "v"), "b2")
    val h = spark.sql(
      """SELECT version, stored_rows, data_files, num_buckets, mor_buckets,
        |  committed_batches
        |FROM metacat.mt1.history ORDER BY version""".stripMargin)
      .collect().map(_.toSeq)
    assert(h.map(_.head) === Seq(0L, 1L, 2L))
    assert(h.map(_(1)) === Seq(0L, 2L, 3L)) // stored rows per version
    assert(h.map(_(5)) === Seq(0L, 1L, 2L)) // committed batches per version
    assert(h.forall(_(3) === 4)) // num_buckets
    assert(h.forall(_(4) === 0)) // clean COW: no mor buckets
    // schema column carries the evolving DDL
    spark.sql("ALTER TABLE metacat.mt1 ADD COLUMNS (note STRING)")
    val schemas = spark.sql(
      "SELECT version, schema FROM metacat.mt1.history ORDER BY version")
      .as[(Long, String)].collect()
    assert(schemas.length === 4)
    assert(!schemas.init.exists(_._2.toLowerCase.contains("note")))
    assert(schemas.last._2.toLowerCase.contains("note"))
  }

  test("files lists live data files whose footer rows sum to stored_rows") {
    val t = makeTable("mt2")
    t.merge((1 to 100).map(i => (s"k$i", 1L, s"v$i")).toDF("k", "wv", "v"), "b1")
    t.merge((50 to 150).map(i => (s"k$i", 2L, s"w$i")).toDF("k", "wv", "v"), "b2")
    val f = spark.sql(
      "SELECT path, bucket, rows, size_bytes FROM metacat.mt2.files").collect()
    val snap = t.snapshot()
    assert(f.length === snap.bucketFiles.valuesIterator.map(_.size).sum)
    assert(f.map(_.getLong(2)).sum === snap.rowCount)
    assert(f.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 4))
    assert(f.forall(_.getLong(3) > 0))
    f.foreach { r =>
      assert(Files.exists(Paths.get(warehouse, "mt2", r.getString(0))),
        s"listed file ${r.getString(0)} must exist on disk")
    }
    // VERSION AS OF pins the file listing to a retained snapshot
    val v1Rows = spark.sql(
      "SELECT sum(rows) FROM metacat.mt2.files VERSION AS OF 1")
      .as[Long].head()
    assert(v1Rows === 100L)
  }

  test("partitions reports per-bucket rows, layers and merge-on-read state") {
    val t = makeTable("mt6")
    t.merge((1 to 80).map(i => (s"k$i", 1L, s"v$i")).toDF("k", "wv", "v"), "b1")
    t.merge((1 to 40).map(i => (s"k$i", 2L, s"w$i")).toDF("k", "wv", "v"), "b2",
      mor = true)
    val p = spark.sql(
      """SELECT bucket, files, rows, layers, merge_on_read
        |FROM metacat.mt6.partitions ORDER BY bucket""".stripMargin).collect()
    val snap = t.snapshot()
    assert(p.map(_.getInt(0)).toSeq === snap.bucketFiles.keys.toSeq.sorted)
    assert(p.map(_.getLong(2)).sum === snap.rowCount)
    // the MOR merge left dirty buckets: layers > 1 exactly there
    val dirty = p.filter(_.getBoolean(4))
    assert(dirty.nonEmpty)
    assert(dirty.forall(_.getInt(3) > 1))
    assert(p.filterNot(_.getBoolean(4)).forall(_.getInt(3) === 1))
    // compaction resolves: partitions must read clean afterwards
    t.compact()
    val after = spark.sql(
      "SELECT layers, merge_on_read FROM metacat.mt6.partitions").collect()
    assert(after.forall(r => r.getInt(0) === 1 && !r.getBoolean(1)))
  }

  test("history joins against the live table in one statement") {
    val t = makeTable("mt3")
    t.merge(Seq(("a", 1L, "a1"), ("b", 1L, "b1")).toDF("k", "wv", "v"), "b1")
    // head stored_rows from metadata == count(*) from the table itself
    val row = spark.sql(
      """SELECT h.stored_rows, (SELECT count(*) FROM metacat.mt3) AS live
        |FROM metacat.mt3.history h
        |ORDER BY h.version DESC LIMIT 1""".stripMargin).head()
    assert(row.getLong(0) === row.getLong(1))
  }

  test("metadata names under a non-table or unknown names stay errors") {
    val e = intercept[Exception](spark.sql("SELECT * FROM metacat.nope.history"))
    assert(e.getMessage.toLowerCase.contains("table"))
    makeTable("mt4")
    val e2 = intercept[Exception](spark.sql("SELECT * FROM metacat.mt4.manifests"))
    assert(e2.getMessage.toLowerCase.contains("table"))
  }

  test("CREATE TABLE inside an existing table directory is refused") {
    makeTable("mt5")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // a metadata name: Spark already sees the resolvable metadata table
    val e = intercept[Exception](spark.sql(
      """CREATE TABLE metacat.mt5.history (k STRING, wv BIGINT)
        |TBLPROPERTIES ('keys'='k', 'orders'='wv')""".stripMargin))
    assert(msgs(e).exists(_.toLowerCase.contains("already exists")),
      s"unexpected: ${msgs(e)}")
    // a non-metadata name: the catalog's own nesting guard fires
    val e2 = intercept[Exception](spark.sql(
      """CREATE TABLE metacat.mt5.sub (k STRING, wv BIGINT)
        |TBLPROPERTIES ('keys'='k', 'orders'='wv')""".stripMargin))
    assert(msgs(e2).exists(_.contains("cannot nest")), s"unexpected: ${msgs(e2)}")
    Seq("history", "sub").foreach { d =>
      assert(!Files.exists(Paths.get(warehouse, "mt5", d)),
        s"the refused create must not leave '$d' inside the table root")
    }
  }
}
