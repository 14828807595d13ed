package graft.tables

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

/** Table integrity audit (`verifyTable` / `CALL lake.system.verify_table`):
  * an fsck for the table format. A healthy table passes every check; each
  * corruption class the auditor exists for is simulated (a deleted data
  * file, a tampered row-count ledger, file lists swapped between buckets, a
  * tag pinning a vanished version) and must flip exactly its own check. */
class VerifyTableSpec extends SparkTestBase {

  import spark.implicits._

  private val schema = StructType.fromDDL("k STRING, wv BIGINT, v STRING")

  private def newTable(): LakeTable =
    LakeTable.createOrOpen(spark, Files.createTempDirectory("fsck").toString,
      schema, keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 4)

  /** Seed a table exercising every surface the auditor reads: COW merges,
    * an unresolved MOR layer, a tag, and a DROP COLUMN ledger entry. */
  private def seeded(): LakeTable = {
    val t = newTable()
    t.merge((0 until 64).map(i => (s"k$i", 1L, s"v$i")).toDF("k", "wv", "v"), "w1")
    t.merge((0 until 16).map(i => (s"k$i", 2L, s"u$i")).toDF("k", "wv", "v"), "w2",
      mor = true)
    t.createTag("pin", t.currentVersion())
    t.dropColumns(Seq("v"))
    t
  }

  /** Commit a TAMPERED copy of the head snapshot (simulated corruption /
    * manual repair gone wrong) as the next version. */
  private def forge(t: LakeTable)(mutate: TableSnapshot => TableSnapshot): Unit = {
    val s = t.snapshot()
    val next = mutate(s).copy(version = s.version + 1)
    val meta = Paths.get(t.root, "meta")
    Files.write(meta.resolve(s"v${next.version}.json"),
      LakeTable.snapshotJson(next), StandardOpenOption.CREATE_NEW)
    Files.write(meta.resolve("VERSION"),
      next.version.toString.getBytes("UTF-8"))
  }

  private def byName(t: LakeTable, checkData: Boolean = true): Map[String, (Boolean, String)] =
    t.verifyTable(checkData).map { case (n, ok, d) => n -> ((ok, d)) }.toMap

  test("a healthy table passes every check, data pass included") {
    val t = seeded()
    val r = t.verifyTable(checkData = true)
    assert(r.size === 14)
    assert(r.forall(_._2), r.filterNot(_._2).mkString("; "))
    // metadata-only mode runs the 12 cheap checks and no Spark job
    assert(t.verifyTable(checkData = false).size === 12)
  }

  test("a deleted data file flips referenced_files_exist and the count pass") {
    val t = seeded()
    val victim = t.snapshot().bucketFiles.values.flatten.head
    Files.delete(Paths.get(t.root, victim))
    val r = byName(t)
    assert(!r("referenced_files_exist")._1)
    assert(r("referenced_files_exist")._2.contains(victim.split('/').last))
    // the remaining metadata invariants still hold
    assert(r("row_count_consistent")._1 && r("tags_resolve_to_retained_versions")._1)
  }

  test("a tampered rowCount ledger flips exactly row_count_consistent") {
    val t = seeded()
    forge(t)(s => s.copy(rowCount = s.rowCount + 5))
    val r = byName(t)
    assert(!r("row_count_consistent")._1)
    assert(r("row_count_consistent")._2.contains("per-bucket sum"))
    assert(r("stored_counts_match_files")._1, "per-bucket ledger was untouched")
    assert(r("rows_hashed_into_their_bucket")._1)
  }

  test("file lists swapped between buckets are caught by the placement pass") {
    val t = seeded()
    t.compact() // single clean layer per bucket, counts ledger exact
    val s = t.snapshot()
    val two = s.bucketFiles.collect { case (b, fs) if fs.nonEmpty => b }.toSeq.sorted.take(2)
    assert(two.size === 2, "seed must populate at least two buckets")
    val Seq(a, b) = two
    forge(t)(s => s.copy(
      bucketFiles = s.bucketFiles
        .updated(a, s.bucketFiles(b)).updated(b, s.bucketFiles(a)),
      bucketRows = s.bucketRows
        .updated(a, s.bucketRows(b)).updated(b, s.bucketRows(a))))
    val r = byName(t)
    assert(r("stored_counts_match_files")._1, "counts were swapped consistently")
    assert(!r("rows_hashed_into_their_bucket")._1,
      "every row in the swapped buckets sits in a bucket its key does not hash to")
  }

  test("a tag pinning a vanished version flips tags_resolve_to_retained_versions") {
    val t = seeded()
    forge(t)(s => s.copy(tags = s.tags.updated("ghost", 9999L)))
    val r = byName(t, checkData = false)
    assert(!r("tags_resolve_to_retained_versions")._1)
    assert(r("tags_resolve_to_retained_versions")._2.contains("ghost"))
  }

  test("SQL: CALL verify_table surfaces the checklist through the catalog") {
    val wh = Files.createTempDirectory("fsck-wh").toString
    spark.conf.set("spark.sql.catalog.fsck_cat",
      classOf[graft.tables.dsv2.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.fsck_cat.warehouse", wh)
    spark.sql(
      """CREATE TABLE fsck_cat.t (k STRING, wv BIGINT, v STRING)
        |TBLPROPERTIES ('keys'='k', 'orders'='wv', 'buckets'='4')""".stripMargin)
    spark.sql("INSERT INTO fsck_cat.t VALUES ('a', 1, 'x'), ('b', 1, 'y')")
    val rows = spark.sql(
      "CALL fsck_cat.system.verify_table(table => 't', check_data => true)")
      .collect()
    assert(rows.length === 14)
    assert(rows.forall(_.getBoolean(1)),
      rows.filterNot(_.getBoolean(1)).mkString("; "))
    assert(rows.map(_.getString(0)).contains("rows_hashed_into_their_bucket"))
  }
}
