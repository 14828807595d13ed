package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkTestBase
import graft.tables.dsv2.{LakeBucketScan, LakeBucketSource, LakeCatalog}

/** Sort-order clustering (`cluster(sortCols, maxRowsPerFile)` — Iceberg's
  * `rewrite_data_files(strategy => 'sort')` analog): logical state is
  * invariant, the file layout becomes range-sliced so the planning-time
  * bounds skipping prunes range predicates to the overlapping slices. */
class ClusterSpec extends SparkTestBase {

  import spark.implicits._

  private val schema = StructType.fromDDL("k STRING, wv BIGINT, v STRING")

  private def newTable(buckets: Int = 4): LakeTable =
    LakeTable.createOrOpen(spark, Files.createTempDirectory("cluster").toString,
      schema, keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = buckets)

  private def scanDF(t: LakeTable) =
    spark.read.format(LakeBucketSource.Name)
      .option("root", t.root)
      .option("version", t.currentVersion().toString)
      .option("buckets", t.snapshot().bucketFiles.keys.toSeq.sorted.mkString(","))
      .load()

  test("cluster: state invariant, files range-sliced, bounds disjoint") {
    val t = newTable()
    // 400 keys over 4 buckets in a RANDOMIZED wv order: before clustering
    // every file's wv bounds span nearly the whole domain
    val rows = new scala.util.Random(7).shuffle((0 until 400).toList)
      .map(i => (s"k$i", i.toLong, s"v$i"))
    rows.grouped(100).zipWithIndex.foreach { case (wave, i) =>
      t.merge(wave.toDF("k", "wv", "v"), s"b$i")
    }
    val before = t.read().collect().map(_.toSeq).toSet
    val n = t.cluster(Seq("wv"), maxRowsPerFile = 25L)
    assert(n === 4)
    // fold equality: the rewrite changed no logical state
    assert(t.read().collect().map(_.toSeq).toSet === before)
    val snap = t.snapshot()
    assert(snap.totals.get("clustered_buckets").contains(4L))
    // each ~100-row bucket split into >= 4 files of <= 25 rows
    snap.bucketFiles.foreach { case (b, fs) =>
      assert(fs.size >= 4, s"bucket $b has only ${fs.size} files")
      fs.foreach(rel => assert(snap.fileStats(rel).rows <= 25L))
      // within a bucket the wv slices are tight and mutually disjoint
      val bounds = fs.map { rel =>
        val cs = snap.fileStats(rel).cols("wv")
        (cs.min.get.toLong, cs.max.get.toLong)
      }.sortBy(_._1)
      bounds.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => assert(hi < lo2,
          s"bucket $b slices overlap: max $hi vs next min $lo2")
        case _ =>
      }
    }
  }

  test("cluster prunes range reads to the overlapping slices") {
    val t = newTable()
    val rows = new scala.util.Random(11).shuffle((0 until 400).toList)
      .map(i => (s"k$i", i.toLong, s"v$i"))
    t.merge(rows.toDF("k", "wv", "v"), "b0")
    def rangeRead() = scanDF(t).filter(col("wv").between(190L, 209L))
      .select("k").as[String].collect().toSet
    val expect = (190 until 210).map(i => s"k$i").toSet
    // before clustering the predicate prunes (almost) nothing: every file's
    // bounds span most of the domain
    val p0 = LakeBucketScan.statsPrunedFiles.get()
    assert(rangeRead() === expect)
    val prunedBefore = LakeBucketScan.statsPrunedFiles.get() - p0
    val filesBefore = t.snapshot().bucketFiles.values.map(_.size).sum
    assert(t.cluster(Seq("wv"), maxRowsPerFile = 25L) === 4)
    val snapAfter = t.snapshot()
    val filesAfter = snapAfter.bucketFiles.values.map(_.size).sum
    assert(filesAfter >= 16) // 400 rows / 25-cap => >= 16 slices
    val p1 = LakeBucketScan.statsPrunedFiles.get()
    assert(rangeRead() === expect)
    val prunedAfter = LakeBucketScan.statsPrunedFiles.get() - p1
    // a 20/400 range hits at most 2 slices per bucket; everything else skips
    assert(prunedAfter >= filesAfter - 2 * snapAfter.numBuckets,
      s"expected nearly all of $filesAfter files pruned, got $prunedAfter " +
        s"(before clustering: $prunedBefore of $filesBefore)")
    assert(prunedAfter > prunedBefore)
  }

  test("cluster resolves merge-on-read layers in the same pass") {
    val t = newTable()
    t.merge(Seq(("a", 1L, "a1"), ("b", 1L, "b1")).toDF("k", "wv", "v"), "b1", mor = true)
    t.merge(Seq(("a", 2L, "a2")).toDF("k", "wv", "v"), "b2", mor = true)
    assert(t.snapshot().morBuckets.nonEmpty)
    assert(t.cluster(Seq("wv")) > 0)
    assert(t.snapshot().morBuckets.isEmpty)
    assert(t.read().collect().map(_.toSeq).toSet ===
      Set(Seq("a", 2L, "a2"), Seq("b", 1L, "b1")))
  }

  test("cluster refuses absent or unboundable sort columns") {
    val t = newTable()
    t.merge(Seq(("a", 1L, "a1")).toDF("k", "wv", "v"), "b1")
    val e1 = intercept[IllegalArgumentException](t.cluster(Seq("nope")))
    assert(e1.getMessage.contains("not in the table schema"))
    val e2 = intercept[IllegalArgumentException](t.cluster(Nil))
    assert(e2.getMessage.contains("at least one sort column"))
    val bt = LakeTable.createOrOpen(spark,
      Files.createTempDirectory("cluster-bin").toString,
      StructType.fromDDL("k STRING, wv BIGINT, payload BINARY"),
      Seq("k"), Seq("wv"), 2)
    bt.merge(Seq(("a", 1L, Array[Byte](1))).toDF("k", "wv", "payload"), "b1")
    val e3 = intercept[IllegalArgumentException](bt.cluster(Seq("payload")))
    assert(e3.getMessage.contains("can't carry file bounds"))
  }

  test("write-path sort order: ingest itself emits capped range-sliced files") {
    val sorted = LakeTable.createOrOpen(spark,
      Files.createTempDirectory("wsort").toString, schema,
      keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 4,
      sortOrder = Seq("wv"), targetFileRows = 16L)
    val plain = newTable()
    val rows = new scala.util.Random(3).shuffle((0 until 400).toList)
      .map(i => (s"k$i", i.toLong, s"v$i"))
    rows.grouped(200).zipWithIndex.foreach { case (wave, i) =>
      sorted.merge(wave.toDF("k", "wv", "v"), s"b$i")
      plain.merge(wave.toDF("k", "wv", "v"), s"b$i")
    }
    // logical state identical to the unsorted twin (the sort is physical)
    assert(sorted.read().collect().map(_.toSeq).toSet ===
      plain.read().collect().map(_.toSeq).toSet)
    val snap = sorted.snapshot()
    // the cap held on every ingested file, with no cluster() call ever made
    snap.bucketFiles.values.flatten.foreach { rel =>
      assert(snap.fileStats(rel).rows <= 16L, s"$rel over the 16-row cap")
    }
    assert(snap.bucketFiles.values.map(_.size).sum >= 400 / 16)
    // and ingested slices prune a range read (merge tasks can interleave
    // subsplits, so slices within a bucket may overlap — but each is tight
    // enough that most files fall outside a 20/400 range)
    def rangeRead(t: LakeTable) = spark.read.format(LakeBucketSource.Name)
      .option("root", t.root).option("version", t.currentVersion().toString)
      .option("buckets", t.snapshot().bucketFiles.keys.toSeq.sorted.mkString(","))
      .load().filter(col("wv").between(100L, 119L)).select("k").as[String].collect().toSet
    val expect = (100 until 120).map(i => s"k$i").toSet
    val p0 = LakeBucketScan.statsPrunedFiles.get()
    assert(rangeRead(sorted) === expect)
    val pruned = LakeBucketScan.statsPrunedFiles.get() - p0
    val total = snap.bucketFiles.values.map(_.size).sum
    assert(pruned >= total / 2,
      s"expected most of $total ingested slices pruned, got $pruned")
    assert(rangeRead(plain) === expect)
  }

  test("write-path sort order survives compaction (MOR layers resolve into " +
      "disjoint slices)") {
    val t = LakeTable.createOrOpen(spark,
      Files.createTempDirectory("wsort-mor").toString, schema,
      keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2,
      sortOrder = Seq("wv"), targetFileRows = 10L)
    val rows = new scala.util.Random(5).shuffle((0 until 100).toList)
      .map(i => (s"k$i", i.toLong, s"v$i"))
    rows.grouped(50).zipWithIndex.foreach { case (wave, i) =>
      t.merge(wave.toDF("k", "wv", "v"), s"b$i", mor = true)
    }
    assert(t.compact() > 0)
    val snap = t.snapshot()
    // compaction is one task per bucket: its slices are disjoint per bucket
    snap.bucketFiles.foreach { case (b, fs) =>
      val bounds = fs.map { rel =>
        val cs = snap.fileStats(rel).cols("wv")
        (cs.min.get.toLong, cs.max.get.toLong)
      }.sortBy(_._1)
      bounds.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => assert(hi < lo2,
          s"bucket $b compacted slices overlap: $hi vs $lo2")
        case _ =>
      }
      fs.foreach(rel => assert(snap.fileStats(rel).rows <= 10L))
    }
    assert(t.read().count() === 100L)
  }

  test("sortOrder validation at create: absent and unboundable columns refuse") {
    val e1 = intercept[IllegalArgumentException](LakeTable.createOrOpen(spark,
      Files.createTempDirectory("wsort-bad").toString, schema,
      Seq("k"), Seq("wv"), 2, sortOrder = Seq("nope")))
    assert(e1.getMessage.contains("not in the table schema"))
    val e2 = intercept[IllegalArgumentException](LakeTable.createOrOpen(spark,
      Files.createTempDirectory("wsort-bad2").toString,
      StructType.fromDDL("k STRING, wv BIGINT, payload BINARY"),
      Seq("k"), Seq("wv"), 2, sortOrder = Seq("payload")))
    assert(e2.getMessage.contains("can't carry file bounds"))
  }

  test("SQL DDL declares write-path clustering via TBLPROPERTIES") {
    val w = Files.createTempDirectory("wsort-sql").toString
    spark.conf.set("spark.sql.catalog.wscat", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.wscat.warehouse", w)
    spark.sql(
      """CREATE TABLE wscat.ws1 (k STRING, wv BIGINT, v STRING)
        |TBLPROPERTIES ('keys'='k', 'orders'='wv', 'buckets'='4',
        |  'sort'='wv', 'target_file_rows'='16')""".stripMargin)
    (0 until 200).map(i => (s"k$i", i.toLong, s"v$i")).toDF("k", "wv", "v")
      .createOrReplaceTempView("ws1_in")
    spark.sql("INSERT INTO wscat.ws1 SELECT * FROM ws1_in")
    val snap = LakeTable.open(spark, s"$w/ws1").snapshot()
    assert(snap.sortOrder === Seq("wv") && snap.targetFileRows === 16L)
    snap.bucketFiles.values.flatten.foreach(rel =>
      assert(snap.fileStats(rel).rows <= 16L))
    // the declared clustering round-trips through the table properties
    val props = spark.sql("SHOW TBLPROPERTIES wscat.ws1")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("sort").contains("wv"))
    assert(props.get("target_file_rows").contains("16"))
    assert(spark.sql("SELECT count(*) FROM wscat.ws1 WHERE wv BETWEEN 50 AND 59")
      .head().getLong(0) === 10L)
  }

  test("CALL lake.system.cluster runs the rewrite through SQL") {
    val w = Files.createTempDirectory("cluster-wh").toString
    spark.conf.set("spark.sql.catalog.clcat", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.clcat.warehouse", w)
    val t = LakeTable.createOrOpen(spark, s"$w/cl1", schema, Seq("k"), Seq("wv"), 4)
    t.merge((0 until 100).map(i => (s"k$i", i.toLong, s"v$i")).toDF("k", "wv", "v"), "b0")
    val row = spark.sql(
      "CALL clcat.system.cluster('cl1', 'wv', max_rows_per_file => 10)").head()
    assert(row.getInt(0) === 4)
    val snap = LakeTable.open(spark, s"$w/cl1").snapshot()
    assert(row.getLong(1) === snap.version)
    assert(snap.bucketFiles.values.map(_.size).sum >= 8)
    assert(spark.sql("SELECT count(*) FROM clcat.cl1").head().getLong(0) === 100L)
  }
}
