package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.tables.dsv2.{LakeBucketScan, LakeBucketSource}

/** Z-order clustering (`cluster(dims, cap, zorder = true)` — Iceberg's
  * `rewrite_data_files(sort_order => 'zorder(…)')` analog): the Morton
  * interleave turns each bucket's files into axis-aligned boxes of the
  * value space, so the planning-time bounds skipping prunes range
  * predicates on ANY dimension — a lexicographic sort only serves its
  * first column. */
class ZOrderSpec extends SparkTestBase {

  import spark.implicits._

  test("zvalue column expression matches the row-at-a-time reference") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      val a = if (i % 11 == 0) None else Some(rnd.nextDouble() * 2000 - 1000)
      val b = if (i % 13 == 0) None else Some(rnd.nextLong() % 100000)
      (i, a, b)
    }
    val loA = rows.flatMap(_._2).min; val hiA = rows.flatMap(_._2).max
    val loB = rows.flatMap(_._3).min.toDouble; val hiB = rows.flatMap(_._3).max.toDouble
    val df = rows.toDF("i", "a", "b")
    val got = df.select(col("i"), ZOrder.zvalue(Seq(
        (col("a"), DoubleType, loA, hiA),
        (col("b"), LongType, loB, hiB))).as("z"))
      .as[(Int, Long)].collect().toMap
    rows.foreach { case (i, a, b) =>
      val want = ZOrder.zvalueRef(Seq(a, b.map(_.toDouble)), Seq((loA, hiA), (loB, hiB)))
      assert(got(i) === want, s"row $i: a=$a b=$b")
      assert(want >= 0L, "z-values keep the sign bit clear")
    }
    // a degenerate lo == hi dimension contributes a constant
    val z0 = df.select(ZOrder.zvalue(Seq(
      (col("a"), DoubleType, 5.0, 5.0),
      (col("b"), LongType, loB, hiB))).as("z")).as[Long].collect()
    val direct = df.select(ZOrder.zvalue(Seq(
      (lit(null).cast(DoubleType), DoubleType, 0.0, 1.0),
      (col("b"), LongType, loB, hiB))).as("z")).as[Long].collect()
    assert(z0.toSeq === direct.toSeq)
  }

  private val schema = StructType.fromDDL("k STRING, wv BIGINT, x BIGINT, y BIGINT")

  private def gridTable(): LakeTable = {
    val t = LakeTable.createOrOpen(spark, Files.createTempDirectory("zorder").toString,
      schema, keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 4)
    // a 32×32 grid: x and y are INDEPENDENT uniform dimensions
    val rows = (0 until 1024).map(i => (s"k$i", i.toLong, (i % 32).toLong, (i / 32).toLong))
    t.merge(rows.toDF("k", "wv", "x", "y"), "load")
    t
  }

  private def scanDF(t: LakeTable) =
    spark.read.format(LakeBucketSource.Name)
      .option("root", t.root)
      .option("version", t.currentVersion().toString)
      .option("buckets", t.snapshot().bucketFiles.keys.toSeq.sorted.mkString(","))
      .load()

  /** files skipped by the stats prune while reading `t` under `cond` */
  private def prunedBy(t: LakeTable, cond: org.apache.spark.sql.Column,
      expect: Set[String]): Long = {
    val p0 = LakeBucketScan.statsPrunedFiles.get()
    assert(scanDF(t).filter(cond).select("k").as[String].collect().toSet === expect)
    LakeBucketScan.statsPrunedFiles.get() - p0
  }

  test("z-order: state invariant; BOTH dimensions prune; beats lexicographic") {
    val lex = gridTable()
    val zed = gridTable()
    val before = zed.read().collect().map(_.toSeq).toSet
    assert(lex.cluster(Seq("x", "y"), maxRowsPerFile = 64L) === 4)
    assert(zed.cluster(Seq("x", "y"), maxRowsPerFile = 64L, zorder = true) === 4)
    // the rewrite changed no logical state
    assert(zed.read().collect().map(_.toSeq).toSet === before)
    assert(zed.snapshot().totals.get("clustered_buckets").contains(4L))
    val filesZ = zed.snapshot().bucketFiles.values.map(_.size).sum
    val filesL = lex.snapshot().bucketFiles.values.map(_.size).sum
    assert(filesZ >= 16 && filesL >= 16) // 1024 rows / 64-row cap

    val ySlice = (0 until 1024).filter(i => i / 32 <= 7).map(i => s"k$i").toSet
    val xSlice = (0 until 1024).filter(i => i % 32 <= 7).map(i => s"k$i").toSet
    val yCond = col("y").between(0L, 7L)
    val xCond = col("x").between(0L, 7L)
    // lexicographic (x, y): every file spans all of y — a y-only range
    // predicate prunes (nearly) nothing
    val lexY = prunedBy(lex, yCond, ySlice)
    // z-order: files are ~quadrant boxes, so the top-quarter y slice
    // provably misses every y-high box, and the same holds for x
    val zedY = prunedBy(zed, yCond, ySlice)
    val zedX = prunedBy(zed, xCond, xSlice)
    assert(zedY >= filesZ / 4, s"y-range pruned only $zedY of $filesZ z-ordered files")
    assert(zedX >= filesZ / 4, s"x-range pruned only $zedX of $filesZ z-ordered files")
    assert(zedY > lexY,
      s"z-order must beat lexicographic on the second dimension: $zedY vs $lexY")
  }

  test("z-order validation: one column, unrankable types, boundless files refuse") {
    val t = gridTable()
    val e1 = intercept[IllegalArgumentException](t.cluster(Seq("x"), zorder = true))
    assert(e1.getMessage.contains("at least two"))
    val e2 = intercept[IllegalArgumentException](t.cluster(Seq("k", "x"), zorder = true))
    assert(e2.getMessage.contains("not supported"))

    // NaN-polluted doubles leave a file with no harvestable bounds: the
    // z-order refuses rather than normalize against a guessed box
    val nan = LakeTable.createOrOpen(spark, Files.createTempDirectory("zorder-nan").toString,
      StructType.fromDDL("k STRING, wv BIGINT, v DOUBLE, w DOUBLE"),
      keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2)
    nan.merge(Seq(("a", 1L, Double.NaN, 1.0), ("b", 1L, Double.NaN, 2.0))
      .toDF("k", "wv", "v", "w"), "b0")
    val e3 = intercept[IllegalArgumentException](nan.cluster(Seq("v", "w"), zorder = true))
    assert(e3.getMessage.contains("compact()"))

    // an ALL-NULL dimension is fine: it contributes a constant rank
    val nul = LakeTable.createOrOpen(spark, Files.createTempDirectory("zorder-null").toString,
      StructType.fromDDL("k STRING, wv BIGINT, v DOUBLE, w DOUBLE"),
      keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2)
    nul.merge(Seq(("a", 1L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(1.0)),
        ("b", 1L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(2.0)))
      .toDF("k", "wv", "v", "w"), "b0")
    assert(nul.cluster(Seq("v", "w"), zorder = true) > 0)
    assert(nul.read().count() === 2L)
  }

  test("SQL procedure: CALL lake.system.cluster(..., zorder => true)") {
    val wh = Files.createTempDirectory("zorder-sql").toString
    spark.conf.set("spark.sql.catalog.zo_sql",
      classOf[graft.tables.dsv2.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.zo_sql.warehouse", wh)
    val t = LakeTable.createOrOpen(spark, s"$wh/grid", schema,
      keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 4)
    val rows = (0 until 1024).map(i => (s"k$i", i.toLong, (i % 32).toLong, (i / 32).toLong))
    t.merge(rows.toDF("k", "wv", "x", "y"), "load")
    val res = spark.sql(
      "CALL zo_sql.system.cluster('grid', 'x,y', max_rows_per_file => 64, zorder => true)")
      .collect()
    assert(res.head.getInt(0) === 4)
    val got = spark.sql("SELECT k FROM zo_sql.grid WHERE x BETWEEN 0 AND 7 AND y BETWEEN 0 AND 7")
      .as[String].collect().toSet
    assert(got === (0 until 1024).filter(i => i % 32 <= 7 && i / 32 <= 7)
      .map(i => s"k$i").toSet)
  }
}
