package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

/** Write-audit-publish (Iceberg `fast_forward` analog): audit risky work on
  * a zero-copy clone, then publish its head back to the source in one
  * commit — borrowed refs relativize in place, clone-local files rename in,
  * ledgers merge so exactly-once survives the publish, and the source must
  * not have moved (strict fast-forward). */
class FastForwardSpec extends SparkTestBase {

  import spark.implicits._

  private val schema = StructType.fromDDL("k STRING, wv BIGINT, v STRING")

  private def newTable(): LakeTable =
    LakeTable.createOrOpen(spark, Files.createTempDirectory("ff-src").toString,
      schema, keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2)

  private def wave(t: LakeTable, wv: Long, suffix: String,
      txn: Option[(String, Long)] = None): Unit =
    t.merge(Seq(("a", wv, s"a$suffix"), ("b", wv, s"b$suffix"))
      .toDF("k", "wv", "v"), s"b$wv", txn = txn)

  private def values(t: LakeTable): Set[String] =
    t.read().collect().map(_.getString(2)).toSet

  private def localDataFiles(t: LakeTable): Int = {
    val d = Paths.get(t.root, "data")
    if (!Files.isDirectory(d)) 0
    else {
      val it = Files.walk(d)
      try it.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally it.close()
    }
  }

  test("publish adopts the audited state; no data copied; ledgers merge") {
    val src = newTable()
    wave(src, 1L, "1", txn = Some(("stream", 10L)))
    val srcFilesBefore = localDataFiles(src)
    val dest = Files.createTempDirectory("ff-clone").toString
    val clone = src.cloneTo(dest)
    // audit on the clone: an upsert AND a schema evolution
    clone.merge(Seq(("a", 2L, "a2-audit", "x")).toDF("k", "wv", "v", "extra"),
      "audit1", txn = Some(("audit", 0L)))
    val cloneLocal = localDataFiles(clone)
    assert(cloneLocal > 0)
    val v = src.fastForward(dest)
    assert(v === src.currentVersion())
    // the source now serves the audited state, evolved schema included
    assert(values(src) === Set("a2-audit", "b1"))
    assert(src.schema.fieldNames.contains("extra"))
    // NO COPIES: the source gained exactly the clone's local files (renames)
    assert(localDataFiles(src) === srcFilesBefore + cloneLocal)
    // untouched buckets kept their original refs — everything is local and
    // relative again (no borrowed absolute refs survive the publish)
    val refs = src.snapshot().bucketFiles.values.flatten
    assert(refs.nonEmpty && refs.forall(!_.startsWith("/")))
    // the protective tag died in the same commit
    assert(src.snapshot().tags.isEmpty)
    // exactly-once continuity: BOTH the source stream's and the audit's
    // ledger survive — replays of either are commit-free no-ops
    val before = src.currentVersion()
    wave(src, 1L, "replayed", txn = Some(("stream", 10L)))
    src.merge(Seq(("a", 2L, "audit-replay")).toDF("k", "wv", "v"),
      "audit1", txn = Some(("audit", 0L)))
    assert(src.currentVersion() === before)
    assert(values(src) === Set("a2-audit", "b1"))
    // the clone is consumed: opens fail, a PUBLISHED note remains
    intercept[IllegalArgumentException](LakeTable.open(spark, dest))
    assert(Files.exists(Paths.get(dest, "meta", "PUBLISHED.json")))
    // and publishing it twice refuses
    intercept[IllegalArgumentException](src.fastForward(dest))
  }

  test("strict fast-forward: a source that moved refuses before any file moves") {
    val src = newTable()
    wave(src, 1L, "1")
    val dest = Files.createTempDirectory("ff-race").toString
    val clone = src.cloneTo(dest)
    wave(clone, 2L, "2-audit")
    wave(src, 2L, "2-src") // source advances after the clone
    val e = intercept[IllegalArgumentException](src.fastForward(dest))
    assert(e.getMessage.contains("advanced"))
    // nothing moved: both sides intact and independently readable
    assert(values(src) === Set("a2-src", "b2-src"))
    assert(values(clone) === Set("a2-audit", "b2-audit"))
  }

  test("a rebucketed clone refuses to publish (layout+data in one commit " +
      "would read as a maintenance boundary downstream)") {
    val src = newTable()
    wave(src, 1L, "1")
    val cloneRoot = Files.createTempDirectory("ff-audit").toString + "/audit"
    val audit = src.cloneTo(cloneRoot)
    audit.rebucket(4)
    wave(audit, 2L, "2")
    val e = intercept[IllegalArgumentException](src.fastForward(cloneRoot))
    assert(e.getMessage.contains("rebucket"))
    // the refusal moved nothing: source unchanged and still publishable
    // after a fresh, layout-preserving audit
    assert(values(src) === Set("a1", "b1"))
  }

  test("validation: non-clones, foreign clones, self") {
    val src = newTable()
    wave(src, 1L, "1")
    // not a clone at all
    val plain = newTable()
    val e1 = intercept[IllegalArgumentException](src.fastForward(plain.root))
    assert(e1.getMessage.contains("not a clone"))
    // a clone of ANOTHER table
    val other = newTable()
    wave(other, 1L, "1")
    val foreign = Files.createTempDirectory("ff-foreign").toString
    other.cloneTo(foreign)
    val e2 = intercept[IllegalArgumentException](src.fastForward(foreign))
    assert(e2.getMessage.contains("descends from"))
    intercept[IllegalArgumentException](src.fastForward(src.root))
  }

  test("recurring WAP loop: the audit name is reusable after each publish") {
    val src = newTable()
    wave(src, 1L, "1")
    val audit = s"${Files.createTempDirectory("ff-loop")}/audit"
    (2L to 4L).foreach { round =>
      val clone = src.cloneTo(audit) // consumed remnants cleared each round
      wave(clone, round, s"$round-audit")
      src.fastForward(audit)
      assert(values(src) === Set(s"a$round-audit", s"b$round-audit"))
    }
    // each round's publish dropped its own protective tag: nothing pinned
    assert(src.snapshot().tags.isEmpty)
    // a dest holding a NEVER-published table's remnants still refuses
    val crashed = Files.createTempDirectory("ff-crashed").toString
    Files.createDirectories(Paths.get(crashed, "meta"))
    Files.write(Paths.get(crashed, "meta", "v0.json"), "{}".getBytes)
    val e = intercept[IllegalArgumentException](src.cloneTo(crashed))
    assert(e.getMessage.contains("never published"))
  }

  test("SQL: CALL fast_forward publishes a CALL-clone audit") {
    val wh = Files.createTempDirectory("ff-sql").toString
    spark.conf.set("spark.sql.catalog.ff_sql",
      classOf[graft.tables.dsv2.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.ff_sql.warehouse", wh)
    val src = LakeTable.createOrOpen(spark, s"$wh/base", schema,
      keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2)
    wave(src, 1L, "1")
    spark.sql("CALL ff_sql.system.clone('base', 'audit')").collect()
    spark.sql("INSERT INTO ff_sql.audit VALUES ('c', 2, 'c2')")
    val v = spark.sql("CALL ff_sql.system.fast_forward('base', 'audit')")
      .head().getLong(0)
    assert(v === src.currentVersion())
    assert(spark.sql("SELECT v FROM ff_sql.base").as[String].collect().toSet
      === Set("a1", "b1", "c2"))
    // the consumed clone no longer resolves as a table
    intercept[Exception](spark.sql("SELECT * FROM ff_sql.audit").collect())
  }
}
