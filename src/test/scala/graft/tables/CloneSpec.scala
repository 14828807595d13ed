package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

/** Zero-copy shallow clone (Delta `SHALLOW CLONE` analog): the clone's v0
  * references the SOURCE's data files by absolute path; writes un-shallow
  * touched buckets; a protective tag on the source pins the cloned version
  * against the source's `expire`. */
class CloneSpec extends SparkTestBase {

  import spark.implicits._

  private val schema = StructType.fromDDL("k STRING, wv BIGINT, v STRING")

  private def newTable(name: String = "clone-src"): LakeTable =
    LakeTable.createOrOpen(spark, Files.createTempDirectory(name).toString,
      schema, keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2)

  private def wave(t: LakeTable, wv: Long, suffix: String): Unit =
    t.merge(Seq(("a", wv, s"a$suffix"), ("b", wv, s"b$suffix"))
      .toDF("k", "wv", "v"), s"b$wv")

  private def values(t: LakeTable): Set[String] =
    t.read().collect().map(_.getString(2)).toSet

  test("clone is zero-copy, reads the cloned version, and pins it with a tag") {
    val src = newTable()
    wave(src, 1L, "1")
    val v1 = src.currentVersion()
    wave(src, 2L, "2")
    val dest = Files.createTempDirectory("clone-dst").toString
    val clone = src.cloneTo(dest, v1)
    // the clone serves EXACTLY the cloned version, not the source head
    assert(values(clone) === Set("a1", "b1"))
    assert(clone.logicalRowCount() === 2L)
    // ZERO-COPY: no data was written under the clone's root
    assert(!Files.exists(Paths.get(dest, "data")))
    // every borrowed reference is an absolute path into the source
    val refs = clone.snapshot().bucketFiles.values.flatten
    assert(refs.nonEmpty && refs.forall(_.startsWith("/")))
    // provenance + the protective tag on the source
    val Some((srcRoot, srcV, tag)) = LakeTable.cloneProvenance(dest)
    assert(Paths.get(srcRoot) === Paths.get(src.root).toAbsolutePath.normalize)
    assert(srcV === v1)
    assert(src.resolveTag(tag) === v1)
    // writer identity is NOT carried: the batch ids the source applied
    // replay fine into the clone (it is a NEW table)
    assert(clone.snapshot().txns.isEmpty && clone.snapshot().appliedBatches.isEmpty)
    // refuses: occupied destination, unretained version
    intercept[IllegalArgumentException](src.cloneTo(dest, v1))
    intercept[IllegalArgumentException](
      src.cloneTo(Files.createTempDirectory("clone-bad").toString, 999L))
  }

  test("clone diverges independently; rewrites un-shallow touched buckets") {
    val src = newTable()
    wave(src, 1L, "1")
    val dest = Files.createTempDirectory("clone-div").toString
    val clone = src.cloneTo(dest)
    // write to the CLONE only — the source must not move
    wave(clone, 2L, "2-clone")
    assert(values(clone) === Set("a2-clone", "b2-clone"))
    assert(values(src) === Set("a1", "b1"))
    // point read through the clone resolves cross-root references
    assert(clone.read(Map("k" -> "a")).collect().map(_.getString(2)).toSet
      === Set("a2-clone"))
    // the merge rewrote the touched buckets copy-on-write: their files are
    // now clone-LOCAL (relative refs); a full rewrite localizes everything
    clone.rebucket(2)
    val refs = clone.snapshot().bucketFiles.values.flatten
    assert(refs.nonEmpty && refs.forall(!_.startsWith("/")))
    // the clone's own expire GCs only clone-local dirs; the source's data
    // is untouched and the source still reads
    clone.expire(keepVersions = 1)
    assert(values(src) === Set("a1", "b1"))
  }

  test("source expire keeps borrowed files until the protective tag drops") {
    val src = newTable()
    wave(src, 1L, "1")
    val v1 = src.currentVersion()
    val dest = Files.createTempDirectory("clone-pin").toString
    val clone = src.cloneTo(dest, v1)
    (2L to 6L).foreach(i => wave(src, i, i.toString))
    val (metaGone, _) = src.expire(keepVersions = 2)
    assert(metaGone > 0)
    // the tag pinned v1: its metadata AND the files the clone borrows live
    assert(values(clone) === Set("a1", "b1"))
    // dropping the tag hands the files back to normal retention — the
    // documented way a shallow clone dies with its source pin
    val Some((_, _, tag)) = LakeTable.cloneProvenance(dest)
    src.dropTag(tag)
    src.expire(keepVersions = 2)
    assert(!Files.exists(Paths.get(src.root, "meta", s"v$v1.json")))
    intercept[Exception](values(clone))
  }

  test("merge-on-read debt clones faithfully (resolution carried over)") {
    val src = newTable()
    wave(src, 1L, "1")
    src.merge(Seq(("a", 2L, "a2"), ("c", 2L, "c2")).toDF("k", "wv", "v"),
      "mor1", mor = true)
    assert(src.snapshot().morBuckets.nonEmpty)
    val clone = src.cloneTo(Files.createTempDirectory("clone-mor").toString)
    assert(clone.snapshot().morBuckets === src.snapshot().morBuckets)
    // the clone's read resolves the borrowed layers to the same LWW winners
    assert(values(clone) === values(src))
    assert(values(clone) === Set("a2", "b1", "c2"))
    // compacting the clone resolves ITS debt into clone-local files without
    // touching the source's layers
    clone.compact()
    assert(clone.snapshot().morBuckets.isEmpty)
    assert(src.snapshot().morBuckets.nonEmpty)
    assert(values(clone) === Set("a2", "b1", "c2"))
  }

  test("same-basename clones of the same version get INDEPENDENT tags") {
    val src = newTable()
    wave(src, 1L, "1")
    val v1 = src.currentVersion()
    val destA = s"${Files.createTempDirectory("clone-par-a")}/x"
    val destB = s"${Files.createTempDirectory("clone-par-b")}/x"
    val cloneA = src.cloneTo(destA, v1)
    val cloneB = src.cloneTo(destB, v1)
    val Some((_, _, tagA)) = LakeTable.cloneProvenance(destA)
    val Some((_, _, tagB)) = LakeTable.cloneProvenance(destB)
    // identity-digested names: dropping A's pin must not unpin B
    assert(tagA !== tagB)
    src.dropTag(tagA)
    (2L to 6L).foreach(i => wave(src, i, i.toString))
    src.expire(keepVersions = 2)
    assert(values(cloneB) === Set("a1", "b1"))
    assert(values(cloneA) === Set("a1", "b1")) // B's tag still pins the files
  }

  test("SQL: CALL clone, then query the clone through the catalog") {
    val wh = Files.createTempDirectory("clone-sql").toString
    spark.conf.set("spark.sql.catalog.clone_sql",
      classOf[graft.tables.dsv2.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.clone_sql.warehouse", wh)
    val src = LakeTable.createOrOpen(spark, s"$wh/src_t", schema,
      keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2)
    wave(src, 1L, "1")
    val vBefore = src.currentVersion()
    val res = spark.sql("CALL clone_sql.system.clone('src_t', 'dst_t')").collect()
    assert(res.head.getLong(0) === vBefore)
    assert(res.head.getString(1).startsWith(s"clone-dst_t-v$vBefore-"))
    wave(src, 2L, "2")
    assert(spark.sql("SELECT v FROM clone_sql.dst_t").as[String].collect().toSet
      === Set("a1", "b1"))
    assert(spark.sql("SELECT v FROM clone_sql.src_t").as[String].collect().toSet
      === Set("a2", "b2"))
    // the clone accepts SQL DML like any table
    spark.sql("INSERT INTO clone_sql.dst_t VALUES ('c', 3, 'c3')")
    assert(spark.sql("SELECT v FROM clone_sql.dst_t").as[String].collect().toSet
      === Set("a1", "b1", "c3"))
  }
}
