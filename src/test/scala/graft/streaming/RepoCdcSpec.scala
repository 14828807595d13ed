package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkTestBase
import graft.sources.RepoChangeFixture
import graft.tables.LakeTable

class RepoCdcSpec extends SparkTestBase {

  private val schema = StructType.fromDDL(
    "repo STRING, path STRING, commit STRING, commitSeq BIGINT, lang STRING, content STRING")

  test("repo change stream reaches the independent fold, incl. sha256 invariant") {
    val work = Files.createTempDirectory("repocdc").toString
    val (batches, expected) = RepoChangeFixture.generate(RepoChangeFixture.Spec(seed = 5L))
    RepoChangeFixture.writeBatches(spark, batches, s"$work/changes")
    val table = LakeTable.createOrOpen(spark, s"$work/table", schema,
      keyCols = Seq("repo", "path"), orderCols = Seq("commitSeq"), numBuckets = 16)
    CdcPipeline.runOnce(spark, table, s"$work/changes", schema, s"$work/cp", "t",
      salted = true) // exercise the salted path through streaming too
    val rows = table.read()
      .select(col("repo"), col("path"), col("commitSeq"), col("commit"),
        sha2(col("content"), 256).as("sha"))
      .collect()
    assert(rows.length === expected.size)
    val sha256 = java.security.MessageDigest.getInstance("SHA-256")
    rows.foreach { r =>
      val exp = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === exp.commitSeq, s"${r.getString(0)}/${r.getString(1)}")
      assert(r.getString(3) === exp.commit)
      val expSha = sha256.digest(exp.content.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(4) === expSha)
    }
    // per-batch lineage rows recorded
    assert(table.snapshot().lineage.nonEmpty)
  }

  test("winnowing fingerprints: containment property and determinism") {
    import graft.operators.TextOps
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val contained = "PREFIX XX " + base + " SUFFIX YY"
    val unrelated = "completely different words live here with no overlap at all whatsoever"
    val fBase = TextOps.winnow(base).toSet
    val fCont = TextOps.winnow(contained).toSet
    val fUnrel = TextOps.winnow(unrelated).toSet
    // any long-enough shared substring shares fingerprints
    assert(fBase.intersect(fCont).size >= 3)
    assert(fBase.intersect(fUnrel).isEmpty)
    assert(TextOps.winnow(base).toSeq === TextOps.winnow(base).toSeq) // deterministic
    assert(TextOps.winnow("").toSeq === Seq(0L))
    assert(TextOps.winnow("ab").length === 1) // shorter than k
  }
}
