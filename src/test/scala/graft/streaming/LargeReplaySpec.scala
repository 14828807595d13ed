package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.SnapshotFixture

/** Scale sanity: the LWW fold equality holds on a ~120k-event stream with
  * heavy cross-snapshot key overlap, salted path on — the same invariant
  * SnapshotReplaySpec proves at toy size. */
class LargeReplaySpec extends SparkTestBase {

  test("120k-event full+incremental replay equals the in-memory fold (salted)") {
    val spec = SnapshotFixture.Spec(slots = 4, vecsPerSlot = 4,
      accountsPerVec = 2500, pubkeyPool = 20000)
    val (fixtures, expected) = SnapshotFixture.generateStream(seed = 31L,
      increments = 2, spec = spec)
    val dir = Files.createTempDirectory("big-replay").toString
    fixtures.foreach(fx => SnapshotFixture.writeUnpacked(fx, s"$dir/snap-${fx.manifest.slot}"))
    val table = SnapshotReplay.createTable(spark,
      Files.createTempDirectory("big-tbl").toString, numBuckets = 16)
    fixtures.foreach(fx =>
      SnapshotReplay.applySnapshot(spark, table, s"$dir/snap-${fx.manifest.slot}", salted = true))
    val rows = table.read()
      .select(col("pubkey"), col("writeVersion"), col("slot"), sha2(col("data"), 256).as("sha"))
      .collect()
    assert(rows.length === expected.size)
    var checked = 0
    rows.foreach { r =>
      val exp = expected(r.getAs[Array[Byte]]("pubkey").toSeq)
      assert(r.getAs[Long]("writeVersion") === exp.writeVersion)
      assert(r.getAs[Long]("slot") === exp.slot)
      checked += 1
    }
    assert(checked === expected.size)
  }
}
