package graft.operators

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def events = Seq(
    // (key, writeVersion, slot, payload)
    ("k1", 1L, 10L, "a"),
    ("k1", 3L, 11L, "c"),
    ("k1", 2L, 11L, "b"),
    ("k2", 5L, 10L, "x"),
    ("k3", 7L, 12L, "y"),
    ("k3", 7L, 13L, "z") // same writeVersion, later slot wins
  ).toDF("pubkey", "writeVersion", "slot", "payload")

  test("latestByKey keeps max (writeVersion, slot) row per key") {
    val out = Dedup.latestByKey(events, Seq("pubkey"), Seq("writeVersion", "slot"))
      .as[(String, Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(("k1", 3L, 11L, "c"), ("k2", 5L, 10L, "x"), ("k3", 7L, 13L, "z")))
  }

  test("saltedLatestByKey is equivalent to latestByKey") {
    val plain = Dedup.latestByKey(events, Seq("pubkey"), Seq("writeVersion", "slot"))
      .as[(String, Long, Long, String)].collect().toSet
    val salted = Dedup.saltedLatestByKey(events, Seq("pubkey"), Seq("writeVersion", "slot"), 4)
      .as[(String, Long, Long, String)].collect().toSet
    assert(salted === plain)
  }

  test("LWW is idempotent and permutation-invariant") {
    val shuffled = events.orderBy(org.apache.spark.sql.functions.rand(7))
    val once = Dedup.latestByKey(events, Seq("pubkey"), Seq("writeVersion", "slot"))
    val fromShuffled = Dedup.latestByKey(shuffled, Seq("pubkey"), Seq("writeVersion", "slot"))
    val twice = Dedup.latestByKey(once, Seq("pubkey"), Seq("writeVersion", "slot"))
    val a = once.as[(String, Long, Long, String)].collect().toSet
    assert(fromShuffled.as[(String, Long, Long, String)].collect().toSet === a)
    assert(twice.as[(String, Long, Long, String)].collect().toSet === a)
  }
}
