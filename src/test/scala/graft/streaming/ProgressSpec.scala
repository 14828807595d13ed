package graft.streaming

import graft.SparkTestBase

class ProgressSpec extends SparkTestBase {
  test("listener aggregates input records across stages (S9, lib.rs:92-107)") {
    val msgs = scala.collection.mutable.ArrayBuffer[String]()
    val p = Progress.attach(spark, m => msgs.synchronized { msgs += m })
    val n = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    // listener events are posted asynchronously; poll for delivery
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (p.recordsRead < n && System.nanoTime() < deadline) Thread.sleep(50)
    assert(p.recordsRead === n)
    assert(p.bytesRead > 0)
  }
}
