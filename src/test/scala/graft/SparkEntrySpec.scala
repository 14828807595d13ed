package graft

class SparkEntrySpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach(k => assert(qs.contains(k), s"orphan oracle $k"))
  }

  test("salted and plain LWW agree on real events data") {
    val a = SparkEntry.queries("q01_lww_dedup")(spark, sfDir).collect().map(_.toString).sorted
    val b = SparkEntry.queries("q02_lww_dedup_salted")(spark, sfDir).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }
}
