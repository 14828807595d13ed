package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

/** Incrementally-maintained materialized aggregate views: exact equality
  * with recomputation across merges/updates/deletes, group birth/death,
  * idempotent + crash-consistent refresh, bootstrap past expired history,
  * and streaming maintenance. */
class MaterializedViewSpec extends SparkTestBase {

  import spark.implicits._

  private def newBase(buckets: Int = 4): LakeTable = {
    val root = Files.createTempDirectory("mvbase").toString
    LakeTable.createOrOpen(spark, root,
      StructType.fromDDL("k STRING, wv BIGINT, grp STRING, n BIGINT, x DOUBLE, deleted BOOLEAN"),
      Seq("k"), Seq("wv"), buckets, tombstoneCol = Some("deleted"))
  }

  private def newMv(base: LakeTable, aggs: Seq[AggSpec]): MaterializedView =
    MaterializedView.createOrOpen(spark,
      Files.createTempDirectory("mv").toString, base, Seq("grp"), aggs, numBuckets = 4)

  private val allAggs = Seq(
    AggSpec("count", "*", "cnt"),
    AggSpec("count", "n", "cnt_n"),
    AggSpec("sum", "n", "sum_n"),
    AggSpec("avg", "n", "avg_n"),
    AggSpec("min", "n", "min_n"),
    AggSpec("max", "n", "max_n"),
    AggSpec("sum", "x", "sum_x"))

  /** direct recomputation over the base's current visible state */
  private def oracle(base: LakeTable): Set[Row6] =
    base.read().groupBy($"grp")
      .agg(count(lit(1)).as("cnt"), count($"n").as("cnt_n"), sum($"n").as("sum_n"),
        avg($"n").as("avg_n"), min($"n").as("min_n"), max($"n").as("max_n"),
        sum($"x").as("sum_x"))
      .collect().map(Row6.of).toSet

  private def mvRows(mv: MaterializedView): Set[Row6] =
    mv.read().collect().map(Row6.of).toSet

  private case class Row6(grp: String, cnt: Long, cntN: Long, sumN: Option[Long],
      avgN: Option[Double], minN: Option[Long], maxN: Option[Long], sumX: Option[Double])
  private object Row6 {
    def of(r: org.apache.spark.sql.Row): Row6 = Row6(
      r.getAs[String]("grp"), r.getAs[Long]("cnt"), r.getAs[Long]("cnt_n"),
      Option(r.getAs[Any]("sum_n")).map(_.asInstanceOf[Long]),
      Option(r.getAs[Any]("avg_n")).map(v => math.rint(v.asInstanceOf[Double] * 1e9) / 1e9),
      Option(r.getAs[Any]("min_n")).map(_.asInstanceOf[Long]),
      Option(r.getAs[Any]("max_n")).map(_.asInstanceOf[Long]),
      Option(r.getAs[Any]("sum_x")).map(v => math.rint(v.asInstanceOf[Double] * 1e6) / 1e6))
  }

  private def df(rows: (String, Long, String, java.lang.Long, java.lang.Double, Boolean)*)
      : DataFrame =
    rows.toDF("k", "wv", "grp", "n", "x", "deleted")

  test("refresh tracks recomputation exactly through inserts, updates, deletes") {
    val base = newBase()
    val mv = newMv(base, allAggs)

    // v1: plain inserts across two groups (one null n in g1)
    base.merge(df(("a", 1, "g1", 10L, 1.5, false), ("b", 1, "g1", null, 2.5, false),
      ("c", 1, "g2", 7L, 0.5, false)), "b1")
    mv.refresh()
    assert(mvRows(mv) === oracle(base))

    // v2: update a (changes g1's min), insert into g3, delete c (kills g2)
    base.merge(df(("a", 2, "g1", 40L, 9.0, false), ("d", 1, "g3", -3L, 1.0, false),
      ("c", 2, null, null, null, true)), "b2", mor = true)
    mv.refresh()
    assert(mvRows(mv) === oracle(base))
    assert(!mvRows(mv).exists(_.grp == "g2"), "dead group must vanish from the view")

    // v3: group MOVE (a hops g1→g3) + re-insert into g2 + null-group rows
    base.merge(df(("a", 3, "g3", 40L, 9.0, false), ("e", 1, "g2", 100L, 4.0, false),
      ("f", 1, null, 5L, 0.25, false)), "b3")
    mv.refresh()
    assert(mvRows(mv) === oracle(base))
    assert(mvRows(mv).exists(_.grp == null), "null group must aggregate like SQL GROUP BY")

    // several versions between refreshes fold into one window
    base.merge(df(("f", 2, null, null, null, true)), "b4", mor = true)
    base.merge(df(("g", 1, "g1", 2L, 2.0, false), ("d", 2, "g3", 30L, 1.0, false)), "b5")
    mv.refresh()
    assert(mvRows(mv) === oracle(base))
  }

  test("randomized interleavings: MV equals recomputation at every refresh") {
    val base = newBase(buckets = 8)
    val mv = newMv(base, allAggs)
    val rnd = new scala.util.Random(7)
    val keys = (0 until 40).map(i => s"k$i")
    val groups = Seq("a", "b", "c", "d", null)
    var wv = 0L
    for (step <- 1 to 12) {
      val rows = (0 until (5 + rnd.nextInt(20))).map { _ =>
        wv += 1
        val del = rnd.nextInt(10) == 0
        (keys(rnd.nextInt(keys.size)), wv,
          if (del) null else groups(rnd.nextInt(groups.size)),
          if (del || rnd.nextInt(8) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(1000).toLong - 300),
          if (del) null else java.lang.Double.valueOf(rnd.nextDouble()),
          del)
      }
      base.merge(df(rows: _*), s"r$step", mor = step % 2 == 0)
      if (step % 3 == 0 || step == 12) {
        mv.refresh()
        assert(mvRows(mv) === oracle(base), s"diverged at step $step")
      }
    }
  }

  test("refresh is idempotent and exactly-once under re-delivery") {
    val base = newBase()
    val mv = newMv(base, Seq(AggSpec("count", "*", "cnt"), AggSpec("sum", "n", "sum_n")))
    base.merge(df(("a", 1, "g1", 5L, 1.0, false)), "b1")
    val v = mv.refresh()
    val before = mv.read().collect().toSeq
    // re-refresh with no base movement: watermark no-ops, state unchanged
    assert(mv.refresh() === v)
    assert(mv.lastRefreshedBaseVersion === base.currentVersion())
    assert(mv.read().collect().toSeq === before)
    assert(mv.state.currentVersion() === 1L, "no-op refresh must not commit")
    // a second handle over the same roots shares the watermark (crash-resume)
    val mv2 = MaterializedView.createOrOpen(spark, mv.root, base,
      Seq("grp"), Seq(AggSpec("count", "*", "cnt"), AggSpec("sum", "n", "sum_n")),
      numBuckets = 4)
    assert(mv2.lastRefreshedBaseVersion === v)
    assert(mv2.refresh() === v)
  }

  test("re-open validates the persisted definition") {
    val base = newBase()
    val mv = newMv(base, Seq(AggSpec("count", "*", "cnt")))
    val e = intercept[IllegalArgumentException] {
      MaterializedView.createOrOpen(spark, mv.root, base,
        Seq("grp"), Seq(AggSpec("sum", "n", "s")), numBuckets = 4)
    }
    assert(e.getMessage.contains("different view definition"))
  }

  test("bootstrap falls back to a full rebuild when the window start is expired") {
    val base = newBase()
    val mv = newMv(base, allAggs)
    base.merge(df(("a", 1, "g1", 1L, 1.0, false), ("b", 1, "g2", 2L, 2.0, false)), "b1")
    mv.refresh()
    assert(mvRows(mv) === oracle(base))
    // advance the base several versions, including killing g2, then expire
    // history so the MV's from-version metadata is gone
    base.merge(df(("a", 2, "g1", 10L, 1.0, false)), "b2")
    base.merge(df(("b", 2, null, null, null, true)), "b3")
    base.merge(df(("c", 1, "g3", 30L, 3.0, false)), "b4")
    base.expire(keepVersions = 1)
    assert(!Files.exists(java.nio.file.Paths.get(base.root, "meta",
      s"v${mv.lastRefreshedBaseVersion}.json")), "precondition: from-version expired")
    mv.refresh()
    assert(mvRows(mv) === oracle(base))
    assert(!mvRows(mv).exists(_.grp == "g2"), "rebuild must tombstone vanished groups")
  }

  test("retraction-free windows never touch the base table") {
    val base = newBase()
    val mv = newMv(base, allAggs)
    base.merge(df(("a", 1, "g1", 1L, 1.0, false)), "b1")
    mv.refresh()
    // insert-only window: min/max fold incrementally, so the recompute
    // branch (the only base-table read a refresh can issue) has zero
    // input groups — asserted via the window's retraction count.
    base.merge(df(("b", 1, "g1", 5L, 2.0, false), ("c", 1, "g2", 3L, 1.0, false)), "b2")
    val changes = base.readChangesTyped(mv.lastRefreshedBaseVersion, base.currentVersion())
    assert(changes.filter($"_change_type".isin("delete", "update_preimage")).count() === 0)
    mv.refresh()
    assert(mvRows(mv) === oracle(base))
  }

  test("maintainContinuously catches up on existing base data before the " +
      "stream (default anchor is the base's head — without the initial " +
      "refresh a quiescent base would leave the view empty forever)") {
    val base = newBase()
    base.merge(df(("a", 1, "g1", 5L, 1.0, false), ("b", 1, "g2", 2L, 1.0, false)), "pre")
    val mv = newMv(base, Seq(AggSpec("count", "*", "cnt"), AggSpec("sum", "n", "sum_n"),
      AggSpec("max", "n", "max_n")))
    val q = mv.maintainContinuously(Files.createTempDirectory("mvckpt0").toString)
    try {
      q.processAllAvailable()
      // no base commit since the stream started — the view must still
      // reflect the pre-existing data via the catch-up refresh
      assert(mvRows3(mv) === oracle3(base))
      assert(mvRows3(mv).nonEmpty)
    } finally q.stop()
  }

  test("streaming maintenance keeps the view fresh across micro-batches") {
    val base = newBase()
    val mv = newMv(base, Seq(AggSpec("count", "*", "cnt"), AggSpec("sum", "n", "sum_n"),
      AggSpec("max", "n", "max_n")))
    base.merge(df(("a", 1, "g1", 5L, 1.0, false)), "s1")
    val ckpt = Files.createTempDirectory("mvckpt").toString
    val q = mv.maintainContinuously(ckpt,
      options = Map("maxVersionsPerBatch" -> "1", "startingVersion" -> "earliest"))
    try {
      q.processAllAvailable()
      assert(mvRows3(mv) === oracle3(base))
      base.merge(df(("b", 1, "g1", 7L, 1.0, false), ("c", 1, "g2", 1L, 1.0, false)), "s2")
      base.merge(df(("a", 2, null, null, null, true)), "s3", mor = true)
      q.processAllAvailable()
      assert(mvRows3(mv) === oracle3(base))
    } finally q.stop()
    // restart from the checkpoint: no duplicate application
    base.merge(df(("d", 1, "g2", 9L, 2.0, false)), "s4")
    val q2 = mv.maintainContinuously(ckpt)
    try {
      q2.processAllAvailable()
      assert(mvRows3(mv) === oracle3(base))
    } finally q2.stop()
  }

  private def mvRows3(mv: MaterializedView): Set[(String, Long, Option[Long], Option[Long])] =
    mv.read().collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("cnt"),
      Option(r.getAs[Any]("sum_n")).map(_.asInstanceOf[Long]),
      Option(r.getAs[Any]("max_n")).map(_.asInstanceOf[Long]))).toSet

  private def oracle3(base: LakeTable): Set[(String, Long, Option[Long], Option[Long])] =
    base.read().groupBy($"grp")
      .agg(count(lit(1)).as("cnt"), sum($"n").as("sum_n"), max($"n").as("max_n"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("cnt"),
        Option(r.getAs[Any]("sum_n")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("max_n")).map(_.asInstanceOf[Long]))).toSet
}
