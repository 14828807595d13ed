package graft.tables.dsv2

import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.SparkTestBase
import graft.tables.LakeTable

/** Row-level SQL DML (UPDATE / MERGE INTO / predicate DELETE) through the
  * delta-based row-level-operation API: every statement lands as ordered
  * CDC events through the exactly-LWW merge, so DML interleaves soundly
  * with stream upserts and out-of-order arrivals. */
class LakeDmlSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("lake-dml-warehouse").toString
    spark.conf.set("spark.sql.catalog.dml", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.dml.warehouse", w)
    w
  }

  private def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))

  private def makeTable(name: String, tombstone: Boolean = false): LakeTable = {
    val ddl = if (tombstone) "k STRING, wv BIGINT, v STRING, n BIGINT, deleted BOOLEAN"
    else "k STRING, wv BIGINT, v STRING, n BIGINT"
    LakeTable.createOrOpen(spark, s"$warehouse/$name", StructType.fromDDL(ddl),
      Seq("k"), Seq("wv"), 4,
      tombstoneCol = if (tombstone) Some("deleted") else None)
  }

  private def state(name: String): Set[(String, Long, String, Long)] =
    spark.sql(s"SELECT k, wv, v, n FROM dml.$name").as[(String, Long, String, Long)]
      .collect().toSet

  test("UPDATE with unchanged ordering auto-bumps past the pre-image and wins " +
      "the LWW fold; a stale stream event then still loses to it") {
    val t = makeTable("u1")
    t.merge(Seq(("a", 10L, "a1", 1L), ("b", 10L, "b1", 2L), ("c", 10L, "c1", 3L))
      .toDF("k", "wv", "v", "n"), "b1")
    spark.sql("UPDATE dml.u1 SET v = upper(v), n = n + 100 WHERE k <> 'c'")
    assert(state("u1") === Set(
      ("a", 11L, "A1", 101L), ("b", 11L, "B1", 102L), ("c", 10L, "c1", 3L)))
    // the update is an ordered event: a late stream row at the OLD ordering
    // loses to it (the CDC out-of-order contract)
    t.merge(Seq(("a", 10L, "stale", 0L)).toDF("k", "wv", "v", "n"), "late")
    assert(state("u1").contains(("a", 11L, "A1", 101L)))
    // and the statement went through the normal merge: lineage recorded it
    assert(t.snapshot().appliedBatches.exists(_.startsWith("sql-update-")))
  }

  test("UPDATE that explicitly advances the ordering is taken at its word; " +
      "one that regresses it fails loudly") {
    val t = makeTable("u2")
    t.merge(Seq(("a", 10L, "a1", 1L)).toDF("k", "wv", "v", "n"), "b1")
    spark.sql("UPDATE dml.u2 SET wv = 50, v = 'a50' WHERE k = 'a'")
    assert(state("u2") === Set(("a", 50L, "a50", 1L)))
    val e = intercept[Exception] {
      spark.sql("UPDATE dml.u2 SET wv = 7, v = 'old' WHERE k = 'a'")
    }
    assert(messages(e).exists(_.contains("OLDER than the row it updates")))
    assert(state("u2") === Set(("a", 50L, "a50", 1L))) // nothing landed
  }

  test("UPDATE of a key column is rejected (the old key would silently survive)") {
    val t = makeTable("u3")
    t.merge(Seq(("a", 1L, "a1", 1L)).toDF("k", "wv", "v", "n"), "b1")
    val e = intercept[Exception] {
      spark.sql("UPDATE dml.u3 SET k = 'z' WHERE k = 'a'")
    }
    assert(messages(e).exists(_.contains("updating key columns")))
    assert(state("u3") === Set(("a", 1L, "a1", 1L)))
  }

  test("predicate DELETE (non-key WHERE) tombstones through the delta path; " +
      "key-equality DELETE still takes the metadata path") {
    val t = makeTable("d1", tombstone = true)
    t.merge(Seq(("a", 1L, "a1", 5L, false), ("b", 1L, "b1", 50L, false),
      ("c", 1L, "c1", 500L, false)).toDF("k", "wv", "v", "n", "deleted"), "b1")
    // payload predicate — only the row-level path can plan this
    spark.sql("DELETE FROM dml.d1 WHERE n >= 50 AND v LIKE 'b%'")
    assert(spark.sql("SELECT k FROM dml.d1").as[String].collect().toSet === Set("a", "c"))
    // the tombstone is ordered after the deleted winner: a stale upsert at
    // the old ordering cannot resurrect the key
    t.merge(Seq(("b", 1L, "zombie", 0L, false)).toDF("k", "wv", "v", "n", "deleted"), "late")
    assert(spark.sql("SELECT k FROM dml.d1").as[String].collect().toSet === Set("a", "c"))
    // a genuinely newer upsert does resurrect (LWW contract)
    t.merge(Seq(("b", 9L, "back", 1L, false)).toDF("k", "wv", "v", "n", "deleted"), "new")
    assert(spark.sql("SELECT k FROM dml.d1").as[String].collect().toSet === Set("a", "b", "c"))
  }

  test("DELETE without a tombstone column fails at analysis with a clear message") {
    val t = makeTable("d2")
    t.merge(Seq(("a", 1L, "a1", 1L)).toDF("k", "wv", "v", "n"), "b1")
    val e = intercept[Exception] {
      spark.sql("DELETE FROM dml.d2 WHERE n = 1")
    }
    assert(messages(e).exists(_.contains("tombstone")))
  }

  test("MERGE INTO: matched update / matched delete / not-matched insert all " +
      "land as one LWW merge batch") {
    val t = makeTable("m1", tombstone = true)
    t.merge(Seq(("a", 10L, "a1", 1L, false), ("b", 10L, "b1", 2L, false),
      ("d", 10L, "d1", 4L, false)).toDF("k", "wv", "v", "n", "deleted"), "b1")
    Seq(("a", "newA", 100L), ("c", "newC", 300L), ("d", "drop", 0L))
      .toDF("k", "v", "n").createOrReplaceTempView("src")
    spark.sql("""
      MERGE INTO dml.m1 t USING src s ON t.k = s.k
      WHEN MATCHED AND s.v = 'drop' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
      WHEN NOT MATCHED THEN INSERT (k, wv, v, n, deleted) VALUES (s.k, 1, s.v, s.n, false)
    """)
    assert(state("m1") === Set(
      ("a", 11L, "newA", 100L), // matched update: auto-bumped ordering
      ("b", 10L, "b1", 2L),     // untouched
      ("c", 1L, "newC", 300L))) // not-matched insert at the source's ordering
    // d was tombstoned at wv 11; its pre-image stays shadowed
    t.merge(Seq(("d", 10L, "stale", 0L, false)).toDF("k", "wv", "v", "n", "deleted"), "late")
    assert(!state("m1").exists(_._1 == "d"))
    assert(t.snapshot().appliedBatches.exists(_.startsWith("sql-merge-")))
  }

  test("MERGE INTO a clean table equals the typed merge of the same events " +
      "(randomized fold equality)") {
    val rnd = new scala.util.Random(42)
    val keys = (0 until 40).map(i => s"k$i")
    val base = keys.map(k => (k, rnd.nextInt(50).toLong + 1L, s"$k-base",
      rnd.nextInt(1000).toLong))
    val updates = rnd.shuffle(keys).take(25)
      .map(k => (k, s"$k-upd", rnd.nextInt(1000).toLong))
    val inserts = (100 until 115).map(i => (s"k$i", s"k$i-ins", i.toLong))

    val sqlT = makeTable("m2")
    sqlT.merge(base.toDF("k", "wv", "v", "n"), "b1")
    (updates.map { case (k, v, n) => (k, v, n) } ++ inserts)
      .toDF("k", "v", "n").createOrReplaceTempView("src2")
    spark.sql("""
      MERGE INTO dml.m2 t USING src2 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
      WHEN NOT MATCHED THEN INSERT (k, wv, v, n) VALUES (s.k, 1, s.v, s.n)
    """)

    // oracle: the same events through the typed API (update events at the
    // winner's ordering + 1, inserts at wv=1)
    val oracle = makeTable("m2o")
    oracle.merge(base.toDF("k", "wv", "v", "n"), "b1")
    val baseWv = base.map(r => r._1 -> r._2).toMap
    val events =
      updates.map { case (k, v, n) => (k, baseWv(k) + 1L, v, n) } ++
        inserts.map { case (k, v, n) => (k, 1L, v, n) }
    oracle.merge(events.toDF("k", "wv", "v", "n"), "b2")
    assert(state("m2") === oracle.read().as[(String, Long, String, Long)].collect().toSet)
  }

  test("DML on a VERSION AS OF pin is rejected") {
    val t = makeTable("p1", tombstone = true)
    t.merge(Seq(("a", 1L, "a1", 1L, false)).toDF("k", "wv", "v", "n", "deleted"), "b1")
    val v = t.currentVersion()
    t.merge(Seq(("a", 2L, "a2", 2L, false)).toDF("k", "wv", "v", "n", "deleted"), "b2")
    val e = intercept[Exception] {
      spark.sql(s"UPDATE dml.p1 VERSION AS OF $v SET v = 'x' WHERE k = 'a'")
    }
    // rejected either by our pin guard or by Spark's own analysis of
    // time-travel DML targets — both are loud
    assert(messages(e).nonEmpty)
    assert(state("p1") === Set(("a", 2L, "a2", 2L)))
  }

  test("staging is cleaned up after both success and failure") {
    val t = makeTable("s1")
    t.merge(Seq(("a", 10L, "a1", 1L)).toDF("k", "wv", "v", "n"), "b1")
    spark.sql("UPDATE dml.s1 SET v = 'x' WHERE k = 'a'")
    intercept[Exception] {
      spark.sql("UPDATE dml.s1 SET wv = 1, v = 'old' WHERE k = 'a'") // regressing: fails
    }
    val staging = java.nio.file.Paths.get(s"$warehouse/s1/staging")
    val leftovers =
      if (!Files.exists(staging)) Nil
      else {
        import scala.jdk.CollectionConverters._
        Files.list(staging).iterator().asScala.toSeq
      }
    assert(leftovers.isEmpty, s"staging leftovers: $leftovers")
  }

  test("UPDATE's delta write is exchange-free: matched rows stream from the " +
      "filtered scan straight into per-task staging (100 TB shape)") {
    val t = makeTable("pl1")
    t.merge((1 to 200).map(i => (s"k$i", 1L, s"v$i", i.toLong))
      .toDF("k", "wv", "v", "n"), "b1")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.sql("UPDATE dml.pl1 SET v = 'x' WHERE n % 2 = 0")
      // listener events are async: poll for the WriteDelta command's plan
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var delta: Option[org.apache.spark.sql.execution.SparkPlan] = None
      while (delta.isEmpty && System.nanoTime() < deadline) {
        import scala.jdk.CollectionConverters._
        delta = plans.iterator().asScala.find(_.toString.contains("WriteDelta"))
        if (delta.isEmpty) Thread.sleep(50)
      }
      val p = delta.getOrElse(fail("no WriteDelta execution captured"))
      // expand AQE wrappers, then assert zero shuffle exchanges anywhere
      // between the row-level scan and the delta write
      def flatten(n: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = n.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          flatten(a.executedPlan)
        case other => Seq(other)
      }.flatten
      val nodes = flatten(p)
      assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
        s"unexpected exchange in the delta-write plan:\n$p")
      assert(spark.sql("SELECT count(*) AS c FROM dml.pl1 WHERE v = 'x'")
        .head().getLong(0) === 100L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("row-level DELETE on a table with a NOT NULL payload column fails " +
      "with a statement-level error, not a parquet write failure") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("wv", LongType),
      StructField("v", StringType, nullable = false),
      StructField("deleted", BooleanType)))
    val t = LakeTable.createOrOpen(spark, s"$warehouse/nn1", schema,
      Seq("k"), Seq("wv"), 4, tombstoneCol = Some("deleted"))
    t.merge(Seq(("a", 1L, "a1", false)).toDF("k", "wv", "v", "deleted"), "b1")
    val e = intercept[Exception] {
      spark.sql("DELETE FROM dml.nn1 WHERE v = 'a1'")
    }
    assert(messages(e).exists(_.contains("NULL payload")),
      s"unexpected: ${messages(e).mkString(" | ")}")
  }

  test("bump paths refuse a layout whose last order column is also a key — " +
      "the bump would move the event to a different logical row") {
    val t = LakeTable.createOrOpen(spark, s"$warehouse/ko1",
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v STRING, deleted BOOLEAN"),
      Seq("id"), Seq("id"), 4, tombstoneCol = Some("deleted"))
    t.merge(Seq((1L, "a", false), (2L, "b", false)).toDF("id", "v", "deleted"), "b1")
    // the metadata path refuses (routes row-level), the row-level path
    // errors loudly — and crucially, id=1 must NOT tombstone id=2
    val e = intercept[Exception] {
      spark.sql("DELETE FROM dml.ko1 WHERE id = 1")
    }
    assert(messages(e).exists(m =>
      m.contains("also a key column") || m.contains("different key")),
      s"unexpected: ${messages(e).mkString(" | ")}")
    assert(spark.sql("SELECT id FROM dml.ko1").as[Long].collect().toSet ===
      Set(1L, 2L), "no row may be affected by the refused delete")
    val e2 = intercept[Exception] {
      spark.sql("UPDATE dml.ko1 SET v = 'x' WHERE id = 1") // unchanged ordering → bump
    }
    assert(messages(e2).exists(_.contains("also a key column")))
  }

  test("expire sweeps crashed DML staging orphans but spares marker-protected ones") {
    val t = makeTable("sw1")
    t.merge(Seq(("a", 1L, "a1", 1L)).toDF("k", "wv", "v", "n"), "b1")
    val root = java.nio.file.Paths.get(s"$warehouse/sw1")
    // a crash orphan: staging dir, stale (auto-deleted) marker long gone
    val orphan = root.resolve("staging/dml-update-deadbeef")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-00000-1.parquet"), Array[Byte](1, 2, 3))
    // a live statement: fresh inflight marker protects its staging
    val live = root.resolve("staging/dml-merge-cafe")
    Files.createDirectories(live)
    Files.write(root.resolve("meta/inflight-dml-merge-cafe"), Array.emptyByteArray)
    t.expire(keepVersions = 2)
    assert(!Files.exists(orphan), "stale orphan should be swept")
    assert(Files.exists(live), "marker-protected staging must survive")
    Files.deleteIfExists(root.resolve("meta/inflight-dml-merge-cafe"))
  }

  test("a TIMESTAMP last order column refuses the auto-bump (its internal " +
      "box is a Long — a box-typed bump would fabricate an ordering one " +
      "microsecond ahead on the user-visible time axis)") {
    // TIMESTAMP (unlike DATE) is stats-provable non-null, so the statement
    // passes the row-id nullability gate and genuinely reaches the writer's
    // bump path — the declared-type dispatch must refuse there
    LakeTable.createOrOpen(spark, s"$warehouse/ts",
      StructType.fromDDL("k STRING, ts TIMESTAMP, v STRING"), Seq("k"), Seq("ts"), 2)
      .merge(Seq(("a", java.sql.Timestamp.valueOf("2026-01-15 12:00:00"), "a1"))
        .toDF("k", "ts", "v"), "b1")
    // SET leaves the ordering untouched → the rewrite needs the slot after
    // its pre-image, which a TIMESTAMP ordering cannot provide
    val e = intercept[Exception] {
      spark.sql("UPDATE dml.ts SET v = 'a2' WHERE k = 'a'")
    }
    assert(messages(e).exists(_.contains("integral")), messages(e).mkString("; "))
    // nothing landed — the statement failed loudly, not halfway
    assert(spark.sql("SELECT v FROM dml.ts").as[String].collect().toSeq === Seq("a1"))
  }
}
