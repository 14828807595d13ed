package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  /** In-memory union-find oracle. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize roots to component minimum
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain merges transitively (multi-round convergence)") {
    // a path 1-2-3-...-12: hash-min would need diameter rounds; the star
    // alternation must still land every node on component 1
    val chain = (1L to 11L).map(i => (i, i + 1))
    assert(ccOf(chain) == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("direction, duplicates, and self-loops are irrelevant; separate components stay separate") {
    val edges = Seq((5L, 2L), (2L, 5L), (2L, 5L), (7L, 7L), (10L, 11L))
    assert(ccOf(edges) ==
      Map(2L -> 2L, 5L -> 2L, 7L -> 7L, 10L -> 10L, 11L -> 10L))
  }

  test("empty edge set yields empty assignment") {
    assert(ccOf(Nil).isEmpty)
  }

  test("string node ids cluster by lexicographic minimum") {
    val out = Components.connectedComponents(
        Seq(("b", "c"), ("c", "a"), ("x", "y")).toDF("s", "d"), "s", "d")
      .as[(String, String)].collect().toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("long chain (diameter 255) converges in O(log n) rounds, not O(diameter)") {
    // a hash-min propagation would need 255 rounds; the star alternation
    // must finish in ~log₂ — pin it well under the diameter
    val chain = (1L to 255L).map(i => (i, i + 1))
    val out = Components.connectedComponents(
        scala.util.Random.shuffle(chain).toDF("a", "b"), "a", "b", maxRounds = 16)
      .as[(Long, Long)].collect().toMap
    assert(out == (1L to 256L).map(_ -> 1L).toMap)
  }

  test("property: random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 20 + rnd.nextInt(60)
      val m = rnd.nextInt(3 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(ccOf(edges) == ufComponents(edges), s"trial $trial n=$n m=$m")
    }
  }

  test("loop conf window restores the session exactly: set keys keep their value, never-set keys stay never-set") {
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled", "spark.sql.codegen.wholeStage")
    val before = keys.map(spark.conf.getOption)
    ccOf(Seq((1L, 2L), (2L, 3L)))
    assert(keys.map(spark.conf.getOption) == before,
      s"confs mutated: before=$before after=${keys.map(spark.conf.getOption)}")
  }

  test("concurrent loops: both finish correctly and the baseline confs win at the end") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled", "spark.sql.codegen.wholeStage")
    val before = keys.map(spark.conf.getOption)
    val chainA = (1L to 40L).map(i => (i, i + 1))
    val chainB = (100L to 140L).map(i => (i, i + 1))
    val (a, b) = Await.result(
      Future(ccOf(chainA)).zip(Future(ccOf(chainB))), 10.minutes)
    assert(a == (1L to 41L).map(_ -> 1L).toMap)
    assert(b == (100L to 141L).map(_ -> 100L).toMap)
    assert(keys.map(spark.conf.getOption) == before)
  }

  test("dupClusters: transitive closure beats single-pass dup_of; singletons keep their id") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y")).toDF("doc_id", "text")
    // chain 3~2, 2~1 — no direct (1,3) pair, exactly where dup_of under-merges
    val pairs = Seq((2L, 3L), (1L, 2L)).toDF("id_a", "id_b")
    val out = Components.dupClusters(docs, "doc_id", pairs)
      .select(col("doc_id"), col("cluster_id")).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
    // canonical-survivor selection is a plain filter
    val kept = Components.dupClusters(docs, "doc_id", pairs)
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }
}
