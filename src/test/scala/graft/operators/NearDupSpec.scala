package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NearDupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"), // near-dup of 1
    (3L, "spark catalyst optimizer rewrites logical plans into physical plans"),
    (4L, "completely different content about databases and storage engines"),
    (5L, "the quick brown fox jumps over the lazy dog again and again today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("minhash LSH finds near and exact duplicates, not unrelated docs") {
    val pairs = NearDup.minHashPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L))) // exact dup always survives
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 5L))) // near dup caught
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash candidates agree with brute-force Jaccard on threshold pairs") {
    // brute-force oracle over all pairs
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    def sh(t: String): Set[Seq[String]] =
      t.toLowerCase.split(" ").sliding(3).map(_.toSeq).toSet
    val brute = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      j = sh(ta).intersect(sh(tb)).size.toDouble / sh(ta).union(sh(tb)).size.toDouble
      if j >= 0.5
    } yield (ia, ib)).toSet
    val lsh = NearDup.minHashPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // LSH may miss (probabilistic) but with 8 bands × 4 rows and j≥0.8 here
    // recall is ~1; verified pairs can never be false positives:
    assert(lsh.subsetOf(brute.union(lsh))) // no crash path
    assert(brute.subsetOf(lsh), s"missed: ${brute.diff(lsh)}")
  }

  test("minHashDedup marks later duplicates with dup_of = smallest partner") {
    val out = NearDup.minHashDedup(docs, "doc_id", "text", threshold = 0.9)
      .select("doc_id", "dup_of").as[(Long, Option[Long])].collect().toMap
    assert(out(5L) === Some(1L))
    assert(out(1L) === None) // survivor
    assert(out(3L) === None)
  }

  test("simhash pairs: identical docs at distance 0; unrelated docs filtered") {
    val pairs = NearDup.simHashPairs(docs, "doc_id", "text", maxDist = 3)
      .as[(Long, Long, Long)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 5L)) === 0L)
    assert(!m.contains((3L, 4L)))
  }

  test("ngram jaccard verification over LSH candidates") {
    val pairs = NearDup.ngramJaccardPairs(docs, "doc_id", "text", n = 4, threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 5L)))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 5L).get
    assert(exact._3 === 1.0)
  }

  test("exact dedup on the real documents table is lossless at sf0.001") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val deduped = Dedup.exactDedup(d, md5(col("text")), keep = Seq("doc_id"))
    assert(deduped.count() === d.count()) // no exact dups in testdata
  }

  test("exact dedup keeps the minimum keep value as the canonical survivor") {
    val survivors = Dedup.exactDedup(docs, md5(col("text")), keep = Seq("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(survivors.contains(1L) && !survivors.contains(5L)) // 1 and 5 tie; min wins
    assert(survivors === Set(1L, 2L, 3L, 4L))
  }

  test("ngram jaccard prefix filter is lossless vs brute force") {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String): Set[String] =
      if (t.length >= 4) t.sliding(4).toSet else Set(t)
    val brute = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      ga = grams(ta); gb = grams(tb)
      inter = ga.intersect(gb).size
      j = inter.toDouble / (ga.size + gb.size - inter).toDouble
      if j >= 0.5
    } yield (ia, ib) -> j).toMap
    // both exact strategies must agree with brute force (and each other)
    Seq("prefix", "bitmap").foreach { strat =>
      val joined = NearDup.ngramJaccardPairs(docs, "doc_id", "text", n = 4,
        threshold = 0.5, forceStrategy = Some(strat))
        .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
      assert(joined.keySet === brute.keySet,
        s"$strat missed: ${brute.keySet.diff(joined.keySet)}")
      brute.foreach { case (k, j) => assert(math.abs(joined(k) - j) < 1e-12) }
    }
  }

  test("forceStrategy=bitmap fails fast past the dictionary bound instead " +
      "of collecting the whole vocabulary to the driver") {
    val e = intercept[IllegalArgumentException] {
      NearDup.ngramJaccardPairs(docs, "doc_id", "text", n = 4,
        threshold = 0.5, dictBits = 8, forceStrategy = Some("bitmap")).collect()
    }
    assert(e.getMessage.contains("forceStrategy=bitmap"), e.getMessage)
  }

  test("bitmap path survives tiny vocab × 100k docs: distributed block " +
      "nested loop, nothing collected to the driver") {
    // 5-char alphabet → ≤625 distinct 4-grams, so the bitmap strategy is
    // auto-selected; pseudo-random texts of ≥50 chars keep every unrelated
    // pair far below the threshold (expected overlap ~8 of ~70 grams, and
    // J ≥ 0.6 would need a ~16σ deviation); ten planted duplicate pairs are
    // the exact expected output. Before the block-distributed rewrite this
    // shape (large n, tiny vocabulary) collected every doc's bitmap to the
    // driver.
    val n = 100000L
    val plant = 10L
    val mk = udf { (i: Long) =>
      val seed = if (i >= n / 2 && i < n / 2 + plant) i - n / 2 else i
      val rr = new scala.util.Random(seed * 2654435761L)
      val len = 50 + (seed % 60).toInt
      val sb = new StringBuilder
      (0 until len).foreach(_ => sb.append(('a' + rr.nextInt(5)).toChar))
      sb.toString
    }
    val big = spark.range(0, n).select(col("id").as("doc_id"), mk(col("id")).as("text"))
    val got = NearDup.ngramJaccardPairs(big, "doc_id", "text", n = 4, threshold = 0.6)
      .as[(Long, Long, Double)].collect().toSet
    val expected = (0L until plant).map(i => (i, i + n / 2, 1.0)).toSet
    assert(got === expected)
  }

  test("stratifiedSample: exact quotas, deterministic across runs, caller's _rn column survives") {
    import org.apache.spark.sql.functions.col
    val docs = spark.range(200).selectExpr("id AS doc_id",
      "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'de' ELSE 'fr' END AS lang",
      "id * 7 AS _rn") // a caller column the temp rank must not clobber
    val s1 = TextOps.stratifiedSample(docs, Seq("lang"), "doc_id", k = 10)
    assert(s1.columns.toSeq == Seq("doc_id", "lang", "_rn"), s1.columns.toSeq)
    val rows1 = s1.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows1.groupBy(_._2).forall(_._2.size == 10))
    assert(rows1.forall { case (id, _, rn) => rn == id * 7 }) // payload intact
    // bit-reproducible: a repartitioned input yields the identical sample
    val rows2 = TextOps.stratifiedSample(docs.repartition(7), Seq("lang"), "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows1 == rows2)
    // quota larger than the stratum: every row kept
    assert(TextOps.stratifiedSample(docs.filter(col("lang") === "en"), Seq("lang"),
      "doc_id", 1000).count() === docs.filter(col("lang") === "en").count())
  }

  test("portable winnow fingerprints equal a direct per-doc computation") {
    // independent in-memory oracle: md5 gram hashes, min over each full
    // window, distinct values
    def oracle(text: String, k: Int = 10, window: Int = 10): Set[Long] = {
      val t = text.toLowerCase
      if (t.length < k) {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        return Set(java.lang.Long.parseLong(md.take(15), 16))
      }
      val hs = (0 to t.length - k).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(t.substring(i, i + k).getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md.take(15), 16)
      }
      if (hs.length <= window) Set(hs.min)
      else (0 to hs.length - window).map(w => hs.slice(w, w + window).min).toSet
    }
    val out = TextOps.winnowFingerprintRowsPortable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().groupBy(_._1).map { case (id, fps) => id -> fps.map(_._2).toSet }
    val texts = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    texts.foreach { case (id, text) =>
      assert(out(id) === oracle(text), s"doc $id fingerprints diverge")
    }
  }

  test("portable minhash dedup matches the xxhash-family dup_of structure") {
    // different hash families may differ on borderline candidates, but the
    // exact-dup pair (1,5) must be found by both and survivors must agree
    val portable = NearDup.minHashDedupPortable(docs, "doc_id", "text", threshold = 0.9)
      .select("doc_id", "dup_of").as[(Long, Option[Long])].collect().toMap
    assert(portable(5L) === Some(1L))
    assert(portable(1L) === None && portable(3L) === None)
  }

  test("adversarial boilerplate cluster stays bounded (hot-bucket caps)") {
    // 300 docs all sharing one boilerplate sentence + unique content: without
    // caps each hot band-bucket / stop fingerprint yields ~300²/2 candidates
    val boiler = "this license text is identical across every single document in the corpus"
    val adv = (1 to 300).map(i =>
      (i.toLong, s"$boiler unique content item number $i with extra words $i ${i * 7}"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    // capped candidate path: must complete quickly and not explode
    val nCands = NearDup.minHashCandidates(adv, "doc_id", "text", maxBucket = 32).count()
    val nWin = TextOps.winnowContainmentPairs(adv, "doc_id", "text", maxDf = 32).count()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(nCands <= 300L * 32)  // per-bucket fan-out bound
    assert(nWin <= 300L * 32)
    assert(sec < 60.0, s"boilerplate cluster took ${sec}s")
  }
}
