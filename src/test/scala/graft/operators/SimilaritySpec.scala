package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("dot/normalize column math matches a scala computation") {
    val vecs = Seq((1L, Seq(3f, 4f)), (2L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val d = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(Similarity.dot(col("a.embedding"), col("b.embedding")).as("d"),
        Similarity.dot(Similarity.normalize(col("a.embedding")),
          Similarity.normalize(col("b.embedding"))).as("cos"))
      .head()
    assert(d.getDouble(0) === 3.0)
    assert(math.abs(d.getDouble(1) - 0.6) < 1e-12)
  }

  test("brute-force top-k is exact, deterministic, and rank-complete") {
    val queries = emb.filter(col("vec_id") < 10)
    val topk = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
    val byQuery = topk.as[(Long, Long, Long, Double)].collect().groupBy(_._1)
    assert(byQuery.keySet === (0L until 10L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      // descending cosine by rank
      val byRank = rows.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN reaches usable recall vs brute force and scores fewer pairs") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopKDim(emb, queries, "vec_id", "embedding",
      dim = 64, k = 5, nPlanes = 6, tables = 4, multiProbe = true)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ann).size.toDouble / brute.size.toDouble
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("IVF ANN reaches usable recall vs brute force; probing all cells IS brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size.toDouble
    assert(recall >= 0.4, s"IVF recall too low: $recall")
    // exhaustive probing covers every cell, so the result must BE the exact
    // brute-force answer — pins candidate generation as lossless per cell
    val full = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == brute)
    // the well-split production path (no repartition, no materialization)
    // returns the identical result
    val wide = Similarity.ivfTopK(emb.repartition(256), queries, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(wide == ivf)
  }

  test("cosine near-dup pairs are symmetric-free and above threshold") {
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, c) =>
      assert(a < b)
      assert(c >= 0.9)
    }
  }
}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Seq(
    (1L, "image", Array.tabulate[Byte](2048)(i => (i % 251).toByte)),
    (2L, "audio", Array.tabulate[Byte](4096)(i => ((i * 7) % 251).toByte)),
    (3L, "video", Array.tabulate[Byte](8192)(i => ((i * 13) % 251).toByte)),
    (4L, "image", Array.emptyByteArray)
  ).toDF("media_id", "media_type", "payload")

  test("batched feature extraction: schema, status, determinism") {
    val feats = Multimodal.extractFeatures(media, new Multimodal.MediaDecoder.Deterministic(8),
      batchSize = 2).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(feats.forall(_.features.length == 8))
    assert(feats(3).status === "empty")
    assert(feats(0).status === "ok")
    assert(feats(0).payload_bytes === 2048L)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, new Multimodal.MediaDecoder.Deterministic(8))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
  }

  test("frame sampling is bounded and offset-correct") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 256, everyNth = 4, maxFrames = 16)
    val byId = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    assert(byId(1L) === 2L)  // 2048 / (256*4) = 2
    assert(byId(3L) === 8L)  // 8192 / 1024 = 8
    assert(!byId.contains(4L)) // empty payload → no frames
    val f0 = frames.filter(col("media_id") === 1L && col("frame_idx") === 0)
      .select("frame_payload").head().getAs[Array[Byte]](0)
    assert(f0.length === 256)
    assert(f0(0) === 0.toByte) // first frame starts at payload[0]
  }
}
