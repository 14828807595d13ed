package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and TWO scale
  * paths — a random-hyperplane LSH-bucketed variant and an IVF-Flat
  * coarse-quantizer variant (the builder mandate says "IVF or LSH").
  *
  * Dot products are `zip_with` + `aggregate` array expressions in double
  * precision — codegen'd, no UDFs.
  */
object Similarity {

  /** `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)`. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Unit-normalize an array<float> into array<double> (zero vectors stay
    * zero instead of dividing by 0). NOTE: inlines the norm into the
    * per-element lambda — prefer [[normalizedSelect]] on hot paths. */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => when(n > 0.0, x.cast("double") / n).otherwise(0.0))
  }

  /** Unit-normalize projection `(idCol AS idOut, embCol normalized AS
    * embOut)` with the norm computed through its own projection column
    * rather than inlined into the transform lambda wholesale — measurably
    * cheaper on the similarity paths (higher-order lambdas are interpreted,
    * so every sub-expression inside them is per-element interpreted work).
    * Identical IEEE operations in the same order, so outputs are bit-equal
    * to [[normalize]]; the scratch column never escapes the projection.
    *
    * Deliberately NOT expanded into per-element `getItem` arithmetic: that
    * form collapses through downstream projections (array/extract
    * simplification re-inlines the norm tree into every element reference)
    * and measured 5-20x SLOWER on q26/q27/q47 — the lambda is an inlining
    * barrier worth keeping. */
  private def normalizedSelect(df: DataFrame, idCol: String, idOut: String,
      embCol: String, embOut: String): DataFrame =
    df.withColumn("_gl2n", l2Norm(col(embCol)))
      .select(col(idCol).as(idOut),
        transform(col(embCol), x =>
          when(col("_gl2n") > 0.0, x.cast("double") / col("_gl2n"))
            .otherwise(0.0)).as(embOut))

  /** Brute-force cosine top-k: every query row scored against every corpus
    * row. The query side is broadcast (queries ≪ corpus at scale), so the
    * corpus is scanned once with NO shuffle of the big side; per-query top-k
    * resolves in a window over the (small) query partition space.
    *
    * @return (query_id, neighbor_id, rank, cosine), rank 1..k,
    *         ties broken by neighbor id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int = 5): DataFrame = {
    val par = math.max(1, corpus.sparkSession.sparkContext.defaultParallelism)
    val c = normalizedSelect(corpus.repartition(par), idCol, "_cid", embCol, "_cemb")
    val q = normalizedSelect(queries, idCol, "_qid", embCol, "_qemb")
    val scored = c.join(broadcast(q), col("_qid") =!= col("_cid"))
      .select(col("_qid"), col("_cid"), dot(col("_qemb"), col("_cemb")).as("_cos"))
    val w = Window.partitionBy(col("_qid")).orderBy(col("_cos").desc, col("_cid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("_qid").as("query_id"), col("_cid").as("neighbor_id"),
        col("rank"), col("_cos").as("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded xorshift — no
    * wall-clock, reproducible across runs/executors). */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    var state = seed ^ 0x5deece66dL
    def next(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  /** Sign-bucket id: bit i = sign(v · plane_i) — an integer bucket key. */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = typedlit(p)
      when(dot(emb, planeCol) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN with L independent hash tables: a row lands in one
    * bucket per table (`tables × corpus` index rows); query and corpus join
    * only within (table, bucket) — the equi-join shuffle is O(L · corpus)
    * and each bucket holds ~corpus/2^p rows, so scored pairs drop by the
    * bucket factor at the price of recall (multiple tables + 1-bit
    * multi-probe recover it; measured against brute force in the spec —
    * the standard recall/cost dial at 100 TB).
    */
  def lshTopKDim(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      dim: Int, k: Int = 5, nPlanes: Int = 6, tables: Int = 4, seed: Long = 42L,
      multiProbe: Boolean = true, maxBucket: Int = 100000): DataFrame = {
    // small parquet corpora arrive as ONE split; the normalize+bucket
    // projection is the expensive part, so spread it first (cheap shuffle)
    val par = math.max(1, corpus.sparkSession.sparkContext.defaultParallelism)
    val c0 = normalizedSelect(corpus.repartition(par), idCol, "_cid", embCol, "_cemb")
    val q00 = normalizedSelect(queries, idCol, "_qid", embCol, "_qemb")
    val perTable = (0 until tables).map { t =>
      val planes = hyperplanes(nPlanes, dim, seed + 7919L * t)
      val c = c0.withColumn("_bucket", lshBucket(col("_cemb"), planes))
        .withColumn("_table", lit(t))
      val q0 = q00.withColumn("_bucket", lshBucket(col("_qemb"), planes))
        .withColumn("_table", lit(t))
      // multi-probe: a query also visits the nPlanes buckets one bit-flip away
      val q =
        if (!multiProbe) q0
        else q0.select(col("_qid"), col("_qemb"), col("_table"),
          explode(expr(s"array(_bucket, ${(0 until nPlanes)
            .map(i => s"_bucket ^ ${1L << i}").mkString(", ")})")).as("_bucket"))
      (c, q)
    }
    val cAll = perTable.map(_._1).reduce(_ unionByName _)
    val q = perTable.map(_._2).reduce(_ unionByName _)
    // hot-bucket cap: a bucket holding B corpus rows costs B work for EVERY
    // probe landing in it; web-scale corpora guarantee dense clusters (near-
    // identical embeddings share all sign bits). Buckets over the cap are
    // skipped as candidates — the other tables/probes keep recall. The cap
    // is a WINDOW count (not a groupBy branch + join): a separate aggregate
    // branch cannot share the corpus exchange and would re-run the whole
    // normalize+bucket pipeline a second time.
    val wCap = Window.partitionBy(col("_table"), col("_bucket"))
    val c = cAll.withColumn("_bsize", count(lit(1)).over(wCap))
      .filter(col("_bsize") <= maxBucket)
    val scored = c.join(q, Seq("_table", "_bucket"))
      .filter(col("_qid") =!= col("_cid"))
      .select(col("_qid"), col("_cid"), dot(col("_qemb"), col("_cemb")).as("_cos"))
      .groupBy(col("_qid"), col("_cid")).agg(max(col("_cos")).as("_cos")) // dedup table/probe hits
    val w = Window.partitionBy(col("_qid")).orderBy(col("_cos").desc, col("_cid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("_qid").as("query_id"), col("_cid").as("neighbor_id"),
        col("rank"), col("_cos").as("cosine"))
  }

  /** IVF-Flat ANN — the inverted-file coarse-quantizer scale path that
    * complements [[lshTopKDim]] (the builder mandate names "IVF or LSH";
    * the engine ships BOTH, with the same (query_id, neighbor_id, rank)
    * surface and the same exact-rescore contract).
    *
    * Quantizer: `nCells` corpus vectors chosen by a content-independent
    * hash ranking of the id (md5 of its decimal string — a uniform,
    * bit-reproducible sample; identical rule to [[TextOps.stratifiedSample]],
    * so the DuckDB oracle recomputes the SAME centroids). A k-means-trained
    * quantizer is a drop-in: only the centroid list changes, the
    * assignment/probe/rescore pipeline is identical — the sampled quantizer
    * is what keeps the operator deterministic and cross-engine oracle-able.
    *
    * Scale shape (100 TB):
    *  - centroids are COLLECTED (bounded: `nCells` rows — same class of
    *    driver transfer as the Jaccard dictionary probe) and re-enter every
    *    plan as array literals, i.e. broadcast by the plan itself;
    *  - cell assignment is a pure map over the corpus: a score array of
    *    `nCells` codegen'd dot products + `array_position(max)` — ZERO
    *    corpus shuffle, and at rest the assignment is exactly a LakeTable
    *    bucket layout (write corpus bucketed by `_cell` and probes prune
    *    buckets via runtime filtering instead of scanning);
    *  - each query probes its `nProbe` best cells; candidates come from a
    *    broadcast equi-join on the cell id — the corpus again does not
    *    shuffle; only candidates (≈ corpus · nProbe/nCells per query) reach
    *    the exact-rescore window.
    *
    * Ties everywhere break toward the smaller index/id, matching the SQL
    * twin's `ORDER BY score DESC, rank ASC` row_number exactly. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    require(nProbe <= nCells, s"nProbe=$nProbe exceeds nCells=$nCells")
    val par = math.max(1, corpus.sparkSession.sparkContext.defaultParallelism)
    // A corpus arriving in FEWER splits than cores (small parquet files)
    // needs a repartition spread — but Catalyst then collapses the
    // nCells-dot scoring projection into the scan stage BELOW the exchange,
    // running the entire (interpreted-HOF) quantizer in the few scan tasks
    // (measured 7× slower end-to-end on a one-split corpus). An eager
    // localCheckpoint pins scoring to the par-way stage and the centroid
    // scan reuses it. The materialization is GATED on that under-split
    // case: a production corpus already carrying ≥ par splits streams
    // through unmaterialized and fault-tolerant (and at rest would live
    // cell-bucketed in a lake table, assignment precomputed at ingest).
    val projected = (df: DataFrame) =>
      normalizedSelect(df, idCol, "_cid", embCol, "_cemb")
    val c0 =
      if (corpus.rdd.getNumPartitions < par)
        projected(corpus.repartition(par)).localCheckpoint()
      else projected(corpus)
    // deterministic hash-ranked centroid sample, in rank order (cell ids
    // are 1-based ranks — the oracle's row_number over the same ordering)
    val cents: Seq[Seq[Double]] = c0
      .withColumn("_h", md5(col("_cid").cast("string").cast("binary")))
      .orderBy(col("_h"), col("_cid"))
      .limit(nCells)
      .select(col("_cemb")).collect()
      .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    def scoresOf(emb: Column): Column =
      array(cents.map(c => dot(emb, typedlit(c))): _*)
    // first index of the max score = smallest winning cell id
    val cAssigned = c0
      .withColumn("_scores", scoresOf(col("_cemb")))
      .withColumn("_cell", expr("array_position(_scores, array_max(_scores))"))
      .drop("_scores")
    // per-query probe list: top nProbe cells by (score desc, cell asc) —
    // sort_array over (-score, cell) structs is ascending-lexicographic,
    // which is exactly that ordering (Spark normalizes -0.0 to 0.0 in sort
    // keys, so negation cannot reorder zero scores)
    val qProbes = normalizedSelect(queries, idCol, "_qid", embCol, "_qemb")
      .withColumn("_ranked", sort_array(array(cents.zipWithIndex.map { case (c, i) =>
        struct((-dot(col("_qemb"), typedlit(c))).as("neg"), lit(i + 1L).as("cell"))
      }: _*)))
      .select(col("_qid"), col("_qemb"),
        explode(slice(col("_ranked"), 1, nProbe)).as("_p"))
      .select(col("_qid"), col("_qemb"), col("_p.cell").as("_cell"))
    val scored = cAssigned.join(broadcast(qProbes), Seq("_cell"))
      .filter(col("_qid") =!= col("_cid"))
      .select(col("_qid"), col("_cid"), dot(col("_qemb"), col("_cemb")).as("_cos"))
    val w = Window.partitionBy(col("_qid")).orderBy(col("_cos").desc, col("_cid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("_qid").as("query_id"), col("_cid").as("neighbor_id"),
        col("rank"), col("_cos").as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH buckets as candidates
    * (hot-bucket capped — a bucket of B near-identical embeddings otherwise
    * yields B²/2 pairs), cosine ≥ threshold verification (id_a < id_b). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, embCol: String, dim: Int,
      threshold: Double = 0.95, nPlanes: Int = 8, seed: Long = 42L,
      maxBucket: Int = 4096): DataFrame = {
    val planes = hyperplanes(nPlanes, dim, seed)
    val par = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    val v = normalizedSelect(df.repartition(par), idCol, "_id", embCol, "_emb")
      .withColumn("_bucket", lshBucket(col("_emb"), planes))
    val cands = NearDup.cappedBucketPairs(
      v.select(col("_id"), col("_bucket")), "_id", Seq("_bucket"), maxBucket)
    val embs = v.select(col("_id"), col("_emb"))
    cands
      .join(embs.as("ea"), col("id_a") === col("ea._id"))
      .join(embs.as("eb"), col("id_b") === col("eb._id"))
      .select(col("id_a"), col("id_b"),
        dot(col("ea._emb"), col("eb._emb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
