package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection suite for training-data pipelines (builder
  * mandate: exact, MinHash+LSH, SimHash, n-gram Jaccard — each over the
  * `documents` table).
  *
  * Scale design notes:
  *  - MinHash/SimHash signatures are pure array-expression columns (no UDFs
  *    on the MinHash path) — whole-stage-codegen'd, linear scans;
  *  - candidate generation is band-bucket equi-join (shuffle on band hash,
  *    never an all-pairs cross join): O(candidates), not O(n²);
  *  - exact Jaccard verification runs ONLY on LSH candidates;
  *  - survivor selection is a groupBy-min, not connected components — each
  *    duplicate doc points at its smallest verified partner (`dup_of`),
  *    which is the standard single-pass web-dedup approximation.
  */
object NearDup {

  /** Word w-shingles as 64-bit hashes (codegen'd; `xxhash64` of the joined
    * shingle text). Empty/short docs yield a single sentinel shingle.
    * Takes the column NAME (the shingling runs as a SQL expression). */
  def shingles(textCol: String, w: Int = 3): Column = {
    val toks = s"split(lower($textCol), ' ')"
    when(expr(s"size($toks)") >= w,
      array_distinct(expr(
        s"transform(sequence(1, size($toks) - ${w - 1}), " +
          s"i -> xxhash64(concat_ws(' ', slice($toks, i, $w))))")))
      .otherwise(array(xxhash64(lower(col(textCol)))))
  }

  /** MinHash signature of k permutations: h_i(s) = xxhash64(s, i); the
    * signature element i is min over shingles — all array expressions. */
  def minHashSignature(shinglesCol: Column, k: Int = 32): Column =
    expr(s"transform(sequence(1, $k), i -> array_min(transform(_shingles, s -> xxhash64(s, i))))")

  /** (doc_id, band_idx, band_hash) candidate keys: signature split into
    * `bands` bands of `k/bands` rows, each band hashed. */
  private def bandHashes(sig: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    expr(s"transform(sequence(0, ${bands - 1}), j -> xxhash64(slice(_sig, j * $r + 1, $r)))")
  }

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold
    */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 3, k: Int = 32, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val base = docs
      .withColumn("_shingles", shingles(textCol, w))
      .withColumn("_sig", minHashSignature(col("_shingles"), k))
      .select(col(idCol).as("_id"), col("_shingles"), col("_sig"))
    val bandsDf = base
      .select(col("_id"), posexplode(bandHashes(col("_sig"), k, bands)).as(Seq("_band", "_bhash")))
    // candidate pairs: same (band, bandhash) bucket — equi-join shuffle
    val cands = bandsDf.as("l").join(bandsDf.as("r"),
        col("l._band") === col("r._band") && col("l._bhash") === col("r._bhash") &&
          col("l._id") < col("r._id"))
      .select(col("l._id").as("id_a"), col("r._id").as("id_b"))
      .distinct()
    // exact verification only on candidates
    val sh = base.select(col("_id"), col("_shingles"))
    cands
      .join(sh.as("sa"), col("id_a") === col("sa._id"))
      .join(sh.as("sb"), col("id_b") === col("sb._id"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sa._shingles"), col("sb._shingles"))).cast("double") /
          size(array_union(col("sa._shingles"), col("sb._shingles"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Deduplicate: annotate each doc with `dup_of` = smallest verified
    * near-dup partner id (null ⇒ survivor). */
  def minHashDedup(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 3, k: Int = 32, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val pairs = minHashPairs(docs, idCol, textCol, w, k, bands, threshold)
    val dupOf = pairs.groupBy(col("id_b").as(idCol))
      .agg(min(col("id_a")).as("dup_of"))
    docs.join(dupOf, Seq(idCol), "left")
  }

  // ---------------- SimHash ----------------

  /** 64-bit SimHash over whitespace tokens (deterministic UDF — the
    * per-bit vote accumulation has no array-function form). */
  private val simHashUdf = udf((tokens: Seq[String]) => {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h1 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong & 0xffffffffL
      val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x5bd1e995).toLong & 0xffffffffL
      val h = (h1 << 32) | h2
      var b = 0
      while (b < 64) { votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  })

  def simHash(text: Column): Column = simHashUdf(split(lower(text), " "))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, candidates via
    * the pigeonhole principle: 4 16-bit chunks — any pair within distance 3
    * shares at least one chunk; the chunk equi-join is the only shuffle. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk pigeonhole supports maxDist <= 3")
    val base = docs.select(col(idCol).as("_id"), simHash(col(textCol)).as("_sim"))
    val chunks = base.select(col("_id"), col("_sim"),
      posexplode(expr("transform(sequence(0, 3), c -> (_sim >> (c * 16)) & 65535)"))
        .as(Seq("_chunk", "_cval")))
    chunks.as("l").join(chunks.as("r"),
        col("l._chunk") === col("r._chunk") && col("l._cval") === col("r._cval") &&
          col("l._id") < col("r._id"))
      .select(col("l._id").as("id_a"), col("r._id").as("id_b"),
        expr("bit_count(l._sim ^ r._sim)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ---------------- n-gram Jaccard ----------------

  /** Character n-gram set hashes (array expression, codegen'd; takes the
    * column NAME). */
  def charNgrams(textCol: String, n: Int = 4): Column =
    when(length(col(textCol)) >= n,
      array_distinct(expr(
        s"transform(sequence(1, length($textCol) - ${n - 1}), i -> xxhash64(substring($textCol, i, $n)))")))
      .otherwise(array(xxhash64(col(textCol))))

  /** Exact n-gram Jaccard over candidate pairs from MinHash banding (the
    * scale path: LSH candidates, n-gram verification). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.5,
      w: Int = 3, k: Int = 32, bands: Int = 8): DataFrame = {
    val cands = minHashPairs(docs, idCol, textCol, w, k, bands, threshold = 0.0)
      .select("id_a", "id_b")
    val grams = docs.select(col(idCol).as("_id"), charNgrams(textCol, n).as("_grams"))
    cands
      .join(grams.as("ga"), col("id_a") === col("ga._id"))
      .join(grams.as("gb"), col("id_b") === col("gb._id"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("ga._grams"), col("gb._grams"))).cast("double") /
          size(array_union(col("ga._grams"), col("gb._grams"))).cast("double")).as("ngram_jaccard"))
      .filter(col("ngram_jaccard") >= threshold)
  }
}
