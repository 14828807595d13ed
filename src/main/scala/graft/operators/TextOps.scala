package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline surface
  * (builder mandate: language-ID, quality scoring, token counting,
  * fingerprinting over the `documents` table).
  *
  * Every builder is a pure `Column` expression over built-in functions —
  * fully codegen'd, no UDFs — and each has an exactly-equivalent ANSI SQL
  * formulation for the DuckDB oracle (only engine-agnostic primitives:
  * length/replace/lower; no regex, whose dialects differ).
  */
object TextOps {

  /** Occurrence weight of a literal pattern:
    * len(s) - len(replace(s, p, '')) — a multiple of len(p); kept as the raw
    * delta to stay in exact integer arithmetic (identical in DuckDB). */
  def literalOccurrenceWeight(s: Column, pattern: String): Column =
    length(s) - length(replace(s, lit(pattern)))

  /** Whitespace token count: single-space-delimited word count,
    * defined as count(' ') + 1 — exact and dialect-portable. */
  def tokenCount(text: Column): Column =
    (length(text) - length(replace(text, lit(" "))) + lit(1)).cast("long")

  /** BPE-ish pre-tokenizer count: maximal letter runs, maximal digit runs,
    * and every other non-space character as its own token — the class-run
    * segmentation BPE-family tokenizers apply before merges, so this counts
    * within a small constant factor of a real BPE's sequence length (the
    * standard budget estimator when the merge table itself is out of scope).
    * Unlike the rest of this file this IS a regex (`regexp_extract_all`,
    * codegen'd) — the pattern uses only ASCII classes and alternation,
    * which Java regex and RE2 (DuckDB) interpret identically, so it stays
    * oracle-able; q46 proves the equivalence cross-engine. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** The same BPE-ish count as DuckDB SQL (RE2 reads the identical
    * pattern; single-quoted SQL strings pass the backslash through). */
  def bpeishTokenCountSql(textExpr: String): String =
    s"""CAST(len(regexp_extract_all($textExpr, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)"""

  /** Punctuation-ratio quality score: (#'.' + #',' + #'!' + #'?') / n_chars,
    * one IEEE division (bit-exact across engines). */
  def punctRatio(text: Column): Column = {
    val punct = Seq(".", ",", "!", "?")
      .map(p => literalOccurrenceWeight(text, p))
      .reduce(_ + _)
    punct.cast("double") / greatest(length(text), lit(1)).cast("double")
  }

  /** Mean token length = n_chars / n_tokens, one IEEE division. */
  def meanTokenLength(text: Column): Column =
    length(text).cast("double") / tokenCount(text).cast("double")

  /** N-gram-heuristic language ID: score per language = summed occurrence
    * weights of that language's most frequent function words; argmax with a
    * fixed tie-break order (en > de > fr > es > und). */
  def langScores(text: Column): Map[String, Column] = {
    val lowered = lower(text)
    def score(pats: Seq[String]): Column =
      pats.map(p => literalOccurrenceWeight(lowered, p)).reduce(_ + _)
    Map(
      "en" -> score(Seq(" the ", " and ", " of ")),
      "de" -> score(Seq(" der ", " die ", " und ")),
      "fr" -> score(Seq(" le ", " la ", " et ")),
      "es" -> score(Seq(" el ", " los ", " que ")))
  }

  def langId(text: Column): Column = {
    val s = langScores(text)
    when(s("en") >= s("de") && s("en") >= s("fr") && s("en") >= s("es") && s("en") > 0, "en")
      .when(s("de") >= s("fr") && s("de") >= s("es") && s("de") > 0, "de")
      .when(s("fr") >= s("es") && s("fr") > 0, "fr")
      .when(s("es") > 0, "es")
      .otherwise("und")
  }

  /** The same langId as ANSI SQL for the DuckDB oracle. */
  def langIdSql(textCol: String): String = {
    def w(p: String) = s"(length(lower($textCol)) - length(replace(lower($textCol), '$p', '')))"
    def score(ps: Seq[String]) = ps.map(w).mkString("(", " + ", ")")
    val en = score(Seq(" the ", " and ", " of "))
    val de = score(Seq(" der ", " die ", " und "))
    val fr = score(Seq(" le ", " la ", " et "))
    val es = score(Seq(" el ", " los ", " que "))
    s"""CASE
       | WHEN $en >= $de AND $en >= $fr AND $en >= $es AND $en > 0 THEN 'en'
       | WHEN $de >= $fr AND $de >= $es AND $de > 0 THEN 'de'
       | WHEN $fr >= $es AND $fr > 0 THEN 'fr'
       | WHEN $es > 0 THEN 'es'
       | ELSE 'und' END""".stripMargin.replaceAll("\n", " ")
  }

  /** 64-bit whole-document fingerprint — xxhash64 built-in (codegen'd). */
  def fingerprint(text: Column): Column = xxhash64(text)

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's public
    * MOSS algorithm): rolling Rabin-Karp hashes of char k-grams, then the
    * rightmost-minimum hash of each sliding window — guarantees any match
    * of length ≥ window+k-1 shares a fingerprint. Pure deterministic
    * function + UDF column form; the candidate join on exploded
    * fingerprints is the scale path for plagiarism-style containment
    * detection (as opposed to MinHash's whole-doc resemblance).
    *
    * Defaults k=10/window=10: winnow density ≈ 2/(window+1) ≈ 18% of
    * positions, and 10-char grams are long enough that function-word
    * fragments (" the ", "tion ") are not fingerprints of their own — the
    * k=5/window=4 defaults of round 1 fingerprinted ~40% of positions and
    * made common 5-grams near-universal join keys (the q29 blowup). */
  def winnow(text: String, k: Int = 10, window: Int = 10): Array[Long] = {
    if (text == null || text.isEmpty) return Array(0L)
    val s = text.toLowerCase
    if (s.length < k) return Array(rabin(s, 0, s.length))
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    val base = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * base + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    if (n <= window) return Array(hashes.min)
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    var w = 0
    while (w + window <= n) {
      // rightmost minimum of the window
      var minIdx = w
      var j = w + 1
      while (j < w + window) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      out += hashes(minIdx)
      w += 1
    }
    out.toArray
  }

  private def rabin(s: String, from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = h * 1000003L + s.charAt(i); i += 1 }
    h
  }

  /** Column form of [[winnow]] (deterministic UDF → array<bigint>). */
  def winnowFingerprints(text: Column, k: Int = 10, window: Int = 10): Column = {
    val f = udf((t: String) => winnow(t, k, window))
    f(text)
  }

  /** Portable winnowing fingerprints as (id, fp) ROWS — pure built-ins with
    * an exact ANSI-SQL twin (q29's oracle). Key observation: the winnow
    * fingerprint SET is exactly the distinct window-minimum VALUES over all
    * full k-gram-hash windows (the classic rightmost-tie rule only decides
    * which POSITION is recorded, not which value) — so one window frame
    * `min(h) over (order by i rows between current and window-1 following)`
    * computes it. Gram hash = first 15 hex chars of md5 (engine-agnostic).
    * The imperative [[winnow]] UDF stays the production default (O(n),
    * single pass, no shuffle); this twin validates the algorithm.
    *
    * CONTRACT: `idCol` must be UNIQUE per document (it always was: the
    * position window partitions by id, so two texts sharing an id would
    * interleave their gram streams and corrupt each other's minima; the
    * branch-disjoint dedup/count below additionally relies on an id living
    * in exactly one length branch). The oracle holds the same assumption. */
  def winnowFingerprintRowsPortable(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      k: Int = 10, window: Int = 10): org.apache.spark.sql.DataFrame = {
    val (fpsLong, fpsShort) = winnowFpBranches(docs, idCol, textCol, k, window)
    fpsLong.unionByName(fpsShort)
  }

  /** The two ID-DISJOINT fingerprint branches behind the portable winnow
    * (a doc is in exactly one branch, decided by its length): long docs as
    * DISTINCT (id, fp) rows, short docs as their single whole-text fp (one
    * row per doc — distinct by construction). Keeping the branches apart
    * lets per-doc work (the distinct, the fingerprint count) ride the
    * winnow window's id-partitioned exchange with ZERO further exchanges —
    * a union first would erase the partitioning and re-shuffle the
    * fingerprint set once per downstream per-doc operation (guide §2.4:
    * share the exchange). Union-of-branch-distincts ≡ distinct-of-union
    * exactly because the branches share no doc id. */
  private def winnowFpBranches(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int, window: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.{Window => W}
    // small sources often arrive as one split; spread before the explode
    val par = math.max(1, docs.sparkSession.sparkContext.defaultParallelism)
    val d = docs.repartition(par).select(col(idCol), lower(col(textCol)).as("_t"),
      length(col(textCol)).as("_len"))
    val long = d.filter(col("_len") >= k)
      .withColumn("_n", col("_len") - (k - 1))
      .select(col(idCol), col("_t"), col("_n"),
        explode(expr("sequence(1, _n)")).as("_i"))
      .select(col(idCol), col("_n"), col("_i"), expr(
        s"cast(conv(substring(md5(substring(_t, _i, $k)), 1, 15), 16, 10) as bigint)").as("_h"))
    val wspec = W.partitionBy(col(idCol)).orderBy(col("_i"))
      .rowsBetween(W.currentRow, window - 1)
    val fpsLong = long
      .withColumn("_mn", min(col("_h")).over(wspec))
      // full windows only; docs with n ≤ window collapse to the single
      // global-min window at i = 1 (greatest(n-window+1, 1))
      .filter(col("_i") <= greatest(col("_n") - (window - 1), lit(1)))
      .select(col(idCol), col("_mn").as("fp"))
      // distinct KEYED (id, fp) but DISTRIBUTED by id alone — satisfied by
      // the window's existing hashpartitioning(id), so no exchange
      .distinct()
    val fpsShort = d.filter(col("_len") < k && col("_len").isNotNull)
      .select(col(idCol), expr(
        "cast(conv(substring(md5(_t), 1, 15), 16, 10) as bigint)").as("fp"))
    (fpsLong, fpsShort)
  }

  /** Containment scoring over (id, fp) rows — shared by the UDF and the
    * portable fingerprint paths. */
  def containmentPairsFromFps(fp: org.apache.spark.sql.DataFrame, idCol: String,
      minContainment: Double, maxDf: Int): org.apache.spark.sql.DataFrame = {
    // the per-doc fingerprint count is a WINDOW, not a groupBy branch +
    // join: an aggregate branch would re-execute the (expensive)
    // fingerprint subplan (callers with an id-partitioned or id-disjoint
    // input precompute n_fps and call [[containmentPairsCounted]] to skip
    // this exchange entirely)
    import org.apache.spark.sql.expressions.{Window => W}
    containmentPairsCounted(
      fp.withColumn("n_fps", count(lit(1)).over(W.partitionBy(col(idCol)))),
      idCol, minContainment, maxDf)
  }

  /** [[containmentPairsFromFps]] over rows that already carry `n_fps`. The
    * stop-fp document frequency stays a WINDOW count so the self-join on
    * fp reuses its exchange (ReusedExchange). */
  private def containmentPairsCounted(fp: org.apache.spark.sql.DataFrame,
      idCol: String, minContainment: Double, maxDf: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val inJoin = fp
      .withColumn("_df", count(lit(1)).over(W.partitionBy(col("fp"))))
      .filter(col("_df") >= 2 && col("_df") <= maxDf)
    inJoin.as("l").join(inJoin.as("r"),
        col("l.fp") === col("r.fp") && col(s"l.$idCol") < col(s"r.$idCol"))
      .groupBy(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared"),
        first(col("l.n_fps")).as("n_a"), first(col("r.n_fps")).as("n_b"))
      .withColumn("containment",
        col("shared").cast("double") / least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"), col("shared"), col("containment"))
  }

  /** Containment near-dup through the portable winnow (oracle-able). The
    * per-doc fingerprint count is computed PER BRANCH before the union:
    * the long-doc branch rides the winnow window's id-partitioning (no
    * exchange) and a short doc has exactly one fingerprint — so the only
    * exchanges the fingerprint set pays are the stop-fp window's (reused
    * by the self-join) and the pair aggregation's. */
  def winnowContainmentPairsPortable(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int = 10, window: Int = 10,
      minContainment: Double = 0.5, maxDf: Int = 64): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val (fpsLong, fpsShort) = winnowFpBranches(docs, idCol, textCol, k, window)
    val counted = fpsLong
      .withColumn("n_fps", count(lit(1)).over(W.partitionBy(col(idCol))))
      .unionByName(fpsShort.withColumn("n_fps", lit(1L)))
    containmentPairsCounted(counted, idCol, minContainment, maxDf)
  }

  /** Containment-style near-dup pairs over winnowing fingerprints (the MOSS
    * pipeline at corpus scale): containment = shared fingerprints / smaller
    * fingerprint set.
    *
    * Scale guards (both standard in MOSS-at-scale deployments):
    *  - STOP FINGERPRINTS: a fingerprint appearing in more than `maxDf` docs
    *    is boilerplate (license headers, templates) — each such fp produces
    *    df²/2 join rows, so they are dropped before the self-join via a
    *    window count over fp (one upstream execution; the self-join reuses
    *    the fp-partitioned exchange);
    *  - the self-join is an equi-join on fp with per-key fan-out ≤ maxDf —
    *    never quadratic in corpus size.
    */
  def winnowContainmentPairs(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      k: Int = 10, window: Int = 10,
      minContainment: Double = 0.5, maxDf: Int = 64): org.apache.spark.sql.DataFrame = {
    val base = docs
      .select(col(idCol), array_distinct(winnowFingerprints(col(textCol), k, window)).as("fps"))
      .withColumn("n_fps", size(col("fps")))
    val fp = base.select(col(idCol), col("n_fps"), explode(col("fps")).as("fp"))
    // stop-fp filter as a window count (one upstream execution; the
    // self-join reuses the fp-partitioned exchange — see
    // containmentPairsFromFps)
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val inJoin = fp.withColumn("_df", count(lit(1)).over(wFp))
      .filter(col("_df") >= 2 && col("_df") <= maxDf)
    inJoin.as("l").join(inJoin.as("r"),
        col("l.fp") === col("r.fp") && col(s"l.$idCol") < col(s"r.$idCol"))
      .groupBy(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared"),
        first(col("l.n_fps")).as("n_a"), first(col("r.n_fps")).as("n_b"))
      .withColumn("containment",
        col("shared").cast("double") / least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"), col("shared"), col("containment"))
  }

  /** DETERMINISTIC STRATIFIED SAMPLE (training-data op): exactly
    * min(k, |stratum|) rows per stratum, chosen by ranking on a
    * content-independent hash of `idCol` — uniform-at-random in expectation
    * yet bit-reproducible across runs, partitionings, and engines (md5 of
    * the id's decimal string; ties broken by the id itself, so duplicate
    * ids cannot make the cut nondeterministic). Training pipelines need
    * this shape constantly: per-language / per-source quotas for eval
    * holdouts, ablation subsets, and balanced mixtures.
    *
    * Scale shape: declaratively a window row_number ≤ k, which Spark 4
    * rewrites with WindowGroupLimit — each MAP task pre-truncates every
    * stratum to its top-k before the exchange, so the shuffle carries
    * O(k · strata · tasks) rows instead of the corpus, and the final
    * per-stratum sort sees only those survivors (asserted in PlanSpec).
    * A skewed stratum therefore costs its reduce task k rows, not the
    * stratum's size. */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, strata: Seq[String],
      idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"sample quota must be positive, got $k")
    // collision-proof temp column: withColumn would silently REPLACE (and
    // drop would then delete) a caller column of the same name
    val rn = Iterator.from(0).map(i => if (i == 0) "_rn" else s"_rn$i")
      .find(n => !df.columns.contains(n)).get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }
}
