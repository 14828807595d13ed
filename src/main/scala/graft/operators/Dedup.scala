package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Last-writer-wins dedup (operator A1, SURVEY.md §2.4).
  *
  * The reference's `INSERT OR REPLACE ... PRIMARY KEY(pubkey)` keeps the
  * arrival-order-last row per key (/root/reference/src/bin/
  * solana-snapshot-etl/sqlite.rs:218-233). We make it deterministic:
  * max-(ordering) row per key, where the ordering is a total order
  * (writeVersion, slot, ...unique tiebreak) — equal to the reference
  * whenever write_versions are consistent with arrival order, which holds
  * for real snapshots (append_vec.rs:48-56 global monotone counter).
  */
object Dedup {

  /** One-shuffle LWW: `groupBy(keys).agg(max_by(row, ordering))`.
    *
    * Scale notes: two-phase aggregation with map-side partials — rows
    * collapse to one-per-key in the partial stage BEFORE the shuffle, which
    * is what beats the window/row_number formulation at 100 TB (window
    * shuffles every row, then sorts). With a struct payload Spark plans
    * SortAggregate (struct agg buffers aren't hash-aggregable); the partial/
    * final pair around a single exchange is asserted in PlanSpec.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], ordering: Seq[String]): DataFrame = {
    val cols = df.columns.toSeq
    val payload = struct(cols.map(col): _*)
    val ord = struct(ordering.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("_latest"))
      // key columns project STRAIGHT from the grouping output (identical
      // within a group), not via struct-field extraction: a direct attribute
      // keeps the child's output partitioning alive through the aggregation,
      // so downstream joins/aggs clustered on the same keys add no exchange
      .select(cols.map(c =>
        if (keys.contains(c)) col(c) else col("_latest." + c).as(c)): _*)
  }

  /** [[latestByKey]] that additionally carries `max(flagCol)` per group —
    * the winner row plus "did any row in this group have the flag set".
    * Used by the lake merge to count distinct batch keys (upserts) ON the
    * merge aggregation itself instead of in a separate count_distinct
    * stats pass (whose Expand doubles rows through the partial agg). Same
    * single aggregation, same exchange structure, one extra long per group.
    */
  def latestByKeyCarryMax(df: DataFrame, keys: Seq[String], ordering: Seq[String],
      flagCol: String): DataFrame = {
    val cols = df.columns.toSeq.filterNot(_ == flagCol)
    val payload = struct(cols.map(col): _*)
    val ord = struct(ordering.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("_latest"), max(col(flagCol)).as(flagCol))
      .select(cols.map(c =>
        if (keys.contains(c)) col(c) else col("_latest." + c).as(c)) :+ col(flagCol): _*)
  }

  /** Two-phase salted LWW for skewed keys (north-rule requirement:
    * hot-owner skew, SURVEY.md §7.5). Phase 1 pre-aggregates on
    * (keys, salt) — the hot key's rows split across `numSalts` reducers —
    * phase 2 resolves the `numSalts` survivors per key. The salt is a
    * deterministic hash of the full row, so results are stable across runs
    * and partitionings.
    */
  def saltedLatestByKey(
      df: DataFrame,
      keys: Seq[String],
      ordering: Seq[String],
      numSalts: Int = 16): DataFrame =
    latestByKey(saltedPreAggregate(df, keys, ordering, numSalts), keys, ordering)

  /** Phase 1 of the salted dedup alone: collapse to ≤ `numSalts` candidate
    * rows per key, shuffling on (keys, salt) — the hot key's rows spread
    * across `numSalts` reducers instead of one. Use when the FINAL per-key
    * resolution must ride a different partitioning (e.g. LakeTable's bucket
    * repartition): run this first, then the cheap final dedup downstream. */
  def saltedPreAggregate(
      df: DataFrame,
      keys: Seq[String],
      ordering: Seq[String],
      numSalts: Int = 16): DataFrame = {
    val cols = df.columns.toSeq
    val salted = df.withColumn("_salt",
      pmod(xxhash64(cols.map(col): _*), lit(numSalts)))
    latestByKey(salted, keys :+ "_salt", ordering).drop("_salt")
  }

  /** [[saltedPreAggregate]] carrying `max(flagCol)` through the salt phase
    * (the salt hashes the NON-flag columns, so salting is bit-identical to
    * the unflagged variant). */
  def saltedPreAggregateCarryMax(df: DataFrame, keys: Seq[String], ordering: Seq[String],
      flagCol: String, numSalts: Int = 16): DataFrame = {
    val cols = df.columns.toSeq.filterNot(_ == flagCol)
    val salted = df.withColumn("_salt",
      pmod(xxhash64(cols.map(col): _*), lit(numSalts)))
    latestByKeyCarryMax(salted, keys :+ "_salt", ordering, flagCol).drop("_salt")
  }

  /** Exact-duplicate removal over an arbitrary fingerprint expression
    * (training-data op: exact dedup by content hash). Keeps the MINIMUM
    * `keep` value per fingerprint group — deterministic canonical survivor
    * (min_by, the mirror of [[latestByKey]]'s max_by).
    */
  def exactDedup(df: DataFrame, fingerprint: Column, keep: Seq[String]): DataFrame = {
    val cols = df.columns.toSeq
    val withFp = df.withColumn("_fp", fingerprint)
    withFp.groupBy(col("_fp"))
      .agg(min_by(struct(cols.map(col): _*), struct(keep.map(col): _*)).as("_first"))
      .select(cols.map(c => col("_first." + c).as(c)): _*)
  }
}
