package graft.tables.dsv2

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.tables.LakeTable

/** STREAMING SINK for lake tables through the standard `writeStream` API —
  * the write-side twin of [[LakeCdfSource]] (≙ Delta's `DeltaSink`: the
  * reference's SQLite keyed-upsert sink, sqlite.rs:218-233, re-expressed as
  * a Structured Streaming target). Every micro-batch executes as the SAME
  * exactly-LWW merge as the typed API and SQL `INSERT INTO` (stats pass,
  * auto-salt, SPJ/classic/MOR routing, snapshot commit), so
  *
  * {{{
  *   events.writeStream
  *     .format("lake")                      // or LakeSinkProvider.Name
  *     .option("root", tableRoot)
  *     .option("checkpointLocation", ckpt)
  *     .option("keys", "pubkey").option("orders", "writeVersion,slot")
  *     .start()
  * }}}
  *
  * is a drop-in for the `foreachBatch` + `table.merge` idiom
  * ([[graft.streaming.CdcPipeline]]) with identical semantics.
  *
  * '''Exactly-once.''' Batch ids from the engine's checkpoint are monotonic
  * per query; the sink records them as a `(txnApp, batchId)` writer
  * watermark in the table snapshot, so a batch re-delivered after
  * crash/restart is a commit-free no-op. `txnApp` defaults to the
  * checkpoint location (stable across restarts of the same query, distinct
  * across queries); pass `.option("txnApp", ...)` explicitly when the
  * checkpoint path may differ between the processes that share one logical
  * stream, or when it is configured only via
  * `spark.sql.streaming.checkpointLocation` (a session default is not
  * visible in the sink's options).
  *
  * '''Options''' (mirroring [[graft.streaming.CdcPipeline.start]]'s knobs):
  * `root`/`path` (required) — table directory, created on the first batch
  * if absent (then `keys` + `orders` are required; `buckets`, `tombstone`,
  * `sort` + `targetFileRows` (write-path clustering, see
  * [[graft.tables.TableSnapshot.sortOrder]]) optional); `mor` (default
  * false) — append merge-on-read layers instead
  * of rewriting touched buckets (write ∝ batch; pair with `compactEvery`,
  * default 16 batches); `salted` (default false) — force the two-phase
  * skewed dedup (the stats-pass auto-salt still applies when off);
  * `expireKeepVersions` (default 8, `0` disables) — retire snapshots past
  * the retention window after each batch (single-writer maintenance; the
  * merge itself OCC-rebases if another writer races).
  *
  * Output modes: Append and Update are both the keyed upsert (the table IS
  * an update-in-place view — "append" of a later version of a key resolves
  * by LWW exactly like the reference's INSERT OR REPLACE); Complete is
  * rejected (a keyed CDC table never truncates).
  */
final class LakeSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "lake"

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(outputMode != OutputMode.Complete(),
      "lake sink: Complete mode is not supported — a keyed LWW table upserts " +
        "(Append/Update), it never replaces its whole content per trigger")
    require(partitionColumns.isEmpty,
      "lake sink: partitionBy is not supported — the layout is the table's " +
        "hash-bucketed key partitioning, fixed at table creation")
    val opts = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val root = opts.get("root").orElse(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "lake sink: .option(\"root\", <table dir>) (or \"path\") is required"))
    new LakeStreamSink(sqlContext.sparkSession, root, opts)
  }
}

object LakeSinkProvider {
  /** Fully-qualified format name (works without the service registry). */
  val Name: String = classOf[LakeSinkProvider].getName
}

private[dsv2] final class LakeStreamSink(spark: SparkSession, root: String,
    opts: Map[String, String]) extends Sink {

  // toBoolean: case-insensitive AND loud on garbage — .contains("true")
  // would silently run copy-on-write for .option("mor", "True")
  private val mor = opts.get("mor").exists(_.toBoolean)
  private val salted = opts.get("salted").exists(_.toBoolean)
  private val compactEvery = opts.getOrElse("compactevery", "16").toInt
  private val expireKeep = opts.getOrElse("expirekeepversions", "8").toInt
  /** Watermark app id — see the provider scaladoc for the default's contract. */
  private val txnApp = opts.get("txnapp")
    .orElse(opts.get("checkpointlocation").map(c => s"lake-sink:$c"))
    .getOrElse(s"lake-sink:${java.util.UUID.randomUUID()}")

  private var tableOpt: Option[LakeTable] = None

  private def openOrCreate(schema: StructType): LakeTable = tableOpt.getOrElse {
    val t =
      if (Files.exists(Paths.get(root, "meta", "VERSION"))) LakeTable.open(spark, root)
      else {
        def cols(k: String): Seq[String] =
          opts.getOrElse(k, "").split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val keys = cols("keys")
        val orders = cols("orders")
        require(keys.nonEmpty && orders.nonEmpty,
          s"lake sink: no table at $root — creating one through the sink " +
            "requires .option(\"keys\", ...) and .option(\"orders\", ...)")
        (keys ++ orders).foreach(c => require(schema.fieldNames.contains(c),
          s"lake sink: declared key/order column '$c' is not in the stream schema " +
            schema.fieldNames.mkString("[", ", ", "]")))
        LakeTable.createOrOpen(spark, root, schema, keys, orders,
          numBuckets = opts.getOrElse("buckets", "16").toInt,
          tombstoneCol = opts.get("tombstone"),
          sortOrder = cols("sort"),
          // option keys were lowercased above — a mixed-case lookup here
          // would silently ignore the documented option
          targetFileRows = opts.getOrElse("targetfilerows", "0").toLong)
      }
    tableOpt = Some(t)
    t
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = synchronized {
    // Re-wrap the incrementalized physical output as a batch DataFrame (see
    // StreamBatchDF), copying rows out of the scan's reused buffers, and PIN
    // it: merge() scans its batch twice (stats pass + write) and a stateful
    // micro-batch plan must not execute twice. The pin is an RDD-level
    // localCheckpoint so WE hold the handle that owns the blocks:
    // Dataset.unpersist is a CacheManager call and a NO-OP for checkpoint
    // blocks, which would otherwise stay pinned in executor memory until
    // the driver GC'd the RDD — several batches deep on a high-rate stream.
    val rdd = data.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val batchRows = rdd.count() // eager: the one pass over the streaming scan happens NOW
    val pinned = org.apache.spark.sql.graftshim.StreamBatchDF(spark, rdd, data.schema)
    try {
      val table = openOrCreate(pinned.schema)
      table.merge(pinned, s"$txnApp-$batchId", salted = salted,
        txn = Some((txnApp, batchId)), mor = mor,
        // the eager pin already counted the batch — let the merge size its
        // write fan-out from the exact count (an RDD-backed plan otherwise
        // reports no usable size estimate)
        rowsHint = Some(batchRows))
      if (mor && compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
        table.compact()
      if (expireKeep > 0) table.expire(expireKeep)
    } finally {
      rdd.unpersist(blocking = false)
      ()
    }
  }

  override def toString: String = s"LakeSink[$root]"
}
