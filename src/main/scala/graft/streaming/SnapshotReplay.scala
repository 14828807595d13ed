package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.etl.model.AccountUpdate
import graft.sources.{ArchiveSnapshotSource, SnapshotSource}
import graft.tables.LakeTable

/** Full + incremental snapshot replay (north rule: "snapshot archives +
  * incrementals tailed as a change stream"): each snapshot is one upsert
  * batch — batch id = snapshot identity — merged in slot order under the
  * table's exactly-once ledger (§2.9: replaying full-then-incrementals =
  * successive MERGE batches).
  *
  * Resumable by construction: re-running `replayDir` after a crash skips
  * already-applied snapshots — each snapshot advances the table's
  * ("snapshot-replay" → slot) txn watermark, so any slot at or below it is
  * a no-op. The watermark IS the offset log (O(1) metadata regardless of
  * stream length), with per-batch lineage rows for the recent window.
  */
object SnapshotReplay {

  val accountSchema: StructType = StructType.fromDDL(
    "pubkey BINARY, slot BIGINT, writeVersion BIGINT, dataLen BIGINT, " +
      "owner BINARY, lamports BIGINT, executable BOOLEAN, rentEpoch BIGINT, " +
      "hash BINARY, data BINARY")

  val KeyCols: Seq[String] = Seq("pubkey")
  val OrderCols: Seq[String] = Seq("writeVersion", "slot")

  def createTable(spark: SparkSession, root: String, numBuckets: Int = 16): LakeTable =
    LakeTable.createOrOpen(spark, root, accountSchema, KeyCols, OrderCols, numBuckets)

  def toDF(ds: Dataset[AccountUpdate]): DataFrame = {
    import org.apache.spark.sql.functions.col
    ds.toDF().select(
      col("pubkey"), col("slot"), col("writeVersion"), col("dataLen"),
      col("owner"), col("lamports"), col("executable"), col("rentEpoch"),
      col("hash"), col("data"))
  }

  /** Merge one snapshot (archive file or unpacked dir) as one batch.
    * @return rows upserted (0 if this snapshot was already applied). */
  def applySnapshot(spark: SparkSession, table: LakeTable, path: String,
      salted: Boolean = false): Long = {
    val src = SnapshotSource.open(spark, path)
    val batchId = s"snapshot:${new Path(path).getName}"
    table.merge(toDF(src.accountUpdates(spark)), batchId, salted = salted,
      txn = Some(("snapshot-replay", src.manifest.slot)))
  }

  /** Replay every `.tar.zst` archive in `dir`, ordered by manifest slot
    * (full snapshot first, then incrementals). Already-applied archives are
    * skipped via the exactly-once ledger. @return total rows upserted. */
  def replayDir(spark: SparkSession, table: LakeTable, dir: String,
      salted: Boolean = false): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val archives = fs.listStatus(p).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".tar.zst"))
      .map(_.getPath.toString).toSeq
    val ordered = archives
      .map(a => (ArchiveSnapshotSource.readManifest(a,
        spark.sparkContext.hadoopConfiguration).slot, a))
      .sortBy(_._1).map(_._2)
    ordered.map(applySnapshot(spark, table, _, salted)).sum
  }
}
