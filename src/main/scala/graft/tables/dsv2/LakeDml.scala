package graft.tables.dsv2

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, RowOrdering, UnsafeProjection}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.tables.{LakeTable, TableSnapshot}

/** Row-level SQL DML — `UPDATE`, `MERGE INTO`, and arbitrary-predicate
  * `DELETE` — on lake tables, via Spark's DELTA-BASED row-level operation
  * API (`SupportsRowLevelOperations` + `SupportsDelta`, the Iceberg
  * `SparkPositionDeltaWrite` pattern re-keyed for an LWW table).
  *
  * Everything lands as ORDERED CDC EVENTS through the same exactly-LWW
  * [[graft.tables.LakeTable.merge]] as the typed API and the stream:
  *
  *  - the operation's scan serves RESOLVED WINNERS (merge-on-read layers
  *    folded, tombstoned keys hidden — [[LakeSqlScanBuilder]]), so matched
  *    rows are exactly the table's visible state;
  *  - `rowId = keyCols ++ orderCols`: the keys identify the logical row,
  *    and carrying the ORDER columns hands the writer each row's pre-image
  *    ordering tuple — which decides whether a rewritten row needs an
  *    ordering bump to win the LWW fold;
  *  - an UPDATE that leaves the ordering columns unchanged gets the
  *    [[LakeSqlTable.deleteWhere]] contract automatically: the new row is
  *    ordered immediately after its pre-image (last order column + 1,
  *    integral required, type-max fails loudly). An UPDATE that explicitly
  *    advances the ordering is taken at its word; one that REGRESSES it is
  *    rejected (the written row would lose the fold to the row it claims to
  *    update — silently doing nothing is worse than erroring);
  *  - MERGE's not-matched INSERTs are plain events: they carry the
  *    source's own ordering and LWW-resolve against stored state — so an
  *    insert ordered OLDER than a retained tombstone stays shadowed, the
  *    same out-of-order contract the CDC stream keeps;
  *  - deletes synthesize TOMBSTONES (pre-image ordering + 1) and need a
  *    tombstone column, like the metadata-delete path. Key-equality deletes
  *    still take that cheaper path: Spark's
  *    `OptimizeMetadataOnlyDeleteFromTable` swaps the row-level plan back
  *    to [[LakeSqlTable.deleteWhere]] whenever `canDeleteWhere` accepts.
  *
  * Scale shape: matched rows stream through per-task [[LakeDmlDeltaWriter]]s
  * that stage plain parquet under `<root>/staging/` (never collected to the
  * driver); the driver-side commit then runs ONE normal merge over the
  * staged batch — stats pass, auto-salting, SPJ/classic routing, snapshot
  * commit, OCC — so a 100 TB-table UPDATE costs a filtered scan plus a merge
  * of exactly the rewritten rows. Updating KEY columns is rejected (it would
  * be an insert of a new key plus a silent survival of the old one; use
  * DELETE + INSERT).
  */
final class LakeRowLevelOperation(root: String, snap: TableSnapshot,
    cmd: Command, sqlFacingSchema: StructType)
    extends RowLevelOperation with org.apache.spark.sql.connector.write.SupportsDelta {

  override def command(): Command = cmd
  override def description(): String = s"LakeDml($cmd, v=${snap.version})"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeSqlScanBuilder(root, snap, sqlFacingSchema)

  override def rowId(): Array[NamedReference] =
    (snap.keyCols ++ snap.orderCols).map(Expressions.column).toArray

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new LakeDmlWrite(root, snap, cmd)
    }
}

final class LakeDmlWrite(root: String, snap: TableSnapshot, cmd: Command)
    extends DeltaWrite {
  override def description(): String = s"LakeDmlWrite($cmd)"
  override def toBatch: DeltaBatchWrite = new LakeDmlBatchWrite(root, snap, cmd)
}

final case class LakeDmlCommitMessage(files: Seq[String]) extends WriterCommitMessage

final class LakeDmlBatchWrite(root: String, snap: TableSnapshot, cmd: Command)
    extends DeltaBatchWrite {

  /** staging lives OUTSIDE data/ so [[graft.tables.LakeTable.expire]]'s
    * commit-dir sweep never considers it; an `inflight-<dir>` marker (the
    * same TTL protocol the data dirs use) protects the live statement from
    * expire's staging sweep, and crashed statements' marker-less or stale
    * orphans are reclaimed by that sweep */
  // UUID, not nanoTime: two statements racing on the same host can share a
  // nanoTime reading — a colliding batch id would make the second merge a
  // silent exactly-once no-op, and a colliding staging dir would let one
  // statement's cleanup delete the other's staged files mid-write
  private val stagingName =
    s"dml-${cmd.toString.toLowerCase}-${java.util.UUID.randomUUID().toString.replace("-", "")}"
  private val stagingRel = s"staging/$stagingName"
  private val marker = Paths.get(root, "meta", s"inflight-$stagingName")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    // marker FIRST: the staging dir must never exist unprotected
    Files.createDirectories(marker.getParent)
    Files.write(marker, Array.emptyByteArray)
    Files.createDirectories(Paths.get(root, stagingRel))
    LakeDmlWriterFactory(s"$root/$stagingRel", snap.schemaDdl,
      snap.keyCols, snap.orderCols, snap.tombstoneCol)
  }

  /** keep the inflight marker fresh THROUGH an arbitrarily long executor
    * write phase: each task commit touches it, so a concurrent expire()'s
    * TTL sweep can only reclaim this statement's staging if the statement
    * has been truly dead for a full TTL — not merely writing for longer
    * than one (a >1h UPDATE at large scale would otherwise lose its
    * staging mid-statement). */
  override def onDataWriterCommit(message: WriterCommitMessage): Unit = touchMarker()

  private def touchMarker(): Unit =
    try Files.setLastModifiedTime(marker,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: java.io.IOException => () }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    try {
      // restart the marker's staleness clock once more: from here the TTL
      // only has to cover the driver-side merge of the staged batch
      touchMarker()
      val files = messages.collect { case LakeDmlCommitMessage(fs) => fs }.flatten
        .map(f => s"$root/$stagingRel/$f")
      if (files.nonEmpty) {
        val schema = StructType.fromDDL(snap.schemaDdl)
        val batch = spark.read.schema(schema).parquet(files.toSeq: _*)
        LakeTable.open(spark, root).merge(batch, // one statement, one unique id
          s"sql-${stagingName.stripPrefix("dml-")}")
      }
    } finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(
      Paths.get(root, stagingRel).toFile)
    Files.deleteIfExists(marker)
  }
}

final case class LakeDmlWriterFactory(stagingDir: String, schemaDdl: String,
    keyCols: Seq[String], orderCols: Seq[String], tombstoneCol: Option[String])
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new LakeDmlDeltaWriter(stagingDir, partitionId, taskId,
      StructType.fromDDL(schemaDdl), keyCols, orderCols, tombstoneCol)
}

/** Per-task delta writer: transforms Spark's update/delete/insert calls into
  * LWW-ordered event rows and stages them as ONE parquet file per task
  * (through Spark's own `ParquetWriteSupport`, so staged bytes use the same
  * encoding the table's read path expects). Row layouts (pinned by Spark's
  * delta-write planning): `row` = full table row in table-column order;
  * `id` = the pre-image's `rowId` projection, keys then order columns. */
final class LakeDmlDeltaWriter(stagingDir: String, partitionId: Int, taskId: Long,
    schema: StructType, keyCols: Seq[String], orderCols: Seq[String],
    tombstoneCol: Option[String]) extends DeltaWriter[InternalRow] {

  private val nKeys = keyCols.size
  private val keyIdx = keyCols.map(schema.fieldIndex)
  private val ordIdx = orderCols.map(schema.fieldIndex)
  private val lastOrdIdx = ordIdx.last
  private val tombIdx = tombstoneCol.map(schema.fieldIndex)
  private val ordTypes = ordIdx.map(i => schema(i).dataType)
  // layout is fixed at construction — decide once, not per bump-needing row
  private val bumpMovesKey = keyCols.contains(orderCols.last)

  private def bound(i: Int) = BoundReference(i, schema(i).dataType, nullable = true)
  // row-side projections bind into the full table row; id-side into the
  // (keys ++ orders) rowId layout
  private val rowKeyProj = UnsafeProjection.create(keyIdx.map(bound))
  private val rowOrdProj = UnsafeProjection.create(ordIdx.map(bound))
  private val idKeyProj = UnsafeProjection.create(
    keyCols.indices.map(j => BoundReference(j, schema(keyIdx(j)).dataType, nullable = true)))
  private val idOrdProj = UnsafeProjection.create(
    orderCols.indices.map(j =>
      BoundReference(nKeys + j, schema(ordIdx(j)).dataType, nullable = true)))
  private val ordCompare = RowOrdering.createNaturalAscendingOrdering(ordTypes)

  private val fileName = f"part-$partitionId%05d-$taskId.parquet"
  private var writer: ParquetWriter[InternalRow] = _
  private var rows = 0L

  private def out(): ParquetWriter[InternalRow] = {
    if (writer == null) {
      import org.apache.spark.sql.internal.SQLConf
      val conf = new Configuration()
      ParquetWriteSupport.setSchema(schema, conf)
      // the conf entries ParquetWriteSupport.init / the schema converter
      // read; a DataFrame write gets these from the session, a raw writer
      // must pin them (values = the engine's shipped write configuration:
      // annotated int64 micros, no legacy layout, proleptic-Gregorian
      // timestamps)
      Seq(
        SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key -> "false",
        SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key -> "TIMESTAMP_MICROS",
        SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key -> "CORRECTED",
        SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key -> "CORRECTED",
        SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key ->
          SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.defaultValueString,
        SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key ->
          SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.defaultValueString,
        SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key ->
          SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.defaultValueString
      ).foreach { case (k, v) => conf.set(k, v) }
      writer = new LakeDmlDeltaWriter.Builder(new HPath(s"$stagingDir/$fileName"))
        .withConf(conf)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    }
    writer
  }

  /** ordering bump: the event slot immediately after the pre-image. Guarded
    * against a degenerate layout where the LAST ORDER column is also a KEY
    * column (createOrOpen allows the overlap; plain merges are fine with
    * it) — there the bump would rewrite the KEY, staging the event under a
    * DIFFERENT logical row, so every bump-needing path fails loudly
    * instead. */
  private def bumped(v: Any): Any = {
    if (bumpMovesKey)
      throw new UnsupportedOperationException(
        s"cannot auto-slot past the pre-image: last order column " +
          s"'${orderCols.last}' is also a key column, so bumping it would " +
          "move the event to a different key — advance a non-key ordering " +
          "explicitly or write through the typed API")
    OrderBump.bump(v, ordTypes.last, orderCols.last, "a rewritten row")
  }

  private def toMutable(row: InternalRow): GenericInternalRow = {
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      vals(i) = if (row.isNullAt(i)) null else row.get(i, schema(i).dataType)
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def insert(row: InternalRow): Unit = { out().write(row); rows += 1 }

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    if (rowKeyProj(row) != idKeyProj(id))
      throw new UnsupportedOperationException(
        s"updating key columns (${keyCols.mkString(", ")}) is not supported on a " +
          "keyed LWW table — the old key's row would silently survive; " +
          "DELETE the old key and INSERT the new one")
    val cmp = ordCompare.compare(rowOrdProj(row), idOrdProj(id))
    if (cmp < 0)
      throw new UnsupportedOperationException(
        s"UPDATE assigns an ordering (${orderCols.mkString(", ")}) OLDER than the " +
          "row it updates — the written event would lose the LWW fold to its own " +
          "pre-image; advance the ordering columns or leave them unchanged")
    val event =
      if (cmp > 0) row // caller advanced the ordering: taken at its word
      else { // unchanged ordering: slot the rewrite immediately after the pre-image
        val m = toMutable(row)
        m.update(lastOrdIdx,
          bumped(if (m.isNullAt(lastOrdIdx)) null
                 else m.get(lastOrdIdx, schema(lastOrdIdx).dataType)))
        m
      }
    out().write(event); rows += 1
  }

  /** a tombstone row carries NULL in every payload column, so the stored
    * schema must allow that — checked once, before the first tombstone is
    * staged, with a statement-level error instead of a parquet write
    * failure mid-job */
  private lazy val deletablePayload: Unit = {
    val idOrTomb = (keyCols ++ orderCols ++ tombstoneCol).toSet
    val blockers = schema.fields.filter(f => !idOrTomb.contains(f.name) && !f.nullable)
    if (blockers.nonEmpty) throw new UnsupportedOperationException(
      s"row-level DELETE writes tombstones with NULL payload, but column(s) " +
        s"${blockers.map(_.name).mkString(", ")} are NOT NULL in the table " +
        "schema — tombstone-carrying tables need nullable payload columns")
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val ti = tombIdx.getOrElse(throw new UnsupportedOperationException(
      "row-level DELETE needs a tombstone column " +
        "(TBLPROPERTIES('tombstone'='col') / createOrOpen(tombstoneCol)) — " +
        "without one a delete has no event to carry through the LWW fold. " +
        "A plain DELETE is rejected at analysis; a MERGE INTO delete clause " +
        "surfaces here at execution"))
    deletablePayload
    val vals = new Array[Any](schema.length)
    keyIdx.zipWithIndex.foreach { case (si, j) =>
      vals(si) = if (id.isNullAt(j)) null else id.get(j, schema(si).dataType)
    }
    ordIdx.zipWithIndex.foreach { case (si, j) =>
      vals(si) = if (id.isNullAt(nKeys + j)) null else id.get(nKeys + j, schema(si).dataType)
    }
    vals(lastOrdIdx) = bumped(vals(lastOrdIdx))
    vals(ti) = java.lang.Boolean.TRUE
    out().write(new GenericInternalRow(vals)); rows += 1
  }

  private var committed = false

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(); writer = null }
    committed = true
    LakeDmlCommitMessage(if (rows > 0) Seq(fileName) else Nil)
  }

  override def abort(): Unit = close()

  /** close after commit leaves the staged file for the driver-side merge;
    * close without commit (task failure/abort) reclaims it */
  override def close(): Unit = {
    if (writer != null) { writer.close(); writer = null }
    if (!committed) Files.deleteIfExists(Paths.get(stagingDir, fileName))
  }
}

object LakeDmlDeltaWriter {
  private final class Builder(path: HPath)
      extends ParquetWriter.Builder[InternalRow, Builder](path) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }
}

/** The LWW "slot immediately after the pre-image" rule, shared by every
  * delete/rewrite surface (row-level DML here, the metadata-delete path in
  * [[LakeSqlTable.deleteWhere]]): integral last order column, +1, loud
  * failure at the type's maximum rather than a silent wrap. Accepts boxed
  * values (both call sites hold them boxed) and dispatches on the DECLARED
  * DataType, not the runtime box: a DateType ordering is ALSO a
  * java.lang.Integer internally, and bumping it would fabricate a date one
  * whole day in the future instead of refusing. */
private[dsv2] object OrderBump {
  def bump(v: Any, dt: org.apache.spark.sql.types.DataType,
      col: String, what: String): Any = {
    def nonIntegral(held: String): Nothing = throw new UnsupportedOperationException(
      s"ordering $what needs an integral last order column to take the slot " +
        s"after its pre-image; '$col' holds " + held)
    if (v == null) nonIntegral("NULL")
    dt match {
      case LongType =>
        val l = v.asInstanceOf[java.lang.Long]
        guard(l != Long.MaxValue, col, what)
        java.lang.Long.valueOf(l + 1)
      case IntegerType =>
        val i = v.asInstanceOf[java.lang.Integer]
        guard(i != Int.MaxValue, col, what)
        java.lang.Integer.valueOf(i + 1)
      case ShortType =>
        val s = v.asInstanceOf[java.lang.Short]
        guard(s != Short.MaxValue, col, what)
        java.lang.Short.valueOf((s + 1).toShort)
      case ByteType =>
        val b = v.asInstanceOf[java.lang.Byte]
        guard(b != Byte.MaxValue, col, what)
        java.lang.Byte.valueOf((b + 1).toByte)
      case other => nonIntegral(other.sql)
    }
  }

  private def guard(ok: Boolean, col: String, what: String): Unit =
    if (!ok) throw new UnsupportedOperationException(
      s"cannot order $what past its pre-image: last order column '$col' is " +
        "at its type's maximum")
}
