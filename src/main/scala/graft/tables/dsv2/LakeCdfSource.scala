package graft.tables.dsv2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Optional => JOptional}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReportsSourceMetrics, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.tables.{LakeTable, TableSnapshot}

/** STREAMING CHANGELOG SOURCE (CDC egress ≙ Delta CDF / Iceberg incremental
  * read, expressed as a Spark `MicroBatchStream`): tail a
  * [[graft.tables.LakeTable]] as an unbounded stream of changed rows —
  * `spark.readStream.format(LakeCdfSource.Name).option("root", …).load()`.
  *
  * Offsets are TABLE VERSIONS: micro-batch `(v1, v2]` emits exactly
  * `readChanges(v1, v2)` — every row whose LWW `(keys…, orderCols…)` tuple
  * is a winner at v2 but was not present at v1 (deletes surface as
  * tombstone-flagged rows; same contract as the batch changelog,
  * `LakeTable.scala` readChanges). Structured Streaming checkpoints the
  * version offsets, so a killed-and-restarted query resumes from its last
  * committed version with no duplicates and no gaps — the downstream half of
  * the exactly-once story (the ingest half is the merge's `(app, seq)`
  * ledger).
  *
  * Scale shape (one task per CHANGED bucket, zero shuffles, no driver data):
  *  1. metadata-only bucket pruning — buckets whose file lists are identical
  *     at both versions are never read;
  *  2. the OLD side of each changed bucket is read COLUMN-PRUNED to
  *     `keys… ++ orderCols…` (parquet never materializes payload bytes) into
  *     a per-task hash set. No LWW resolve is needed there: winners are
  *     monotone under the LWW fold, so a new-side winner's tuple can only
  *     ever equal the old side's WINNER for that key, never a shadowed
  *     layer row — plain membership over all old tuples is exact;
  *  3. the NEW side streams through Spark's own parquet reader and emits
  *     rows whose tuple is absent from the old set. Merge-on-read buckets
  *     are LWW-folded in the task first (bounded by one bucket, the same
  *     working set a compaction task holds).
  *
  * Versions crossing a REBUCKET are handled without a layout-crossing join:
  * the rebucket commit changes no logical rows, so admission control clamps
  * each micro-batch at the layout boundary and the boundary window diffs
  * `(v1, R-1]` under the old layout (the rebucket version R itself
  * contributes nothing).
  *
  * Options: `root` (table root); `startingVersion` = `latest` (default —
  * only changes after the stream starts) | `earliest` (full history: when
  * v0 — the empty create commit — is still retained, the complete
  * changelog; once expire() has removed it, the first batch emits the
  * oldest retained version's full state as inserts (initial snapshot
  * load) and the stream tails from there) | a version number; `startingTag` (named-ref anchor, the dual of
  * `VERSION AS OF '<tag>'`: tail everything after the tagged version);
  * `startingTimestamp` (wall-clock anchor, mutually
  * exclusive with `startingVersion`: epoch millis / ISO instant / SQL
  * timestamp — the stream starts after the LAST version committed at or
  * before it, so a `TIMESTAMP AS OF t` snapshot read plus a
  * `startingTimestamp = t` tail reconstructs the live state exactly);
  * `maxVersionsPerBatch` (admission control: cap how many
  * table versions one micro-batch spans); `allowPurgedWindow` (override the
  * fail-loud guard on windows spanning a tombstone purge); `typed=true`
  * (emit the TYPED feed — every batch row classified in a `_change_type`
  * column as insert / update_preimage / update_postimage / delete, the
  * streaming twin of [[graft.tables.LakeTable.readChangesTyped]]; both
  * bucket versions fold to winners in the task, preimages are exact
  * retractions for downstream incremental aggregation, and purge-spanning
  * windows are safe).
  *
  * Failure contract: if the stream falls behind [[LakeTable.expire]]'s
  * retention (its checkpointed version is no longer on disk), planning fails
  * with a clear error instead of silently skipping versions — size
  * `expire(keepVersions=…)` to cover the slowest consumer, exactly like
  * binlog retention vs replica lag.
  *
  * The stream's schema is FIXED at query start (the table schema at source
  * resolution). Columns added by later schema evolution are not surfaced
  * until the query restarts; evolved files project onto the start schema
  * (missing columns read as null — the same alignment the batch changelog
  * applies).
  */
final class LakeCdfSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = LakeBucketSource.require(options, "root")
    val version = LakeCdfSource.currentVersion(root)
    val data = StructType.fromDDL(LakeTable.readSnapshot(Paths.get(root), version).schemaDdl)
    if (LakeCdfSource.isTyped(options))
      StructType(data.fields :+ org.apache.spark.sql.types.StructField(
        LakeCdfSource.ChangeTypeCol, org.apache.spark.sql.types.StringType,
        nullable = false))
    else data
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new LakeCdfTable(schema, new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object LakeCdfSource {
  /** format name for spark.readStream.format(...) */
  val Name: String = classOf[LakeCdfSource].getName

  /** shared read-only jackson mapper (offset json + ledger counter probes) */
  private[dsv2] val offsetMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** classification column of the TYPED stream (option `typed=true`) */
  val ChangeTypeCol = "_change_type"

  private[dsv2] def isTyped(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("typed")).exists(_.toBoolean)

  private[dsv2] def currentVersion(root: String): Long = {
    val vf = Paths.get(root, "meta", "VERSION")
    if (Files.exists(vf))
      new String(Files.readAllBytes(vf), StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  /** `startingTimestamp` accepts epoch millis (all digits), an ISO-8601
    * instant (`2026-08-19T10:00:00Z`), or a session-local SQL timestamp
    * (`2026-08-19 10:00:00`) — resolved in the SPARK SESSION's time zone
    * (`spark.sql.session.timeZone`), not the JVM default, so the form
    * agrees with how SQL `TIMESTAMP AS OF '<same literal>'` resolves and
    * the "`TIMESTAMP AS OF t` snapshot + `startingTimestamp = t` tail =
    * live state" invariant holds on clusters where the two zones differ. */
  private[dsv2] def parseTimestampMillis(ts: String): Long = {
    val t = ts.trim
    if (t.nonEmpty && t.forall(_.isDigit)) t.toLong
    else try java.time.Instant.parse(t).toEpochMilli
    catch { case _: java.time.format.DateTimeParseException =>
      try {
        val sessionTz = java.time.ZoneId.of(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        java.time.LocalDateTime
          .parse(t.replace(' ', 'T'))
          .atZone(sessionTz).toInstant.toEpochMilli
      } catch { case _: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"startingTimestamp '$ts' is neither epoch millis, an ISO-8601 " +
            "instant, nor 'yyyy-MM-dd HH:mm:ss'")
      }
    }
  }

  /** Last retained version of `root` committed at or before `millis`,
    * capped at the PUBLISHED head (a racing writer's `v<N+1>.json` may
    * exist before its bytes are durable). None when every retained commit
    * is later. ONE resolution shared by SQL `TIMESTAMP AS OF` and the
    * stream's `startingTimestamp` — the "snapshot + tail = live state"
    * invariant requires the two anchors to agree exactly. */
  private[dsv2] def versionAtOrBefore(root: String, millis: Long): Option[Long] = {
    val head = currentVersion(root)
    val rootP = Paths.get(root)
    LakeMetadataTables.retainedVersions(rootP).filter(_ <= head)
      .filter(v => LakeTable.committedAt(rootP, v) <= millis)
      .maxOption
  }

  private[dsv2] def earliestRetainedVersion(root: String): Long =
    LakeMetadataTables.retainedVersions(Paths.get(root)).minOption
      .getOrElse(throw new IllegalStateException(
        s"no table versions under $root/meta"))
}

final class LakeCdfTable(streamSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val root = LakeBucketSource.require(options, "root")

  override def name(): String = s"lake_cdf($root)"
  override def schema(): StructType = streamSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LakeCdfScan(root, streamSchema, options)
    }
}

final class LakeCdfScan(root: String, streamSchema: StructType,
    options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = streamSchema
  override def description(): String = s"LakeCdfScan(root=$root)"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LakeCdfStream(root, streamSchema, options)
}

/** version offset: `{"version":N}` means "changes up to and including table
  * version N have been emitted". `baselineEmpty` marks a
  * `startingVersion=earliest` anchor whose pre-image was already expired:
  * version N is retained but its CONTENTS have not been emitted yet, so the
  * first micro-batch diffs against an EMPTY old side (initial snapshot
  * load); the flag is consumed by that batch and never reappears. */
final case class LakeCdfOffset(version: Long, baselineEmpty: Boolean = false)
    extends Offset {
  override def json: String =
    if (baselineEmpty) s"""{"version":$version,"baseline":"empty"}"""
    else s"""{"version":$version}"""
}

final class LakeCdfStream(root: String, streamSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow with ReportsSourceMetrics {

  private val maxVersionsPerBatch: Long =
    Option(options.get("maxVersionsPerBatch")).map(_.toLong).getOrElse(Long.MaxValue)
  require(maxVersionsPerBatch >= 1, "maxVersionsPerBatch must be >= 1")
  private val allowPurgedWindow: Boolean =
    Option(options.get("allowPurgedWindow")).exists(_.toBoolean)
  private val typed: Boolean = LakeCdfSource.isTyped(options)
  /** table columns of the stream (typed mode appends the classification) */
  private val dataSchema: StructType =
    if (typed) StructType(streamSchema.dropRight(1)) else streamSchema

  /** snapshots are immutable once committed — cache them driver-side;
    * entries at or below the committed offset are dropped in [[commit]] */
  private val snapCache = mutable.Map.empty[Long, TableSnapshot]
  private def snap(v: Long): TableSnapshot = synchronized {
    snapCache.getOrElseUpdate(v,
      try LakeTable.readSnapshot(Paths.get(root), v)
      catch {
        case e: Exception => throw new IllegalStateException(
          s"table version $v of $root is not readable — if the stream lagged " +
            "past expire()'s retention window, raise keepVersions to cover the " +
            "slowest changelog consumer (like binlog retention vs replica lag)", e)
      })
  }

  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(LakeCdfSource.currentVersion(root))

  override def initialOffset(): Offset = {
    val sv = Option(options.get("startingVersion"))
    val st = Option(options.get("startingTimestamp"))
    val sg = Option(options.get("startingTag"))
    require(Seq(sv, st, sg).count(_.isDefined) <= 1,
      "options startingVersion, startingTimestamp and startingTag are " +
        "mutually exclusive")
    sg.foreach { tag =>
      // named-ref anchor (Iceberg tag analog): tail everything AFTER the
      // tagged version, so `VERSION AS OF '<tag>'` state + this stream's
      // batches = live state — the named twin of startingTimestamp
      val head = snap(LakeCdfSource.currentVersion(root))
      val v = head.tags.getOrElse(tag, throw new IllegalArgumentException(
        s"startingTag: no tag '$tag' on $root (tags: " +
          s"${head.tags.keys.toSeq.sorted.mkString(", ")})"))
      return LakeCdfOffset(v)
    }
    val v = st match {
      case Some(ts) =>
        // wall-clock anchor, the dual of the catalog's TIMESTAMP AS OF: the
        // offset is the LAST retained version committed at or before t, so
        // `TIMESTAMP AS OF t` state + this stream's batches = live state
        // (one shared resolution, LakeCdfSource.versionAtOrBefore)
        val millis = LakeCdfSource.parseTimestampMillis(ts)
        LakeCdfSource.versionAtOrBefore(root, millis)
          .getOrElse(throw new IllegalArgumentException(
            s"startingTimestamp: no retained version of $root was committed at " +
              s"or before ${java.time.Instant.ofEpochMilli(millis)}; older " +
              "snapshots may have been expired — use startingVersion=earliest " +
              "for the full retained history"))
      case None => sv.getOrElse("latest") match {
        case "latest" => LakeCdfSource.currentVersion(root)
        case "earliest" =>
          val e = LakeCdfSource.earliestRetainedVersion(root)
          // v0 is the empty CREATE commit, so anchoring AT a retained v0 is
          // already a full load. When expire() has removed v0, anchor at the
          // earliest retained version with an EMPTY baseline: the first
          // batch emits that state as inserts (initial snapshot load), THEN
          // tails — otherwise every row already present at the anchor would
          // silently never reach the consumer.
          return LakeCdfOffset(e, baselineEmpty = e > 0L)
        case n => n.toLong
      }
    }
    LakeCdfOffset(v)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  /** Admission control: advance from `start` to the current table version,
    * clamped by (a) `maxVersionsPerBatch`, (b) the Trigger.AvailableNow
    * target pinned at query start, and (c) the first REBUCKET boundary —
    * a micro-batch never spans a bucket-layout change (the boundary batch
    * ends AT the rebucket version; its diff runs under the old layout
    * against the pre-rebucket snapshot, which is logically identical). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startOff = start.asInstanceOf[LakeCdfOffset]
    val from = startOff.version
    var end = LakeCdfSource.currentVersion(root)
    availableNowTarget.foreach(t => end = math.min(end, t))
    val cap = // saturating from + maxVersionsPerBatch (unlimited default overflows)
      if (maxVersionsPerBatch > Long.MaxValue - from) Long.MaxValue
      else from + maxVersionsPerBatch
    end = math.min(end, cap)
    // a pending empty-baseline anchor must emit ITS OWN version's contents
    // even when no commit has landed since: returning the plain offset at
    // the same version schedules the initial-load batch (the offsets differ
    // in json), after which the flag is gone for good
    if (end <= from) return LakeCdfOffset(from)
    // a pending empty-baseline anchor never reads a diff base at `from`:
    // the initial-load batch reads ONLY snap(end) (see planInputPartitions'
    // baselineEmpty branch), so no rebucket boundary inside the window can
    // matter — and probing the anchor version's ledger below would fail if
    // a concurrent expire() retired it between initialOffset and this first
    // batch, even though nothing in the batch needs that version. Skip the
    // clamp walk entirely.
    if (startOff.baselineEmpty) return LakeCdfOffset(end)
    // clamp at the first layout change (rebucket counter bump) in (from, end]
    val baseRebuckets = rebucketsAt(from)
    var v = from + 1
    while (v <= end) {
      if (rebucketsAt(v) != baseRebuckets) return LakeCdfOffset(v)
      v += 1
    }
    LakeCdfOffset(end)
  }

  /** Counter-only probe for the admission clamp. A lagged stream's catch-up
    * walks every version in its window; materializing (and driver-caching)
    * the FULL snapshot of each — bucketFiles + fileStats maps — just to
    * read one counter is the difference between a bounded scan and a
    * driver-OOM at 10k retained versions. This parses the ledger's totals
    * node only and caches one Long per version. The walk stays LINEAR, not
    * a binary search: rollback() reverts totals to the restored snapshot's,
    * so the counter is NOT monotone across a rollback commit. */
  private val rebucketsCache = mutable.Map.empty[Long, Long]
  private def rebucketsAt(v: Long): Long = synchronized {
    rebucketsCache.getOrElseUpdate(v,
      snapCache.get(v).map(_.totals.getOrElse("rebuckets", 0L)).getOrElse {
        val node =
          try LakeCdfSource.offsetMapper.readTree(
            Files.readAllBytes(Paths.get(root, "meta", s"v$v.json")))
          catch {
            case e: Exception => throw new IllegalStateException(
              s"table version $v of $root is not readable — if the stream " +
                "lagged past expire()'s retention window, raise keepVersions " +
                "to cover the slowest changelog consumer", e)
          }
        val t = node.get("totals")
        val c = if (t == null) null else t.get("rebuckets")
        if (c == null) 0L else c.asLong()
      })
  }

  override def reportLatestOffset(): Offset =
    LakeCdfOffset(LakeCdfSource.currentVersion(root))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startOff = start.asInstanceOf[LakeCdfOffset]
    val from = startOff.version
    val to = end.asInstanceOf[LakeCdfOffset].version
    if (startOff.baselineEmpty) {
      // INITIAL SNAPSHOT LOAD (startingVersion=earliest past an expired
      // v0): the anchor's pre-image no longer exists, so the old side is
      // EMPTY — emit the full state at `to` as inserts (to == from when no
      // commit landed since the anchor). No purge/rebucket guards apply:
      // with no prior consumer state there is nothing a purge or layout
      // change could invalidate.
      val toSnap = snap(to)
      val changed = toSnap.bucketFiles.collect {
        case (b, fs) if fs.nonEmpty => b
      }.toSeq.sorted
      if (changed.isEmpty) return Array.empty
      val conf = SparkSession.active.sessionState.newHadoopConf()
      val allRel = changed.flatMap(b => toSnap.bucketFiles(b)).distinct
      val lens = LakeBucketSource.statLengths(root, allRel, conf)
      return changed.zipWithIndex.map { case (b, idx) =>
        val newFiles = toSnap.bucketFiles(b).map { rel =>
          PartitionedFile(
            partitionValues = InternalRow.empty,
            filePath = org.apache.spark.paths.SparkPath.fromPathString(
              LakeTable.dataPath(root, rel)),
            start = 0L, length = lens(rel))
        }.toArray
        LakeCdfPartition(idx, b, Array.empty[PartitionedFile], newFiles,
          newDirty = toSnap.morBuckets.contains(b)): InputPartition
      }.toArray
    }
    if (to <= from) return Array.empty
    val fromSnap = snap(from)
    // a window ending AT a rebucket diffs against the pre-rebucket version:
    // the rebucket commit itself changed no logical rows (maintenance-only by
    // construction — asserted here), and (from, to-1] shares fromSnap's layout
    val toSnap0 = snap(to)
    val toSnap =
      if (toSnap0.numBuckets == fromSnap.numBuckets) toSnap0
      else {
        val pre = snap(to - 1)
        // the boundary commit must be a PURE rebucket before its pre-image
        // can substitute for it: exactly one rebucket counter bump and NO
        // fast-forward publish in the same commit (a publish carries merged
        // rows — treating it as inert would silently drop them; fastForward
        // refuses layout-changing publishes, and this guards the invariant
        // from this side). A rollback ACROSS a layout change also lands
        // here: its counters revert rather than increment.
        require(pre.numBuckets == fromSnap.numBuckets &&
          toSnap0.totals.getOrElse("rebuckets", 0L) ==
            pre.totals.getOrElse("rebuckets", 0L) + 1L &&
          toSnap0.totals.getOrElse("clones", 0L) ==
            pre.totals.getOrElse("clones", 0L),
          s"micro-batch ($from, $to] spans a bucket-layout change that is not " +
            "a single pure rebucket boundary (a rollback across a rebucket, " +
            "or a layout-changing publish) — restart the stream from a " +
            "version at or after the layout change")
        pre
      }
    // the TYPED stream is purge-tolerant (a fully-vanished key synthesizes a
    // delete from the old side); the untyped stream would silently lose the
    // purged tombstone rows, so it fails loudly
    require(typed || allowPurgedWindow ||
      toSnap.totals.getOrElse("tombstone_purges", 0L) ==
        fromSnap.totals.getOrElse("tombstone_purges", 0L),
      s"changelog window ($from, $to] spans a tombstone purge: deletes purged " +
        "inside the window cannot surface to this consumer. Purge only after " +
        "every changelog consumer has passed the deletes' versions, or set " +
        "option allowPurgedWindow=true (or consume the typed stream)")
    val changed = toSnap.bucketFiles.keys.filter { b =>
      toSnap.bucketFiles.getOrElse(b, Nil) != fromSnap.bucketFiles.getOrElse(b, Nil)
    }.toSeq.sorted
    if (changed.isEmpty) return Array.empty
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val allRel = changed.flatMap(b =>
      fromSnap.bucketFiles.getOrElse(b, Nil) ++ toSnap.bucketFiles.getOrElse(b, Nil)).distinct
    val lens = LakeBucketSource.statLengths(root, allRel, conf)
    def files(s: TableSnapshot, b: Int): Array[PartitionedFile] =
      s.bucketFiles.getOrElse(b, Nil).map { rel =>
        PartitionedFile(
          partitionValues = InternalRow.empty,
          filePath = org.apache.spark.paths.SparkPath.fromPathString(LakeTable.dataPath(root, rel)),
          start = 0L, length = lens(rel))
      }.toArray
    changed.zipWithIndex.map { case (b, idx) =>
      LakeCdfPartition(idx, b, files(fromSnap, b), files(toSnap, b),
        newDirty = toSnap.morBuckets.contains(b)): InputPartition
    }.toArray
  }

  /** Table-identity fields (keys, orders, tombstone column) are immutable
    * for the table's lifetime — resolve them ONCE per stream instead of
    * parsing a fresh head snapshot every micro-batch. */
  private lazy val identitySnap: TableSnapshot =
    snap(LakeCdfSource.currentVersion(root))

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val s = identitySnap
    val keyOrder = (s.keyCols ++ s.orderCols).toIndexedSeq
    val tupleSchema = StructType(keyOrder.map(c => dataSchema(dataSchema.fieldIndex(c))))
    val empty = StructType(Nil)
    // untyped: the old side reads ONLY the LWW tuple columns
    // (parquet-pruned — membership is all that's needed); typed: the old
    // side must supply full preimage rows, so it reads the data schema
    val oldFactory = LakeBucketSource.parquetReaderFactory(
      spark, if (typed) dataSchema else tupleSchema,
      if (typed) dataSchema else tupleSchema, empty, Array.empty)
    val newFactory = LakeBucketSource.parquetReaderFactory(
      spark, dataSchema, dataSchema, empty, Array.empty)
    new LakeCdfReaderFactory(oldFactory, newFactory, dataSchema,
      s.keyCols, s.orderCols, if (typed) s.tombstoneCol else None, typed)
  }

  override def deserializeOffset(json: String): Offset = {
    val m = LakeCdfSource.offsetMapper.readTree(json)
    LakeCdfOffset(m.get("version").asLong(), m.has("baseline"))
  }

  override def commit(end: Offset): Unit = synchronized {
    val v = end.asInstanceOf[LakeCdfOffset].version
    snapCache.filterInPlace((k, _) => k >= v)
    rebucketsCache.filterInPlace((k, _) => k >= v)
  }

  override def stop(): Unit = ()

  override def metrics(latestConsumed: JOptional[Offset]): java.util.Map[String, String] = {
    val cur = LakeCdfSource.currentVersion(root)
    val consumed = if (latestConsumed.isPresent)
      latestConsumed.get.asInstanceOf[LakeCdfOffset].version else cur
    Map(
      "tableVersion" -> cur.toString,
      "versionsBehind" -> math.max(0L, cur - consumed).toString).asJava
  }
}

/** One CHANGED bucket = one input partition: old-version files (tuple
  * columns only) + new-version files (full rows). */
final case class LakeCdfPartition(index: Int, bucket: Int,
    oldFiles: Array[PartitionedFile], newFiles: Array[PartitionedFile],
    newDirty: Boolean) extends InputPartition

final class LakeCdfReaderFactory(oldFactory: ParquetPartitionReaderFactory,
    newFactory: ParquetPartitionReaderFactory, dataSchema: StructType,
    keyCols: Seq[String], orderCols: Seq[String], tombstoneCol: Option[String],
    typed: Boolean) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    if (typed)
      new LakeCdfTypedPartitionReader(p.asInstanceOf[LakeCdfPartition],
        oldFactory, newFactory, dataSchema, keyCols, orderCols, tombstoneCol)
    else
      new LakeCdfPartitionReader(p.asInstanceOf[LakeCdfPartition],
        oldFactory, newFactory, dataSchema, keyCols, orderCols)

  override def supportColumnarReads(p: InputPartition): Boolean = false
}

/** Per-bucket changed-row reader. Memory bound: the old side holds one
  * UnsafeRow of `keys… ++ orderCols…` per stored old-version row of THIS
  * bucket (payload columns are never read); a merge-on-read new side
  * additionally folds its winners (≤ one bucket — the compaction working
  * set). Equality is byte-wise on the projected tuple, which is exactly the
  * batch changelog's null-safe `<=>` semantics. */
/** TYPED per-bucket changed-row reader (the streaming twin of
  * `LakeTable.readChangesTyped`): folds BOTH versions of the bucket to
  * their per-key LWW winners in the task, then classifies each key —
  * insert / update_preimage + update_postimage / delete (the delete payload
  * is the old winner, not the tombstone marker) — appending the
  * `_change_type` column. Memory bound: two winner maps of one bucket (2×
  * the compaction working set; the typed stream trades the untyped
  * reader's tuple-pruned old side for exact preimages). */
final class LakeCdfTypedPartitionReader(p: LakeCdfPartition,
    oldFactory: ParquetPartitionReaderFactory,
    newFactory: ParquetPartitionReaderFactory, dataSchema: StructType,
    keyCols: Seq[String], orderCols: Seq[String], tombstoneCol: Option[String])
    extends PartitionReader[InternalRow] {

  private def bound(cols: Seq[String]) = cols.map { c =>
    val i = dataSchema.fieldIndex(c)
    BoundReference(i, dataSchema(i).dataType, dataSchema(i).nullable)
  }
  private val keyProj = UnsafeProjection.create(bound(keyCols))
  private val orderProj = UnsafeProjection.create(bound(orderCols))
  private val ord = RowOrdering.createNaturalAscendingOrdering(
    orderCols.map(c => dataSchema(dataSchema.fieldIndex(c)).dataType))
  private val tombIdx = tombstoneCol.map(dataSchema.fieldIndex)
  private def isTomb(row: InternalRow): Boolean =
    tombIdx.exists(i => !row.isNullAt(i) && row.getBoolean(i))

  private def foldWinners(factory: ParquetPartitionReaderFactory,
      files: Array[PartitionedFile]): java.util.HashMap[UnsafeRow, (UnsafeRow, InternalRow)] = {
    val winners = new java.util.HashMap[UnsafeRow, (UnsafeRow, InternalRow)]()
    if (files.nonEmpty) {
      val r = factory.createReader(FilePartition(p.index, files))
      try while (r.next()) {
        val row = r.get()
        val k = keyProj(row)
        val o = orderProj(row)
        val prev = winners.get(k)
        if (prev == null || ord.compare(o, prev._1) > 0)
          winners.put(k.copy(), (o.copy(), row.copy()))
      } finally r.close()
    }
    winners
  }

  private val oldWinners = foldWinners(oldFactory, p.oldFiles)
  private val newWinners = foldWinners(newFactory, p.newFiles)

  private def withType(row: InternalRow, t: String): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.JoinedRow(row,
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(t))))

  private val pending = new java.util.ArrayDeque[InternalRow]()
  private val newIter = newWinners.entrySet().iterator()
  // a LIVE old winner whose key carries no stored rows at all in the new
  // version can only arise from a purge that emptied the bucket's files —
  // surface it as a delete (the purge-tolerance the untyped stream lacks)
  private lazy val vanishedIter = {
    import scala.jdk.CollectionConverters._
    oldWinners.entrySet().iterator().asScala
      .filter(e => !newWinners.containsKey(e.getKey) && !isTomb(e.getValue._2))
      .map(e => withType(e.getValue._2, "delete"))
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (pending.isEmpty && newIter.hasNext) {
      val e = newIter.next()
      val (nOrder, n) = e.getValue
      val old = oldWinners.get(e.getKey)
      val nLive = !isTomb(n)
      if (old == null || isTomb(old._2)) {
        if (nLive) pending.add(withType(n, "insert"))
      } else if (!nLive) {
        pending.add(withType(old._2, "delete"))
      } else if (old._1 != nOrder) {
        pending.add(withType(old._2, "update_preimage"))
        pending.add(withType(n, "update_postimage"))
      }
    }
    while (pending.isEmpty && vanishedIter.hasNext) pending.add(vanishedIter.next())
    if (pending.isEmpty) false
    else { current = pending.poll(); true }
  }

  override def get(): InternalRow = current

  override def close(): Unit = ()
}

final class LakeCdfPartitionReader(p: LakeCdfPartition,
    oldFactory: ParquetPartitionReaderFactory,
    newFactory: ParquetPartitionReaderFactory, streamSchema: StructType,
    keyCols: Seq[String], orderCols: Seq[String])
    extends PartitionReader[InternalRow] {

  private val tupleSchema = StructType(
    (keyCols ++ orderCols).map(c => streamSchema(streamSchema.fieldIndex(c))))

  // (keys…, orders…) tuples present in the OLD version of this bucket — the
  // old reader's output schema IS the tuple schema, so this is an identity
  // projection to a hashable UnsafeRow
  private val oldTuples: java.util.HashSet[UnsafeRow] = {
    val set = new java.util.HashSet[UnsafeRow]()
    if (p.oldFiles.nonEmpty) {
      val proj = UnsafeProjection.create(tupleSchema)
      val r = oldFactory.createReader(FilePartition(p.index, p.oldFiles))
      try while (r.next()) set.add(proj(r.get()).copy())
      finally r.close()
    }
    set
  }

  private def bound(cols: Seq[String]) = cols.map { c =>
    val i = streamSchema.fieldIndex(c)
    BoundReference(i, streamSchema(i).dataType, streamSchema(i).nullable)
  }
  private val tupleProj = UnsafeProjection.create(bound(keyCols ++ orderCols))

  private var newReader: PartitionReader[InternalRow] = _
  private var foldedIter: Iterator[InternalRow] = _
  private var current: InternalRow = _

  if (p.newFiles.nonEmpty) {
    newReader = newFactory.createReader(FilePartition(p.index, p.newFiles))
    if (p.newDirty) {
      // merge-on-read bucket: LWW-fold to winners in the task (ascending
      // natural order on the order columns, matching the merge's max_by)
      val keyProj = UnsafeProjection.create(bound(keyCols))
      val orderProj = UnsafeProjection.create(bound(orderCols))
      val ord = RowOrdering.createNaturalAscendingOrdering(
        orderCols.map(c => streamSchema(streamSchema.fieldIndex(c)).dataType))
      val winners = new java.util.HashMap[UnsafeRow, (UnsafeRow, InternalRow)]()
      try while (newReader.next()) {
        val row = newReader.get()
        val k = keyProj(row)
        val o = orderProj(row)
        val prev = winners.get(k)
        if (prev == null) winners.put(k.copy(), (o.copy(), row.copy()))
        else if (ord.compare(o, prev._1) > 0) winners.put(k.copy(), (o.copy(), row.copy()))
      } finally { newReader.close(); newReader = null }
      foldedIter = winners.values().iterator().asScala.map(_._2)
    }
  }

  override def next(): Boolean = {
    if (foldedIter != null) {
      while (foldedIter.hasNext) {
        val row = foldedIter.next()
        if (!oldTuples.contains(tupleProj(row))) { current = row; return true }
      }
      false
    } else if (newReader != null) {
      while (newReader.next()) {
        val row = newReader.get()
        if (!oldTuples.contains(tupleProj(row))) { current = row; return true }
      }
      false
    } else false
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (newReader != null) { newReader.close(); newReader = null }
}
