package graft.tables.dsv2

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.tables.LakeTable

/** SQL MAINTENANCE PROCEDURES (`CALL lake.system.<proc>(…)`) — the
  * stored-procedure surface of [[LakeCatalog]], mirroring Iceberg's Spark
  * procedures (`rewrite_data_files`, `expire_snapshots`,
  * `rollback_to_snapshot`) over the lake table's own maintenance API:
  *
  * {{{
  *   CALL lake.system.compact(table => 'accounts')
  *   CALL lake.system.expire_snapshots('accounts', keep_last => 5)
  *   CALL lake.system.rollback('accounts', 7)
  *   CALL lake.system.purge_tombstones('accounts')
  *   CALL lake.system.rebucket('accounts', 64)
  *   CALL lake.system.cluster('accounts', 'slot', max_rows_per_file => 1000000)
  *   CALL lake.system.verify_table('accounts', check_data => true)
  * }}}
  *
  * Each procedure opens the table under the catalog's warehouse, runs the
  * corresponding [[graft.tables.LakeTable]] maintenance operation
  * (compact / expire / rollback / purgeTombstones / rebucket — all of which
  * carry their own OCC story: compaction and purges rebase over racing
  * ingest merges, rebucket re-runs, rollback refuses to guess), and returns
  * a one-row result through Spark's `LocalScan` procedure protocol.
  * Positional and named (`param => value`) arguments both work; Spark's
  * analyzer coerces argument types and fills declared defaults.
  *
  * Scale note: these are DRIVER-coordinated maintenance commands — the
  * heavy lifting (bucket rewrites) runs as the same zero-shuffle
  * storage-partitioned Spark jobs the typed API plans; only the one-row
  * result is local.
  */
private[dsv2] object LakeProcedures {

  /** procedures live in ONE namespace, `<catalog>.system` */
  val Namespace: Array[String] = Array("system")

  private val all: Seq[String] =
    Seq("clone", "cluster", "compact", "create_tag", "drop_tag",
      "expire_snapshots", "fast_forward", "remove_orphan_files", "rollback",
      "purge_tombstones", "rebucket", "verify_table")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Namespace) || namespace.isEmpty)
      all.map(Identifier.of(Namespace, _)).toArray
    else Array.empty

  def load(warehouse: String, ident: Identifier): Option[UnboundProcedure] = {
    if (!ident.namespace().sameElements(Namespace)) return None
    val p = ident.name() match {
      case "clone" => new LakeProcedure(warehouse, "clone",
        "zero-copy SHALLOW CLONE (Delta SHALLOW CLONE analog): create a new " +
          "table whose initial snapshot references the source's data files " +
          "by absolute path — no data copied; a protective tag on the " +
          "source pins the cloned version against expire_snapshots",
        Seq(tableParam,
          ProcedureParameter.in("dest", StringType)
            .comment("new table name under the catalog warehouse " +
              "(dots separate namespaces); must not already exist")
            .build(),
          ProcedureParameter.in("version", LongType)
            .defaultValue("-1").comment("-1 = current head").build()),
        StructType(Seq(
          StructField("cloned_version", LongType, nullable = false),
          StructField("source_tag", StringType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] = {
          val destName = args.getUTF8String(1).toString
          val destRoot = LakeCatalog.resolveRoot(warehouse, destName.split('.').toSeq)
          // resolve the head HERE so the returned version names exactly the
          // snapshot that was cloned even if a writer commits concurrently
          val v = args.getLong(2)
          val resolved = if (v < 0L) t.currentVersion() else v
          t.cloneTo(destRoot.toString, resolved)
          val tag = LakeTable.cloneProvenance(destRoot.toString)
            .map(_._3).getOrElse("")
          Seq[Any](resolved, tag)
        }
      }
      case "fast_forward" => new LakeProcedure(warehouse, "fast_forward",
        "WRITE-AUDIT-PUBLISH (Iceberg fast_forward analog): adopt a clone's " +
          "audited head state back into its source table in one commit — " +
          "borrowed files relativize in place, clone-local files rename in " +
          "(no data copied); strict: fails loudly if the source advanced " +
          "since the clone; the clone is consumed",
        Seq(tableParam,
          ProcedureParameter.in("clone", StringType)
            .comment("clone table name under the catalog warehouse " +
              "(must descend from `table`)").build()),
        StructType(Seq(
          StructField("new_version", LongType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] = {
          val cloneRoot = LakeCatalog.resolveRoot(warehouse,
            args.getUTF8String(1).toString.split('.').toSeq)
          Seq[Any](t.fastForward(cloneRoot.toString))
        }
      }
      case "compact" => new LakeProcedure(warehouse, "compact",
        "rewrite every merge-on-read bucket into a single resolved layer",
        Seq(tableParam),
        StructType(Seq(
          StructField("compacted_buckets", IntegerType, nullable = false),
          StructField("version", LongType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] = {
          val n = t.compact()
          Seq[Any](n, t.snapshot().version)
        }
      }
      case "expire_snapshots" => new LakeProcedure(warehouse, "expire_snapshots",
        "retire snapshot metadata and unreferenced data directories older " +
          "than the most recent keep_last versions",
        Seq(tableParam,
          ProcedureParameter.in("keep_last", IntegerType)
            .defaultValue("2").build()),
        StructType(Seq(
          StructField("expired_snapshots", IntegerType, nullable = false),
          StructField("data_dirs_removed", IntegerType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] = {
          val (meta, data) = t.expire(args.getInt(1))
          Seq[Any](meta, data)
        }
      }
      case "rollback" => new LakeProcedure(warehouse, "rollback",
        "restore a retained snapshot's full state as a NEW head version " +
          "(history only moves forward; no data copied)",
        Seq(tableParam,
          ProcedureParameter.in("version", LongType).build()),
        StructType(Seq(
          StructField("restored_version", LongType, nullable = false),
          StructField("new_version", LongType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] = {
          val target = args.getLong(1)
          Seq[Any](target, t.rollback(target))
        }
      }
      case "purge_tombstones" => new LakeProcedure(warehouse, "purge_tombstones",
        "physically drop tombstoned keys whose delete versions are expired " +
          "from time travel (GDPR-style erasure)",
        Seq(tableParam),
        StructType(Seq(
          StructField("purged_buckets", IntegerType, nullable = false),
          StructField("version", LongType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] = {
          val n = t.purgeTombstones()
          Seq[Any](n, t.snapshot().version)
        }
      }
      case "cluster" => new LakeProcedure(warehouse, "cluster",
        "sort each bucket's rows by the given columns and split them into " +
          "bounded files so range predicates prune at planning time " +
          "(Iceberg rewrite_data_files strategy => 'sort')",
        Seq(tableParam,
          ProcedureParameter.in("sort_by", StringType)
            .comment("comma-separated sort columns, highest-precedence first")
            .build(),
          ProcedureParameter.in("max_rows_per_file", LongType)
            .defaultValue("0").comment("0 = one file per bucket").build(),
          ProcedureParameter.in("zorder", BooleanType)
            .defaultValue("false")
            .comment("true = Morton-interleave ALL sort columns so range " +
              "predicates on any of them prune (Iceberg zorder(...) analog)")
            .build()),
        StructType(Seq(
          StructField("clustered_buckets", IntegerType, nullable = false),
          StructField("version", LongType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] = {
          val cols = args.getUTF8String(1).toString.split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq
          val n = t.cluster(cols, args.getLong(2), zorder = args.getBoolean(3))
          Seq[Any](n, t.snapshot().version)
        }
      }
      case "create_tag" => new LakeProcedure(warehouse, "create_tag",
        "create an immutable named tag for a retained version (Iceberg " +
          "create_tag analog): tagged versions survive expire_snapshots " +
          "and resolve in VERSION AS OF '<tag>'",
        Seq(tableParam,
          ProcedureParameter.in("tag", StringType).build(),
          ProcedureParameter.in("version", LongType)
            .defaultValue("-1").comment("-1 = current head").build()),
        StructType(Seq(
          StructField("tagged_version", LongType, nullable = false),
          StructField("version", LongType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] = {
          val name = args.getUTF8String(1).toString
          t.createTag(name, args.getLong(2))
          Seq[Any](t.resolveTag(name), t.snapshot().version)
        }
      }
      case "drop_tag" => new LakeProcedure(warehouse, "drop_tag",
        "drop a named tag (the version it pinned returns to normal " +
          "expire_snapshots retention)",
        Seq(tableParam, ProcedureParameter.in("tag", StringType).build()),
        StructType(Seq(
          StructField("version", LongType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] = {
          t.dropTag(args.getUTF8String(1).toString)
          Seq[Any](t.snapshot().version)
        }
      }
      case "remove_orphan_files" => new LakeProcedure(warehouse, "remove_orphan_files",
        "FILE-level GC (Iceberg remove_orphan_files analog): delete data " +
          "files no retained snapshot references — the debt expire's " +
          "directory-granular sweep cannot reach when a dir is anchored by " +
          "one cold bucket's live file; files younger than grace_ms are kept",
        Seq(tableParam,
          ProcedureParameter.in("grace_ms", LongType)
            .defaultValue("86400000")
            .comment("keep files younger than this (mtime), default 1 day")
            .build()),
        StructType(Seq(
          StructField("orphan_files_removed", IntegerType, nullable = false),
          StructField("empty_dirs_removed", IntegerType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] = {
          val (files, dirs) = t.removeOrphanFiles(args.getLong(1))
          Seq[Any](files, dirs)
        }
      }
      case "verify_table" => new LakeProcedure(warehouse, "verify_table",
        "TABLE INTEGRITY AUDIT (an fsck for the table format): validate the " +
          "head snapshot's internal invariants and its agreement with " +
          "storage, modifying nothing — one row per check; check_data=true " +
          "adds one zero-shuffle job verifying per-bucket stored counts and " +
          "that every row's key hashes into the bucket holding it",
        Seq(tableParam,
          ProcedureParameter.in("check_data", BooleanType)
            .defaultValue("false")
            .comment("also run the distributed data pass (counts + hash placement)")
            .build()),
        StructType(Seq(
          StructField("check", StringType, nullable = false),
          StructField("ok", BooleanType, nullable = false),
          StructField("detail", StringType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] =
          throw new UnsupportedOperationException("multi-row procedure")
        override def runRows(t: LakeTable, args: InternalRow): Seq[Seq[Any]] =
          t.verifyTable(checkData = args.getBoolean(1))
            .map { case (check, ok, detail) => Seq[Any](check, ok, detail) }
      }
      case "rebucket" => new LakeProcedure(warehouse, "rebucket",
        "rewrite the table into a new hash-bucket count in one commit " +
          "(layout evolution; full-table rewrite)",
        Seq(tableParam,
          ProcedureParameter.in("buckets", IntegerType).build()),
        StructType(Seq(
          StructField("buckets", IntegerType, nullable = false),
          StructField("version", LongType, nullable = false)))) {
        override def run(t: LakeTable, args: InternalRow): Seq[Any] = {
          val n = args.getInt(1)
          t.rebucket(n)
          Seq[Any](n, t.snapshot().version)
        }
      }
      case _ => null
    }
    Option(p)
  }

  private def tableParam: ProcedureParameter =
    ProcedureParameter.in("table", StringType)
      .comment("table name under the catalog warehouse (dots separate namespaces)")
      .build()
}

/** One maintenance procedure: unbound == bound (parameters are fixed; the
  * analyzer coerces argument types to them and fills defaults). `call`
  * resolves the table exactly like [[LakeCatalog.loadTable]] — same
  * identifier validation, same warehouse — then hands the one-row result
  * back as a [[LocalScan]], the shape Spark's `InvokeProcedures` rule turns
  * into a LocalRelation. */
private[dsv2] abstract class LakeProcedure(warehouse: String, procName: String,
    desc: String, params: Seq[ProcedureParameter], resultSchema: StructType)
    extends UnboundProcedure with BoundProcedure {

  def run(table: LakeTable, args: InternalRow): Seq[Any]

  /** Multi-row procedures (verify_table) override this; the default wraps
    * the one-row [[run]] every maintenance command returns. */
  def runRows(table: LakeTable, args: InternalRow): Seq[Seq[Any]] =
    Seq(run(table, args))

  override def name(): String = procName
  override def description(): String = desc
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params.toArray
  // every procedure commits table state — never constant-foldable
  override def isDeterministic: Boolean = false

  override def call(input: InternalRow): JIterator[Scan] = {
    // every parameter is semantically mandatory (keep_last merely has a
    // default); a NULL slot would otherwise unbox to 0 silently — e.g.
    // rollback('t', NULL) reading version 0 and "emptying" the table
    params.indices.foreach { i =>
      require(!input.isNullAt(i),
        s"CALL $procName: argument '${params(i).name()}' must not be NULL")
    }
    val tableName = input.getUTF8String(0).toString
    val segs = tableName.split('.').toSeq
    val root = LakeCatalog.resolveRoot(warehouse, segs)
    require(java.nio.file.Files.exists(root.resolve("meta/VERSION")),
      s"no lake table '$tableName' under warehouse $warehouse")
    val table = LakeTable.open(SparkSession.active, root.toString)
    val rows: Array[InternalRow] = runRows(table, input).map { out =>
      new GenericInternalRow(out.map {
        case s: String => UTF8String.fromString(s)
        case x => x.asInstanceOf[Any]
      }.toArray): InternalRow
    }.toArray
    java.util.List.of[Scan](new LakeProcedureResult(resultSchema, rows)).iterator()
  }
}

private final class LakeProcedureResult(schema: StructType, resultRows: Array[InternalRow])
    extends LocalScan {
  override def rows(): Array[InternalRow] = resultRows
  override def readSchema(): StructType = schema
  override def description(): String = s"LakeProcedureResult(${schema.simpleString})"
}
