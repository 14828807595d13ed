package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}
import java.util.Comparator

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Snapshot metadata for one committed table version. */
final case class TableSnapshot(
    version: Long,
    schemaDdl: String,
    keyCols: Seq[String],
    orderCols: Seq[String],
    numBuckets: Int,
    /** bucket id → data files (relative to table root) */
    bucketFiles: Map[Int, Seq[String]],
    /** idempotence ledger: batch ids already merged (exactly-once) */
    appliedBatches: Seq[String],
    /** per-batch lineage: batchId → (rows upserted, touched buckets) */
    lineage: Map[String, (Long, Seq[Int])],
    rowCount: Long)

/** Iceberg-style managed table built from scratch (SURVEY.md §7.3; no
  * Iceberg/Delta jars exist in this environment, by design).
  *
  * Layout: `<root>/data/commit-<v>/bucket=<i>/` parquet files +
  * `<root>/meta/v<N>.json` + `<root>/meta/VERSION` (current version number,
  * swapped by atomic rename — the JVM translation of the reference's
  * temp-file-then-rename publish, sqlite.rs:446-451).
  *
  * The table is hash-bucketed by key: `bucket = pmod(xxhash64(keys), B)`.
  * MERGE is copy-on-write per bucket — only buckets containing incoming
  * keys are rewritten; untouched buckets carry their files forward. At
  * 100 TB / 10^10 events this is what keeps incremental batches cheap: a
  * delta touching k% of the keyspace rewrites ≈k% of buckets (choose B so a
  * bucket ≈ a few GB), and both sides of the upsert-join arrive partitioned
  * by the same function, so the combine is a per-bucket local merge, never a
  * full-table shuffle.
  *
  * Exactly-once: each merge records its `batchId` in the snapshot before the
  * pointer swap; a re-delivered batch (foreachBatch retry after checkpoint
  * recovery) is a no-op. Schema evolution: new columns in a batch are added
  * as nullable columns; old files read through the evolved schema yield
  * nulls (enrichment columns, north-rule requirement).
  */
final class LakeTable private (
    val spark: SparkSession,
    val root: String) {

  import LakeTable._

  val BucketCol = "_gbucket"

  def currentVersion(): Long = {
    val vf = Paths.get(root, "meta", "VERSION")
    if (Files.exists(vf)) new String(Files.readAllBytes(vf), StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  def snapshot(): TableSnapshot = readSnapshot(Paths.get(root), currentVersion())

  def schema: StructType = StructType.fromDDL(snapshot().schemaDdl)

  /** Current table state as a DataFrame (all committed files, evolved schema). */
  def read(): DataFrame = {
    val s = snapshot()
    val schema = StructType.fromDDL(s.schemaDdl)
    val files = s.bucketFiles.values.flatten.map(rel => s"$root/$rel").toSeq
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  private def bucketExpr(keyCols: Seq[String], numBuckets: Int) =
    pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets)).cast("int")

  /** MERGE INTO: LWW upsert of `batch` under exactly-once semantics.
    *
    * @param batchId   unique replay id (e.g. "<checkpointId>-<batchId>")
    * @param salted    route the in-batch dedup through the two-phase salted
    *                  path (hot-key skew)
    * @return rows upserted (0 for a re-delivered batch)
    */
  def merge(batch: DataFrame, batchId: String, salted: Boolean = false): Long = {
    val snap = snapshot()
    if (snap.appliedBatches.contains(batchId)) return 0L // exactly-once no-op

    // --- schema evolution: batch may add new nullable columns ---
    val curSchema = StructType.fromDDL(snap.schemaDdl)
    val newCols = batch.schema.filterNot(f => curSchema.fieldNames.contains(f.name))
    val evolved = StructType(curSchema.fields ++ newCols.map(_.copy(nullable = true)))
    require(snap.keyCols.forall(batch.columns.contains),
      s"batch missing key columns ${snap.keyCols}")

    // The batch is typically the output of an expensive decode (mapPartitions
    // binary parse) and is scanned twice (stats pass + merge write). Caching
    // trades memory for the second decode; measured ~neutral at bench scale
    // (columnar cache encode ≈ decode cost), so it's opt-in.
    val cacheBatch = sys.env.get("GRAFT_MERGE_CACHE").contains("1")
    val alignedBatch0 = align(batch, evolved)
    val alignedBatch =
      if (cacheBatch) alignedBatch0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else alignedBatch0
    val dbg = sys.env.get("GRAFT_MERGE_DEBUG").contains("1")
    var tPhase = System.nanoTime()
    def phase(name: String): Unit = {
      if (dbg) {
        val now = System.nanoTime()
        System.err.println(f"[merge $batchId] $name ${(now - tPhase) / 1e9}%.2fs")
        tPhase = now
      }
    }
    try {
      // --- one stats job: touched buckets for pruning + distinct-key count
      // (= post-dedup upsert count; dedup never changes the key set) ---
      val stats = alignedBatch
        .groupBy(bucketExpr(snap.keyCols, snap.numBuckets).as(BucketCol))
        .agg(count_distinct(struct(snap.keyCols.map(col): _*)).as("nkeys"))
        .collect()
      val touched = stats.map(_.getInt(0)).toSeq.sorted
      val upserts = stats.map(_.getLong(1)).sum
      phase("stats")

      val touchedFiles = touched.flatMap(b => snap.bucketFiles.getOrElse(b, Nil)).map(rel => s"$root/$rel")
      val existing =
        if (touchedFiles.isEmpty)
          align(spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], curSchema), evolved)
        else align(spark.read.schema(curSchema).parquet(touchedFiles: _*), evolved)

      // --- ONE-shuffle LWW MERGE: in-batch dedup and old∪new resolution are
      // one aggregation, and that aggregation rides the bucket repartition:
      // HashPartitioning(bucket, subsplit) satisfies ClusteredDistribution
      // (keys ∪ bucket ∪ subsplit) because both partition exprs are in the
      // grouping — Catalyst inserts NO second exchange, so each merge
      // shuffles the data exactly once, already routed to its output bucket.
      // `subsplit` (a key hash) decouples write parallelism from bucket
      // count: a bucket's rows can span `writeFactor` tasks/files without
      // breaking key co-location (subsplit is a function of the key). The
      // salted path (hot keys) trades this for a two-phase agg and is off
      // for high-cardinality keys.
      val cores = spark.sparkContext.defaultParallelism
      val writeFactor = math.max(1, math.ceil(2.0 * cores / math.max(1, touched.size)).toInt)
      val SubCol = "_gsubsplit"
      val unioned = existing.unionByName(alignedBatch)
        .withColumn(BucketCol, bucketExpr(snap.keyCols, snap.numBuckets))
        .withColumn(SubCol, pmod(xxhash64(snap.keyCols.map(col): _*), lit(writeFactor)).cast("int"))
        .repartition(math.max(1, touched.size * writeFactor), col(BucketCol), col(SubCol))
      val merged =
        if (salted)
          Dedup.saltedLatestByKey(unioned, snap.keyCols ++ Seq(BucketCol, SubCol), snap.orderCols)
        else Dedup.latestByKey(unioned, snap.keyCols ++ Seq(BucketCol, SubCol), snap.orderCols)

      // --- write only touched buckets under a fresh commit dir ---
      val newVersion = snap.version + 1
      val commitRel = s"data/commit-$newVersion"
      merged
        .drop(SubCol)
        .write.partitionBy(BucketCol).mode("overwrite").parquet(s"$root/$commitRel")
      phase("write")

      val written = listBucketFiles(Paths.get(root, "data", s"commit-$newVersion"), commitRel, BucketCol)
      val newBucketFiles = snap.bucketFiles.filter { case (b, _) => !touched.contains(b) } ++ written
      // both counts are parquet-footer metadata reads, no data scan
      val rowCount = snap.rowCount - countRows(touchedFiles, curSchema) +
        countRows(written.values.flatten.map(rel => s"$root/$rel").toSeq, curSchema)
      phase("counts")

      commit(TableSnapshot(
        version = newVersion,
        schemaDdl = evolved.toDDL,
        keyCols = snap.keyCols, orderCols = snap.orderCols, numBuckets = snap.numBuckets,
        bucketFiles = newBucketFiles,
        appliedBatches = snap.appliedBatches :+ batchId,
        lineage = snap.lineage + (batchId -> (upserts, touched)),
        rowCount = rowCount))
      upserts
    } finally { if (cacheBatch) alignedBatch.unpersist(false) }
  }

  /** Row counts straight from parquet footers on the driver — no Spark job
    * (the two bookkeeping counts per merge would otherwise cost two job
    * round-trips each commit). */
  private def countRows(files: Seq[String], schema: StructType): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Project `df` onto `schema`, adding missing columns as typed nulls. */
  private def align(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)

  /** Write v<N>.json, then atomically swap the VERSION pointer
    * (write-audit-publish ≙ TempFileGuard::promote, sqlite.rs:446-451). */
  private def commit(s: TableSnapshot): Unit = {
    val meta = Paths.get(root, "meta")
    Files.createDirectories(meta)
    Files.write(meta.resolve(s"v${s.version}.json"), snapshotJson(s))
    val tmp = meta.resolve(s"VERSION.tmp.${s.version}")
    Files.write(tmp, s.version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, meta.resolve("VERSION"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

object LakeTable {

  private val mapper = new ObjectMapper()

  /** Create a new empty table (version 0) or open the existing one. */
  def createOrOpen(spark: SparkSession, root: String, schema: StructType,
      keyCols: Seq[String], orderCols: Seq[String], numBuckets: Int = 16): LakeTable = {
    val t = new LakeTable(spark, root)
    val meta = Paths.get(root, "meta")
    if (!Files.exists(meta.resolve("VERSION"))) {
      Files.createDirectories(meta)
      val s0 = TableSnapshot(0L, schema.toDDL, keyCols, orderCols, numBuckets,
        Map.empty, Nil, Map.empty, 0L)
      Files.write(meta.resolve("v0.json"), snapshotJson(s0))
      val tmp = meta.resolve("VERSION.tmp.0")
      Files.write(tmp, "0".getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, meta.resolve("VERSION"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    t
  }

  def open(spark: SparkSession, root: String): LakeTable = {
    require(Files.exists(Paths.get(root, "meta", "VERSION")), s"no table at $root")
    new LakeTable(spark, root)
  }

  private[tables] def listBucketFiles(commitDir: JPath, commitRel: String,
      bucketCol: String): Map[Int, Seq[String]] = {
    if (!Files.exists(commitDir)) return Map.empty
    Files.list(commitDir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(s"$bucketCol="))
      .map { bdir =>
        val b = bdir.getFileName.toString.stripPrefix(s"$bucketCol=").toInt
        val files = Files.list(bdir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => s"$commitRel/${bdir.getFileName}/${p.getFileName}").toSeq.sorted
        b -> files
      }.toMap
  }

  private[tables] def snapshotJson(s: TableSnapshot): Array[Byte] = {
    val o = mapper.createObjectNode()
    o.put("version", s.version)
    o.put("schemaDdl", s.schemaDdl)
    val keys = o.putArray("keyCols"); s.keyCols.foreach(keys.add)
    val ords = o.putArray("orderCols"); s.orderCols.foreach(ords.add)
    o.put("numBuckets", s.numBuckets)
    val bf = o.putObject("bucketFiles")
    s.bucketFiles.toSeq.sortBy(_._1).foreach { case (b, fs) =>
      val arr = bf.putArray(b.toString); fs.foreach(arr.add)
    }
    val ab = o.putArray("appliedBatches"); s.appliedBatches.foreach(ab.add)
    val lin = o.putObject("lineage")
    s.lineage.toSeq.sortBy(_._1).foreach { case (id, (rows, buckets)) =>
      val e = lin.putObject(id)
      e.put("rows", rows)
      val tb = e.putArray("touchedBuckets"); buckets.foreach(tb.add)
    }
    o.put("rowCount", s.rowCount)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(o)
  }

  private[tables] def readSnapshot(root: JPath, version: Long): TableSnapshot = {
    val node = mapper.readTree(Files.readAllBytes(root.resolve("meta").resolve(s"v$version.json")))
    def strs(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
      n.elements().asScala.map(_.asText()).toSeq
    val bf = node.get("bucketFiles").asInstanceOf[ObjectNode]
    val bucketFiles = bf.fieldNames().asScala.map { b =>
      b.toInt -> strs(bf.get(b))
    }.toMap
    val lin = node.get("lineage").asInstanceOf[ObjectNode]
    val lineage = lin.fieldNames().asScala.map { id =>
      val e = lin.get(id)
      id -> (e.get("rows").asLong(), e.get("touchedBuckets").elements().asScala.map(_.asInt()).toSeq)
    }.toMap
    TableSnapshot(
      version = node.get("version").asLong(),
      schemaDdl = node.get("schemaDdl").asText(),
      keyCols = strs(node.get("keyCols")),
      orderCols = strs(node.get("orderCols")),
      numBuckets = node.get("numBuckets").asInt(),
      bucketFiles = bucketFiles,
      appliedBatches = strs(node.get("appliedBatches")),
      lineage = lineage,
      rowCount = node.get("rowCount").asLong())
  }
}
