package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.parquet.column.statistics.{BinaryStatistics, BooleanStatistics, DoubleStatistics, FloatStatistics, IntStatistics, LongStatistics, Statistics}
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

/** Per-column min/max/null-count bounds of ONE data file (Iceberg's
  * manifest-entry `lower_bounds`/`upper_bounds`/`null_value_counts` analog,
  * iceberg-format §Manifests). min/max are held independently — a bound
  * that can't be represented (non-ASCII string, NaN) is dropped on its own
  * while the other keeps pruning.
  *
  * Values are stored stringly in the snapshot JSON and re-typed through the
  * table schema at prune time; only types whose ordering round-trips
  * exactly are harvested (integrals, float/double, boolean, ASCII strings —
  * see [[FileStats.fromFooter]]). A column absent from the map NEVER
  * prunes: conservatism is the correctness story, bounds only ever say
  * "provably no match here". */
final case class ColStats(
    min: Option[String],
    max: Option[String],
    nullCount: Option[Long])

/** Column bounds + row count of one committed data file, persisted in the
  * table snapshot so query PLANNING can skip files without touching
  * storage (the manifest-level half of what parquet row-group stats do at
  * task time — at a 100 TB table the planning-time half is what turns
  * "schedule a task per file and let parquet skip row groups" into "never
  * schedule the task at all"). */
final case class FileStats(rows: Long, cols: Map[String, ColStats])

object FileStats {

  /** Iceberg truncates string bounds to 16 chars (write.metadata.metrics
    * default `truncate(16)`); same bound here keeps snapshot JSON growth a
    * small constant over the file list itself. */
  val TruncateLen = 16

  /** Bound the per-file stats map: snapshots carry O(files × statsCols)
    * extra bytes, so the column set must not scale with schema width. */
  val MaxStatsCols = 12

  private[tables] def supported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | TimestampType => true
    case _ => false
  }

  /** The columns worth bounding, preference-ordered: order columns first
    * (the CDC "changed since slot X" prune — a cold bucket's files bound
    * max(slot) at the last time the bucket was rewritten), then keys, then
    * schema order, capped at [[MaxStatsCols]]. */
  def statsColumns(schema: StructType, keyCols: Seq[String], orderCols: Seq[String]): Seq[String] =
    (orderCols ++ keyCols ++ schema.fieldNames).distinct
      .filter(c => schema.fields.exists(f => f.name == c && supported(f.dataType)))
      .take(MaxStatsCols)

  /** Lower-bound truncation: a prefix is ≤ the full value in every
    * byte/char-wise ordering. Kept only when ASCII — for ASCII bounds the
    * JVM's char-wise `String.compareTo` and the UTF-8 unsigned-byte order
    * parquet/Spark sort binary stats by agree for ANY other operand, so a
    * stored ASCII bound can never mis-prune (truncation of a non-ASCII
    * value may land on an ASCII prefix, which is still a valid lower bound
    * in both orderings). */
  private[tables] def truncLower(s: String): Option[String] = {
    val t = s.take(TruncateLen)
    if (t.forall(_ < 128)) Some(t) else None
  }

  /** Upper-bound truncation (Iceberg's `truncate + increment`): take the
    * prefix and increment its last possible char so the result stays ≥ the
    * full value. ASCII-only (see [[truncLower]]); increments keep chars
    * < 128 so the invariant holds. None = no representable upper bound. */
  private[tables] def truncUpper(s: String): Option[String] = {
    if (!s.take(TruncateLen).forall(_ < 128)) return None
    if (s.length <= TruncateLen) return Some(s)
    increment(s.take(TruncateLen)) // one shared increment loop (see below)
  }

  /** Harvest bounds for `statsCols` from a parquet footer — the SAME footer
    * object the row-count pass already paid the read for; stats are free.
    * Per column, every block must contribute usable stats (or be provably
    * all-null) or the column is dropped for the file. */
  def fromFooter(footer: ParquetMetadata, schema: StructType, statsCols: Seq[String]): FileStats = {
    val blocks = footer.getBlocks.asScala.toSeq
    val rows = blocks.map(_.getRowCount).sum
    val cols = statsCols.flatMap { name =>
      val dt = schema.fields.find(_.name == name).map(_.dataType).getOrElse(NullType)
      harvestColumn(blocks, name, dt).map(name -> _)
    }.toMap
    FileStats(rows, cols)
  }

  /** One side of a bound under folding: `Unset` (no block seen yet) is NOT
    * `Dropped` (some block's bound was unrepresentable) — conflating them
    * would let a later block RESURRECT a dropped side with a bound that
    * doesn't cover the earlier block's values, an unsound prune. */
  private[tables] sealed trait Bound
  private[tables] case object Unset extends Bound
  private[tables] case object Dropped extends Bound
  private[tables] final case class Set_(v: String) extends Bound

  private[tables] def foldBound(acc: Bound, next: Option[String], keepMin: Boolean,
      dt: DataType): Bound =
    (acc, next) match {
      case (Dropped, _) | (_, None) => Dropped // dropped stays dropped, forever
      case (Unset, Some(n)) => Set_(n)
      case (Set_(a), Some(n)) =>
        cmpTyped(dt, a, n) match {
          case Some(c) => if ((c <= 0) == keepMin) Set_(a) else Set_(n)
          case None => Dropped
        }
    }

  private def harvestColumn(
      blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData],
      name: String, dt: DataType): Option[ColStats] = {
    var min: Bound = Unset
    var max: Bound = Unset
    var nulls: Option[Long] = Some(0L)
    blocks.foreach { block =>
      if (block.getRowCount > 0) {
        val chunk = block.getColumns.asScala.find(_.getPath.toDotString == name)
          .getOrElse(return None) // column not in this file's footer
        val st = chunk.getStatistics
        if (st == null || st.isEmpty) return None // writer dropped stats
        nulls =
          if (st.isNumNullsSet) nulls.map(_ + st.getNumNulls) else None
        if (st.hasNonNullValue) {
          extract(st, dt, chunk.getPrimitiveType.getLogicalTypeAnnotation) match {
            case Some((lo, hi)) =>
              min = foldBound(min, lo, keepMin = true, dt)
              max = foldBound(max, hi, keepMin = false, dt)
            case None => return None // unrepresentable bounds in this block
          }
        } else if (!(st.isNumNullsSet && st.getNumNulls == block.getRowCount)) {
          // not provably all-null and no min/max: stats are unusable
          return None
        }
      }
    }
    def side(b: Bound): Option[String] = b match {
      case Set_(v) => Some(v)
      case _ => None
    }
    if (side(min).isEmpty && side(max).isEmpty && nulls.isEmpty) None
    else Some(ColStats(side(min), side(max), nulls))
  }

  /** (lower, upper) bound candidates from one block's statistics; for
    * strings the sides truncate independently (None = that side dropped). */
  private def extract(st: Statistics[_], dt: DataType,
      ann: org.apache.parquet.schema.LogicalTypeAnnotation)
      : Option[(Option[String], Option[String])] =
    (st, dt) match {
      case (s: LongStatistics, TimestampType) =>
        // only micros-from-epoch UTC-adjusted int64 (what Spark writes
        // under outputTimestampType=TIMESTAMP_MICROS); INT96 carries no
        // usable stats and any other unit/NTZ annotation is not this type
        ann match {
          case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
              if t.isAdjustedToUTC &&
                t.getUnit == org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS =>
            Some((Some(s.getMin.toString), Some(s.getMax.toString)))
          case _ => None
        }
      case (s: IntStatistics, ByteType | ShortType | IntegerType) =>
        Some((Some(s.getMin.toString), Some(s.getMax.toString)))
      case (s: LongStatistics, LongType) =>
        Some((Some(s.getMin.toString), Some(s.getMax.toString)))
      case (s: FloatStatistics, FloatType) =>
        if (s.getMin.isNaN || s.getMax.isNaN) None
        else Some((Some(s.getMin.toDouble.toString), Some(s.getMax.toDouble.toString)))
      case (s: DoubleStatistics, DoubleType) =>
        if (s.getMin.isNaN || s.getMax.isNaN) None
        else Some((Some(s.getMin.toString), Some(s.getMax.toString)))
      case (s: BooleanStatistics, BooleanType) =>
        Some((Some(s.getMin.toString), Some(s.getMax.toString)))
      case (s: BinaryStatistics, StringType) =>
        val lo = new String(s.genericGetMin.getBytes, java.nio.charset.StandardCharsets.UTF_8)
        val hi = new String(s.genericGetMax.getBytes, java.nio.charset.StandardCharsets.UTF_8)
        Some((truncLower(lo), truncUpper(hi)))
      case _ => None // physical/logical type mismatch: don't guess
    }

  /** Typed compare of a stored bound against another stored bound or a
    * pushed-filter value. None = can't decide (never prunes). */
  private def cmpTyped(dt: DataType, stored: String, other: Any): Option[Int] =
    try dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        other match {
          case n: Number => Some(java.lang.Long.compare(stored.toLong, n.longValue))
          case s: String => Some(java.lang.Long.compare(stored.toLong, s.toLong))
          case _ => None
        }
      case FloatType | DoubleType =>
        val v = other match {
          case n: Number => n.doubleValue
          case s: String => s.toDouble
          case _ => return None
        }
        if (v.isNaN) None else Some(java.lang.Double.compare(stored.toDouble, v))
      case BooleanType =>
        other match {
          case b: java.lang.Boolean => Some(java.lang.Boolean.compare(stored.toBoolean, b))
          case s: String => Some(java.lang.Boolean.compare(stored.toBoolean, s.toBoolean))
          case _ => None
        }
      case StringType =>
        other match {
          case s: CharSequence => Some(stored.compareTo(s.toString))
          case _ => None
        }
      case TimestampType =>
        // bounds are stored as micros-from-epoch; convert the filter value
        // with Spark's OWN conversions (the writer's inverse) so timezone
        // semantics can never diverge
        import org.apache.spark.sql.catalyst.util.DateTimeUtils
        val micros = other match {
          case t: java.sql.Timestamp => DateTimeUtils.fromJavaTimestamp(t)
          case i: java.time.Instant => DateTimeUtils.instantToMicros(i)
          case s: String => s.toLong // stored-vs-stored (foldBound)
          case _ => return None
        }
        Some(java.lang.Long.compare(stored.toLong, micros))
      case _ => None
    } catch { case _: NumberFormatException => None }

  /** True unless the file PROVABLY contains no row matching every pushed
    * filter. The contract mirrors the scan's existing row-group pruning:
    * pushed filters are residual (re-evaluated above the scan), so a kept
    * file that matches nothing only costs I/O, while pruning is only taken
    * on a proof. */
  def mayMatch(filters: Array[sources.Filter], fs: FileStats, schema: StructType): Boolean =
    filters.forall(one(_, fs, schema))

  private def one(f: sources.Filter, fs: FileStats, schema: StructType): Boolean = {
    def dtOf(a: String): Option[DataType] = schema.fields.find(_.name == a).map(_.dataType)
    def stat(a: String): Option[ColStats] = fs.cols.get(a)
    /** all rows null in this column (value predicates can't match) */
    def allNull(a: String): Boolean =
      fs.rows > 0 && stat(a).exists(_.nullCount.contains(fs.rows))
    /** Some(cmp of bound vs v) when decidable */
    def cmpMin(a: String, v: Any): Option[Int] =
      for { dt <- dtOf(a); cs <- stat(a); m <- cs.min; c <- cmpTyped(dt, m, v) } yield c
    def cmpMax(a: String, v: Any): Option[Int] =
      for { dt <- dtOf(a); cs <- stat(a); m <- cs.max; c <- cmpTyped(dt, m, v) } yield c
    /** v could fall in [min, max] (each side independently optional) */
    def inRange(a: String, v: Any): Boolean =
      cmpMin(a, v).forall(_ <= 0) && cmpMax(a, v).forall(_ >= 0)
    /** value predicate shared guard: null-rejecting filters on an all-null
      * column match nothing */
    def valuePred(a: String)(body: => Boolean): Boolean = !allNull(a) && body

    f match {
      case sources.AlwaysFalse() => false
      case sources.EqualTo(a, v) =>
        if (v == null) true else valuePred(a)(inRange(a, v))
      case sources.EqualNullSafe(a, v) =>
        if (v == null) stat(a).forall(!_.nullCount.contains(0L))
        else valuePred(a)(inRange(a, v))
      case sources.GreaterThan(a, v) => valuePred(a)(cmpMax(a, v).forall(_ > 0))
      case sources.GreaterThanOrEqual(a, v) => valuePred(a)(cmpMax(a, v).forall(_ >= 0))
      case sources.LessThan(a, v) => valuePred(a)(cmpMin(a, v).forall(_ < 0))
      case sources.LessThanOrEqual(a, v) => valuePred(a)(cmpMin(a, v).forall(_ <= 0))
      case sources.In(a, vs) =>
        val nonNull = vs.filter(_ != null)
        if (nonNull.isEmpty) true // IN () / IN (null): leave to the residual
        else valuePred(a)(nonNull.exists(inRange(a, _)))
      case sources.IsNull(a) => stat(a).forall(!_.nullCount.contains(0L))
      case sources.IsNotNull(a) => !allNull(a)
      case sources.StringStartsWith(a, p) =>
        // rows with prefix p live in [p, succ(p)): may match iff max ≥ p
        // and (when succ exists) min < succ(p). The stored bounds are
        // ASCII, which is what keeps compareTo vs UTF-8 byte order aligned
        // regardless of succ's own charset.
        valuePred(a)(cmpMax(a, p).forall(_ >= 0) &&
          increment(p).forall(s => cmpMin(a, s).forall(_ < 0)))
      case sources.And(l, r) => one(l, fs, schema) && one(r, fs, schema)
      case sources.Or(l, r) => one(l, fs, schema) || one(r, fs, schema)
      case _ => true // Not(...), StringContains, ... : no proof, keep
    }
  }

  /** a string strictly greater (char-wise) than every string with prefix
    * `p`: increment the last char still below 127 and truncate after it.
    * None when no char can be incremented. */
  private def increment(p: String): Option[String] = {
    val a = p.toCharArray
    var i = a.length - 1
    while (i >= 0) {
      if (a(i) < 127) { a(i) = (a(i) + 1).toChar; return Some(new String(a, 0, i + 1)) }
      i -= 1
    }
    None
  }
}
