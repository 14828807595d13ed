package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-ORDER (Morton) clustering support — the multi-dimensional variant of
  * [[LakeTable.cluster]] (Iceberg's `rewrite_data_files(strategy => 'sort',
  * sort_order => 'zorder(a, b)')` analog).
  *
  * A lexicographic sort slices a bucket into files whose bounds are tight
  * on the FIRST sort column only; every later column's per-file bounds span
  * the whole domain and a predicate on it prunes nothing. Interleaving the
  * bits of all dimensions into one scalar and sorting by that instead
  * yields files that cover small axis-aligned boxes of the value space, so
  * the per-file min/max bounds the commit already harvests
  * ([[FileStats]]) prune a range predicate on ANY of the dimensions.
  *
  * The z-value is a PURE column expression over Spark built-ins
  * (arithmetic, `shiftleft`/`shiftright`, bitwise and/or) — whole-stage
  * codegen'd, no UDF, no extra pass: each dimension is rank-normalized
  * into `62 / k` bits against [lo, hi] bounds that come from the
  * SNAPSHOT'S OWN per-file statistics (driver-side constants folded into
  * the plan), then the bits interleave into one non-negative LONG whose
  * ordering is the Morton curve. Normalization is approximate by design
  * (double arithmetic; clustering quality, not correctness, depends on it:
  * the rewrite's logical state is the same LWW resolve a compaction runs,
  * and the harvested bounds — not the z-value — are what the reader
  * prunes with).
  */
object ZOrder {

  /** Types a z-order dimension may have: totally ordered scalars with a
    * numeric embedding. Strings are excluded (no bounded-width numeric
    * rank); booleans carry 1 bit of information and belong in a plain
    * sort prefix instead. */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | TimestampType => true
    case _ => false
  }

  /** Bits per dimension: the interleaved value must keep the Long's sign
    * bit zero so its natural ordering is the curve order. */
  def bitsPerCol(k: Int): Int = 62 / k

  /** The numeric embedding of one dimension (timestamps as micros — the
    * same unit their [[FileStats]] bounds are stored in). */
  private def numeric(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c).cast(DoubleType)
    case _ => c.cast(DoubleType)
  }

  /** Rank-normalize one dimension into [0, 2^bits): nulls and NaNs rank 0
    * (they cluster together at the curve origin), values are clamped into
    * the bound box BEFORE the long cast so ANSI arithmetic can never
    * overflow, and a degenerate lo == hi dimension contributes a constant
    * (zero information, zero bits spent wrongly). */
  private def rank(c: Column, dt: DataType, lo: Double, hi: Double, bits: Int): Column = {
    val maxRank = (1L << bits) - 1
    if (!(hi > lo)) return lit(0L)
    val scaled = (numeric(c, dt) - lit(lo)) / lit(hi - lo) * lit(maxRank.toDouble)
    val clamped = least(greatest(nanvl(scaled, lit(0.0)), lit(0.0)), lit(maxRank.toDouble))
    coalesce(round(clamped).cast(LongType), lit(0L))
  }

  /** balanced OR so the expression tree stays log-deep for codegen */
  private def orAll(xs: Seq[Column]): Column =
    if (xs.size == 1) xs.head
    else {
      val (a, b) = xs.splitAt(xs.size / 2)
      orAll(a).bitwiseOR(orAll(b))
    }

  /** The interleaved z-value of `dims` — `(column, dataType, lo, hi)` per
    * dimension, 2 to 8 of them. Bit j of dimension i lands at position
    * `j * k + i`, so the highest interleaved bits are every dimension's
    * top rank bits: sorting by the result walks the value space in Morton
    * order. */
  def zvalue(dims: Seq[(Column, DataType, Double, Double)]): Column = {
    val k = dims.size
    require(k >= 2, "z-order needs at least two dimensions (one is a plain sort)")
    require(k <= 8, s"z-order supports at most 8 dimensions, got $k")
    val bits = bitsPerCol(k)
    val ranks = dims.map { case (c, dt, lo, hi) => rank(c, dt, lo, hi, bits) }
    val terms = for {
      j <- 0 until bits
      i <- 0 until k
    } yield shiftleft(shiftright(ranks(i), j).bitwiseAND(lit(1L)), j * k + i)
    orAll(terms)
  }

  /** Reference (row-at-a-time) twin of [[zvalue]] for property tests. */
  private[tables] def zvalueRef(values: Seq[Option[Double]],
      bounds: Seq[(Double, Double)]): Long = {
    val k = values.size
    val bits = bitsPerCol(k)
    val maxRank = (1L << bits) - 1
    val ranks = values.zip(bounds).map { case (v, (lo, hi)) =>
      if (!(hi > lo)) 0L
      else v match {
        case None => 0L
        case Some(d) =>
          val s = (d - lo) / (hi - lo) * maxRank.toDouble
          val c = math.min(math.max(if (s.isNaN) 0.0 else s, 0.0), maxRank.toDouble)
          // Spark's Round on DoubleType: BigDecimal.valueOf + HALF_UP
          java.math.BigDecimal.valueOf(c)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue.toLong
      }
    }
    var z = 0L
    var j = 0
    while (j < bits) {
      var i = 0
      while (i < k) {
        z |= ((ranks(i) >> j) & 1L) << (j * k + i)
        i += 1
      }
      j += 1
    }
    z
  }

  /** Fold the table-level [lo, hi] of one dimension from the per-file
    * bounds the snapshot already carries — zero I/O. A file whose column
    * is provably all-null contributes nothing (its rows rank 0); a file
    * with NO usable bounds (NaN-polluted floats, stats-less legacy
    * writers) makes the z-order REFUSE rather than guess — a wrong box
    * doesn't corrupt anything, but it silently wastes the whole rewrite.
    * Returns (0, 0) when no file contributes (an all-null dimension:
    * constant rank). */
  private[tables] def dimBounds(files: Seq[String], stats: Map[String, FileStats],
      colName: String, dt: DataType): (Double, Double) = {
    def parse(s: String): Double = dt match {
      case FloatType | DoubleType => s.toDouble
      case _ => s.toLong.toDouble // integrals + timestamp micros
    }
    var lo = Double.MaxValue
    var hi = Double.MinValue
    var seen = false
    files.foreach { rel =>
      val fs = stats.getOrElse(rel, throw new IllegalArgumentException(
        s"z-order needs per-file bounds on '$colName' but '$rel' carries no " +
          "statistics — compact() or cluster() the table once to harvest them"))
      val allNull = fs.rows > 0 && fs.cols.get(colName).exists(_.nullCount.contains(fs.rows))
      if (fs.rows > 0 && !allNull) {
        val cs = fs.cols.getOrElse(colName, ColStats(None, None, None))
        (cs.min, cs.max) match {
          case (Some(mn), Some(mx)) =>
            lo = math.min(lo, parse(mn)); hi = math.max(hi, parse(mx)); seen = true
          case _ => throw new IllegalArgumentException(
            s"z-order needs min/max bounds for '$colName' on every live file; " +
              s"'$rel' has none (NaN values or a stats-less writer) — " +
              "compact() first, or drop the column from the z-order")
        }
      }
    }
    if (seen) (lo, hi) else (0.0, 0.0)
  }
}
