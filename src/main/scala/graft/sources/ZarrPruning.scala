package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.unsafe.types.UTF8String

import graft.zarr.{StoreChunkStats, ZarrType}

/**
 * Chunk-range pruning from pushed filters + the `_graft_stats.json` sidecar
 * (see [[graft.zarr.ZarrStats]] for the safety model — stats are advisory,
 * every filter is re-applied by Spark above the scan).
 *
 * The evaluation is three-valued by construction: `skippable` returns true
 * only when the combined stats of a row range PROVE the predicate matches no
 * row in it. Anything unprovable (unsupported filter shape, column without
 * stats, type we don't compare) conservatively keeps the range.
 */
object ZarrPruning {

  /** Combined stats of a contiguous row range: min/max over its chunks'
   *  non-null values (None = every covered value is null), total nulls and
   *  physical rows of the COVERED CHUNKS (a superset of the range when the
   *  range isn't chunk-aligned — still sound for the checks below). */
  final case class RangeStats(
      dtype: ZarrType, min: Option[String], max: Option[String], nulls: Long, rows: Long)

  /** Combine chunk stats over row range [start, end) of one column. */
  def rangeStats(s: StoreChunkStats, col: String, dtype: ZarrType,
      start: Long, end: Long): Option[RangeStats] =
    s.columns.get(col).map { c =>
      val lo = (start / s.chunkRows).toInt
      val hi = math.min(((end - 1) / s.chunkRows).toInt, s.nChunks - 1)
      var min: String = null
      var max: String = null
      var nulls = 0L
      var rows = 0L
      var i = lo
      while (i <= hi) {
        if (c.min(i) != null && (min == null || lt(dtype, c.min(i), min))) min = c.min(i)
        if (c.max(i) != null && (max == null || lt(dtype, max, c.max(i)))) max = c.max(i)
        nulls += c.nulls(i)
        rows += s.rowsInChunk(i)
        i += 1
      }
      RangeStats(dtype, Option(min), Option(max), nulls, rows)
    }

  /** dtype-aware a < b over the sidecar's string encoding. */
  private def lt(dt: ZarrType, a: String, b: String): Boolean = dt match {
    case ZarrType.ZFloat32 | ZarrType.ZFloat64 | ZarrType.ZFloat16 =>
      // NaN-aware (NaN largest), mirroring the write side: plain '<' makes
      // a "NaN" bound compare "equal" to every literal (both directions
      // false), which cmp() would report as 0 — and GreaterThan would then
      // skip a NaN-containing range even though NaN > v under Spark's
      // ordering
      java.lang.Double.compare(a.toDouble, b.toDouble) < 0
    case ZarrType.ZString =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0
    case ZarrType.ZBool =>
      // a garbage bound ("tru") must THROW like the numeric parses below —
      // plain equality would make both lt() directions false, cmp() report
      // "equal", and a predicate be judged skippable on corrupt stats
      // (the caller catches and keeps the range)
      def parse(x: String): Boolean = x match {
        case "true" => true
        case "false" => false
        case other => throw new NumberFormatException(s"bool bound '$other'")
      }
      !parse(a) && parse(b)
    case _ => a.toLong < b.toLong // ZInt*/ZUInt8-32/ZDatetime64 (micros)
  }

  /** Filter literal → the sidecar's string encoding for this dtype, or None
   *  if the literal's type can't be compared against the stats soundly. */
  private def encodeValue(dt: ZarrType, v: Any): Option[String] = (dt, v) match {
    case (_, null) => None
    case (ZarrType.ZFloat32 | ZarrType.ZFloat64 | ZarrType.ZFloat16, n: Number) =>
      // -0.0 normalized to 0.0, matching the write side's bound encoding
      val d = n.doubleValue; Some((if (d == 0.0) 0.0 else d).toString)
    case (ZarrType.ZString, s: String) => Some(s)
    case (ZarrType.ZBool, b: Boolean) => Some(b.toString)
    case (ZarrType.ZDatetime64(_, _), t: java.time.LocalDateTime) =>
      // sidecar stores the internal micros-since-epoch longs
      Some((t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000).toString)
    case (ZarrType.ZInt8 | ZarrType.ZInt16 | ZarrType.ZInt32 | ZarrType.ZInt64 |
          ZarrType.ZUInt8 | ZarrType.ZUInt16 | ZarrType.ZUInt32,
          n: java.lang.Byte) => Some(n.longValue.toString)
    case (ZarrType.ZInt8 | ZarrType.ZInt16 | ZarrType.ZInt32 | ZarrType.ZInt64 |
          ZarrType.ZUInt8 | ZarrType.ZUInt16 | ZarrType.ZUInt32,
          n: java.lang.Short) => Some(n.longValue.toString)
    case (ZarrType.ZInt8 | ZarrType.ZInt16 | ZarrType.ZInt32 | ZarrType.ZInt64 |
          ZarrType.ZUInt8 | ZarrType.ZUInt16 | ZarrType.ZUInt32,
          n: java.lang.Integer) => Some(n.longValue.toString)
    case (ZarrType.ZInt8 | ZarrType.ZInt16 | ZarrType.ZInt32 | ZarrType.ZInt64 |
          ZarrType.ZUInt8 | ZarrType.ZUInt16 | ZarrType.ZUInt32,
          n: java.lang.Long) => Some(n.toString)
    case _ => None // ZUInt64 (unsigned overflow), ZRaw, type mismatches
  }

  /** True iff `f` only uses shapes/columns/types this pruner understands —
   *  i.e. it can, in principle, skip chunks (reported as pushed in explain). */
  def prunable(f: Filter, dtypeOf: String => Option[ZarrType]): Boolean = {
    def ok(col: String, v: Any): Boolean =
      dtypeOf(col).exists(dt => encodeValue(dt, v).isDefined)
    f match {
      case EqualTo(c, v) => ok(c, v)
      case GreaterThan(c, v) => ok(c, v)
      case GreaterThanOrEqual(c, v) => ok(c, v)
      case LessThan(c, v) => ok(c, v)
      case LessThanOrEqual(c, v) => ok(c, v)
      case In(c, vs) => vs.nonEmpty && vs.forall(ok(c, _))
      case IsNull(c) => dtypeOf(c).isDefined
      case IsNotNull(c) => dtypeOf(c).isDefined
      case And(l, r) => prunable(l, dtypeOf) || prunable(r, dtypeOf)
      case Or(l, r) => prunable(l, dtypeOf) && prunable(r, dtypeOf)
      case _ => false
    }
  }

  /**
   * True iff the range's stats prove `f` holds for NO row in it.
   * `statsOf` resolves a column to its combined range stats (None = no stats).
   */
  def skippable(f: Filter, statsOf: String => Option[RangeStats]): Boolean = {
    // sign of (bound - v), or None when incomparable / no non-null values
    def cmpMin(c: String, v: Any): Option[Int] = cmp(c, v, _.min)
    def cmpMax(c: String, v: Any): Option[Int] = cmp(c, v, _.max)
    def cmp(c: String, v: Any, bound: RangeStats => Option[String]): Option[Int] =
      statsOf(c).flatMap { s =>
        for (b <- bound(s); ev <- encodeValue(s.dtype, v)) yield
          if (lt(s.dtype, b, ev)) -1 else if (lt(s.dtype, ev, b)) 1 else 0
      }
    // comparison predicates are false on null; a range whose covered values
    // are ALL null can never satisfy one
    def allNull(c: String): Boolean =
      statsOf(c).exists(s => s.min.isEmpty && s.rows > 0)
    f match {
      case EqualTo(c, v) =>
        allNull(c) || cmpMax(c, v).exists(_ < 0) || cmpMin(c, v).exists(_ > 0)
      case GreaterThan(c, v) => allNull(c) || cmpMax(c, v).exists(_ <= 0)
      case GreaterThanOrEqual(c, v) => allNull(c) || cmpMax(c, v).exists(_ < 0)
      case LessThan(c, v) => allNull(c) || cmpMin(c, v).exists(_ >= 0)
      case LessThanOrEqual(c, v) => allNull(c) || cmpMin(c, v).exists(_ > 0)
      case In(c, vs) =>
        allNull(c) || (vs.nonEmpty && vs.forall(v =>
          cmpMax(c, v).exists(_ < 0) || cmpMin(c, v).exists(_ > 0)))
      case IsNull(c) => statsOf(c).exists(_.nulls == 0)
      case IsNotNull(c) => statsOf(c).exists(s => s.rows > 0 && s.nulls == s.rows)
      case And(l, r) => skippable(l, statsOf) || skippable(r, statsOf)
      case Or(l, r) => skippable(l, statsOf) && skippable(r, statsOf)
      case _ => false
    }
  }
}
