package graft.catalog

import java.nio.charset.StandardCharsets
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.LogicalTypeAnnotation._
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

import graft.txn.ColStat

/**
 * File-level data skipping (SURVEY §2 pushdown + reference per-delta column
 * stats, compute/stats/models/delta_stats.py, taken to per-FILE granularity
 * — the Delta Lake VLDB'20 §4.2 pattern):
 *
 *  - [[StatCodec]] — one canonical, ORDER-PRESERVING string form per column
 *    value, shared by the write side (parquet footer values) and the read
 *    side (predicate literals), so a skip decision is a pure string/decimal
 *    comparison with no session-timezone or locale dependence.
 *  - [[FooterStats]] — harvests per-column min/max/nullCount from a parquet
 *    footer. The commit path already opens every footer for recordCount, so
 *    stats collection adds ZERO I/O — no data pages are read.
 *  - [[StatsSkip]] — evaluates pushed `sources.Filter`s against a manifest
 *    entry's stats: `keep == false` proves NO row in the file can satisfy
 *    the predicate, so the file is dropped at PLANNING time (never listed,
 *    opened, or scheduled — at 100 TB this is the difference between a
 *    selective query touching GBs vs the full corpus). Every uncertain case
 *    degrades to `keep == true`; correctness never depends on stats.
 *
 * Merge-on-read rule (enforced by callers via [[StatsSkip.safeFilters]]):
 * with unresolved upsert/delete deltas, only filters whose references are
 * all MERGE KEYS may prune — a file pruned by a key-range predicate only
 * loses rows whose keys are excluded from the result everywhere, while a
 * value-column predicate could prune the newest version of a key and
 * resurrect a stale base row.
 */
object StatCodec {

  /** Comparison kind for a canonical stat string. */
  sealed trait Kind
  /** Decimal comparison (all numeric types). */
  case object Num extends Kind
  /** Unsigned UTF-8 byte comparison (strings, and the fixed-width ISO forms
    * of dates/timestamps/booleans, which are ASCII and order-preserving). */
  case object Str extends Kind

  /** Stat strings longer than this are dropped (manifest-size valve; the
    * parquet writer itself omits >4K stats). */
  val MaxLen = 256

  private val TsFmt = DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")

  def kindOf(dt: DataType): Option[Kind] = dt match {
    case _: NumericType => Some(Num)
    case StringType | DateType | TimestampType | TimestampNTZType | BooleanType => Some(Str)
    case _ => None
  }

  def formatDate(epochDay: Long): Option[String] = {
    if (epochDay < LocalDate.of(0, 1, 1).toEpochDay ||
        epochDay > LocalDate.of(9999, 12, 31).toEpochDay) return None
    Some(LocalDate.ofEpochDay(epochDay).toString) // ISO, zero-padded: sorts
  }

  def formatMicros(micros: Long): Option[String] = {
    val sec = Math.floorDiv(micros, 1000000L)
    val nano = Math.floorMod(micros, 1000000L) * 1000L
    val ldt = try LocalDateTime.ofEpochSecond(sec, nano.toInt, ZoneOffset.UTC)
    catch { case _: Exception => return None }
    if (ldt.getYear < 0 || ldt.getYear > 9999) None else Some(TsFmt.format(ldt))
  }

  /** Canonical timestamp string → epoch micros (inverse of formatMicros). */
  def parseCanonicalMicros(s: String): Option[Long] = try {
    val ldt = LocalDateTime.parse(s, TsFmt)
    Some(ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
  } catch { case _: Exception => None }

  private def formatInstant(i: Instant): Option[String] =
    formatMicros(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
      i.getNano / 1000L))

  /** Canonical form of an EXTERNAL (JVM) predicate value for a column of
    * Spark type `dt`. None = not canonicalizable → caller must keep. */
  def render(dt: DataType, v: Any): Option[String] = {
    if (v == null) return None
    val r: Option[String] = (dt, v) match {
      case (_: NumericType, s: String) =>
        try { new java.math.BigDecimal(s); Some(s) } catch { case _: Exception => None }
      case (_: NumericType, d: java.lang.Double) =>
        if (d.isNaN || d.isInfinite) None else Some(d.toString)
      case (_: NumericType, f: java.lang.Float) =>
        // widen exactly as Spark does in mixed float/double comparisons
        // (0.1f -> 0.100000001490…) or decimal compare diverges from the
        // engine's verdict
        if (f.isNaN || f.isInfinite) None else Some(f.doubleValue.toString)
      case (_: NumericType, d: java.math.BigDecimal) => Some(d.toPlainString)
      case (_: NumericType, d: BigDecimal) => Some(d.underlying.toPlainString)
      case (_: NumericType, n: java.lang.Number) => Some(n.toString)
      case (StringType, s: String) => Some(s)
      case (BooleanType, b: java.lang.Boolean) => Some(b.toString)
      case (DateType, d: java.sql.Date) => formatDate(d.toLocalDate.toEpochDay)
      case (DateType, d: LocalDate) => formatDate(d.toEpochDay)
      case (DateType, s: String) =>
        try formatDate(LocalDate.parse(s).toEpochDay) catch { case _: Exception => None }
      case (TimestampType, t: java.sql.Timestamp) => formatInstant(t.toInstant)
      case (TimestampType, i: Instant) => formatInstant(i)
      case (TimestampNTZType, l: LocalDateTime) =>
        if (l.getYear < 0 || l.getYear > 9999) None else Some(TsFmt.format(l))
      case (TimestampNTZType, s: String) =>
        // ISO-ish string literal against a naive timestamp column
        // (pre-analysis rowFilter trees): parse the common spellings.
        parseTsLiteral(s)
      case (TimestampType, s: String) =>
        // Spark casts string->TIMESTAMP in the SESSION timezone; the
        // canonical form is UTC — convert or skips shift by the UTC offset.
        parseTsLiteral(s).flatMap { canonical =>
          parseCanonicalMicros(canonical).flatMap { naiveMicros =>
            val zone = java.time.ZoneId.of(
              org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
            val ldt = LocalDateTime.ofEpochSecond(
              Math.floorDiv(naiveMicros, 1000000L),
              (Math.floorMod(naiveMicros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
            val inst = ldt.atZone(zone).toInstant
            formatMicros(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
          }
        }
      case _ => None
    }
    r.filter(_.length <= MaxLen)
  }

  private def parseTsLiteral(s: String): Option[String] = {
    val t = s.trim.replace('T', ' ')
    val full = if (t.length == 10) t + " 00:00:00" else t
    try {
      val base = LocalDateTime.parse(full.replace(' ', 'T'))
      if (base.getYear < 0 || base.getYear > 9999) None else Some(TsFmt.format(base))
    } catch { case _: Exception => None }
  }

  /** Canonical stat string → Spark INTERNAL value (for manifest-served
    * aggregate results). None = not exactly representable → caller must
    * fall back to a real scan. */
  def toInternal(dt: DataType, s: String): Option[Any] = {
    if (s == null) return None
    try dt match {
      case ByteType => Some(new java.math.BigDecimal(s).byteValueExact)
      case ShortType => Some(new java.math.BigDecimal(s).shortValueExact)
      case IntegerType => Some(new java.math.BigDecimal(s).intValueExact)
      case LongType => Some(new java.math.BigDecimal(s).longValueExact)
      case FloatType => Some(s.toDouble.toFloat)
      case DoubleType => Some(s.toDouble)
      case d: DecimalType =>
        val bd = org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(s))
        if (bd.changePrecision(d.precision, d.scale)) Some(bd) else None
      case StringType => Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      case BooleanType => Some(s.toBoolean)
      case DateType => Some(LocalDate.parse(s).toEpochDay.toInt)
      case TimestampType | TimestampNTZType => parseCanonicalMicros(s)
      case _ => None
    } catch { case _: Exception => None }
  }

  /** Order-preserving comparison of two canonical stat strings. */
  def compare(kind: Kind, a: String, b: String): Int = kind match {
    case Num => new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case Str => compareUtf8(a, b)
  }

  /** Unsigned UTF-8 byte order — matches both Spark's UTF8String binary
    * comparison and parquet's UNSIGNED string stats order. */
  def compareUtf8(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Smallest string strictly greater than every string with this prefix
    * (for StartsWith pruning); None if no such bound exists (all 0xFF). */
  def prefixSuccessor(prefix: String): Option[String] = {
    val b = prefix.getBytes(StandardCharsets.UTF_8)
    var i = b.length - 1
    while (i >= 0 && (b(i) & 0xff) == 0xff) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(b, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(new String(out, StandardCharsets.UTF_8))
    }
  }
}

object FooterStats {
  import StatCodec.{Kind, Num, Str}

  /** Stats are collected for at most this many leading top-level columns —
    * a manifest-size valve for very wide tables. */
  val MaxStatColumns = 40

  /** Row count + per-column stats from one parquet footer. Metadata-only:
    * no data pages are read. Columns whose stats are absent, truncated,
    * NaN-polluted, or of an unsupported type are simply omitted. */
  def read(pathStr: String, conf: Configuration): (Long, Map[String, ColStat]) = {
    val in = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(pathStr), conf)
    val r = ParquetFileReader.open(in)
    try fromReader(r) finally r.close()
  }

  /** `fromReader` plus the file's total UNCOMPRESSED byte size (sum of
    * row-group totals) — the content-type parameter resource estimation
    * caches in the manifest (reference manifest.py `in_memory_size_bytes`).
    * Same footer, zero extra I/O. */
  def readFull(pathStr: String, conf: Configuration): (Long, Long, Map[String, ColStat]) = {
    val in = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(pathStr), conf)
    val r = ParquetFileReader.open(in)
    try fromReaderFull(r) finally r.close()
  }

  def fromReaderFull(r: ParquetFileReader): (Long, Long, Map[String, ColStat]) = {
    val (rows, stats) = fromReader(r)
    val uncompressed = r.getFooter.getBlocks.asScala.map(_.getTotalByteSize).sum
    (rows, uncompressed, stats)
  }

  /** Same extraction over an already-open reader (shared footer passes). */
  def fromReader(r: ParquetFileReader): (Long, Map[String, ColStat]) = {
    locally {
      val md = r.getFooter
      val msg = md.getFileMetaData.getSchema
      // Eligible = top-level primitive, non-repeated, renderable type.
      val eligible: Map[String, PrimitiveType] = msg.getFields.asScala.take(MaxStatColumns)
        .filter(f => f.isPrimitive && !f.isRepetition(org.apache.parquet.schema.Type.Repetition.REPEATED))
        .map(f => f.getName -> f.asPrimitiveType()).toMap
      val blocks = md.getBlocks.asScala.toSeq
      val perCol = scala.collection.mutable.Map[String, (String, String, Long, Kind)]()
      val dropped = scala.collection.mutable.Set[String]()
      for (b <- blocks; c <- b.getColumns.asScala) {
        val path = c.getPath.toArray
        if (path.length == 1 && eligible.contains(path(0)) && !dropped(path(0))) {
          val name = path(0)
          val st = c.getStatistics
          merged(st, eligible(name), b.getRowCount) match {
            case None => dropped += name; perCol.remove(name)
            case Some((mn, mx, nulls, kind)) =>
              perCol.get(name) match {
                case None => perCol(name) = (mn, mx, nulls, kind)
                case Some((pmn, pmx, pn, k)) =>
                  val nmn = minOf(k, pmn, mn)
                  val nmx = maxOf(k, pmx, mx)
                  val nn = if (pn < 0 || nulls < 0) -1L else pn + nulls
                  perCol(name) = (nmn, nmx, nn, k)
              }
          }
        }
      }
      val stats = perCol.map { case (n, (mn, mx, nulls, _)) => n -> ColStat(mn, mx, nulls) }.toMap
      (r.getRecordCount, stats)
    }
  }

  private def minOf(k: Kind, a: String, b: String): String =
    if (a == null) b else if (b == null) a
    else if (StatCodec.compare(k, a, b) <= 0) a else b
  private def maxOf(k: Kind, a: String, b: String): String =
    if (a == null) b else if (b == null) a
    else if (StatCodec.compare(k, a, b) >= 0) a else b

  /** The comparison kind a parquet type's canonical form uses — must match
    * renderPair's choices (value-free so all-null chunks get the RIGHT kind;
    * a wrong kind would merge later numeric chunks byte-wise). */
  private def kindOfParquet(pt: PrimitiveType): Option[Kind] = {
    val ann = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN => Some(Str)
      case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 => ann match {
        case _: DateLogicalTypeAnnotation | _: TimestampLogicalTypeAnnotation => Some(Str)
        case _: TimeLogicalTypeAnnotation => None
        case i: IntLogicalTypeAnnotation if !i.isSigned => None
        case _ => Some(Num)
      }
      case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE => Some(Num)
      case PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY => ann match {
        case _: StringLogicalTypeAnnotation | _: EnumLogicalTypeAnnotation => Some(Str)
        case _: DecimalLogicalTypeAnnotation => Some(Num)
        case _ => None
      }
      case _ => None
    }
  }

  /** One chunk's (min, max, nulls, kind); min/max null for all-null chunks.
    * None = stats unusable for this column (drop it file-wide). */
  private def merged(st: Statistics[_], pt: PrimitiveType, rowCount: Long)
      : Option[(String, String, Long, Kind)] = {
    if (st == null || st.isEmpty) return None
    val nulls = if (st.isNumNullsSet) st.getNumNulls else -1L
    if (!st.hasNonNullValue) {
      // All-null chunk: contributes null count only — min/max stay undefined
      // but the chunk must not drop the column (the merge keeps other
      // chunks' bounds; the kind MUST be the type's real one or a later
      // value-carrying chunk merges under the wrong comparator).
      return if (nulls >= 0 && nulls >= rowCount)
        kindOfParquet(pt).map(k => (null, null, nulls, k))
      else None
    }
    renderPair(st, pt).map { case (mn, mx, kind) => (mn, mx, nulls, kind) }
  }

  private def renderPair(st: Statistics[_], pt: PrimitiveType): Option[(String, String, Kind)] = {
    val ann = pt.getLogicalTypeAnnotation
    def num(f: Any => Option[String]): Option[(String, String, Kind)] =
      for (a <- f(st.genericGetMin()); b <- f(st.genericGetMax())) yield (a, b, Num)
    def ord(f: Any => Option[String]): Option[(String, String, Kind)] =
      for (a <- f(st.genericGetMin()); b <- f(st.genericGetMax())) yield (a, b, Str)
    pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN => ord(v => Some(v.toString))
      case PrimitiveTypeName.INT32 => ann match {
        case _: DateLogicalTypeAnnotation =>
          ord(v => StatCodec.formatDate(v.asInstanceOf[Integer].longValue))
        case d: DecimalLogicalTypeAnnotation =>
          num(v => Some(java.math.BigDecimal.valueOf(
            v.asInstanceOf[Integer].longValue, d.getScale).toPlainString))
        case i: IntLogicalTypeAnnotation if !i.isSigned => None
        case _ => num(v => Some(v.toString))
      }
      case PrimitiveTypeName.INT64 => ann match {
        case t: TimestampLogicalTypeAnnotation =>
          val toMicros: Long => Option[Long] = t.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS => v => Some(Math.multiplyExact(v, 1000L))
            case LogicalTypeAnnotation.TimeUnit.MICROS => v => Some(v)
            case LogicalTypeAnnotation.TimeUnit.NANOS => v => Some(Math.floorDiv(v, 1000L))
            case _ => _ => None
          }
          ord(v => toMicros(v.asInstanceOf[java.lang.Long].longValue)
            .flatMap(StatCodec.formatMicros))
        case d: DecimalLogicalTypeAnnotation =>
          num(v => Some(java.math.BigDecimal.valueOf(
            v.asInstanceOf[java.lang.Long].longValue, d.getScale).toPlainString))
        case _: TimeLogicalTypeAnnotation => None
        case i: IntLogicalTypeAnnotation if !i.isSigned => None
        case _ => num(v => Some(v.toString))
      }
      case PrimitiveTypeName.FLOAT =>
        // widened to double (Spark's comparison semantics for floats)
        num { v => val f = v.asInstanceOf[java.lang.Float]
          if (f.isNaN || f.isInfinite) None else Some(f.doubleValue.toString) }
      case PrimitiveTypeName.DOUBLE =>
        num { v => val d = v.asInstanceOf[java.lang.Double]
          if (d.isNaN || d.isInfinite) None else Some(d.toString) }
      case PrimitiveTypeName.BINARY => ann match {
        case _: StringLogicalTypeAnnotation | _: EnumLogicalTypeAnnotation =>
          ord { v => val b = v.asInstanceOf[Binary]
            if (b.length > StatCodec.MaxLen) None else Some(b.toStringUsingUTF8) }
        case d: DecimalLogicalTypeAnnotation =>
          num(v => Some(new java.math.BigDecimal(
            new java.math.BigInteger(v.asInstanceOf[Binary].getBytes), d.getScale).toPlainString))
        case _ => None
      }
      case PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY => ann match {
        case d: DecimalLogicalTypeAnnotation =>
          num(v => Some(new java.math.BigDecimal(
            new java.math.BigInteger(v.asInstanceOf[Binary].getBytes), d.getScale).toPlainString))
        case _ => None
      }
      case _ => None // INT96 and friends: no reliable stats
    }
  }
}

object StatsSkip {
  import StatCodec.Kind

  /** true = the file MAY contain matching rows (keep); false = provably no
    * row matches (skip). `recordCount < 0` means unknown. */
  def keep(f: sources.Filter, schema: StructType,
      stats: Map[String, ColStat], recordCount: Long): Boolean = {
    def field(attr: String): Option[StructField] =
      schema.fields.find(_.name == attr)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(attr)))
    // (min, max, nulls, kind) — min/max null when the column is all-null or
    // bounds unknown. None = no stats at all → keep.
    def info(attr: String): Option[(String, String, Long, Kind)] = for {
      fd <- field(attr)
      st <- stats.get(fd.name).orElse(stats.find(_._1.equalsIgnoreCase(attr)).map(_._2))
      k <- StatCodec.kindOf(fd.dataType)
    } yield (st.min, st.max, st.nulls, k)
    def lit(attr: String, v: Any): Option[String] =
      field(attr).flatMap(fd => StatCodec.render(fd.dataType, v))
    def allNull(mn: String, nulls: Long): Boolean =
      mn == null && nulls >= 0 && recordCount > 0 && nulls >= recordCount
    /** Evaluate cmp against [min,max]; keep when anything is unknown. */
    def cmp(attr: String, v: Any)(dec: (Kind, String, String, String) => Boolean): Boolean =
      (info(attr), Option(v).flatMap(x => lit(attr, x))) match {
        case (Some((mn, mx, nulls, k)), Some(l)) =>
          if (allNull(mn, nulls)) false       // all-null column never matches a comparison
          else if (mn == null || mx == null) true
          else dec(k, mn, mx, l)
        case _ => true
      }
    f match {
      case sources.And(l, r) => keep(l, schema, stats, recordCount) && keep(r, schema, stats, recordCount)
      case sources.Or(l, r) => keep(l, schema, stats, recordCount) || keep(r, schema, stats, recordCount)
      case sources.EqualTo(a, v) =>
        cmp(a, v)((k, mn, mx, l) =>
          StatCodec.compare(k, mn, l) <= 0 && StatCodec.compare(k, mx, l) >= 0)
      case sources.EqualNullSafe(a, v) =>
        if (v == null) keep(sources.IsNull(a), schema, stats, recordCount)
        else keep(sources.EqualTo(a, v), schema, stats, recordCount)
      case sources.GreaterThan(a, v) => cmp(a, v)((k, _, mx, l) => StatCodec.compare(k, mx, l) > 0)
      case sources.GreaterThanOrEqual(a, v) => cmp(a, v)((k, _, mx, l) => StatCodec.compare(k, mx, l) >= 0)
      case sources.LessThan(a, v) => cmp(a, v)((k, mn, _, l) => StatCodec.compare(k, mn, l) < 0)
      case sources.LessThanOrEqual(a, v) => cmp(a, v)((k, mn, _, l) => StatCodec.compare(k, mn, l) <= 0)
      case sources.In(a, vs) =>
        if (vs == null || vs.isEmpty) true
        else vs.exists(v => keep(sources.EqualTo(a, v), schema, stats, recordCount))
      case sources.IsNull(a) => info(a) match {
        case Some((_, _, nulls, _)) => nulls != 0 // -1 (unknown) keeps
        case None => true
      }
      case sources.IsNotNull(a) => info(a) match {
        case Some((mn, _, nulls, _)) => !allNull(mn, nulls)
        case None => true
      }
      case sources.StringStartsWith(a, p) if p != null => info(a) match {
        case Some((mn, mx, nulls, _)) =>
          if (allNull(mn, nulls)) false
          else if (mn == null || mx == null) true
          else StatCodec.compareUtf8(mx, p) >= 0 &&
            StatCodec.prefixSuccessor(p).forall(succ => StatCodec.compareUtf8(mn, succ) < 0)
        case None => true
      }
      case sources.AlwaysFalse() => false
      case _ => true // Not, string contains/endswith, unknown filters: keep
    }
  }

  /** Restrict filters to those safe for pruning under unresolved merges:
    * every referenced column must be a merge key (see object doc). */
  def safeFilters(filters: Seq[sources.Filter], needMerge: Boolean,
      mergeKeys: Seq[String]): Seq[sources.Filter] =
    if (!needMerge) filters
    else {
      val keys = mergeKeys.toSet
      filters.filter(_.references.forall(r => keys.contains(r)))
    }

  /** Prune a manifest-entry list by stats. Pure planning-time metadata work. */
  def prune(entries: Seq[graft.txn.ManifestEntry], filters: Seq[sources.Filter],
      schema: StructType): Seq[graft.txn.ManifestEntry] =
    if (filters.isEmpty) entries
    else entries.filter { e =>
      val st = e.colStats
      st.isEmpty || filters.forall(f => keep(f, schema, st, e.recordCount))
    }

  /** File-level LIMIT pruning: an unordered LIMIT n needs at most n rows,
    * so any entry prefix whose record counts cover n suffices — a LIMIT 10
    * over 10^5 files plans one file. Only sound with NO row predicate (a
    * predicate makes per-file match counts unknown) and fully-known record
    * counts; otherwise returns the list unchanged. */
  def limitPrefix(entries: Seq[graft.txn.ManifestEntry], limit: Int)
      : Seq[graft.txn.ManifestEntry] = {
    if (limit <= 0 || entries.exists(_.recordCount < 0)) return entries
    var acc = 0L
    val out = entries.takeWhile { e =>
      val need = acc < limit
      acc += e.recordCount
      need
    }
    out
  }

  // ---------------------------------------------------------- translation

  /** Translate a (possibly unresolved) Column predicate into the
    * `sources.Filter`s usable for stats pruning. Unsupported shapes are
    * dropped — for an AND that is still a sound (weaker) prune; an OR with
    * an unsupported side drops the whole OR. */
  def translate(c: Column): Seq[sources.Filter] =
    splitConjuncts(org.apache.spark.sql.graft.GraftFunctions.expressionOf(c))
      .flatMap(translateOne(_))

  /** Split predicates' AND-conjuncts into (key-only, rest). A conjunct
    * whose every column reference is a merge key selects the same rows in
    * every merge-key-equal frame — the zipper read pushes such conjuncts
    * into each column group's plan (manifest stats prune + pre-join row
    * filter) while everything else waits for the zipped row. Conservative:
    * a conjunct with a qualified name, lambda variable, or subquery lands
    * in `rest` (correct either way — `rest` is evaluated over full rows). */
  def splitKeyConjuncts(preds: Seq[Column], keys: Set[String])
      : (Option[Column], Option[Column]) = {
    import org.apache.spark.sql.graft.GraftFunctions.{expressionOf, columnOf}
    val conjuncts = preds.flatMap(c => splitConjuncts(expressionOf(c)))
    def keyOnly(e: ce.Expression): Boolean = {
      if (e.exists(_.isInstanceOf[ce.PlanExpression[_]])) return false
      // A pushed conjunct evaluates once per GROUP frame; a nondeterministic
      // one (rand() < 0.5) would let groups disagree on which keys survive
      // and the full-outer zip would emit corrupt partial rows. Resolved
      // trees expose `deterministic`; pre-analysis trees arrive as
      // UnresolvedFunction (deterministic defaults true), so reject known
      // nondeterministic names by spelling too.
      if (!e.deterministic) return false
      if (e.exists {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
            if f.nameParts.size == 1 =>
          nondeterministicFnNames.contains(
            f.nameParts.head.toLowerCase(java.util.Locale.ROOT))
        case _ => false
      }) return false
      val refs = e.collect {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          if (u.nameParts.size == 1) Some(u.nameParts.head) else None
        case a: ce.Attribute => Some(a.name)
      }
      // refs.nonEmpty: a reference-free conjunct (lit(true), rand() < 0.5
      // behind an alias, current_date() comparisons) passes the forall
      // vacuously but gains nothing from the push — route it to the
      // residual where it evaluates exactly once per zipped row.
      refs.nonEmpty && refs.forall(_.exists(keys.contains))
    }
    val (key, rest) = conjuncts.partition(keyOnly)
    def and(es: Seq[ce.Expression]): Option[Column] =
      es.reduceOption(ce.And.apply).map(columnOf)
    (and(key), and(rest))
  }

  /** Builtin function names whose results vary per evaluation — a
    * pre-analysis UnresolvedFunction carrying one of these must never be
    * pushed into a per-group plan (see [[splitKeyConjuncts]]). */
  private val nondeterministicFnNames: Set[String] = Set(
    "rand", "randn", "random", "uuid", "shuffle", "randstr",
    "monotonically_increasing_id", "spark_partition_id",
    "input_file_name", "input_file_block_start", "input_file_block_length")

  /** Pre-analysis Column trees arrive as UnresolvedFunction nodes ('and,
    * '`>`, 'in, …), not typed comparisons — match both shapes. */
  private object UF {
    def unapply(e: ce.Expression): Option[(String, Seq[ce.Expression])] = e match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.size == 1 =>
        Some((f.nameParts.head.toLowerCase(java.util.Locale.ROOT), f.arguments))
      case _ => None
    }
  }

  private def splitConjuncts(e: ce.Expression): Seq[ce.Expression] = e match {
    case ce.And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case UF("and", Seq(l, r)) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def attrName(e: ce.Expression): Option[String] = e match {
    case a: ce.Attribute => Some(a.name)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Some(u.name)
    case _ => None
  }

  private def litValue(e: ce.Expression): Option[Any] = e match {
    case l: ce.Literal =>
      Option(CatalystTypeConverters.createToScalaConverter(l.dataType)(l.value))
    case c: ce.Cast if c.child.isInstanceOf[ce.Literal] =>
      // lit("1994-07-01").cast("date") and friends: fold the constant here
      // (these trees are pre-analysis, so no ConstantFolding ran). Timestamp
      // casts only resolve with a timezone — pin the session's.
      try {
        val cz = if (c.timeZoneId.isEmpty)
          c.withTimeZone(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
            .asInstanceOf[ce.Cast]
        else c
        Option(CatalystTypeConverters.createToScalaConverter(cz.dataType)(cz.eval(null)))
      } catch { case _: Exception => None }
    case _ => None
  }

  private def translateOne(e: ce.Expression): Option[sources.Filter] = e match {
    case ce.EqualTo(a, l) => bin(a, l, sources.EqualTo.apply, flip = sources.EqualTo.apply)
    case ce.EqualNullSafe(a, l) => bin(a, l, sources.EqualNullSafe.apply, flip = sources.EqualNullSafe.apply)
    case ce.GreaterThan(a, l) => bin(a, l, sources.GreaterThan.apply, flip = sources.LessThan.apply)
    case ce.GreaterThanOrEqual(a, l) => bin(a, l, sources.GreaterThanOrEqual.apply, flip = sources.LessThanOrEqual.apply)
    case ce.LessThan(a, l) => bin(a, l, sources.LessThan.apply, flip = sources.GreaterThan.apply)
    case ce.LessThanOrEqual(a, l) => bin(a, l, sources.LessThanOrEqual.apply, flip = sources.GreaterThanOrEqual.apply)
    case ce.In(a, list) =>
      for {
        n <- attrName(a)
        vs <- traverseOpt(list.map(litValue))
      } yield sources.In(n, vs.toArray)
    case ce.IsNull(a) => attrName(a).map(sources.IsNull.apply)
    case ce.IsNotNull(a) => attrName(a).map(sources.IsNotNull.apply)
    case ce.StartsWith(a, l) =>
      for (n <- attrName(a); v <- litValue(l) if v.isInstanceOf[String])
        yield sources.StringStartsWith(n, v.asInstanceOf[String])
    case ce.Or(l, r) =>
      for (lf <- translateOne(l); rf <- translateOne(r)) yield sources.Or(lf, rf)
    case UF("=" | "==", Seq(a, b)) => bin(a, b, sources.EqualTo.apply, sources.EqualTo.apply)
    case UF("<=>", Seq(a, b)) => bin(a, b, sources.EqualNullSafe.apply, sources.EqualNullSafe.apply)
    case UF(">", Seq(a, b)) => bin(a, b, sources.GreaterThan.apply, sources.LessThan.apply)
    case UF(">=", Seq(a, b)) => bin(a, b, sources.GreaterThanOrEqual.apply, sources.LessThanOrEqual.apply)
    case UF("<", Seq(a, b)) => bin(a, b, sources.LessThan.apply, sources.GreaterThan.apply)
    case UF("<=", Seq(a, b)) => bin(a, b, sources.LessThanOrEqual.apply, sources.GreaterThanOrEqual.apply)
    case UF("in", a +: rest) if rest.nonEmpty =>
      for (n <- attrName(a); vs <- traverseOpt(rest.map(litValue)))
        yield sources.In(n, vs.toArray)
    case UF("isnull", Seq(a)) => attrName(a).map(sources.IsNull.apply)
    case UF("isnotnull", Seq(a)) => attrName(a).map(sources.IsNotNull.apply)
    case UF("startswith", Seq(a, l)) =>
      for (n <- attrName(a); v <- litValue(l) if v.isInstanceOf[String])
        yield sources.StringStartsWith(n, v.asInstanceOf[String])
    case UF("or", Seq(l, r)) =>
      for (lf <- translateOne(l); rf <- translateOne(r)) yield sources.Or(lf, rf)
    case _ => None
  }

  /** attr-op-literal in either operand order. */
  private def bin(l: ce.Expression, r: ce.Expression,
      mk: (String, Any) => sources.Filter,
      flip: (String, Any) => sources.Filter): Option[sources.Filter] =
    (attrName(l), litValue(r)) match {
      case (Some(n), Some(v)) => Some(mk(n, v))
      case _ => (attrName(r), litValue(l)) match {
        case (Some(n), Some(v)) => Some(flip(n, v))
        case _ => None
      }
    }

  private def traverseOpt[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}
