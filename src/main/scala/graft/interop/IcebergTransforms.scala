package graft.interop

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Iceberg partition transforms — the spec's "Partition Transforms" table
 * plus Appendix B "32-bit Hash Requirements" (murmur3_x86_32, seed 0, over
 * the single-value serialized form). The reference implements the same
 * strategy set (storage/model/transform.py:32-41 bucketing strategies,
 * :251-304 truncate/year/month/day/hour); here each transform is BOTH
 *
 *   - a Spark `Column` (codegen'd: `StaticInvoke` into [[IcebergHash]] for
 *     bucket, date/interval builtins for the time family) used to compute
 *     spec-correct partition values on the write path, and
 *   - a driver-side literal evaluator used to DERIVE partition predicates
 *     from data predicates on the read path (key = 5 → bucket id;
 *     ts range → day range), so manifest entries prune before any data
 *     file is opened.
 *
 * Time transforms are UTC-exact by construction: `timestamptz` values go
 * through their epoch micros, `timestamp` (NTZ) through the wall clock —
 * never the Spark session timezone.
 */
object IcebergHash {

  /** Standard murmur3_x86_32, seed 0 (the spec pins both). */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h1 = 0 // seed
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val i4 = i << 2
      var k1 = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks << 2
    if ((len & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** int/long/date(days)/time/timestamp(micros) all hash as the 8-byte
    * little-endian long (the spec promotes int to long). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var x = v
    var i = 0
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b)
  }

  private def positiveMod(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n

  // Static entry points for codegen (`StaticInvoke`) — JVM-internal arg
  // types per Spark's internal row layout.
  def bucketLong(v: Long, n: Int): Int = positiveMod(hashLong(v), n)
  def bucketString(s: UTF8String, n: Int): Int = positiveMod(murmur3(s.getBytes), n)
  def bucketBinary(b: Array[Byte], n: Int): Int = positiveMod(murmur3(b), n)
  /** Decimal hashes over the MINIMAL big-endian two's-complement unscaled
    * bytes (spec Appendix B). */
  def bucketDecimal(d: Decimal, n: Int): Int =
    positiveMod(murmur3(d.toJavaBigDecimal.unscaledValue.toByteArray), n)

  def bucketJavaDecimal(d: java.math.BigDecimal, n: Int): Int =
    positiveMod(murmur3(d.unscaledValue.toByteArray), n)
  def bucketRawString(s: String, n: Int): Int =
    positiveMod(murmur3(s.getBytes(StandardCharsets.UTF_8)), n)
}

/** One field of an Iceberg partition spec. */
final case class IceSpecField(
    name: String, source: String, fieldId: Int, transform: IceTransform) extends Serializable

sealed trait IceTransform extends Serializable {
  /** JSON representation in table metadata (`"bucket[4]"`, `"day"`, …). */
  def json: String
  /** Iceberg's default partition-field-name suffix; None = keep source name. */
  def suffix: Option[String]
  def fieldName(source: String): String = suffix.fold(source)(s => s"${source}_$s")
  /** Partition-value Column over the source column (write path). */
  def column(src: Column, srcType: DataType): Column
  /** Physical type of the partition value in OUR manifests:
    * "int" | "long" | "string". */
  def avroKind(srcType: DataType): String
  /** Driver-side transform of a Scala literal (predicate derivation).
    * None = not evaluable for this value/type. Results are Int/Long/String. */
  def eval(srcType: DataType, v: Any): Option[Any]
  /** Order-preserving with a Long-comparable result → range predicates
    * derive. (Bucket is deliberately false.) */
  def monotonicLong(srcType: DataType): Boolean = false
}

object IceTransform {

  private val EpochDay = java.time.LocalDate.ofEpochDay(0)

  /** Parse the metadata JSON transform string. Unknown transforms are kept
    * opaque: readable table, no pruning on that field, writes refused. */
  def parse(s: String): IceTransform = {
    val t = s.trim.toLowerCase(java.util.Locale.ROOT)
    val bucketRe = "bucket\\[(\\d+)\\]".r
    val truncRe = "truncate\\[(\\d+)\\]".r
    t match {
      case "identity" => IdentityT
      case "void" => VoidT
      case "year" | "years" => YearT
      case "month" | "months" => MonthT
      case "day" | "days" | "date" => DayT
      case "hour" | "hours" | "date_hour" => HourT
      case bucketRe(n) => BucketT(n.toInt)
      case truncRe(w) => TruncateT(w.toInt)
      case other => UnknownT(other)
    }
  }

  // ---- shared literal plumbing (sources.Filter values arrive as the
  // external Scala forms; both java.sql and java.time shapes are possible)

  private[interop] def microsOf(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      // getTime carries millis (incl. the nanos' millis); add the sub-milli part
      Some(Math.multiplyExact(t.getTime, 1000L) + (t.getNanos / 1000) % 1000)
    case i: java.time.Instant =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
    case l: java.time.LocalDateTime =>
      Some(Math.addExact(
        Math.multiplyExact(l.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
        l.getNano / 1000L))
    case _ => None
  }

  private[interop] def daysOf(v: Any): Option[Int] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
    case l: java.time.LocalDate => Some(l.toEpochDay.toInt)
    case _ => None
  }

  /** Epoch days of a date/timestamp literal (UTC for instants). */
  private[interop] def literalDays(v: Any): Option[Int] =
    daysOf(v).orElse(microsOf(v).map(m => Math.floorDiv(m, 86400000000L).toInt))

  private def epochDateLit: Column = lit(java.sql.Date.valueOf("1970-01-01"))

  /** UTC wall-clock (NTZ) view of a timestamp column — `Cast` with a PINNED
    * "UTC" zone, so the session timezone never leaks into partition values. */
  private[graft] def utcWallClock(src: Column, srcType: DataType): Column = srcType match {
    case TimestampType =>
      GraftFunctions.columnOf(
        Cast(GraftFunctions.expressionOf(src), TimestampNTZType, Some("UTC")))
    case TimestampNTZType => src
    case other => throw new UnsupportedOperationException(s"not a timestamp: $other")
  }

  /** Epoch-day Column of a date/timestamp source (UTC for instants). */
  private[interop] def epochDays(src: Column, srcType: DataType): Column = srcType match {
    case DateType => datediff(src, epochDateLit)
    case TimestampType | TimestampNTZType =>
      datediff(to_date(utcWallClock(src, srcType)), epochDateLit)
    case other => throw new UnsupportedOperationException(s"time transform over $other")
  }

  private def localDate(days: Int) = java.time.LocalDate.ofEpochDay(days.toLong)

  // -------------------------------------------------------------- members

  case object IdentityT extends IceTransform {
    val json = "identity"
    val suffix: Option[String] = None
    def column(src: Column, srcType: DataType): Column = src
    def avroKind(srcType: DataType): String = "string"
    // identity pruning is served by the manifest column-stats path; this
    // evaluator is unused (partition-value renderings are writer-dependent)
    def eval(srcType: DataType, v: Any): Option[Any] = None
  }

  final case class BucketT(n: Int) extends IceTransform {
    require(n > 0, s"bucket[$n]: n must be positive")
    val json = s"bucket[$n]"
    val suffix: Option[String] = Some("bucket")
    def column(src: Column, srcType: DataType): Column = {
      def inv(fn: String, arg: Column, argType: DataType): Column =
        GraftFunctions.columnOf(StaticInvoke(
          IcebergHash.getClass, IntegerType, fn,
          Seq(GraftFunctions.expressionOf(arg), Literal(n)),
          Seq(argType, IntegerType)))
      srcType match {
        case ByteType | ShortType | IntegerType | LongType =>
          inv("bucketLong", src.cast(LongType), LongType)
        case DateType =>
          inv("bucketLong", epochDays(src, DateType).cast(LongType), LongType)
        case TimestampType =>
          inv("bucketLong", unix_micros(src), LongType)
        case TimestampNTZType =>
          inv("bucketLong", unix_micros(GraftFunctions.columnOf(
            Cast(GraftFunctions.expressionOf(src), TimestampType, Some("UTC")))), LongType)
        case StringType => inv("bucketString", src, StringType)
        case BinaryType => inv("bucketBinary", src, BinaryType)
        case d: DecimalType => inv("bucketDecimal", src, d)
        case other => throw new UnsupportedOperationException(s"iceberg bucket over $other")
      }
    }
    def avroKind(srcType: DataType): String = "int"
    def eval(srcType: DataType, v: Any): Option[Any] = v match {
      case null => None
      case i: java.lang.Integer => Some(IcebergHash.bucketLong(i.longValue, n))
      case l: java.lang.Long => Some(IcebergHash.bucketLong(l.longValue, n))
      case s: java.lang.Short => Some(IcebergHash.bucketLong(s.longValue, n))
      case b: java.lang.Byte => Some(IcebergHash.bucketLong(b.longValue, n))
      case s: String => Some(IcebergHash.bucketRawString(s, n))
      case d: java.math.BigDecimal => Some(IcebergHash.bucketJavaDecimal(d, n))
      case d: BigDecimal => Some(IcebergHash.bucketJavaDecimal(d.bigDecimal, n))
      case b: Array[Byte] => Some(IcebergHash.bucketBinary(b, n))
      case other =>
        daysOf(other).map(d => IcebergHash.bucketLong(d.toLong, n))
          .orElse(microsOf(other).map(m => IcebergHash.bucketLong(m, n)))
    }
  }

  final case class TruncateT(w: Int) extends IceTransform {
    require(w > 0, s"truncate[$w]: width must be positive")
    val json = s"truncate[$w]"
    val suffix: Option[String] = Some("trunc")
    def column(src: Column, srcType: DataType): Column = srcType match {
      case ByteType | ShortType | IntegerType =>
        // result stays INT (matching eval and the int-typed avro tuple):
        // a width past the narrow type's range must not overflow the cast
        // back (ANSI throw / legacy wraparound ≠ the derived predicate)
        val i = src.cast(IntegerType)
        i - pmod(i, lit(w)) // pmod → floor multiple, negatives included
      case LongType => src - pmod(src, lit(w.toLong))
      case StringType => substring(src, 1, w)
      case other => throw new UnsupportedOperationException(s"iceberg truncate over $other")
    }
    def avroKind(srcType: DataType): String = srcType match {
      case LongType => "long"
      case StringType => "string"
      case _ => "int"
    }
    def eval(srcType: DataType, v: Any): Option[Any] = v match {
      case null => None
      case i: java.lang.Integer => Some(i.intValue - Math.floorMod(i.intValue, w))
      case l: java.lang.Long => Some(l.longValue - Math.floorMod(l.longValue, w.toLong))
      case s: java.lang.Short => Some(s.intValue - Math.floorMod(s.intValue, w))
      case b: java.lang.Byte => Some(b.intValue - Math.floorMod(b.intValue, w))
      case s: String =>
        // CODE POINTS, like Spark's substring and the Iceberg spec — a
        // UTF-16-unit cut would split surrogate pairs and derive a
        // partition value the writer never produced (silent mis-prune)
        Some(if (s.codePointCount(0, s.length) <= w) s
             else s.substring(0, s.offsetByCodePoints(0, w)))
      case _ => None
    }
    override def monotonicLong(srcType: DataType): Boolean = srcType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }

  /** years since 1970 */
  case object YearT extends IceTransform {
    val json = "year"
    val suffix: Option[String] = Some("year")
    def column(src: Column, srcType: DataType): Column = srcType match {
      case DateType => year(src) - lit(1970)
      case TimestampType | TimestampNTZType =>
        year(to_date(utcWallClock(src, srcType))) - lit(1970)
      case other => throw new UnsupportedOperationException(s"iceberg year over $other")
    }
    def avroKind(srcType: DataType): String = "int"
    def eval(srcType: DataType, v: Any): Option[Any] =
      literalDays(v).map(d => localDate(d).getYear - 1970)
    override def monotonicLong(srcType: DataType): Boolean = true
  }

  /** months since 1970-01 */
  case object MonthT extends IceTransform {
    val json = "month"
    val suffix: Option[String] = Some("month")
    def column(src: Column, srcType: DataType): Column = {
      val d = srcType match {
        case DateType => src
        case _ => to_date(utcWallClock(src, srcType))
      }
      (year(d) - lit(1970)) * lit(12) + month(d) - lit(1)
    }
    def avroKind(srcType: DataType): String = "int"
    def eval(srcType: DataType, v: Any): Option[Any] =
      literalDays(v).map { days =>
        val ld = localDate(days)
        (ld.getYear - 1970) * 12 + ld.getMonthValue - 1
      }
    override def monotonicLong(srcType: DataType): Boolean = true
  }

  /** days since 1970-01-01 */
  case object DayT extends IceTransform {
    val json = "day"
    val suffix: Option[String] = Some("day")
    def column(src: Column, srcType: DataType): Column = epochDays(src, srcType)
    def avroKind(srcType: DataType): String = "int"
    def eval(srcType: DataType, v: Any): Option[Any] = literalDays(v)
    override def monotonicLong(srcType: DataType): Boolean = true
  }

  /** hours since 1970-01-01T00 (timestamps only, per the spec) */
  case object HourT extends IceTransform {
    val json = "hour"
    val suffix: Option[String] = Some("hour")
    def column(src: Column, srcType: DataType): Column = srcType match {
      case TimestampType | TimestampNTZType =>
        val ntz = utcWallClock(src, srcType)
        // wall-clock hour is 0..23, so day*24 + hour == floorDiv(micros, 1h)
        (epochDays(src, srcType).cast(LongType) * lit(24L) + hour(ntz)).cast(IntegerType)
      case other => throw new UnsupportedOperationException(s"iceberg hour over $other")
    }
    def avroKind(srcType: DataType): String = "int"
    def eval(srcType: DataType, v: Any): Option[Any] =
      microsOf(v).map(m => Math.floorDiv(m, 3600000000L).toInt)
    override def monotonicLong(srcType: DataType): Boolean = true
  }

  case object VoidT extends IceTransform {
    val json = "void"
    val suffix: Option[String] = Some("null")
    def column(src: Column, srcType: DataType): Column = lit(null).cast(StringType)
    def avroKind(srcType: DataType): String = "string"
    def eval(srcType: DataType, v: Any): Option[Any] = None
  }

  final case class UnknownT(raw: String) extends IceTransform {
    val json = raw
    val suffix: Option[String] = Some(raw)
    def column(src: Column, srcType: DataType): Column =
      throw new UnsupportedOperationException(
        s"cannot write under unknown Iceberg transform '$raw'")
    def avroKind(srcType: DataType): String = "string"
    def eval(srcType: DataType, v: Any): Option[Any] = None
  }
}

/**
 * Partition-predicate derivation + evaluation: data predicates
 * (`sources.Filter` conjuncts) become predicates over manifest partition
 * TUPLES, evaluated per entry before any data file is opened — in
 * executors on the distributed manifest path (everything here is small and
 * Serializable). Sound by construction: a predicate only DROPS an entry
 * when the transform semantics prove no row can match; anything
 * underivable keeps the entry (fail open). Identity fields are excluded —
 * their pruning is served by the manifest column-stats path, and their
 * partition-value renderings are writer-dependent (typed avro vs hive-dir
 * strings), so string equality there could mis-prune.
 */
object IcebergPartPrune {

  sealed trait Pred extends Serializable { def field: String }
  /** keep iff partition value ∈ values (null value keeps iff matchNull). */
  final case class EqIn(field: String, values: Set[String], matchNull: Boolean) extends Pred
  /** keep iff Long(partition value) within [lo, hi]; null never matches. */
  final case class Range(field: String, lo: Option[Long], hi: Option[Long]) extends Pred
  /** keep iff partition value non-null (transform(null) is null for every
    * non-void transform, so a null partition value means all-null source). */
  final case class NotNull(field: String) extends Pred

  /** Derive per-spec-field predicates from filter conjuncts. */
  def derive(filters: Seq[sources.Filter], spec: Seq[IceSpecField],
      schema: StructType): Seq[Pred] = {
    val prunable = spec.filter(s => s.transform match {
      case IceTransform.IdentityT | IceTransform.VoidT | _: IceTransform.UnknownT => false
      case _ => schema.fieldNames.contains(s.source)
    })
    if (prunable.isEmpty) Nil
    else for {
      f <- filters
      s <- prunable
      p <- deriveOne(f, s, schema(s.source).dataType)
    } yield p
  }

  private def deriveOne(f: sources.Filter, s: IceSpecField,
      srcType: DataType): Option[Pred] = {
    val t = s.transform
    def ev(v: Any): Option[Any] = t.eval(srcType, v)
    f match {
      case sources.EqualTo(a, v) if a == s.source && v != null =>
        ev(v).map(r => EqIn(s.name, Set(r.toString), matchNull = false))
      case sources.EqualNullSafe(a, null) if a == s.source =>
        Some(EqIn(s.name, Set.empty, matchNull = true))
      case sources.EqualNullSafe(a, v) if a == s.source =>
        ev(v).map(r => EqIn(s.name, Set(r.toString), matchNull = false))
      case sources.IsNull(a) if a == s.source =>
        Some(EqIn(s.name, Set.empty, matchNull = true))
      case sources.IsNotNull(a) if a == s.source =>
        Some(NotNull(s.name))
      case sources.In(a, vs) if a == s.source && vs != null && vs.nonEmpty =>
        // SQL IN never matches null (null = x is unknown), so drop null
        // literals and require every remaining one to be evaluable
        val nonNull = vs.filter(_ != null)
        if (nonNull.isEmpty) None
        else {
          val evs = nonNull.map(ev)
          if (evs.exists(_.isEmpty)) None
          else Some(EqIn(s.name, evs.flatten.map(_.toString).toSet, matchNull = false))
        }
      // many-to-one transforms make both strict and non-strict data bounds
      // INCLUSIVE partition bounds: rows with src > v can still live in
      // partition T(v)
      case sources.GreaterThan(a, v) if a == s.source && t.monotonicLong(srcType) =>
        evLong(t, srcType, v).map(b => Range(s.name, lo = Some(b), hi = None))
      case sources.GreaterThanOrEqual(a, v) if a == s.source && t.monotonicLong(srcType) =>
        evLong(t, srcType, v).map(b => Range(s.name, lo = Some(b), hi = None))
      case sources.LessThan(a, v) if a == s.source && t.monotonicLong(srcType) =>
        evLong(t, srcType, v).map(b => Range(s.name, lo = None, hi = Some(b)))
      case sources.LessThanOrEqual(a, v) if a == s.source && t.monotonicLong(srcType) =>
        evLong(t, srcType, v).map(b => Range(s.name, lo = None, hi = Some(b)))
      case sources.Or(l, r) =>
        // both sides must derive for the SAME field; union the match sets
        (deriveOne(l, s, srcType), deriveOne(r, s, srcType)) match {
          case (Some(EqIn(f1, v1, n1)), Some(EqIn(f2, v2, n2))) if f1 == f2 =>
            Some(EqIn(f1, v1 ++ v2, n1 || n2))
          case (Some(a), Some(b)) =>
            // hull of the two ranges (EqIn ∪ Range, Range ∪ Range, …)
            def hull(p: Pred): Option[(Option[Long], Option[Long], Boolean)] = p match {
              case Range(_, lo, hi) => Some((lo, hi, false))
              case EqIn(_, vs, mn) =>
                val ls = vs.map(v => try Some(v.toLong) catch { case _: Exception => None })
                if (ls.exists(_.isEmpty) || ls.isEmpty) None
                else Some((Some(ls.flatten.min), Some(ls.flatten.max), mn))
              case NotNull(_) => None
            }
            (hull(a), hull(b)) match {
              // "range OR null" has no sound Pred here — fail open
              case (Some((_, _, true)), _) | (_, Some((_, _, true))) => None
              case (Some((l1, h1, _)), Some((l2, h2, _))) =>
                val lo = for (x <- l1; y <- l2) yield math.min(x, y)
                val hi = for (x <- h1; y <- h2) yield math.max(x, y)
                Some(Range(s.name, lo, hi))
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
  }

  private def evLong(t: IceTransform, srcType: DataType, v: Any): Option[Long] =
    t.eval(srcType, v).flatMap {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case i: java.lang.Integer => Some(i.longValue)
      case l: java.lang.Long => Some(l.longValue)
      case _ => None
    }

  /** Evaluate ALL predicates against one entry's partition tuple. A field
    * absent from the tuple (older spec, foreign shape) keeps the entry. */
  def keep(preds: Seq[Pred], partition: Map[String, String]): Boolean =
    preds.forall {
      case EqIn(f, vs, matchNull) => partition.get(f) match {
        case None => true
        case Some(null) => matchNull
        case Some(v) => vs.contains(v)
      }
      case Range(f, lo, hi) => partition.get(f) match {
        case None => true
        case Some(null) => false // all-null source never matches a comparison
        case Some(v) =>
          val p = try Some(v.toLong) catch { case _: Exception => None }
          p.forall(x => lo.forall(x >= _) && hi.forall(x <= _))
      }
      case NotNull(f) => partition.get(f) match {
        case None => true
        case Some(v) => v != null
      }
    }
}
