package graft.interop

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

import graft.catalog.StatCodec

/**
 * Column-level (codegen'd) evaluation of Delta per-file stats skipping —
 * the vectorized replacement for the row-at-a-time `keepU` UDF on the
 * foreign-table read path (a 10^7-file Delta table evaluates stats once
 * per add action; an interpreted Jackson parse per row is the planning
 * bottleneck there).
 *
 * Semantics are EQUIVALENT to `DeltaStats.parse` + `StatsSkip.keep` for
 * the supported (filter × type) subset, property-tested against the UDF in
 * DeltaStatsSpec. Where a JSON value fails the typed parse, `from_json`
 * nulls it and every null reads as "unknown → keep" — conservative in the
 * same direction as the UDF, never a wrongly-dropped file.
 *
 * Float/double columns are supported — their BOUNDS are distrusted by
 * both paths (protocol NaN exclusion), so only their null counts
 * participate. TIMESTAMP columns (round-10) parse their bound spellings
 * as STRINGS and normalize to epoch micros via [[tsMicros]] — the common
 * foreign-Delta case (a time-range filter over a big table) stays fully
 * codegen'd. DECIMAL columns (round-10) parse as strings and participate
 * only when VALUE-EXACT in the declared (precision, scale) — a foreign
 * bound that would need rounding reads as unknown-keep instead (a
 * rounded max could prune a file whose rows match), so this path prunes
 * a subset of what the row path's arbitrary-precision compare prunes,
 * never differently.
 */
object DeltaStatsColumn {

  /** Bound types whose native Column comparison matches the canonical
    * StatCodec compare exactly (timestamps via tsMicros normalization,
    * decimals via the decExact value-exact parse). */
  private def boundsComparable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case StringType | DateType | BooleanType => true
    case TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Types whose stats may participate at all on this path. Everything
    * currently rides the Column path; the UDF fallback (build → None)
    * stays as the escape hatch for future residuals. */
  private def supported(dt: DataType): Boolean = true

  /** from_json field type for a bound column: timestamp and decimal
    * spellings parse as STRING (foreign writers disagree; from_json's
    * timestamp parser is session-zone-dependent, its decimal parser's
    * rounding is not value-exact) and normalize in [[tsMicros]] /
    * [[decExact]]; everything else parses natively. */
  private def parsedType(dt: DataType): DataType = dt match {
    case TimestampType | TimestampNTZType => StringType
    case _: DecimalType => StringType
    case other => other
  }

  /** Value-exact decimal bound: the spelling cast into the column's
    * (precision, scale), kept ONLY if the round-trip through a wide
    * decimal proves no rounding happened; otherwise null → unknown-keep.
    * (Spellings outside DecimalType(38,18) also read unknown.) */
  private def decExact(c: Column, dt: DecimalType): Column = {
    val wide = DecimalType(38, 18)
    val t = trim(c)
    val parsed = t.try_cast(dt)
    when(parsed.try_cast(wide) === t.try_cast(wide), parsed)
  }

  /** Vectorized mirror of DeltaStats.parseTs: a spelling carrying an
    * explicit UTC offset ("…Z", "…+02:00") parses as the instant it
    * names; a zone-less spelling is pinned to UTC by appending `Z` —
    * WITHOUT that, the string→timestamp cast would read it in the
    * SESSION zone and skips would shift by the UTC offset. Unparseable →
    * null → unknown-keep, the same conservative direction as the row
    * path. (The cast accepts a few spellings parseTs refuses — e.g.
    * date-only — each parsed to its correct instant, so this path may
    * prune strictly MORE files, never differently-valued bounds; and
    * >6-digit fractions the cast refuses fall back to keep.) */
  private def tsMicros(c: Column): Column = {
    val t = trim(c)
    val hasZone = t.rlike("(Z|[+-]\\d{2}:\\d{2})$")
    // try_: unparseable → null (ANSI cast would THROW planning off a
    // single foreign garbage stat)
    unix_micros(try_to_timestamp(when(hasZone, t).otherwise(concat(t, lit("Z")))))
  }

  private def refsOf(f: sources.Filter): Seq[String] = f.references.toSeq

  /**
   * Build the parse schema + keep predicate for the pushed filters.
   * `fields` = data columns as (logicalName, physicalName, dataType) —
   * stats JSON keys use PHYSICAL names, filters use LOGICAL names.
   * Returns None when any conjunct needs the UDF's residual handling.
   */
  def build(filters: Seq[sources.Filter],
      fields: Seq[(String, String, DataType)])
      : Option[(StructType, Column => Column)] = {
    // resolve filter attrs to fields (same case-insensitive rule as keep())
    def resolve(attr: String): Option[(String, String, DataType)] =
      fields.find(_._1 == attr).orElse(fields.find(_._1.equalsIgnoreCase(attr)))

    // residual check: any cmp-shaped conjunct over an unsupported type
    def cmpOk(f: sources.Filter): Boolean = f match {
      case sources.And(l, r) => cmpOk(l) && cmpOk(r)
      case sources.Or(l, r) => cmpOk(l) && cmpOk(r)
      case sources.EqualTo(a, _) => resolve(a).forall(x => supported(x._3))
      case sources.EqualNullSafe(a, _) => resolve(a).forall(x => supported(x._3))
      case sources.GreaterThan(a, _) => resolve(a).forall(x => supported(x._3))
      case sources.GreaterThanOrEqual(a, _) => resolve(a).forall(x => supported(x._3))
      case sources.LessThan(a, _) => resolve(a).forall(x => supported(x._3))
      case sources.LessThanOrEqual(a, _) => resolve(a).forall(x => supported(x._3))
      case sources.In(a, _) => resolve(a).forall(x => supported(x._3))
      case sources.StringStartsWith(a, _) => resolve(a).forall(x => supported(x._3))
      case sources.IsNull(a) => resolve(a).forall(x => supported(x._3))
      case sources.IsNotNull(a) => resolve(a).forall(x => supported(x._3))
      case _ => true // unknown filters keep-all on both paths
    }
    if (!filters.forall(cmpOk)) return None

    // parse schema over the REFERENCED columns only
    val referenced = filters.flatMap(refsOf).distinct.flatMap(resolve).distinct
    val boundFields = referenced.collect {
      case (_, phys, dt) if boundsComparable(dt) => StructField(phys, parsedType(dt))
    }
    val ncFields = referenced.map { case (_, phys, _) => StructField(phys, LongType) }
    val schema = StructType(
      Seq(StructField("numRecords", LongType)) ++
        (if (boundFields.nonEmpty)
          Seq(StructField("minValues", StructType(boundFields)),
            StructField("maxValues", StructType(boundFields)))
         else Nil) ++
        (if (ncFields.nonEmpty) Seq(StructField("nullCount", StructType(ncFields)))
         else Nil))

    val mk = (p: Column) => {
      val rows = p("numRecords")
      // per-column accessors (null = unknown everywhere)
      def nc(phys: String): Column =
        if (ncFields.nonEmpty) p("nullCount")(phys) else lit(null).cast(LongType)
      def rawBound(side: String, phys: String, dt: DataType): Column =
        if (!boundsComparable(dt)) lit(null).cast(LongType)
        else dt match {
          case TimestampType | TimestampNTZType => tsMicros(p(side)(phys))
          case d: DecimalType => decExact(p(side)(phys), d)
          case _ => p(side)(phys)
        }
      def rawMin(phys: String, dt: DataType): Column = rawBound("minValues", phys, dt)
      def rawMax(phys: String, dt: DataType): Column = rawBound("maxValues", phys, dt)
      // one-sided rule (DeltaStats.parse): exactly one parsed bound drops
      // BOTH (a bound missing because parsing failed must not masquerade
      // as one-sided-unbounded)
      def effMin(phys: String, dt: DataType): Column = {
        val (mn, mx) = (rawMin(phys, dt), rawMax(phys, dt))
        when(mn.isNotNull && mx.isNotNull, mn)
      }
      def effMax(phys: String, dt: DataType): Column = {
        val (mn, mx) = (rawMin(phys, dt), rawMax(phys, dt))
        when(mn.isNotNull && mx.isNotNull, mx)
      }
      /** all rows null: min unknown AND nullCount covers every record. */
      def allNull(phys: String, dt: DataType): Column =
        effMin(phys, dt).isNull && nc(phys).isNotNull &&
          rows.isNotNull && rows > 0 && nc(phys) >= rows

      /** cmp-template mirroring keep()'s: all-null prunes, unknown bounds
        * keep, else the decision over [min,max]. */
      def cmp(attr: String, v: Any)(
          dec: (Column, Column, Column) => Column): Column =
        (resolve(attr), Option(v)) match {
          case (Some((_, phys, dt)), Some(value)) if boundsComparable(dt) &&
              StatCodec.render(dt, value).isDefined =>
            // literal side: timestamps compare as epoch micros to match
            // the tsMicros-normalized bounds (canonical → micros is the
            // exact same mapping the row path's Str compare encodes)
            val lOpt: Option[Column] = dt match {
              case TimestampType | TimestampNTZType =>
                StatCodec.render(dt, value)
                  .flatMap(StatCodec.parseCanonicalMicros).map(lit(_))
              case d: DecimalType =>
                // exact-fit literals only: a literal needing rounding into
                // (p,s) would compare against a DIFFERENT value than the
                // row path's arbitrary-precision compare uses
                StatCodec.render(dt, value).flatMap { s =>
                  val bd = new java.math.BigDecimal(s)
                  val dec = org.apache.spark.sql.types.Decimal(bd)
                  if (dec.changePrecision(d.precision, d.scale) &&
                      dec.toJavaBigDecimal.compareTo(bd) == 0)
                    Some(lit(dec.toJavaBigDecimal).cast(d))
                  else None
                }
              case _ => Some(lit(value).cast(dt))
            }
            lOpt match {
              case Some(l) =>
                when(allNull(phys, dt), false)
                  .when(effMin(phys, dt).isNull || effMax(phys, dt).isNull, true)
                  .otherwise(dec(effMin(phys, dt), effMax(phys, dt), l))
              case None => lit(true)
            }
          case _ => lit(true) // unresolvable / unrenderable / no bounds: keep
        }

      def go(f: sources.Filter): Column = f match {
        case sources.And(l, r) => go(l) && go(r)
        case sources.Or(l, r) => go(l) || go(r)
        case sources.EqualTo(a, v) => cmp(a, v)((mn, mx, l) => mn <= l && mx >= l)
        case sources.EqualNullSafe(a, null) => go(sources.IsNull(a))
        case sources.EqualNullSafe(a, v) => go(sources.EqualTo(a, v))
        case sources.GreaterThan(a, v) => cmp(a, v)((_, mx, l) => mx > l)
        case sources.GreaterThanOrEqual(a, v) => cmp(a, v)((_, mx, l) => mx >= l)
        case sources.LessThan(a, v) => cmp(a, v)((mn, _, l) => mn < l)
        case sources.LessThanOrEqual(a, v) => cmp(a, v)((mn, _, l) => mn <= l)
        case sources.In(a, vs) =>
          if (vs == null || vs.isEmpty) lit(true)
          else vs.map(v => go(sources.EqualTo(a, v)): Column).reduce(_ || _)
        case sources.IsNull(a) => resolve(a) match {
          case Some((_, phys, _)) => nc(phys).isNull || nc(phys) =!= 0L
          case None => lit(true)
        }
        case sources.IsNotNull(a) => resolve(a) match {
          case Some((_, phys, dt)) => !allNull(phys, dt)
          case None => lit(true)
        }
        case sources.StringStartsWith(a, pfx) if pfx != null => resolve(a) match {
          case Some((_, phys, StringType)) =>
            val tail = when(allNull(phys, StringType), false)
              .when(effMin(phys, StringType).isNull ||
                effMax(phys, StringType).isNull, true)
            StatCodec.prefixSuccessor(pfx) match {
              case Some(succ) => tail.otherwise(
                effMax(phys, StringType) >= lit(pfx) &&
                  effMin(phys, StringType) < lit(succ))
              case None => tail.otherwise(effMax(phys, StringType) >= lit(pfx))
            }
          case _ => lit(true)
        }
        case sources.AlwaysFalse() => lit(false)
        case _ => lit(true) // Not / contains / endswith / unknown: keep
      }
      filters.map(go).reduceOption(_ && _).getOrElse(lit(true))
    }
    Some((schema, mk))
  }
}
