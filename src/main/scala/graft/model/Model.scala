package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Core data model for the Graft lakehouse engine: delta types, write modes,
 * partition transforms, sort/partition schemes, and field-level metadata.
 *
 * Semantics derived from the reference (ray-project/deltacat):
 *  - DeltaType: storage/model/types.py:41-46
 *  - Transform: storage/model/transform.py:11-343 (Iceberg-compatible set)
 *  - SortScheme: storage/model/sort_key.py:19-114
 *  - PartitionScheme: storage/model/partition.py:489-680
 *  - Field metadata (merge keys, merge order, event time, defaults):
 *    storage/model/schema.py:244-357
 * Re-expressed Spark-first: transforms compile to Catalyst `Column`
 * expressions so partition pruning / codegen apply natively.
 */

/** One commit's delta type — reference storage/model/types.py:41-46. */
sealed trait DeltaType { def name: String }
object DeltaType {
  /** Unordered append; stream position is a synthetic UUID-derived long. */
  case object Add extends DeltaType { val name = "ADD" }
  /** Strictly ordered append: position = prev + 1. */
  case object Append extends DeltaType { val name = "APPEND" }
  /** Event-wall-clock ordered append: position = epoch millis. */
  case object Chrono extends DeltaType { val name = "CHRONO" }
  /** Merge-by-key update-or-insert. */
  case object Upsert extends DeltaType { val name = "UPSERT" }
  /** Merge-by-key delete. */
  case object Delete extends DeltaType { val name = "DELETE" }

  val all: Seq[DeltaType] = Seq(Add, Append, Chrono, Upsert, Delete)
  def fromName(n: String): DeltaType =
    all.find(_.name == n).getOrElse(throw new IllegalArgumentException(s"unknown DeltaType $n"))
}

/** Table write modes — reference catalog/interface.py:47-83 (write_to_table). */
sealed trait WriteMode { def name: String }
object WriteMode {
  case object Auto extends WriteMode { val name = "AUTO" }
  case object Create extends WriteMode { val name = "CREATE" }
  case object Add extends WriteMode { val name = "ADD" }
  case object Append extends WriteMode { val name = "APPEND" }
  case object Chrono extends WriteMode { val name = "CHRONO" }
  case object Replace extends WriteMode { val name = "REPLACE" }
  case object Merge extends WriteMode { val name = "MERGE" }
  case object Delete extends WriteMode { val name = "DELETE" }
  val all: Seq[WriteMode] = Seq(Auto, Create, Add, Append, Chrono, Replace, Merge, Delete)
  def fromName(n: String): WriteMode =
    all.find(_.name == n).getOrElse(throw new IllegalArgumentException(s"unknown WriteMode $n"))
}

/**
 * Table data-file content type — reference ContentType (types/media.py:7-32)
 * re-expressed as Spark datasource format + options. TSV/PSV ride the csv
 * datasource with a different delimiter (their files still carry Spark's
 * .csv extension). Avro and Feather (Arrow IPC) have no Spark datasource on
 * this distribution, so Graft ships its own V1 FileFormats
 * (org.apache.spark.sql.graft.formats.{AvroFileFormat, FeatherFileFormat},
 * registered as "avro"/"feather" via DataSourceRegister) built on the
 * avro-core and arrow-vector libraries that ARE on the classpath.
 */
sealed trait ContentType {
  def name: String
  def format: String
  def extension: String
  def writeOptions: Map[String, String] = Map.empty
  def readOptions: Map[String, String] = writeOptions
}
object ContentType {
  /** Round-trip-safe null sentinel for delimited text formats. */
  private val NullToken = "\\N"
  case object Parquet extends ContentType {
    val name = "parquet"; val format = "parquet"; val extension = ".parquet"
  }
  case object Csv extends ContentType {
    val name = "csv"; val format = "csv"; val extension = ".csv"
    override val writeOptions = Map("header" -> "false", "nullValue" -> NullToken)
  }
  case object Tsv extends ContentType {
    val name = "tsv"; val format = "csv"; val extension = ".csv"
    override val writeOptions = Map("header" -> "false", "sep" -> "\t", "nullValue" -> NullToken)
  }
  /** Reference UNESCAPED_TSV (media.py:32; write quoting_style="none",
    * pyarrow.py:689-693): raw tab-delimited values, quote/escape handling
    * disabled in both directions (Spark maps an empty quote/escape option
    * to the NUL char, which turns univocity quoting off). */
  case object UnescapedTsv extends ContentType {
    val name = "unescaped_tsv"; val format = "csv"; val extension = ".csv"
    override val writeOptions = Map("header" -> "false", "sep" -> "\t",
      "nullValue" -> NullToken, "quote" -> "", "escape" -> "")
  }
  case object Psv extends ContentType {
    val name = "psv"; val format = "csv"; val extension = ".csv"
    override val writeOptions = Map("header" -> "false", "sep" -> "|", "nullValue" -> NullToken)
  }
  case object Json extends ContentType {
    val name = "json"; val format = "json"; val extension = ".json"
  }
  case object Orc extends ContentType {
    val name = "orc"; val format = "orc"; val extension = ".orc"
  }
  case object Avro extends ContentType {
    val name = "avro"; val format = "avro"; val extension = ".avro"
  }
  case object Feather extends ContentType {
    val name = "feather"; val format = "feather"; val extension = ".feather"
  }
  val all: Seq[ContentType] =
    Seq(Parquet, Csv, Tsv, UnescapedTsv, Psv, Json, Orc, Avro, Feather)
  def fromName(n: String): ContentType =
    all.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"unknown content type $n"))
}

/** Per-table schema evolution policy — reference types/tables.py:574-587. */
sealed trait SchemaEvolutionMode { def name: String }
object SchemaEvolutionMode {
  case object Auto extends SchemaEvolutionMode { val name = "AUTO" }
  case object Manual extends SchemaEvolutionMode { val name = "MANUAL" }
  case object Disabled extends SchemaEvolutionMode { val name = "DISABLED" }
  val all: Seq[SchemaEvolutionMode] = Seq(Auto, Manual, Disabled)
  def fromName(n: String): SchemaEvolutionMode =
    all.find(_.name == n).getOrElse(Auto)
}

/** Read-time optimization: MAX = read-optimized (compact eagerly), else merge-on-read.
  * Reference types/tables.py:627-651. */
sealed trait ReadOptimizationLevel
object ReadOptimizationLevel {
  case object Max extends ReadOptimizationLevel
  case object MergeOnRead extends ReadOptimizationLevel
}

/**
 * Partition transforms — Iceberg-compatible set, reference
 * storage/model/transform.py:11-343. Each compiles to a Catalyst Column so
 * Spark's partition pruning and codegen apply with no custom Expression.
 */
sealed trait Transform {
  def name: String
  /** Compile to a Spark column over the source column. */
  def apply(c: Column): Column
  /** Type-aware variant: transforms whose semantics depend on the source
    * type (truncate) override this; callers with schema access use it. */
  def apply(c: Column, dt: DataType): Column = apply(c)
}
object Transform {
  case object Identity extends Transform {
    val name = "identity"
    def apply(c: Column): Column = c
  }
  /** Hash-bucketing; Spark murmur3 `hash` + pmod. Nulls land in bucket 0
    * (reference primary_key_index.py:375-381 sends nulls to bucket 0). */
  final case class Bucket(n: Int) extends Transform {
    val name = s"bucket[$n]"
    def apply(c: Column): Column =
      when(c.isNull, lit(0)).otherwise(pmod(hash(c), lit(n)))
  }
  /** SHA-1-digest bucketing for exact parity with the reference's default
    * PK-hash strategy (primary_key_index.py:26-59, 375-381: bucket =
    * int(sha1_hex, 16) % n, nulls → 0). The 160-bit digest is reduced mod n
    * by Horner's rule over three hex chunks (15+15+10 digits), keeping every
    * intermediate product under 2^62 — long-safe under ANSI mode. */
  final case class BucketSha1(n: Int) extends Transform {
    val name = s"bucket_sha1[$n]"
    def apply(c: Column): Column = {
      val k15 = (BigInt(16).pow(15) mod BigInt(n)).toLong
      val k10 = (BigInt(16).pow(10) mod BigInt(n)).toLong
      val h = sha1(c.cast(StringType))
      def chunk(start: Int, len: Int): Column =
        conv(substring(h, start, len), 16, 10).cast(LongType)
      val m1 = pmod(chunk(1, 15), lit(n.toLong))
      val m2 = pmod(m1 * lit(k15) + chunk(16, 15), lit(n.toLong))
      val m3 = pmod(m2 * lit(k10) + chunk(31, 10), lit(n.toLong))
      when(c.isNull, lit(0)).otherwise(m3.cast(IntegerType))
    }
  }
  /** Iceberg-STRATEGY murmur3 bucketing (reference BucketingStrategy.ICEBERG,
    * transform.py:32-41) — the spec-exact single-value hash the Iceberg
    * interop binding writes (graft.interop.IcebergHash, Appendix B
    * vector-tested), so a graft table partitioned this way carries bucket
    * assignments an Iceberg engine reproduces bit-for-bit. Unlike [[Bucket]]
    * /[[BucketSha1]] (reference DEFAULT strategy: nulls → bucket 0), a null
    * source transforms to NULL — Iceberg semantics. */
  final case class BucketIceberg(n: Int) extends Transform {
    require(n > 0, s"bucket_iceberg[$n]: n must be positive")
    val name = s"bucket_iceberg[$n]"
    def apply(c: Column): Column = apply(c, StringType)
    override def apply(c: Column, dt: DataType): Column =
      graft.interop.IceTransform.BucketT(n).column(c, dt)
  }
  /** Truncate per the Iceberg spec (reference transform.py:157-250):
    * numerics truncate to `v - (((v % W) + W) % W)` (== pmod), strings to the
    * first W characters. The untyped overload assumes string input. */
  final case class Truncate(width: Int) extends Transform {
    val name = s"truncate[$width]"
    def apply(c: Column): Column = substring(c, 1, width)
    override def apply(c: Column, dt: DataType): Column = dt match {
      case ByteType | ShortType | IntegerType | LongType | _: DecimalType =>
        c - pmod(c, lit(width))
      case _ => substring(c.cast(StringType), 1, width)
    }
  }
  /** Time transforms evaluate over the UTC wall-clock of an instant column
    * (round-11): `year()` et al. are SESSION-zone functions, and a derived
    * partition value that depends on the writer session's zone would make
    * sessions (or mixed-zone cluster jobs) disagree on a row's partition —
    * same rule as the Iceberg spec's UTC-based transforms, and a no-op in
    * the UTC sessions every Graft entry point pins. NTZ/date inputs are
    * zone-free already; the untyped overload (no type info) keeps the
    * session function. */
  private def utcPinned(c: Column, dt: DataType)(f: Column => Column): Column = dt match {
    case TimestampType => f(graft.interop.IceTransform.utcWallClock(c, dt))
    case _ => f(c)
  }
  case object Year extends Transform {
    val name = "year"; def apply(c: Column): Column = year(c)
    override def apply(c: Column, dt: DataType): Column = utcPinned(c, dt)(year)
  }
  case object Month extends Transform {
    val name = "month"; def apply(c: Column): Column = month(c)
    override def apply(c: Column, dt: DataType): Column = utcPinned(c, dt)(month)
  }
  case object Day extends Transform {
    val name = "day"; def apply(c: Column): Column = dayofmonth(c)
    override def apply(c: Column, dt: DataType): Column = utcPinned(c, dt)(dayofmonth)
  }
  case object Hour extends Transform {
    val name = "hour"; def apply(c: Column): Column = hour(c)
    override def apply(c: Column, dt: DataType): Column = utcPinned(c, dt)(hour)
  }
  case object Void extends Transform {
    val name = "void"; def apply(c: Column): Column = lit(null)
  }

  def fromName(n: String): Transform = n match {
    case "identity" => Identity
    case "year" => Year
    case "month" => Month
    case "day" => Day
    case "hour" => Hour
    case "void" => Void
    case b if b.startsWith("bucket_sha1[") => BucketSha1(b.stripPrefix("bucket_sha1[").stripSuffix("]").toInt)
    case b if b.startsWith("bucket_iceberg[") => BucketIceberg(b.stripPrefix("bucket_iceberg[").stripSuffix("]").toInt)
    case b if b.startsWith("bucket[") => Bucket(b.stripPrefix("bucket[").stripSuffix("]").toInt)
    case t if t.startsWith("truncate[") => Truncate(t.stripPrefix("truncate[").stripSuffix("]").toInt)
    case other => throw new IllegalArgumentException(s"unknown transform $other")
  }
}

/** A partition key: source field + transform — reference partition.py:489-680. */
final case class PartitionKey(field: String, transform: Transform = Transform.Identity) {
  /** Name of the derived partition column in the physical layout. The source
    * column always stays in the data files; the derived copy is what
    * `partitionBy` consumes (and drops), so explicit-file-list reads never
    * lose a column to directory encoding. */
  def partitionColumnName: String =
    s"_g_p_${field}_${transform.name.replaceAll("[^A-Za-z0-9_]", "_")}"
  def column(src: Column): Column = transform(src)
  def column(src: Column, dt: DataType): Column = transform(src, dt)
}

final case class PartitionScheme(keys: Seq[PartitionKey]) {
  def isEmpty: Boolean = keys.isEmpty
}
object PartitionScheme { val unpartitioned: PartitionScheme = PartitionScheme(Nil) }

/** Sort key with null ordering — reference sort_key.py:19-114. */
final case class SortKey(
    field: String,
    ascending: Boolean = true,
    nullsFirst: Boolean = false,
    transform: Transform = Transform.Identity) {
  def toColumn: Column = {
    val c = transform(col(field))
    (ascending, nullsFirst) match {
      case (true, true)   => c.asc_nulls_first
      case (true, false)  => c.asc_nulls_last
      case (false, true)  => c.desc_nulls_first
      case (false, false) => c.desc_nulls_last
    }
  }
}

final case class SortScheme(keys: Seq[SortKey]) { def isEmpty: Boolean = keys.isEmpty }
object SortScheme { val unsorted: SortScheme = SortScheme(Nil) }

/**
 * Field-level metadata carried in Spark StructField.metadata — the analog of
 * the reference's Arrow-field metadata (schema.py:244-357).
 */
object FieldMeta {
  val FieldId = "graft.field_id"
  val MergeKey = "graft.is_merge_key"
  val MergeOrder = "graft.merge_order"  // "ASC"|"DESC"
  val EventTime = "graft.is_event_time"
  val PastDefault = "graft.past_default"    // backfill default for old rows
  val FutureDefault = "graft.future_default" // fill for writes omitting the column
  val Consistency = "graft.consistency"     // "none"|"coerce"|"validate"
  val RenamedFrom = "graft.renamed_from"    // comma-joined prior names (newest first)

  def field(
      name: String,
      dt: DataType,
      nullable: Boolean = true,
      fieldId: Option[Int] = None,
      mergeKey: Boolean = false,
      eventTime: Boolean = false,
      pastDefault: Option[String] = None,
      mergeOrder: Option[String] = None,
      futureDefault: Option[String] = None,
      /** Per-field write-time consistency policy — reference
        * SchemaConsistencyType (storage/model/types.py:137-152): "validate"
        * rejects writes whose incoming column type differs from the declared
        * type; "coerce" (the default when absent) casts. */
      consistency: Option[String] = None): StructField = {
    val b = new MetadataBuilder()
    fieldId.foreach(id => b.putLong(FieldId, id.toLong))
    if (mergeKey) b.putBoolean(MergeKey, true)
    if (eventTime) b.putBoolean(EventTime, true)
    pastDefault.foreach(d => b.putString(PastDefault, d))
    mergeOrder.foreach(o => b.putString(MergeOrder, o))
    futureDefault.foreach(d => b.putString(FutureDefault, d))
    consistency.foreach { c =>
      require(Set("none", "coerce", "validate")(c), s"unknown consistency type: $c")
      b.putString(Consistency, c)
    }
    StructField(name, dt, nullable, b.build())
  }

  def isMergeKey(f: StructField): Boolean =
    f.metadata.contains(MergeKey) && f.metadata.getBoolean(MergeKey)
  def isEventTime(f: StructField): Boolean =
    f.metadata.contains(EventTime) && f.metadata.getBoolean(EventTime)
  def fieldId(f: StructField): Option[Long] =
    if (f.metadata.contains(FieldId)) Some(f.metadata.getLong(FieldId)) else None
  def pastDefault(f: StructField): Option[String] =
    if (f.metadata.contains(PastDefault)) Some(f.metadata.getString(PastDefault)) else None
  def futureDefault(f: StructField): Option[String] =
    if (f.metadata.contains(FutureDefault)) Some(f.metadata.getString(FutureDefault)) else None
  /** Consistency policy of a field; "coerce" when undeclared. */
  def consistencyOf(f: StructField): String =
    if (f.metadata.contains(Consistency)) f.metadata.getString(Consistency) else "coerce"
  /** Prior names of a renamed field, newest first. */
  def renamedFrom(f: StructField): Seq[String] =
    if (f.metadata.contains(RenamedFrom))
      f.metadata.getString(RenamedFrom).split(",").filter(_.nonEmpty).toSeq
    else Nil

  /** Stamp a rename breadcrumb onto a field being renamed. */
  def withRename(f: StructField, newName: String): StructField = {
    val chain = (f.name +: renamedFrom(f)).mkString(",")
    val b = new MetadataBuilder().withMetadata(f.metadata)
    b.putString(RenamedFrom, chain)
    f.copy(name = newName, metadata = b.build())
  }

  def mergeKeys(s: StructType): Seq[String] = s.fields.filter(isMergeKey).map(_.name).toSeq
  def eventTimeFields(s: StructType): Seq[String] = s.fields.filter(isEventTime).map(_.name).toSeq

  def mergeOrderOf(f: StructField): Option[String] =
    if (f.metadata.contains(MergeOrder)) Some(f.metadata.getString(MergeOrder)) else None

  /** Winner-selection keys among rows with equal merge keys — reference
    * schema.py:1018-1046 `merge_order_sort_keys`: explicit merge_order fields
    * take precedence (ASC = smallest value wins, DESC = largest wins); if
    * none are declared but an event-time field exists, the latest event wins.
    * Returns (fieldName, keepLargest) pairs; empty = pure commit order. */
  def mergeOrderKeys(s: StructType): Seq[(String, Boolean)] = {
    val explicit = s.fields.flatMap(f => mergeOrderOf(f).map(o => (f.name, o == "DESC"))).toSeq
    if (explicit.nonEmpty) explicit
    else eventTimeFields(s).map(n => (n, true))
  }

  /** Merge keys must be non-float primitives — reference schema.py:468-494. */
  def validateMergeKey(f: StructField): Unit = f.dataType match {
    case FloatType | DoubleType =>
      throw new IllegalArgumentException(s"merge key ${f.name} cannot be a floating-point type")
    case _: ArrayType | _: MapType | _: StructType =>
      throw new IllegalArgumentException(s"merge key ${f.name} cannot be a nested type")
    case _ => ()
  }
}

/**
 * Type promotion lattice for AUTO schema evolution — explicit Spark analog of
 * Arrow's `unify_schemas(promote_options="permissive")` (reference
 * schema.py:671-804). `promote(a,b)` returns the widened type both can cast to
 * losslessly, or None if incompatible.
 */
object TypePromotion {
  private val intOrder: Map[DataType, Int] =
    Map(ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)

  def promote(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (x, y) if intOrder.contains(x) && intOrder.contains(y) =>
      Some(if (intOrder(x) >= intOrder(y)) x else y)
    case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
    case (x, FloatType) if intOrder.contains(x) => Some(DoubleType)
    case (FloatType, y) if intOrder.contains(y) => Some(DoubleType)
    case (x, DoubleType) if intOrder.contains(x) => Some(DoubleType)
    case (DoubleType, y) if intOrder.contains(y) => Some(DoubleType)
    case (x: DecimalType, y: DecimalType) =>
      val scale = math.max(x.scale, y.scale)
      val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
      val p = math.min(DecimalType.MAX_PRECISION, intDigits + scale)
      Some(DecimalType(p, scale))
    case (DateType, TimestampType) | (TimestampType, DateType) => Some(TimestampType)
    case (ArrayType(x, n1), ArrayType(y, n2)) =>
      promote(x, y).map(e => ArrayType(e, n1 || n2))
    // Nested structs unify field-wise by name (reference schema.py:319-321
    // models nested field paths; pa.unify_schemas promote_options="permissive"
    // widens inside structs): shared fields promote recursively, fields
    // present on only one side are kept and become nullable (the other side's
    // rows read null there).
    case (x: StructType, y: StructType) =>
      val yByName = y.fields.map(f => f.name -> f).toMap
      val xNames = x.fieldNames.toSet
      val merged = x.fields.map { xf =>
        yByName.get(xf.name) match {
          case Some(yf) =>
            promote(xf.dataType, yf.dataType)
              .map(dt => xf.copy(dataType = dt, nullable = xf.nullable || yf.nullable))
          case None => Some(xf.copy(nullable = true))
        }
      }
      if (merged.contains(None)) None
      else {
        val appended = y.fields.filterNot(f => xNames.contains(f.name)).map(_.copy(nullable = true))
        Some(StructType(merged.flatten ++ appended))
      }
    case (MapType(kx, vx, n1), MapType(ky, vy, n2)) =>
      for { k <- promote(kx, ky); v <- promote(vx, vy) } yield MapType(k, v, n1 || n2)
    case (StringType, _) | (_, StringType) => Some(StringType)
    case _ => None
  }

  /** Unify a target (table) schema with an incoming write schema.
    * New fields are appended; existing fields widen per the lattice.
    *
    * `widenNullability` (round-11): a declared NOT NULL is a CONTRACT —
    * an incoming frame being merely *typed* nullable (every parquet read
    * is) must not silently erase it, so the WRITE path passes false and
    * enforces values instead (write-time null check); only an explicit
    * `alterTable(newSchema)` may relax the declaration (passes true).
    * Before this, the first parquet-sourced write flipped declared
    * non-nullable merge keys to nullable — quietly voiding the contract
    * (and every plan optimization keyed on it, e.g. the zipper's
    * partitioning-reusing equi-join). */
  def unify(table: StructType, incoming: StructType,
      widenNullability: Boolean = true): StructType = {
    val tableNames = table.fieldNames.toSet
    val widened = table.fields.map { tf =>
      incoming.fields.find(_.name == tf.name) match {
        case Some(inf) =>
          val dt = promote(tf.dataType, inf.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"incompatible schema change for ${tf.name}: ${tf.dataType} vs ${inf.dataType}"))
          tf.copy(dataType = dt,
            nullable = if (widenNullability) tf.nullable || inf.nullable else tf.nullable)
        case None => tf
      }
    }
    val added = incoming.fields.filterNot(f => tableNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(widened ++ added)
  }

  /** Structurally coerce a column of type `from` to type `to`. Spark's `cast`
    * cannot add/drop struct fields (it requires equal field counts), so an
    * evolved nested schema needs the struct rebuilt field-by-field by NAME:
    * shared fields conform recursively, fields absent from `from` become
    * typed nulls. Falls back to a plain `cast` wherever the shape already
    * lines up — the common (non-evolving) write stays fully codegen'd; the
    * lambda-based array/map rebuild only appears on writes that actually
    * reshape a nested struct. */
  def conform(c: Column, from: DataType, to: DataType): Column = (from, to) match {
    case (f, t) if f == t => c
    case (fs: StructType, ts: StructType) if needsRebuild(fs, ts) =>
      val fByName = fs.fields.map(x => x.name -> x).toMap
      val rebuilt = struct(ts.fields.toIndexedSeq.map { tf =>
        fByName.get(tf.name) match {
          case Some(ff) => conform(c.getField(tf.name), ff.dataType, tf.dataType).as(tf.name)
          case None => lit(null).cast(tf.dataType).as(tf.name)
        }
      }: _*)
      // struct(...) of a null struct would yield a row of nulls, not null.
      when(c.isNull, lit(null)).otherwise(rebuilt).cast(ts)
    case (ArrayType(fe, _), ArrayType(te, _)) if needsRebuild(fe, te) =>
      transform(c, e => conform(e, fe, te)).cast(to)
    case (MapType(fk, fv, _), MapType(tk, tv, _))
        if needsRebuild(fk, tk) || needsRebuild(fv, tv) =>
      val keyed =
        if (needsRebuild(fk, tk)) transform_keys(c, (k, _) => conform(k, fk, tk)) else c
      (if (needsRebuild(fv, tv)) transform_values(keyed, (_, v) => conform(v, fv, tv))
       else keyed).cast(to)
    case _ => c.cast(to)
  }

  /** True when a struct somewhere under (from → to) changes its field SET —
    * the case plain `cast` cannot express. */
  private def needsRebuild(from: DataType, to: DataType): Boolean = (from, to) match {
    case (fs: StructType, ts: StructType) =>
      !sameShape(fs, ts) ||
        fs.fields.zip(ts.fields).exists { case (a, b) => needsRebuild(a.dataType, b.dataType) }
    case (ArrayType(fe, _), ArrayType(te, _)) => needsRebuild(fe, te)
    case (MapType(fk, fv, _), MapType(tk, tv, _)) =>
      needsRebuild(fk, tk) || needsRebuild(fv, tv)
    case _ => false
  }

  private def sameShape(a: StructType, b: StructType): Boolean =
    a.fieldNames.sameElements(b.fieldNames)
}
