package graft.interop

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Apache Iceberg table-format binding — the `StreamFormat.ICEBERG` foreign
 * stream format (reference storage/model/types.py:32-38) and the snapshot
 * commit the reference's converter performs through pyiceberg
 * (compute/converter/pyiceberg/update_snapshot_overrides.py,
 * overrides.py). No Iceberg runtime jar exists in this environment, so
 * this speaks the PUBLIC table spec (iceberg.apache.org/spec, v2)
 * directly: JSON table metadata under `metadata/`, avro manifest lists and
 * manifests (field-ids riding as avro field props), parquet data and
 * delete files.
 *
 * Reader: current or pinned snapshot, schema from the snapshot's
 * schema-id, POSITION deletes (file_path, pos) applied as an anti-join on
 * parquet `_metadata` row indexes, EQUALITY deletes applied as null-safe
 * anti-joins gated by sequence number (a delete only hits data files with
 * a strictly smaller data sequence). Partition pruning happens against
 * manifest-entry partition values before any data file is opened.
 *
 * Writer: create (v2), append snapshots, and `commitPositionDeletes` — the
 * converter's snapshot commit: written as a `delete` snapshot whose
 * manifest carries content=1 (position deletes) entries. Metadata versions
 * commit atomically by hard-link, same discipline as the Delta binding.
 */
object Iceberg {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  // --------------------------------------------------------------- model

  /** One manifest-entry data/delete file, flattened. */
  final case class FileEntry(
      status: Int, // 0 existing / 1 added / 2 deleted
      content: Int, // 0 data / 1 position deletes / 2 equality deletes
      path: String,
      format: String,
      partition: Map[String, String], // identity partition values, stringified
      recordCount: Long,
      sizeBytes: Long,
      sequenceNumber: Long,
      equalityIds: Seq[Int],
      /** Per-field-id column bounds/null counts (spec manifest fields
        * 125/128/110) — the data-skipping index; empty when the writer
        * recorded none. */
      lowerBounds: Map[Int, Array[Byte]] = Map.empty,
      upperBounds: Map[Int, Array[Byte]] = Map.empty,
      nullCounts: Map[Int, Long] = Map.empty,
      nanCounts: Map[Int, Long] = Map.empty)

  final case class TableMeta(
      formatVersion: Int,
      location: String,
      tableUuid: String,
      schema: StructType,
      fieldIds: Map[String, Int], // top-level name -> iceberg field id
      lastColumnId: Int,
      /** Full default partition spec — identity AND transform fields
        * (bucket[n]/truncate[w]/year/month/day/hour/void). */
      specFields: Seq[IceSpecField],
      specId: Int,
      snapshots: Seq[SnapshotMeta],
      currentSnapshotId: Option[Long],
      lastSequenceNumber: Long,
      version: Int) { // metadata file version (vN.metadata.json)
    /** identity-transform source names (the legacy partition surface). */
    def partitionCols: Seq[String] = specFields.collect {
      case IceSpecField(_, src, _, IceTransform.IdentityT) => src
    }
  }

  final case class SnapshotMeta(
      snapshotId: Long, timestampMs: Long, sequenceNumber: Long,
      manifestList: String, operation: String)

  private def metaDir(table: String): JPath = Paths.get(table, "metadata")

  // ---------------------------------------------------------------- read

  /** Load current table metadata (version-hint, else newest vN file). */
  def loadMeta(table: String): TableMeta = {
    val dir = metaDir(table)
    require(Files.isDirectory(dir), s"not an Iceberg table (no metadata dir): $table")
    val hint = dir.resolve("version-hint.text")
    val version: Int =
      if (Files.exists(hint)) new String(Files.readAllBytes(hint), StandardCharsets.UTF_8).trim.toInt
      else {
        val s = Files.list(dir)
        try s.iterator().asScala.map(_.getFileName.toString)
          .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
            n.stripPrefix("v").stripSuffix(".metadata.json").toInt }
          .maxOption.getOrElse(throw new IllegalArgumentException(
            s"no vN.metadata.json under $dir"))
        finally s.close()
      }
    parseMeta(mapper.readTree(Files.readAllBytes(dir.resolve(s"v$version.metadata.json"))),
      table, version)
  }

  private def parseMeta(root: JsonNode, table: String, version: Int): TableMeta = {
    val fv = root.get("format-version").asInt()
    require(fv == 1 || fv == 2, s"unsupported iceberg format-version $fv")
    val schemaNode: JsonNode =
      if (root.has("schemas")) {
        val cur = root.get("current-schema-id").asInt()
        root.get("schemas").elements().asScala
          .find(_.get("schema-id").asInt() == cur)
          .getOrElse(throw new IllegalArgumentException(s"current-schema-id $cur not found"))
      } else root.get("schema")
    val (schema, ids) = schemaFromJson(schemaNode)

    val (specId, specFs): (Int, Seq[IceSpecField]) =
      if (root.has("partition-specs")) {
        val cur = root.get("default-spec-id").asInt()
        val spec = root.get("partition-specs").elements().asScala
          .find(_.get("spec-id").asInt() == cur)
          .getOrElse(throw new IllegalArgumentException(s"default-spec-id $cur not found"))
        (cur, parseSpecFields(spec.get("fields"), ids))
      } else if (root.has("partition-spec"))
        (0, parseSpecFields(root.get("partition-spec"), ids))
      else (0, Nil)

    val snaps = Option(root.get("snapshots")).toSeq
      .flatMap(_.elements().asScala).map { s =>
        SnapshotMeta(
          s.get("snapshot-id").asLong(),
          s.get("timestamp-ms").asLong(),
          Option(s.get("sequence-number")).map(_.asLong()).getOrElse(0L),
          s.get("manifest-list").asText(),
          Option(s.get("summary")).flatMap(n => Option(n.get("operation")))
            .map(_.asText()).getOrElse("append"))
      }
    TableMeta(
      fv,
      Option(root.get("location")).map(_.asText()).getOrElse(table),
      Option(root.get("table-uuid")).map(_.asText()).getOrElse(""),
      schema, ids,
      Option(root.get("last-column-id")).map(_.asInt()).getOrElse(ids.values.maxOption.getOrElse(0)),
      specFs, specId, snaps,
      Option(root.get("current-snapshot-id")).map(_.asLong()).filter(_ != -1L),
      Option(root.get("last-sequence-number")).map(_.asLong()).getOrElse(0L),
      version)
  }

  /** Full spec-field parse: every transform is modeled ([[IceTransform]]);
    * an unrecognized transform string stays opaque (readable, unprunable,
    * unwritable). A source id absent from the CURRENT schema (dropped
    * column) yields no spec field. */
  private def parseSpecFields(fields: JsonNode, ids: Map[String, Int]): Seq[IceSpecField] = {
    val byId = ids.map(_.swap)
    fields.elements().asScala.toSeq.zipWithIndex.flatMap { case (f, i) =>
      byId.get(f.get("source-id").asInt()).map { src =>
        val tr = IceTransform.parse(f.get("transform").asText())
        IceSpecField(
          Option(f.get("name")).map(_.asText()).getOrElse(tr.fieldName(src)),
          src,
          Option(f.get("field-id")).map(_.asInt()).getOrElse(1000 + i),
          tr)
      }
    }
  }

  /** Iceberg schema JSON -> (StructType, top-level field ids). */
  def schemaFromJson(node: JsonNode): (StructType, Map[String, Int]) = {
    val fields = node.get("fields").elements().asScala.toSeq
    val ids = Map.newBuilder[String, Int]
    val st = StructType(fields.map { f =>
      val name = f.get("name").asText()
      ids += name -> f.get("id").asInt()
      StructField(name, typeFromJson(f.get("type")), nullable = !f.get("required").asBoolean())
    })
    (st, ids.result())
  }

  def typeFromJson(t: JsonNode): DataType =
    if (t.isTextual) t.asText() match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "time" => LongType // micros since midnight; no TimeType in Spark
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "string" | "uuid" => StringType
      case "binary" => BinaryType
      case s if s.startsWith("fixed") => BinaryType
      case s if s.startsWith("decimal") =>
        val Array(p, sc) = s.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
        DecimalType(p, sc)
      case other => throw new UnsupportedOperationException(s"iceberg type $other")
    } else t.get("type").asText() match {
      case "struct" => schemaFromJson(t)._1
      case "list" =>
        ArrayType(typeFromJson(t.get("element")), containsNull = !t.get("element-required").asBoolean())
      case "map" =>
        require(typeFromJson(t.get("key")) == StringType, "iceberg map: only string keys supported")
        MapType(StringType, typeFromJson(t.get("value")),
          valueContainsNull = !t.get("value-required").asBoolean())
      case other => throw new UnsupportedOperationException(s"iceberg nested type $other")
    }

  /** All file entries of a snapshot (manifest list -> manifests). Driver
    * work is one small avro read per manifest — parallelized past a
    * threshold, same policy as the catalog's footer reads.
    *
    * `statFilters` (translated from the caller's row predicate) prune DATA
    * entries by their manifest bounds AT THE MANIFEST READER — in the
    * distributed branch the pruning runs in executors and only survivors
    * return to the driver, with their bounds maps stripped (already
    * served), so a selective read of a 10^7-file table never materializes
    * the full entry set driver-side. Delete entries (content != 0) are
    * never pruned — a skipped delete file would resurrect rows. */
  def fileEntries(spark: SparkSession, meta: TableMeta, snap: SnapshotMeta,
      statFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
      partPreds: Seq[IcebergPartPrune.Pred] = Nil): Seq[FileEntry] =
    fileEntriesOf(spark, meta,
      readManifestList(resolvePath(snap.manifestList, meta.location)),
      statFilters, partPreds)

  private def fileEntriesOf(spark: SparkSession, meta: TableMeta,
      manifests: Seq[(String, Long)],
      statFilters: Seq[org.apache.spark.sql.sources.Filter],
      partPreds: Seq[IcebergPartPrune.Pred]): Seq[FileEntry] = {
    // capture only serializable, entry-local state (not TableMeta)
    val schema = meta.schema
    val idToName = meta.fieldIds.map(_.swap)
    val fs = statFilters
    val pp = partPreds
    val lists: Seq[Seq[FileEntry]] =
      if (manifests.size <= 16)
        manifests.map { case (mPath, mSeq) =>
          keepAndStrip(readManifest(resolvePath(mPath, meta.location), mSeq),
            fs, pp, idToName, schema)
        }
      else {
        val loc = meta.location
        spark.sparkContext
          .parallelize(manifests, math.min(manifests.size, 64).toInt)
          .map { case (mPath, mSeq) =>
            keepAndStrip(readManifest(resolvePath(mPath, loc), mSeq),
              fs, pp, idToName, schema) }
          .collect().toSeq
      }
    lists.flatten.filter(_.status != 2)
  }

  /** Manifest-entry keep/strip kernel, shared by the driver, the
    * distributed fileEntries branch, and the gated planner — survivors of
    * the derived-partition + bounds prunes, with served bounds maps
    * stripped. Delete entries (content != 0) are never pruned. */
  private def keepAndStrip(entries: Seq[FileEntry],
      fs: Seq[org.apache.spark.sql.sources.Filter],
      pp: Seq[IcebergPartPrune.Pred],
      idToName: Map[Int, String], schema: StructType): Seq[FileEntry] =
    if (fs.isEmpty && pp.isEmpty) entries
    else entries.flatMap { e =>
      if (e.content != 0) Some(e)
      else if (!IcebergPartPrune.keep(pp, e.partition)) None
      else if (fs.isEmpty) Some(e)
      else {
        val st = entryColStats(e, idToName, schema)
        val keep = st.isEmpty ||
          fs.forall(f => graft.catalog.StatsSkip.keep(f, schema, st, e.recordCount))
        if (!keep) None
        else Some(e.copy(lowerBounds = Map.empty, upperBounds = Map.empty,
          nullCounts = Map.empty, nanCounts = Map.empty))
      }
    }

  /** (manifest_path, sequence_number) pairs from a manifest-list avro. */
  private def readManifestList(path: String): Seq[(String, Long)] = {
    val reader = DataFileReader.openReader(
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.map { r =>
      val seq = Option(r.get("sequence_number")).map(_.asInstanceOf[Long]).getOrElse(0L)
      (r.get("manifest_path").toString, seq)
    }.toSeq
    finally reader.close()
  }

  /** Flattened entries of one manifest avro; null sequence numbers inherit
    * the manifest's (spec: sequence-number inheritance for added files). */
  private def readManifest(path: String, manifestSeq: Long): Seq[FileEntry] = {
    val reader = DataFileReader.openReader(
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.map { r =>
      val status = r.get("status").asInstanceOf[Int]
      val seq = Option(r.get("sequence_number")).map(_.asInstanceOf[Long]).getOrElse(manifestSeq)
      val df = r.get("data_file").asInstanceOf[GenericRecord]
      val content = Option(df.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
      val partition = Option(df.get("partition")).map(_.asInstanceOf[GenericRecord]) match {
        case Some(p) => p.getSchema.getFields.asScala.map { f =>
          f.name() -> Option(p.get(f.pos())).map(_.toString).orNull
        }.toMap
        case None => Map.empty[String, String]
      }
      val eqIds = Option(df.get("equality_ids")).toSeq.flatMap(
        _.asInstanceOf[java.util.Collection[_]].asScala.map(_.asInstanceOf[Int]))
      // bounds maps: spec serializes int-keyed maps as arrays of key/value
      // records (logicalType map); some writers use a real Avro map
      def kvBytes(name: String): Map[Int, Array[Byte]] =
        kvMap(df, name) { v =>
          val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
          val a = new Array[Byte](bb.remaining()); bb.get(a); a
        }
      FileEntry(status, content,
        df.get("file_path").toString,
        Option(df.get("file_format")).map(_.toString).getOrElse("PARQUET"),
        partition,
        Option(df.get("record_count")).map(_.asInstanceOf[Long]).getOrElse(0L),
        Option(df.get("file_size_in_bytes")).map(_.asInstanceOf[Long]).getOrElse(0L),
        seq, eqIds,
        lowerBounds = kvBytes("lower_bounds"),
        upperBounds = kvBytes("upper_bounds"),
        nullCounts = kvMap(df, "null_value_counts")(_.asInstanceOf[Long]),
        nanCounts = kvMap(df, "nan_value_counts")(_.asInstanceOf[Long]))
    }.toSeq
    finally reader.close()
  }

  /** Read a manifest's int-keyed map field in either physical shape. */
  private def kvMap[V](df: GenericRecord, field: String)(conv: AnyRef => V): Map[Int, V] = {
    if (df.getSchema.getField(field) == null) return Map.empty
    Option(df.get(field)) match {
      case Some(c: java.util.Collection[_]) =>
        c.asScala.flatMap {
          case r: GenericRecord =>
            try Some(r.get("key").asInstanceOf[Int] -> conv(r.get("value")))
            catch { case _: Exception => None }
          case _ => None
        }.toMap
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.flatMap { case (k, v) =>
          try Some(k.toString.toInt -> conv(v.asInstanceOf[AnyRef]))
          catch { case _: Exception => None }
        }.toMap
      case _ => Map.empty
    }
  }

  // ---- single-value serialization (Iceberg spec, "Binary single-value
  // serialization"): fixed-width little-endian numerics, UTF-8 strings,
  // int days / long micros for date/timestamp, big-endian unscaled decimal.
  private[graft] def boundBytes(dt: DataType, canonical: String): Option[Array[Byte]] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    try dt match {
      case IntegerType | ShortType | ByteType =>
        Some(le(4).putInt(new java.math.BigDecimal(canonical).intValueExact).array)
      case LongType => Some(le(8).putLong(new java.math.BigDecimal(canonical).longValueExact).array)
      case FloatType => Some(le(4).putFloat(canonical.toFloat).array)
      case DoubleType => Some(le(8).putDouble(canonical.toDouble).array)
      case StringType => Some(canonical.getBytes(StandardCharsets.UTF_8))
      case BooleanType => Some(Array[Byte](if (canonical.toBoolean) 1 else 0))
      case DateType =>
        Some(le(4).putInt(java.time.LocalDate.parse(canonical).toEpochDay.toInt).array)
      case TimestampType | TimestampNTZType =>
        graft.catalog.StatCodec.parseCanonicalMicros(canonical).map(m => le(8).putLong(m).array)
      case d: DecimalType =>
        Some(new java.math.BigDecimal(canonical).setScale(d.scale).unscaledValue.toByteArray)
      case _ => None
    } catch { case _: Exception => None }
  }

  private[graft] def boundCanonical(dt: DataType, b: Array[Byte]): Option[String] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    try dt match {
      case IntegerType | ShortType | ByteType if b.length == 4 => Some(le.getInt.toString)
      case LongType if b.length == 8 => Some(le.getLong.toString)
      case FloatType if b.length == 4 =>
        // widened to double — Spark's mixed float/double comparison semantics
        val f = le.getFloat; if (f.isNaN || f.isInfinite) None else Some(f.doubleValue.toString)
      case DoubleType if b.length == 8 =>
        val d = le.getDouble; if (d.isNaN || d.isInfinite) None else Some(d.toString)
      case StringType =>
        Some(new String(b, StandardCharsets.UTF_8))
          .filter(_.length <= graft.catalog.StatCodec.MaxLen)
      case BooleanType if b.length == 1 => Some((b(0) != 0).toString)
      case DateType if b.length == 4 => graft.catalog.StatCodec.formatDate(le.getInt.toLong)
      case TimestampType | TimestampNTZType if b.length == 8 =>
        graft.catalog.StatCodec.formatMicros(le.getLong)
      case d: DecimalType =>
        Some(new java.math.BigDecimal(new java.math.BigInteger(b), d.scale).toPlainString)
      case _ => None
    } catch { case _: Exception => None }
  }

  /** A manifest entry's bounds → canonical per-LOGICAL-name ColStats. */
  private def entryColStats(e: FileEntry, idToName: Map[Int, String],
      schema: StructType): Map[String, graft.txn.ColStat] = {
    val ids = e.lowerBounds.keySet ++ e.upperBounds.keySet ++ e.nullCounts.keySet
    ids.flatMap { id =>
      for {
        name <- idToName.get(id)
        f <- schema.fields.find(_.name == name)
      } yield {
        // float/double bounds EXCLUDE NaN per spec while Spark orders NaN
        // above everything — only trust them when the writer recorded
        // nan_value_counts == 0 for the column
        val fpUnsafe = (f.dataType == FloatType || f.dataType == DoubleType) &&
          !e.nanCounts.get(id).contains(0L)
        val mn = if (fpUnsafe) None
          else e.lowerBounds.get(id).flatMap(boundCanonical(f.dataType, _))
        val mx = if (fpUnsafe) None
          else e.upperBounds.get(id).flatMap(boundCanonical(f.dataType, _))
        val nc = e.nullCounts.getOrElse(id, -1L)
        // one-sided bounds only when the column is provably all-null
        if (mn.isDefined != mx.isDefined) name -> graft.txn.ColStat(null, null, nc)
        else name -> graft.txn.ColStat(mn.orNull, mx.orNull, nc)
      }
    }.toMap
  }

  private def resolvePath(p: String, location: String): String = {
    val stripped = p.stripPrefix("file:")
    if (stripped.startsWith("/")) stripped
    else Paths.get(location).resolve(stripped).toString
  }

  /** Default foreign-planning gate: ~64 MB of manifest avro — roughly the
    * scale where a surviving-entry list starts to matter on a driver heap
    * (10^6+ entries). Same role as the native ManifestPlanner's size gate
    * (c77); callers (and tests) pass a lower value to force the gated
    * path. */
  val DefaultPlanGateManifestBytes: Long = 64L << 20

  /** Distributed (gated) foreign-Iceberg planner: manifests stream through
    * an executor job where the derived-partition + bounds prunes AND the
    * caller's identity partitionFilter all evaluate; the driver gets back
    * (1) the delete entries — bounded by the table's live delete-file
    * count, needed whole for delete application — and (2) ONLY the
    * post-prune surviving data-file (path, sequenceNumber) pairs. Nothing
    * proportional to the pre-prune entry count ever materializes
    * driver-side, which is what removes the 10^7-entry ceiling the
    * driver-side path (and pyiceberg, reference parity) has. */
  private def gatedPlan(spark: SparkSession, meta: TableMeta,
      manifests: Seq[(String, Long)],
      statFilters: Seq[org.apache.spark.sql.sources.Filter],
      partPreds: Seq[IcebergPartPrune.Pred],
      partitionFilter: Option[Column])
      : (Seq[FileEntry], Seq[FileEntry], Seq[(String, Long)]) = {
    val loc = meta.location
    val schema = meta.schema
    val idToName = meta.fieldIds.map(_.swap)
    val fs = statFilters
    val pp = partPreds
    val partCols = meta.partitionCols
    val entryRdd = spark.sparkContext
      .parallelize(manifests, math.min(math.max(manifests.size, 1), 64).toInt)
      .flatMap { case (mPath, mSeq) =>
        keepAndStrip(readManifest(resolvePath(mPath, loc), mSeq),
          fs, pp, idToName, schema).filter(_.status != 2)
      }
      // two actions below (deletes collect + survivor collect) — cache the
      // stripped survivors rather than re-reading every manifest avro
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      val deletes = entryRdd.filter(_.content != 0).collect().toSeq
      import spark.implicits._
      val pvDf = entryRdd.filter(_.content == 0)
        .map(e => (e.path, e.sequenceNumber, e.format,
          partCols.map(c => e.partition.getOrElse(c, null))))
        .toDF("path", "_g_seq", "format", "pv")
      val kept = partitionFilter match {
        case Some(pred) => prunePartitionDf(pvDf, partCols, schema, pred)
        case None => pvDf
      }
      val survivors = kept.select("path", "_g_seq", "format")
        .as[(String, Long, String)].collect().toSeq
      val badFormats = survivors.map(_._3).filterNot(_.equalsIgnoreCase("PARQUET")).distinct
      require(badFormats.isEmpty,
        s"only PARQUET data files supported, saw $badFormats")
      (deletes.filter(_.content == 1), deletes.filter(_.content == 2),
        survivors.map(t => (t._1, t._2)))
    } finally entryRdd.unpersist(blocking = false)
  }

  /** Typed identity-partition pruning, shared by the driver and gated
    * planners. `pvDf` carries a `pv` array of the spec-source columns'
    * STRINGIFIED manifest partition values; each decodes via
    * [[decodePartValue]] — accepting our own writer's hive-dir rendering
    * AND the Iceberg spec's raw integral encodings (date = days from
    * epoch, timestamp = micros), since a foreign manifest's avro values
    * stringify to the latter — and the caller's predicate evaluates per
    * file. FAIL-OPEN: a non-null spelling that decodes to null KEEPS the
    * file (an unknown foreign rendering must never prune a matching row),
    * while a genuinely-null partition value (hive default dir / avro
    * null) evaluates as SQL NULL through the predicate, exactly like the
    * rows it describes would. */
  private[graft] def prunePartitionDf(pvDf: DataFrame, partCols: Seq[String],
      schema: StructType, pred: Column): DataFrame = {
    val typed = partCols.zipWithIndex.foldLeft(pvDf) { case (df, (c, i)) =>
      df.withColumn(s"_g_raw_$c", element_at(col("pv"), i + 1))
        .withColumn(c, decodePartValue(element_at(col("pv"), i + 1), schema(c).dataType))
    }
    val undecodable = partCols.map(c => col(s"_g_raw_$c").isNotNull && col(c).isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    typed.where(pred || undecodable)
  }

  /** One manifest partition-value spelling → typed value; null = cannot
    * decode (the caller keeps such files). A PURE-DIGIT spelling is the
    * spec's raw integral encoding (date = days from epoch, timestamp =
    * epoch micros) and NEVER a date/timestamp literal — Spark's cast
    * would otherwise read "19729" as year 19729. try_cast throughout —
    * an ANSI cast would THROW planning off a single foreign spelling. */
  private[graft] def decodePartValue(c: Column, dt: DataType): Column = {
    val isIntegral = c.rlike("^-?[0-9]+$")
    dt match {
      case DateType =>
        when(isIntegral, date_add(to_date(lit("1970-01-01")), c.try_cast(IntegerType)))
          .otherwise(c.try_cast(DateType))
      case TimestampType =>
        when(isIntegral, timestamp_micros(c.try_cast(LongType)))
          .otherwise(c.try_cast(TimestampType))
      case TimestampNTZType =>
        // Iceberg NTZ partition micros are ZONE-LESS wall-clock micros.
        // timestamp_micros builds an instant and TimestampType→NTZ casts
        // render it in the SESSION zone — in any non-UTC session the value
        // would shift by the zone offset and an identity partitionFilter
        // could silently prune matching files. Build the wall-clock from
        // pure integer arithmetic instead (exact, zone-free; `div` is
        // Spark's IntegralDivide, exact on the already-remainder-free
        // numerator): days + micros-of-day → y/m/d/h/min/sec.
        when(isIntegral, {
          val us = c.try_cast(LongType)
          val dayUs = lit(86400000000L)
          val rem = pmod(us, dayUs)
          val dayNum = call_function("div", us - rem, dayUs)
          val d = date_add(to_date(lit("1970-01-01")), dayNum.try_cast(IntegerType))
          val h = call_function("div", rem, lit(3600000000L)).cast(IntegerType)
          val mi = pmod(call_function("div", rem, lit(60000000L)), lit(60L)).cast(IntegerType)
          val secs = (pmod(rem, lit(60000000L)).cast(DecimalType(16, 6)) / lit(1000000L))
            .cast(DecimalType(16, 6))
          try_make_timestamp_ntz(year(d), month(d), dayofmonth(d), h, mi, secs)
        }).otherwise(c.try_cast(TimestampNTZType))
      case other => c.try_cast(other)
    }
  }

  /** Snapshot read with position + equality deletes applied and partition
    * pruning against manifest partition values. */
  def read(
      spark: SparkSession, table: String,
      snapshotId: Option[Long] = None, asOfTimestampMs: Option[Long] = None,
      partitionFilter: Option[Column] = None,
      /** Row predicate: applied to the result AND evaluated against each
        * manifest entry's column bounds to skip data files at planning.
        * Delete files are never skipped (they must keep masking). */
      dataFilter: Option[Column] = None,
      /** Planning gate: when the snapshot's manifest avros total more
        * bytes than this, the survivor set stays in a Spark job end-to-end
        * — derived-partition + bounds prunes AND the identity
        * partitionFilter evaluate executor-side, and the driver
        * materializes only the post-prune (path, sequence) list plus the
        * delete entries (bounded by the table's live delete-file count).
        * That is the same boundary the native ManifestPlanner accepts:
        * Spark's scan needs the surviving path list. Below the gate the
        * driver path is cheaper (no job launch). */
      planGateManifestBytes: Long = DefaultPlanGateManifestBytes): DataFrame = {
    val meta = loadMeta(table)
    val snap = pickSnapshot(meta, snapshotId, asOfTimestampMs).getOrElse(
      return emptyFrame(spark, meta.schema))
    // bounds-based data skipping AND transform-derived partition pruning
    // run inside the manifest readers (and in executors past the
    // distribution threshold) — survivors only
    val statFilters = dataFilter.map(graft.catalog.StatsSkip.translate).getOrElse(Nil)
    val partPreds = IcebergPartPrune.derive(statFilters, meta.specFields, meta.schema)
    require(partitionFilter.isEmpty || meta.partitionCols.nonEmpty,
      s"partitionFilter given but $table has no identity partition fields — " +
        "the filter would be silently dropped; transform-partitioned fields " +
        "(bucket/day/…) prune via dataFilter derivation instead")

    val manifests = readManifestList(resolvePath(snap.manifestList, meta.location))
    val manifestBytes = manifests.map { case (p, _) =>
      val f = new java.io.File(resolvePath(p, meta.location))
      if (f.exists) f.length else 0L
    }.sum
    val (posDeletes, eqDeletes, dataFiles: Seq[(String, Long)]) =
      if (manifestBytes > planGateManifestBytes)
        gatedPlan(spark, meta, manifests, statFilters, partPreds, partitionFilter)
      else {
        val entries = fileEntriesOf(spark, meta, manifests, statFilters, partPreds)
        var data = entries.filter(_.content == 0)
        partitionFilter.foreach { pred =>
          // evaluate the predicate once per distinct partition tuple via a
          // tiny local frame — no data file is opened for pruned partitions
          if (data.nonEmpty) {
            import spark.implicits._
            val pvDf = data.map(e =>
              (e.path, meta.partitionCols.map(c => e.partition.getOrElse(c, null))))
              .toDF("path", "pv")
            val keep = prunePartitionDf(pvDf, meta.partitionCols, meta.schema, pred)
              .select("path").as[String].collect().toSet
            data = data.filter(e => keep.contains(e.path))
          }
        }
        require(data.forall(_.format.equalsIgnoreCase("PARQUET")),
          s"only PARQUET data files supported, saw ${data.map(_.format).distinct}")
        (entries.filter(_.content == 1), entries.filter(_.content == 2),
          data.map(e => (e.path, e.sequenceNumber)))
      }
    // (bounds-based data skipping already happened inside the planners)
    if (dataFiles.isEmpty) return emptyFrame(spark, meta.schema)

    val paths = dataFiles.map(t => resolvePath(t._1, meta.location))
    var df = readDataFilesById(spark, meta, paths)

    if (posDeletes.nonEmpty || eqDeletes.nonEmpty) {
      if (posDeletes.nonEmpty) {
        val del = spark.read
          .schema(StructType(Seq(
            StructField("file_path", StringType), StructField("pos", LongType))))
          .parquet(posDeletes.map(e => resolvePath(e.path, meta.location)): _*)
          .select(normPath(col("file_path")).as("_g_path"), col("pos").as("_g_pos"))
        df = df.join(del, Seq("_g_path", "_g_pos"), "left_anti")
      }
      if (eqDeletes.nonEmpty) {
        // per equality-id set: delete rows of data files whose data sequence
        // number is STRICTLY below the delete file's sequence number
        val idToName = meta.fieldIds.map(_.swap)
        val seqMap = dataFiles.map(t => (resolvePath(t._1, meta.location), t._2))
        import spark.implicits._
        val seqDf = broadcast(seqMap.toDF("_g_spath", "_g_seq")
          .select(normPath(col("_g_spath")).as("_g_path"), col("_g_seq")))
        df = df.join(seqDf, Seq("_g_path"))
        for ((ids, files) <- eqDeletes.groupBy(_.equalityIds.toSet)) {
          val cols = ids.toSeq.sorted.map(id => idToName.getOrElse(id,
            throw new IllegalArgumentException(s"equality_id $id not in schema")))
          val delSchema = StructType(cols.map(c => meta.schema(c)))
          for (f <- files) {
            val del = spark.read.schema(delSchema)
              .parquet(resolvePath(f.path, meta.location))
              .select(cols.map(c => col(c).as(s"_d_$c")): _*).distinct()
            val cond = cols.map(c => df(c) <=> del(s"_d_$c")).reduce(_ && _) &&
              df("_g_seq") < lit(f.sequenceNumber)
            df = df.join(del, cond, "left_anti")
          }
        }
        df = df.drop("_g_seq")
      }
      df = df.drop("_g_path", "_g_pos")
    }
    val out = df.select(meta.schema.fieldNames.map(col): _*)
    // stats skipping is file-granular; the row predicate still applies
    dataFilter.foldLeft(out)((d, p) => d.where(p))
  }

  /** Scan data files resolving top-level columns by Iceberg FIELD ID (the
    * spec's rule — name matching silently misreads tables whose columns
    * were renamed): per-file parquet footers give (id -> written name);
    * files group by that signature — one scan per distinct signature,
    * which is almost always one — each renamed back to the current schema
    * and unioned. A column id absent from a file (added after the file was
    * written) projects null; files with NO recorded ids (foreign non-
    * Iceberg writers) fall back to name matching. Footer reads follow the
    * usual driver-under-16 / distributed-above policy. Lineage columns
    * `_g_path`/`_g_pos` are materialized inside each scan so delete
    * application works across the union. */
  private def readDataFilesById(
      spark: SparkSession, meta: TableMeta, paths: Seq[String]): DataFrame = {
    val wanted: Seq[(StructField, Int)] =
      meta.schema.fields.toSeq.map(f => f -> meta.fieldIds(f.name))
    val footers = InteropUtil.parquetFieldIds(spark, paths)
    // signature: the written physical name per wanted field (None = absent)
    def sig(p: String): Seq[Option[String]] = {
      val byId = footers.getOrElse(p, Map.empty)
      if (byId.isEmpty) wanted.map { case (f, _) => Some(f.name) } // name fallback
      else wanted.map { case (_, id) => byId.get(id) }
    }
    val groups = paths.groupBy(sig)
    val scans = groups.toSeq.map { case (s, groupPaths) =>
      val readSchema = StructType(wanted.zip(s).collect {
        case ((f, _), Some(phys)) => StructField(phys, f.dataType, nullable = true)
      })
      val scan = spark.read.schema(readSchema).parquet(groupPaths: _*)
      val cols = wanted.zip(s).map {
        case ((f, _), Some(phys)) => col(phys).as(f.name)
        case ((f, _), None) => lit(null).cast(f.dataType).as(f.name)
      }
      scan.select(cols :+ normPath(col("_metadata.file_path")).as("_g_path")
        :+ col("_metadata.row_index").as("_g_pos"): _*)
    }
    scans.reduce(_ union _)
  }

  private def pickSnapshot(
      meta: TableMeta, snapshotId: Option[Long], asOf: Option[Long]): Option[SnapshotMeta] =
    snapshotId match {
      case Some(id) => Some(meta.snapshots.find(_.snapshotId == id)
        .getOrElse(throw new IllegalArgumentException(s"snapshot $id not found")))
      case None => asOf match {
        case Some(ts) =>
          val ok = meta.snapshots.filter(_.timestampMs <= ts)
          if (ok.isEmpty) None else Some(ok.maxBy(_.timestampMs))
        case None => meta.currentSnapshotId.flatMap(id => meta.snapshots.find(_.snapshotId == id))
      }
    }

  private def emptyFrame(spark: SparkSession, schema: StructType): DataFrame =
    InteropUtil.emptyFrame(spark, schema)

  private def normPath(c: Column): Column = InteropUtil.normPath(c)

  /** Spark's parquet writer records this as the column's field id. */
  private def fieldIdMeta(id: Int): org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", id.toLong).build()

  // --------------------------------------------------------------- write

  /** Create an empty v2 table. Field ids are assigned 1..n in schema order
    * (nested fields get ids after all top-level ones, depth-first).
    *
    * `partitionCols` are identity-partition sources; `partitionSpec` adds
    * non-identity (source, transform) pairs — `"bucket[4]"`,
    * `"truncate[10]"`, `"year" | "month" | "day" | "hour"`, `"void"` —
    * with spec-default field names (`key_bucket`, `ts_day`, …). Transforms
    * are validated against the source type here, before any metadata is
    * written. */
  def createTable(table: String, schema: StructType, partitionCols: Seq[String] = Nil,
      partitionSpec: Seq[(String, String)] = Nil): TableMeta = {
    require(partitionCols.forall(schema.fieldNames.contains),
      s"partition cols $partitionCols not all in schema")
    val transformFields = partitionSpec.map { case (src, trStr) =>
      require(schema.fieldNames.contains(src), s"partition source $src not in schema")
      val tr = IceTransform.parse(trStr)
      tr match {
        case IceTransform.UnknownT(raw) =>
          throw new IllegalArgumentException(s"unknown partition transform '$raw'")
        case IceTransform.IdentityT => // allowed; joins the identity family
        case t =>
          // fail fast on transform/type mismatches (hour over date, bucket
          // over double, …) — column() performs the validation
          t.column(col(src), schema(src).dataType)
      }
      (src, tr)
    }
    val allSpecs: Seq[(String, String, IceTransform)] =
      partitionCols.map(c => (c, c, IceTransform.IdentityT: IceTransform)) ++
        transformFields.map { case (src, tr) => (tr.fieldName(src), src, tr) }
    require(allSpecs.map(_._1).distinct.size == allSpecs.size,
      s"duplicate partition field names in ${allSpecs.map(_._1)}")
    val dir = metaDir(table)
    require(!Files.exists(dir.resolve("version-hint.text")), s"Iceberg table exists: $table")
    Files.createDirectories(dir)
    val idCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    val root = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", java.util.UUID.randomUUID().toString)
    root.put("location", Paths.get(table).toAbsolutePath.toString)
    root.put("last-sequence-number", 0L)
    root.put("last-updated-ms", System.currentTimeMillis())
    val (schemaJson, topIds) = schemaToJson(schema, idCounter)
    root.put("last-column-id", idCounter.get())
    root.put("current-schema-id", 0)
    root.set("schemas", mapper.createArrayNode().add(schemaJson))
    val spec = mapper.createObjectNode()
    spec.put("spec-id", 0)
    val specFieldsArr = mapper.createArrayNode()
    allSpecs.zipWithIndex.foreach { case ((name, src, tr), i) =>
      val f = mapper.createObjectNode()
      f.put("name", name); f.put("transform", tr.json)
      f.put("source-id", topIds(src)); f.put("field-id", 1000 + i)
      specFieldsArr.add(f)
    }
    spec.set("fields", specFieldsArr)
    root.set("partition-specs", mapper.createArrayNode().add(spec))
    root.put("default-spec-id", 0)
    val order = mapper.createObjectNode()
    order.put("order-id", 0); order.set("fields", mapper.createArrayNode())
    root.set("sort-orders", mapper.createArrayNode().add(order))
    root.put("default-sort-order-id", 0)
    root.set("snapshots", mapper.createArrayNode())
    root.put("current-snapshot-id", -1L)
    root.set("properties", mapper.createObjectNode())
    writeMetadataVersion(table, 1, root)
    loadMeta(table)
  }

  private def schemaToJson(
      schema: StructType, counter: java.util.concurrent.atomic.AtomicInteger)
      : (ObjectNode, Map[String, Int]) = {
    val node = mapper.createObjectNode()
    node.put("type", "struct"); node.put("schema-id", 0)
    val arr = mapper.createArrayNode()
    val top = Map.newBuilder[String, Int]
    // two passes: top-level ids first (stable, spec-friendly), nested after
    val topAssigned = schema.fields.map(f => f -> counter.incrementAndGet())
    topAssigned.foreach { case (f, id) =>
      top += f.name -> id
      val fn = mapper.createObjectNode()
      fn.put("id", id); fn.put("name", f.name); fn.put("required", !f.nullable)
      fn.set("type", typeToJson(f.dataType, counter))
      arr.add(fn)
    }
    node.set("fields", arr)
    (node, top.result())
  }

  private def typeToJson(
      dt: DataType, counter: java.util.concurrent.atomic.AtomicInteger): JsonNode = dt match {
    case BooleanType => textNode("boolean")
    case ByteType | ShortType | IntegerType => textNode("int")
    case LongType => textNode("long")
    case FloatType => textNode("float")
    case DoubleType => textNode("double")
    case DateType => textNode("date")
    case TimestampNTZType => textNode("timestamp")
    case TimestampType => textNode("timestamptz")
    case StringType => textNode("string")
    case BinaryType => textNode("binary")
    case d: DecimalType => textNode(s"decimal(${d.precision}, ${d.scale})")
    case ArrayType(e, nullable) =>
      val n = mapper.createObjectNode()
      n.put("type", "list"); n.put("element-id", counter.incrementAndGet())
      n.put("element-required", !nullable); n.set("element", typeToJson(e, counter)); n
    case MapType(StringType, v, nullable) =>
      val n = mapper.createObjectNode()
      n.put("type", "map")
      n.put("key-id", counter.incrementAndGet()); n.set("key", textNode("string"))
      n.put("value-id", counter.incrementAndGet()); n.put("value-required", !nullable)
      n.set("value", typeToJson(v, counter)); n
    case st: StructType =>
      val n = mapper.createObjectNode()
      n.put("type", "struct")
      val arr = mapper.createArrayNode()
      st.fields.foreach { f =>
        val fn = mapper.createObjectNode()
        fn.put("id", counter.incrementAndGet()); fn.put("name", f.name)
        fn.put("required", !f.nullable); fn.set("type", typeToJson(f.dataType, counter))
        arr.add(fn)
      }
      n.set("fields", arr); n
    case other => throw new UnsupportedOperationException(s"iceberg: unsupported type $other")
  }

  private def textNode(s: String) = mapper.getNodeFactory.textNode(s)

  /** Append `df` as one snapshot: stage parquet data files into `data/`,
    * write a manifest + manifest list, commit metadata vN+1. Returns the
    * new snapshot id. */
  def append(df: DataFrame, table: String): Long = {
    // compatible evolution instead of a shape gate (the spec's valid
    // updates): new nullable columns, int→long / float→double /
    // decimal-precision widening, required→optional. Anything else —
    // narrowing, dropping a required column, struct reshapes — still
    // fails loudly before any data is staged.
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType.sql)).sortBy(_._1).toSeq
    val meta = {
      val m = loadMeta(table)
      if (shape(df.schema) == shape(m.schema)) m
      else { evolveSchema(table, df.schema); loadMeta(table) }
    }
    val root = Paths.get(meta.location)
    val dataDir = root.resolve("data")
    Files.createDirectories(dataDir)
    val staging = Files.createTempDirectory(root, "_iceberg_staging_")
    val written = try {
      // Iceberg data files are COMPLETE (identity partition columns are
      // stored in the file, unlike hive/delta layouts) — partition on an
      // aliased copy so Spark's partitionBy doesn't strip the real column.
      // Directory names are internal; file_path in the manifest is
      // authoritative per the spec. Field ids ride into the parquet
      // footers (spec REQUIRES them; readers match columns by id).
      // align to the (possibly evolved) table schema: absent optional
      // columns pad null, narrower-typed inputs cast up
      val base = df.select(meta.schema.fields.map { f =>
        (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
         else lit(null).cast(f.dataType))
          .as(f.name, fieldIdMeta(meta.fieldIds(f.name)))
      }: _*)
      // each spec field becomes a computed partition column (identity: the
      // source itself; bucket/time/truncate: the spec-exact transform Column)
      val aliased = meta.specFields.foldLeft(base)((d, sf) =>
        d.withColumn(s"_p_${sf.name}",
          sf.transform.column(col(sf.source), meta.schema(sf.source).dataType)))
      // Iceberg FORBIDS int96 timestamps (spec: timestamps are int64 micros)
      InteropUtil.withMicrosTimestamps(df.sparkSession) {
        val w = aliased.write.mode("overwrite")
        (if (meta.specFields.nonEmpty)
          w.partitionBy(meta.specFields.map(sf => s"_p_${sf.name}"): _*)
         else w).parquet(staging.toString)
      }
      InteropUtil.moveStagedParquet(staging, dataDir)
    } finally InteropUtil.deleteRecursively(staging)
    // per-file partition tuples: from the aliased hive dirs, keyed by spec
    // FIELD name (transform values are the stringified transform results)
    val specNames = meta.specFields.map(_.name).toSet
    val files = written.map { case (rel, size) =>
      val pv = rel.split('/').dropRight(1).flatMap { seg =>
        seg.split("=", 2) match {
          case Array(k, v) if k.startsWith("_p_") && specNames.contains(k.drop(3)) =>
            // un-hive-escape: the manifest must carry the REAL value or
            // partition pruning silently drops matching rows
            Some(k.drop(3) -> (if (v == "__HIVE_DEFAULT_PARTITION__") null
            else InteropUtil.unescapeHive(v)))
          case _ => None
        }
      }.toMap
      AddedFile(dataDir.resolve(rel).toString, 0, pv, size)
    }
    commitSnapshot(df.sparkSession, meta, files, "append")
  }

  /** Legal type promotions (spec "Schema Evolution"). */
  private def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (d1: DecimalType, d2: DecimalType) => d1.scale == d2.scale && d2.precision >= d1.precision
    case _ => false
  }

  /** Commit a compatibly-evolved schema as metadata vN+1 (new schema-id,
    * `TypePromotion`'s catalog-side analog for the foreign format): kept
    * fields keep their JSON nodes VERBATIM — nested field ids must survive
    * or id-based column resolution breaks on old files — with only the
    * primitive type text widened / `required` relaxed; new fields append
    * with fresh ids past last-column-id. Struct-typed fields must match
    * exactly (nested evolution needs full nested-id bookkeeping this
    * binding does not do). Readers project old files through the new
    * schema by field id, so no data file is touched. */
  def evolveSchema(table: String, dfSchema: StructType): Unit = {
    val meta = loadMeta(table)
    val dir = metaDir(meta.location)
    meta.schema.fields.foreach { tf =>
      require(dfSchema.fieldNames.contains(tf.name) || tf.nullable,
        s"append would leave required column ${tf.name} unwritten")
    }
    val root = mapper.readTree(Files.readAllBytes(
      dir.resolve(s"v${meta.version}.metadata.json"))).asInstanceOf[ObjectNode]
    val curNode: JsonNode =
      if (root.has("schemas"))
        root.get("schemas").elements().asScala
          .find(_.get("schema-id").asInt() == root.get("current-schema-id").asInt()).get
      else root.get("schema")
    val newSchema = curNode.deepCopy[ObjectNode]()
    val counter = new java.util.concurrent.atomic.AtomicInteger(meta.lastColumnId)

    newSchema.withArray[ArrayNode]("fields").elements().asScala.foreach { fn =>
      val o = fn.asInstanceOf[ObjectNode]
      val name = o.get("name").asText()
      dfSchema.fields.find(_.name == name).foreach { dfF =>
        val cur = meta.schema(name).dataType
        if (cur != dfF.dataType) {
          if (canWiden(cur, dfF.dataType))
            o.set[JsonNode]("type", typeToJson(dfF.dataType, counter)) // primitive: no ids consumed
          else require(canWiden(dfF.dataType, cur),
            s"incompatible type change for $name: $cur -> ${dfF.dataType}")
        }
        if (o.get("required").asBoolean() && dfF.nullable) o.put("required", false)
      }
    }
    dfSchema.fields.filterNot(f => meta.schema.fieldNames.contains(f.name)).foreach { f =>
      require(f.nullable, s"new column ${f.name} must be nullable (add-optional evolution)")
      val fn = mapper.createObjectNode()
      fn.put("id", counter.incrementAndGet())
      fn.put("name", f.name)
      fn.put("required", false)
      fn.set[JsonNode]("type", typeToJson(f.dataType, counter))
      newSchema.withArray[ArrayNode]("fields").add(fn)
    }

    val newSchemaId =
      (if (root.has("schemas"))
        root.get("schemas").elements().asScala.map(_.get("schema-id").asInt()).max
      else 0) + 1
    newSchema.put("schema-id", newSchemaId)
    if (!root.has("schemas")) {
      val old = curNode.deepCopy[ObjectNode]()
      if (!old.has("schema-id")) old.put("schema-id", 0)
      root.set[JsonNode]("schemas", mapper.createArrayNode().add(old))
    }
    root.withArray[ArrayNode]("schemas").add(newSchema)
    root.put("current-schema-id", newSchemaId)
    root.put("last-column-id", counter.get())
    if (root.has("schema")) root.set[JsonNode]("schema", newSchema) // v1 compat
    root.put("last-updated-ms", System.currentTimeMillis())
    writeMetadataVersion(meta.location, meta.version + 1, root)
  }

  /** The converter's Iceberg snapshot commit (reference
    * update_snapshot_overrides.py `commit_replace_snapshot` /
    * `append_delete_files_override`): publish (file_path, pos) position
    * deletes — e.g. `Converter.equalityToPositionDeletes` output — as a
    * `delete` snapshot. Returns the new snapshot id. */
  def commitPositionDeletes(spark: SparkSession, table: String, posDeletes: DataFrame): Long = {
    val meta = loadMeta(table)
    commitSnapshot(spark, meta, writePosDeleteFiles(posDeletes, meta), "delete")
  }

  /** Write a (file_path, pos) frame as spec-shaped position-delete parquet
    * under `data/`, returning the manifest entries to commit. */
  private def writePosDeleteFiles(posDeletes: DataFrame, meta: TableMeta): Seq[AddedFile] = {
    val root = Paths.get(meta.location)
    val delDir = root.resolve("data")
    Files.createDirectories(delDir)
    val staging = Files.createTempDirectory(root, "_iceberg_staging_")
    val written = try {
      posDeletes // spec-reserved field ids for position-delete columns
        .select(col("file_path").cast(StringType).as("file_path", fieldIdMeta(2147483546)),
          col("pos").cast(LongType).as("pos", fieldIdMeta(2147483545)))
        .sort("file_path", "pos") // spec: position deletes sorted by (path, pos)
        .write.mode("overwrite").parquet(staging.toString)
      InteropUtil.moveStagedParquet(staging, delDir)
    } finally InteropUtil.deleteRecursively(staging)
    written.map { case (rel, size) =>
      AddedFile(delDir.resolve(rel).toString, 1, Map.empty, size)
    }
  }

  /** Publish EQUALITY deletes: any data row (in files of a strictly older
    * data sequence) whose `keyCols` match a row of `deleteKeys` is deleted
    * on read — the delete shape the reference's converter consumes
    * (converter_session.py; equality_ids in the manifest entry). */
  def commitEqualityDeletes(
      spark: SparkSession, table: String, deleteKeys: DataFrame, keyCols: Seq[String]): Long = {
    val meta = loadMeta(table)
    require(keyCols.nonEmpty && keyCols.forall(meta.fieldIds.contains),
      s"keyCols $keyCols must be top-level schema fields")
    val root = Paths.get(meta.location)
    val delDir = root.resolve("data")
    Files.createDirectories(delDir)
    val staging = Files.createTempDirectory(root, "_iceberg_staging_")
    val written = try {
      InteropUtil.withMicrosTimestamps(spark) {
        deleteKeys.select(keyCols.map(c =>
            col(c).as(c, fieldIdMeta(meta.fieldIds(c)))): _*).distinct()
          .write.mode("overwrite").parquet(staging.toString)
      }
      InteropUtil.moveStagedParquet(staging, delDir)
    } finally InteropUtil.deleteRecursively(staging)
    val ids = keyCols.map(meta.fieldIds)
    val files = written.map { case (rel, size) =>
      AddedFile(delDir.resolve(rel).toString, 2, Map.empty, size, ids)
    }
    commitSnapshot(spark, meta, files, "delete")
  }

  private final case class AddedFile(
      absPath: String, content: Int, partition: Map[String, String], sizeBytes: Long,
      equalityIds: Seq[Int] = Nil)

  /** Write manifest + manifest list + metadata vN+1 (atomic via link).
    *
    * `removePaths` (absolute, resolved) makes this a REPLACE-shaped commit:
    * any prior manifest that references a removed file is rewritten for the
    * new snapshot — removed entries become status=2 (DELETED) tombstones
    * stamped with the new snapshot id, survivors become status=0 (EXISTING)
    * with their sequence numbers made explicit (the spec's inheritance only
    * covers ADDED entries). Untouched manifests carry through by reference,
    * so the rewrite cost is proportional to the manifests actually hit.
    * Rewrites copy raw records under each manifest's own embedded schema —
    * foreign writers' extra fields (column stats, split offsets) survive. */
  private def commitSnapshot(
      spark: SparkSession, meta: TableMeta, files: Seq[AddedFile], op: String,
      removePaths: Set[String] = Set.empty): Long = {
    val dir = metaDir(meta.location)
    val snapshotId = math.abs(java.util.UUID.randomUUID().getLeastSignificantBits)
    val seq = meta.lastSequenceNumber + 1
    val commitUuid = java.util.UUID.randomUUID().toString
    // record_count is a REQUIRED, meaningful field (foreign planners size
    // scans from it) — one footer pass serves it AND the column bounds
    // (null counts + single-value min/max) that foreign planners data-skip on
    val footerInfo = InteropUtil.parquetFooterStats(spark, files.map(_.absPath))
    val rowCounts = footerInfo.map { case (p, (n, _)) => p -> n }

    // partition record schema: identity values ride as nullable strings
    // (readers stringify anyway); transform results ride TYPED (int/long),
    // the shape foreign Iceberg writers produce. `day` carries the spec's
    // `date` logical type annotation.
    val partSchema: AvroSchema = {
      val fields = meta.specFields.map { sf =>
        val srcType = meta.schema.fields.find(_.name == sf.source)
          .map(_.dataType).getOrElse(StringType)
        val inner = sf.transform.avroKind(srcType) match {
          case "int" =>
            val s = AvroSchema.create(AvroSchema.Type.INT)
            if (sf.transform == IceTransform.DayT) s.addProp("logicalType", "date")
            s
          case "long" => AvroSchema.create(AvroSchema.Type.LONG)
          case _ => AvroSchema.create(AvroSchema.Type.STRING)
        }
        val f = new AvroSchema.Field(sf.name,
          AvroSchema.createUnion(AvroSchema.create(AvroSchema.Type.NULL), inner),
          null, AvroSchema.Field.NULL_DEFAULT_VALUE)
        f.addProp("field-id", sf.fieldId: Integer)
        f
      }
      val rec = AvroSchema.createRecord("r102", null, "iceberg", false)
      rec.setFields(java.util.Arrays.asList(fields: _*))
      rec
    }
    /** stringified partition value -> the field's typed avro form */
    def typedPartValue(field: String, v: String): AnyRef =
      if (v == null) null
      else partSchema.getField(field).schema().getTypes.asScala
        .find(_.getType != AvroSchema.Type.NULL).map(_.getType) match {
        case Some(AvroSchema.Type.INT) => Integer.valueOf(v)
        case Some(AvroSchema.Type.LONG) => java.lang.Long.valueOf(v)
        case _ => v
      }

    // manifest
    val manifestPath = dir.resolve(s"$commitUuid-m0.avro")
    val entrySchema = manifestEntrySchema(partSchema)
    val dataFileSchema = entrySchema.getField("data_file").schema()
    if (files.nonEmpty) locally {
      val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
      writer.setMeta("format-version", "2")
      writer.setMeta("content", if (files.exists(_.content != 0)) "deletes" else "data")
      writer.create(entrySchema, manifestPath.toFile)
      try files.foreach { f =>
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1) // added
        e.put("snapshot_id", snapshotId)
        e.put("sequence_number", seq)
        e.put("file_sequence_number", seq)
        val d = new GenericData.Record(dataFileSchema)
        d.put("content", f.content)
        d.put("file_path", f.absPath)
        d.put("file_format", "PARQUET")
        val p = new GenericData.Record(partSchema)
        f.partition.foreach { case (k, v) =>
          if (partSchema.getField(k) != null) p.put(k, typedPartValue(k, v))
        }
        d.put("partition", p)
        d.put("record_count", rowCounts.getOrElse(f.absPath, 0L))
        d.put("file_size_in_bytes", f.sizeBytes)
        // column stats for DATA files (delete files carry none): field-id
        // keyed null counts + single-value serialized bounds
        if (f.content == 0) {
          val st = footerInfo.get(f.absPath).map(_._2).getOrElse(Map.empty)
          val byId = st.toSeq.flatMap { case (name, cs) =>
            for (id <- meta.fieldIds.get(name); fd <- meta.schema.fields.find(_.name == name))
              yield (id, fd.dataType, cs)
          }
          def kvList(field: String, entries: Seq[(Int, AnyRef)]): Unit =
            if (entries.nonEmpty) {
              val arrSchema = dataFileSchema.getField(field).schema()
                .getTypes.asScala.find(_.getType == AvroSchema.Type.ARRAY).get
              val lst = new java.util.ArrayList[GenericRecord]()
              entries.foreach { case (k, v) =>
                val r = new GenericData.Record(arrSchema.getElementType)
                r.put("key", k); r.put("value", v); lst.add(r)
              }
              d.put(field, new GenericData.Array(arrSchema, lst))
            }
          kvList("null_value_counts",
            byId.filter(_._3.nulls >= 0).map(t => (t._1, Long.box(t._3.nulls))))
          // bounds we write are NaN-free (a NaN-polluted footer column is
          // dropped upstream) — record nan_value_counts=0 so readers,
          // including ourselves, may trust the float/double bounds
          kvList("nan_value_counts", byId.collect {
            case (id, FloatType | DoubleType, cs) if cs.min != null => (id, Long.box(0L))
          })
          kvList("lower_bounds", byId.flatMap { case (id, dt, cs) =>
            Option(cs.min).flatMap(boundBytes(dt, _))
              .map(b => (id, java.nio.ByteBuffer.wrap(b): AnyRef))
          })
          kvList("upper_bounds", byId.flatMap { case (id, dt, cs) =>
            Option(cs.max).flatMap(boundBytes(dt, _))
              .map(b => (id, java.nio.ByteBuffer.wrap(b): AnyRef))
          })
        }
        d.put("equality_ids",
          if (f.equalityIds.isEmpty) null
          else java.util.Arrays.asList(f.equalityIds.map(Int.box): _*))
        e.put("data_file", d)
        writer.append(e)
      } finally writer.close()
    }

    // manifest list: prior snapshot's manifests (metadata preserved — a
    // foreign runtime uses added_snapshot_id for snapshot expiry and the
    // row counts for planning) + the new one
    val prior: Seq[ManifestRef] = meta.currentSnapshotId
      .flatMap(id => meta.snapshots.find(_.snapshotId == id)) match {
      case Some(cur) =>
        readManifestListFull(resolvePath(cur.manifestList, meta.location))
      case None => Nil
    }
    val carried: Seq[ManifestRef] =
      if (removePaths.isEmpty) prior
      else prior.zipWithIndex.map { case (ref, i) =>
        rewriteManifestForRemoval(ref, removePaths, meta, snapshotId,
          dir.resolve(s"$commitUuid-m${i + 1}.avro"))
      }
    val addedRows = files.map(f => rowCounts.getOrElse(f.absPath, 0L)).sum
    val listPath = dir.resolve(s"snap-$snapshotId-1-$commitUuid.avro")
    locally {
      val ls = manifestListSchema
      val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](ls))
      writer.setMeta("format-version", "2")
      writer.create(ls, listPath.toFile)
      try {
        if (files.nonEmpty)
          writer.append(manifestListEntry(ls, ManifestRef(
            manifestPath.toString, Files.size(manifestPath), seq,
            if (files.exists(_.content != 0)) 1 else 0,
            snapshotId, files.size, addedRows, meta.specId)))
        carried.foreach(ref => writer.append(manifestListEntry(ls, ref)))
      } finally writer.close()
    }

    // metadata vN+1
    val now = System.currentTimeMillis()
    val old = mapper.readTree(Files.readAllBytes(
      dir.resolve(s"v${meta.version}.metadata.json"))).asInstanceOf[ObjectNode]
    old.put("last-sequence-number", seq)
    old.put("last-updated-ms", now)
    old.put("current-snapshot-id", snapshotId)
    val snapNode = mapper.createObjectNode()
    snapNode.put("snapshot-id", snapshotId)
    snapNode.put("timestamp-ms", now)
    snapNode.put("sequence-number", seq)
    snapNode.put("manifest-list", listPath.toString)
    snapNode.put("schema-id",
      Option(old.get("current-schema-id")).map(_.asInt()).getOrElse(0))
    val summary = mapper.createObjectNode()
    summary.put("operation", op)
    snapNode.set("summary", summary)
    old.withArray[ArrayNode]("snapshots").add(snapNode)
    writeMetadataVersion(meta.location, meta.version + 1, old)
    snapshotId
  }

  /** Expire old snapshots, keeping the newest `keepLast` (the current one
    * always survives): metadata vN+1 drops the expired entries, then every
    * file referenced ONLY by expired snapshots — manifest lists, manifests,
    * data and delete files — is deleted, distributed past the usual
    * threshold. Time travel to expired snapshots is forfeited (the spec's
    * expire-snapshots maintenance op). Returns the deleted-file count. */
  def expireSnapshots(spark: SparkSession, table: String, keepLast: Int = 1): Long = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val meta = loadMeta(table)
    val sorted = meta.snapshots.sortBy(s => (s.timestampMs, s.snapshotId))
    if (sorted.size <= keepLast) return 0L
    val kept = sorted.takeRight(keepLast)
    require(meta.currentSnapshotId.forall(id => kept.exists(_.snapshotId == id)),
      "current snapshot would be expired — raise keepLast")
    val dropped = sorted.dropRight(keepLast)

    // manifests are immutable and manifest lists are cumulative — cache per
    // manifest path so the walk is linear, not O(snapshots x manifests).
    // status=2 (DELETED) entries are tombstones, NOT live references: a
    // kept snapshot's tombstone must not protect a file only expired
    // snapshots still carry live, or every expire leaks it forever.
    val manifestCache = scala.collection.mutable.Map.empty[String, Seq[FileEntry]]
    def refs(s: SnapshotMeta): Set[String] = {
      val listPath = resolvePath(s.manifestList, meta.location)
      val manifests = readManifestList(listPath)
      val files = manifests.flatMap { case (mPath, mSeq) =>
        val abs = resolvePath(mPath, meta.location)
        manifestCache.getOrElseUpdate(abs, readManifest(abs, mSeq))
      }.filter(_.status != 2).map(e => resolvePath(e.path, meta.location))
      (listPath +: (manifests.map(m => resolvePath(m._1, meta.location)) ++ files)).toSet
    }
    val keepSet = kept.map(refs).foldLeft(Set.empty[String])(_ ++ _)
    val doomed = dropped.map(refs).foldLeft(Set.empty[String])(_ ++ _) -- keepSet

    val droppedIds = dropped.map(_.snapshotId).toSet
    val dir = metaDir(meta.location)
    val old = mapper.readTree(Files.readAllBytes(
      dir.resolve(s"v${meta.version}.metadata.json"))).asInstanceOf[ObjectNode]
    val arr = mapper.createArrayNode()
    old.withArray[ArrayNode]("snapshots").elements().asScala
      .filter(n => !droppedIds.contains(n.get("snapshot-id").asLong()))
      .foreach(arr.add)
    old.set[JsonNode]("snapshots", arr)
    // refs and snapshot-log entries naming an expired snapshot must go too —
    // real Iceberg readers VALIDATE that every ref's snapshot exists and
    // reject the whole table otherwise
    if (old.has("refs")) {
      val refsNode = old.get("refs").asInstanceOf[ObjectNode]
      val stale = refsNode.fields().asScala
        .filter(e => droppedIds.contains(e.getValue.path("snapshot-id").asLong()))
        .map(_.getKey).toList
      stale.foreach(refsNode.remove)
    }
    if (old.has("snapshot-log")) {
      val log = mapper.createArrayNode()
      old.withArray[ArrayNode]("snapshot-log").elements().asScala
        .filter(n => !droppedIds.contains(n.path("snapshot-id").asLong()))
        .foreach(log.add)
      old.set[JsonNode]("snapshot-log", log)
    }
    old.put("last-updated-ms", System.currentTimeMillis())
    writeMetadataVersion(meta.location, meta.version + 1, old)
    InteropUtil.deleteFilesDistributed(spark, doomed.toSeq)
    doomed.size.toLong
  }

  private final case class ManifestRef(
      path: String, length: Long, sequenceNumber: Long, content: Int,
      addedSnapshotId: Long, addedFiles: Int, addedRows: Long, specId: Int = 0,
      existingFiles: Int = 0, deletedFiles: Int = 0,
      existingRows: Long = 0L, deletedRows: Long = 0L)

  private def manifestListEntry(ls: AvroSchema, ref: ManifestRef): GenericRecord = {
    val e = new GenericData.Record(ls)
    e.put("manifest_path", ref.path)
    e.put("manifest_length", ref.length)
    e.put("partition_spec_id", ref.specId)
    e.put("content", ref.content)
    e.put("sequence_number", ref.sequenceNumber)
    e.put("min_sequence_number", ref.sequenceNumber)
    e.put("added_snapshot_id", ref.addedSnapshotId)
    e.put("added_files_count", ref.addedFiles)
    e.put("existing_files_count", ref.existingFiles)
    e.put("deleted_files_count", ref.deletedFiles)
    e.put("added_rows_count", ref.addedRows)
    e.put("existing_rows_count", ref.existingRows)
    e.put("deleted_rows_count", ref.deletedRows)
    e
  }

  /** Rewrite one prior manifest for a replace commit: entries for
    * `removePaths` become DELETED tombstones stamped with the committing
    * snapshot, survivors become EXISTING with explicit sequence numbers,
    * and tombstones inherited from earlier commits are dropped (their
    * history lives in the older snapshot's own manifests). A manifest
    * touching no removed path carries through by reference, unwritten.
    * Records are copied under the source manifest's own embedded schema so
    * fields this binding doesn't model (column stats, split offsets)
    * survive the rewrite. */
  private def rewriteManifestForRemoval(
      ref: ManifestRef, removePaths: Set[String], meta: TableMeta,
      newSnapshotId: Long, out: JPath): ManifestRef = {
    val src = new java.io.File(resolvePath(ref.path, meta.location))
    val reader = new DataFileReader[GenericRecord](src, new GenericDatumReader[GenericRecord]())
    try {
      val records = reader.iterator().asScala.toVector
      def dataFile(r: GenericRecord) = r.get("data_file").asInstanceOf[GenericRecord]
      def filePath(r: GenericRecord) =
        resolvePath(dataFile(r).get("file_path").toString, meta.location)
      if (!records.exists(r => removePaths.contains(filePath(r)))) return ref
      val schema = reader.getSchema
      val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      reader.getMetaKeys.asScala.filterNot(_.startsWith("avro."))
        .foreach(k => writer.setMeta(k, reader.getMeta(k)))
      writer.create(schema, out.toFile)
      var (exF, deF) = (0, 0)
      var (exR, deR) = (0L, 0L)
      try records.foreach { r =>
        val priorStatus = r.get("status").asInstanceOf[Int]
        if (priorStatus != 2) {
          val rc = Option(dataFile(r).get("record_count"))
            .map(_.asInstanceOf[Long]).getOrElse(0L)
          if (r.get("sequence_number") == null) r.put("sequence_number", ref.sequenceNumber)
          if (schema.getField("file_sequence_number") != null &&
              r.get("file_sequence_number") == null)
            r.put("file_sequence_number", ref.sequenceNumber)
          if (removePaths.contains(filePath(r))) {
            r.put("status", 2)
            r.put("snapshot_id", newSnapshotId)
            deF += 1; deR += rc
          } else {
            r.put("status", 0)
            if (r.get("snapshot_id") == null) r.put("snapshot_id", ref.addedSnapshotId)
            exF += 1; exR += rc
          }
          writer.append(r)
        }
      } finally writer.close()
      ref.copy(path = out.toString, length = Files.size(out),
        addedSnapshotId = newSnapshotId, addedFiles = 0, addedRows = 0L,
        existingFiles = exF, deletedFiles = deF,
        existingRows = exR, deletedRows = deR)
    } finally reader.close()
  }

  /** Every manifest in a list, with its provenance metadata preserved. */
  private def readManifestListFull(path: String): Seq[ManifestRef] = {
    val reader = DataFileReader.openReader(
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.map { r =>
      def long(n: String, d: Long) = Option(r.get(n)).map(_.asInstanceOf[Long]).getOrElse(d)
      def int(n: String, d: Int) = Option(r.get(n)).map(_.asInstanceOf[Int]).getOrElse(d)
      ManifestRef(
        r.get("manifest_path").toString,
        long("manifest_length", 0L),
        long("sequence_number", 0L),
        int("content", 0),
        long("added_snapshot_id", 0L),
        int("added_files_count", 0),
        long("added_rows_count", 0L),
        int("partition_spec_id", 0),
        int("existing_files_count", 0),
        int("deleted_files_count", 0),
        long("existing_rows_count", 0L),
        long("deleted_rows_count", 0L))
    }.toSeq
    finally reader.close()
  }

  /** Atomic metadata version publish: link fails on EEXIST, so a racing
    * committer of the same version surfaces as a conflict. */
  private def writeMetadataVersion(table: String, version: Int, root: JsonNode): Unit = {
    val dir = metaDir(table)
    val target = dir.resolve(s"v$version.metadata.json")
    val tmp = Files.createTempFile(dir, s".v$version", ".json.tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    try { Files.createLink(target, tmp); Files.deleteIfExists(tmp) }
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(s"concurrent Iceberg commit v$version on $table", e)
    }
    Files.write(dir.resolve("version-hint.text"),
      version.toString.getBytes(StandardCharsets.UTF_8))
  }

  // ---- avro schemas for manifests (field-ids as props, per the spec)

  private def nullableString =
    AvroSchema.createUnion(AvroSchema.create(AvroSchema.Type.NULL),
      AvroSchema.create(AvroSchema.Type.STRING))
  private def nullable(t: AvroSchema.Type) =
    AvroSchema.createUnion(AvroSchema.create(AvroSchema.Type.NULL), AvroSchema.create(t))
  private def required(t: AvroSchema.Type) = AvroSchema.create(t)

  private def fld(name: String, schema: AvroSchema, id: Int, dflt: AnyRef = null): AvroSchema.Field = {
    val f =
      if (schema.getType == AvroSchema.Type.UNION)
        new AvroSchema.Field(name, schema, null, AvroSchema.Field.NULL_DEFAULT_VALUE)
      else new AvroSchema.Field(name, schema, null, dflt)
    f.addProp("field-id", id: Integer)
    f
  }

  /** Nullable int-keyed map as the spec's array-of-k/v-records form. */
  private def kvMapSchema(recName: String, keyId: Int, valId: Int,
      valType: AvroSchema.Type): AvroSchema = {
    import AvroSchema.Type._
    val rec = AvroSchema.createRecord(recName, null, "iceberg", false)
    val kf = new AvroSchema.Field("key", required(INT), null, null.asInstanceOf[AnyRef])
    kf.addProp("field-id", keyId: Integer)
    val vf = new AvroSchema.Field("value", required(valType), null, null.asInstanceOf[AnyRef])
    vf.addProp("field-id", valId: Integer)
    rec.setFields(java.util.Arrays.asList(kf, vf))
    val arr = AvroSchema.createArray(rec)
    arr.addProp("logicalType", "map")
    AvroSchema.createUnion(AvroSchema.create(NULL), arr)
  }

  private[interop] def manifestEntrySchema(partSchema: AvroSchema): AvroSchema = {
    import AvroSchema.Type._
    val dataFile = AvroSchema.createRecord("r2", null, "iceberg", false)
    dataFile.setFields(java.util.Arrays.asList(
      fld("content", required(INT), 134, 0: Integer),
      fld("file_path", required(STRING), 100),
      fld("file_format", required(STRING), 101),
      fld("partition", partSchema, 102),
      fld("record_count", required(LONG), 103),
      fld("file_size_in_bytes", required(LONG), 104),
      // column stats (spec manifest fields): null counts + single-value
      // serialized bounds, keyed by field id — foreign planners data-skip
      // on these
      fld("null_value_counts", kvMapSchema("k121_v122", 121, 122, LONG), 110),
      fld("nan_value_counts", kvMapSchema("k138_v139", 138, 139, LONG), 137),
      fld("lower_bounds", kvMapSchema("k126_v127", 126, 127, BYTES), 125),
      fld("upper_bounds", kvMapSchema("k129_v130", 129, 130, BYTES), 128),
      fld("equality_ids", AvroSchema.createUnion(
        AvroSchema.create(NULL),
        AvroSchema.createArray(AvroSchema.create(INT))), 135)))
    val entry = AvroSchema.createRecord("manifest_entry", null, "iceberg", false)
    entry.setFields(java.util.Arrays.asList(
      fld("status", required(INT), 0),
      fld("snapshot_id", nullable(LONG), 1),
      fld("sequence_number", nullable(LONG), 3),
      fld("file_sequence_number", nullable(LONG), 4),
      fld("data_file", dataFile, 2)))
    entry
  }

  private[interop] def manifestListSchema: AvroSchema = {
    import AvroSchema.Type._
    val mf = AvroSchema.createRecord("manifest_file", null, "iceberg", false)
    mf.setFields(java.util.Arrays.asList(
      fld("manifest_path", required(STRING), 500),
      fld("manifest_length", required(LONG), 501),
      fld("partition_spec_id", required(INT), 502),
      fld("content", required(INT), 517, 0: Integer),
      fld("sequence_number", required(LONG), 515, 0L: java.lang.Long),
      fld("min_sequence_number", required(LONG), 516, 0L: java.lang.Long),
      fld("added_snapshot_id", required(LONG), 503),
      fld("added_files_count", required(INT), 504),
      fld("existing_files_count", required(INT), 505),
      fld("deleted_files_count", required(INT), 506),
      fld("added_rows_count", required(LONG), 512),
      fld("existing_rows_count", required(LONG), 513),
      fld("deleted_rows_count", required(LONG), 514)))
    mf
  }

}
