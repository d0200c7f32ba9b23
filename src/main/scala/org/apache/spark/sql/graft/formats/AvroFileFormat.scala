package org.apache.spark.sql.graft.formats

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/**
 * Avro data files for Graft tables (reference reader/writer:
 * deltacat/utils/pyarrow.py:448-483, 643). The distribution carries
 * avro-core/avro-mapred but not the spark-avro SQL module, so this is a
 * first-class V1 `FileFormat`: container files with deflate-free encoding,
 * one Avro record per row, nullable fields as union(null, T), logical types
 * date / timestamp-micros / local-timestamp-micros / decimal(bytes).
 *
 * Reads convert by the REQUESTED Catalyst type (fields resolved by name,
 * absent fields read null, numeric widening tolerated), which is exactly
 * the contract the catalog's schema-evolution read path needs. Files are
 * not splittable (catalog files are already sliced by max_records_per_file).
 */
class AvroFileFormat extends FileFormat with DataSourceRegister with Serializable {
  import AvroFileFormat._

  override def shortName(): String = "avro"
  override def toString: String = "GraftAvro"
  override def isSplitable(spark: SparkSession, options: Map[String, String], path: Path): Boolean =
    false

  override def inferSchema(
      spark: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] =
    files.headOption.map { f =>
      val in = new FsInput(f.getPath, spark.sessionState.newHadoopConf())
      val reader = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      try fromAvroSchema(reader.getSchema).asInstanceOf[StructType]
      finally reader.close()
    }

  override def prepareWrite(
      spark: SparkSession,
      job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory =
    new OutputWriterFactory {
      private val codec = options.get("compression")
      override def getFileExtension(context: TaskAttemptContext): String = ".avro"
      override def newInstance(
          path: String, dataSchema: StructType, context: TaskAttemptContext): OutputWriter =
        new AvroOutputWriter(path, dataSchema, context, codec)
    }

  override def buildReader(
      spark: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val confBc = spark.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    (file: PartitionedFile) => {
      val reader = DataFileReader.openReader(
        new FsInput(file.toPath, confBc.value.value), new GenericDatumReader[GenericRecord]())
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => reader.close()))
      val fileSchema = reader.getSchema
      val conv = recordConverter(fileSchema, requiredSchema, tz)
      val it = reader.iterator().asScala.map(conv)
      new Iterator[InternalRow] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) reader.close(); h }
        def next(): InternalRow = it.next()
      }
    }
  }

  override def supportDataType(dataType: DataType): Boolean = dataType match {
    case _: AtomicType => true
    case ArrayType(e, _) => supportDataType(e)
    case MapType(StringType, v, _) => supportDataType(v)
    case s: StructType => s.fields.forall(f => supportDataType(f.dataType))
    case _ => false
  }
}

object AvroFileFormat {

  /** Catalyst → Avro schema; nullable via union(null, T). Nested record type
    * names are made unique by their field path (Avro forbids redefinition). */
  def toAvroSchema(st: StructType, name: String = "graft_record"): AvroSchema = {
    val fields = st.fields.map { f =>
      new AvroSchema.Field(f.name,
        AvroSchema.createUnion(
          AvroSchema.create(AvroSchema.Type.NULL), fieldSchema(f.dataType, s"${name}_${f.name}")),
        null, AvroSchema.Field.NULL_DEFAULT_VALUE)
    }
    val rec = AvroSchema.createRecord(name, null, "graft", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  private def fieldSchema(dt: DataType, path: String): AvroSchema = dt match {
    case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => AvroSchema.create(AvroSchema.Type.INT)
    case LongType => AvroSchema.create(AvroSchema.Type.LONG)
    case FloatType => AvroSchema.create(AvroSchema.Type.FLOAT)
    case DoubleType => AvroSchema.create(AvroSchema.Type.DOUBLE)
    case StringType => AvroSchema.create(AvroSchema.Type.STRING)
    case BinaryType => AvroSchema.create(AvroSchema.Type.BYTES)
    case DateType => LogicalTypes.date().addToSchema(AvroSchema.create(AvroSchema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale).addToSchema(AvroSchema.create(AvroSchema.Type.BYTES))
    case ArrayType(e, _) =>
      AvroSchema.createArray(AvroSchema.createUnion(
        AvroSchema.create(AvroSchema.Type.NULL), fieldSchema(e, s"${path}_item")))
    case MapType(StringType, v, _) =>
      AvroSchema.createMap(AvroSchema.createUnion(
        AvroSchema.create(AvroSchema.Type.NULL), fieldSchema(v, s"${path}_value")))
    case s: StructType => toAvroSchema(s, path)
    case other => throw new UnsupportedOperationException(s"avro: unsupported type $other")
  }

  /** Avro → Catalyst (for schemaless inference). */
  def fromAvroSchema(s: AvroSchema): DataType = {
    import AvroSchema.Type._
    val nn: AvroSchema =
      if (s.getType == UNION) s.getTypes.asScala.toSeq.filter(_.getType != NULL) match {
        case Seq(one) => one
        case other => throw new UnsupportedOperationException(s"avro: non-nullable union $other")
      } else s
    nn.getType match {
      case BOOLEAN => BooleanType
      case INT =>
        if (nn.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
      case LONG => nn.getLogicalType match {
        case _: LogicalTypes.TimestampMicros => TimestampType
        case _: LogicalTypes.LocalTimestampMicros => TimestampNTZType
        case _ => LongType
      }
      case FLOAT => FloatType
      case DOUBLE => DoubleType
      case STRING | ENUM => StringType
      case BYTES | FIXED => nn.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
      case ARRAY => ArrayType(fromAvroSchema(nn.getElementType))
      case MAP => MapType(StringType, fromAvroSchema(nn.getValueType))
      case RECORD => StructType(nn.getFields.asScala.toSeq.map(f =>
        StructField(f.name(), fromAvroSchema(f.schema()))))
      case other => throw new UnsupportedOperationException(s"avro: unsupported type $other")
    }
  }

  /** GenericRecord → InternalRow shaped by the REQUESTED schema: fields
    * resolved by name, absent fields null — the same evolution contract the
    * parquet read path gives the catalog. Converters (incl. nested
    * record/array/map converters) are built ONCE per file from the pair
    * (file avro schema, requested type) — never per row — so file logical
    * types (decimal scale, date) are interpreted before widening. */
  private def recordConverter(
      fileSchema: AvroSchema, required: StructType, tz: String): GenericRecord => InternalRow = {
    val fields: Array[Option[(Int, Any => Any)]] = required.fields.map { f =>
      Option(fileSchema.getField(f.name)).map(af =>
        (af.pos(), valueReader(af.schema(), f.dataType, tz)))
    }
    rec => {
      val out = new GenericInternalRow(required.length)
      var i = 0
      while (i < required.length) {
        out.update(i, fields(i) match {
          case Some((p, conv)) =>
            val v = rec.get(p)
            if (v == null) null else conv(v)
          case None => null
        })
        i += 1
      }
      out
    }
  }

  private val MicrosPerDay = 86400000000L

  /** Build-once converter: avro runtime value (interpreted under the FILE's
    * schema + logical type) → Catalyst value of the REQUESTED type. Numeric
    * widening, decimal rescale and date→timestamp promotion follow
    * TypePromotion's lattice so evolved reads of old files are exact. */
  private def valueReader(fileS: AvroSchema, dt: DataType, tz: String): Any => Any = {
    val nn = nonNull(fileS)
    import AvroSchema.Type._
    (nn.getType, dt) match {
      // anything → string (the lattice's universal promotion)
      case (_, StringType) => v => UTF8String.fromString(v.toString)
      case (BOOLEAN, BooleanType) => v => v
      // date logical type: the stored int is DAYS — converting to a
      // timestamp must go through days→micros, not reinterpretation
      case (INT, dt2) if nn.getLogicalType.isInstanceOf[LogicalTypes.Date] => dt2 match {
        case DateType => v => v
        case TimestampNTZType => v => v.asInstanceOf[Number].intValue() * MicrosPerDay
        case TimestampType =>
          val zone = java.time.ZoneId.of(tz)
          v => org.apache.spark.sql.catalyst.util.DateTimeUtils
            .daysToMicros(v.asInstanceOf[Number].intValue(), zone)
        case other => throw new UnsupportedOperationException(
          s"avro: cannot read date as $other")
      }
      case (LONG, dt2) if nn.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis] ||
          nn.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMillis] => dt2 match {
        case TimestampType | TimestampNTZType => v => v.asInstanceOf[Number].longValue() * 1000L
        case other => throw new UnsupportedOperationException(
          s"avro: cannot read timestamp-millis as $other")
      }
      case (INT | LONG | FLOAT | DOUBLE, _) => dt match {
        case ByteType => v => v.asInstanceOf[Number].byteValue()
        case ShortType => v => v.asInstanceOf[Number].shortValue()
        case IntegerType | DateType => v => v.asInstanceOf[Number].intValue()
        case LongType | TimestampType | TimestampNTZType => v => v.asInstanceOf[Number].longValue()
        case FloatType => v => v.asInstanceOf[Number].floatValue()
        case DoubleType => v => v.asInstanceOf[Number].doubleValue()
        case other => throw new UnsupportedOperationException(
          s"avro: cannot read ${nn.getType} as $other")
      }
      case (BYTES | FIXED, d: DecimalType) => nn.getLogicalType match {
        case dec: LogicalTypes.Decimal =>
          // rebuild with the FILE's scale, then rescale to the requested
          // type — a widened decimal(12,4) read of a decimal(10,2) file
          // must not reinterpret the unscaled integer
          val fileScale = dec.getScale
          v => {
            val bytes = v match {
              case bb: ByteBuffer =>
                val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
              case f: GenericFixed => f.bytes()
            }
            Decimal(new java.math.BigDecimal(new java.math.BigInteger(bytes), fileScale)
              .setScale(d.scale), d.precision, d.scale)
          }
        case _ => throw new UnsupportedOperationException(
          s"avro: cannot read plain bytes as $d")
      }
      case (BYTES, BinaryType) => v => {
        val bb = v.asInstanceOf[ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      }
      case (FIXED, BinaryType) => v => v.asInstanceOf[GenericFixed].bytes()
      case (ARRAY, ArrayType(et, _)) =>
        val elem = valueReader(nn.getElementType, et, tz)
        v => {
          val c = v.asInstanceOf[java.util.Collection[_]]
          new GenericArrayData(c.asScala.map(e => if (e == null) null else elem(e)).toArray)
        }
      case (MAP, MapType(StringType, vt, _)) =>
        val valueConv = valueReader(nn.getValueType, vt, tz)
        v => {
          val entries = v.asInstanceOf[java.util.Map[_, _]].asScala.toSeq
          new ArrayBasedMapData(
            new GenericArrayData(entries.map(e => UTF8String.fromString(e._1.toString)).toArray),
            new GenericArrayData(entries.map(e =>
              if (e._2 == null) null else valueConv(e._2)).toArray))
        }
      case (RECORD, st: StructType) =>
        val conv = recordConverter(nn, st, tz)
        v => conv(v.asInstanceOf[GenericRecord])
      case (ft, t) => throw new UnsupportedOperationException(
        s"avro: cannot read avro $ft as $t")
    }
  }

  /** InternalRow accessor+converter per field of `st` → Avro value. */
  private[formats] def rowToAvro(st: StructType, avro: AvroSchema): InternalRow => GenericRecord = {
    val getters: Array[(org.apache.spark.sql.catalyst.expressions.SpecializedGetters, Int) => Any] =
      st.fields.zipWithIndex.map { case (f, i) =>
        val elemAvro = nonNull(avro.getFields.get(i).schema())
        valueToAvro(f.dataType, elemAvro)
      }
    row => {
      val rec = new GenericData.Record(avro)
      var i = 0
      while (i < st.length) {
        rec.put(i, if (row.isNullAt(i)) null else getters(i)(row, i))
        i += 1
      }
      rec
    }
  }

  private def nonNull(s: AvroSchema): AvroSchema =
    if (s.getType == AvroSchema.Type.UNION)
      s.getTypes.asScala.find(_.getType != AvroSchema.Type.NULL).get
    else s

  private def valueToAvro(dt: DataType, avro: AvroSchema)
      : (org.apache.spark.sql.catalyst.expressions.SpecializedGetters, Int) => Any = dt match {
    case BooleanType => (r, i) => r.getBoolean(i)
    case ByteType => (r, i) => r.getByte(i).toInt
    case ShortType => (r, i) => r.getShort(i).toInt
    case IntegerType | DateType => (r, i) => r.getInt(i)
    case LongType | TimestampType | TimestampNTZType => (r, i) => r.getLong(i)
    case FloatType => (r, i) => r.getFloat(i)
    case DoubleType => (r, i) => r.getDouble(i)
    case StringType => (r, i) => r.getUTF8String(i).toString
    case BinaryType => (r, i) => ByteBuffer.wrap(r.getBinary(i))
    case d: DecimalType => (r, i) =>
      ByteBuffer.wrap(r.getDecimal(i, d.precision, d.scale)
        .toJavaBigDecimal.unscaledValue().toByteArray)
    case ArrayType(et, _) =>
      val elemConv = valueToAvro(et, nonNull(avro.getElementType))
      (r, i) => {
        val ad: ArrayData = r.getArray(i)
        val out = new java.util.ArrayList[Any](ad.numElements())
        var j = 0
        while (j < ad.numElements()) {
          out.add(if (ad.isNullAt(j)) null else elemConv(ad, j)); j += 1
        }
        out
      }
    case MapType(StringType, vt, _) =>
      val valConv = valueToAvro(vt, nonNull(avro.getValueType))
      (r, i) => {
        val md = r.getMap(i)
        val out = new java.util.HashMap[String, Any](md.numElements())
        val ks = md.keyArray(); val vs = md.valueArray()
        var j = 0
        while (j < md.numElements()) {
          out.put(ks.getUTF8String(j).toString,
            if (vs.isNullAt(j)) null else valConv(vs, j))
          j += 1
        }
        out
      }
    case st: StructType =>
      val conv = rowToAvro(st, avro)
      (r, i) => conv(r.getStruct(i, st.length))
    case other => throw new UnsupportedOperationException(s"avro: unsupported type $other")
  }
}

private class AvroOutputWriter(
    val path: String, dataSchema: StructType, context: TaskAttemptContext,
    compression: Option[String]) extends OutputWriter {
  private val avroSchema = AvroFileFormat.toAvroSchema(dataSchema)
  private val conv = AvroFileFormat.rowToAvro(dataSchema, avroSchema)
  private val writer = {
    val p = new Path(path)
    val out = p.getFileSystem(context.getConfiguration).create(p, false)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    compression.foreach(c => w.setCodec(AvroOutputWriter.codecFor(c)))
    w.create(avroSchema, out)
  }
  override def write(row: InternalRow): Unit = writer.append(conv(row))
  override def close(): Unit = writer.close()
}

private object AvroOutputWriter {
  import org.apache.avro.file.CodecFactory
  /** Graft content_encoding → Avro container codec (reads are transparent:
    * the codec rides the file header). */
  def codecFor(name: String): CodecFactory = name match {
    case "gzip" | "deflate" => CodecFactory.deflateCodec(CodecFactory.DEFAULT_DEFLATE_LEVEL)
    case "snappy" => CodecFactory.snappyCodec()
    case "zstd" => CodecFactory.zstandardCodec(CodecFactory.DEFAULT_ZSTANDARD_LEVEL)
    case "bzip2" => CodecFactory.bzip2Codec()
    case "xz" => CodecFactory.xzCodec(CodecFactory.DEFAULT_XZ_LEVEL)
    case other => throw new UnsupportedOperationException(
      s"avro: unsupported content_encoding $other (gzip/deflate/snappy/zstd/bzip2/xz)")
  }
}
