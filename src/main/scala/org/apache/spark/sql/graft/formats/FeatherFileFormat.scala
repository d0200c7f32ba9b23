package org.apache.spark.sql.graft.formats

import java.nio.ByteBuffer
import java.nio.channels.SeekableByteChannel

import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, SeekableReadChannel}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch, ColumnVector}
import org.apache.spark.util.SerializableConfiguration

/**
 * Feather v2 (= Arrow IPC file) data files for Graft tables (reference
 * reader/writer: deltacat/utils/pyarrow.py:272-329). Spark ships no
 * Arrow-IPC datasource, but the full Arrow java stack and Spark's own
 * Catalyst↔Arrow bridges (ArrowWriter / ArrowColumnVector / ArrowUtils)
 * are on the classpath, so this V1 `FileFormat` writes record batches of
 * 4096 rows through ArrowWriter and reads them back zero-copy through
 * ArrowColumnVector-backed ColumnarBatches.
 *
 * Reads resolve the requested fields by NAME against the file schema:
 * matching types serve straight from the Arrow vectors; absent fields read
 * null; numerically-widened fields (evolved tables reading old files) go
 * through a per-row widening projection. Files are not splittable.
 */
class FeatherFileFormat extends FileFormat with DataSourceRegister with Serializable {
  import FeatherFileFormat._

  override def shortName(): String = "feather"
  override def toString: String = "GraftFeather"
  override def isSplitable(spark: SparkSession, options: Map[String, String], path: Path): Boolean =
    false

  override def inferSchema(
      spark: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] =
    files.headOption.map { f =>
      val conf = spark.sessionState.newHadoopConf()
      val in = f.getPath.getFileSystem(conf).open(f.getPath)
      val reader = new ArrowFileReader(
        new SeekableReadChannel(new HadoopSeekableChannel(in, f.getLen)),
        ArrowUtils.rootAllocator)
      try ArrowUtils.fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
      finally reader.close()
    }

  override def prepareWrite(
      spark: SparkSession,
      job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    new OutputWriterFactory {
      private val codec = options.get("compression")
      override def getFileExtension(context: TaskAttemptContext): String = ".feather"
      override def newInstance(
          path: String, dataSchema: StructType, context: TaskAttemptContext): OutputWriter =
        new FeatherOutputWriter(path, dataSchema, context, tz, codec)
    }
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
    (file: PartitionedFile) => {
      val p = file.toPath
      val in = p.getFileSystem(confBc.value.value).open(p)
      val allocator =
        ArrowUtils.rootAllocator.newChildAllocator(s"graft-feather-${p.getName}", 0, Long.MaxValue)
      // the commons compression factory serves zstd/lz4 batch bodies and is
      // only consulted when a batch declares compression
      val reader = new ArrowFileReader(
        new SeekableReadChannel(new HadoopSeekableChannel(in, file.fileSize)), allocator,
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
      def closeAll(): Unit = { reader.close(); allocator.close() }
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
      val root = reader.getVectorSchemaRoot
      val fileType = ArrowUtils.fromArrowSchema(root.getSchema)
      new Iterator[InternalRow] {
        private var batch: Iterator[InternalRow] = Iterator.empty
        def hasNext: Boolean = {
          while (!batch.hasNext) {
            if (!reader.loadNextBatch()) { closeAll(); return false }
            batch = batchRows(root, fileType, requiredSchema)
          }
          true
        }
        def next(): InternalRow = batch.next()
      }
    }
  }

  override def supportDataType(dataType: DataType): Boolean = dataType match {
    case _: AtomicType => true
    case ArrayType(e, _) => supportDataType(e)
    case MapType(k, v, _) => supportDataType(k) && supportDataType(v)
    case s: StructType => s.fields.forall(f => supportDataType(f.dataType))
    case _ => false
  }
}

object FeatherFileFormat {

  /** Rows of the freshly-loaded batch in `root`, shaped by requiredSchema.
    * Exact-match fields serve straight from the Arrow vectors; otherwise a
    * per-row projection null-fills absent fields and widens numerics. */
  private def batchRows(
      root: VectorSchemaRoot, fileType: StructType, required: StructType): Iterator[InternalRow] = {
    val n = root.getRowCount
    val exact = required.fields.forall(f =>
      fileType.fields.exists(ff => ff.name == f.name && ff.dataType.sameType(f.dataType)))
    if (exact) {
      val cols: Array[ColumnVector] =
        required.fields.map(f => new ArrowColumnVector(root.getVector(f.name)): ColumnVector)
      new ColumnarBatch(cols, n).rowIterator().asScala
    } else {
      // evolved read: project by name with widening (same contract as avro)
      val srcCols = required.fields.map { f =>
        fileType.fields.find(_.name == f.name).map { ff =>
          (new ArrowColumnVector(root.getVector(f.name)), ff.dataType, widener(ff.dataType, f.dataType))
        }
      }
      (0 until n).iterator.map { r =>
        val out = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          out.update(i, srcCols(i) match {
            case Some((v, srcDt, w)) if !v.isNullAt(r) => w(getValue(v, r, srcDt))
            case _ => null
          })
          i += 1
        }
        out
      }
    }
  }

  private def getValue(v: ColumnVector, r: Int, dt: DataType): Any = dt match {
    case BooleanType => v.getBoolean(r)
    case ByteType => v.getByte(r)
    case ShortType => v.getShort(r)
    case IntegerType | DateType => v.getInt(r)
    case LongType | TimestampType | TimestampNTZType => v.getLong(r)
    case FloatType => v.getFloat(r)
    case DoubleType => v.getDouble(r)
    case StringType => v.getUTF8String(r).copy()
    case BinaryType => v.getBinary(r)
    case d: DecimalType => v.getDecimal(r, d.precision, d.scale)
    case ArrayType(_, _) => v.getArray(r).copy()
    case MapType(_, _, _) => v.getMap(r).copy()
    case st: StructType => getRowValue(v.getStruct(r), -1, st)
    case other => throw new UnsupportedOperationException(s"feather: cannot widen-read $other")
  }

  /** Owned (batch-survival-safe) Catalyst value from a row slot; i = -1
    * means `row` itself IS the value (a nested struct). Arrow vectors are
    * reloaded in place per batch, so views (strings, arrays, rows) must be
    * copied out on the widen path. */
  private def getRowValue(
      row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int, dt: DataType): Any = dt match {
    case st: StructType =>
      val r = if (i < 0) row.asInstanceOf[InternalRow] else row.getStruct(i, st.length)
      if (r == null) null
      else {
        val out = new GenericInternalRow(st.length)
        var j = 0
        while (j < st.length) {
          out.update(j, if (r.isNullAt(j)) null else getRowValue(r, j, st.fields(j).dataType))
          j += 1
        }
        out
      }
    case BooleanType => row.getBoolean(i)
    case ByteType => row.getByte(i)
    case ShortType => row.getShort(i)
    case IntegerType | DateType => row.getInt(i)
    case LongType | TimestampType | TimestampNTZType => row.getLong(i)
    case FloatType => row.getFloat(i)
    case DoubleType => row.getDouble(i)
    case StringType => row.getUTF8String(i).copy()
    case BinaryType => row.getBinary(i)
    case d: DecimalType => row.getDecimal(i, d.precision, d.scale)
    case ArrayType(_, _) => row.getArray(i).copy()
    case MapType(_, _, _) => row.getMap(i).copy()
    case other => throw new UnsupportedOperationException(s"feather: cannot widen-read $other")
  }

  /** Value converter src→dst for the promotions old files can need. */
  private def widener(src: DataType, dst: DataType): Any => Any = (src, dst) match {
    case (a, b) if a.sameType(b) => identity
    case (_, StringType) =>
      v => org.apache.spark.unsafe.types.UTF8String.fromString(v.toString)
    case (ByteType | ShortType | IntegerType, LongType) =>
      v => v.asInstanceOf[Number].longValue()
    case (ByteType | ShortType, IntegerType) => v => v.asInstanceOf[Number].intValue()
    case (ByteType | ShortType | IntegerType | LongType | FloatType, DoubleType) =>
      v => v.asInstanceOf[Number].doubleValue()
    case (FloatType, FloatType) => identity
    case (a: DecimalType, b: DecimalType) =>
      v => org.apache.spark.sql.types.Decimal(
        v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
          .setScale(b.scale), b.precision, b.scale)
    // arrays widen element-wise, maps key/value-wise
    case (ArrayType(ae, _), ArrayType(be, _)) =>
      val w = widener(ae, be)
      v => {
        val ad = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          (0 until ad.numElements()).map(i =>
            if (ad.isNullAt(i)) null else w(getRowValue(ad, i, ae))).toArray)
      }
    case (MapType(ak, av, _), MapType(bk, bv, _)) =>
      val wk = widener(ak, bk); val wv = widener(av, bv)
      v => {
        val md = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val ks = md.keyArray(); val vs = md.valueArray()
        new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            (0 until md.numElements()).map(i => wk(getRowValue(ks, i, ak))).toArray),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            (0 until md.numElements()).map(i =>
              if (vs.isNullAt(i)) null else wv(getRowValue(vs, i, av))).toArray))
      }
    // nested structs conform by NAME: shared fields widen recursively,
    // appended fields read null (the evolved-nested-read contract, c39)
    case (a: StructType, b: StructType) =>
      val plan: Array[Option[(Int, DataType, Any => Any)]] = b.fields.map { bf =>
        val i = a.fields.indexWhere(_.name == bf.name)
        if (i < 0) None
        else Some((i, a.fields(i).dataType, widener(a.fields(i).dataType, bf.dataType)))
      }
      v => {
        val row = v.asInstanceOf[InternalRow]
        val out = new GenericInternalRow(b.length)
        var j = 0
        while (j < b.length) {
          out.update(j, plan(j) match {
            case Some((i, sdt, w)) if !row.isNullAt(i) => w(getRowValue(row, i, sdt))
            case _ => null
          })
          j += 1
        }
        out
      }
    case (a, b) => throw new UnsupportedOperationException(
      s"feather: unsupported evolved read $a -> $b")
  }
}

/** SeekableByteChannel over a Hadoop input stream (Arrow's file reader
  * needs random access; heap-buffer reads keep it portable across
  * filesystems that lack ByteBufferReadable). */
private class HadoopSeekableChannel(in: FSDataInputStream, len: Long) extends SeekableByteChannel {
  private var closed = false
  override def read(dst: ByteBuffer): Int = {
    val want = dst.remaining()
    if (want == 0) return 0
    val buf = new Array[Byte](want)
    val n = in.read(buf, 0, want)
    if (n > 0) dst.put(buf, 0, n)
    n
  }
  override def write(src: ByteBuffer): Int = throw new UnsupportedOperationException
  override def position(): Long = in.getPos
  override def position(newPosition: Long): SeekableByteChannel = { in.seek(newPosition); this }
  override def size(): Long = len
  override def truncate(size: Long): SeekableByteChannel = throw new UnsupportedOperationException
  override def isOpen: Boolean = !closed
  override def close(): Unit = { closed = true; in.close() }
}

private class FeatherOutputWriter(
    val path: String, dataSchema: StructType, context: TaskAttemptContext,
    timeZoneId: String, compression: Option[String]) extends OutputWriter {
  private val allocator =
    ArrowUtils.rootAllocator.newChildAllocator(s"graft-feather-write", 0, Long.MaxValue)
  private val arrowSchema = ArrowUtils.toArrowSchema(
    dataSchema, timeZoneId, errorOnDuplicatedFieldNames = true, largeVarTypes = false)
  private val root = VectorSchemaRoot.create(arrowSchema, allocator)
  private val arrowWriter = ArrowWriter.create(root)
  private val out = {
    val p = new Path(path)
    p.getFileSystem(context.getConfiguration).create(p, false)
  }
  private val channel = java.nio.channels.Channels.newChannel(out)
  private val fileWriter = compression match {
    case None => new ArrowFileWriter(root, null, channel)
    case Some(c) =>
      import org.apache.arrow.vector.compression.CompressionUtil
      val codecType = c match {
        case "zstd" => CompressionUtil.CodecType.ZSTD
        case "lz4" => CompressionUtil.CodecType.LZ4_FRAME
        case other => throw new UnsupportedOperationException(
          s"feather: unsupported content_encoding $other (arrow IPC bodies support zstd/lz4)")
      }
      new ArrowFileWriter(root, null, channel, null,
        org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE, codecType)
  }
  fileWriter.start()
  private var pending = 0

  override def write(row: InternalRow): Unit = {
    arrowWriter.write(row)
    pending += 1
    if (pending >= 4096) flush()
  }

  private def flush(): Unit = if (pending > 0) {
    arrowWriter.finish()
    fileWriter.writeBatch()
    arrowWriter.reset()
    pending = 0
  }

  override def close(): Unit = {
    flush()
    fileWriter.end()
    fileWriter.close()
    out.close()
    root.close()
    allocator.close()
  }
}
