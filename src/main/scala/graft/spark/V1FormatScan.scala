package graft.spark

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * DSv2 scan over a V1 `FileFormat` — bridges Graft's own formats (avro,
 * feather) into the `format("graft")` read path, which delegates parquet/
 * csv/json/orc to Spark's built-in V2 file tables but has no such table for
 * a custom V1 format. Column pruning pushes into the format's
 * `buildReader` (both formats resolve required fields by name); one input
 * partition per data file (neither format is splittable — catalog files
 * are pre-sliced by max_records_per_file).
 */
class V1FormatScanBuilder(
    spark: SparkSession, fmt: FileFormat, dataSchema: StructType,
    paths: Seq[String], fileSizes: Seq[Long], options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = dataSchema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(dataSchema.fields.filter(f => keep(f.name)))
  }

  override def build(): Scan =
    new V1FormatScan(spark, fmt, dataSchema, required, paths, fileSizes, options)
}

private class V1FormatScan(
    spark: SparkSession, fmt: FileFormat, dataSchema: StructType,
    required: StructType, paths: Seq[String], fileSizes: Seq[Long],
    options: CaseInsensitiveStringMap)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"GraftV1FormatScan(${fmt.toString})"

  override def planInputPartitions(): Array[InputPartition] = {
    // manifest sizes ride along — never re-stat 10^5 files on the driver
    val sizes: Seq[Long] =
      if (fileSizes.length == paths.length) fileSizes
      else {
        val conf = spark.sessionState.newHadoopConf()
        paths.map { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(conf).getFileStatus(hp).getLen
        }
      }
    paths.zip(sizes).map { case (p, len) => V1FileInput(p, len): InputPartition }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    import scala.jdk.CollectionConverters._
    val opts = options.asScala.toMap
    // built on the driver; the returned closure captures only a broadcast
    // conf + schemas, so it ships to executors
    val readFunc = fmt.buildReaderWithPartitionValues(
      spark, dataSchema, StructType(Nil), required, Nil, opts,
      spark.sessionState.newHadoopConf())
    new V1FormatReaderFactory(readFunc)
  }
}

private final case class V1FileInput(path: String, length: Long) extends InputPartition

private class V1FormatReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val f = partition.asInstanceOf[V1FileInput]
    val pf = PartitionedFile(InternalRow.empty, SparkPath.fromPathString(f.path),
      0L, f.length, Array.empty[String], 0L, f.length, Map.empty)
    val it = readFunc(pf)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
