package org.apache.spark.sql.graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal, Murmur3Hash, Pmod, TransformExpression}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.catalog.functions.ScalarFunction
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * Storage-partitioned view of a COMPACTED bucketed base: the physical
 * layout (`_g_bucket=N` directories holding `pmod(hash(keys), n)` of each
 * row's merge keys) is exposed to Catalyst as a `KeyGroupedPartitioning`
 * scan, so a merge-key join or aggregate against the base plans with NO
 * exchange on the base side — under
 * `spark.sql.sources.v2.bucketing.{enabled,shuffle.enabled}` the OTHER
 * side shuffles into the bucket layout instead (Spark's storage-partitioned
 * join, the mechanism Iceberg bucketed tables use). At 100 TB this is the
 * difference between "every merge-on-read shuffles the base" and "every
 * merge-on-read shuffles only the pending deltas".
 *
 * Mechanics (all public-API driven at the seams Spark designed for this):
 *  - [[GraftBucketFunction]] is a connector `ScalarFunction` evaluating the
 *    EXACT storage bucket id via the same catalyst kernel the writer used
 *    (`Pmod(Murmur3Hash(keys), n)` — seed 42, identical to
 *    `functions.hash`), so the shuffle the join plans for the other side
 *    lands rows in precisely the partition that holds their bucket's files.
 *  - One `FilePartition` per bucket (splits regrouped from the delegate
 *    parquet scan's planning) carrying `HasPartitionKey` = the bucket id.
 *  - The logical plan is a directly-constructed `DataSourceV2ScanRelation`
 *    with `keyGroupedPartitioning` already bound — no FunctionCatalog
 *    round-trip, no dependence on analyzer rules for a scan the catalog
 *    itself authored.
 *
 * Reader, pushdown, vectorization: delegated untouched to Spark's own
 * `ParquetTable` scan (the same delegate the DSv2 table uses); this class
 * only REGROUPS its planned splits by bucket directory.
 *
 * Parallelism: deliberately ONE partition per bucket — duplicate partition
 * keys would make an exchange-free aggregate over the scan wrong unless
 * Spark re-groups them, and relying on that grouping is fragile across
 * versions. Scan parallelism therefore equals the bucket count; that is
 * the right trade because `Compactor.suggestBuckets` scales buckets with
 * data volume (a 100 TB table has thousands), while the joins this scan
 * feeds are bounded by the pending side anyway. Skewed buckets at extreme
 * scale are the storage layout's own skew (salting/recluster territory),
 * not a scan-shape problem.
 */
object BucketedBase {

  /** The storage layout's bucket id as a connector scalar function:
    * pmod(murmur3(keys, seed 42), n) — byte-identical to the writer's
    * `pmod(hash(keys), lit(n))`. */
  final case class GraftBucketFunction(n: Int, keySchema: StructType)
      extends ScalarFunction[Integer] {
    // Bucket-function calling convention (TransformExpression.eval):
    // argument 0 is numBuckets, the keys follow.
    override def inputTypes(): Array[DataType] =
      IntegerType +: keySchema.fields.map(_.dataType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "graft_bucket"
    override def canonicalName(): String = s"graft.graft_bucket($n)"
    override def isResultNullable: Boolean = false
    @transient private lazy val expr = Pmod(
      new Murmur3Hash(keySchema.fields.zipWithIndex.toSeq.map { case (f, i) =>
        BoundReference(i + 1, f.dataType, f.nullable) }),
      Literal(n))
    override def produceResult(input: InternalRow): Integer =
      expr.eval(input).asInstanceOf[Int]
  }

  private final class BucketFilePartition(
      index: Int, files: Array[PartitionedFile], bucketId: Int)
      extends FilePartition(index, files) with HasPartitionKey {
    override def partitionKey(): InternalRow = InternalRow(bucketId)
  }

  /** Batch/Scan wrapper: the delegate parquet scan's splits, regrouped one
    * partition per bucket id. */
  private final class BucketedScan(
      delegate: Scan, grouped: Array[(Int, Array[PartitionedFile])])
      extends Scan with Batch {
    override def readSchema(): StructType = delegate.readSchema()
    override def toBatch: Batch = this
    override def description(): String =
      s"GraftBucketedBase(${grouped.length} buckets, delegate=${delegate.description()})"
    override def planInputPartitions(): Array[InputPartition] =
      grouped.zipWithIndex.map { case ((bid, files), idx) =>
        new BucketFilePartition(idx, files, bid): InputPartition
      }
    override def createReaderFactory(): PartitionReaderFactory =
      delegate.toBatch.createReaderFactory()
  }

  /** Minimal Table for the relation node (metadata only — the scan above
    * does the work). */
  private final class BucketedBaseTable(tblName: String, tblSchema: StructType)
      extends Table with SupportsRead {
    override def name(): String = tblName
    override def schema(): StructType = tblSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      throw new UnsupportedOperationException(
        "GraftBucketedBase is planned directly; use BucketedBase.frame")
  }

  /**
   * DataFrame over the base files with bucket-aligned output partitioning.
   * Returns None when the layout can't be trusted: a file without a
   * `_g_bucket=N` segment, or an empty file list. `bucketOf` is the
   * catalog's path→bucket parser (single source of truth for the layout).
   */
  def frame(
      spark: SparkSession,
      schema: StructType,
      mergeKeys: Seq[String],
      numBuckets: Int,
      paths: Seq[String],
      bucketOf: String => Option[Int],
      extraOptions: Map[String, String] = Map.empty): Option[DataFrame] = {
    if (paths.isEmpty || mergeKeys.isEmpty || numBuckets <= 0) return None
    val opts = new CaseInsensitiveStringMap(
      (extraOptions ++ Map("recursiveFileLookup" -> "true")).asJava)
    val delegate = ParquetTable("graft_bucketed_base", spark, opts, paths,
      Some(schema), classOf[ParquetFileFormat])
      .newScanBuilder(opts).build()
    // Regroup the delegate's planned splits by bucket directory. Splits of
    // one file always share a bucket (the id is a path property).
    val splits = delegate.toBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => return None // unexpected partition shape — stay safe
    }
    val byBucket = scala.collection.mutable.LinkedHashMap[Int, Vector[PartitionedFile]]()
    splits.foreach { pf =>
      bucketOf(pf.filePath.toString) match {
        case Some(b) if b >= 0 && b < numBuckets =>
          byBucket.update(b, byBucket.getOrElse(b, Vector.empty) :+ pf)
        case _ => return None // un-bucketed file — layout not trustworthy
      }
    }
    val scan = new BucketedScan(delegate,
      byBucket.iterator.map { case (b, fs) => b -> fs.toArray }.toArray)
    val table = new BucketedBaseTable("graft_bucketed_base", schema)
    val relation = DataSourceV2Relation.create(table, None, None, opts)
    val keyAttrs = relation.output.filter(a => mergeKeys.contains(a.name))
    if (keyAttrs.length != mergeKeys.length) return None
    // Keys in MERGE-KEY ORDER (hash argument order is part of the layout).
    val ordered = mergeKeys.map(k => keyAttrs.find(_.name == k).get)
    val fn = GraftBucketFunction(numBuckets,
      StructType(ordered.map(a => org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable))))
    val kgp = Seq(TransformExpression(fn, ordered, Some(numBuckets)))
    val scanRel = DataSourceV2ScanRelation(relation, scan, relation.output, Some(kgp), None)
    Some(org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], scanRel))
  }
}
