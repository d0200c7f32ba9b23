package org.apache.spark.sql.graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal, Murmur3Hash, Pmod, TransformExpression}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.catalog.functions.ScalarFunction
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Attribute, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Not => CNot, Or => COr, StartsWith}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.sources
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
 * Reader and vectorization: delegated untouched to Spark's own
 * `ParquetTable` scan (the same delegate the DSv2 table uses); this class
 * only REGROUPS its planned splits by bucket directory. Filter pushdown is
 * NOT automatic here: the relation is a pre-bound `DataSourceV2ScanRelation`,
 * so `V2ScanRelationPushDown` never runs against it — predicates applied
 * above the merge would stop at the scan boundary. `frame` therefore
 * accepts the caller's already-translated safe filters and pushes them into
 * the delegate's `ScanBuilder` itself (the same
 * `FileScanBuilder.pushFilters` seam the rule would have used), restoring
 * parquet row-group/footer pruning; anything unconvertible is skipped —
 * the push is advisory and the engine re-applies the full predicate above.
 *
 * Parallelism: deliberately ONE partition per bucket — duplicate partition
 * keys would make an exchange-free aggregate over the scan wrong unless
 * Spark re-groups them, and relying on that grouping is fragile across
 * versions. Scan parallelism therefore equals the bucket count; that is
 * the right trade because `Compactor.suggestBuckets` scales buckets with
 * data volume (a 100 TB table has thousands), while the joins this scan
 * feeds are bounded by the pending side anyway. A bucket hot enough that
 * its single partition would straggle never reaches this scan: the
 * callers carve it out of the partitioned plan first
 * (MergeRead.partitionedWithCarveout) and resolve it through the
 * broadcast pass/contested split in ordinary parallel file splits.
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

  /** External-value class accepted for a column's pushed literal — a
    * mismatched runtime class would make `ParquetFilters` throw or build a
    * mis-typed row-group predicate, so mismatches skip the conjunct. */
  private def litClassOk(dt: DataType, v: Any): Boolean = v match {
    case null => true
    case _: java.lang.Integer => dt == IntegerType
    case _: java.lang.Long => dt == org.apache.spark.sql.types.LongType
    case _: java.lang.Short => dt == org.apache.spark.sql.types.ShortType
    case _: java.lang.Byte => dt == org.apache.spark.sql.types.ByteType
    case _: java.lang.Double => dt == org.apache.spark.sql.types.DoubleType
    case _: java.lang.Float => dt == org.apache.spark.sql.types.FloatType
    case _: java.lang.Boolean => dt == org.apache.spark.sql.types.BooleanType
    case _: String => dt == org.apache.spark.sql.types.StringType
    case _: java.math.BigDecimal | _: scala.math.BigDecimal =>
      dt.isInstanceOf[org.apache.spark.sql.types.DecimalType]
    case _: java.sql.Date | _: java.time.LocalDate =>
      dt == org.apache.spark.sql.types.DateType
    case _: java.sql.Timestamp | _: java.time.Instant =>
      dt == org.apache.spark.sql.types.TimestampType
    case _: Array[Byte] => dt == org.apache.spark.sql.types.BinaryType
    case _ => false
  }

  /** Rebuild a translated source filter as a catalyst predicate over
    * `attrs` — exactly the shapes `StatsSkip.translate` emits. None =
    * unconvertible (unknown attr, class-mismatched literal, unsupported
    * node); the caller drops it, which is always safe because the full
    * predicate re-applies above the merge. */
  private def filterToExpr(f: sources.Filter, attrs: Map[String, Attribute])
      : Option[Expression] = {
    def attr(n: String): Option[Attribute] = attrs.get(n)
      .orElse(attrs.collectFirst { case (k, a) if k.equalsIgnoreCase(n) => a })
    def typed(n: String, v: Any): Option[(Attribute, Expression)] =
      attr(n).filter(a => litClassOk(a.dataType, v))
        .map(a => a -> org.apache.spark.sql.catalyst.expressions.Literal.create(v, a.dataType))
    f match {
      case sources.And(l, r) =>
        for { le <- filterToExpr(l, attrs); re <- filterToExpr(r, attrs) } yield CAnd(le, re)
      case sources.Or(l, r) =>
        for { le <- filterToExpr(l, attrs); re <- filterToExpr(r, attrs) } yield COr(le, re)
      case sources.Not(c) => filterToExpr(c, attrs).map(CNot)
      case sources.EqualTo(n, v) => typed(n, v).map { case (a, l) => EqualTo(a, l) }
      case sources.EqualNullSafe(n, v) => typed(n, v).map { case (a, l) => EqualNullSafe(a, l) }
      case sources.GreaterThan(n, v) => typed(n, v).map { case (a, l) => GreaterThan(a, l) }
      case sources.GreaterThanOrEqual(n, v) => typed(n, v).map { case (a, l) => GreaterThanOrEqual(a, l) }
      case sources.LessThan(n, v) => typed(n, v).map { case (a, l) => LessThan(a, l) }
      case sources.LessThanOrEqual(n, v) => typed(n, v).map { case (a, l) => LessThanOrEqual(a, l) }
      case sources.In(n, vs) if vs != null && vs.nonEmpty =>
        attr(n).filter(a => vs.forall(v => litClassOk(a.dataType, v))).map(a =>
          In(a, vs.toSeq.map(v =>
            org.apache.spark.sql.catalyst.expressions.Literal.create(v, a.dataType))))
      case sources.IsNull(n) => attr(n).map(IsNull)
      case sources.IsNotNull(n) => attr(n).map(IsNotNull)
      case sources.StringStartsWith(n, p) if p != null =>
        typed(n, p).map { case (a, l) => StartsWith(a, l) }
      case _ => None
    }
  }

  /**
   * DataFrame over the base files with bucket-aligned output partitioning.
   * Returns None when the layout can't be trusted: a file without a
   * `_g_bucket=N` segment, or an empty file list. `bucketOf` is the
   * catalog's path→bucket parser (single source of truth for the layout).
   * `pushFilters`: already-SAFE translated predicates (the caller owns the
   * merge-semantics argument — under unresolved merges only merge-key
   * conjuncts qualify, and key predicates drop every version of a key
   * consistently) pushed into the delegate scan for row-group pruning.
   */
  def frame(
      spark: SparkSession,
      schema: StructType,
      mergeKeys: Seq[String],
      numBuckets: Int,
      paths: Seq[String],
      bucketOf: String => Option[Int],
      extraOptions: Map[String, String] = Map.empty,
      pushFilters: Seq[sources.Filter] = Nil): Option[DataFrame] = {
    if (paths.isEmpty || mergeKeys.isEmpty || numBuckets <= 0) return None
    val opts = new CaseInsensitiveStringMap(
      (extraOptions ++ Map("recursiveFileLookup" -> "true")).asJava)
    val builder = ParquetTable("graft_bucketed_base", spark, opts, paths,
      Some(schema), classOf[ParquetFileFormat])
      .newScanBuilder(opts)
    if (pushFilters.nonEmpty) builder match {
      case fsb: FileScanBuilder =>
        val attrMap = DataTypeUtils.toAttributes(schema).map(a => a.name -> (a: Attribute)).toMap
        val exprs = pushFilters.flatMap(filterToExpr(_, attrMap))
        if (exprs.nonEmpty) fsb.pushFilters(exprs)
      case _ => () // non-file builder: skip the advisory push
    }
    val delegate = builder.build()
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
