package graft.spark

import java.util

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Literal, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.csv.CSVFileFormat
import org.apache.spark.sql.execution.datasources.json.JsonFileFormat
import org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.csv.CSVTable
import org.apache.spark.sql.execution.datasources.v2.json.JsonTable
import org.apache.spark.sql.execution.datasources.v2.orc.OrcTable
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{GraftCatalog, TableHandle}
import graft.model.{ContentType, DeltaType}

/**
 * DSv2 read path for Graft tables (SURVEY §7.3; reference analog
 * utils/daft.py:96-307): makes tables visible to Spark SQL with full
 * filter / column / limit pushdown.
 *
 * Scanning delegates to Spark's own vectorized parquet DSv2 table over the
 * manifest's ACTIVE file list, so `ParquetScanBuilder`'s
 * `SupportsPushDownFilters/RequiredColumns/Limit/Aggregates` all apply
 * unchanged — the Graft layer contributes snapshot resolution (time
 * travel via the `asOf` option) and manifest pruning, which is exactly the
 * division of labor a lakehouse format wants.
 *
 * v1 restriction: the DSv2 scan serves read-optimized state. Tables with
 * UNRESOLVED merge deltas (pending upserts/deletes beyond the compaction
 * watermark) are rejected with guidance — with the default
 * read_optimization=MAX every merge write compacts eagerly, so this only
 * bites merge-on-read-configured tables, which `GraftCatalog.readTable`
 * serves.
 */
object GraftDsv2 {

  final case class Resolved(handle: TableHandle, schema: StructType, paths: Seq[String],
      unresolvedMerges: Int, contentType: ContentType,
      /** Some delta was written with a column subset (scan-faithfulness
        * hazards: positional csv misalignment, unmaterialized past
        * defaults). */
      hasPartialDeltas: Boolean, hasPastDefaults: Boolean,
      /** Some active delta predates a field rename: its files carry the old
        * physical column name, which the delegate scan (current schema,
        * name-matched) would silently read as null. */
      hasStaleRenames: Boolean,
      /** Catalog root + whether this snapshot is pinned to the past (asOf):
        * the write path needs the former and must reject the latter. */
      root: String = "", timeTravel: Boolean = false)

  def resolve(root: String, table: String, asOf: Option[Long]): Resolved = {
    require(root != null, "option 'root' (catalog root dir) is required")
    require(table != null, "option 'table' (ns.table) is required")
    val spark = SparkSession.active
    val cat = new GraftCatalog(spark, root)
    val meta = cat.getTableMeta(table, asOf)
    val schema = org.apache.spark.sql.types.DataType.fromJson(meta.schemaJson)
      .asInstanceOf[StructType]
    val t = TableHandle.parse(table)
    val deltas = cat.effectiveDeltas(t, asOf)
    val (base, pending) = graft.catalog.MergeRead.activeDeltas(deltas)
    val unresolved = pending.count(d =>
      d.typed == DeltaType.Upsert || d.typed == DeltaType.Delete)
    val fullSet = schema.fieldNames.toSet
    val active = base.toSeq ++ pending
    val hasPartial = active.exists(d =>
      d.properties.get("written_columns").exists(_.split(",").toSet != fullSet))
    val hasDefaults = schema.fields.exists(f => graft.model.FieldMeta.pastDefault(f).isDefined)
    // Deltas whose written_columns still carry a pre-rename name (absent
    // written_columns on a renamed table is treated as stale — age unknown).
    val renamedOld = schema.fields.flatMap(graft.model.FieldMeta.renamedFrom).toSet
    val staleRenames = renamedOld.nonEmpty && active.exists(d =>
      d.properties.get("written_columns")
        .map(_.split(",").exists(renamedOld)).getOrElse(true))
    Resolved(t, schema, active.flatMap(_.entries).map(_.path), unresolved,
      cat.contentTypeOf(meta), hasPartial, hasDefaults, staleRenames,
      root = root, timeTravel = asOf.isDefined)
  }

  def table(r: Resolved): GraftTable = new GraftTable(r)
}

/** A Graft table exposed through DSv2; scans delegate to ParquetTable.
  * Batch writes (`INSERT INTO` / `df.writeTo(...).append()`) route through
  * the V1 InsertableRelation fallback into the catalog's transactional
  * write path — so SQL inserts get the same MVCC commit, schema policy,
  * and auto-compaction as `GraftCatalog.writeToTable`. */
final class GraftTable(resolved: GraftDsv2.Resolved) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft.${resolved.handle}"
  override def schema(): StructType = resolved.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder = {
    require(!resolved.timeTravel,
      s"cannot write to ${resolved.handle}: the table was resolved asOf a past snapshot")
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var overwrite = false
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
        overwrite = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation: org.apache.spark.sql.sources.InsertableRelation =
            new org.apache.spark.sql.sources.InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame, ovr: Boolean): Unit = {
                val cat = new GraftCatalog(SparkSession.active, resolved.root)
                val mode =
                  if (overwrite || ovr) graft.model.WriteMode.Replace
                  else graft.model.WriteMode.Auto
                cat.writeToTable(data, resolved.handle.toString, mode)
              }
            }
        }
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Deferred to scan time (not schema resolution) so the streaming path —
    // which resolves schema through this provider before falling back to
    // the V1 stream source — still plans.
    require(resolved.unresolvedMerges == 0,
      s"${resolved.handle} has ${resolved.unresolvedMerges} unresolved merge delta(s); " +
        "compact() first or read through GraftCatalog.readTable (merge-on-read)")
    // The delegate scan cannot regroup files by written-column subset
    // (csv positional layout) or backfill declared past defaults — reject
    // rather than silently misread; compact() materializes both.
    require(!(resolved.hasPartialDeltas && resolved.contentType.format == "csv"),
      s"${resolved.handle} has column-subset deltas in a delimited format; " +
        "compact() first or use GraftCatalog.readTable")
    require(!(resolved.hasPartialDeltas && resolved.hasPastDefaults),
      s"${resolved.handle} has unmaterialized past_default columns; " +
        "compact() first or use GraftCatalog.readTable")
    // Old files carry pre-rename physical column names; the delegate would
    // read the renamed column as null. Compaction rewrites to new names.
    require(!resolved.hasStaleRenames,
      s"${resolved.handle} has files written before a column rename; " +
        "compact() first or use GraftCatalog.readTable")
    val spark = SparkSession.active
    // recursiveFileLookup disables partition inference, so physical-layout
    // dirs (_g_bucket=N, _g_p_*) never leak into the schema. Content-type
    // read options (delimiter, null sentinel) ride along for delimited
    // formats.
    val ct = resolved.contentType
    val opts = new CaseInsensitiveStringMap(
      (options.asScala ++ ct.readOptions ++ Map("recursiveFileLookup" -> "true")).asJava)
    val delegate: Table with SupportsRead = ct match {
      case ContentType.Parquet =>
        ParquetTable(name(), spark, opts, resolved.paths, Some(resolved.schema),
          classOf[ParquetFileFormat])
      case ContentType.Csv | ContentType.Tsv | ContentType.Psv =>
        CSVTable(name(), spark, opts, resolved.paths, Some(resolved.schema),
          classOf[CSVFileFormat])
      case ContentType.Json =>
        JsonTable(name(), spark, opts, resolved.paths, Some(resolved.schema),
          classOf[JsonFileFormat])
      case ContentType.Orc =>
        OrcTable(name(), spark, opts, resolved.paths, Some(resolved.schema),
          classOf[OrcFileFormat])
      case other => throw new UnsupportedOperationException(
        s"DSv2 scan does not support content type ${other.name}")
    }
    delegate.newScanBuilder(opts)
  }
}

/** `spark.read.format("graft").option("root", …).option("table", "ns.t")`;
  * also a streaming source (`spark.readStream.format("graft")…` consumes the
  * delta log incrementally by stream position) and a streaming sink
  * (`df.writeStream.format("graft")…` commits one exactly-once delta per
  * micro-batch). */
class GraftDataSource extends TableProvider with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {
  override def shortName(): String = "graft"

  override def createSink(sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    import org.apache.spark.sql.streaming.OutputMode
    require(partitionColumns.isEmpty,
      "partitionBy on the graft sink is unsupported; declare a PartitionScheme " +
        "on the table instead (createTable partitionScheme=…)")
    val mode = parameters.get("writeMode").map(graft.model.WriteMode.fromName)
      .getOrElse {
        if (outputMode == OutputMode.Update()) graft.model.WriteMode.Merge
        else if (outputMode == OutputMode.Complete()) graft.model.WriteMode.Replace
        else graft.model.WriteMode.Auto
      }
    // Exactly-once scope = the checkpoint (Spark's batchId sequence is
    // per-checkpoint), so the sink needs a stable checkpoint identity: a
    // shared fallback key would let two queries clobber each other's
    // batch-id marker and silently skip batches, and a random key would
    // break replay dedup across restarts. Resolution mirrors Spark's own:
    // the writer's checkpointLocation option, else the
    // spark.sql.streaming.checkpointLocation session conf + queryName
    // (exactly how StreamingQueryManager derives the checkpoint dir).
    // Full name-UUID keeps the table property key filename-safe without
    // truncation collisions.
    val checkpointId = parameters.get("checkpointLocation").orElse {
      SparkSession.active.conf.getOption("spark.sql.streaming.checkpointLocation")
        .flatMap(dir => parameters.get("queryName").map(q => s"$dir/$q"))
    }
    val queryKey = checkpointId
      .map(p => java.util.UUID.nameUUIDFromBytes(p.getBytes("UTF-8")).toString)
      .getOrElse(throw new IllegalArgumentException(
        "graft sink requires .option(\"checkpointLocation\", ...) on the writer " +
          "(or the spark.sql.streaming.checkpointLocation conf plus .queryName(...)) " +
          "— its exactly-once batch marker is scoped to the checkpoint"))
    val root = parameters.getOrElse("root", throw new IllegalArgumentException(
      "graft sink requires option 'root' (catalog root dir)"))
    val table = parameters.getOrElse("table", throw new IllegalArgumentException(
      "graft sink requires option 'table' (ns.table)"))
    new org.apache.spark.sql.graft.GraftStreamSink(sqlContext, root, table, mode, queryKey)
  }

  override def sourceSchema(sqlContext: org.apache.spark.sql.SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val cat = new GraftCatalog(SparkSession.active, parameters("root"))
    (shortName(), cat.tableSchema(parameters("table")))
  }

  override def createSource(sqlContext: org.apache.spark.sql.SQLContext,
      metadataPath: String, schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    new org.apache.spark.sql.graft.GraftStreamSource(sqlContext,
      parameters("root"), parameters("table"),
      parameters.getOrElse("ignoreChanges", "false").toBoolean)

  // One snapshot per provider instance: inferSchema and getTable are called
  // back-to-back per read; re-resolving would walk the txn log twice and
  // could observe two different snapshots. Only inferSchema (the START of a
  // read) refreshes past the TTL — getTable reuses whatever snapshot the
  // read began with regardless of age, so a slow-planning read can never
  // tear across a concurrent commit, while a LONG-lived provider instance
  // (Spark may reuse one across reads in a session) still sees newly
  // committed deltas on its next read.
  private val SnapshotTtlMillis = 2000L
  @volatile private var cached: (String, Long, GraftDsv2.Resolved) = _
  private def resolve(options: CaseInsensitiveStringMap, refresh: Boolean): GraftDsv2.Resolved = {
    val key = s"${options.get("root")}|${options.get("table")}|${options.get("asOf")}"
    val now = System.currentTimeMillis()
    val c = cached
    val fresh = c != null && c._1 == key &&
      (!refresh || now - c._2 < SnapshotTtlMillis)
    if (fresh) c._3
    else {
      val r = GraftDsv2.resolve(options.get("root"), options.get("table"),
        Option(options.get("asOf")).map(_.toLong))
      cached = (key, now, r)
      r
    }
  }

  // A missing table must NOT fail schema inference: writeStream resolves the
  // provider's Table before the sink exists (first batch creates it), and
  // DataStreamWriter only falls back to the V1 StreamSinkProvider when the
  // resolved table lacks STREAMING_WRITE — so absent tables yield a
  // capability-less placeholder instead of an exception. Batch reads of a
  // missing table still fail crisply (no BATCH_READ capability → analysis
  // error naming the table).
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    try resolve(options, refresh = true).schema
    catch { case _: graft.catalog.TableNotFound => new StructType() }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    try GraftDsv2.table(resolve(new CaseInsensitiveStringMap(properties), refresh = false))
    catch {
      case _: graft.catalog.TableNotFound =>
        val name = s"graft.${properties.get("table")} (not found)"
        new Table {
          override def name(): String = name
          override def schema(): StructType = new StructType()
          override def capabilities(): util.Set[TableCapability] =
            util.Collections.emptySet()
        }
    }
}

/**
 * Catalog plugin: `spark.sql.catalog.graft=graft.spark.GraftSparkCatalog`
 * (+ `.root=<dir>`) makes `SELECT … FROM graft.ns.t` resolve.
 */
class GraftSparkCatalog extends CatalogPlugin with TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null, s"spark.sql.catalog.$name.root must be set")
  }
  override def name(): String = catalogName

  private def cat = new GraftCatalog(SparkSession.active, root)
  private def fullName(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    cat.listTables(namespace.mkString(".")).map(t => Identifier.of(namespace, t)).toArray

  override def loadTable(ident: Identifier): Table = {
    if (!cat.tableExists(fullName(ident))) throw new NoSuchTableException(ident)
    GraftDsv2.table(GraftDsv2.resolve(root, fullName(ident), None))
  }

  override def tableExists(ident: Identifier): Boolean = cat.tableExists(fullName(ident))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val keys = partitions.map { t =>
      val field = t.references()(0).fieldNames().mkString(".")
      t.name() match {
        case "identity" => graft.model.PartitionKey(field)
        case "bucket" =>
          val n = t.arguments().collectFirst { case l: Literal[_] => l.value.toString.toInt }
            .getOrElse(throw new IllegalArgumentException(s"bucket transform without count: $t"))
          graft.model.PartitionKey(field, graft.model.Transform.Bucket(n))
        case "years" | "year" => graft.model.PartitionKey(field, graft.model.Transform.Year)
        case "months" | "month" => graft.model.PartitionKey(field, graft.model.Transform.Month)
        case "days" | "day" => graft.model.PartitionKey(field, graft.model.Transform.Day)
        case "hours" | "hour" => graft.model.PartitionKey(field, graft.model.Transform.Hour)
        case other => throw new UnsupportedOperationException(
          s"unsupported partition transform $other")
      }
    }
    cat.createTable(fullName(ident), schema,
      partitionScheme = graft.model.PartitionScheme(keys.toIndexedSeq),
      properties = properties.asScala.toMap)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER through Spark SQL is not supported; use GraftCatalog.alterTable")

  override def dropTable(ident: Identifier): Boolean =
    if (cat.tableExists(fullName(ident))) { cat.dropTable(fullName(ident)); true } else false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    require(oldIdent.namespace().sameElements(newIdent.namespace()),
      "rename across namespaces is not supported")
    cat.renameTable(fullName(oldIdent), newIdent.name())
  }

  // ------------------------------------------------------------- namespaces
  override def listNamespaces(): Array[Array[String]] =
    cat.listNamespaces().map(ns => Array(ns)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (cat.namespaceExists(namespace.mkString("."))) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!cat.namespaceExists(namespace.mkString("."))) {
      throw new NoSuchNamespaceException(namespace)
    }
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    cat.createNamespace(namespace.mkString("."), metadata.asScala.toMap)

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("alterNamespace is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "dropNamespace through Spark SQL is not supported; use GraftCatalog")
}
