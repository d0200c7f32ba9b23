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
      root: String = "", timeTravel: Boolean = false,
      /** Manifest byte sizes aligned with `paths` — input-partition planning
        * must not re-stat 10^5 files on the driver. */
      fileSizes: Seq[Long] = Nil,
      /** Full manifest entries (incl. per-file footer stats) — the
        * data-skipping index consulted at filter pushdown. EMPTY when
        * `deferred` (the gated big-manifest path): use `entriesProvider`. */
      entries: Seq[graft.txn.ManifestEntry] = Nil,
      /** Above the manifest-size gate, entry materialization is DEFERRED to
        * filter-pushdown time: the provider prunes entries in a Spark job
        * against the pushed filters and only survivors reach the driver
        * (parquet scan path only — other content types materialize
        * eagerly). */
      deferred: Boolean = false,
      entriesProvider: (Seq[org.apache.spark.sql.sources.Filter], Option[Int]) => Seq[graft.txn.ManifestEntry] = null,
      /** Manifest-aggregate roll-up source (distributed under the gate) —
        * keeps count/min/max metadata-only at any manifest size. */
      statsSummary: () => graft.catalog.ManifestPlanner.StatsSummary = null)

  def resolve(root: String, table: String, asOf: Option[Long]): Resolved = {
    require(root != null, "option 'root' (catalog root dir) is required")
    require(table != null, "option 'table' (ns.table) is required")
    val spark = SparkSession.active
    val cat = new GraftCatalog(spark, root)
    // ONE metadata resolution feeds everything — meta/schema, the delta
    // skeletons, and the entry provider — so a concurrent schema change or
    // version activation cannot make the prune and the scan disagree
    val plan = cat.dsv2Plan(table, asOf)
    val meta = plan.meta
    val schema = org.apache.spark.sql.types.DataType.fromJson(meta.schemaJson)
      .asInstanceOf[StructType]
    val t = TableHandle.parse(table)
    // same lifecycle gate as readTable: an unpinned name serves only the
    // latest ACTIVE version — a staged (UNRELEASED/CREATED) or deprecated
    // version must not leak through the SQL/DSv2 surface either
    if (t.version.isEmpty && meta.lifecycleState != graft.catalog.Lifecycle.Active)
      throw new graft.catalog.NoActiveTableVersion(table, meta.lifecycleState)
    val (deltas, provider, gated) = (plan.deltas, plan.provider, plan.gated)
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
    val ct = cat.contentTypeOf(meta)
    // Deferral serves the parquet scan-builder path only; other content
    // types (and the write/DML surfaces, which never read entries)
    // materialize eagerly.
    val deferred = gated && ct == ContentType.Parquet
    val entries = if (deferred) Nil else provider(Nil, None)
    // DML targets the PINNED handle this resolution chose (plan.handle) —
    // a version activation between scan and write cannot redirect the
    // write into a different version's delta stream. Single-version
    // tables resolve to the unpinned handle, so nothing changes for them.
    Resolved(plan.handle, schema, entries.map(_.path), unresolved,
      ct, hasPartial, hasDefaults, staleRenames,
      root = root, timeTravel = asOf.isDefined,
      fileSizes = entries.map(_.sizeBytes), entries = entries,
      deferred = deferred, entriesProvider = provider,
      statsSummary = plan.statsSummary)
  }

  def table(r: Resolved): GraftTable = new GraftTable(r)

  /** SQL DML (INSERT on keyed tables, DELETE FROM) leaves pending merge
    * deltas when the write-amplification valve defers compaction — fine for
    * the programmatic path (readTable is merge-on-read) but fatal for the
    * SQL surface, whose scans serve read-optimized state only: the next
    * SELECT would fail with "compact() first". SQL-path writes therefore
    * force-resolve any pending merges the valve deferred. */
  def ensureReadOptimized(cat: GraftCatalog, table: String): Unit = {
    // skeleton view: runs after EVERY SQL DML statement, so it must not
    // parse entries on a large backlog just to inspect delta types
    val deltas = cat.deltaLogSkeleton(table)
    val (_, pending) = graft.catalog.MergeRead.activeDeltas(deltas)
    if (pending.exists(d => d.typed == DeltaType.Upsert || d.typed == DeltaType.Delete))
      cat.compact(table)
  }
}

/** A Graft table exposed through DSv2; scans delegate to ParquetTable.
  * Batch writes (`INSERT INTO` / `df.writeTo(...).append()`) route through
  * the V1 InsertableRelation fallback into the catalog's transactional
  * write path — so SQL inserts get the same MVCC commit, schema policy,
  * and auto-compaction as `GraftCatalog.writeToTable`. `DELETE FROM`
  * translates merge-key equality predicates into an equality-delete delta
  * (reference delete_strategy_equality_delete.py) — the lakehouse-native
  * metadata delete, no data files rewritten until compaction. */
final class GraftTable(resolved: GraftDsv2.Resolved) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete {

  import org.apache.spark.sql.sources.{AlwaysTrue, And, EqualNullSafe, EqualTo, Filter, In, Or}

  private def mergeKeys: Seq[String] = graft.model.FieldMeta.mergeKeys(resolved.schema)

  // Metadata accessors for the DML planner strategy, which lives under
  // org.apache.spark.sql.graft (outside this package's private scopes).
  def tableRef: String = resolved.handle.toString
  def catalogRoot: String = resolved.root
  def isTimeTravel: Boolean = resolved.timeTravel
  def mergeKeyNames: Seq[String] = mergeKeys

  /** Cross-product conjunction of two tuple sets. A key constrained on both
    * sides (id=1 AND id=2) is contradictory — reject rather than guess. */
  private def conjoin(a: Option[Seq[Map[String, Any]]], b: Option[Seq[Map[String, Any]]]):
      Option[Seq[Map[String, Any]]] =
    for {
      as <- a; bs <- b
      merged <- {
        val ms = for (am <- as; bm <- bs) yield
          if (am.keySet.intersect(bm.keySet).nonEmpty) None else Some(am ++ bm)
        if (ms.contains(None)) None else Some(ms.flatten)
      }
    } yield merged

  /** Expand a predicate tree into complete merge-key tuples (a DNF over
    * EqualTo / null-safe EqualTo / In on the merge keys), or None when the
    * predicate cannot be expressed as equality deletes. */
  private def keyTuples(f: Filter, keys: Set[String]): Option[Seq[Map[String, Any]]] = f match {
    case EqualTo(a, v) if keys(a) => Some(Seq(Map(a -> v)))
    case EqualNullSafe(a, v) if keys(a) => Some(Seq(Map(a -> v)))
    case In(a, vs) if keys(a) => Some(vs.toSeq.map(v => Map(a -> v)))
    case Or(l, r) => for { lt <- keyTuples(l, keys); rt <- keyTuples(r, keys) } yield lt ++ rt
    case And(l, r) => conjoin(keyTuples(l, keys), keyTuples(r, keys))
    case _ => None
  }

  /** The conjunction of `filters` as complete merge-key tuples, or None. */
  private def tuplesFor(filters: Array[Filter]): Option[Seq[Map[String, Any]]] = {
    val keys = mergeKeys
    if (keys.isEmpty) return None
    val keySet = keys.toSet
    filters.map(keyTuples(_, keySet)).reduceLeftOption(conjoin)
      .flatten.map(_.distinct).filter(ts => ts.nonEmpty && ts.forall(_.keySet == keySet))
  }

  private def realFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot(_ == AlwaysTrue())

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    realFilters(filters).isEmpty || tuplesFor(realFilters(filters)).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(!resolved.timeTravel,
      s"cannot delete from ${resolved.handle}: the table was resolved asOf a past snapshot")
    val spark = SparkSession.active
    val cat = new GraftCatalog(spark, resolved.root)
    val real = realFilters(filters)
    if (real.isEmpty) { cat.truncateTable(resolved.handle.toString); return }
    val tuples = tuplesFor(real).getOrElse(throw new UnsupportedOperationException(
      s"DELETE FROM ${resolved.handle} supports only merge-key equality predicates " +
        s"(=, <=>, IN, AND/OR of those, covering all of: ${mergeKeys.mkString(", ")}); " +
        s"got: ${real.mkString(" AND ")}"))
    val keys = mergeKeys
    // Nullable copies: `WHERE k <=> NULL` deletes the null-key row, which
    // the equality-delete path supports even on non-nullable declarations.
    val keySchema = StructType(keys.map(k => resolved.schema(k).copy(nullable = true)))
    val rows = tuples.map(m => org.apache.spark.sql.Row.fromSeq(keys.map(m(_))))
    val df = spark.createDataFrame(rows.asJava, keySchema)
    cat.writeToTable(df, resolved.handle.toString, graft.model.WriteMode.Delete)
    GraftDsv2.ensureReadOptimized(cat, resolved.handle.toString)
  }
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
                // SQL readers cannot merge-on-read — resolve any deferred
                // merge so the next SELECT sees read-optimized state.
                GraftDsv2.ensureReadOptimized(cat, resolved.handle.toString)
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
        // Stats-pruning interposer: pushed filters drop whole files via the
        // manifest's footer stats before the parquet scan is built. Under
        // the deferred big-manifest path the provider ALSO defers entry
        // materialization itself to pushdown time (distributed prune).
        if (resolved.deferred)
          return new StatsPruningScanBuilder(resolved.schema, resolved.entriesProvider,
            resolved.statsSummary,
            ps => ParquetTable(name(), spark, opts, ps, Some(resolved.schema),
              classOf[ParquetFileFormat]).newScanBuilder(opts),
            deferredPath = true, tag = resolved.handle.toString)
        if (resolved.entries.exists(_.stats != null))
          return new StatsPruningScanBuilder(resolved.schema, (_, _) => resolved.entries,
            resolved.statsSummary,
            ps => ParquetTable(name(), spark, opts, ps, Some(resolved.schema),
              classOf[ParquetFileFormat]).newScanBuilder(opts),
            tag = resolved.handle.toString)
        ParquetTable(name(), spark, opts, resolved.paths, Some(resolved.schema),
          classOf[ParquetFileFormat])
      case ContentType.Csv | ContentType.Tsv | ContentType.UnescapedTsv | ContentType.Psv =>
        CSVTable(name(), spark, opts, resolved.paths, Some(resolved.schema),
          classOf[CSVFileFormat])
      case ContentType.Json =>
        JsonTable(name(), spark, opts, resolved.paths, Some(resolved.schema),
          classOf[JsonFileFormat])
      case ContentType.Orc =>
        OrcTable(name(), spark, opts, resolved.paths, Some(resolved.schema),
          classOf[OrcFileFormat])
      // Graft's own V1 formats have no built-in V2 file table; a thin
      // generic scan drives their buildReader (one partition per file).
      case ContentType.Avro =>
        return new V1FormatScanBuilder(spark,
          new org.apache.spark.sql.graft.formats.AvroFileFormat(),
          resolved.schema, resolved.paths, resolved.fileSizes, opts)
      case ContentType.Feather =>
        return new V1FormatScanBuilder(spark,
          new org.apache.spark.sql.graft.formats.FeatherFileFormat(),
          resolved.schema, resolved.paths, resolved.fileSizes, opts)
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
      parameters.getOrElse("ignoreChanges", "false").toBoolean,
      parameters.get("rowFilter"),
      parameters.get("maxDeltasPerTrigger").map(_.toInt),
      parameters.get("maxFilesPerTrigger").map(_.toInt),
      metadataPath = Some(metadataPath))

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
  private def zipGroups(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("zip")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    try {
      if (options.containsKey("zip"))
        // zipped read (round-11): schema is the selected groups' zip
        new GraftCatalog(SparkSession.active, options.get("root"))
          .readZipped(options.get("table"), zipGroups(options),
            graft.catalog.ReadOptions(
              asOf = Option(options.get("asOf")).map(_.toLong))).schema
      else resolve(options, refresh = true).schema
    } catch { case _: graft.catalog.TableNotFound => new StructType() }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    try {
      val opts = new CaseInsensitiveStringMap(properties)
      if (opts.containsKey("zip"))
        new GraftZippedTable(opts.get("root"), opts.get("table"),
          zipGroups(opts), Option(opts.get("asOf")).map(_.toLong), schema)
      else GraftDsv2.table(resolve(opts, refresh = false))
    } catch {
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

/** Round-11 stretch: `spark.read.format("graft").option("zip", "nums,flag")`
  * — the zipper read for DataFrameReader users (SQL has the
  * `graft_read_zipped` TVF; Scala has `readZipped`). The zip is a
  * multi-frame join plan no file-scan Table can express, so this Table's
  * scan goes through Spark's V1Scan compatibility shim (the JDBC source's
  * mechanism): filter and column pushdown land in `ReadOptions` — key-only
  * conjuncts therefore still prune each column group's manifest, exactly
  * as in the Scala API — and the relation hands Spark the zipped plan's
  * own InternalRow RDD (`needConversion = false`), so no row re-encoding
  * happens at the bridge. Every filter is also reported back as
  * post-scan residual: the pushed copy only PRUNES, Spark keeps the
  * authoritative evaluation (idempotent, and immune to translation
  * drift). Read-only: no write capabilities, so INSERT fails crisply. */
final class GraftZippedTable(root: String, table: String, groups: Seq[String],
    asOf: Option[Long], zipSchema: StructType)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.{sources => f}

  override def name(): String = s"graft.$table (zipped ${if (groups.isEmpty) "*" else groups.mkString(",")})"
  override def schema(): StructType = zipSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  /** sources.Filter → Column, for the shapes ReadOptions.rowFilter can
    * use; None = not translatable (stays residual-only, still correct). */
  private def toColumn(flt: f.Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    def c(a: String) = col(s"`$a`")
    flt match {
      case f.EqualTo(a, v) => Some(c(a) === lit(v))
      case f.EqualNullSafe(a, v) => Some(c(a) <=> lit(v))
      case f.GreaterThan(a, v) => Some(c(a) > lit(v))
      case f.GreaterThanOrEqual(a, v) => Some(c(a) >= lit(v))
      case f.LessThan(a, v) => Some(c(a) < lit(v))
      case f.LessThanOrEqual(a, v) => Some(c(a) <= lit(v))
      case f.In(a, vs) => Some(c(a).isin(vs.toIndexedSeq: _*))
      case f.IsNull(a) => Some(c(a).isNull)
      case f.IsNotNull(a) => Some(c(a).isNotNull)
      case f.StringStartsWith(a, v) => Some(c(a).startsWith(v))
      case f.StringEndsWith(a, v) => Some(c(a).endsWith(v))
      case f.StringContains(a, v) => Some(c(a).contains(v))
      case f.And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
      case f.Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
      case f.Not(x) => toColumn(x).map(!_)
      case _ => None
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private var pushed: Array[f.Filter] = Array.empty
      private var required: StructType = zipSchema

      override def pushFilters(filters: Array[f.Filter]): Array[f.Filter] = {
        pushed = filters.filter(toColumn(_).isDefined)
        filters // everything stays residual — the push only prunes
      }
      override def pushedFilters(): Array[f.Filter] = pushed
      override def pruneColumns(s: StructType): Unit = required = s

      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.V1Scan {
          private val cond = pushed.flatMap(toColumn(_)).reduceOption(_ && _)
          private val req = required
          override def readSchema(): StructType = req
          override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
              with org.apache.spark.sql.sources.TableScan](
              ctx: org.apache.spark.sql.SQLContext): T =
            (new org.apache.spark.sql.sources.BaseRelation
                with org.apache.spark.sql.sources.TableScan {
              override def sqlContext: org.apache.spark.sql.SQLContext = ctx
              override def schema: StructType = req
              // rows are the zipped plan's own InternalRows — no conversion
              override def needConversion: Boolean = false
              override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
                val cat = new GraftCatalog(ctx.sparkSession, root)
                val base = cat.readZipped(table, groups, graft.catalog.ReadOptions(
                  rowFilter = cond, asOf = asOf,
                  columns = Option(req.fieldNames.toSeq).filter(_.nonEmpty)))
                val projected =
                  if (req.isEmpty) base.select() // count(*)-style empty projection
                  else base
                projected.queryExecution.toRdd
                  .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
              }
            }).asInstanceOf[T]
        }
    }
}

/** `spark.sql.extensions=graft.spark.GraftSparkExtensions` registers the
  * SQL UPDATE / MERGE INTO planner strategy at session build time (the
  * GraftSparkCatalog also self-registers it on initialize). */
class GraftSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.GraftDmlStrategy)
    org.apache.spark.sql.graft.GraftFunctions.injectable.foreach(ext.injectFunction)
    org.apache.spark.sql.graft.GraftFunctions.tableInjectable.foreach(ext.injectTableFunction)
  }
}

/**
 * Catalog plugin: `spark.sql.catalog.graft=graft.spark.GraftSparkCatalog`
 * (+ `.root=<dir>`) makes `SELECT … FROM graft.ns.t` resolve.
 */
class GraftSparkCatalog extends CatalogPlugin with TableCatalog with SupportsNamespaces
    with ProcedureCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null, s"spark.sql.catalog.$name.root must be set")
    // Auto-enable the UPDATE/MERGE INTO planner strategy for this session:
    // configuring the graft catalog is the opt-in. (Also available without
    // a catalog via spark.sql.extensions=graft.spark.GraftSparkExtensions.)
    val exp = SparkSession.active.experimental
    if (!exp.extraStrategies.contains(org.apache.spark.sql.graft.GraftDmlStrategy))
      exp.extraStrategies = exp.extraStrategies :+ org.apache.spark.sql.graft.GraftDmlStrategy
    // The zipper TVF rides the same opt-in (extension injection only works
    // at session build; a live session registers directly).
    org.apache.spark.sql.graft.GraftFunctions.registerTable(SparkSession.active)
  }
  override def name(): String = catalogName

  // SQL stored procedures: CALL cat.system.{compact,analyze,zorder,janitor}
  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(root, ident).getOrElse(
      throw new IllegalArgumentException(
        s"undefined procedure: $ident (available: " +
          GraftProcedures.Names.map(n => s"$catalogName.system.$n").mkString(", ") + ")"))
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  private def cat = new GraftCatalog(SparkSession.active, root)
  private def fullName(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    cat.listTables(namespace.mkString(".")).map(t => Identifier.of(namespace, t)).toArray

  override def loadTable(ident: Identifier): Table = {
    if (!cat.tableExists(fullName(ident))) throw new NoSuchTableException(ident)
    GraftDsv2.table(GraftDsv2.resolve(root, fullName(ident), None))
  }

  /** SQL `VERSION AS OF n` — n is a delta stream position; the read is
    * pinned to the commit time of the transaction that wrote delta n. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!cat.tableExists(fullName(ident))) throw new NoSuchTableException(ident)
    val v =
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft table versions are delta stream positions (integers); got '$version'")
      }
    GraftDsv2.table(GraftDsv2.resolve(root, fullName(ident),
      Some(cat.versionAsOf(fullName(ident), v))))
  }

  /** SQL `TIMESTAMP AS OF t` — Spark hands the timestamp in MICROseconds;
    * the metastore's asOf granularity is millis. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val asOfMillis = timestamp / 1000L
    if (!cat.tableExists(fullName(ident), Some(asOfMillis))) {
      throw new NoSuchTableException(ident)
    }
    GraftDsv2.table(GraftDsv2.resolve(root, fullName(ident), Some(asOfMillis)))
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

  /** SQL ALTER TABLE → GraftCatalog.alterTable, one atomic commit for the
    * whole change set. DROP/RENAME COLUMN are explicit DDL intent, so they
    * pass the `allowIncompatibleChanges` gate the programmatic API requires;
    * merge/partition/sort-key protection still applies underneath. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    import TableChange._
    val name = fullName(ident)
    def topLevel(fieldNames: Array[String], what: String): String = {
      if (fieldNames.length != 1) throw new UnsupportedOperationException(
        s"$what of nested column ${fieldNames.mkString(".")} is not supported")
      fieldNames(0)
    }
    var added = Vector.empty[org.apache.spark.sql.types.StructField]
    var retyped = Map.empty[String, org.apache.spark.sql.types.DataType]
    var renames = Map.empty[String, String]
    var removes = Vector.empty[String]
    var setProps = Map.empty[String, String]
    var removeProps = Vector.empty[String]
    changes.foreach {
      case a: AddColumn =>
        if (a.position() != null) throw new UnsupportedOperationException(
          "ADD COLUMN ... FIRST/AFTER is not supported (columns append)")
        added :+= org.apache.spark.sql.types.StructField(
          topLevel(a.fieldNames(), "add"), a.dataType(), a.isNullable())
      case r: RenameColumn => renames += topLevel(r.fieldNames(), "rename") -> r.newName()
      case d: DeleteColumn => removes :+= topLevel(d.fieldNames(), "drop")
      case u: UpdateColumnType => retyped += topLevel(u.fieldNames(), "retype") -> u.newDataType()
      case s: SetProperty => setProps += s.property() -> s.value()
      case r: RemoveProperty => removeProps :+= r.property()
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change: $other")
    }
    val newSchema =
      if (added.isEmpty && retyped.isEmpty) None
      else {
        val cur = cat.tableSchema(name)
        retyped.keys.find(!cur.fieldNames.contains(_)).foreach(f =>
          throw new IllegalArgumentException(s"cannot alter unknown column $f of $name"))
        // Widening only, per the promotion lattice: the physical files keep
        // the old type, which the scan reads under the widened declaration.
        retyped.foreach { case (f, to) =>
          val from = cur(f).dataType
          val promoted = graft.model.TypePromotion.promote(from, to)
          if (!promoted.contains(to)) throw new IllegalArgumentException(
            s"cannot change $f of $name from ${from.sql} to ${to.sql}: " +
              "only widening type changes are supported")
        }
        Some(org.apache.spark.sql.types.StructType(
          cur.fields.map(f => retyped.get(f.name).map(t => f.copy(dataType = t)).getOrElse(f))
            ++ added))
      }
    // A schema built from the CURRENT field set cannot also describe the
    // post-rename/remove layout; SQL never batches those together anyway.
    if (newSchema.isDefined && (renames.nonEmpty || removes.nonEmpty))
      throw new UnsupportedOperationException(
        "cannot combine ADD/ALTER COLUMN with DROP/RENAME COLUMN in one ALTER TABLE")
    cat.alterTable(name, newSchema = newSchema, setProperties = setProps,
      removeFields = removes, renameFields = renames,
      allowIncompatibleChanges = removes.nonEmpty || renames.nonEmpty,
      removeProperties = removeProps)
    // A rename leaves data files under the old physical column name, which
    // the SQL scan (delegate, name-matched) cannot alias — compaction
    // rewrites them under current names so the next SELECT just works.
    if (renames.nonEmpty) cat.compact(name)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    if (cat.tableExists(fullName(ident))) { cat.dropTable(fullName(ident)); true } else false

  /** SQL `DROP TABLE ... PURGE` — also deletes the data files (the
    * reference declares the flag but raises NotImplementedError). */
  override def purgeTable(ident: Identifier): Boolean =
    if (cat.tableExists(fullName(ident))) {
      cat.dropTable(fullName(ident), purge = true); true
    } else false

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
    val ns = namespace.mkString(".")
    if (!cat.namespaceExists(ns)) throw new NoSuchNamespaceException(namespace)
    cat.namespaceProperties(ns).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    cat.createNamespace(namespace.mkString("."), metadata.asScala.toMap)

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit = {
    val sets = changes.collect {
      case s: NamespaceChange.SetProperty => s.property() -> s.value()
    }.toMap
    val unsupported = changes.filterNot(_.isInstanceOf[NamespaceChange.SetProperty])
    if (unsupported.nonEmpty) throw new UnsupportedOperationException(
      s"unsupported ALTER NAMESPACE change: ${unsupported.head}")
    cat.alterNamespace(namespace.mkString("."), sets)
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val ns = namespace.mkString(".")
    if (!cat.namespaceExists(ns)) false
    else { cat.dropNamespace(ns, cascade); true }
  }
}
