package graft.catalog

import java.nio.file.{Path, Paths}
import scala.collection.JavaConverters._

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._
import graft.txn._

/**
 * Graft catalog: dataset-level CRUD over a filesystem metastore with
 * catalog-level ACID transactions, schema evolution, write modes, time
 * travel, and merge-on-read vs read-optimized reads.
 *
 * API surface mirrors the reference catalog (catalog/interface.py:33-540,
 * impl at catalog/main/impl.py) re-expressed Spark-first: all data movement
 * is DataFrame reads/writes planned by Catalyst; only metadata commits are
 * driver-side.
 */
/** `version = None` means "default" — catalog APIs resolve it to the latest
  * ACTIVE table version (reference get_latest_active_table_version,
  * catalog/main/impl.py:1793-1800); `Some(v)` pins an explicit version
  * (`"ns.t@v2"` string form). Version 1 lives at the table's legacy paths,
  * so single-version tables are byte-identical to pre-version catalogs. */
final case class TableHandle(namespace: String, name: String,
    version: Option[Long] = None) {
  override def toString = version match {
    case Some(v) => s"$namespace.$name@v$v"
    case None => s"$namespace.$name"
  }
}

object TableHandle {
  private val VerSuffix = "^(.*)@v(\\d+)$".r
  def parse(s: String, defaultNs: String = "default"): TableHandle = {
    val (base, ver) = s match {
      case VerSuffix(b, v) => (b, Some(v.toLong))
      case _ => (s, None)
    }
    base.split('.') match {
      case Array(ns, t) => TableHandle(ns, t, ver)
      case Array(t) => TableHandle(defaultNs, t, ver)
      case _ => throw new IllegalArgumentException(s"bad table name $s")
    }
  }
}

/** Table-version lifecycle states — reference LifecycleState
  * (storage/model/types.py:122). An UNRELEASED/CREATED version stages a
  * breaking change invisibly; promoting it to ACTIVE flips default reads
  * and writes over atomically; DEPRECATED/DELETED versions refuse writes. */
object Lifecycle {
  val Created = "created"
  val Unreleased = "unreleased"
  val Active = "active"
  val Deprecated = "deprecated"
  val Beta = "beta"
  val Deleted = "deleted"
  val All: Set[String] = Set(Created, Unreleased, Active, Deprecated, Beta, Deleted)
  def validate(s: String): String = {
    require(All(s), s"unknown lifecycle state $s (one of ${All.mkString(",")})")
    s
  }
  /** May this version accept writes? Deprecated/deleted are read-only. */
  def writable(s: String): Boolean = s != Deprecated && s != Deleted
}

/** A default (unversioned) reference found no ACTIVE table version. */
class NoActiveTableVersion(t: String, state: String) extends RuntimeException(
  s"table $t has no ACTIVE version (resolved version is $state); " +
    "activate one via alterTableLifecycle or pin a version with 'ns.t@vN'")

/** Options for readTable — projection/partition-filter/time-travel/merge-on-read. */
final case class ReadOptions(
    columns: Option[Seq[String]] = None,
    partitionFilter: Option[Column] = None,
    /** Driver-side manifest pruning: partition field -> transformed value. */
    partitionValues: Option[Map[String, String]] = None,
    asOf: Option[Long] = None,
    mergeOnRead: Boolean = true,
    withFilePath: Boolean = false,
    /** Row-limit pushdown — reference Pushdown.limit (push_down.py:32). */
    limit: Option[Int] = None,
    /** Row-predicate pushdown — reference Pushdown.row_filter
      * (push_down.py:32). Applied to the result for correctness AND
      * evaluated against per-file footer stats (ManifestEntry.stats) to
      * skip whole files at planning time (StatsSkip). */
    rowFilter: Option[Column] = None,
    /** Snapshot-isolation read-your-writes (reference txn reads): a read
      * WITHIN an open transaction sees that txn's staged metadata and
      * deltas on top of the committed snapshot; every other reader sees
      * neither until seal. */
    txn: Option[graft.txn.Transaction] = None,
    /** Force the dense resolve AGGREGATE even when the sparse/partitioned
      * split would be eligible. Cookbook rule: **pin this when the very
      * next thing you do with the read is join or aggregate on the merge
      * keys** (`readTable(t).groupBy(mergeKeys)…`, a keyed self-join).
      * A split's pass∪contested union reports UnknownPartitioning, so the
      * downstream keyed operator re-shuffles the FULL merged output; the
      * dense resolve's output is hash(mergeKeys)-partitioned, which makes
      * that operator exchange-free — avoiding the resolve shuffle only to
      * pay it back (bigger: post-merge width) downstream is a net loss.
      * The engine pins it for its own keyed consumer (the zipper's
      * full-outer zip); it cannot see YOUR downstream plan, hence the
      * knob. Scans, filters, and non-key aggregates should leave it off —
      * the split regimes bound shuffle volume by O(pending) there.
      * Plan-asserted in PartitionedMergeSpec ("downstream groupBy"). */
    denseResolve: Boolean = false)

class TableAlreadyExists(t: String) extends RuntimeException(s"table $t already exists")
class TableNotFound(t: String) extends RuntimeException(s"table $t not found")
/** A write violated a field's VALIDATE consistency policy or omitted a
  * required column — reference SchemaValidationError (schema.py:595-635). */
class SchemaValidationError(msg: String) extends RuntimeException(msg)
/** A schema change would break readers and was not explicitly allowed —
  * reference SchemaCompatibilityError (SchemaUpdate, schema.py:975-999). */
class SchemaCompatibilityError(msg: String) extends RuntimeException(msg)

final class GraftCatalog(val spark: SparkSession, rootDir: String,
    /** Commit-protocol primitive set; null = pick by the `graft.commitStore`
      * Spark conf (rename | conditional-put), so every surface that builds
      * its own catalog — DSv2/SQL, streaming — honors the object-store
      * protocol without plumbing. */
    commitStore: CommitStore = null,
    /** Metadata-plane file IO; null = pick by the `graft.fileIO` Spark
      * conf (local | object-store-sim). Listings, metafile reads/writes,
      * trim/vacuum deletes all route through it — the seam a real object
      * store implementation plugs into (data files already go through
      * Spark's Hadoop FS). */
    fileIO: FileIO = null) {
  val root: Path = Paths.get(rootDir)
  private[graft] val io: FileIO =
    Option(fileIO).getOrElse(FileIO.fromConf(spark))
  val store = new Metastore(root,
    Option(commitStore).getOrElse(CommitStore.fromConf(spark)), io)

  // Storage-partitioned merge planner flags
  // (spark.sql.sources.v2.bucketing.*) are set by MergeRead.partitionedMerge
  // at the moment a read actually CHOOSES the partitioned path — not here.
  // Constructing a catalog (including the per-call catalogs the
  // graft_history/graft_manifest TVFs build during SQL analysis) must not
  // mutate session-global planning confs as a side effect: the flags change
  // plan shapes for unrelated V2 sources (e.g. Iceberg tables) in the same
  // session, and a ctor-time set could never be correctly reverted when
  // graft.merge.partitioned.enabled is later flipped off.

  import Hidden._

  // ---------------------------------------------------------------- layout
  private def nsDir(ns: String): Path = root.resolve("ns").resolve(ns)
  private def nsMetaDir(ns: String): Path = nsDir(ns).resolve("__ns__")
  private def tableDir(t: TableHandle): Path = nsDir(t.namespace).resolve(t.name)
  // Version 1 = the table's legacy layout (meta/deltas/data directly under
  // the table dir); versions ≥ 2 nest under versions/v<id>. A pre-version
  // catalog is therefore already a valid single-version catalog.
  private def versionsDir(t: TableHandle): Path = tableDir(t).resolve("versions")
  private def verRoot(t: TableHandle): Path = t.version match {
    case Some(v) if v >= 2 => versionsDir(t).resolve(f"v$v%05d")
    case _ => tableDir(t)
  }
  private def metaDir(t: TableHandle): Path = verRoot(t).resolve("meta")
  private def deltaDir(t: TableHandle): Path = verRoot(t).resolve("deltas")
  private def dataDir(t: TableHandle): Path = verRoot(t).resolve("data")

  // ------------------------------------------------------- version resolve
  /** All version ids of a table (existing metafile dirs, dropped included),
    * ascending. Metadata-scale: one dir listing. */
  private def versionIds(t: TableHandle): Seq[Long] = {
    val v1 = if (io.isDirectory(metaDir(t.copy(version = Some(1L))))) Seq(1L) else Nil
    val extra = io.listDir(versionsDir(t)).map(_.getFileName.toString).collect {
      case n if n.startsWith("v") && n.drop(1).forall(_.isDigit) => n.drop(1).toLong
    }
    (v1 ++ extra).distinct.sorted
  }

  /** Resolve an unpinned handle to its latest ACTIVE version (reference
    * active-version resolution, catalog/main/impl.py:1793-1800). Single-
    * version tables short-circuit on one directory probe. When NO version
    * is active, falls back to the unpinned (v1) handle — the lifecycle
    * gates at read/write entry points surface the error with context. */
  /** The ONE latest-ACTIVE probe both resolution entry points share — a
    * future change to the resolution rule cannot fork them. None when the
    * handle is pinned, the table is single-version, or nothing is active. */
  private def probeActiveVersion(t0: TableHandle, asOf: Option[Long],
      within: Option[Transaction]): Option[(Long, TableMeta)] = {
    if (t0.version.isDefined || !io.isDirectory(versionsDir(t0))) return None
    // Live-but-inactive versions with NO active one must fail HERE with the
    // one intended error: the unpinned-v1 fallback would otherwise surface
    // three different errors for the same condition (TableNotFound on read,
    // TableAlreadyExists on write, exists=true) when v1 is dead. The
    // remedies (alterTableLifecycle, pinned 'ns.t@vN' handles) resolve
    // without this probe, so they stay reachable.
    var inactive: Option[String] = None
    versionIds(t0).reverseIterator.foreach { v =>
      currentMeta(t0.copy(version = Some(v)), asOf, within) match {
        case Some(m) if !m.dropped && m.lifecycleState == Lifecycle.Active =>
          return Some((v, m))
        case Some(m) if !m.dropped =>
          if (inactive.isEmpty) inactive = Some(s"v$v is ${m.lifecycleState}")
        case _ =>
      }
    }
    inactive.foreach(st => throw new NoActiveTableVersion(t0.toString, st))
    None
  }

  private def resolveVersion(t0: TableHandle, asOf: Option[Long],
      within: Option[Transaction]): TableHandle =
    probeActiveVersion(t0, asOf, within) match {
      case Some((v, _)) => t0.copy(version = Some(v))
      case None => t0
    }

  /** [[resolveVersion]] + the resolved handle's current meta in ONE pass —
    * spares the hot read path a second metadata read per version probed. */
  private def resolveVersionMeta(t0: TableHandle, asOf: Option[Long],
      within: Option[Transaction]): (TableHandle, Option[TableMeta]) =
    probeActiveVersion(t0, asOf, within) match {
      case Some((v, m)) => (t0.copy(version = Some(v)), Some(m))
      case None => (t0, currentMeta(t0, asOf, within))
    }

  // ------------------------------------------------------------- namespaces
  /** Default namespace for unqualified table names — reference
    * get/set default namespace (catalog/interface.py:389-513). */
  @volatile var defaultNamespace: String = "default"
  /** Parse + resolve to the latest ACTIVE version (or the pinned one). */
  private def th(table: String): TableHandle =
    resolveVersion(TableHandle.parse(table, defaultNamespace), None, None)
  /** Parse only — no version resolution. */
  private def thRaw(table: String): TableHandle =
    TableHandle.parse(table, defaultNamespace)

  def createNamespace(ns: String, properties: Map[String, String] = Map.empty,
      txn: Option[Transaction] = None): Unit =
    inTxn(txn, s"create namespace $ns") { t =>
      val dir = nsMetaDir(ns)
      t.stage(dir, store.nextRevision(dir, Some(t)), "ns",
        Json.write(NsMeta(ns, properties, dropped = false)), s"CREATE ns/$ns")
    }

  private def nsMeta(ns: String, asOf: Option[Long]): Option[NsMeta] =
    store.latestVisible(nsMetaDir(ns), asOf, None).map(c => Json.read(c._2, classOf[NsMeta]))

  def namespaceExists(ns: String, asOf: Option[Long] = None): Boolean =
    nsMeta(ns, asOf).exists(!_.dropped)

  def namespaceProperties(ns: String): Map[String, String] =
    nsMeta(ns, None).filter(!_.dropped)
      .getOrElse(throw new IllegalArgumentException(s"namespace $ns not found")).props

  /** Merge properties into a namespace — reference alter_namespace. */
  def alterNamespace(ns: String, setProperties: Map[String, String],
      txn: Option[Transaction] = None): Unit = {
    val m = nsMeta(ns, None).filter(!_.dropped)
      .getOrElse(throw new IllegalArgumentException(s"namespace $ns not found"))
    inTxn(txn, s"alter namespace $ns") { t =>
      val dir = nsMetaDir(ns)
      t.stage(dir, store.nextRevision(dir, Some(t)), "ns",
        Json.write(NsMeta(ns, m.props ++ setProperties, dropped = false)), s"UPDATE ns/$ns")
    }
  }

  /** Drop a namespace; refuses when non-empty unless cascade — reference
    * drop_namespace (catalog/interface.py:441-466). */
  def dropNamespace(ns: String, cascade: Boolean = false): Unit = {
    nsMeta(ns, None).filter(!_.dropped)
      .getOrElse(throw new IllegalArgumentException(s"namespace $ns not found"))
    val tables = listTables(ns)
    if (tables.nonEmpty && !cascade) throw new IllegalArgumentException(
      s"namespace $ns is not empty (${tables.mkString(",")}); use cascade")
    val t = store.newTransaction(s"drop namespace $ns")
    try {
      tables.foreach(tb => dropTable(s"$ns.$tb", txn = Some(t)))
      val dir = nsMetaDir(ns)
      t.stage(dir, store.nextRevision(dir, Some(t)), "ns",
        Json.write(NsMeta(ns, Map.empty, dropped = true)), s"DELETE ns/$ns")
      t.seal()
    } catch { case e: Throwable => if (!t.isSealed) t.abort(); throw e }
  }

  /** Fail timed-out running txns + sweep failed txns' staged revisions. */
  def janitor(timeoutMillis: Long = 24L * 3600 * 1000): (Int, Int) =
    store.janitor(timeoutMillis)

  def listNamespaces(asOf: Option[Long] = None): Seq[String] = {
    io.listDir(root.resolve("ns")).map(_.getFileName.toString).sorted
      .filter(ns => namespaceExists(ns, asOf))
  }

  // ------------------------------------------------------------ table CRUD
  def createTable(
      table: String,
      schema: StructType,
      partitionScheme: PartitionScheme = PartitionScheme.unpartitioned,
      sortScheme: SortScheme = SortScheme.unsorted,
      properties: Map[String, String] = Map.empty,
      txn: Option[Transaction] = None): TableHandle = {
    val t = thRaw(table)
    require(t.version.isEmpty,
      s"createTable takes a bare table name (use createTableVersion for $table)")
    schema.fields.filter(FieldMeta.isMergeKey).foreach(FieldMeta.validateMergeKey)
    if (tableExists(table)) throw new TableAlreadyExists(table)
    // A previously-dropped incarnation leaves committed deltas behind;
    // recreating must not resurrect them.
    val hadPriorIncarnation = currentMeta(t, None, txn).exists(_.dropped)
    inTxn(txn, s"create table $t") { tx =>
      if (!namespaceExistsInTxn(t.namespace, tx)) {
        val dir = nsMetaDir(t.namespace)
        tx.stage(dir, store.nextRevision(dir, Some(tx)), "ns",
          Json.write(NsMeta(t.namespace, Map.empty, dropped = false)), s"CREATE ns/${t.namespace}")
      }
      stageTableMeta(tx, t, toMeta(t, schema, partitionScheme, sortScheme, properties))
      if (hadPriorIncarnation) {
        val dir = deltaDir(t)
        val rev = store.nextRevision(dir, Some(tx))
        tx.stage(dir, rev, "delta",
          Json.write(DeltaMeta(rev, DeltaType.Add.name, Nil, tx.txnId, -1L,
            Map("replace" -> "true"))), s"REPLACE $t (recreate)")
      }
    }
    t
  }

  /** namespaceExists with read-your-writes inside an open transaction. */
  private def namespaceExistsInTxn(ns: String, tx: Transaction): Boolean =
    store.latestVisible(nsMetaDir(ns), None, Some(tx))
      .map(c => Json.read(c._2, classOf[NsMeta])).exists(!_.dropped)

  /** True when ANY version of the table exists and is not dropped (a table
    * whose only version is still UNRELEASED exists, though default reads
    * refuse it); a pinned `ns.t@vN` checks exactly that version. */
  def tableExists(table: String, asOf: Option[Long] = None): Boolean = {
    val t0 = thRaw(table)
    def versionExists(t: TableHandle) = currentMeta(t, asOf, None).exists(!_.dropped)
    t0.version match {
      case Some(_) => versionExists(t0)
      case None =>
        versionExists(t0) || (io.isDirectory(versionsDir(t0)) &&
          versionIds(t0).exists(v => versionExists(t0.copy(version = Some(v)))))
    }
  }

  /** Resolve a (possibly unpinned) name to its current target — the latest
    * ACTIVE version pinned as `ns.t@vN` for multi-version tables, the name
    * itself otherwise. Long-lived consumers (streaming sources/sinks) pin
    * through this ONCE so a mid-stream activation cannot remap their
    * checkpointed offsets onto a different version's delta log. */
  def resolveTableName(table: String): String = {
    val t = th(table)
    // th() leaves single-version tables unpinned (no versions/ dir to
    // probe), which would make this "pin" a no-op for exactly the common
    // case — a v2 activated mid-stream would remap the consumer's
    // checkpointed offsets onto the new version's delta log. Pin the
    // legacy layout explicitly as @v1 (verRoot maps v1 to the same
    // paths). Missing tables keep the bare name: a streaming sink
    // creates them on first batch, and createTable takes bare names.
    if (t.version.isEmpty && currentMeta(t.copy(version = Some(1L)), None, None).exists(!_.dropped))
      t.copy(version = Some(1L)).toString
    else t.toString
  }

  def getTableMeta(table: String, asOf: Option[Long] = None): TableMeta = {
    // version resolution must observe asOf too, or a time-travel schema
    // lookup would serve a version activated AFTER the travel point
    val t = resolveVersion(thRaw(table), asOf, None)
    currentMeta(t, asOf, None).filter(!_.dropped).getOrElse(throw new TableNotFound(table))
  }

  def tableSchema(table: String, asOf: Option[Long] = None): StructType =
    DataType.fromJson(getTableMeta(table, asOf).schemaJson).asInstanceOf[StructType]

  def listTables(ns: String, asOf: Option[Long] = None): Seq[String] = {
    io.listDir(nsDir(ns)).map(_.getFileName.toString).filterNot(_ == "__ns__")
      .sorted.filter(n => tableExists(s"$ns.$n", asOf))
  }

  /** Drop a table. `purge = true` additionally deletes every data file any
    * visible delta revision of the table references (the reference declares
    * this flag on delete_table, storage/main/impl.py:1999-2013, but raises
    * NotImplementedError). File deletion runs AFTER the drop commits —
    * best-effort, like the janitor — and is file-precise (manifest paths,
    * never whole directories), so a later incarnation sharing the data dir
    * is untouched. Purge forfeits time travel for the dropped table, and is
    * refused inside a caller-managed transaction (physical deletes cannot
    * roll back with it). */
  def dropTable(table: String, txn: Option[Transaction] = None,
      purge: Boolean = false): Unit = {
    require(!purge || txn.isEmpty,
      "purge cannot run inside a caller-managed transaction (file deletes don't roll back)")
    // A bare name drops EVERY live version atomically; `ns.t@vN` drops just
    // that version (reference table-version delete semantics —
    // LifecycleState.DELETED, types.py:122).
    val parsed = thRaw(table)
    val targets: Seq[(TableHandle, TableMeta)] = parsed.version match {
      case Some(_) =>
        Seq(parsed -> currentMeta(parsed, None, txn).filter(!_.dropped)
          .getOrElse(throw new TableNotFound(table)))
      case None =>
        versionIds(parsed).flatMap { v =>
          val tv = parsed.copy(version = Some(v))
          currentMeta(tv, None, txn).filter(!_.dropped).map(tv -> _)
        }
    }
    if (targets.isEmpty) throw new TableNotFound(table)
    // Above the planning gate the purge NEVER materializes the file list on
    // the driver: only the (small) metafile path list is captured before the
    // commit; entry paths stream inside executor tasks afterwards. Below it,
    // the parsed path (no job launch for a small table).
    val purgeManifests: Seq[String] =
      if (!purge) Nil
      else targets.flatMap { case (tv, _) =>
        store.visibleRevisionPaths(deltaDir(tv), None, None).map(_._2.toString)
      }
    val purgeBytes = purgeManifests.iterator.map(p =>
      try io.size(Paths.get(p)) catch { case _: Exception => 0L }).sum
    val streamedPurge = purge && purgeBytes > ManifestPlanner.gateBytes(spark)
    val toDelete: Seq[String] =
      if (!purge || streamedPurge) Nil
      else targets.flatMap { case (tv, _) =>
        visibleDeltas(tv, None, None).flatMap(_._2.entries).map(_.path)
      }.distinct
    inTxn(txn, s"drop table $parsed")(tx => targets.foreach { case (tv, m) =>
      stageTableMeta(tx, tv, m.copy(dropped = true, lifecycle = Lifecycle.Deleted))
    })
    // Deletes are best-effort and post-commit; past a small threshold they
    // run as a Spark job (a purged table can reference 10^5+ files — a
    // serial driver loop would stall for minutes; same split as
    // fileRowCounts). Driver loop below it: no job-scheduling latency.
    if (streamedPurge) {
      // metafiles stay on disk after the drop (it is a meta tombstone), so
      // executors stream each manifest's entries and delete its files; the
      // distinct shuffle dedupes cross-delta references without any
      // driver-side set. Paths-only, one metafile per task.
      val slices = math.min(math.max(purgeManifests.size, 1),
        spark.sparkContext.defaultParallelism * 2)
      val confBc = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(spark.sessionState.newHadoopConf()))
      val fio = io // local copy: the task lambda must not capture `this`
      spark.sparkContext.parallelize(purgeManifests, slices)
        .flatMap { mp =>
          val b = Seq.newBuilder[String]
          ManifestPlanner.foreachEntry(Paths.get(mp), fio)(e => b += e.path)
          b.result()
        }
        .distinct()
        .foreachPartition { it =>
          val conf = confBc.value.value
          it.foreach { s =>
            try {
              val p = new org.apache.hadoop.fs.Path(s)
              p.getFileSystem(conf).delete(p, false)
            } catch { case _: Exception => () }
          }
        }
    } else if (toDelete.size < 64)
      toDelete.foreach(p => try io.delete(Paths.get(p)) catch { case _: Exception => () })
    else {
      val slices = math.min(toDelete.size, spark.sparkContext.defaultParallelism * 2)
      // Hadoop FS with the SESSION conf broadcast to executors — a bare
      // Configuration() drops spark.hadoop.* credentials/defaultFS, so on a
      // remote catalog every delete would fail (and be swallowed).
      val confBc = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(spark.sessionState.newHadoopConf()))
      spark.sparkContext.parallelize(toDelete, slices).foreachPartition { it =>
        val conf = confBc.value.value
        it.foreach { s =>
          try {
            val p = new org.apache.hadoop.fs.Path(s)
            p.getFileSystem(conf).delete(p, false)
          } catch { case _: Exception => () }
        }
      }
    }
  }

  def renameTable(table: String, newName: String, txn: Option[Transaction] = None): Unit = {
    val t = thRaw(table)
    require(t.version.isEmpty, s"rename targets the whole table, not a version ($table)")
    val nt = TableHandle(t.namespace, newName)
    if (tableExists(nt.toString)) throw new TableAlreadyExists(nt.toString)
    // Every live version moves in ONE atomic commit.
    val live = versionIds(t).flatMap { v =>
      val tv = t.copy(version = Some(v))
      currentMeta(tv, None, txn).filter(!_.dropped).map(v -> _)
    }
    if (live.isEmpty) throw new TableNotFound(table)
    // Delta metafiles are copied at their ORIGINAL revisions (stream
    // positions must keep matching the data-file paths), so a destination
    // with prior-incarnation history would collide on revision numbers.
    live.foreach { case (v, _) =>
      // existence only — never parse metafile contents for a nonEmpty check
      if (store.visibleRevisionPaths(deltaDir(nt.copy(version = Some(v))), None, None).nonEmpty)
        throw new IllegalArgumentException(
          s"cannot rename onto $nt: the name has prior table history")
    }
    inTxn(txn, s"rename $t -> $nt") { tx =>
      live.foreach { case (v, m) =>
        val tv = t.copy(version = Some(v))
        val ntv = nt.copy(version = Some(v))
        stageTableMeta(tx, tv, m.copy(dropped = true))
        stageTableMeta(tx, ntv, m.copy(table = newName, dropped = false))
        // Data files are addressed by manifest paths, so the old table's deltas
        // must be re-pointed: copy visible delta metafiles to the new table.
        visibleDeltas(tv, None, Some(tx)).foreach { case (rev, d) =>
          tx.stage(deltaDir(ntv), rev, "delta", Json.write(d), s"CREATE delta/$ntv/$rev")
        }
      }
    }
  }

  // ------------------------------------------------------- table versions
  /** Create a NEW table version — reference create_table_version
    * (storage/main/impl.py:1323-1460): the staging mechanism for a breaking
    * change. The new version carries its own schema/schemes/properties and
    * its own delta stream; unspecified pieces are inherited from the latest
    * live version. It is born in `lifecycle` (default CREATED —
    * storage/model/types.py:122) and stays INVISIBLE to default reads and
    * writes until promoted ACTIVE via [[alterTableLifecycle]]; load it in
    * the meantime by pinning `ns.t@vN`. Creates the table (as version 1)
    * when it does not exist yet, mirroring the reference. Returns the new
    * version id. */
  def createTableVersion(
      table: String,
      schema: Option[StructType] = None,
      lifecycle: String = Lifecycle.Created,
      partitionScheme: Option[PartitionScheme] = None,
      sortScheme: Option[SortScheme] = None,
      properties: Option[Map[String, String]] = None,
      txn: Option[Transaction] = None): Long = {
    val t0 = thRaw(table)
    require(t0.version.isEmpty, s"createTableVersion takes a bare table name ($table)")
    Lifecycle.validate(lifecycle)
    schema.foreach(_.fields.filter(FieldMeta.isMergeKey).foreach(FieldMeta.validateMergeKey))
    val vids = versionIds(t0)
    val latestLive = vids.reverse.iterator.flatMap(v =>
      currentMeta(t0.copy(version = Some(v)), None, txn).filter(!_.dropped).map(v -> _))
      .nextOption()
    latestLive match {
      case None =>
        // No LIVE parent table — create a fresh version in the requested
        // state (reference creates the parent in the same transaction).
        // Prior DROPPED incarnations may have left committed deltas behind:
        // never reuse their version ids (fresh delta dir = nothing to
        // resurrect), and a dropped pre-version v1 additionally needs the
        // same REPLACE marker createTable stages on recreate, because v1's
        // delta dir IS the legacy one holding the old incarnation's files.
        val s = schema.getOrElse(throw new IllegalArgumentException(
          s"schema required: $table does not exist yet"))
        val newV = vids.maxOption.map(_ + 1).getOrElse(1L)
        val tv = t0.copy(version = Some(newV))
        val hadPriorIncarnation =
          newV == 1L && currentMeta(tv, None, txn).exists(_.dropped)
        inTxn(txn, s"create table version $tv") { tx =>
          if (!namespaceExistsInTxn(t0.namespace, tx)) {
            val dir = nsMetaDir(t0.namespace)
            tx.stage(dir, store.nextRevision(dir, Some(tx)), "ns",
              Json.write(NsMeta(t0.namespace, Map.empty, dropped = false)),
              s"CREATE ns/${t0.namespace}")
          }
          stageTableMeta(tx, tv,
            toMeta(t0, s, partitionScheme.getOrElse(PartitionScheme.unpartitioned),
              sortScheme.getOrElse(SortScheme.unsorted), properties.getOrElse(Map.empty))
              .copy(lifecycle = lifecycle))
          if (hadPriorIncarnation) {
            val dir = deltaDir(tv)
            val rev = store.nextRevision(dir, Some(tx))
            tx.stage(dir, rev, "delta",
              Json.write(DeltaMeta(rev, DeltaType.Add.name, Nil, tx.txnId, -1L,
                Map("replace" -> "true"))), s"REPLACE $tv (recreate)")
          }
        }
        newV
      case Some((_, base)) =>
        // Next id is max over ALL versions incl. dropped ones (their delta
        // dirs may still hold history; never reuse a version id).
        val newV = vids.max + 1
        val tv = t0.copy(version = Some(newV))
        val m = TableMeta(t0.namespace, t0.name,
          schema.map(_.json).getOrElse(base.schemaJson),
          partitionScheme.map(_.keys.map(k => Seq(k.field, k.transform.name)))
            .getOrElse(base.partitionKeys),
          sortScheme.map(_.keys.map(k =>
            Seq(k.field, k.ascending.toString, k.nullsFirst.toString, k.transform.name)))
            .getOrElse(base.sortKeys),
          properties.getOrElse(base.properties), dropped = false, lifecycle = lifecycle)
        inTxn(txn, s"create table version $tv")(tx => stageTableMeta(tx, tv, m))
        newV
    }
  }

  /** (version, lifecycle) for every live version, ascending by version. */
  def listTableVersions(table: String): Seq[(Long, String)] = {
    val t0 = thRaw(table)
    require(t0.version.isEmpty, s"listTableVersions takes a bare table name ($table)")
    val out = versionIds(t0).flatMap { v =>
      currentMeta(t0.copy(version = Some(v)), None, None).filter(!_.dropped)
        .map(m => v -> m.lifecycleState)
    }
    if (out.isEmpty) throw new TableNotFound(table)
    out
  }

  /** Highest live version id — reference Table.latest_table_version. */
  def latestTableVersion(table: String): Long =
    listTableVersions(table).map(_._1).max

  /** Highest ACTIVE version id (the default read/write target) — reference
    * Table.latest_active_table_version; None when nothing is active. */
  def latestActiveVersion(table: String): Option[Long] =
    listTableVersions(table).filter(_._2 == Lifecycle.Active).map(_._1).maxOption

  /** Change one version's lifecycle — reference update_table_version
    * (storage/main/impl.py:1574-1680): promoting an UNRELEASED/CREATED
    * version to ACTIVE atomically flips default read/write resolution onto
    * it; DEPRECATED retires it from writes while pinned reads keep working.
    * A bare table name targets the LATEST version (the one
    * createTableVersion just made); pin `@vN` to target another. */
  def alterTableLifecycle(table: String, lifecycle: String,
      txn: Option[Transaction] = None): Unit = {
    Lifecycle.validate(lifecycle)
    val parsed = thRaw(table)
    val v = parsed.version.getOrElse(latestTableVersion(table))
    val tv = parsed.copy(version = Some(v))
    val m = currentMeta(tv, None, txn).filter(!_.dropped)
      .getOrElse(throw new TableNotFound(tv.toString))
    // DELETED is a terminal state with drop semantics (the reference's
    // delete path sets it, types.py:122) — mark the version dropped too,
    // exactly like dropTable("ns.t@vN"), or the version would refuse
    // writes yet keep serving reads/exists/list, and could be "revived"
    // by a later lifecycle change.
    val dropped = lifecycle == Lifecycle.Deleted
    inTxn(txn, s"set lifecycle $lifecycle on $tv")(tx =>
      stageTableMeta(tx, tv, m.copy(lifecycle = lifecycle, dropped = dropped)))
  }

  /** Reference refresh_table (catalog/interface.py:249-264): drop cached
    * metadata so the next read observes the latest committed state. The
    * reference refreshes Ray-cluster caches; the Spark analogs are the
    * metastore's successful-transaction cache and Spark's file-index /
    * relation caches for the table's data paths. The cache is invalidated
    * BEFORE the existence check, so a table committed by another process
    * within the cache's staleness window refreshes instead of throwing. */
  def refreshTable(table: String): Unit = {
    val t = th(table)
    store.invalidateTxnCache()
    if (currentMeta(t, None, None).forall(_.dropped)) throw new TableNotFound(table)
    spark.catalog.refreshByPath(dataDir(t).toString)
  }

  /** Truncate: drop all data, keep schema — reference interface.py:317-336. */
  def truncateTable(table: String, txn: Option[Transaction] = None): Unit = {
    val t = th(table)
    getTableMeta(table)
    inTxn(txn, s"truncate $t") { tx =>
      val dir = deltaDir(t)
      val rev = store.nextRevision(dir, Some(tx))
      val d = DeltaMeta(rev, DeltaType.Add.name, Nil, tx.txnId, -1L, Map("replace" -> "true"))
      tx.stage(dir, rev, "delta", Json.write(d), s"REPLACE $t")
    }
  }

  /** Schema evolution DDL — add/update columns per the promotion lattice,
    * plus remove/rename behind the `allowIncompatibleChanges` gate
    * (reference alter_table interface.py:122-164; SchemaUpdate add/remove/
    * update ops with allow_incompatible_changes, schema.py:140-216,975-999).
    *
    * remove: breaks readers of the column — requires the gate; merge keys
    * and partition/sort keys can never be removed. rename: metadata-only —
    * a `renamed_from` breadcrumb lets the scan read old physical files
    * (which carry the prior column name) under the new name; requires the
    * gate because readers addressing the old name break. */
  def alterTable(
      table: String,
      newSchema: Option[StructType] = None,
      setProperties: Map[String, String] = Map.empty,
      sortScheme: Option[SortScheme] = None,
      /** Replace the PARTITION scheme — parity-plus: the reference raises
        * NotImplementedError here (impl.py:1778-1780). Safe on mixed
        * layouts: old files keep their directories and a missing segment
        * never prunes (prunePaths/matchesSegs keep the file), resolve
        * scope derives from row VALUES under the current scheme, and the
        * next compaction/repartition re-lays touched data out under the
        * new scheme. Caveats: `partitionValues` reads return a SUPERSET
        * over not-yet-relaid files (use rowFilter for exactness or
        * repartitionTable for a full re-layout), and on a KEYED table the
        * merge scope changes with the scheme — requires
        * allowIncompatibleChanges. */
      partitionScheme: Option[PartitionScheme] = None,
      removeFields: Seq[String] = Nil,
      renameFields: Map[String, String] = Map.empty,
      allowIncompatibleChanges: Boolean = false,
      removeProperties: Seq[String] = Nil,
      txn: Option[Transaction] = None): Unit = {
    val t = th(table)
    val m = getTableMeta(table)
    val cur = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
    if ((removeFields.nonEmpty || renameFields.nonEmpty) && !allowIncompatibleChanges)
      throw new SchemaCompatibilityError(
        s"removing/renaming fields of $t breaks readers; pass allowIncompatibleChanges=true " +
          s"(remove: ${removeFields.mkString(",")}; rename: ${renameFields.mkString(",")})")
    val protectedKeys = (FieldMeta.mergeKeys(cur) ++
      m.partitionKeys.map(_(0)) ++ m.sortKeys.map(_(0))).toSet
    // Positional (csv-family) files map columns by POSITION: dropping a
    // field from the read schema while old files still physically carry it
    // would shift every later column onto the wrong data — silently.
    if (removeFields.nonEmpty && contentTypeOf(m).format == "csv")
      throw new SchemaCompatibilityError(
        s"cannot remove fields of $t: its content type maps columns " +
          "positionally, so historical files would misalign (rename is fine)")
    removeFields.foreach { f =>
      require(cur.fieldNames.contains(f), s"cannot remove unknown field $f of $t")
      if (protectedKeys(f)) throw new SchemaCompatibilityError(
        s"cannot remove $f of $t: it is a merge/partition/sort key")
    }
    // Retired names stay reserved: pre-rename names are requested by the
    // scan as aliases of their renamed field (reuse would make the read
    // schema ambiguous), and removed columns still live physically in old
    // files (a new column reusing the name would resurrect their values
    // for historical rows under name-matched formats).
    val priorNames = cur.fields.flatMap(FieldMeta.renamedFrom).toSet ++
      m.properties.get("retired_columns").toSeq.flatMap(_.split(",")).filter(_.nonEmpty)
    renameFields.keys.foreach { f =>
      require(cur.fieldNames.contains(f), s"cannot rename unknown field $f of $t")
      // Merge/partition/sort keys anchor physical layout (partition dir
      // names, bucket hashes) — renaming them would orphan existing files.
      if (protectedKeys(f)) throw new SchemaCompatibilityError(
        s"cannot rename $f of $t: it is a merge/partition/sort key")
    }
    renameFields.values.foreach { n =>
      require(!cur.fieldNames.contains(n), s"rename target $n already exists on $t")
      if (priorNames(n)) throw new SchemaCompatibilityError(
        s"rename target $n of $t is a retired (pre-rename) column name; " +
          "retired names stay reserved for reading historical files")
    }
    newSchema.foreach(s => s.fieldNames.filterNot(cur.fieldNames.contains)
      .filter(priorNames).foreach(n => throw new SchemaCompatibilityError(
        s"new column $n of $t reuses a retired (pre-rename) column name")))
    val afterRemove = StructType(cur.fields.filterNot(f => removeFields.contains(f.name)))
    val afterRename = StructType(afterRemove.fields.map(f =>
      renameFields.get(f.name).map(FieldMeta.withRename(f, _)).getOrElse(f)))
    val evolved = newSchema.map(s => TypePromotion.unify(afterRename, s)).getOrElse(afterRename)
    // Keep declared subschemas consistent: renamed fields follow, removed
    // fields drop out of their groups, and a group emptied by removals is
    // dropped outright (an empty field list is not a readable group).
    val props0 = (m.properties ++ setProperties -- removeProperties).flatMap {
      case (k, v) if k.startsWith("subschema.") =>
        val remaining = v.split(",").toSeq.filter(_.nonEmpty)
          .filterNot(removeFields.contains)
          .map(f => renameFields.getOrElse(f, f))
        if (remaining.isEmpty) None else Some(k -> remaining.mkString(","))
      case kv => Some(kv)
    }
    val newlyRetired = removeFields ++ renameFields.keys
    val props =
      if (newlyRetired.isEmpty) props0
      else props0 + ("retired_columns" ->
        (priorNames ++ newlyRetired).toSeq.sorted.mkString(","))
    partitionScheme.foreach { ps =>
      ps.keys.foreach { k =>
        require(evolved.fieldNames.contains(k.field),
          s"partition field ${k.field} not in the schema of $t")
        // fail fast on transform/type mismatches (bucket_iceberg over a
        // double, hour over a long, …): a staged-but-unwritable scheme
        // would brick every subsequent write to a live table
        k.transform(col(k.field), evolved(k.field).dataType)
      }
      require(ps.keys.map(_.partitionColumnName).distinct.size == ps.keys.size,
        s"duplicate partition keys in ${ps.keys.map(k => (k.field, k.transform.name))}")
      // resolve's merge scope = (partition values, merge keys): rows
      // distinct under the old scheme may collapse by recency under the
      // new one — a data-dependent semantic change the caller must own
      if (FieldMeta.mergeKeys(cur).nonEmpty && !allowIncompatibleChanges)
        throw new SchemaCompatibilityError(
          s"changing the partition scheme of keyed table $t changes the " +
            "merge scope (rows are distinct per partition values + merge " +
            "key); pass allowIncompatibleChanges=true to accept")
    }
    val updated = m.copy(
      schemaJson = evolved.json,
      properties = props,
      partitionKeys = partitionScheme.map(_.keys.map(k =>
        Seq(k.field, k.transform.name))).getOrElse(m.partitionKeys),
      sortKeys = sortScheme.map(ss => ss.keys.map(k =>
        Seq(k.field, k.ascending.toString, k.nullsFirst.toString, k.transform.name)))
        .getOrElse(m.sortKeys))
    inTxn(txn, s"alter $t")(tx => stageTableMeta(tx, t, updated))
  }

  // ----------------------------------------------------- named subschemas
  /** Declare (or replace) a named subschema — a column group over the
    * unified table schema (reference Schema.subschemas, schema.py:818-845:
    * per-subschema field mappings inside one table, e.g. a `text` group and
    * a `media` group of a multimodal table). Stored as a table property;
    * fields must exist in the current schema. */
  def setSubschema(table: String, name: String, fields: Seq[String],
      txn: Option[Transaction] = None): Unit = {
    require(name.nonEmpty && fields.nonEmpty, "subschema needs a name and fields")
    val cur = DataType.fromJson(getTableMeta(table).schemaJson).asInstanceOf[StructType]
    val unknown = fields.filterNot(cur.fieldNames.contains)
    require(unknown.isEmpty, s"subschema $name references unknown fields: ${unknown.mkString(",")}")
    alterTable(table, setProperties = Map(s"subschema.$name" -> fields.mkString(",")), txn = txn)
  }

  def dropSubschema(table: String, name: String, txn: Option[Transaction] = None): Unit = {
    val m = getTableMeta(table)
    require(m.properties.contains(s"subschema.$name"), s"no subschema $name on $table")
    inTxn(txn, s"drop subschema $name of $table")(tx =>
      stageTableMeta(tx, th(table), m.copy(properties = m.properties - s"subschema.$name")))
  }

  /** All declared subschemas: name -> field list. */
  def subschemas(table: String): Map[String, Seq[String]] =
    getTableMeta(table).properties.collect {
      case (k, v) if k.startsWith("subschema.") =>
        k.stripPrefix("subschema.") -> v.split(",").toSeq
    }

  /** Read ONE column group: projects the group's fields (plus any merge
    * keys, which identify the row). Catalyst prunes the scan to the group's
    * columns — the other groups' (potentially huge multimodal) columns are
    * never read. */
  def readSubschema(table: String, name: String, opts: ReadOptions = ReadOptions()): DataFrame = {
    val groups = subschemas(table)
    val fields = groups.getOrElse(name,
      throw new IllegalArgumentException(
        s"no subschema $name on $table (have: ${groups.keys.mkString(",")})"))
    val schema = DataType.fromJson(getTableMeta(table).schemaJson).asInstanceOf[StructType]
    val keys = FieldMeta.mergeKeys(schema)
    val cols = (keys ++ fields).distinct
    readTable(table, opts.copy(columns = Some(opts.columns.map(_.filter(cols.contains))
      .getOrElse(cols))))
  }

  /**
   * Rivulet-style ZIPPER read (reference experimental rivulet,
   * reader/dataset_reader.py:41-65 + dataset.py field groups): each named
   * column GROUP resolves its own merge-on-read independently — only the
   * deltas that physically wrote one of the group's columns (plus deletes,
   * which tombstone every group) participate — and the resolved groups zip
   * into full rows by a null-safe merge-key FULL OUTER join (a key written
   * in one group surfaces with the other groups' fields null, exactly the
   * reference's zipper semantics).
   *
   * Row-equivalent to readTable over the same columns; the win is PLAN
   * shape at scale: each group's resolve shuffle carries only that group's
   * bytes — a trickle of text-group upserts never re-shuffles the media
   * group's blobs through the LSM fold — and a group with no pending
   * deltas reads scan-only. Requested groups must be disjoint on non-key
   * fields (rivulet field groups are disjoint by construction).
   */
  def readZipped(table: String, groups: Seq[String] = Nil,
      opts: ReadOptions = ReadOptions()): DataFrame = {
    require(!opts.withFilePath,
      "withFilePath is undefined for a zipped read (a row spans one file " +
        "per group) — read the groups individually via readSubschema")
    val parsed = thRaw(table)
    val (t, meta0) = resolveVersionMeta(parsed, opts.asOf, opts.txn)
    val meta = meta0.filter(!_.dropped).getOrElse(throw new TableNotFound(table))
    if (parsed.version.isEmpty && meta.lifecycleState != Lifecycle.Active)
      throw new NoActiveTableVersion(table, meta.lifecycleState)
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val keys = FieldMeta.mergeKeys(schema)
    require(keys.nonEmpty, s"zipper read needs merge keys on $table")
    val subs = meta.properties.collect {
      case (k, v) if k.startsWith("subschema.") =>
        k.stripPrefix("subschema.") -> v.split(",").toSeq
    }
    val gs = if (groups.nonEmpty) groups else subs.keys.toSeq.sorted
    require(gs.nonEmpty, s"$table declares no subschemas to zip")
    gs.foreach(g => require(subs.contains(g),
      s"no subschema $g on $table (have: ${subs.keys.mkString(",")})"))
    val nonKey = gs.map(g => g -> subs(g).filterNot(keys.contains)).toMap
    require(gs.combinations(2).forall { case Seq(x, y) =>
      nonKey(x).toSet.intersect(nonKey(y).toSet).isEmpty
    }, s"zipped groups must be disjoint on non-key fields: $gs")
    val scheme = partitionSchemeOf(meta)
    // Key-only conjuncts of the caller's filters push into EVERY group's
    // plan: the zip joins groups by null-safe merge-key equality, so a
    // predicate referencing only merge keys selects the same rows in each
    // group's frame — pushed, it prunes each group's manifest (StatsSkip
    // key-only rule, distributed above the gate) and filters each frame
    // BEFORE its resolve shuffle and the zip joins. Cross-group conjuncts
    // stay post-zip (a group-B field is not evaluable in group A's frame);
    // projection/limit likewise apply to the ZIPPED rows below.
    val (keyFilter, residualFilter) = StatsSkip.splitKeyConjuncts(
      opts.partitionFilter.toSeq ++ opts.rowFilter.toSeq, keys.toSet)
    // Side-plan pin: the dense aggregate's hash(keys) partitioning keeps
    // the key-equality zip join exchange-free, at the cost of resolving
    // every side densely (the max_by payload-struct buffers are the
    // dominant task-GC at 30× — see BENCH_NOTES round-14 GC watch item).
    // `graft.zipper.densePin=false` lets sides take their natural split
    // regime (sparse/partitioned pass sides shuffle nothing) and pays the
    // zip join's own exchanges instead — same shuffled volume, different
    // allocation profile; measured at 30× the dense pin wins on wall time,
    // which is why it stays the default.
    val densePin = spark.conf.getOption("graft.zipper.densePin").forall { v =>
      v.trim.toBooleanOption.getOrElse(throw new IllegalArgumentException(
        s"graft.zipper.densePin must be true or false, got '$v'"))
    }
    val zipOpts = opts.copy(columns = None, rowFilter = keyFilter, limit = None,
      partitionFilter = None, withFilePath = false,
      denseResolve = densePin)
    val deltas = plannedDeltas(t, zipOpts, schema, scheme, keys)
    val renames = MergeRead.renameMapOf(schema)
    def writtenOf(d: DeltaMeta): Option[Set[String]] =
      d.properties.get("written_columns")
        .map(_.split(",").toSet.map((c: String) => renames.getOrElse(c, c)))
    val ct = contentTypeOf(meta)
    // non-key fields of every DECLARED group (requested or not): a delta
    // whose non-key writes fall entirely outside ALL declared groups
    // (keys-only writes included) participates in EVERY frame — its keys
    // must still surface, or a row introduced by such a write would
    // silently vanish from the zip. A delta that wrote an UNREQUESTED
    // group stays excluded: a partial zip reads "rows present in the
    // requested groups" (request every group for the full key set).
    val declaredFields = subs.values.flatten.filterNot(keys.contains).toSet
    // Column-narrowed per-group plans (round-16): each side's resolve only
    // needs (merge keys ∪ partition-scheme fields ∪ its own group fields) —
    // planning the FULL schema made every side scan all columns and buffer
    // per-column max_by aggregates for fields it projects away two lines
    // later. Name-matched formats only: positional (csv) reads map columns
    // by position against the file's written layout, so their schema must
    // stay full. A base delta that wrote MORE than the narrowed schema is
    // still complete for it (MergeRead.resolve's ⊇ check).
    val narrowable = ct.format != "csv"
    val schemeFields = scheme.keys.map(_.field).toSet ++
      // winner-selection fields must survive the narrowing even when they
      // live in another group — resolve derives merge-order/event-time
      // keys FROM the schema it is handed
      FieldMeta.mergeOrderKeys(schema).map(_._1) ++
      FieldMeta.eventTimeFields(schema)
    val frames: Seq[(Seq[String], DataFrame)] = gs.map { g =>
      val fields = nonKey(g)
      val fieldSet = fields.toSet
      val keep = keys.toSet ++ schemeFields ++ fieldSet
      val groupSchema =
        if (narrowable) StructType(schema.fields.filter(f => keep(f.name)))
        else schema
      // deletes tombstone every group; otherwise only writers of the
      // group's columns (or of no declared group) participate — the zip
      // reintroduces other requested groups' keys via the full-outer join
      val part = deltas.filter(d => d.typed == DeltaType.Delete ||
        writtenOf(d).forall { w =>
          val nk = w -- keys
          (nk intersect fieldSet).nonEmpty || (nk intersect declaredFields).isEmpty
        })
      val planned = MergeRead.plan(spark, groupSchema, scheme, keys, part, zipOpts,
        dataDir(t).toString, ct)
      // stats pruning above is conservative — the pushed key predicate
      // still evaluates row-level here, shrinking every zip-join input;
      // filtering per-frame ≡ filtering post-zip for key-only predicates
      // (null-safe key join + key coalesce preserve the key values).
      val df = keyFilter.fold(planned)(planned.where)
        .select((keys ++ fields).map(col).toIndexedSeq: _*)
      (fields, df)
    }
    val zipped = frames.reduceLeft[(Seq[String], DataFrame)] {
      case ((fa, a0), (fb, b0)) =>
        val (a, b) = (a0.alias("_zl"), b0.alias("_zr"))
        // NON-NULLABLE keys join with plain equality: `<=>` would be
        // correct but Spark partitions a null-safe join on
        // (coalesce(k, 0), isnull(k)) — a DIFFERENT expression than the
        // resolve aggregate's hash(k) output partitioning, forcing one
        // extra full-data shuffle per zip side. With the schema
        // guaranteeing no null keys, `===` ≡ `<=>` and the join reuses
        // the resolve's partitioning. Nullable keys keep the null-safe
        // form (null merge keys are legal data — c09).
        val cond = keys.map { k =>
          if (schema(k).nullable) col(s"_zl.$k") <=> col(s"_zr.$k")
          else col(s"_zl.$k") === col(s"_zr.$k")
        }.reduce(_ && _)
        val out = a.join(b, cond, "full_outer").select(
          (keys.map(k => coalesce(col(s"_zl.$k"), col(s"_zr.$k")).as(k)) ++
            fa.map(f => col(s"_zl.$f")) ++ fb.map(f => col(s"_zr.$f"))).toIndexedSeq: _*)
        (fa ++ fb, out)
    }._2
    val ordered = schema.fieldNames.filter(zipped.columns.contains).toSeq
    val base = zipped.select(ordered.map(col): _*)
    // key-only conjuncts already held per-frame; only the residual remains
    val filtered = residualFilter.toSeq.foldLeft(base)((d, p) => d.where(p))
    val projected = opts.columns match {
      case Some(cs) => filtered.select(cs.map(col): _*)
      case None => filtered
    }
    opts.limit.fold(projected)(projected.limit)
  }

  // ------------------------------------------------------------ write path
  /**
   * Write a DataFrame to a table — reference write_to_table
   * (catalog/main/impl.py:226-650). Returns the committed stream position.
   */
  def writeToTable(
      df: DataFrame,
      table: String,
      mode: WriteMode = WriteMode.Auto,
      txn: Option[Transaction] = None): Long = {
    val parsed = thRaw(table)
    val t = resolveVersion(parsed, None, txn)
    // Read-your-writes: a table created earlier in the same open transaction
    // is visible to later writes in it (reference transaction.py:85-115).
    def metaInTx: Option[TableMeta] = currentMeta(t, None, txn).filter(!_.dropped)
    def schemaInTx: StructType =
      DataType.fromJson(metaInTx.getOrElse(throw new TableNotFound(table)).schemaJson)
        .asInstanceOf[StructType]
    val exists = metaInTx.isDefined
    // Lifecycle gate: DEPRECATED/DELETED versions refuse writes outright; a
    // default (unversioned) write additionally requires the resolved
    // version to be ACTIVE — loading a staging version is done by pinning
    // it (`ns.t@vN`), never implicitly.
    metaInTx.map(_.lifecycleState).foreach { lc =>
      if (parsed.version.isEmpty && lc != Lifecycle.Active)
        throw new NoActiveTableVersion(table, lc)
      if (!Lifecycle.writable(lc)) throw new IllegalStateException(
        s"table version $t is $lc and refuses writes")
    }
    val resolved: WriteMode = mode match {
      case WriteMode.Auto =>
        if (!exists) WriteMode.Create
        else if (FieldMeta.mergeKeys(schemaInTx).nonEmpty) WriteMode.Merge
        else WriteMode.Add
      case m => m
    }
    val pos = resolved match {
      case WriteMode.Create =>
        if (exists) throw new TableAlreadyExists(table)
        createTable(table, df.schema, txn = txn)
        commitWrite(df, t, DeltaType.Add, replace = false, txn)
      case WriteMode.Replace =>
        if (!exists) createTable(table, df.schema, txn = txn)
        commitWrite(df, t, DeltaType.Add, replace = true, txn)
      case WriteMode.Add =>
        requireTable(exists, table); commitWrite(df, t, DeltaType.Add, replace = false, txn)
      case WriteMode.Append =>
        requireTable(exists, table)
        // APPEND forbids merge keys (reference impl.py:555-576)
        require(FieldMeta.mergeKeys(schemaInTx).isEmpty,
          s"APPEND write not allowed on table with merge keys: $table")
        commitWrite(df, t, DeltaType.Append, replace = false, txn)
      case WriteMode.Chrono =>
        requireTable(exists, table); commitWrite(df, t, DeltaType.Chrono, replace = false, txn)
      case WriteMode.Merge =>
        requireTable(exists, table)
        require(FieldMeta.mergeKeys(schemaInTx).nonEmpty,
          s"MERGE write requires merge keys on $table")
        commitWrite(df, t, DeltaType.Upsert, replace = false, txn)
      case WriteMode.Delete =>
        requireTable(exists, table)
        require(FieldMeta.mergeKeys(schemaInTx).nonEmpty,
          s"DELETE write requires merge keys on $table")
        commitWrite(df, t, DeltaType.Delete, replace = false, txn)
      case other => throw new IllegalArgumentException(s"unsupported mode $other")
    }
    // Write-triggered auto-compaction (reference impl.py:985-1091): only for
    // standalone commits — inside a caller-managed txn the deltas aren't
    // visible to the compactor yet.
    if (txn.isEmpty) {
      // The write is already durably committed; losing the compaction race
      // to a concurrent writer's compactor is benign (their snapshot covers
      // our delta or the next write re-triggers).
      try maybeAutoCompact(table)
      catch { case _: graft.txn.ConcurrentTxnConflict => () }
    }
    pos
  }

  private def requireTable(exists: Boolean, table: String): Unit =
    if (!exists) throw new TableNotFound(table)

  private def commitWrite(
      dfIn: DataFrame, t: TableHandle, deltaType: DeltaType,
      replace: Boolean, txn: Option[Transaction]): Long = {
    val meta = currentMeta(t, None, txn).filter(!_.dropped)
      .getOrElse(throw new TableNotFound(t.toString))
    val cur = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val mergeKeys = FieldMeta.mergeKeys(cur)

    // Per-field consistency (reference SchemaConsistencyType,
    // types.py:137-152, enforced via validate_and_coerce_dataset at the
    // catalog write path, catalog/main/impl.py:392-403): a VALIDATE field
    // rejects any incoming column whose type differs from the declaration —
    // before type promotion gets a chance to widen it. COERCE (default)
    // casts below; NONE falls through to promotion untouched.
    if (deltaType != DeltaType.Delete) {
      val inByName = dfIn.schema.fields.map(f => f.name -> f.dataType).toMap
      val violations = cur.fields
        .filter(f => FieldMeta.consistencyOf(f) == "validate")
        .flatMap(f => inByName.get(f.name).filter(_ != f.dataType)
          .map(got => s"${f.name}: expected ${f.dataType.sql}, got ${got.sql}"))
      if (violations.nonEmpty) throw new SchemaValidationError(
        s"VALIDATE consistency rejected write to $t: ${violations.mkString("; ")}")
      // A retired (renamed-from or removed) column name must not re-enter
      // via AUTO evolution: the scan aliases prior names to their renamed
      // field (ambiguity) and old files still physically carry removed
      // columns (resurrection). Typically an old producer still writing
      // the pre-rename name.
      val retired = cur.fields.flatMap(FieldMeta.renamedFrom).toSet ++
        meta.properties.get("retired_columns").toSeq.flatMap(_.split(",")).filter(_.nonEmpty)
      val clashes = dfIn.columns.filterNot(cur.fieldNames.contains).filter(retired)
      if (clashes.nonEmpty) throw new SchemaValidationError(
        s"write to $t uses retired column name(s) ${clashes.mkString(",")} — " +
          "renamed or removed columns keep their old names reserved; " +
          "write to the current column name instead")
    }

    // Schema evolution (AUTO): unify incoming schema into the table schema via
    // the promotion lattice (reference schema.py:671-804). DELETE deltas carry
    // key columns only and never evolve the schema.
    val evoMode = SchemaEvolutionMode.fromName(
      meta.properties.getOrElse("schema_evolution", "AUTO"))
    val (targetSchema, evolved) =
      if (deltaType == DeltaType.Delete) (cur, false)
      else {
        // widenNullability=false: a write never relaxes a declared NOT
        // NULL (values are enforced below); only alterTable may.
        val unified = TypePromotion.unify(cur, dfIn.schema, widenNullability = false)
        if (unified == cur) (cur, false)
        else evoMode match {
          case SchemaEvolutionMode.Auto => (unified, true)
          case _ =>
            // MANUAL/DISABLED: incoming must already fit the table schema.
            // Distinguish unknown columns (fixable via alterTable) from
            // genuine type conflicts (reference MANUAL-mode semantics).
            val curByName = cur.fields.map(f => f.name -> f.dataType).toMap
            val unknown = dfIn.schema.fields.filterNot(f => curByName.contains(f.name)).map(_.name)
            if (unknown.nonEmpty) throw new IllegalArgumentException(
              s"columns ${unknown.mkString(",")} not in table schema for $t " +
                s"(schema evolution is ${evoMode.name}; add them via alterTable)")
            val conflicts = dfIn.schema.fields
              .filter(f => curByName.get(f.name).exists(_ != f.dataType))
              .map(f => s"${f.name}: ${curByName(f.name)} vs ${f.dataType}")
            if (conflicts.nonEmpty) throw new IllegalArgumentException(
              s"incompatible type change under ${evoMode.name} evolution for $t: " +
                conflicts.mkString("; "))
            (cur, false)
        }
      }

    if (deltaType == DeltaType.Delete || deltaType == DeltaType.Upsert) {
      // An upsert omitting a key column would write null keys and silently
      // corrupt merge grouping — reject like the DELETE path does.
      val missing = mergeKeys.filterNot(dfIn.columns.contains)
      require(missing.isEmpty, s"${deltaType.name} delta missing merge key columns $missing")
    }

    // future_default (reference schema.py:301-311, filled by
    // _add_missing_schema_fields at write): a ROW-CREATING write that omits
    // a column with a declared future default physically writes the default;
    // a non-nullable column with neither a future default nor a value is
    // rejected. Scope matters: UPSERT deltas on a non-empty table update
    // field-wise — an omitted column there means "don't touch the existing
    // value", and filling (or rejecting) would break partial upserts. The
    // first upsert into an empty table creates every row, so it fills.
    // DELETE deltas carry keys only and are exempt. (An upsert that inserts
    // NEW keys into a non-empty table with omitted columns still reads
    // null/past_default for them — the field-wise tradeoff, documented.)
    val rowCreating = deltaType match {
      case DeltaType.Delete => false
      // emptiness = no visible delta metafiles at all (a REPLACE-cut log
      // is empty iff the raw visible list is) — a path listing, never a
      // per-write parse of the whole manifest log
      case DeltaType.Upsert => store.visibleRevisionPaths(deltaDir(t), None, None).isEmpty
      case _ => true
    }
    val incoming = dfIn.columns.toSet
    val futureFilled =
      if (!rowCreating) dfIn
      else targetSchema.fields.filterNot(f => incoming(f.name)).foldLeft(dfIn) { (d, f) =>
        FieldMeta.futureDefault(f) match {
          case Some(v) => d.withColumn(f.name, lit(v).cast(f.dataType))
          case None if !f.nullable => throw new SchemaValidationError(
            s"column ${f.name} of $t is required (non-nullable) but absent " +
              "from the write and has no future_default")
          case None => d
        }
      }

    // Coerce incoming columns to the target schema types (only columns the
    // incoming frame actually has — absent columns stay absent; readers
    // backfill nulls/defaults from the latest schema).
    val present = futureFilled.columns.toSet
    val inTypes = futureFilled.schema.fields.map(f => f.name -> f.dataType).toMap
    val inNullable = futureFilled.schema.fields.map(f => f.name -> f.nullable).toMap
    val coerced = futureFilled.select(targetSchema.fields.filter(f => present(f.name)).map { f =>
      // conform, not cast: an evolved nested struct needs its field set
      // rebuilt by name (cast cannot add struct fields).
      val c = TypePromotion.conform(col(f.name), inTypes(f.name), f.dataType)
      // Declared NOT NULL is enforced at write time (round-11): the
      // declaration no longer widens to match a nullable-typed frame, so
      // an actual null VALUE must fail loudly here instead of landing in
      // a column the planner treats as non-null. Codegen'd branch; only
      // added when the incoming frame is nullable-typed.
      val guarded =
        if (!f.nullable && inNullable.getOrElse(f.name, true))
          when(c.isNull, raise_error(lit(
            s"null value written to non-nullable column ${f.name} of $t"))
            .cast(f.dataType)).otherwise(c)
        else c
      guarded.as(f.name, f.metadata)
    }.toIndexedSeq: _*)

    // Bulk-load fast path: the FIRST merge write to an empty table under
    // read_optimization=MAX resolves intra-batch duplicates and writes the
    // bucketed layout directly, committing an already-compacted delta — one
    // write instead of write + compaction re-read + full rewrite. (The
    // reference stages unbucketed then compacts; folding the two halves the
    // bulk-ingest cost.)
    val bulkLoad = deltaType == DeltaType.Upsert && txn.isEmpty && mergeKeys.nonEmpty &&
      meta.properties.getOrElse("read_optimization", "MAX") == "MAX" &&
      store.visibleRevisionPaths(deltaDir(t), None, None).isEmpty

    inTxnRet(txn, s"write $deltaType to $t") { tx =>
      if (evolved) stageTableMeta(tx, t, meta.copy(schemaJson = targetSchema.json))
      val dir = deltaDir(t)
      val rev = store.nextRevision(dir, Some(tx))
      // Stream positions: rev is the total commit order. CHRONO semantics
      // (event wall-clock) are preserved in a delta property; merge ordering
      // uses the totally-ordered rev (deviation from the reference's
      // UUID63/epoch-ms encodings, which only need *a* total order).
      val pos = rev
      val scheme = partitionSchemeOf(meta)
      if (bulkLoad) {
        import Hidden._
        val presentCols = targetSchema.fieldNames.filter(present).toSeq
        val withMissing = targetSchema.fields.filterNot(f => present(f.name))
          .foldLeft(coerced)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
        // Bucket count for the fused bulk load: explicit property, else
        // stats-driven (optimizer size estimate of the incoming frame — for
        // file-backed plans that is ~on-disk bytes; no execution happens).
        // Plans with NO real estimate (RDD-backed frames report
        // defaultSizeInBytes = Long.MaxValue; join estimates multiply) must
        // not explode to the bucket cap — treat absurd estimates as unknown
        // and keep the reference default.
        val numBuckets = meta.properties.get("compaction.num_buckets").map(_.toInt)
          .getOrElse {
            val est = coerced.queryExecution.optimizedPlan.stats.sizeInBytes
            if (est >= BigInt(Long.MaxValue) / 4) 8
            else Compactor.suggestBuckets(est.toLong)
          }
        val maxRec = meta.properties.get("compaction.max_records_per_file")
          .map(_.toLong).getOrElse(Compactor.DefaultMaxRecordsPerFile)
        // Column stats ride the materialize pass (same as the normal write
        // path), so bulk-loaded rows feed columnStats/eventTimeWatermark.
        val bulkStatFields = statFieldsOf(targetSchema, targetSchema.fieldNames.toSet)
        // Fused single-shuffle path whenever batch recency alone picks
        // winners (the common bulk-ingest shape); otherwise resolve first.
        val canFuse = presentCols.toSet == targetSchema.fieldNames.toSet &&
          FieldMeta.mergeOrderKeys(targetSchema).isEmpty && sortSchemeOf(meta).keys.isEmpty
        val (entries, written, mObs) = if (canFuse) {
          Compactor.materializeBulkDedupe(this, t, rev, tx.txnId, withMissing,
            targetSchema, scheme, contentTypeOf(meta), numBuckets, maxRec, mergeKeys,
            statAggsFor(bulkStatFields), encoding = contentEncodingOf(meta),
            writeOptions = bloomOptionsOf(meta), statCols = statColsOf(meta))
        } else {
          // Synthetic lineage: one delta, recency within the batch = row order
          // (monotonically_increasing_id follows the same partition/row order
          // the two-phase path would have persisted to files).
          val scan = withMissing
            .withColumn(Pos, lit(rev))
            .withColumn(File, lit(""))
            .withColumn(Row, monotonically_increasing_id())
            .withColumn(Dt, lit(DeltaType.Upsert.name))
            .withColumn(Present, typedLit(presentCols))
          val synth = DeltaMeta(rev, DeltaType.Upsert.name, Nil, "", -1L,
            Map("written_columns" -> presentCols.mkString(",")))
          val resolved = MergeRead.applyPastDefaults(
            MergeRead.resolve(scan, targetSchema, scheme, mergeKeys, Seq(synth),
              needFile = false), targetSchema)
            .select(targetSchema.fieldNames.map(col).toIndexedSeq: _*)
          Compactor.materialize(this, t, rev, tx.txnId, resolved,
            targetSchema, scheme, sortSchemeOf(meta), contentTypeOf(meta), numBuckets, maxRec,
            statAggsFor(bulkStatFields), encoding = contentEncodingOf(meta),
            writeOptions = bloomOptionsOf(meta), statCols = statColsOf(meta))
        }
        val props = Map(
          "written_columns" -> targetSchema.fieldNames.mkString(","),
          "num_buckets" -> numBuckets.toString,
          "record_count" -> written.toString,
          "total_bytes" -> entries.map(_.sizeBytes).sum.toString,
          // entry count, so maintenance triggers can run off skeleton
          // metadata above the planning gate without parsing entries
          "file_count" -> entries.size.toString,
          "partition_scheme" -> scheme.keys.map(k =>
            s"${k.field}:${k.transform.name}").mkString(","),
          "copied_by_reference" -> "0",
          "bulk_load" -> "true",
          "column_stats" -> statsJsonFrom(bulkStatFields, mObs))
        val d = DeltaMeta(pos, DeltaType.Add.name, entries, tx.txnId, pos, props)
        tx.stage(dir, rev, "delta", Json.write(d), s"CREATE delta/$t/$rev (bulk-load)")
        pos
      } else {
      // Physical dir is unique per (revision, txn): two optimistic racers on
      // the same revision never collide on disk; the loser's orphan dir is
      // invisible (not in any committed manifest) and janitor-sweepable.
      val out = dataDir(t).resolve(f"d$rev%06d__${tx.txnId}").toString
      val obs = Observation(s"write-${t.name}-$rev")
      val withPart = addDerivedPartitionColumns(coerced, scheme)
      val ct = contentTypeOf(meta)
      // Per-column min/max/null stats ride the same write pass (reference
      // delta column stats, compute/stats/models/delta_stats.py:15-40) —
      // zero extra jobs, all codegen'd aggregates.
      val statFields = statFieldsOf(targetSchema, present)
      val statAggs = statAggsFor(statFields)
      val writer = withPart.observe(obs, count(lit(1)).as("n"), statAggs.toIndexedSeq: _*)
        .write.mode("overwrite")
        .format(ct.format).options(ct.writeOptions)
        .options(contentEncodingOf(meta).map("compression" -> _).toMap)
        .options(bloomOptionsOf(meta))
        // ≤N-record file slicing (reference _write_table_slices,
        // storage/main/impl.py:2578-2618) via Spark's native option.
        // Default is tighter than compaction's: pending files must stay
        // SPLITTABLE for merge-on-read (see WriteMaxRecordsPerFile).
        .option("maxRecordsPerFile", meta.properties
          .getOrElse("write.max_records_per_file",
            Compactor.WriteMaxRecordsPerFile.toString).toLong)
      val partCols = scheme.keys.map(_.partitionColumnName).filter(withPart.columns.contains)
      withMicrosTimestamps {
        (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer).save(out)
      }
      val n = obs.get("n").asInstanceOf[Long]
      val statsJson = statsJsonFrom(statFields, obs)
      val entries = manifestEntriesOf(Paths.get(out), ct, statColsOf(meta))
      val props = Map("written_columns" -> coerced.columns.mkString(","),
        "column_stats" -> statsJson) ++
        (if (replace) Map("replace" -> "true") else Map.empty) ++
        (if (deltaType == DeltaType.Chrono) Map("chrono_millis" -> System.currentTimeMillis.toString) else Map.empty) ++
        Map("record_count" -> n.toString,
          // on-disk bytes, so maintenance (the compaction valve) can size
          // its input without re-streaming the manifest
          "total_bytes" -> entries.map(_.sizeBytes).sum.toString,
          // entry count, for skeleton-based maintenance triggers
          "file_count" -> entries.size.toString,
          // the layout this delta was WRITTEN under — compaction's
          // relayout gate compares it against the current scheme
          "partition_scheme" -> scheme.keys.map(k =>
            s"${k.field}:${k.transform.name}").mkString(","))
      val d = DeltaMeta(pos, deltaType.name, entries, tx.txnId, -1L, props)
      tx.stage(dir, rev, "delta", Json.write(d), s"CREATE delta/$t/$rev")
      pos
      }
    }
  }

  /** Bound the per-table delta LOG for long-lived tables (round-15): a
    * table keeps one delta metafile per write forever, so its log listing
    * grows O(lifetime writes) even though compaction folded the data long
    * ago. trimHistory deletes the metafiles a compacted base has folded
    * (stream position ≤ the base's watermark) once the base itself is
    * older than `retentionMillis` — Delta-Lake-style log retention
    * (public pattern: delta-io PROTOCOL checkpoints + metadata cleanup;
    * the reference's janitor bounds its txn log dirs the same way)
    * applied to the catalog's per-table log. DATA files are untouched:
    * copy-by-reference means the base's manifest may still point into
    * files first written by a folded delta.
    *
    * Metadata-only, idempotent, concurrent-reader-safe:
    *  - current-time reads never open pre-watermark metafiles (the
    *    planning walk stops at the base), so they cannot race the delete;
    *  - the horizon (`history.trim.horizon.millis` = the base txn's
    *    endTime, `history.trim.upto.position` = the watermark) COMMITS as
    *    a table-property revision before any file is deleted; asOf reads
    *    earlier than the horizon and CDC reads from an earlier position
    *    fail loudly instead of resolving a partial history;
    *  - full-lineage surfaces (maintenance, deltaLog) tolerate
    *    vanished-after-listing metafiles — the active set is never
    *    trimmed.
    * Time travel / downloadDelta earlier than the horizon is FORFEITED —
    * the standard retention trade. The gate `now − baseEnd ≥ retention`
    * guarantees every asOf inside the retention window still resolves to
    * the (untrimmed) newest base. Returns #metafiles removed. */
  def trimHistory(table: String,
      retentionMillis: Long = 7L * 24 * 3600 * 1000): Int = {
    val t = th(table)
    val files = store.visibleRevisionPaths(deltaDir(t), None, None)
    val suffix = planningVisible(t, None, None, skeletonOnly = true)
    val base = MergeRead.activeDeltas(suffix.map(_._3))._1.getOrElse(return 0)
    val w = base.compactedUpTo
    val baseEnd = store.successfulTxns().get(base.txnId).map(_.endTimeMillis)
      .getOrElse(return 0)
    if (System.currentTimeMillis() - baseEnd < retentionMillis) return 0
    // copy-by-reference: the base's manifest may reference files first
    // written by folded deltas, and lineage keys on the path's revision —
    // a referenced metafile is NEVER trimmed (it survives as the
    // planning walk's lineage skeleton until a rewrite stops referencing
    // it). Streaming keeps this O(1) heap above the planning gate.
    val referenced = scala.collection.mutable.Set[Long]()
    suffix.find(_._3.streamPosition == base.streamPosition).foreach { case (_, p, _) =>
      graft.catalog.ManifestPlanner.foreachEntry(p, io)(e =>
        MergeRead.revOfPath(e.path).foreach(referenced += _))
    }
    val victims = files.filter { case (rev, _) => rev <= w && !referenced.contains(rev) }
    if (victims.isEmpty) return 0
    // horizon first (readers fail fast from this commit on), then delete —
    // a crash in between trims less than promised, never more
    val tx = store.newTransaction(s"trim history $t up to $w")
    try {
      val m = getTableMeta(table)
      val nowMs = System.currentTimeMillis()
      // the trim LOG (last 8 stamp:watermark pairs) lets vacuum reclaim
      // under horizons already older than the straggler margin even while
      // fresh trims keep re-stamping the latest clock — without it a
      // busy table's every-cycle trims would gate auto-vacuum forever
      val log = (m.properties.get("history.trim.log").toSeq
        .flatMap(_.split(",").toSeq) :+ s"$nowMs:$w").takeRight(8).mkString(",")
      stageTableMeta(tx, t, m.copy(properties = m.properties ++ Map(
        "history.trim.horizon.millis" -> baseEnd.toString,
        "history.trim.upto.position" -> w.toString,
        // vacuum's straggler-margin clock starts at the trim COMMIT, not
        // the (older) base endTime the horizon records
        "history.trim.committed.millis" -> nowMs.toString,
        "history.trim.log" -> log)))
      tx.seal()
    } catch { case e: Throwable => tx.abort(); throw e }
    var n = 0
    victims.foreach { case (_, p) => if (io.delete(p)) n += 1 }
    n
  }

  /** Reclaim DATA files forfeited by [[trimHistory]] — Delta-VACUUM
    * semantics for the native catalog: without it a daily-compacting
    * table's storage grows by every superseded base generation forever
    * (the real 100 TB wall trimHistory's metadata fix exposes). The rule
    * is sound WITHOUT age heuristics because the trim horizon is already
    * a committed semantic fence (reads earlier than it fail loudly):
    * only files under delta dirs with revision ≤ the trimmed
    * `history.trim.upto.position` are candidates, and a candidate
    * survives if ANY retained visible metafile still references its path
    * (copy-by-reference files the surviving base points into). The
    * referenced set streams off the retained metafiles — post-trim that
    * is O(active + referenced) entries, never the lifetime history.
    * In-flight writers cannot collide: a running txn stages at
    * nextRevision > the newest base revision > the watermark.
    *
    * Straggler-reader margin (round-16): the horizon fence is sound at
    * PLAN time, but a query planned against the pre-trim window — legally,
    * moments before the horizon committed — may still be executing when
    * vacuum deletes its input files (Delta VACUUM has the identical race
    * and mitigates with a default retention check). Files are reclaimed
    * only once the trim commit is older than `minAgeMillis` (per-call
    * override > `vacuum.min.age.millis` table property >
    * [[GraftCatalog.DefaultVacuumMinAgeMillis]]); until then vacuum
    * returns 0 and the next (auto-)vacuum picks the files up. `dryRun`
    * counts candidates without deleting; [[vacuumCandidates]] lists them.
    * Returns #files deleted (or #candidates under dryRun); 0 until a trim
    * has committed a horizon. */
  def vacuumTable(table: String, dryRun: Boolean = false,
      minAgeMillis: Option[Long] = None): Long = {
    var n = 0L
    vacuumCore(table, delete = !dryRun, minAgeMillis)(_ => n += 1)
    n
  }

  /** The files [[vacuumTable]] would reclaim right now, without deleting
    * anything — the audit surface for operators sizing a reclamation. */
  def vacuumCandidates(table: String, minAgeMillis: Option[Long] = None): Seq[String] = {
    val b = Seq.newBuilder[String]
    vacuumCore(table, delete = false, minAgeMillis)(b += _)
    b.result()
  }

  private def vacuumCore(table: String, delete: Boolean,
      minAgeMillis: Option[Long])(onCandidate: String => Unit): Unit = {
    val t = th(table)
    val meta = getTableMeta(table)
    val w = meta.properties.get("history.trim.upto.position").flatMap(_.toLongOption)
      .getOrElse(return)
    val minAge = minAgeMillis
      .orElse(meta.properties.get("vacuum.min.age.millis").flatMap(_.toLongOption))
      .getOrElse(GraftCatalog.DefaultVacuumMinAgeMillis)
    val nowMs = System.currentTimeMillis()
    // Straggler margin over the trim LOG: reclaim under the newest horizon
    // whose trim committed at least minAge ago. Gating on the LATEST stamp
    // alone would let every-cycle trims re-stamp the clock and defer files
    // forfeited N trims ago forever (r16 review finding); a horizon older
    // than the margin is safe by construction — any query planned against
    // its window has drained.
    val agedW: Option[Long] = meta.properties.get("history.trim.log").toSeq
      .flatMap(_.split(",").toSeq).flatMap { e =>
        val i = e.indexOf(':')
        if (i <= 0) None
        else for (a <- e.take(i).toLongOption; b <- e.drop(i + 1).toLongOption)
          yield (a, b)
      }.filter { case (ts, _) => nowMs - ts >= minAge }
      .map(_._2).maxOption
    val wEff: Long = agedW.getOrElse {
      // legacy single-stamp tables (pre-log trims): clock from the commit
      // stamp, falling back to the (strictly older) base endTime
      val committed = meta.properties.get("history.trim.committed.millis")
        .flatMap(_.toLongOption)
        .orElse(meta.properties.get("history.trim.horizon.millis").flatMap(_.toLongOption))
        .getOrElse(return)
      if (nowMs - committed < minAge) return
      w
    }
    def norm(p: String): String = p.replaceFirst("^file:/+", "/")
    val (pairs, streamed) = effectiveDeltasForMaintenance(t)
    val referenced = scala.collection.mutable.HashSet[String]()
    pairs.foreach { case (d, p) =>
      if (!streamed) d.entries.foreach(e => referenced += norm(e.path))
      else ManifestPlanner.foreachEntry(p, io)(e => referenced += norm(e.path))
    }
    val dd = dataDir(t)
    val dirs = io.listDir(dd)
    dirs.foreach { dir =>
      val n = dir.getFileName.toString
      val rev = if (n.startsWith("d") && n.contains("__"))
        n.stripPrefix("d").takeWhile(_.isDigit) else ""
      if (rev.nonEmpty && rev.toLong <= wEff && io.isDirectory(dir)) {
        val all = scala.collection.mutable.ArrayBuffer[Path]()
        io.walk(dir)(all += _)
        // deepest-first: unreferenced files go, then dirs that emptied out
        // (a dir holding surviving copy-by-reference files stays)
        all.reverse.foreach { f =>
          if (io.isFile(f)) {
            if (!referenced.contains(norm(f.toString)) &&
                (!delete || io.delete(f)))
              onCandidate(f.toString)
          } else if (delete && io.isDirectory(f)) {
            io.deleteDirIfEmpty(f) // non-empty: keep
          }
        }
      }
    }
  }

  /** asOf floor after [[trimHistory]]: an earlier asOf could resolve an
    * active set whose metafiles are gone — fail loudly, never read a
    * partial history. Reads the CURRENT meta (the horizon property did
    * not exist in the asOf-resolved revision, by construction). */
  private def requireWithinRetention(t: TableHandle, asOf: Option[Long],
      table: String): Unit =
    if (asOf.isDefined)
      for {
        a <- asOf
        m <- currentMeta(t, None, None)
        h <- m.properties.get("history.trim.horizon.millis").flatMap(_.toLongOption)
        if a < h
      } throw new IllegalArgumentException(
        s"asOf $a is earlier than $table's trimmed-history horizon $h: " +
          "time travel beyond the retention window was forfeited by trimHistory")

  // ------------------------------------------------------------- read path
  def readTable(table: String, opts: ReadOptions = ReadOptions()): DataFrame = {
    val parsed = thRaw(table)
    val (t, meta0) = resolveVersionMeta(parsed, opts.asOf, opts.txn)
    val meta = meta0.filter(!_.dropped)
      .getOrElse(throw new TableNotFound(table))
    // Default reads serve the latest ACTIVE version only (reference
    // resolution); a pinned `@vN` read may inspect any live version.
    if (parsed.version.isEmpty && meta.lifecycleState != Lifecycle.Active)
      throw new NoActiveTableVersion(table, meta.lifecycleState)
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val mergeKeys = FieldMeta.mergeKeys(schema)
    val scheme = partitionSchemeOf(meta)
    // a partitionValues key outside the CURRENT scheme would silently prune
    // nothing (full-table read) — reachable since alterTable can change the
    // scheme; fail fast with the remedy instead
    opts.partitionValues.foreach(_.keys.foreach(k =>
      require(scheme.keys.exists(_.field == k),
        s"partitionValues references '$k', which is not a partition field of " +
          s"$table (current scheme: ${scheme.keys.map(_.field).mkString(",")}) — " +
          "use rowFilter for value predicates on non-partition fields")))
    requireWithinRetention(t, opts.asOf, table)
    val deltas = plannedDeltas(t, opts, schema, scheme, mergeKeys)

    val df = MergeRead.plan(spark, schema, scheme, mergeKeys, deltas, opts,
      dataDir(t).toString, contentTypeOf(meta))
    // Filter BEFORE projecting: a partition/row filter may reference columns
    // the caller did not project (Catalyst prunes the scan all the same).
    val filtered = (opts.partitionFilter.toSeq ++ opts.rowFilter.toSeq)
      .foldLeft(df)((d, p) => d.where(p))
    val extra = if (opts.withFilePath) Seq("_file_path") else Nil
    val projected = opts.columns match {
      case Some(cols) => filtered.select((cols ++ extra).map(col): _*)
      case None => filtered.select((schema.fieldNames.toSeq ++ extra).map(col): _*)
    }
    opts.limit match {
      case Some(n) => projected.limit(n)
      case None => projected
    }
  }

  /** Schemaless read: the manifest as a table (path, size, records, delta
    * type, stream position) — reference catalog/main/impl.py:1408-1439.
    * `bucket` (round-12): the file's `_g_bucket=N` layout id, null for
    * un-bucketed files — `SELECT bucket, sum(size_bytes) FROM
    * graft_manifest(...) GROUP BY 1` is the SQL-surface skew probe for
    * the one-partition-per-bucket partitioned merge. */
  def manifestTable(table: String, asOf: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val cols = Seq("path", "size_bytes", "delta_record_count", "delta_type",
      "stream_position", "bucket")
    // Above the planning gate the manifest view goes DISTRIBUTED: deltas
    // skeleton-parse on the driver (O(#deltas) heap) and each metafile's
    // entries stream LAZILY to rows inside Spark tasks — the layout/skew
    // probe for a 10^7-entry table must not materialize 10^7 entries on
    // the driver OR in one task's heap to answer a GROUP BY bucket. Below
    // the gate this is the plain in-memory view built from the metas the
    // gate check already parsed (one listing, one read — no job launch).
    val (pairs, streamed) = effectiveDeltasForMaintenance(thRaw(table), asOf)
    if (!streamed) {
      val rows = pairs.map(_._1).flatMap { d =>
        d.entries.map(e => (e.path, e.sizeBytes, d.properties.getOrElse("record_count", "-1").toLong,
          d.deltaType, d.streamPosition, MergeRead.bucketOfPath(e.path)))
      }
      rows.toDF(cols: _*)
    } else {
      val metaRows = pairs.map { case (d, p) =>
        (p.toString, d.properties.getOrElse("record_count", "-1").toLong,
          d.deltaType, d.streamPosition)
      }
      val par = math.min(math.max(metaRows.size, 1),
        spark.sparkContext.defaultParallelism * 2)
      val fio = io // local copy: the task lambda must not capture `this`
      spark.sparkContext.parallelize(metaRows, par).flatMap {
        case (path, rc, dt, pos) =>
          ManifestPlanner.entryIterator(Paths.get(path), fio).map(e =>
            (e.path, e.sizeBytes, rc, dt, pos, MergeRead.bucketOfPath(e.path)))
      }.toDF(cols: _*)
    }
  }

  /** Bucket-layout health of the table's compacted base from manifest
    * metadata alone (Compactor.reclusterAdvice): per-bucket byte/row
    * footprints, hottest-bucket skew vs the declared layout, and whether
    * a recluster is advised. None = no compacted bucketed base. A hot
    * bucket bounds every partitioned-merge stage (one scan partition per
    * bucket), so operators watching this at scale recluster BEFORE the
    * skew lands in read walls. */
  def reclusterAdvice(table: String): Option[Compactor.ReclusterAdvice] = {
    // Maintenance-gated like the trigger path: above the planning gate
    // the base is a skeleton and the per-bucket sums stream off its
    // metafile in O(1) memory — the health probe must stay safe to call
    // on a 10^7-entry table (it exists FOR that table).
    val (pairs, streamed) = effectiveDeltasForMaintenance(th(table))
    for {
      base <- MergeRead.activeDeltas(pairs.map(_._1))._1
      n <- base.properties.get("num_buckets").map(_.toInt)
      advice <-
        if (!streamed) Compactor.reclusterAdvice(base.entries, n, MergeRead.bucketOfPath)
        else pairs.collectFirst { case (d, p) if d.streamPosition == base.streamPosition => p }
          .flatMap(p => Compactor.reclusterAdviceOf(n, MergeRead.bucketOfPath)(
            f => ManifestPlanner.foreachEntry(p, io)(f)))
    } yield advice
  }

  /** [[reclusterAdvice]] as a one-row frame (empty when there is no
    * compacted bucketed base) — the SQL observability shape behind the
    * `graft_recluster_advice` TVF. Metadata-sized LocalRelation, never a
    * data scan. */
  def reclusterAdviceDF(table: String): DataFrame = {
    import spark.implicits._
    reclusterAdvice(table).toSeq.map(a =>
      (a.numBuckets, a.populated, a.totalBytes, a.totalRecords,
        a.hottest.bucket, a.hottest.bytes,
        BigDecimal(a.skew).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble,
        a.suggestedBuckets, a.reasons, a.recommended))
      .toDF("num_buckets", "populated_buckets", "total_bytes", "total_records",
        "hottest_bucket", "hottest_bytes", "skew", "suggested_buckets",
        "reasons", "recommended")
  }

  /** Read the data files listed in a manifest table — from_manifest_table. */
  def fromManifestTable(manifest: DataFrame, contentType: ContentType = ContentType.Parquet): DataFrame = {
    val paths = manifest.select("path").collect().map(_.getString(0))
    spark.read.format(contentType.format).options(contentType.readOptions)
      .load(paths.toIndexedSeq: _*)
  }

  /** Locate ONE visible post-replace delta by position, gate-safe: above
    * the manifest gate the search runs over skeletons (O(1) heap per
    * metafile) and only the MATCH is fully parsed — deltaLog.find would
    * materialize every delta's entry list on the driver just to discard
    * all but one. */
  private def deltaAt(table: String, streamPosition: Long): Option[DeltaMeta] = {
    val (pairs, streamed) = effectiveDeltasForMaintenance(th(table))
    pairs.find(_._1.streamPosition == streamPosition).map { case (d, p) =>
      if (!streamed) d
      else Json.read(new String(io.readBytes(p), "UTF-8"), classOf[DeltaMeta])
    }
  }

  /** Read ONE delta's files as a DataFrame, in manifest order — reference
    * download_delta (storage/main/impl.py:947-1085). */
  def downloadDelta(table: String, streamPosition: Long): DataFrame = {
    val meta = getTableMeta(table)
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val d = deltaAt(table, streamPosition).getOrElse(
      throw new IllegalArgumentException(s"no delta at position $streamPosition in $table"))
    val ct = contentTypeOf(meta)
    if (d.entries.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).format(ct.format).options(ct.readOptions)
      .load(d.entries.map(_.path): _*)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Read a single manifest entry (file) of a delta — reference
    * download_delta_manifest_entry (storage/interface.py:229-248). */
  def downloadDeltaManifestEntry(table: String, streamPosition: Long, entryIndex: Int): DataFrame = {
    val meta = getTableMeta(table)
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val d = deltaAt(table, streamPosition).getOrElse(
      throw new IllegalArgumentException(s"no delta at position $streamPosition in $table"))
    require(entryIndex >= 0 && entryIndex < d.entries.size,
      s"entry $entryIndex out of range (0..${d.entries.size - 1})")
    val ct = contentTypeOf(meta)
    spark.read.schema(schema).format(ct.format).options(ct.readOptions)
      .load(d.entries(entryIndex).path)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Rewrite the table's data re-clustered by hash or range — reference
    * repartition (compute/compactor/steps/repartition.py:42-244). The
    * rewrite is one REPLACE commit; readers before/after see identical rows. */
  def repartitionTable(table: String, numPartitions: Int,
      byColumns: Seq[String] = Nil, range: Boolean = false): Unit = {
    val df = readTable(table)
    val rep =
      if (byColumns.isEmpty) df.repartition(numPartitions)
      else if (range) df.repartitionByRange(numPartitions, byColumns.map(col): _*)
      else df.repartition(numPartitions, byColumns.map(col): _*)
    writeToTable(rep, table, WriteMode.Replace)
  }

  /** Paged listing — reference ListResult (storage/model/list_result.py).
    * Returns (page, nextPageToken). */
  def listTablesPaged(ns: String, pageSize: Int, pageToken: Option[String] = None):
      (Seq[String], Option[String]) = paged(listTables(ns), pageSize, pageToken)

  def listNamespacesPaged(pageSize: Int, pageToken: Option[String] = None):
      (Seq[String], Option[String]) = paged(listNamespaces(), pageSize, pageToken)

  private def paged(all: Seq[String], pageSize: Int, token: Option[String]):
      (Seq[String], Option[String]) = {
    val after = token.map(t => all.dropWhile(_ <= t)).getOrElse(all)
    val page = after.take(pageSize)
    (page, if (after.size > pageSize) page.lastOption else None)
  }

  /** The table's visible delta log (after the last REPLACE), ascending by
    * stream position — the incremental-consumption surface. */
  def deltaLog(table: String): Seq[DeltaMeta] = effectiveDeltas(th(table), None)

  /** Visible deltas with streamPosition > afterPosition, entries parsed —
    * the streaming source's per-trigger view. Revisions ARE stream
    * positions, so the name filter bounds the parse to O(new deltas) per
    * poll instead of the lifetime history (a 10-second trigger on a
    * year-old table must not re-open every metafile ever written).
    * REPLACE truncation is irrelevant here: a marker inside the range
    * surfaces to the caller, and positions before `afterPosition` are the
    * caller's own committed past. */
  def deltasAfter(table: String, afterPosition: Long): Seq[DeltaMeta] = {
    val t = th(table)
    store.visibleRevisionPaths(deltaDir(t), None, None)
      .filter(_._1 > afterPosition)
      .flatMap { case (_, p) =>
        try Some(Json.read(new String(io.readBytes(p), "UTF-8"), classOf[DeltaMeta]))
        // vanished-after-listing ONLY — a corrupt committed metafile must
        // fail LOUDLY, not silently drop its rows from the change feed
        catch {
          case _: java.nio.file.NoSuchFileException => None // concurrent trim
          case _: java.io.FileNotFoundException => None
        }
      }
  }

  /** Metadata-only view of the active log: full metas below the planning
    * gate, entry-less skeletons above it (types, positions, watermarks,
    * properties always present). For consumers that never touch entries —
    * safe to call per-statement on a 10^7-entry backlog. */
  def deltaLogSkeleton(table: String): Seq[DeltaMeta] =
    effectiveDeltasForMaintenance(th(table))._1.map(_._1)

  /** Per-partition high-watermark stream positions — reference
    * Partition.stream_position (storage/model/partition.py:53-78), where
    * each partition advances its own position so consumers can track
    * incremental progress per partition rather than table-wide. Partition
    * values are parsed from the manifest paths' `name=value` directory
    * segments (Spark's partition-dir encoding); one string column per
    * partition key plus the max committed position. Unpartitioned tables
    * return a single row with just the table-level position. */
  def partitionStreamPositions(table: String): DataFrame = {
    import spark.implicits._
    val t = th(table)
    val meta = getTableMeta(table)
    val scheme = partitionSchemeOf(meta)
    // Maintenance-gated (round-15): per-partition watermarks fold one
    // entry at a time — O(#partitions) driver state. Above the gate
    // entries stream off the metafiles; a 10^7-entry table never holds an
    // entry list on the driver for this metadata view.
    val (pairs, streamed) = effectiveDeltasForMaintenance(t)
    val deltas = pairs.map(_._1)
    if (scheme.keys.isEmpty) {
      val pos = if (deltas.isEmpty) -1L else deltas.map(_.streamPosition).max
      return Seq(pos).toDF("stream_position")
    }
    val names = scheme.keys.map(_.partitionColumnName)
    def valueOf(path: String, name: String): String = {
      val seg = s"/$name="
      val i = path.indexOf(seg)
      if (i < 0) null
      else {
        val rest = path.substring(i + seg.length)
        val end = rest.indexOf('/')
        if (end < 0) rest else rest.substring(0, end)
      }
    }
    val pathOf = pairs.map { case (d, p) => d.streamPosition -> p }.toMap
    def foreachEntryOf(d: DeltaMeta)(f: graft.txn.ManifestEntry => Unit): Unit =
      if (!streamed) d.entries.foreach(f)
      else ManifestPlanner.foreachEntry(pathOf(d.streamPosition), io)(f)
    // Deltas whose files carry no partition directories (key-only DELETE
    // deltas, zero-entry markers like REPLACE) cannot be attributed to
    // specific partitions — they may touch ANY partition, so they advance
    // every partition's watermark (an under-advanced watermark would hide
    // deletes from incremental consumers; over-advancing is safe).
    val perPart = scala.collection.mutable.HashMap[Seq[String], Long]()
    var floor = -1L
    deltas.foreach { d =>
      var any = false
      foreachEntryOf(d) { e =>
        any = true
        val vals = names.map(n => valueOf(e.path, n))
        if (vals.forall(_ != null))
          perPart.update(vals, math.max(perPart.getOrElse(vals, -1L), d.streamPosition))
        else floor = math.max(floor, d.streamPosition)
      }
      if (!any) floor = math.max(floor, d.streamPosition)
    }
    val grouped = perPart.toSeq.map { case (vals, p) => (vals, math.max(floor, p)) }
    val df = grouped.toDF("_vals", "stream_position")
    names.zipWithIndex.foldLeft(df) { case (d, (n, i)) =>
      d.withColumn(n, col("_vals").getItem(i))
    }.select((names.map(col) :+ col("stream_position")).toIndexedSeq: _*)
  }

  /** Raw change feed: rows of all deltas with stream position > afterPosition,
    * tagged with _delta_type and _stream_position (CDC-style incremental
    * read; reference discover_deltas, compactor_v2/utils/io.py:171). */
  def readChanges(table: String, afterPosition: Long = -1L): DataFrame = {
    val t = th(table)
    val meta = getTableMeta(table)
    // CDC from a position before the trim horizon would silently MISS the
    // trimmed deltas' changes — fail with the remedy instead
    meta.properties.get("history.trim.upto.position").flatMap(_.toLongOption)
      .filter(_ > afterPosition).foreach(w => throw new IllegalArgumentException(
        s"readChanges(afterPosition=$afterPosition) on $table: deltas up to " +
          s"position $w were trimmed by trimHistory — changes before it are " +
          "gone; re-read the full table or resume from a position >= " + w))
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    // Compacted snapshots re-reference already-delivered data and are
    // skipped — EXCEPT bulk-load deltas, which carry original rows that
    // appeared in no earlier delta.
    val newer = effectiveDeltas(t, None)
      .filter(d => d.compactedUpTo < 0 || d.properties.get("bulk_load").contains("true"))
      .filter(_.streamPosition > afterPosition)
    val paths = newer.flatMap(_.entries).map(_.path)
    if (paths.isEmpty) {
      val full = schema.add("_delta_type", StringType).add("_stream_position", LongType)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
    }
    val scan = MergeRead.scanWithLineage(spark, schema, newer, paths, contentTypeOf(meta))
    scan.select((schema.fieldNames.map(col) ++ Seq(
      col(Hidden.Dt).as("_delta_type"), col(Hidden.Pos).as("_stream_position"))).toIndexedSeq: _*)
  }

  /** The catalog metadata TREE as a DataFrame (path, kind, revision, txn,
    * committed) — reference metadata-tree datasource
    * (io/datasource/deltacat_datasource.py: DeltacatReadType.METADATA). */
  def metafilesDF(): DataFrame = {
    import spark.implicits._
    // Metafiles live only under root/ns/<namespace>/<table-or-__ns__>/…; the
    // walk parallelizes over those depth-2 dirs (a 100x-revision catalog has
    // metadata-sized dir COUNT but per-table revision fan-out — exactly the
    // axis a Spark job spreads). A pure lambda (no `this` capture: Catalog
    // is not serializable) so the same walker runs on driver or executors.
    val fio = io // local copy: the lambda must not capture `this`
    val walkUnit: String => Seq[(String, String, Long, String)] = { dir =>
      val out = scala.collection.mutable.ArrayBuffer[(String, String, Long, String)]()
      fio.walk(Paths.get(dir)) { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".json") && n.contains("__") && fio.isFile(p)) {
          val parts = n.stripSuffix(".json").split("__", 3)
          if (parts.length == 3) out += ((p.toString, parts(2), parts(0).toLong, parts(1)))
        }
      }
      out.toSeq
    }
    val base = root.resolve("ns")
    val units: Seq[String] =
      if (!io.isDirectory(base)) Nil
      else listDirs(base).flatMap(listDirs).map(_.toString)
    val ok = store.successfulTxns().keySet
    if (units.size < 8)
      units.flatMap(walkUnit).map { case (p, k, r, t) => (p, k, r, t, ok(t)) }
        .toDF("path", "kind", "revision", "txn_id", "committed")
    else {
      val bc = spark.sparkContext.broadcast(ok)
      val slices = math.min(units.size, spark.sparkContext.defaultParallelism * 2)
      spark.sparkContext.parallelize(units, slices)
        .flatMap(u => walkUnit(u).map { case (p, k, r, t) => (p, k, r, t, bc.value(t)) })
        .toDF("path", "kind", "revision", "txn_id", "committed")
    }
  }

  private def listDirs(p: Path): Seq[Path] =
    io.listDir(p).filter(io.isDirectory(_))

  /** Event-time high watermark: the max committed value of the table's
    * event-time field(s), from the per-delta column stats — reference
    * data-completeness watermark (schema.py:290-295). None when the table
    * has no event-time field or no stats yet. */
  def eventTimeWatermark(table: String): Option[String] = {
    val schema = tableSchema(table)
    val etFields = schema.fields.filter(FieldMeta.isEventTime)
    if (etFields.isEmpty) return None
    val numeric = etFields.forall(_.dataType.isInstanceOf[NumericType])
    val names = etFields.map(_.name).toSet
    // maintenance-gated: stats live in properties, which skeletons carry,
    // so the watermark never materializes entries above the planning gate
    val maxes = effectiveDeltasForMaintenance(th(table))._1.map(_._1).flatMap { d =>
      d.properties.get("column_stats").toSeq.flatMap { json =>
        val m = Json.read(json, classOf[Map[String, Map[String, String]]])
        m.collect { case (c, st) if names(c) => st.get("max") }.flatten.filter(_ != null)
      }
    }
    if (maxes.isEmpty) None
    // Numeric event-time fields (e.g. epoch millis) must compare numerically;
    // timestamp/date cast-to-string forms sort lexicographically.
    else if (numeric) Some(maxes.maxBy(BigDecimal(_)))
    else Some(maxes.max)
  }

  /** Per-delta per-column stats as a DataFrame — reference delta column
    * stats (compute/stats/models/delta_stats.py). */
  def columnStats(table: String): DataFrame = {
    val t = th(table)
    import spark.implicits._
    effectiveDeltas(t, None).flatMap { d =>
      d.properties.get("column_stats").toSeq.flatMap { json =>
        val m = Json.read(json, classOf[Map[String, Map[String, String]]])
        m.map { case (colName, st) =>
          (d.streamPosition, colName, st.getOrElse("min", null),
            st.getOrElse("max", null), st.getOrElse("nulls", "0").toLong)
        }
      }
    }.toDF("stream_position", "column_name", "min", "max", "null_count")
  }

  /** One-row table summary — Delta's `DESCRIBE DETAIL` analog: physical
    * footprint, layout (buckets / z-order / sort / partitioning), pending
    * merge-delta state, and skip-index coverage. Metadata-only.
    * `num_rows` is the PHYSICAL (pre-merge) row count: with
    * `unresolved_merge_deltas > 0` it includes superseded versions and
    * tombstone rows, so it upper-bounds — and may exceed — the logical
    * `readTable().count()`; resolving to logical rows would require the
    * merge itself, which a metadata-only summary must not run. */
  def tableInfo(table: String): DataFrame = {
    import spark.implicits._
    val meta = getTableMeta(table)
    // Maintenance-gated: above the gate the entry-derived aggregates
    // (file count, bytes, stats coverage, DEFAULT-chain memory estimate)
    // compute in ONE distributed pass over streamed metafile entries —
    // DESCRIBE DETAIL on a 10^7-entry table must stay metadata-sized on
    // the driver. Delta-level fields come from skeleton properties.
    val (pairs, streamed) = effectiveDeltasForMaintenance(th(table))
    val deltas = pairs.map(_._1)
    val (base, pending) = MergeRead.activeDeltas(deltas)
    val active = base.toSeq ++ pending
    val unresolved = pending.count(d =>
      d.typed == DeltaType.Upsert || d.typed == DeltaType.Delete)
    val (nFiles, sizeBytes, withStats, estMem) =
      if (!streamed) {
        val entries = active.flatMap(_.entries)
        (entries.size.toLong, entries.map(_.sizeBytes).sum,
          entries.count(_.stats != null).toLong,
          // in-memory footprint estimate (ResourceEstimator DEFAULT chain —
          // manifest metadata only, no file opens)
          ResourceEstimator.estimateEntryBytes(spark,
            DataType.fromJson(meta.schemaJson).asInstanceOf[StructType], entries,
            ResourceEstimator.Params()).map(_._2).sum.toLong)
      } else {
        val pathOf = pairs.map { case (d, p) => d.streamPosition -> p.toString }.toMap
        val files = active.flatMap(d => pathOf.get(d.streamPosition))
        val schemaJson = meta.schemaJson
        val par = math.min(math.max(files.size, 1), spark.sparkContext.defaultParallelism * 2)
        val fio = io // local copy: the task lambda must not capture `this`
        val (n, by, st, em) = spark.sparkContext.parallelize(files, par)
          .mapPartitions { it =>
            val sc = DataType.fromJson(schemaJson).asInstanceOf[StructType]
            var n = 0L; var by = 0L; var st = 0L; var em = 0.0
            it.foreach(f => ManifestPlanner.foreachEntry(Paths.get(f), fio) { e =>
              n += 1; by += e.sizeBytes
              if (e.stats != null) st += 1
              // the estimator's own Default chain — one source of truth
              em += ResourceEstimator.defaultChainEstimate(sc, e)
            })
            Iterator.single((n, by, st, em))
          }.collect().foldLeft((0L, 0L, 0L, 0.0)) { case ((a, b, c, d), (w, x, y, z)) =>
            (a + w, b + x, c + y, d + z)
          }
        (n, by, st, em.toLong)
      }
    Seq((
      table,
      meta.properties.getOrElse("content_type", "parquet"),
      nFiles,
      sizeBytes,
      // `num_rows` keeps its pre-r7 name/meaning (physical record count)
      // for existing consumers; `num_rows_physical` stays as the explicit
      // alias introduced alongside est_memory_bytes.
      active.map(_.properties.getOrElse("record_count", "0").toLong).sum,
      active.map(_.properties.getOrElse("record_count", "0").toLong).sum,
      base.flatMap(_.properties.get("num_buckets")).map(_.toLong).getOrElse(-1L),
      base.flatMap(_.properties.get("zordered")).orNull,
      meta.sortKeys.map(_.head).mkString(","),
      meta.partitionKeys.map(k => s"${k(0)}:${k(1)}").mkString(","),
      unresolved.toLong,
      withStats,
      estMem
    )).toDF("table", "content_type", "num_files", "size_bytes", "num_rows",
      "num_rows_physical",
      "num_buckets", "zordered", "sort_keys", "partition_keys",
      "unresolved_merge_deltas", "files_with_stats", "est_memory_bytes")
  }

  /** The per-FILE skip index as a DataFrame — observability for the
    * data-skipping work (`DESCRIBE DETAIL` analog at file granularity). */
  def fileStatsTable(table: String): DataFrame = {
    import spark.implicits._
    val cols = Seq("stream_position", "path", "record_count", "column_name",
      "min", "max", "null_count")
    def rowsOf(pos: Long, e: graft.txn.ManifestEntry) =
      if (e.colStats.isEmpty)
        Seq((pos, e.path, e.recordCount, null: String, null: String, null: String, -1L))
      else e.colStats.toSeq.map { case (c, st) =>
        (pos, e.path, e.recordCount, c, st.min, st.max, st.nulls)
      }
    // Maintenance-gated like manifestTable: the per-file skip-index view
    // on a 10^7-entry table streams entries to rows inside Spark tasks.
    val (pairs, streamed) = effectiveDeltasForMaintenance(th(table))
    if (!streamed)
      pairs.map(_._1).flatMap(d => d.entries.flatMap(e => rowsOf(d.streamPosition, e)))
        .toDF(cols: _*)
    else {
      val metaRows = pairs.map { case (d, p) => (d.streamPosition, p.toString) }
      val par = math.min(math.max(metaRows.size, 1),
        spark.sparkContext.defaultParallelism * 2)
      val fio = io // local copy: the task lambda must not capture `this`
      spark.sparkContext.parallelize(metaRows, par).flatMap { case (pos, path) =>
        ManifestPlanner.entryIterator(Paths.get(path), fio).flatMap(e => rowsOf(pos, e))
      }.toDF(cols: _*)
    }
  }

  /** Backfill the per-file skip index for a table written BEFORE stats
    * existed (or with `stats.columns` narrowed): reads the footers of
    * active files lacking stats and commits a metadata-only
    * copy-by-reference fold carrying the same files with stats attached —
    * zero data movement, one new metafile. Keyed tables backfill the
    * compacted BASE only (folding pending upsert/delete deltas would
    * collapse their recency order — they gain stats at the next
    * compaction); append-only tables fold everything. Returns the number
    * of entries that gained stats. */
  def analyzeTable(table: String): Int = {
    val t = th(table)
    val meta = getTableMeta(table)
    if (contentTypeOf(meta) != ContentType.Parquet) return 0
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val keyed = FieldMeta.mergeKeys(schema).nonEmpty
    val deltas = effectiveDeltas(t, None)
    val (base, pending) = MergeRead.activeDeltas(deltas)
    val foldable: Seq[DeltaMeta] = if (keyed) base.toSeq else base.toSeq ++ pending
    if (foldable.isEmpty) return 0
    // column-subset deltas carry per-delta written_columns lineage that a
    // fold would collapse (default backfill / positional reads depend on
    // it) — leave such tables to compaction, which materializes instead.
    // ABSENT written_columns counts as unfoldable too: the Compactor
    // deliberately treats it as possibly-stale (age unknown) and a fold
    // stamping current names would falsify the stale-rename marker.
    val fullSet = schema.fieldNames.toSet
    if (foldable.exists(d => d.properties.get("written_columns")
        .map(_.split(",").toSet != fullSet).getOrElse(true))) return 0
    val missing = foldable.flatMap(_.entries).filter(_.stats == null)
    if (missing.isEmpty) return 0
    val keep = statColsOf(meta)
    val info = fileFooterInfo(missing.map(e => Paths.get(e.path)), ContentType.Parquet)
    def upgraded(e: ManifestEntry): ManifestEntry =
      if (e.stats != null) e
      else info.get(Paths.get(e.path)) match {
        case Some((_, unc, st0)) if st0 != null =>
          val st = keep.map(k => st0.filter { case (c, _) => k(c) }).getOrElse(st0)
          val withUnc = if (e.uncompressedBytes <= 0 && unc > 0) e.copy(uncompressedBytes = unc) else e
          if (st.isEmpty) withUnc else withUnc.copy(stats = st)
        case _ => e
      }
    val entries = foldable.flatMap(_.entries).map(upgraded)
    val gained = entries.count(_.stats != null) - foldable.flatMap(_.entries).count(_.stats != null)
    // nothing improved (unreadable footers / all stats filtered away):
    // committing would grow the log on every run of a maintenance loop
    if (gained == 0) return 0
    // watermark: keyed tables keep the base's (pending stays pending);
    // append-only folds absorb everything up to the newest position
    val upTo =
      if (keyed) base.get.compactedUpTo
      else (foldable.map(_.streamPosition) ++ base.map(_.compactedUpTo)).max
    // Layout properties (bucket count, z-order tag) describe the BASE's
    // file layout. They carry onto the fold only when the fold is exactly
    // the base: an append-only fold absorbing unclustered pending files
    // stamped `zordered` would make the next compaction's incremental
    // z-order path copy those files by reference forever — they would
    // permanently escape reclustering (and a false `num_buckets` would
    // falsify bucket-pruned reads the same way).
    val foldIsBaseOnly = base.exists(b => foldable == Seq(b))
    val carried =
      if (!foldIsBaseOnly) Nil
      else Seq("num_buckets", "zordered").flatMap(k =>
        foldable.flatMap(_.properties.get(k)).lastOption.map(k -> _))
    val records = foldable.map(_.properties.getOrElse("record_count", "0").toLong).sum
    val txn = store.newTransaction(s"analyze $t")
    try {
      val dir = deltaDir(t)
      val rev = store.nextRevision(dir, Some(txn))
      val d = DeltaMeta(rev, DeltaType.Add.name, entries, txn.txnId, upTo,
        Map("written_columns" -> schema.fieldNames.mkString(","),
          "record_count" -> records.toString,
          "analyze" -> "true") ++ carried)
      txn.stage(dir, rev, "delta", Json.write(d), s"ANALYZE $t@$rev")
      txn.seal()
    } catch { case e: Throwable => if (!txn.isSealed) txn.abort(); throw e }
    gained
  }

  /** Transaction history as a DataFrame — `DESCRIBE HISTORY` analog. */
  def historyDF(): DataFrame = {
    import spark.implicits._
    store.history().map(r => (r.txnId, r.startTimeMillis, r.endTimeMillis, r.commitMessage,
      r.operations.mkString(";"))).toDF(
      "txn_id", "start_time", "end_time", "commit_message", "operations")
  }

  def transaction(commitMessage: String = ""): Transaction = store.newTransaction(commitMessage)

  /** Resolve a table "version" — a delta stream position — to the commit
    * timestamp of the transaction that wrote it, usable as an `asOf` read
    * time (SQL `VERSION AS OF n`). Searches the full visible log, including
    * deltas superseded by a later REPLACE, so historical versions resolve. */
  def versionAsOf(table: String, version: Long): Long = {
    val t = th(table)
    getTableMeta(table)
    // the revision NAME carries the txn id — a name lookup, zero metafile
    // parses (the full parse here cost O(lifetime entries) per VERSION AS OF)
    val tid = store.visibleRevisionPaths(deltaDir(t), None, None)
      .collectFirst { case (rev, p) if rev == version =>
        graft.txn.Metastore.parseRevisionName(p.getFileName.toString)._2 }
      .getOrElse(throw new IllegalArgumentException(
        s"no version (delta stream position) $version of $table"))
    store.successfulTxns().getOrElse(tid, throw new IllegalStateException(
      s"delta $version of $table has no committed transaction record ($tid)"))
      .endTimeMillis
  }

  // ------------------------------------------------------------ compaction
  /** Eagerly resolve upserts/deletes into a read-optimized snapshot.
    * numBuckets ≤ 0 resolves to: the existing base's bucket count (so
    * write-triggered recompaction never silently discards copy-by-reference
    * by re-bucketing), else the `compaction.num_buckets` table property,
    * else a stats-driven suggestion from the pending deltas' manifest bytes
    * (Compactor.suggestBuckets — floor 8, the reference default
    * types/tables.py:659, so toy tables are unchanged). */
  def compact(table: String, numBuckets: Int = 0): Unit = {
    val n = if (numBuckets > 0) numBuckets
    else {
      val t = th(table)
      // Maintenance-gated: above the planning gate the deltas are
      // skeletons (properties only, entries never resident) — the
      // recorded-count and table-property paths read properties either
      // way, and the stats suggestion falls back to the commit-stamped
      // total_bytes sums instead of entry stats, so resolving the bucket
      // count never materializes a 10^7-entry log on the driver.
      val (pairs, _) = effectiveDeltasForMaintenance(t)
      val all = pairs.map(_._1)
      val (base, _) = MergeRead.activeDeltas(all)
      base.flatMap(_.properties.get("num_buckets")).map(_.toInt)
        .orElse(getTableMeta(table).properties.get("compaction.num_buckets").map(_.toInt))
        .getOrElse {
          val entries = all.flatMap(_.entries)
          // Prefer the resource estimator's in-memory footprint when the
          // manifests carry estimation metadata (uncompressed sizes —
          // round-7+ commits); blanket on-disk heuristic otherwise.
          if (entries.exists(_.uncompressedBytes > 0)) {
            val schema = DataType.fromJson(getTableMeta(table).schemaJson).asInstanceOf[StructType]
            val est = ResourceEstimator.estimateEntryBytes(
              spark, schema, entries, ResourceEstimator.Params())
            Compactor.suggestBucketsFromMemory(est.map(_._2).sum)
          } else if (entries.nonEmpty) {
            Compactor.suggestBuckets(entries.map(_.sizeBytes).sum)
          } else {
            // skeleton log (above the gate): size from stamped bytes
            Compactor.suggestBuckets(all.flatMap(
              _.properties.get("total_bytes").flatMap(_.toLongOption)).sum)
          }
        }
    }
    Compactor.compact(this, table, n)
  }

  /** Estimated resources to process this table — SURVEY §2 row 27, the
    * reference's compute/resource_estimation surface (see
    * [[ResourceEstimator]] for the method semantics). */
  def estimateResources(table: String,
      params: ResourceEstimator.Params = ResourceEstimator.Params()): ResourceEstimator.Estimate =
    ResourceEstimator.estimate(this, table, params)

  /** Reference write-triggered auto-compaction (impl.py:985-1091): compact
    * when pending deltas/files/records exceed the table's thresholds. */
  def maybeAutoCompact(table: String): Boolean = {
    val t = th(table)
    val meta = getTableMeta(table)
    // Maintenance-gated metadata read: below the gate this is the plain
    // fully-parsed log; above it deltas are SKELETONS (entries never
    // materialize on the driver) and every trigger runs off the
    // commit-stamped record_count / file_count properties — a trickle
    // write to a 10^7-entry table must not pay an O(entries) parse just
    // to decide "no compaction yet". Legacy deltas without file_count
    // contribute 0 to the file trigger above the gate (the delta/record
    // triggers still fire); everything this engine commits stamps it.
    val (pairs, streamed) = effectiveDeltasForMaintenance(t)
    val all = pairs.map(_._1)
    val pathOf = pairs.map { case (d, p) => d.streamPosition -> p }.toMap
    val compactedUpTo = all.filter(_.compactedUpTo >= 0).map(_.compactedUpTo).foldLeft(-1L)(math.max)
    val pending = all.filter(d => d.compactedUpTo < 0 && d.streamPosition > compactedUpTo)
    val p = meta.properties
    val maxDeltas = p.getOrElse("compaction.trigger.deltas", "100").toInt
    val maxFiles = p.getOrElse("compaction.trigger.files", "1000").toInt
    val maxRecords = p.getOrElse("compaction.trigger.records", s"${64L * 1024 * 1024}").toLong
    val hasMerges = pending.exists(d => d.typed == DeltaType.Upsert || d.typed == DeltaType.Delete)
    val levelMax = p.getOrElse("read_optimization", "MAX") == "MAX"
    val pendingRecords =
      pending.map(d => d.properties.getOrElse("record_count", "0").toLong).sum
    // Write-amplification valve: under MAX a steady trickle of tiny upserts
    // would rewrite every touched bucket on EVERY write — at 100 TB that
    // write amplification is the scale-killer, not the merge itself. Merge-
    // triggered compaction defers until compaction.min_pending_records
    // pending rows accumulate (reads stay correct via merge-on-read); the
    // delta/file/record-count triggers still apply. Default: 5% of the
    // compacted base (amortizes the full-bucket rewrite ~20x); set the
    // property to 0 for reference parity (compact on every merge write).
    val base = MergeRead.activeDeltas(all)._1
    val baseRecords =
      base.map(_.properties.getOrElse("record_count", "0").toLong).getOrElse(0L)
    val minPending = p.get("compaction.min_pending_records").map(_.toLong)
      .getOrElse(baseRecords / 20)
    def fileCountOf(d: DeltaMeta): Long =
      d.properties.get("file_count").map(_.toLong).getOrElse(d.entries.size.toLong)
    val trigger = (levelMax && hasMerges && pendingRecords >= minPending) ||
      pending.size >= maxDeltas ||
      pending.map(fileCountOf).sum >= maxFiles ||
      pendingRecords >= maxRecords
    if (trigger && pending.nonEmpty) {
      // Only APPEND-type pending bytes count as growth for layout sizing:
      // upsert bytes largely REPLACE base rows and delete bytes shrink
      // them, so counting them would over-provision a bucket count the
      // never-shrink auto path then keeps forever. Upsert-driven growth
      // (genuinely new keys) sizes at the next trigger, once it is in the
      // base the advisor measures.
      val pendingGrowthBytes = pending
        .filter(d => d.typed != DeltaType.Upsert && d.typed != DeltaType.Delete)
        .flatMap(_.properties.get("total_bytes").flatMap(_.toLongOption)).sum
      compact(table, reclusterBucketsFor(meta, base,
        base.flatMap(b => pathOf.get(b.streamPosition)), streamed, pendingGrowthBytes))
      // Property-gated log retention rides the same maintenance moment
      // (round-15): once a table declares `history.retention.millis`, the
      // delta log self-bounds — folded metafiles older than the window
      // trim right after the compaction that folded them ages out. Absent
      // property = never trim automatically (time travel keeps the full
      // history; trimHistory stays the explicit API).
      p.get("history.retention.millis").flatMap(_.toLongOption)
        .foreach { ret =>
          trimHistory(table, ret)
          // Vacuum rides EVERY retention-enabled auto cycle, not only
          // trim>0 cycles: a trim re-stamps the straggler-margin clock
          // right before it, so vacuum-on-trim-only would be gated on
          // every attempt and never reclaim anything automatically. On a
          // no-trim cycle the margin has aged out and the files go; with
          // no horizon yet vacuumCore returns immediately, and the
          // referenced-set stream is O(retained entries) — bounded by the
          // compaction work this ride-along already bought.
          vacuumTable(table)
        }
      true
    } else false
  }

  /** Advice→action (reference: compaction as table-health policy,
    * types/tables.py:652-660): when write-triggered compaction fires AND
    * the layout advisor recommends a recluster, recompact at the advised
    * bucket count instead of re-materializing the stale layout. Without
    * this, `compact(table)` keeps the base's RECORDED count forever (by
    * design — ad-hoc compaction must not silently discard copy-by-
    * reference), so a table that grew 100× kept its bootstrap-sized
    * buckets until an operator hand-plumbed a new count. Reasons are
    * gated independently: `undersized_layout` acts by DEFAULT (the table
    * outgrew the layout >2× — recompacting to more buckets restores the
    * per-task bounds the layout was sized for; the full rewrite was
    * already bought by the trigger), `skew` is OPT-IN
    * (`compaction.recluster.on_skew`) because hash-bucket skew is usually
    * a hot KEY, which more buckets may not spread — rebucketing is the
    * wrong tool there. The engine handles the hot-KEY case itself
    * (round-14): reads and compaction carve hot buckets out of the
    * storage-partitioned plan (MergeRead.hotBuckets/
    * partitionedWithCarveout) and the bucketed write slices on
    * (keys, partition values), so the opt-in stays for the residual
    * multi-key-collision shape an operator may still want rebalanced.
    * Returns 0 (= keep the recorded layout) when no advice applies.
    * Note the bucket-count
    * change invalidates copy-by-reference for that round by construction
    * — the copy-by-ref gate keys on the recorded count matching the
    * requested one — and the next compacted base records the NEW count,
    * which partitioned reads then trust. Takes the caller's already-
    * parsed base delta (maybeAutoCompact materialized the log for its
    * triggers) so the advice adds ZERO metadata reads per trigger below
    * the planning gate; above it (skeleton base, entries never resident)
    * the advice aggregates per-bucket sums by STREAMING the base
    * metafile once — O(1) memory, and only on the triggered-compaction
    * path, which is about to stream that metafile anyway. */
  private def reclusterBucketsFor(meta: TableMeta, base: Option[DeltaMeta],
      basePath: Option[Path], streamed: Boolean, pendingBytes: Long): Int = {
    val p = meta.properties
    // Tolerant boolean parse: this runs AFTER the triggering write has
    // durably committed, so a property typo ("1", "yes") must not fail
    // the caller's write — unparseable values keep the default, loudly.
    def boolProp(key: String, default: Boolean): Boolean =
      p.get(key).map(_.trim.toLowerCase) match {
        case None => default
        case Some("true") => true
        case Some("false") => false
        case Some(bad) =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"ignoring unparseable $key='$bad' on ${meta.namespace}.${meta.table} " +
              s"(want true|false); using $default")
          default
      }
    val onUndersized = boolProp("compaction.recluster.auto", default = true)
    val onSkew = boolProp("compaction.recluster.on_skew", default = false)
    if (!onUndersized && !onSkew) return 0
    val advice = for {
      b <- base
      n <- b.properties.get("num_buckets").map(_.toInt)
      a <- if (!streamed) Compactor.reclusterAdvice(b.entries, n, MergeRead.bucketOfPath)
        else basePath.flatMap(path =>
          Compactor.reclusterAdviceOf(n, MergeRead.bucketOfPath)(
            f => ManifestPlanner.foreachEntry(path, io)(f)))
    } yield a
    advice match {
      case Some(a) =>
        // Size the layout for what the triggered compaction is ABOUT to
        // fold — base plus this trigger's pending bytes — not yesterday's
        // base alone: a small bootstrap base with a big pending backlog
        // would otherwise re-materialize undersized and pay a second full
        // rewrite at the next trigger. Never shrink below the recorded
        // layout on an auto path: a skew-only recluster keeps at least
        // the current count (rebalancing at the same width).
        val target = math.max(a.suggestedBuckets,
          Compactor.suggestBuckets(a.totalBytes + math.max(0L, pendingBytes)))
        val act = (onUndersized &&
            (a.reasons.contains("undersized_layout") || target > 2 * a.numBuckets)) ||
          (onSkew && a.reasons.contains("skew"))
        if (act) math.max(target, a.numBuckets) else 0
      case _ => 0
    }
  }

  // -------------------------------------------------------------- internals
  private[catalog] def partitionSchemeOf(meta: TableMeta): PartitionScheme =
    PartitionScheme(meta.partitionKeys.map(pk => PartitionKey(pk(0), Transform.fromName(pk(1)))))

  private[catalog] def sortSchemeOf(meta: TableMeta): SortScheme =
    SortScheme(meta.sortKeys.map(sk =>
      SortKey(sk(0), sk(1).toBoolean, sk(2).toBoolean, Transform.fromName(sk(3)))))

  private def toMeta(t: TableHandle, schema: StructType, ps: PartitionScheme,
      ss: SortScheme, props: Map[String, String]): TableMeta =
    TableMeta(t.namespace, t.name, schema.json,
      ps.keys.map(k => Seq(k.field, k.transform.name)),
      ss.keys.map(k => Seq(k.field, k.ascending.toString, k.nullsFirst.toString, k.transform.name)),
      props, dropped = false)

  private def stageTableMeta(tx: Transaction, t: TableHandle, m: TableMeta): Unit = {
    val dir = metaDir(t)
    tx.stage(dir, store.nextRevision(dir, Some(tx)), "meta", Json.write(m), s"UPDATE table/$t")
  }

  private def currentMeta(t: TableHandle, asOf: Option[Long], within: Option[Transaction]): Option[TableMeta] =
    store.latestVisible(metaDir(t), asOf, within).map(c => Json.read(c._2, classOf[TableMeta]))

  private[catalog] def visibleDeltas(t: TableHandle, asOf: Option[Long],
      within: Option[Transaction]): Seq[(Long, DeltaMeta)] =
    store.visibleRevisionPaths(deltaDir(t), asOf, within).flatMap { case (rev, p) =>
      // vanished-after-listing = a concurrent trimHistory removed a folded
      // pre-watermark metafile; the active set is never trimmed, so
      // skipping is exact for every consumer of the full lineage
      try Some((rev, Json.read(new String(io.readBytes(p), "UTF-8"), classOf[DeltaMeta])))
      catch {
        case _: java.nio.file.NoSuchFileException => None // concurrent trim
        case _: java.io.FileNotFoundException => None
      }
    }

  /** Test observability: metafiles PARSED by the most recent
    * [[planningVisible]] tail walk (volatile last-write-wins, the
    * MergeRead.lastSplitRegime pattern). */
  @volatile private[graft] var lastPlanningParses: Int = 0

  /** Visible deltas sufficient to PLAN a read, parsed TAIL-FIRST — the
    * per-read lifetime-history wall (round-15): a long-lived table keeps
    * one delta metafile per write forever, and parsing ALL of them per
    * read is O(lifetime writes) file opens at exactly the table age the
    * catalog is designed for. The walk goes newest→oldest and stops once
    * nothing beneath can join the active set:
    *  - at a REPLACE marker (kept — everything beneath is dropped by
    *    replace semantics anyway);
    *  - once the newest compacted base is in hand, at the first revision
    *    ≤ its watermark (revisions ARE stream positions — commitWrite
    *    allocates pos = rev — so folded deltas sit wholly below it; an
    *    unfolded pending BELOW the base file but ABOVE the watermark, the
    *    valve shape, is still walked and kept).
    * O(pending + 1) metafile parses per read. Equivalent to
    * [[effectiveDeltas]] for planning because MergeRead.plan draws
    * entries and lineage only from the active set, which lies wholly in
    * the walked suffix; history-facing surfaces (deltaLog, downloadDelta,
    * CDC, maintenance) keep the full-lineage read. `skeletonOnly` skips
    * the entries arrays (the above-gate variant). */
  private def planningVisible(t0: TableHandle, asOf: Option[Long],
      within: Option[Transaction], skeletonOnly: Boolean): Seq[(Long, Path, DeltaMeta)] = {
    val t = resolveVersion(t0, asOf, within)
    val files = store.visibleRevisionPaths(deltaDir(t), asOf, within)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Path, DeltaMeta)]()
    var watermark = -1L
    var baseSeen = false
    var parses = 0
    val it = files.reverseIterator
    var done = false
    while (it.hasNext && !done) {
      val (rev, p) = it.next()
      if (baseSeen && rev <= watermark) done = true
      else {
        val d =
          if (skeletonOnly) ManifestPlanner.skeleton(p, io)
          else Json.read(new String(io.readBytes(p), "UTF-8"), classOf[DeltaMeta])
        parses += 1
        out += ((rev, p, d))
        if (d.properties.get("replace").contains("true")) done = true
        else if (!baseSeen && d.compactedUpTo >= 0) {
          baseSeen = true
          watermark = d.compactedUpTo
        }
      }
    }
    lastPlanningParses = parses
    // LINEAGE COMPLETION: copy-by-reference keeps base manifest entries
    // pointing at files FIRST WRITTEN by long-folded deltas, and lineage
    // keys on the path's revision (MergeRead.scanWithLineage) — the
    // referenced old deltas must ride along as entry-less skeletons
    // (pos/type/written_columns/compactedUpTo are all planning needs from
    // them). Bounded by the number of DISTINCT referenced revisions, which
    // compaction rewrites keep shrinking — never the lifetime history.
    val have = out.map(_._1).toSet
    val needed = scala.collection.mutable.Set[Long]()
    if (skeletonOnly) {
      // entries are not resident: stream each active metafile's entry
      // paths (O(1) heap) for the referenced-revision set
      val (b, pend) = MergeRead.activeDeltas(out.map(_._3).toSeq)
      val activePos = (b.toSeq ++ pend).map(_.streamPosition).toSet
      out.foreach { case (_, p, d) =>
        if (activePos.contains(d.streamPosition))
          ManifestPlanner.foreachEntry(p, io)(e =>
            MergeRead.revOfPath(e.path).filterNot(have).foreach(needed += _))
      }
    } else out.foreach { case (_, _, d) =>
      d.entries.foreach(e =>
        MergeRead.revOfPath(e.path).filterNot(have).foreach(needed += _))
    }
    if (needed.nonEmpty) {
      val byRev = files.toMap
      val extras = needed.toSeq.sorted.flatMap { rev =>
        byRev.get(rev).flatMap { p =>
          try Some((rev, p, ManifestPlanner.skeleton(p, io)))
          catch { // trimmed-although-referenced (legacy): loud at read time
            case _: java.io.FileNotFoundException => None
            case _: java.nio.file.NoSuchFileException => None
          }
        }
      }
      lastPlanningParses = parses + extras.size
      (extras ++ out).sortBy(_._1).toSeq
    } else out.reverse.toSeq
  }

  /** [[effectiveDeltas]] with the driver-metadata ceiling lifted for the
    * scan path: when the visible manifest JSON exceeds
    * `graft.manifest.distributedPlanningBytes` (default 16 MB ≈ 10^5
    * entries), delta metafiles are skeleton-parsed on the driver (entries
    * skipped — O(#deltas) heap) and entry-level pruning (footer-stats skip
    * + partition-value prune) runs as a Spark job, one task per metafile;
    * only surviving entries materialize, stats stripped. The predicates
    * mirror [[MergeRead.plan]]'s exactly, and plan re-applies them, so the
    * gate is purely a materialization strategy — same files either way.
    * Below the gate this IS [[effectiveDeltas]] (no job launch for the
    * common small-manifest read). */
  /** Size-gated skeleton planning shared by the native and DSv2 surfaces:
    * None below the gate (callers take the plain parsed path); above it,
    * the kept skeletons (post-REPLACE) and the ACTIVE (rev, metafile)
    * pairs whose entries the distributed prune may materialize. */
  private def skeletonPlan(t: TableHandle, asOf: Option[Long],
      within: Option[Transaction])
      : Option[(Seq[(Long, DeltaMeta)], Seq[(Long, String)])] = {
    val files = store.visibleRevisionPaths(deltaDir(t), asOf, within)
    // short-circuit the gate sum: a 10^6-file history must not pay 10^6
    // stat calls just to learn it is (obviously) over the 16 MB gate
    val gate = ManifestPlanner.gateBytes(spark)
    var totalBytes = 0L
    val szIt = files.iterator
    while (szIt.hasNext && totalBytes <= gate) {
      val (_, p) = szIt.next()
      totalBytes += (try io.size(p) catch { case _: Exception => 0L })
    }
    if (totalBytes <= gate) return None
    // tail-first: the planning suffix already ends at the last REPLACE
    // marker (the walk stops there), and pre-watermark skeletons never
    // parse — O(pending + 1) even at 10^6 lifetime writes
    val kept: Seq[(Long, Path, DeltaMeta)] =
      planningVisible(t, asOf, within, skeletonOnly = true)
    val (base, pending) = MergeRead.activeDeltas(kept.map(_._3))
    // Only ACTIVE deltas (latest compacted base + beyond-watermark pending)
    // contribute entries to the plan; the rest ride along as entry-less
    // lineage skeletons — plan never reads their entries.
    val activePos = (base.toSeq ++ pending).map(_.streamPosition).toSet
    val activeFiles = kept.collect {
      case (rev, p, d) if activePos.contains(d.streamPosition) => (rev, p.toString)
    }
    Some((kept.map { case (rev, _, d) => (rev, d) }, activeFiles))
  }

  private def plannedDeltas(t: TableHandle, opts: ReadOptions, schema: StructType,
      scheme: PartitionScheme, mergeKeys: Seq[String]): Seq[DeltaMeta] = {
    val (kept, activeFiles) = skeletonPlan(t, opts.asOf, opts.txn) match {
      // below the gate: same tail-first walk, entries parsed inline —
      // a compacted lifetime history costs O(pending + 1) opens, not
      // O(lifetime writes)
      case None => return planningVisible(t, opts.asOf, opts.txn,
        skeletonOnly = false).map(_._3)
      case Some(x) => x
    }
    val (_, pending) = MergeRead.activeDeltas(kept.map(_._2))
    val needMerge = opts.mergeOnRead && mergeKeys.nonEmpty &&
      pending.exists(d => d.typed == DeltaType.Upsert || d.typed == DeltaType.Delete)
    val statFilters = StatsSkip.safeFilters(
      opts.rowFilter.map(StatsSkip.translate).getOrElse(Nil), needMerge, mergeKeys)
    val segs: Seq[(String, String)] = opts.partitionValues.toSeq.flatMap(_.flatMap {
      case (field, v) =>
        scheme.keys.find(_.field == field).map(k => (s"${k.partitionColumnName}=", v))
    })
    val limitOnly = opts.limit.isDefined && statFilters.isEmpty && !needMerge &&
      opts.rowFilter.isEmpty && opts.partitionFilter.isEmpty &&
      opts.partitionValues.isEmpty && !pending.exists(_.typed == DeltaType.Delete)
    val survivors: Map[Long, Seq[ManifestEntry]] =
      if (limitOnly)
        ManifestPlanner.limitPrefixStreaming(activeFiles, opts.limit.get, io)
          .getOrElse(ManifestPlanner.materializeStreaming(activeFiles, io))
      else if (statFilters.nonEmpty || segs.nonEmpty)
        ManifestPlanner.pruneDistributed(spark, activeFiles, statFilters, schema, segs, io)
      else ManifestPlanner.materializeStreaming(activeFiles, io)
    kept.map { case (rev, d) => d.copy(entries = survivors.getOrElse(rev, Nil)) }
  }

  /** DSv2 planning hook — the SQL surface's version of [[plannedDeltas]]:
    * returns the effective delta list (entry-less SKELETONS above the size
    * gate) plus an entry provider the scan builder calls at FILTER-PUSHDOWN
    * time. Below the gate the provider serves the already-parsed entries;
    * above it, it skeleton-parses on the driver and prunes entries in a
    * Spark job against the pushed filters — so a selective SQL query over
    * a 10^6-file table materializes only surviving entries. The provider
    * may be called more than once (a re-push); each call re-derives from
    * the same visible file set, so results are stable within a plan. */
  /** Everything the DSv2 surface needs from ONE version/meta resolution —
    * the prune schema, the delta skeletons, and the entry provider all
    * derive from the same metadata read, so a concurrent schema change or
    * activation cannot make the distributed prune and the delegate scan
    * disagree. `statsSummary` serves manifest-only aggregates under the
    * gate (the stripped survivor entries can't). */
  private[graft] final case class Dsv2Plan(
      meta: TableMeta,
      /** The handle THIS resolution pinned (version included for
        * multi-version tables) — DML against the relation must target it,
        * not re-resolve the bare name at write time, or an activation
        * between scan and write lands the DML in a different version. */
      handle: TableHandle,
      deltas: Seq[DeltaMeta],
      provider: (Seq[org.apache.spark.sql.sources.Filter], Option[Int]) => Seq[ManifestEntry],
      gated: Boolean,
      statsSummary: () => ManifestPlanner.StatsSummary)

  private[graft] def dsv2Plan(table: String, asOf: Option[Long]): Dsv2Plan = {
    val (t, meta0) = resolveVersionMeta(thRaw(table), asOf, None)
    val meta = meta0.filter(!_.dropped).getOrElse(throw new TableNotFound(table))
    requireWithinRetention(t, asOf, table)
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    skeletonPlan(t, asOf, None) match {
      case None =>
        val deltas = planningVisible(t, asOf, None, skeletonOnly = false).map(_._3)
        val (base, pending) = MergeRead.activeDeltas(deltas)
        val active = base.toSeq ++ pending
        Dsv2Plan(meta, t, deltas, (_, _) => active.flatMap(_.entries), gated = false,
          () => ManifestPlanner.summarize(active.flatMap(_.entries).iterator, schema))
      case Some((kept, activeFiles)) =>
        val provider = (fs: Seq[org.apache.spark.sql.sources.Filter], limit: Option[Int]) => {
          val survivors =
            if (fs.nonEmpty)
              ManifestPlanner.pruneDistributed(spark, activeFiles, fs, schema, Nil, io)
            else limit match {
              // filterless LIMIT n: O(prefix) driver heap, like the native
              // path (DSv2 scans are read-optimized-only, so the prefix
              // rule's no-pending-delete precondition always holds here)
              case Some(n) => ManifestPlanner.limitPrefixStreaming(activeFiles, n, io)
                .getOrElse(ManifestPlanner.materializeStreaming(activeFiles, io))
              case None => ManifestPlanner.materializeStreaming(activeFiles, io)
            }
          activeFiles.flatMap { case (rev, _) => survivors.getOrElse(rev, Nil) }
        }
        Dsv2Plan(meta, t, kept.map(_._2), provider, gated = true,
          () => ManifestPlanner.summarizeDistributed(spark, activeFiles, schema, io))
    }
  }

  /** Maintenance-facing (compaction/purge) view of the effective deltas:
    * each delta paired with its metafile path, plus `streamed`. Below the
    * planning gate the deltas carry their parsed entries (status quo — no
    * second parse for small tables) and `streamed` is false. Above it the
    * deltas are entry-less SKELETONS and `streamed` is true: the caller
    * must access entries by re-streaming the metafile
    * ([[ManifestPlanner.foreachEntry]]) — per-entry, full stats preserved,
    * O(1) heap — instead of holding a 10^7-entry list on the driver. */
  private[catalog] def effectiveDeltasForMaintenance(t0: TableHandle,
      asOf: Option[Long] = None): (Seq[(DeltaMeta, Path)], Boolean) = {
    val t = resolveVersion(t0, asOf, None)
    val files = store.visibleRevisionPaths(deltaDir(t), asOf, None)
    // short-circuit like skeletonPlan: stop stat-ing once over the gate
    val gate = ManifestPlanner.gateBytes(spark)
    var totalBytes = 0L
    val szIt = files.iterator
    while (szIt.hasNext && totalBytes <= gate) {
      val (_, p) = szIt.next()
      totalBytes += (try io.size(p) catch { case _: Exception => 0L })
    }
    val streamed = totalBytes > gate
    val all: Seq[(DeltaMeta, Path)] = files.flatMap { case (_, p) =>
      // vanished-after-listing = concurrent trimHistory of a folded
      // pre-watermark metafile; the active set is never trimmed
      try Some((
        if (streamed) ManifestPlanner.skeleton(p, io)
        else Json.read(new String(io.readBytes(p), "UTF-8"), classOf[DeltaMeta]), p))
      catch {
        case e: java.io.FileNotFoundException => None
        case e: java.nio.file.NoSuchFileException => None
      }
    }
    val lastReplace = all.zipWithIndex
      .filter(_._1._1.properties.get("replace").contains("true")).map(_._2).lastOption
    (lastReplace match { case Some(i) => all.drop(i); case None => all }, streamed)
  }

  /** Visible deltas after the last REPLACE marker, ascending stream position.
    * Unpinned handles (external callers — DSv2, streaming) resolve to the
    * latest ACTIVE version here, so every read surface follows activation. */
  private[graft] def effectiveDeltas(t0: TableHandle, asOf: Option[Long],
      within: Option[Transaction] = None): Seq[DeltaMeta] = {
    val t = resolveVersion(t0, asOf, within)
    val all = visibleDeltas(t, asOf, within).map(_._2)
    val lastReplace = all.zipWithIndex
      .filter(_._1.properties.get("replace").contains("true")).map(_._2).lastOption
    lastReplace match {
      case Some(i) => all.drop(i)
      case None => all
    }
  }

  private[catalog] def addDerivedPartitionColumns(df: DataFrame, scheme: PartitionScheme): DataFrame =
    scheme.keys.foldLeft(df) { (d, k) =>
      if (!df.columns.contains(k.field)) d
      else d.withColumn(k.partitionColumnName,
        k.column(col(k.field), df.schema(k.field).dataType))
    }

  private[graft] def contentTypeOf(meta: TableMeta): ContentType =
    ContentType.fromName(meta.properties.getOrElse("content_type", "parquet"))

  /** Spark compression codec names accepted for `content_encoding`. */
  private val KnownEncodings =
    Set("gzip", "bzip2", "zstd", "lz4", "snappy", "deflate", "xz")

  /** Per-table content encoding (reference ContentEncoding,
    * types/media.py:35-54) — plumbed to the datasource `compression`
    * option at write time. Text formats (csv/json) decompress on read by
    * file extension; parquet/orc record the codec in their own metadata.
    * "identity"/absent = uncompressed (format default for parquet/orc). */
  private[graft] def contentEncodingOf(meta: TableMeta): Option[String] =
    meta.properties.get("content_encoding").filterNot(_ == "identity").map { e =>
      require(KnownEncodings(e), s"unknown content_encoding $e (one of $KnownEncodings)")
      e
    }

  /** Parquet bloom-filter index options from the `write.bloom.columns`
    * table property ("c1,c2"): split-block bloom filters in every written
    * file for those columns, so point lookups (equality/IN) skip row
    * groups the min/max range index cannot — e.g. high-cardinality ids
    * scattered uniformly (where every file's [min,max] spans everything).
    * Read-side use is automatic in Spark's parquet reader. */
  private[catalog] def bloomOptionsOf(meta: TableMeta): Map[String, String] =
    meta.properties.get("write.bloom.columns").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
      .map(c => s"parquet.bloom.filter.enabled#$c" -> "true").toMap

  /** Run a write with modern parquet timestamp output (TIMESTAMP_MICROS) —
    * delegates to the shared reentrant per-session guard (see
    * InteropUtil.withMicrosTimestamps for the concurrency rationale). */
  private[catalog] def withMicrosTimestamps[A](body: => A): A =
    graft.interop.InteropUtil.withMicrosTimestamps(spark)(body)

  /** Compressed-file suffixes Spark appends after the format extension. */
  private[catalog] val EncodingSuffixes =
    Seq(".gz", ".bz2", ".zst", ".lz4", ".snappy", ".deflate", ".xz")

  /** Per-file row count: parquet reads it from the footer (metadata-only —
    * feeds ManifestEntry.recordCount like the reference manifest,
    * manifest.py:290); other content types have no cheap count and record -1
    * (unknown). */
  private[catalog] def fileRowCount(p: Path, ct: ContentType): Long =
    if (ct == ContentType.Parquet) parquetRowCount(p, spark.sessionState.newHadoopConf()) else -1L

  private def parquetRowCount(p: Path, conf: org.apache.hadoop.conf.Configuration): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toString), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Batch per-file row counts for a commit. A serial driver loop over one
    * footer per file stalls the commit path for minutes when a compaction
    * emits tens of thousands of files, so beyond a small threshold the
    * footer reads run as a Spark job — metadata-only work spread across the
    * cluster (one ~8-byte footer field per file, no data pages touched).
    * Below the threshold the driver loop wins (no job-scheduling latency). */
  /** Batch per-file (rowCount, column min/max/null stats) from parquet
    * footers — the commit path's single metadata pass, now also feeding the
    * data-skipping index (ManifestEntry.stats). Same I/O as the old
    * count-only pass: stats live in the footer already being read. */
  private[catalog] def fileFooterInfo(paths: Seq[Path], ct: ContentType)
      : Map[Path, (Long, Long, Map[String, graft.txn.ColStat])] =
    if (ct != ContentType.Parquet) paths.map(_ -> (-1L, -1L, null: Map[String, graft.txn.ColStat])).toMap
    else if (paths.size < 16) {
      val conf = spark.sessionState.newHadoopConf()
      paths.map(p => p -> FooterStats.readFull(p.toString, conf)).toMap
    } else {
      val slices = math.min(paths.size, spark.sparkContext.defaultParallelism * 2)
      // Session Hadoop conf broadcast to executors — a bare Configuration
      // would drop spark.hadoop.* credentials/defaultFS on remote catalogs.
      val confBc = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(spark.sessionState.newHadoopConf()))
      val read = spark.sparkContext
        .parallelize(paths.map(_.toString), slices)
        .mapPartitions { it =>
          val conf = confBc.value.value
          it.map(s => (s, FooterStats.readFull(s, conf)))
        }.collect().toMap
      paths.map(p => p -> read(p.toString)).toMap
    }

  /** Manifest entries (path, size, records, stats) for every data file under
    * a just-written output dir — the single commit-path metadata pass.
    * `statCols` (from the `stats.columns` table property) restricts which
    * columns keep stats — the manifest-size valve for very wide tables
    * (stats cost ~60 bytes/column/file of manifest JSON; a 40-column
    * 100k-file table carries ~240 MB unless narrowed to the columns
    * queries actually filter on). */
  private[catalog] def manifestEntriesOf(out: Path, ct: ContentType,
      statCols: Option[Set[String]] = None): Seq[ManifestEntry] = {
    val files = listDataFiles(out, ct)
    val info = fileFooterInfo(files, ct)
    files.map { p =>
      val (n, uncompressed, stats0) = info(p)
      val stats = (Option(stats0), statCols) match {
        case (Some(st), Some(keep)) => st.filter { case (k, _) => keep(k) }
        case (Some(st), None) => st
        case _ => null
      }
      ManifestEntry(p.toString, io.size(p), n,
        if (stats == null || stats.isEmpty) null else stats, uncompressed)
    }
  }

  /** Parse the `stats.columns` property ("c1,c2" or unset = all). */
  private[catalog] def statColsOf(meta: TableMeta): Option[Set[String]] =
    meta.properties.get("stats.columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

  private[catalog] def listDataFiles(dir: Path, ct: ContentType): Seq[Path] = {
    // Text formats under a content_encoding carry a codec suffix after the
    // format extension (part-*.csv.gz) — both spellings are data files.
    def isData(n: String): Boolean =
      n.endsWith(ct.extension) ||
        EncodingSuffixes.exists(sfx => n.endsWith(ct.extension + sfx))
    val out = scala.collection.mutable.ArrayBuffer[Path]()
    io.walk(dir)(p => if (isData(p.toString) && io.isFile(p)) out += p)
    out.sortBy(_.toString).toSeq
  }

  private[graft] def handleOf(table: String): TableHandle = th(table)

  private def statFieldsOf(schema: StructType, present: Set[String]): Array[StructField] =
    schema.fields.filter(f => present(f.name)).filter(f =>
      f.dataType.isInstanceOf[NumericType] || f.dataType == StringType ||
        f.dataType == DateType || f.dataType == TimestampType ||
        f.dataType == TimestampNTZType || f.dataType == BooleanType)

  private def statAggsFor(fields: Array[StructField]): Seq[Column] =
    fields.toSeq.flatMap { f => Seq(
      min(col(f.name)).cast(StringType).as(s"min__${f.name}"),
      max(col(f.name)).cast(StringType).as(s"max__${f.name}"),
      sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"nulls__${f.name}")) }

  private def statsJsonFrom(fields: Array[StructField], obs: Observation): String =
    Json.write(fields.map { f =>
      f.name -> Map(
        "min" -> Option(obs.get(s"min__${f.name}")).map(_.toString).orNull,
        "max" -> Option(obs.get(s"max__${f.name}")).map(_.toString).orNull,
        "nulls" -> Option(obs.get(s"nulls__${f.name}")).map(_.toString).getOrElse("0"))
    }.toMap)

  private[catalog] def dataDirOf(t: TableHandle): Path = dataDir(t)
  private[catalog] def deltaDirOf(t: TableHandle): Path = deltaDir(t)

  private def inTxn(txn: Option[Transaction], msg: String)(body: Transaction => Unit): Unit = {
    inTxnRet(txn, msg) { t => body(t); () }
  }

  private def inTxnRet[A](txn: Option[Transaction], msg: String)(body: Transaction => A): A =
    txn match {
      case Some(t) => body(t)
      case None =>
        val t = store.newTransaction(msg)
        try { val r = body(t); t.seal(); r }
        catch { case e: Throwable => if (!t.isSealed) t.abort(); throw e }
    }
}

/** Hidden column names used by the merge machinery. */
object GraftCatalog {
  /** Default [[GraftCatalog.vacuumTable]] straggler margin: reclaim only
    * when the trim horizon committed at least this long ago, so a query
    * planned legally against the pre-trim window has drained before its
    * input files disappear. Override per-table (`vacuum.min.age.millis`)
    * or per-call. */
  val DefaultVacuumMinAgeMillis: Long = 30L * 60 * 1000
}

object Hidden {
  val Pos = "_g_pos"        // stream position (long)
  val EffPos = "_g_effpos"  // recency rank: compactedUpTo for folded deltas
  val Dt = "_g_dt"          // delta type (string)
  val File = "_g_file"      // source file path (for intra-delta ordering)
  val Row = "_g_row"        // row index within file
  val Present = "_g_present" // columns physically present in this delta
  val Bucket = "_g_bucket"  // compaction hash bucket (also physical layout)
  val all = Seq(Pos, EffPos, Dt, File, Row, Present, Bucket)
}
