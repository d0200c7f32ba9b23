package graft.interop

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant => JInstant, ZoneOffset}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.formats.AvroFileFormat

/**
 * Apache Hudi copy-on-write table-format binding — the `StreamFormat.HUDI`
 * foreign stream format from the reference's model (storage/model/types.py:
 * 32-38; its readers delegate to `ray.data.read_hudi` / `daft.io.read_hudi`,
 * utils/url.py:120-124, 265-269). No hudi runtime jar exists in this
 * environment, so this speaks the PUBLIC table layout directly
 * (hudi.apache.org/tech-specs, table version 6 / timeline layout 1):
 * a `.hoodie/` timeline of instant files plus base parquet files named
 * `<fileId>_<writeToken>_<instantTime>.parquet`.
 *
 * Spark-first: the active file-slice set is resolved from COMPLETED
 * timeline instants only (commit metadata JSON is the source of truth — no
 * directory walk over data), per file group the newest base file at or
 * before the requested instant wins, and file groups whose id appears in a
 * completed `replacecommit`'s `partitionToReplaceFileIds` are dead from
 * that instant on. Partition pruning filters the slice list BEFORE any
 * data file is opened. The driver only ever holds the metadata-sized
 * timeline — the same contract as the Delta binding's log replay.
 *
 * Reader supports: snapshot read, `asOfInstant` / `asOfTimestampMs` time
 * travel, partition pruning, hive-style partition-path reattachment,
 * populated-meta-field (foreign) tables — `_hoodie_*` columns are dropped
 * unless asked for. Writer supports: create/append, overwrite as a
 * `replacecommit`, hive-style partitioning, atomic completed-instant
 * publication via rename. Written tables use virtual keys
 * (`hoodie.populate.meta.fields=false`, a standard Hudi table config), so
 * data files are plain parquet; the writer records the table's Avro schema
 * in commit `extraMetadata.schema` exactly as Hudi's own writers do.
 */
object Hudi {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  private val InstantFmt =
    DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS").withZone(ZoneOffset.UTC)

  private def hoodieDir(table: String): JPath = Paths.get(table, ".hoodie")

  /** Completed instants only: `<time>.commit` / `<time>.replacecommit` /
    * `<time>.deltacommit` (merge-on-read log writes), plus the 1.x form
    * `<time>_<completionTime>.<action>`. (12-18 digit times accepted: old
    * Hudi used second granularity.) */
  private val CompletedRe =
    "^([0-9]{12,18})(?:_[0-9]{12,18})?\\.(commit|replacecommit|deltacommit)$".r

  final case class Instant(time: String, action: String, fileName: String)

  /** Completed timeline, sorted by instant time. Hudi 0.x keeps instant
    * files directly under `.hoodie/`; 1.x moves them to
    * `.hoodie/timeline/` — both are read. */
  def timeline(table: String): Seq[Instant] = {
    val dirs = Seq(hoodieDir(table), hoodieDir(table).resolve("timeline"))
      .filter(Files.isDirectory(_))
    dirs.flatMap { dir =>
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).collect {
        case n @ CompletedRe(t, action) => Instant(t, action, n)
      }.toList
      finally s.close()
    }.sortBy(_.time)
  }

  private def instantFile(table: String, i: Instant): JPath = {
    val flat = hoodieDir(table).resolve(i.fileName)
    if (Files.exists(flat)) flat else hoodieDir(table).resolve("timeline").resolve(i.fileName)
  }

  // ---------------------------------------------------------------- read

  /** One log (delta) file of a merge-on-read file slice, named
    * `.<fileId>_<baseInstant>.log.<version>_<writeToken>` (tech-specs
    * "Log File Format"). `instant` is the deltacommit that first recorded
    * it on the timeline. */
  final case class LogFile(
      partitionPath: String, fileId: String, relPath: String,
      baseInstant: String, version: Int, instant: String)

  private val LogNameRe = "^\\.(.+)_([0-9]{12,18})\\.log\\.([0-9]+)_(.+)$".r

  private[graft] def isLogPath(relPath: String): Boolean = {
    val name = relPath.split('/').last
    name.startsWith(".") && name.contains(".log.")
  }

  private def parseLogAdd(a: FileSlice): LogFile = a.relPath.split('/').last match {
    case LogNameRe(fid, base, v, _) =>
      LogFile(a.partitionPath, fid, a.relPath, base, v.toInt, a.instant)
    case other => throw new IllegalStateException(s"unparseable Hudi log file name: $other")
  }

  /** One live file slice of a file group: the newest base file (if any —
    * `relPath` is "" for a log-only group) plus its attached log files in
    * apply order. `partitionPath` is the raw relative dir ("" for
    * unpartitioned; hive-style `k=v` when our writer produced it). */
  final case class FileSlice(
      partitionPath: String, fileId: String, relPath: String, instant: String,
      logFiles: Seq[LogFile] = Nil)

  /** Resolved snapshot: live slices + what the commit metadata knows about
    * the table shape. `schema` is present when a commit recorded an Avro
    * schema (ours always do; foreign writers usually do too).
    * `completedInstants` is the instant-time set visible at the snapshot —
    * log blocks are gated on it at read (uncommitted log data is
    * invisible, exactly Hudi's reader contract). */
  final case class Snapshot(
      instant: String, slices: Seq[FileSlice],
      schema: Option[StructType], partitionFields: Seq[String],
      completedInstants: Set[String] = Set.empty)

  def snapshot(
      spark: SparkSession, table: String,
      asOfInstant: Option[String] = None,
      asOfTimestampMs: Option[Long] = None,
      /** Partition-value predicate: prunes file slices during the replay
        * itself — in the distributed branch the prune runs INSIDE the
        * replay job, so only surviving slices ever materialize on the
        * driver (the 10^7-file-table path). */
      partitionFilter: Option[Column] = None): Snapshot = {
    require(Files.isDirectory(hoodieDir(table)), s"not a Hudi table (no .hoodie): $table")
    val cutoff = asOfInstant.orElse(asOfTimestampMs.map(ms =>
      InstantFmt.format(JInstant.ofEpochMilli(ms))))
    val instants = timeline(table).filter(i => cutoff.forall(i.time <= _))
    require(instants.nonEmpty || cutoff.isEmpty || timeline(table).isEmpty,
      s"no completed instant at or before ${cutoff.get} in $table")
    val pf = partitionFields(table)
    require(partitionFilter.isEmpty || pf.nonEmpty,
      s"partitionFilter given but $table is unpartitioned — the filter would " +
        "be silently dropped; filter the read DataFrame instead")
    val schema = resolveSchema(table, instants)
    val prune = partitionFilter.map(pred => (pf, pred, schema))

    // replay: adds per (partition, fileId) keep the newest base; log adds
    // attach to their slice; replaced groups die. Driver loop for short
    // timelines, a DataFrame job above the threshold (a long-lived ingest
    // table accumulates thousands of instants — the same scaling rule as
    // the Delta log replay).
    // In-job pruning is an optimization; the local prune below is the
    // authority (idempotent on survivors). Skip the job prune when a
    // partition field name would collide with a replay-frame column.
    val jobPrune = prune.filter { case (fields, _, _) =>
      !fields.exists(Set("p", "fileId", "relPath", "instant", "_g_pv").contains) }
    val live =
      if (instants.size < DistributedReplayThreshold)
        pruneSlicesLocal(spark, replayOnDriver(table, instants), prune)
      else pruneSlicesLocal(spark, replayDistributed(spark, table, instants, jobPrune), prune)
    Snapshot(instants.lastOption.map(_.time).getOrElse(""),
      live.sortBy(s => (s.partitionPath, s.fileId)),
      schema, pf, instants.map(_.time).toSet)
  }

  /** Driver-side slice prune by partition values — one tiny local frame,
    * no data touched. */
  private def pruneSlicesLocal(spark: SparkSession, slices: Seq[FileSlice],
      prune: Option[(Seq[String], Column, Option[StructType])]): Seq[FileSlice] =
    prune match {
      case Some((pf, pred, schema)) if slices.nonEmpty && pf.nonEmpty =>
        import spark.implicits._
        val rows = slices.zipWithIndex.map { case (s, i) => (i, partValues(s.partitionPath, pf)) }
        // FAIL-OPEN typed decode (round-11, Iceberg-binding rule): try_cast
        // never throws planning off a foreign path spelling, and a non-null
        // spelling that decodes to null KEEPS the slice — an unknown
        // rendering must never prune matching rows. A genuinely-missing
        // segment stays SQL NULL through `pred`.
        val cols = pf.zipWithIndex.map { case (f, i) =>
          val c = col("_2")(i)
          schema.flatMap(sc => sc.fields.find(_.name == f)).map(sf => c.try_cast(sf.dataType))
            .getOrElse(c).as(f)
        }
        val undecodable = pf.zipWithIndex.map { case (f, i) =>
          col("_2")(i).isNotNull && col(f).isNull
        }.reduceOption(_ || _).getOrElse(lit(false))
        val kept = rows.toDF("_1", "_2").select((col("_1") +: cols): _*)
          .where(pred || undecodable)
          .select("_1").as[Int].collect().toSet
        slices.zipWithIndex.collect { case (s, i) if kept(i) => s }
      case _ => slices
    }

  /** Var only so tests can exercise the distributed branch cheaply. */
  private[graft] var DistributedReplayThreshold = 64

  /** Every add + the replaced-group set across `instants` (driver-side). */
  private def addsAndDead(
      table: String, instants: Seq[Instant]): (Seq[FileSlice], Set[(String, String)]) = {
    val adds = Seq.newBuilder[FileSlice]
    val dead = scala.collection.mutable.Set.empty[(String, String)]
    for (i <- instants) {
      val meta = readInstantMeta(table, i)
      meta.path("partitionToWriteStats").fields().asScala.foreach { e =>
        val p = e.getKey
        e.getValue.elements().asScala.foreach { st =>
          adds += FileSlice(p, st.path("fileId").asText(), st.path("path").asText(), i.time)
        }
      }
      if (i.action == "replacecommit")
        meta.path("partitionToReplaceFileIds").fields().asScala.foreach { e =>
          e.getValue.elements().asScala.foreach(fid => dead += ((e.getKey, fid.asText())))
        }
    }
    (adds.result(), dead.toSet)
  }

  private def replayOnDriver(table: String, instants: Seq[Instant]): Seq[FileSlice] = {
    val (adds, dead) = addsAndDead(table, instants)
    assembleSlices(adds.filterNot(a => dead.contains((a.partitionPath, a.fileId))))
  }

  /** Live adds → file slices. Per group: newest base file wins; log files
    * with that base's instant attach in (version, instant) order (older
    * baseInstants were compacted away); a group with only log files is a
    * log-only slice (insert into MoR before any compaction). The same log
    * path re-recorded by a later appending deltacommit dedupes to its
    * first appearance — block-level instant gating handles visibility. */
  private def assembleSlices(live: Seq[FileSlice]): Seq[FileSlice] = {
    val (logAdds, baseAdds) = live.partition(a => isLogPath(a.relPath))
    val logsByGroup = logAdds.map(parseLogAdd)
      .groupBy(l => (l.partitionPath, l.fileId))
      .view.mapValues(_.groupBy(_.relPath).values.map(_.minBy(_.instant)).toSeq).toMap
    val baseGroups = baseAdds.groupBy(s => (s.partitionPath, s.fileId))
    val withBase = baseGroups.map { case (k, vs) =>
      val b = vs.maxBy(_.instant)
      b.copy(logFiles = logsByGroup.getOrElse(k, Nil)
        .filter(_.baseInstant == b.instant)
        .sortBy(l => (l.version, l.instant, l.relPath)))
    }.toSeq
    val logOnly = (logsByGroup.keySet -- baseGroups.keySet).toSeq.map { case k @ (p, fid) =>
      val logs = logsByGroup(k).sortBy(l => (l.baseInstant, l.version, l.instant, l.relPath))
      FileSlice(p, fid, "", logs.head.instant, logs)
    }
    withBase ++ logOnly
  }

  /** Reclaim storage (Hudi's cleaner, KEEP_LATEST_FILE_VERSIONS policy):
    * per file group keep the newest `keepVersions` base files; every older
    * version — and every file of a replaced group — is deleted, distributed
    * past the usual threshold. Snapshot reads are unaffected; time travel
    * to instants whose files were cleaned is forfeited. Returns the
    * deleted-file count. */
  def clean(spark: SparkSession, table: String, keepVersions: Int = 1): Long = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val (adds, dead) = addsAndDead(table, timeline(table))
    val root = Paths.get(table).toAbsolutePath
    val doomed = adds.groupBy(s => (s.partitionPath, s.fileId)).toSeq.flatMap {
      case (k, vs) =>
        if (dead.contains(k)) vs // replaced group: every version reclaimable
        else {
          // log files live with their base version: one attached to a kept
          // base (or to a log-only group's head) survives; one whose
          // baseInstant predates every kept base was compacted away
          val (logs, bases) = vs.partition(a => isLogPath(a.relPath))
          val keptBases = bases.sortBy(_.instant).takeRight(keepVersions)
          val floor = keptBases.headOption.map(_.instant)
          bases.sortBy(_.instant).dropRight(keepVersions) ++
            logs.filter(l => floor.exists(parseLogAdd(l).baseInstant < _))
        }
    }.map(s => root.resolve(s.relPath).toString).distinct
    InteropUtil.deleteFilesDistributed(spark, doomed)
    doomed.size.toLong
  }

  /** Timeline replay as one Spark job: parse every completed instant's
    * commit metadata (multiLine — real Hudi pretty-prints), explode the
    * write stats, keep the newest add per file group, anti-join the
    * replaced set. The driver only ever holds the LIVE slice list. */
  private[graft] def replayDistributed(
      spark: SparkSession, table: String, instants: Seq[Instant],
      prune: Option[(Seq[String], Column, Option[StructType])] = None): Seq[FileSlice] = {
    val statSchema = StructType(Seq(
      StructField("fileId", StringType), StructField("path", StringType)))
    val metaSchema = StructType(Seq(
      StructField("partitionToWriteStats", MapType(StringType, ArrayType(statSchema))),
      StructField("partitionToReplaceFileIds", MapType(StringType, ArrayType(StringType)))))
    // sniff the OLDEST and NEWEST instants on the driver: an Avro-metadata
    // (1.x) timeline — or the Avro tail of an upgraded 0.x table, where the
    // head is still JSON — would otherwise parse to all-null rows and yield
    // a silently EMPTY table
    readInstantMeta(table, instants.head)
    readInstantMeta(table, instants.last)
    val paths = instants.map(i => instantFile(table, i).toString)
    val raw = spark.read.schema(metaSchema).option("multiLine", "true").json(paths: _*)
      .withColumn("_name", regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1))
      .withColumn("instant", regexp_extract(col("_name"), "^([0-9]+)", 1))
      .withColumn("action", regexp_extract(col("_name"), "\\.([a-z]+)$", 1))
    val adds = raw
      .select(col("instant"), explode(col("partitionToWriteStats")).as(Seq("p", "stats")))
      .select(col("instant"), col("p"), explode(col("stats")).as("st"))
      .select(col("p"), col("st.fileId").as("fileId"),
        col("st.path").as("relPath"), col("instant"))
    val dead = raw.where(col("action") === "replacecommit")
      .select(explode(col("partitionToReplaceFileIds")).as(Seq("p", "fids")))
      .select(col("p"), explode(col("fids")).as("fileId")).distinct()
    // Partition prune INSIDE the replay job: parse each add's partition
    // path into typed values and apply the caller's predicate, so a
    // selective read of a heavily-partitioned 10^7-file table returns
    // only surviving slices to the driver. replacecommit death still
    // applies globally (dead is unpruned — group death is partition-local
    // anyway, and `dead` rows are ids, not file entries).
    val pruneWhere: DataFrame => DataFrame = prune match {
      case Some((pf, pred, schema)) if pf.nonEmpty =>
        val pvU = udf((p: String) => partValues(p, pf))
        df => {
          val withPv = df.withColumn("_g_pv", pvU(col("p")))
          // same FAIL-OPEN decode as pruneSlicesLocal (the local pass is
          // the authority; the in-job prune must never be stricter)
          val typed = pf.zipWithIndex.foldLeft(withPv) { case (d, (f, i)) =>
            val c = col("_g_pv")(i)
            d.withColumn(f, schema.flatMap(sc => sc.fields.find(_.name == f))
              .map(sf => c.try_cast(sf.dataType)).getOrElse(c))
          }
          val undecodable = pf.zipWithIndex.map { case (f, i) =>
            col("_g_pv")(i).isNotNull && col(f).isNull
          }.reduceOption(_ || _).getOrElse(lit(false))
          typed.where(pred || undecodable).drop("_g_pv" +: pf: _*)
        }
      case _ => identity
    }
    val keptAdds = pruneWhere(adds)
    // log adds (hidden `.…log.…` names) must NOT last-wins-collapse with
    // their base file: reduce bases in the job, keep live log adds whole,
    // assemble slices from the (metadata-sized) union on the driver.
    val isLog = regexp_extract(col("relPath"), "([^/]+)$", 1).rlike("^\\..*\\.log\\.")
    val bases = keptAdds.where(!isLog).groupBy("p", "fileId")
      .agg(max_by(struct(col("relPath"), col("instant")), col("instant")).as("w"))
      .join(dead, Seq("p", "fileId"), "left_anti")
      .select(col("p"), col("fileId"), col("w.relPath"), col("w.instant"))
      .collect().toSeq
      .map(r => FileSlice(r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val logs = keptAdds.where(isLog)
      .join(dead, Seq("p", "fileId"), "left_anti")
      .select("p", "fileId", "relPath", "instant")
      .collect().toSeq
      .map(r => FileSlice(r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assembleSlices(bases ++ logs)
  }

  /** Newest recorded Avro schema, scanning backwards (it lives in every
    * commit our writer — and Hudi's — produces, so this reads one file). */
  private def resolveSchema(table: String, instants: Seq[Instant]): Option[StructType] = {
    for (i <- instants.reverseIterator) {
      val ss = readInstantMeta(table, i).path("extraMetadata").path("schema").asText("")
      if (ss.nonEmpty)
        try return Some(AvroFileFormat
          .fromAvroSchema(new org.apache.avro.Schema.Parser().parse(ss))
          .asInstanceOf[StructType])
        catch { case NonFatal(_) => return None } // foreign dialect: parquet fallback
    }
    None
  }

  private def hoodieProps(table: String): java.util.Properties = {
    val props = new java.util.Properties()
    val p = hoodieDir(table).resolve("hoodie.properties")
    if (Files.exists(p)) {
      val in = Files.newInputStream(p)
      try props.load(in) finally in.close()
    }
    props
  }

  private def csvProp(table: String, key: String): Seq[String] =
    Option(hoodieProps(table).getProperty(key)).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** `hoodie.table.partition.fields` from hoodie.properties (empty when
    * unpartitioned or foreign table omitted it). */
  def partitionFields(table: String): Seq[String] =
    csvProp(table, "hoodie.table.partition.fields")

  /** `hoodie.table.recordkey.fields` — required to merge log records onto
    * base rows in a merge-on-read table. */
  def recordKeyFields(table: String): Seq[String] =
    csvProp(table, "hoodie.table.recordkey.fields")

  def tableType(table: String): String =
    Option(hoodieProps(table).getProperty("hoodie.table.type")).getOrElse("COPY_ON_WRITE")

  /** Snapshot read of a copy-on-write table. Meta columns (`_hoodie_*`)
    * present in foreign-written base files are dropped unless
    * `keepMetaFields`. `partitionFilter` prunes file slices by their
    * hive-style partition-path values before any data file is opened. */
  def read(
      spark: SparkSession, table: String,
      asOfInstant: Option[String] = None, asOfTimestampMs: Option[Long] = None,
      partitionFilter: Option[Column] = None,
      keepMetaFields: Boolean = false,
      /** Row predicate: applied to the result AND used to skip pure
        * base-file slices via a planning-time footer-stats pass (what Hudi
        * itself does without a metadata table). Slices carrying log files
        * are never skipped — a log row may supersede a base row in either
        * direction, so only the key-merge path may judge them. */
      dataFilter: Option[Column] = None): DataFrame = {
    // pruning happens during the replay (snapshot guards the
    // filter-on-unpartitioned hazard) — the distributed branch never
    // materializes pruned-away slices on the driver
    val snap = snapshot(spark, table, asOfInstant, asOfTimestampMs, partitionFilter)
    val pf = snap.partitionFields
    val slices = snap.slices
    if (slices.isEmpty)
      return InteropUtil.emptyFrame(spark,
        snap.schema.getOrElse(StructType(Nil)))
    // merge-on-read: slices carrying log files go through the key-merge
    // path; pure base-file slices stay on the plain scan
    val (mor, plain0) = slices.partition(_.logFiles.nonEmpty)
    // data skipping for pure base slices: one footer-stats metadata pass
    val plain = dataFilter.map(graft.catalog.StatsSkip.translate)
      .filter(_.nonEmpty) match {
      case Some(filters) if plain0.nonEmpty && snap.schema.isDefined =>
        val schema = snap.schema.get
        val root = Paths.get(table).toAbsolutePath
        val withPaths = plain0.map(s => s -> root.resolve(s.relPath).toString)
        val info = InteropUtil.parquetFooterStats(spark, withPaths.map(_._2))
        withPaths.filter { case (_, p) =>
          info.get(p).forall { case (rows, st) =>
            st.isEmpty || filters.forall(f =>
              graft.catalog.StatsSkip.keep(f, schema, st, rows))
          }
        }.map(_._1)
      case _ => plain0
    }
    if (plain.isEmpty && mor.isEmpty)
      return InteropUtil.emptyFrame(spark, snap.schema.getOrElse(StructType(Nil)))
    val parts = Seq(
      Option(plain).filter(_.nonEmpty).map(ps =>
        readSlices(spark, table, ps, snap.schema, pf, keepMetaFields)),
      Option(mor).filter(_.nonEmpty).map(ms =>
        readMerged(spark, table, ms, snap.schema, pf, keepMetaFields,
          snap.completedInstants))).flatten
    val out = parts.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    dataFilter.foldLeft(out)((d, p) => d.where(p))
  }

  /** Hudi incremental query over a copy-on-write table: rows written by
    * completed commits in `(fromInstant, toInstant]` — the files those
    * instants added — with the same schema/meta-field/partition handling
    * as a snapshot read, plus a `_hoodie_commit_instant` column saying
    * which commit produced each row. `fromInstant` = "" pulls from the
    * beginning. */
  def incremental(
      spark: SparkSession, table: String,
      fromInstant: String, toInstant: Option[String] = None): DataFrame = {
    val tl = timeline(table)
    val window = tl.filter(i => i.time > fromInstant && toInstant.forall(i.time <= _))
    // replay semantics over the window: newest slice per file group, groups
    // replaced inside the window dropped — rows that no longer exist at the
    // window's end must not surface in the pull
    val assembled: Seq[FileSlice] =
      if (window.size < DistributedReplayThreshold) replayOnDriver(table, window)
      else replayDistributed(spark, table, window)
    // merge-on-read: log blocks written inside the window are pulled as
    // rows tagged with their block's commit instant; base-file adds keep
    // the existing path. Log-only slices contribute no base files.
    val windowLogs = assembled.flatMap(s =>
      s.logFiles.map(l => (s.partitionPath + "\u0000" + s.fileId, l)))
    val gidPart: Map[String, String] =
      assembled.map(s => (s.partitionPath + "\u0000" + s.fileId) -> s.partitionPath).toMap
    val logRows: Option[DataFrame] =
      logRecordsFrame(spark, table, windowLogs, window.map(_.time).toSet,
        instantWindow = Some((fromInstant, toInstant)), withInstant = true)
    val added = assembled.filter(_.relPath.nonEmpty).map(_.copy(logFiles = Nil))
    val schema = resolveSchema(table, tl)
    val pf = partitionFields(table)
    if (added.isEmpty && logRows.isEmpty)
      return InteropUtil.emptyFrame(spark,
        StructType(schema.getOrElse(StructType(Nil)).fields :+
          StructField("_hoodie_commit_instant", StringType)))
    // populated-meta-field tables (foreign CoW with upserts): a rewritten
    // base file carries EVERY row of its group — filter to rows whose own
    // _hoodie_commit_time falls in the window, or the pull over-reports the
    // carried-over rows. The commit-recorded schema normally EXCLUDES meta
    // fields, so force the column into the read schema; files that lack it
    // (virtual-key tables like ours — insert-only, file-level attribution
    // already exact) surface null and are KEPT, never dropped.
    val metaCol = "_hoodie_commit_time"
    val readSchema = schema.map { sc =>
      if (sc.fieldNames.contains(metaCol)) sc
      else StructType(sc.fields :+ StructField(metaCol, StringType))
    }
    val basePull: Option[DataFrame] = Option(added).filter(_.nonEmpty).map { bs =>
      val raw = readSlices(spark, table, bs, readSchema, pf, keepMetaFields = true,
        commitInstantOf = Some(bs.map(s => s.relPath -> s.instant).toMap))
      if (raw.columns.contains(metaCol))
        raw.where(col(metaCol).isNull ||
          (col(metaCol) > fromInstant &&
            toInstant.map(col(metaCol) <= lit(_)).getOrElse(lit(true))))
      else raw
    }
    // log-block rows: reattach partition values from their file group
    val logPull: Option[DataFrame] = logRows.map { lr =>
      import spark.implicits._
      val needPf = pf.filterNot(lr.columns.contains)
      val withPv =
        if (needPf.isEmpty) lr
        else {
          val pv = gidPart.toSeq.map { case (g, p) => (g, partValues(p, pf)) }
            .toDF("_g_gid", "_g_pv")
          needPf.foldLeft(lr.join(broadcast(pv), Seq("_g_gid"))) { case (df, f) =>
            val c = col("_g_pv")(pf.indexOf(f))
            df.withColumn(f, schema.flatMap(_.fields.find(_.name == f))
              .map(sf => c.cast(sf.dataType)).getOrElse(c))
          }.drop("_g_pv")
        }
      withPv.drop("_g_gid", "_g_seq")
    }
    val filtered = (basePull.toSeq ++ logPull.toSeq)
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    filtered.drop(filtered.columns
      .filter(c => c.startsWith("_hoodie_") && c != "_hoodie_commit_instant"): _*)
  }

  /** Shared data-file scan: read the slices, reattach partition values,
    * restore schema order, drop foreign meta columns. */
  private def readSlices(
      spark: SparkSession, table: String, slices: Seq[FileSlice],
      schema: Option[StructType], pf: Seq[String], keepMetaFields: Boolean,
      commitInstantOf: Option[Map[String, String]] = None): DataFrame = {
    val root = Paths.get(table).toAbsolutePath
    val paths = slices.map(s => root.resolve(s.relPath).toString)
    val data = schema match {
      // our writer's files omit partition columns (hive staging); a known
      // schema tells us which fields the files actually carry
      case Some(sc) =>
        val dataOnly = StructType(sc.fields.filterNot(f => pf.contains(f.name)))
        spark.read.schema(dataOnly).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }

    val needReattach = pf.filterNot(data.columns.contains)
    val out =
      if (needReattach.isEmpty && commitInstantOf.isEmpty) data
      else {
        // rejoin partition values (and the producing instant) from the
        // slice list via broadcast, keyed on the decoded file path (the
        // _metadata column is URI-encoded)
        import spark.implicits._
                val pv = slices.map { s =>
          val byField = pf.zip(partValues(s.partitionPath, pf)).toMap
          (root.resolve(s.relPath).toString, needReattach.map(byField),
            commitInstantOf.map(_(s.relPath)).orNull)
        }.toDF("_g_path", "_g_pv", "_g_instant")
        val joined = data.withColumn("_g_path", InteropUtil.decodePathColumn(col("_metadata.file_path")))
          .join(broadcast(pv), Seq("_g_path"))
        val withPv = needReattach.zipWithIndex.foldLeft(joined) { case (df, (f, i)) =>
          val c = col("_g_pv")(i)
          df.withColumn(f, schema.flatMap(_.fields.find(_.name == f))
            .map(sf => c.cast(sf.dataType)).getOrElse(c))
        }
        (if (commitInstantOf.nonEmpty)
          withPv.withColumn("_hoodie_commit_instant", col("_g_instant"))
        else withPv).drop("_g_path", "_g_pv", "_g_instant")
      }
    val extra = if (commitInstantOf.nonEmpty) Seq("_hoodie_commit_instant") else Nil
    val ordered = schema match {
      case Some(sc) => out.select(
        (sc.fieldNames.filter(out.columns.contains) ++ extra).map(col): _*)
      case None => out
    }
    if (keepMetaFields) ordered
    else ordered.drop(ordered.columns
      .filter(c => c.startsWith("_hoodie_") && !extra.contains(c)): _*)
  }

  /** Partition values for `fields`, aligned positionally: hive-style
    * `k=v` segments resolve by name (unescaped); a non-hive layout maps
    * path segments to fields BY POSITION when the counts line up
    * (`2026/08` -> year=2026, month=08) and yields nulls otherwise — never
    * the same segment for every field. */
  private[graft] def partValues(partitionPath: String, fields: Seq[String]): Seq[String] = {
    if (partitionPath.isEmpty) return fields.map(_ => null)
    val segs = partitionPath.split('/')
    if (segs.exists(_.contains('='))) fields.map { f =>
      segs.collectFirst {
        case seg if seg.startsWith(f + "=") =>
          val v = seg.drop(f.length + 1)
          if (v == "__HIVE_DEFAULT_PARTITION__") null else InteropUtil.unescapeHive(v)
      }.orNull
    }
    else if (segs.length == fields.length) segs.toSeq
    else fields.map(_ => null)
  }

  // ------------------------------------------- merge-on-read log format
  //
  // HoodieLogFormat version 1 (hudi.apache.org/tech-specs "Log File
  // Format"): a log file is a sequence of blocks, each
  //   #HUDI# | blockLen(8) | formatVersion(4) | blockType(4)
  //   | headers | contentLen(8) | content | footers | totalLen(8)
  // where headers/footers serialize as count(4) then per entry
  // ordinal(4) + utf8Len(4) + utf8 bytes.

  private val LogMagic: Array[Byte] = "#HUDI#".getBytes(StandardCharsets.US_ASCII)
  // HoodieLogBlockType ordinals
  private val CommandBlock = 0
  private val DeleteBlock = 1
  private val CorruptBlock = 2
  private val AvroDataBlock = 3
  private val ParquetDataBlock = 5
  // HeaderMetadataType ordinals
  private val HInstantTime = 0
  private val HTargetInstant = 1
  private val HSchema = 2
  private val HCommandType = 3

  private[graft] final case class LogBlock(
      blockType: Int, headers: Map[Int, String], content: Array[Byte])

  private def readLogMeta(in: java.io.DataInputStream): Map[Int, String] = {
    val n = in.readInt()
    (0 until n).map { _ =>
      val k = in.readInt()
      val bytes = new Array[Byte](in.readInt())
      in.readFully(bytes)
      k -> new String(bytes, StandardCharsets.UTF_8)
    }.toMap
  }

  private def writeLogMeta(out: java.io.DataOutputStream, m: Map[Int, String]): Unit = {
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      out.writeInt(k)
      val bytes = v.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
    }
  }

  /** Scan every block of one log file, applying rollback command blocks
    * (a COMMAND block whose COMMAND_BLOCK_TYPE is ROLLBACK invalidates the
    * earlier blocks of the SAME file carrying its TARGET_INSTANT_TIME —
    * Hudi's failed-write recovery). Corrupt-marked blocks are skipped. */
  private[graft] def scanLogBlocks(path: JPath): Seq[LogBlock] = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(Files.newInputStream(path)))
    val out = scala.collection.mutable.ArrayBuffer.empty[LogBlock]
    try {
      val magic = new Array[Byte](LogMagic.length)
      var eof = false
      while (!eof) {
        val first = in.read()
        if (first < 0) eof = true
        else {
          magic(0) = first.toByte
          in.readFully(magic, 1, magic.length - 1)
          require(java.util.Arrays.equals(magic, LogMagic),
            s"bad log block magic in $path — corrupt or unsupported log format")
          in.readLong() // block length (forward pointer)
          val ver = in.readInt()
          require(ver <= 1, s"unsupported HoodieLogFormat version $ver in $path")
          val btype = in.readInt()
          val headers = readLogMeta(in)
          val contentLen = in.readLong()
          require(contentLen >= 0 && contentLen <= Int.MaxValue, s"log block content length $contentLen")
          val content = new Array[Byte](contentLen.toInt)
          in.readFully(content)
          readLogMeta(in) // footers
          in.readLong() // total block length (reverse pointer)
          if (btype == CommandBlock && headers.get(HCommandType).forall(_ == "0"))
            headers.get(HTargetInstant).foreach { target =>
              out.filterInPlace(b => !b.headers.get(HInstantTime).contains(target))
            }
          else if (btype != CorruptBlock) out += LogBlock(btype, headers, content)
        }
      }
      out.toSeq
    } finally in.close()
  }

  /** Frame one log block in the v1 on-disk layout. */
  private[graft] def frameLogBlock(
      blockType: Int, headers: Map[Int, String], content: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val hb = { val b = new java.io.ByteArrayOutputStream(); val d = new java.io.DataOutputStream(b)
      writeLogMeta(d, headers); d.flush(); b.toByteArray }
    val fb = { val b = new java.io.ByteArrayOutputStream(); val d = new java.io.DataOutputStream(b)
      writeLogMeta(d, Map.empty); d.flush(); b.toByteArray }
    // blockLen excludes magic + its own field; totalLen (reverse pointer)
    // covers everything written before it including magic — both per the
    // reference implementation's accounting
    val blockLen = 4L + 4L + hb.length + 8L + content.length + fb.length + 8L
    out.write(LogMagic)
    out.writeLong(blockLen)
    out.writeInt(1)
    out.writeInt(blockType)
    out.write(hb)
    out.writeLong(content.length.toLong)
    out.write(content)
    out.write(fb)
    out.writeLong(LogMagic.length + 8L + blockLen - 8L)
    out.flush()
    bos.toByteArray
  }

  /** Extracted data block, materialized to a standalone scratch file the
    * executors can re-read with the native parquet/avro readers. */
  private final case class BlockMeta(
      gid: String, fmt: String, path: String, instant: String,
      version: Int, idx: Int, avroSchema: String)

  /** Scratch dir for extracted log-block contents. On a multi-executor
    * cluster this MUST point at shared storage
    * (`graft.interop.hudi.scratchDir`); the default JVM temp dir is
    * correct for local mode. */
  private def scratchRoot(spark: SparkSession): String =
    spark.conf.getOption("graft.interop.hudi.scratchDir")
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** Distributed block extraction: one task per log file scans its blocks,
    * gates them on the COMPLETED instant set (uncommitted log data is
    * invisible — Hudi's reader contract), and spills each data block's
    * content to a scratch file (parquet as-is; avro binary records
    * re-encoded as a container file). Only block METADATA returns to the
    * driver; row bytes never do. */
  private def extractLogBlocks(
      spark: SparkSession, table: String,
      logs: Seq[(String, LogFile)], completed: Set[String],
      instantWindow: Option[(String, Option[String])] = None): Seq[BlockMeta] = {
    if (logs.isEmpty) return Nil
    val root = Paths.get(table).toAbsolutePath
    val scratch = Files.createTempDirectory(
      Paths.get(scratchRoot(spark)), "graft_hudi_logs_").toString
    val completedB = spark.sparkContext.broadcast(completed)
    val tasks = logs.map { case (gid, l) =>
      (gid, root.resolve(l.relPath).toString, l.version)
    }
    val metas = spark.sparkContext
      .parallelize(tasks, math.min(tasks.size, spark.sparkContext.defaultParallelism * 2))
      .flatMap { case (gid, absPath, version) =>
        scanLogBlocks(Paths.get(absPath)).zipWithIndex.flatMap { case (b, idx) =>
          val instant = b.headers.getOrElse(HInstantTime, "")
          val visible = completedB.value.contains(instant) &&
            instantWindow.forall { case (from, to) =>
              instant > from && to.forall(instant <= _) }
          if (!visible) None
          else b.blockType match {
            case ParquetDataBlock =>
              val out = Paths.get(scratch, java.util.UUID.randomUUID().toString + ".parquet")
              Files.write(out, b.content)
              Some(BlockMeta(gid, "parquet", out.toString, instant, version, idx, null))
            case AvroDataBlock =>
              val schemaStr = b.headers.getOrElse(HSchema,
                throw new IllegalStateException(s"avro data block without SCHEMA header in $absPath"))
              val out = Paths.get(scratch, java.util.UUID.randomUUID().toString + ".avro")
              rewriteAvroBlock(b.content, schemaStr, out)
              Some(BlockMeta(gid, "avro", out.toString, instant, version, idx, schemaStr))
            case DeleteBlock =>
              // decode the avro delete-record list and spill it as a flat
              // avro container (recordKey, partitionPath) — downstream it
              // reads like any other log part, rows never visit the driver
              val recs = decodeDeleteContent(b.content)
              val out = Paths.get(scratch, java.util.UUID.randomUUID().toString + ".avro")
              writeFlatDeleteFile(recs, out)
              Some(BlockMeta(gid, "delete", out.toString, instant, version, idx, null))
            case other =>
              throw new UnsupportedOperationException(s"Hudi log block type $other in $absPath")
          }
        }
      }.collect().toSeq
    // apply order: commit instant, then log version, then position in file
    metas.sortBy(m => (m.instant, m.version, m.idx))
  }

  /** Avro data block content — formatVersion(4) + recordCount(4) then per
    * record len(4) + avro-binary bytes — re-encoded as a container file
    * readable by the Graft AvroFileFormat. */
  private def rewriteAvroBlock(content: Array[Byte], schemaStr: String, out: JPath): Unit = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.DecoderFactory
    import org.apache.avro.file.DataFileWriter
    val schema = new Schema.Parser().parse(schemaStr)
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(content))
    in.readInt() // block content format version
    val n = in.readInt()
    val reader = new GenericDatumReader[GenericRecord](schema)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out.toFile)
    try (0 until n).foreach { _ =>
      val bytes = new Array[Byte](in.readInt())
      in.readFully(bytes)
      w.append(reader.read(null, DecoderFactory.get().binaryDecoder(bytes, null)))
    } finally w.close()
  }

  // ----------------------------------------------- delete block content
  //
  // HoodieLogBlockType.DELETE_BLOCK content (tech-specs "Log File Format"):
  //   contentVersion(4) | dataLen(4) | payload
  // Content-format version 3 encodes the payload as the avro binary
  // serialization of HoodieDeleteRecordList (one nested HoodieDeleteRecord
  // — recordKey, partitionPath, orderingVal — per deleted key; schema per
  // hudi-common's published HoodieDeleteRecordList.avsc). Versions 1-2
  // were JVM-kryo-serialized HoodieKey[]/HoodieDeleteRecord[] — a
  // writer-internal wire format this binding intentionally does not speak.
  private val DeleteContentVersion = 3
  private lazy val deleteRecordListSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse("""{
      "type":"record","name":"HoodieDeleteRecordList",
      "namespace":"org.apache.hudi.avro.model","fields":[
        {"name":"deleteRecordList","type":{"type":"array","items":{
          "type":"record","name":"HoodieDeleteRecord","fields":[
            {"name":"recordKey","type":["null","string"],"default":null},
            {"name":"partitionPath","type":["null","string"],"default":null},
            {"name":"orderingVal","type":
              ["null","boolean","int","long","float","double","bytes","string"],
              "default":null}]}}}]}""")

  /** Encode (recordKey, partitionPath) pairs as DELETE_BLOCK v3 content —
    * the shape a real Hudi writer emits. orderingVal is written null
    * (COMMIT_TIME_ORDERING; the merge below orders by block apply order). */
  private[graft] def encodeDeleteContent(recs: Seq[(String, String)]): Array[Byte] = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.EncoderFactory
    val itemSchema = deleteRecordListSchema.getField("deleteRecordList")
      .schema().getElementType
    val list = new java.util.ArrayList[GenericRecord](recs.size)
    recs.foreach { case (rk, pp) =>
      val r = new GenericData.Record(itemSchema)
      r.put("recordKey", rk)
      r.put("partitionPath", pp)
      list.add(r)
    }
    val rec = new GenericData.Record(deleteRecordListSchema)
    rec.put("deleteRecordList", list)
    val payload = {
      val bos = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      new GenericDatumWriter[GenericRecord](deleteRecordListSchema).write(rec, enc)
      enc.flush()
      bos.toByteArray
    }
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(DeleteContentVersion)
    out.writeInt(payload.length)
    out.write(payload)
    out.flush()
    bos.toByteArray
  }

  /** Flat (recordKey, partitionPath) avro container — the scratch shape a
    * decoded delete block spills to for the distributed read. */
  private val flatDeleteSchema: StructType = StructType(Seq(
    StructField("recordKey", StringType), StructField("partitionPath", StringType)))

  private def writeFlatDeleteFile(recs: Seq[(String, String)], out: JPath): Unit = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val schema = AvroFileFormat.toAvroSchema(flatDeleteSchema, "hoodie_delete_record")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out.toFile)
    try recs.foreach { case (rk, pp) =>
      val r = new GenericData.Record(schema)
      r.put("recordKey", rk)
      r.put("partitionPath", pp)
      w.append(r)
    } finally w.close()
  }

  /** Decode DELETE_BLOCK content to (recordKey, partitionPath) pairs.
    * Kryo-era content versions (1-2) fail with a clear message. */
  private[graft] def decodeDeleteContent(content: Array[Byte]): Seq[(String, String)] = {
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import org.apache.avro.io.DecoderFactory
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(content))
    val ver = in.readInt()
    if (ver < DeleteContentVersion)
      throw new UnsupportedOperationException(
        s"Hudi DELETE_BLOCK content version $ver is kryo-serialized (writer-internal); " +
          "only the avro HoodieDeleteRecordList encoding (version 3) is supported")
    if (ver > DeleteContentVersion)
      // refuse loudly rather than mis-parse an unknown future encoding as
      // v3 avro (garbage keys would tombstone the wrong rows)
      throw new UnsupportedOperationException(
        s"Hudi DELETE_BLOCK content version $ver is newer than the supported version " +
          s"$DeleteContentVersion — refusing to guess its payload encoding")
    val payload = new Array[Byte](in.readInt())
    in.readFully(payload)
    val rec = new GenericDatumReader[GenericRecord](deleteRecordListSchema)
      .read(null, DecoderFactory.get().binaryDecoder(payload, null))
    rec.get("deleteRecordList").asInstanceOf[java.util.List[GenericRecord]].asScala.toSeq
      .map(r => (Option(r.get("recordKey")).map(_.toString).orNull,
        Option(r.get("partitionPath")).map(_.toString).orNull))
  }

  /** Log rows of the given (gid, LogFile) pairs as one DataFrame with
    * `_g_gid` (file group) and `_g_seq` (global apply order) attached —
    * the merge input. None when every block is gated out. */
  private def logRecordsFrame(
      spark: SparkSession, table: String, logs: Seq[(String, LogFile)],
      completed: Set[String],
      instantWindow: Option[(String, Option[String])] = None,
      withInstant: Boolean = false): Option[DataFrame] = {
    val metas = extractLogBlocks(spark, table, logs, completed, instantWindow)
    if (metas.isEmpty) return None
    import spark.implicits._
    val seqOf = metas.zipWithIndex.map { case (m, i) => (m.path, (m.gid, i.toLong, m.instant)) }
    val tag = seqOf.map { case (p, (g, s, i)) => (p, g, s, i) }
      .toDF("_g_bpath", "_g_gid", "_g_seq", "_g_binstant")
    def attach(df: DataFrame): DataFrame = {
      val t = df.withColumn("_g_bpath", InteropUtil.decodePathColumn(col("_metadata.file_path")))
        .join(broadcast(tag), Seq("_g_bpath")).drop("_g_bpath")
      if (withInstant) t.withColumn("_hoodie_commit_instant", col("_g_binstant")).drop("_g_binstant")
      else t.drop("_g_binstant")
    }
    val parts = Seq(
      Option(metas.filter(_.fmt == "parquet")).filter(_.nonEmpty).map { ms =>
        attach(spark.read.option("mergeSchema", "true").parquet(ms.map(_.path): _*))
      },
      Option(metas.filter(_.fmt == "avro")).filter(_.nonEmpty).map { ms =>
        val st = AvroFileFormat.fromAvroSchema(
          new org.apache.avro.Schema.Parser().parse(ms.last.avroSchema))
          .asInstanceOf[StructType]
        attach(spark.read.format(classOf[AvroFileFormat].getName)
          .schema(st).load(ms.map(_.path): _*))
      },
      // DELETE_BLOCK rows: synthesize the table's record-key columns from
      // the serialized recordKey string and flag them `_hoodie_is_deleted`
      // — from there they ride the same latest-wins merge as soft-delete
      // data rows. Composite keys use Hudi's "f1:v1,f2:v2" key-generator
      // encoding with __null__/__empty__ sentinels.
      Option(metas.filter(_.fmt == "delete")).filter(_.nonEmpty).map { ms =>
        val keys = recordKeyFields(table)
        require(keys.nonEmpty,
          s"$table carries DELETE_BLOCKs but no hoodie.table.recordkey.fields")
        val tblSchema = resolveSchema(table, timeline(table))
        def typed(f: String, c: Column): Column =
          tblSchema.flatMap(_.fields.find(_.name == f))
            .map(sf => c.cast(sf.dataType)).getOrElse(c)
        val raw = attach(spark.read.format(classOf[AvroFileFormat].getName)
          .schema(flatDeleteSchema).load(ms.map(_.path): _*))
        val keyed =
          if (keys.size == 1)
            raw.withColumn(keys.head, typed(keys.head, col("recordKey")))
          else {
            // field-anchored parse, NOT a blind split: every segment is
            // anchored on its known "field:" prefix, so a ',' or ':'
            // INSIDE a value parses correctly (a value containing the
            // literal ",nextField:" anchor remains ambiguous — greedy
            // match resolves it deterministically; Hudi itself never
            // re-parses these strings, it compares them whole)
            val pat = "(?s)^" + keys.map(k =>
              java.util.regex.Pattern.quote(k + ":") + "(.*)").mkString(",") + "$"
            keys.zipWithIndex.foldLeft(raw) { case (df, (f, i)) =>
              val v0 = regexp_extract(col("recordKey"), pat, i + 1)
              val v = when(v0 === "__null__", lit(null).cast(StringType))
                .when(v0 === "__empty__", lit("")).otherwise(v0)
              df.withColumn(f, typed(f, v))
            }
          }
        keyed.withColumn("_hoodie_is_deleted", lit(true))
          .drop("recordKey", "partitionPath")
      }).flatten
    parts.reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Merge-on-read snapshot read of the log-bearing slices: per file group
    * and record key, the latest log record wins over the base row; a log
    * record flagged `_hoodie_is_deleted` tombstones it. One shuffle on
    * (group, key) for the log window + one key-partitioned anti-join for
    * the base — no row ever visits the driver. */
  private def readMerged(
      spark: SparkSession, table: String, slices: Seq[FileSlice],
      schema: Option[StructType], pf: Seq[String], keepMetaFields: Boolean,
      completed: Set[String], keepGid: Boolean = false): DataFrame = {
    val keys = recordKeyFields(table)
    require(keys.nonEmpty,
      s"$table has log files but no hoodie.table.recordkey.fields — cannot merge")
    val root = Paths.get(table).toAbsolutePath
    def gidOf(s: FileSlice) = s.partitionPath + "\u0000" + s.fileId

    val logDF = logRecordsFrame(spark, table,
      slices.flatMap(s => s.logFiles.map(l => (gidOf(s), l))), completed)

    val withBase = slices.filter(_.relPath.nonEmpty)
    val baseDF: Option[DataFrame] = Option(withBase).filter(_.nonEmpty).map { bs =>
      import spark.implicits._
      val dataOnly = schema.map(sc => StructType(sc.fields.filterNot(f => pf.contains(f.name))))
      val raw = dataOnly match {
        case Some(sc) => spark.read.schema(sc).parquet(bs.map(b => root.resolve(b.relPath).toString): _*)
        case None => spark.read.parquet(bs.map(b => root.resolve(b.relPath).toString): _*)
      }
      val tag = bs.map(b => (root.resolve(b.relPath).toString, gidOf(b))).toDF("_g_bpath", "_g_gid")
            raw.withColumn("_g_bpath", InteropUtil.decodePathColumn(col("_metadata.file_path")))
        .join(broadcast(tag), Seq("_g_bpath")).drop("_g_bpath")
    }

    val delFlag = "_hoodie_is_deleted"
    val merged = (logDF, baseDF) match {
      case (None, None) => return InteropUtil.emptyFrame(spark, schema.getOrElse(StructType(Nil)))
      case (None, Some(b)) => b
      case (Some(l), b) =>
        import org.apache.spark.sql.expressions.Window
        val keyCols = ("_g_gid" +: keys).map(col)
        val latest = l
          .withColumn("_g_rn", row_number().over(
            Window.partitionBy(keyCols: _*).orderBy(col("_g_seq").desc)))
          .where(col("_g_rn") === 1).drop("_g_rn", "_g_seq")
        val live =
          if (latest.columns.contains(delFlag))
            latest.where(!coalesce(col(delFlag), lit(false)))
          else latest
        b match {
          case None => live
          case Some(base) =>
            // null-safe keys: Hudi's composite-key __null__ sentinel means a
            // null key part still identifies a record, so the base anti-join
            // must match it (<=> keeps this an equi-join — hash, not NLJ)
            val keySel = latest.select(keyCols: _*)
            val cond = ("_g_gid" +: keys).map(k => base(k) <=> keySel(k)).reduce(_ && _)
            base.join(keySel, cond, "left_anti")
              .unionByName(live, allowMissingColumns = true)
        }
    }
    // reattach partition values (by group) for fields the rows don't carry
    val needPf = pf.filterNot(merged.columns.contains)
    val withPv =
      if (needPf.isEmpty) merged
      else {
        import spark.implicits._
        val pv = slices.map(s => (gidOf(s), partValues(s.partitionPath, pf))).toDF("_g_gid", "_g_pv")
        val joined = merged.join(broadcast(pv), Seq("_g_gid"))
        needPf.zipWithIndex.foldLeft(joined) { case (df, (f, _)) =>
          val c = col("_g_pv")(pf.indexOf(f))
          df.withColumn(f, schema.flatMap(_.fields.find(_.name == f))
            .map(sf => c.cast(sf.dataType)).getOrElse(c))
        }.drop("_g_pv")
      }
    val clean =
      if (keepGid) withPv.drop("_g_seq")
      else withPv.drop("_g_gid", "_g_seq")
    val ordered = schema match {
      case Some(sc) =>
        val extras = clean.columns.filterNot(sc.fieldNames.contains)
        clean.select((sc.fieldNames.filter(clean.columns.contains) ++ extras).map(col): _*)
      case None => clean
    }
    if (keepMetaFields) ordered
    else ordered.drop(ordered.columns.filter(_.startsWith("_hoodie_")): _*)
  }

  // --------------------------------------------------------------- write

  /** Append or overwrite `df` as one commit; creates the table on first
    * write. Overwrite publishes a `replacecommit` that replaces every live
    * file group (Hudi's INSERT_OVERWRITE_TABLE). Returns the completed
    * instant time. Single-writer optimistic: completing an instant is an
    * atomic no-replace rename, so a concurrent committer of the same
    * instant surfaces as a conflict, never a torn timeline. */
  def write(
      df: DataFrame, table: String, mode: String = "append",
      partitionBy: Seq[String] = Nil,
      tableType: String = "COPY_ON_WRITE",
      recordKeyFields: Seq[String] = Nil): String = {
    require(Seq("append", "overwrite", "errorifexists").contains(mode), s"mode: $mode")
    require(Seq("COPY_ON_WRITE", "MERGE_ON_READ").contains(tableType), s"tableType: $tableType")
    val spark = df.sparkSession
    val isCreate = !Files.isDirectory(hoodieDir(table))
    require(isCreate || mode != "errorifexists", s"Hudi table exists: $table")
    // one timeline replay serves both the schema gate and the replaced set
    val existing: Option[Snapshot] =
      if (isCreate) { createTable(table, partitionBy, tableType, recordKeyFields); None }
      else {
        val pf = partitionFields(table)
        require(pf == partitionBy,
          s"partitionBy $partitionBy != table partitioning $pf")
        Some(snapshot(spark, table))
      }
    // COMPATIBLE schema evolution instead of a shape gate (Hudi's own
    // writers evolve via the commit-recorded avro schema): new nullable
    // columns, int→long / float→double / decimal-precision widening,
    // required→optional. The merged schema rides this commit's
    // extraMetadata and becomes the read schema; old base files project
    // through it by name with null-padded columns and upcast reads.
    // Overwrite REPLACES the table, so its schema replaces too.
    val tableSchema: StructType = existing.flatMap(_.schema) match {
      case Some(ts) if mode != "overwrite" =>
        def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType.sql)).sortBy(_._1).toSeq
        if (shape(df.schema) == shape(ts)) ts else mergeSchemas(ts, df.schema)
      case _ => df.schema
    }
    val aligned = df.select(tableSchema.fields.map { f =>
      (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
    val replaced: Map[String, Seq[String]] =
      if (mode == "overwrite")
        existing.map(_.slices.groupBy(_.partitionPath)
          .map { case (p, ss) => p -> ss.map(_.fileId).distinct.sorted })
          .getOrElse(Map.empty)
      else Map.empty
    // MoR writers record base-file inserts under deltacommits (Hudi's own
    // convention); replace stays a replacecommit on both table types
    val action =
      if (replaced.nonEmpty) "replacecommit"
      else if (this.tableType(table) == "MERGE_ON_READ") "deltacommit"
      else "commit"

    val instant = newInstant(table)
    transitionFile(table, instant, action, "requested")
    transitionFile(table, instant, action, "inflight")

    // stage hive-style, then move into place under hudi base-file names
    val root = Paths.get(table).toAbsolutePath
    val staging = Files.createTempDirectory(root.getParent, "_hudi_staging_")
    val written: Seq[FileSlice] = try {
      InteropUtil.withMicrosTimestamps(aligned.sparkSession) {
        val w = aligned.write.mode("overwrite")
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
          .parquet(staging.toString)
      }
      moveAsBaseFiles(staging, root, instant)
    } finally InteropUtil.deleteRecursively(staging)
    written.map(_.partitionPath).distinct.foreach(writePartitionMetadata(root, _, instant))

    val sizes = written.map { s =>
      s.relPath -> Files.size(root.resolve(s.relPath))
    }.toMap
    val counts = InteropUtil.parquetRowCounts(spark,
      written.map(s => root.resolve(s.relPath).toString))

    val meta = mapper.createObjectNode()
    val ptws = mapper.createObjectNode()
    written.groupBy(_.partitionPath).foreach { case (p, ss) =>
      val arr = mapper.createArrayNode()
      ss.foreach { s =>
        val st = mapper.createObjectNode()
        st.put("fileId", s.fileId)
        st.put("path", s.relPath)
        st.put("prevCommit", "null")
        val n = counts.getOrElse(root.resolve(s.relPath).toString, 0L)
        st.put("numWrites", n)
        st.put("numInserts", n)
        st.put("numDeletes", 0L)
        st.put("numUpdateWrites", 0L)
        st.put("totalWriteBytes", sizes(s.relPath))
        st.put("fileSizeInBytes", sizes(s.relPath))
        st.put("partitionPath", p)
        arr.add(st)
      }
      ptws.set[JsonNode](p, arr)
    }
    meta.set[JsonNode]("partitionToWriteStats", ptws)
    if (replaced.nonEmpty) {
      val ptr = mapper.createObjectNode()
      replaced.foreach { case (p, fids) =>
        val arr = mapper.createArrayNode(); fids.foreach(arr.add); ptr.set[JsonNode](p, arr)
      }
      meta.set[JsonNode]("partitionToReplaceFileIds", ptr)
    }
    meta.put("compacted", false)
    meta.put("operationType", if (replaced.nonEmpty) "INSERT_OVERWRITE_TABLE" else "INSERT")
    val extra = mapper.createObjectNode()
    extra.put("schema", AvroFileFormat.toAvroSchema(tableSchema, "hoodie_record").toString)
    meta.set[JsonNode]("extraMetadata", extra)

    completeInstant(table, instant, action, mapper.writeValueAsString(meta))
    instant
  }

  /** Merged append schema (the spec-legal promotions shared with the
    * Iceberg binding): kept fields widen int→long / float→double /
    * decimal-precision and relax required→optional; incoming-only fields
    * append as nullable; anything else refuses before data is staged. */
  private def mergeSchemas(table: StructType, incoming: StructType): StructType = {
    def widen(from: DataType, to: DataType): Boolean = (from, to) match {
      case (a, b) if a == b => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (d1: DecimalType, d2: DecimalType) => d1.scale == d2.scale && d2.precision >= d1.precision
      case _ => false
    }
    val kept = table.fields.map { tf =>
      incoming.fields.find(_.name == tf.name) match {
        case Some(inF) =>
          val t =
            if (tf.dataType == inF.dataType) tf.dataType
            else if (widen(tf.dataType, inF.dataType)) inF.dataType
            else if (widen(inF.dataType, tf.dataType)) tf.dataType
            else throw new IllegalArgumentException(
              s"incompatible type change for ${tf.name}: ${tf.dataType.sql} -> ${inF.dataType.sql}")
          StructField(tf.name, t, tf.nullable || inF.nullable)
        case None =>
          require(tf.nullable, s"append would leave required column ${tf.name} unwritten")
          tf
      }
    }
    val added = incoming.fields.filterNot(f => table.fieldNames.contains(f.name)).map { f =>
      require(f.nullable, s"new column ${f.name} must be nullable (add-column evolution)")
      f
    }
    StructType(kept ++ added)
  }

  /** Merge-on-read upsert: route each row to the file group owning its
    * record key (the index lookup Hudi's bloom/simple index performs — here
    * a key-column scan of base files + live log blocks), then append one
    * parquet data block per target group as a NEW log file version,
    * published atomically by a single deltacommit. Keys the table has never
    * seen are inserts and go to a fresh log-only file group in their
    * partition. Deletes travel as rows with `_hoodie_is_deleted = true`
    * (the public soft-delete convention; foreign writers' DELETE_BLOCKs
    * are understood on read — see [[decodeDeleteContent]]). Row bytes
    * stay in executors end-to-end: Spark stages one parquet file per
    * target group, and a distributed framing pass wraps each into its log
    * block in place. Returns the completed instant time. */
  /** Distributed key → file-group index over base files + live log blocks
    * (Hudi GLOBAL_SIMPLE-index semantics): the (keys…, _g_gid) pairs of
    * every live record. A key-column-only parquet scan — no data columns
    * cross an exchange; None when the table is empty. */
  private def keyGroupIndex(spark: SparkSession, table: String,
      snap: Snapshot, keys: Seq[String]): Option[DataFrame] = {
    import spark.implicits._
    val root = Paths.get(table).toAbsolutePath
    def gidOf(s: FileSlice) = s.partitionPath + "\u0000" + s.fileId
    val baseIdx = Option(snap.slices.filter(_.relPath.nonEmpty)).filter(_.nonEmpty).map { bs =>
      val keyStruct = snap.schema
        .map(sc => StructType(sc.fields.filter(f => keys.contains(f.name))))
        .getOrElse(StructType(Nil))
      val raw =
        if (keyStruct.nonEmpty)
          spark.read.schema(keyStruct).parquet(bs.map(b => root.resolve(b.relPath).toString): _*)
        else spark.read.parquet(bs.map(b => root.resolve(b.relPath).toString): _*).select(keys.map(col): _*)
      val tag = bs.map(b => (root.resolve(b.relPath).toString, gidOf(b))).toDF("_g_bpath", "_g_gid")
      raw.withColumn("_g_bpath", InteropUtil.decodePathColumn(col("_metadata.file_path")))
        .join(broadcast(tag), Seq("_g_bpath"))
        .select((keys.map(col) :+ col("_g_gid")): _*)
    }
    val logIdx = logRecordsFrame(spark, table,
      snap.slices.flatMap(s => s.logFiles.map(l => (gidOf(s), l))), snap.completedInstants)
      .map(_.select((keys.map(col) :+ col("_g_gid")): _*))
    (baseIdx.toSeq ++ logIdx.toSeq).reduceOption(_ unionByName _).map(_.distinct())
  }

  /** Append a REAL `DELETE_BLOCK` (content v3, avro HoodieDeleteRecordList)
    * carrying `keyDf`'s record keys, one new log file per affected file
    * group, published by a single deltacommit — the byte shape a foreign
    * Hudi writer's delete produces, exercised by interop tests against the
    * read path above. Graft's own distributed delete convention remains
    * [[upsertLog]]'s `_hoodie_is_deleted` data rows; here the per-group key
    * lists route distributed but frame driver-side (a delete batch is a
    * key list — metadata-sized). Returns the completed instant. */
  private[graft] def deleteByKeyBlock(keyDf: DataFrame, table: String): String = {
    val spark = keyDf.sparkSession
    require(tableType(table) == "MERGE_ON_READ",
      s"deleteByKeyBlock targets MERGE_ON_READ tables; $table is ${tableType(table)}")
    val keys = recordKeyFields(table)
    require(keys.nonEmpty, s"$table has no hoodie.table.recordkey.fields")
    val snap = snapshot(spark, table)
    val root = Paths.get(table).toAbsolutePath
    import spark.implicits._
    val idx = keyGroupIndex(spark, table, snap, keys)
      .getOrElse(throw new IllegalStateException(s"$table is empty — nothing to delete"))
    // Hudi key-generator string form: simple = raw value; composite =
    // "f1:v1,f2:v2" with __null__/__empty__ sentinels.
    val recKeyCol: Column =
      if (keys.size == 1) col(keys.head).cast(StringType)
      else concat_ws(",", keys.map { f =>
        val v = col(f).cast(StringType)
        concat(lit(f + ":"),
          when(v.isNull, "__null__").when(v === "", "__empty__").otherwise(v))
      }: _*)
    val wanted = keyDf.select(keys.map(col): _*).distinct()
    val semiCond = keys.map(k => idx(k) <=> wanted(k)).reduce(_ && _) // null-safe: __null__ parts
    val routed: Map[String, Seq[String]] = idx
      .join(broadcast(wanted), semiCond, "left_semi")
      .select(col("_g_gid"), recKeyCol.as("_g_rk")).distinct()
      .as[(String, String)].collect().toSeq.groupMap(_._1)(_._2)
    require(routed.nonEmpty, s"no existing keys matched — nothing to delete in $table")

    val sliceByGid = snap.slices.map(s => (s.partitionPath + "\u0000" + s.fileId) -> s).toMap
    val instant = newInstant(table)
    transitionFile(table, instant, "deltacommit", "requested")
    transitionFile(table, instant, "deltacommit", "inflight")
    val written: Seq[(FileSlice, String, Long, Int, Long)] = // (slice, rel, bytes, ver, deletes)
      routed.toSeq.sortBy(_._1).map { case (gid, rks) =>
        val s = sliceByGid(gid)
        val ver = s.logFiles.map(_.version).maxOption.getOrElse(0) + 1
        val baseInstant = if (s.relPath.nonEmpty) s.instant else s.logFiles.head.baseInstant
        val logName = s".${s.fileId}_$baseInstant.log.${ver}_0-0-0"
        val rel = if (s.partitionPath.isEmpty) logName else s"${s.partitionPath}/$logName"
        val block = frameLogBlock(DeleteBlock, Map(HInstantTime -> instant),
          encodeDeleteContent(rks.sorted.map(rk => (rk, s.partitionPath))))
        val dest = root.resolve(rel)
        Files.createDirectories(dest.getParent)
        Files.write(dest, block)
        (s, rel, block.length.toLong, ver, rks.size.toLong)
      }
    written.map(_._1.partitionPath).distinct.foreach(writePartitionMetadata(root, _, instant))
    val meta = mapper.createObjectNode()
    val ptws = mapper.createObjectNode()
    written.groupBy(_._1.partitionPath).foreach { case (p, ws) =>
      val arr = mapper.createArrayNode()
      ws.foreach { case (s, rel, bytes, ver, dels) =>
        val st = mapper.createObjectNode()
        st.put("fileId", s.fileId)
        st.put("path", rel)
        st.put("prevCommit", if (s.relPath.nonEmpty) s.instant else s.logFiles.head.baseInstant)
        st.put("numWrites", dels)
        st.put("numUpdateWrites", 0L)
        st.put("numDeletes", dels)
        st.put("totalWriteBytes", bytes)
        st.put("fileSizeInBytes", bytes)
        st.put("logVersion", ver)
        st.put("partitionPath", p)
        arr.add(st)
      }
      ptws.set[JsonNode](p, arr)
    }
    meta.set[JsonNode]("partitionToWriteStats", ptws)
    meta.put("compacted", false)
    meta.put("operationType", "DELETE")
    snap.schema.foreach { ts =>
      val extra = mapper.createObjectNode()
      extra.put("schema", AvroFileFormat.toAvroSchema(ts, "hoodie_record").toString)
      meta.set[JsonNode]("extraMetadata", extra)
    }
    completeInstant(table, instant, "deltacommit", mapper.writeValueAsString(meta))
    instant
  }

  def upsertLog(df: DataFrame, table: String): String = {
    val spark = df.sparkSession
    require(tableType(table) == "MERGE_ON_READ",
      s"upsertLog targets MERGE_ON_READ tables; $table is ${tableType(table)}")
    val keys = recordKeyFields(table)
    require(keys.nonEmpty, s"$table has no hoodie.table.recordkey.fields")
    val pf = partitionFields(table)
    val snap = snapshot(spark, table)
    val root = Paths.get(table).toAbsolutePath
    def gidOf(s: FileSlice) = s.partitionPath + "\u0000" + s.fileId
    import spark.implicits._

    // ---- key → file-group index (metadata flows to driver only via the
    // final routed-target DISTINCT, which is bounded by group count)
    val keyIdx: Option[DataFrame] = keyGroupIndex(spark, table, snap, keys)

    // ---- routing: existing key → its group; new key → per-partition group
    val escapeU = udf((s: String) =>
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(s))
    val partExpr =
      if (pf.isEmpty) lit("")
      else concat_ws("/", pf.map(f => concat(lit(f + "="), escapeU(col(f).cast(StringType)))): _*)
    // Hudi GLOBAL_SIMPLE-index semantics: the index is a key-column scan of
    // the whole table. Keep it shuffle-free at scale — semi-filter the scan
    // by the (broadcast) incoming key set first, so the metadata-sized
    // survivor set broadcasts into the routing join and the 100 TB table's
    // key stream never crosses an exchange for a small upsert batch.
    val routed = keyIdx.map { ix =>
      // null-safe key equality end-to-end: Hudi's composite-key __null__
      // sentinel means a null key part still identifies a record, so
      // routing must send it to its existing group, not a fresh one
      val wanted = df.select(keys.map(col): _*).distinct()
      val semiCond = keys.map(k => ix(k) <=> wanted(k)).reduce(_ && _)
      val needed = ix.join(broadcast(wanted), semiCond, "left_semi")
      val joinCond = keys.map(k => df(k) <=> needed(k)).reduce(_ && _)
      keys.foldLeft(df.join(broadcast(needed), joinCond, "left"))((d, k) => d.drop(needed(k)))
    }
      .getOrElse(df.withColumn("_g_gid", lit(null).cast(StringType)))
      .withColumn("_g_part", partExpr)
      .withColumn("_g_route", coalesce(col("_g_gid"), concat(lit("NEW "), col("_g_part"))))

    val instant = newInstant(table)
    transitionFile(table, instant, "deltacommit", "requested")
    transitionFile(table, instant, "deltacommit", "inflight")

    /** One target log file: route key, staging token, partition path,
      * fileId, base-file name instant, log version. A fresh (insert)
      * group's log names itself after the creating deltacommit. */
    final case class Target(route: String, tok: String, part: String,
        fileId: String, baseInstant: String, version: Int) {
      def logName: String = s".${fileId}_$baseInstant.log.${version}_0-0-0"
      def logRel: String = if (part.isEmpty) logName else s"$part/$logName"
    }
    val targets: Seq[Target] = {
      val routes = routed.select("_g_route", "_g_part").distinct()
        .as[(String, String)].collect().toSeq.sortBy(_._1)
      val sliceByGid = snap.slices.map(s => gidOf(s) -> s).toMap
      routes.zipWithIndex.map { case ((route, part), i) =>
        sliceByGid.get(route) match {
          case Some(s) =>
            val ver = s.logFiles.map(_.version).maxOption.getOrElse(0) + 1
            val base = if (s.relPath.nonEmpty) s.instant else s.logFiles.head.baseInstant
            Target(route, s"g$i", s.partitionPath, s.fileId, base, ver)
          case None =>
            Target(route, s"g$i", part, java.util.UUID.randomUUID().toString, instant, 1)
        }
      }
    }
    val tokOf = targets.map(t => t.route -> t.tok).toMap

    // ---- stage one parquet file per target group (partition columns are
    // not stored in blocks — they reattach from the slice path at read)
    val staging = Files.createTempDirectory(root.getParent, "_hudi_log_staging_")
    val written: Seq[(Target, String, Long, Long)] = try { // (target, relPath, bytes, rows)
      val tokU = udf((route: String) => tokOf(route))
      val dataCols = df.columns.filterNot(pf.contains).map(col)
      InteropUtil.withMicrosTimestamps(df.sparkSession) {
        routed.withColumn("_g_tok", tokU(col("_g_route")))
          .select(dataCols :+ col("_g_tok"): _*)
          .repartition(col("_g_tok"))
          .write.mode("overwrite").partitionBy("_g_tok").parquet(staging.toString)
      }
      val stagedOf: Map[String, JPath] = {
        val s = Files.walk(staging)
        try s.iterator().asScala.filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(p => p.getParent.getFileName.toString.stripPrefix("_g_tok=") -> p).toMap
        finally s.close()
      }
      val work = targets.flatMap(t => stagedOf.get(t.tok).map(p => (t, p.toString)))
      val rowsOf = InteropUtil.parquetRowCounts(spark, work.map(_._2))
      val schemaStr = AvroFileFormat.toAvroSchema(
        StructType(df.schema.fields.filterNot(f => pf.contains(f.name))), "hoodie_record").toString
      // distributed framing: each task wraps its staged file into a framed
      // log block and writes the final log file (visibility still gated on
      // the deltacommit publication below — orphans are invisible)
      val rootStr = root.toString
      val framed = spark.sparkContext
        .parallelize(work.map { case (t, p) => (t.logRel, p) },
          math.max(1, math.min(work.size, spark.sparkContext.defaultParallelism)))
        .map { case (logRel, stagedPath) =>
          val content = Files.readAllBytes(Paths.get(stagedPath))
          val block = frameLogBlock(ParquetDataBlock,
            Map(HInstantTime -> instant, HSchema -> schemaStr), content)
          val dest = Paths.get(rootStr).resolve(logRel)
          Files.createDirectories(dest.getParent)
          Files.write(dest, block)
          logRel -> block.length.toLong
        }.collect().toMap
      work.map { case (t, p) => (t, t.logRel, framed(t.logRel), rowsOf.getOrElse(p, 0L)) }
    } finally InteropUtil.deleteRecursively(staging)
    written.map(_._1.part).distinct.foreach(writePartitionMetadata(root, _, instant))

    // ---- publish: one deltacommit recording every log file
    val meta = mapper.createObjectNode()
    val ptws = mapper.createObjectNode()
    written.groupBy(_._1.part).foreach { case (p, ws) =>
      val arr = mapper.createArrayNode()
      ws.foreach { case (t, rel, bytes, rows) =>
        val st = mapper.createObjectNode()
        st.put("fileId", t.fileId)
        st.put("path", rel)
        st.put("prevCommit", t.baseInstant)
        st.put("numWrites", rows)
        st.put("numUpdateWrites", rows)
        st.put("numDeletes", 0L)
        st.put("totalWriteBytes", bytes)
        st.put("fileSizeInBytes", bytes)
        st.put("logVersion", t.version)
        st.put("partitionPath", p)
        arr.add(st)
      }
      ptws.set[JsonNode](p, arr)
    }
    meta.set[JsonNode]("partitionToWriteStats", ptws)
    meta.put("compacted", false)
    meta.put("operationType", "UPSERT")
    val extra = mapper.createObjectNode()
    val tableSchema = snap.schema.getOrElse(
      StructType(df.schema.fields.filterNot(_.name == "_hoodie_is_deleted")))
    extra.put("schema", AvroFileFormat.toAvroSchema(tableSchema, "hoodie_record").toString)
    meta.set[JsonNode]("extraMetadata", extra)
    completeInstant(table, instant, "deltacommit", mapper.writeValueAsString(meta))
    instant
  }

  /** Hudi compaction (the MoR table service): fold every log-bearing file
    * slice into a fresh base file at a new instant, completed as a `commit`
    * action per the timeline spec. Log-free slices carry through untouched
    * — replay then attaches nothing to the new bases, so the folded log
    * files fall out of the read path and `clean()` can reclaim them.
    * The merge runs as one distributed job (same plan as a snapshot read)
    * and one staged write partitioned by file group; a group whose rows
    * were all tombstoned still gets an (empty) base file, or its old slice
    * would resurrect on replay. Returns the instant, or None if there was
    * nothing to compact. */
  def compact(spark: SparkSession, table: String): Option[String] = {
    require(tableType(table) == "MERGE_ON_READ",
      s"compact targets MERGE_ON_READ tables; $table is ${tableType(table)}")
    val snap = snapshot(spark, table)
    val mor = snap.slices.filter(_.logFiles.nonEmpty)
    if (mor.isEmpty) return None
    val pf = partitionFields(table)
    val root = Paths.get(table).toAbsolutePath
    def gidOf(s: FileSlice) = s.partitionPath + "\u0000" + s.fileId

    val instant = newInstant(table)
    transitionFile(table, instant, "commit", "requested")
    transitionFile(table, instant, "commit", "inflight")

    val merged = readMerged(spark, table, mor, snap.schema, pf,
      keepMetaFields = false, snap.completedInstants, keepGid = true)
    val dataCols = merged.columns.filterNot(c => pf.contains(c) || c == "_g_gid")
    val toks: Map[String, String] = mor.zipWithIndex.map { case (s, i) => gidOf(s) -> s"g$i" }.toMap
    val sliceByTok: Map[String, FileSlice] = mor.zipWithIndex.map { case (s, i) => s"g$i" -> s }.toMap

    val staging = Files.createTempDirectory(root.getParent, "_hudi_compact_staging_")
    val written: Seq[(FileSlice, String, Long)] = try { // (slice, newRelPath, bytes)
      val tokU = udf((gid: String) => toks(gid))
      InteropUtil.withMicrosTimestamps(merged.sparkSession) {
        merged.withColumn("_g_tok", tokU(col("_g_gid")))
          .select((dataCols :+ "_g_tok").map(col): _*)
          .repartition(col("_g_tok"))
          .write.mode("overwrite").partitionBy("_g_tok").parquet(staging.toString)
      }
      val stagedOf: Map[String, JPath] = {
        val s = Files.walk(staging)
        try s.iterator().asScala.filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(p => p.getParent.getFileName.toString.stripPrefix("_g_tok=") -> p).toMap
        finally s.close()
      }
      // all-tombstoned groups produced no staged file — they need an empty
      // base or the pre-compaction slice resurrects on replay
      val missing = toks.values.toSeq.filterNot(stagedOf.contains)
      val emptyStaged: Map[String, JPath] =
        if (missing.isEmpty) Map.empty
        else {
          val schemaOnly = StructType(merged.schema.fields
            .filter(f => dataCols.contains(f.name)))
          val eDir = staging.resolve("_empty")
          InteropUtil.emptyFrame(spark, schemaOnly).repartition(1)
            .write.mode("overwrite").parquet(eDir.toString)
          val ef = { val s = Files.walk(eDir)
            try s.iterator().asScala.find(p => Files.isRegularFile(p) &&
              p.getFileName.toString.endsWith(".parquet")).get
            finally s.close() }
          missing.map(_ -> ef).toMap
        }
      (stagedOf ++ emptyStaged).toSeq.map { case (tok, staged) =>
        val s = sliceByTok(tok)
        val newName = s"${s.fileId}_0-0-0_$instant.parquet"
        val newRel = if (s.partitionPath.isEmpty) newName else s"${s.partitionPath}/$newName"
        val dest = root.resolve(newRel)
        Files.createDirectories(dest.getParent)
        Files.copy(staged, dest) // copy, not move: empty file may serve many groups
        (s, newRel, Files.size(dest))
      }
    } finally InteropUtil.deleteRecursively(staging)

    val counts = InteropUtil.parquetRowCounts(spark, written.map(w => root.resolve(w._2).toString))
    val meta = mapper.createObjectNode()
    val ptws = mapper.createObjectNode()
    written.groupBy(_._1.partitionPath).foreach { case (p, ws) =>
      val arr = mapper.createArrayNode()
      ws.foreach { case (s, rel, bytes) =>
        val st = mapper.createObjectNode()
        st.put("fileId", s.fileId)
        st.put("path", rel)
        st.put("prevCommit", s.instant)
        val n = counts.getOrElse(root.resolve(rel).toString, 0L)
        st.put("numWrites", n)
        st.put("numInserts", 0L)
        st.put("numDeletes", 0L)
        st.put("numUpdateWrites", n)
        st.put("totalWriteBytes", bytes)
        st.put("fileSizeInBytes", bytes)
        st.put("partitionPath", p)
        arr.add(st)
      }
      ptws.set[JsonNode](p, arr)
    }
    meta.set[JsonNode]("partitionToWriteStats", ptws)
    meta.put("compacted", true)
    meta.put("operationType", "COMPACT")
    snap.schema.foreach { sc =>
      val extra = mapper.createObjectNode()
      extra.put("schema", AvroFileFormat.toAvroSchema(sc, "hoodie_record").toString)
      meta.set[JsonNode]("extraMetadata", extra)
    }
    completeInstant(table, instant, "commit", mapper.writeValueAsString(meta))
    Some(instant)
  }

  private def createTable(
      table: String, partitionBy: Seq[String],
      tableType: String = "COPY_ON_WRITE", recordKeyFields: Seq[String] = Nil): Unit = {
    require(tableType != "MERGE_ON_READ" || recordKeyFields.nonEmpty,
      "a MERGE_ON_READ table needs recordKeyFields — log records merge by key")
    val dir = hoodieDir(table)
    Files.createDirectories(dir)
    val props =
      s"""#Properties saved on ${java.time.ZonedDateTime.now(ZoneOffset.UTC)}
         |hoodie.table.name=${Paths.get(table).getFileName}
         |hoodie.table.type=$tableType
         |hoodie.table.version=6
         |hoodie.timeline.layout.version=1
         |hoodie.datasource.write.hive_style_partitioning=true
         |hoodie.populate.meta.fields=false
         |hoodie.datasource.write.drop.partition.columns=true
         |${if (recordKeyFields.nonEmpty) s"hoodie.table.recordkey.fields=${recordKeyFields.mkString(",")}" else ""}
         |${if (partitionBy.nonEmpty) s"hoodie.table.partition.fields=${partitionBy.mkString(",")}" else ""}
         |""".stripMargin.linesIterator.filter(_.nonEmpty).mkString("\n") + "\n"
    Files.write(dir.resolve("hoodie.properties"), props.getBytes(StandardCharsets.UTF_8))
  }

  /** Fresh instant time, strictly greater than anything on the timeline
    * (including pending instants — two writes in one millisecond must not
    * collide). */
  private def newInstant(table: String): String = {
    val dir = hoodieDir(table)
    val existing: Set[String] =
      Seq(dir, dir.resolve("timeline")).filter(Files.isDirectory(_)).flatMap { d =>
        val s = Files.list(d)
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.headOption.exists(_.isDigit)).map(_.takeWhile(_.isDigit)).toList
        finally s.close()
      }.toSet
    var ms = System.currentTimeMillis()
    var cand = InstantFmt.format(JInstant.ofEpochMilli(ms))
    while (existing.exists(_ >= cand)) { ms += 1; cand = InstantFmt.format(JInstant.ofEpochMilli(ms)) }
    cand
  }

  /** Timeline state files. Hudi quirk: a `commit`'s inflight marker is
    * `<t>.inflight` (no action infix); every other action uses
    * `<t>.<action>.inflight`. */
  private def transitionFile(table: String, instant: String, action: String, state: String): Unit = {
    val name =
      if (state == "inflight" && action == "commit") s"$instant.inflight"
      else s"$instant.$action.$state"
    Files.write(hoodieDir(table).resolve(name), Array.emptyByteArray)
  }

  private def completeInstant(
      table: String, instant: String, action: String, json: String): Unit = {
    val dir = hoodieDir(table)
    val tmp = Files.createTempFile(dir, s".$instant", ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, dir.resolve(s"$instant.$action"),
      StandardCopyOption.ATOMIC_MOVE)
    catch { case e: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp)
      throw new IllegalStateException(
        s"concurrent Hudi commit at instant $instant on $table", e)
    }
  }

  private def readInstantMeta(table: String, i: Instant): JsonNode = {
    val p = instantFile(table, i)
    val bytes = Files.readAllBytes(p)
    if (bytes.isEmpty) mapper.createObjectNode()
    else {
      // 1.x tables MAY serialize completed commit metadata as Avro; that is
      // not readable here — fail loudly rather than return an empty table
      val first = bytes.iterator.map(_.toChar).find(!_.isWhitespace)
      require(first.contains('{'),
        s"commit metadata in $p is not JSON (Hudi 1.x Avro timeline?) — unsupported")
      mapper.readTree(bytes)
    }
  }

  /** Move staged spark part files under the table root via the shared
    * staging rules, then rename each to the Hudi base-file convention
    * `<fileId>_<writeToken>_<instant>.parquet` with a fresh file-group id
    * per file. */
  private def moveAsBaseFiles(
      staging: JPath, root: JPath, instant: String): Seq[FileSlice] =
    InteropUtil.moveStagedParquet(staging, root).map { case (rel, _) =>
      val relDir = rel.split('/').dropRight(1).mkString("/")
      val fileId = java.util.UUID.randomUUID().toString
      val newName = s"${fileId}_0-0-0_$instant.parquet"
      val newRel = if (relDir.isEmpty) newName else s"$relDir/$newName"
      Files.move(root.resolve(rel), root.resolve(newRel))
      FileSlice(relDir, fileId, newRel, instant)
    }

  private def writePartitionMetadata(root: JPath, partitionPath: String, instant: String): Unit = {
    if (partitionPath.isEmpty) return
    val marker = root.resolve(partitionPath).resolve(".hoodie_partition_metadata")
    if (Files.exists(marker)) return
    val depth = partitionPath.split('/').length
    val body =
      s"""#partition metadata
         |#${java.time.ZonedDateTime.now(ZoneOffset.UTC)}
         |commitTime=$instant
         |partitionDepth=$depth
         |""".stripMargin
    Files.write(marker, body.getBytes(StandardCharsets.UTF_8))
  }
}
