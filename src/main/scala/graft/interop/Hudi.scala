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

  /** Completed instants only: `<time>.commit` / `<time>.replacecommit`,
    * plus the 1.x form `<time>_<completionTime>.<action>`. (12-18 digit
    * times accepted: old Hudi used second granularity.) */
  private val CompletedRe =
    "^([0-9]{12,18})(?:_[0-9]{12,18})?\\.(commit|replacecommit)$".r

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

  /** One live base file of a file group. `partitionPath` is the raw
    * relative dir ("" for unpartitioned; hive-style `k=v` when our writer
    * produced it). */
  final case class FileSlice(
      partitionPath: String, fileId: String, relPath: String, instant: String)

  /** Resolved snapshot: live slices + what the commit metadata knows about
    * the table shape. `schema` is present when a commit recorded an Avro
    * schema (ours always do; foreign writers usually do too). */
  final case class Snapshot(
      instant: String, slices: Seq[FileSlice],
      schema: Option[StructType], partitionFields: Seq[String])

  def snapshot(
      spark: SparkSession, table: String,
      asOfInstant: Option[String] = None,
      asOfTimestampMs: Option[Long] = None): Snapshot = {
    require(Files.isDirectory(hoodieDir(table)), s"not a Hudi table (no .hoodie): $table")
    val cutoff = asOfInstant.orElse(asOfTimestampMs.map(ms =>
      InstantFmt.format(JInstant.ofEpochMilli(ms))))
    val instants = timeline(table).filter(i => cutoff.forall(i.time <= _))
    require(instants.nonEmpty || cutoff.isEmpty || timeline(table).isEmpty,
      s"no completed instant at or before ${cutoff.get} in $table")

    // replay: adds per (partition, fileId) keep the newest; replaced groups
    // die. Driver loop for short timelines, a DataFrame job above the
    // threshold (a long-lived ingest table accumulates thousands of
    // instants — the same scaling rule as the Delta log replay).
    val live =
      if (instants.size < DistributedReplayThreshold) replayOnDriver(table, instants)
      else replayDistributed(spark, table, instants)
    Snapshot(instants.lastOption.map(_.time).getOrElse(""),
      live.sortBy(s => (s.partitionPath, s.fileId)),
      resolveSchema(table, instants), partitionFields(table))
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
    adds
      .groupBy(s => (s.partitionPath, s.fileId))
      .filterNot { case (k, _) => dead.contains(k) }
      .values.map(_.maxBy(_.instant)).toSeq
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
        else vs.sortBy(_.instant).dropRight(keepVersions)
    }.map(s => root.resolve(s.relPath).toString).distinct
    InteropUtil.deleteFilesDistributed(spark, doomed)
    doomed.size.toLong
  }

  /** Timeline replay as one Spark job: parse every completed instant's
    * commit metadata (multiLine — real Hudi pretty-prints), explode the
    * write stats, keep the newest add per file group, anti-join the
    * replaced set. The driver only ever holds the LIVE slice list. */
  private def replayDistributed(
      spark: SparkSession, table: String, instants: Seq[Instant]): Seq[FileSlice] = {
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
    adds.groupBy("p", "fileId")
      .agg(max_by(struct(col("relPath"), col("instant")), col("instant")).as("w"))
      .join(dead, Seq("p", "fileId"), "left_anti")
      .select(col("p"), col("fileId"), col("w.relPath"), col("w.instant"))
      .collect().toSeq
      .map(r => FileSlice(r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
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

  /** `hoodie.table.partition.fields` from hoodie.properties (empty when
    * unpartitioned or foreign table omitted it). */
  def partitionFields(table: String): Seq[String] = {
    val p = hoodieDir(table).resolve("hoodie.properties")
    if (!Files.exists(p)) return Nil
    val props = new java.util.Properties()
    val in = Files.newInputStream(p)
    try props.load(in) finally in.close()
    Option(props.getProperty("hoodie.table.partition.fields")).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
  }

  /** Snapshot read of a copy-on-write table. Meta columns (`_hoodie_*`)
    * present in foreign-written base files are dropped unless
    * `keepMetaFields`. `partitionFilter` prunes file slices by their
    * hive-style partition-path values before any data file is opened. */
  def read(
      spark: SparkSession, table: String,
      asOfInstant: Option[String] = None, asOfTimestampMs: Option[Long] = None,
      partitionFilter: Option[Column] = None,
      keepMetaFields: Boolean = false): DataFrame = {
    val snap = snapshot(spark, table, asOfInstant, asOfTimestampMs)
    val pf = snap.partitionFields
    require(partitionFilter.isEmpty || pf.nonEmpty,
      s"partitionFilter given but $table is unpartitioned — the filter would " +
        "be silently dropped; filter the returned DataFrame instead")

    val slices = partitionFilter match {
      case Some(pred) if snap.slices.nonEmpty =>
        // evaluate once per slice on a tiny local frame; no data touched
        import spark.implicits._
        val rows = snap.slices.map(s => (s.relPath, partValues(s.partitionPath, pf)))
        val cols = pf.zipWithIndex.map { case (f, i) =>
          val c = col("_2")(i)
          snap.schema.flatMap(sc => sc.fields.find(_.name == f)).map(sf => c.cast(sf.dataType))
            .getOrElse(c).as(f)
        }
        val kept = rows.toDF("_1", "_2").select((col("_1") +: cols): _*).where(pred)
          .select("_1").as[String].collect().toSet
        snap.slices.filter(s => kept.contains(s.relPath))
      case _ => snap.slices
    }
    if (slices.isEmpty)
      return InteropUtil.emptyFrame(spark,
        snap.schema.getOrElse(StructType(Nil)))
    readSlices(spark, table, slices, snap.schema, pf, keepMetaFields)
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
    val added: Seq[FileSlice] =
      if (window.size < DistributedReplayThreshold) replayOnDriver(table, window)
      else replayDistributed(spark, table, window)
    val schema = resolveSchema(table, tl)
    val pf = partitionFields(table)
    if (added.isEmpty)
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
    val raw = readSlices(spark, table, added, readSchema, pf, keepMetaFields = true,
      commitInstantOf = Some(added.map(s => s.relPath -> s.instant).toMap))
    val filtered =
      if (raw.columns.contains(metaCol))
        raw.where(col(metaCol).isNull ||
          (col(metaCol) > fromInstant &&
            toInstant.map(col(metaCol) <= lit(_)).getOrElse(lit(true))))
      else raw
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
        val decode = udf(InteropUtil.decodeRelPath _)
        val pv = slices.map { s =>
          val byField = pf.zip(partValues(s.partitionPath, pf)).toMap
          (root.resolve(s.relPath).toString, needReattach.map(byField),
            commitInstantOf.map(_(s.relPath)).orNull)
        }.toDF("_g_path", "_g_pv", "_g_instant")
        val joined = data.withColumn("_g_path", decode(col("_metadata.file_path")))
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

  // --------------------------------------------------------------- write

  /** Append or overwrite `df` as one commit; creates the table on first
    * write. Overwrite publishes a `replacecommit` that replaces every live
    * file group (Hudi's INSERT_OVERWRITE_TABLE). Returns the completed
    * instant time. Single-writer optimistic: completing an instant is an
    * atomic no-replace rename, so a concurrent committer of the same
    * instant surfaces as a conflict, never a torn timeline. */
  def write(
      df: DataFrame, table: String, mode: String = "append",
      partitionBy: Seq[String] = Nil): String = {
    require(Seq("append", "overwrite", "errorifexists").contains(mode), s"mode: $mode")
    val spark = df.sparkSession
    val isCreate = !Files.isDirectory(hoodieDir(table))
    require(isCreate || mode != "errorifexists", s"Hudi table exists: $table")
    // one timeline replay serves both the schema gate and the replaced set
    val existing: Option[Snapshot] =
      if (isCreate) { createTable(table, partitionBy); None }
      else {
        val pf = partitionFields(table)
        require(pf == partitionBy,
          s"partitionBy $partitionBy != table partitioning $pf")
        val snap = snapshot(spark, table)
        snap.schema.foreach { tableSchema =>
          def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType.sql)).sortBy(_._1).toSeq
          require(shape(df.schema) == shape(tableSchema),
            s"schema mismatch: ${shape(df.schema)} vs table ${shape(tableSchema)}")
        }
        Some(snap)
      }
    val replaced: Map[String, Seq[String]] =
      if (mode == "overwrite")
        existing.map(_.slices.groupBy(_.partitionPath)
          .map { case (p, ss) => p -> ss.map(_.fileId).distinct.sorted })
          .getOrElse(Map.empty)
      else Map.empty
    val action = if (replaced.nonEmpty) "replacecommit" else "commit"

    val instant = newInstant(table)
    transitionFile(table, instant, action, "requested")
    transitionFile(table, instant, action, "inflight")

    // stage hive-style, then move into place under hudi base-file names
    val root = Paths.get(table).toAbsolutePath
    val staging = Files.createTempDirectory(root.getParent, "_hudi_staging_")
    val written: Seq[FileSlice] = try {
      val w = df.write.mode("overwrite")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(staging.toString)
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
    extra.put("schema", AvroFileFormat.toAvroSchema(df.schema, "hoodie_record").toString)
    meta.set[JsonNode]("extraMetadata", extra)

    completeInstant(table, instant, action, mapper.writeValueAsString(meta))
    instant
  }

  private def createTable(table: String, partitionBy: Seq[String]): Unit = {
    val dir = hoodieDir(table)
    Files.createDirectories(dir)
    val props =
      s"""#Properties saved on ${java.time.ZonedDateTime.now(ZoneOffset.UTC)}
         |hoodie.table.name=${Paths.get(table).getFileName}
         |hoodie.table.type=COPY_ON_WRITE
         |hoodie.table.version=6
         |hoodie.timeline.layout.version=1
         |hoodie.datasource.write.hive_style_partitioning=true
         |hoodie.populate.meta.fields=false
         |hoodie.datasource.write.drop.partition.columns=true
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
