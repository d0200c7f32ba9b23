package graft.interop

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Delta Lake table-format binding — the `StreamFormat.DELTA_LAKE` foreign
 * stream format from the reference's model (storage/model/types.py:32-38),
 * implemented against the PUBLIC Delta transaction-log protocol
 * (delta-io PROTOCOL.md): parquet data files plus an ordered JSON action
 * log under `_delta_log/`, with parquet checkpoints.
 *
 * No delta runtime jar exists in this environment, so this speaks the
 * format directly — and Spark-first: log replay (checkpoint + JSON commit
 * tail) runs as DataFrames, the active-file set is `max_by(version)` per
 * path (one aggregate, no driver loop over commits), and partition pruning
 * filters the file list BEFORE any data file is opened. The driver only
 * ever holds the pruned file list — the same contract as Spark's own file
 * index.
 *
 * Reader supports: snapshot read, `versionAsOf` / `timestampAsOf` time
 * travel, partition pruning, checkpoint + tail replay, protocol gating.
 * Writer supports: create/append/overwrite with hive-style partitioning,
 * metadata-only partition deletes, atomic commits via rename, and
 * single-part checkpoints every `checkpointInterval` commits.
 */
object DeltaLake {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  private def logDir(table: String): JPath = Paths.get(table, "_delta_log")
  private def commitFile(table: String, v: Long): JPath =
    logDir(table).resolve(f"$v%020d.json")

  /** Reader feature set this binding implements; a table whose protocol
    * demands anything else fails fast instead of returning wrong rows. */
  private val SupportedReaderFeatures = Set("timestampNtz")

  // ---------------------------------------------------------------- read

  /** Versions present in the log (sorted). */
  def versions(table: String): Seq[Long] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit))
      .map(_.stripSuffix(".json").toLong).toSeq.sorted
    finally s.close()
  }

  /** Snapshot read. `versionAsOf` pins a log version; `timestampAsOf` picks
    * the last version committed at or before the epoch-millis timestamp
    * (per the protocol: commit-file modification time). */
  def read(
      spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None, timestampAsOf: Option[Long] = None,
      partitionFilter: Option[Column] = None): DataFrame = {
    val snap = snapshot(spark, table, versionAsOf, timestampAsOf)
    val dataFields = snap.schema.fields.filterNot(f => snap.partitionColumns.contains(f.name))
    val dataSchema = StructType(dataFields)

    require(partitionFilter.isEmpty || snap.partitionColumns.nonEmpty,
      s"partitionFilter given but $table is unpartitioned — the filter would " +
        "be silently dropped; filter the returned DataFrame instead")
    val active = partitionFilter match {
      case Some(pred) =>
        // prune on the serialized partition values BEFORE touching data
        val parts = snap.partitionColumns.map { c =>
          val dt = snap.schema(c).dataType
          element_at(col("partitionValues"), c).cast(dt).as(c)
        }
        snap.files.select((col("path") +: parts): _*).where(pred)
      case None => snap.files
    }
    val files = active.select("path").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq
    if (files.isEmpty) return emptyFrame(spark, snap.schema)

    val data = spark.read.schema(dataSchema).parquet(files: _*)
    val out =
      if (snap.partitionColumns.isEmpty) data
      else {
        // data files omit partition columns (protocol: values live in the
        // add action); rejoin them via a broadcast (path -> values) frame.
        // _metadata.file_path is a URI (percent-ENCODED) — decode it to the
        // real filesystem path the snapshot carries, or files under escaped
        // partition dirs (k=a%3Ab) silently drop out of the inner join
        val decode = udf(InteropUtil.decodeRelPath _)
        val pv = snap.files.select(col("path"), col("partitionValues"))
        val withPath = data.withColumn("_g_path", decode(col("_metadata.file_path")))
        val joined = withPath.join(
          broadcast(pv.withColumnRenamed("path", "_g_path")
            .withColumn("_g_path", normPath(col("_g_path")))), Seq("_g_path"))
        snap.partitionColumns.foldLeft(joined) { (df, c) =>
          df.withColumn(c, element_at(col("partitionValues"), c).cast(snap.schema(c).dataType))
        }.drop("_g_path", "partitionValues")
      }
    out.select(snap.schema.fieldNames.map(col): _*)
  }

  /** Resolved snapshot state: schema, partitioning, and the active file
    * list as a DataFrame (path, partitionValues, size). */
  final case class Snapshot(
      version: Long, schema: StructType, partitionColumns: Seq[String],
      files: DataFrame)

  def snapshot(
      spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None, timestampAsOf: Option[Long] = None): Snapshot = {
    val all = versions(table)
    require(all.nonEmpty, s"not a Delta table (no _delta_log commits): $table")
    val target = versionAsOf match {
      case Some(v) =>
        require(all.contains(v), s"version $v not in log (have ${all.head}..${all.last})")
        v
      case None => timestampAsOf match {
        case Some(ts) =>
          val ok = all.filter(v => Files.getLastModifiedTime(commitFile(table, v)).toMillis <= ts)
          require(ok.nonEmpty, s"no commit at or before timestamp $ts")
          ok.max
        case None => all.last
      }
    }

    val cp = latestCheckpointAtOrBefore(table, target)
    val tailVersions = all.filter(v => v > cp.map(_._1).getOrElse(-1L) && v <= target)
    val meta = resolveMetadata(spark, table, tailVersions, cp)
    checkProtocol(meta.protocol, table)
    val schema = DataType.fromJson(meta.schemaString).asInstanceOf[StructType]

    val actionCols = Seq(
      col("add.path").as("add_path"),
      col("add.partitionValues").as("add_pv"),
      col("add.size").as("add_size"),
      col("remove.path").as("remove_path"))
    val tail: Option[DataFrame] = if (tailVersions.isEmpty) None else Some {
      spark.read.schema(commitActionSchema).json(
          tailVersions.map(v => commitFile(table, v).toString): _*)
        .withColumn("version",
          regexp_extract(col("_metadata.file_path"), "(\\d+)\\.json$", 1).cast(LongType))
        .select(actionCols :+ col("version"): _*)
    }
    val base: Option[DataFrame] = cp.map { case (cpv, cpFiles) =>
      // tolerate checkpoints missing an action column (ours omit `remove`
      // when no tombstones survive; the spec allows absent columns)
      val raw = spark.read.parquet(cpFiles: _*)
      val padded = commitActionSchema.fields.foldLeft(raw) { (df, f) =>
        if (df.schema.fieldNames.contains(f.name)) df
        else df.withColumn(f.name, lit(null).cast(f.dataType))
      }
      padded.select(actionCols :+ lit(cpv).as("version"): _*)
    }
    val actions = (base.toSeq ++ tail.toSeq).reduce(_ unionByName _)
      .where(col("add_path").isNotNull || col("remove_path").isNotNull)
      .select(
        coalesce(col("add_path"), col("remove_path")).as("path"),
        col("add_path").isNotNull.as("is_add"),
        col("version"), col("add_pv"), col("add_size"))

    // last action per path wins; ties inside one commit cannot mix add and
    // remove of the same path (protocol invariant)
    val latest = actions.groupBy("path").agg(
      max_by(struct(col("is_add"), col("add_pv"), col("add_size")), col("version")).as("w"))
    val files = latest.where(col("w.is_add"))
      .select(col("path"), col("w.add_pv").as("partitionValues"), col("w.add_size").as("size"))
      .withColumn("path", absolutize(col("path"), table))

    Snapshot(target, schema, meta.partitionColumns, files)
  }

  /** CDC-style view of one commit: the add/remove actions at `version`. */
  def changes(spark: SparkSession, table: String, version: Long): DataFrame = {
    require(versions(table).contains(version), s"version $version not in log")
    spark.read.schema(commitActionSchema).json(commitFile(table, version).toString)
      .select(
        coalesce(col("add.path"), col("remove.path")).as("path"),
        when(col("add.path").isNotNull, lit("add")).otherwise(lit("remove")).as("action"),
        coalesce(col("add.partitionValues"), col("remove.partitionValues")).as("partitionValues"))
      .where(col("path").isNotNull)
      .withColumn("path", absolutize(col("path"), table))
  }

  // --------------------------------------------------------------- write

  /** Append or overwrite `df` as one Delta commit; creates the table (and
    * its protocol/metaData actions) on first write. Returns the committed
    * version. Single-writer optimistic: the commit rename fails if the
    * version was taken, and the caller sees the conflict. */
  def write(
      df: DataFrame, table: String, mode: String = "append",
      partitionBy: Seq[String] = Nil, checkpointInterval: Int = 10): Long = {
    require(Seq("append", "overwrite", "errorifexists").contains(mode), s"mode: $mode")
    val spark = df.sparkSession
    val existing = versions(table)
    require(existing.isEmpty || mode != "errorifexists", s"Delta table exists: $table")
    val isCreate = existing.isEmpty
    val schema = df.schema
    if (!isCreate) {
      val snap = snapshot(spark, table)
      require(snap.partitionColumns == partitionBy,
        s"partitionBy $partitionBy != table partitioning ${snap.partitionColumns}")
      // names AND types (nullability aside): a type-mismatched append would
      // commit parquet the table schemaString can no longer read
      def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType.sql)).sortBy(_._1).toSeq
      require(shape(schema) == shape(snap.schema),
        s"schema mismatch: ${shape(schema)} vs table ${shape(snap.schema)}")
    }

    // stage data files, then move into place recording (relPath, size, pv)
    val staging = Files.createTempDirectory(Paths.get(table).toAbsolutePath.getParent, "_delta_staging_")
    val added = try {
      val w = df.write.mode("overwrite")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(staging.toString)
      moveStaged(staging, Paths.get(table), partitionBy)
    } finally InteropUtil.deleteRecursively(staging)

    val removes: Seq[JsonNode] =
      if (mode == "overwrite" && !isCreate)
        snapshot(spark, table).files.select("path", "partitionValues")
          .collect().toSeq.map { r =>
            removeAction(relativize(r.getString(0), table),
              Option(r.getJavaMap[String, String](1)).map(_.asScala.toMap).getOrElse(Map.empty))
          }
      else Nil

    val actions = Seq.newBuilder[JsonNode]
    if (isCreate) {
      actions += protocolAction()
      actions += metaDataAction(schema, partitionBy)
    }
    actions ++= removes
    actions ++= added.map { case (rel, size, pv) => addAction(rel, size, pv) }
    actions += commitInfoAction(if (isCreate) "CREATE TABLE AS SELECT"
      else if (mode == "overwrite") "WRITE OVERWRITE" else "WRITE APPEND")

    val v = commit(table, existing, actions.result())
    maybeCheckpoint(spark, table, v, checkpointInterval)
    v
  }

  /** Metadata-only delete of whole partitions: every active file whose
    * partition values satisfy `pred` gets a remove action — no data file is
    * read or written (the reference's partition-drop shape; at 100 TB this
    * is O(manifest), not O(data)). Returns the committed version. */
  def deletePartitions(spark: SparkSession, table: String, pred: Column,
      checkpointInterval: Int = 10): Long = {
    val snap = snapshot(spark, table)
    require(snap.partitionColumns.nonEmpty, "deletePartitions needs a partitioned table")
    val parts = snap.partitionColumns.map { c =>
      element_at(col("partitionValues"), c).cast(snap.schema(c).dataType).as(c)
    }
    val doomed = snap.files.select((col("path") +: col("partitionValues") +: parts): _*)
      .where(pred).select("path", "partitionValues").collect().toSeq
    val actions = doomed.map { r =>
      removeAction(relativize(r.getString(0), table),
        Option(r.getJavaMap[String, String](1)).map(_.asScala.toMap).getOrElse(Map.empty))
    } :+ commitInfoAction("DELETE PARTITIONS")
    val v = commit(table, versions(table), actions)
    maybeCheckpoint(spark, table, v, checkpointInterval)
    v
  }

  // ------------------------------------------------------------ internals

  private final case class Meta(
      schemaString: String, partitionColumns: Seq[String], protocol: Option[JsonNode])

  /** Latest metaData + protocol at the snapshot: scan the commit tail
    * newest-first on the driver (metadata actions are rare and live near
    * the head or in the checkpoint — this reads at most `tail` small JSON
    * files and usually just one), falling back to the checkpoint. */
  private def resolveMetadata(
      spark: SparkSession, table: String, tailVersions: Seq[Long],
      cp: Option[(Long, Seq[String])]): Meta = {
    var schema: Option[(String, Seq[String])] = None
    var protocol: Option[JsonNode] = None
    for (v <- tailVersions.sorted.reverse if schema.isEmpty || protocol.isEmpty) {
      val lines = Files.readAllLines(commitFile(table, v)).asScala
      for (line <- lines if line.nonEmpty) {
        val node = mapper.readTree(line)
        if (schema.isEmpty && node.has("metaData")) {
          val m = node.get("metaData")
          schema = Some((m.get("schemaString").asText(),
            m.get("partitionColumns").elements().asScala.map(_.asText()).toSeq))
          val cfg = Option(m.get("configuration"))
          val cmMode = cfg.flatMap(c => Option(c.get("delta.columnMapping.mode"))).map(_.asText())
          require(cmMode.forall(m => m == "none"),
            s"unsupported delta.columnMapping.mode=${cmMode.get} in $table")
        }
        if (protocol.isEmpty && node.has("protocol")) protocol = Some(node.get("protocol"))
      }
    }
    if (schema.isEmpty || protocol.isEmpty) cp.foreach { case (_, cpFiles) =>
      // readerFeatures MUST survive the fallback — a feature table whose
      // protocol action lives only in the checkpoint would otherwise slip
      // past checkProtocol and be silently misread
      val raw = spark.read.parquet(cpFiles: _*)
      val hasFeatures = raw.schema.fieldNames.contains("protocol") &&
        raw.schema("protocol").dataType.asInstanceOf[StructType]
          .fieldNames.contains("readerFeatures")
      val featCol =
        if (hasFeatures) col("protocol.readerFeatures")
        else lit(null).cast(ArrayType(StringType))
      val row = raw
        .select(col("metaData.schemaString"), col("metaData.partitionColumns"),
          col("protocol.minReaderVersion"), featCol.as("readerFeatures"))
        .where(col("schemaString").isNotNull || col("minReaderVersion").isNotNull)
        .collect()
      row.find(!_.isNullAt(0)).foreach { r =>
        if (schema.isEmpty) schema = Some((r.getString(0), r.getSeq[String](1)))
      }
      row.find(!_.isNullAt(2)).foreach { r =>
        if (protocol.isEmpty) {
          val p = mapper.createObjectNode()
          p.put("minReaderVersion", r.getInt(2))
          if (!r.isNullAt(3)) {
            val arr = mapper.createArrayNode()
            r.getSeq[String](3).foreach(arr.add)
            p.set[JsonNode]("readerFeatures", arr)
          }
          protocol = Some(p)
        }
      }
    }
    val (ss, pc) = schema.getOrElse(
      throw new IllegalStateException(s"no metaData action found in Delta log: $table"))
    Meta(ss, pc, protocol)
  }

  private def checkProtocol(protocol: Option[JsonNode], table: String): Unit =
    protocol.foreach { p =>
      val v = p.get("minReaderVersion").asInt()
      val feats: Set[String] =
        if (p.has("readerFeatures"))
          p.get("readerFeatures").elements().asScala.map(_.asText()).toSet
        else Set.empty
      val unsupported = feats -- SupportedReaderFeatures
      require(v <= 1 || (v == 3 && unsupported.isEmpty),
        s"Delta table $table requires reader version $v" +
          (if (unsupported.nonEmpty) s" with features $unsupported" else "") +
          " — this binding reads basic tables (no deletion vectors / column mapping)")
    }

  /** (version, checkpoint part files) of the newest checkpoint <= v. */
  private def latestCheckpointAtOrBefore(table: String, v: Long): Option[(Long, Seq[String])] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return None
    val s = Files.list(dir)
    val parts = try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.contains(".checkpoint.") && n.endsWith(".parquet")).toSeq
    finally s.close()
    val byVersion = parts.groupBy(n => n.takeWhile(_.isDigit).toLong)
    byVersion.keys.filter(_ <= v).maxOption.map { cpv =>
      (cpv, byVersion(cpv).sorted.map(n => dir.resolve(n).toString))
    }
  }

  /** Minimal action schema for distributed commit-tail reads. */
  private val commitActionSchema: StructType = StructType(Seq(
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType)))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)))))))

  private def emptyFrame(spark: SparkSession, schema: StructType): DataFrame =
    InteropUtil.emptyFrame(spark, schema)

  private def normPath(c: Column): Column = InteropUtil.normPath(c)

  private def absolutize(c: Column, table: String): Column = {
    val root = Paths.get(table).toAbsolutePath.toString.stripSuffix("/")
    // add.path is percent-encoded per the protocol; decode before resolving
    val decode = udf(InteropUtil.decodeRelPath _)
    when(c.startsWith("/"), c).otherwise(concat(lit(root + "/"), decode(c)))
  }

  /** Move staged files under the table root, keeping Spark's unique part
    * names and hive partition dirs; returns (relativePath, size, pv). */
  private def moveStaged(
      staging: JPath, root: JPath, partitionBy: Seq[String]): Seq[(String, Long, Map[String, String])] =
    InteropUtil.moveStagedParquet(staging, root).map { case (rel, size) =>
      val pv = rel.split('/').dropRight(1).flatMap { seg =>
        seg.split("=", 2) match {
          case Array(k, v) if partitionBy.contains(k) =>
            Some(k -> (if (v == "__HIVE_DEFAULT_PARTITION__") null
            else InteropUtil.unescapeHive(v)))
          case _ => None
        }
      }.toMap
      (rel, size, pv)
    }

  // ---- action JSON builders

  private def obj() = mapper.createObjectNode()

  private def protocolAction(): JsonNode = {
    val p = obj(); val inner = obj()
    inner.put("minReaderVersion", 1); inner.put("minWriterVersion", 2)
    p.set("protocol", inner); p
  }

  private def metaDataAction(schema: StructType, partitionBy: Seq[String]): JsonNode = {
    val m = obj()
    m.put("id", java.util.UUID.randomUUID().toString)
    val fmt = obj(); fmt.put("provider", "parquet"); fmt.set("options", obj())
    m.set("format", fmt)
    m.put("schemaString", schema.json)
    val pc = mapper.createArrayNode(); partitionBy.foreach(pc.add); m.set("partitionColumns", pc)
    m.set("configuration", obj())
    m.put("createdTime", System.currentTimeMillis())
    val w = obj(); w.set("metaData", m); w
  }

  private def addAction(rel: String, size: Long, pv: Map[String, String]): JsonNode = {
    val a = obj()
    a.put("path", InteropUtil.encodeRelPath(rel))
    val pvn = obj(); pv.foreach { case (k, v) => if (v == null) pvn.putNull(k) else pvn.put(k, v) }
    a.set("partitionValues", pvn)
    a.put("size", size)
    a.put("modificationTime", System.currentTimeMillis())
    a.put("dataChange", true)
    val w = obj(); w.set("add", a); w
  }

  private def removeAction(rel: String, pv: Map[String, String]): JsonNode = {
    val r = obj()
    // must match the original add.path byte-for-byte for replay
    r.put("path", InteropUtil.encodeRelPath(rel))
    r.put("deletionTimestamp", System.currentTimeMillis())
    r.put("dataChange", true)
    val pvn = obj(); pv.foreach { case (k, v) => if (v == null) pvn.putNull(k) else pvn.put(k, v) }
    r.set("partitionValues", pvn)
    val w = obj(); w.set("remove", r); w
  }

  private def commitInfoAction(op: String): JsonNode = {
    val ci = obj(); ci.put("timestamp", System.currentTimeMillis()); ci.put("operation", op)
    val w = obj(); w.set("commitInfo", ci); w
  }

  private def relativize(abs: String, table: String): String = {
    val root = Paths.get(table).toAbsolutePath.toString.stripSuffix("/") + "/"
    if (abs.startsWith(root)) abs.stripPrefix(root) else abs
  }

  /** Write version file atomically: temp + ATOMIC_MOVE with no-replace —
    * a concurrent committer of the same version loses the rename race and
    * surfaces as a conflict, never a torn log. */
  private[graft] def commit(table: String, existing: Seq[Long], actions: Seq[JsonNode]): Long = {
    val v = existing.maxOption.map(_ + 1).getOrElse(0L)
    val dir = logDir(table)
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, s".$v", ".json.tmp")
    Files.write(tmp, actions.map(mapper.writeValueAsString).mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    // hard-link, not rename: POSIX rename() silently REPLACES an existing
    // target, but link() atomically fails with EEXIST — the loser of a
    // same-version race must surface as a conflict, never clobber the log
    try { Files.createLink(commitFile(table, v), tmp); Files.deleteIfExists(tmp) }
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"concurrent Delta commit at version $v on $table", e)
    }
    v
  }

  /** Every `interval` commits, checkpoint the full state (single-part; a
    * multi-part writer is the 100 TB path and reads already support it). */
  private def maybeCheckpoint(
      spark: SparkSession, table: String, v: Long, interval: Int): Unit = {
    if (interval <= 0 || v == 0 || v % interval != 0) return
    val snap = snapshot(spark, table, versionAsOf = Some(v))
    val meta = resolveMetadata(spark, table, versions(table).filter(_ <= v), None)
    val addDf = snap.files.select(struct(
      urlEncodeRel(col("path"), table).as("path"),
      col("partitionValues"),
      col("size"),
      lit(System.currentTimeMillis()).as("modificationTime"),
      lit(true).as("dataChange")).as("add"))
    val metaRow = Seq((meta.schemaString, snap.partitionColumns))
    import spark.implicits._
    val metaDf = metaRow.toDF("schemaString", "partitionColumns").select(
      struct(col("schemaString"), col("partitionColumns"),
        lit("parquet").as("provider")).as("metaData"))
    val protoDf = Seq(1).toDF("x").select(
      struct(lit(1).as("minReaderVersion"), lit(2).as("minWriterVersion")).as("protocol"))
    val cpDir = Files.createTempDirectory(logDir(table), ".cp_")
    try {
      addDf.unionByName(metaDf, allowMissingColumns = true)
        .unionByName(protoDf, allowMissingColumns = true)
        .coalesce(1).write.mode("overwrite").parquet(cpDir.toString)
      val part = Files.list(cpDir).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException("checkpoint write produced no parquet"))
      Files.move(part, logDir(table).resolve(f"$v%020d.checkpoint.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      val lc = obj(); lc.put("version", v); lc.put("size", 1)
      Files.write(logDir(table).resolve("_last_checkpoint"),
        mapper.writeValueAsString(lc).getBytes(StandardCharsets.UTF_8))
    } finally InteropUtil.deleteRecursively(cpDir)
  }

  /** Absolute decoded path -> the protocol's relative percent-encoded form
    * (checkpoint add.path must match the commit actions byte-for-byte). */
  private def urlEncodeRel(c: Column, table: String): Column = {
    val root = Paths.get(table).toAbsolutePath.toString.stripSuffix("/") + "/"
    val enc = udf(InteropUtil.encodeRelPath _)
    enc(regexp_replace(c, java.util.regex.Pattern.quote(root), ""))
  }
}
