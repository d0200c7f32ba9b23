package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Graft
import graft.model.{ContentType, WriteMode}

/**
 * URL-addressed dataset IO — the Spark-first restatement of the reference's
 * datastore registry + `dc.copy` transform pipeline (utils/url.py:77-248,
 * api.py:97-190). Instead of 25 per-datastore readers, one dispatcher maps a
 * URL onto `spark.read.format(...)` / the Graft catalog; every Spark
 * datasource on the classpath (jdbc, delta, iceberg, mongodb, binaryFile, …)
 * is reachable through the `<format>://` or `?format=` forms without
 * per-connector code.
 *
 * Grammar:
 *   graft://<catalog>/<ns>.<table>[?asOf=<millis>]   registered Graft catalog
 *   file:///path | /path [?format=<fmt>]             local files, format from
 *                                                    extension when omitted
 *   <format>://<path-or-options>                     any Spark datasource name
 */
object UrlIO {

  sealed trait Target
  final case class GraftTarget(catalog: String, table: String, asOf: Option[Long]) extends Target
  final case class FileTarget(path: String, format: String, options: Map[String, String]) extends Target

  private val ExtFormats = Map(
    ".parquet" -> "parquet", ".csv" -> "csv", ".tsv" -> "csv", ".json" -> "json",
    ".orc" -> "orc", ".txt" -> "text", ".bin" -> "binaryFile",
    ".avro" -> "avro", ".feather" -> "feather", ".arrow" -> "feather")

  def parse(url: String): Target = {
    val (base, query) = url.span(_ != '?')
    val params = if (query.isEmpty) Map.empty[String, String]
    else query.drop(1).split('&').filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> "true" // valueless flag
      }
    }.toMap
    base match {
      case u if u.startsWith("graft://") =>
        val rest = u.stripPrefix("graft://")
        val (cat, tbl) = rest.span(_ != '/')
        require(tbl.nonEmpty, s"graft url must be graft://<catalog>/<ns>.<table>: $url")
        GraftTarget(cat, tbl.drop(1), params.get("asOf").map(_.toLong))
      case u if u.startsWith("file://") =>
        fileTarget(u.stripPrefix("file://"), params)
      case u if u.startsWith("/") =>
        fileTarget(u, params)
      case u if u.contains("://") =>
        val (fmt, rest) = u.span(_ != ':')
        FileTarget(rest.drop(3), fmt, params)
      case u => fileTarget(u, params)
    }
  }

  private def fileTarget(path: String, params: Map[String, String]): FileTarget = {
    val fmt = params.getOrElse("format",
      ExtFormats.collectFirst { case (ext, f) if path.endsWith(ext) => f }
        .getOrElse("parquet"))
    val opts = (params - "format") ++
      (if (fmt == "csv" && path.endsWith(".tsv")) Map("sep" -> "\t") else Map.empty) ++
      (if (fmt == "csv") Map("header" -> params.getOrElse("header", "true"),
        "inferSchema" -> params.getOrElse("inferSchema", "true"))
      else Map.empty)
    FileTarget(path, fmt, opts)
  }

  def read(spark: SparkSession, url: String): DataFrame = parse(url) match {
    case GraftTarget(cat, table, asOf) =>
      Graft.catalog(cat).readTable(table, graft.catalog.ReadOptions(asOf = asOf))
    case FileTarget(path, "delta", opts) =>
      // delta:///path?versionAsOf=3 — the foreign Delta Lake binding (no
      // delta runtime jar; graft.interop.DeltaLake speaks the protocol)
      graft.interop.DeltaLake.read(spark, path,
        versionAsOf = opts.get("versionAsOf").map(_.toLong),
        timestampAsOf = opts.get("timestampAsOf").map(_.toLong))
    case FileTarget(path, "iceberg", opts) =>
      // iceberg:///path?snapshotId=… — the foreign Iceberg v2 binding
      graft.interop.Iceberg.read(spark, path,
        snapshotId = opts.get("snapshotId").map(_.toLong),
        asOfTimestampMs = opts.get("asOfTimestamp").map(_.toLong))
    case FileTarget(path, "hudi", opts) =>
      // hudi:///path?asOfInstant=20260101123045678 — the foreign Hudi CoW
      // binding (no hudi runtime jar; graft.interop.Hudi speaks the layout)
      graft.interop.Hudi.read(spark, path,
        asOfInstant = opts.get("asOfInstant"),
        asOfTimestampMs = opts.get("asOfTimestamp").map(_.toLong),
        keepMetaFields = opts.get("keepMetaFields").exists(_.toBoolean))
    case FileTarget(path, "hive", opts) =>
      // hive:///warehouse/table — hive-style partitioned parquet layout;
      // partition discovery is native Spark (reference StreamFormat.HIVE)
      spark.read.options(opts - "partitionBy").option("basePath", path).parquet(path)
    case FileTarget(path, fmt, opts) =>
      spark.read.format(fmt).options(opts).load(path)
  }

  def write(df: DataFrame, url: String, mode: WriteMode = WriteMode.Auto): Unit =
    parse(url) match {
      case GraftTarget(cat, table, _) =>
        Graft.catalog(cat).writeToTable(df, table, mode)
      case FileTarget(path, fmt, opts) =>
        val saveMode = mode match {
          case WriteMode.Add | WriteMode.Append | WriteMode.Chrono => "append"
          case WriteMode.Create => "errorifexists"
          case _ => "overwrite"
        }
        val partitionBy = opts.get("partitionBy").toSeq.flatMap(_.split(',')).filter(_.nonEmpty)
        fmt match {
          case "delta" =>
            graft.interop.DeltaLake.write(df, path, saveMode, partitionBy = partitionBy)
          case "iceberg" =>
            val exists = java.nio.file.Files.exists(
              java.nio.file.Paths.get(path, "metadata", "version-hint.text"))
            require(!exists || saveMode == "append",
              s"iceberg:// write to an existing table supports append, not $saveMode")
            // ?partitionSpec=col:bucket[4],ts:day — non-identity transform
            // fields alongside the identity partitionBy list
            val spec = opts.get("partitionSpec").toSeq.flatMap(_.split(','))
              .filter(_.nonEmpty).map { kv =>
                kv.split(":", 2) match {
                  case Array(src, tr) => (src, tr)
                  case _ => throw new IllegalArgumentException(
                    s"partitionSpec entry '$kv' is not col:transform")
                }
              }
            // partitioning options only apply at CREATION — silently
            // appending under a different existing spec would drop the
            // caller's requested bucketing without a trace
            require(!exists || (spec.isEmpty && partitionBy.isEmpty),
              "iceberg:// append to an existing table cannot change its " +
                "partitioning; drop partitionBy/partitionSpec (the table's " +
                "own spec applies)")
            if (!exists)
              graft.interop.Iceberg.createTable(path, df.schema,
                partitionCols = partitionBy, partitionSpec = spec)
            graft.interop.Iceberg.append(df, path)
          case "hudi" =>
            graft.interop.Hudi.write(df, path, saveMode, partitionBy = partitionBy)
          case "hive" =>
            val w = df.write.options(opts - "partitionBy").mode(saveMode)
            (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
          case _ => df.write.format(fmt).options(opts).mode(saveMode).save(path)
        }
    }

  /** List a container: graft catalog namespace/tables, or a directory. */
  def list(spark: SparkSession, url: String): Seq[String] = parse(url) match {
    case GraftTarget(cat, container, _) =>
      val c = Graft.catalog(cat)
      if (container.isEmpty) c.listNamespaces()
      else if (container.contains(".")) Seq(container).filter(c.tableExists(_))
      else c.listTables(container).map(t => s"$container.$t")
    case FileTarget(path, _, _) =>
      val dir = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.isDirectory(dir)) Nil
      else {
        import scala.collection.JavaConverters._
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala.map(_.toString).toList.sorted finally s.close()
      }
  }

  /** Decoded-bytes inflation per file extension — the reference's
    * extension_to_memory_multiplier (api.py:103-120, same public values):
    * how much bigger a file's in-memory decoded form is than its on-disk
    * bytes. Compressed containers dominate compound extensions
    * (`.csv.gz` -> 35). */
  val ExtensionInflation: Map[String, Double] = Map(
    "pq" -> 5, "parquet" -> 5,
    "feather" -> 1.5, "arrow" -> 1.5,
    "csv" -> 1.5, "tsv" -> 1.5, "psv" -> 1.5, "txt" -> 1.5,
    "json" -> 1.5, "jsonl" -> 1.5,
    "gz" -> 35, "bz2" -> 35, "zip" -> 35, "zst" -> 35, "7z" -> 35, "xz" -> 35,
    "*" -> 2.5)

  def inflationFor(path: String): Double = {
    val ext = path.substring(path.lastIndexOf('/') + 1).split('.').drop(1)
    ext.reverseIterator.collectFirst {
      case e if ExtensionInflation.contains(e.toLowerCase) =>
        ExtensionInflation(e.toLowerCase)
    }.getOrElse(ExtensionInflation("*"))
  }

  /** Worst-case inflation of a source path: for a directory, the max over
    * its FILES (recursive — a hive-partitioned source keeps its data under
    * `k=v/` dirs whose names carry no extension) — one 35x gzip member must
    * not OOM its task because its siblings were tame. Depth- and
    * count-capped: the extension mix repeats long before 4 levels / 1024
    * files. */
  private[graft] def sourceInflation(path: String): Double = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) {
      import scala.collection.JavaConverters._
      val s = java.nio.file.Files.walk(p, 4)
      val names = try s.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(_.getFileName.toString)
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
        .take(1024).toList
      finally s.close()
      if (names.isEmpty) 1.0 else names.map(inflationFor).max
    } else inflationFor(path)
  }

  /** Serializes the maxPartitionBytes-scaling section of [[copy]]: two
    * concurrent copies would otherwise restore each other's scaled value
    * and leave the session permanently mis-sized. */
  private val copyLock = new Object

  /** Parallel read → transform pipeline → write between any two targets —
    * reference `dc.copy` (api.py:97-190). Transforms apply in order.
    *
    * Task sizing: the reference estimates per-file decoded memory from the
    * extension-inflation table and retries OOM'd copy tasks with escalating
    * dedicated CPUs (api.py:580-615). Spark-first analog: scale the scan's
    * `maxPartitionBytes` DOWN by the source's inflation factor for the
    * duration of the copy, so each task's DECODED footprint fits the same
    * envelope the default assumed for raw bytes — and spill/AQE (SURVEY §4)
    * replace the kill-and-escalate loop. A 35x-inflating gzip source reads
    * in ~35x smaller splits instead of OOMing one fat task. */
  def copy(spark: SparkSession, src: String, dst: String,
      transforms: Seq[DataFrame => DataFrame] = Nil): Unit = copyLock.synchronized {
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    val inflation = parse(src) match {
      case FileTarget(path, _, _) => sourceInflation(path)
      case _ => 1.0 // graft catalog sources are parquet, sized by the catalog
    }
    val scaled = math.max(1L << 20,
      (spark.sessionState.conf.filesMaxPartitionBytes / inflation).toLong)
    try {
      if (inflation > 1.0) spark.conf.set(key, scaled.toString)
      val in = read(spark, src)
      val out = transforms.foldLeft(in)((df, t) => t(df))
      write(out, dst)
    } finally spark.conf.set(key, prev)
  }
}
