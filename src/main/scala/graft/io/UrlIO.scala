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
        if (fmt == "delta")
          graft.interop.DeltaLake.write(df, path, saveMode,
            partitionBy = opts.get("partitionBy").toSeq.flatMap(_.split(',')).filter(_.nonEmpty))
        else df.write.format(fmt).options(opts).mode(saveMode).save(path)
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

  /** Parallel read → transform pipeline → write between any two targets —
    * reference `dc.copy` (api.py:97-190). Transforms apply in order. */
  def copy(spark: SparkSession, src: String, dst: String,
      transforms: Seq[DataFrame => DataFrame] = Nil): Unit = {
    val in = read(spark, src)
    val out = transforms.foldLeft(in)((df, t) => t(df))
    write(out, dst)
  }
}
