package graft.interop

import java.nio.file.{Files, Path => JPath}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Helpers shared by the Delta Lake and Iceberg bindings: path escaping,
  * staged-file moves, and footer row counts. One definition — the two
  * bindings must not drift on escaping rules. */
private[graft] object InteropUtil {

  def normPath(c: Column): Column = regexp_replace(c, "^file:/+", "/")

  /** Run a write with modern parquet timestamp output (TIMESTAMP_MICROS):
    * Spark's legacy INT96 default has footer stats suppressed (no data
    * skipping), Iceberg forbids INT96 outright, and the Delta/Hudi
    * ecosystems both default to micros. The guard is REENTRANT and
    * per-session reference-counted: concurrent writers (ConcurrencySpec's
    * racing commits) share one save/restore instead of racing a naive
    * save-set-restore, which could leave a writer on INT96 mid-flight or
    * leak the override into the session permanently. */
  def withMicrosTimestamps[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.parquet.outputTimestampType"
    val st = microsGuards.synchronized {
      var g = microsGuards.get(spark)
      if (g == null) { g = new MicrosGuard; microsGuards.put(spark, g) }
      g
    }
    st.synchronized {
      if (st.depth == 0) {
        st.saved = spark.conf.getOption(key)
        spark.conf.set(key, "TIMESTAMP_MICROS")
      }
      st.depth += 1
    }
    try body finally st.synchronized {
      st.depth -= 1
      if (st.depth == 0) st.saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
  private final class MicrosGuard {
    var depth: Int = 0
    var saved: Option[String] = None
  }
  // WeakHashMap (guarded by its own monitor): a session key is held weakly,
  // so short-lived cloned/new sessions do not accumulate forever in a
  // long-lived driver — a ConcurrentHashMap here was an unbounded leak of
  // SparkSession (and SessionState) references.
  private val microsGuards = new java.util.WeakHashMap[SparkSession, MicrosGuard]

  def emptyFrame(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** RFC 2396 percent-encode a relative path (the Delta protocol's add.path
    * form). The multi-arg URI constructor quotes every illegal character
    * INCLUDING '%' itself, so hive-escaped dir names survive a
    * decode-after-encode roundtrip. */
  def encodeRelPath(rel: String): String =
    new java.net.URI(null, null, "/" + rel, null).getRawPath.substring(1)

  /** Inverse: percent-decode; tolerate foreign writers' unencoded paths. */
  def decodeRelPath(s: String): String =
    try new java.net.URI(s).getPath catch { case NonFatal(_) => s }

  /** Column-level equivalent of [[decodeRelPath]] for `_metadata.file_path`
    * join keys, built entirely from codegen'd builtins so the interop tag
    * joins stay inside whole-stage codegen (a scala UDF here forces the
    * join key out of codegen and loses null-safety for free).
    * Semantics match `URI.getPath`: scheme + authority are stripped, and
    * a literal `+` in the path stays `+` — `url_decode` alone is
    * form-decoding (`+` → space), so `+` is pre-escaped to `%2B` first. */
  def decodePathColumn(c: Column): Column = {
    val stripped = regexp_replace(
      regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""),
      "^[a-zA-Z][a-zA-Z0-9+.-]*:", "")
    url_decode(regexp_replace(stripped, "\\+", "%2B"))
  }

  /** Percent-decode a possibly scheme-qualified path, PRESERVING scheme and
    * authority (`s3a://bucket/k%20a` -> `s3a://bucket/k a`). Plain
    * `URI.getPath` would strip them and mangle remote absolute paths into
    * bare local ones. */
  def decodeAnyPath(s: String): String =
    try {
      val u = new java.net.URI(s)
      if (u.getScheme != null && s.contains("://"))
        u.getScheme + "://" + Option(u.getAuthority).getOrElse("") + u.getPath
      else u.getPath
    } catch { case NonFatal(_) => s }

  /** Hive partition-dir value unescaping (k=a%3Ab -> a:b) — Spark's own
    * rule, so values roundtrip exactly what partitionBy wrote. */
  def unescapeHive(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s)

  /** Move staged parquet part files under destRoot keeping relative dirs;
    * returns (relativePath, sizeBytes). */
  def moveStagedParquet(staging: JPath, destRoot: JPath): Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
    val stream = Files.walk(staging)
    try stream.iterator().asScala.foreach { p =>
      val name = p.getFileName.toString
      if (Files.isRegularFile(p) && name.endsWith(".parquet") && !name.startsWith("_")) {
        val rel = staging.relativize(p).toString
        val dest = destRoot.resolve(rel)
        Files.createDirectories(dest.getParent)
        Files.move(p, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        out += ((rel, Files.size(dest)))
      }
    } finally stream.close()
    out.result()
  }

  def deleteRecursively(p: JPath): Unit = if (Files.exists(p)) {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
    finally s.close()
  }

  /** Per-path footer metadata, driver loop under 16 files, distributed job
    * above (the catalog footer-pass policy). `extract` must be
    * serializable. */
  private def footerMap[T](spark: SparkSession, paths: Seq[String])(
      extract: org.apache.parquet.hadoop.ParquetFileReader => T): Map[String, T] = {
    def one(s: String, conf: org.apache.hadoop.conf.Configuration): T = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try extract(r) finally r.close()
    }
    if (paths.isEmpty) Map.empty
    else if (paths.size < 16) {
      val conf = spark.sessionState.newHadoopConf()
      paths.map(p => p -> one(p, conf)).toMap
    } else {
      val confBc = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(spark.sessionState.newHadoopConf()))
      spark.sparkContext
        .parallelize(paths, math.min(paths.size, spark.sparkContext.defaultParallelism * 2))
        .map(s => s -> one(s, confBc.value.value))
        .collect().toMap
    }
  }

  /** Parquet footer record counts. */
  def parquetRowCounts(spark: SparkSession, paths: Seq[String]): Map[String, Long] =
    footerMap(spark, paths)(_.getRecordCount)

  /** (rowCount, canonical column stats) per file — one footer read serving
    * both the record counts and the data-skipping bounds. */
  def parquetFooterStats(spark: SparkSession, paths: Seq[String])
      : Map[String, (Long, Map[String, graft.txn.ColStat])] =
    footerMap(spark, paths)(graft.catalog.FooterStats.fromReader)

  /** Top-level (fieldId -> columnName) per file; empty map when the writer
    * recorded no field ids. */
  def parquetFieldIds(spark: SparkSession, paths: Seq[String]): Map[String, Map[Int, String]] =
    footerMap(spark, paths) { r =>
      r.getFooter.getFileMetaData.getSchema.getFields.asScala.flatMap { t =>
        Option(t.getId).map(id => id.intValue() -> t.getName)
      }.toMap
    }

  /** One delete, one rule in BOTH branches below: scheme-qualified paths
    * (s3a://…) go through Hadoop FS with the session conf; scheme-less
    * paths are LOCAL (the bindings build them with java.nio) and use
    * java.nio — resolving them against fs.defaultFS would no-op locally or
    * hit a same-named remote path. */
  private def deleteOne(s: String, conf: org.apache.hadoop.conf.Configuration): Unit =
    try {
      if (s.contains("://")) {
        val p = new org.apache.hadoop.fs.Path(s)
        p.getFileSystem(conf).delete(p, false)
      } else Files.deleteIfExists(java.nio.file.Paths.get(s))
    } catch { case NonFatal(_) => () }

  /** Best-effort file deletion: driver loop under 64 paths, Spark job
    * above (a reclamation pass can reference 10^5+ files — a serial driver
    * loop would stall for minutes; the catalog's dropTable(purge) policy).
    * The session Hadoop conf rides to executors so remote filesystems keep
    * their credentials. */
  def deleteFilesDistributed(spark: SparkSession, paths: Seq[String]): Unit = {
    if (paths.size < 64) {
      val conf = spark.sessionState.newHadoopConf()
      paths.foreach(deleteOne(_, conf))
    } else {
      val slices = math.min(paths.size, spark.sparkContext.defaultParallelism * 2)
      val confBc = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(spark.sessionState.newHadoopConf()))
      spark.sparkContext.parallelize(paths, slices).foreachPartition { it =>
        val conf = confBc.value.value
        it.foreach(deleteOne(_, conf))
      }
    }
  }
}
