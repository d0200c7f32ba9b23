package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.GraftCatalog
import graft.model.WriteMode

/**
 * Multi-catalog registry + top-level convenience API — the analog of the
 * reference's `dc.init/put_catalog/get_catalog` and `dc.write/read/copy`
 * (catalog/__init__.py:79, api.py).
 */
object Graft {
  private val registry = new ConcurrentHashMap[String, GraftCatalog]()
  @volatile var defaultCatalog: String = "default"

  /** Register (or replace) a catalog under `name`. */
  def initCatalog(name: String, spark: SparkSession, root: String): GraftCatalog = {
    val c = new GraftCatalog(spark, root)
    registry.put(name, c)
    c
  }

  def putCatalog(name: String, c: GraftCatalog): Unit = registry.put(name, c)

  def catalog(name: String = defaultCatalog): GraftCatalog =
    Option(registry.get(name)).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name not registered (known: ${listCatalogs.mkString(",")})"))

  def catalogExists(name: String): Boolean = registry.containsKey(name)
  def listCatalogs: Seq[String] = {
    import scala.collection.JavaConverters._
    registry.keys().asScala.toSeq.sorted
  }

  /** Deregister and return a catalog (reference `pop_catalog`). */
  def popCatalog(name: String): Option[GraftCatalog] = Option(registry.remove(name))

  /** Deregister every catalog (reference `clear_catalogs`). */
  def clearCatalogs(): Unit = registry.clear()

  /** Register the graft SQL functions (graft_dot, graft_fingerprint,
    * graft_simhash, graft_lang, graft_hash_bucket) in a live session —
    * the runtime path; `spark.sql.extensions=graft.spark.GraftSparkExtensions`
    * injects the same set at session build. */
  def registerFunctions(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    org.apache.spark.sql.graft.GraftFunctions.registerTable(spark)
  }

  // ------------------------------------------------- URL-addressed dataset ops
  def get(spark: SparkSession, url: String): DataFrame = io.UrlIO.read(spark, url)
  def put(df: DataFrame, url: String, mode: WriteMode = WriteMode.Auto): Unit =
    io.UrlIO.write(df, url, mode)
  def list(spark: SparkSession, url: String): Seq[String] = io.UrlIO.list(spark, url)
  def copy(spark: SparkSession, src: String, dst: String,
      transforms: Seq[DataFrame => DataFrame] = Nil): Unit =
    io.UrlIO.copy(spark, src, dst, transforms)

  // The reference DECLARES the following URL ops and raises
  // NotImplementedError for every one (api.py:311-491); implemented here.

  /** Append `source`'s rows to `destination` (api.py:311 `concat`). */
  def concat(spark: SparkSession, source: String, destination: String): Unit =
    put(get(spark, source), destination, WriteMode.Append)

  /** Delete the dataset a URL names: a graft `ns.table` is dropped WITH
    * file purge, a dot-less graft segment is a NAMESPACE (dropped with
    * cascade — matching list/touch, and never silently resolving to a
    * same-named default-namespace table); a filesystem target is removed
    * recursively (api.py:315). */
  def delete(spark: SparkSession, url: String): Unit = io.UrlIO.parse(url) match {
    case io.UrlIO.GraftTarget(cat, table, _) =>
      if (table.contains(".")) catalog(cat).dropTable(table, purge = true)
      else catalog(cat).dropNamespace(table, cascade = true)
    case io.UrlIO.FileTarget(path, _, _) =>
      val root = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.isDirectory(root)) {
        val s = java.nio.file.Files.walk(root)
        val files = try {
          import scala.collection.JavaConverters._
          s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
            .map(_.toString).toList
        } finally s.close()
        interop.InteropUtil.deleteFilesDistributed(spark, files)
        // empty dirs, deepest first
        val d = java.nio.file.Files.walk(root)
        try {
          import scala.collection.JavaConverters._
          d.iterator().asScala.toSeq.sortBy(-_.getNameCount)
            .foreach(p => try java.nio.file.Files.deleteIfExists(p)
            catch { case scala.util.control.NonFatal(_) => () })
        } finally d.close()
      } else java.nio.file.Files.deleteIfExists(root)
  }

  /** Copy then delete the source (api.py:319 `move`). */
  def move(spark: SparkSession, source: String, destination: String): Unit = {
    copy(spark, source, destination)
    delete(spark, source)
  }

  /** Does the URL name an existing dataset/container? A dot-less graft
    * segment matches a namespace OR a default-namespace table (the same
    * forms `get` accepts). (api.py:476) */
  def exists(spark: SparkSession, url: String): Boolean = io.UrlIO.parse(url) match {
    case io.UrlIO.GraftTarget(cat, table, _) =>
      catalogExists(cat) && (table.isEmpty ||
        (if (table.contains(".")) catalog(cat).tableExists(table)
        else catalog(cat).namespaceExists(table) || catalog(cat).tableExists(table)))
    case io.UrlIO.FileTarget(path, _, _) =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(path))
  }

  /** Create an empty placeholder: a graft namespace, or an empty file
    * (api.py:472 `touch`). */
  def touch(spark: SparkSession, url: String): Unit = io.UrlIO.parse(url) match {
    case io.UrlIO.GraftTarget(cat, container, _) =>
      require(!container.contains("."),
        "touch creates namespaces or files; tables need a schema — use createTable")
      if (!catalog(cat).namespaceExists(container))
        catalog(cat).createNamespace(container)
    case io.UrlIO.FileTarget(path, _, _) =>
      val p = java.nio.file.Paths.get(path)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      if (!java.nio.file.Files.exists(p)) java.nio.file.Files.createFile(p)
  }

  /** Run a SQL expression against the session — registered graft tables,
    * temp views, and `parquet.`/`delta.`-style file selects all work
    * (api.py:480 `query`). */
  def query(spark: SparkSession, expression: String): DataFrame = spark.sql(expression)

  /** First `n` rows of the dataset at `url` (api.py:488). */
  def head(spark: SparkSession, url: String, n: Int = 10): DataFrame =
    get(spark, url).limit(n)

  /** Last `n` rows of the dataset at `url` (api.py:484). Order is the
    * dataset's physical row order, matching `DataFrame.tail`. */
  def tail(spark: SparkSession, url: String, n: Int = 10): DataFrame = {
    val df = get(spark, url)
    spark.createDataFrame(java.util.Arrays.asList(df.tail(n): _*), df.schema)
  }
}
