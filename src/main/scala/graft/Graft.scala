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

  /** Register the graft SQL functions (graft_dot, graft_fingerprint,
    * graft_simhash, graft_lang, graft_hash_bucket) in a live session —
    * the runtime path; `spark.sql.extensions=graft.spark.GraftSparkExtensions`
    * injects the same set at session build. */
  def registerFunctions(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.GraftFunctions.register(spark)

  // ------------------------------------------------- URL-addressed dataset ops
  def get(spark: SparkSession, url: String): DataFrame = io.UrlIO.read(spark, url)
  def put(df: DataFrame, url: String, mode: WriteMode = WriteMode.Auto): Unit =
    io.UrlIO.write(df, url, mode)
  def list(spark: SparkSession, url: String): Seq[String] = io.UrlIO.list(spark, url)
  def copy(spark: SparkSession, src: String, dst: String,
      transforms: Seq[DataFrame => DataFrame] = Nil): Unit =
    io.UrlIO.copy(spark, src, dst, transforms)
}
