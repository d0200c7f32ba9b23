package graft.txn

import java.io.{InputStream, OutputStream}
import java.nio.file.{Files, Path}
import scala.collection.JavaConverters._

/**
 * Metadata-plane file IO seam — every listing, record read/write, delete,
 * and lease touch the transaction layer and the catalog's metafile paths
 * perform goes through this trait, so catalog-level ACID can point at any
 * storage system, not just `java.nio.file` (the reference's portability
 * claim is "any PyArrow filesystem", README.md:5-21 + storage/main/impl.py;
 * this is the Spark-side equivalent). [[CommitStore]] remains the seam for
 * the two ATOMIC primitives (put-if-absent, claim-move) — FileIO is
 * deliberately rename-free so no caller can smuggle in an atomicity
 * assumption object stores don't honor.
 *
 * Contracts every impl must satisfy:
 *  - [[write]]/[[outputStream]] are full puts; parent "directories" spring
 *    into existence implicitly (S3 keys have no dirs — [[mkdirs]] may be a
 *    no-op and writers must not rely on it).
 *  - [[listDir]]/[[walk]] return Nil / visit nothing for a missing dir —
 *    prefix listings have no "directory not found".
 *  - [[touch]] refreshes an object's modification stamp; stores without a
 *    native set-mtime implement it as a full rewrite (read + put) and
 *    swallow a concurrently-vanished object. A rewrite can resurrect a
 *    lease a janitor concurrently claim-moved away — the commit protocol
 *    tolerates that (seal re-checks the fence after winning its claim),
 *    so impls need no stronger primitive here.
 *  - [[deleteDirIfEmpty]] is best-effort (virtual dirs vanish on their own).
 *
 * Serializable: Spark tasks (distributed manifest planning) capture the
 * instance, so impls must be stateless or hold only serializable config.
 */
trait FileIO extends Serializable {
  /** Direct children of `dir`; Nil if the directory does not exist. */
  def listDir(dir: Path): Seq[Path]
  def readBytes(p: Path): Array[Byte]
  def inputStream(p: Path): InputStream
  /** Full put; parents implied. */
  def write(p: Path, bytes: Array[Byte]): Unit
  /** Streaming put; parents implied. Content is visible at close. */
  def outputStream(p: Path): OutputStream
  /** Delete-if-exists for a file/object. Returns true iff this call deleted. */
  def delete(p: Path): Boolean
  /** Best-effort removal of an empty directory; no-op where dirs are virtual. */
  def deleteDirIfEmpty(p: Path): Unit
  def exists(p: Path): Boolean
  def isDirectory(p: Path): Boolean
  def isFile(p: Path): Boolean
  /** May be a no-op (virtual directories) — never rely on it for existence. */
  def mkdirs(p: Path): Unit
  def size(p: Path): Long
  /** Modification time in millis. Throws if absent. */
  def mtime(p: Path): Long
  /** Refresh the modification stamp (lease heartbeat). Swallows a
    * concurrently-deleted target. */
  def touch(p: Path, millis: Long): Unit
  /** Recursive pre-order visit of `root` and everything under it (files
    * and directories); visits nothing if `root` does not exist. */
  def walk(root: Path)(f: Path => Unit): Unit
}

object FileIO {
  /** Spark-conf-driven selection (`graft.fileIO` = `local` |
    * `object-store-sim`), mirroring [[CommitStore.fromConf]] so every
    * surface that builds its own catalog — DSv2/SQL, streaming, TVFs —
    * gets the configured metadata IO without plumbing. */
  def fromConf(spark: org.apache.spark.sql.SparkSession): FileIO =
    spark.conf.getOption("graft.fileIO") match {
      case Some("object-store-sim") => new ObjectStoreFileIO
      case Some("local") | None => LocalFileIO
      case Some(other) => throw new IllegalArgumentException(
        s"graft.fileIO=$other (expected local | object-store-sim)")
    }
}

/** POSIX/HDFS implementation: direct `java.nio.file` delegation. */
object LocalFileIO extends FileIO {
  override def listDir(dir: Path): Seq[Path] = {
    val s = try Files.list(dir) catch {
      case _: java.nio.file.NoSuchFileException => null
      case _: java.nio.file.NotDirectoryException => null
    }
    if (s == null) Nil
    else try s.iterator().asScala.toList finally s.close()
  }
  override def readBytes(p: Path): Array[Byte] = Files.readAllBytes(p)
  override def inputStream(p: Path): InputStream = Files.newInputStream(p)
  override def write(p: Path, bytes: Array[Byte]): Unit = {
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, bytes)
  }
  override def outputStream(p: Path): OutputStream = {
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.newOutputStream(p)
  }
  override def delete(p: Path): Boolean = Files.deleteIfExists(p)
  override def deleteDirIfEmpty(p: Path): Unit =
    try Files.delete(p) catch { case _: Exception => () } // non-empty/racing: fine
  override def exists(p: Path): Boolean = Files.exists(p)
  override def isDirectory(p: Path): Boolean = Files.isDirectory(p)
  override def isFile(p: Path): Boolean = Files.isRegularFile(p)
  override def mkdirs(p: Path): Unit = Files.createDirectories(p)
  override def size(p: Path): Long = Files.size(p)
  override def mtime(p: Path): Long = Files.getLastModifiedTime(p).toMillis
  override def touch(p: Path, millis: Long): Unit =
    try Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(millis))
    catch { case _: java.io.IOException => () } // claimed/vanished under us
  override def walk(root: Path)(f: Path => Unit): Unit = {
    if (!Files.exists(root)) return
    val w = Files.walk(root)
    try w.iterator().asScala.foreach(f) finally w.close()
  }
}

/**
 * S3-shaped double: the SAME local tree, reachable ONLY through the
 * operations an S3-semantics object store actually has — put (parents
 * implied), get, list-by-prefix, unconditional delete. No rename exists on
 * the trait at all; [[mkdirs]] is a NO-OP (directories are virtual — a
 * "dir" exists exactly when some object lies under it); [[touch]] is a
 * full object rewrite (S3 cannot set mtime); [[deleteDirIfEmpty]] relies
 * on virtual dirs vanishing (here: best-effort local delete). Paired with
 * [[ConditionalPutCommitStore]] (the conditional-put commit primitive)
 * this is the complete storage profile of a real S3/GCS/ADLS deployment —
 * the protocol suites (ConcurrencySpec, MetastoreScaleSpec, the oracle
 * cycle) run against the pair to certify the 100 TB-on-object-store path.
 */
class ObjectStoreFileIO extends FileIO {
  // puts/gets/deletes behave identically over the local backing —
  // delegate, so a fix to the shared bodies can never diverge the two
  // profiles; only mkdirs/touch/walk have genuinely different semantics
  override def listDir(dir: Path): Seq[Path] = LocalFileIO.listDir(dir)
  override def readBytes(p: Path): Array[Byte] = LocalFileIO.readBytes(p)
  override def inputStream(p: Path): InputStream = LocalFileIO.inputStream(p)
  override def write(p: Path, bytes: Array[Byte]): Unit = LocalFileIO.write(p, bytes)
  override def outputStream(p: Path): OutputStream = LocalFileIO.outputStream(p)
  override def delete(p: Path): Boolean = LocalFileIO.delete(p)
  override def deleteDirIfEmpty(p: Path): Unit = LocalFileIO.deleteDirIfEmpty(p)
  override def exists(p: Path): Boolean = LocalFileIO.exists(p)
  override def isDirectory(p: Path): Boolean = LocalFileIO.isDirectory(p)
  override def isFile(p: Path): Boolean = LocalFileIO.isFile(p)
  override def size(p: Path): Long = LocalFileIO.size(p)
  override def mtime(p: Path): Long = LocalFileIO.mtime(p)
  /** Virtual directories: creating one is meaningless. The no-op is the
    * point — any code path that RELIED on mkdirs (instead of put-implied
    * parents) fails loudly under this double and gets fixed. */
  override def mkdirs(p: Path): Unit = ()
  /** S3 has no set-mtime: a lease refresh is a full rewrite of the object
    * (read + put — content is immutable for lease records, so the rewrite
    * is byte-identical and racers see either stamp, never a tear).
    * CAVEAT: a rewrite racing a janitor's claim-move can RESURRECT the
    * lease after the move deleted it — the commit protocol closes that
    * window itself (seal's post-claim fence re-check; the conditional-put
    * store's lingering decision object), so touch stays simple here. */
  override def touch(p: Path, millis: Long): Unit =
    try {
      val bytes = Files.readAllBytes(p)
      Files.write(p, bytes)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(millis))
    } catch { case _: java.io.IOException => () } // claimed/vanished under us
  override def walk(root: Path)(f: Path => Unit): Unit = {
    // prefix listing: enumerate recursively
    if (!Files.exists(root)) return
    f(root)
    LocalFileIO.listDir(root).foreach { c =>
      if (Files.isDirectory(c)) walk(c)(f) else f(c)
    }
  }
}
