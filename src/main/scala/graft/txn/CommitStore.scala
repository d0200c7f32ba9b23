package graft.txn

import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

/**
 * Commit-protocol seam: the two atomic primitives the metastore's publish
 * path needs, abstracted over the storage system's consistency model.
 *
 * The decisive transitions in the commit protocol — sealer claims the
 * running record, janitor fences it to failed, publish lands the success
 * record — are all "exactly one winner takes the lease file". On
 * POSIX/HDFS an atomic rename provides that directly
 * ([[RenameCommitStore]], the default). S3-semantics object stores have no
 * rename, but every major one has a CONDITIONAL PUT (S3 `If-None-Match: *`,
 * GCS `ifGenerationMatch=0`, ADLS `If-None-Match`), which is enough:
 * [[ConditionalPutCommitStore]] elects the winner through a per-source
 * decision object created with put-if-absent, so two movers of the same
 * lease to DIFFERENT destinations (the sealer-vs-janitor race) still
 * resolve to exactly one winner. The reference assumes a
 * filesystem/rename world outright (its transaction publish is an
 * `os.rename`-style move); this seam is the 100 TB-on-S3 hardening on top.
 */
trait CommitStore {

  /** Create `path` with `content` iff it does not already exist.
    * Returns true iff THIS call created it. */
  def putIfAbsent(path: Path, content: Array[Byte]): Boolean

  /** Claim-move `src` → `dst`: of all concurrent claimers of the same
    * `src` (each possibly naming a different `dst`), EXACTLY ONE returns
    * true and its `dst` holds the content; every loser returns false and
    * `src` is gone once the transition completes. Loser destinations are
    * never created. */
  def claim(src: Path, dst: Path): Boolean

  /** Cheap change token for a directory's DIRECT children, or None when
    * the store has no reliable one: the caller must re-list to detect
    * change. POSIX/HDFS expose a directory mtime that ticks on any direct
    * add/remove (rename world); S3-semantics stores have no directories
    * at all, so there is nothing cheaper than a LIST — the success-log
    * reader bounds that LIST with epoch partitioning instead (round-15,
    * the "dir-mtime cache key object stores don't honor" fix lives at
    * this seam, not in the metastore). */
  def dirToken(dir: Path): Option[Long]
}

object CommitStore {
  /** Spark-conf-driven selection (`graft.commitStore` = `rename` |
    * `conditional-put`), so surfaces that construct their own catalog —
    * DSv2/SQL, streaming — honor the object-store protocol without code
    * changes. Default: rename (correct on POSIX/HDFS). */
  def fromConf(spark: org.apache.spark.sql.SparkSession): CommitStore =
    spark.conf.getOption("graft.commitStore") match {
      case Some("conditional-put") => new ConditionalPutCommitStore
      case Some("rename") | None => RenameCommitStore
      case Some(other) => throw new IllegalArgumentException(
        s"graft.commitStore=$other (expected rename | conditional-put)")
    }
}

/** POSIX/HDFS implementation: an atomic no-replace rename IS the election.
  * Correct wherever rename is atomic (local fs, HDFS, most NFS); unsafe on
  * S3-semantics stores — use [[ConditionalPutCommitStore]] there. */
object RenameCommitStore extends CommitStore {
  override def putIfAbsent(path: Path, content: Array[Byte]): Boolean =
    try {
      Files.createDirectories(path.getParent)
      Files.write(path, content, StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  override def claim(src: Path, dst: Path): Boolean =
    try {
      Files.createDirectories(dst.getParent)
      Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      case _: java.nio.file.NoSuchFileException => false // another claimer won
      case _: java.nio.file.FileAlreadyExistsException =>
        // same-destination race (two janitors fencing one txn): the other
        // fencer's outcome is ours too — drop the source if it lingers
        Files.deleteIfExists(src)
        false
    }

  // nanos, not millis: coarse-granularity filesystems alias two changes
  // inside one tick; nanos is the finest the API exposes
  override def dirToken(dir: Path): Option[Long] =
    try Some(Files.getLastModifiedTime(dir)
      .to(java.util.concurrent.TimeUnit.NANOSECONDS))
    catch { case _: Exception => None }
}

/**
 * Object-store implementation: built ONLY from conditional-put + read +
 * unconditional delete — the operations S3-semantics stores actually have.
 * No rename anywhere.
 *
 * `claim(src, dst)` protocol (per-source decision object):
 *   1. read `src` (lease content is immutable once written — only its
 *      mtime is refreshed by heartbeats, so a pre-read never goes stale);
 *   2. put-if-absent the DECISION object `.<src>.moved` recording `dst` —
 *      of all racers, the store accepts exactly one;
 *   3. the winner writes `dst` and deletes `src`;
 *   4. a loser (or any later claimer) HELPS COMPLETE the recorded
 *      transition — copies `src` to the recorded destination if the winner
 *      crashed mid-move, then deletes `src` — and returns false. The
 *      protocol is lock-free: any participant can finish any winner's move.
 *
 * Decision objects are debris once `src` is gone; the janitor sweeps them.
 * Simulated here over the local filesystem through the same primitive set
 * (tests inject crash windows between steps via [[afterDecisionHook]]).
 */
class ConditionalPutCommitStore extends CommitStore {

  /** Test seam: runs after the decision object is won, before the
    * destination write — a crash here must be recoverable by helpers. */
  protected def afterDecisionHook(): Unit = ()

  override def putIfAbsent(path: Path, content: Array[Byte]): Boolean =
    try {
      Files.createDirectories(path.getParent)
      // CREATE_NEW is the filesystem spelling of `If-None-Match: *`
      Files.write(path, content, StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  /** No token: object stores have no directory metadata, so any cached
    * token would be exactly the unhonored dir-mtime key this seam exists
    * to remove — callers fall back to a (epoch-bounded) LIST per read. */
  override def dirToken(dir: Path): Option[Long] = None

  /** The per-source decision object naming the elected destination. */
  private[txn] def decisionKey(src: Path): Path =
    src.resolveSibling("." + src.getFileName.toString + ".moved")

  /** Complete a recorded transition whose winner may have crashed:
    * materialize the recorded destination from `src` if still needed, then
    * drop `src`. Safe to run concurrently (destination is put-if-absent). */
  private def helpComplete(src: Path, decision: Path): Unit = {
    // A real conditional PUT is atomic (the object appears with its full
    // content); the local-filesystem simulation can expose a just-created
    // decision before its bytes land — re-read briefly instead of acting
    // on a torn empty read.
    var content: String = null
    var tries = 0
    while (content == null && tries < 100) {
      tries += 1
      content =
        try {
          val c = new String(Files.readAllBytes(decision), "UTF-8")
          if (c.nonEmpty) c else { Thread.sleep(1); null }
        } catch { case _: java.nio.file.NoSuchFileException => return } // swept: done
    }
    if (content == null) return
    val recorded = java.nio.file.Paths.get(content)
    if (Files.exists(src)) {
      try putIfAbsent(recorded, Files.readAllBytes(src))
      catch { case _: java.nio.file.NoSuchFileException => () } // completed under us
      Files.deleteIfExists(src)
    }
  }

  override def claim(src: Path, dst: Path): Boolean = {
    val decision = decisionKey(src)
    val content =
      try Files.readAllBytes(src)
      catch {
        case _: java.nio.file.NoSuchFileException =>
          // src already gone: either a prior transition completed, or one
          // is mid-flight — help it along, then report "lost"
          if (Files.exists(decision)) helpComplete(src, decision)
          return false
      }
    if (putIfAbsent(decision, dst.toString.getBytes("UTF-8"))) {
      // Post-election re-check: if the source vanished between our pre-read
      // and the election, a PRIOR transition completed and its (aged)
      // decision was already swept — our fresh decision is a bogus
      // re-election that would mint a SECOND terminal record from stale
      // content. Withdraw it and lose. (A decision is only ever swept once
      // its source is gone, so source-present + decision-absent at the
      // moment we won proves no other transition is in flight.)
      if (!Files.exists(src)) {
        // ...unless a helper already completed OUR recorded move (it read
        // this very decision): the transition happened, we won it.
        if (Files.exists(dst)) return true
        Files.deleteIfExists(decision)
        return false
      }
      afterDecisionHook()
      putIfAbsent(dst, content) // fresh destination; absent unless a helper beat us
      Files.deleteIfExists(src)
      true
    } else {
      helpComplete(src, decision)
      false
    }
  }
}
