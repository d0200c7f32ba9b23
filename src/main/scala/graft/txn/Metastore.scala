package graft.txn

import java.nio.charset.StandardCharsets
import java.nio.file.{Path, Paths}

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import graft.model.DeltaType

/**
 * Filesystem metafile store + MVCC transactions + time travel.
 *
 * Design follows the reference's transaction layer re-expressed minimally:
 *  - metafile revisions are immutable JSON files named
 *    `<%020d rev>_<txnId>.json` (reference metafile.py:53-188
 *    MetafileRevisionInfo); a metafile's current state = highest revision
 *    whose transaction is visible.
 *  - transactions stage revisions freely, then `seal()` atomically publishes
 *    them by moving the txn record from `txn/running/` to `txn/success/`
 *    (reference transaction.py:1335-1674). Readers only honor revisions whose
 *    txn id appears in `txn/success/` — so a multi-table commit is atomic at
 *    the *catalog* level, which Delta/Iceberg per-table logs cannot do.
 *  - optimistic concurrency: at seal, if any staged revision number was also
 *    committed by a different successful txn, this txn aborts
 *    (reference metafile.py:271-368 check_for_concurrent_txn_conflict).
 *  - time travel: every success record carries `endTimeMillis`; an `asOf`
 *    read only honors txns with endTime <= asOf (transaction.py:727-766).
 *
 * All driver-side, O(metadata) — data files are written by Spark executors.
 */
object Json {
  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }
  def write(v: Any): String = mapper.writeValueAsString(v)
  def read[T](s: String, cls: Class[T]): T = mapper.readValue(s, cls)

  /** Stream-write a DeltaMeta whose entry set is too large to hold on the
    * driver: scalar fields come from `delta` (its own `entries` are
    * IGNORED), entries are emitted one at a time by the caller's push
    * stream — O(1) heap however many entries. Field order and per-entry
    * encoding match [[write]] exactly, so readers (full parse, skeleton
    * parse, foreachEntry) cannot tell which writer produced a metafile. */
  def writeDeltaStreaming(out: java.io.OutputStream, delta: DeltaMeta,
      forEachEntry: (ManifestEntry => Unit) => Unit): Unit = {
    val g = mapper.getFactory.createGenerator(out)
    g.writeStartObject()
    g.writeNumberField("streamPosition", delta.streamPosition)
    g.writeStringField("deltaType", delta.deltaType)
    g.writeFieldName("entries")
    g.writeStartArray()
    forEachEntry(e => mapper.writeValue(g, e))
    g.writeEndArray()
    g.writeStringField("txnId", delta.txnId)
    g.writeNumberField("compactedUpTo", delta.compactedUpTo)
    g.writeFieldName("properties")
    mapper.writeValue(g, delta.properties)
    g.writeEndObject()
    g.flush()
  }
}

/** A single committed transaction record. */
final case class TxnRecord(
    txnId: String,
    startTimeMillis: Long,
    endTimeMillis: Long,
    commitMessage: String,
    operations: Seq[String]) {
  def this() = this("", 0L, 0L, "", Nil) // jackson
}

/** Per-column file statistics in StatCodec canonical string form — the
  * data-skipping index (reference keeps the same min/max/null triple per
  * delta, compute/stats/models/delta_stats.py; per-FILE granularity is what
  * lets a selective read skip manifest entries at planning). */
final case class ColStat(min: String, max: String, nulls: Long) {
  def this() = this(null, null, 0L)
}

/** One file in a delta manifest — reference storage/model/manifest.py:406.
  * `stats` is per-column min/max/nulls from the parquet footer (null for
  * pre-stats manifests and non-parquet content types — readers treat a
  * missing map as "no information", never as "no rows match").
  * `uncompressedBytes` is the file's total uncompressed byte size (sum of
  * row-group totals from the same footer pass) — the manifest-cached
  * content-type parameter the reference's resource estimation reads
  * (compute/resource_estimation/manifest.py `in_memory_size_bytes`);
  * ≤ 0 means unknown (pre-round-7 manifests, non-parquet files). */
final case class ManifestEntry(path: String, sizeBytes: Long, recordCount: Long,
    stats: Map[String, ColStat] = null, uncompressedBytes: Long = -1L) {
  def this() = this("", 0L, 0L, null, -1L)
  def colStats: Map[String, ColStat] = Option(stats).getOrElse(Map.empty)
}

/** A committed delta (one write) — reference storage/model/delta.py:43. */
final case class DeltaMeta(
    streamPosition: Long,
    deltaType: String,
    entries: Seq[ManifestEntry],
    txnId: String,
    // For COMPACTED deltas: highest stream position folded into this delta.
    compactedUpTo: Long,
    properties: Map[String, String]) {
  def this() = this(0L, "", Nil, "", -1L, Map.empty)
  def typed: DeltaType = DeltaType.fromName(deltaType)
  def totalRecords: Long = entries.map(_.recordCount).sum
  def totalBytes: Long = entries.map(_.sizeBytes).sum
}

/** Namespace metadata revision — name + properties + tombstone. */
final case class NsMeta(name: String, properties: Map[String, String], dropped: Boolean) {
  def this() = this("", Map.empty, false)
  def props: Map[String, String] = Option(properties).getOrElse(Map.empty)
}

/** Table-version metadata revision — schema + schemes + properties.
  * `lifecycle` is the version's LifecycleState (reference
  * storage/model/types.py:122: created/unreleased/active/deprecated/beta/
  * deleted); absent in pre-version metafiles, which read as "active". */
final case class TableMeta(
    namespace: String,
    table: String,
    schemaJson: String,
    partitionKeys: Seq[Seq[String]],   // (field, transformName) pairs
    sortKeys: Seq[Seq[String]],        // (field, asc, nullsFirst, transformName)
    properties: Map[String, String],
    dropped: Boolean,
    lifecycle: String = "active") {
  def this() = this("", "", "", Nil, Nil, Map.empty, false, "active")
  /** Effective lifecycle — robust to pre-lifecycle JSON (null/empty). */
  def lifecycleState: String = Option(lifecycle).filter(_.nonEmpty).getOrElse("active")
}

class ConcurrentTxnConflict(msg: String) extends RuntimeException(msg)

/** Serialized state of a paused interactive transaction. */
final case class PausedStage(dir: String, rev: Long, fileName: String, content: String) {
  def this() = this("", 0L, "", "")
}
final case class PausedTxn(txnId: String, startTimeMillis: Long, commitMessage: String,
    ops: Seq[String], staged: Seq[PausedStage]) {
  def this() = this("", 0L, "", Nil, Nil)
}

/** Handle to one staged revision write (published at seal time). */
private[txn] final case class StagedWrite(dir: Path, rev: Long, fileName: String, content: String)

object Transaction {
  /** Largest stream-staged revision pause() will inline into its record. */
  val MaxPausedStageBytes: Long = 64L * 1024 * 1024
}

/**
 * A catalog-level transaction. Stage metafile revisions via the metastore,
 * then `seal()` (atomic publish) or `abort()`.
 */
final class Transaction private[txn] (val store: Metastore, val txnId: String,
    val startTimeMillis: Long, val commitMessage: String) {
  private[txn] val staged = scala.collection.mutable.ArrayBuffer[StagedWrite]()
  private[txn] val ops = scala.collection.mutable.ArrayBuffer[String]()
  @volatile private var sealed_ = false

  def isSealed: Boolean = sealed_

  def stage(dir: Path, rev: Long, suffix: String, content: String, op: String): Unit = {
    require(!sealed_, s"txn $txnId already sealed")
    val name = f"$rev%020d__${txnId}__$suffix.json"
    // Write immediately (uncommitted revisions are invisible to other txns
    // because txnId is not yet in txn/success) → read-your-writes works.
    store.io.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    staged += StagedWrite(dir, rev, name, content)
    ops += op
    // Framework-driven heartbeat: every stage refreshes the lease so a
    // long staged-write or interactive txn is never fenced by a contender
    // mid-flight merely for being older than claimFenceMillis. Callers
    // that stage nothing for long stretches can still heartbeat() manually.
    touchLease()
  }

  /** [[stage]] for revisions too large to build as one in-memory string
    * (a compaction delta copying 10^7 entries by reference): the caller
    * writes the content straight to the staged file's stream. The
    * StagedWrite records no content — [[Metastore.pauseTransaction]]
    * re-reads it from disk (the file exists from this moment on). Same
    * visibility/lease semantics as stage(). */
  def stageStreaming(dir: Path, rev: Long, suffix: String, op: String)
      (write: java.io.OutputStream => Unit): Unit = {
    require(!sealed_, s"txn $txnId already sealed")
    val name = f"$rev%020d__${txnId}__$suffix.json"
    val out = store.io.outputStream(dir.resolve(name))
    try write(out) finally out.close()
    staged += StagedWrite(dir, rev, name, null)
    ops += op
    touchLease()
  }

  /** Refresh the running-record mtime (the txn's lease) without requiring
    * the caller to invoke heartbeat() — used by stage() and the claim loop. */
  private def touchLease(): Unit =
    store.io.touch(store.runningDir.resolve(s"$txnId.json"),
      System.currentTimeMillis())

  /** Atomic publish: conflict-check staged revisions, move the txn record
    * into txn/success, then re-check (reference metafile.py:271-368
    * check_for_concurrent_txn_conflict: same revision + different txn is a
    * conflict; among uncommitted contenders the lexicographically-later txn
    * id deterministically wins). */
  def seal(): Unit = {
    require(!sealed_, s"txn $txnId already sealed")
    // A janitor may have timed this txn out while it was idle: committing
    // now would land it in BOTH failed/ and success/, and the next janitor
    // sweep would delete its committed metafiles.
    if (store.isTxnFailed(txnId)) {
      sealed_ = true
      throw new ConcurrentTxnConflict(s"txn $txnId was failed (janitor timeout?)")
    }
    // Per-revision ATOMIC claims serialize [pre-check .. publish] for each
    // staged revision. Without them there is a double-commit window: two
    // racers both pass the pre-check, the smaller id publishes and runs
    // its post-publish re-check BEFORE the larger publishes (sees nothing,
    // keeps), and the larger's re-check only looks for LARGER ids — both
    // commits survive at one revision, readers see two deltas at one
    // stream position, and the lineage-by-position join duplicates every
    // row of both files.
    //
    // A claim is a dot-DIRECTORY holding one MARKER FILE PER CONTENDER,
    // named by the contender's txn id; the holder is the FIRST-COME marker
    // (earliest creation time, txn id tiebreak) — arrival order, NOT id
    // order: a small-id txn that seals late must queue behind a larger-id
    // holder already inside its section, not steal holdership. (Even in
    // the residual same-timestamp tie, no double commit can result:
    // stage() publishes revision files while the txn is live, so either
    // racer's pre-check below sees the other's staged revision and the
    // deterministic id rule aborts one — the claims bound the window, the
    // staged-visibility pre/post checks are the correctness backstop.)
    // Reclamation only ever
    // deletes markers NAMED by txns observed failed-or-successful — both
    // states are monotonic, so no interleaving can delete a live
    // contender's marker (a single shared claim FILE would reopen the
    // double-commit window via read-then-delete on reclaim: the delete can
    // land on a LIVE claim that replaced the stale one in between).
    // Claim dirs are acquired in global sorted order (deadlock-free), are
    // invisible to readers (listRevisionFiles keeps only *.json), and all
    // markers release on EVERY exit path, exceptional ones included.
    // Liveness: a blocker that stopped heartbeating (crashed writer whose
    // record still sits in running/) is FENCED via the janitor's
    // lease-move primitive after `claimFenceMillis` idle — a write stalls
    // behind a dead writer for bounded time, not until a 24h janitor run.
    val claims = staged.map(sw => (sw.dir, sw.rev)).distinct
      .sortBy { case (d, r) => (d.toString, r) }
      .map { case (d, r) => d.resolve(f".claimd_$r%020d") }
    val held = scala.collection.mutable.ArrayBuffer[Path]()
    def releaseClaims(): Unit = {
      held.foreach { dir =>
        store.io.delete(dir.resolve(txnId))
        store.io.deleteDirIfEmpty(dir) // non-empty/racing: fine
      }
      held.clear()
    }
    def claimDirNames(dir: Path): Seq[String] =
      store.io.listDir(dir).map(_.getFileName.toString)
    // monotonic terminal states — safe to reclaim markers named by them
    def isTerminal(id: String): Boolean =
      store.io.exists(store.failedDir.resolve(s"$id.json")) ||
        store.successRecordExists(id)
    try claims.foreach { c =>
      var acquired = false
      var attempts = 0
      while (!acquired) {
        attempts += 1
        try {
          store.io.mkdirs(c) // a hint only — putIfAbsent implies the parents
          store.commitStore.putIfAbsent(c.resolve(txnId), Array.emptyByteArray) // false = already ours
        } catch { case _: java.io.IOException => () } // dir swept mid-create: retry below
        val names = claimDirNames(c)
        if (names.contains(txnId)) {
          names.filter(n => n != txnId && isTerminal(n))
            .foreach(n => store.io.delete(c.resolve(n)))
          // Mixed-version safety: a legacy single-FILE claim (.claim_<rev>)
          // held by an old-scheme writer must exclude us too, or a rolling
          // upgrade reopens the double-commit interleaving these claims
          // close. Respect a live legacy owner; reclaim terminal/unreadable.
          val legacy = c.resolveSibling(c.getFileName.toString.replaceFirst("claimd_", "claim_"))
          val legacyOwner: Option[String] =
            if (!store.io.exists(legacy)) None
            else {
              val owner = try new String(store.io.readBytes(legacy), StandardCharsets.UTF_8).trim
                catch { case _: Exception => "" }
              if (owner.isEmpty || isTerminal(owner)) { store.io.delete(legacy); None }
              else Some(owner)
            }
          val pending = claimDirNames(c).filterNot(isTerminal)
          // first-come election: earliest marker creation (nanos), id tiebreak
          // a transiently-unreadable mtime sorts EARLIEST: treating it as
          // latest would let this txn elect itself past a live holder and
          // reopen the double-commit window; a truly-deleted marker just
          // vanishes from the next listing, so liveness is unaffected
          def arrival(n: String): (Long, String) =
            (try store.io.mtime(c.resolve(n))
            catch { case _: Exception => Long.MinValue }, n)
          if (legacyOwner.isEmpty && pending.nonEmpty && pending.minBy(arrival) == txnId) {
            held += c; acquired = true
          } else {
            if (attempts % 100 == 0) { // ~1s cadence: fence dead blockers
              (pending.filter(_ != txnId) ++ legacyOwner)
                .foreach(store.fenceTxnIfStale(_, store.claimFenceMillis))
              touchLease() // we are alive and queued — don't let a peer fence US
            }
            if (attempts > 600) { // ~6s of LIVE contention — yield deterministically
              releaseClaims(); store.io.delete(c.resolve(txnId)); abort()
              throw new ConcurrentTxnConflict(
                s"txn $txnId could not claim ${c.getFileName} " +
                  s"(pending contenders: ${pending.filter(_ != txnId).take(3).mkString(",")})")
            }
            Thread.sleep(10)
          }
        } else Thread.sleep(1) // marker swept with the dir — recreate and retry
      }
    } catch {
      case e: ConcurrentTxnConflict => throw e
      case e: Throwable => // never leak markers on an unexpected failure
        releaseClaims()
        claims.foreach(c => store.io.delete(c.resolve(txnId)))
        throw e
    }
    try {
    // Pre-publish check: lose to (a) any *successful* txn that committed the
    // same revision of the same metafile, and (b) any still-uncommitted
    // contender with a lexicographically higher txn id (deterministic winner
    // — both racers agree on who yields without coordination).
    staged.foreach { sw =>
      val clash = store.listRevisionFiles(sw.dir).exists { f =>
        val (rev, tid) = Metastore.parseRevisionName(f.getFileName.toString)
        rev == sw.rev && tid != txnId && !store.isTxnFailed(tid) &&
          (store.isTxnSuccessful(tid) || tid > txnId)
      }
      if (clash) {
        abort()
        throw new ConcurrentTxnConflict(
          s"txn $txnId lost conflict on ${sw.dir}/rev ${sw.rev}")
      }
    }
    val end = store.nextTimestamp()
    val rec = TxnRecord(txnId, startTimeMillis, end, commitMessage, ops.toSeq)
    // End-time FENCING: the running record is the txn's lease, and claiming
    // it (atomic move) is the only way to publish. A janitor that fenced
    // this txn (running → failed) has already taken the file, so a stale
    // sealer — paused writer resumed after timeout, GC-stalled process —
    // loses the move race and surfaces as a conflict instead of committing
    // work the janitor is about to garbage-collect (the reference
    // acknowledges exactly this race, metafile.py:355-361).
    val running = store.runningDir.resolve(s"$txnId.json")
    val claimed = store.txnDir.resolve(s".$txnId.sealing")
    if (!store.commitStore.claim(running, claimed)) {
      staged.foreach(sw => store.io.delete(sw.dir.resolve(sw.fileName)))
      sealed_ = true
      throw new ConcurrentTxnConflict(
        s"txn $txnId was fenced before publish (janitor end-time fencing)")
    }
    // Post-claim fence re-check: on stores where a lease touch is a full
    // rewrite (object-store FileIO), a touch racing the janitor's fence
    // can RESURRECT the running record after the claim-move completed —
    // the claim we just won would then be on the resurrected ghost, and
    // publishing would ack a commit whose staged files the janitor
    // already swept (dual-terminal demotion erases it afterwards). A
    // failed record at this point is monotonic proof of the fence: yield.
    if (store.isTxnFailed(txnId)) {
      store.io.delete(claimed)
      staged.foreach(sw => store.io.delete(sw.dir.resolve(sw.fileName)))
      sealed_ = true
      throw new ConcurrentTxnConflict(
        s"txn $txnId was fenced before publish (resurrected lease)")
    }
    store.io.write(claimed, Json.write(rec).getBytes(StandardCharsets.UTF_8))
    // computed ONCE and reused by the self-demotion below: the publish rule
    // is wall-clock-dependent and must not pick a different path mid-seal
    val successRec = store.successPublishPath(txnId)
    if (!store.commitStore.claim(claimed, successRec)) {
      // a janitor swept the sealing file as crash debris mid-publish
      staged.foreach(sw => store.io.delete(sw.dir.resolve(sw.fileName)))
      sealed_ = true
      store.invalidateTxnCache()
      throw new ConcurrentTxnConflict(
        s"txn $txnId lost its sealing record before publish (janitor sweep)")
    }
    store.invalidateTxnCache()
    // Post-publish re-check: two racers may both have passed the pre-check
    // before either published. The smaller txn id demotes itself.
    val lostTo = staged.view.flatMap { sw =>
      store.listRevisionFiles(sw.dir).flatMap { f =>
        val (rev, tid) = Metastore.parseRevisionName(f.getFileName.toString)
        if (rev == sw.rev && tid > txnId && store.isTxnSuccessful(tid)) Some(tid) else None
      }
    }.headOption
    if (lostTo.isDefined) {
      // Roll back our own publish: success record → failed, staged files
      // gone. The claim-move is atomic under rename; under conditional put
      // a crash mid-transition leaves BOTH records briefly — the janitor's
      // dual-terminal reconciliation (failed wins) closes that window.
      store.commitStore.claim(successRec,
        store.failedDir.resolve(s"$txnId.json"))
      staged.foreach(sw => store.io.delete(sw.dir.resolve(sw.fileName)))
      sealed_ = true
      store.invalidateTxnCache()
      throw new ConcurrentTxnConflict(
        s"txn $txnId lost post-publish conflict to ${lostTo.get}")
    }
    sealed_ = true
    } finally releaseClaims()
  }

  /** Persist the in-flight txn state and release this handle — reference
    * interactive txn pause (transaction.py:1581). Staged revision files stay
    * on disk (still invisible: the txn id is not in txn/success). Resume
    * with `store.resumeTransaction(txnId)`. */
  def pause(): Unit = {
    require(!sealed_, s"txn $txnId already sealed")
    val rec = PausedTxn(txnId, startTimeMillis, commitMessage, ops.toSeq,
      staged.map(sw => PausedStage(sw.dir.toString, sw.rev, sw.fileName,
        // streamed stages record no content — re-read it from the staged
        // file (written at stage time, still on disk while unsealed).
        // Bounded: a stream-staged GIANT revision (the reason streaming
        // stages exist) must not be inflated into one pause-record string.
        Option(sw.content).getOrElse {
          val f = sw.dir.resolve(sw.fileName)
          val sz = store.io.size(f)
          require(sz <= Transaction.MaxPausedStageBytes,
            s"staged revision ${sw.fileName} is $sz bytes — too large to " +
              "inline in a pause record; seal or abort this transaction " +
              "instead of pausing it")
          new String(store.io.readBytes(f), StandardCharsets.UTF_8)
        })).toSeq)
    store.io.write(store.pausedDir.resolve(s"$txnId.json"),
      Json.write(rec).getBytes(StandardCharsets.UTF_8))
    store.io.delete(store.runningDir.resolve(s"$txnId.json"))
    sealed_ = true // this handle is dead; resume() returns a fresh one
  }

  /** Liveness beacon: refresh the running record so a janitor fences on
    * time-since-last-heartbeat, not time-since-start — a legitimately
    * long-running writer survives while a dead or paused-and-forgotten one
    * stays reclaimable. */
  def heartbeat(): Unit = {
    require(!sealed_, s"txn $txnId already sealed")
    store.io.touch(store.runningDir.resolve(s"$txnId.json"),
      System.currentTimeMillis())
  }

  def abort(): Unit = {
    staged.foreach(sw => store.io.delete(sw.dir.resolve(sw.fileName)))
    // claim-move: a janitor fencing this txn concurrently resolves to one
    // winner — either way the record lands in failed/
    store.commitStore.claim(store.runningDir.resolve(s"$txnId.json"),
      store.failedDir.resolve(s"$txnId.json"))
    sealed_ = true
  }
}

object Metastore {
  private[graft] def parseRevisionName(name: String): (Long, String) = {
    val base = name.stripSuffix(".json")
    val parts = base.split("__", 3)
    (parts(0).toLong, parts(1))
  }
}

final class Metastore(val root: Path,
    val commitStore: CommitStore = RenameCommitStore,
    /** Metadata-plane IO (listings, record reads/writes, leases) — see
      * [[FileIO]]. The commit primitives stay on [[commitStore]]. */
    val io: FileIO = LocalFileIO) {
  import Metastore._

  val txnDir: Path = root.resolve("txn")
  val runningDir: Path = txnDir.resolve("running")
  val successDir: Path = txnDir.resolve("success")
  val failedDir: Path = txnDir.resolve("failed")
  val pausedDir: Path = txnDir.resolve("paused")
  // a HINT on stores with real directories; writes imply their parents
  io.mkdirs(runningDir)
  io.mkdirs(successDir)
  io.mkdirs(failedDir)

  // Monotonic timestamp source: guarantees distinct, ordered commit times even
  // for commits within the same millisecond (matters for time travel tests).
  private val lastTs = new java.util.concurrent.atomic.AtomicLong(0L)
  private[txn] def nextTimestamp(): Long = {
    // Loop on CAS: a losing racer must retry, or two callers could observe
    // the same timestamp and break the distinct-ordered-commit-time guarantee.
    var t = 0L
    var done = false
    while (!done) {
      val prev = lastTs.get()
      t = math.max(System.currentTimeMillis(), prev + 1)
      done = lastTs.compareAndSet(prev, t)
    }
    t
  }

  // ---- success-log layout (round-15) ---------------------------------------
  // A flat txn/success/ made every read-after-commit O(lifetime commits):
  // the old cache keyed on the dir mtime and re-READ every record whenever
  // it ticked — at 10^6 commits on a continuously-ingesting catalog that is
  // 10^6 file opens per read-after-commit, on a cache key object stores
  // don't even have. The reference bounds exactly this by partitioning
  // success logs with an epoch-time transform (transaction.py:1335-1396;
  // types.py:85-120). Txn ids already embed a monotonic timestamp
  // (`<%020d ts>-<uuid8>`), so:
  //  - a record publishes into success/e<ts/epochMillis>/ while its id's
  //    epoch is still WRITABLE (now − epoch < FreezeLagEpochs); a stale
  //    sealer that outlived its window publishes FLAT into success/ — the
  //    flat dir is always relisted, so correctness never rests on the
  //    freeze heuristic (only boundedness does);
  //  - epoch dirs past the lag are FROZEN: read fully once, never relisted
  //    (unwritable by the publish rule above; cross-process REMOVALS from
  //    frozen epochs don't exist either — self-demotion happens
  //    milliseconds after publish, and the janitor's reconciliation ends
  //    in invalidateTxnCache);
  //  - a refresh lists only success/ itself + the ≤2 writable epoch dirs
  //    and READS only records not already cached — O(new) opens per
  //    refresh instead of O(lifetime);
  //  - [[checkpointSuccessLog]] (janitor-maintained) folds frozen + aged
  //    flat records into ONE checkpoint file, so cold start is
  //    O(checkpoint + tail) and the flat legacy listing shrinks to ~zero;
  //  - the skip-even-the-list fast path keys on [[CommitStore.dirToken]]
  //    (POSIX dir mtime in rename world; None on object stores, where the
  //    epoch-bounded LIST per refresh is the floor).

  /** One success-log epoch (1 day of commit timestamps). Shapes directory
    * fan-out only (≤366 dirs/year before the janitor folds them).
    * Tunable var (claimFenceMillis-style) so specs can exercise the
    * freeze-boundary protocol without day-long sleeps. */
  @volatile private[graft] var SuccessEpochMillis: Long = 24L * 3600 * 1000
  /** Epochs accept publishes this many epochs past their start — covers
    * any txn a default-24h janitor timeout would still admit. */
  private[graft] val FreezeLagEpochs: Long = 2L
  /** Freeze-boundary safety margin (writer AND reader side). The publish
    * rule and the freeze rule both consult wall clocks, so without a
    * margin a publisher that decided "epoch e is writable" moments before
    * the boundary can land its record AFTER a skewed/faster reader froze
    * e — and that reader never relists a frozen epoch, so the committed
    * record would stay invisible to it until the next full resync.
    * Writers route a record into its epoch dir only while the boundary is
    * ≥ this margin away (inside the margin they publish FLAT — always
    * relisted, folded later by the checkpoint, so only boundedness is
    * traded); readers freeze an epoch only once the boundary is ≥ this
    * margin PAST. Swallowing the race now needs publish latency plus
    * cross-host clock skew to exceed BOTH margins combined (2 h). */
  @volatile private[graft] var FreezeMarginMillis: Long = 3600L * 1000

  /** Reader-side freeze rule: read-once-never-relist only this far past
    * the boundary (see [[FreezeMarginMillis]]). */
  private[graft] def epochFrozen(e: Long): Boolean =
    System.currentTimeMillis() >=
      (e + FreezeLagEpochs) * SuccessEpochMillis + FreezeMarginMillis

  /** Frozen-epoch-dir backlog above which a refresh folds the success log
    * opportunistically. The janitor's checkpoint fold normally bounds the
    * dir fan-out, but a catalog whose janitor NEVER runs accumulates one
    * epoch dir per day forever — and while frozen dirs are never
    * re-listed, the root listing still walks past every one of them each
    * un-tokened refresh. The fold is crash- and concurrency-safe
    * (put-if-absent checkpoint, delete-only-what-it-covers), so running
    * it from the read path is sound; failures (e.g. a read-only
    * deployment) are swallowed and retried no sooner than
    * [[AutoFoldMinIntervalMillis]], leaving only the bounded-per-day
    * listing cost. */
  @volatile private[graft] var AutoFoldEpochDirs: Int = 16
  @volatile private[graft] var AutoFoldMinIntervalMillis: Long = 10L * 60 * 1000
  @volatile private var lastAutoFold: Long = 0L

  private[txn] def epochOf(txnId: String): Option[Long] = {
    val p = txnId.take(20)
    if (p.length == 20 && p.forall(_.isDigit)) Some(p.toLong / SuccessEpochMillis)
    else None // non-conforming id (tests, foreign tools): flat record
  }

  /** Where txnId's success record publishes NOW (writer half of the
    * freeze-margin rule — see [[FreezeMarginMillis]]). */
  private[graft] def successPublishPath(txnId: String): Path =
    epochOf(txnId) match {
      case Some(e) if System.currentTimeMillis() <
          (e + FreezeLagEpochs) * SuccessEpochMillis - FreezeMarginMillis =>
        successDir.resolve(s"e$e").resolve(s"$txnId.json")
      case _ => successDir.resolve(s"$txnId.json")
    }

  /** Every path txnId's success record may live at (publish rule + flat). */
  private[graft] def successPaths(txnId: String): Seq[Path] =
    epochOf(txnId).map(e => successDir.resolve(s"e$e").resolve(s"$txnId.json")).toSeq :+
      successDir.resolve(s"$txnId.json")

  /** Terminal probe for the seal/janitor hot loops: ≤2 existence checks +
    * the cached checkpoint id set (checkpointed ids are ancient and
    * success is monotonic, so consulting the cache is sound — a live
    * contender is never checkpoint-only). On a COLD instance the set is
    * loaded on first miss: an empty never-populated cache would report
    * folded (checkpoint-only) txns as non-terminal, leaving their claim
    * markers unreclaimed and timing out lock acquisition spuriously. */
  private[txn] def successRecordExists(txnId: String): Boolean =
    successPaths(txnId).exists(io.exists(_)) || {
      if (!ckptLoaded) successfulTxns()
      ckptIds.contains(txnId)
    }

  // ---- txn visibility ------------------------------------------------------
  @volatile private var txnCache: Map[String, TxnRecord] = Map.empty
  @volatile private var ckptIds: Set[String] = Set.empty
  @volatile private var ckptLoaded = false // has any refresh populated ckptIds?
  // all below guarded by `synchronized`
  private var needFullResync = true
  private var frozen: Map[String, TxnRecord] = Map.empty // checkpoint + frozen epochs
  private var frozenEpochSet: Set[Long] = Set.empty
  private var active: Map[String, TxnRecord] = Map.empty // flat + writable epochs
  private var tokenState: Seq[(Path, Long)] = Nil
  private var seenCkpts: Set[String] = Set.empty // cross-process fold detector
  /** Success-record file OPENS — the boundedness witness MetastoreScaleSpec
    * asserts on (a refresh after one commit must read ~1 record, not the
    * lifetime history). */
  private[graft] val successRecordReads = new java.util.concurrent.atomic.AtomicLong(0)

  /** Force a LISTING-DIFF pass on the next read (drops the token fast
    * path, keeps the incremental maps): catches every add/remove in the
    * active scope — which is all a seal, demotion, or fence can touch —
    * at O(new records) read cost. Called after every publish, so it must
    * NOT dump the incremental state (that would be the O(lifetime)
    * re-read this layout exists to kill). */
  private[graft] def invalidateTxnCache(): Unit = synchronized { tokenState = Nil }

  /** Full re-read (checkpoint + every record file): for the rare
    * mutations the incremental pass cannot see — the janitor's
    * dual-terminal reconciliation deleting records out of FROZEN epochs,
    * and checkpoint folds moving flat records into the checkpoint file.
    * Bounded by the checkpoint: O(checkpoint + tail) opens. */
  private[txn] def resyncTxnCache(): Unit = synchronized {
    needFullResync = true
    tokenState = Nil
  }

  private def readRecord(p: Path): Option[TxnRecord] =
    try {
      successRecordReads.incrementAndGet()
      Some(Json.read(new String(io.readBytes(p), StandardCharsets.UTF_8),
        classOf[TxnRecord]))
    } catch { case _: java.io.IOException => None } // demoted/folded mid-refresh

  private def readCheckpoint(p: Path): Option[Map[String, TxnRecord]] =
    try Some(Json.mapper.readValue(io.inputStream(p), classOf[Array[TxnRecord]])
      .map(r => r.txnId -> r).toMap)
    catch { case _: java.io.IOException => None }

  /** Union of EVERY readable checkpoint's records, newest winning a
    * (theoretical) id collision. Reading all of them — not just the
    * newest — keeps committed txns visible through the transient
    * multi-checkpoint states a racing fold can leave behind: an older
    * checkpoint holding records the newest lacks is never retired (see
    * the subset guard in [[checkpointSuccessLog]]), so the union is the
    * authoritative folded set. Steady state has exactly one checkpoint,
    * so this costs one read. */
  private def loadCheckpoints(ckpts: Seq[Path]): Map[String, TxnRecord] =
    ckpts.sortBy(_.getFileName.toString)
      .foldLeft(Map.empty[String, TxnRecord])((acc, p) =>
        readCheckpoint(p).map(acc ++ _).getOrElse(acc))

  /** One listing of success/ itself: legacy-flat record ids, epoch dirs
    * (number + path), checkpoint files. */
  private def successRootListing(): (Set[String], Seq[(Long, Path)], Seq[Path]) = {
    val entries = io.listDir(successDir)
    val flat = entries.flatMap { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".json") && !n.startsWith(".") && !n.startsWith("_"))
        Some(n.stripSuffix(".json")) else None
    }.toSet
    val epochs = entries.flatMap { p =>
      val n = p.getFileName.toString
      if (n.length > 1 && n.startsWith("e") && n.drop(1).forall(_.isDigit) &&
          io.isDirectory(p)) Some(n.drop(1).toLong -> p) else None
    }
    val ckpts = entries.filter(_.getFileName.toString.matches("_ckpt_\\d+\\.json"))
    (flat, epochs, ckpts)
  }

  def successfulTxns(): Map[String, TxnRecord] = synchronized {
    refreshSuccessCache()
    txnCache
  }

  private def refreshSuccessCache(): Unit = {
    // Fast path: every tracked dir's change token unchanged → nothing to
    // list. Tokens are captured BEFORE the listings they guard, so a write
    // landing mid-refresh at worst forces one extra pass next call — it
    // can never be silently absorbed into a stale token.
    if (!needFullResync && tokenState.nonEmpty &&
        tokenState.forall { case (d, t) => commitStore.dirToken(d).contains(t) })
      return
    val newTokens = scala.collection.mutable.ArrayBuffer[(Path, Option[Long])]()
    newTokens += successDir -> commitStore.dirToken(successDir)
    val (flatNames, epochDirs, ckpts) = successRootListing()
    // A checkpoint fold by ANOTHER process moves flat records out of the
    // active scope into a file the incremental pass never reloads — a
    // changed checkpoint set forces the full (checkpoint + tail) pass.
    // Names come from the root listing already in hand: zero extra I/O.
    val ckptNames = ckpts.map(_.getFileName.toString).toSet
    if (ckptNames != seenCkpts) needFullResync = true
    seenCkpts = ckptNames
    var frozenChanged = false // forces the (rare) full txnCache rebuild
    if (needFullResync) {
      frozen = loadCheckpoints(ckpts)
      ckptIds = frozen.keySet
      frozenEpochSet = Set.empty
      active = Map.empty
      needFullResync = false
      frozenChanged = true
    }
    ckptLoaded = true
    val (toFreeze, activeDirs) = epochDirs
      .filterNot { case (e, _) => frozenEpochSet(e) }
      .partition { case (e, _) => epochFrozen(e) }
    // newly-frozen epochs: read fully ONCE into the frozen map, then never
    // relist (their records leave `active` via the live-set filter below)
    toFreeze.foreach { case (e, dir) =>
      listFiles(dir).foreach(p => readRecord(p).foreach(r => frozen += r.txnId -> r))
      frozenEpochSet += e
      frozenChanged = true
    }
    // live name → path over the ACTIVE scope only
    val live = scala.collection.mutable.LinkedHashMap[String, Path]()
    flatNames.foreach(id => live(id) = successDir.resolve(s"$id.json"))
    activeDirs.foreach { case (_, dir) =>
      newTokens += dir -> commitStore.dirToken(dir)
      listFiles(dir).foreach { p =>
        val n = p.getFileName.toString
        if (!n.startsWith(".")) live(n.stripSuffix(".json")) = p
      }
    }
    // vanished actives = post-publish self-demotions (and checkpoint folds)
    val removed = active.keySet.filterNot(live.contains)
    if (removed.nonEmpty) active = active -- removed
    // read ONLY names not already cached — O(new records) per refresh
    val fresh = scala.collection.mutable.ArrayBuffer[(String, TxnRecord)]()
    live.keysIterator.foreach { id =>
      if (!active.contains(id) && !frozen.contains(id))
        readRecord(live(id)).foreach(r => fresh += id -> r)
    }
    if (fresh.nonEmpty) active = active ++ fresh
    // The published map updates INCREMENTALLY on the steady-state path —
    // rebuilding frozen ++ active per refresh is O(lifetime) map work and
    // was the measured residual (~14 ms/refresh at 10^5 commits; ~0.1 ms
    // incremental). Full rebuild only when the frozen side changed.
    txnCache =
      if (frozenChanged) frozen ++ active
      else (txnCache -- removed) ++ fresh
    tokenState =
      if (newTokens.forall(_._2.isDefined)) newTokens.map { case (d, t) => (d, t.get) }.toSeq
      else Nil // object store: no token, every refresh re-lists (bounded)
    // Opportunistic fold for janitor-less catalogs (see [[AutoFoldEpochDirs]]):
    // bounds the root-listing fan-out at O(threshold) epoch dirs. Runs
    // AFTER the cache is consistent; the fold's resync makes the next
    // refresh a (bounded) checkpoint + tail pass.
    if (epochDirs.count { case (e, _) => epochFrozen(e) } >= AutoFoldEpochDirs &&
        System.currentTimeMillis() - lastAutoFold > AutoFoldMinIntervalMillis) {
      lastAutoFold = System.currentTimeMillis()
      // SHARD mode: a read must never stall behind the cumulative
      // checkpoint rewrite (~50 s at 10^6 commits) — the janitor merges
      try checkpointSuccessLog(compact = false)
      catch { case _: Exception => () } // read-only: keep listing
    }
  }

  def isTxnSuccessful(txnId: String): Boolean = successfulTxns().contains(txnId)
  def isTxnFailed(txnId: String): Boolean = io.exists(failedDir.resolve(s"$txnId.json"))

  /** Is `txnId` visible to a reader at time `asOf` (None = latest)? Reads
    * inside `within` see their own uncommitted writes (snapshot isolation
    * read-your-writes — reference transaction.py:85-115). */
  def isVisible(txnId: String, asOf: Option[Long], within: Option[Transaction]): Boolean =
    within.exists(t => t.txnId == txnId && !t.isSealed) ||
      successfulTxns().get(txnId).exists(rec => asOf.forall(rec.endTimeMillis <= _))

  def newTransaction(commitMessage: String = ""): Transaction = {
    val id = f"${nextTimestamp()}%020d-${java.util.UUID.randomUUID().toString.take(8)}"
    val txn = new Transaction(this, id, System.currentTimeMillis(), commitMessage)
    io.write(runningDir.resolve(s"$id.json"),
      Json.write(TxnRecord(id, txn.startTimeMillis, -1L, commitMessage, Nil))
        .getBytes(StandardCharsets.UTF_8))
    txn
  }

  /** Rehydrate a paused transaction — reference txn resume
    * (transaction.py:1601). */
  def resumeTransaction(txnId: String): Transaction = {
    val p = pausedDir.resolve(s"$txnId.json")
    require(io.exists(p), s"no paused txn $txnId")
    val rec = Json.read(new String(io.readBytes(p), StandardCharsets.UTF_8), classOf[PausedTxn])
    val t = new Transaction(this, rec.txnId, rec.startTimeMillis, rec.commitMessage)
    rec.staged.foreach(ps =>
      t.staged += StagedWrite(Paths.get(ps.dir), ps.rev, ps.fileName, ps.content))
    t.ops ++= rec.ops
    io.write(runningDir.resolve(s"$txnId.json"),
      Json.write(TxnRecord(txnId, rec.startTimeMillis, -1L, rec.commitMessage, Nil))
        .getBytes(StandardCharsets.UTF_8))
    io.delete(p)
    t
  }

  /** Transaction history as records, newest first — `dc.transactions()`. */
  def history(): Seq[TxnRecord] =
    successfulTxns().values.toSeq.sortBy(-_.endTimeMillis)

  // ---- generic revision store ---------------------------------------------
  private[txn] def listRevisionFiles(dir: Path): Seq[Path] = listFiles(dir)

  private def listFiles(dir: Path): Seq[Path] =
    io.listDir(dir).filter(p => p.toString.endsWith(".json"))

  /** Per-listing visibility predicate: snapshots [[successfulTxns]] ONCE —
    * routing every file through [[isVisible]] re-enters the (cheap but not
    * free) token fast path per file, which at 10^5 revision files is
    * 10^5 × 3 directory stats per listing. Same semantics, one snapshot. */
  private def visibleIn(asOf: Option[Long], within: Option[Transaction]): String => Boolean = {
    val m = successfulTxns()
    tid => within.exists(t => t.txnId == tid && !t.isSealed) ||
      m.get(tid).exists(rec => asOf.forall(rec.endTimeMillis <= _))
  }

  /** Latest visible revision content in `dir`, with its revision number. */
  def latestVisible(dir: Path, asOf: Option[Long], within: Option[Transaction]): Option[(Long, String)] = {
    val vis = visibleIn(asOf, within)
    val candidates = listRevisionFiles(dir).flatMap { p =>
      val (rev, tid) = parseRevisionName(p.getFileName.toString)
      if (vis(tid)) Some((rev, p)) else None
    }
    if (candidates.isEmpty) None
    else {
      val (rev, p) = candidates.maxBy(_._1)
      Some((rev, new String(io.readBytes(p), StandardCharsets.UTF_8)))
    }
  }

  /** Visible revision FILES (revision + path, content unread) — lets the
    * scan planner size-gate manifest parsing before reading a byte. */
  def visibleRevisionPaths(dir: Path, asOf: Option[Long], within: Option[Transaction]): Seq[(Long, Path)] = {
    val vis = visibleIn(asOf, within)
    listRevisionFiles(dir).flatMap { p =>
      val (rev, tid) = parseRevisionName(p.getFileName.toString)
      if (vis(tid)) Some((rev, p)) else None
    }.sortBy(_._1)
  }

  /** All visible revision contents in `dir` (e.g. all deltas), ascending by rev. */
  def allVisible(dir: Path, asOf: Option[Long], within: Option[Transaction]): Seq[(Long, String)] = {
    val vis = visibleIn(asOf, within)
    listRevisionFiles(dir).flatMap { p =>
      val (rev, tid) = parseRevisionName(p.getFileName.toString)
      if (vis(tid))
        Some((rev, new String(io.readBytes(p), StandardCharsets.UTF_8)))
      else None
    }.sortBy(_._1)
  }

  /**
   * Janitor — reference compute/janitor.py:1-228: fail running transactions
   * older than `timeoutMillis` and delete every revision file staged by a
   * failed transaction anywhere under the catalog root. Returns
   * (txnsFailed, filesRemoved). Driver-side, O(metadata tree).
   */
  /** Idle threshold after which a claim-blocking writer may be fenced by a
    * contender (the janitor's lease-move, targeted). Heartbeating writers
    * refresh their running-record mtime and are never fenced. */
  @volatile var claimFenceMillis: Long = 5L * 60 * 1000

  /** Fence ONE txn iff its lease (running/paused record) has been idle
    * longer than `maxIdleMillis` — the same atomic move the janitor uses,
    * so a fenced-but-alive writer loses its later seal instead of
    * committing. Returns true if this call did the fencing. */
  private[txn] def fenceTxnIfStale(txnId: String, maxIdleMillis: Long): Boolean = {
    val candidates = Seq(runningDir.resolve(s"$txnId.json"),
      pausedDir.resolve(s"$txnId.json")).filter(io.exists(_))
    candidates.exists { p =>
      val stale =
        try {
          val rec = Json.read(new String(io.readBytes(p), StandardCharsets.UTF_8),
            classOf[TxnRecord])
          val last = math.max(rec.startTimeMillis, io.mtime(p))
          System.currentTimeMillis() - last > maxIdleMillis
        } catch { case _: Exception => false }
      stale && {
        // claim-move: a concurrently-sealing writer that claims the record
        // first wins; a fenced one loses its later seal
        val won = commitStore.claim(p, failedDir.resolve(p.getFileName))
        if (won) invalidateTxnCache()
        won
      }
    }
  }

  /** All per-txn success record FILES (flat + every epoch dir; checkpoint
    * files excluded) — janitor-only full enumeration. */
  private def listSuccessRecordFiles(): Seq[Path] = {
    val (flatNames, epochDirs, _) = successRootListing()
    flatNames.toSeq.map(id => successDir.resolve(s"$id.json")) ++
      epochDirs.flatMap { case (_, d) => listFiles(d) }
  }

  /** Fold aged success records into ONE checkpoint file
    * (`success/_ckpt_<%020d maxEndTime>.json`, a JSON array of TxnRecord)
    * so catalog cold start costs O(checkpoint + tail) file opens instead
    * of O(lifetime commits), and the always-relisted flat legacy dir
    * shrinks to ~nothing — Delta's checkpoint idea applied to the
    * catalog-level txn log (the reference's janitor keeps its log dirs
    * bounded the same way, compute/janitor.py). Folds the previous
    * checkpoint, every record in FROZEN epoch dirs, and flat records aged
    * past the freeze lag; skips ids with a failed record (dual-terminal
    * demotion wins — run after [[janitor]]'s reconciliation, which is why
    * the janitor calls this LAST).
    *
    * Crash/concurrency-safe without coordination: the checkpoint is
    * put-if-absent under a content-deterministic name, per-txn files are
    * deleted only when present in the checkpoint actually ON DISK, and a
    * crash between steps leaves only duplication the loader tolerates
    * (map union of identical records). Superseded checkpoints are retired
    * only after the new one exists. Returns #records newly folded. */
  /** `compact = true` (the janitor): fold candidates AND merge every
    * checkpoint shard into one, retiring covered shards — the full
    * rewrite costs ~65 µs/record (BENCH_NOTES r16: 50 s at 10^6), which a
    * daily janitor can afford. `compact = false` (the refresh-path
    * auto-fold): write ONLY the fresh candidates as a NEW shard and let
    * the union loader serve the set — bounded by O(candidates), so a
    * READ never stalls behind a cumulative rewrite; the next janitor
    * merges the shards. Both modes preserve the no-loss invariants:
    * put-if-absent shards, delete-only-what-is-covered, subset-guarded
    * retirement, union loader. */
  def checkpointSuccessLog(compact: Boolean = true): Int = synchronized {
    val (flatNames, epochDirs, ckpts) = successRootListing()
    val frozenDirs = epochDirs.filter { case (e, _) => epochFrozen(e) }
    val candFiles = scala.collection.mutable.ArrayBuffer[Path]()
    frozenDirs.foreach { case (_, d) => candFiles ++= listFiles(d) }
    flatNames.foreach { id =>
      if (epochOf(id).exists(epochFrozen)) candFiles += successDir.resolve(s"$id.json")
    }
    // a compacting fold with multiple shards on disk still merges them
    // even when no new candidate arrived (shards left by read-path folds)
    if (candFiles.isEmpty && (!compact || ckpts.size <= 1)) return 0
    val cands = candFiles.flatMap(readRecord)
      .filter(r => !io.exists(failedDir.resolve(s"${r.txnId}.json")))
      .map(r => r.txnId -> r).toMap
    if (cands.isEmpty && (!compact || ckpts.size <= 1)) return 0
    if (!compact) {
      // SHARD fold: O(candidates) reads + one shard write. `known` ids are
      // covered by SOME on-disk checkpoint forever (retirement is
      // subset-guarded), so skipping them cannot lose records; writing a
      // duplicate a stale `known` missed is harmless (union of identical
      // records) and the janitor's merge dedups it.
      val known = ckptIds
      val fresh = cands.filter { case (id, _) => !known.contains(id) }
      var written = Set.empty[String]
      if (fresh.nonEmpty) {
        var stamp = fresh.values.map(_.endTimeMillis).max
        var t = successDir.resolve(f"_ckpt_$stamp%020d.json")
        var settled = false
        while (!settled) {
          if (commitStore.putIfAbsent(t,
              Json.write(fresh.values.toArray).getBytes(StandardCharsets.UTF_8))) {
            written = fresh.keySet; settled = true
          } else {
            val existing = readCheckpoint(t).map(_.keySet).getOrElse(Set.empty)
            if (fresh.keySet.subsetOf(existing)) { written = fresh.keySet; settled = true }
            else { stamp += 1; t = successDir.resolve(f"_ckpt_$stamp%020d.json") }
          }
        }
      }
      val covered = known ++ written
      var foldedNew = 0
      candFiles.foreach { p =>
        val id = p.getFileName.toString.stripSuffix(".json")
        if (covered.contains(id) && io.delete(p) && !known.contains(id)) foldedNew += 1
      }
      frozenDirs.foreach { case (_, d) => io.deleteDirIfEmpty(d) }
      ckptIds = ckptIds ++ written
      resyncTxnCache()
      return foldedNew
    }
    val prev = loadCheckpoints(ckpts)
    // a racing fold may have merged AND retired every listed checkpoint
    // between our root listing and the loads — with zero candidates too,
    // there is nothing to fold (the racer's output covers it)
    if (prev.isEmpty && cands.isEmpty) return 0
    // Name = max folded endTime — but a LATE-arriving record older than a
    // previous fold's max (a stale sealer's flat publish) would reproduce
    // an existing name and put-if-absent would refuse forever; bump the
    // stamp until either our put lands or an on-disk checkpoint already
    // covers every id we hold. On EVERY iteration, re-list and merge all
    // readable checkpoints into the fold set first: a concurrent fold may
    // cover records whose per-txn files it already deleted (our candidate
    // reads swallowed those as missing), and publishing a NEWER checkpoint
    // without them — name collision or not — would permanently lose
    // committed txns once the older checkpoint is retired.
    var all = prev ++ cands
    var stamp = all.values.map(_.endTimeMillis).max
    var onDisk = Map.empty[String, TxnRecord]
    var target: Path = null
    var settled = false
    while (!settled) {
      val disk = successRootListing()._3
      all = loadCheckpoints(disk) ++ all
      stamp = math.max(stamp, all.values.map(_.endTimeMillis).max)
      val diskNames = disk.map(_.getFileName.toString).toSet
      val newest = disk.sortBy(_.getFileName.toString).lastOption
      val newestContent = newest.flatMap(readCheckpoint).getOrElse(Map.empty)
      if (newest.isDefined && all.keySet.subsetOf(newestContent.keySet)) {
        // a racer's fold already covers everything we hold
        onDisk = newestContent; target = newest.get; settled = true
      } else {
        var t = successDir.resolve(f"_ckpt_$stamp%020d.json")
        while (diskNames.contains(t.getFileName.toString)) {
          stamp += 1; t = successDir.resolve(f"_ckpt_$stamp%020d.json")
        }
        if (commitStore.putIfAbsent(t,
            Json.write(all.values.toArray).getBytes(StandardCharsets.UTF_8))) {
          onDisk = all; target = t; settled = true
        } // else: a racer minted the same fresh name between our listing
          // and the put — loop, which re-merges its content
      }
    }
    // fold step: delete ONLY files covered by the checkpoint on disk — a
    // lost putIfAbsent race deletes only what the winner's content covers
    var foldedNew = 0
    candFiles.foreach { p =>
      val id = p.getFileName.toString.stripSuffix(".json")
      if (onDisk.contains(id) && io.delete(p)) {
        if (!prev.contains(id)) foldedNew += 1
      }
    }
    frozenDirs.foreach { case (_, d) => io.deleteDirIfEmpty(d) }
    // Retire superseded checkpoints ONLY when the surviving one covers
    // their ids — an older checkpoint holding records the newest lacks
    // (left by a fold racing this one) must stay readable, or its
    // committed txns vanish (the union loader keeps them visible until a
    // later fold absorbs the older file and THEN retires it).
    successRootListing()._3
      .filter(p => p.getFileName.toString < target.getFileName.toString)
      .foreach(p => readCheckpoint(p).foreach { content =>
        if (content.keySet.subsetOf(onDisk.keySet)) io.delete(p)
      })
    // monotonic: folded ids stay terminal-probe-visible before the resync
    ckptIds = ckptIds ++ onDisk.keySet
    // full resync: folded FLAT records left the active scope but live only
    // in the checkpoint, which the incremental pass never reloads
    resyncTxnCache()
    foldedNew
  }

  def janitor(timeoutMillis: Long = 24L * 3600 * 1000): (Int, Int) = {
    val now = System.currentTimeMillis()
    var failed = 0
    // Paused txns are just as abandonable as running ones.
    val paused = listFiles(pausedDir)
    (listFiles(runningDir) ++ paused).foreach { p =>
      try {
        val rec = Json.read(new String(io.readBytes(p), StandardCharsets.UTF_8), classOf[TxnRecord])
        // last activity = heartbeat (record mtime) or start, whichever is
        // newer: heartbeating writers stay alive past the timeout; the move
        // is the FENCE — a concurrently-sealing writer that claims the
        // record first wins, and a fenced one loses its later seal
        val lastActivity = math.max(rec.startTimeMillis, io.mtime(p))
        if (now - lastActivity > timeoutMillis) {
          // claim-move: losing to a concurrent sealer (or another janitor)
          // is fine — exactly one outcome survives either way
          if (commitStore.claim(p, failedDir.resolve(p.getFileName))) failed += 1
        }
      } catch {
        // vanished between the listing and the read: the txn sealed,
        // aborted, or was fenced by a racer — terminal either way,
        // nothing left to fence (found by the fold-torture leg)
        case _: java.nio.file.NoSuchFileException => ()
        case _: java.io.FileNotFoundException => ()
        case _: java.io.IOException =>
          // CORRUPT record (partial write from a crashed process on a
          // non-atomic store): parse errors must not skip silently — the
          // dead txn's claim markers and staged files would leak forever.
          // Fence on file age alone; the claim-move is still the fence,
          // so a racing live sealer keeps winning.
          val idle = try now - io.mtime(p) catch { case _: Exception => -1L }
          if (idle > timeoutMillis &&
              commitStore.claim(p, failedDir.resolve(p.getFileName))) failed += 1
      }
    }
    // Crash debris in the publish protocol itself. (a) A sealer that died
    // between its two transitions leaves `.<txnId>.sealing` with the txn in
    // neither running/ nor a terminal state — fence it to failed once idle
    // past the claim threshold (a LIVE sealer is milliseconds wide there,
    // and one swept mid-publish surfaces a clean conflict, not a tear).
    // (b) A completed claim's decision object (`.*.moved` with its source
    // gone) is plain debris.
    val debrisAge = math.max(timeoutMillis, claimFenceMillis)
    def sweepDir(d: Path): Unit = {
      io.listDir(d).foreach { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".moved")) {
          // only sweep AGED decisions: a fresh one may still be shielding
          // an in-flight claim (a claimer that pre-read the source before
          // it vanished must keep losing the decision election, or it
          // could re-elect itself and produce a second terminal record)
          val src = p.resolveSibling(n.stripPrefix(".").stripSuffix(".moved"))
          val idle = try now - io.mtime(p)
            catch { case _: Exception => -1L }
          if (!io.exists(src) && idle > debrisAge) io.delete(p)
        } else if (n.startsWith(".") && n.endsWith(".sealing")) {
          val id = n.stripPrefix(".").stripSuffix(".sealing")
          val idle = try now - io.mtime(p)
            catch { case _: Exception => -1L }
          if (idle > debrisAge &&
              !successRecordExists(id) &&
              !io.exists(failedDir.resolve(s"$id.json")) &&
              commitStore.claim(p, failedDir.resolve(s"$id.json")))
            failed += 1
        }
      }
    }
    // successDir (and its epoch subdirs) are claim SOURCES too
    // (post-publish self-demotion), so completed decisions land there;
    // terminal `<txnId>.json` records match neither debris pattern and
    // are untouched.
    val successEpochDirs = successRootListing()._2.map(_._2)
    (Seq(txnDir, runningDir, pausedDir, successDir) ++ successEpochDirs).foreach(sweepDir)
    // Dual-terminal reconciliation: a txn in BOTH success/ and failed/ can
    // only come from a post-publish self-demotion that crashed between its
    // two steps — the demotion intent (failed) wins, matching the conflict
    // rule that triggered it; without this, isTxnSuccessful/isTxnFailed
    // would disagree forever while the sweep below reclaims the files.
    val successIds: Set[String] = listSuccessRecordFiles()
      .map(_.getFileName.toString.stripSuffix(".json")).toSet
    listFiles(failedDir).map(_.getFileName.toString.stripSuffix(".json"))
      .filter(successIds).foreach { id =>
        successPaths(id).foreach(io.delete(_))
        // full resync: the deleted record may sit in a FROZEN epoch the
        // incremental pass never relists
        resyncTxnCache()
      }
    val failedIds: Set[String] =
      listFiles(failedDir).map(_.getFileName.toString.stripSuffix(".json")).toSet
    var removed = 0
    def isTerminalId(id: String): Boolean =
      io.exists(failedDir.resolve(s"$id.json")) || successRecordExists(id)
    // The tree walk is gated on failed txns existing — a healthy catalog's
    // janitor cycle stays O(txn dirs), not O(catalog tree). Claim debris
    // from a success-crash (publish succeeded, release did not) lingers
    // only until any txn anywhere fails or its (dir, rev) is contended
    // again — both of which reclaim it.
    if (failedIds.nonEmpty) {
      val claimDirs = scala.collection.mutable.ArrayBuffer[Path]()
      val orphanDirs = scala.collection.mutable.ArrayBuffer[Path]()
      io.walk(root) { p =>
        val n = p.getFileName.toString
        if (n.startsWith(".claimd_") && io.isDirectory(p)) claimDirs += p
        else if (n.startsWith(".claim_") && io.isFile(p)) {
          // legacy single-file claim from the pre-directory scheme
          val owner = try new String(io.readBytes(p), StandardCharsets.UTF_8)
            catch { case _: Exception => "" }
          if (owner.isEmpty || isTerminalId(owner)) { io.delete(p); removed += 1 }
        } else if (failedIds.nonEmpty &&
            n.endsWith(".json") && n.contains("__") && io.isFile(p) &&
            !p.startsWith(txnDir)) {
          val parts = n.stripSuffix(".json").split("__", 3)
          if (parts.length == 3 && failedIds.contains(parts(1))) {
            io.delete(p); removed += 1
          }
        } else if (failedIds.nonEmpty &&
            io.isDirectory(p) && n.startsWith("d") && n.contains("__") &&
            failedIds.contains(n.split("__", 2)(1))) {
          // Orphaned data dir written by a failed txn (d<rev>__<txnId>).
          orphanDirs += p
        }
      }
      claimDirs.foreach { cd =>
        io.listDir(cd).map(_.getFileName.toString).filter(isTerminalId).foreach { m =>
          io.delete(cd.resolve(m)); removed += 1
        }
        io.deleteDirIfEmpty(cd) // non-empty: live
      }
      orphanDirs.foreach { d =>
        val files = scala.collection.mutable.ArrayBuffer[Path]()
        io.walk(d)(files += _)
        files.reverseIterator.foreach { f =>
          if (io.delete(f)) removed += 1
        }
      }
    }
    // LAST (after dual-terminal reconciliation, so a demoted id can never
    // be folded): keep the success log bounded.
    checkpointSuccessLog()
    invalidateTxnCache()
    (failed, removed)
  }

  /** Next revision based on the *visible* snapshot (successful txns plus the
    * caller's own staged writes). Counting uncommitted strangers' files would
    * let two concurrent writers silently serialize into a lost update; basing
    * on the snapshot makes them collide on the same revision so the seal-time
    * conflict check can abort the loser. */
  def nextRevision(dir: Path, within: Option[Transaction] = None): Long =
    listRevisionFiles(dir).flatMap { p =>
      val (rev, tid) = parseRevisionName(p.getFileName.toString)
      if (isTxnSuccessful(tid) || within.exists(t => t.txnId == tid && !t.isSealed)) Some(rev)
      else None
    }.foldLeft(0L)(math.max) + 1L
}
