package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.catalog._
import graft.model._
import graft.txn.ConcurrentTxnConflict

/** MVCC under real contention: concurrent writers racing on the same table
  * must never lose an update — losers abort cleanly and succeed on retry. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("eight concurrent writers, optimistic retry, zero lost updates") {
    val cat = new GraftCatalog(spark, tmpDir("graft-conc"))
    cat.createTable("c.t", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("writer", org.apache.spark.sql.types.IntegerType),
      FieldMeta.field("attempt", org.apache.spark.sql.types.IntegerType))))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writers = 8
    try {
      val futures = (1 to writers).map { w =>
        Future {
          var attempt = 0
          var done = false
          while (!done) {
            attempt += 1
            try {
              cat.writeToTable(Seq((w, attempt)).toDF("writer", "attempt"),
                "c.t", WriteMode.Add)
              done = true
            } catch {
              case _: ConcurrentTxnConflict =>
                Thread.sleep(scala.util.Random.nextInt(30).toLong)
            }
          }
          attempt
        }
      }
      val attempts = Await.result(Future.sequence(futures), 5.minutes)
      // Every writer committed exactly once; nothing lost, nothing doubled.
      val rows = cat.readTable("c.t").collect()
        .map(r => (r.getInt(0), r.getInt(1)))
      assert(rows.length == writers, s"expected $writers rows, got ${rows.toSeq}")
      assert(rows.map(_._1).toSet == (1 to writers).toSet)
      // NOTE: no assert that a conflict actually happened — under a loaded
      // machine the 8 writers can serialize naturally and zero retries is a
      // legitimate outcome; asserting scheduling behavior made this flaky.
      // Delta log: one committed delta per writer, distinct stream positions.
      val log = cat.deltaLog("c.t")
      assert(log.size == writers)
      assert(log.map(_.streamPosition).distinct.size == writers)
    } finally pool.shutdown()
  }

  test("publish is atomic per revision: no double commit under heavy contention") {
    // Regression for the double-commit window the revision claims close:
    // without them, two racers could BOTH survive at one revision and the
    // lineage-by-position join would duplicate every row of both files.
    val cat = new GraftCatalog(spark, tmpDir("graft-conc2"))
    cat.createTable("c.s", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("writer", org.apache.spark.sql.types.IntegerType),
      FieldMeta.field("round", org.apache.spark.sql.types.IntegerType))))
    val pool = Executors.newFixedThreadPool(12)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writers = 12
    val rounds = 3
    try {
      val futures = for (w <- 1 to writers; r <- 1 to rounds) yield Future {
        var done = false
        while (!done) {
          try {
            cat.writeToTable(Seq((w, r)).toDF("writer", "round"), "c.s", WriteMode.Add)
            done = true
          } catch { case _: ConcurrentTxnConflict => Thread.sleep(1) }
        }
      }
      Await.result(Future.sequence(futures), 5.minutes)
      val log = cat.deltaLog("c.s")
      assert(log.size == writers * rounds, s"expected ${writers * rounds} deltas, got ${log.size}")
      assert(log.map(_.streamPosition).distinct.size == log.size,
        s"DUPLICATE stream positions: ${log.map(_.streamPosition).groupBy(identity).filter(_._2.size > 1).keys}")
      assert(cat.readTable("c.s").count() == writers * rounds)
    } finally pool.shutdown()
  }

  test("end-time fencing: a fenced writer's stale seal is a conflict, not a commit") {
    val ms = new graft.txn.Metastore(java.nio.file.Paths.get(tmpDir("graft-fence")))
    val dir = java.nio.file.Paths.get(tmpDir("graft-fence-data"))

    // 1. a paused-and-forgotten txn is fenced by the janitor; resume refuses
    val t1 = ms.newTransaction("will-be-fenced-paused")
    t1.stage(dir, 1L, "a", """{"v":1}""", "write")
    t1.pause()
    Thread.sleep(5)
    val (fenced1, _) = ms.janitor(timeoutMillis = 0)
    assert(fenced1 >= 1)
    val e1 = intercept[IllegalArgumentException](ms.resumeTransaction(t1.txnId))
    assert(e1.getMessage.contains("no paused txn"))

    // 2. a RUNNING txn fenced mid-flight: its later seal must lose the
    // claim race and surface as a conflict — and commit nothing
    val t2 = ms.newTransaction("will-be-fenced-running")
    t2.stage(dir, 2L, "b", """{"v":2}""", "write")
    Thread.sleep(5)
    ms.janitor(timeoutMillis = 0)
    val e2 = intercept[ConcurrentTxnConflict](t2.seal())
    assert(e2.getMessage.contains("fenced") || e2.getMessage.contains("failed"))
    assert(!ms.isTxnSuccessful(t2.txnId))
    assert(ms.isTxnFailed(t2.txnId))
    // its staged revision is gone (or at worst janitor-reclaimable)
    assert(ms.latestVisible(dir, None, None).isEmpty)

    // 2b. the TOCTOU window itself: fencer claims the running record AFTER
    // the sealer's pre-publish check would pass (simulated by taking the
    // lease file directly) — the seal's atomic claim must lose and refuse
    val t2b = ms.newTransaction("fenced-inside-window")
    t2b.stage(dir, 20L, "b2", """{"v":20}""", "write")
    java.nio.file.Files.delete(
      ms.runningDir.resolve(s"${t2b.txnId}.json")) // fencer took the lease
    val e2b = intercept[ConcurrentTxnConflict](t2b.seal())
    assert(e2b.getMessage.contains("fenced"))
    assert(!ms.isTxnSuccessful(t2b.txnId))
    assert(ms.latestVisible(dir, None, None).isEmpty)

    // 3. heartbeats keep a slow writer alive past the start-time timeout
    val t3 = ms.newTransaction("slow-but-alive")
    t3.stage(dir, 3L, "c", """{"v":3}""", "write")
    Thread.sleep(60)
    t3.heartbeat()
    val (fenced3, _) = ms.janitor(timeoutMillis = 50)
    assert(fenced3 == 0, "heartbeating txn must not be fenced")
    t3.seal()
    assert(ms.isTxnSuccessful(t3.txnId))
    assert(ms.latestVisible(dir, None, None).exists(_._2.contains("\"v\":3")))
  }

  test("a dead writer's claim marker is fenced by a contender; the write proceeds") {
    val ms = new graft.txn.Metastore(java.nio.file.Paths.get(tmpDir("graft-claim")))
    val dir = ms.root.resolve("tbl") // under root: the janitor sweep walks root
    // dead writer: running record idle past the fence threshold, holding a
    // claim marker at the revision the next writer will take (a crash
    // between marker creation and release)
    val dead = ms.newTransaction("crashed mid-seal")
    val rec = ms.runningDir.resolve(s"${dead.txnId}.json")
    // backdate BOTH liveness signals: record start time and file mtime
    java.nio.file.Files.write(rec, graft.txn.Json.write(graft.txn.TxnRecord(
      dead.txnId, System.currentTimeMillis() - 3600 * 1000, -1L, "crashed", Nil))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.setLastModifiedTime(rec,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600 * 1000))
    val claimDir = dir.resolve(f".claimd_${1L}%020d")
    java.nio.file.Files.createDirectories(claimDir)
    java.nio.file.Files.write(claimDir.resolve(dead.txnId), Array.emptyByteArray)
    // backdate the txn's own start time so mtime is the only liveness signal
    val old = ms.claimFenceMillis
    ms.claimFenceMillis = 1000L
    try {
      val live = ms.newTransaction("live contender")
      live.stage(dir, 1L, "x", """{"v":1}""", "write")
      live.seal() // must fence the dead blocker (not spin into a conflict)
      assert(ms.isTxnSuccessful(live.txnId))
      assert(ms.isTxnFailed(dead.txnId), "dead blocker should have been fenced")
      assert(ms.latestVisible(dir, None, None).exists(_._2.contains("\"v\":1")))
    } finally ms.claimFenceMillis = old
    // a LIVE (recent-heartbeat) blocker is NOT fenced: contender yields.
    // The contender deliberately has the SMALLER txn id — holder election
    // is FIRST-COME (marker creation order), not id order, or a late
    // small-id sealer would steal holdership from a larger-id holder
    // already inside its section.
    val loser = ms.newTransaction("yields to live holder despite smaller id")
    val holder = ms.newTransaction("live holder, larger id")
    assert(loser.txnId < holder.txnId)
    val claim2 = dir.resolve(f".claimd_${2L}%020d")
    java.nio.file.Files.createDirectories(claim2)
    java.nio.file.Files.write(claim2.resolve(holder.txnId), Array.emptyByteArray)
    // force a strictly-earlier arrival regardless of filesystem timestamp
    // granularity (a 5ms sleep ties on coarse-mtime kernels/filesystems)
    java.nio.file.Files.setLastModifiedTime(claim2.resolve(holder.txnId),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000))
    loser.stage(dir, 2L, "y", """{"v":2}""", "write")
    val e = intercept[ConcurrentTxnConflict](loser.seal())
    assert(e.getMessage.contains("could not claim"))
    assert(!ms.isTxnFailed(holder.txnId), "live holder must not be fenced")
    // ...and once the holder is gone (fenced by the janitor), its marker
    // and the claim dir are janitor-swept debris
    ms.janitor(timeoutMillis = 0)
    assert(ms.isTxnFailed(holder.txnId))
    ms.janitor(timeoutMillis = 0)
    assert(!java.nio.file.Files.exists(claim2), "claim debris must be swept")
  }

  test("conditional-put claim: one winner among racers to different destinations") {
    import java.nio.file.{Files, Paths}
    val store = new graft.txn.ConditionalPutCommitStore
    val root = Paths.get(tmpDir("cput-claim"))
    // the sealer-vs-janitor shape: N racers claim ONE lease file, each to
    // its own destination — exactly one may win, no rename anywhere
    val rounds = 20
    val racers = 8
    val pool = Executors.newFixedThreadPool(racers)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try (1 to rounds).foreach { r =>
      val src = root.resolve(s"lease_$r.json")
      Files.write(src, s"""{"round":$r}""".getBytes("UTF-8"))
      val dsts = (1 to racers).map(i => root.resolve(s"out_${r}_$i.json"))
      val wins = Await.result(
        Future.sequence(dsts.map(d => Future(store.claim(src, d)))), 1.minute)
      assert(wins.count(identity) == 1, s"round $r: ${wins.count(identity)} winners")
      assert(!Files.exists(src), s"round $r: lease survived the claim")
      val landed = dsts.filter(Files.exists(_))
      assert(landed.size == 1, s"round $r: ${landed.size} destinations materialized")
      assert(new String(Files.readAllBytes(landed.head), "UTF-8") == s"""{"round":$r}""")
    } finally pool.shutdown()
  }

  test("conditional-put claim: a winner crashing mid-move is completed by helpers") {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(tmpDir("cput-crash"))
    val crashy = new graft.txn.ConditionalPutCommitStore {
      override protected def afterDecisionHook(): Unit =
        throw new RuntimeException("simulated crash after winning the decision")
    }
    val src = root.resolve("lease.json")
    Files.createDirectories(root)
    Files.write(src, """{"v":42}""".getBytes("UTF-8"))
    val dst = root.resolve("failed.json")
    intercept[RuntimeException](crashy.claim(src, dst))
    // decision recorded, destination missing, source still present
    assert(Files.exists(src) && !Files.exists(dst))
    // ANY later claimer (even to another destination) completes the
    // recorded transition and reports itself the loser
    val helper = new graft.txn.ConditionalPutCommitStore
    assert(!helper.claim(src, root.resolve("other.json")))
    assert(!Files.exists(src))
    assert(Files.exists(dst), "recorded destination must be materialized")
    assert(!Files.exists(root.resolve("other.json")))
    assert(new String(Files.readAllBytes(dst), "UTF-8") == """{"v":42}""")
    // the janitor sweeps the completed decision object — but only once it
    // has AGED past the claim-fence threshold (a fresh decision still
    // shields in-flight claimers from re-electing)
    val ms = new graft.txn.Metastore(root)
    Files.move(root.resolve(".lease.json.moved"), ms.runningDir.resolve(".lease.json.moved"))
    ms.janitor(timeoutMillis = 0)
    assert(Files.exists(ms.runningDir.resolve(".lease.json.moved")),
      "a fresh decision must survive the sweep")
    val old = ms.claimFenceMillis
    ms.claimFenceMillis = 0L
    try {
      Thread.sleep(5)
      ms.janitor(timeoutMillis = 0)
      assert(!Files.exists(ms.runningDir.resolve(".lease.json.moved")))
    } finally ms.claimFenceMillis = old
  }

  test("janitor fences orphaned .sealing records once aged (crash between transitions)") {
    val ms = new graft.txn.Metastore(java.nio.file.Paths.get(tmpDir("graft-sealing")))
    val dir = ms.root.resolve("tbl")
    // a sealer that died AFTER claiming running -> .sealing but BEFORE
    // publishing: txn in neither running/ nor a terminal state
    val t = ms.newTransaction("dies mid-seal")
    t.stage(dir, 1L, "a", """{"v":1}""", "write")
    val sealing = ms.txnDir.resolve(s".${t.txnId}.sealing")
    java.nio.file.Files.move(ms.runningDir.resolve(s"${t.txnId}.json"), sealing)
    // fresh debris survives a sweep (a LIVE sealer is milliseconds wide)
    ms.janitor(timeoutMillis = 60000)
    assert(java.nio.file.Files.exists(sealing))
    assert(!ms.isTxnFailed(t.txnId))
    // aged debris is fenced to failed and its staged revision reclaimed
    java.nio.file.Files.setLastModifiedTime(sealing,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600 * 1000))
    val old = ms.claimFenceMillis
    ms.claimFenceMillis = 1000L
    try {
      val (failed, _) = ms.janitor(timeoutMillis = 1000)
      assert(failed >= 1)
      assert(!java.nio.file.Files.exists(sealing))
      assert(ms.isTxnFailed(t.txnId))
      // second pass reclaims the staged revision file of the failed txn
      ms.janitor(timeoutMillis = 1000)
      assert(ms.latestVisible(dir, None, None).isEmpty)
      // ...and the dead sealer's later publish attempt loses cleanly
      val e = intercept[graft.txn.ConcurrentTxnConflict](t.seal())
      assert(e.getMessage.contains("failed") || e.getMessage.contains("fenced"))
    } finally ms.claimFenceMillis = old
  }

  test("graft.commitStore conf selects the protocol for conf-built catalogs") {
    spark.conf.set("graft.commitStore", "conditional-put")
    try {
      val cat = new GraftCatalog(spark, tmpDir("graft-conf-store"))
      cat.writeToTable(Seq((1, 1)).toDF("a", "b"), "c.t")
      assert(cat.readTable("c.t").count() == 1)
      // the conditional-put protocol's fingerprint: a sealed txn leaves its
      // claim decision objects (swept later by the janitor)
      val s = java.nio.file.Files.list(cat.store.runningDir)
      val names = try {
        val b = List.newBuilder[String]
        val i = s.iterator()
        while (i.hasNext) b += i.next().getFileName.toString
        b.result()
      } finally s.close()
      assert(names.exists(_.endsWith(".moved")), s"expected decision debris, saw $names")
    } finally spark.conf.unset("graft.commitStore")
    intercept[IllegalArgumentException] {
      spark.conf.set("graft.commitStore", "bogus")
      try new GraftCatalog(spark, tmpDir("graft-conf-bad"))
      finally spark.conf.unset("graft.commitStore")
    }
  }

  test("zero lost updates on an object store: full MVCC race over conditional put") {
    // the headline gate for the commit seam: the same 8-racer contention
    // test, but every decisive transition goes through conditional put —
    // the protocol a rename-free S3-semantics store can actually run
    val cat = new GraftCatalog(spark, tmpDir("graft-conc-cput"),
      commitStore = new graft.txn.ConditionalPutCommitStore)
    cat.createTable("c.t", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("writer", org.apache.spark.sql.types.IntegerType),
      FieldMeta.field("attempt", org.apache.spark.sql.types.IntegerType))))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writers = 8
    try {
      val futures = (1 to writers).map { w =>
        Future {
          var done = false
          while (!done) {
            try {
              cat.writeToTable(Seq((w, 1)).toDF("writer", "attempt"), "c.t", WriteMode.Add)
              done = true
            } catch {
              case _: ConcurrentTxnConflict =>
                Thread.sleep(scala.util.Random.nextInt(30).toLong)
            }
          }
        }
      }
      Await.result(Future.sequence(futures), 5.minutes)
      val rows = cat.readTable("c.t").collect().map(r => (r.getInt(0), r.getInt(1)))
      assert(rows.length == writers, s"expected $writers rows, got ${rows.toSeq}")
      assert(rows.map(_._1).toSet == (1 to writers).toSet)
      val log = cat.deltaLog("c.t")
      assert(log.size == writers)
      assert(log.map(_.streamPosition).distinct.size == writers)
    } finally pool.shutdown()
  }

  test("full S3 storage profile: MVCC race over conditional put + object-store FileIO") {
    // the round-16 portability gate: conditional-put commit primitive AND
    // rename-free metadata IO (virtual dirs, touch-by-rewrite, listing-only
    // enumeration) together — the storage profile of a real S3 deployment.
    val cat = new GraftCatalog(spark, tmpDir("graft-conc-s3"),
      commitStore = new graft.txn.ConditionalPutCommitStore,
      fileIO = new graft.txn.ObjectStoreFileIO)
    cat.createTable("c.s3", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("writer", org.apache.spark.sql.types.IntegerType),
      FieldMeta.field("attempt", org.apache.spark.sql.types.IntegerType))))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writers = 8
    try {
      val futures = (1 to writers).map { w =>
        Future {
          var done = false
          while (!done) {
            try {
              cat.writeToTable(Seq((w, 1)).toDF("writer", "attempt"), "c.s3", WriteMode.Add)
              done = true
            } catch {
              case _: ConcurrentTxnConflict =>
                Thread.sleep(scala.util.Random.nextInt(30).toLong)
            }
          }
        }
      }
      Await.result(Future.sequence(futures), 5.minutes)
      val rows = cat.readTable("c.s3").collect().map(r => (r.getInt(0), r.getInt(1)))
      assert(rows.length == writers, s"expected $writers rows, got ${rows.toSeq}")
      assert(rows.map(_._1).toSet == (1 to writers).toSet)
      val log = cat.deltaLog("c.s3")
      assert(log.size == writers)
      assert(log.map(_.streamPosition).distinct.size == writers)
      // the janitor runs clean over the same profile
      cat.janitor()
      assert(cat.readTable("c.s3").count() == writers)
    } finally pool.shutdown()
  }

  test("janitor sweeps aged self-demotion decision debris in success/") {
    val ms = new graft.txn.Metastore(
      java.nio.file.Paths.get(tmpDir("graft-demote-debris")),
      new graft.txn.ConditionalPutCommitStore)
    // a committed txn whose post-publish conflict check self-demoted:
    // claim(success/<id>.json -> failed/<id>.json) leaves its decision
    // object in success/, a directory the sealing-debris sweep must cover
    val t = ms.newTransaction("demoted post-publish")
    t.seal()
    // round-15: success records live in epoch subdirs; the decision object
    // is a SIBLING of the source, so the sweep must now cover epoch dirs
    val src = ms.successPaths(t.txnId).find(java.nio.file.Files.exists(_)).get
    assert(ms.commitStore.claim(src, ms.failedDir.resolve(s"${t.txnId}.json")))
    val decision = src.resolveSibling(s".${t.txnId}.json.moved")
    assert(java.nio.file.Files.exists(decision))
    assert(ms.isTxnFailed(t.txnId))
    // fresh debris survives a sweep (it may still shield an in-flight claim)
    ms.janitor(timeoutMillis = 60000)
    assert(java.nio.file.Files.exists(decision))
    // aged debris with its source gone is swept
    java.nio.file.Files.setLastModifiedTime(decision,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600 * 1000))
    val old = ms.claimFenceMillis
    ms.claimFenceMillis = 1000L
    try ms.janitor(timeoutMillis = 1000)
    finally ms.claimFenceMillis = old
    assert(!java.nio.file.Files.exists(decision))
    assert(ms.isTxnFailed(t.txnId))
  }

  test("torture: writers + compactor race with injected conditional-put crashes, convergence to the model") {
    // Round-11 MVCC torture (the valve crash test's pattern applied to the
    // commit seam): four writers and a background compactor race on one
    // table through a ConditionalPutCommitStore whose post-decision window
    // CRASHES on a schedule — the exact window where a winner dies holding
    // the decision object and helpers/janitor must complete or fence the
    // transition. Ops are idempotent (each writer owns its key range,
    // retried merges re-write identical content), so the final table state
    // is order-independent and must equal the model no matter which
    // interleaving or crash schedule the race takes.
    class CrashStore(crashEvery: Int, maxCrashes: Int)
        extends graft.txn.ConditionalPutCommitStore {
      val calls = new java.util.concurrent.atomic.AtomicInteger
      val crashes = new java.util.concurrent.atomic.AtomicInteger
      @volatile var armed = false
      override protected def afterDecisionHook(): Unit = {
        if (armed && calls.incrementAndGet() % crashEvery == 0 &&
          crashes.incrementAndGet() <= maxCrashes)
          throw new RuntimeException("injected cput crash")
      }
    }
    val store = new CrashStore(crashEvery = 4, maxCrashes = 12)
    val cat = new GraftCatalog(spark, tmpDir("graft-torture"), commitStore = store)
    cat.store.claimFenceMillis = 500L // crashed claim holders fence fast
    cat.createTable("c.z", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("k", org.apache.spark.sql.types.IntegerType,
        nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.IntegerType))),
      properties = Map("read_optimization" -> "NONE"))
    store.armed = true
    val writers = 4; val opsPer = 4
    val pool = Executors.newFixedThreadPool(writers + 1)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    @volatile var writersDone = false
    val rnd = new java.util.concurrent.atomic.AtomicLong(0xC0FFEE)
    def retry(what: String)(body: => Unit): Unit = {
      var attempts = 0
      var ok = false
      while (!ok) {
        attempts += 1
        try { body; ok = true }
        catch {
          case scala.util.control.NonFatal(e) =>
            assert(attempts < 300, s"$what did not converge after 300 attempts: $e")
            Thread.sleep((rnd.incrementAndGet() * 2654435761L % 37).abs)
        }
      }
    }
    try {
      val fw = (1 to writers).map { w =>
        Future {
          (0 until opsPer).foreach { i =>
            retry(s"writer $w merge $i") {
              cat.writeToTable(Seq((w * 100 + i, w * 1000 + i)).toDF("k", "v"),
                "c.z", WriteMode.Merge)
            }
          }
          retry(s"writer $w delete")(
            cat.writeToTable(Seq(w * 100).toDF("k"), "c.z", WriteMode.Delete))
        }
      }
      val fc = Future { // background compactor: conflicts and crashes are expected
        while (!writersDone) {
          try cat.compact("c.z", numBuckets = 2)
          catch { case scala.util.control.NonFatal(_) => () }
          Thread.sleep(25)
        }
      }
      Await.result(Future.sequence(fw), 5.minutes)
      writersDone = true
      Await.result(fc, 1.minute)
    } finally pool.shutdown()
    store.armed = false
    // sweep crash debris: first pass completes/fences orphaned moves, the
    // second sweeps the sealing records those completions surfaced
    cat.store.janitor(timeoutMillis = 0)
    cat.store.janitor(timeoutMillis = 0)
    val expected = (for (w <- 1 to writers; i <- 1 until opsPer)
      yield (w * 100 + i) -> (w * 1000 + i)).toMap
    val got = cat.readTable("c.z").collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == expected, s"diverged: extra=${got.toSet -- expected.toSet} " +
      s"missing=${expected.toSet -- got.toSet} (crashes=${store.crashes.get})")
    // a final compaction over the crash-scarred log still converges
    retry("final compact")(cat.compact("c.z", numBuckets = 2))
    val compacted = cat.readTable("c.z").collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(compacted == expected, s"post-compact diverged: $compacted")
    assert(store.crashes.get >= 3,
      s"torture must actually crash the commit path (got ${store.crashes.get}; " +
        "lower crashEvery if commit volume shrank)")
  }

  test("concurrent schema alter races writers and a compactor; both schema outcomes exact") {
    // A mid-race ALTER (add column with past-default) must serialize
    // through MVCC against merges and compaction: whichever order commits
    // win, the final table carries every writer row with its value, and
    // the added column reads the default on every row no writer populated.
    val cat = new GraftCatalog(spark, tmpDir("graft-alter-race"))
    cat.createTable("c.a", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("k", org.apache.spark.sql.types.IntegerType,
        nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.IntegerType))),
      properties = Map("read_optimization" -> "NONE"))
    val writers = 4; val opsPer = 4
    val pool = Executors.newFixedThreadPool(writers + 2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    @volatile var writersDone = false
    def retry(what: String)(body: => Unit): Unit = {
      var attempts = 0; var ok = false
      while (!ok) {
        attempts += 1
        try { body; ok = true }
        catch { case scala.util.control.NonFatal(e) =>
          assert(attempts < 300, s"$what did not converge: $e")
          Thread.sleep((attempts % 23).toLong)
        }
      }
    }
    try {
      val fw = (1 to writers).map { w =>
        Future {
          (0 until opsPer).foreach { i =>
            retry(s"w$w m$i")(cat.writeToTable(
              Seq((w * 100 + i, w * 1000 + i)).toDF("k", "v"), "c.a", WriteMode.Merge))
          }
        }
      }
      val fa = Future { // the mid-race alter: add `d` with past-default 7
        Thread.sleep(40)
        retry("alter")(cat.alterTable("c.a", newSchema = Some(
          org.apache.spark.sql.types.StructType(Seq(
            FieldMeta.field("k", org.apache.spark.sql.types.IntegerType,
              nullable = false, mergeKey = true),
            FieldMeta.field("v", org.apache.spark.sql.types.IntegerType),
            FieldMeta.field("d", org.apache.spark.sql.types.IntegerType,
              pastDefault = Some("7")))))))
      }
      val fc = Future {
        while (!writersDone) {
          try cat.compact("c.a", numBuckets = 2)
          catch { case scala.util.control.NonFatal(_) => () }
          Thread.sleep(20)
        }
      }
      Await.result(Future.sequence(fw :+ fa), 5.minutes)
      writersDone = true
      Await.result(fc, 1.minute)
    } finally pool.shutdown()
    val expected = (for (w <- 1 to writers; i <- 0 until opsPer)
      yield (w * 100 + i) -> (w * 1000 + i)).toMap
    def stateOf(df: org.apache.spark.sql.DataFrame) = {
      assert(df.columns.toSeq == Seq("k", "v", "d"), s"schema: ${df.columns.toSeq}")
      df.collect().map(r => (r.getInt(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2))))
    }
    val rows = stateOf(cat.readTable("c.a"))
    assert(rows.map(r => r._1 -> r._2).toMap == expected,
      s"writer rows diverged: ${rows.toSeq.sortBy(_._1)}")
    assert(rows.forall(_._3.contains(7)),
      s"past-default must cover every row: ${rows.filterNot(_._3.contains(7)).toSeq}")
    // and a final compaction materializes the same state
    retry("final compact")(cat.compact("c.a", numBuckets = 2))
    val compacted = stateOf(cat.readTable("c.a"))
    assert(compacted.map(r => r._1 -> r._2).toMap == expected &&
      compacted.forall(_._3.contains(7)), "post-compact diverged")
  }
}
