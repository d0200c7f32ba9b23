package graft

import scala.collection.JavaConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._
import graft.txn.{DeltaMeta, Json}

/** Distributed manifest planning — the driver-metadata ceiling lift: above
  * the size gate, delta metafiles are skeleton-parsed (entries never
  * materialize on the driver) and entry pruning runs as a Spark job; file
  * selection is identical to the driver path at any gate setting. */
class ManifestPlannerSpec extends SparkSpec {
  import spark.implicits._

  private def buildTable(tag: String): (GraftCatalog, String) = {
    val cat = new GraftCatalog(spark, tmpDir(tag))
    cat.createTable("m.t", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("v", StringType))),
      properties = Map("write.max_records_per_file" -> "100",
        "compaction.auto" -> "false"))
    val df = spark.range(0, 2000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
    cat.writeToTable(df.orderBy("k").coalesce(1), "m.t")
    (cat, "m.t")
  }

  test("skeleton parse carries everything but entries, at O(1) heap") {
    val (cat, t) = buildTable("mp-skel")
    val file = cat.store.visibleRevisionPaths(
      cat.root.resolve("ns/m/t/deltas"), None, None).head._2
    val full = Json.read(new String(java.nio.file.Files.readAllBytes(file), "UTF-8"),
      classOf[DeltaMeta])
    val sk = ManifestPlanner.skeleton(file)
    assert(sk.entries.isEmpty, "skeleton must not materialize entries")
    assert(full.entries.size == 20, s"expected 20 sliced files, got ${full.entries.size}")
    assert((sk.streamPosition, sk.deltaType, sk.txnId, sk.compactedUpTo, sk.properties) ==
      (full.streamPosition, full.deltaType, full.txnId, full.compactedUpTo, full.properties))
    // streaming entry walk sees the exact full set
    val streamed = Seq.newBuilder[graft.txn.ManifestEntry]
    ManifestPlanner.foreachEntry(file)(streamed += _)
    assert(streamed.result() == full.entries)
    // the lazy iterator (the distributed manifest view's per-task source)
    // yields the identical sequence, and a partial take doesn't corrupt
    // subsequent fresh iterations (each gets its own parser). Driver-side
    // use goes through the LOAN (round-15): off-task there is no
    // completion hook, and a bare partially-drained iterator held the
    // file handle until GC.
    def fdsFor(p: java.nio.file.Path): Int = {
      val fdDir = java.nio.file.Paths.get("/proc/self/fd")
      val s = java.nio.file.Files.list(fdDir)
      try s.iterator().asScala.count { l =>
        try java.nio.file.Files.readSymbolicLink(l).toString == p.toAbsolutePath.toString
        catch { case _: Exception => false }
      } finally s.close()
    }
    assert(ManifestPlanner.withEntryIterator(file)(_.toSeq) == full.entries)
    // partial drain inside the loan: the handle is RELEASED on exit
    assert(ManifestPlanner.withEntryIterator(file)(_.take(3).toSeq) == full.entries.take(3))
    assert(fdsFor(file) == 0, "loan must close a partially-drained iterator's handle")
    assert(ManifestPlanner.withEntryIterator(file)(_.toSeq) == full.entries)
    // a TRUNCATED metafile (crash mid-write) must throw, not silently
    // yield a short row set from the corruption-inspection view itself —
    // and the loan must release the handle on the throwing path too
    val bytes = java.nio.file.Files.readAllBytes(file)
    val cut = java.nio.file.Files.createTempFile("mp-trunc", ".json")
    java.nio.file.Files.write(cut, bytes.take(bytes.length / 2))
    intercept[Exception](ManifestPlanner.withEntryIterator(cut)(_.toSeq))
    assert(fdsFor(cut) == 0, "loan must close the handle when the drain throws")
  }

  test("gated read: same files as the driver path, pruning runs as a Spark job") {
    val (cat, t) = buildTable("mp-gate")
    val filter = col("k") >= 1000 && col("k") < 1100
    // driver path (default gate): the reference selection
    val driverFiles = cat.readTable(t, ReadOptions(rowFilter = Some(filter)))
      .inputFiles.sorted.toSeq
    val allFiles = cat.readTable(t).inputFiles.length
    assert(allFiles == 20 && driverFiles.size < allFiles,
      s"stats skip must prune ($driverFiles of $allFiles)")
    // gated path: force distributed planning for ANY manifest size
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.conf.set(ManifestPlanner.GateConfKey, "1")
    spark.sparkContext.addSparkListener(listener)
    try {
      val gated = cat.readTable(t, ReadOptions(rowFilter = Some(filter)))
      // listener delivery is async; poll briefly for the planning job event
      val deadline = System.currentTimeMillis() + 10000
      while (jobs < 1 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(jobs >= 1, "gated planning must run as a Spark job")
      assert(gated.inputFiles.sorted.toSeq == driverFiles,
        "gated and driver paths must select the same files")
      // and the read itself stays correct
      assert(gated.agg(count(lit(1)), sum("k")).as[(Long, Long)].head() ==
        (100L, (1000L until 1100L).sum))
      // partition-values pruning takes the distributed path too
      val catP = new GraftCatalog(spark, tmpDir("mp-gate-part"))
      catP.createTable("m.p", StructType(Seq(
        FieldMeta.field("k", LongType, nullable = false),
        FieldMeta.field("p", StringType))),
        partitionScheme = PartitionScheme(Seq(PartitionKey("p", Transform.Identity))))
      catP.writeToTable(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "p"), "m.p")
      val pruned = catP.readTable("m.p", ReadOptions(partitionValues = Some(Map("p" -> "b"))))
      assert(pruned.as[(Long, String)].collect().toSeq == Seq((3L, "b")))
    } finally {
      spark.conf.unset(ManifestPlanner.GateConfKey)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("DSv2/SQL surface defers entry materialization above the gate") {
    val root = tmpDir("mp-dsv2")
    val cat = new GraftCatalog(spark, root)
    cat.createTable("m.t", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("v", StringType))),
      properties = Map("write.max_records_per_file" -> "100",
        "compaction.auto" -> "false"))
    val df = spark.range(0, 2000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
    cat.writeToTable(df.orderBy("k").coalesce(1), "m.t")
    def load() = spark.read.format("graft").option("root", root)
      .option("table", "m.t").load()
    val filter = col("k") >= 500 && col("k") < 700
    val wantRows = load().where(filter).agg(count(lit(1)), sum("k")).as[(Long, Long)].head()
    // the native read path gives the reference planned-file count
    val wantFileCount = cat.readTable("m.t", ReadOptions(rowFilter = Some(filter)))
      .inputFiles.length
    assert(wantFileCount < cat.readTable("m.t").inputFiles.length, "stats skip must prune")
    spark.conf.set(ManifestPlanner.GateConfKey, "1")
    try {
      graft.spark.StatsPruningScanBuilder.resetFor("m.t")
      val gated = load().where(filter)
      assert(gated.agg(count(lit(1)), sum("k")).as[(Long, Long)].head() == wantRows)
      assert(graft.spark.StatsPruningScanBuilder.lastDeferredFor("m.t") == wantFileCount,
        s"deferred materialization must return only survivors " +
          s"(${graft.spark.StatsPruningScanBuilder.lastDeferredFor("m.t")} vs $wantFileCount)")
      // metadata-only count(*) still answers from recordCount under the gate
      val plan = load().groupBy().count().queryExecution.executedPlan.toString
      assert(plan.contains("LocalScan") || !plan.contains("Scan parquet"),
        s"count(*) should stay manifest-served, got:\n$plan")
      // unfiltered read correct through eager fallback
      assert(load().count() == 2000)
      // filterless LIMIT n: the provider streams an O(prefix) entry list —
      // 150 rows over 100-row files is a 2-entry prefix, not 20
      graft.spark.StatsPruningScanBuilder.resetFor("m.t")
      assert(load().limit(150).count() == 150)
      assert(graft.spark.StatsPruningScanBuilder.lastDeferredFor("m.t") == 2,
        s"DSv2 gated LIMIT must materialize a prefix " +
          s"(${graft.spark.StatsPruningScanBuilder.lastDeferredFor("m.t")})")
    } finally spark.conf.unset(ManifestPlanner.GateConfKey)
  }

  test("gated LIMIT read plans an entry prefix without full materialization") {
    val (cat, t) = buildTable("mp-limit")
    spark.conf.set(ManifestPlanner.GateConfKey, "1")
    try {
      val limited = cat.readTable(t, ReadOptions(limit = Some(150)))
      // 150 rows over 100-row files → a 2-file prefix, not 20 files
      assert(limited.inputFiles.length == 2,
        s"expected a 2-file prefix, planned ${limited.inputFiles.length}")
      assert(limited.count() == 150)
      // unfiltered read still correct through streaming materialization
      assert(cat.readTable(t).count() == 2000)
      // merge semantics survive the gate: last-writer-wins upsert
      val catM = new GraftCatalog(spark, tmpDir("mp-limit-m"))
      catM.createTable("m.u", StructType(Seq(
        FieldMeta.field("k", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", StringType))))
      catM.writeToTable(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "m.u", WriteMode.Merge)
      catM.writeToTable(Seq((2L, "b2")).toDF("k", "v"), "m.u", WriteMode.Merge)
      assert(catM.readTable("m.u").as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "a"), (2L, "b2")))
    } finally spark.conf.unset(ManifestPlanner.GateConfKey)
  }

  test("streaming delta writer emits the exact bytes of the in-memory writer") {
    val entries = Seq(
      graft.txn.ManifestEntry("/a/d000001__t/_g_bucket=0/p1.parquet", 10L, 5L,
        Map("k" -> graft.txn.ColStat("1", "9", 0L)), 40L),
      graft.txn.ManifestEntry("/a/d000001__t/_g_bucket=1/p2.parquet", 20L, 7L, null, -1L))
    val d = DeltaMeta(3L, "ADD", entries, "txn-x", 2L, Map("record_count" -> "12"))
    val bos = new java.io.ByteArrayOutputStream()
    Json.writeDeltaStreaming(bos, d.copy(entries = Nil), emit => entries.foreach(emit))
    assert(bos.toString("UTF-8") == Json.write(d),
      "streamed and in-memory delta JSON must be byte-identical")
  }

  test("gated compaction streams entries: same result as the driver path") {
    // two identical keyed tables, compacted under each materialization
    // strategy — rows, copy-by-reference accounting, and the entry SET of
    // the compaction delta must agree
    def build(tag: String): (GraftCatalog, java.nio.file.Path) = {
      val cat = new GraftCatalog(spark, tmpDir(tag))
      cat.createTable("m.c", StructType(Seq(
        FieldMeta.field("k", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", StringType))),
        properties = Map("compaction.auto" -> "false",
          "write.max_records_per_file" -> "200"))
      val df = spark.range(0, 2000).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("v"))
      cat.writeToTable(df, "m.c", WriteMode.Merge)
      cat.compact("m.c") // bucketed base
      // trickle upsert touching a few buckets, then the compaction under test
      cat.writeToTable(Seq((1L, "upd1"), (2L, "upd2")).toDF("k", "v"), "m.c", WriteMode.Merge)
      cat.compact("m.c")
      (cat, cat.root.resolve("ns/m/c/deltas"))
    }
    val (catA, dirA) = build("mp-cmp-driver")
    spark.conf.set(ManifestPlanner.GateConfKey, "1")
    val (catB, dirB) = try build("mp-cmp-gated")
    finally spark.conf.unset(ManifestPlanner.GateConfKey)
    def lastDelta(cat: GraftCatalog): DeltaMeta = cat.deltaLog("m.c").last
    val (da, db) = (lastDelta(catA), lastDelta(catB))
    assert(da.properties.filterNot(_._1 == "written_columns") ==
      db.properties.filterNot(_._1 == "written_columns"))
    assert(da.properties("copied_by_reference").toInt > 0,
      "the trickle compact must copy untouched buckets by reference")
    // entry sets equal up to the path's non-deterministic parts (temp
    // root, txn id in the delta dir, part-file uuid) — rev + bucket +
    // size + rows + stats identify each file's content
    def norm(es: Seq[graft.txn.ManifestEntry]) = es.map(e => (
      "/d(\\d+)__".r.findAllMatchIn(e.path).toSeq.last.group(1),
      MergeRead.bucketOfPath(e.path),
      e.sizeBytes, e.recordCount, e.colStats, e.uncompressedBytes)).toSet
    assert(norm(da.entries) == norm(db.entries))
    assert(catA.readTable("m.c").orderBy("k").collect().toSeq ==
      catB.readTable("m.c").orderBy("k").collect().toSeq)
    assert(catB.readTable("m.c").where(col("k") === 1L).select("v")
      .collect().head.getString(0) == "upd1")
  }

  test("10^6-entry base: gated compaction never materializes the entry list") {
    // A real bucketed base whose metafile is rewritten with a million fake
    // copy-by-reference entries in buckets the pending upsert does not
    // touch. The gated compact must stream them source→staged metafile
    // (per-entry, stats preserved) and rewrite ONLY the touched bucket's
    // real files. Fake stats are disjoint from every later filter, so the
    // gated read plans around them too.
    val cat = new GraftCatalog(spark, tmpDir("mp-million"))
    cat.createTable("m.b", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))),
      properties = Map("compaction.auto" -> "false"))
    val df = spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
    cat.writeToTable(df, "m.b", WriteMode.Merge)
    cat.compact("m.b")
    val dir = cat.root.resolve("ns/m/b/deltas")
    val baseFile = cat.store.visibleRevisionPaths(dir, None, None).last._2
    val base = Json.read(new String(
      java.nio.file.Files.readAllBytes(baseFile), "UTF-8"), classOf[DeltaMeta])
    assert(base.properties("num_buckets") == "8")
    // pick an upsert key and keep fakes out of its bucket
    val key = 1L
    val keyBucket = spark.range(1).select(
      pmod(hash(lit(key)), lit(8))).collect().head.getInt(0)
    val fakeBuckets = (0 until 8).filterNot(_ == keyBucket)
    val nFake = 1000000
    // stream-write the inflated base metafile (the test itself must not
    // hold a million-entry list either)
    val out = java.nio.file.Files.newOutputStream(baseFile)
    try Json.writeDeltaStreaming(out, base.copy(entries = Nil), emit => {
      base.entries.foreach(emit)
      var i = 0
      while (i < nFake) {
        val b = fakeBuckets(i % fakeBuckets.size)
        emit(graft.txn.ManifestEntry(
          s"${cat.root}/ns/m/b/data/d000002__fake/_g_bucket=$b/part-$i.parquet",
          128L, 10L,
          Map("k" -> graft.txn.ColStat((2000000000L + i).toString,
            (2000000000L + i).toString, 0L)), 512L))
        i += 1
      }
    }) finally out.close()
    cat.writeToTable(Seq((key, "updated")).toDF("k", "v"), "m.b", WriteMode.Merge)
    val realUntouched = base.entries.count(e =>
      MergeRead.bucketOfPath(e.path).exists(_ != keyBucket))
    spark.conf.set(ManifestPlanner.GateConfKey, "1")
    try {
      cat.compact("m.b")
      val newFile = cat.store.visibleRevisionPaths(dir, None, None).last._2
      val sk = ManifestPlanner.skeleton(newFile)
      assert(sk.properties("copied_by_reference").toInt == nFake + realUntouched,
        s"every fake entry must ride by reference (${sk.properties})")
      var total = 0L
      var fakesSeen = 0L
      ManifestPlanner.foreachEntry(newFile) { e =>
        total += 1
        if (e.path.contains("__fake/")) {
          fakesSeen += 1
          assert(e.stats != null, "copy-by-reference must preserve entry stats")
        }
      }
      assert(fakesSeen == nFake, s"expected $nFake streamed fakes, saw $fakesSeen")
      assert(total > fakesSeen, "the touched bucket must contribute rewritten entries")
      // gated read: fake stats are disjoint, so the updated row reads back
      // without opening any fake file
      val got = cat.readTable("m.b", ReadOptions(rowFilter = Some(col("k") === key)))
      assert(got.select("v").collect().map(_.getString(0)).toSeq == Seq("updated"))
    } finally spark.conf.unset(ManifestPlanner.GateConfKey)
  }

  test("10^6-entry base: gated ZIPPED read plans per-group without materializing the entry list") {
    // Round-12 stretch (verdict ask #8): the flat read has the 10^7-entry
    // proof; the zipper builds G group frames over the SAME planned delta
    // list, so gated planning must compose — a key-filtered zipped read
    // over a million-entry base must prune distributedly (one planning
    // pass shared by all groups), open no fake file, and zip correctly.
    val cat = new GraftCatalog(spark, tmpDir("mp-million-zip"))
    cat.createTable("m.z", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("a", LongType),
      FieldMeta.field("t", StringType))),
      properties = Map("compaction.auto" -> "false"))
    cat.setSubschema("m.z", "nums", Seq("k", "a"))
    cat.setSubschema("m.z", "text", Seq("k", "t"))
    cat.writeToTable(spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 2).as("a"), concat(lit("t"), col("id")).as("t")).toDF(),
      "m.z", WriteMode.Merge)
    cat.compact("m.z")
    val dir = cat.root.resolve("ns/m/z/deltas")
    val baseFile = cat.store.visibleRevisionPaths(dir, None, None).last._2
    val base = Json.read(new String(
      java.nio.file.Files.readAllBytes(baseFile), "UTF-8"), classOf[DeltaMeta])
    val nBuckets = base.properties("num_buckets").toInt
    val nFake = 1000000
    val out = java.nio.file.Files.newOutputStream(baseFile)
    try Json.writeDeltaStreaming(out, base.copy(entries = Nil), emit => {
      base.entries.foreach(emit)
      var i = 0
      while (i < nFake) {
        emit(graft.txn.ManifestEntry(
          s"${cat.root}/ns/m/z/data/d000002__fake/_g_bucket=${i % nBuckets}/part-$i.parquet",
          128L, 10L,
          Map("k" -> graft.txn.ColStat((2000000000L + i).toString,
            (2000000000L + i).toString, 0L)), 512L))
        i += 1
      }
    }) finally out.close()
    // group-scoped pending on BOTH groups: the zip must resolve each
    // group's trickle against the inflated base
    cat.writeToTable(Seq((7L, 777L)).toDF("k", "a"), "m.z", WriteMode.Merge)
    cat.writeToTable(Seq((7L, "updated")).toDF("k", "t"), "m.z", WriteMode.Merge)
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.conf.set(ManifestPlanner.GateConfKey, "1")
    spark.sparkContext.addSparkListener(listener)
    try {
      val zipped = cat.readZipped("m.z",
        opts = ReadOptions(rowFilter = Some(col("k") === 7L)))
      val deadline = System.currentTimeMillis() + 10000
      while (jobs < 1 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(jobs >= 1, "gated zip planning must run as a Spark job")
      assert(!zipped.inputFiles.exists(_.contains("__fake/")),
        "the key filter must prune every fake entry at planning time")
      assert(zipped.select("k", "a", "t").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
        Seq((7L, 777L, "updated")),
        "zip over the inflated base must resolve both group trickles")
    } finally {
      spark.conf.unset(ManifestPlanner.GateConfKey)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("gated purge deletes files via a streaming distributed job") {
    val root = tmpDir("mp-purge")
    val cat = new GraftCatalog(spark, root)
    cat.createTable("m.p", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("v", StringType))),
      properties = Map("write.max_records_per_file" -> "100",
        "compaction.auto" -> "false"))
    cat.writeToTable(spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")).orderBy("k").coalesce(1), "m.p")
    val files = cat.readTable("m.p").inputFiles.map(_.stripPrefix("file:"))
    assert(files.length == 10)
    spark.conf.set(ManifestPlanner.GateConfKey, "1")
    try cat.dropTable("m.p", purge = true)
    finally spark.conf.unset(ManifestPlanner.GateConfKey)
    files.foreach(f => assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(f)),
      s"purged file still exists: $f"))
  }

  test("writes stamp total_bytes; pause refuses oversized streamed stages") {
    val cat = new GraftCatalog(spark, tmpDir("mp-bytes"))
    cat.createTable("m.w", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("v", StringType))),
      properties = Map("compaction.auto" -> "false"))
    cat.writeToTable(spark.range(0, 100).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")), "m.w")
    val d = cat.deltaLog("m.w").last
    assert(d.properties("total_bytes").toLong == d.entries.map(_.sizeBytes).sum,
      "commit must stamp on-disk bytes for the compaction valve")
    // a stream-staged GIANT revision cannot be inlined into a pause record
    val txn = cat.store.newTransaction("big-stage pause")
    val dir = cat.root.resolve("ns/m/w/deltas")
    txn.stageStreaming(dir, 99L, "delta", "TEST") { out =>
      val block = new Array[Byte](1 << 20)
      java.util.Arrays.fill(block, ' '.toByte)
      out.write('{'); out.write('}')
      (0 until 70).foreach(_ => out.write(block)) // 70 MB of padding
    }
    val e = intercept[IllegalArgumentException](txn.pause())
    assert(e.getMessage.contains("too large"))
    txn.abort()
  }

  test("streamed stage survives pause/resume (content re-read from disk)") {
    val cat = new GraftCatalog(spark, tmpDir("mp-pause"))
    val store = cat.store
    val txn = store.newTransaction("stream-stage pause")
    val dir = cat.root.resolve("ns/m/x/deltas")
    val d = DeltaMeta(1L, "ADD", Nil, txn.txnId, -1L, Map("record_count" -> "0"))
    txn.stageStreaming(dir, 1L, "delta", "TEST")(out =>
      Json.writeDeltaStreaming(out, d, _ => ()))
    txn.pause()
    val resumed = store.resumeTransaction(txn.txnId)
    resumed.seal()
    val visible = store.visibleRevisionPaths(dir, None, None)
    assert(visible.size == 1)
    val back = Json.read(new String(
      java.nio.file.Files.readAllBytes(visible.head._2), "UTF-8"), classOf[DeltaMeta])
    assert(back.streamPosition == 1L && back.properties("record_count") == "0")
  }

  test("gated prune under unresolved merges restricts to merge-key filters") {
    // A VALUE-column filter must not prune files at planning while an
    // unresolved upsert is pending: the pruned base file could hold the
    // stale version of a key whose NEWEST version matches — dropping it
    // would resurrect nothing, but pruning the NEWEST version's file on a
    // stale value range would serve the old row. safeFilters guards this;
    // verify it holds through the distributed gate.
    val cat = new GraftCatalog(spark, tmpDir("mp-merge-safety"))
    cat.createTable("m.s", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("score", LongType))),
      properties = Map("read_optimization" -> "NONE")) // keep merges pending
    val base = spark.range(0, 200).select(col("id").as("k"), col("id").as("score"))
    cat.writeToTable(base.orderBy("k").coalesce(1), "m.s", WriteMode.Merge)
    // upsert flips key 5's score from 5 to 9999 — far outside the base
    // file's recorded [0,199] range for a score>5000 filter
    cat.writeToTable(Seq((5L, 9999L)).toDF("k", "score"), "m.s", WriteMode.Merge)
    def q(c: GraftCatalog) = c.readTable("m.s",
      ReadOptions(rowFilter = Some(col("score") > 5000L)))
      .as[(Long, Long)].collect().toSeq
    assert(q(cat) == Seq((5L, 9999L))) // driver path
    spark.conf.set(ManifestPlanner.GateConfKey, "1")
    try assert(q(cat) == Seq((5L, 9999L)), "gated prune must not serve a stale row")
    finally spark.conf.unset(ManifestPlanner.GateConfKey)
  }

  test("10^6-entry base: metadata views, advisor, and estimator answer distributed") {
    // Round-13: the observability/estimation surfaces at REAL above-gate
    // scale — a ~200 MB metafile of 10^6 entries exceeds the DEFAULT gate
    // (no conf forcing), so these calls exercise the streamed/distributed
    // paths: skeleton deltas on the driver, entries only inside tasks.
    val cat = new GraftCatalog(spark, tmpDir("mp-million-views"))
    cat.createTable("m.v", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))),
      properties = Map("compaction.auto" -> "false"))
    cat.writeToTable(spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")), "m.v", WriteMode.Merge)
    cat.compact("m.v")
    val dir = cat.root.resolve("ns/m/v/deltas")
    val baseFile = cat.store.visibleRevisionPaths(dir, None, None).last._2
    val base = Json.read(new String(
      java.nio.file.Files.readAllBytes(baseFile), "UTF-8"), classOf[DeltaMeta])
    val nReal = base.entries.size
    val nFake = 1000000
    val out = java.nio.file.Files.newOutputStream(baseFile)
    try Json.writeDeltaStreaming(out, base.copy(entries = Nil), emit => {
      base.entries.foreach(emit)
      var i = 0
      while (i < nFake) {
        emit(graft.txn.ManifestEntry(
          s"${cat.root}/ns/m/v/data/d000002__fake/_g_bucket=${i % 8}/part-$i.parquet",
          128L, 10L,
          Map("k" -> graft.txn.ColStat((2000000000L + i).toString,
            (2000000000L + i).toString, 0L)), 512L))
        i += 1
      }
    }) finally out.close()
    assert(java.nio.file.Files.size(baseFile) > ManifestPlanner.DefaultGateBytes,
      "fixture must exceed the default gate")
    // manifest view: distributed count + per-bucket aggregation
    val mt = cat.manifestTable("m.v")
    assert(mt.count() == nReal + nFake)
    val perBucket = mt.groupBy("bucket").count()
      .as[(Int, Long)].collect().toMap
    assert(perBucket.values.sum == nReal + nFake && perBucket.keySet == (0 until 8).toSet)
    // skip-index view: one row per (entry, colstat)
    assert(cat.fileStatsTable("m.v").count() >= nFake)
    // DESCRIBE DETAIL: entry aggregates from the task pass
    val info = cat.tableInfo("m.v").head()
    assert(info.getAs[Long]("num_files") == nReal + nFake)
    assert(info.getAs[Long]("files_with_stats") == nReal + nFake)
    assert(info.getAs[Long]("est_memory_bytes") >= nFake * 512L * 4)
    // estimator: Default chain resolves every fake via cached uncompressed
    val est = cat.estimateResources("m.v")
    assert(est.files == nReal + nFake &&
      est.methodsUsed.getOrElse("content_type_meta", 0) == nReal + nFake)
    // layout advisor: per-bucket sums streamed off the metafile
    val advice = cat.reclusterAdvice("m.v")
      .getOrElse(fail("streamed advice expected"))
    assert(advice.populated == 8 && advice.totalBytes >= nFake * 128L)
    // 10^6 × 128 B is only ~128 MB — BYTES, not entry count, size a
    // layout, so the balanced fixture is correctly healthy
    assert(!advice.recommended && advice.skew < 1.1, s"balanced fixture: $advice")
  }
}
