package graft

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
}
