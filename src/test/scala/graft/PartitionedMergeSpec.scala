package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/** Storage-partitioned dense merge (MergeRead.partitionedMerge): pending too
  * big to broadcast reads via key joins that shuffle pending INTO the
  * compacted base's bucket layout (KeyGroupedPartitioning) — the base never
  * shuffles, at any pending size. Must be plan-visible AND row-identical to
  * the dense shuffle resolve. */
class PartitionedMergeSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(cat: GraftCatalog, name: String, buckets: Int = 4): Unit =
    cat.createTable(name, StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))),
      // NONE: writes stay merge-on-read so the read path, not the write
      // valve, is under test; compact() builds the bucketed base explicitly.
      properties = Map("read_optimization" -> "NONE",
        "compaction.num_buckets" -> buckets.toString))

  /** The PASS (anti-join) side carries the bulk of the base and must reach
    * the output with NO shuffle above it — that is the whole point of the
    * path. The contested (semi) side's base rows legitimately re-shuffle:
    * they are O(pending) and enter the full resolve. So: at least one
    * KeyGrouped BatchScan must sit under zero ShuffleExchange ancestors. */
  private def assertPassSideNeverShuffles(plan: SparkPlan): Unit = {
    def stripped(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val root = stripped(plan)
    val all = root.collect { case b: BatchScanExec => b }
    assert(all.nonEmpty,
      s"expected the KeyGrouped BatchScan in:\n${plan.toString.take(2000)}")
    // Identity, not case-class equality: the anti- and semi-side scans are
    // EQUAL BatchScanExec values; only `eq` tells them apart.
    val underShuffle = root.collect { case e: ShuffleExchangeExec => e }
      .flatMap(_.collect { case b: BatchScanExec => b })
    assert(all.exists(b => !underShuffle.exists(_ eq b)),
      "the pass-side base scan must reach the output without a shuffle:\n" +
        plan.toString.take(2500))
  }

  test("dense-band upsert+delete takes the storage-partitioned path; base side never shuffles") {
    val cat = new GraftCatalog(spark, tmpDir("graft-spj"))
    mkTable(cat, "ns.t")
    cat.writeToTable(spark.range(20000)
      .select($"id", ($"id" % 7).cast("string").as("v")).toDF(), "ns.t", WriteMode.Merge)
    cat.compact("ns.t")
    // ~25% pending: over the sparse ratio (8x), inside the partitioned band (2x).
    cat.writeToTable(spark.range(20000).where($"id" % 4 === 0)
      .select($"id", lit("upd").as("v")).toDF(), "ns.t", WriteMode.Merge)
    cat.writeToTable(spark.range(20000).select($"id")
      .where($"id" % 997 === 0).toDF(), "ns.t", WriteMode.Delete)

    val spj = cat.readTable("ns.t")
    val plan = spj.queryExecution.executedPlan
    assert(plan.toString.contains("_g_pk_id"), "key-split join expected")
    assertPassSideNeverShuffles(plan)
    val got = spj.as[(Long, String)].collect().sortBy(_._1).toSeq

    spark.conf.set("graft.merge.partitioned.enabled", "false")
    try {
      val dense = cat.readTable("ns.t")
      assert(!dense.queryExecution.executedPlan.toString.contains("BatchScan"))
      assert(got == dense.as[(Long, String)].collect().sortBy(_._1).toSeq,
        "partitioned and dense merge reads must be identical")
    } finally spark.conf.unset("graft.merge.partitioned.enabled")

    val byId = got.toMap
    assert(byId(4L) == "upd" && byId(3L) == "3")
    assert(!byId.contains(997L) && !byId.contains(0L)) // 0: upd then deleted
    assert(got.size == 20000 - 21) // multiples of 997 in [0, 20000): 0..19940
  }

  test("randomized dense sequences incl. partial upserts: partitioned read ≡ dense read") {
    val rnd = new scala.util.Random(20260815L)
    // Engagement is tracked ACROSS rounds: any single round may fall out of
    // the partitioned band (ratio, regime roulette), but if no round at all
    // engages, the property test silently degrades to dense≡dense and a
    // ratio/eligibility regression would never be caught.
    var engagedRounds = 0
    for (round <- 0 until 3) {
      val cat = new GraftCatalog(spark, tmpDir(s"graft-spj-prop$round"))
      cat.createTable("ns.p", StructType(Seq(
        FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", StringType),
        FieldMeta.field("n", LongType))),
        properties = Map("read_optimization" -> "NONE",
          "compaction.num_buckets" -> "4"))
      val n = 3000 + rnd.nextInt(2000)
      cat.writeToTable(spark.range(n)
        .select($"id", ($"id" % 13).cast("string").as("v"), ($"id" * 2).as("n")).toDF(),
        "ns.p", WriteMode.Merge)
      cat.compact("ns.p")
      // Dense-band pending: each delta touches ~10-20% of the base; a
      // partial upsert (v only) exercises the contested resolve's
      // field-wise path through the partitioned split.
      for (i <- 0 to rnd.nextInt(3)) {
        val m = 4 + rnd.nextInt(6)
        rnd.nextInt(3) match {
          case 0 => cat.writeToTable(spark.range(n + 100).where($"id" % m === 0)
            .select($"id", lit(s"u$round-$i").as("v"), lit(-1L).as("n")).toDF(),
            "ns.p", WriteMode.Merge)
          case 1 => cat.writeToTable(spark.range(n).where($"id" % m === 1)
            .select($"id", lit(s"p$round-$i").as("v")).toDF(), // partial: no n
            "ns.p", WriteMode.Merge)
          case 2 => cat.writeToTable(spark.range(n).select($"id")
            .where($"id" % (m * 7) === 2).toDF(), "ns.p", WriteMode.Delete)
        }
      }
      val spjRead = cat.readTable("ns.p")
      val engaged = spjRead.queryExecution.executedPlan.toString.contains("BatchScan")
      val spj = spjRead.as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      spark.conf.set("graft.merge.partitioned.enabled", "false")
      val dense =
        try cat.readTable("ns.p").as[(Long, String, Long)].collect().sortBy(_._1).toSeq
        finally spark.conf.unset("graft.merge.partitioned.enabled")
      assert(spj == dense, s"round $round: partitioned and dense reads diverged " +
        s"(spj=${spj.size} rows, dense=${dense.size} rows, engaged=$engaged)")
      if (engaged) engagedRounds += 1
    }
    assert(engagedRounds > 0,
      "no randomized round engaged the partitioned path — the equivalence " +
        "property degraded to dense≡dense (eligibility regression?)")
  }

  test("widened randomized equivalence: null-keyed deletes, merge_order, renamed schemas — regime asserted per seed") {
    // Round-12 (verdict ask #7): the randomized equivalence now covers the
    // three boundary shapes the base generator missed, asserting the
    // REGIME CHOICE per seed (not just row equality): composite nullable
    // keys with null-keyed deletes must still ENGAGE the partitioned path
    // (null-keyed rows route to the contested side); merge_order winner
    // selection must engage AND resolve identically under both paths;
    // renamed fields — even renamed-then-REVERTED, the breadcrumb persists
    // — must fall back to the dense resolve (never a wrong plan).
    val rnd = new scala.util.Random(20260816L)

    def denseEquals[T](cat: GraftCatalog, table: String,
        read: GraftCatalog => Seq[T], expectRegime: String): Seq[T] = {
      MergeRead.lastSplitRegime = ""
      val got = read(cat)
      assert(MergeRead.lastSplitRegime == expectRegime,
        s"$table: expected regime '$expectRegime', " +
          s"planned '${MergeRead.lastSplitRegime}'")
      spark.conf.set("graft.merge.partitioned.enabled", "false")
      spark.conf.set("graft.merge.sparse.enabled", "false")
      val dense =
        try read(cat)
        finally {
          spark.conf.unset("graft.merge.partitioned.enabled")
          spark.conf.unset("graft.merge.sparse.enabled")
        }
      assert(got == dense, s"$table: split read diverged from dense " +
        s"(split=${got.size} rows, dense=${dense.size} rows)")
      got
    }

    for (round <- 0 until 2) {
      // --- Flavor A: composite nullable key + null-keyed deletes ---
      val catA = new GraftCatalog(spark, tmpDir(s"graft-spj-wa$round"))
      catA.createTable("ns.a", StructType(Seq(
        FieldMeta.field("a", StringType, nullable = true, mergeKey = true),
        FieldMeta.field("b", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", StringType))),
        properties = Map("read_optimization" -> "NONE",
          "compaction.num_buckets" -> "4"))
      val n = 4000 + rnd.nextInt(2000)
      // one null-keyed base row per 1000 — they must survive or tombstone
      // through the CONTESTED side (cannot equi-join)
      catA.writeToTable(spark.range(n)
        .select(when($"id" % 1000 === 0, lit(null))
          .otherwise(concat(lit("k"), $"id")).as("a"),
          $"id".as("b"), lit("x").as("v")).toDF(), "ns.a", WriteMode.Merge)
      catA.compact("ns.a")
      val m = 3 + rnd.nextInt(4)
      catA.writeToTable(spark.range(n).where($"id" % m === 1)
        .select(concat(lit("k"), $"id").as("a"), $"id".as("b"),
          lit(s"u$round").as("v")).toDF(), "ns.a", WriteMode.Merge)
      // delete EVERY null-keyed row (null-safe key match through the
      // contested side) + one sampled regular-keyed row (odd id: never a
      // null-keyed base id, which are multiples of 1000)
      val delB = (rnd.nextInt(n - 2) | 1).toLong
      catA.writeToTable(spark.range(n).where($"id" % 1000 === 0)
        .select(lit(null).cast("string").as("a"), $"id".as("b"))
        .union(spark.range(1).select(lit(s"k$delB").as("a"),
          lit(delB).as("b"))).toDF(), "ns.a", WriteMode.Delete)
      val gotA = denseEquals[(Option[String], Long, String)](catA, "ns.a",
        c => c.readTable("ns.a").collect().map(r =>
          (Option(r.getString(0)), r.getLong(1), r.getString(2)))
          .sortBy(t => (t._1.getOrElse(""), t._2)).toSeq,
        expectRegime = "partitioned")
      assert(!gotA.exists(_._1.isEmpty), s"round $round: every null-keyed base " +
        "row must be tombstoned by the null-keyed deletes (contested-side routing)")
      assert(!gotA.exists(_._2 == delB))

      // --- Flavor B: merge_order winner selection ---
      val catB = new GraftCatalog(spark, tmpDir(s"graft-spj-wb$round"))
      catB.createTable("ns.b", StructType(Seq(
        FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("prio", IntegerType, mergeOrder = Some("ASC")),
        FieldMeta.field("v", StringType))),
        properties = Map("read_optimization" -> "NONE",
          "compaction.num_buckets" -> "4"))
      catB.writeToTable(spark.range(n)
        .select($"id", lit(5).cast("int").as("prio"), lit("base").as("v")).toDF(),
        "ns.b", WriteMode.Merge)
      catB.compact("ns.b")
      // two dense-band upserts (20% of keys each) with randomized
      // priorities: the winner must be the merge_order pick, identically
      // under split and dense resolves
      val (p1, p2) = (rnd.nextInt(10), rnd.nextInt(10))
      catB.writeToTable(spark.range(n).where($"id" % 5 === 0)
        .select($"id", lit(p1).cast("int").as("prio"), lit("w1").as("v")).toDF(),
        "ns.b", WriteMode.Merge)
      catB.writeToTable(spark.range(n).where($"id" % 5 === 0)
        .select($"id", lit(p2).cast("int").as("prio"), lit("w2").as("v")).toDF(),
        "ns.b", WriteMode.Merge)
      val gotB = denseEquals[(Long, Int, String)](catB, "ns.b",
        c => c.readTable("ns.b").collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(_._1).toSeq,
        expectRegime = "partitioned")
      // winner content is merge_order-defined (extremum of {5, p1, p2});
      // the property under test is split≡dense, asserted in denseEquals
      assert(gotB.size == n)

      // --- Flavor C: renamed (then reverted) schema — the fallback boundary ---
      val catC = new GraftCatalog(spark, tmpDir(s"graft-spj-wc$round"))
      catC.createTable("ns.c", StructType(Seq(
        FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", StringType))),
        properties = Map("read_optimization" -> "NONE",
          "compaction.num_buckets" -> "4"))
      catC.writeToTable(spark.range(n)
        .select($"id", ($"id" % 7).cast("string").as("v")).toDF(),
        "ns.c", WriteMode.Merge)
      catC.compact("ns.c")
      catC.alterTable("ns.c", renameFields = Map("v" -> "w"),
        allowIncompatibleChanges = true)
      catC.writeToTable(spark.range(n).where($"id" % 4 === 0)
        .select($"id", lit("upd").as("w")).toDF(), "ns.c", WriteMode.Merge)
      // renamed → partitionedEligible must deny (KGP reads physical names);
      // the read falls back to the dense resolve and stays correct
      def readC(c: GraftCatalog): Seq[(Long, String)] =
        c.readTable("ns.c").collect().map(r =>
          (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      denseEquals[(Long, String)](catC, "ns.c", readC, expectRegime = "")
      // second hop (v→w→w2; reverting to a RETIRED name is refused by
      // DDL, so the chain grows): the breadcrumb chain persists across
      // hops, so the fallback must STILL hold — never a wrong plan, only
      // a slower one
      catC.alterTable("ns.c", renameFields = Map("w" -> "w2"),
        allowIncompatibleChanges = true)
      val gotC = denseEquals[(Long, String)](catC, "ns.c", readC,
        expectRegime = "")
      assert(gotC.size == n && gotC.toMap.apply(4L) == "upd" &&
        gotC.toMap.apply(3L) == "3")
    }
  }

  test("null-keyed base rows route to the contested side and can be tombstoned") {
    val cat = new GraftCatalog(spark, tmpDir("graft-spj-null"))
    cat.createTable("ns.n", StructType(Seq(
      FieldMeta.field("a", StringType, nullable = true, mergeKey = true),
      FieldMeta.field("b", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))),
      properties = Map("read_optimization" -> "NONE",
        "compaction.num_buckets" -> "4"))
    val base = spark.range(4000)
      .select(when($"id" === 0, lit(null)).otherwise(concat(lit("k"), $"id")).as("a"),
        $"id".as("b"), lit("x").as("v"))
    cat.writeToTable(base.toDF(), "ns.n", WriteMode.Merge)
    cat.compact("ns.n")
    // Dense-band pending (25%) + the null-keyed delete.
    cat.writeToTable(spark.range(4000).where($"id" % 4 === 1)
      .select(concat(lit("k"), $"id").as("a"), $"id".as("b"), lit("u").as("v")).toDF(),
      "ns.n", WriteMode.Merge)
    cat.writeToTable(Seq((Option.empty[String], 0L), (Some("k7"), 7L)).toDF("a", "b"),
      "ns.n", WriteMode.Delete)
    val read = cat.readTable("ns.n")
    assert(read.queryExecution.executedPlan.toString.contains("BatchScan"),
      "dense-band read should take the partitioned path")
    assert(read.count() == 3998)
    assert(read.where($"a".isNull).count() == 0,
      "null-keyed row must be deleted — it cannot equi-join, so it must " +
        "have been routed to the contested resolve")
    assert(read.where($"b" === 7L).count() == 0)
    assert(read.where($"b" === 5L).head().getString(2) == "u")
  }

  test("split files (tiny maxPartitionBytes): per-bucket regrouping keeps every row-group split") {
    // The 100 TB shape: one bucket = MANY scan splits. The KeyGrouped scan
    // regroups the delegate's planned splits by bucket directory; a split
    // lost or double-grouped would corrupt counts or join results.
    val cat = new GraftCatalog(spark, tmpDir("graft-spj-splits"))
    mkTable(cat, "ns.s")
    cat.writeToTable(spark.range(20000)
      .select($"id", concat(lit("padpadpadpad-"), $"id").as("v")).toDF(),
      "ns.s", WriteMode.Merge)
    cat.compact("ns.s")
    cat.writeToTable(spark.range(20000).where($"id" % 4 === 0)
      .select($"id", lit("upd").as("v")).toDF(), "ns.s", WriteMode.Merge)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384") // force many splits
    try {
      val spj = cat.readTable("ns.s")
      assert(spj.queryExecution.executedPlan.toString.contains("BatchScan"))
      val got = spj.as[(Long, String)].collect().sortBy(_._1).toSeq
      spark.conf.set("graft.merge.partitioned.enabled", "false")
      val dense =
        try cat.readTable("ns.s").as[(Long, String)].collect().sortBy(_._1).toSeq
        finally spark.conf.unset("graft.merge.partitioned.enabled")
      assert(got == dense && got.size == 20000,
        s"split regrouping diverged: spj=${got.size} dense=${dense.size}")
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("key rowFilter pushes into the partitioned base scan (row-group pruning) and stays row-identical") {
    val cat = new GraftCatalog(spark, tmpDir("graft-spj-push"))
    mkTable(cat, "ns.f")
    cat.writeToTable(spark.range(20000)
      .select($"id", ($"id" % 7).cast("string").as("v")).toDF(), "ns.f", WriteMode.Merge)
    cat.compact("ns.f")
    cat.writeToTable(spark.range(20000).where($"id" % 4 === 0)
      .select($"id", lit("upd").as("v")).toDF(), "ns.f", WriteMode.Merge)

    val opts = ReadOptions(rowFilter = Some($"id" >= 15000L && $"id" < 18000L))
    val spj = cat.readTable("ns.f", opts)
    val planStr = spj.queryExecution.executedPlan.toString
    assert(planStr.contains("BatchScan"), "filtered dense-band read must stay partitioned")
    // The pre-bound scan relation bypasses V2ScanRelationPushDown, so the
    // pushed filters come from BucketedBase.frame itself — visible in the
    // delegate ParquetScan's description inside the BatchScan node.
    assert(planStr.contains("GreaterThanOrEqual(id,15000"),
      s"key predicate must reach the delegate parquet scan:\n${planStr.take(3000)}")
    val got = spj.as[(Long, String)].collect().sortBy(_._1).toSeq
    spark.conf.set("graft.merge.partitioned.enabled", "false")
    val dense =
      try cat.readTable("ns.f", opts).as[(Long, String)].collect().sortBy(_._1).toSeq
      finally spark.conf.unset("graft.merge.partitioned.enabled")
    assert(got == dense, s"pushed-filter read diverged: spj=${got.size} dense=${dense.size}")
    assert(got.size == 3000 && got.head._1 == 15000L && got.toMap.apply(15000L) == "upd")
  }

  test("compaction reuses the split ladder: dense-band compact takes the partitioned regime") {
    val cat = new GraftCatalog(spark, tmpDir("graft-spj-compact"))
    mkTable(cat, "ns.k")
    cat.writeToTable(spark.range(20000)
      .select($"id", ($"id" % 7).cast("string").as("v")).toDF(), "ns.k", WriteMode.Merge)
    cat.compact("ns.k")
    cat.writeToTable(spark.range(20000).where($"id" % 4 === 0)
      .select($"id", lit("upd").as("v")).toDF(), "ns.k", WriteMode.Merge)
    cat.writeToTable(spark.range(20000).select($"id")
      .where($"id" % 997 === 0).toDF(), "ns.k", WriteMode.Delete)

    MergeRead.lastSplitRegime = ""
    cat.compact("ns.k")
    assert(MergeRead.lastSplitRegime == "partitioned",
      "a dense-band compaction must resolve via the storage-partitioned split")
    // The compacted state must be exactly the dense resolve's answer.
    val got = cat.readTable("ns.k").as[(Long, String)].collect().sortBy(_._1).toSeq
    val byId = got.toMap
    assert(got.size == 20000 - 21 && byId(4L) == "upd" && !byId.contains(997L))

    // Trickle after the recompact: the compactor's ladder picks SPARSE.
    cat.writeToTable(Seq((7L, "t7")).toDF("id", "v"), "ns.k", WriteMode.Merge)
    MergeRead.lastSplitRegime = ""
    cat.compact("ns.k")
    assert(MergeRead.lastSplitRegime == "sparse",
      "a trickle compaction must resolve via the broadcast sparse split")
    assert(cat.readTable("ns.k").where($"id" === 7L).head().getString(1) == "t7")
  }

  test("conf gates: ratio flips the path; withFilePath and disabled are ineligible") {
    val cat = new GraftCatalog(spark, tmpDir("graft-spj-conf"))
    mkTable(cat, "ns.c")
    cat.writeToTable(spark.range(10000)
      .select($"id", ($"id" % 7).cast("string").as("v")).toDF(), "ns.c", WriteMode.Merge)
    cat.compact("ns.c")
    cat.writeToTable(spark.range(10000).where($"id" % 4 === 0)
      .select($"id", lit("u").as("v")).toDF(), "ns.c", WriteMode.Merge)
    def planOf(opts: ReadOptions = ReadOptions()) =
      cat.readTable("ns.c", opts).queryExecution.executedPlan.toString
    assert(planOf().contains("BatchScan"), "25% pending should take the partitioned path")
    // pending*8 > base → raise minBaseRatio so even 25% is "too dense"
    spark.conf.set("graft.merge.partitioned.minBaseRatio", "8")
    try assert(!planOf().contains("BatchScan"))
    finally spark.conf.unset("graft.merge.partitioned.minBaseRatio")
    // per-row file paths need real _metadata — the partitioned path bows out
    assert(!planOf(ReadOptions(withFilePath = true)).contains("BatchScan"))
    val withPath = cat.readTable("ns.c", ReadOptions(withFilePath = true))
    assert(withPath.where(col("_file_path").contains("partitioned-base")).count() == 0)
    spark.conf.set("graft.merge.partitioned.enabled", "false")
    try assert(!planOf().contains("BatchScan"))
    finally spark.conf.unset("graft.merge.partitioned.enabled")
  }

  test("downstream groupBy on merge keys: partitioned output re-shuffles, denseResolve pin is exchange-free on top") {
    // The documented trade (ReadOptions.denseResolve): the split regimes'
    // pass∪contested union is UnknownPartitioning, so a keyed consumer
    // re-shuffles the FULL merged output; the dense resolve preserves
    // hash(mergeKeys), so the same consumer adds ZERO exchanges. Asserted
    // relatively (exchanges added by the groupBy under each path), so the
    // inner plan shape can evolve without breaking the leg.
    val cat = new GraftCatalog(spark, tmpDir("graft-spj-down"))
    mkTable(cat, "ns.d")
    cat.writeToTable(spark.range(20000)
      .select($"id", ($"id" % 7).cast("string").as("v")).toDF(), "ns.d", WriteMode.Merge)
    cat.compact("ns.d")
    cat.writeToTable(spark.range(20000).where($"id" % 4 === 0)
      .select($"id", lit("upd").as("v")).toDF(), "ns.d", WriteMode.Merge)

    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      def stripped(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      stripped(df.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }.size
    }
    def agg(opts: ReadOptions) =
      cat.readTable("ns.d", opts).groupBy("id").agg(max("v").as("mv"))

    val spjRead = cat.readTable("ns.d")
    assert(spjRead.queryExecution.executedPlan.toString.contains("BatchScan"),
      "the 25%-pending read must engage the partitioned path")
    val addedSpj = exchanges(agg(ReadOptions())) - exchanges(spjRead)
    val denseRead = cat.readTable("ns.d", ReadOptions(denseResolve = true))
    assert(!denseRead.queryExecution.executedPlan.toString.contains("BatchScan"))
    val addedDense = exchanges(agg(ReadOptions(denseResolve = true))) - exchanges(denseRead)
    assert(addedDense == 0,
      s"dense resolve preserves hash(keys): the keyed agg must add no exchange (added $addedDense)")
    assert(addedSpj >= 1,
      s"partitioned output is UnknownPartitioning: the keyed agg must re-shuffle (added $addedSpj)")
    // Same answer either way.
    val a = agg(ReadOptions()).as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = agg(ReadOptions(denseResolve = true)).as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b && a.size == 20000)
  }

  test("bucket-skew observability: hot bucket fires the recluster advisor; balanced stays quiet") {
    // Hot layout over 16 buckets: keep EVERY id landing in the
    // writer-kernel's bucket 0 plus a 1-in-13 sample of the rest —
    // bucket 0 ends up ~13x the mean. Bucket membership computed with
    // the SAME kernel the writer uses (pmod(hash(id), 16)), so the
    // plant is deterministic. (With n buckets, skew maxes at n — a
    // 4-bucket layout can never exceed the 4.0 threshold.)
    val skewRoot = tmpDir("graft-spj-skew")
    val cat = new GraftCatalog(spark, skewRoot)
    mkTable(cat, "ns.hot", buckets = 16)
    val ids = spark.range(40000)
      .withColumn("b", pmod(hash($"id"), lit(16)))
      .where($"b" === 0 || $"id" % 13 === 0)
    cat.writeToTable(ids.select($"id",
      concat(lit("pad-pad-pad-"), $"id").as("v")).toDF(), "ns.hot", WriteMode.Merge)
    cat.compact("ns.hot")

    val advice = cat.reclusterAdvice("ns.hot")
      .getOrElse(fail("compacted bucketed base must yield advice"))
    assert(advice.numBuckets == 16 && advice.populated == 16)
    assert(advice.hottest.bucket == 0, s"hot bucket misidentified: $advice")
    assert(advice.skew >= Compactor.SkewThreshold && advice.reasons.contains("skew"),
      s"planted skew must fire the advisor: $advice")
    assert(advice.recommended)
    // The SQL-surface probe agrees: per-bucket bytes from the manifest
    // view (bucket is null for un-bucketed pre-compaction files).
    val perBucket = cat.manifestTable("ns.hot")
      .where($"bucket".isNotNull)
      .groupBy("bucket").agg(sum("size_bytes").as("b"))
      .as[(Int, Long)].collect().toMap
    assert(perBucket.keySet == (0 until 16).toSet)
    assert(perBucket(0) > 4L * (perBucket.values.sum - perBucket(0)) / 15,
      s"manifest view must show the hot bucket: $perBucket")
    // SQL route to the same verdict (round-13): the TVF row must equal
    // the Scala advice the auto-compaction path acts on.
    graft.Graft.registerFunctions(spark)
    val tvf = spark.sql(
      s"SELECT * FROM graft_recluster_advice('$skewRoot', 'ns.hot')").collect()
    assert(tvf.length == 1)
    val r = tvf.head
    assert(r.getAs[Int]("num_buckets") == advice.numBuckets &&
      r.getAs[Int]("suggested_buckets") == advice.suggestedBuckets &&
      r.getAs[Boolean]("recommended") == advice.recommended &&
      r.getAs[scala.collection.Seq[String]]("reasons").toSeq == advice.reasons,
      s"TVF advice must equal the Scala advice: $r vs $advice")
    // Above the planning gate the same verdict streams off the skeleton
    // base's metafile — identical advice with the gate forced to 1 byte.
    spark.conf.set(graft.catalog.ManifestPlanner.GateConfKey, "1")
    try assert(cat.reclusterAdvice("ns.hot") == Some(advice),
      "streamed (above-gate) advice must equal the in-memory advice")
    finally spark.conf.unset(graft.catalog.ManifestPlanner.GateConfKey)

    // Balanced layout: same volume spread uniformly — advisor stays quiet.
    val cat2 = new GraftCatalog(spark, tmpDir("graft-spj-skew-b"))
    mkTable(cat2, "ns.bal")
    cat2.writeToTable(spark.range(20000).select($"id",
      concat(lit("pad-pad-pad-"), $"id").as("v")).toDF(), "ns.bal", WriteMode.Merge)
    cat2.compact("ns.bal")
    val balanced = cat2.reclusterAdvice("ns.bal")
      .getOrElse(fail("compacted bucketed base must yield advice"))
    assert(!balanced.recommended && balanced.skew < 2.0,
      s"uniform layout must not fire the advisor: $balanced")
    // Un-compacted table: no bucketed base, no advice.
    val cat3 = new GraftCatalog(spark, tmpDir("graft-spj-skew-n"))
    mkTable(cat3, "ns.none")
    cat3.writeToTable(Seq((1L, "x")).toDF("id", "v"), "ns.none", WriteMode.Merge)
    assert(cat3.reclusterAdvice("ns.none").isEmpty)
  }

  test("advice→action: auto-compaction re-buckets an undersized layout; copy-by-ref invalidated; partitioned read trusts the new count") {
    // Undersized by construction: a 2-bucket recorded layout gets
    // suggestBuckets' floor of 8 > 2×2, so `undersized_layout` fires —
    // the small-fixture analog of a table that outgrew its bootstrap
    // layout. Trigger starts unreachable so the recluster moment is
    // explicit, then drops to 1 delta for the write that should act.
    def mk(root: String, name: String, props: Map[String, String]) = {
      val c = new GraftCatalog(spark, tmpDir(root))
      c.createTable(name, StructType(Seq(
        FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", StringType))),
        properties = Map("read_optimization" -> "NONE",
          "compaction.num_buckets" -> "2",
          "compaction.trigger.deltas" -> "1000") ++ props)
      c.writeToTable(spark.range(20000)
        .select($"id", ($"id" % 7).cast("string").as("v")).toDF(), name, WriteMode.Merge)
      c.compact(name)
      c
    }
    def base(c: GraftCatalog, name: String) =
      MergeRead.activeDeltas(c.deltaLog(name))._1.getOrElse(fail(s"no base on $name"))
    def baseBuckets(c: GraftCatalog, name: String): Int =
      base(c, name).properties("num_buckets").toInt

    val cat = mk("graft-spj-grow", "ns.g", Map.empty)
    assert(baseBuckets(cat, "ns.g") == 2)
    val advice = cat.reclusterAdvice("ns.g").getOrElse(fail("advice expected"))
    assert(advice.reasons.contains("undersized_layout") && advice.suggestedBuckets >= 8,
      s"fixture must present an undersized layout: $advice")
    val oldPaths = base(cat, "ns.g").entries.map(_.path).toSet
    assert(oldPaths.nonEmpty)

    // Ad-hoc compact (no pending work via trigger yet) keeps the recorded
    // layout — the advice must NOT leak into explicit compact() calls.
    cat.writeToTable(spark.range(64).select($"id", lit("p0").as("v")).toDF(),
      "ns.g", WriteMode.Merge)
    cat.compact("ns.g")
    assert(baseBuckets(cat, "ns.g") == 2,
      "explicit compact() must keep the recorded layout (copy-by-ref contract)")

    // Now the write-triggered path: trigger drops to 1 pending delta, the
    // next write fires maybeAutoCompact, which consults the advisor and
    // recompacts at the suggested count.
    cat.alterTable("ns.g", setProperties = Map("compaction.trigger.deltas" -> "1"))
    cat.writeToTable(spark.range(20000).where($"id" % 4 === 0)
      .select($"id", lit("upd").as("v")).toDF(), "ns.g", WriteMode.Merge)
    assert(baseBuckets(cat, "ns.g") == advice.suggestedBuckets,
      "auto-compaction must act on undersized_layout advice")
    // The count change invalidates copy-by-reference by construction: no
    // old-layout file may survive into the re-bucketed base.
    val newEntries = base(cat, "ns.g").entries.map(_.path)
    assert(newEntries.nonEmpty && !newEntries.exists(oldPaths.contains),
      "bucket-count change must invalidate copy-by-reference")
    // The partitioned merge trusts the NEW recorded count: a dense pending
    // band reads via the KeyGrouped scan and matches the dense resolve.
    cat.alterTable("ns.g", setProperties = Map("compaction.trigger.deltas" -> "1000"))
    cat.writeToTable(spark.range(20000).where($"id" % 4 === 1)
      .select($"id", lit("upd2").as("v")).toDF(), "ns.g", WriteMode.Merge)
    val spj = cat.readTable("ns.g")
    assert(spj.queryExecution.executedPlan.toString.contains("BatchScan"),
      "post-recluster dense band must still engage the partitioned path")
    val got = spj.as[(Long, String)].collect().sortBy(_._1).toSeq
    spark.conf.set("graft.merge.partitioned.enabled", "false")
    try assert(got == cat.readTable("ns.g").as[(Long, String)].collect().sortBy(_._1).toSeq,
      "partitioned and dense reads must agree on the re-bucketed layout")
    finally spark.conf.unset("graft.merge.partitioned.enabled")
    assert(got.size == 20000 && got.toMap.apply(4L) == "upd" && got.toMap.apply(5L) == "upd2")

    // Opt-out: compaction.recluster.auto=false keeps the stale layout.
    val cat2 = mk("graft-spj-grow-off", "ns.goff",
      Map("compaction.recluster.auto" -> "false"))
    cat2.alterTable("ns.goff", setProperties = Map("compaction.trigger.deltas" -> "1"))
    cat2.writeToTable(spark.range(64).select($"id", lit("q").as("v")).toDF(),
      "ns.goff", WriteMode.Merge)
    assert(baseBuckets(cat2, "ns.goff") == 2,
      "recluster.auto=false must keep the recorded layout")

    // Above the manifest planning gate: maintenance reads skeleton deltas
    // (entries never materialize), the triggers run off commit-stamped
    // record/file counts, and the advice aggregates per-bucket sums by
    // STREAMING the base metafile — same recluster outcome with the gate
    // forced to 1 byte.
    val cat3 = mk("graft-spj-grow-gate", "ns.ggate", Map.empty)
    cat3.alterTable("ns.ggate", setProperties = Map("compaction.trigger.deltas" -> "1"))
    spark.conf.set(graft.catalog.ManifestPlanner.GateConfKey, "1")
    try cat3.writeToTable(spark.range(20000).where($"id" % 4 === 0)
      .select($"id", lit("upd").as("v")).toDF(), "ns.ggate", WriteMode.Merge)
    finally spark.conf.unset(graft.catalog.ManifestPlanner.GateConfKey)
    assert(baseBuckets(cat3, "ns.ggate") == 8,
      "streamed (above-gate) advice must drive the same recluster")
    val g = cat3.readTable("ns.ggate").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(g.size == 20000 && g.toMap.apply(4L) == "upd" && g.toMap.apply(3L) == "3")
  }

  test("planted power-law merge key: hot bucket leaves the partitioned plan, resolves densely, rows ≡ dense ≡ pure-partitioned") {
    // The one skew rebucketing cannot fix (round-14, verdict ask #2): the
    // bucket id is pmod(hash(id), n) — a function of the merge KEY alone —
    // so under a partition-scoped identity (day, id) the key id=0, live in
    // EVERY day partition, concentrates all its rows in one bucket at any
    // bucket count. The read must carve that bucket out of the
    // storage-partitioned plan (single-partition-per-bucket would
    // serialize it) and resolve it densely, without changing a single row.
    val days = 200L
    val cat = new GraftCatalog(spark, tmpDir("graft-spj-hotkey"))
    cat.createTable("ns.hk", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("day", LongType, nullable = false),
      FieldMeta.field("v", StringType))),
      partitionScheme = PartitionScheme(Seq(PartitionKey("day", Transform.Identity))),
      properties = Map("read_optimization" -> "NONE",
        "compaction.num_buckets" -> "4"))
    // Hot key id=0 in every day (200 rows, one bucket); cold ids 1..299
    // one day each (~75 rows per bucket). Hot bucket ≥ 200 rows vs mean
    // 125 — hot under (factor 1.2, minRows 100) for ANY cold-key hash
    // distribution (200 > 1.2×125 = 150; no cold bucket can reach 150),
    // standing in for the production defaults (8×, 4M rows) at test scale.
    val hot = spark.range(days).select(lit(0L).as("id"), $"id".as("day"),
      concat(lit("h"), $"id").as("v"))
    val cold = spark.range(1, 300).select($"id", ($"id" % days).as("day"),
      lit("c").as("v"))
    cat.writeToTable(hot.unionByName(cold).toDF(), "ns.hk", WriteMode.Merge)
    cat.compact("ns.hk")
    // Pending in the partitioned band: 81 rows — >62 (past the sparse 8×
    // ratio on the FULL base of 500) and ≤ half the cold base (coldBase ≥
    // 180 under any hash distribution). Updates hit the hot key in 40
    // days, 30 cold keys, and delete the hot key from days 190..199 plus
    // cold id 7 — deletes must land on the correct side of the split too.
    cat.writeToTable(spark.range(40).select(lit(0L).as("id"), $"id".as("day"),
      lit("HUP").as("v")).toDF(), "ns.hk", WriteMode.Merge)
    cat.writeToTable(spark.range(1, 31).select($"id", ($"id" % days).as("day"),
      lit("CUP").as("v")).toDF(), "ns.hk", WriteMode.Merge)
    cat.writeToTable(
      spark.range(190, 200).select(lit(0L).as("id"), $"id".as("day"))
        .unionByName(Seq((7L, 7L)).toDF("id", "day")).toDF(),
      "ns.hk", WriteMode.Delete)

    def rows(): Seq[(Long, Long, String)] =
      cat.readTable("ns.hk").as[(Long, Long, String)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    spark.conf.set(MergeRead.HotBucketFactorKey, "1.2")
    spark.conf.set(MergeRead.HotBucketMinRowsKey, "100")
    val (split, regime) = try {
      MergeRead.lastSplitRegime = ""
      val df = cat.readTable("ns.hk")
      // The cold side must still be the exchange-free KeyGrouped scan.
      assertPassSideNeverShuffles(df.queryExecution.executedPlan)
      (rows(), MergeRead.lastSplitRegime)
    } finally {
      spark.conf.unset(MergeRead.HotBucketFactorKey)
      spark.conf.unset(MergeRead.HotBucketMinRowsKey)
    }
    assert(regime == "partitioned_hotsplit",
      s"planted hot bucket must engage the carve-out, planned '$regime'")
    // Reference 1: the pure dense resolve (partitioned path disabled).
    spark.conf.set("graft.merge.partitioned.enabled", "false")
    val dense = try rows() finally spark.conf.unset("graft.merge.partitioned.enabled")
    // Reference 2: the pure partitioned path (carve-out disabled) — the
    // hot bucket stays in the KeyGrouped plan; slower shape, same rows.
    MergeRead.lastSplitRegime = ""
    val pureSpj = rows()
    assert(MergeRead.lastSplitRegime == "partitioned",
      "carve-out must be off at default thresholds on a test-sized table")
    assert(split == dense, "hot-split read diverged from the dense resolve")
    assert(split == pureSpj, "hot-split read diverged from the pure partitioned read")
    // Semantic spot checks on the hot key's partition-scoped versions.
    val hotRows = split.filter(_._1 == 0L).map(r => r._2 -> r._3).toMap
    assert(hotRows.size == 190 && !hotRows.contains(195L),
      "hot key must keep one row per remaining day")
    assert(hotRows(10L) == "HUP" && hotRows(60L) == "h60",
      s"hot key day-scoped upserts misapplied: ${hotRows.get(10L)}, ${hotRows.get(60L)}")
    assert(!split.exists(_._1 == 7L) && split.filter(_._1 == 8L).head._3 == "CUP")
    assert(split.size == 190 + 299 - 1 - 0) // 190 hot days + 299 cold - id 7
    // Above the manifest planning gate the deltas re-materialize through
    // the distributed prune STATS-STRIPPED — but record-counted
    // (entry.copy(stats = null)), which is exactly what hot-bucket
    // detection reads. Pin that the carve-out still engages on streamed
    // skeleton metadata: a silent empty-detection here would turn the
    // mitigation off at precisely the 10^7-entry scale it exists for.
    spark.conf.set(graft.catalog.ManifestPlanner.GateConfKey, "1")
    spark.conf.set(MergeRead.HotBucketFactorKey, "1.2")
    spark.conf.set(MergeRead.HotBucketMinRowsKey, "100")
    try {
      MergeRead.lastSplitRegime = ""
      val gated = rows()
      assert(MergeRead.lastSplitRegime == "partitioned_hotsplit",
        "above-gate read must detect the hot bucket from streamed entries, " +
          s"planned '${MergeRead.lastSplitRegime}'")
      assert(gated == split, "above-gate hot-split read diverged")
    } finally {
      spark.conf.unset(graft.catalog.ManifestPlanner.GateConfKey)
      spark.conf.unset(MergeRead.HotBucketFactorKey)
      spark.conf.unset(MergeRead.HotBucketMinRowsKey)
    }
    // Compaction's resolve half shares the carve-out (round-14): the hot
    // bucket must not straggle the REWRITE either. Run the fold ABOVE the
    // planning gate on top — compaction's deltas are then entry-less
    // skeletons, so this also pins that hot detection streams the base
    // metafile and the split-regime ratios resolve from the commit-stamped
    // record_count properties (either failing silently would force the
    // dense resolve at exactly the scale the splits exist for). The
    // compacted table must read back the exact same rows (now scan-only).
    spark.conf.set(graft.catalog.ManifestPlanner.GateConfKey, "1")
    spark.conf.set(MergeRead.HotBucketFactorKey, "1.2")
    spark.conf.set(MergeRead.HotBucketMinRowsKey, "100")
    try {
      MergeRead.lastSplitRegime = ""
      cat.compact("ns.hk")
      assert(MergeRead.lastSplitRegime == "partitioned_hotsplit",
        "above-gate compaction's resolve must engage the hot-bucket " +
          s"carve-out, planned '${MergeRead.lastSplitRegime}'")
    } finally {
      spark.conf.unset(graft.catalog.ManifestPlanner.GateConfKey)
      spark.conf.unset(MergeRead.HotBucketFactorKey)
      spark.conf.unset(MergeRead.HotBucketMinRowsKey)
    }
    assert(rows() == split, "compacted table diverged from the hot-split read")
  }

  test("forced carve-out randomized equivalence: nullable keys, deletes, partial upserts through BOTH hot-side variants") {
    // The carve-out's key-routing must hold on arbitrary tables, not just
    // the planted power-law fixture: factor 1.001 + minRows 1 makes any
    // bucket above the (noisy) mean hot — at least one bucket always
    // stays cold (min ≤ mean by identity), so the split exercises a
    // genuinely mixed plan with null-keyed rows, a null-keyed DELETE, and
    // PARTIAL upserts landing on whichever side their key hashes to.
    // Both hot-side variants run: the broadcast pass/contested split and
    // (maxPendingRows=0) the bucket-filtered dense-resolve fallback.
    val rnd = new scala.util.Random(20260817L)
    var hotsplitRounds = 0
    for (round <- 0 until 3) {
      val cat = new GraftCatalog(spark, tmpDir(s"graft-spj-fh$round"))
      cat.createTable("ns.f", StructType(Seq(
        FieldMeta.field("a", StringType, nullable = true, mergeKey = true),
        FieldMeta.field("b", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", StringType),
        FieldMeta.field("w", LongType))),
        properties = Map("read_optimization" -> "NONE",
          "compaction.num_buckets" -> "4"))
      val n = 4000 + rnd.nextInt(2000)
      cat.writeToTable(spark.range(n)
        .select(when($"id" % 500 === 0, lit(null))
          .otherwise(concat(lit("k"), $"id")).as("a"),
          $"id".as("b"), lit("x").as("v"), $"id".as("w")).toDF(),
        "ns.f", WriteMode.Merge)
      cat.compact("ns.f")
      // ~17-20% pending keeps the read in the partitioned band: past the
      // sparse 8× ratio on the full base, within 2× of the usual cold base.
      val m = 5 + rnd.nextInt(2)
      cat.writeToTable(spark.range(n).where($"id" % m === 1)
        .select(concat(lit("k"), $"id").as("a"), $"id".as("b"),
          lit(s"u$round").as("v")).toDF(), "ns.f", WriteMode.Merge) // partial: no w
      cat.writeToTable(spark.range(n).where($"id" % 500 === 0)
        .select(lit(null).cast("string").as("a"), $"id".as("b")).toDF(),
        "ns.f", WriteMode.Delete)
      def rows(c: GraftCatalog): Seq[(Option[String], Long, String, String)] =
        c.readTable("ns.f").collect().map(r =>
          (Option(r.getString(0)), r.getLong(1), r.getString(2),
            Option(r.get(3)).map(_.toString).getOrElse("∅")))
          .sortBy(t => (t._1.getOrElse(""), t._2)).toSeq
      spark.conf.set("graft.merge.partitioned.enabled", "false")
      spark.conf.set("graft.merge.sparse.enabled", "false")
      val dense =
        try rows(cat)
        finally {
          spark.conf.unset("graft.merge.partitioned.enabled")
          spark.conf.unset("graft.merge.sparse.enabled")
        }
      assert(!dense.exists(_._1.isEmpty), "null-keyed rows must be tombstoned")
      spark.conf.set(MergeRead.HotBucketFactorKey, "1.001")
      spark.conf.set(MergeRead.HotBucketMinRowsKey, "1")
      try {
        MergeRead.lastSplitRegime = ""
        val broadcastSide = rows(cat)
        val engaged = MergeRead.lastSplitRegime == "partitioned_hotsplit"
        if (engaged) hotsplitRounds += 1
        assert(broadcastSide == dense,
          s"round $round: forced carve-out (broadcast hot side, engaged=$engaged) diverged from dense")
        // un-broadcastable pending → the bucket-filtered dense hot side
        spark.conf.set("graft.merge.sparse.maxPendingRows", "0")
        MergeRead.lastSplitRegime = ""
        val denseSide =
          try rows(cat)
          finally spark.conf.unset("graft.merge.sparse.maxPendingRows")
        assert(denseSide == dense,
          s"round $round: forced carve-out (dense hot side) diverged from dense")
      } finally {
        spark.conf.unset(MergeRead.HotBucketFactorKey)
        spark.conf.unset(MergeRead.HotBucketMinRowsKey)
      }
    }
    assert(hotsplitRounds > 0,
      "no round engaged the carve-out — the forced-threshold equivalence " +
        "degraded to dense≡dense (eligibility or detection regression?)")
  }

  test("holey layout: every populated bucket hot → hot-only broadcast split, new keys in empty buckets survive") {
    // All keys hash to bucket 0 of 4 (a severely under-populated layout —
    // the only way EVERY populated bucket can exceed factor×mean, since
    // the mean is over declared buckets): there is no cold side to
    // key-group, and the carve-out must take the broadcast pass/contested
    // split over the whole base instead of abandoning the split for a full
    // dense shuffle. Pending is deliberately UNFILTERED on that path: the
    // new key below hashes into an EMPTY bucket, and a bucket filter would
    // silently drop it.
    import spark.implicits._
    val cat = new GraftCatalog(spark, tmpDir("graft-spj-holey"))
    cat.createTable("ns.h", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))),
      properties = Map("read_optimization" -> "NONE",
        "compaction.num_buckets" -> "4"))
    val b0Ids = spark.range(40000)
      .where(pmod(hash($"id"), lit(4)) === 0).limit(5000).cache()
    cat.writeToTable(b0Ids.select($"id", lit("x").as("v")).toDF(),
      "ns.h", WriteMode.Merge)
    cat.compact("ns.h")
    // pending in the partitioned band vs the FULL base: updates to ~1/6 of
    // the hot keys, one brand-new key from a different (empty) bucket, and
    // a delete
    val newKey = (0L until 64L).find(i => {
      import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
      Pmod(new Murmur3Hash(Seq(Literal(i))), Literal(4)).eval(null).asInstanceOf[Int] != 0
    }).get
    cat.writeToTable(b0Ids.where($"id" % 6 === 0)
      .select($"id", lit("u").as("v"))
      .unionByName(Seq((newKey, "new")).toDF("id", "v")).toDF(),
      "ns.h", WriteMode.Merge)
    cat.writeToTable(b0Ids.orderBy($"id").limit(1).select($"id").toDF(),
      "ns.h", WriteMode.Delete)
    def rows(): Seq[(Long, String)] =
      cat.readTable("ns.h").as[(Long, String)].collect().sortBy(_._1).toSeq
    spark.conf.set("graft.merge.partitioned.enabled", "false")
    spark.conf.set("graft.merge.sparse.enabled", "false")
    val dense = try rows() finally {
      spark.conf.unset("graft.merge.partitioned.enabled")
      spark.conf.unset("graft.merge.sparse.enabled")
    }
    spark.conf.set(MergeRead.HotBucketFactorKey, "1.2")
    spark.conf.set(MergeRead.HotBucketMinRowsKey, "100")
    try {
      MergeRead.lastSplitRegime = ""
      val got = rows()
      assert(MergeRead.lastSplitRegime == "partitioned_hotsplit",
        s"holey layout must take the hot-only split, planned '${MergeRead.lastSplitRegime}'")
      assert(got == dense, "hot-only split diverged from dense")
      assert(got.exists(r => r._1 == newKey && r._2 == "new"),
        "the new key in an empty bucket must survive the hot-only split")
    } finally {
      spark.conf.unset(MergeRead.HotBucketFactorKey)
      spark.conf.unset(MergeRead.HotBucketMinRowsKey)
      b0Ids.unpersist()
    }
  }
}
