package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/** Sparse merge-on-read: a trickle of pending upserts/deletes against a big
  * compacted base reads via broadcast key-split (uncontested base rows
  * stream through with no shuffle) instead of the dense shuffle resolve. */
class SparseMergeSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(cat: GraftCatalog, name: String): Unit =
    cat.createTable(name, StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))))

  test("trickle upsert+delete takes the broadcast sparse path and matches the dense resolve") {
    val cat = new GraftCatalog(spark, tmpDir("graft-sparse"))
    mkTable(cat, "ns.t")
    val base = spark.range(10000).select($"id", ($"id" % 7).cast("string").as("v"))
    cat.writeToTable(base.toDF(), "ns.t", WriteMode.Merge)
    // 5% auto-compaction valve: ~120 pending rows on a 10k base stay
    // merge-on-read, which is exactly the sparse regime (ratio 8x, cap 4M).
    cat.writeToTable(
      (spark.range(100).select(($"id" * 100).as("id"), lit("upd").as("v")) union
        Seq((20001L, "ins")).toDF("id", "v")).toDF(), "ns.t", WriteMode.Merge)
    cat.writeToTable(spark.range(10000).select($"id")
      .where($"id" % 997 === 0).toDF(), "ns.t", WriteMode.Delete)

    val sparse = cat.readTable("ns.t")
    // The sparse key-split is visible as the renamed pending-key columns in
    // a broadcast join (the lineage join is ALSO broadcast, so the join
    // operator alone does not discriminate).
    val plan = sparse.queryExecution.executedPlan.toString
    assert(plan.contains("_g_pk_id"),
      s"sparse merge read should broadcast the pending key set; got:\n${plan.take(2000)}")
    val got = sparse.as[(Long, String)].collect().sortBy(_._1).toSeq

    // Disable BOTH cheaper regimes: with sparse off, the storage-
    // partitioned band (ratio ≥ 2) would otherwise catch this read — the
    // dense shuffle resolve is the ladder's last rung now.
    spark.conf.set("graft.merge.sparse.enabled", "false")
    spark.conf.set("graft.merge.partitioned.enabled", "false")
    try {
      val dense = cat.readTable("ns.t")
      assert(!dense.queryExecution.executedPlan.toString.contains("_g_pk_id"))
      assert(got == dense.as[(Long, String)].collect().sortBy(_._1).toSeq,
        "sparse and dense merge reads must be identical")
    } finally {
      spark.conf.unset("graft.merge.sparse.enabled")
      spark.conf.unset("graft.merge.partitioned.enabled")
    }

    // Semantics spot checks: updates win, insert present, deletes gone.
    val byId = got.toMap
    assert(byId(100L) == "upd" && byId(20001L) == "ins")
    assert(!byId.contains(0L), "id 0 was updated then... (0*100=0 upd, 0%997==0 deleted)")
    assert(!byId.contains(997L))
    assert(got.size == 10000 + 1 - 11) // 11 multiples of 997 in [0, 10000): 0..9970
  }

  test("sparse thresholds are conf-tunable: ratio and row cap flip the path") {
    val cat = new GraftCatalog(spark, tmpDir("graft-sparse-conf"))
    mkTable(cat, "ns.c")
    cat.writeToTable(spark.range(10000)
      .select($"id", ($"id" % 7).cast("string").as("v")).toDF(), "ns.c", WriteMode.Merge)
    cat.writeToTable(spark.range(100)
      .select(($"id" * 100).as("id"), lit("upd").as("v")).toDF(), "ns.c", WriteMode.Merge)
    def planOf() = cat.readTable("ns.c").queryExecution.executedPlan.toString
    // defaults: 100 pending vs 10000 base (ratio 100, cap 4M) → sparse
    assert(planOf().contains("_g_pk_id"), "default thresholds should take the sparse path")
    // base must be ≥ 200× pending → only 100× here → next rung down is the
    // STORAGE-PARTITIONED split (same key-split markers, KeyGrouped
    // BatchScan); with that band disabled too, the dense shuffle resolve.
    spark.conf.set("graft.merge.sparse.minBaseRatio", "200")
    try {
      assert(planOf().contains("BatchScan"),
        "raised sparse ratio must fall to the storage-partitioned band")
      spark.conf.set("graft.merge.partitioned.enabled", "false")
      try assert(!planOf().contains("_g_pk_id") && !planOf().contains("BatchScan"),
        "with both bands off, the dense resolve remains")
      finally spark.conf.unset("graft.merge.partitioned.enabled")
    } finally spark.conf.unset("graft.merge.sparse.minBaseRatio")
    // pending no longer broadcastable under a 50-row cap → same ladder
    spark.conf.set("graft.merge.sparse.maxPendingRows", "50")
    try assert(planOf().contains("BatchScan"),
      "lowered maxPendingRows must fall to the storage-partitioned band")
    finally spark.conf.unset("graft.merge.sparse.maxPendingRows")
    val restored = planOf()
    assert(restored.contains("_g_pk_id") && !restored.contains("BatchScan"),
      "unsetting restores the broadcast sparse path")
  }

  test("randomized upsert/delete sequences: sparse read ≡ dense read") {
    val rnd = new scala.util.Random(20260812L)
    for (round <- 0 until 3) {
      val cat = new GraftCatalog(spark, tmpDir(s"graft-sparse-prop$round"))
      mkTable(cat, "ns.p")
      // Big-enough base that small pendings stay under the compaction valve
      // AND inside the sparse ratio.
      val n = 4000 + rnd.nextInt(2000)
      cat.writeToTable(
        spark.range(n).select($"id", ($"id" % 13).cast("string").as("v")).toDF(),
        "ns.p", WriteMode.Merge)
      // 1-3 trickle deltas: upserts (some updating, some inserting) and
      // deletes — each ≤ ~1% of the base so the total stays under both the
      // 5% auto-compaction valve and the 8x sparse ratio.
      for (_ <- 0 to rnd.nextInt(3)) {
        val k = 1 + rnd.nextInt(40)
        if (rnd.nextBoolean()) {
          val lo = rnd.nextInt(n + 200)
          cat.writeToTable(
            spark.range(lo, lo + k).select($"id", lit(s"u$round").as("v")).toDF(),
            "ns.p", WriteMode.Merge)
        } else {
          val m = 150 + rnd.nextInt(150)
          cat.writeToTable(
            spark.range(n).select($"id").where($"id" % m === 0).toDF(),
            "ns.p", WriteMode.Delete)
        }
      }
      val sparseRead = cat.readTable("ns.p")
      // Guard against a vacuous round: the sparse plan must actually engage.
      assert(sparseRead.queryExecution.executedPlan.toString.contains("_g_pk_id"),
        s"round $round: expected the sparse key-split plan")
      val sparse = sparseRead.as[(Long, String)].collect().sortBy(_._1).toSeq
      spark.conf.set("graft.merge.sparse.enabled", "false")
      val dense =
        try cat.readTable("ns.p").as[(Long, String)].collect().sortBy(_._1).toSeq
        finally spark.conf.unset("graft.merge.sparse.enabled")
      assert(sparse == dense, s"round $round: sparse and dense reads diverged " +
        s"(sparse=${sparse.size} rows, dense=${dense.size} rows)")
    }
  }

  test("null-keyed equality delete stays on the contested side (null-safe key join)") {
    val cat = new GraftCatalog(spark, tmpDir("graft-sparse-null"))
    cat.createTable("ns.n", StructType(Seq(
      FieldMeta.field("a", StringType, nullable = true, mergeKey = true),
      FieldMeta.field("b", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))))
    val base = spark.range(5000)
      .select(when($"id" === 0, lit(null)).otherwise(concat(lit("k"), $"id")).as("a"),
        $"id".as("b"), lit("x").as("v"))
    cat.writeToTable(base.toDF(), "ns.n", WriteMode.Merge)
    // Delete the null-keyed row plus one normal row — tiny pending → sparse.
    cat.writeToTable(Seq((Option.empty[String], 0L), (Some("k7"), 7L)).toDF("a", "b"),
      "ns.n", WriteMode.Delete)
    val read = cat.readTable("ns.n")
    assert(read.queryExecution.executedPlan.toString.contains("_g_pk_a"))
    assert(read.count() == 4998)
    assert(read.where($"a".isNull).count() == 0,
      "null-keyed row must be deleted — a non-null-safe key join would leak it")
    assert(read.where($"b" === 7L).count() == 0)
  }
}
