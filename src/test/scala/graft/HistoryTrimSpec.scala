package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/**
 * Round-15 lifetime-history wall: reads must parse O(pending + 1) delta
 * metafiles however many writes the table has seen (the tail-first
 * planning walk), and trimHistory must bound the log listing itself with
 * Delta-style retention semantics — loud failures for time travel and CDC
 * beyond the horizon, zero change to current-time reads.
 */
class HistoryTrimSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(cat: GraftCatalog, name: String): Unit =
    cat.createTable(name, StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", DoubleType))),
      properties = Map("read_optimization" -> "NONE"))

  test("reads parse O(pending + 1) metafiles, not the lifetime history") {
    val cat = new GraftCatalog(spark, tmpDir("graft-tailwalk"))
    mkTable(cat, "h.t")
    cat.writeToTable(spark.range(2000).select(col("id").as("k"),
      (col("id") * 1.0).as("v")), "h.t", WriteMode.Merge)
    (1 to 40).foreach { i =>
      cat.writeToTable(Seq((i.toLong, i * 2.0)).toDF("k", "v"), "h.t", WriteMode.Merge)
    }
    cat.compact("h.t")
    (1 to 3).foreach { i =>
      cat.writeToTable(Seq((i.toLong, i * 3.0)).toDF("k", "v"), "h.t", WriteMode.Merge)
    }
    val n = cat.readTable("h.t").count()
    assert(n == 2000)
    // 42 lifetime writes; the walk parses pending(3) + base(1) and stops
    // at the first revision at-or-under the watermark
    assert(cat.lastPlanningParses <= 5,
      s"planning parsed ${cat.lastPlanningParses} metafiles for 3 pending deltas")
    // correctness of the walked read: upserted keys carry the newest value
    val got = cat.readTable("h.t").where(col("k") <= 3 && col("k") >= 1)
      .orderBy("k").collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(3.0, 6.0, 9.0))
  }

  test("valve shape: unfolded pending BELOW the base revision stays in the plan") {
    val cat = new GraftCatalog(spark, tmpDir("graft-valve-walk"))
    cat.createTable("h.v", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", DoubleType))),
      properties = Map("read_optimization" -> "NONE",
        // ~1-byte valve: every compaction round folds ONE delta, so after
        // compact() the newest base's watermark sits below later pending
        // revisions committed before it
        "compaction.max_input_bytes" -> "1"))
    cat.writeToTable(spark.range(100).select(col("id").as("k"),
      lit(1.0).as("v")), "h.v", WriteMode.Merge)
    (1 to 4).foreach { i =>
      cat.writeToTable(Seq((i.toLong, 100.0 + i)).toDF("k", "v"), "h.v", WriteMode.Merge)
    }
    cat.compact("h.v")
    val rows = cat.readTable("h.v").where(col("k") >= 1 && col("k") <= 4)
      .orderBy("k").collect().map(_.getDouble(1)).toSeq
    assert(rows == Seq(101.0, 102.0, 103.0, 104.0),
      s"valve-shape read lost an unfolded pending delta: $rows")
  }

  test("copy-by-reference: referenced metafiles survive the trim and ride as lineage skeletons") {
    val cat = new GraftCatalog(spark, tmpDir("graft-trim-ref"))
    mkTable(cat, "h.c")
    // rev1 bulk upsert → rev2 = first compacted BUCKETED base
    cat.writeToTable(spark.range(8000).select(col("id").as("k"),
      (col("id") * 1.0).as("v")), "h.c", WriteMode.Merge)
    cat.compact("h.c")
    // rev3 upserts ONLY keys hashing into bucket 0 → rev4 base rewrites
    // bucket 0 and copies buckets 1-7 BY REFERENCE from rev2's files
    cat.writeToTable(spark.range(8000)
      .where(pmod(hash(col("id")), lit(8)) === 0)
      .select(col("id").as("k"), lit(-5.0).as("v")), "h.c", WriteMode.Merge)
    cat.compact("h.c")
    val expected = cat.readTable("h.c").orderBy("k").collect().toSeq
    Thread.sleep(50)
    // rev1 (folded, rewritten) and rev3 (folded) trim; rev2 is REFERENCED
    // by the new base's copied entries and must survive as lineage
    val removed = cat.trimHistory("h.c", retentionMillis = 0L)
    assert(removed == 2, s"expected the two unreferenced folded metafiles trimmed, got $removed")
    assert(cat.readTable("h.c").orderBy("k").collect().toSeq == expected)
    // the walk parsed base + the referenced lineage skeleton (no pending)
    assert(cat.lastPlanningParses <= 3,
      s"planning parsed ${cat.lastPlanningParses} metafiles post-trim")
    // a later full rewrite drops the reference; the next trim reclaims it
    cat.writeToTable(spark.range(8000).select(col("id").as("k"),
      lit(9.0).as("v")), "h.c", WriteMode.Merge)
    cat.compact("h.c")
    Thread.sleep(50)
    assert(cat.trimHistory("h.c", retentionMillis = 0L) >= 2)
    assert(cat.readTable("h.c").agg(sum("v")).head().getDouble(0) == 8000 * 9.0)
  }

  test("vacuumTable reclaims forfeited data files, never referenced or pre-horizon ones") {
    val cat = new GraftCatalog(spark, tmpDir("graft-vacuum"))
    mkTable(cat, "h.g")
    cat.writeToTable(spark.range(8000).select(col("id").as("k"),
      (col("id") * 1.0).as("v")), "h.g", WriteMode.Merge)
    cat.compact("h.g") // bucketed base (rev2)
    // bucket-0-only upsert → rev4 base copies buckets 1-7 by reference
    cat.writeToTable(spark.range(8000)
      .where(pmod(hash(col("id")), lit(8)) === 0)
      .select(col("id").as("k"), lit(-5.0).as("v")), "h.g", WriteMode.Merge)
    cat.compact("h.g")
    val expected = cat.readTable("h.g").orderBy("k").collect().toSeq
    // no horizon yet: vacuum is a no-op by contract
    assert(cat.vacuumTable("h.g") == 0L)
    Thread.sleep(50)
    assert(cat.trimHistory("h.g", retentionMillis = 0L) == 2)
    // straggler margin: right after the trim, the DEFAULT min-age gate
    // reclaims nothing — a query planned against the pre-trim window may
    // still be draining
    assert(cat.vacuumTable("h.g") == 0L,
      "vacuum ignored the default straggler margin")
    // dry run: counts the candidates, deletes nothing
    val preview = cat.vacuumTable("h.g", dryRun = true, minAgeMillis = Some(0L))
    assert(preview >= 1)
    val paths = cat.vacuumCandidates("h.g", minAgeMillis = Some(0L))
    assert(paths.size == preview && paths.forall(p => new java.io.File(p).exists()),
      "dry run must not delete")
    val removed = cat.vacuumTable("h.g", minAgeMillis = Some(0L))
    assert(removed == preview, s"dry run counted $preview, vacuum removed $removed")
    // rev1's bulk files and rev2's REWRITTEN bucket-0 file are forfeited;
    // rev2's copy-by-referenced buckets 1-7 files must survive
    assert(removed >= 1, s"vacuum reclaimed nothing")
    assert(cat.readTable("h.g").orderBy("k").collect().toSeq == expected)
    // idempotent
    assert(cat.vacuumTable("h.g", minAgeMillis = Some(0L)) == 0L)
    // a full rewrite + trim forfeits the old referenced files too
    cat.writeToTable(spark.range(8000).select(col("id").as("k"), lit(9.0).as("v")),
      "h.g", WriteMode.Merge)
    cat.compact("h.g")
    Thread.sleep(50)
    assert(cat.trimHistory("h.g", retentionMillis = 0L) >= 2)
    // the vacuum.min.age.millis table property is the per-table override
    cat.alterTable("h.g", setProperties = Map("vacuum.min.age.millis" -> "0"))
    assert(cat.vacuumTable("h.g") >= 1)
    assert(cat.readTable("h.g").agg(sum("v")).head().getDouble(0) == 8000 * 9.0)
  }

  test("aged horizons reclaim past the margin even while fresh trims re-stamp the clock") {
    val cat = new GraftCatalog(spark, tmpDir("graft-agedvac"))
    mkTable(cat, "h.m")
    cat.writeToTable(spark.range(4000).select(col("id").as("k"),
      (col("id") * 1.0).as("v")), "h.m", WriteMode.Merge)
    cat.compact("h.m")
    cat.writeToTable(spark.range(100).select(col("id").as("k"), lit(-1.0).as("v")),
      "h.m", WriteMode.Merge)
    cat.compact("h.m")
    Thread.sleep(20)
    assert(cat.trimHistory("h.m", retentionMillis = 0L) >= 2) // horizon 1, stamp t1
    Thread.sleep(600)
    cat.writeToTable(spark.range(100).select(col("id").as("k"), lit(-2.0).as("v")),
      "h.m", WriteMode.Merge)
    cat.compact("h.m")
    Thread.sleep(20)
    assert(cat.trimHistory("h.m", retentionMillis = 0L) >= 1) // horizon 2, FRESH stamp
    // margin 400 ms: the latest stamp is fresh, but horizon 1 is aged —
    // its forfeited generation must go (the pre-fix gate keyed on the
    // latest stamp alone and would return 0 here forever on a busy table)
    val n = cat.vacuumTable("h.m", minAgeMillis = Some(400L))
    assert(n >= 1, "aged-horizon files stayed gated behind the fresh re-stamp")
    // the generation forfeited by the FRESH trim is still margin-protected
    assert(cat.vacuumTable("h.m", dryRun = true, minAgeMillis = Some(0L)) >= 1,
      "fresh-horizon files were reclaimed inside the margin")
    assert(cat.readTable("h.m").count() == 4000)
  }

  test("a corrupt committed metafile fails the change feed loudly, never silently drops rows") {
    val cat = new GraftCatalog(spark, tmpDir("graft-corrupt"))
    cat.writeToTable(spark.range(10).select(col("id").as("k"), (col("id") * 1.0).as("v")),
      "h.x", WriteMode.Auto)
    cat.writeToTable(spark.range(10, 20).select(col("id").as("k"), (col("id") * 1.0).as("v")),
      "h.x", WriteMode.Append)
    // corrupt the SECOND delta's metafile in place (a torn write)
    val dir = cat.root.resolve("ns").resolve("h").resolve("x").resolve("deltas")
    val victim = cat.store.visibleRevisionPaths(dir, None, None).maxBy(_._1)._2
    val bytes = java.nio.file.Files.readAllBytes(victim)
    java.nio.file.Files.write(victim, bytes.take(bytes.length / 2))
    intercept[Exception] { cat.deltasAfter("h.x", -1L).size }
  }

  test("history.retention.millis: the log self-bounds at write-triggered compaction") {
    val cat = new GraftCatalog(spark, tmpDir("graft-autotrim"))
    cat.createTable("h.a", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", DoubleType))),
      properties = Map(
        "compaction.trigger.deltas" -> "5",
        "compaction.min_pending_records" -> "0",
        "history.retention.millis" -> "0"))
    cat.writeToTable(spark.range(1000).select(col("id").as("k"),
      (col("id") * 1.0).as("v")), "h.a", WriteMode.Merge)
    (1 to 12).foreach { i =>
      cat.writeToTable(Seq((i.toLong, i * 2.0)).toDF("k", "v"), "h.a", WriteMode.Merge)
      Thread.sleep(2) // retention 0 still needs base endTime < now
    }
    // several auto-compactions fired; retention 0 trims each time — the
    // surviving log is base + post-watermark pending (+ referenced lineage)
    val log = cat.deltaLog("h.a").size
    assert(log <= 7, s"auto-trim left $log metafiles for 13 lifetime writes")
    assert(cat.readTable("h.a").count() == 1000)
    assert(cat.readTable("h.a").where(col("k") === 12).head().getDouble(1) == 24.0)
  }

  test("trimHistory bounds the log; guards fire; current reads unchanged") {
    val cat = new GraftCatalog(spark, tmpDir("graft-trim"))
    mkTable(cat, "h.r")
    cat.writeToTable(spark.range(500).select(col("id").as("k"),
      (col("id") * 1.0).as("v")), "h.r", WriteMode.Merge)
    (1 to 10).foreach { i =>
      cat.writeToTable(Seq((i.toLong, i * 2.0)).toDF("k", "v"), "h.r", WriteMode.Merge)
    }
    val beforeCompactMillis = System.currentTimeMillis()
    Thread.sleep(5)
    cat.compact("h.r")
    cat.writeToTable(Seq((1L, 99.0)).toDF("k", "v"), "h.r", WriteMode.Merge)
    val logBefore = cat.deltaLog("h.r").size
    val expected = cat.readTable("h.r").orderBy("k").collect().toSeq

    // retention window not elapsed: no-op
    assert(cat.trimHistory("h.r", retentionMillis = 3600 * 1000L) == 0)
    Thread.sleep(50)
    val removed = cat.trimHistory("h.r", retentionMillis = 0L)
    assert(removed == 11, s"expected the 11 folded metafiles trimmed, got $removed")
    assert(cat.trimHistory("h.r", retentionMillis = 0L) == 0) // idempotent

    // current-time read identical; lineage shrank to base + pending
    assert(cat.readTable("h.r").orderBy("k").collect().toSeq == expected)
    val logAfter = cat.deltaLog("h.r").size
    assert(logAfter == 2 && logBefore == 13,
      s"deltaLog $logBefore -> $logAfter (expected 13 -> 2)")

    // time travel before the horizon fails LOUDLY (never a partial read)
    val e = intercept[IllegalArgumentException](
      cat.readTable("h.r", ReadOptions(asOf = Some(beforeCompactMillis))))
    assert(e.getMessage.contains("trimmed-history horizon"))
    // time travel at/after the horizon still works
    assert(cat.readTable("h.r",
      ReadOptions(asOf = Some(System.currentTimeMillis()))).count() == 500)

    // CDC from a pre-horizon position fails with the remedy; from the
    // watermark on it serves the remaining pending delta
    val w = cat.getTableMeta("h.r").properties("history.trim.upto.position").toLong
    val c = intercept[IllegalArgumentException](cat.readChanges("h.r", afterPosition = 0L))
    assert(c.getMessage.contains("trimHistory"))
    assert(cat.readChanges("h.r", afterPosition = w).count() >= 1)

    // downloadDelta of a trimmed position: loud, names the position
    val d = intercept[IllegalArgumentException](cat.downloadDelta("h.r", 1L))
    assert(d.getMessage.contains("position"))

    // the table keeps working: write + compact + trim again (horizon ratchets)
    cat.writeToTable(Seq((2L, 77.0)).toDF("k", "v"), "h.r", WriteMode.Merge)
    cat.compact("h.r")
    Thread.sleep(50)
    assert(cat.trimHistory("h.r", retentionMillis = 0L) >= 2)
    val after = cat.readTable("h.r").where(col("k").isin(1, 2)).orderBy("k")
      .collect().map(_.getDouble(1)).toSeq
    assert(after == Seq(99.0, 77.0))
  }
}
