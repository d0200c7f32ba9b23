package graft

import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.catalog._
import graft.model._

/**
 * Property test: for random sequences of upsert/delete deltas, the engine's
 * terminal table state (both merge-on-read and compacted) must equal a
 * trivial in-memory LSM model (SURVEY §5: property-test last-wins dedupe and
 * null-safe deletes heavily).
 */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  /** One delta: upsert (key -> value) entries or delete keys. Keys may be
    * null (None) to exercise the null-merge-key path. */
  private case class Op(isDelete: Boolean, rows: List[(Option[Int], Int)])

  private val genOp: Gen[Op] = for {
    isDelete <- Gen.oneOf(false, false, true) // 2:1 upserts
    n <- Gen.choose(1, 6)
    rows <- Gen.listOfN(n, for {
      k <- Gen.frequency(9 -> Gen.choose(0, 9).map(Some(_)), 1 -> Gen.const(None))
      v <- Gen.choose(0, 999)
    } yield (k, v))
  } yield Op(isDelete, rows)

  private def model(ops: List[Op]): Map[Option[Int], Int] =
    ops.foldLeft(Map.empty[Option[Int], Int]) { (state, op) =>
      if (op.isDelete) state -- op.rows.map(_._1)
      // within one delta, the LAST row for a key wins
      else state ++ op.rows
    }

  private def runEngine(ops: List[Op], compactEvery: Option[Int]): Map[Option[Int], Int] = {
    val cat = new GraftCatalog(spark, tmpDir("graft-prop"))
    cat.createTable("p.t", StructType(Seq(
      FieldMeta.field("k", IntegerType, mergeKey = true),
      FieldMeta.field("v", IntegerType))), properties = Map("read_optimization" -> "NONE"))
    ops.zipWithIndex.foreach { case (op, i) =>
      // Preserve intra-delta order deterministically: single sorted-by-arrival
      // partition (ordinal column dropped before write).
      val df = op.rows.zipWithIndex.map { case ((k, v), ord) => (k, v, ord) }
        .toDF("k", "v", "_ord").repartition(1).sortWithinPartitions("_ord").drop("_ord")
      if (op.isDelete) cat.writeToTable(df.select("k"), "p.t", WriteMode.Delete)
      else cat.writeToTable(df, "p.t", WriteMode.Merge)
      if (compactEvery.exists(e => (i + 1) % e == 0)) cat.compact("p.t", numBuckets = 4)
    }
    cat.readTable("p.t").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getInt(1)).toMap
  }

  test("terminal state equals the in-memory LSM model (merge-on-read and compacted)") {
    // A handful of seeded random sequences (Spark jobs are too slow for
    // hundreds of trials; seeds make failures reproducible).
    val params = Gen.Parameters.default
    (0 until 6).foreach { trial =>
      val ops = Gen.listOfN(5, genOp)
        .pureApply(params, org.scalacheck.rng.Seed(1000L + trial))
      val expected = model(ops)
      val mor = runEngine(ops, compactEvery = None)
      assert(mor == expected, s"trial $trial merge-on-read: $mor != $expected\nops=$ops")
      val compacted = runEngine(ops, compactEvery = Some(2))
      assert(compacted == expected, s"trial $trial compacted: $compacted != $expected\nops=$ops")
    }
  }

  test("compact-recency rank on equals rank off on random op sequences (round-17)") {
    // Round-17: resolve folds (EffPos, File, Row) into one long via a
    // broadcast per-file rank (fileRankOf). Same randomized sequences with
    // the rank forced OFF (string-ordering shape) must produce identical
    // terminal states, merge-on-read and compacted (compaction makes
    // multi-file bases participate, exercising cross-file ordering).
    val params = Gen.Parameters.default
    (0 until 3).foreach { trial =>
      val ops = Gen.listOfN(8, genOp)
        .pureApply(params, org.scalacheck.rng.Seed(9100L + trial))
      val expected = model(ops)
      // minRows=0 defeats the volume gate — these fixtures are tiny, and
      // without it BOTH legs would run the string-ordering shape.
      spark.conf.set("graft.merge.fileRank.minRows", "0")
      val on =
        try runEngine(ops, compactEvery = Some(3))
        finally spark.conf.unset("graft.merge.fileRank.minRows")
      assert(on == expected, s"trial $trial rank-on: $on != $expected\nops=$ops")
      spark.conf.set("graft.merge.fileRank.maxFiles", "0")
      try {
        val off = runEngine(ops, compactEvery = Some(3))
        assert(off == expected, s"trial $trial rank-off: $off != $expected\nops=$ops")
      } finally spark.conf.unset("graft.merge.fileRank.maxFiles")
    }
  }

  test("lineage paths: per-delta literal scans equal the regexp+join fallback on random op sequences") {
    // Round-12: scanWithLineage has two lineage attachments — per-delta
    // LITERAL scans (≤ maxDeltas, zero per-row work) and the per-row path
    // regexp + broadcast-join fallback. Same randomized sequences, both
    // paths, MoR and compacted, must all equal the in-memory model.
    // Forcing the conf to 0 routes EVERY read through the fallback.
    val params = Gen.Parameters.default
    (0 until 3).foreach { trial =>
      val ops = Gen.listOfN(5, genOp)
        .pureApply(params, org.scalacheck.rng.Seed(7000L + trial))
      val expected = model(ops)
      val literal = runEngine(ops, compactEvery = None)
      assert(literal == expected, s"trial $trial literal path: $literal != $expected\nops=$ops")
      spark.conf.set(graft.catalog.MergeRead.LineageLiteralConfKey, "0")
      try {
        val fallback = runEngine(ops, compactEvery = None)
        assert(fallback == expected,
          s"trial $trial fallback path: $fallback != $expected\nops=$ops")
        val fallbackCompacted = runEngine(ops, compactEvery = Some(2))
        assert(fallbackCompacted == expected,
          s"trial $trial fallback compacted: $fallbackCompacted != $expected\nops=$ops")
      } finally spark.conf.unset(graft.catalog.MergeRead.LineageLiteralConfKey)
    }
  }

  test("literal-lineage gate counts scanned revisions, not the total backlog") {
    // Round-13 (r12 advice): the gate is byRev.size — the number of
    // per-revision scan relations this read actually builds, which is what
    // bounds plan size — not the table's total active-delta count. A
    // partition-pruned read touching 1 delta of a 3-delta backlog must
    // take the literal path even when maxDeltas < the backlog; observable
    // as the absence of the per-row position regexp from the plan.
    // the fallback derives Pos per row from _metadata.file_path (the
    // anchored substring_index chain); the literal path attaches it as a
    // per-relation literal and has no such expression anywhere
    def usesPosRegexp(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists(_.expressions.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions.SubstringIndex => true
        case _ => false
      }))
    val cat = new GraftCatalog(spark, tmpDir("graft-prop-gate"))
    cat.createTable("p.g", StructType(Seq(
      FieldMeta.field("k", IntegerType, mergeKey = true),
      FieldMeta.field("p", IntegerType),
      FieldMeta.field("v", IntegerType))),
      partitionScheme = PartitionScheme(Seq(PartitionKey("p", Transform.Identity))),
      properties = Map("read_optimization" -> "NONE"))
    (1 to 3).foreach(i => cat.writeToTable(
      Seq((i, i, i * 10)).toDF("k", "p", "v"), "p.g", WriteMode.Merge))
    spark.conf.set(MergeRead.LineageLiteralConfKey, "2")
    try {
      val pruned = cat.readTable("p.g",
        ReadOptions(partitionValues = Some(Map("p" -> "2"))))
      assert(!usesPosRegexp(pruned),
        "a pruned read scanning 1 revision (≤ 2) must take the literal path")
      assert(pruned.select("k", "p", "v").as[(Int, Int, Int)].collect().toSeq ==
        Seq((2, 2, 20)))
      val full = cat.readTable("p.g")
      assert(usesPosRegexp(full),
        "an unpruned read scanning 3 revisions (> 2) must take the regexp fallback")
      assert(full.select("k", "p", "v").as[(Int, Int, Int)].collect().sortBy(_._1).toSeq ==
        Seq((1, 1, 10), (2, 2, 20), (3, 3, 30)))
    } finally spark.conf.unset(MergeRead.LineageLiteralConfKey)
  }

  /** All ops written pending, then ONE compact() call; the valve property
    * decides whether it runs as a single round or chunked sub-rounds. */
  private def runValved(ops: List[Op], valve: Option[Long])
      : (Map[Option[Int], Int], Int) = {
    val cat = new GraftCatalog(spark, tmpDir("graft-prop-v"))
    cat.createTable("p.v", StructType(Seq(
      FieldMeta.field("k", IntegerType, mergeKey = true),
      FieldMeta.field("v", IntegerType))),
      properties = Map("read_optimization" -> "NONE") ++
        valve.map("compaction.max_input_bytes" -> _.toString))
    ops.foreach { op =>
      val df = op.rows.zipWithIndex.map { case ((k, v), ord) => (k, v, ord) }
        .toDF("k", "v", "_ord").repartition(1).sortWithinPartitions("_ord").drop("_ord")
      if (op.isDelete) cat.writeToTable(df.select("k"), "p.v", WriteMode.Delete)
      else cat.writeToTable(df, "p.v", WriteMode.Merge)
    }
    cat.compact("p.v", numBuckets = 4)
    val state = cat.readTable("p.v").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getInt(1)).toMap
    (state, cat.deltaLog("p.v").count(_.compactedUpTo >= 0))
  }

  test("multi-round compaction valve: chunked sub-rounds equal the single round") {
    val params = Gen.Parameters.default
    (0 until 4).foreach { trial =>
      val ops = Gen.listOfN(6, genOp)
        .pureApply(params, org.scalacheck.rng.Seed(3000L + trial))
      val expected = model(ops)
      val (single, roundsSingle) = runValved(ops, valve = None)
      assert(single == expected, s"trial $trial single: $single != $expected\nops=$ops")
      assert(roundsSingle == 1, s"no valve must compact once, got $roundsSingle")
      // a 1-byte valve forces every pending delta into its own sub-round
      val (chunked, roundsChunked) = runValved(ops, valve = Some(1L))
      assert(chunked == expected, s"trial $trial chunked: $chunked != $expected\nops=$ops")
      assert(roundsChunked == ops.size,
        s"1-byte valve must compact per delta (${roundsChunked} vs ${ops.size})")
      // a mid-sized valve groups several deltas per round, still exact
      val (mid, roundsMid) = runValved(ops, valve = Some(6000L))
      assert(mid == expected, s"trial $trial mid-valve: $mid != $expected\nops=$ops")
      assert(roundsMid >= 1 && roundsMid <= ops.size)
    }
  }

  test("valve crash between sub-rounds: committed progress survives, re-invocation converges") {
    val params = Gen.Parameters.default
    (0 until 3).foreach { trial =>
      val ops = Gen.listOfN(6, genOp)
        .pureApply(params, org.scalacheck.rng.Seed(9000L + trial))
      val expected = model(ops)
      val cat = new GraftCatalog(spark, tmpDir(s"graft-prop-crash-$trial"))
      cat.createTable("p.c", StructType(Seq(
        FieldMeta.field("k", IntegerType, mergeKey = true),
        FieldMeta.field("v", IntegerType))),
        properties = Map("read_optimization" -> "NONE",
          "compaction.max_input_bytes" -> "1")) // one sub-round per delta
      ops.foreach { op =>
        val df = op.rows.zipWithIndex.map { case ((k, v), ord) => (k, v, ord) }
          .toDF("k", "v", "_ord").repartition(1).sortWithinPartitions("_ord").drop("_ord")
        if (op.isDelete) cat.writeToTable(df.select("k"), "p.c", WriteMode.Delete)
        else cat.writeToTable(df, "p.c", WriteMode.Merge)
      }
      // crash after the (trial+1)-th committed sub-round
      val crashAfter = trial
      Compactor.afterSubRound = i =>
        if (i == crashAfter) throw new RuntimeException("injected crash")
      val e = try intercept[RuntimeException](cat.compact("p.c", numBuckets = 4))
      finally Compactor.afterSubRound = _ => ()
      assert(e.getMessage == "injected crash")
      // committed progress held: exactly crashAfter+1 compacted rounds, and
      // a read mid-recovery is already correct (merge-on-read over the rest)
      val mid = cat.readTable("p.c").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getInt(1)).toMap
      assert(mid == expected, s"trial $trial mid-crash read: $mid != $expected\nops=$ops")
      val committed = cat.deltaLog("p.c").count(_.compactedUpTo >= 0)
      assert(committed == crashAfter + 1,
        s"trial $trial: expected ${crashAfter + 1} committed rounds, got $committed")
      // the NEXT invocation converges to the fully-compacted state
      cat.compact("p.c", numBuckets = 4)
      val after = cat.readTable("p.c").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getInt(1)).toMap
      assert(after == expected, s"trial $trial post-recovery: $after != $expected\nops=$ops")
      // everything pending got folded — nothing left beyond the watermark
      val deltas = cat.deltaLog("p.c")
      val wm = deltas.filter(_.compactedUpTo >= 0).map(_.compactedUpTo).max
      assert(deltas.filter(_.compactedUpTo < 0).forall(_.streamPosition <= wm),
        s"trial $trial: pending deltas beyond watermark after recovery")
    }
  }

  /** Same engine run, read through a rowFilter (exercises the stats-skip
    * safe-filter rule under merge-on-read AND the read-optimized prune). */
  private def runFiltered(ops: List[Op], compactEvery: Option[Int],
      pred: org.apache.spark.sql.Column, modelPred: ((Option[Int], Int)) => Boolean)
      : (Map[Option[Int], Int], Map[Option[Int], Int]) = {
    val cat = new GraftCatalog(spark, tmpDir("graft-prop-f"))
    cat.createTable("p.f", StructType(Seq(
      FieldMeta.field("k", IntegerType, mergeKey = true),
      FieldMeta.field("v", IntegerType))), properties = Map("read_optimization" -> "NONE"))
    ops.zipWithIndex.foreach { case (op, i) =>
      val df = op.rows.zipWithIndex.map { case ((k, v), ord) => (k, v, ord) }
        .toDF("k", "v", "_ord").repartition(1).sortWithinPartitions("_ord").drop("_ord")
      if (op.isDelete) cat.writeToTable(df.select("k"), "p.f", WriteMode.Delete)
      else cat.writeToTable(df, "p.f", WriteMode.Merge)
      if (compactEvery.exists(e => (i + 1) % e == 0)) cat.compact("p.f", numBuckets = 4)
    }
    val got = cat.readTable("p.f", ReadOptions(rowFilter = Some(pred))).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getInt(1)).toMap
    (got, model(ops).filter(modelPred))
  }

  test("rowFilter reads equal the filtered model (value and key predicates; MoR and compacted)") {
    import org.apache.spark.sql.functions.col
    val params = Gen.Parameters.default
    (0 until 4).foreach { trial =>
      val ops = Gen.listOfN(5, genOp)
        .pureApply(params, org.scalacheck.rng.Seed(7000L + trial))
      // value predicate: must see POST-merge values (no stale resurrection)
      val (gv, ev) = runFiltered(ops, None, col("v") < 500, _._2 < 500)
      assert(gv == ev, s"trial $trial value-filter MoR: $gv != $ev\nops=$ops")
      val (gvc, evc) = runFiltered(ops, Some(2), col("v") < 500, _._2 < 500)
      assert(gvc == evc, s"trial $trial value-filter compacted: $gvc != $evc\nops=$ops")
      // key predicate: allowed to prune files even under pending merges
      val (gk, ek) = runFiltered(ops, None, col("k") >= 5, _._1.exists(_ >= 5))
      assert(gk == ek, s"trial $trial key-filter MoR: $gk != $ek\nops=$ops")
    }
  }

  test("trim + vacuum after every compaction: terminal state still equals the model") {
    // Round-15: trimHistory deletes folded metafiles and vacuumTable
    // deletes the data files they forfeited — interleaved with random
    // upsert/delete sequences (null keys included), the surviving
    // base + pending + referenced-lineage skeletons must still resolve to
    // the exact model state. A wrongly-trimmed referenced metafile or a
    // wrongly-vacuumed live data file fails loudly (lineage-missing /
    // FileNotFound), a recency corruption fails the equality.
    val params = Gen.Parameters.default
    (0 until 4).foreach { trial =>
      val ops = Gen.listOfN(6, genOp)
        .pureApply(params, org.scalacheck.rng.Seed(15000L + trial))
      val expected = model(ops)
      val cat = new GraftCatalog(spark, tmpDir("graft-prop-trim"))
      cat.createTable("p.tv", StructType(Seq(
        FieldMeta.field("k", IntegerType, mergeKey = true),
        FieldMeta.field("v", IntegerType))), properties = Map("read_optimization" -> "NONE"))
      ops.zipWithIndex.foreach { case (op, i) =>
        val df = op.rows.zipWithIndex.map { case ((k, v), ord) => (k, v, ord) }
          .toDF("k", "v", "_ord").repartition(1).sortWithinPartitions("_ord").drop("_ord")
        if (op.isDelete) cat.writeToTable(df.select("k"), "p.tv", WriteMode.Delete)
        else cat.writeToTable(df, "p.tv", WriteMode.Merge)
        if ((i + 1) % 2 == 0) {
          cat.compact("p.tv", numBuckets = 4)
          Thread.sleep(3) // retention 0 still needs base endTime < now
          cat.trimHistory("p.tv", retentionMillis = 0L)
          cat.vacuumTable("p.tv")
        }
      }
      val got = cat.readTable("p.tv").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getInt(1)).toMap
      assert(got == expected, s"trial $trial trim+vacuum: $got != $expected\nops=$ops")
    }
  }
}
