package graft

import java.nio.file.Files

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/**
 * Benchmark main: headline queries + the BASELINE.md pipeline
 * (write → write-triggered auto-compaction → read) at the scale factor in
 * SPARK_GRAFT_SF_DIR. Prints ONE JSON line.
 *
 * The reference's own pipeline cannot run here (no ray/daft in the image),
 * so `baseline_raw_spark` measures the floor — a plain Spark
 * parquet write+read of the same data — as the comparison anchor for the
 * catalog pipeline's overhead.
 */
object Bench {

  /** Read-path + pipeline-op headliners registered in SparkEntry. */
  private val headline = Seq(
    "q01_pricing_summary", "q03_join_topk", "q05_region_revenue",
    "q07_topk_orders", "q12_events_sessionize", "q16_asof_join",
    "t01_text_stats", "t02_exact_dedup", "t04_minhash_neardup",
    "t06_ann_brute", "t07_ann_lsh", "t10_ann_ivf", "t11_semantic_dedup",
    "t15_neardup_clusters",
    // round-8 additions (existing entries untouched for cross-round
    // comparability): the data-selection + retrieval operators
    "t31_quality_score", "t32_dsir_weights", "t33_crosscorpus_join",
    "t34_bm25_topk", "t35_chunk_documents", "t36_lm_perplexity",
    "t38_pca_project", "t40_curation_pipeline", "t41_span_removal",
    "t44_corpus_shuffle", "t46_semantic_join",
    // round-11 late additions: the posting-list dedup join (t50) and the
    // two map-only mixers (t51/t52) — first measurements, bands seed next
    // round from these
    "t50_ngram_jaccard", "t51_temperature_mix", "t52_int8_quantize",
    // round-17 addition (verdict ask #6): the ExactSubstr span-stats path
    // got real optimization work in round 16 (broadcast-gated span ops)
    // but only t41 measured it — first measurement, band seeds next round
    "t20_substring_dedup")

  /** Quiet-machine historical upper bounds (seconds), one per registry
    * entry with recorded history (round-11: full coverage — the r10
    * artifact shipped four entries 2-4.3x elevated with agreeing runs and
    * no band to trigger the exonerating retries). Each value is the max of
    * recent quiet rounds' per-round minimums (BENCH_r07-r10 "runs" fields,
    * load-flagged values excluded) plus ~15-25% headroom; the retry
    * triggers at the band value itself (no extra slack factor — the
    * headroom lives HERE, so the recorded bands and the trigger agree).
    * Advisory only — drives extra retries, never a failure. A false
    * trigger costs two extra runs; a missing band costs a round of
    * unexonerated `weak` marks, so bands are deliberately tight. */
  private val quietBandUpper: Map[String, Double] = Map(
    "q01_pricing_summary" -> 0.35,
    "q03_join_topk" -> 1.40,
    "q05_region_revenue" -> 0.75,
    "q07_topk_orders" -> 0.25,
    "q12_events_sessionize" -> 0.33,
    "q16_asof_join" -> 0.31,
    "t01_text_stats" -> 0.22,
    "t02_exact_dedup" -> 0.55,
    // +persist constant at 1× (round-13 re-band, f37b020's measurement:
    // the shared-shingle persist costs ~+12% at 1× and buys −36-52% at
    // 10×/30× — same documented trade as t50's band; quiet HEAD min 1.63)
    "t04_minhash_neardup" -> 2.75,
    "t06_ann_brute" -> 0.48,
    "t07_ann_lsh" -> 1.05,
    "t10_ann_ivf" -> 0.78,
    "t11_semantic_dedup" -> 1.20,
    "t15_neardup_clusters" -> 2.50, // +persist constant at 1× (round-13, see t04)
    "t31_quality_score" -> 0.65,
    "t32_dsir_weights" -> 1.65,
    "t33_crosscorpus_join" -> 2.00,
    "t34_bm25_topk" -> 1.70,
    "t35_chunk_documents" -> 0.38,
    "t36_lm_perplexity" -> 1.25,
    "t38_pca_project" -> 0.30,
    "t40_curation_pipeline" -> 3.70,
    "t41_span_removal" -> 1.35,
    "t44_corpus_shuffle" -> 0.25,
    "t46_semantic_join" -> 0.80,
    "t04_minhash_neardup_10x" -> 4.20, // shared shingling (round-12)
    "t06_ann_brute_10x" -> 0.65,
    "t10_ann_ivf_10x" -> 1.05,
    "t11_semantic_dedup_10x" -> 4.80,
    "t41_span_removal_10x" -> 4.00,
    "mor_read_scala" -> 2.30,
    "mor_read_sql" -> 2.20,
    "mor_trickle_read" -> 2.70, // 22-delta literal-lineage union (round-12)
    "pipeline_write_compact_read" -> 3.30,
    "pipeline_10x" -> 9.00,
    "baseline_raw_spark" -> 0.90,
    "baseline_raw_spark_10x" -> 3.20,
    "skip_read" -> 0.25,
    "agg_meta" -> 0.05,
    "iceberg_transform_prune" -> 0.25,
    "iceberg_transform_prune_10x" -> 1.30,
    "iceberg_gated_plan_10x" -> 1.30,
    // Round-12 re-bands: the per-row lineage regexp in the merge-on-read
    // scan was constant-folded into per-delta literal scans and pending
    // files now slice at 1M records (splittable) — the zipper family and
    // MoR reads dropped 2-4×. zipper_read_10x 14.9→3.66 s quiet; the r11
    // GC-trade band (13.0) is obsolete — the GC matrix showed the entry
    // collector-independent, and the cost was the regexp straggler task.
    "zipper_read" -> 1.80,
    "zipper_read_plain" -> 1.75,
    "zipper_read_filtered" -> 1.15,
    "zipper_read_10x" -> 4.60,
    "mor_dense_partitioned" -> 1.30,
    "mor_dense_legacy" -> 1.20,
    "t50_ngram_jaccard" -> 1.45, // +persist constant (round-12)
    "t50_ngram_jaccard_10x" -> 5.60, // shared shingling pass (round-12)
    "t51_temperature_mix" -> 0.40,
    "t52_int8_quantize" -> 0.20,
    // round-12 promotions of the r11 one-off 30x probes, re-banded from
    // this round's quiet warm-pass measurements (t04_30x 14.2 s — the
    // lineage/docs fixture gains carry to 30x; pipeline_30x 21.3 s, linear
    // vs pipeline_10x 7.5 s).
    "t04_minhash_neardup_30x" -> 7.00, // shared shingling (round-12)
    "pipeline_30x" -> 25.00,
    // round-13 additions: the lineage-FALLBACK read (82 deltas > the
    // 64-delta literal threshold — trickle + the per-row regexp/join
    // constant, measured +0.74 s over mor_trickle_read at sf0.1), the
    // 30x zipper point (2.6× the 10x for 3× the data), and the 30x raw
    // floor anchoring the 30x graded ratio same-run/same-machine.
    "mor_backlog_read" -> 3.40,
    "zipper_read_30x" -> 9.00,
    // re-banded same round: first-day quiet minima ranged 6.4-8.1 s (the
    // 8.00 seed came from two samples); floor entries get the same
    // evidence-based re-band discipline as engine entries because an
    // over-band floor un-trusts the graded ratio it anchors
    "baseline_raw_spark_30x" -> 9.00,
    // round-14 seeds from build-day quiet mins (hot-bucket A/B at the k=4
    // crossover fixture: 4.09 / 5.02 / 2.85 s, single quiet session each,
    // ~28% headroom; the banded CONTRACT for the mitigation is the
    // hotbucket_over_balanced scale ratio — these absolute bands just
    // catch drift in the fixture itself)
    "mor_hotbucket_read" -> 5.20,
    "mor_hotbucket_nosplit" -> 6.50,
    "mor_balanced_read" -> 3.60)

  /** Dimensionless scale-curve bands (round-14): absolute times drift with
    * the host, but the RATIO of an entry's 30× point to its 1× point is
    * computed same-run/same-machine and bends only when the plan does —
    * a superlinear regression fails the artifact even when co-tenant load
    * shifts every absolute number.
    *
    * Denominator FLOOR (round-15, verdict ask #3): the 1× denominators
    * are short (1.6-2.6 s) and fixed-overhead-dominated, so a same-run
    * sample swings the quotient ±35% with no plan change — round 14 had
    * to loosen t04's band 3.6→4.6 after an all-time-low 1× sample paired
    * with a mid-band 30×. The effective denominator is now
    * max(same-run sample, floor), where the floor is the denominator's
    * recorded quiet-range midpoint (BENCH_NOTES r13-r14 quiet mins:
    * pipeline 1.74-1.92 → 1.80; t04 1.75-2.03 → 1.90, the one-off 1.45
    * excluded as the all-time outlier; balanced 2.25-2.59 → 2.40). A
    * lucky-fast denominator can no longer inflate the quotient, so the
    * bands tighten back (t04 4.6→3.6, pipeline_10x 4.8→4.5,
    * pipeline_30x 13.0→12.5); a SLOW denominator still enters as-is, so
    * a real regression on the 1× side deflates the ratio — that side is
    * guarded by the denominator's own absolute band, not by the ratio.
    * (name, numerator, denominator, quiet upper bound, denominator floor
    * seconds). */
  private val ratioBands: Seq[(String, String, String, Double, Double)] = Seq(
    ("pipeline_10x_over_1x", "pipeline_10x", "pipeline_write_compact_read", 4.5, 1.80),
    ("pipeline_30x_over_1x", "pipeline_30x", "pipeline_write_compact_read", 12.5, 1.80),
    ("t04_30x_over_1x", "t04_minhash_neardup_30x", "t04_minhash_neardup", 3.6, 1.90),
    // The hot-bucket carve-out's contract (round-14 verdict ask #2): a
    // merge read over a pathologically skewed bucket layout must stay
    // within 1.5× of the balanced control — same total rows, same pending
    // fraction, same-run/same-machine.
    ("hotbucket_over_balanced", "mor_hotbucket_read", "mor_balanced_read", 1.5, 2.40))

  /** The driver's stdout-tail capture window is 2000 characters and it
    * json-parses the FINAL line, so that line must fit WHOLLY inside the
    * window (trailing newline included) or the driver reads nothing. */
  private[graft] val CompactLineLimit = 1990

  /** Assemble the driver-parseable compact summary line (round-17, verdict
    * ask #1). Round 16's guard degraded by dropping the per-entry `queries`
    * map — the single most valuable field on the line (the driver's PERF
    * comparison and scaling read both consume it) — the moment 11 over-band
    * entry names lengthened `band_summary` past the window, blinding
    * PERF_r16 completely. The map is now kept to the last byte; optional
    * diagnostics degrade FIRST, in increasing order of value:
    *   1. band / floor-norm over-name lists (the in/total counts remain),
    *   2. scale_ratios,
    *   3. ratios_over_floor,
    *   4. error texts (an errors_n count remains).
    * Every dropped field still rides complete in target/bench.json, whose
    * path the line always carries as "artifact". The queries-less final
    * fallback is unreachable for any realistic registry (61 entries ≈
    * 1.7 KB) — a parseable line beats an unparseable one, but every degrade
    * step above must fail first. */
  private[graft] def compactLine(
      total: Double,
      queriesJson: String,
      errorsJson: String, nErrors: Int,
      nIn: Int, nBanded: Int, overs: Seq[String],
      ratiosJson: String,
      scaleJson: String,
      fnIn: Int, fnTotal: Int, fnOvers: Seq[String],
      sfDir: String,
      limit: Int = CompactLineLimit): String = {
    def bandSum(withOvers: Boolean) =
      s""","band_summary":"$nIn/$nBanded in band""" +
        (if (withOvers && overs.nonEmpty) overs.mkString("; over: ", ",", "\"") else "\"")
    def floorSum(withOvers: Boolean) =
      if (fnTotal == 0) ""
      else s""","floor_norm_summary":"$fnIn/$fnTotal in""" +
        (if (withOvers && fnOvers.nonEmpty) fnOvers.mkString("; over: ", ",", "\"") else "\"")
    val errCount = if (nErrors == 0) "" else s""","errors_n":$nErrors"""
    def of(q: String, err: String, band: String, ratios: String,
        scale: String, fn: String) =
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$q$err$band$ratios$scale$fn,"artifact":"target/bench.json","sf":"$sfDir"}"""
    val candidates = Seq(
      of(queriesJson, errorsJson, bandSum(true), ratiosJson, scaleJson, floorSum(true)),
      of(queriesJson, errorsJson, bandSum(false), ratiosJson, scaleJson, floorSum(false)),
      of(queriesJson, errorsJson, bandSum(false), ratiosJson, "", floorSum(false)),
      of(queriesJson, errorsJson, bandSum(false), "", "", floorSum(false)),
      of(queriesJson, errCount, bandSum(false), "", "", floorSum(false)),
      of("{}", errCount, bandSum(false), "", "", floorSum(false)))
    candidates.find(_.length <= limit).getOrElse(candidates.last)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Controlled-experiment knobs (matrix sessions, not the official run):
    // BENCH_ONLY=comma-list restricts measured entries (fixture prep for
    // unselected blocks is skipped); BENCH_RUNS=N forces N base runs per
    // entry (default 2) so a collector matrix gets 5-run samples.
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def want(name: String): Boolean = only.forall(_.contains(name))
    val baseRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // 100x probe entries: NOT part of the official run (each costs minutes
    // and the 10x/30x points already band the scale curve) —
    // SPARK_GRAFT_BENCH_XSCALE=100 turns them on for one-off two-decade
    // scale evidence, recorded in BENCH_NOTES when taken.
    val want100x = sys.env.get("SPARK_GRAFT_BENCH_XSCALE").contains("100")
    val spark = EnvConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM + codegen once (unmeasured): the scan/agg path via q01,
    // and the wide signature-aggregate shapes via a 16-doc in-memory corpus
    // — janino compilation of the 64-aggregate generated classes costs
    // seconds once per JVM and is a fixed constant, not a scale property
    // (the generated-source cache serves the measured run).
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () } // warm-up only; failures surface in the measured run
    locally {
      import spark.implicits._
      val warm = (1 to 16).map(i => (i.toLong, s"warm doc number $i with text")).toDF("doc_id", "text")
      graft.operators.Dedup.minhashPairs(warm, "doc_id", "text",
        bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
        maxBucketWidth = Some(64)).count()
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // Fixture dirs are tracked and deleted after the summary prints: one
    // official run builds ~10-20 GB of scaled tables, and accumulated
    // rounds filled the disk mid-round-15 (a 50x probe died on ENOSPC).
    val benchTmpDirs = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
    def benchTmp(prefix: String): java.nio.file.Path = {
      val p = Files.createTempDirectory(prefix)
      benchTmpDirs.synchronized { benchTmpDirs += p }
      p
    }

    // Self-attribution probe (round-12): every measured run carries its
    // task-metric deltas (GC s, task wall s, task CPU s, shuffle MB) in
    // the artifact, so an out-of-band entry is diagnosable from the
    // OFFICIAL json alone — gc tracking the inflation = GC excursion;
    // rt inflated with cpu flat = co-tenant CPU steal; shuffle bytes
    // moved = a real plan change. Two rounds of `weak` marks came from
    // this evidence living only in BENCH_NOTES.
    import org.apache.spark.sql.graft.BenchProbe
    val probe = new BenchProbe
    spark.sparkContext.addSparkListener(probe)
    // Warm the calibration spin (round-13 advice): the first calibrateMs
    // call runs before the spin loop is JIT-compiled, so its sample can
    // read several × the quiet ~25-45 ms baseline — benchcert.py's
    // cal > 1.5×-median heuristic would then mislabel a first-entry band
    // breach as host contention. Three discarded calls compile the loop
    // before the first measured sample.
    (1 to 3).foreach(_ => BenchProbe.calibrateMs())

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val runsLog = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    // evidence per run: task-metric delta + the fixed-work calibration
    // (wall ms of BenchProbe.calibrateMs measured right before the run)
    val evLog = scala.collection.mutable.LinkedHashMap[String, Seq[(BenchProbe.Snap, Double)]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def attempt(name: String)(body: => Double): Unit =
      if (want(name)) {
        try results(name) = body
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(200)
        }
      }
    // Min of repeated runs per query: the steady-state number. A single-shot
    // measurement on a shared machine mixes in scheduler noise and
    // stragglers (the raw-parquet floor anchor alone varied 0.8-2.8 s
    // across identical runs); the min is the reproducible cost of the
    // plan, which is what a scale judgment needs. Two runs by default, a
    // THIRD when the first two disagree >30% (a loaded co-tenant can hit
    // both of two back-to-back runs — round 8's artifact showed exactly
    // that, 15.4 s vs a 3.2 s quiet rerun). Every raw run value is emitted
    // in the JSON "runs" field so a loaded artifact is self-diagnosing
    // rather than silently wrong. Stateful bodies build their own temp
    // dirs, so repeated runs stay independent.
    def measured(name: String)(body: => Unit): Double = {
      // One measured run = wall seconds + the probe's task-metric delta,
      // bus-drained on both sides so the delta brackets exactly this run.
      def run(): Double = {
        val cal = BenchProbe.calibrateMs()
        BenchProbe.drain(spark.sparkContext)
        val s0 = probe.snapshot()
        val t = time(body)
        BenchProbe.drain(spark.sparkContext)
        evLog(name) = evLog.getOrElse(name, Vector.empty) :+ ((probe.snapshot() - s0, cal))
        t
      }
      val rs = scala.collection.mutable.ArrayBuffer.fill(baseRuns)(run())
      if (rs.max / rs.min > 1.3) rs += run()
      // Band-aware retry (round-9 lesson): two back-to-back runs can AGREE
      // under a sustained co-tenant load spike, so run-disagreement alone
      // can't exonerate an elevated entry. For entries with a recorded
      // quiet-machine band, keep retrying (≤2 extra runs) while the min
      // sits above the band's upper edge — a real regression stays
      // elevated through four runs; a load spike usually doesn't.
      quietBandUpper.get(name).foreach { band =>
        var extra = 0
        while (rs.min > band && extra < 2) { rs += run(); extra += 1 }
      }
      // APPEND (don't replace): a re-measured entry (the ratio-aware
      // retry) must keep runs and evidence arrays index-aligned — evLog
      // accumulates per run, so replacing runs here would desynchronize
      // them and benchcert's min-run evidence lookup would read another
      // run's witnesses.
      runsLog(name) = runsLog.getOrElse(name, Seq.empty) ++ rs
      rs.min
    }
    // Steady-state variant for the 10x/30x entries: ONE unmeasured warm
    // pass of the exact body before the measured runs. The round-12 GC
    // matrix showed the first runs of a 10x entry on a fresh 32 GB heap
    // decay monotonically (t04_10x: 30.3→20.7→12.8→9.4→8.0→5.8 s, task GC
    // 89→10 s, shuffle bytes constant) — heap expansion + page cache, not
    // plan cost. Two rounds of `weak` marks (r10 ×4, r11 ×2) were this
    // transient caught at run 2-4. The minimum we track is the
    // steady-state plan cost (BENCH_NOTES methodology); the warm pass
    // moves the measured runs onto it instead of hoping retries get there.
    // Scoped to the scaled entries: the 1x entries share shapes and heap
    // with earlier blocks and are already effectively warm.
    def measuredWarm(name: String)(body: => Unit): Double = {
      body
      measured(name)(body)
    }
    // A query missing from the registry or failing at analysis becomes an
    // "errors" entry rather than crashing the whole run (registry/testdata
    // drift resilience).
    headline.foreach { name =>
      if (!SparkEntry.queries.contains(name)) errors(name) = "not registered in SparkEntry.queries"
      else attempt(name)(measured(name)(SparkEntry.queries(name)(spark, sfDir).count()))
    }

    // BASELINE.md pipeline: bulk write (auto-compacts) → 1% upsert
    // (bucket-pruned compaction) → delete slice → full read.
    attempt("pipeline_write_compact_read")(measured("pipeline_write_compact_read") {
      val cat = new GraftCatalog(spark, benchTmp("graft_bench").toString)
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      cat.createTable("bench.li", StructType(Seq(
        FieldMeta.field("l_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("l_linenumber", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("l_quantity", DoubleType),
        FieldMeta.field("l_extendedprice", DoubleType),
        FieldMeta.field("l_returnflag", StringType))))
      cat.writeToTable(li, "bench.li", WriteMode.Merge)
      cat.writeToTable(
        li.where(col("l_orderkey") % 100 === 0)
          .withColumn("l_extendedprice", col("l_extendedprice") * 1.1),
        "bench.li", WriteMode.Merge)
      cat.writeToTable(
        li.select("l_orderkey", "l_linenumber").where(col("l_orderkey") % 101 === 0),
        "bench.li", WriteMode.Delete)
      cat.readTable("bench.li").count()
    })

    // ---- SQL TVF surface cost (round-11): the graft_read merge-on-read
    // TVF resolves through the catalog's analyzed plan, so SQL users must
    // pay ~0 over the Scala readTable on the same unresolved-delta table.
    // Prep (table build, one bulk merge + one 1% trickle) is unmeasured.
    if (Seq("mor_read_scala", "mor_read_sql", "mor_trickle_read",
        "mor_backlog_read").exists(want)) try {
      val root = benchTmp("graft_bench_sql").toString
      val cat = new GraftCatalog(spark, root)
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      cat.createTable("bench.sqlmor", StructType(Seq(
        FieldMeta.field("l_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("l_linenumber", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("l_quantity", DoubleType),
        FieldMeta.field("l_extendedprice", DoubleType),
        FieldMeta.field("l_returnflag", StringType))),
        properties = Map("read_optimization" -> "NONE"))
      cat.writeToTable(li, "bench.sqlmor", WriteMode.Merge)
      cat.writeToTable(li.where(col("l_orderkey") % 100 === 0)
        .withColumn("l_extendedprice", col("l_extendedprice") * 1.1),
        "bench.sqlmor", WriteMode.Merge)
      Graft.registerFunctions(spark)
      attempt("mor_read_scala")(measured("mor_read_scala") {
        cat.readTable("bench.sqlmor").agg(sum("l_quantity"), count(lit(1))).head()
      })
      attempt("mor_read_sql")(measured("mor_read_sql") {
        spark.sql("SELECT sum(l_quantity) AS s, count(1) AS n " +
          s"FROM graft_read('$root', 'bench.sqlmor')").head()
      })
      // Trickle shape (round-12): 20 more small uncompacted deltas — the
      // write-heavy steady state between compactions, and the shape that
      // exercises the per-delta LITERAL lineage union (22 deltas ≤ the 64
      // threshold). A regression in many-delta planning or the literal
      // scans' union shows up here, not in the 2-delta entries above.
      (1 to 20).foreach { i =>
        cat.writeToTable(li.where(col("l_orderkey") % 400 === i)
          .withColumn("l_quantity", col("l_quantity") + i),
          "bench.sqlmor", WriteMode.Merge)
      }
      attempt("mor_trickle_read")(measured("mor_trickle_read") {
        cat.readTable("bench.sqlmor").agg(sum("l_quantity"), count(lit(1))).head()
      })
      // Backlog shape (round-13): 60 MORE trickle deltas → 82 active, past
      // the 64-delta literal-lineage threshold, so this read exercises the
      // OTHER lineage path — per-row regexp position extraction + the
      // O(#deltas) broadcast join — that serves thousand-delta backlogs at
      // scale. Until now that path had only a randomized equivalence test;
      // this gives it a tracked number (the equivalence says it's RIGHT,
      // this says it stays CHEAP). Expected ≈ mor_trickle_read + the
      // ~3-4 µs/row regexp constant over ~6M base rows.
      if (want("mor_backlog_read")) {
        (21 to 80).foreach { i =>
          cat.writeToTable(li.where(col("l_orderkey") % 400 === i)
            .withColumn("l_quantity", col("l_quantity") + i),
            "bench.sqlmor", WriteMode.Merge)
        }
        attempt("mor_backlog_read")(measured("mor_backlog_read") {
          cat.readTable("bench.sqlmor").agg(sum("l_quantity"), count(lit(1))).head()
        })
        // 1000-delta backlog probe (round-14, env-gated one-off like
        // XSCALE — each probe write is a full commit, so ~900 extra writes
        // cost minutes and stay out of the official run): the >64-delta
        // lineage FALLBACK's design scale is thousands of deltas; this
        // proves analysis/planning time and wall time stay bounded there.
        // `backlog_N_analysis` times plan construction alone (the
        // plan-size risk: ~N scan relations under the fallback's single
        // union is gone — it builds ONE scan + an O(N) broadcast lineage
        // join — but the metastore still lists N revisions per read).
        // The auto-compaction delta trigger (default 100) must be lifted
        // or the backlog silently folds at write #100.
        sys.env.get("SPARK_GRAFT_BENCH_BACKLOG").map(_.toInt).filter(_ > 82).foreach { n =>
          import spark.implicits._
          cat.alterTable("bench.sqlmor",
            setProperties = Map("compaction.trigger.deltas" -> "1000000"))
          (81 to n).foreach { i =>
            cat.writeToTable(Seq((1000000L + i, 1, i.toDouble, 1.0, "B"))
              .toDF("l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_returnflag"),
              "bench.sqlmor", WriteMode.Merge)
          }
          // attempt(): a plan-construction failure (the very risk this
          // probes) must record against ITS name, not abort the block as a
          // generic setup error — and the read below must still run.
          attempt(s"backlog_${n}_analysis") {
            val tAn0 = System.nanoTime()
            cat.readTable("bench.sqlmor").queryExecution.executedPlan
            (System.nanoTime() - tAn0) / 1e9
          }
          attempt(s"backlog_${n}_read")(measuredWarm(s"backlog_${n}_read") {
            cat.readTable("bench.sqlmor").agg(sum("l_quantity"), count(lit(1))).head()
          })
        }
      }
    } catch { case e: Throwable =>
      errors("sql_mor_setup") = Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(200)
    }

    // ---- Storage-partitioned dense merge A/B (round-11): a 20% pending
    // set is too big to broadcast (sparse needs base ≥ 8×); the
    // partitioned path key-joins against the base's own bucket layout so
    // only pending shuffles (measured 3.3× less shuffle volume at 5M
    // rows), while the legacy path shuffles base+pending. Same table,
    // same read, conf-flipped.
    if (Seq("mor_dense_partitioned", "mor_dense_legacy").exists(want)) try {
      val root = benchTmp("graft_bench_spj").toString
      val cat = new GraftCatalog(spark, root)
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      cat.createTable("bench.spj", StructType(Seq(
        FieldMeta.field("l_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("l_linenumber", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("l_quantity", DoubleType),
        FieldMeta.field("l_extendedprice", DoubleType),
        FieldMeta.field("l_returnflag", StringType))),
        properties = Map("read_optimization" -> "NONE"))
      cat.writeToTable(li, "bench.spj", WriteMode.Merge)
      cat.compact("bench.spj")
      cat.writeToTable(li.where(col("l_orderkey") % 5 === 0)
        .withColumn("l_extendedprice", col("l_extendedprice") * 1.1),
        "bench.spj", WriteMode.Merge)
      attempt("mor_dense_partitioned")(measured("mor_dense_partitioned") {
        cat.readTable("bench.spj").agg(sum("l_quantity"), count(lit(1))).head()
      })
      spark.conf.set("graft.merge.partitioned.enabled", "false")
      try attempt("mor_dense_legacy")(measured("mor_dense_legacy") {
        cat.readTable("bench.spj").agg(sum("l_quantity"), count(lit(1))).head()
      })
      finally spark.conf.unset("graft.merge.partitioned.enabled")
    } catch { case e: Throwable =>
      errors("spj_setup") = Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(200)
    }

    // ---- Hot-bucket carve-out A/B (round-14, verdict ask #2): a bucket
    // holding most of the table serializes the storage-partitioned read
    // into one straggler task (one partition per bucket is the KGP
    // contract); the carve-out routes that bucket through a broadcast
    // pass/contested split whose base side streams in parallel file splits
    // with no shuffle. Three entries, same read:
    //   mor_hotbucket_read     planted hot bucket, carve-out ON
    //   mor_hotbucket_nosplit  same table, carve-out OFF (the straggler)
    //   mor_balanced_read      uniform control, same total rows
    // The banded verdict is the RATIO hotbucket/balanced <= 1.5 (ratioBands)
    // — the carve-out must hold a skewed table within 1.5x of a balanced
    // one. The fixture plants the mitigation's DESIGN case, a power-law
    // key population under a partition-scoped identity: ~160k keys that
    // all hash to bucket 0, each live in 8 day partitions (~1.28M rows in
    // one bucket that NO rebucketing can spread — the bucket id hashes the
    // KEY alone) + ~800k uniform single-day keys. Key duplication is what
    // keeps the hot side's broadcast key set small (~23k distinct pending
    // keys for ~183k pending rows); with all-DISTINCT hot keys the pending
    // key set itself becomes megarow-sized and its broadcast build
    // dominates (measured 4.4 s vs a 2.0 s balanced control at 6.4M
    // unique-key hot rows) — but that shape is rebucket-fixable skew, the
    // recluster advisor's job, not the carve-out's. Thresholds are
    // conf-lowered to fixture scale (the production defaults, 8x mean +
    // 4M rows, are the same mechanism at cluster volume).
    if (Seq("mor_hotbucket_read", "mor_hotbucket_nosplit",
        "mor_balanced_read").exists(want) || want100x) try {
      import graft.catalog.MergeRead
      val days = 8L
      def mkMerged(tag: String, base0: org.apache.spark.sql.DataFrame): GraftCatalog = {
        val cat = new GraftCatalog(spark,
          benchTmp(s"graft_bench_hot_$tag").toString)
        cat.createTable("bench.hot", StructType(Seq(
          FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
          FieldMeta.field("day", LongType, nullable = false),
          FieldMeta.field("q", DoubleType),
          FieldMeta.field("v", StringType))),
          partitionScheme = PartitionScheme(Seq(PartitionKey("day", Transform.Identity))),
          // 200k-record compacted files: a hot bucket at real scale is many
          // GB = many files/splits, and the A/B's whole contrast is the KGP
          // scan coalescing ALL of them into one task while the carve-out
          // restores Spark's per-split parallelism — one monolithic file
          // would hide exactly the effect under test (both tables get the
          // same slicing, so the balanced control stays fair).
          properties = Map("read_optimization" -> "NONE",
            "compaction.num_buckets" -> "8",
            "compaction.max_records_per_file" -> "200000",
            // the partitioned pending write fans to tasks x day-dirs files,
            // which crosses the default 1000-file auto-compaction trigger —
            // and a silently folded pending delta turns the A/B into a
            // bare base scan (measured: "hot" read 0.6 s with regime
            // empty; the pending delta was gone)
            "compaction.trigger.files" -> "1000000"))
        val base = base0.select(col("id"), col("day"),
          (col("id") * 0.5 + col("day")).as("q"),
          concat(lit("pad-pad-pad-"), col("id")).as("v"))
        cat.writeToTable(base.repartition(32), "bench.hot", WriteMode.Merge)
        cat.compact("bench.hot")
        // ~14% pending (by key, all of a key's days): past the sparse band
        // (8x) on the full base, inside the partitioned band (2x) on the
        // COLD base (the carve-out recomputes eligibility with the hot
        // bucket excluded, so pending x2 must fit in the cold ~800k rows).
        // repartition(8) bounds the file fan-out (tasks x day-dirs).
        cat.writeToTable(base.where(col("id") % 7 === 0)
          .withColumn("q", col("q") * 1.1).repartition(8),
          "bench.hot", WriteMode.Merge)
        cat
      }
      // Scale knob (HOTSCALE=k multiplies both populations). Default 4 —
      // the measured crossover where the straggler starts to dominate:
      // the single-partition hot bucket costs grow linearly with its rows
      // while the carve-out's spread cost stays ~flat (split vs nosplit:
      // 3.4 vs 2.2 s at k=1 where per-stage overhead wins, 4.3 vs 4.9 at
      // k=4, 6.6 vs 8.4 at k=8 — BENCH_NOTES has the table). Below the
      // crossover the production thresholds correctly DECLINE to carve.
      val hotScale = sys.env.get("SPARK_GRAFT_BENCH_HOTSCALE")
        .map(_.toLong).getOrElse(4L)
      val bucketOf = pmod(hash(col("id")), lit(8))
      val hotBase = spark.range(1280000 * hotScale).where(bucketOf === 0)
        .withColumn("day", explode(sequence(lit(0L), lit(days - 1))))
        .unionByName(spark.range(1280000 * hotScale, 2195000 * hotScale)
          .where(bucketOf =!= 0).withColumn("day", col("id") % days))
      val hotCat = mkMerged("skew", hotBase.toDF())
      // minRows runs at its PRODUCTION default (4M < the 5.1M-row hot
      // bucket at k=4). factor must come down from its default only
      // because this fixture has 8 buckets: hottest ≤ 8×mean by identity,
      // so factor 8 is unreachable here — at a real table's thousands of
      // buckets the default means "hottest > 8 buckets' fair share".
      def hotRead(): Unit = {
        spark.conf.set(MergeRead.HotBucketFactorKey, "4")
        try hotCat.readTable("bench.hot").agg(sum("q"), count(lit(1))).head()
        finally spark.conf.unset(MergeRead.HotBucketFactorKey)
      }
      attempt("mor_hotbucket_read")(measured("mor_hotbucket_read")(hotRead()))
      // Carve-out off (default thresholds never fire at this volume): the
      // hot bucket stays one KGP partition — the straggler the ratio buys out.
      attempt("mor_hotbucket_nosplit")(measured("mor_hotbucket_nosplit") {
        hotCat.readTable("bench.hot").agg(sum("q"), count(lit(1))).head()
      })
      // Uniform control: same total rows, same schema/scheme/slicing.
      val balCat = mkMerged("bal", spark.range(2080000 * hotScale)
        .withColumn("day", col("id") % days).toDF())
      attempt("mor_balanced_read")(measured("mor_balanced_read") {
        balCat.readTable("bench.hot").agg(sum("q"), count(lit(1))).head()
      })
      // Ratio-aware retry: hotbucket_over_balanced divides two min-of-2
      // samples of 10+-stage plans, and the quotient wobbles ±20% on a
      // quiet machine (observed 1.30/1.39/1.44/1.68 across quiet full
      // runs — the 1.68 run's evidence showed ocpu 0, cal ~40). Same
      // policy as the absolute band-aware retry, applied to the
      // numerator: keep sampling while the contract ratio sits over its
      // band (≤2 extra runs) — the min is the steady-state estimator and
      // only ever moves DOWN, so a genuinely slow carve-out still fails.
      locally {
        val (band, denFloor) = ratioBands.collectFirst {
          case ("hotbucket_over_balanced", _, _, b, fl) => (b, fl) }.getOrElse((1.5, 0.0))
        var extra = 0
        def over: Boolean = (for {
          h <- results.get("mor_hotbucket_read")
          b <- results.get("mor_balanced_read") if b > 0.001
        } yield h / math.max(b, denFloor) > band).getOrElse(false)
        while (extra < 2 && over) {
          val prev = results("mor_hotbucket_read")
          attempt("mor_hotbucket_read")(measured("mor_hotbucket_read")(hotRead()))
          results.get("mor_hotbucket_read")
            .foreach(v => results("mor_hotbucket_read") = math.min(prev, v))
          extra += 1
        }
      }
      // Two-decade probe (round-15, verdict ask #5; env-gated like the
      // other XSCALE points): the carve-out's crossover table stops at
      // k=8 (10.2M hot rows) while the production thresholds (minRows 4M,
      // factor 8) were designed for cluster volume — this reruns the
      // split/nosplit/balanced A/B at k=50 (~64M rows in ONE bucket that
      // no rebucketing can spread) so the "straggler grows linearly,
      // carve-out cost stays ~flat" claim is checked at design scale.
      // Results go to BENCH_NOTES when taken; never in the official run.
      if (want100x) {
        val k = sys.env.get("SPARK_GRAFT_BENCH_HOTSCALE_PROBE")
          .map(_.toLong).getOrElse(50L)
        val hotBaseK = spark.range(1280000 * k).where(bucketOf === 0)
          .withColumn("day", explode(sequence(lit(0L), lit(days - 1))))
          .unionByName(spark.range(1280000 * k, 2195000 * k)
            .where(bucketOf =!= 0).withColumn("day", col("id") % days))
        val hotCatK = mkMerged(s"skew${k}x", hotBaseK.toDF())
        def hotReadK(): Unit = {
          spark.conf.set(MergeRead.HotBucketFactorKey, "4")
          try hotCatK.readTable("bench.hot").agg(sum("q"), count(lit(1))).head()
          finally spark.conf.unset(MergeRead.HotBucketFactorKey)
        }
        attempt(s"mor_hotbucket_read_${k}x")(
          measuredWarm(s"mor_hotbucket_read_${k}x")(hotReadK()))
        attempt(s"mor_hotbucket_nosplit_${k}x")(
          measuredWarm(s"mor_hotbucket_nosplit_${k}x") {
            hotCatK.readTable("bench.hot").agg(sum("q"), count(lit(1))).head()
          })
        val balCatK = mkMerged(s"bal${k}x", spark.range(2080000 * k)
          .withColumn("day", col("id") % days).toDF())
        attempt(s"mor_balanced_read_${k}x")(
          measuredWarm(s"mor_balanced_read_${k}x") {
            balCatK.readTable("bench.hot").agg(sum("q"), count(lit(1))).head()
          })
      }
    } catch { case e: Throwable =>
      errors("hotbucket_setup") = Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(200)
    }

    // Anchor: the same data through bare Spark parquet write + read.
    attempt("baseline_raw_spark")(measured("baseline_raw_spark") {
      val out = benchTmp("graft_bench_raw").toString
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
        .write.mode("overwrite").parquet(s"$out/li")
      spark.read.parquet(s"$out/li").count()
    })

    // ---- 10x scaled entries. sf0.1 is small enough that per-job overhead
    // dominates; these rerun the two heaviest paths at 10x the volume
    // (deterministic synthetic derivation, prep unmeasured) so the round
    // numbers expose scaling behavior, not constants. Same min-of-runs
    // policy as everything else: length amortizes scheduler jitter but not
    // a co-tenant load spike, and round 8's artifact proved the latter.
    var lineitem10xPath: Option[String] = None
    var lineitem30xPath: Option[String] = None
    val wantDocs10x = Seq("t04_minhash_neardup_10x", "t41_span_removal_10x",
      "t50_ngram_jaccard_10x", "t04_minhash_neardup_30x").exists(want) || want100x
    val wantLi30x = Seq("pipeline_30x", "baseline_raw_spark_30x",
      "zipper_read_30x").exists(want)
    val wantLi10x = wantLi30x || want100x || Seq("pipeline_10x",
      "baseline_raw_spark_10x", "zipper_read_10x").exists(want)
    if (wantDocs10x || wantLi10x) locally {
      val scaleDir = benchTmp("graft_bench_10x").toString
      // Corpus: each doc yields v=0 (original), v=1 (every 10th word
      // salted — a planted near-dup), v=2..9 (every 2nd word salted —
      // distinct). Deterministic: salts hash (doc_id, v, position).
      val words = split(col("text"), "\\s+")
      val step = when(col("v") === 1, lit(10)).otherwise(lit(2))
      val mutated = transform(words, (w, i) =>
        when(col("v") =!= 0 && i % step === 0,
          concat(lit("s"), abs(hash(col("doc_id"), col("v"), i)).cast("string")))
          .otherwise(w))
      def writeDocsNx(n: Int, out: String): Unit =
        spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
          .withColumn("v", explode(sequence(lit(0), lit(n - 1))))
          .select((col("doc_id") * n + col("v")).as("doc_id"),
            concat_ws(" ", mutated).as("text"))
          .write.mode("overwrite").parquet(out)
      def writeLiNx(n: Int, out: String): Unit =
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
          .withColumn("rep", explode(sequence(lit(0), lit(n - 1))))
          .select((col("l_orderkey") + col("rep").cast(LongType) * 100000000L).as("l_orderkey"),
            col("l_linenumber"), col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
          .write.mode("overwrite").parquet(out)
      def pipelineBody(li: org.apache.spark.sql.DataFrame, tbl: String): Unit = {
        val cat = new GraftCatalog(spark, benchTmp("graft_bench10").toString)
        cat.createTable(tbl, StructType(Seq(
          FieldMeta.field("l_orderkey", LongType, nullable = false, mergeKey = true),
          FieldMeta.field("l_linenumber", IntegerType, nullable = false, mergeKey = true),
          FieldMeta.field("l_quantity", DoubleType),
          FieldMeta.field("l_extendedprice", DoubleType),
          FieldMeta.field("l_returnflag", StringType))))
        cat.writeToTable(li, tbl, WriteMode.Merge)
        cat.writeToTable(
          li.where(col("l_orderkey") % 100 === 0)
            .withColumn("l_extendedprice", col("l_extendedprice") * 1.1),
          tbl, WriteMode.Merge)
        cat.writeToTable(
          li.select("l_orderkey", "l_linenumber").where(col("l_orderkey") % 101 === 0),
          tbl, WriteMode.Delete)
        cat.readTable(tbl).count()
      }

      if (wantDocs10x) {
        writeDocsNx(10, s"$scaleDir/documents10x")
        val docs10 = spark.read.parquet(s"$scaleDir/documents10x")
        attempt("t04_minhash_neardup_10x")(measuredWarm("t04_minhash_neardup_10x") {
          graft.operators.Dedup.minhashPairs(docs10, "doc_id", "text",
            bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
            maxBucketWidth = Some(64)).count()
        })
        attempt("t41_span_removal_10x")(measuredWarm("t41_span_removal_10x") {
          graft.operators.Dedup.removeDuplicateSpans(docs10, "doc_id", "text",
            k = 8).count()
        })
        // Posting-list dedup at 10x. The knob lesson (sibling of IVF's
        // sqrt-nlist): maxDf must EXCEED the corpus's duplication
        // multiplicity — here every doc has 10 variants, so a rare shingle
        // shared by a true near-dup pair ALSO appears in up to 10 sibling
        // variants; maxDf=5 blocks those postings and recall collapses
        // (measured: 2 pairs vs 106). maxDf=12 restores recall at ~20% extra
        // join cost; the candidate join stays bounded at maxDf²/2 per
        // surviving shingle either way.
        attempt("t50_ngram_jaccard_10x")(measuredWarm("t50_ngram_jaccard_10x") {
          graft.operators.Dedup.rareShinglePairs(docs10, "doc_id", "text",
            shingleK = 5, maxDf = 12, threshold = 0.5).count()
        })
        // 30x scale point (round-12, promoted from the r11 one-off probe —
        // 23.6 s quiet): the 10x→30x ratio is the superlinearity tracker
        // for the banded LSH join (planted near-dup density grows with the
        // variant count; bucket caps must keep the candidate join bounded).
        if (want("t04_minhash_neardup_30x")) {
          writeDocsNx(30, s"$scaleDir/documents30x")
          val docs30 = spark.read.parquet(s"$scaleDir/documents30x")
          attempt("t04_minhash_neardup_30x")(measuredWarm("t04_minhash_neardup_30x") {
            graft.operators.Dedup.minhashPairs(docs30, "doc_id", "text",
              bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
              maxBucketWidth = Some(64)).count()
          })
        }
        // Two-decade probe (env-gated, never in the official run): the
        // banded LSH dedup at 100x the corpus — planted-near-dup density
        // and bucket caps must keep candidate work bounded across the
        // full 1x→100x sweep.
        if (want100x) {
          writeDocsNx(100, s"$scaleDir/documents100x")
          val docs100 = spark.read.parquet(s"$scaleDir/documents100x")
          attempt("t04_minhash_neardup_100x")(measuredWarm("t04_minhash_neardup_100x") {
            graft.operators.Dedup.minhashPairs(docs100, "doc_id", "text",
              bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
              maxBucketWidth = Some(64)).count()
          })
        }
      }
      if (wantLi10x) {
        writeLiNx(10, s"$scaleDir/lineitem10x")
        lineitem10xPath = Some(s"$scaleDir/lineitem10x")
        val li10 = spark.read.parquet(s"$scaleDir/lineitem10x")
        attempt("pipeline_10x")(measuredWarm("pipeline_10x") {
          pipelineBody(li10, "bench.li10")
        })
        // 10x raw floor: anchors how much of pipeline_10x is irreducible
        // parquet write+read (the fixed ACID/commit costs amortize with
        // scale — the pipeline/floor ratio should SHRINK vs the 1x pair).
        attempt("baseline_raw_spark_10x")(measuredWarm("baseline_raw_spark_10x") {
          val out = benchTmp("graft_bench_raw10").toString
          li10.write.mode("overwrite").parquet(s"$out/li")
          spark.read.parquet(s"$out/li").count()
        })
        // 30x ACID pipeline (round-12): the decade point 1x→10x showed the
        // commit constant fully amortized (3.3x flat vs floor); the 30x
        // point tracks that the full write→compact→merge→delete→read loop
        // stays LINEAR in data volume across a second scale step.
        if (wantLi30x) {
          writeLiNx(30, s"$scaleDir/lineitem30x")
          lineitem30xPath = Some(s"$scaleDir/lineitem30x")
        }
        lineitem30xPath.foreach { p30 =>
          val li30 = spark.read.parquet(p30)
          attempt("pipeline_30x")(measuredWarm("pipeline_30x") {
            pipelineBody(li30, "bench.li30")
          })
          // 30x raw floor (round-13): until now the 30x ratio had no
          // anchor — the cert borrowed the 10x floor scaled ×3. A floor
          // entry per scale point keeps every graded ratio same-run,
          // same-machine, band-checked (see "ratios" in the artifact).
          if (want("baseline_raw_spark_30x"))
            attempt("baseline_raw_spark_30x")(measuredWarm("baseline_raw_spark_30x") {
              val out = benchTmp("graft_bench_raw30").toString
              li30.write.mode("overwrite").parquet(s"$out/li")
              spark.read.parquet(s"$out/li").count()
            })
        }
        // Two-decade probe (env-gated): the ACID pipeline + its floor at
        // 100x — the linearity claim across 1x→100x, ratio anchored
        // same-run.
        if (want100x) {
          writeLiNx(100, s"$scaleDir/lineitem100x")
          val li100 = spark.read.parquet(s"$scaleDir/lineitem100x")
          attempt("pipeline_100x")(measuredWarm("pipeline_100x") {
            pipelineBody(li100, "bench.li100")
          })
          attempt("baseline_raw_spark_100x")(measuredWarm("baseline_raw_spark_100x") {
            val out = benchTmp("graft_bench_raw100").toString
            li100.write.mode("overwrite").parquet(s"$out/li")
            spark.read.parquet(s"$out/li").count()
          })
        }
      }
    }

    // ---- ANN scaling points (round-11): brute-force cosine is the O(n·q)
    // baseline; IVF is the scale path. At 10x the corpus, brute cost must
    // grow ~10x while IVF with nlist scaled alongside the corpus keeps
    // per-query candidate work flat — the brute/ivf ratio at 10x is the
    // scale-path claim, machine-checkable in this artifact. Corpus derived
    // deterministically (prep unmeasured): v=0 original, v=1..9
    // hash-jittered copies (±0.005 per dim — cluster structure preserved).
    if (Seq("t06_ann_brute_10x", "t10_ann_ivf_10x", "t11_semantic_dedup_10x")
        .exists(want)) try {
      val scaleDir = benchTmp("graft_bench_emb10").toString
      spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
        .withColumn("v", explode(sequence(lit(0), lit(9))))
        .select((col("vec_id") * 10 + col("v")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x + (pmod(hash(col("vec_id"), col("v"), i), lit(1000)) - 500)
              .cast("double") / 100000.0).as("embedding"))
        .write.mode("overwrite").parquet(s"$scaleDir/embeddings10x")
      val emb10 = spark.read.parquet(s"$scaleDir/embeddings10x")
      // the 20 original (v=0) query vectors, same ids as the 1x entries
      val q10 = emb10.where(col("vec_id") % 10 === 0 && col("vec_id") < 200)
      attempt("t06_ann_brute_10x")(measuredWarm("t06_ann_brute_10x") {
        graft.operators.Similarity.bruteForceTopK(
          emb10, q10, "vec_id", "embedding", 5).count()
      })
      attempt("t10_ann_ivf_10x")(measuredWarm("t10_ann_ivf_10x") {
        val cents = graft.operators.Similarity.trainCentroids(
          emb10, "vec_id", "embedding", nlist = 16, iters = 0)
        graft.operators.Similarity.ivfTopK(emb10, q10, "vec_id", "embedding",
          k = 5, centroids = cents, nprobe = 4).count()
      })
      // nlist scaled with sqrt(corpus): balances the n*nlist assignment
      // term against the n^2/nlist intra-cluster pair term — total work
      // scales n^1.5, the correct complexity for exact blocked pairwise
      // dedup (nlist=640 was measured 12.8 s: assignment alone grew 100x)
      attempt("t11_semantic_dedup_10x")(measuredWarm("t11_semantic_dedup_10x") {
        val cents = graft.operators.Similarity.trainCentroids(
          emb10, "vec_id", "embedding", nlist = 200, iters = 0)
        graft.operators.Similarity.semanticNearDupPairs(emb10, "vec_id", "embedding",
          threshold = 0.35, centroids = cents).count()
      })
    } catch { case e: Throwable =>
      errors("ann_10x_setup") = Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(200)
    }

    // ---- skip-index headliners (round-8): the read-path wins the footer
    // stats bought. Prep (table build + compaction) is unmeasured; the
    // entries time (a) a selective range read that plans ~1/12 of the
    // files, and (b) a manifest-served count/min/max that opens ZERO files.
    // Planned-file counts are reported in the "plan" field so the claim is
    // machine-checkable, not just a BENCH_NOTES sentence.
    val planCounts = scala.collection.mutable.LinkedHashMap[String, Long]()
    if (Seq("skip_read", "agg_meta").exists(want)) try {
      val root = benchTmp("graft_bench_skip").toString
      val cat = new GraftCatalog(spark, root)
      cat.createTable("bench.skip", StructType(Seq(
        FieldMeta.field("l_orderkey", LongType, nullable = false),
        FieldMeta.field("l_linenumber", IntegerType, nullable = false),
        FieldMeta.field("l_quantity", DoubleType),
        FieldMeta.field("l_extendedprice", DoubleType),
        FieldMeta.field("l_returnflag", StringType))),
        properties = Map("write.max_records_per_file" -> "50000"))
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      // Global sort on the filter key → disjoint per-file ranges, the
      // layout compaction's sort scheme produces at scale.
      cat.writeToTable(li.orderBy("l_orderkey").coalesce(1), "bench.skip")
      val maxKey = li.agg(max("l_orderkey")).head().getLong(0)
      val lo = maxKey / 2
      val hi = lo + maxKey / 24 // ~1/24 of the key space → ~1-2 of ~12 files
      planCounts("skip_read_total_files") = cat.readTable("bench.skip").inputFiles.length.toLong
      planCounts("skip_read_files") = cat.readTable("bench.skip",
        ReadOptions(rowFilter = Some(col("l_orderkey") >= lo && col("l_orderkey") < hi)))
        .inputFiles.length.toLong
      attempt("skip_read")(measured("skip_read") {
        cat.readTable("bench.skip",
          ReadOptions(rowFilter = Some(col("l_orderkey") >= lo && col("l_orderkey") < hi)))
          .agg(sum("l_quantity")).head()
      })
      val t = spark.read.format("graft").option("root", root)
        .option("table", "bench.skip").load()
      planCounts("agg_meta_files") =
        t.agg(count(lit(1)), min("l_orderkey")).inputFiles.length.toLong
      attempt("agg_meta")(measured("agg_meta") {
        t.agg(count(lit(1)).as("n"), min("l_orderkey").as("mn"),
          max("l_orderkey").as("mx")).head()
      })
    } catch { case e: Throwable =>
      errors("skip_setup") = Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(200)
    }

    // ---- round-9 read paths, same machine-checkable pattern.
    // (a) Iceberg transform pruning: a bucket[4]+day-partitioned foreign-
    //     format table, selectively read — the derived partition predicates
    //     must prune the manifest before any data file opens.
    if (Seq("iceberg_transform_prune", "iceberg_transform_prune_10x",
        "iceberg_gated_plan_10x").exists(want)) try {
      val t = benchTmp("graft_bench_icet").resolve("tbl").toString
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
        .select("event_id", "ts", "user_id", "event_type")
      graft.interop.Iceberg.createTable(t, ev.schema,
        partitionSpec = Seq("user_id" -> "bucket[4]", "ts" -> "day"))
      graft.interop.Iceberg.append(ev, t)
      val filter = col("user_id") === 3L &&
        col("ts") >= to_timestamp(lit("2024-01-20 00:00:00"))
      val meta = graft.interop.Iceberg.loadMeta(t)
      val entries = graft.interop.Iceberg.fileEntries(spark, meta, meta.snapshots.head)
      val preds = graft.interop.IcebergPartPrune.derive(
        graft.catalog.StatsSkip.translate(filter), meta.specFields, meta.schema)
      planCounts("iceberg_prune_total_files") = entries.size.toLong
      planCounts("iceberg_prune_files") =
        entries.count(e => graft.interop.IcebergPartPrune.keep(preds, e.partition)).toLong
      attempt("iceberg_transform_prune")(measured("iceberg_transform_prune") {
        graft.interop.Iceberg.read(spark, t, dataFilter = Some(filter)).count()
      })
      // 10x manifest scale (round-10 scaling point): nine more appends of
      // the same frame → 10x snapshots/manifest entries. The filtered read
      // must prune the 10x manifest the same fraction; the GATED planner
      // (forced) must agree while keeping only survivors driver-side.
      (1 until 10).foreach(_ => graft.interop.Iceberg.append(ev, t))
      val meta10 = graft.interop.Iceberg.loadMeta(t)
      val entries10 = graft.interop.Iceberg.fileEntries(spark, meta10,
        meta10.snapshots.last)
      planCounts("iceberg_prune_total_files_10x") = entries10.size.toLong
      planCounts("iceberg_prune_files_10x") =
        entries10.count(e => graft.interop.IcebergPartPrune.keep(preds, e.partition)).toLong
      attempt("iceberg_transform_prune_10x")(measured("iceberg_transform_prune_10x") {
        graft.interop.Iceberg.read(spark, t, dataFilter = Some(filter)).count()
      })
      attempt("iceberg_gated_plan_10x")(measured("iceberg_gated_plan_10x") {
        graft.interop.Iceberg.read(spark, t, dataFilter = Some(filter),
          planGateManifestBytes = 0L).count()
      })
    } catch { case e: Throwable =>
      errors("iceberg_prune_setup") = Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(200)
    }
    // (b) Zipper read: two column groups written as independent partial
    //     upserts, zipped by merge key; a single-group read must plan NO
    //     files of the other group's deltas (the plan counts are the
    //     claim). The FULL zip is expected ~1.3x the plain read at this
    //     scale — it pays a merge-key join the plain resolve folds into
    //     one aggregate; the zipper's win is group-restricted access and
    //     not re-shuffling a heavy group through another group's trickle,
    //     neither of which a narrow all-numeric benchmark table exhibits.
    if (Seq("zipper_read", "zipper_read_plain", "zipper_read_filtered",
        "zipper_read_10x", "zipper_read_30x").exists(want)) try {
      val root = benchTmp("graft_bench_zip").toString
      val cat = new GraftCatalog(spark, root)
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      cat.createTable("bench.zip", StructType(Seq(
        FieldMeta.field("l_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("l_linenumber", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("l_quantity", DoubleType),
        FieldMeta.field("l_extendedprice", DoubleType),
        FieldMeta.field("l_returnflag", StringType))),
        properties = Map("read_optimization" -> "NONE"))
      cat.setSubschema("bench.zip", "nums",
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
      cat.setSubschema("bench.zip", "flag",
        Seq("l_orderkey", "l_linenumber", "l_returnflag"))
      cat.writeToTable(li, "bench.zip", WriteMode.Merge)
      // independent per-group trickles (1% each)
      cat.writeToTable(li.where(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") + 1).as("l_quantity"),
          col("l_extendedprice")), "bench.zip", WriteMode.Merge)
      cat.writeToTable(li.where(col("l_orderkey") % 101 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), lit("Z").as("l_returnflag")),
        "bench.zip", WriteMode.Merge)
      def norm(p: String) = p.replaceFirst("^file:/+", "/")
      val numsOnly = cat.deltaLog("bench.zip")
        .filter(_.properties.get("written_columns")
          .exists(w => !w.split(",").contains("l_returnflag")))
        .flatMap(_.entries.map(e => norm(e.path))).toSet
      val flagFiles = cat.readZipped("bench.zip", Seq("flag")).inputFiles.map(norm)
      planCounts("zipper_flag_files") = flagFiles.length.toLong
      planCounts("zipper_flag_foreign_files") =
        flagFiles.count(numsOnly.contains).toLong // must stay 0
      attempt("zipper_read")(measured("zipper_read") {
        cat.readZipped("bench.zip").agg(sum("l_quantity"), count(lit(1))).head()
      })
      attempt("zipper_read_plain")(measured("zipper_read_plain") {
        cat.readTable("bench.zip").agg(sum("l_quantity"), count(lit(1))).head()
      })
      // (c) Key-filter pushdown through the zipper (round-10): on a
      //     key-partitioned table, a zipped read WHERE key ∈ range must
      //     plan strictly fewer files per group than the unfiltered zip —
      //     the pushed key-only conjunct prunes each group's manifest
      //     (truncate partitioning gives every file a tight key range, so
      //     footer stats make the prune observable in inputFiles).
      val cat2 = new GraftCatalog(spark, benchTmp("graft_bench_zipf").toString)
      // truncate width ~1/8 of the keyspace at ANY sf, so the filtered
      // range below always selects a real, strict subset of partitions
      val maxKey = li.agg(max("l_orderkey")).head().getLong(0)
      val width = java.lang.Long.highestOneBit(math.max(maxKey / 8, 1024L)).toInt
      cat2.createTable("bench.zipf", StructType(Seq(
        FieldMeta.field("l_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("l_linenumber", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("l_quantity", DoubleType),
        FieldMeta.field("l_extendedprice", DoubleType),
        FieldMeta.field("l_returnflag", StringType))),
        partitionScheme = PartitionScheme(Seq(
          PartitionKey("l_orderkey", Transform.Truncate(width)))),
        properties = Map("read_optimization" -> "NONE"))
      cat2.setSubschema("bench.zipf", "nums",
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
      cat2.setSubschema("bench.zipf", "flag",
        Seq("l_orderkey", "l_linenumber", "l_returnflag"))
      // cluster the bulk load by key so each partition dir gets few files
      cat2.writeToTable(li.repartitionByRange(16, col("l_orderkey")),
        "bench.zipf", WriteMode.Merge)
      cat2.writeToTable(li.where(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") + 1).as("l_quantity"), col("l_extendedprice")),
        "bench.zipf", WriteMode.Merge)
      cat2.writeToTable(li.where(col("l_orderkey") % 101 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), lit("Z").as("l_returnflag")),
        "bench.zipf", WriteMode.Merge)
      val lo2 = maxKey / 2 / width * width // a middle truncate bucket
      val zf = ReadOptions(rowFilter =
        Some(col("l_orderkey") >= lo2 && col("l_orderkey") < lo2 + width))
      planCounts("zipper_filter_total_files") =
        cat2.readZipped("bench.zipf").inputFiles.length.toLong
      planCounts("zipper_filter_files") =
        cat2.readZipped("bench.zipf", opts = zf).inputFiles.length.toLong
      attempt("zipper_read_filtered")(measured("zipper_read_filtered") {
        cat2.readZipped("bench.zipf", opts = zf)
          .agg(sum("l_quantity"), count(lit(1))).head()
      })
      // (d) 10x scaling point for the zipper (round-10): same fixture
      //     shape at 10x the rows — the ratio vs zipper_read tracks
      //     whether the per-group resolve + zip joins scale linearly.
      lineitem10xPath.foreach { p10 =>
        val li10 = spark.read.parquet(p10)
        val cat3 = new GraftCatalog(spark, benchTmp("graft_bench_zip10").toString)
        cat3.createTable("bench.zip10", StructType(Seq(
          FieldMeta.field("l_orderkey", LongType, nullable = false, mergeKey = true),
          FieldMeta.field("l_linenumber", IntegerType, nullable = false, mergeKey = true),
          FieldMeta.field("l_quantity", DoubleType),
          FieldMeta.field("l_extendedprice", DoubleType),
          FieldMeta.field("l_returnflag", StringType))),
          properties = Map("read_optimization" -> "NONE"))
        cat3.setSubschema("bench.zip10", "nums",
          Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
        cat3.setSubschema("bench.zip10", "flag",
          Seq("l_orderkey", "l_linenumber", "l_returnflag"))
        cat3.writeToTable(li10, "bench.zip10", WriteMode.Merge)
        cat3.writeToTable(li10.where(col("l_orderkey") % 100 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_quantity") + 1).as("l_quantity"), col("l_extendedprice")),
          "bench.zip10", WriteMode.Merge)
        cat3.writeToTable(li10.where(col("l_orderkey") % 101 === 0)
          .select(col("l_orderkey"), col("l_linenumber"), lit("Z").as("l_returnflag")),
          "bench.zip10", WriteMode.Merge)
        attempt("zipper_read_10x")(measuredWarm("zipper_read_10x") {
          cat3.readZipped("bench.zip10").agg(sum("l_quantity"), count(lit(1))).head()
        })
      }
      // (e) 30x scaling point (round-13): the zipper is the most expensive
      //     composed read surface (two per-group LSM resolves + a
      //     merge-key zip join) and after the r12 lineage fold its 10x
      //     dropped 5× — the 30x point tracks that the drop holds a second
      //     scale step (linear-ish vs zipper_read_10x, same fixture shape).
      if (want("zipper_read_30x")) lineitem30xPath.foreach { p30 =>
        val li30 = spark.read.parquet(p30)
        val cat4 = new GraftCatalog(spark, benchTmp("graft_bench_zip30").toString)
        cat4.createTable("bench.zip30", StructType(Seq(
          FieldMeta.field("l_orderkey", LongType, nullable = false, mergeKey = true),
          FieldMeta.field("l_linenumber", IntegerType, nullable = false, mergeKey = true),
          FieldMeta.field("l_quantity", DoubleType),
          FieldMeta.field("l_extendedprice", DoubleType),
          FieldMeta.field("l_returnflag", StringType))),
          properties = Map("read_optimization" -> "NONE"))
        cat4.setSubschema("bench.zip30", "nums",
          Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
        cat4.setSubschema("bench.zip30", "flag",
          Seq("l_orderkey", "l_linenumber", "l_returnflag"))
        cat4.writeToTable(li30, "bench.zip30", WriteMode.Merge)
        cat4.writeToTable(li30.where(col("l_orderkey") % 100 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_quantity") + 1).as("l_quantity"), col("l_extendedprice")),
          "bench.zip30", WriteMode.Merge)
        cat4.writeToTable(li30.where(col("l_orderkey") % 101 === 0)
          .select(col("l_orderkey"), col("l_linenumber"), lit("Z").as("l_returnflag")),
          "bench.zip30", WriteMode.Merge)
        attempt("zipper_read_30x")(measuredWarm("zipper_read_30x") {
          cat4.readZipped("bench.zip30").agg(sum("l_quantity"), count(lit(1))).head()
        })
      }
    } catch { case e: Throwable =>
      errors("zipper_setup") = Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(200)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // JSON-string-safe error text: escape backslash/quote AND flatten
    // control characters (Spark analysis errors carry tabs and carriage
    // returns before the first newline) — a raw control char inside a
    // JSON string is invalid and would make the whole line unparseable on
    // exactly the runs (errored ones) where parseability matters most.
    def jsonSafe(v: String): String =
      v.replace("\\", "\\\\").replace("\"", "\\\"").map(c => if (c < ' ') ' ' else c)
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => "\"" + k + "\":\"" + jsonSafe(v) + "\"" }
        .mkString(""","errors":{""", ",", "}")
    val planJson =
      if (planCounts.isEmpty) ""
      else planCounts.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString(""","plan":{""", ",", "}")
    // per-entry raw run values: queries carries the min (the plan's
    // steady-state cost); runs lets a reader see WHEN an artifact was
    // produced under load (all runs inflated) vs clean (runs agree).
    // The PRINTED line keeps runs only where they carry diagnostic value
    // (out-of-band min, or >15% spread) — the driver's artifact capture
    // truncates long stdout lines (r9/r10 verdicts reconstructed medians
    // from the tail), so the printed line stays small on a quiet machine;
    // the COMPLETE runs map always lands in target/bench.json.
    def runsJsonOf(m: collection.Map[String, Seq[Double]]): String =
      if (m.isEmpty) ""
      else m.map { case (k, vs) =>
        "\"" + k + "\":" + vs.map(v => f"$v%.3f").mkString("[", ",", "]")
      }.mkString(""","runs":{""", ",", "}")
    // Per-run self-attribution (round-12): the i-th evidence object pairs
    // with the i-th raw run. gc/rt/cpu are SUMMED TASK seconds (32 task
    // threads, so rt ≈ 32× wall when saturated); sr/sw are shuffle MB;
    // jgc is the WHOLE-JVM GC delta — local[32] is one JVM, so jgc−gc is
    // GC outside task execution (driver planning/commit pauses), the
    // signal a latency-bound entry (task time ≪ wall×cores) needs.
    // Read: an elevated run whose gc (or jgc) tracks the inflation = GC
    // excursion; rt inflated with cpu flat = co-tenant CPU steal; sr/sw
    // moved = a real plan change, investigate.
    // Round-13 addition — the load witness the r12 t35 postmortem lacked:
    // pcpu is this whole PROCESS's CPU delta (tasks + driver + JIT + GC
    // threads) and ocpu is the rest of the MACHINE's busy CPU over the
    // same window (/proc/stat). Task cpu-seconds are NOT load-invariant
    // on a 32-thread SMT box — hyperthread contention and JIT starvation
    // inflate cpu too, mimicking a real regression (r12's t35: 4 agreeing
    // runs, gc 0, rt≈cpu≈5 task-s, yet 0.16 s quiet at the same commit) —
    // so "cpu elevated AND ocpu ≈ 0" is the only pairing that indicts the
    // plan; "cpu elevated, ocpu large" exonerates as co-tenant load.
    // "cal" (round-13): wall ms of a fixed single-thread spin measured
    // just before the run — the HOST-contention witness. A hypervisor
    // noisy neighbor is invisible to every guest counter here (no PV
    // steal accounting: gc 0, ocpu 0, yet cpu-seconds inflate ~2× — the
    // r12-t35 signature, reproduced in this round's reruns); fixed work
    // has no ambiguity, so cal ≫ its quiet ~25 ms baseline indicts the
    // host even when ocpu ≈ 0.
    def evJsonOf(m: collection.Map[String, Seq[(org.apache.spark.sql.graft.BenchProbe.Snap, Double)]]): String =
      if (m.isEmpty) ""
      else m.map { case (k, vs) =>
        "\"" + k + "\":" + vs.map { case (e, cal) =>
          // "iow" (round-14): whole-machine iowait delta — the witness for
          // rt ≫ cpu with ocpu ≈ 0 and cal quiet (disk-bound co-tenancy,
          // invisible to a CPU spin; see BenchProbe.machineIoWaitSeconds).
          f"""{"gc":${e.gcS}%.1f,"rt":${e.rtS}%.1f,"cpu":${e.cpuS}%.1f,"sr":${e.srMb}%.0f,"sw":${e.swMb}%.0f,"jgc":${e.jvmGcS}%.1f,"pcpu":${e.procCpuS}%.1f,"ocpu":${math.max(0.0, e.otherCpuS)}%.1f,"iow":${math.max(0.0, e.ioWaitS)}%.1f,"cal":$cal%.0f}"""
        }.mkString("[", ",", "]")
      }.mkString(""","evidence":{""", ",", "}")
    val interesting = runsLog.filter { case (k, vs) =>
      vs.max / vs.min > 1.15 || quietBandUpper.get(k).forall(b => vs.min > b)
    }
    val interestingEv = evLog.filter { case (k, _) => interesting.contains(k) }
    val total = results.values.sum
    // Per-entry band verdict IN the artifact (round-13): the certification
    // is DERIVED from the closing artifact itself, never hand-written from
    // an earlier run (r12's cert said 54/54 in band while the closing
    // artifact was 50/54). "in"/"over" per banded entry; band values ride
    // along so a reader needs no source access. tools/benchcert.py renders
    // the BENCH_NOTES certification text from these fields.
    val bandStatus: Seq[(String, String)] = results.toSeq.map { case (k, v) =>
      k -> quietBandUpper.get(k).map(b => if (v <= b) "in" else "over").getOrElse("none")
    }
    val nBanded = bandStatus.count(_._2 != "none")
    val nIn = bandStatus.count(_._2 == "in")
    val overs = bandStatus.collect { case (k, "over") => k }
    val bandJson = {
      val bs = results.keys.toSeq.flatMap(k =>
        quietBandUpper.get(k).map(b => "\"" + k + "\":" + f"$b%.2f"))
      val st = bandStatus.map { case (k, s) => "\"" + k + "\":\"" + s + "\"" }
      s""","bands":${bs.mkString("{", ",", "}")}""" +
        s""","band_status":${st.mkString("{", ",", "}")}""" +
        s""","band_summary":"$nIn/$nBanded in band""" +
        (if (overs.isEmpty) "\"" else overs.mkString("; over: ", ",", "\""))
    }
    // Graded pipeline/floor ratios, self-labeling (round-13): a ratio
    // computed from an over-band floor is UNTRUSTED — an inflated floor
    // flatters it (r12: closing floor_10x 4.83 s vs its 3.20 band made the
    // naive pipeline_10x/floor read 1.5× where the quiet value was ~2.9×).
    val ratioJson = {
      val rs = Seq(
        ("pipeline_write_compact_read", "baseline_raw_spark"),
        ("pipeline_10x", "baseline_raw_spark_10x"),
        ("pipeline_30x", "baseline_raw_spark_30x")).flatMap { case (p, f) =>
        // fv guard: a ~0 s floor would emit bare Infinity/NaN, which is
        // not strict JSON — drop the ratio rather than corrupt the artifact
        for (pv <- results.get(p); fv <- results.get(f) if fv > 0.001) yield {
          val ok = quietBandUpper.get(f).forall(fv <= _)
          f""""${p}_over_floor":{"x":${pv / fv}%.2f,"floor_in_band":$ok}"""
        }
      }
      if (rs.isEmpty) "" else rs.mkString(""","ratios":{""", ",", "}")
    }
    // Scale-curve ratio verdicts (round-14): each banded dimensionless
    // ratio ships with its band and an in/over status, so a superlinear
    // bend fails the artifact even when the host shifts absolute times.
    val scaleJson = {
      val rs = ratioBands.flatMap { case (nm, num, den, band, denFloor) =>
        for (nv <- results.get(num); dv <- results.get(den) if dv > 0.001) yield {
          // floored denominator (ask #3): a lucky-fast 1× sample cannot
          // inflate the quotient; den_floor rides along so a reader can
          // recover the raw same-run ratio from the queries map.
          val x = nv / math.max(dv, denFloor)
          f""""$nm":{"x":$x%.2f,"band":$band%.2f,"den_floor":$denFloor%.2f,"status":"${if (x <= band) "in" else "over"}"}"""
        }
      }
      if (rs.isEmpty) "" else rs.mkString(""","scale_ratios":{""", ",", "}")
    }
    // Floor-normalized per-entry bands (round-16, verdict Wrong #1): the
    // r15 closing artifacts drifted +5.7% uniformly — the zero-machinery
    // floor query included — and every ABSOLUTE band absorbed it silently,
    // so a slow host could mask a near-band-edge regression and a fast one
    // could hide superlinearity. Each headline entry is normalized by the
    // SAME-RUN baseline_raw_spark (denominator floored at its recorded
    // quiet constant, the ask-#3 pattern — a lucky-fast floor deflates x,
    // never inflates it): uniform host drift cancels and a breach means
    // the PLAN changed. Bands seeded from the r15 closing ratios (drift
    // cancels in the quotient, so those ARE the quiet ratios) with
    // ~35-40% headroom for the short-floor quantization noise.
    val FloorQuietSeconds = 0.47 // baseline_raw_spark quiet floor (BENCH_NOTES r14)
    val floorNormBands: Seq[(String, Double)] = Seq(
      ("pipeline_write_compact_read", 5.2), // r15 x=3.80
      ("mor_balanced_read", 6.5),           // 4.77
      ("mor_read_scala", 3.6),              // 2.62
      ("t04_minhash_neardup", 5.0),         // 3.60
      ("t40_curation_pipeline", 8.0),       // 5.90
      ("t33_crosscorpus_join", 3.9),        // 2.81
      ("zipper_read", 3.3),                 // 2.35
      ("q03_join_topk", 2.6),               // 1.87
      ("t50_ngram_jaccard", 2.3),           // 1.65
      ("t34_bm25_topk", 2.6))               // 1.86
    val floorNorm: Seq[(String, Double, Double, String)] =
      results.get("baseline_raw_spark").toSeq.flatMap { fv =>
        val d = math.max(fv, FloorQuietSeconds)
        floorNormBands.flatMap { case (k, band) =>
          results.get(k).map { v =>
            val x = v / d
            (k, x, band, if (x <= band) "in" else "over")
          }
        }
      }
    val floorNormJson =
      if (floorNorm.isEmpty) ""
      else floorNorm.map { case (k, x, b, st) =>
        f""""$k":{"x":$x%.2f,"band":$b%.2f,"status":"$st"}"""
      }.mkString(""","floor_norm":{""", ",", "}")
    val fnIn = floorNorm.count(_._4 == "in")
    val fnOvers = floorNorm.collect { case (k, _, _, "over") => k }
    def lineOf(runsJson: String, evJson: String): String =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$errJson$planJson$bandJson$ratioJson$scaleJson$floorNormJson$runsJson$evJson,"sf":"$sfDir"}"""
    // Driver-parseable final line (round-14, verdict ask #1): the driver's
    // artifact capture keeps only the last ~2 KB of stdout, so the full
    // line (queries + bands + band_status + runs + evidence, 5-8 KB)
    // recorded `"parsed": null` for three rounds running. stdout now
    // carries ONLY a compact summary (per-entry min at 2 decimals, the
    // band verdict, graded + scale ratios — no per-entry band map, no
    // runs/evidence arrays, ≈1.8 KB); the COMPLETE artifact still lands in
    // target/bench.json and is committed as BENCH_CLOSING_r{N}.json.
    val qsCompact = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    // Errors in the compact line are truncated hard (full text is in
    // target/bench.json) — a 200-char message per failed entry would eat
    // the capture window that the per-entry numbers need.
    val errJsonCompact =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) =>
        // take BEFORE escaping could strand a lone trailing backslash;
        // jsonSafe after the cut keeps the string valid
        "\"" + k + "\":\"" + jsonSafe(v.take(60)) + "\""
      }.mkString(""","errors":{""", ",", "}")
    // Terse string forms of the ratio verdicts for the compact line: the
    // object forms cost ~420 bytes, which pushed the 60-entry line past
    // the capture window and degraded it to queries:{} — exactly the
    // per-entry channel ask #1 exists to restore. "4.10xT" = ratio with
    // floor trusted (F = floor over band, do not grade); "3.15<=4.8:in"
    // = scale ratio vs its band. Full objects stay in target/bench.json.
    val ratioJsonCompact = {
      val rs = Seq(
        ("pipeline", "pipeline_write_compact_read", "baseline_raw_spark"),
        ("pipeline_10x", "pipeline_10x", "baseline_raw_spark_10x"),
        ("pipeline_30x", "pipeline_30x", "baseline_raw_spark_30x")).flatMap {
        case (nm, p, f) =>
          for (pv <- results.get(p); fv <- results.get(f) if fv > 0.001) yield {
            val t = if (quietBandUpper.get(f).forall(fv <= _)) "T" else "F"
            f""""$nm":"${pv / fv}%.2fx$t""""
          }
      }
      if (rs.isEmpty) "" else rs.mkString(""","ratios_over_floor":{""", ",", "}")
    }
    val scaleJsonCompact = {
      val rs = ratioBands.flatMap { case (nm, num, den, band, denFloor) =>
        for (nv <- results.get(num); dv <- results.get(den) if dv > 0.001) yield {
          val x = nv / math.max(dv, denFloor)
          f""""$nm":"$x%.2f<=$band%.2g:${if (x <= band) "in" else "over"}""""
        }
      }
      if (rs.isEmpty) "" else rs.mkString(""","scale_ratios":{""", ",", "}")
    }
    // Degrade-priority assembly (round-17, verdict ask #1): `queries` is
    // kept to the last byte; over-lists/ratios/error texts drop first —
    // see compactLine's doc for the order and the r16 postmortem.
    val compact = compactLine(total, qsCompact, errJsonCompact, errors.size,
      nIn, nBanded, overs, ratioJsonCompact, scaleJsonCompact,
      fnIn, floorNorm.size, fnOvers, sfDir)
    // Machine-clean FULL copy: the driver's stdout capture truncates long
    // lines; this file carries every raw run.
    try {
      val out = java.nio.file.Paths.get("target/bench.json")
      Files.createDirectories(out.getParent)
      Files.write(out, lineOf(runsJsonOf(runsLog), evJsonOf(evLog)).getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // The compact summary prints AFTER spark.stop(): context shutdown can
    // emit WARN lines, and the driver json-parses the capture's FINAL
    // line — anything after the JSON would defeat the whole channel
    // (build.sbt's StdoutOutput + showSuccess=false strip sbt's own
    // framing around it).
    spark.stop()
    benchTmpDirs.foreach { d =>
      try {
        val walk = Files.walk(d)
        try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        finally walk.close()
      } catch { case _: Exception => () } // best-effort; never block the summary
    }
    println(compact)
    System.out.flush()
  }
}
