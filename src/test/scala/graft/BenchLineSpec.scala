package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The driver's bench channel (round-17, verdict ask #1): the driver captures
 * the last 2000 characters of stdout and json-parses the FINAL line, and its
 * PERF comparison reads the per-entry `queries` map off that line. Round 16
 * lost all 60 entries because the old guard degraded by dropping `queries`
 * the moment over-band name lists lengthened the line past the window. The
 * contract under test: the per-entry map survives every realistic degrade,
 * and the assembled line always fits the window.
 */
class BenchLineSpec extends AnyFunSuite {

  /** Every bench entry name as of round 17 (the 60 r16 entries + the t20
    * addition). Update when adding entries — the worst-case budget check
    * below is the gate that a new name cannot silently re-blind the driver. */
  private val allEntries = Seq(
    "agg_meta", "baseline_raw_spark", "baseline_raw_spark_10x",
    "baseline_raw_spark_30x", "iceberg_gated_plan_10x",
    "iceberg_transform_prune", "iceberg_transform_prune_10x",
    "mor_backlog_read", "mor_balanced_read", "mor_dense_legacy",
    "mor_dense_partitioned", "mor_hotbucket_nosplit", "mor_hotbucket_read",
    "mor_read_scala", "mor_read_sql", "mor_trickle_read", "pipeline_10x",
    "pipeline_30x", "pipeline_write_compact_read", "q01_pricing_summary",
    "q03_join_topk", "q05_region_revenue", "q07_topk_orders",
    "q12_events_sessionize", "q16_asof_join", "skip_read", "t01_text_stats",
    "t02_exact_dedup", "t04_minhash_neardup", "t04_minhash_neardup_10x",
    "t04_minhash_neardup_30x", "t06_ann_brute", "t06_ann_brute_10x",
    "t07_ann_lsh", "t10_ann_ivf", "t10_ann_ivf_10x", "t11_semantic_dedup",
    "t11_semantic_dedup_10x", "t15_neardup_clusters", "t20_substring_dedup",
    "t31_quality_score", "t32_dsir_weights", "t33_crosscorpus_join",
    "t34_bm25_topk", "t35_chunk_documents", "t36_lm_perplexity",
    "t38_pca_project", "t40_curation_pipeline", "t41_span_removal",
    "t41_span_removal_10x", "t44_corpus_shuffle", "t46_semantic_join",
    "t50_ngram_jaccard", "t50_ngram_jaccard_10x", "t51_temperature_mix",
    "t52_int8_quantize", "zipper_read", "zipper_read_10x", "zipper_read_30x",
    "zipper_read_filtered", "zipper_read_plain")

  private def queriesJsonOf(names: Seq[String], value: String): String =
    names.map(n => "\"" + n + "\":" + value).mkString("{", ",", "}")

  // the full-length optional blocks as the real run emits them
  private val ratios =
    ""","ratios_over_floor":{"pipeline":"3.54xT","pipeline_10x":"3.27xT","pipeline_30x":"2.53xF"}"""
  private val scales =
    ""","scale_ratios":{"pipeline_10x_over_1x":"3.65<=4.5:in","pipeline_30x_over_1x":"9.42<=13:in","t04_30x_over_1x":"2.07<=3.6:in","hotbucket_over_balanced":"1.18<=1.5:in"}"""
  private val fnOvers = Seq("pipeline_write_compact_read", "mor_balanced_read",
    "mor_read_scala", "t04_minhash_neardup", "t40_curation_pipeline",
    "t33_crosscorpus_join", "zipper_read", "q03_join_topk",
    "t50_ngram_jaccard", "t34_bm25_topk")

  test("worst case — every entry over band, max-width values — keeps the full queries map in-window") {
    val qs = queriesJsonOf(allEntries, "999.99")
    val line = Bench.compactLine(9999.99, qs, "", 0,
      nIn = 0, nBanded = allEntries.size, overs = allEntries,
      ratiosJson = ratios, scaleJson = scales,
      fnIn = 0, fnTotal = 10, fnOvers = fnOvers,
      sfDir = "/root/testdata/sf0.1")
    assert(line.length <= Bench.CompactLineLimit,
      s"worst-case line is ${line.length} chars — a new entry name re-blinded the driver")
    assert(line.contains("\"queries\":" + qs), "per-entry map degraded")
    assert(line.contains("\"band_summary\":\"0/61 in band\""))
    assert(line.contains("\"artifact\":\"target/bench.json\""))
  }

  test("quiet line keeps every optional block intact when it fits") {
    val qs = queriesJsonOf(allEntries, "1.23")
    val line = Bench.compactLine(123.45, qs, "", 0,
      nIn = allEntries.size, nBanded = allEntries.size, overs = Nil,
      ratiosJson = ratios, scaleJson = scales,
      fnIn = 10, fnTotal = 10, fnOvers = Nil,
      sfDir = "/root/testdata/sf0.1")
    assert(line.length <= Bench.CompactLineLimit)
    assert(line.contains("\"queries\":" + qs))
    assert(line.contains(ratios) && line.contains(scales))
    assert(line.contains("\"floor_norm_summary\":\"10/10 in\""))
  }

  test("error texts degrade to a count before the queries map gives an inch") {
    val qs = queriesJsonOf(allEntries, "999.99")
    val errJson = allEntries.take(10).map(n =>
      "\"" + n + "\":\"" + ("x" * 60) + "\"").mkString(""","errors":{""", ",", "}")
    val line = Bench.compactLine(9999.99, qs, errJson, 10,
      nIn = 0, nBanded = allEntries.size, overs = allEntries,
      ratiosJson = ratios, scaleJson = scales,
      fnIn = 0, fnTotal = 10, fnOvers = fnOvers,
      sfDir = "/root/testdata/sf0.1")
    assert(line.length <= Bench.CompactLineLimit)
    assert(line.contains("\"queries\":" + qs), "per-entry map degraded before error texts")
    assert(line.contains("\"errors_n\":10"), "dropped error texts must leave a count")
  }

  test("the r16 failure replayed: 11 over-band names no longer cost the per-entry map") {
    val qs = queriesJsonOf(allEntries, "12.34")
    val overs = Seq("q01_pricing_summary", "q03_join_topk",
      "q05_region_revenue", "q16_asof_join", "t01_text_stats",
      "t02_exact_dedup", "t40_curation_pipeline", "mor_read_scala",
      "pipeline_10x", "baseline_raw_spark_30x", "zipper_read_plain")
    val line = Bench.compactLine(138.44, qs, "", 0,
      nIn = allEntries.size - overs.size, nBanded = allEntries.size,
      overs = overs, ratiosJson = ratios, scaleJson = scales,
      fnIn = 10, fnTotal = 10, fnOvers = Nil,
      sfDir = "/root/testdata/sf0.1")
    assert(line.length <= Bench.CompactLineLimit)
    assert(line.contains("\"queries\":" + qs),
      "the exact r16 shape must keep the per-entry map")
  }
}
