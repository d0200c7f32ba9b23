package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Data-selection operators: DSIR importance weights/resampling, the
  * fastText-style quality classifier, and the cross-corpus MinHash join. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def assertNoCartesian(df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "plan contains CartesianProduct")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "plan contains BroadcastNestedLoopJoin")
  }

  test("dsirWeights ranks target-like documents above off-distribution ones") {
    val target = (0 until 30).map(i => (i.toLong, "physics quantum field theory lagrangian symmetry"))
      .toDF("doc_id", "text")
    val raw = ((100 until 120).map(i => (i.toLong, "quantum field symmetry physics notes lagrangian")) ++
      (200 until 220).map(i => (i.toLong, "cheap pills buy now click here free offer")))
      .toDF("doc_id", "text")
    val w = Selection.dsirWeights(raw, target, "doc_id", "text", dim = 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val physMin = (100 until 120).map(i => w(i.toLong)).min
    val spamMax = (200 until 220).map(i => w(i.toLong)).max
    assert(physMin > spamMax,
      s"physics docs ($physMin) must outrank spam ($spamMax)")
  }

  test("dsirWeights: a gramless document scores 0.0 and is not dropped") {
    val target = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val raw = Seq((10L, "alpha gamma"), (11L, "")).toDF("doc_id", "text")
    val w = Selection.dsirWeights(raw, target, "doc_id", "text", dim = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet == Set(10L, 11L))
    assert(w(11L) == 0.0)
  }

  test("dsirSelect is deterministic across reruns and partitionings") {
    val target = (0 until 10).map(i => (i.toLong, "spark shuffle partition join")).toDF("doc_id", "text")
    val raw = (100 until 200).map(i =>
      (i.toLong, if (i % 3 == 0) "spark join shuffle partition agg" else "lorem ipsum dolor sit amet"))
      .toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Selection.dsirSelect(df, target, "doc_id", "text", k = 20, dim = 512)
        .select("doc_id").as[Long].collect().toSet
    val a = ids(raw)
    val b = ids(raw.repartition(7))
    assert(a == b, "selection must not depend on partitioning")
    assert(a.size == 20)
    // with temperature noise the target-like docs still dominate the pick
    assert(a.count(_ % 3 == 0) >= 15, s"selected set $a is not target-heavy")
  }

  test("quality classifier: trains to separate planted quality classes, scores align") {
    val good = (0 until 40).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog in the quiet meadow", 1.0))
    val bad = (100 until 140).map(i =>
      (i.toLong, "buy buy cheap cheap click click free free win win", 0.0))
    val labeled = (good ++ bad).toDF("doc_id", "text", "label")
    val model = Selection.trainQualityClassifier(labeled, "doc_id", "text", "label", dim = 512)
    assert(model.dim == 512)
    val scores = Selection.qualityScore(labeled, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val goodMin = good.map(g => scores(g._1)).min
    val badMax = bad.map(b => scores(b._1)).max
    assert(goodMin > badMax, s"good floor $goodMin must exceed bad ceiling $badMax")
  }

  test("qualityScore: empty doc scores sigmoid(intercept); plan stays join-free map+agg") {
    val model = Selection.QualityModel(Array.fill(64)(0.5), intercept = 1.0)
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val out = Selection.qualityScore(docs, "doc_id", "text", model)
    assertNoCartesian(out)
    val m = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sig = (z: Double) => 1.0 / (1.0 + math.exp(-z))
    assert(math.abs(m(1L) - BigDecimal(sig(1.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(m(2L) - BigDecimal(sig(1.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("minhashJoin finds cross-corpus near-dups incl. colliding ids; no cross product") {
    val base = "spark catalyst optimizer rewrites logical plans into physical plans with codegen"
    // left id 5 and right id 5 are UNRELATED docs — the join must still
    // pair left 5 with right 9 (near-identical text)
    val left = Seq(
      (5L, base + " stage one"),
      (6L, "completely different text about cooking pasta al dente with garlic")
    ).toDF("doc_id", "text")
    val right = Seq(
      (5L, "unrelated document on medieval history and castles and sieges"),
      (9L, base + " stage two")
    ).toDF("doc_id", "text")
    val joined = Dedup.minhashJoin(left, right, "doc_id", "text",
      threshold = 0.7, wordGrams = Some(1))
    assertNoCartesian(joined)
    val pairs = joined.select("id_left", "id_right").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((5L, 9L)), s"got $pairs")
  }

  test("lmPerplexity: reference-like docs score lower than shuffled-vocab docs") {
    val reference = (0 until 40).map(i =>
      (i.toLong, "the model reads the data and the model writes the result"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (100L, "the model reads the data"),          // fluent under the reference LM
      (101L, "data the reads result writes model") // same vocab, broken bigrams
    ).toDF("doc_id", "text")
    val ppl = Selection.lmPerplexity(docs, reference, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppl(100L) < ppl(101L),
      s"fluent doc (${ppl(100L)}) must score below shuffled doc (${ppl(101L)})")
    // < 2 tokens → no conditional exists → not scored
    val short = Selection.lmPerplexity(
      Seq((1L, "single")).toDF("doc_id", "text"), reference, "doc_id", "text")
    assert(short.count() == 0)
  }

  test("minhashJoin hot-bucket cap bounds a planted boilerplate cluster") {
    val boiler = "all rights reserved copyright notice terms of service apply here"
    val left = (0 until 50).map(i => (i.toLong, boiler + s" left$i")).toDF("doc_id", "text")
    val right = (100 until 150).map(i => (i.toLong, boiler + s" right$i")).toDF("doc_id", "text")
    val capped = Dedup.minhashJoin(left, right, "doc_id", "text",
      threshold = 0.7, wordGrams = Some(1), maxBucketWidth = Some(4))
    // every right bucket is wider than the cap → no candidates survive
    assert(capped.count() == 0)
  }

  test("Md5BucketExpr kernel is value-identical to the composed md5-hex form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    // the pre-round-16 composed expression, verbatim
    def composed(id: org.apache.spark.sql.Column, buckets: Long) =
      pmod(conv(substring(md5(id.cast(StringType)), 1, 8), 16, 10).cast(LongType),
        lit(buckets)).cast(IntegerType)
    val rows = Seq("", "a", "hello world", "héllo wörld 漢字 🙂", "7",
      "the quick brown fox", "\n\t", "x" * 10000) ++
      (0 until 2000).map(i => s"gram $i of the synthetic stream")
    val df = rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      .union(Seq((99999L, null.asInstanceOf[String])).toDF("id", "s"))
    for (b <- Seq(1L, 2L, 101L, 1024L, 4096L, 10000L, 1L << 30)) {
      val bad = df.select(col("id"),
          TextOps.hashBucket(col("s"), lit(b)).as("neu"),
          composed(col("s"), b).as("alt"))
        .where(!(col("neu") <=> col("alt")))
      assert(bad.count() == 0, s"buckets=$b diverged")
      // numeric ids go through the same cast-to-string path
      val badId = df.select(
          TextOps.hashBucket(col("id"), lit(b)).as("neu"),
          composed(col("id"), b).as("alt"))
        .where(!(col("neu") <=> col("alt")))
      assert(badId.count() == 0, s"buckets=$b diverged on numeric ids")
    }
    // null input and interpreted (non-codegen) eval path
    val r = df.where(col("s").isNull)
      .select(TextOps.hashBucket(col("s"), lit(7L))).collect()
    assert(r.length == 1 && r.head.isNullAt(0))
  }
}
