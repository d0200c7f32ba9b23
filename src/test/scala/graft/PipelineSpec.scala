package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Correctness of the LLM-pipeline operators: approximate ops (MinHash LSH,
  * SimHash, LSH-ANN) verified against exact baselines; plan-shape assertions
  * prove no all-pairs join sneaks into the candidate generation. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val sfd = "/root/testdata/sf0.001"

  private def assertNoCartesian(df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "plan contains CartesianProduct")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "plan contains BroadcastNestedLoopJoin")
  }

  test("exact dedup: planted duplicate collapses to canonical id") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha  BETA gamma "), (3L, "unrelated text here"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(df, "doc_id", "text").collect()
    assert(groups.length == 2)
    val dup = groups.find(_.getAs[Long]("copies") == 2L).get
    assert(dup.getAs[Long]("canonical_id") == 1L)
    val kept = Dedup.dropExactDuplicates(df, "doc_id", "text").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("incremental dedup: bloom prefilter never changes the exact answer") {
    val docs = spark.read.parquet(s"$sfd/documents.parquet")
      .select("doc_id", "text")
    val corpus = docs.where($"doc_id" % 3 =!= 0)
    val incoming = docs.where($"doc_id" % 2 === 0)
    val exact = incoming.join(
      corpus.select(graft.operators.TextOps.fingerprint($"text").as("fp")).distinct(),
      graft.operators.TextOps.fingerprint(incoming("text")) === $"fp", "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // tight and sloppy FPPs both reproduce the exact anti-join
    for (fpp <- Seq(0.0001, 0.5)) {
      val got = Dedup.incrementalNew(incoming, corpus, "doc_id", "text",
        expectedCorpusItems = 600L, fpp = fpp)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == exact, s"fpp=$fpp")
    }
    // empty corpus: everything is new
    assert(Dedup.incrementalNew(incoming, corpus.limit(0), "doc_id", "text")
      .count() == incoming.count())
  }

  test("incremental near-dup equals the batch-crossing subset of the full-corpus pairs") {
    val docs = spark.read.parquet(s"$sfd/documents.parquet").select("doc_id", "text")
    val corpus = docs.where($"doc_id" % 3 =!= 0)
    val batch = docs.where($"doc_id" % 3 === 0)
    val idx = Dedup.minhashSignatures(corpus, "doc_id", "text", wordGrams = Some(2))
    val inc = Dedup.incrementalNearDupPairs(batch, idx, corpus, "doc_id", "text",
      threshold = 0.9, wordGrams = Some(2))
      .select($"id_new", $"id_corpus", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // same banding over the union: a crossing pair shares a band bucket in
    // the incremental join iff it does in the all-pairs job
    val full = Dedup.minhashPairs(docs, "doc_id", "text",
      threshold = 0.9, wordGrams = Some(2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        (a % 3 == 0, b % 3 == 0) match {
          case (true, false) => Some((a, b, j))
          case (false, true) => Some((b, a, j))
          case _ => None
        }
      }.toSet
    assert(inc == full, s"incremental=${inc.size} fullCrossing=${full.size}")
  }

  test("incremental near-dup refuses a signature index built with other band params") {
    val docs = spark.read.parquet(s"$sfd/documents.parquet").select("doc_id", "text")
    val corpus = docs.where($"doc_id" % 3 =!= 0)
    val idx32 = Dedup.minhashSignatures(corpus, "doc_id", "text",
      bands = 4, rowsPerBand = 8, wordGrams = Some(2)) // 32 hashes
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDupPairs(docs.where($"doc_id" % 3 === 0), idx32, corpus,
        "doc_id", "text", bands = 8, rowsPerBand = 8, wordGrams = Some(2)).count()
    }
    assert(e.getMessage.contains("32 hashes"))
  }

  test("minhash LSH finds a high-jaccard planted pair; no cross join") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    val near = base.replace("tonight", "tomorrow")
    val docs = spark.read.parquet(s"$sfd/documents.parquet")
      .select($"doc_id" + 1000L as "doc_id", $"text")
      .unionByName(Seq((1L, base), (2L, near)).toDF("doc_id", "text"))
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.7)
    assertNoCartesian(pairs)
    val found = pairs.where($"id_a" === 1L && $"id_b" === 2L).collect()
    assert(found.length == 1, "planted near-dup pair not found")
    assert(found.head.getAs[Double]("jaccard") > 0.8)
  }

  test("temperature mixing: low-resource sources keep a higher fraction; budget monotone; deterministic") {
    val docs = spark.read.parquet(s"$sfd/documents.parquet")
    val cnt = size(TextOps.tokens(col("text"))).cast("long")
    val toks = docs.groupBy("source").agg(sum(cnt).as("t"))
      .as[(String, Long)].collect().toMap
    val (loSrc, hiSrc) = (toks.minBy(_._2)._1, toks.maxBy(_._2)._1)
    assert(toks(loSrc) < toks(hiSrc), "fixture should have skewed sources")

    val budget = toks.values.sum / 4
    val mixed = TextOps.sampleToTemperatureMix(docs, "doc_id", cnt, "source", budget, 2.0)
    val ids = mixed.select("doc_id").as[Long].collect().toSet
    assert(ids == TextOps.sampleToTemperatureMix(docs, "doc_id", cnt, "source", budget, 2.0)
      .select("doc_id").as[Long].collect().toSet, "mix must be deterministic")

    // T=2 boosts low-resource sources: on a 90:1 skewed synthetic corpus
    // (900 vs 10 docs, 10 tokens each) the small source's derived budget
    // exceeds its size — it keeps EVERYTHING (deterministic, no hash
    // noise) — while the big source subsamples to ~sqrt-flattened share.
    val skewed = ((0 until 900).map(i => (i.toLong, "ten little token words here pad pad pad pad pad", "big")) ++
      (1000 until 1010).map(i => (i.toLong, "ten little token words here pad pad pad pad pad", "small")))
      .toDF("doc_id", "text", "source")
    val sk = TextOps.sampleToTemperatureMix(skewed, "doc_id", cnt, "source", 2000L, 2.0)
      .groupBy("source").count().as[(String, Long)].collect().toMap.withDefaultValue(0L)
    assert(sk("small") == 10L, s"T=2 must keep all of the tiny source: $sk")
    assert(sk("big") > 90L && sk("big") < 320L,
      s"big source must subsample to ~20% under T=2: $sk")

    // Budget monotonicity: a bigger budget only raises thresholds, so the
    // kept set grows (the id-hash contract makes selections nested).
    val more = TextOps.sampleToTemperatureMix(docs, "doc_id", cnt, "source", budget * 2, 2.0)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(more), "bigger budget must keep a superset")

    // Budget >= corpus: every doc with a positive-token source is kept.
    val all = TextOps.sampleToTemperatureMix(docs, "doc_id", cnt, "source",
      toks.values.sum * 2, 2.0).count()
    assert(all == docs.count())

    // Non-string source columns (int source ids are common) must work:
    // the thresholds map is String-keyed, so both the aggregate and the
    // lookup cast — and they must agree on the key text.
    val intSrc = skewed.withColumn("source",
      when($"source" === "big", lit(1)).otherwise(lit(2)))
    val skInt = TextOps.sampleToTemperatureMix(intSrc, "doc_id", cnt, "source", 2000L, 2.0)
      .groupBy("source").count().as[(Int, Long)].collect().toMap.withDefaultValue(0L)
    assert(skInt(2) == 10L && skInt(1) == sk("big"),
      s"int-typed source must mix identically to its string twin: $skInt vs $sk")
    val budInt = TextOps.sampleToTokenBudgetBy(intSrc, "doc_id", cnt, "source",
      Map("2" -> 1000000L)).groupBy("source").count()
      .as[(Int, Long)].collect().toMap.withDefaultValue(0L)
    assert(budInt(2) == 10L && budInt(1) == 0L,
      s"budget mixer must match int sources against string budget keys: $budInt")
  }

  test("rare-shingle blocking finds planted near-dups deterministically; common shingles pruned") {
    val base = "zqxj wvkp mlgh rtyu base document with plenty of distinctive shared text here"
    val near = base.replace("here", "now!")
    // 30 copies of a boilerplate doc: every shingle it contributes has
    // df ≥ 30 > maxDf, so boilerplate forms NO candidate pairs at all.
    val boiler = (100L until 130L).map(i => (i, "common common common common common"))
    val docs = (Seq((1L, base), (2L, near)) ++ boiler).toDF("doc_id", "text")
    val pairs = Dedup.rareShinglePairs(docs, "doc_id", "text",
      shingleK = 5, maxDf = 5, threshold = 0.5)
    assertNoCartesian(pairs)
    val rows = pairs.collect()
    assert(rows.length == 1, s"expected only the planted pair, got ${rows.toSeq}")
    assert(rows.head.getLong(0) == 1L && rows.head.getLong(1) == 2L)
    assert(rows.head.getAs[Double]("jaccard") > 0.8)
    // Verify values agree with the standalone exact-jaccard helper.
    val j = Dedup.ngramJaccard(Seq((1L, 2L)).toDF("id_a", "id_b"),
      docs, "doc_id", "text", shingleK = 5).head().getAs[Double]("jaccard")
    assert(math.abs(j - rows.head.getAs[Double]("jaccard")) < 1e-12)
  }

  test("containment finds a verbatim-quoted doc that Jaccard misses; direction is right") {
    val inner = "zxqvw kjpml unique quoted passage with distinctive tokens qqfhg"
    val outer = (0 until 12).map(i => s"framing sentence number$i talks about topic$i")
      .mkString(" ") + " " + inner + " " +
      (12 until 24).map(i => s"trailing commentary item$i regarding subject$i").mkString(" ")
    val docs = (Seq((1L, inner), (2L, outer)) ++
      (10L until 40L).map(i => (i, "filler common common filler text body")))
      .toDF("doc_id", "text")
    val got = Dedup.shingleContainmentPairs(docs, "doc_id", "text",
      shingleK = 5, maxDf = 5, threshold = 0.8)
    assertNoCartesian(got)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Every 5-gram of the inner doc is a 5-gram of the outer doc: exact 1.0,
    // one direction only (the outer doc is NOT contained in the inner).
    assert(rows.toSeq == Seq((1L, 2L, 1.0)), s"got ${rows.toSeq}")
    // Jaccard on the same pair is diluted far below any dedup threshold.
    val j = Dedup.ngramJaccard(Seq((1L, 2L)).toDF("id_a", "id_b"),
      docs, "doc_id", "text", shingleK = 5).head().getAs[Double]("jaccard")
    assert(j < 0.3, s"jaccard should be diluted: $j")
  }

  test("minhash pairs agree with exact n-gram jaccard") {
    val docs = spark.read.parquet(s"$sfd/documents.parquet").limit(100)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.6).limit(20)
    val checked = Dedup.ngramJaccard(pairs.select("id_a", "id_b"), docs, "doc_id", "text")
    val joined = pairs.alias("p").join(checked.alias("c"), Seq("id_a", "id_b"))
      .select(col("p.jaccard").as("j1"), col("c.jaccard").as("j2")).collect()
    joined.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("connected components: chains, strings, multi-round convergence, cluster dedup") {
    // A 10-node path in adversarial id order (each edge links a high id to
    // a lower one far away) needs several large/small-star rounds.
    val path = (0 until 9).map(i => (i.toLong, i.toLong + 1L))
    val pairs = (path ++ Seq((20L, 21L), (21L, 22L), (30L, 30L)))
      .toDF("id_a", "id_b")
    // localEdgeLimit=0: the adversarial chain must converge on the
    // DISTRIBUTED large/small-star path (the local gate would hide it)
    val cc = Dedup.connectedComponents(pairs, localEdgeLimit = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 9L).forall(cc(_) == 0L), s"path component wrong: $cc")
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L))
    assert(!cc.contains(30L), "self-loop node must not appear")
    val ccLocal = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccLocal == cc, "driver union-find path disagrees with distributed")

    // String ids: min is lexicographic.
    val scc = Dedup.connectedComponents(
      Seq(("b", "c"), ("c", "a"), ("x", "y")).toDF("id_a", "id_b")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(scc == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))

    // End-to-end fuzzy dedup: three transitive near-copies collapse to the
    // minimum id; unrelated docs survive.
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    val docs = Seq(
      (1L, base), (2L, base.replace("tonight", "tomorrow")),
      (3L, base.replace("quick", "swift")),
      (9L, "completely different content about oceans and tides and the moon above"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text", threshold = 0.6,
      wordGrams = Some(2)).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 9L), s"expected canonical 1 and unrelated 9, got ${kept.toSeq}")
  }

  test("sequence packing: contiguous offsets, boundary straddle, layout-independent") {
    val docs = Seq(
      (1L, Seq.fill(300)("tok").mkString(" ")),   // [0, 300)    pack 0
      (2L, Seq.fill(300)("tok").mkString(" ")),   // [300, 600)  packs 0-1 (straddles 512)
      (3L, Seq.fill(100)("tok").mkString(" ")),   // [600, 700)  pack 1
      (4L, ""),                                   // 0 tokens at 700, pack 1
      (5L, Seq.fill(500)("tok").mkString(" ")))   // [700, 1200) packs 1-2
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextOps.packSequences(df, "doc_id", "text", ctxLen = 512)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toSeq
    val expected = Seq(
      (1L, 300L, 0L, 0L, 0L), (2L, 300L, 300L, 0L, 1L), (3L, 100L, 600L, 1L, 1L),
      (4L, 0L, 700L, 1L, 1L), (5L, 500L, 700L, 1L, 2L))
    assert(run(docs) == expected)
    // identical packing regardless of input partitioning
    assert(run(docs.repartition(7)) == expected)
    assert(run(docs.coalesce(1)) == expected)
  }

  test("SQL function registration: kernels callable from pure SQL") {
    Graft.registerFunctions(spark)
    Seq((1L, "Hello  World", Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, "hello world", Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0)))
      .toDF("id", "text", "a", "b").createOrReplaceTempView("fx")
    val rows = spark.sql("""
      SELECT id, graft_dot(a, b) AS dot, graft_fingerprint(text) AS fp,
             graft_simhash(text) AS sh, graft_lang(text) AS lang,
             graft_hash_bucket(id, 10) AS bucket
      FROM fx""").collect().sortBy(_.getLong(0))
    assert(rows(0).getAs[Double]("dot") == 32.0)
    assert(rows(1).getAs[Double]("dot") == 0.0)
    // same normalized content -> same fingerprint; matches the Column API
    assert(rows(0).getAs[String]("fp") == rows(1).getAs[String]("fp"))
    val apiFp = Seq(("Hello  World")).toDF("text")
      .select(TextOps.fingerprint(col("text"))).head.getString(0)
    assert(rows(0).getAs[String]("fp") == apiFp)
    assert(rows(0).getAs[Long]("sh") == rows(1).getAs[Long]("sh"))
    // bucket is INT — the same type TextOps.hashBucket returns (no drift)
    rows.foreach(r => assert(r.getAs[Int]("bucket") >= 0 && r.getAs[Int]("bucket") < 10))
    // arity misuse fails analysis, not execution
    intercept[Exception](spark.sql("SELECT graft_dot(a) FROM fx").collect())

    // curation primitives: SQL ≡ Column API, incl. the shard contract
    val cur = spark.sql("""
      SELECT id, graft_token_count(text) AS tc, graft_quality(text) AS q,
             graft_shard(id, 42, 8) AS sh
      FROM fx""").collect().sortBy(_.getLong(0))
    assert(cur(0).getAs[Long]("tc") == 2L)
    assert(cur(0).getAs[String]("q") == "too_short")
    val apiShard = Seq(1L, 2L).toDF("id")
      .select(TextOps.shardOf(col("id"), lit(42L), lit(8)).as("sh"))
      .collect().map(_.getInt(0))
    assert(cur.map(_.getAs[Int]("sh")).toSeq == apiShard.toSeq,
      "graft_shard must match TextOps.shardOf / shuffleShards")
    // nShards <= 0 fails fast with the operator's message, not a
    // mid-job DIVIDE_BY_ZERO / silent NULL
    val bad = intercept[Exception](
      spark.sql("SELECT graft_shard(id, 42, 0) FROM fx").collect())
    assert(bad.getMessage.contains("nShards must be positive") ||
      Option(bad.getCause).exists(_.getMessage.contains("nShards must be positive")))
  }

  test("training hand-off: shuffled shards persist in order through partitioned catalog writes") {
    import graft.catalog._
    import graft.model._
    // The last mile: shuffleShards' assignment materialized as a
    // shard-partitioned catalog table whose compacted files are sorted by
    // the shuffle position — a trainer streams each shard's files
    // sequentially and sees exactly the deterministic shuffle order, and
    // a per-shard reader plans only its own partition's files.
    val docs = spark.read.parquet(s"$sfd/documents.parquet").select("doc_id", "text")
    val sharded = docs.join(
      TextOps.shuffleShards(docs, "doc_id", seed = 42L, nShards = 4), Seq("doc_id"))
    val cat = new GraftCatalog(spark, tmpDir("graft-handoff"))
    cat.createTable("ns.shards", sharded.schema,
      partitionScheme = PartitionScheme(Seq(PartitionKey("shard"))))
    // the shuffleShards scaladoc's map-side recipe: co-locate each shard,
    // sort within it; the catalog's append write (partitionBy, no
    // shuffle) preserves task order into the shard files
    cat.writeToTable(
      sharded.repartition(4, col("shard")).sortWithinPartitions("position"),
      "ns.shards", WriteMode.Add)
    // partition pruning: a per-shard read plans only that shard's files
    val all = cat.readTable("ns.shards")
    val one = cat.readTable("ns.shards",
      ReadOptions(partitionValues = Some(Map("shard" -> "2"))))
    assert(one.inputFiles.nonEmpty &&
      one.inputFiles.forall(_.contains("_g_p_shard_identity=2")))
    assert(one.inputFiles.length < all.inputFiles.length)
    // in-file order = shuffle order: position is sorted within every file
    val perFile = cat.readTable("ns.shards", ReadOptions(withFilePath = true))
      .select(col("_file_path").as("f"), col("shard"), col("position"))
      .collect().groupBy(_.getString(0))
    assert(perFile.nonEmpty)
    perFile.foreach { case (f, rows) =>
      assert(rows.map(_.getInt(1)).distinct.length == 1, s"$f mixes shards")
      val pos = rows.map(_.getLong(2)).toSeq
      assert(pos == pos.sorted, s"$f not in shuffle order")
    }
    // round trip preserves the full assignment
    assert(all.count() == docs.count())
  }

  test("decontamination: planted benchmark n-gram flags the training doc") {
    val bench = Seq((100L, "what is the capital of france paris is the answer"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "today we ask what is the capital of france and other questions"),
      (2L, "entirely unrelated training text about gardening and soil quality"))
      .toDF("doc_id", "text")
    val out = TextOps.contaminationStats(train, bench, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L)._3, "doc sharing a 5-gram must be flagged")
    assert(out(1L)._2 >= 1L && out(1L)._2 < out(1L)._1)
    assert(out(2L) == ((out(2L)._1, 0L, false)))
    // the benchmark side broadcasts: no shuffle of the training grams
    val plan = TextOps.contaminationStats(train, bench, "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark gram set should broadcast:\n$plan")
  }

  test("connected components: random graphs match an in-memory union-find") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(20 + rnd.nextInt(60))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // reference: plain union-find over the same edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => if (a != b) parent(find(a)) = find(b) }
      val nodes = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.groupBy(find).flatMap { case (_, members) =>
        val root = members.min; members.map(_ -> root)
      }.toMap
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial mismatch (n=$n, ${edges.length} edges)")
      // localEdgeLimit=0 forces the distributed large/small-star path — it
      // must agree with the driver union-find exactly
      val dist = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
        localEdgeLimit = 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == expected, s"trial $trial distributed mismatch")
    }
  }

  test("exact substring dedup: cross-doc and within-doc spans, interval union") {
    val docs = Seq(
      (1L, "a b c d e f"),            // shares "a b c","b c d" with doc 2
      (2L, "x y a b c d z"),
      (3L, "unique tokens only here now"),
      (4L, "p q r s p q r t"),        // "p q r" repeats WITHIN the doc
      (5L, "ab"))                     // shorter than k: no windows, 0 dup
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpanStats(docs, "doc_id", "text", k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((6L, 4L, 4.0 / 6)), s"doc1: ${got(1L)}")   // union [1,4]
    assert(got(2L) == ((7L, 4L, 4.0 / 7)), s"doc2: ${got(2L)}")   // union [3,6]
    assert(got(3L) == ((5L, 0L, 0.0)))
    assert(got(4L) == ((8L, 6L, 6.0 / 8)), s"doc4: ${got(4L)}")   // [1,3]+[5,7]
    assert(got(5L) == ((1L, 0L, 0.0)))
  }

  test("line dedup: boilerplate lines removed everywhere, order preserved") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nunique alpha line\nshared footer\nmore alpha"),
      (2L, "cookie banner \nunique beta line\nshared footer"),
      (3L, "Cookie Banner\nunique gamma line\nshared footer"),
      (4L, "totally unrelated\ndocument four"))
      .toDF("doc_id", "text")
    val out = TextOps.dedupLines(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // "cookie banner" (normalized) and "shared footer" occur in 3 docs → dropped.
    assert(out(1L) == ((4L, 2L, "unique alpha line\nmore alpha")))
    assert(out(2L) == ((3L, 1L, "unique beta line")))
    assert(out(3L) == ((3L, 1L, "unique gamma line")))
    assert(out(4L) == ((2L, 2L, "totally unrelated\ndocument four")))
  }

  test("simhash: identical docs give hamming 0; no cross join") {
    val docs = Seq((1L, "spark shuffles data across the cluster"),
      (2L, "spark shuffles data across the cluster"),
      (3L, "completely different content with other words entirely")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text")
    assertNoCartesian(pairs)
    val p = pairs.collect()
    assert(p.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getAs[Int]("hamming") == 0))
  }

  test("simhash hot-bucket cap bounds a planted mega-cluster's candidates") {
    // 500 identical docs: every 16-bit chunk bucket has width ≥ 500, so the
    // uncapped join would emit 500·499/2 pairs from this cluster alone. A
    // distinct near-pair must survive the cap (its buckets stay narrow).
    val boiler = (1L to 500L).map(i => (i, "the same legal boilerplate footer text repeated everywhere"))
    // Identical text (Hamming 0) guarantees a pair; its buckets have width 2.
    val pair = Seq((9001L, "a genuinely unique document about distributed query engines"),
      (9002L, "a genuinely unique document about distributed query engines"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(docs, "doc_id", "text", maxBucketWidth = Some(10))
    val rows = capped.collect()
    assert(rows.length <= 10 * 4, s"cap did not bound candidates: ${rows.length}")
    assert(rows.exists(r => r.getLong(0) == 9001L && r.getLong(1) == 9002L),
      "narrow-bucket near-pair lost under the cap")
    assert(!rows.exists(r => r.getLong(0) <= 500L && r.getLong(1) <= 500L),
      "mega-cluster pairs should be dropped by the cap")
    // Uncapped stays exhaustive: the mega-cluster emits all its pairs.
    val uncapped = Dedup.simhashPairs(docs.where($"doc_id" <= 50), "doc_id", "text")
    assert(uncapped.count() == 50L * 49 / 2)
  }

  test("pair generators: capped aggregation path ≡ uncapped self-join path when no bucket exceeds the cap") {
    // Round-12: the width-capped generators switched from a bucket
    // SELF-join to an exchange-free bounded aggregation (groupBy +
    // array_sort(collect_list)); the uncapped path keeps the join. A cap
    // no bucket reaches must therefore change NOTHING — same pair sets,
    // both orientations and scores — for minhash AND simhash, on a corpus
    // with planted near-dups and unrelated filler.
    val docs = ((1L to 60L).map(i =>
      (i, s"completely unrelated filler document number $i about topic ${i % 7} " +
        s"with extra words ${i * 31} and ${i * 17}")) ++ Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (102L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (103L, "an entirely different pair of texts that match each other very closely indeed"),
      (104L, "an entirely different pair of texts that match each other very closely indeed")))
      .toDF("doc_id", "text")
    def key(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val mhCap = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5,
      wordGrams = Some(2), maxBucketWidth = Some(1000))
    val mhJoin = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5,
      wordGrams = Some(2), maxBucketWidth = None)
    assert(key(mhCap.select("id_a", "id_b").collect()) ==
      key(mhJoin.select("id_a", "id_b").collect()),
      "minhash: aggregation-path pairs diverged from self-join pairs")
    assert(key(mhCap.select("id_a", "id_b").collect()).contains((101L, 102L)))
    val shCap = Dedup.simhashPairs(docs, "doc_id", "text", maxBucketWidth = Some(1000))
    val shJoin = Dedup.simhashPairs(docs, "doc_id", "text", maxBucketWidth = None)
    assert(key(shCap.select("id_a", "id_b").collect()) ==
      key(shJoin.select("id_a", "id_b").collect()),
      "simhash: aggregation-path pairs diverged from self-join pairs")
    assert(key(shCap.select("id_a", "id_b").collect()).contains((103L, 104L)))
  }

  test("LSH ANN recall vs brute force; candidate generation is an equi-join") {
    val emb = spark.read.parquet(s"$sfd/embeddings.parquet")
    val queries = emb.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5)
    assertNoCartesian(approx)
    val got = approx.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall below 0.5")
  }

  test("IVF ANN with trained codebook: recall vs brute force; equi-join candidates") {
    val emb = spark.read.parquet(s"$sfd/embeddings.parquet")
    val queries = emb.where($"vec_id" < 10)
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 3)
    assert(cents.length == 8 && cents.forall(_.length == 64))
    // Lloyd refinement must actually move the codebook off its init.
    val init = Similarity.trainCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 0)
    assert(cents.zip(init).exists { case (a, b) => !a.sameElements(b) })
    val approx = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5, cents, nprobe = 4)
    assertNoCartesian(approx)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = approx.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall below 0.5")
    // Sampled training (the 100 TB shape: each Lloyd's round scans the
    // sample, not the corpus) is deterministic across invocations and
    // still yields a full, usable codebook.
    val s1 = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nlist = 8, iters = 2, trainFraction = 0.5)
    val s2 = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nlist = 8, iters = 2, trainFraction = 0.5)
    assert(s1.length == 8 && s1.forall(_.length == 64))
    assert(s1.zip(s2).forall { case (a, b) => a.sameElements(b) },
      "sampled training must be rerun-deterministic")
    val sApprox = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5, s1, nprobe = 4)
    val sGot = sApprox.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((exact & sGot).size.toDouble / exact.size >= 0.5,
      "sample-trained codebook recall below 0.5")
  }

  test("embedding near-dup pairs find a planted duplicate vector; no cross join") {
    val emb = spark.read.parquet(s"$sfd/embeddings.parquet")
    // Plant an exact duplicate of vec_id 0 under a new id.
    val dup = emb.where($"vec_id" === 0).withColumn("vec_id", lit(9999L))
    val pairs = Similarity.embeddingNearDupPairs(emb.unionByName(dup),
      "vec_id", "embedding", threshold = 0.99)
    assertNoCartesian(pairs)
    val found = pairs.where($"id_a" === 0L && $"id_b" === 9999L).collect()
    assert(found.length == 1, "planted duplicate embedding not found")
    assert(found.head.getAs[Double]("cos") >= 0.999999)
  }

  test("DotProduct expression: codegen and interpreted agree with the HOF form") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.5), Array(2.0, 2.0)),
      (Array.empty[Double], Array.empty[Double])).toDF("a", "b")
    val hof = df.select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)).collect().map(_.getDouble(0))
    val expr = df.select(graft.functions.DotProduct($"a", $"b")).collect().map(_.getDouble(0))
    assert(expr.toSeq == hof.toSeq)
    assert(expr.toSeq == Seq(32.0, -2.0, 0.0))
    // Null input (either side) gives null output; the codegen path is the
    // one the planner actually uses inside whole-stage codegen.
    val withNull = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(withNull.select(graft.functions.DotProduct($"a", $"b")).collect().head.isNullAt(0))
    // Null ELEMENTS propagate to a null product — same as the HOF form
    // (x*null => null => null sum), not silently treated as zero.
    val nullElem = Seq((Seq(Some(1.0), None), Seq(Some(2.0), Some(3.0)))).toDF("a", "b")
      .select($"a".cast("array<double>").as("a"), $"b".cast("array<double>").as("b"))
    assert(nullElem.select(graft.functions.DotProduct($"a", $"b")).collect().head.isNullAt(0))
  }

  test("semantic dedup: cluster-blocked pairs find a planted duplicate; anti-join keeps canonical") {
    val emb = spark.read.parquet(s"$sfd/embeddings.parquet")
    // Plant an exact duplicate of vec_id 0 under a new id: nearest-centroid
    // assignment MUST route both copies to the same cluster (identical
    // vectors score identically), so blocking cannot lose the pair.
    val dup = emb.where($"vec_id" === 0).withColumn("vec_id", lit(9999L))
    val corpus = emb.unionByName(dup)
    val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding", nlist = 8, iters = 2)
    val pairs = Similarity.semanticNearDupPairs(corpus, "vec_id", "embedding",
      threshold = 0.99, centroids = cents)
    assertNoCartesian(pairs)
    val found = pairs.where($"id_a" === 0L && $"id_b" === 9999L).collect()
    assert(found.length == 1, "planted duplicate not found by cluster-blocked dedup")
    assert(found.head.getAs[Double]("cos") >= 0.999999)
    val kept = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.99, centroids = cents)
    val keptIds = kept.select("vec_id").as[Long].collect().toSet
    assert(keptIds.contains(0L) && !keptIds.contains(9999L),
      "canonical (minimum) id must survive; the planted copy must be dropped")
  }

  test("repetition stats: degenerate looping text scores high, varied text low") {
    val df = Seq(
      (1L, "spam spam spam spam"),          // all dup words; "spam spam" covers all 2-grams
      (2L, "one two three four"),           // no repetition
      (3L, "a b a b a b"),                  // alternating: words dup, 2-grams dup
      (4L, "")).toDF("doc_id", "text")      // empty: all fractions 0
    val got = TextOps.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("dup_word_frac") == 0.75)    // 4 words, 1 distinct
    assert(got(1L).getAs[Double]("max_2gram_frac") == 1.0)    // every 2-gram = "spam spam"
    assert(got(2L).getAs[Double]("dup_word_frac") == 0.0)
    assert(got(2L).getAs[Double]("dup_3gram_frac") == 0.0)
    assert(got(2L).getAs[Double]("max_2gram_frac") == math.round(1.0 / 3 * 1e9) / 1e9)
    assert(got(3L).getAs[Double]("dup_2gram_frac") == 0.6)    // 5 2-grams, 2 distinct
    assert(got(4L).getAs[Long]("n_tokens") == 0L)
    assert(got(4L).getAs[Double]("max_2gram_frac") == 0.0)
  }

  test("text stats: language id and quality buckets are deterministic") {
    val df = Seq(
      (1L, "the cat is on the mat and the dog is of the house"),
      (2L, "le chat et la maison des amis les arbres"),
      (3L, "xyz qqq zzz")).toDF("doc_id", "text")
    val stats = TextOps.textStats(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(stats(1L).getAs[String]("pred_lang") == "en")
    assert(stats(2L).getAs[String]("pred_lang") == "fr")
    assert(stats(3L).getAs[String]("pred_lang") == "und")
    assert(stats(3L).getAs[String]("quality") == "too_short")
    assert(stats(1L).getAs[String]("quality") == "ok")
    assert(stats(1L).getAs[Long]("n_tokens") == 13L)
  }

  test("PII redaction: planted emails/IPs/phones are counted and scrubbed") {
    val df = Seq(
      (1L, "contact alice@example.com or bob.smith+x@corp.co.uk today"),
      (2L, "server at 10.0.42.7 rebooted; peer 192.168.1.255 timed out"),
      (3L, "call +1 (555) 123-4567 now"),
      (4L, "nothing sensitive here at all"),
      (5L, "mixed: c@d.io from 8.8.8.8, dial +44 20 7946 0958")
    ).toDF("doc_id", "text")
    val out = TextOps.redactPii(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_email") == 2 && out(1L).getAs[Long]("n_ipv4") == 0)
    assert(out(1L).getAs[String]("redacted") == "contact <EMAIL> or <EMAIL> today")
    assert(out(2L).getAs[Long]("n_ipv4") == 2)
    assert(out(2L).getAs[String]("redacted") == "server at <IP> rebooted; peer <IP> timed out")
    assert(out(3L).getAs[Long]("n_phone") == 1)
    assert(out(3L).getAs[String]("redacted") == "call <PHONE> now")
    assert(out(4L).getAs[String]("redacted") == "nothing sensitive here at all")
    assert(out(5L).getAs[Long]("n_email") == 1 && out(5L).getAs[Long]("n_ipv4") == 1 &&
      out(5L).getAs[Long]("n_phone") == 1)
    assert(out(5L).getAs[String]("redacted") == "mixed: <EMAIL> from <IP>, dial <PHONE>")
  }

  test("deterministic sampling: stable across runs, ~fraction kept, strata honored") {
    val df = spark.range(0, 10000).toDF("id")
    val s1 = TextOps.deterministicSample(df, "id", 0.1).collect().map(_.getLong(0)).sorted
    val s2 = TextOps.deterministicSample(df.repartition(7), "id", 0.1)
      .collect().map(_.getLong(0)).sorted
    assert(s1.toSeq == s2.toSeq, "sample must be identical across partitionings")
    assert(math.abs(s1.length - 1000) < 120, s"10% of 10k should keep ~1000, got ${s1.length}")
    // Fraction 0 and 1 are exact.
    assert(TextOps.deterministicSample(df, "id", 0.0).count() == 0)
    assert(TextOps.deterministicSample(df, "id", 1.0).count() == 10000)
    // Nested samples: a 5% sample is a subset of the 10% sample (same hash).
    val s05 = TextOps.deterministicSample(df, "id", 0.05).collect().map(_.getLong(0)).toSet
    assert(s05.subsetOf(s1.toSet), "smaller fraction must nest inside larger")

    val strat = spark.range(0, 6000)
      .selectExpr("id", "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'fr' ELSE 'de' END AS lang")
    val kept = TextOps.stratifiedSample(strat, "id", "lang", Map("en" -> 0.05, "fr" -> 1.0))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("fr") == 2000L, s"fr keeps all: $kept")
    assert(!kept.contains("de"), s"de keeps none (default 0): $kept")
    assert(kept("en") < 300L, s"en keeps ~5%: $kept")
  }

  test("multimodal decode stub: deterministic features, distributed shape") {
    val docs = spark.read.parquet(s"$sfd/documents.parquet").limit(50)
    val media = Multimodal.withPayload(docs, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.decodeStub(spark, media).collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      assert(f.head_md5.length == 32)
      assert(f.fake_width == 16 + (f.n_bytes % 64).toInt)
      assert(f.fake_height == f.fake_width / 2)
    }
  }

  test("multimodal real codecs: image decode/resize via ImageIO, wav PCM parse") {
    import spark.implicits._
    // a 64×32 half-black/half-white png: mean luma must be ~127/128
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, png(64, 32), "image/png", 0L),
      Multimodal.MediaRow(2L, png(100, 40), "image/png", 0L),
      Multimodal.MediaRow(3L, "not an image".getBytes, "image/png", 0L)).toDF()

    val feats = Multimodal.decodeImages(spark, media).collect().sortBy(_.doc_id)
    assert(feats.length == 2, "undecodable row dropped in lenient mode")
    assert(feats(0).width == 64 && feats(0).height == 32 && feats(0).format == "png")
    assert(math.abs(feats(0).mean_gray - 127) <= 1)
    intercept[org.apache.spark.SparkException](
      Multimodal.decodeImages(spark, media, strict = true).collect())

    // resize: 100×40 → maxDim 50 → 50×20; smaller image untouched (no upscale)
    val resized = Multimodal.resizeImages(spark, media, 50).collect().sortBy(_.doc_id)
    assert(resized.map(r => (r.doc_id, r.width, r.height)).toSeq ==
      Seq((1L, 50, 25), (2L, 50, 20)))
    // outputs are real PNGs that decode again
    val again = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(1).payload))
    assert(again.getWidth == 50 && again.getHeight == 20)

    // wav: constant 16-bit amplitude 16384 → rms exactly 0.5
    val n = 8000
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + n * 2).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(n * 2)
    (0 until n).foreach(_ => bb.putShort(16384))
    val wav = Multimodal.parseWav(7L, bb.array())
    assert(wav.channels == 1 && wav.sample_rate == 8000 && wav.bits_per_sample == 16)
    assert(wav.n_frames == 8000L && wav.duration_ms == 1000L)
    assert(math.abs(wav.rms - 0.5) < 1e-12)
  }

  test("chunkDocuments: stride windows with overlap, tails kept, empty docs dropped") {
    import spark.implicits._
    val toks = (1 to 70).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, toks), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(docs, "doc_id", "text", chunkTokens = 40, overlapTokens = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // doc 1: 70 tokens, stride 30 -> starts 0, 30, 60 -> 3 chunks
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._4).toSeq == Seq(40, 40, 10))
    assert(d1(0)._3.startsWith("w1 ") && d1(1)._3.startsWith("w31 ") && d1(2)._3 == (61 to 70).map("w" + _).mkString(" "))
    // overlap: chunk 0's last 10 tokens == chunk 1's first 10
    assert(d1(0)._3.split(" ").takeRight(10).toSeq == d1(1)._3.split(" ").take(10).toSeq)
    // doc 2 shorter than one window -> single tail chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b c", 3)))
    // empty doc emits nothing
    assert(!out.exists(_._1 == 3L))
    // map-only: no key shuffle or aggregation (Par.widen's round-robin
    // widening of a tiny local input is the only permissible exchange)
    val plan = TextOps.chunkDocuments(docs, "doc_id", "text", 40, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning") && !plan.contains("Aggregate") &&
      !plan.contains("Join"), "chunking must stay map-only")
  }

  test("composite curation pipeline (t40): stage containment and removal accounting") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfd/documents.parquet")
    val corpus = docs.where(col("doc_id") >= 50)
    val ok = corpus.where(TextOps.qualityBucket(col("text")) === "ok")
    val deduped = Dedup.dropExactDuplicates(ok, "doc_id", "text")
    val pairs = Dedup.minhashPairs(deduped, "doc_id", "text",
      bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
      maxBucketWidth = Some(64)).select("id_a", "id_b").collect()
    val survivors = graft.SparkEntry.queries("t40_curation_pipeline")(spark, sfd)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // containment: each stage only removes
    val nCorpus = corpus.count(); val nOk = ok.count(); val nDedup = deduped.count()
    assert(nOk <= nCorpus && nDedup <= nOk && survivors.size <= nDedup)
    assert(survivors.nonEmpty, "pipeline must not drain the corpus at sf0.001")
    val dedupIds = deduped.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(dedupIds))

    // near-dup policy: every surviving doc that is the LARGER member of a
    // verified pair would contradict drop-the-larger; every dropped
    // near-dup has a smaller partner that the pair set explains
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, s"pair not ordered: ($a,$b)")
      assert(!survivors.contains(b), s"near-dup $b (pair with $a) survived")
    }
  }

  test("span removal (t41): canonical copy survives, non-canonical spans cut") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // micro corpus: docs 1 and 2 share the 8-token run "a b c d e f g h";
    // doc 1 holds the (id,start)-minimum occurrence and must keep it.
    val docs = Seq(
      (1L, "a b c d e f g h x y"),
      (2L, "z w a b c d e f g h"),
      (3L, "entirely unrelated words that never repeat anywhere at all")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a b c d e f g h x y", 10L, 0L)))
    assert(out(2L) == (("z w", 10L, 8L)))
    assert(out(3L)._3 == 0L)

    // corpus-level invariants at sf: reconstruction accounting is exact and
    // removal coverage is a subset of t20's duplicated-window coverage
    val sf = spark.read.parquet(s"$sfd/documents.parquet")
    val rem = Dedup.removeDuplicateSpans(sf, "doc_id", "text", k = 8)
    val stats = Dedup.duplicateSpanStats(sf, "doc_id", "text", k = 8)
    val joined = rem.join(stats.withColumnRenamed("n_tokens", "nt2"), "doc_id")
      .select(col("removed_tokens"), col("dup_tokens"),
        (col("n_tokens") - size(TextOps.tokens(col("clean_text")))).as("acct"),
        col("removed_tokens").as("rt"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(0) <= r.getLong(1), "removal exceeded duplicated coverage")
      assert(r.getLong(2) == r.getLong(3), "token accounting mismatch")
    }
    assert(joined.map(_.getLong(0)).sum > 0, "synthetic corpus must trigger removal")
  }

  test("retention-policy near-dup dedup (t42): longest member survives each cluster") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfd/documents.parquet")
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text",
      bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
      maxBucketWidth = Some(64))
      .join(docs.select(col("doc_id").as("id"), col("n_chars")), Seq("id"))
      .collect().groupBy(_.getAs[Long]("component"))
    assert(clusters.nonEmpty, "corpus must contain near-dup clusters")
    val survivors = Dedup.dropNearDuplicatesKeeping(docs, "doc_id", "text",
      keepBy = col("n_chars"),
      bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
      maxBucketWidth = Some(64))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    clusters.values.foreach { members =>
      val winner = members.minBy(r => (-r.getAs[Long]("n_chars"), r.getAs[Long]("id")))
      members.foreach { m =>
        val id = m.getAs[Long]("id")
        assert(survivors.contains(id) == (id == winner.getAs[Long]("id")),
          s"cluster ${members.map(_.getAs[Long]("id")).toSeq}: wrong survivor $id")
      }
    }
    // unclustered docs all survive
    val clustered = clusters.values.flatten.map(_.getAs[Long]("id")).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((all -- clustered).subsetOf(survivors))
  }

  test("corpus divergence (t43): non-negativity, symmetry, identity of indiscernibles") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfd/documents.parquet")
    val p = docs.where(col("doc_id") >= 50)
    val q = docs.where(col("doc_id") < 50)
    val r = Selection.corpusDivergence(p, q, "doc_id", "text").collect()(0)
    val (klPq, klQp, jsd) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(klPq > 0 && klQp > 0, "distinct splits must diverge")
    assert(jsd > 0 && jsd <= math.log(2) + 1e-9, "JSD bounded by ln 2")
    val rev = Selection.corpusDivergence(q, p, "doc_id", "text").collect()(0)
    assert(rev.getDouble(0) == klQp && rev.getDouble(1) == klPq)
    assert(rev.getDouble(2) == jsd, "JSD must be symmetric")
    val self = Selection.corpusDivergence(p, p, "doc_id", "text").collect()(0)
    assert(self.getDouble(0) == 0.0 && self.getDouble(2) == 0.0)
  }

  test("corpus shuffle (t44): partition of the corpus, dense positions, seed sensitivity") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfd/documents.parquet")
    val n = docs.count()
    val s1 = TextOps.shuffleShards(docs, "doc_id", seed = 42L, nShards = 8)
    val rows = s1.collect()
    assert(rows.length == n, "every document lands in exactly one shard")
    assert(rows.map(_.getLong(0)).distinct.length == n)
    // dense 1..size positions per shard
    rows.groupBy(_.getInt(1)).foreach { case (_, ms) =>
      assert(ms.map(_.getLong(2)).sorted.toSeq == (1L to ms.length).toSeq)
    }
    // deterministic: same seed reproduces bit-identically; different seed re-deals
    val again = TextOps.shuffleShards(docs, "doc_id", seed = 42L, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
    val other = TextOps.shuffleShards(docs, "doc_id", seed = 7L, nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val moved = rows.count(r => other(r.getLong(0)) != r.getInt(1))
    assert(moved > n / 2, "a new seed must re-deal most shard assignments")
    // shuffle decorrelates ingest order: within a shard, consecutive
    // positions should not be consecutive doc_ids (allow a tiny accident)
    val adjacent = rows.groupBy(_.getInt(1)).values.map { ms =>
      val byPos = ms.sortBy(_.getLong(2)).map(_.getLong(0))
      byPos.sliding(2).count { case Array(a, b) => b == a + 1; case _ => false }
    }.sum
    assert(adjacent < n / 20, s"shuffled order still tracks ingest order ($adjacent adjacent)")
  }

  test("group centroids (t45): exact means, dimension order, group coverage") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tiny = Seq((0, Array(1.0f, 3.0f)), (0, Array(3.0f, 5.0f)),
      (1, Array(2.0f, -2.0f))).toDF("label", "embedding")
    val c = Similarity.groupCentroids(tiny, "embedding", Seq("label")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(c(0) == Seq(2.0, 4.0) && c(1) == Seq(2.0, -2.0))
    val emb = spark.read.parquet(s"$sfd/embeddings.parquet")
    val cs = Similarity.groupCentroids(emb, "embedding", Seq("label"))
    assert(cs.count() == emb.select("label").distinct().count())
    assert(cs.select(size(col("centroid"))).distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(64), "dims assemble in order, none lost")
    // a poisoned component propagates NaN for ITS dim only (never a
    // silently biased mean), and user columns named i/x/m don't collide
    val poisoned = Seq((0, Array(Float.NaN, 2.0f)), (0, Array(2.0f, 4.0f)))
      .toDF("i", "embedding")
    val pc = Similarity.groupCentroids(poisoned, "embedding", Seq("i"))
      .collect()(0).getSeq[Double](1)
    assert(pc(0).isNaN, s"NaN component must poison its dim, got ${pc(0)}")
    assert(pc(1) == 3.0, s"clean dim must stay exact, got ${pc(1)}")
  }

  test("gopher filter (t47): each rule fires with its reason, precedence holds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 200 words, letters, TWO distinct stopwords (the rule needs >= 2 distinct)
    val fifty = (1 to 50).map(i => s"the word$i and word${i}b").mkString(" ")
    val docs = Seq(
      (1L, fifty),                                             // passes all rules
      (2L, "short doc"),                                       // word_count
      (3L, (1 to 60).map(_ => "ab").mkString(" ")),            // mean_word_length (2.0)
      (4L, (1 to 60).map(_ => "#### word").mkString(" ")),     // symbol_ratio
      (5L, (1 to 60).map(_ => "123 456").mkString(" ")),       // alpha_fraction
      (6L, (1 to 60).map(i => s"the word$i").mkString(" ")) // stopwords: only ONE distinct
    ).toDF("doc_id", "text")
    val withNull = docs.unionByName(Seq((8L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val got = TextOps.gopherFilter(withNull, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(got(1L) == ((true, None)))
    assert(got(2L) == ((false, Some("word_count"))))
    assert(got(3L) == ((false, Some("mean_word_length"))))
    assert(got(4L) == ((false, Some("symbol_ratio"))))
    assert(got(5L) == ((false, Some("alpha_fraction"))))
    assert(got(6L) == ((false, Some("stopwords"))), "one DISTINCT stopword is not enough")
    assert(got(8L) == ((false, Some("word_count"))), "null text must fail closed")
    // precedence: a doc failing several rules reports the FIRST
    val multi = Seq((7L, "### 123")).toDF("doc_id", "text") // fails everything
    assert(TextOps.gopherFilter(multi, "doc_id", "text").collect()(0)
      .getString(2) == "word_count")
  }

  test("massivetext filter (t48): repetition gates fire after quality, composite precedence") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 60 near-unique words with exactly two distinct stopwords: passes
    // the quality rules AND the word-level repetition gates
    val clean = "the and " + (1 to 58).map(i => s"word$i").mkString(" ")
    // a repeated PAIR amid unique filler: dup_word_frac stays under 0.30
    // while dup_2gram_frac crosses 0.20 — isolates the second gate
    val pairy = "the and " + (1 to 100).map(i => s"filler$i").mkString(" ") +
      " " + Seq.fill(20)("px py").mkString(" ")
    val docs = Seq(
      (1L, clean),                                               // keeps
      (2L, "short"),                                             // quality: word_count
      (3L, "the and " + Seq.fill(60)("loop").mkString(" ")),     // dup_word_frac
      (4L, pairy)                                                // dup_2gram_frac
    ).toDF("doc_id", "text")
    val got = TextOps.massiveTextFilter(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(got(1L) == ((true, None)))
    assert(got(2L) == ((false, Some("word_count"))), "quality reasons take precedence")
    assert(got(3L) == ((false, Some("dup_word_frac"))))
    assert(got(4L) == ((false, Some("dup_2gram_frac"))),
      s"repeated-pair doc must fail on the 2-gram gate specifically: ${got(4L)}")

    // WIRING cross-check: for every doc, the composite's reason equals the
    // first breached rule recomputed from repetitionStats' own numbers —
    // a copy-pasted column name or swapped threshold in any branch fails
    val stats = TextOps.repetitionStats(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val gopher = TextOps.gopherFilter(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val st = stats(id)
      val expected = gopher(id).orElse {
        if (st.getAs[Double]("dup_word_frac") > 0.30) Some("dup_word_frac")
        else if (st.getAs[Double]("dup_2gram_frac") > 0.20) Some("dup_2gram_frac")
        else if (st.getAs[Double]("dup_3gram_frac") > 0.18) Some("dup_3gram_frac")
        else if (st.getAs[Double]("max_2gram_frac") > 0.20) Some("max_2gram_frac")
        else None
      }
      assert(got(id)._2 == expected, s"doc $id: wired reason ${got(id)._2} != $expected")
    }

    // standalone repetitionFilter fails no-text closed (composite covers
    // it via word_count; alone it must not admit a null/empty doc)
    val rf = TextOps.repetitionFilter(
      Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, clean)).toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(rf(1L) == ((false, Some("no_text"))) && rf(2L) == ((false, Some("no_text"))))
    assert(rf(3L)._1, "clean doc passes the standalone repetition gate")
  }

  test("span removal property: engine equals the in-memory reference on random corpora") {
    import spark.implicits._
    // Straight-line reference implementation of the removeDuplicateSpans
    // contract: window strings (no hashing — md5 is injective here up to
    // astronomically unlikely collisions), per-window canonical (id, start)
    // minimum, coverage union, reconstruction.
    def model(docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long, Long)] = {
      val toks = docs.map { case (id, t) =>
        id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector
      }.filter(_._2.nonEmpty)
      val wins = for {
        (id, tk) <- toks if tk.length >= k
        s <- 1 to tk.length - k + 1
      } yield (id, s, tk.slice(s - 1, s - 1 + k).mkString(" "))
      val removed = wins.groupBy(_._3).values.filter(_.size >= 2)
        .flatMap(_.sortBy(o => (o._1, o._2)).drop(1)).toSeq
        .groupBy(_._1).map { case (id, os) => id -> os.map(_._2) }
      toks.map { case (id, tk) =>
        val cover = removed.getOrElse(id, Nil)
          .flatMap(s => s until s + k).toSet
        val keep = tk.zipWithIndex.collect {
          case (t, i) if !cover.contains(i + 1) => t }
        id -> ((keep.mkString(" "), tk.length.toLong,
          (tk.length - keep.length).toLong))
      }.toMap
    }
    val vocab = Vector("a", "b", "c", "d")
    (0 until 5).foreach { trial =>
      val rnd = new scala.util.Random(1000 + trial)
      // tiny vocab forces heavy window collisions incl. overlapping and
      // intra-document repeats — the interval-edge cases
      val docs = (1L to 8L).map { id =>
        id -> Vector.fill(rnd.nextInt(21))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val got = Dedup.removeDuplicateSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == model(docs, 3), s"trial $trial: engine diverged from model")
    }
  }

  test("semantic cross-table join (t46): contract vs brute force, no cross product, id-space safety") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sfd/embeddings.parquet")
    val left = emb.where(col("vec_id") < 50)   // bounded benchmark side
    val right = emb.where(col("vec_id") >= 50) // unbounded corpus side
    val joined = Similarity.embeddingJoin(left, right, "vec_id", "vec_id",
      "embedding", threshold = 0.42)
    assertNoCartesian(joined)
    val got = joined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // every returned pair is a true cross-split match above threshold
    got.foreach { case (l, r, c) =>
      assert(l < 50 && r >= 50 && c >= 0.42, s"bad pair ($l,$r,$c)") }
    assert(got.nonEmpty, "synthetic embeddings must produce cross-split matches")
    // candidate-contract check: pairs whose exact cosine clears the
    // threshold AND that share an LSH bucket are exactly the result —
    // replicate with the single-table op on a shifted-id union (shift
    // keeps the two sides' ids disjoint so a<b ordering splits cleanly)
    val shifted = right.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val viaSingle = Similarity.embeddingNearDupPairs(
      left.select("vec_id", "embedding").unionByName(shifted),
      "vec_id", "embedding", threshold = 0.42)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .collect { case (a, b, c) if b >= 1000000L && a < 1000000L => (a, b - 1000000L, c) }
      .toSet
    assert(got == viaSingle, s"cross-table join diverges from the single-table reference " +
      s"(${got.size} vs ${viaSingle.size})")
  }
}
