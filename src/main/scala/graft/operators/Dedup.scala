package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators for training-data pipelines.
 *
 * Scale design: every variant resolves candidates through an equi-join on a
 * derived key (content hash, LSH band bucket, SimHash chunk) — never an
 * all-pairs cross join. At 100 TB the band/bucket join shuffles only
 * same-bucket rows; the verify step re-joins the candidate PAIRS back to the
 * (id → features) table, which is a key-partitioned shuffle as well.
 *
 * ==Execution semantics==
 * The pair-producing operators (`minhashPairs`, `minhashJoin`,
 * `incrementalNearDupPairs`, `rareShinglePairs`,
 * `shingleContainmentPairs`, `simhashPairs`, `connectedComponents`) return
 * EAGERLY MATERIALIZED frames: the pair computation runs at call time (so
 * intermediate persisted shingle/signature frames can be freed
 * deterministically before returning, and self-joins downstream never
 * recompute the pipeline). The materialization is a reliable `checkpoint`
 * when `SparkContext.setCheckpointDir` is configured; otherwise it falls
 * back to `localCheckpoint`, whose blocks do NOT survive executor loss —
 * on a multi-executor cluster (dynamic allocation, spot nodes) set a
 * checkpoint directory before calling these operators.
 */
object Dedup {

  /** Exact duplicate groups by content fingerprint: one row per distinct
    * content with the canonical (minimum) id and the copy count. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.widen(df).groupBy(TextOps.fingerprint(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).cast(LongType).as("copies"))

  /** Keep exactly one row per distinct content (the minimum id wins). */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val canon = exactGroups(df, idCol, textCol)
      .select(col("canonical_id").as(idCol))
    df.join(canon, Seq(idCol), "left_semi")
  }

  /**
   * Incremental exact dedup: rows of `incoming` whose content fingerprint
   * does NOT already exist in `corpus` — the daily-ingest shape (dedupe a
   * small new batch against a 100 TB standing corpus).
   *
   * Scale design: a Bloom filter over the corpus fingerprints (one
   * distributed aggregate, compact enough to broadcast) prefilters the
   * incoming batch MAP-ONLY — rows the bloom rejects are definitely new and
   * never enter a join. Only bloom-positive rows (true matches + the FPP
   * sliver) are verified with an exact anti-join, so correctness never
   * depends on the bloom: the result is exactly `incoming ∖ corpus`, the
   * bloom only shrinks the join's left side. With a 1 % daily-new rate,
   * ~99 % of the anti-join's left side vanishes before the shuffle.
   *
   * `expectedCorpusItems` sizes the filter (bits ≈ -n·ln(fpp)/ln(2)²);
   * pass the corpus' approximate distinct count at 100 TB rather than
   * forcing a count job.
   */
  def incrementalNew(
      incoming: DataFrame, corpus: DataFrame, idCol: String, textCol: String,
      expectedCorpusItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graft.BloomKernel
    val fpOf = (d: DataFrame) =>
      d.select(col(idCol), TextOps.fingerprint(col(textCol)).as("_g_fp"))
    val corpusFp = fpOf(corpus).select("_g_fp")
    // bits = -n·ln(p)/ln(2)²; one distributed aggregate, sketch to driver.
    // BloomFilterAggregate CLAMPS items/bits to the runtime-filter conf
    // maxima (4M items / 64M bits by default) — silently saturating the
    // filter at corpus scale — so raise the caps for this aggregate and
    // restore them after.
    val numBits = math.max(64L,
      (-expectedCorpusItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val spark = incoming.sparkSession
    import org.apache.spark.sql.internal.SQLConf
    val itemsKey = SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS.key
    val bitsKey = SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS.key
    val (prevItems, prevBits) = (spark.conf.get(itemsKey), spark.conf.get(bitsKey))
    val bloomBytes =
      try {
        spark.conf.set(itemsKey, math.max(prevItems.toLong, expectedCorpusItems).toString)
        spark.conf.set(bitsKey, math.max(prevBits.toLong, numBits).toString)
        corpusFp
          .select(BloomKernel.bloomAgg(xxhash64(col("_g_fp")), expectedCorpusItems, numBits))
          .head().getAs[Array[Byte]](0)
      } finally {
        spark.conf.set(itemsKey, prevItems)
        spark.conf.set(bitsKey, prevBits)
      }
    val inFp = fpOf(incoming)
    if (bloomBytes == null) return incoming // empty corpus: everything is new
    val positive = BloomKernel.mightContain(bloomBytes, xxhash64(col("_g_fp")))
    val definitelyNew = inFp.where(!positive)
    val verified = inFp.where(positive)
      .join(corpusFp.withColumnRenamed("_g_fp", "_c_fp"),
        col("_g_fp") === col("_c_fp"), "left_anti")
    incoming.join(
      definitelyNew.select(idCol).union(verified.select(idCol)), Seq(idCol), "left_semi")
  }

  // ------------------------------------------------------------- MinHash LSH

  /** Modulus for the affine min-hash family: 2^31−1 (prime). Products stay
    * under 2^62, so the arithmetic cannot overflow under ANSI mode. */
  private val MinhashP = 2147483647L

  /** Deterministic affine hash parameters (a ∈ [1,P), b ∈ [0,P)). */
  private def affineParams(n: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextInt(Int.MaxValue - 1).toLong + 1L, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Base hash per shingle: xxhash64 reduced mod P. Materialize this ONCE
    * per document (its own projection) before fanning out to the affine
    * re-hashes — inlining it under every array_min would recompute the
    * tokenize+shingle+hash work numHashes times per row, because lambda
    * expressions are excluded from codegen subexpression elimination. */
  def minhashBase(shingleCol: Column): Column =
    transform(shingleCol, s => pmod(xxhash64(s), lit(MinhashP)))

  /** numHashes affine re-hashes (a·h+b mod P) over a pre-hashed shingle
    * array — pure array expressions inside codegen, no explode. */
  def minhashSignatureFromHashes(hashedCol: Column, numHashes: Int, seed: Long = 42L): Column =
    array(affineParams(numHashes, seed).map { case (a, b) =>
      array_min(transform(hashedCol, h => pmod(h * lit(a) + lit(b), lit(MinhashP))))
    }: _*)

  /** MinHash signature (array of numHashes longs) over a shingle-set column.
    * Convenience one-expression form: fine for small numHashes, but at
    * numHashes ≥ ~16 prefer materializing [[minhashBase]] in a separate
    * projection and calling [[minhashSignatureFromHashes]] (as
    * [[minhashPairs]] does) — this form recomputes the base per hash. */
  def minhashSignature(shingleCol: Column, numHashes: Int, seed: Long = 42L): Column =
    minhashSignatureFromHashes(minhashBase(shingleCol), numHashes, seed)

  /**
   * MinHash + banded LSH near-duplicate PAIRS: shingle → signature → band
   * buckets → same-bucket join → exact Jaccard verify ≥ threshold.
   *
   * numHashes = bands × rowsPerBand. Collision probability for Jaccard j is
   * 1-(1-j^rowsPerBand)^bands (the classic S-curve).
   *
   * Ids keep their natural type (long, string, …) end to end — no silent
   * cast; `id_a < id_b` only needs a total order, which every orderable
   * Spark type provides.
   */
  /** (id, sh) shingle-set frame. Word-gram shingling tokenizes in its OWN
    * projection: inlined, the regexp tokenizer would re-run per shingle
    * position inside the slice lambda (no subexpression elimination across
    * lambda bodies). Char shingles substring the raw attribute directly —
    * already cheap. */
  private def shingledOf(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int, wordGrams: Option[Int]): DataFrame = {
    val dfp = Par.widen(df)
    wordGrams match {
      case Some(n) =>
        dfp.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("tk"))
          .select(col("id"), TextOps.wordShinglesFromTokens(col("tk"), n).as("sh"))
      case None =>
        dfp.select(col(idCol).as("id"), TextOps.shingles(textCol, shingleK).as("sh"))
    }
  }

  /** (id, sig) minhash signatures from an (id, sh) frame. Signatures via
    * explode + numHashes codegen'd min-aggregates, NOT the one-expression
    * array form: a 64-branch array_min(transform(...)) tree exceeds
    * whole-stage-codegen limits and falls back to interpreted evaluation
    * (~50× slower, measured). The hash aggregate keeps every
    * (shingle × hash) op in tight generated code, and map-side partial
    * aggregation collapses to one row per document before the shuffle —
    * the shuffle moves |docs| × numHashes longs, not |shingles|.
    * explode_OUTER, deliberately: plain explode triggers
    * InferFiltersFromGenerate, whose size(sh)>0 predicate embeds the whole
    * shingle expression and gets pushed below the widening shuffle — the
    * expensive interpreted HOF then runs serially on the (often 1-task)
    * scan side, twice. explode_outer infers nothing; the rare null row it
    * keeps (null text) hashes to a constant and can never survive the
    * exact-Jaccard verify. */
  private def signaturesOf(shingled: DataFrame, numHashes: Int): DataFrame = {
    val params = affineParams(numHashes, 42L)
    val minAggs = params.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MinhashP))).as(s"_m$i")
    }
    shingled
      .select(col("id"), explode_outer(col("sh")).as("s"))
      .select(col("id"), pmod(xxhash64(col("s")), lit(MinhashP)).as("h"))
      .groupBy("id").agg(minAggs.head, minAggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** PUBLIC signature builder — the persistent LSH INDEX of a corpus:
    * 8·bands·rowsPerBand bytes per document instead of its text. Write it
    * to a catalog table once; incremental batches join against it without
    * ever re-reading or re-signaturing the standing corpus
    * ([[incrementalNearDupPairs]]). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 8,
      wordGrams: Option[Int] = None): DataFrame =
    signaturesOf(shingledOf(df, idCol, textCol, shingleK, wordGrams), bands * rowsPerBand)
      .withColumnRenamed("id", idCol)

  /** (id, band, bucket) LSH band buckets derived from signatures —
    * map-only arithmetic; the index never stores buckets. */
  private def bucketsOf(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = array((0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }: _*)
    sigs.select(col("id"), explode(bandCols).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Hot-bucket cap shared by all three candidate generators: drop
    * (band, bucket) groups wider than `w` docs — windowless (count-join)
    * so the common case stays one shuffle on (band, bucket), reused by
    * the pair join. A bucket of width w yields O(w²) candidates, so one
    * hot bucket (boilerplate, adversarial self-similarity) can dominate
    * the job; exact dedup catches mega-cluster duplicates anyway. */
  private def capBuckets(buckets: DataFrame, maxBucketWidth: Option[Int]): DataFrame =
    maxBucketWidth match {
      case None => buckets
      case Some(w) =>
        val widths = buckets.groupBy("band", "bucket")
          .agg(count(lit(1)).as("_w")).where(col("_w") <= w)
          .select(col("band"), col("bucket"))
        buckets.join(widths, Seq("band", "bucket"), "left_semi")
    }

  /** σ-prefilter shared by all three candidate generators: the minhash
    * component-agreement rate estimates Jaccard with
    * σ ≈ sqrt(j(1−j)/numHashes); filtering at threshold − 3σ keeps recall
    * ≈ 1 while dropping the mid-similarity bulk BEFORE the expensive
    * exact shingle-set join. The survivor-pair frame is materialized via
    * an eager checkpoint — lineage is cut so the O(corpus) signature
    * cache can be freed immediately (a persist would pin blocks until an
    * unpersist no caller could issue). Returns (aCol, bCol) survivors. */
  private def estPrefilter(cand: DataFrame, aCol: String, bCol: String,
      sigsA: DataFrame, sigsB: DataFrame,
      numHashes: Int, threshold: Double): DataFrame = {
    val sigma = math.sqrt(threshold * (1 - threshold) / numHashes)
    val estFilter = math.max(0.0, threshold - 3 * sigma)
    materialize(cand
      .join(sigsA.select(col("id"), col("sig").as("sig_a")), col(aCol) === col("id")).drop("id")
      .join(sigsB.select(col("id"), col("sig").as("sig_b")), col(bCol) === col("id")).drop("id")
      .withColumn("est",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
          .cast(DoubleType) / numHashes)
      .where(col("est") >= estFilter)
      .select(col(aCol), col(bCol)))
  }

  /** Attach each side's shingle-set array to MATERIALIZED candidate pairs
    * without exchanging the corpus-sized set frames (round-16 plan audit):
    * the static planner saw the checkpointed pair frame with unknown stats
    * and planned SortMergeJoins — AQE converted them to broadcast joins at
    * runtime, but the already-planned exchanges of the set frames still
    * executed (measured 2 × 113 MB of t04_30x's 362 MB total shuffle).
    * Below the row cap the pairs broadcast into two map-side joins (the
    * set frames stream from cache, zero exchange) and the two O(|pairs|)
    * sides join by pair key — every shuffle is candidate-sized. Above the
    * cap (pair explosion) the original shuffled shape is kept. `pairs`
    * MUST be eagerly materialized: the count is then exact and cheap, and
    * the broadcast decision never trusts an estimate. */
  private def attachSets(pairs: DataFrame, aCol: String, bCol: String,
      shA: DataFrame, shB: DataFrame): DataFrame = {
    val p = Par.broadcastGated(pairs)
    // broadcastGated returns `pairs` ITSELF above the cap and a new hinted
    // frame below it — reference inequality IS the "was hinted" signal
    if (p ne pairs) {
      val a = p.join(shA.withColumnRenamed("sh", "sh_a"), col(aCol) === col("id"))
        .select(col(aCol), col(bCol), col("sh_a"))
      val b = p.join(shB.withColumnRenamed("sh", "sh_b"), col(bCol) === col("id"))
        .select(col(aCol), col(bCol), col("sh_b"))
      a.join(b, Seq(aCol, bCol))
    } else
      pairs
        .join(shA.withColumnRenamed("sh", "sh_a"), col(aCol) === col("id")).drop("id")
        .join(shB.withColumnRenamed("sh", "sh_b"), col(bCol) === col("id")).drop("id")
  }

  /** Exact verify shared by all three candidate generators: join the
    * shingle sets back and compute true Jaccard — a returned pair is a
    * TRUE near-duplicate, never an LSH guess.
    * Returns (aCol, bCol, jaccard) at ≥ threshold. */
  private def exactVerify(pairs: DataFrame, aCol: String, bCol: String,
      shA: DataFrame, shB: DataFrame, threshold: Double): DataFrame =
    attachSets(pairs, aCol, bCol, shA, shB)
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .where(col("jaccard") >= threshold)
      .select(col(aCol), col(bCol), col("jaccard"))

  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 8,
      threshold: Double = 0.7,
      /** Some(n): shingle on word n-grams instead of char k-grams — ~5-10×
        * fewer shingle hashes per document, the right default at scale. */
      wordGrams: Option[Int] = None,
      /** Some(w): drop band buckets wider than w docs before pairing.
        * A bucket of width w yields w(w-1)/2 candidate pairs, so one hot
        * bucket (shared boilerplate, adversarial self-similarity) can
        * dominate the whole job; capping trades recall on mega-cluster
        * duplicates (which exact dedup catches anyway) for bounded work —
        * the standard LSH guard at corpus scale. None = exhaustive. */
      maxBucketWidth: Option[Int] = None): DataFrame = {
    val numHashes = bands * rowsPerBand
    // The shingle-set frame is persisted too: it feeds the signature build
    // AND both exact-verify joins (three consumers, no subtree sharing
    // across joins) — same repeated-shingling finding as rareShinglePairs.
    val shingled = shingledOf(df, idCol, textCol, shingleK, wordGrams)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (id, sig) is persisted and materialized ONCE: the signature feeds the
    // band buckets AND the pair-wise estimate join, and Catalyst does not
    // share subtrees across joins — without the persist it would be
    // recomputed per consumer.
    val sigs = signaturesOf(shingled, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    val buckets = capBuckets(bucketsOf(sigs, bands, rowsPerBand), maxBucketWidth)
    // Same-bucket candidate pairs (id_a < id_b), deduped across bands.
    // With a width cap the bucket frame arrives hash(band,bucket)-
    // partitioned from capBuckets' semi-join and every bucket holds ≤ w
    // ids, so the exchange-free bounded aggregation replaces the bucket
    // SELF-join (which re-shuffled the buckets twice more — the same
    // shape, and fix, as the rare-shingle posting join). Uncapped
    // (exhaustive) mode keeps the join: bucket widths are unbounded there
    // and a join handles a degenerate mega-bucket without a mega-array.
    val cand = maxBucketWidth match {
      case Some(_) => candidatePairsOf(buckets, Seq("band", "bucket"))
      case None =>
        val a = buckets.as("a")
        val b = buckets.as("b")
        a.join(b, col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct()
    }
    val est = estPrefilter(cand, "id_a", "id_b", sigs, sigs, numHashes, threshold)
    sigs.unpersist(blocking = false)
    val res = materialize(exactVerify(est, "id_a", "id_b", shingled, shingled, threshold))
    shingled.unpersist(blocking = false)
    res
  }

  /**
   * Incremental near-duplicate detection of a NEW batch against a standing
   * corpus — the MinHash analog of [[incrementalNew]]'s Bloom-gated exact
   * dedup, and the shape a daily ingest actually runs at 100 TB:
   *
   *  - `corpusIndex` is the persisted (idCol, sig) signature table built
   *    once by [[minhashSignatures]] (and appended batch-over-batch); the
   *    standing corpus TEXT is never re-shingled — only candidate rows are
   *    fetched from `corpusText` for the exact verify, via a semi-join;
   *  - the batch signatures and band buckets are computed fresh (the batch
   *    is the small side); candidates come from a (band,bucket) equi-join
   *    of batch buckets against index buckets derived map-only from sigs;
   *  - same σ-prefilter and exact-Jaccard verify as [[minhashPairs]], so a
   *    returned pair is a TRUE near-duplicate, not an LSH guess.
   *
   * Returns (id_new, id_corpus, jaccard). Intra-batch duplicates are the
   * caller's [[minhashPairs]] call over the batch alone.
   */
  def incrementalNearDupPairs(
      incoming: DataFrame, corpusIndex: DataFrame, corpusText: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 8,
      threshold: Double = 0.7, wordGrams: Option[Int] = None,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Persisted: feeds the signature build and the exact verify (no
    // subtree sharing across joins — the repeated-shingling finding).
    val newShingled = shingledOf(incoming, idCol, textCol, shingleK, wordGrams)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newSigs = signaturesOf(newShingled, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    newSigs.count()
    val corpusSigs = corpusIndex.select(col(idCol).as("id"), col("sig"))
    // a bands/rowsPerBand mismatch vs the persisted index would not error —
    // it would silently band-hash past the signature and prefilter every
    // true duplicate away — so fail fast on the first row's length
    corpusSigs.select(size(col("sig"))).limit(1).collect().headOption.foreach { r =>
      require(r.getInt(0) == numHashes,
        s"corpus index signatures have ${r.getInt(0)} hashes but bands*rowsPerBand = $numHashes — " +
          "pass the same (bands, rowsPerBand) the index was built with")
    }
    val newBuckets = bucketsOf(newSigs, bands, rowsPerBand)
    // Hot-bucket cap on the CORPUS side (the unbounded one).
    val cappedCorpus = capBuckets(bucketsOf(corpusSigs, bands, rowsPerBand), maxBucketWidth)
    val cand = newBuckets.as("n")
      .join(cappedCorpus.as("c"),
        col("n.band") === col("c.band") && col("n.bucket") === col("c.bucket") &&
          col("n.id") =!= col("c.id"))
      .select(col("n.id").as("id_new"), col("c.id").as("id_corpus"))
      .distinct()
    val est = estPrefilter(cand, "id_new", "id_corpus", newSigs, corpusSigs,
      numHashes, threshold)
    newSigs.unpersist(blocking = false)
    // Exact verify: batch shingles recompute (small side); corpus shingles
    // ONLY for candidate ids — the semi-join keeps the standing corpus
    // text untouched except for the handful of candidate rows.
    val candCorpusText = corpusText.join(
      est.select(col("id_corpus").as(idCol)).distinct(), Seq(idCol), "left_semi")
    val corpusShingled = shingledOf(candCorpusText, idCol, textCol, shingleK, wordGrams)
    val res = materialize(
      exactVerify(est, "id_new", "id_corpus", newShingled, corpusShingled, threshold))
    newShingled.unpersist(blocking = false)
    res
  }

  /**
   * Cross-corpus MinHash similarity JOIN: every (left, right) pair whose
   * word-shingle Jaccard ≥ threshold — fuzzy alignment between two
   * DIFFERENT tables (eval-set overlap audits, scraped-vs-licensed corpus
   * matching, near-dup joins against a reference set). NOT a wrapper over
   * [[incrementalNearDupPairs]]: that path drops `id_new = id_corpus`
   * pairs (correct when both sides share one id space; wrong here, where
   * left id 5 and right id 5 are unrelated documents).
   *
   * Same scale shape as every candidate generator in this file: banded
   * signature equi-join on (band, bucket) — never a cross product — with
   * the hot-bucket cap applied to the RIGHT (unbounded) side, the
   * σ-prefilter on signature agreement, and an exact-Jaccard verify so a
   * returned pair is a true match, not an LSH guess.
   *
   * Returns (id_left, id_right, jaccard).
   */
  def minhashJoin(
      left: DataFrame, right: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 8,
      threshold: Double = 0.7, wordGrams: Option[Int] = None,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Both sides persisted: each feeds its signature build and the exact
    // verify (no subtree sharing across joins).
    val leftShingled = shingledOf(left, idCol, textCol, shingleK, wordGrams)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rightShingled = shingledOf(right, idCol, textCol, shingleK, wordGrams)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val leftSigs = signaturesOf(leftShingled, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rightSigs = signaturesOf(rightShingled, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE materializing action for both sides (round-16, guide §2.6): two
    // sequential counts serialize the sides' shingle+signature builds —
    // each job's straggler tail idles the cluster while the other side
    // waits. A count over the union populates both persists in one job,
    // so the sides' stages back-fill each other's tails.
    // lit(1), not id: the two sides' id TYPES may legally differ and a
    // union would reject what the old per-side counts accepted
    leftSigs.select(lit(1).as("_c")).union(rightSigs.select(lit(1).as("_c"))).count()
    val leftBuckets = bucketsOf(leftSigs, bands, rowsPerBand)
    // cap the RIGHT (unbounded) side
    val rightBuckets = capBuckets(bucketsOf(rightSigs, bands, rowsPerBand), maxBucketWidth)
    val cand = leftBuckets.as("l")
      .join(rightBuckets.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket"))
      .select(col("l.id").as("id_left"), col("r.id").as("id_right"))
      .distinct()
    val est = estPrefilter(cand, "id_left", "id_right", leftSigs, rightSigs,
      numHashes, threshold)
    leftSigs.unpersist(blocking = false); rightSigs.unpersist(blocking = false)
    val res = materialize(
      exactVerify(est, "id_left", "id_right", leftShingled, rightShingled, threshold))
    leftShingled.unpersist(blocking = false)
    rightShingled.unpersist(blocking = false)
    res
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs (id_a, id_b).
    * Public surface: caller-supplied pairs may be lazy/unbounded, so this
    * keeps the plain shuffled joins (no count, no broadcast gamble). */
  def ngramJaccard(pairs: DataFrame, df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3): DataFrame = {
    val sets = Par.widen(df).select(col(idCol).as("id"),
      TextOps.shingles(textCol, shingleK).as("sh"))
    pairs
      .join(sets.withColumnRenamed("sh", "sh_a"), pairs("id_a") === sets("id")).drop("id")
      .join(sets.withColumnRenamed("sh", "sh_b"), pairs("id_b") === sets("id")).drop("id")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .select("id_a", "id_b", "jaccard")
  }

  /** [[ngramJaccard]] over a PRE-BUILT (id, sh) shingle-set frame and
    * MATERIALIZED pairs ([[attachSets]]'s contract) — the corpus-sized set
    * frame never exchanges when the pair count is under the broadcast cap. */
  private def jaccardFromSets(pairs: DataFrame, sets: DataFrame): DataFrame =
    attachSets(pairs, "id_a", "id_b", sets, sets)
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .select("id_a", "id_b", "jaccard")

  /**
   * Inverted-index n-gram Jaccard near-dup pairs: candidates are pairs that
   * share at least one RARE character-K-gram (document frequency in
   * [2, maxDf]), then an exact shingle-set Jaccard verify keeps pairs at
   * ≥ threshold. The deterministic sibling of [[minhashPairs]]
   * (reference: deltacat's content-defined dedupe family): recall is exact
   * for any pair sharing a rare shingle — no signature/banding probability —
   * at the cost of a heavier posting-list join, so it suits corpora where
   * near-dups share distinctive substrings.
   *
   * Scale shape: document frequencies aggregate with map-side partial
   * counts (a full groupBy on the shingle key — the one unavoidable
   * shuffle); common shingles are DISCARDED by the df ≤ maxDf filter
   * *before* any posting list materializes, so the self-join fans out at
   * most maxDf·(maxDf−1)/2 pairs per surviving shingle — the same capped
   * bucketed-equi-join shape as the LSH band join. No collect, no
   * cross join; verify re-joins pairs to the shingle-set table by id.
   */
  def rareShinglePairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, maxDf: Int = 5, threshold: Double = 0.5): DataFrame = {
    require(maxDf >= 2, s"maxDf must be ≥ 2 (got $maxDf): a shingle seen " +
      "once generates no pairs and the cap bounds join fanout")
    // Project the shingle array once, THEN explode_outer (see signaturesOf:
    // plain explode's InferFiltersFromGenerate would re-run the shingle
    // lambda interpreted on the scan side; an inline generator expression
    // would too). A null-text row explodes to sh=null, which no equi-join
    // can match — it drops out for free.
    // The corpus is shingled ONCE and persisted: the set frame feeds the
    // df-count, the posting join AND the two exact-verify joins — four
    // consumers whose subtrees Catalyst does not share, so without the
    // persist the interpreted shingle lambda re-ran per consumer
    // (profiled: 3 of t50_10x's 4 ~40-task-second stages were repeated
    // shingling). Same pattern as minhashPairs' persisted signatures.
    val sets = Par.widen(df)
      .select(col(idCol).as("id"), TextOps.shingles(textCol, shingleK).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sets.count()
    val sh = sets.select(col("id"), explode_outer(col("sh")).as("sh"))
    // df-filter FIRST (partial-agg count), then keep only rare postings.
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df").between(2, maxDf)).select("sh")
    val posting = sh.join(rare, Seq("sh"))
    // Materialized BEFORE the verify (round-16): attachSets' exact-count
    // broadcast gate then keeps the persisted set frame out of any exchange
    // (the static planner saw unknown pair stats and shuffled `sets` twice
    // — ~2/3 of t50_10x's shuffle bytes even after AQE's join conversion,
    // because the planned exchanges still executed).
    val cand = materialize(candidatePairsOf(posting))
    val res = materialize(jaccardFromSets(cand, sets)
      .where(col("jaccard") >= threshold))
    sets.unpersist(blocking = false)
    res
  }

  /** Unordered candidate id pairs (id_a < id_b) from a df-capped posting
    * frame (sh, id). One aggregation instead of a posting SELF-join: the
    * posting frame arrives hash(sh)-partitioned from the rare-shingle
    * join, so the groupBy adds no exchange, where the self-join re-
    * shuffled the postings twice more (measured: the join was ~2/3 of
    * t50_10x's 714 MB shuffle read). collect_list is memory-bounded BY
    * CONSTRUCTION — common shingles were discarded before any list forms,
    * so a list holds ≤ maxDf ids. Pair fan-out per shingle is the same
    * df²/2 bound as before, produced by two tiny generators over the
    * ≤-maxDf arrays (array_sort gives the id_a < id_b orientation). */
  private def candidatePairsOf(posting: DataFrame,
      bucketKeys: Seq[String] = Seq("sh")): DataFrame =
    posting.groupBy(bucketKeys.map(col): _*)
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .select(col("ids"), posexplode(col("ids")))
      .select(col("col").as("id_a"),
        explode(slice(col("ids"), col("pos") + lit(2), size(col("ids")))).as("id_b"))
      .where(col("id_a") =!= col("id_b")) // strict <, as the self-join had
      .distinct()

  /**
   * Asymmetric shingle CONTAINMENT pairs: containment(A in B) =
   * |shingles(A) ∩ shingles(B)| / |shingles(A)| — the subset-duplicate
   * detector (a short document quoted verbatim inside a longer one).
   * Symmetric Jaccard structurally misses these: |A∩B|/|A∪B| ≤ |A|/|B|,
   * so a tweet inside a long article can never clear a Jaccard threshold
   * no matter how exact the copy. Candidates come from the same
   * df-capped rare-shingle blocking as [[rareShinglePairs]] (a contained
   * copy shares ALL of the inner doc's shingles, rare ones included);
   * each candidate pair emits each direction that clears the threshold.
   * Returns (id_inner, id_outer, containment): the inner doc's shingles
   * are covered `containment`-fraction by the outer doc's.
   */
  def shingleContainmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, maxDf: Int = 5, threshold: Double = 0.8): DataFrame = {
    require(maxDf >= 2, s"maxDf must be ≥ 2 (got $maxDf)")
    // One persisted shingling pass for all four consumers (see
    // rareShinglePairs).
    val sets = Par.widen(df)
      .select(col(idCol).as("id"), TextOps.shingles(textCol, shingleK).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sets.count()
    val sh = sets.select(col("id"), explode_outer(col("sh")).as("sh"))
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df").between(2, maxDf)).select("sh")
    val posting = sh.join(rare, Seq("sh"))
    // materialized pairs + attachSets: the set frame stays out of any
    // exchange under the broadcast cap (see rareShinglePairs)
    val cand = materialize(candidatePairsOf(posting))
    val scored = attachSets(cand, "id_a", "id_b", sets, sets)
      .withColumn("_inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .withColumn("c_ab", col("_inter") / size(col("sh_a")).cast(DoubleType))
      .withColumn("c_ba", col("_inter") / size(col("sh_b")).cast(DoubleType))
    val res = materialize(scored.where(col("c_ab") >= threshold)
      .select(col("id_a").as("id_inner"), col("id_b").as("id_outer"),
        col("c_ab").as("containment"))
      .unionByName(scored.where(col("c_ba") >= threshold)
        .select(col("id_b").as("id_inner"), col("id_a").as("id_outer"),
          col("c_ba").as("containment"))))
    sets.unpersist(blocking = false)
    res
  }

  /** See [[Par.materialize]]: eager, lineage-cutting, checkpoint-reliable
    * when a checkpoint dir is configured. */
  private def materialize(d: DataFrame): DataFrame = Par.materialize(d)

  // ---------------------------------- connected components / dedup clusters

  /**
   * Connected components of an undirected pair graph, via alternating
   * large-star / small-star rounds (Kiveris et al., "Connected Components
   * in MapReduce and Beyond", SoCC'14) — the standard O(log n)-round
   * shuffle algorithm. Near-dup PAIRS (from [[minhashPairs]] /
   * [[simhashPairs]] / embedding variants) are not directly actionable:
   * dedup needs one CLUSTER id per document so a single canonical copy can
   * be kept per transitive duplicate group.
   *
   * Scale shape: each round is two key-partitioned aggregate+join passes
   * (no driver-side graph, no component ever materialized on one node —
   * the failure mode of label propagation on high-diameter graphs is
   * round COUNT, which large/small-star bounds at O(log n), not memory).
   * Every round is eagerly materialized: iterative lineage otherwise
   * doubles the plan per round, and the convergence check needs an action
   * anyway. Convergence = the edge set's (count, xor-of-hashes)
   * fingerprint is stable across a round.
   *
   * Returns (id, component): one row per node appearing in `pairs`,
   * component = the MINIMUM id reachable. Ids keep their natural type —
   * any orderable Spark type (long, string, …) works; null ids are
   * dropped.
   *
   * Size gate: verified candidate graphs are edge-sparse relative to the
   * corpus (pairs survive an exact-Jaccard check), so the edge list is
   * usually metadata-sized even when the corpus is not. At or below
   * `localEdgeLimit` edges the closure runs as driver union-find (one
   * collect of the already-materialized edge frame — the same
   * driver-below/distributed-above shape as the catalog's footer reads);
   * above it, the O(log n) large-star/small-star rounds. Pass 0 to force
   * the distributed path.
   */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxRounds: Int = 50,
      localEdgeLimit: Long = 1L << 20): DataFrame = {
    val raw = pairs
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))

    if (localEdgeLimit > 0) {
      val base = materialize(raw)
      // count is a cheap second action over the checkpointed frame
      if (base.count() <= localEdgeLimit) {
        val rows = base.collect()
        val comparable = rows.isEmpty ||
          (rows.head.get(0).isInstanceOf[Comparable[_]] &&
            rows.head.get(1).isInstanceOf[Comparable[_]])
        if (comparable)
          return localComponents(pairs.sparkSession, rows,
            pairs.schema(aCol).dataType)
      }
      return componentsDistributed(base, maxRounds)
    }
    componentsDistributed(raw, maxRounds)
  }

  /** Driver union-find over a collected edge list (see size gate above).
    * Iterative find with full path compression — no recursion, so a
    * million-edge chain cannot overflow the stack. */
  private def localComponents(spark: SparkSession, rows: Array[Row],
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val index = new java.util.HashMap[Any, Int]()
    val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
    val parent = scala.collection.mutable.ArrayBuffer.empty[Int]
    def idx(x: Any): Int =
      if (index.containsKey(x)) index.get(x)
      else { val i = vals.size; index.put(x, i); vals += x; parent += i; i }
    def find(x0: Int): Int = {
      var r = x0
      while (parent(r) != r) r = parent(r)
      var y = x0
      while (parent(y) != y) { val n = parent(y); parent(y) = r; y = n }
      r
    }
    rows.foreach { r =>
      val (a, b) = (find(idx(r.get(0))), find(idx(r.get(1))))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    // component label = minimum member VALUE (not index) per root
    def lt(a: Any, b: Any): Boolean = a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    val minOf = new java.util.HashMap[Int, Any]()
    vals.indices.foreach { i =>
      val r = find(i)
      val cur = minOf.get(r)
      if (cur == null || lt(vals(i), cur)) minOf.put(r, vals(i))
    }
    val out: java.util.List[Row] = new java.util.ArrayList[Row](vals.size)
    vals.indices.foreach(i => out.add(Row(vals(i), minOf.get(find(i)))))
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("component", idType))))
  }

  private def componentsDistributed(raw: DataFrame, maxRounds: Int): DataFrame = {

    // large-star: every node connects its strictly-LARGER neighbors to its
    // minimum neighbor (or itself if smaller). Neighborhoods come from both
    // edge directions; output edges always point larger → smaller.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    // small-star: every node connects its smaller-or-equal neighbors (and
    // itself) to its minimum neighbor.
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
      dir.join(mins, "u")
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("e"))
        .select(col("e.a").as("u"), col("e.b").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    // Order-independent set fingerprint. bit_xor, not sum: ANSI mode makes
    // a long-sum overflow an error, xor cannot overflow (and the frame is
    // distinct, so no duplicate edge can cancel itself out).
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var edges = materialize(smallStar(largeStar(raw)))
    var fp = fingerprint(edges)
    var converged = false
    var round = 1
    while (!converged && round < maxRounds) {
      val next = materialize(smallStar(largeStar(edges)))
      val nfp = fingerprint(next)
      converged = nfp == fp
      edges = next; fp = nfp; round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    // Converged edges form stars (node → component minimum); roots have no
    // outgoing edge and are their own component.
    val nodes = raw.select(col("u").as("id"))
      .union(raw.select(col("v").as("id"))).distinct()
    nodes.join(edges.select(col("u").as("id"), col("v").as("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Near-duplicate cluster assignment: [[minhashPairs]] candidates →
    * transitive closure via [[connectedComponents]]. One (id, component)
    * row per document that participates in at least one near-dup pair. */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 8,
      threshold: Double = 0.7, wordGrams: Option[Int] = None,
      maxBucketWidth: Option[Int] = None): DataFrame =
    connectedComponents(minhashPairs(df, idCol, textCol, shingleK, bands,
      rowsPerBand, threshold, wordGrams, maxBucketWidth))

  /** Keep one document per transitive near-duplicate cluster (the cluster's
    * minimum id) plus every unclustered document — the end-to-end fuzzy
    * dedup a training pipeline actually runs. The anti-join drops only
    * non-canonical cluster members. */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 8,
      threshold: Double = 0.7, wordGrams: Option[Int] = None,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    val cc = nearDupClusters(df, idCol, textCol, shingleK, bands, rowsPerBand,
      threshold, wordGrams, maxBucketWidth)
    val losers = cc.where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** [[dropNearDuplicates]] with an explicit RETENTION POLICY: per
    * transitive near-duplicate cluster keep the member maximizing `keepBy`
    * (id-ascending tie-break), not the accidentally-smallest id — real
    * pipelines keep the longest / highest-quality copy of a duplicate
    * cluster, and min-id retention silently biases toward whatever arrived
    * first. `keepBy` must be deterministic and orderable (e.g. a length,
    * a quality score, a recency timestamp).
    *
    * Scale: the winner election runs only over CLUSTERED ids (the pair
    * set's vertex set — tiny relative to the corpus), one window pass
    * partitioned by component; the corpus is touched by one key join to
    * fetch `keepBy` for those ids and one anti-join to drop the losers. */
  def dropNearDuplicatesKeeping(df: DataFrame, idCol: String, textCol: String,
      keepBy: Column,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 8,
      threshold: Double = 0.7, wordGrams: Option[Int] = None,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    val cc = nearDupClusters(df, idCol, textCol, shingleK, bands, rowsPerBand,
      threshold, wordGrams, maxBucketWidth)
    // Join the tiny cluster set to the corpus FIRST (map-side against a
    // broadcast cc), THEN collapse to one keepBy row per id — the
    // aggregate runs over cluster-sized rows only, never shuffling the
    // corpus. One row per id even under dirty duplicate-id input (two
    // rows for the winning id would otherwise put the winner at rn=2 and
    // drop the whole cluster); max = the value the policy prefers.
    val members = cc.join(
        df.select(col(idCol).as("id"), keepBy.as("_kb")), Seq("id"))
      .groupBy("id", "component").agg(max(col("_kb")).as("_kb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component").orderBy(col("_kb").desc, col("id").asc)
    val losers = members.withColumn("_rn", row_number().over(w))
      .where(col("_rn") > 1).select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  // -------------------------------------------------- exact substring dedup

  /**
   * Exact duplicated-substring coverage (Lee et al., "Deduplicating
   * Training Data Makes Language Models Better", arXiv:2107.06499 — the
   * ExactSubstr criterion): any k-token window whose exact content occurs
   * at least `minOccurrences` times ANYWHERE in the corpus (across
   * documents or repeated within one) is a duplicated span. Per document,
   * the union of its duplicated windows gives the duplicated-token count
   * and ratio — the signal ExactSubstr cuts on.
   *
   * The reference paper builds a corpus-wide suffix array; that is a
   * single-machine construction. The Spark-shaped equivalent: hash every
   * k-token window (one array expression per document — the window rows
   * shuffled carry (id, pos, 16-byte hash), never token arrays), count
   * occurrences with a map-side-combining aggregate, semi-join the
   * duplicated hashes back, and take per-document interval union with a
   * doc-partitioned running-max window — every stage is key-partitioned,
   * nothing driver-side. Window hashes are md5 of the space-joined tokens,
   * reproducible in any engine.
   *
   * Returns (id, n_tokens, dup_tokens, dup_ratio), one row per document
   * with ≥1 token; `id` keeps the input column name.
   */
  /** Shared ExactSubstr front end: (persisted per-doc frame, exploded
    * window-start stream). The per-doc frame carries (id, [tk if
    * `keepTokens`], n_tokens, whs); the stream is (id, s, h) with s
    * 1-based. Callers MUST unpersist the returned frame.
    *
    * Window hashes are 16-byte binary md5, not the 32-char hex string: the
    * window-row stream is the dominant shuffle at corpus scale and the
    * hash is half the row — equality semantics are unchanged. The stream
    * uses posexplode_OUTER: plain generators trigger
    * InferFiltersFromGenerate, which would duplicate the whole window-hash
    * expression into a pushed filter; outer infers nothing and the null
    * row is dropped by name. */
  private def spanWindows(df: DataFrame, idCol: String, textCol: String,
      k: Int, keepTokens: Boolean): (DataFrame, DataFrame) = {
    val tkCols = if (keepTokens) Seq(col("tk")) else Nil
    val toks = Par.widen(df)
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) > 0)
      .select(col("id") +: tkCols ++: Seq(
        size(col("tk")).cast("long").as("n_tokens"),
        when(size(col("tk")) >= k,
          transform(sequence(lit(1), size(col("tk")) - (k - 1)),
            s => unhex(md5(array_join(slice(col("tk"), s, lit(k)), " ")))))
          .otherwise(array().cast("array<binary>")).as("whs")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    toks.count()
    val wins = toks
      .select(col("id"), posexplode_outer(col("whs")).as(Seq("p", "h")))
      .where(col("h").isNotNull)
      .select(col("id"), (col("p") + 1).cast("long").as("s"), col("h"))
    (toks, wins)
  }

  def duplicateSpanStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 50, minOccurrences: Int = 2): DataFrame = {
    require(k >= 1 && minOccurrences >= 2, "k >= 1, minOccurrences >= 2")
    val (toks, wins) = spanWindows(df, idCol, textCol, k, keepTokens = false)
    // materialize + count-gated broadcast (round-16): the duplicated-hash
    // set is tiny next to the window stream, but as a lazy aggregate the
    // planner shuffled the FULL window stream again for the semi join —
    // broadcast makes it map-only over the persisted toks
    val dup = materialize(wins.groupBy("h").agg(count(lit(1)).as("_occ"))
      .where(col("_occ") >= minOccurrences).select("h"))
    val dupStarts = wins.join(Par.broadcastGated(dup), Seq("h"), "left_semi")
    // interval union without islands: each duplicated window [s, s+k-1]
    // contributes the tokens past the running max end of earlier windows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val perDoc = materialize(dupStarts
      .withColumn("pe", coalesce(max(col("s") + (k - 1)).over(w), lit(0L)))
      .withColumn("add",
        greatest(col("s") + (k - 1) - greatest(col("pe"), col("s") - 1), lit(0L)))
      .groupBy("id").agg(sum(col("add")).as("dup_tokens")))
    val out = toks.select(col("id"), col("n_tokens"))
      .join(Par.broadcastGated(perDoc), Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast(DoubleType) /
          col("n_tokens")).as("dup_ratio"))
    val res = materialize(out)
    toks.unpersist(blocking = false)
    res
  }

  /** ExactSubstr REMOVAL (the action [[duplicateSpanStats]] only reports):
   * rewrite each document with every non-canonical duplicated k-token span
   * cut out (Lee et al., "Deduplicating Training Data Makes Language
   * Models Better", ACL'22 §3.2 — reference deltacat has no counterpart;
   * this is pipeline-layer).
   *
   * Semantics: a k-token window is duplicated when its hash occurs
   * `minOccurrences`+ times corpus-wide. Per duplicated hash the canonical
   * occurrence is the (id, start)-minimum; every OTHER occurrence marks its
   * k token positions for removal. The canonical occurrence is never
   * removed FOR ITS OWN HASH, but an overlapping removal of a DIFFERENT
   * duplicated hash may still clip it — so "one intact copy survives"
   * holds for isolated spans, not through arbitrary overlaps (the same
   * property as the paper's greedy span cutting). A document's surviving
   * tokens are re-joined with single spaces, so `clean_text` is in the
   * tokenizer's canonical form (lowercased, whitespace-normalized) — same
   * convention as every other text operator here.
   *
   * Scale shape: one window-hash stream (id, pos, 16-byte hash) — token
   * arrays never shuffle; occurrence count + canonical election in ONE
   * map-side-combinable aggregate over the hash (partials collapse before
   * the shuffle, so a corpus-wide boilerplate span cannot serialize one
   * task), joined back to tag non-canonical occurrences; removal starts
   * collapse per doc with a map-side-combining collect; reconstruction is
   * a map-only lambda over the doc's own tokens. Per-doc filter cost is O(tokens × removal
   * windows) — fine for real documents (removal windows ≪ tokens after the
   * duplicated-hash cut); the suffix-automaton exact bound is a
   * single-machine construction out of scope by design.
   *
   * Returns (id, clean_text, n_tokens, removed_tokens), one row per input
   * document with ≥1 token.
   */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 50, minOccurrences: Int = 2): DataFrame = {
    require(k >= 1 && minOccurrences >= 2, "k >= 1, minOccurrences >= 2")
    val (toks, wins) = spanWindows(df, idCol, textCol, k, keepTokens = true)
    // Canonical election via a MAP-SIDE-COMBINABLE aggregate (count +
    // min(struct(id, s)) partials collapse before the shuffle), not a
    // window over h — a corpus-wide boilerplate span would serialize a
    // window's per-hash sort-rank on one task, while aggregate partials
    // reduce the hot hash to one row per map task. Same shape as
    // duplicateSpanStats' dup-hash aggregate.
    // materialized + count-gated broadcast (round-16, same rationale as
    // duplicateSpanStats): the duplicated-hash election is tiny next to the
    // window stream, and broadcasting it makes the removal tagging map-only
    // over the persisted toks instead of re-shuffling every window row
    val byHash = materialize(wins.groupBy("h").agg(
        count(lit(1)).as("_occ"),
        min(struct(col("id"), col("s"))).as("_c"))
      .where(col("_occ") >= minOccurrences)
      .select(col("h"), col("_c.id").as("_cid"), col("_c.s").as("_cs")))
    val removal = wins.join(Par.broadcastGated(byHash), Seq("h"))
      .where(!(col("id") === col("_cid") && col("s") === col("_cs")))
      .select(col("id"), col("s"))
    // Removal starts per doc: small arrays (bounded by the doc's own
    // window count), map-side combinable. Materialized + broadcast-gated so
    // the reconstruction join streams the cached token arrays unshuffled.
    val perDoc = materialize(removal.groupBy("id")
      .agg(sort_array(collect_list(col("s"))).as("rs")))
    val kept = toks.join(Par.broadcastGated(perDoc), Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        filter(col("tk"), (t, i) => not(exists(
          coalesce(col("rs"), array().cast("array<long>")),
          s => (i + 1) >= s && (i + 1) <= s + (k - 1)))).as("ck"))
      .select(col("id").as(idCol),
        array_join(col("ck"), " ").as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - size(col("ck"))).cast("long").as("removed_tokens"))
    val res = materialize(kept)
    toks.unpersist(blocking = false)
    res
  }

  // ---------------------------------------------------------------- SimHash

  /** Portable 64-bit token hash: the bit pattern of the first 16 hex chars
    * of md5 — reproducible in any engine with md5 (DuckDB, Trino, …),
    * unlike xxhash64. Assembled from two 32-bit halves so no conv() result
    * overflows a signed long. */
  def md5Hash64(c: Column): Column =
    shiftleft(conv(substring(md5(c), 1, 8), 16, 10).cast(LongType), 32)
      .bitwiseOR(conv(substring(md5(c), 9, 8), 16, 10).cast(LongType))

  /** 64-bit SimHash over whitespace tokens: per bit j, sign of the sum of
    * ±1 contributions from each token hash. Computed with array expressions
    * (transform + aggregate) — no explode, no UDF. Tokens come from
    * `regexp_extract_all(lower, \S+)` (never empty strings, unlike split).
    * `tokenHash` defaults to xxhash64 (fastest); pass [[md5Hash64]] when the
    * signature must be reproducible outside Spark. */
  def simhash(textCol: Column, tokenHash: Column => Column = xxhash64(_)): Column =
    simhashFromHashes(simhashTokenHashes(textCol, tokenHash))

  /** Per-token 64-bit hashes for [[simhash]]. Materialize this ONCE per
    * document (own projection) before [[simhashFromHashes]] — the 64 bit
    * aggregates each reference it, and lambda expressions are excluded from
    * codegen subexpression elimination (same pitfall as [[minhashBase]]). */
  def simhashTokenHashes(textCol: Column, tokenHash: Column => Column = xxhash64(_)): Column =
    transform(regexp_extract_all(lower(textCol), lit("\\S+"), lit(0)), t => tokenHash(t))

  /** SimHash from a pre-hashed token array: per bit j, sign of the sum of
    * ±1 contributions from each token hash. */
  def simhashFromHashes(hashesCol: Column): Column = {
    val bits = (0 until 64).map { j =>
      val contrib = aggregate(hashesCol, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << j)) =!= 0L, 1L).otherwise(-1L))
      when(contrib > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup pairs: candidates share one of four 16-bit chunks
    * (any pair within Hamming distance 3 must agree on ≥1 chunk), verified
    * by exact Hamming distance ≤ maxHamming. For maxHamming ≤ 3 the chunk
    * banding is exhaustive (pigeonhole), so the output is EXACTLY the set
    * of pairs at Hamming ≤ maxHamming — deterministic, oracle-comparable. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      tokenHash: Column => Column = xxhash64(_),
      /** Some(w): drop 16-bit-chunk buckets wider than w docs before
        * pairing — same guard as [[minhashPairs]]'s maxBucketWidth. A
        * mega-cluster of near-identical documents (shared boilerplate)
        * otherwise lands one chunk value in one bucket and yields
        * w(w-1)/2 candidates in a single straggler task. Capping trades
        * recall on mega-cluster duplicates (which exact dedup catches
        * anyway) for bounded per-bucket work. None = exhaustive (and for
        * maxHamming ≤ 3 exactly the Hamming-≤maxHamming pair set). */
      maxBucketWidth: Option[Int] = None): DataFrame = {
    // Zero-token documents (null / empty / whitespace-only text) all hash
    // to sh64 = 0 and would form one giant spurious Hamming-0 cluster —
    // they carry no signal for near-dup detection, so drop them up front
    // (exact dedup catches trivially-identical empties anyway).
    val nonEmpty = Par.widen(df).where(
      size(regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0))) > 0)
    // Signature via explode + 64 codegen'd sum-aggregates (the one-expression
    // 64-bit-branch form falls out of whole-stage codegen — same pitfall as
    // the MinHash signature). Map-side partial aggregation collapses to one
    // row per document before the shuffle. The small (id, sh64) frame is
    // materialized once: the chunk self-join below would otherwise recompute
    // the whole tokenize+hash+aggregate pipeline twice.
    val bitAggs = (0 until 64).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0L, 1L).otherwise(-1L)).as(s"_b$j")
    }
    val withH = materialize(nonEmpty
      .select(col(idCol).as("id"),
        explode(regexp_extract_all(lower(col(textCol)), lit("\\S+"), lit(0))).as("t"))
      .select(col("id"), tokenHash(col("t")).as("h"))
      .groupBy("id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("id"), (0 until 64).map(j =>
        when(col(s"_b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("sh64")))
    val allChunks = withH.select(col("id"), col("sh64"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"), col("sh64").bitwiseAND(lit(0xFFFFL << (c * 16))).as("val"))
      }: _*)).as("cv"))
      .select(col("id"), col("sh64"), col("cv.chunk").as("chunk"), col("cv.val").as("val"))
    // Hot-bucket cap: windowless (count-join) so the common case stays a
    // single shuffle on (chunk,val) reused by the pair join below — the
    // same shape as minhashPairs' maxBucketWidth guard.
    val chunks = maxBucketWidth match {
      case None => allChunks
      case Some(w) =>
        val widths = allChunks.groupBy("chunk", "val")
          .agg(count(lit(1)).as("_w")).where(col("_w") <= w)
          .select(col("chunk"), col("val"))
        allChunks.join(widths, Seq("chunk", "val"), "left_semi")
    }
    val pairs = maxBucketWidth match {
      case Some(_) =>
        // Width-capped: same exchange-free bounded aggregation as the
        // minhash/rare-shingle generators (≤ w payloads per chunk bucket,
        // partitioning reused from the cap's semi-join). The payload
        // struct's element type is PINNED via cast — struct field names
        // do not reliably survive array_sort (they can decay to col1/
        // col2), and the explode below dereferences them by name.
        val pt = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", chunks.schema("id").dataType),
          org.apache.spark.sql.types.StructField("sh64",
            org.apache.spark.sql.types.LongType)))
        chunks
          .groupBy("chunk", "val")
          .agg(array_sort(collect_list(struct(col("id"), col("sh64"))))
            .cast(org.apache.spark.sql.types.ArrayType(pt)).as("ps"))
          .select(col("ps"), posexplode(col("ps")))
          .select(col("col").as("pa"),
            explode(slice(col("ps"), col("pos") + lit(2), size(col("ps")))).as("pb"))
          .select(col("pa.id").as("id_a"), col("pb.id").as("id_b"),
            col("pa.sh64").as("h_a"), col("pb.sh64").as("h_b"))
          .where(col("id_a") =!= col("id_b"))
          .distinct()
      case None =>
        val a = chunks.as("a")
        val b = chunks.as("b")
        a.join(b, col("a.chunk") === col("b.chunk") && col("a.val") === col("b.val") &&
            col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.sh64").as("h_a"), col("b.sh64").as("h_b"))
          .distinct()
    }
    pairs
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
