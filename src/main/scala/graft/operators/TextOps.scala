package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * counting, language ID, quality scoring, fingerprinting.
 *
 * All operators are pure Catalyst column expressions (regexp/string
 * built-ins) — whole-stage-codegen friendly, no UDFs, no shuffles beyond
 * what the caller aggregates. Deterministic integer/string outputs so they
 * are oracle-comparable across engines.
 */
object TextOps {

  /** Count of regex matches in a column (codegen'd, no explode). */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast(LongType)

  /** Whitespace-delimited token count. */
  def tokenCount(c: Column): Column = matchCount(c, "\\S+")

  /** BPE-ish subword token count: letter runs, digit runs, single
    * punctuation marks — the classic pre-tokenizer split. */
  def bpeTokenCount(c: Column): Column =
    matchCount(lower(c), "[a-z]+|[0-9]+|[^a-z0-9\\s]")

  /** Language-marker stopword sets (tiny n-gram heuristic). Order matters:
    * ties resolve to the earlier language. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|is|of|and)\\b",
    "fr" -> "\\b(le|la|les|et|des)\\b",
    "de" -> "\\b(der|die|und|das|ist)\\b",
    "es" -> "\\b(el|los|las|y|es)\\b")

  def langScore(c: Column, lang: String): Column = {
    val p = LangMarkers.toMap.apply(lang)
    matchCount(lower(c), p)
  }

  /** Predicted language: argmax of marker scores, 'und' when all zero. */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScore(c, l) }
    val best = scores.zipWithIndex.foldRight(lit("und")) { case (((l, s), i), rest) =>
      val laterScores = scores.drop(i + 1).map(_._2)
      val isMax = laterScores.foldLeft(s > 0) { (acc, other) => acc && s >= other }
      when(isMax, lit(l)).otherwise(rest)
    }
    best
  }

  /** Quality bucket from integer-exact ratios (no floating point). */
  def qualityBucket(c: Column): Column = {
    val nTok = tokenCount(c)
    val nStop = langScore(c, "en")
    when(nTok < 10, lit("too_short"))
      .when(nStop * 20 >= nTok, lit("ok"))
      .otherwise(lit("low_stopword"))
  }

  /** Canonical document fingerprint: md5 of the whitespace-normalized,
    * lowercased text (reference-style content hash for exact dedup). */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Character k-shingle set (distinct) of a text column. */
  def shingles(c: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => c.substr(i, lit(k))))

  def shingles(colName: String, k: Int): Column = shingles(col(colName), k)

  /** Whitespace tokens, lowercased: `regexp_extract_all(lower, \S+)` — no
    * empty tokens for leading whitespace (split would emit one), so the
    * token list is reproducible by any engine's regexp_extract_all. */
  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("\\S+"), lit(0))

  /** Word n-gram shingle set from a PRE-COMPUTED token-array column.
    * IMPORTANT: pass an attribute (own projection), not the tokens(...)
    * expression inline — the slice lambda references the token array once
    * per shingle position, and lambda bodies are excluded from codegen
    * subexpression elimination, so an inline regexp tokenizer would re-run
    * ~|tokens| times per document (measured ~50× slowdown). */
  def wordShinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Word n-gram shingle set (distinct, lowercased). ~5–10× fewer shingles
    * than character k-grams on natural text — the cheaper MinHash front end
    * at corpus scale, at slightly coarser similarity granularity.
    * Convenience one-expression form — in hot paths tokenize into a
    * separate projection and use [[wordShinglesFromTokens]]. */
  def wordShingles(c: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(c), n)

  /** Non-distinct word n-grams from a pre-computed token-array ATTRIBUTE
    * (empty when fewer than n tokens) — the repetition-signal front end,
    * unlike the DISTINCT shingle sets used for similarity. */
  def wordNgramsAll(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /**
   * Within-document repetition signals (the Gopher-rule quality family:
   * Rae et al. 2021, arXiv:2112.11446 §A1.1): fraction of duplicate
   * words / 2-grams / 3-grams, and the text share of the single most
   * frequent 2-gram. High values mark degenerate (looping, boilerplate,
   * keyword-stuffed) documents that pretraining filters drop.
   *
   * Shape: the fraction columns are pure per-row array expressions
   * (gram arrays materialized ONCE in their own projection — lambda
   * bodies get no subexpression elimination); the most-frequent-gram
   * share needs a per-(doc, gram) count, which is two map-side-combining
   * hash aggregates keyed by doc — scales as a plain word count.
   * explode_outer, not explode: the inferred size>0 filter would embed
   * the gram expression and push below the widening shuffle.
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    repetitionStatsCarry(df, idCol, textCol, Nil)

  /** [[repetitionStats]] core with extra per-row CARRY columns computed in
    * the same tokenizing projection — lets a caller ride a map-only
    * verdict (e.g. the gopher quality reason) through the pass for free
    * instead of re-scanning the corpus and joining. The carry columns ride
    * the per-row side (perDoc is a plain select, no aggregation), so they
    * survive to the output unchanged. */
  private def repetitionStatsCarry(df: DataFrame, idCol: String,
      textCol: String, carry: Seq[(String, Column)]): DataFrame = {
    val base = Par.widen(df)
      .select(col(idCol).as("doc_id") +: tokens(col(textCol)).as("tk") +:
        carry.map { case (n, c) => c.as(n) }: _*)
    val carryCols = carry.map { case (n, _) => col(n) }
    val grams = base.select(col("doc_id") +: col("tk") +:
      wordNgramsAll(col("tk"), 2).as("g2") +: wordNgramsAll(col("tk"), 3).as("g3") +:
      carryCols: _*)
    def dupFrac(g: Column): Column =
      when(size(g) === 0, lit(0.0)).otherwise(
        round((size(g) - size(array_distinct(g))).cast(DoubleType) /
          size(g).cast(DoubleType), 9))
    val perDoc = grams.select(col("doc_id") +:
      size(col("tk")).cast(LongType).as("n_tokens") +:
      dupFrac(col("tk")).as("dup_word_frac") +:
      dupFrac(col("g2")).as("dup_2gram_frac") +:
      dupFrac(col("g3")).as("dup_3gram_frac") +: carryCols: _*)
    val top2 = grams.select(col("doc_id"), explode_outer(col("g2")).as("g"))
      .where(col("g").isNotNull)
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        round(max(col("c")).cast(DoubleType) / sum(col("c")).cast(DoubleType), 9)
          .as("max_2gram_frac"))
    perDoc.join(top2, Seq("doc_id"), "left")
      .withColumn("max_2gram_frac", coalesce(col("max_2gram_frac"), lit(0.0)))
  }

  // -------------------------------------------------------- PII redaction
  /** PII patterns: (name, regex, replacement token). Conservative,
    * cross-engine regex — no lookaround/backreferences, so Java regex and
    * RE2-based engines (DuckDB, Hyperscan scanners) match identically.
    * Applied in order: emails first so an address's host part is consumed
    * before the IPv4 rule can see it. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"))

  /** Text with all PII patterns replaced by their tokens (sequential,
    * pattern order above). Pure codegen'd regexp_replace chain. */
  def redactedText(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (_, p, repl)) =>
      regexp_replace(acc, lit(p), lit(repl))
    }

  /** Per-document PII scrub: per-pattern match counts (on the original
    * text, each pattern independently) + the redacted text. A map-only
    * projection — at 100 TB this runs at scan speed with zero shuffles. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    val counts = PiiPatterns.map { case (name, p, _) => matchCount(c, p).as(s"n_$name") }
    df.select((Seq(col(idCol)) ++ counts ++ Seq(redactedText(c).as("redacted"))): _*)
  }

  // --------------------------------------------- deterministic sampling
  /** Engine-portable deterministic hash bucket in [0, buckets): the first
    * 8 md5 hex digits of the id's string form. Unlike `df.sample` (RNG
    * seeded per partition — resample on repartition/retry) or xxhash64
    * (Spark-specific), the same row lands in the same bucket on every
    * engine and every run, so a 10% corpus sample is reproducible
    * forever and disjoint buckets never overlap between experiments. */
  def hashBucket(id: Column, buckets: Int): Column =
    hashBucket(id, lit(buckets.toLong))

  /** Column-typed variant — the single definition behind both the Scala
    * API and the `graft_hash_bucket` SQL function (one expression, no
    * drift between surfaces). Since round 16 this compiles to the
    * [[org.apache.spark.sql.graft.Md5BucketExpr]] codegen kernel —
    * value-identical to the composed
    * `pmod(conv(substring(md5(s),1,8),16,10)::long, buckets)::int` form
    * (the first 8 md5 hex digits are the big-endian first 4 digest bytes)
    * but without the hex-string/substring/conv allocations per row, which
    * dominated GC in the per-gram scoring operators. */
  def hashBucket(id: Column, buckets: Column): Column =
    org.apache.spark.sql.graft.Md5BucketExpr.column(
      id.cast(StringType), buckets.cast(LongType))

  /** Corpus MIXING to per-source token budgets — the data-mixture step of
    * pretraining (static DoReMi-style reweighting): one map-side-combinable
    * aggregate counts tokens per source (the result is #sources rows —
    * metadata-sized at any corpus scale), each listed source derives a
    * keep-fraction min(1, budget ÷ available), and rows are kept by the
    * same deterministic id-hash contract as [[deterministicSample]] — the
    * mixture is reproducible across runs, engines, and retries, and the
    * per-source filter is a MAP-ONLY broadcast-map lookup (no join, no
    * shuffle). Sources absent from `budgets` are dropped. Selection is by
    * whole documents; the realized token count tracks fraction × available
    * in expectation (exact targeting would be a per-doc knapsack — not a
    * corpus-scale op). */
  def sampleToTokenBudget(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgets: Map[String, Long],
      buckets: Int = 10000): DataFrame =
    sampleToTokenBudgetBy(df, idCol, tokenCount(col(textCol)), sourceCol, budgets, buckets)

  /** [[sampleToTokenBudget]] over an ARBITRARY per-row token-count Column —
    * the budget currency is a parameter, so mixing can budget on TRAINED
    * tokenizer counts ([[Bpe.tokenCountColumn]] — what a pretraining token
    * budget actually means) instead of whitespace words. Same shape:
    * one map-side-combinable aggregate to #sources rows, then a map-only
    * deterministic id-hash filter. */
  def sampleToTokenBudgetBy(df: DataFrame, idCol: String, countCol: Column,
      sourceCol: String, budgets: Map[String, Long],
      buckets: Int = 10000): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    // The budgets/thresholds maps are String-keyed, so a non-string source
    // column (int source ids are common) is cast — both in the aggregate
    // and the lookup, so the two sides always agree on the key text.
    val src = col(sourceCol).cast(StringType)
    // coalesce: a source whose every text is NULL sums to null, and the
    // mixing job must treat it as zero available tokens, not crash
    val toks = df.groupBy(src.as("s"))
      .agg(sum(coalesce(countCol, lit(0L))).as("t"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    val thresholds: Map[String, Int] = budgets.flatMap { case (s, budget) =>
      toks.get(s).map { avail =>
        val frac = if (avail <= 0) 0.0 else math.min(1.0, budget.toDouble / avail)
        s -> math.round(frac * buckets).toInt
      }
    }
    df.where(hashBucket(col(idCol), buckets) <
      coalesce(element_at(typedLit(thresholds), src), lit(0)))
  }

  /** Temperature-based corpus mixing (the UniMax/mT5 sampling family):
    * per-source budgets DERIVE from the corpus itself as
    * p_s ∝ tokens_s^(1/T) — T=1 is proportional sampling (every source
    * keeps the same fraction), larger T flattens toward uniform, boosting
    * low-resource sources — then rows keep by the same deterministic
    * id-hash contract as [[sampleToTokenBudgetBy]]. One metadata-sized
    * aggregate (#sources rows) plus a map-only broadcast filter; no joins.
    *
    * Reproducibility: sources fold in LEXICOGRAPHIC order when summing the
    * normalizer (float addition is order-sensitive), and T=2 computes
    * weights via `sqrt` (IEEE correctly-rounded, unlike `pow`'s ≤1-ulp
    * license) — so an external engine replaying the formula lands on
    * bit-identical thresholds. */
  def sampleToTemperatureMix(df: DataFrame, idCol: String, countCol: Column,
      sourceCol: String, totalBudget: Long, temperature: Double = 2.0,
      buckets: Int = 10000): DataFrame = {
    require(totalBudget >= 0, "totalBudget must be >= 0")
    require(temperature > 0, "temperature must be > 0")
    def weight(t: Long): Double =
      if (temperature == 2.0) math.sqrt(t.toDouble)
      else math.pow(t.toDouble, 1.0 / temperature)
    // String-keyed thresholds map → cast the source column on BOTH sides
    // (aggregate + lookup); int/date source ids otherwise ClassCastException
    // at getString and never match the element_at key.
    val src = col(sourceCol).cast(StringType)
    val toks = df.groupBy(src.as("s"))
      .agg(sum(coalesce(countCol, lit(0L))).as("t"))
      .collect()
      .collect { case r if !r.isNullAt(0) && !r.isNullAt(1) => r.getString(0) -> r.getLong(1) }
      .filter(_._2 > 0L).sortBy(_._1)
    val z = toks.map { case (_, t) => weight(t) }.foldLeft(0.0)(_ + _)
    val thresholds: Map[String, Int] = toks.map { case (s, t) =>
      val frac = math.min(1.0, totalBudget.toDouble * weight(t) / z / t.toDouble)
      s -> math.round(frac * buckets).toInt
    }.toMap
    df.where(hashBucket(col(idCol), buckets) <
      coalesce(element_at(typedLit(thresholds), src), lit(0)))
  }

  /** Deterministic global corpus SHUFFLE + sharding — the step between
    * curation and training: documents must reach the trainer in a
    * pseudo-random order decorrelated from ingest order (source runs,
    * crawl locality), split into `nShards` equal-expectation shards, and
    * the assignment must be REPRODUCIBLE (re-runs, engines, failure
    * retries all agree — an RNG shuffle is none of these). Order key =
    * 30-bit md5 bucket of (id, seed), id tie-break; shard = key mod
    * nShards, so changing `seed` re-deals both shards and order.
    *
    * Returns (idCol, shard, position) with position 1..shardSize dense per
    * shard. Scale: one hash-partitioned sort per shard (the window); size
    * nShards so a shard fits an executor's write task (100 TB / ~1 GiB
    * shards → ~10⁵ shards, each sort tiny). When only shard FILES are
    * needed (no position column), skip the window entirely:
    * `df.repartition(nShards, shardCol).sortWithinPartitions(orderCol)`
    * writes the same order map-side. */
  /** Gopher quality-rule gate (Rae et al. 2021, appendix A1.1 — the
    * published heuristic suite C4/MassiveText-descended pipelines run):
    * per document, `keep` plus the FIRST failing rule's name
    * (`fail_reason`, null when kept), so rejects are auditable:
    *
    *  - word_count: 50 ≤ whitespace words ≤ 100 000
    *  - mean_word_length: mean characters per word in [3, 10]
    *  - symbol_ratio: (# + …/...) occurrences / words < 0.1
    *  - alpha_fraction: > 80 % of words contain a letter
    *  - stopwords: ≥ 2 of {the, be, to, of, and, that, have, with}
    *
    * The paper's repetition gates (dup lines/n-grams) are the separate
    * [[repetitionStats]] — compose both for the full MassiveText filter.
    * Pure codegen'd regexp counts, map-only; thresholds are the paper's.
    */
  /** [[gopherFilter]]'s first-failing-rule name as a pure Column (null =
    * all rules pass) — the single definition the standalone filter and
    * [[massiveTextFilter]]'s fused pass share. Stopword presence is
    * TOKEN MEMBERSHIP over the \S+ tokens, not a regex \b test: Java's
    * \b (engine) and RE2's (DuckDB and most scanners) disagree on
    * non-ASCII word boundaries ("thé" matches RE2's \bthe\b but not
    * Java's), while token equality is bit-identical in every engine; the
    * cost is that a stopword glued to punctuation ("and,") doesn't count
    * toward the ≥2-distinct presence test. */
  def gopherReason(t: Column, minWords: Int = 50,
      maxWords: Int = 100000): Column = {
    // one tokenization serves the word count AND the stopword test
    // (lowercasing cannot change whitespace, so size(tokens) ≡ tokenCount)
    val tk = tokens(t)
    val nWords = size(tk).cast("double")
    val meanLen = matchCount(t, "\\S").cast("double") / nWords
    val symbols = matchCount(t, "#|\\.\\.\\.|…").cast("double")
    val alphaWords = matchCount(lower(t), "\\S*[a-z]\\S*").cast("double")
    // "at least two of the following words" = two DISTINCT stopwords
    // present, not two occurrences of one
    val stops = Stopwords8.map(w => array_contains(tk, w).cast("int")).reduce(_ + _)
    // NULL text fails closed (word_count), like the empty string — a
    // quality gate must never admit a document with no text
    when(t.isNull || nWords < minWords || nWords > maxWords, "word_count")
      .when(meanLen < 3.0 || meanLen > 10.0, "mean_word_length")
      .when(symbols / nWords >= 0.1, "symbol_ratio")
      .when(alphaWords / nWords <= 0.8, "alpha_fraction")
      .when(stops < 2, "stopwords")
  }

  /** The paper's 8-word stopword presence list. */
  val Stopwords8: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val reason = gopherReason(col(textCol), minWords, maxWords)
    df.select(col(idCol), reason.isNull.as("keep"), reason.as("fail_reason"))
  }

  /** Repetition gate over [[repetitionStats]]' signals — thresholds from
    * Rae et al. 2021 Table A1 applied to this engine's WORD-level
    * fractions (the paper normalizes its duplicate-n-gram rules by
    * characters; same signal, different denominator — an explicit
    * adaptation, not a claim of bit-parity with MassiveText). First
    * failing rule wins: dup_word_frac ≤ 0.30, dup_2gram_frac ≤ 0.20,
    * dup_3gram_frac ≤ 0.18, max_2gram_frac ≤ 0.20. */
  /** Repetition-gate reason over [[repetitionStats]]' output columns
    * (null = all gates pass). `no_text` fails closed on null/zero-token
    * documents — the standalone filter must never admit a no-text doc
    * (same invariant as [[gopherReason]]'s word_count). */
  private def repetitionReason(maxDupWordFrac: Double, maxDup2GramFrac: Double,
      maxDup3GramFrac: Double, maxTop2GramFrac: Double): Column =
    // null ids FAIL CLOSED: per-doc aggregation (the top-2-gram share)
    // cannot be computed for a null key — all null-id rows pool into one
    // group and the left join hands them a fabricated 0.0 — so a verdict
    // operator must reject, not silently fail-open the max_2gram gate
    when(col("doc_id").isNull, "no_id")
      .when(col("n_tokens").isNull || col("n_tokens") === 0, "no_text")
      .when(col("dup_word_frac") > maxDupWordFrac, "dup_word_frac")
      .when(col("dup_2gram_frac") > maxDup2GramFrac, "dup_2gram_frac")
      .when(col("dup_3gram_frac") > maxDup3GramFrac, "dup_3gram_frac")
      .when(col("max_2gram_frac") > maxTop2GramFrac, "max_2gram_frac")

  def repetitionFilter(df: DataFrame, idCol: String, textCol: String,
      maxDupWordFrac: Double = 0.30, maxDup2GramFrac: Double = 0.20,
      maxDup3GramFrac: Double = 0.18, maxTop2GramFrac: Double = 0.20): DataFrame = {
    val reason = repetitionReason(maxDupWordFrac, maxDup2GramFrac,
      maxDup3GramFrac, maxTop2GramFrac)
    repetitionStats(df, idCol, textCol)
      .select(col("doc_id").as(idCol), reason.isNull.as("keep"),
        reason.as("fail_reason"))
  }

  /** The full heuristic document filter (Gopher/MassiveText shape):
    * [[gopherFilter]]'s quality rules, then [[repetitionFilter]]'s
    * repetition gates — one (id, keep, fail_reason) verdict per document,
    * quality reasons taking precedence. The standard pre-dedup gate of a
    * pretraining pipeline; compose with the dedup/decontamination
    * operators for the end-to-end curation loop (see the t40 composite).
    *
    * ONE pass: the gopher reason is a map-only column carried through the
    * repetition pass's tokenizing projection — no second corpus scan, no
    * id-keyed join of two verdict frames (and so no row loss on null ids
    * either). Thresholds forward to both rule families. */
  def massiveTextFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      maxDupWordFrac: Double = 0.30, maxDup2GramFrac: Double = 0.20,
      maxDup3GramFrac: Double = 0.18, maxTop2GramFrac: Double = 0.20): DataFrame = {
    val fused = repetitionStatsCarry(df, idCol, textCol,
      Seq("_g_reason" -> gopherReason(col(textCol), minWords, maxWords)))
    val reason = coalesce(col("_g_reason"),
      repetitionReason(maxDupWordFrac, maxDup2GramFrac,
        maxDup3GramFrac, maxTop2GramFrac))
    fused.select(col("doc_id").as(idCol), reason.isNull.as("keep"),
      reason.as("fail_reason"))
  }

  /** [[shuffleShards]]'s order key as a standalone Column — the single
    * definition behind the Scala operator and the `graft_shard` SQL
    * function (shard = shardOrder mod nShards). */
  def shardOrder(id: Column, seed: Column): Column =
    hashBucket(concat_ws(":", id, seed), lit(1 << 30))

  /** Deterministic shard assignment: [[shardOrder]] mod `nShards`. Fails
    * fast (raise_error, evaluated lazily per branch) on nShards ≤ 0 —
    * the SQL surface (`graft_shard`) has no static require, and pmod
    * would otherwise throw DIVIDE_BY_ZERO mid-job under ANSI or return
    * all-NULL shards without it. */
  def shardOf(id: Column, seed: Column, nShards: Column): Column = {
    val n = nShards.cast("long")
    when(n <= 0, raise_error(
        concat(lit("graft_shard: nShards must be positive, got "), n.cast("string")))
      .cast(IntegerType))
      .otherwise(pmod(shardOrder(id, seed).cast("long"), n).cast(IntegerType))
  }

  def shuffleShards(df: DataFrame, idCol: String, seed: Long,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val ord = shardOrder(col(idCol), lit(seed))
    val shard = shardOf(col(idCol), lit(seed), lit(nShards))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("_ord"), col(idCol))
    df.select(col(idCol), ord.as("_ord"), shard.as("shard"))
      .withColumn("position", row_number().over(w).cast("long"))
      .drop("_ord")
  }

  /** Keep `fraction` of rows, deterministically by id hash. Map-side
    * filter: no shuffle, no RNG state. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
      buckets: Int = 10000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    df.where(hashBucket(col(idCol), buckets) < math.round(fraction * buckets).toInt)
  }

  /** Stratified deterministic sampling: per-stratum keep fractions (the
    * corpus-rebalancing primitive — e.g. keep all low-resource-language
    * documents but 5% of English). Strata not listed keep `default`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], default: Double = 0.0,
      buckets: Int = 10000): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), buckets) < round(frac * buckets).cast(IntegerType))
  }

  // --------------------------------------------- benchmark decontamination
  /**
   * Benchmark decontamination (the GPT-3 appendix C / PaLM recipe): per
   * training document, how many of its distinct word n-grams appear
   * anywhere in a benchmark/eval corpus — documents with any hit are
   * "contaminated" and dropped or flagged before pretraining. n = 13 is
   * the published default; small n only for tiny test corpora.
   *
   * Scale shape: both sides explode to distinct n-gram keys; the benchmark
   * gram set (small — eval suites are MBs, not TBs) is deduped and the
   * training grams left-semi join against it — Spark broadcasts the small
   * side automatically, so the 100 TB training scan never shuffles; the
   * per-doc rollup is a map-side-combining count keyed by doc id.
   *
   * `gramKey` maps a gram string to the join key: default md5 (portable,
   * collision-free at any corpus size for 128 bits); pass `xxhash64(_)`
   * to halve the key bytes when cross-engine reproducibility is not
   * needed.
   */
  def contaminationStats(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 13,
      gramKey: Column => Column = md5(_)): DataFrame = {
    // Empty-string grams (zero-token documents shingle to [""]) are noise,
    // not contamination — a blank line in the eval file must not flag every
    // blank training doc. Truncated grams from 1..n-1-token documents stay:
    // a whole short doc appearing verbatim in the benchmark IS a hit.
    def gramKeys(df: DataFrame, cols: Seq[Column]): DataFrame = df
      .select((cols :+ tokens(col(textCol)).as("tk")): _*)
      .select((cols :+ explode_outer(wordShinglesFromTokens(col("tk"), n)).as("g")): _*)
      .where(col("g").isNotNull && col("g") =!= "")
      .select((cols :+ gramKey(col("g")).as("h")): _*)
    val tg = gramKeys(Par.widen(train), Seq(col(idCol).as("doc_id")))
    val bg = gramKeys(Par.widen(bench), Seq.empty).distinct()
    // ONE pass over the training grams: Catalyst does not share subplans
    // across separate aggregates, so a totals-agg + semi-join-agg pair
    // would tokenize and hash the whole training corpus twice. The
    // broadcast left join tags hits; both counts come from one map-side-
    // combining aggregate.
    tg.join(bg.withColumn("_hit", lit(1)), Seq("h"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_grams"),
        count(col("_hit")).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        (col("n_contaminated") > 0L).as("contaminated"))
  }

  // ------------------------------------------- cross-document line dedup
  /** Normalized line hash used by [[dedupLines]] — md5 of the trimmed,
    * lowercased line, reproducible in any engine with md5. */
  def lineHash(line: Column): Column = md5(trim(lower(line)))

  /**
   * Cross-document line-level dedup (the CCNet recipe, Wenzek et al. 2020,
   * arXiv:1911.00359 §3.1): a line whose normalized hash appears in
   * ≥ `minDocs` DISTINCT documents is boilerplate (navigation, cookie
   * banners, license headers) and is removed from every document; each
   * document's surviving lines are reassembled in original order.
   *
   * Scale shape: explode to (doc, pos, line) → distinct-doc count per line
   * hash (map-side-combining partial aggregate — the hot keys are exactly
   * the boilerplate lines, which partial agg collapses per task) →
   * left-anti join the exploded lines against the ≥minDocs hash set (a
   * key-partitioned shuffle on the hash; no row ever reaches the driver)
   * → regroup by doc with an order-restoring sort. Per-doc memory is one
   * document's lines — the same bound as reading the row.
   *
   * Returns (doc_id, n_lines, n_kept, kept_text): null text stays null.
   */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    // Null-text docs keep their explode_outer row (null pos/line) so they
    // surface as (null, null, null) without a separate corpus scan.
    val lines = Par.widen(df)
      .select(col(idCol).as("doc_id"), posexplode_outer(split(col(textCol), "\n")))
      .withColumnRenamed("col", "line")
      .withColumn("h", lineHash(col("line")))
    val common = lines.where(col("line").isNotNull).groupBy("h")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= minDocs)
      .select("h")
    // One doc-keyed aggregate computes totals AND the kept reassembly: the
    // left join tags common lines (null h never matches: null-line rows
    // stay untagged and are excluded by the isNotNull guards). `lines` is
    // still evaluated twice (common + here) — the same two-pass shape as
    // every derived-key dedup; what this avoids is a THIRD pass re-reading
    // and re-splitting the raw corpus just for n_lines plus its join.
    val isKept = col("_c").isNull && col("line").isNotNull
    lines.join(common.withColumn("_c", lit(1)), Seq("h"), "left")
      .groupBy("doc_id").agg(
        max(col("line").isNotNull).as("_has"),
        count(col("line")).cast(LongType).as("_nl"),
        count(when(isKept, 1)).cast(LongType).as("_nk"),
        concat_ws("\n",
          transform(array_sort(collect_list(when(isKept, struct(col("pos"), col("line"))))),
            s => s.getField("line"))).as("_kt"))
      .select(col("doc_id"),
        when(col("_has"), col("_nl")).as("n_lines"),
        when(col("_has"), col("_nk")).as("n_kept"),
        when(col("_has"), col("_kt")).as("kept_text"))
  }

  // ---------------------------------------------- document chunking
  /**
   * PER-DOCUMENT sliding-window chunking: each document's token stream is
   * cut into `chunkTokens`-token windows advancing by
   * `chunkTokens − overlapTokens` (the HF-tokenizers "stride" convention:
   * a window starts at every stride multiple < doc length, so tails
   * shorter than a full window are emitted, and empty documents emit
   * nothing). The complement of [[packSequences]]: packing concatenates
   * ACROSS documents for pretraining batches; chunking splits WITHIN a
   * document for context-window-bounded indexing/embedding (RAG) while
   * the overlap preserves cross-boundary context.
   *
   * Map-only: tokenize → per-row window arithmetic → posexplode. No
   * shuffle, no state — scales linearly with corpus size.
   * Returns (idCol, chunk_idx, chunk_text, n_tokens).
   */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens): $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = Par.widen(df)
      .select(col(idCol).as("_cid"), tokens(col(textCol)).as("tk"))
    val nChunks = (floor((size(col("tk")) - 1) / stride) + 1).cast(IntegerType)
    // guard the empty case explicitly: sequence(0, -1) would NOT be empty
    // (Spark infers a negative step), so build no windows for no tokens
    val chunks = when(size(col("tk")) <= 0,
        array().cast(ArrayType(ArrayType(StringType))))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => slice(col("tk"), i * stride + 1, lit(chunkTokens))))
    toks.select(col("_cid"), posexplode(chunks).as(Seq("chunk_idx", "ck")))
      .select(col("_cid").as(idCol), col("chunk_idx"),
        concat_ws(" ", col("ck")).as("chunk_text"),
        size(col("ck")).as("n_tokens"))
  }

  // ------------------------------------------------- sequence packing
  /**
   * Pretraining sequence packing ("concat and chunk"): documents are laid
   * out in id order as one token stream and cut into fixed `ctxLen`
   * windows; each document's placement is (start_offset, first/last pack
   * id). Deterministic — the same corpus packs identically on any engine
   * or cluster layout.
   *
   * Scale shape: a global prefix sum WITHOUT a global-order window (which
   * would collapse to one task). Range-partition by id, per-partition
   * running totals, then one metadata-sized collect of per-partition sums
   * whose prefix offsets shift each partition — the classic two-pass
   * distributed scan. Result is independent of where the range boundaries
   * land, so the sampling-based partitioner cannot perturb it.
   */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      ctxLen: Int): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive: $ctxLen")
    import org.apache.spark.sql.expressions.Window
    // Materialized eagerly: the range partitioner SAMPLES (nondeterministic
    // boundaries), and the _pid-keyed offsets below must be read from the
    // exact partitioning they were computed on — a recompute could land
    // rows in different partitions.
    val counted = Par.materialize(df
      .select(col(idCol).as("doc_id"),
        coalesce(tokenCount(col(textCol)), lit(0L)).as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("_pid", spark_partition_id()))
    // Metadata-sized collect: one row per partition → prefix offsets,
    // rejoined as a BROADCAST frame keyed by _pid. (A when-chain literal
    // would be O(#partitions) work per row and a partition-count-deep
    // expression tree — pathological at thousands of shuffle partitions.)
    val perPid = counted.groupBy("_pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val prefix = perPid.map(_._1).zip(
      perPid.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = broadcast(prefix.toSeq.toDF("_pid", "_offset"))
    val w = Window.partitionBy("_pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    counted
      .join(offsets, Seq("_pid"), "left")
      .withColumn("start_offset",
        coalesce(sum("n_tokens").over(w), lit(0L)) + coalesce(col("_offset"), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        floor(col("start_offset") / ctxLen).cast(LongType).as("pack_first"),
        floor((col("start_offset") + greatest(col("n_tokens"), lit(1L)) - 1L) / ctxLen)
          .cast(LongType).as("pack_last"))
  }

  /** Vocabulary building: corpus token frequencies → top-K vocab — the
    * seed step of BPE/WordPiece tokenizer training over a training corpus.
    * Scale shape: explode → hash-agg is map-side combinable (partial counts
    * collapse before the shuffle, so shuffled rows ≈ distinct tokens per
    * partition, not corpus tokens) and the final top-K plans as
    * TakeOrderedAndProject — no global sort ever materializes. Ties at the
    * cut break by token text so the selected SET is deterministic. */
  def buildVocab(df: DataFrame, textCol: String, topK: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).cast(LongType).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(topK)

  /** Per-document text-statistics projection. */
  def textStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val c = col(textCol)
    df.select(
      col(idCol),
      length(c).cast(LongType).as("n_chars"),
      tokenCount(c).as("n_tokens"),
      bpeTokenCount(c).as("n_bpe_tokens"),
      matchCount(c, "[A-Za-z]+").as("n_words"),
      matchCount(c, "[^A-Za-z0-9\\s]").as("n_punct"),
      langId(c).as("pred_lang"),
      qualityBucket(c).as("quality"),
      fingerprint(c).as("fingerprint"))
  }
}
