package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Data-SELECTION operators for training-corpus curation — which documents
 * to keep, ranked by how much they look like a target distribution or a
 * quality standard:
 *
 *  - DSIR importance weights (Xie et al., "Data Selection for Language
 *    Models via Importance Resampling", NeurIPS 2023): hashed n-gram
 *    bag-of-words generative models of a small TARGET corpus and the RAW
 *    corpus; each raw document scores the log importance ratio of its
 *    grams. The two models are `dim`-sized count arrays — metadata no
 *    matter the corpus size — so scoring is a broadcast-literal lookup.
 *  - A fastText-style quality classifier (Joulin et al. 2016, the shape
 *    GPT-3/CCNet used for quality filtering): logistic regression over
 *    mean hashed-unigram features. Training runs on the labeled subset
 *    via Spark MLlib; SCORING is a pure Column plan over the broadcast
 *    weight vector — map-only, codegen'd, no MLlib on the hot path.
 *
 * Both hash grams with the engine-portable md5 bucket
 * ([[TextOps.hashBucket]]), so scores are bit-reproducible across engines
 * and reruns — selection decisions are auditable forever.
 *
 * Scale shape: model building aggregates to `dim` rows (driver-safe at any
 * corpus size); scoring is explode → map-side-combined sum keyed by doc —
 * one shuffle whose payload is (id, partial sum), never the text.
 */
object Selection {

  /** One row per gram position, INCLUDING the `""` empty-slice artifact a
    * gramless (empty/null-text) document emits — every doc contributes
    * ≥ 1 row, which lets [[scoreByBucketWeight]] keep all docs through a
    * single aggregate with no join-back. Word n-grams for n = 1..maxGram
    * over whitespace tokens; a doc shorter than n contributes its full
    * token span once per n (same convention as the DuckDB oracle slice
    * `tk[i:i+n-1]`). */
  private def gramRows(df: DataFrame, idCol: String, textCol: String,
      maxGram: Int): DataFrame = {
    val toks = Par.widen(df)
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("tk"))
    val gramArrays = (1 to maxGram).map { n =>
      transform(
        sequence(lit(1), greatest(size(col("tk")) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(col("tk"), i, lit(n))))
    }
    toks.select(col("id"), explode(concat(gramArrays: _*)).as("g"))
  }

  /** One row per gram OCCURRENCE (bag-of-words, not a set) — [[gramRows]]
    * with the empty-slice artifacts dropped. */
  private def gramOccurrences(df: DataFrame, idCol: String, textCol: String,
      maxGram: Int): DataFrame =
    gramRows(df, idCol, textCol, maxGram).where(col("g") =!= "")

  /** `dim`-sized occurrence-count array of a corpus's hashed grams —
    * the bag-of-words language model both DSIR sides use. Distributed
    * aggregate to ≤ dim rows, then a driver-side array. */
  private def gramCounts(df: DataFrame, idCol: String, textCol: String,
      dim: Int, maxGram: Int): Array[Long] =
    gramCountsFromRows(gramRows(df, idCol, textCol, maxGram), dim)

  /** [[gramCounts]] over a PRE-BUILT (id, g) gram frame — lets a caller
    * that must also SCORE the same corpus share one tokenize+gram pass
    * (persisted) instead of re-running the regexp tokenizer per consumer. */
  private def gramCountsFromRows(grams: DataFrame, dim: Int): Array[Long] = {
    val counts = grams.where(col("g") =!= "")
      .select(TextOps.hashBucket(col("g"), dim).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect()
    val arr = new Array[Long](dim)
    counts.foreach(r => arr(r.getAs[Int]("bucket")) = r.getAs[Long]("n"))
    arr
  }

  /** Per-document DSIR log importance weight of `raw` toward `target`:
    * `Σ_grams [ln p̂_target(b) − ln p̂_raw(b)]` with add-1 smoothing over
    * `dim` hashed buckets (unigrams + bigrams by default, the paper's
    * feature set). Higher = more target-like. Output `(idCol, log_weight)`
    * with the weight rounded to 6 decimals (engine-portable float
    * contract). Two passes over `raw` (model, then score) — the score pass
    * is explode + one map-side-combined sum per doc. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, dim: Int = 4096, maxGram: Int = 2): DataFrame = {
    require(dim > 0, "dim must be positive")
    val tgt = gramCounts(target, idCol, textCol, dim, maxGram)
    // fail fast like bm25TopK's empty-corpus guard: an accidentally
    // emptied target would otherwise degenerate every weight to an
    // inverse-raw-frequency score that SELECTS the junkiest documents
    require(tgt.sum > 0, "dsirWeights: target corpus has no grams")
    // ONE tokenize+gram pass over `raw` (round-16): the raw-model count and
    // the score pass consume the SAME (id, g) stream, but as separate
    // actions Catalyst shares nothing — the regexp tokenizer and the gram
    // transforms re-ran per pass (2× the corpus-sized work; the model pass
    // additionally cannot start the score until its collect returns, so the
    // repeat is pure serial wall time). Persist the gram stream across the
    // two actions; the score output is tiny and eagerly materialized so the
    // persist frees deterministically (Dedup's persist+materialize shape).
    val rawGrams = gramRows(raw, idCol, textCol, maxGram)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bg = gramCountsFromRows(rawGrams, dim)
    val tgtTot = tgt.sum.toDouble + dim
    val bgTot = bg.sum.toDouble + dim
    val logRatio: Array[Double] = Array.tabulate(dim)(b =>
      math.log((tgt(b) + 1) / tgtTot) - math.log((bg(b) + 1) / bgTot))
    val res = Par.materialize(
      scoreGramRows(rawGrams, logRatio)
        .select(col("id").as(idCol),
          round(coalesce(col("w_sum"), lit(0.0)), 6).as("log_weight")))
    rawGrams.unpersist(blocking = false)
    res
  }

  /** DSIR selection: keep the `k` raw documents with the highest
    * `log_weight + Gumbel(τ)` — the paper's importance RESAMPLING, with
    * deterministic per-doc Gumbel noise derived from the md5 id hash so
    * the selected set is reproducible across runs and engines.
    * `temperature = 0` degenerates to plain top-k by weight. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, dim: Int = 4096, maxGram: Int = 2,
      temperature: Double = 1.0): DataFrame = {
    val w = dsirWeights(raw, target, idCol, textCol, dim, maxGram)
    // uniform OPEN-interval (0,1) from the 8-hex-digit md5 bucket: the
    // +0.5 midpoint keeps u off BOTH endpoints — at u=1, -log(-log(u))
    // hits Spark's log(0) = NULL and the doc would silently never be
    // selectable; at u=0 the outer log gets -inf
    val u = (TextOps.hashBucket(col(idCol), 1 << 30).cast(DoubleType) + 0.5) /
      (1 << 30).toDouble
    val keyCol =
      if (temperature == 0.0) col("log_weight")
      else col("log_weight") + lit(temperature) * -log(-log(u))
    // top-k by key: TakeOrderedAndProject (no global sort materialization)
    w.orderBy(keyCol.desc, col(idCol)).limit(k)
  }

  /** Corpus-distribution divergence over `dim` hashed gram buckets —
    * the mixing/drift observability a data pipeline runs before and after
    * every re-weighting: KL(P‖Q), KL(Q‖P) and Jensen–Shannon divergence
    * between the smoothed (add-1 over `dim` buckets) hashed-gram
    * distributions of two corpora. Same feature space as [[dsirWeights]]
    * (so "how far is my mix from the target" and "re-weight toward the
    * target" read the same model).
    *
    * Scale: each corpus reduces to a ≤ `dim`-row distributed aggregate
    * (the only corpus-sized work); the divergences are a dim-length driver
    * loop over two metadata-sized arrays. Returns ONE row
    * (kl_pq, kl_qp, jsd), each rounded to 6 decimals (engine-portable
    * float contract — summation drift ≪ 1e-6 at any dim). */
  def corpusDivergence(p: DataFrame, q: DataFrame, idCol: String,
      textCol: String, dim: Int = 4096, maxGram: Int = 2): DataFrame = {
    require(dim > 0, "dim must be positive")
    val pc = gramCounts(p, idCol, textCol, dim, maxGram)
    val qc = gramCounts(q, idCol, textCol, dim, maxGram)
    require(pc.sum > 0 && qc.sum > 0, "corpusDivergence: empty corpus")
    val pt = pc.sum.toDouble + dim
    val qt = qc.sum.toDouble + dim
    var klPq = 0.0; var klQp = 0.0; var jsd = 0.0
    var b = 0
    while (b < dim) {
      val pp = (pc(b) + 1) / pt
      val qq = (qc(b) + 1) / qt
      val m = (pp + qq) / 2
      klPq += pp * math.log(pp / qq)
      klQp += qq * math.log(qq / pp)
      jsd += 0.5 * pp * math.log(pp / m) + 0.5 * qq * math.log(qq / m)
      b += 1
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spark = p.sparkSession
    import spark.implicits._
    Seq((r6(klPq), r6(klQp), r6(jsd))).toDF("kl_pq", "kl_qp", "jsd")
  }

  /** Aligned (prev, cur, "prev cur") rows for every token position i ≥ 2 —
    * the bigram stream a conditional LM scores. Docs with < 2 tokens emit
    * nothing (no conditional exists). */
  private def bigramTriples(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Par.widen(df)
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("tk"))
    // The < 2-token guard lives INSIDE the generated expression (when +
    // explode_outer + drop-null-by-name), not as a `.where(size(tk) >= 2)`:
    // the where-form collapses into the token projection and gets pushed
    // BELOW the widening exchange as a filter that embeds the whole regexp
    // tokenizer — the tokenizer then runs serially on the 1-2-task scan
    // side and AGAIN in the projection above (observed in the t36 physical
    // plan; same InferFiltersFromGenerate pitfall signaturesOf documents).
    // A doc with < 2 tokens yields a null triple array → one null row from
    // explode_outer → dropped by name, inferring nothing.
    toks.select(col("id"), explode_outer(
        when(size(col("tk")) >= 2, transform(sequence(lit(2), size(col("tk"))),
          i => struct(
            element_at(col("tk"), i - 1).as("p"),
            element_at(col("tk"), i).as("c"),
            concat_ws(" ", element_at(col("tk"), i - 1), element_at(col("tk"), i)).as("g")))))
        .as("t"))
      .where(col("t").isNotNull)
      .select(col("id"), col("t.p").as("p"), col("t.c").as("c"), col("t.g").as("g"))
  }

  /** CCNet-style LANGUAGE-MODEL perplexity filtering (Wenzek et al. 2020
    * use a 5-gram KenLM; this is the hashed-bigram analog that needs no
    * external model): train an interpolated bigram model on `reference`
    * (the "clean" corpus — e.g. Wikipedia), score every doc in `docs` with
    * its per-token negative mean log-likelihood
    * `log_ppl = −mean_i ln[ λ·B(w_{i−1},w_i)/U(w_{i−1}) + (1−λ)·(U(w_i)+1)/(T+dimUni) ]`.
    * LOW log_ppl = fluent/reference-like; the standard keep-the-head
    * filter. Both count tables hash to fixed-size arrays (`dimUni`,
    * `dimBi`) — broadcast literals, so scoring is one explode + one
    * combinable aggregate regardless of corpus size. Docs with < 2 tokens
    * are not scored (no conditional exists). Output (idCol, log_ppl)
    * rounded to 6 decimals, engine-portable (md5 bucketing). */
  def lmPerplexity(docs: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, dimUni: Int = 4096, dimBi: Int = 16384,
      lambda: Double = 0.9): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda must be in (0,1)")
    val u = gramCounts(reference, idCol, textCol, dimUni, maxGram = 1)
    // an empty reference would flatten every doc to the same constant
    // log_ppl — the "keep the head" filter would keep an arbitrary subset
    require(u.sum > 0, "lmPerplexity: reference corpus has no tokens")
    val total = (u.sum + dimUni).toDouble
    val bRows = bigramTriples(reference, idCol, textCol)
      .select(TextOps.hashBucket(col("g"), dimBi).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n")).collect()
    val b = new Array[Long](dimBi)
    bRows.foreach(r => b(r.getAs[Int]("bucket")) = r.getAs[Long]("n"))
    val uCol = typedLit(u)
    val bCol = typedLit(b)
    val up = element_at(uCol, TextOps.hashBucket(col("p"), dimUni) + 1)
    val uc = element_at(uCol, TextOps.hashBucket(col("c"), dimUni) + 1)
    val bg = element_at(bCol, TextOps.hashBucket(col("g"), dimBi) + 1)
    val prob = lit(lambda) * when(up > 0, bg.cast(DoubleType) / up).otherwise(lit(0.0)) +
      lit(1 - lambda) * (uc + 1).cast(DoubleType) / lit(total)
    bigramTriples(docs, idCol, textCol)
      .select(col("id"), log(prob).as("term"))
      .groupBy("id").agg((-avg(col("term"))).as("raw"))
      .select(col("id").as(idCol), round(col("raw"), 6).as("log_ppl"))
  }

  /** Trained quality model: `dim`-bucket weight vector + intercept.
    * Plain data — serialize/broadcast it however you like. */
  final case class QualityModel(weights: Array[Double], intercept: Double) {
    def dim: Int = weights.length
  }

  /** Train the fastText-style quality classifier on a LABELED subset
    * (`labelCol` ∈ {0.0, 1.0}; 1 = high quality): logistic regression over
    * mean hashed-unigram count features, L2-regularized. The labeled set
    * is the small side (human/model judgments); MLlib's distributed
    * L-BFGS handles it at any size that fits the label budget. */
  def trainQualityClassifier(labeled: DataFrame, idCol: String,
      textCol: String, labelCol: String, dim: Int = 4096,
      regParam: Double = 1e-4, maxIter: Int = 50): QualityModel = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val grams = gramOccurrences(labeled, idCol, textCol, maxGram = 1)
      .select(col("id"), TextOps.hashBucket(col("g"), dim).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("n"))
    val features = grams.groupBy("id")
      .agg(collect_list(struct(col("bucket"), col("n"))).as("bn"),
        sum(col("n")).as("tot"))
    // vector assembly is a UDF — acceptable OFF the hot path (training
    // touches only the labeled subset); scoring stays UDF-free
    val toVec = udf((bn: Seq[org.apache.spark.sql.Row], tot: Long) => {
      val sorted = bn.map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      Vectors.sparse(dim, sorted.map(_._1).toArray,
        sorted.map(_._2.toDouble / tot).toArray)
    })
    val assembled = features.join(
        labeled.select(col(idCol).as("id"), col(labelCol).cast(DoubleType).as("label")),
        Seq("id"))
      .select(col("label"), toVec(col("bn"), col("tot")).as("features"))
    val model = new LogisticRegression()
      .setRegParam(regParam).setMaxIter(maxIter)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(assembled)
    QualityModel(model.coefficients.toArray, model.intercept)
  }

  /** Score every document with a trained (or fixed) quality model:
    * `sigmoid(intercept + mean_tokens weights[bucket(token)])`, rounded to
    * 6 decimals. Pure Column plan — the weight vector rides along as a
    * broadcast literal; per-doc work is explode + one combinable sum. A
    * document with no tokens scores `sigmoid(intercept)`. Output
    * `(idCol, quality)`. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
      model: QualityModel): DataFrame = {
    val scored = scoreByBucketWeight(docs, idCol, textCol, model.weights, maxGram = 1)
    val z = lit(model.intercept) +
      coalesce(col("w_sum") / col("n_grams"), lit(0.0))
    scored.select(col("id").as(idCol),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("quality"))
  }

  /** Shared scorer: per-doc `(w_sum, n_grams)` of `weights[bucket(gram)]`
    * over gram occurrences. Single explode → aggregate plan — ONE
    * exchange, no join-back: gramless documents survive because every doc
    * emits at least the `""` row ([[gramRows]]), which scores a null
    * weight (excluded from both the sum and the count). */
  private def scoreByBucketWeight(df: DataFrame, idCol: String,
      textCol: String, weights: Array[Double], maxGram: Int): DataFrame =
    scoreGramRows(gramRows(df, idCol, textCol, maxGram), weights)

  /** [[scoreByBucketWeight]] over a PRE-BUILT (id, g) gram frame (shared
    * tokenize pass — see dsirWeights). */
  private def scoreGramRows(grams: DataFrame, weights: Array[Double]): DataFrame = {
    val dim = weights.length
    val wCol: Column = typedLit(weights)
    grams
      .select(col("id"),
        when(col("g") === "", lit(null).cast(DoubleType))
          .otherwise(element_at(wCol, TextOps.hashBucket(col("g"), dim) + 1)).as("w"))
      .groupBy("id")
      .agg(sum(col("w")).as("w_sum"), count(col("w")).as("n_grams"))
  }
}
