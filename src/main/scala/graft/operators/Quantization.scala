package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Product quantization for embedding columns (Jégou, Douze, Schmid:
 * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) — the
 * memory-scale path for ANN beyond [[Similarity.ivfTopK]]:
 *
 *  - vectors are L2-NORMALIZED, split into `m` subvectors, and each
 *    subvector is vector-quantized against its own `k`-centroid codebook →
 *    a d-dim float vector becomes `m` small codes (512 B → 8 B at
 *    d=64, m=8): at 100 TB of raw embeddings the code table is ~1.5 TB and
 *    fits a modest cluster's memory, which is the entire point;
 *  - search is IVF-routed (equi-join on the coarse centroid id — candidate
 *    generation identical to [[Similarity.ivfTopK]], never all-pairs) and
 *    scored by ADC (asymmetric distance computation): the query keeps its
 *    full precision, each candidate costs `m` table lookups + codegen'd
 *    8-dim dot products, and NO corpus vector is ever read during the
 *    scan — only the final rerank joins the top candidates' vectors back.
 *
 * Since inputs are normalized, the ADC inner-product sum approximates
 * cosine directly. All assignment/score arithmetic is deterministic
 * (left-to-right dots, ties to the lowest centroid id) so iters=0
 * codebooks are reproducible by an external SQL oracle — the same
 * contract as [[Similarity.trainCentroids]].
 *
 * Reference scope note: the reference engine ships no ANN/embedding ops;
 * this extends the LLM-pipeline operator family the builder prompt
 * requires (dedup/similarity at corpus scale).
 */
object Quantization {

  import Similarity.{dot => sdot}

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Codebook as ONE array<array<double>> literal — not k×ds inlined scalar
    * constants (janino-compile-time valve, same note as Similarity's
    * codebookLit). */
  private def cbLit(cb: Array[Array[Double]]): Column = typedLit(cb.map(_.toSeq).toSeq)

  /**
   * Per-vector symmetric int8 scalar quantization — the embedding STORAGE
   * step (4× smaller than float32; the standard vector-store layout):
   * scale = max|x| / 127, q_i = round(x_i / max|x| · 127) ∈ [−127, 127],
   * reconstruction x̂_i = q_i · scale. An all-zero vector quantizes to all
   * zeros with scale 0 (no NaN leaks from the 0/0).
   *
   * Returns EXPLODED rows (id, pos 1-based, q, scale) rather than an
   * array column, one row per element — map-only (posexplode, no shuffle,
   * no collect), so it pipelines into a columnar write at any corpus size.
   * Math is all-double with IEEE-exact steps (float→double widening,
   * max, one divide, one multiply, round-half-away-from-zero), so any
   * engine replaying the formula reproduces q bit-for-bit.
   */
  def int8Quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // maxabs projected as an attribute FIRST — inline inside the per-element
    // expression it would re-evaluate per element (lambda subexpr rule).
    df.select(col(idCol), asDouble(col(vecCol)).as("_e"))
      .withColumn("_ma", array_max(transform(col("_e"), x => abs(x))))
      .select(col(idCol), col("_ma"), posexplode(col("_e")).as(Seq("_p", "_x")))
      .select(
        col(idCol),
        (col("_p") + 1).cast(IntegerType).as("pos"),
        when(col("_ma") === 0d, 0)
          .otherwise(round(col("_x") / col("_ma") * 127d))
          .cast(IntegerType).as("q"),
        when(col("_ma") === 0d, 0d).otherwise(col("_ma") / 127d).as("scale"))
  }

  private val ScoreStruct = StructType(Seq(
    StructField("s", DoubleType), StructField("negi", IntegerType)))

  /** Normalized vector column: projects `nrm` FIRST so the lambda divides
    * by an attribute — an inline sqrt(dot) subtree inside the HOF would
    * re-evaluate per element (lambdas are excluded from subexpression
    * elimination). */
  private def withNormalized(df: DataFrame, vecCol: Column): DataFrame =
    df.withColumn("_v", asDouble(vecCol))
      .withColumn("_nrm", sqrt(sdot(col("_v"), col("_v"))))
      .withColumn("_vn", transform(col("_v"), x => x / col("_nrm")))
      .drop("_v", "_nrm")

  /** Project the m slices of `_vn` as their OWN columns (attributes), so
    * the per-centroid assignment lambda and the ADC terms reference cheap
    * attributes instead of re-slicing per evaluation. */
  private def withSlices(df: DataFrame, m: Int, ds: Int, prefix: String): DataFrame =
    (0 until m).foldLeft(df)((d, j) =>
      d.withColumn(s"$prefix$j", slice(col("_vn"), j * ds + 1, ds)))

  /** Nearest sub-centroid CODE by L2 on normalized slices: argmin ‖x−c‖² =
    * argmin (‖c‖² − 2·x·c) since ‖x‖ is constant per row — ties to the
    * lowest code. The codebook rides as one literal; each lambda term is a
    * codegen'd dot kernel evaluation. */
  private def nearestCode(sliceCol: Column, cb: Array[Array[Double]]): Column = {
    val cn = typedLit(cb.map(c => c.map(x => x * x).sum).toSeq) // ‖c‖² per code
    array_max(transform(cbLit(cb), (cv, i) =>
      struct(sdot(sliceCol, cv) * 2 - element_at(cn, i + 1), -i).cast(ScoreStruct)))
      .getField("negi") * -1
  }

  /**
   * Train the `m` sub-quantizer codebooks (k codes each) with the same
   * deterministic Lloyd's as the IVF coarse codebook: init = normalized
   * slices of the `k` lowest-id vectors, `iters` assign/mean rounds per
   * subspace, hash-sampled training set persisted once. Requires
   * dim % m == 0.
   */
  def trainPQ(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
      iters: Int = 0, trainFraction: Double = 1.0): Seq[Array[Array[Double]]] = {
    require(m >= 1 && k >= 1)
    require(trainFraction > 0 && trainFraction <= 1.0)
    val all = withNormalized(
      df.select(col(idCol).as("id"), col(vecCol).as("_raw")), col("_raw"))
      .where(col("_vn").isNotNull).select(col("id"), col("_vn"))
    val dim = all.select(size(col("_vn"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val ds = dim / m
    val base =
      if (trainFraction >= 1.0) all
      else all.where(
        TextOps.hashBucket(col("id"), 10000) < math.round(trainFraction * 10000).toInt)
    val cached = base.persist()
    try {
      (0 until m).map { j =>
        val sub = cached.select(col("id"), slice(col("_vn"), j * ds + 1, ds).as("v"))
        var cb = sub.orderBy("id").limit(k).collect().map(_.getSeq[Double](1).toArray)
        require(cb.nonEmpty, "cannot train PQ on an empty corpus")
        for (_ <- 0 until iters) {
          val means = sub
            .select(nearestCode(col("v"), cb).as("c"), posexplode(col("v")).as(Seq("pos", "x")))
            .groupBy("c", "pos").agg(avg(col("x")).as("mu"))
            .groupBy("c").agg(map_from_arrays(
              collect_list(col("pos")), collect_list(col("mu"))).as("byPos"))
            .collect().map(r => r.getInt(0) -> r.getMap[Int, Double](1)).toMap
          cb = cb.zipWithIndex.map { case (old, i) =>
            means.get(i) match {
              case Some(byPos) => old.indices.map(p => byPos.getOrElse(p, old(p))).toArray
              case None => old
            }
          }
        }
        cb
      }
    } finally { cached.unpersist(); () }
  }

  /** Encode every vector to its m PQ codes — map-only (codebooks are
    * inlined literals; no join, no shuffle). Output: (id, codes array<int>). */
  def encodePQ(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.size
    val dim = codebooks.map(_.head.length).sum
    val ds = dim / m
    val sliced = withSlices(withNormalized(
      df.select(col(idCol).as("id"), col(vecCol).as("_raw")), col("_raw"))
      .where(col("_vn").isNotNull), m, ds, "_s")
    sliced.select(col("id"),
      array((0 until m).map(j => nearestCode(col(s"_s$j"), codebooks(j).toArray)): _*)
        .as("codes"))
  }

  /**
   * IVF-PQ top-k: coarse-route (equi-join on centroid id, exactly
   * [[Similarity.ivfTopK]]'s candidate shape), ADC-score each candidate
   * from its codes alone — Σⱼ q_slice·codebook_j[code_j], m codegen'd dot
   * terms, no HOF, no corpus vector touched — then exact-cosine rerank of
   * the top `k·refine` ADC candidates per query. Set refine=0 to skip the
   * rerank and rank directly by the (rounded) ADC score — the
   * oracle-reproducible mode.
   */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, coarse: Array[Array[Double]], codebooks: Seq[Array[Array[Double]]],
      nprobe: Int = 4, refine: Int = 4): DataFrame = {
    require(coarse.nonEmpty && codebooks.nonEmpty && nprobe >= 1 && k >= 1)
    val m = codebooks.size
    val dim = codebooks.map(_.head.length).sum
    val ds = dim / m

    // corpus side: id, coarse list id, PQ codes — the compact index frame.
    // (At rest this is what a 100 TB corpus keeps hot; vectors stay cold.)
    val enc = Par.widen(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("_raw"))
    val indexed = withSlices(withNormalized(enc, col("_raw"))
        .where(col("_vn").isNotNull), m, ds, "_s")
      .select(col("neighbor_id"),
        Similarity.nearestCid(col("_vn"), coarse).as("cid"),
        array((0 until m).map(j => nearestCode(col(s"_s$j"), codebooks(j).toArray)): _*)
          .as("codes"))

    // query side: full normalized vector + exploded probe lists
    val q = withNormalized(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("_raw")), col("_raw"))
      .where(col("_vn").isNotNull)
      .select(col("query_id"), col("_vn").as("qvn"),
        explode(Similarity.probeCids(col("_vn"), coarse, nprobe)).as("cid"))

    // ADC as ONE codegen'd dot against the concatenated reconstruction
    // (codebook slices looked up by code, in subvector order): a single
    // left-to-right d-dim loop — the exact FP summation sequence of
    // DuckDB's list_dot_product over the same reconstruction, so the
    // refine=0 mode is oracle-reproducible bit-for-bit. (Summing m
    // separate sub-dots would regroup the additions.)
    val recon = concat((0 until m).map(j =>
      element_at(cbLit(codebooks(j).toArray), element_at(col("codes"), j + 1) + 1)): _*)
    val adc = sdot(col("qvn"), recon)
    val cand = indexed.join(q, Seq("cid"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc", round(adc, 9))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc").desc, col("neighbor_id"))

    if (refine <= 0)
      cand.withColumn("rank", row_number().over(wAdc))
        .where(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast(IntegerType).as("rank"))
    else {
      val top = cand.withColumn("arank", row_number().over(wAdc))
        .where(col("arank") <= k * refine)
        .select("query_id", "neighbor_id")
      val cv = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("ce"))
      val qv = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qe"))
      val wCos = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      top.join(cv, Seq("neighbor_id")).join(qv, Seq("query_id"))
        .withColumn("cos", round(Similarity.cosine(col("qe"), col("ce")), 9))
        .withColumn("rank", row_number().over(wCos))
        .where(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast(IntegerType).as("rank"))
    }
  }
}
