package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Principal component analysis over embedding columns — the standard
 * pre-ANN dimensionality-reduction step for a 100 TB corpus (project
 * d=768-dim embeddings to the 64-128 dims that carry the variance before
 * MinHash/IVF/PQ indexing; Jégou et al., TPAMI 2011 recommend exactly this
 * in front of product quantization).
 *
 * Scale shape: the ONLY full-data work is one moment pass — a
 * `treeAggregate` that reduces every partition to (n, Σx, upper-triangular
 * Σxxᵀ), i.e. d(d+3)/2 + 1 doubles regardless of corpus size (d=1024 →
 * ~4 MB). The eigendecomposition runs on the driver over the d×d
 * covariance (milliseconds; no data touched), and projection is a pure
 * map-only Column plan over the inlined components — no shuffle, no join,
 * rides whole-stage codegen via [[graft.functions.DotProduct]].
 *
 * Determinism: the eigensolver is a fixed-sweep cyclic Jacobi with a
 * deterministic sign convention (each component's largest-|x| coordinate
 * is made positive), so two fits over the same data produce bit-identical
 * models and the projection is reproducible cross-run.
 */
object Pca {

  /** Fitted model: `components(k)` is the k-th principal axis (unit norm,
    * descending explained variance `eigenvalues(k)`); `mean` is the
    * per-dimension mean used for centering. */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Population mean + covariance of a vector column in ONE distributed
    * pass. Nulls and wrong-length vectors are rejected (a silent skip
    * would bias the moments). Returns (n, mean, cov) with cov dense
    * symmetric d×d. */
  private[graft] def moments(
      df: DataFrame, vecCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    val vecs = df.select(asDouble(col(vecCol)).as("v")).where(col("v").isNotNull)
      .rdd.map(_.getSeq[Double](0).toArray)
    // acc = [n | sum_0..d-1 | packed upper triangle of sum xxT]
    val zero: Array[Double] = null
    val agg = vecs.treeAggregate(zero)(
      seqOp = (acc0, x) => {
        val d = x.length
        val acc = if (acc0 != null) acc0 else new Array[Double](1 + d + d * (d + 1) / 2)
        require(acc.length == 1 + d + d * (d + 1) / 2,
          s"Pca.fit: ragged vector column — expected dim consistent with ${acc.length}, got $d")
        acc(0) += 1.0
        var i = 0
        var t = 1 + d
        while (i < d) {
          acc(1 + i) += x(i)
          var j = i
          while (j < d) { acc(t) += x(i) * x(j); t += 1; j += 1 }
          i += 1
        }
        acc
      },
      combOp = (a, b) =>
        if (a == null) b else if (b == null) a
        else {
          require(a.length == b.length, "Pca.fit: ragged vector column across partitions")
          var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
        })
    require(agg != null && agg(0) > 0, s"Pca.fit: no non-null vectors in '$vecCol'")
    val n = agg(0)
    // recover d from length: 1 + d + d(d+1)/2 = len
    val d = ((math.sqrt(9.0 + 8.0 * (agg.length - 1)) - 3.0) / 2.0).round.toInt
    val mean = Array.tabulate(d)(i => agg(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = agg(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    (n.toLong, mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors-as-rows), sorted by descending eigenvalue,
    * each vector sign-normalized (largest-|x| coordinate positive; first
    * index wins ties). Deterministic: fixed sweep order, fixed tolerance. */
  private[graft] def eigSym(
      sym: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val a = Array.tabulate(d, d)((i, j) => sym(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0; var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    // Quadratic convergence makes the tight tolerance ~1 extra sweep; it
    // buys spectral-reconstruction error ≪ the 6-dp oracle rounding.
    var sweep = 0
    while (sweep < 64 && offDiag() > 1e-26 * d * d) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val sign = if (theta >= 0) 1.0 else -1.0
            val tTan = sign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val s = tTan * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val pairs = (0 until d).map { j =>
      val vec = Array.tabulate(d)(i => v(i)(j))
      // deterministic sign: largest-|x| coordinate positive, first index wins
      var best = 0; var i = 1
      while (i < d) { if (math.abs(vec(i)) > math.abs(vec(best))) best = i; i += 1 }
      if (vec(best) < 0) { var t = 0; while (t < d) { vec(t) = -vec(t); t += 1 } }
      (a(j)(j), vec)
    }.sortBy { case (ev, _) => -ev } // stable: equal eigenvalues keep Jacobi column order
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** Fit a k-component PCA: one distributed moment pass + driver-side
    * Jacobi on the d×d covariance. `k` ≤ d (full-rank k = d gives an
    * orthonormal change of basis — useful for whitening / validation). */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val (_, mean, cov) = moments(df, vecCol)
    val d = mean.length
    require(k <= d, s"k=$k exceeds embedding dim $d")
    val (evals, evecs) = eigSym(cov)
    PcaModel(mean, evecs.take(k), evals.take(k))
  }

  /** Project `vecCol` onto the model's components — MAP-ONLY: each output
    * coordinate is (x−μ)·vₖ computed as x·vₖ − (μ·vₖ) with the μ·vₖ
    * offsets folded to driver-side constants, so no per-row centering
    * array is built. The k coordinates are k separate codegen'd
    * [[graft.functions.DotProduct]] expressions against per-component
    * array literals inside ONE `array(...)` — NOT a `transform` lambda:
    * higher-order functions are CodegenFallback and excluded from
    * subexpression elimination, which would drop the projection out of
    * whole-stage codegen and re-cast the input array k times.
    *
    * `whiten` rescales each coordinate to unit variance (÷√(λₖ+eps)) —
    * the usual pre-product-quantization normalization so no subspace
    * dominates the code budget. Implemented by pre-scaling the component
    * matrix on the DRIVER: the per-row plan is identical either way. */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "pca", whiten: Boolean = false,
      eps: Double = 1e-12): DataFrame = {
    val comps0 =
      if (!whiten) model.components
      else model.components.zip(model.eigenvalues).map { case (pc, ev) =>
        val s = 1.0 / math.sqrt(math.max(ev, 0.0) + eps); pc.map(_ * s)
      }
    val offsets = comps0.map(pc =>
      pc.zip(model.mean).map { case (a, b) => a * b }.sum)
    val x = asDouble(col(vecCol))
    df.withColumn(outCol, array(comps0.indices.map { k =>
      graft.functions.DotProduct(x, typedLit(comps0(k).toSeq)) - lit(offsets(k))
    }: _*))
  }

  /** Explained-variance ratio per component (λₖ / Σλ over the FITTED
    * components — pass k = d at fit time for exact total variance). */
  def explainedVarianceRatio(model: PcaModel): Array[Double] = {
    val tot = model.eigenvalues.sum
    if (tot <= 0) model.eigenvalues.map(_ => 0.0)
    else model.eigenvalues.map(_ / tot)
  }

  /** Fit on a deterministic id-hash sample of the corpus — the 100 TB
    * path: even one full moment pass is a full scan, and principal axes
    * converge at O(1/√n) with n in the millions, so a 0.1–1% sample fits
    * an indistinguishable model for ~100–1000× less I/O. Same
    * [[TextOps.deterministicSample]] contract as every other sampled
    * operator (stable across runs AND across engines — the sample is a
    * pure function of the id), so the fit stays reproducible. */
  def fitSampled(df: DataFrame, idCol: String, vecCol: String, k: Int,
      fraction: Double): PcaModel =
    fit(TextOps.deterministicSample(df, idCol, fraction), vecCol, k)

  /** Model → one-row-per-component DataFrame (`component_idx`, `eigenvalue`,
    * `component`, plus the shared `mean` on every row for self-containment)
    * — so a fitted model can be committed to a catalog table and reloaded
    * by later jobs ([[modelFromDF]]) instead of refitting per run. k rows
    * of d doubles: metadata-sized at any corpus scale. */
  def modelToDF(spark: org.apache.spark.sql.SparkSession, model: PcaModel): DataFrame = {
    import spark.implicits._
    model.components.indices.map { i =>
      (i, model.eigenvalues(i), model.components(i).toSeq, model.mean.toSeq)
    }.toDF("component_idx", "eigenvalue", "component", "mean")
  }

  /** Inverse of [[modelToDF]] — order restored from `component_idx`, so the
    * round-trip is exact regardless of how the storing table shuffled the
    * rows. */
  def modelFromDF(df: DataFrame): PcaModel = {
    val rows = df.select("component_idx", "eigenvalue", "component", "mean")
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, "modelFromDF: empty model frame")
    require(rows.map(_.getInt(0)).toSeq == rows.indices.toSeq,
      s"modelFromDF: component_idx not contiguous from 0: ${rows.map(_.getInt(0)).mkString(",")}")
    PcaModel(
      mean = rows.head.getSeq[Double](3).toArray,
      components = rows.map(_.getSeq[Double](2).toArray),
      eigenvalues = rows.map(_.getDouble(1)))
  }
}
