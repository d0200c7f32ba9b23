package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Distributed PCA: moment-pass exactness, Jacobi eigensolver properties,
  * full-rank projection identity, truncated-k variance capture, bit-level
  * determinism, and the map-only (no-Exchange) projection plan. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("moments match a brute-force driver computation on a tiny frame") {
    val data = Seq(
      Array(1.0, 2.0, 0.0), Array(3.0, 0.0, 1.0),
      Array(-1.0, 4.0, 2.0), Array(5.0, -2.0, 3.0))
    val df = data.map(a => Tuple1(a)).toDF("v").repartition(3)
    val (n, mean, cov) = Pca.moments(df, "v")
    assert(n == 4)
    val d = 3
    val bMean = Array.tabulate(d)(i => data.map(_(i)).sum / 4.0)
    for (i <- 0 until d) assert(math.abs(mean(i) - bMean(i)) < 1e-12)
    for (i <- 0 until d; j <- 0 until d) {
      val c = data.map(x => (x(i) - bMean(i)) * (x(j) - bMean(j))).sum / 4.0
      assert(math.abs(cov(i)(j) - c) < 1e-12, s"cov($i,$j): ${cov(i)(j)} vs $c")
    }
  }

  test("eigSym solves an analytic 2x2 and respects the sign convention") {
    // [[2,1],[1,2]] -> eigenvalues 3 (v=(1,1)/sqrt2) and 1 (v=(1,-1)/sqrt2)
    val (evals, evecs) = Pca.eigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-12 && math.abs(evals(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(evecs(0)(0) - s) < 1e-12 && math.abs(evecs(0)(1) - s) < 1e-12)
    // sign convention: largest-|x| coordinate positive (first index on ties)
    assert(math.abs(evecs(1)(0) - s) < 1e-12 && math.abs(evecs(1)(1) + s) < 1e-12)
  }

  test("fit on real embeddings: orthonormal components, descending spectrum, trace preserved") {
    val model = Pca.fit(emb, "embedding", k = 64)
    val d = 64
    // orthonormality
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(i => model.components(a)(i) * model.components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-10, s"v$a . v$b = $dot")
    }
    // descending, non-negative spectrum (covariance is PSD)
    model.eigenvalues.sliding(2).foreach { case Array(x, y) => assert(x >= y - 1e-12) }
    assert(model.eigenvalues.last > -1e-12)
    // trace(cov) == sum of eigenvalues
    val (_, _, cov) = Pca.moments(emb, "embedding")
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(model.eigenvalues.sum - trace) < 1e-9)
  }

  test("full-rank projection preserves centered norms; truncation captures the eigen variance") {
    val model = Pca.fit(emb, "embedding", k = 64)
    val proj = Pca.project(emb, "embedding", model, "p")
    val rows = proj.select(col("embedding").cast("array<double>").as("v"), col("p")).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val v = r.getSeq[Double](0); val p = r.getSeq[Double](1)
      val centered2 = v.zip(model.mean).map { case (x, m) => (x - m) * (x - m) }.sum
      val pnorm2 = p.map(x => x * x).sum
      assert(math.abs(centered2 - pnorm2) < 1e-9, s"$centered2 vs $pnorm2")
    }
    // sample variance of coordinate k equals eigenvalue k (population, /n)
    val n = rows.length
    for (k <- 0 until 3) {
      val xs = rows.map(_.getSeq[Double](1)(k))
      val mu = xs.sum / n
      val varK = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(varK - model.eigenvalues(k)) < 1e-9,
        s"var(proj_$k)=$varK vs lambda=${model.eigenvalues(k)}")
    }
    // truncated projection = prefix of the full one
    val p8 = Pca.project(emb, "embedding", model.copy(
      components = model.components.take(8), eigenvalues = model.eigenvalues.take(8)),
      "p8").select(col("vec_id"), col("p8")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val full = proj.select(col("vec_id"), col("p")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    full.foreach { case (id, p) => assert(p8(id) == p.take(8)) }
  }

  test("first component dominates an anisotropic synthetic cloud") {
    // points spread along (3,4)/5 with tiny orthogonal jitter
    val dir = Array(0.6, 0.8)
    val pts = (0 until 200).map { i =>
      val t = (i - 100) / 10.0; val j = ((i * 37) % 11 - 5) / 100.0
      Array(t * dir(0) - j * dir(1), t * dir(1) + j * dir(0))
    }
    val df = pts.map(Tuple1(_)).toDF("v")
    val model = Pca.fit(df, "v", k = 2)
    assert(math.abs(math.abs(model.components(0)(0)) - 0.6) < 1e-3)
    assert(math.abs(math.abs(model.components(0)(1)) - 0.8) < 1e-3)
    assert(model.components(0)(1) > 0, "sign convention: largest coordinate positive")
    assert(model.eigenvalues(0) > 100 * model.eigenvalues(1))
    val ratios = Pca.explainedVarianceRatio(model)
    assert(ratios(0) > 0.99 && math.abs(ratios.sum - 1.0) < 1e-12)
  }

  test("fit is deterministic bit-for-bit across runs") {
    val a = Pca.fit(emb, "embedding", k = 16)
    val b = Pca.fit(emb, "embedding", k = 16)
    assert(a.mean.sameElements(b.mean))
    assert(a.eigenvalues.sameElements(b.eigenvalues))
    assert(a.components.zip(b.components).forall { case (x, y) => x.sameElements(y) })
  }

  test("projection is map-only and codegen'd: no Exchange, no HOF lambda in the plan") {
    val model = Pca.fit(emb, "embedding", k = 8)
    val qe = Pca.project(emb, "embedding", model, "p").queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in projection plan:\n$plan")
    // the k coordinates must be codegen'd DotProduct expressions, not a
    // CodegenFallback transform() lambda (which would also re-cast the
    // input array k times, interpreted)
    assert(!plan.contains("transform("), s"HOF lambda in projection plan:\n$plan")
    // "*(1) Project [...]": the star is executedPlan.toString's
    // whole-stage-codegen marker — the projection must carry it
    assert(plan.contains("*(1) Project"), s"projection fell out of codegen:\n$plan")
    val rp = graft.operators.Similarity
      .randomProject(emb, "embedding", k = 8, seed = 1L)
      .queryExecution.executedPlan.toString
    assert(!rp.contains("transform(") && rp.contains("*(1) Project"),
      s"JL projection not codegen'd:\n$rp")
  }

  test("whitened projection has unit per-coordinate variance") {
    val model = Pca.fit(emb, "embedding", k = 8)
    val rows = Pca.project(emb, "embedding", model, "w", whiten = true)
      .select("w").collect().map(_.getSeq[Double](0))
    val n = rows.length
    for (k <- 0 until 8) {
      val xs = rows.map(_(k))
      val mu = xs.sum / n
      val v = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(v - 1.0) < 1e-6, s"whitened var($k)=$v")
    }
  }

  test("randomProject (JL): deterministic, map-only, norm-preserving on average") {
    import graft.operators.Similarity
    val a = Similarity.randomProject(emb, "embedding", k = 32, seed = 5L)
    val b = Similarity.randomProject(emb, "embedding", k = 32, seed = 5L)
    assert(a.select("rp").collect().map(_.toString).sameElements(
      b.select("rp").collect().map(_.toString)))
    assert(!a.queryExecution.executedPlan.toString.contains("Exchange"))
    // E[norm ratio] = 1 over the planes; with k=32 the corpus average
    // concentrates — a generous band still catches a scaling bug (missing
    // 1/sqrt(k) would shift it to 32)
    val ratios = a.select(col("embedding").cast("array<double>").as("v"), col("rp")).collect()
      .map { r =>
        val v = r.getSeq[Double](0); val p = r.getSeq[Double](1)
        p.map(x => x * x).sum / v.map(x => x * x).sum
      }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"mean norm ratio $mean")
    // a different seed gives different planes
    val c = Similarity.gaussianPlanes(4, 8, 1L)
    val d = Similarity.gaussianPlanes(4, 8, 2L)
    assert(c.flatMap(_.toSeq).toSeq != d.flatMap(_.toSeq).toSeq)
  }

  test("model round-trips through a DataFrame exactly; sampled fit approximates the full fit") {
    val model = Pca.fit(emb, "embedding", k = 16)
    val back = Pca.modelFromDF(Pca.modelToDF(spark, model).orderBy(rand(7)))
    assert(back.mean.sameElements(model.mean))
    assert(back.eigenvalues.sameElements(model.eigenvalues))
    assert(back.components.zip(model.components).forall { case (a, b) => a.sameElements(b) })
    // projecting with the reloaded model is bit-identical
    val a = Pca.project(emb, "embedding", model, "p").select("p").collect()
    val b = Pca.project(emb, "embedding", back, "p").select("p").collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))

    // sampled fit: deterministic, and the top eigenvalue is in the full
    // fit's ballpark (500 vecs sampled at 50% — loose band, catches a
    // wiring bug not statistical noise)
    val s1 = Pca.fitSampled(emb, "vec_id", "embedding", k = 4, fraction = 0.5)
    val s2 = Pca.fitSampled(emb, "vec_id", "embedding", k = 4, fraction = 0.5)
    assert(s1.eigenvalues.sameElements(s2.eigenvalues))
    assert(s1.eigenvalues(0) > 0.5 * model.eigenvalues(0) &&
      s1.eigenvalues(0) < 2.0 * model.eigenvalues(0))
  }

  test("fit rejects ragged and empty vector columns") {
    val ragged = Seq(Array(1.0, 2.0), Array(1.0, 2.0, 3.0)).map(Tuple1(_)).toDF("v")
    intercept[Exception] { Pca.fit(ragged, "v", k = 2) }
    val empty = Seq.empty[Tuple1[Array[Double]]].toDF("v")
    intercept[Exception] { Pca.fit(empty, "v", k = 1) }
  }
}
