package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Similarity search over embedding columns (Array[Float]).
 *
 * `bruteForceTopK` is the exact baseline: a broadcast nested-loop over a
 * (small) query set — correct at any corpus size when |queries| is bounded,
 * since the corpus streams through one scan. `lshTopK` is the scale path:
 * sign-random-projection LSH with L hash tables, so candidate generation is
 * an equi-join on (table, bucket) — no cross join anywhere in the plan.
 *
 * Dot products compile to a tight generated loop via the custom
 * [[graft.functions.DotProduct]] Catalyst expression — no UDF, no
 * interpreted higher-order functions in the hot path.
 */
object Similarity {

  /** Left-to-right double dot product of two array<double> columns —
    * a codegen'd Catalyst expression ([[graft.functions.DotProduct]]), not
    * the interpreted `aggregate(zip_with(...))` HOF form. */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Query-side row ceiling for [[bruteForceTopK]] (override with
    * `graft.ann.brute.maxQueries`, 0 disables). The guard is on the
    * BROADCAST side: the corpus streams once per task regardless of size,
    * but every query row multiplies the whole corpus scan — 10k queries
    * against a 100 TB corpus is a 10k-way cross amplification the caller
    * should be routing through lshTopK/ivfTopK instead. */
  private val DefaultMaxBruteQueries = 10000L

  /** Per-group mean embedding (class prototypes / cluster centroids from
    * LABELED data — the supervised sibling of the IVF codebook): one row
    * per distinct `groupCols` value with the component-wise mean of
    * `vecCol` as `centroid: array<double>`.
    *
    * Engine-portable float contract: each component sums through an exact
    * DECIMAL(27,12) (associativity-free — parallel partial aggregation
    * cannot diverge from any other engine's sequential sum), divided by the
    * exact count. Two map-side-combining aggregates: (group, dim) partial
    * means, then per-group array assembly — (#groups × dim) rows after the
    * first, metadata-sized at any corpus scale. */
  def groupCentroids(df: DataFrame, vecCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(!groupCols.contains("centroid"),
      "a grouping column named 'centroid' would collide with the output")
    val g = groupCols.map(col)
    // _gc_-prefixed internals: a user grouping column named "i"/"x"/"m"
    // must not collide (same convention as _kb/_rn/_occ elsewhere)
    val x = col("_gc_x")
    // NaN/±Inf/overflow handling: the DECIMAL cast cannot represent them
    // (ANSI would crash; non-ANSI would silently drop from the sum while
    // still counted) — so poisoned components are excluded from the
    // decimal sum and the affected (group, dim) mean is NaN, matching how
    // cosine/dot propagate NaN rather than fabricating a biased value.
    val bad = x.isNaN || x === Double.PositiveInfinity ||
      x === Double.NegativeInfinity || abs(x) >= 1e14
    val comp = df
      .select(g :+ posexplode(col(vecCol)).as(Seq("_gc_i", "_gc_x")): _*)
      .groupBy(g :+ col("_gc_i"): _*)
      .agg(
        (sum(when(bad, lit(null)).otherwise(x.cast(DoubleType))
          .cast(DecimalType(27, 12))).cast(DoubleType) /
          count(lit(1))).as("_gc_m0"),
        max(when(bad, true).otherwise(false)).as("_gc_bad"))
      .select(g :+ col("_gc_i") :+
        when(col("_gc_bad"), lit(Double.NaN)).otherwise(col("_gc_m0")).as("_gc_m"): _*)
    comp
      .groupBy(g: _*)
      .agg(transform(
        array_sort(collect_list(struct(col("_gc_i").as("i"), col("_gc_m").as("m")))),
        s => s.getField("m")).as("centroid"))
  }

  /**
   * Exact top-k cosine neighbors for each query vector — the labeled
   * BASELINE path: one corpus scan joined against a broadcast query set.
   * GUARDED, not just labeled: more query rows than
   * `graft.ann.brute.maxQueries` (default 10k) fails fast with a pointer
   * at the scale paths ([[lshTopK]], [[ivfTopK]]); the corpus side may be
   * any size. Rank ties break on the rounded similarity (9 decimals, to be
   * engine-stable) then neighbor id. Ids keep their natural type (long,
   * string, …) — no silent cast.
   */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val maxQ = corpus.sparkSession.conf
      .getOption("graft.ann.brute.maxQueries").map(_.toLong)
      .getOrElse(DefaultMaxBruteQueries)
    if (maxQ > 0) {
      val nq = queries.count()
      require(nq <= maxQ,
        s"bruteForceTopK: $nq query rows exceed graft.ann.brute.maxQueries=$maxQ — " +
          "each query row re-scores the ENTIRE corpus; use lshTopK or ivfTopK " +
          "for large query sets (or raise/disable the guard explicitly)")
    }
    val c = Par.widen(corpus).select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("ce"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qe")))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qe"), col("ce")), 9))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast(IntegerType).as("rank"))
  }

  /** Deterministic ±1 random-projection planes: tables × bitsPerTable planes
    * of `dim` components each. Public so an external oracle (e.g. generated
    * DuckDB SQL) can replicate the exact bucketing. */
  def planes(tables: Int, bitsPerTable: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bitsPerTable, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  private val TableBucketStruct = StructType(Seq(
    StructField("table", IntegerType), StructField("bucket", LongType)))

  /** LSH bucket ids per hash table for one embedding column: bucket =
    * sign-bit string over the table's hyperplanes. The planes ride as ONE
    * typedLit (same rationale as [[codebookLit]]: inlining tables × bits ×
    * dim scalar literals costs seconds of janino compile); the per-bit
    * sign tests and dot products are value-identical to the inline form,
    * so bucketing matches the SQL oracles bit-for-bit. */
  private def bucketCols(vec: Column, pl: Array[Array[Array[Double]]]): Column = {
    val bits = pl.headOption.map(_.length).getOrElse(0)
    transform(typedLit(pl.map(_.map(_.toSeq).toSeq).toSeq), (tblPlanes, t) =>
      struct(t,
        (0 until bits).map { j =>
          when(dot(vec, element_at(tblPlanes, j + 1)) >= 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_.bitwiseOR(_))).cast(TableBucketStruct))
  }

  /** Cross-table embedding-cosine similarity JOIN — the semantic sibling
    * of [[graft.operators.Dedup.minhashJoin]]: every (left, right) pair
    * with exact cosine ≥ threshold, candidates from shared
    * sign-random-projection buckets (equi-join on (table, bucket), no
    * cross product). The semantic-decontamination / eval-overlap-audit
    * shape: LEFT = the bounded reference/benchmark set, RIGHT = the
    * unbounded corpus under audit — the SAME argument convention as
    * [[graft.operators.Dedup.minhashJoin]], so a pipeline running both
    * passes its tables in one order. NOT a wrapper over
    * [[embeddingNearDupPairs]] — that path is single-table and drops
    * id_a ≥ id_b pairs, which is wrong across two unrelated id spaces
    * (same reasoning as minhashJoin vs the incremental path).
    *
    * `maxBucketWidth` caps hot buckets on the RIGHT (unbounded/corpus)
    * side — one degenerate bucket (near-zero vectors, boilerplate
    * embeddings) otherwise dominates the join; the left side is the
    * bounded reference set. Returns (id_left, id_right, cos ROUNDED to
    * 9 decimals — the engine-stable contract every cosine op here uses). */
  def embeddingJoin(left: DataFrame, right: DataFrame,
      leftIdCol: String, rightIdCol: String, vecCol: String,
      threshold: Double, tables: Int = 12, bitsPerTable: Int = 4,
      seed: Long = 7L, maxBucketWidth: Option[Int] = None): DataFrame = {
    val empty = left.sparkSession.emptyDataFrame
      .withColumn("id_left", lit(null).cast(left.schema(leftIdCol).dataType))
      .withColumn("id_right", lit(null).cast(right.schema(rightIdCol).dataType))
      .withColumn("cos", lit(0.0)).limit(0)
    val dim = dimOf(left, vecCol).orElse(dimOf(right, vecCol))
      .getOrElse(return empty)
    val pl = planes(tables, bitsPerTable, dim, seed)
    def bucketRows(df: DataFrame, idCol: String): (DataFrame, DataFrame) = {
      val vecs = Par.widen(df)
        .select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      val rows = vecs.withColumn("tb", explode(bucketCols(col("vec"), pl)))
        .select(col("id"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
      (vecs, rows)
    }
    val (lVecs, lRows) = bucketRows(left, leftIdCol)
    val (rVecs, rRows0) = bucketRows(right, rightIdCol)
    val rRows = maxBucketWidth match {
      case None => rRows0
      case Some(w) =>
        val keep = rRows0.groupBy("table", "bucket")
          .agg(count(lit(1)).as("_w")).where(col("_w") <= w)
          .select(col("table"), col("bucket"))
        rRows0.join(keep, Seq("table", "bucket"), "left_semi")
    }
    lRows.as("a").join(rRows.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("id_left"), col("b.id").as("id_right"))
      .distinct()
      .join(lVecs.select(col("id"), col("vec").as("va")), col("id_left") === col("id")).drop("id")
      .join(rVecs.select(col("id"), col("vec").as("vb")), col("id_right") === col("id")).drop("id")
      .withColumn("cos", round(cosine(col("va"), col("vb")), 9))
      .where(col("cos") >= threshold)
      .select("id_left", "id_right", "cos")
  }

  /**
   * Embedding-cosine near-duplicate PAIRS: candidates share a
   * sign-random-projection bucket in any hash table (equi-join, no cross
   * join), verified by exact cosine ≥ threshold. The embedding-space
   * counterpart of MinHash near-dup dedup.
   */
  /** Dimensionality of the first non-null vector; None on empty input. */
  private def dimOf(df: DataFrame, vecCol: String): Option[Int] =
    df.select(size(col(vecCol)).as("d")).where(col("d") > 0).limit(1)
      .collect().headOption.map(_.getInt(0))

  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      tables: Int = 12, bitsPerTable: Int = 4, seed: Long = 7L): DataFrame = {
    val dim = dimOf(df, vecCol).getOrElse(
      return df.select(col(idCol).as("id_a"), col(idCol).as("id_b"),
        lit(0.0).as("cos")).limit(0))
    val pl = planes(tables, bitsPerTable, dim, seed)
    // Buckets carry IDS ONLY: a candidate pair appears once per shared
    // table, so the dedup distinct below would otherwise shuffle and hash
    // two dim-sized vectors per duplicate. Ids dedup first; the (id → vec)
    // frame joins back for the exact-cosine verify — the same est-join
    // shape minhashPairs uses for its signatures.
    val vecs = Par.widen(df).select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
    val rows = vecs
      .withColumn("tb", explode(bucketCols(col("vec"), pl)))
      .select(col("id"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val a = rows.as("a")
    val b = rows.as("b")
    a.join(b, col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .join(vecs.select(col("id"), col("vec").as("va")), col("id_a") === col("id")).drop("id")
      .join(vecs.select(col("id"), col("vec").as("vb")), col("id_b") === col("id")).drop("id")
      .withColumn("cos", round(cosine(col("va"), col("vb")), 9))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  // ------------------------------------------- random projection (JL)

  /** Deterministic Gaussian projection planes for [[randomProject]] —
    * k rows of `dim` N(0,1) components drawn in row-major order from one
    * seeded stream. Public so an external oracle can inline the exact
    * doubles (Double.toString round-trips). */
  def gaussianPlanes(k: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k, dim)(rnd.nextGaussian())
  }

  /**
   * Johnson–Lindenstrauss random projection to `k` dims: the data-free
   * alternative to [[Pca]] when even one moment pass over the corpus is
   * too much (or the fit must not depend on the data at all — e.g. the
   * projection is fixed before the corpus exists). Distances are preserved
   * within (1±ε) w.h.p. for k = O(ε⁻² log n) — per JL; no training, no
   * shuffle: a pure MAP-ONLY plan, each coordinate `dot(x, gₖ)/√k` a
   * separate codegen'd [[graft.functions.DotProduct]] against a plane
   * literal inside one `array(...)` (not a `transform` lambda — HOFs are
   * CodegenFallback and would evaluate the input cast k times,
   * interpreted).
   */
  def randomProject(df: DataFrame, vecCol: String, k: Int, seed: Long,
      outCol: String = "rp"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dim = dimOf(df, vecCol).getOrElse(return df.withColumn(outCol,
      lit(null).cast(ArrayType(DoubleType))).limit(0))
    val pl = gaussianPlanes(k, dim, seed)
    val scale = 1.0 / math.sqrt(k.toDouble)
    val x = asDouble(col(vecCol))
    df.withColumn(outCol, array(pl.map { g =>
      dot(x, typedLit(g.toSeq)) * lit(scale)
    }: _*))
  }

  // ------------------------------------------------------------------ IVF

  /** (cosine, centroid) score array for one vector against a codebook —
    * struct-ordered so array_max / array_sort break ties on the LOWEST
    * centroid id (negated id: bigger negi = smaller id). */
  private val ScoreStruct = StructType(Seq(
    StructField("cos", DoubleType), StructField("negi", IntegerType)))

  /** The codebook as ONE literal (array<array<double>>), not nlist × dim
    * inlined scalar literals: inlining a 64×64 codebook puts ~4k constants
    * in the generated source and janino compilation alone costs seconds —
    * more than the query at bench scale. A single typedLit rides the
    * generated code as a reference object; the per-centroid lambda below
    * is interpreted (HOFs are CodegenFallback) but each evaluation is just
    * DotProductExpr's tight loop. The arithmetic — cosine via
    * dot/(sqrt·sqrt), left-to-right — is exactly the inline form's, so
    * scores and tie-breaks match the SQL oracles bit-for-bit. */
  private def codebookLit(cents: Array[Array[Double]]): Column =
    typedLit(cents.map(_.toSeq).toSeq)

  private def centroidScores(vec: Column, cents: Array[Array[Double]]): Column =
    transform(codebookLit(cents), (cv, i) =>
      // cast pins the struct field names — aliases inside struct() are not
      // preserved through array_sort/transform lambdas
      struct(cosine(vec, cv), -i).cast(ScoreStruct))

  /** Nearest centroid id by cosine (ties → lowest id). Pure expression —
    * the codebook is inlined as literals, so assignment is map-only (no
    * join of any kind). */
  private[operators] def nearestCid(vec: Column, cents: Array[Array[Double]]): Column =
    array_max(centroidScores(vec, cents)).getField("negi") * -1

  /** The `nprobe` nearest centroid ids, best first (ties → lowest id). */
  private[operators] def probeCids(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    transform(slice(reverse(array_sort(centroidScores(vec, cents))), 1, nprobe),
      s => s.getField("negi") * -1)

  /**
   * Deterministic Lloyd's k-means for the IVF coarse codebook: init = the
   * `nlist` vectors with the smallest ids, then `iters` assign/mean rounds
   * (element-wise means via posexplode + hash aggregate — fully
   * distributed; only the nlist × dim codebook ever reaches the driver,
   * which is how IVF codebooks work at any scale). An emptied cluster
   * keeps its previous centroid. iters=0 returns the raw init — useful
   * when the codebook must be reproducible by an external oracle.
   *
   * `trainFraction` < 1 trains on a deterministic hash-sample of the
   * corpus: each Lloyd's round re-scans its input, so at 100 TB the
   * training frame must be a sample (a coarse codebook needs ~100-1000
   * points per centroid, not the corpus). The sample is engine- and
   * rerun-stable (md5 bucket of the id — same contract as
   * TextOps.deterministicSample) and persisted across rounds, so the
   * full corpus is read exactly once regardless of `iters`.
   */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 0, trainFraction: Double = 1.0): Array[Array[Double]] = {
    require(trainFraction > 0 && trainFraction <= 1.0,
      s"trainFraction must be in (0,1], got $trainFraction")
    val all = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .where(col("v").isNotNull)
    val base =
      if (trainFraction >= 1.0) all
      else all.where(
        TextOps.hashBucket(col("id"), 10000) < math.round(trainFraction * 10000).toInt)
    val cached = if (iters > 0) base.persist() else base
    try {
      var cents = cached.orderBy("id").limit(nlist).collect()
        .map(_.getSeq[Double](1).toArray)
      require(cents.nonEmpty, s"cannot train centroids on an empty corpus")
      for (_ <- 0 until iters) {
        val means = Par.widen(cached.toDF())
          .select(nearestCid(col("v"), cents).as("cid"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
          .groupBy("cid").agg(map_from_arrays(
            collect_list(col("pos")), collect_list(col("m"))).as("byPos"))
          .collect().map(r => r.getInt(0) ->
            r.getMap[Int, Double](1)).toMap
        cents = cents.zipWithIndex.map { case (old, i) =>
          means.get(i) match {
            case Some(byPos) => old.indices.map(p => byPos.getOrElse(p, old(p))).toArray
            case None => old
          }
        }
      }
      cents
    } finally if (iters > 0) { cached.unpersist(); () }
  }

  /**
   * IVF top-k: the corpus is partitioned into inverted lists by nearest
   * coarse centroid (map-only expression over the inlined codebook); each
   * query probes its `nprobe` nearest lists, and candidates rerank by
   * exact cosine. The scale path next to [[lshTopK]]: candidate generation
   * is an equi-join on the centroid id, never all-pairs, and the per-list
   * join prunes the corpus to roughly nprobe/nlist of its rows.
   */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, centroids: Array[Array[Double]], nprobe: Int = 4): DataFrame = {
    require(centroids.nonEmpty && nprobe >= 1)
    val c = Par.widen(corpus)
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("ce"))
      .withColumn("cid", nearestCid(col("ce"), centroids))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qe"))
      .withColumn("cid", explode(probeCids(col("qe"), centroids, nprobe)))
    // Each corpus row lives in exactly ONE list and probed lists are
    // distinct, so the join emits no duplicate (query, neighbor) pairs.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    c.join(q, Seq("cid"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qe"), col("ce")), 9))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast(IntegerType).as("rank"))
  }

  // ------------------------------------------------------- semantic dedup

  /**
   * Semantic near-duplicate PAIRS, cluster-blocked (the SemDeDup recipe,
   * Abbas et al. 2023, arXiv:2303.09540): assign every vector to its
   * nearest coarse centroid (map-only — the codebook is inlined literals,
   * same as [[ivfTopK]]), then compare pairs WITHIN a cluster only, by
   * exact cosine ≥ threshold. At corpus scale the intra-cluster join is an
   * equi-join on the centroid id — candidate work is Σ |cluster|²/2
   * instead of |corpus|²/2, tunable via nlist (more centroids → smaller
   * blocks). Unlike the LSH variant ([[embeddingNearDupPairs]]) the
   * blocking is semantic: near-identical embeddings land in one cluster
   * with probability → 1 as nlist/corpus stays calibrated, and the
   * centroid id doubles as the IVF routing key, so one codebook serves
   * both dedup and ANN.
   */
  def semanticNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "semanticNearDupPairs needs a trained codebook")
    // The assigned frame is PERSISTED and materialized once (round-16 plan
    // audit): the nearest-centroid assignment — an interpreted nlist-entry
    // HOF per row — otherwise runs THREE times: once per self-join side,
    // plus a third copy the optimizer infers as the join's isnotnull(cid)
    // filter and pushes BELOW the widening exchange, serializing the full
    // codebook scoring onto the 1-2-task scan side (observed in the t11
    // physical plan). The persist computes it once, 32-way parallel; the
    // self-join reads cached (id, vec, cid) rows. Same persist+materialize
    // +unpersist discipline as minhashPairs' signatures.
    val rows = Par.widen(df)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .where(col("vec").isNotNull)
      .withColumn("cid", nearestCid(col("vec"), centroids))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rows.count()
    val a = rows.as("a")
    val b = rows.as("b")
    val res = Par.materialize(
      a.join(b, col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
        .withColumn("cos", round(cosine(col("a.vec"), col("b.vec")), 9))
        .where(col("cos") >= threshold)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos")))
    rows.unpersist(blocking = false)
    res
  }

  /** Semantic dedup: drop every row that has a same-cluster neighbor at
    * cosine ≥ threshold with a smaller id (the minimum id of each duplicate
    * chain survives — same canonical-winner rule as exact dedup). */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      centroids: Array[Array[Double]]): DataFrame = {
    val losers = semanticNearDupPairs(df, idCol, vecCol, threshold, centroids)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /**
   * Approximate top-k: candidates = corpus rows sharing an LSH bucket with
   * the query in ANY of `tables` hash tables, reranked by exact cosine.
   * Candidate generation is an equi-join on (table, bucket).
   */
  /** Defaults suit 10^2–10^4 row corpora; at scale grow `bitsPerTable` with
    * log2(corpusSize / targetBucketSize) so per-bucket candidate lists stay
    * bounded, and keep `tables` ≈ 8–16 for recall. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, tables: Int = 12, bitsPerTable: Int = 4, seed: Long = 7L): DataFrame = {
    val dim = dimOf(corpus, vecCol).getOrElse(
      return corpus.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(0).as("rank")).limit(0))
    val pl = planes(tables, bitsPerTable, dim, seed)
    // Buckets carry IDS ONLY (see embeddingNearDupPairs): the cross-table
    // dedup distinct moves (query_id, neighbor_id) pairs, not two dim-sized
    // vectors per duplicate; vectors rejoin for the exact-cosine rerank.
    def withBuckets(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as("_v"))
        .withColumn("tb", explode(bucketCols(col("_v"), pl)))
        .select(col(id), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val c = withBuckets(Par.widen(corpus), "neighbor_id")
    val q = withBuckets(queries, "query_id")
    val cand = c.join(q, Seq("table", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val cv = Par.widen(corpus).select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("neighbor_id_vec"))
    val qv = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("query_id_vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(qv, Seq("query_id")).join(cv, Seq("neighbor_id"))
      .withColumn("cos", round(cosine(col("query_id_vec"), col("neighbor_id_vec")), 9))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast(IntegerType).as("rank"))
  }
}
