package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._

/**
 * LLM-training-data pipeline queries: text analysis, deduplication,
 * similarity search, multimodal plumbing — over documents.parquet /
 * embeddings.parquet. Oracle SQL provided wherever DuckDB can express the
 * same computation; approximate operators (MinHash/SimHash/LSH-ANN) are
 * rows-only here and verified against exact baselines in ScalaTest.
 */
object PipelineQueries {
  import Queries._

  /** DuckDB expression replicating [[TextOps.hashBucket]] for a string
    * expression: first 8 md5 hex digits decoded to a BIGINT, mod `dim`
    * (same strpos-decode idiom as the t14 oracle). */
  private def obucket(expr: String, dim: Int): String =
    s"""CAST(list_sum(list_transform(range(0, 8), i ->
       CAST(strpos('0123456789abcdef', substr(md5($expr), CAST(i + 1 AS INT), 1)) - 1 AS BIGINT)
         * (CAST(1 AS BIGINT) << CAST((7 - i) * 4 AS INT)))) AS BIGINT) % $dim"""

  /** DuckDB marker-count expression, mirroring TextOps.langScore. */
  private def oscore(pat: String): String =
    s"len(regexp_extract_all(lower(text), '$pat'))"
  private val oen = oscore("\\b(the|a|is|of|and)\\b")
  private val ofr = oscore("\\b(le|la|les|et|des)\\b")
  private val ode = oscore("\\b(der|die|und|das|ist)\\b")
  private val oes = oscore("\\b(el|los|las|y|es)\\b")

  /** The sign-random-projection planes as a DuckDB VALUES list
    * `(tbl, bit, plane)` — the oracle replicates the EXACT bucketing of
    * [[Similarity.lshTopK]] / [[Similarity.embeddingNearDupPairs]] by
    * inlining the deterministic ±1 planes as literals. */
  private def planesValues(tables: Int, bits: Int, dim: Int, seed: Long): String = {
    val pl = Similarity.planes(tables, bits, dim, seed)
    (for { t <- 0 until tables; j <- 0 until bits } yield
      s"($t,$j,[${pl(t)(j).map(v => if (v > 0) "1.0" else "-1.0").mkString(",")}])"
    ).mkString(",")
  }

  /** DuckDB CTEs shared by the two LSH oracles: per-(vector, hash-table)
    * bucket ids from the inlined planes. Replicates `bucketCols`: bit j set
    * iff dot(vec, plane_j) >= 0. */
  private def lshBucketCtes(tables: Int, bits: Int, dim: Int, seed: Long): String = s"""
      pl(tbl, bit, plane) AS (VALUES ${planesValues(tables, bits, dim, seed)}),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      bk AS (SELECT vec_id, tbl,
               CAST(SUM(CASE WHEN list_dot_product(v, plane) >= 0
                             THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS bucket
             FROM e CROSS JOIN pl GROUP BY vec_id, tbl)"""

  /** DuckDB CTEs producing the EXACT word-2-gram Jaccard ≥ 0.9 pair set
    * (`pr(id_a, id_b, jaccard)`) — the oracle contract of t04 (the LSH
    * banding at the fixed seed recalls every pair above the clean
    * threshold gap), reused by t15's transitive-closure oracle. */
  private val minhashPairCtes = """
      toks AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS tk FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(tk)-1,1)+1),
              i -> array_to_string(tk[i:i+1],' '))) AS sh FROM toks),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              len(list_intersect(a.sh,b.sh)) AS inter, len(a.sh)+len(b.sh) AS tot
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      pr AS (SELECT id_a, id_b, CAST(inter AS DOUBLE)/(tot-inter) AS jaccard
             FROM p WHERE CAST(inter AS DOUBLE)/(tot-inter) >= 0.9)"""

  /** Shared t12/t48 repetition CTEs: rbase(doc_id, n_tokens, dup_*_frac)
    * and rtop(doc_id, max_2gram_frac) over `documents` — ONE definition so
    * an oracle fix cannot drift between the stats and filter queries. */
  private val oRepCtes = """rt AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk FROM documents),
      rg AS (SELECT doc_id, tk,
              CASE WHEN len(tk) < 2 THEN [] ELSE list_transform(range(1, len(tk)), i -> array_to_string(tk[i:i+1], ' ')) END AS g2,
              CASE WHEN len(tk) < 3 THEN [] ELSE list_transform(range(1, len(tk)-1), i -> array_to_string(tk[i:i+2], ' ')) END AS g3
            FROM rt),
      rbase AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        CASE WHEN len(tk) = 0 THEN 0.0 ELSE round((len(tk) - len(list_distinct(tk))) / CAST(len(tk) AS DOUBLE), 9) END AS dup_word_frac,
        CASE WHEN len(g2) = 0 THEN 0.0 ELSE round((len(g2) - len(list_distinct(g2))) / CAST(len(g2) AS DOUBLE), 9) END AS dup_2gram_frac,
        CASE WHEN len(g3) = 0 THEN 0.0 ELSE round((len(g3) - len(list_distinct(g3))) / CAST(len(g3) AS DOUBLE), 9) END AS dup_3gram_frac
        FROM rg),
      rcnts AS (SELECT doc_id, gram, count(*) AS c
               FROM (SELECT doc_id, unnest(g2) AS gram FROM rg) GROUP BY 1, 2),
      rtop AS (SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 9) AS max_2gram_frac
              FROM rcnts GROUP BY 1)"""

  /** Shared t47/t48 gopher CTEs: gr(doc_id, g_reason) over `documents` —
    * stopword presence via list_contains over the \S+ tokens, mirroring
    * TextOps.gopherReason's token-membership semantics exactly (regex \b
    * diverges between Java and RE2 on non-ASCII boundaries). */
  private val oGopherCtes: String = {
    val stops = graft.operators.TextOps.Stopwords8
      .map(w => s"(CASE WHEN list_contains(tk0, '$w') THEN 1 ELSE 0 END)").mkString(" + ")
    s"""gq0 AS (SELECT doc_id, text, regexp_extract_all(lower(text), '\\S+') AS tk0 FROM documents),
      gq AS (SELECT doc_id,
        CAST(len(tk0) AS DOUBLE) AS nw,
        CAST(len(regexp_extract_all(text,'\\S')) AS DOUBLE) AS nc,
        CAST(len(regexp_extract_all(text,'#|\\.\\.\\.|…')) AS DOUBLE) AS sym,
        CAST(len(regexp_extract_all(lower(text),'\\S*[a-z]\\S*')) AS DOUBLE) AS alpha,
        $stops AS st,
        text IS NULL AS tnull
      FROM gq0),
      gr AS (SELECT doc_id,
        CASE WHEN tnull OR nw < 50 OR nw > 100000 THEN 'word_count'
             WHEN nc/nw < 3.0 OR nc/nw > 10.0 THEN 'mean_word_length'
             WHEN sym/nw >= 0.1 THEN 'symbol_ratio'
             WHEN alpha/nw <= 0.8 THEN 'alpha_fraction'
             WHEN st < 2 THEN 'stopwords' END AS g_reason
      FROM gq)"""
  }

  val all: Seq[Q] = Seq(

    // Per-document text statistics: token counts, language ID, quality
    // bucket, content fingerprint — all codegen'd regexp expressions.
    Q("t01_text_stats", Some(s"""
      WITH s AS (
        SELECT doc_id, text, $oen AS en, $ofr AS fr, $ode AS de, $oes AS es,
               len(regexp_extract_all(text, '\\S+')) AS ntok
        FROM documents)
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(ntok AS BIGINT) AS n_tokens,
        CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
        CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct,
        CASE WHEN en > 0 AND en >= fr AND en >= de AND en >= es THEN 'en'
             WHEN fr > 0 AND fr >= de AND fr >= es THEN 'fr'
             WHEN de > 0 AND de >= es THEN 'de'
             WHEN es > 0 THEN 'es' ELSE 'und' END AS pred_lang,
        CASE WHEN ntok < 10 THEN 'too_short'
             WHEN en * 20 >= ntok THEN 'ok'
             ELSE 'low_stopword' END AS quality,
        md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
      FROM s""")) { (s, dir) =>
      TextOps.textStats(tbl(s, dir, "documents"), "text", "doc_id")
    },

    // Exact dedup groups by normalized content hash.
    Q("t02_exact_dedup", Some("""
      SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
             CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
             CAST(COUNT(*) AS BIGINT) AS copies
      FROM documents GROUP BY 1""")) { (s, dir) =>
      Dedup.exactGroups(tbl(s, dir, "documents"), "doc_id", "text")
    },

    // Character-3-gram shingle profile (the MinHash front end, verified
    // exactly).
    Q("t03_shingle_profile", Some("""
      SELECT doc_id,
             CAST(len(list_distinct(list_transform(
               range(1, greatest(length(text) - 2, 1) + 1),
               i -> substr(text, CAST(i AS INTEGER), 3)))) AS INTEGER) AS n_shingles
      FROM documents""")) { (s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), size(TextOps.shingles("text", 3)).as("n_shingles"))
    },

    // MinHash + banded LSH near-duplicate pairs (no all-pairs join). The
    // oracle is the EXACT all-pairs word-2-gram Jaccard at the threshold:
    // with 8×8 banding the planted near-dup pairs (min true Jaccard 0.909,
    // next-highest pair 0.80 — a clean gap) all land in a shared bucket
    // under the fixed seed, so LSH output = exact output deterministically.
    Q("t04_minhash_neardup", Some(s"""
      WITH $minhashPairCtes
      SELECT id_a, id_b, jaccard FROM pr""")) { (s, dir) =>
      Dedup.minhashPairs(tbl(s, dir, "documents"), "doc_id", "text",
        bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
        maxBucketWidth = Some(64))
    },

    // Near-dup CLUSTERS: the t04 pair graph closed transitively via
    // alternating large-star/small-star connected components (one
    // (doc, component-min) row per clustered doc). The oracle computes the
    // same closure with a recursive min-label propagation: label l reaches
    // node u iff a path exists (the component minimum always propagates:
    // every receiving node on the path exceeds it).
    Q("t15_neardup_clusters", Some(s"""
      WITH RECURSIVE $minhashPairCtes,
      edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pr
                UNION SELECT id_b, id_a FROM pr),
      cc(id, lbl) AS (
        SELECT DISTINCT u, u FROM edges
        UNION
        SELECT e.u, c.lbl FROM edges e JOIN cc c ON c.id = e.v WHERE c.lbl < e.u)
      SELECT id AS doc_id, MIN(lbl) AS component FROM cc GROUP BY id""")) { (s, dir) =>
      Dedup.connectedComponents(
        Dedup.minhashPairs(tbl(s, dir, "documents"), "doc_id", "text",
          bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
          maxBucketWidth = Some(64)))
        .select(col("id").as("doc_id"), col("component"))
    },

    // Cross-document line dedup (CCNet): lines appearing in ≥3 distinct
    // documents are boilerplate and removed everywhere; texts reassemble
    // in order. The oracle filters each doc's line list against the
    // corpus-common hash set.
    Q("t16_line_dedup", Some("""
      WITH d AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
      lh AS (SELECT doc_id, unnest(list_transform(ls, x -> md5(trim(lower(x))))) AS h FROM d),
      common AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM lh GROUP BY h)
                 WHERE nd >= 3),
      cl AS (SELECT coalesce(list(h), []) AS chs FROM common),
      k AS (SELECT doc_id, len(ls) AS n_lines,
              list_filter(ls, x -> NOT list_contains(chs, md5(trim(lower(x))))) AS kept
            FROM d, cl)
      SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
             CAST(len(kept) AS BIGINT) AS n_kept,
             md5(array_to_string(kept, chr(10))) AS kept_md5
      FROM k""")) { (s, dir) =>
      TextOps.dedupLines(tbl(s, dir, "documents"), "doc_id", "text", minDocs = 3)
        .withColumn("kept_md5", md5(col("kept_text"))).drop("kept_text")
    },

    // SimHash near-duplicate pairs (Hamming ≤ 3 via 16-bit chunk banding —
    // exhaustive by pigeonhole, so output = exact all-pairs Hamming ≤ 3).
    // md5-derived token hashes make the signature engine-portable; the
    // oracle recomputes the 64 signature bits from md5 hex digits.
    Q("t05_simhash_neardup", Some("""
      WITH toks AS (SELECT doc_id, list_transform(regexp_extract_all(lower(text),'\S+'), t -> md5(t)) AS hs
                    FROM documents),
      bits AS (SELECT doc_id, list_transform(range(0,64), j ->
          CASE WHEN 2*len(list_filter(hs, h ->
            ((strpos('0123456789abcdef', substr(h, CAST(16 - j//4 AS INT), 1))-1) >> (j%4)) & 1 = 1)) > len(hs)
          THEN 1 ELSE 0 END) AS bv FROM toks WHERE len(hs) > 0),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(list_sum(list_transform(range(1,65), i -> abs(a.bv[CAST(i AS INT)]-b.bv[CAST(i AS INT)]))) AS INT) AS hamming
        FROM bits a JOIN bits b ON a.doc_id < b.doc_id)
      SELECT * FROM p WHERE hamming <= 3""")) { (s, dir) =>
      Dedup.simhashPairs(tbl(s, dir, "documents"), "doc_id", "text",
        tokenHash = Dedup.md5Hash64)
    },

    // Benchmark decontamination: docs < 50 play the eval suite, the rest
    // the training corpus; a training doc is contaminated when any of its
    // distinct word 3-grams appears in the eval set (3-grams because the
    // synthetic docs are short; production uses the published 13).
    Q("t17_decontaminate", Some("""
      WITH tr AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS tk
                  FROM documents WHERE doc_id >= 50),
      be AS (SELECT regexp_extract_all(lower(text),'\S+') AS tk
             FROM documents WHERE doc_id < 50),
      tg AS (SELECT doc_id, g FROM (SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(tk)-2,1)+1), i -> array_to_string(tk[i:i+2],' ')))) AS g
             FROM tr) WHERE g <> ''),
      bg AS (SELECT DISTINCT g FROM (SELECT unnest(list_distinct(list_transform(
               range(1, greatest(len(tk)-2,1)+1), i -> array_to_string(tk[i:i+2],' ')))) AS g
             FROM be) WHERE g <> ''),
      t AS (SELECT doc_id, count(*) AS ng FROM tg GROUP BY doc_id),
      m AS (SELECT doc_id, count(*) AS nc FROM tg WHERE g IN (SELECT g FROM bg) GROUP BY doc_id)
      SELECT t.doc_id, CAST(ng AS BIGINT) AS n_grams,
             CAST(coalesce(nc, 0) AS BIGINT) AS n_contaminated,
             coalesce(nc, 0) > 0 AS contaminated
      FROM t LEFT JOIN m ON t.doc_id = m.doc_id""")) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      TextOps.contaminationStats(
        docs.where(col("doc_id") >= 50), docs.where(col("doc_id") < 50),
        "doc_id", "text", n = 3)
    },

    // Sequence packing: documents laid out in id order as one token stream,
    // cut into 512-token context windows — each doc's (start_offset,
    // first/last pack). Distributed prefix sum (range partition + local
    // window + per-partition offsets), never a one-task global window.
    Q("t18_sequence_pack", Some("""
      WITH t AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens FROM documents),
      c AS (SELECT doc_id, n_tokens,
              COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS so
            FROM t)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(so AS BIGINT) AS start_offset,
             CAST(so // 512 AS BIGINT) AS pack_first,
             CAST((so + greatest(n_tokens, 1) - 1) // 512 AS BIGINT) AS pack_last
      FROM c""")) { (s, dir) =>
      TextOps.packSequences(tbl(s, dir, "documents"), "doc_id", "text", ctxLen = 512)
    },

    // Incremental exact dedup (daily-ingest shape): incoming batch minus
    // the standing corpus by content fingerprint. The bloom prefilter is a
    // pure optimization — the exact anti-join verifies every bloom-positive
    // row, so the result is oracle-exact regardless of FPP.
    Q("t19_incremental_dedup", Some("""
      SELECT i.doc_id, i.lang, i.text
      FROM documents i
      WHERE i.doc_id % 2 = 0 AND NOT EXISTS (
        SELECT 1 FROM documents c
        WHERE c.doc_id % 3 <> 0
          AND md5(regexp_replace(lower(trim(c.text)), '\s+', ' ', 'g')) =
              md5(regexp_replace(lower(trim(i.text)), '\s+', ' ', 'g')))""")) { (s, dir) =>
      val d = tbl(s, dir, "documents").select("doc_id", "lang", "text")
      Dedup.incrementalNew(
        d.where(col("doc_id") % 2 === 0),
        d.where(col("doc_id") % 3 =!= 0),
        "doc_id", "text", expectedCorpusItems = 1000L)
    },

    // Exact substring dedup (Lee et al. ExactSubstr): any 8-token window
    // occurring >= 2 times anywhere in the corpus is a duplicated span;
    // per doc, interval-union coverage of its duplicated windows. The
    // oracle replays windows + corpus counts + the running-max union.
    Q("t20_substring_dedup", Some("""
      WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS tk,
                   len(regexp_extract_all(lower(text),'\S+')) AS n
                 FROM documents WHERE len(regexp_extract_all(lower(text),'\S+')) > 0),
      w AS (SELECT doc_id, unnest(range(1, greatest(n-7,0)+1)) AS s, tk FROM t),
      wh AS (SELECT doc_id, s, md5(array_to_string(tk[s:s+7], ' ')) AS h FROM w),
      dup AS (SELECT h FROM wh GROUP BY h HAVING count(*) >= 2),
      ds AS (SELECT doc_id, s FROM wh WHERE h IN (SELECT h FROM dup)),
      cov AS (SELECT doc_id, s,
              coalesce(max(s + 7) OVER (PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pe FROM ds),
      c AS (SELECT doc_id, SUM(greatest(s + 7 - greatest(pe, s - 1), 0)) AS dup_tokens
            FROM cov GROUP BY doc_id)
      SELECT t.doc_id, CAST(n AS BIGINT) AS n_tokens,
             CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
             CAST(coalesce(c.dup_tokens, 0) AS DOUBLE) / n AS dup_ratio
      FROM t LEFT JOIN c ON t.doc_id = c.doc_id""")) { (s, dir) =>
      Dedup.duplicateSpanStats(tbl(s, dir, "documents"), "doc_id", "text", k = 8)
    },

    // Exact cosine top-5 for 20 query vectors (engine-stable via round(,9)).
    Q("t06_ann_brute", Some("""
      WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                 FROM embeddings WHERE vec_id < 20),
           c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
                 FROM embeddings),
           s AS (SELECT query_id, neighbor_id,
                   round(list_dot_product(qe, ce) /
                         (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))), 9) AS cos
                 FROM c, q WHERE neighbor_id <> query_id)
      SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank
      FROM (SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
            FROM s) WHERE rn <= 5""")) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 20), "vec_id", "embedding", 5)
    },

    // LSH-bucketed approximate top-5 (scale path: equi-join on buckets).
    // The oracle inlines the deterministic ±1 projection planes and
    // replicates candidate generation + exact-cosine rerank bit-for-bit —
    // it checks the CONTRACT (top-k by exact cosine over the deterministic
    // LSH candidate set), not a recall gamble.
    Q("t07_ann_lsh", Some(s"""
      WITH ${lshBucketCtes(12, 4, 64, 7)},
      cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
               FROM bk q JOIN bk c ON q.tbl = c.tbl AND q.bucket = c.bucket
               WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
      s AS (SELECT query_id, neighbor_id,
              round(list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 9) AS cos
            FROM cand JOIN e qe ON qe.vec_id = cand.query_id JOIN e ce ON ce.vec_id = cand.neighbor_id)
      SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank
      FROM (SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM s)
      WHERE rn <= 5""")) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 20), "vec_id", "embedding", 5)
    },

    // Embedding-cosine near-duplicate pairs (bucketed, no cross join).
    // Threshold 0.42 yields real pairs on the synthetic corpus (max pair
    // cosine is 0.513 — 0.95 would vacuously match on zero rows). Oracle:
    // same inlined-plane candidate replication + exact cosine filter.
    Q("t09_embedding_neardup", Some(s"""
      WITH ${lshBucketCtes(12, 4, 64, 7)},
      cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
               FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      s AS (SELECT id_a, id_b,
              round(list_dot_product(ea.v, eb.v) / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 9) AS cos
            FROM cand JOIN e ea ON ea.vec_id = cand.id_a JOIN e eb ON eb.vec_id = cand.id_b)
      SELECT id_a, id_b, cos FROM s WHERE cos >= 0.42""")) { (s, dir) =>
      Similarity.embeddingNearDupPairs(tbl(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.42)
    },

    // IVF top-5 (scale path #2): inverted lists by nearest coarse centroid,
    // queries probe their 4 nearest lists, exact-cosine rerank. The t10
    // codebook is the deterministic init (the 16 lowest-id vectors,
    // trainCentroids iters=0) so the oracle can reproduce the exact
    // assignment + probing in SQL; production would pass iters>0
    // (PipelineSpec covers the trained path).
    Q("t10_ann_ivf", Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      scored AS (SELECT e.vec_id, c.cid,
          list_dot_product(e.v, c.cv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS ccos
        FROM e CROSS JOIN cents c),
      asg AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
          FROM scored) WHERE rn = 1),
      probe AS (SELECT vec_id AS query_id, cid FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
          FROM scored WHERE vec_id < 20) WHERE rn <= 4),
      cand AS (SELECT probe.query_id, asg.vec_id AS neighbor_id
               FROM probe JOIN asg USING (cid) WHERE asg.vec_id <> probe.query_id),
      s AS (SELECT query_id, neighbor_id,
              round(list_dot_product(qe.v, ce.v) / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 9) AS cos
            FROM cand JOIN e qe ON qe.vec_id = cand.query_id JOIN e ce ON ce.vec_id = cand.neighbor_id)
      SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank
      FROM (SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM s)
      WHERE rn <= 5""")) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", nlist = 16, iters = 0)
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, centroids = cents, nprobe = 4)
    },

    // Semantic near-dup pairs, cluster-blocked (SemDeDup): nearest-centroid
    // assignment partitions the corpus; only same-cluster pairs are compared
    // by exact cosine. Deterministic init codebook (64 lowest-id vectors,
    // iters=0) so the oracle reproduces the exact assignment in SQL;
    // production passes a trained codebook (PipelineSpec covers iters>0).
    // 64 lists keeps intra-cluster pair work bounded as the corpus grows
    // (candidate pairs scale as corpus²/nlist).
    Q("t11_semantic_dedup", Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 64),
      scored AS (SELECT e.vec_id, c.cid,
          list_dot_product(e.v, c.cv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS ccos
        FROM e CROSS JOIN cents c),
      asg AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
          FROM scored) WHERE rn = 1),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_dot_product(ea.v, eb.v) / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 9) AS cos
            FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
            JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id)
      SELECT id_a, id_b, cos FROM p WHERE cos >= 0.35""")) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", nlist = 64, iters = 0)
      Similarity.semanticNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.35, centroids = cents)
    },

    // Within-document repetition signals (Gopher-rule quality family):
    // duplicate word/2-gram/3-gram fractions + most-frequent-2-gram share.
    Q("t12_repetition_stats", Some(s"""
      WITH $oRepCtes
      SELECT rbase.doc_id, n_tokens, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
             COALESCE(rtop.max_2gram_frac, 0.0) AS max_2gram_frac
      FROM rbase LEFT JOIN rtop ON rbase.doc_id = rtop.doc_id""")) { (s, dir) =>
      TextOps.repetitionStats(tbl(s, dir, "documents"), "doc_id", "text")
    },

    // PII scrub: per-pattern match counts + md5 of the redacted text (the
    // oracle replicates the exact sequential regexp_replace chain — both
    // engines run the same RE2-safe patterns).
    Q("t13_pii_redact", Some {
      val pats = TextOps.PiiPatterns.map(_._2.replace("'", "''"))
      val (em, ip, ph) = (pats(0), pats(1), pats(2))
      s"""
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_email,
        CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ipv4,
        CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phone,
        md5(regexp_replace(regexp_replace(regexp_replace(text,
          '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g')) AS redacted_md5
      FROM documents"""
    }) { (s, dir) =>
      TextOps.redactPii(tbl(s, dir, "documents"), "doc_id", "text")
        .withColumn("redacted_md5", md5(col("redacted"))).drop("redacted")
    },

    // Deterministic 10% sample by md5 hash bucket: the same doc_ids are
    // kept by ANY engine on every run (the oracle recomputes the bucket
    // from md5 hex digits), unlike RNG-based df.sample.
    Q("t14_deterministic_sample", Some("""
      WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
      v AS (SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 8), i ->
                CAST(strpos('0123456789abcdef', substr(hx, CAST(i + 1 AS INT), 1)) - 1 AS BIGINT)
                  * (CAST(1 AS BIGINT) << CAST((7 - i) * 4 AS INT)))) AS BIGINT) % 10000 AS bucket
            FROM h)
      SELECT doc_id FROM v WHERE bucket < 1000""")) { (s, dir) =>
      TextOps.deterministicSample(
        tbl(s, dir, "documents").select("doc_id"), "doc_id", 0.10)
    },

    // Multimodal: binary payload column + stubbed per-partition decode.
    Q("t08_multimodal_decode", Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(substr(text, 1, 32)) AS head_md5,
             CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS fake_width,
             CAST((16 + octet_length(encode(text)) % 64) // 2 AS INTEGER) AS fake_height
      FROM documents""")) { (s, dir) =>
      Multimodal.decodeStub(s, Multimodal.withPayload(tbl(s, dir, "documents"), "doc_id", "text")).toDF()
    },

    // REAL image decode through the JDK's actual PNG codec: executors
    // generate a solid-gray W×H png per doc (dims and gray level are
    // doc_id arithmetic), decodeImages round-trips it through ImageIO,
    // and the oracle recomputes the features without touching pixels —
    // solid gray g has exact BT.601 luma g, so mean_gray == doc_id % 256.
    Q("t21_image_decode", Some("""
      SELECT doc_id,
             CAST(16 + doc_id % 32 AS INTEGER) AS width,
             CAST(8 + doc_id % 16 AS INTEGER) AS height,
             'png' AS format,
             CAST(doc_id % 256 AS BIGINT) AS mean_gray
      FROM documents""")) { (s, dir) =>
      import s.implicits._
      val media = tbl(s, dir, "documents").select(col("doc_id").cast(LongType))
        .as[Long].mapPartitions { ids =>
          ids.map { id =>
            val w = (16 + id % 32).toInt
            val h = (8 + id % 16).toInt
            val g = (id % 256).toInt
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val rgb = (g << 16) | (g << 8) | g
            var y = 0
            while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            val b = bos.toByteArray
            Multimodal.MediaRow(id, b, "image/png", b.length.toLong)
          }
        }.toDF()
      Multimodal.decodeImages(s, media, strict = true).toDF()
    },

    // REAL RIFF/WAV PCM decode: executors synthesize a 16-bit mono wav per
    // doc with a constant-amplitude signal, so every decoded feature —
    // frame count, duration, RMS — is exact doc_id arithmetic the oracle
    // recomputes symbolically.
    Q("t22_audio_decode", Some("""
      SELECT doc_id,
             CAST(1 AS INTEGER) AS channels,
             CAST(8000 AS INTEGER) AS sample_rate,
             CAST(16 AS INTEGER) AS bits_per_sample,
             CAST(1000 + doc_id % 500 AS BIGINT) AS n_frames,
             CAST(floor((1000 + doc_id % 500) / 8) AS BIGINT) AS duration_ms,
             round((doc_id % 100) * 327 / 32768.0, 9) AS rms
      FROM documents""")) { (s, dir) =>
      import s.implicits._
      val media = tbl(s, dir, "documents").select(col("doc_id").cast(LongType))
        .as[Long].mapPartitions { ids =>
          ids.map { id =>
            val n = (1000 + id % 500).toInt
            val amp = ((id % 100) * 327).toShort
            val dataLen = n * 2
            val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
              .put("WAVE".getBytes("US-ASCII"))
            bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
              .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
            bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
            var i = 0
            while (i < n) { bb.putShort(amp); i += 1 }
            val b = bb.array()
            Multimodal.MediaRow(id, b, "audio/wav", b.length.toLong)
          }
        }.toDF()
      Multimodal.decodeWav(s, media, strict = true).toDF()
        .withColumn("rms", round(col("rms"), 9))
    },

    // Corpus mixing to per-source TOKEN budgets: token counts per source →
    // keep-fraction → deterministic id-hash filter. The oracle recomputes
    // fraction and bucket (t14's md5-prefix recipe) symbolically.
    Q("t30_token_budget_mix", Some("""
      WITH toks AS (SELECT source, CAST(sum(len(regexp_extract_all(text,'\S+'))) AS DOUBLE) AS t
                    FROM documents GROUP BY source),
      thr AS (SELECT source,
                CAST(round(least(1.0, CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 5000
                                        WHEN 'src2' THEN 600 END / t) * 10000, 0) AS BIGINT) AS cut
              FROM toks WHERE source IN ('src0','src1','src2')),
      h AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
      v AS (SELECT doc_id, source,
              CAST(list_sum(list_transform(range(0, 8), i ->
                CAST(strpos('0123456789abcdef', substr(hx, CAST(i + 1 AS INT), 1)) - 1 AS BIGINT)
                  * (CAST(1 AS BIGINT) << CAST((7 - i) * 4 AS INT)))) AS BIGINT) % 10000 AS bucket
            FROM h)
      SELECT v.doc_id, v.source FROM v JOIN thr ON v.source = thr.source
      WHERE v.bucket < thr.cut""")) { (s, dir) =>
      TextOps.sampleToTokenBudget(tbl(s, dir, "documents"),
        "doc_id", "text", "source",
        Map("src0" -> 800L, "src1" -> 5000L, "src2" -> 600L))
        .select("doc_id", "source")
    },

    // Audio FEATURE-EXTRACT: an alternating-sign square wave makes every
    // extended feature exact arithmetic — n-1 zero crossings, peak = rms =
    // A/32768.
    Q("t29_audio_features", Some("""
      SELECT doc_id,
             CAST(100 + doc_id % 50 AS BIGINT) AS n_frames,
             round((1000 + (doc_id % 10) * 100) / 32768.0, 9) AS rms,
             CAST(99 + doc_id % 50 AS BIGINT) AS zero_crossings,
             round((1000 + (doc_id % 10) * 100) / 32768.0, 9) AS peak
      FROM documents""")) { (s, dir) =>
      import s.implicits._
      val media = tbl(s, dir, "documents").select(col("doc_id").cast(LongType))
        .as[Long].mapPartitions { ids =>
          ids.map { id =>
            val n = (100 + id % 50).toInt
            val amp = (1000 + (id % 10) * 100).toShort
            val dataLen = n * 2
            val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
              .put("WAVE".getBytes("US-ASCII"))
            bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
              .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
            bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
            var i = 0
            while (i < n) {
              bb.putShort(if (i % 2 == 0) amp else (-amp).toShort); i += 1
            }
            val b = bb.array()
            Multimodal.MediaRow(id, b, "audio/wav", b.length.toLong)
          }
        }.toDF()
      Multimodal.audioFeatures(s, media, strict = true).toDF()
        .withColumn("rms", round(col("rms"), 9))
        .withColumn("peak", round(col("peak"), 9))
    },

    // BPE segmentation (Sennrich et al. 2016) under an EMPTY merge list:
    // pure character segmentation, so n_bpe = chars-in-tokens + one
    // end-of-word sentinel per token — exact SQL arithmetic. Training
    // (iterative argmax) is not SQL-expressible; BpeSpec proves the paper's
    // example merge sequence and end-to-end train+apply on this corpus.
    Q("t28_bpe_chars", Some("""
      SELECT doc_id,
             CAST(length(array_to_string(regexp_extract_all(lower(text), '\S+'), ''))
                  + len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS n_bpe
      FROM documents""")) { (s, dir) =>
      Bpe.applyBpe(tbl(s, dir, "documents"), "doc_id", "text", Nil)
        .select(col("doc_id"), col("n_bpe"))
    },

    // Image FEATURE-EXTRACT: decode a synthesized 8×8 gradient image
    // (pixel gray = (7x+13y+doc_id)%256, lossless PNG) and reduce to a 2×2
    // patch-mean-luma grid — every value is exact pixel arithmetic the
    // oracle replays over generate_series.
    Q("t27_image_patches", Some("""
      WITH px AS (
        SELECT d.doc_id, x.x, y.y,
               CAST((x.x*7 + y.y*13 + d.doc_id) % 256 AS DOUBLE) AS g
        FROM documents d CROSS JOIN range(8) x(x) CROSS JOIN range(8) y(y))
      SELECT doc_id, CAST((y//4)*2 + (x//4) AS INTEGER) AS patch, avg(g) AS mean_gray
      FROM px GROUP BY doc_id, (y//4)*2 + (x//4)""")) { (s, dir) =>
      import s.implicits._
      val media = tbl(s, dir, "documents").select(col("doc_id").cast(LongType))
        .as[Long].mapPartitions { ids =>
          ids.map { id =>
            val img = new java.awt.image.BufferedImage(8, 8,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val g = ((x * 7 + y * 13 + id) % 256).toInt
                img.setRGB(x, y, (g << 16) | (g << 8) | g)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            val b = bos.toByteArray
            Multimodal.MediaRow(id, b, "image/png", b.length.toLong)
          }
        }.toDF()
      Multimodal.patchFeatures(s, media, grid = 2, strict = true).toDF()
        .select(col("doc_id"), posexplode(col("features")).as(Seq("patch", "mean_gray")))
    },

    // Incremental near-dup: batch (doc_id%4=0) against the standing corpus
    // (rest) via its persisted signature index — corpus text is touched
    // only for verified candidates. Oracle = the exact batch×corpus
    // Jaccard join (the LSH path's verify makes a returned pair exact;
    // recall 1 on this corpus, same contract as t04).
    Q("t26_incremental_neardup", Some("""
      WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS tk FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(tk)-1,1)+1),
              i -> array_to_string(tk[i:i+1],' '))) AS sh FROM toks),
      p AS (SELECT a.doc_id AS id_new, b.doc_id AS id_corpus,
              len(list_intersect(a.sh,b.sh)) AS inter, len(a.sh)+len(b.sh) AS tot
            FROM sh a JOIN sh b ON a.doc_id % 4 = 0 AND b.doc_id % 4 <> 0)
      SELECT id_new, id_corpus, CAST(inter AS DOUBLE)/(tot-inter) AS jaccard
      FROM p WHERE CAST(inter AS DOUBLE)/(tot-inter) >= 0.9""")) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      val corpus = docs.where(col("doc_id") % 4 =!= 0)
      val batch = docs.where(col("doc_id") % 4 === 0)
      val index = Dedup.minhashSignatures(corpus, "doc_id", "text", wordGrams = Some(2))
      Dedup.incrementalNearDupPairs(batch, index, corpus, "doc_id", "text",
        bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
        maxBucketWidth = Some(64))
    },

    // Video frame sampling: executors synthesize an MPNG frame stream per
    // doc (4 + doc_id%5 solid-gray PNG frames at 25 fps), sample every 2nd
    // frame, REALLY decode the sampled ones (skipped frames are never
    // decoded). PNG is lossless so every decoded value is exact doc_id/idx
    // arithmetic the oracle replays.
    Q("t25_video_frames", Some("""
      SELECT doc_id, CAST(j AS INTEGER) AS frame_idx, CAST(j*40 AS BIGINT) AS ts_ms,
             CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS width,
             CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS height,
             CAST((doc_id * 7 + j * 11) % 256 AS BIGINT) AS mean_gray
      FROM documents CROSS JOIN range(0, 9, 2) t(j)
      WHERE j < 4 + doc_id % 5""")) { (s, dir) =>
      import s.implicits._
      val media = tbl(s, dir, "documents").select(col("doc_id").cast(LongType))
        .as[Long].mapPartitions { ids =>
          ids.map { id =>
            val side = (16 + (id % 3) * 8).toInt
            val frames = (0 until (4 + id % 5).toInt).map { idx =>
              val g = ((id * 7 + idx * 11) % 256).toInt
              val img = new java.awt.image.BufferedImage(side, side,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val rgb = (g << 16) | (g << 8) | g
              var y = 0
              while (y < side) { var x = 0; while (x < side) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              (idx * 40L, bos.toByteArray)
            }
            val b = Multimodal.writeFrameStream(frames)
            Multimodal.MediaRow(id, b, "video/x-graft-mjpeg", b.length.toLong)
          }
        }.toDF()
      Multimodal.sampleFrames(s, media, everyNth = 2, strict = true).toDF()
    },

    // IVF-PQ ANN (Jégou et al. 2011): corpus vectors → 8×16-code product
    // quantization, IVF-routed candidates (equi-join on coarse centroid),
    // ADC scoring from codes alone. Deterministic iters=0 codebooks (first
    // 8 raw vectors coarse / first 16 normalized slices per subspace) and
    // refine=0 (pure-ADC ranking) so the oracle replays the whole index in
    // SQL; the trained + reranked path is PipelineSpec/QuantizationSpec
    // territory (full-budget run ≡ brute force, exactly).
    Q("t24_ann_ivfpq", Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      n AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
      cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
      cscore AS (SELECT n.vec_id, c.cid,
          list_dot_product(n.vn, c.cv) / (sqrt(list_dot_product(n.vn, n.vn)) * sqrt(list_dot_product(c.cv, c.cv))) AS ccos
        FROM n CROSS JOIN cents c),
      asg AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
          FROM cscore) WHERE rn = 1),
      probe AS (SELECT vec_id AS query_id, cid FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
          FROM cscore WHERE vec_id < 20) WHERE rn <= 2),
      subs AS (SELECT vec_id, j, list_slice(vn, j*8+1, j*8+8) AS s
               FROM n CROSS JOIN range(8) t(j)),
      cb AS (SELECT j, vec_id AS code, s AS cbv FROM subs WHERE vec_id < 16),
      codescore AS (SELECT subs.vec_id, subs.j, cb.code,
          2*list_dot_product(subs.s, cb.cbv) - list_dot_product(cb.cbv, cb.cbv) AS sc
        FROM subs JOIN cb ON subs.j = cb.j),
      codes AS (SELECT vec_id, j, code FROM (
          SELECT vec_id, j, code, row_number() OVER (PARTITION BY vec_id, j ORDER BY sc DESC, code) AS rn
          FROM codescore) WHERE rn = 1),
      recon AS (SELECT codes.vec_id, flatten(list(cb.cbv ORDER BY codes.j)) AS rv
        FROM codes JOIN cb ON cb.j = codes.j AND cb.code = codes.code
        GROUP BY codes.vec_id),
      cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probe p JOIN asg a USING (cid) WHERE a.vec_id <> p.query_id),
      scored AS (SELECT c.query_id, c.neighbor_id,
          round(list_dot_product(qn.vn, r.rv), 9) AS adc
        FROM cand c JOIN n qn ON qn.vec_id = c.query_id
        JOIN recon r ON r.vec_id = c.neighbor_id)
      SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank
      FROM (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rn
            FROM scored)
      WHERE rn <= 5""")) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      val coarse = Similarity.trainCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 0)
      val cb = Quantization.trainPQ(emb, "vec_id", "embedding", m = 8, k = 16)
      Quantization.ivfpqTopK(emb, emb.where(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, coarse = coarse, codebooks = cb, nprobe = 2, refine = 0)
    },

    // Vocabulary building (BPE/WordPiece seeding): corpus token counts →
    // top-K vocab, ties at the cut broken by token so the SET is unique.
    Q("t23_vocab_topk", Some("""
      WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS token FROM documents)
      SELECT token, CAST(count(*) AS BIGINT) AS cnt
      FROM toks GROUP BY token
      ORDER BY cnt DESC, token LIMIT 100""")) { (s, dir) =>
      TextOps.buildVocab(tbl(s, dir, "documents"), "text", 100)
    },

    // fastText-style quality scoring with a FIXED (formula-derived) weight
    // vector: verifies the whole production path — tokenize, md5 bucket,
    // broadcast-array weight lookup, mean, sigmoid — cross-engine. The
    // trainable path (MLlib logistic regression producing the weights) is
    // SelectionSpec's separability test; scoring is engine-portable.
    Q("t31_quality_score", Some(s"""
      WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'\\S+') AS tok FROM documents),
      g AS (SELECT doc_id, unnest(tok) AS gr FROM tk),
      b AS (SELECT doc_id, ${obucket("gr", 1024)} AS b FROM g),
      s AS (SELECT doc_id, sum(CAST(b % 101 AS DOUBLE)/50.0 - 1.0) AS ws,
                   count(*) AS n FROM b GROUP BY doc_id)
      SELECT d.doc_id,
             round(1.0/(1.0 + exp(-(0.25 + coalesce(ws/n, 0.0)))), 6) AS quality
      FROM (SELECT doc_id FROM documents) d LEFT JOIN s USING (doc_id)""")) { (s, dir) =>
      Selection.qualityScore(tbl(s, dir, "documents"), "doc_id", "text",
        Selection.QualityModel(
          Array.tabulate(1024)(b => b % 101 / 50.0 - 1.0), 0.25))
    },

    // DSIR importance weights (Xie et al. NeurIPS'23): hashed
    // unigram+bigram LMs of target (doc_id < 50) vs raw (doc_id >= 50),
    // per-raw-doc log importance ratio. Both models are 1024-bucket count
    // arrays — the oracle recomputes them relationally.
    Q("t32_dsir_weights", Some(s"""
      WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'\\S+') AS tk FROM documents),
      g0 AS (SELECT doc_id, unnest(list_concat(
               list_transform(range(1, greatest(len(tk),1)+1), i -> array_to_string(tk[i:i],' ')),
               list_transform(range(1, greatest(len(tk)-1,1)+1), i -> array_to_string(tk[i:i+1],' ')))) AS gr
             FROM tk),
      g AS (SELECT doc_id, ${obucket("gr", 1024)} AS b FROM g0 WHERE gr <> ''),
      tc AS (SELECT b, count(*) AS n FROM g WHERE doc_id < 50 GROUP BY b),
      tt AS (SELECT CAST(coalesce(sum(n),0) AS DOUBLE) + 1024 AS tot FROM tc),
      rc AS (SELECT b, count(*) AS n FROM g WHERE doc_id >= 50 GROUP BY b),
      rt AS (SELECT CAST(coalesce(sum(n),0) AS DOUBLE) + 1024 AS tot FROM rc),
      s AS (SELECT g.doc_id,
              sum(ln((coalesce(tc.n,0)+1)/(SELECT tot FROM tt))
                - ln((coalesce(rc.n,0)+1)/(SELECT tot FROM rt))) AS sc
            FROM g LEFT JOIN tc ON g.b = tc.b LEFT JOIN rc ON g.b = rc.b
            WHERE g.doc_id >= 50 GROUP BY g.doc_id)
      SELECT d.doc_id, round(coalesce(s.sc, 0.0), 6) AS log_weight
      FROM (SELECT doc_id FROM documents WHERE doc_id >= 50) d
      LEFT JOIN s USING (doc_id)""")) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      Selection.dsirWeights(
        docs.where(col("doc_id") >= 50), docs.where(col("doc_id") < 50),
        "doc_id", "text", dim = 1024)
    },

    // Cross-corpus MinHash similarity JOIN (even-id docs vs odd-id docs):
    // the oracle is the EXACT word-2-gram Jaccard >= 0.9 cross pair set —
    // the banded LSH at the fixed seed must recall every pair above the
    // clean threshold gap (same contract as t04) while the Spark plan
    // never forms a cross product.
    Q("t33_crosscorpus_join", Some("""
      WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS tk FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(tk)-1,1)+1),
              i -> array_to_string(tk[i:i+1],' '))) AS sh FROM toks),
      p AS (SELECT a.doc_id AS id_left, b.doc_id AS id_right,
              len(list_intersect(a.sh,b.sh)) AS inter, len(a.sh)+len(b.sh) AS tot
            FROM sh a JOIN sh b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1)
      SELECT id_left, id_right, CAST(inter AS DOUBLE)/(tot-inter) AS jaccard
      FROM p WHERE CAST(inter AS DOUBLE)/(tot-inter) >= 0.9""")) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      Dedup.minhashJoin(
        docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1),
        "doc_id", "text", threshold = 0.9, wordGrams = Some(2))
    },

    // Okapi BM25 top-10 retrieval of 5 query docs against the full corpus
    // (Lucene-style non-negative idf). Scores round to 6 decimals and ties
    // rank by doc id, so the ranking is engine-portable; the oracle
    // recomputes tf/df/dl/avgdl relationally with the exact same formula.
    Q("t34_bm25_topk", Some("""
      WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS tk FROM documents),
      dl AS (SELECT doc_id, len(tk) AS dl FROM tk),
      st AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl FROM dl),
      tf AS (SELECT doc_id, t, count(*) AS tf, max(dl) AS dl FROM
               (SELECT k.doc_id, unnest(k.tk) AS t, l.dl
                FROM tk k JOIN dl l ON k.doc_id = l.doc_id)
             GROUP BY doc_id, t),
      qt AS (SELECT doc_id AS qid, unnest(list_distinct(tk)) AS t FROM tk WHERE doc_id < 5),
      df AS (SELECT t, count(*) AS df FROM tf WHERE t IN (SELECT DISTINCT t FROM qt) GROUP BY t),
      sc AS (SELECT q.qid, f.doc_id,
               sum(ln((s.n - d.df + 0.5)/(d.df + 0.5) + 1.0)
                   * (f.tf*(1.2+1))/(f.tf + 1.2*(1 - 0.75 + 0.75*f.dl/s.avgdl))) AS raw
             FROM qt q JOIN tf f ON q.t = f.t JOIN df d ON q.t = d.t CROSS JOIN st s
             GROUP BY q.qid, f.doc_id),
      r AS (SELECT qid, doc_id, round(raw, 6) AS score,
              row_number() OVER (PARTITION BY qid ORDER BY round(raw, 6) DESC, doc_id) AS rank
            FROM sc)
      SELECT qid AS query_id, doc_id, score, CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 10""")) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      Retrieval.bm25TopK(docs, docs.where(col("doc_id") < 5),
        "doc_id", "text", "doc_id", "text", k = 10)
    },

    // Sliding-window document chunking (40-token windows, 10-token
    // overlap → stride 30): a window starts at every stride multiple
    // below the doc length, tails included, empty docs emit nothing.
    Q("t35_chunk_documents", Some("""
      WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS tk FROM documents),
      c AS (SELECT doc_id, unnest(list_transform(range(0, (len(tk)-1)//30 + 1),
              i -> {'chunk_idx': CAST(i AS INT),
                    'chunk_text': array_to_string(tk[i*30+1 : i*30+40], ' '),
                    'n_tokens': CAST(len(tk[i*30+1 : i*30+40]) AS INT)}),
              recursive := true) AS u
            FROM tk WHERE len(tk) > 0)
      SELECT doc_id, chunk_idx, chunk_text, n_tokens FROM c""")) { (s, dir) =>
      TextOps.chunkDocuments(tbl(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 40, overlapTokens = 10)
    },

    // CCNet-style LM perplexity filter: interpolated hashed-bigram model
    // trained on the reference split (doc_id < 50), per-doc negative mean
    // log-likelihood over the raw split. The oracle rebuilds both count
    // tables relationally; the interpolation constants are CAST to DOUBLE
    // and `1 - λ` written as a subtraction (DuckDB decimal literals would
    // otherwise give an exact 0.1 where Scala's double 1-0.9 is not).
    Q("t36_lm_perplexity", Some(s"""
      WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'\\S+') AS tk FROM documents),
      u AS (SELECT ${obucket("t", 4096)} AS b, count(*) AS n FROM
              (SELECT unnest(tk) AS t FROM tk WHERE doc_id < 50) GROUP BY 1),
      tt AS (SELECT CAST(coalesce(sum(n),0) + 4096 AS DOUBLE) AS t FROM u),
      bgc AS (SELECT ${obucket("g", 16384)} AS b, count(*) AS n FROM
               (SELECT unnest(list_transform(range(2, len(tk)+1), i -> tk[i-1]||' '||tk[i])) AS g
                FROM tk WHERE doc_id < 50 AND len(tk) >= 2) GROUP BY 1),
      d0 AS (SELECT doc_id, unnest(list_transform(range(2, len(tk)+1), i ->
               {'p': tk[i-1], 'c': tk[i], 'g': tk[i-1]||' '||tk[i]}), recursive := true)
             FROM tk WHERE doc_id >= 50 AND len(tk) >= 2),
      d AS (SELECT doc_id, ${obucket("p", 4096)} AS pb, ${obucket("c", 4096)} AS cb,
                   ${obucket("g", 16384)} AS gb FROM d0),
      terms AS (SELECT d.doc_id,
          ln(CAST(0.9 AS DOUBLE) * (CASE WHEN coalesce(up.n, 0) > 0
                         THEN CAST(coalesce(bb.n, 0) AS DOUBLE) / up.n ELSE 0.0 END)
             + (CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))
               * (coalesce(uc.n, 0) + 1) / (SELECT t FROM tt)) AS term
        FROM d LEFT JOIN u up ON d.pb = up.b
               LEFT JOIN u uc ON d.cb = uc.b
               LEFT JOIN bgc bb ON d.gb = bb.b)
      SELECT doc_id, round(-avg(term), 6) AS log_ppl
      FROM terms GROUP BY doc_id""")) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      Selection.lmPerplexity(
        docs.where(col("doc_id") >= 50), docs.where(col("doc_id") < 50),
        "doc_id", "text")
    },

    // Distributed PCA, part 1 — the FIT path. The full-rank (k = d) model's
    // spectral reconstruction Σₖ λₖ vₖvₖᵀ must reproduce the population
    // covariance, so the oracle computes covariance entries directly from
    // the raw embeddings while Spark answers from eigenpairs: one row per
    // (i ≤ j) pair over the first 8 dims, but every entry exercises ALL 64
    // eigenpairs of the moment pass + Jacobi solve. The output frame is
    // driver-built because it IS the model (d² doubles — metadata-sized at
    // any corpus scale, like t10's codebook); the corpus-sized work is the
    // single treeAggregate moment pass inside Pca.fit.
    Q("t37_pca_covariance", Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      u AS (SELECT vec_id, CAST(r.i AS INT) - 1 AS i, v[CAST(r.i AS INT)] AS x
            FROM e CROSS JOIN range(1, 9) AS r(i)),
      m AS (SELECT i, avg(x) AS mu FROM u GROUP BY i),
      p AS (SELECT a.i AS i, b.i AS j, avg(a.x * b.x) AS exy
            FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i)
      SELECT p.i, p.j, round(exy - mi.mu * mj.mu, 6) AS cov
      FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j""")) { (s, dir) =>
      val model = Pca.fit(tbl(s, dir, "embeddings"), "embedding", k = 64)
      val rows = for { i <- 0 until 8; j <- i until 8 } yield {
        val c = (0 until 64).map(t =>
          model.eigenvalues(t) * model.components(t)(i) * model.components(t)(j)).sum
        (i, j, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      import s.implicits._
      rows.toDF("i", "j", "cov")
    },

    // Distributed PCA, part 2 — the PROJECT path (map-only Column plan over
    // the inlined components). At full rank the projection is an orthogonal
    // change of basis, so per-vector Σₖ projₖ² must equal the centered
    // squared norm ‖x−μ‖² — which the oracle computes straight from the
    // data (‖x‖² − 2x·μ + ‖μ‖²). Verifies the component matrix is
    // orthonormal AND the x·vₖ − μ·vₖ offset arithmetic, per row, with a
    // hash match. Truncated-k behavior (monotone variance capture) is
    // PcaSpec's job — it has no SQL expression.
    Q("t38_pca_project", Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      m AS (SELECT [${(1 to 64).map(i => s"avg(v[$i])").mkString(", ")}]::DOUBLE[] AS mu FROM e)
      SELECT vec_id, round(list_dot_product(v, v) - 2 * list_dot_product(v, mu)
                           + list_dot_product(mu, mu), 6) AS pnorm2
      FROM e CROSS JOIN m""")) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      val model = Pca.fit(emb, "embedding", k = 64)
      Pca.project(emb, "embedding", model, "p")
        .select(col("vec_id"),
          round(graft.functions.DotProduct(col("p"), col("p")), 6).as("pnorm2"))
    },

    // Johnson–Lindenstrauss random projection — PCA's data-free sibling.
    // The Gaussian planes are seed-derived constants, so the oracle inlines
    // the exact doubles (Double.toString round-trips) and replicates every
    // projected coordinate bit-for-bit at 9 dp: same left-to-right dot,
    // same Scala-computed 1/√k factor CAST to DOUBLE (a bare DuckDB
    // decimal literal would change the arithmetic).
    Q("t39_random_projection", Some {
      val pl = Similarity.gaussianPlanes(8, 64, 11L)
      val values = pl.zipWithIndex
        .map { case (g, j) => s"($j, [${g.mkString(",")}])" }.mkString(", ")
      val scale = 1.0 / math.sqrt(8.0)
      s"""
      WITH pl(j, plane) AS (VALUES $values),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT vec_id, CAST(j AS INT) AS j,
             round(list_dot_product(v, CAST(plane AS DOUBLE[])) * CAST($scale AS DOUBLE), 9) AS p
      FROM e CROSS JOIN pl"""
    }) { (s, dir) =>
      Similarity.randomProject(tbl(s, dir, "embeddings"), "embedding",
        k = 8, seed = 11L, outCol = "rp")
        .select(col("vec_id"), posexplode(col("rp")).as(Seq("j", "p0")))
        .select(col("vec_id"), col("j").cast(IntegerType).as("j"),
          round(col("p0"), 9).as("p"))
    },

    // The COMPOSITE curation pipeline — the flagship "it all composes"
    // query: quality gate → exact dedup (keep-min) → near-dup removal
    // (drop the larger id of every verified MinHash pair) → benchmark
    // decontamination (8-gram, the GPT-3-recipe scale — 3-grams flag ~95%
    // of any real corpus), each stage the SAME operator its standalone
    // query verifies (t01/t02/t04/t17 machinery), so the oracle is the
    // composition of those four already-proven SQL shapes.
    // Exactness carries through the composition: the quality/dedup stages
    // only REMOVE documents, signatures depend only on text, so every
    // surviving true pair still co-buckets under the fixed seed (bucket
    // widths only shrink ⇒ the width prune keeps at least as much), and
    // the pair set stays exact-verified. Corpus = doc_id ≥ 50, benchmark
    // = doc_id < 50 (the t17/t36 split). No new shuffles beyond the
    // operators' own: the pair set and contaminated-id set are tiny
    // (broadcast anti-joins); everything else is map + the operators'
    // existing scale shapes.
    Q("t40_curation_pipeline", Some(s"""
      WITH s AS (SELECT doc_id, text, $oen AS en,
               len(regexp_extract_all(text, '\\S+')) AS ntok
             FROM documents WHERE doc_id >= 50),
      ok AS (SELECT doc_id, text, ntok FROM s WHERE ntok >= 10 AND en * 20 >= ntok),
      h AS (SELECT doc_id, text, ntok, min(doc_id) OVER (PARTITION BY
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS canon
            FROM ok),
      d AS (SELECT doc_id, text, ntok FROM h WHERE doc_id = canon),
      toks AS (SELECT doc_id, regexp_extract_all(lower(text),'\\S+') AS tk FROM d),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(tk)-1,1)+1),
              i -> array_to_string(tk[i:i+1],' '))) AS sh FROM toks),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              len(list_intersect(a.sh,b.sh)) AS inter, len(a.sh)+len(b.sh) AS tot
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      pr AS (SELECT DISTINCT id_b FROM p WHERE CAST(inter AS DOUBLE)/(tot-inter) >= 0.9),
      nd AS (SELECT doc_id, text, ntok FROM d WHERE doc_id NOT IN (SELECT id_b FROM pr)),
      trg AS (SELECT doc_id, unnest(list_distinct(list_transform(
                range(1, greatest(len(tk)-7,1)+1), i -> array_to_string(tk[i:i+7],' ')))) AS g
              FROM (SELECT doc_id, regexp_extract_all(lower(text),'\\S+') AS tk FROM nd)),
      bg AS (SELECT DISTINCT unnest(list_distinct(list_transform(
                range(1, greatest(len(tk)-7,1)+1), i -> array_to_string(tk[i:i+7],' ')))) AS g
             FROM (SELECT regexp_extract_all(lower(text),'\\S+') AS tk
                   FROM documents WHERE doc_id < 50)),
      cont AS (SELECT DISTINCT doc_id FROM trg
               WHERE g <> '' AND g IN (SELECT g FROM bg WHERE g <> '')),
      fin AS (SELECT doc_id, text, ntok FROM nd
              WHERE doc_id NOT IN (SELECT doc_id FROM cont))
      SELECT doc_id, CAST(ntok AS BIGINT) AS n_tokens,
        CASE WHEN $oen > 0 AND $oen >= $ofr AND $oen >= $ode AND $oen >= $oes THEN 'en'
             WHEN $ofr > 0 AND $ofr >= $ode AND $ofr >= $oes THEN 'fr'
             WHEN $ode > 0 AND $ode >= $oes THEN 'de'
             WHEN $oes > 0 THEN 'es' ELSE 'und' END AS pred_lang
      FROM fin""")) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      val bench = docs.where(col("doc_id") < 50)
      val corpus = docs.where(col("doc_id") >= 50)
      // Persisted (round-16): dropExactDuplicates reads `ok` twice (the
      // canonical-id aggregate AND the semi-join probe side), and the
      // quality bucket is two regexp match-counts per row — without the
      // persist that scan+regexp work ran twice per t40 invocation.
      val ok = corpus.where(TextOps.qualityBucket(col("text")) === "ok")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // Materialize the deduped corpus ONCE: four consumers read it
      // (signature build, near-dup anti-join, contamination grams, final
      // projection) and Catalyst shares no subtrees across them — without
      // this the scan → quality filter → fingerprint-window dedup subtree
      // (a full shuffle) recomputes per consumer.
      val deduped = Par.materialize(
        Dedup.dropExactDuplicates(ok, "doc_id", "text"))
      ok.unpersist(blocking = false)
      val pairs = Dedup.minhashPairs(deduped, "doc_id", "text",
        bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
        maxBucketWidth = Some(64))
      val near = deduped.join(
        pairs.select(col("id_b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      val contaminated = TextOps.contaminationStats(near, bench, "doc_id", "text", n = 8)
        .where(col("contaminated")).select("doc_id")
      near.join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.langId(col("text")).as("pred_lang"))
    },

    // ExactSubstr REMOVAL (Lee et al. ACL'22 §3.2) — the action t20 only
    // reports: every non-canonical duplicated 8-token span is cut from its
    // document, exactly one copy (the (id,start)-minimum) survives
    // corpus-wide. The oracle replicates the full contract: window hashes,
    // per-hash canonical election, position coverage, reconstruction.
    Q("t41_span_removal", Some("""
      WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS tk,
                   len(regexp_extract_all(lower(text),'\S+')) AS n
                 FROM documents WHERE len(regexp_extract_all(lower(text),'\S+')) > 0),
      w AS (SELECT doc_id, unnest(range(1, greatest(n-7,0)+1)) AS s, tk FROM t),
      wh AS (SELECT doc_id, s, md5(array_to_string(tk[s:s+7], ' ')) AS h FROM w),
      r AS (SELECT doc_id, s,
              count(*) OVER (PARTITION BY h) AS occ,
              row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
            FROM wh),
      rm AS (SELECT doc_id, s FROM r WHERE occ >= 2 AND rn > 1),
      cov AS (SELECT DISTINCT doc_id, unnest(range(s, s+8)) AS p FROM rm),
      tok AS (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk,1) AS p FROM t),
      keep AS (SELECT tok.doc_id, tok.p, tok.tok FROM tok LEFT JOIN cov
                 ON tok.doc_id = cov.doc_id AND tok.p = cov.p WHERE cov.p IS NULL),
      agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS ct,
                count(*) AS kept FROM keep GROUP BY doc_id)
      SELECT t.doc_id, coalesce(agg.ct, '') AS clean_text,
             CAST(n AS BIGINT) AS n_tokens,
             CAST(n - coalesce(agg.kept, 0) AS BIGINT) AS removed_tokens
      FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id""")) { (s, dir) =>
      Dedup.removeDuplicateSpans(tbl(s, dir, "documents"), "doc_id", "text", k = 8)
    },

    // Near-dup dedup with a RETENTION POLICY: per transitive cluster keep
    // the LONGEST member (n_chars desc, doc_id tie-break) instead of the
    // min id — the policy real pipelines run. Oracle: t15's recursive-CTE
    // transitive closure, winner elected by the same ordering.
    Q("t42_neardup_keep_longest", Some(s"""
      WITH RECURSIVE $minhashPairCtes,
      edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pr
                UNION SELECT id_b, id_a FROM pr),
      cc(id, lbl) AS (
        SELECT DISTINCT u, u FROM edges
        UNION
        SELECT e.u, c.lbl FROM edges e JOIN cc c ON c.id = e.v WHERE c.lbl < e.u),
      comp AS (SELECT id AS doc_id, MIN(lbl) AS component FROM cc GROUP BY id),
      m AS (SELECT c.doc_id,
              row_number() OVER (PARTITION BY c.component
                ORDER BY d.n_chars DESC, c.doc_id) AS rn
            FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
      losers AS (SELECT doc_id FROM m WHERE rn > 1)
      SELECT doc_id, n_chars FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM losers)""")) { (s, dir) =>
      Dedup.dropNearDuplicatesKeeping(tbl(s, dir, "documents"), "doc_id",
          "text", keepBy = col("n_chars"),
          bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2),
          maxBucketWidth = Some(64))
        .select(col("doc_id"), col("n_chars"))
    },

    // Corpus-distribution divergence (mixing/drift observability): KL both
    // directions + Jensen–Shannon between the target (doc_id < 50) and raw
    // (doc_id >= 50) splits' smoothed hashed-gram distributions in the
    // DEFAULT DSIR feature space (unigrams + bigrams — t32's gram stream).
    // The oracle rebuilds both bucket-count tables and the same add-1
    // formulas; summation drift ≪ the 6-decimal contract.
    Q("t43_corpus_divergence", Some(s"""
      WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'\\S+') AS tk FROM documents),
      g0 AS (SELECT doc_id, unnest(list_concat(
               list_transform(range(1, greatest(len(tk),1)+1), i -> array_to_string(tk[i:i],' ')),
               list_transform(range(1, greatest(len(tk)-1,1)+1), i -> array_to_string(tk[i:i+1],' ')))) AS gr
             FROM tk),
      g AS (SELECT doc_id, ${obucket("gr", 4096)} AS b FROM g0 WHERE gr <> ''),
      pc AS (SELECT b, count(*) AS n FROM g WHERE doc_id >= 50 GROUP BY b),
      qc AS (SELECT b, count(*) AS n FROM g WHERE doc_id < 50 GROUP BY b),
      pt AS (SELECT CAST(coalesce(sum(n),0) + 4096 AS DOUBLE) AS t FROM pc),
      qt AS (SELECT CAST(coalesce(sum(n),0) + 4096 AS DOUBLE) AS t FROM qc),
      bb AS (SELECT unnest(range(0, 4096)) AS b),
      j AS (SELECT (coalesce(pc.n,0) + 1) / (SELECT t FROM pt) AS pp,
                   (coalesce(qc.n,0) + 1) / (SELECT t FROM qt) AS qq
            FROM bb LEFT JOIN pc ON bb.b = pc.b LEFT JOIN qc ON bb.b = qc.b)
      SELECT round(sum(pp * ln(pp / qq)), 6) AS kl_pq,
             round(sum(qq * ln(qq / pp)), 6) AS kl_qp,
             round(sum(0.5 * pp * ln(pp / ((pp + qq) / 2))
                     + 0.5 * qq * ln(qq / ((pp + qq) / 2))), 6) AS jsd
      FROM j""")) { (s, dir) =>
      val docs = tbl(s, dir, "documents")
      Selection.corpusDivergence(
        docs.where(col("doc_id") >= 50), docs.where(col("doc_id") < 50),
        "doc_id", "text")
    },

    // Deterministic global corpus shuffle + sharding (the pre-training
    // "shuffle the corpus" step, reproducible across engines/retries):
    // order = md5 bucket of (id, seed), shard = order mod n. The oracle
    // replicates key, shard, and per-shard dense positions exactly.
    Q("t44_corpus_shuffle", Some(s"""
      WITH d AS (SELECT doc_id,
              ${obucket("CAST(doc_id AS VARCHAR) || ':42'", 1 << 30)} AS ord
            FROM documents)
      SELECT doc_id, CAST(ord % 8 AS INTEGER) AS shard,
             CAST(row_number() OVER (PARTITION BY ord % 8 ORDER BY ord, doc_id)
               AS BIGINT) AS position
      FROM d""")) { (s, dir) =>
      TextOps.shuffleShards(tbl(s, dir, "documents"), "doc_id",
        seed = 42L, nShards = 8)
    },

    // Per-label mean embeddings (class prototypes — the supervised sibling
    // of the IVF codebook). Exact DECIMAL(27,12) component sums make the
    // float means bit-portable; the oracle recomputes them sequentially.
    Q("t45_label_centroids", Some("""
      WITH e AS (SELECT label, len(embedding) AS d,
                        CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      u AS (SELECT label, CAST(r.i AS INT) - 1 AS i, v[CAST(r.i AS INT)] AS x
            FROM e CROSS JOIN range(1, 65) AS r(i) WHERE r.i <= d)
      SELECT label, i,
             round(CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 9)
               AS centroid
      FROM u GROUP BY label, i""")) { (s, dir) =>
      Similarity.groupCentroids(tbl(s, dir, "embeddings"), "embedding",
          Seq("label"))
        .select(col("label"), posexplode(col("centroid")).as(Seq("i", "centroid")))
        .select(col("label"), col("i").cast(IntegerType).as("i"),
          round(col("centroid"), 9).as("centroid"))
    },

    // Cross-table SEMANTIC join (decontamination / eval-overlap audit in
    // embedding space): a benchmark set (vec_id < 50, the bounded LEFT)
    // cosine-matched against corpus vectors (vec_id >= 50, the unbounded
    // RIGHT — minhashJoin's argument convention) through the shared LSH
    // buckets — the embedding sibling of t33's lexical cross-corpus join.
    // The oracle replicates candidate generation + exact-cosine verify.
    Q("t46_semantic_join", Some(s"""
      WITH ${lshBucketCtes(12, 4, 64, 7)},
      cand AS (SELECT DISTINCT l.vec_id AS id_left, r.vec_id AS id_right
               FROM bk l JOIN bk r ON l.tbl = r.tbl AND l.bucket = r.bucket
               WHERE l.vec_id < 50 AND r.vec_id >= 50),
      s AS (SELECT id_left, id_right,
              round(list_dot_product(le.v, re.v) / (sqrt(list_dot_product(le.v, le.v)) * sqrt(list_dot_product(re.v, re.v))), 9) AS cos
            FROM cand JOIN e le ON le.vec_id = cand.id_left
                      JOIN e re ON re.vec_id = cand.id_right)
      SELECT id_left, id_right, cos FROM s WHERE cos >= 0.42""")) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      Similarity.embeddingJoin(
        emb.where(col("vec_id") < 50), emb.where(col("vec_id") >= 50),
        "vec_id", "vec_id", "embedding", threshold = 0.42)
    },

    // Gopher quality gate (Rae et al. 2021 A1.1) with auditable first-fail
    // reasons; the oracle replicates every rule and the precedence order.
    Q("t47_gopher_filter", Some(s"""
      WITH $oGopherCtes
      SELECT doc_id, g_reason IS NULL AS keep, g_reason AS fail_reason
      FROM gr""")) { (s, dir) =>
      TextOps.gopherFilter(tbl(s, dir, "documents"), "doc_id", "text")
    },

    // The FULL heuristic document filter: t47's quality rules, then the
    // repetition gates over t12's signals (word-level adaptation of the
    // MassiveText thresholds), quality reasons first. The oracle composes
    // the two proven CTE families and the precedence.
    Q("t48_massivetext_filter", Some(s"""
      WITH $oRepCtes,
      rep AS (SELECT rbase.doc_id,
        CASE WHEN rbase.doc_id IS NULL THEN 'no_id'
             WHEN dup_word_frac > 0.30 THEN 'dup_word_frac'
             WHEN dup_2gram_frac > 0.20 THEN 'dup_2gram_frac'
             WHEN dup_3gram_frac > 0.18 THEN 'dup_3gram_frac'
             WHEN COALESCE(rtop.max_2gram_frac, 0.0) > 0.20 THEN 'max_2gram_frac' END AS r_reason
        FROM rbase LEFT JOIN rtop ON rbase.doc_id = rtop.doc_id),
      $oGopherCtes
      SELECT gr.doc_id,
             COALESCE(g_reason, r_reason) IS NULL AS keep,
             COALESCE(g_reason, r_reason) AS fail_reason
      FROM gr LEFT JOIN rep ON gr.doc_id = rep.doc_id""")) { (s, dir) =>
      TextOps.massiveTextFilter(tbl(s, dir, "documents"), "doc_id", "text")
    },

    // Corpus mixing budgeted on TRAINED-TOKENIZER counts (Bpe
    // .tokenCountColumn → sampleToTokenBudgetBy) — what a pretraining
    // token budget actually means; t30 is the whitespace-word variant.
    // The merge list is fixed at [(a,b), (ab,c)] so DuckDB can recompute
    // the BPE count symbolically: per word, len+1 symbols minus one per
    // merge application, where a single left-to-right replace() pass
    // counts exactly the non-overlapping applications ("ab"/"abc" have
    // distinct characters, so occurrences cannot overlap and every
    // original "abc" becomes an (ab,c) adjacency). Bucket recipe = t30's.
    Q("t49_bpe_token_budget", Some("""
      WITH words AS (
        SELECT doc_id, source, unnest(regexp_extract_all(lower(text), '\S+')) AS w
        FROM documents),
      bpe AS (
        SELECT doc_id, source,
               CAST(sum(len(w) + 1
                 - (len(w) - len(replace(w, 'ab', ''))) // 2
                 - (len(w) - len(replace(w, 'abc', ''))) // 3) AS BIGINT) AS n_bpe
        FROM words GROUP BY doc_id, source),
      toks AS (SELECT source, CAST(sum(n_bpe) AS DOUBLE) AS t FROM bpe GROUP BY source),
      thr AS (SELECT source,
                CAST(round(least(1.0, CASE source WHEN 'src0' THEN 2000 WHEN 'src1' THEN 9000
                                        WHEN 'src2' THEN 1500 END / t) * 10000, 0) AS BIGINT) AS cut
              FROM toks WHERE source IN ('src0','src1','src2')),
      h AS (SELECT doc_id, source, n_bpe, md5(CAST(doc_id AS VARCHAR)) AS hx FROM bpe),
      v AS (SELECT doc_id, source, n_bpe,
              CAST(list_sum(list_transform(range(0, 8), i ->
                CAST(strpos('0123456789abcdef', substr(hx, CAST(i + 1 AS INT), 1)) - 1 AS BIGINT)
                  * (CAST(1 AS BIGINT) << CAST((7 - i) * 4 AS INT)))) AS BIGINT) % 10000 AS bucket
            FROM h)
      SELECT v.doc_id, v.source, v.n_bpe FROM v JOIN thr ON v.source = thr.source
      WHERE v.bucket < thr.cut""")) { (s, dir) =>
      val merges = Seq(("a", "b"), ("ab", "c"))
      val cnt = Bpe.tokenCountColumn(s, merges)(col("text"))
      TextOps.sampleToTokenBudgetBy(tbl(s, dir, "documents"),
        "doc_id", cnt, "source",
        Map("src0" -> 2000L, "src1" -> 9000L, "src2" -> 1500L))
        .select(col("doc_id"), col("source"), cnt.as("n_bpe"))
    },

    // Inverted-index n-gram Jaccard dedup: candidate pairs share a RARE
    // char-5-gram (document frequency in [2,5] — common shingles are
    // discarded before any posting list forms), exact shingle-set Jaccard
    // verify at ≥ 0.5. Deterministic recall for pairs sharing a distinctive
    // substring — the exact sibling of t04's probabilistic MinHash front
    // end. The oracle replays the same blocking + verify with DuckDB list
    // functions.
    Q("t50_ngram_jaccard", Some("""
      WITH sets AS (
        SELECT doc_id, list_distinct(list_transform(
                 range(1, greatest(length(text) - 4, 1) + 1),
                 i -> substr(text, CAST(i AS INTEGER), 5))) AS s
        FROM documents),
      sh AS (SELECT doc_id, unnest(s) AS sh FROM sets),
      rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) BETWEEN 2 AND 5),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN rare r ON a.sh = r.sh JOIN sh b ON b.sh = r.sh
        WHERE a.doc_id < b.doc_id)
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE)
               AS jaccard
      FROM cand c
      JOIN sets sa ON sa.doc_id = c.id_a
      JOIN sets sb ON sb.doc_id = c.id_b
      WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE)
            >= 0.5""")) { (s, dir) =>
      Dedup.rareShinglePairs(tbl(s, dir, "documents"), "doc_id", "text",
        shingleK = 5, maxDf = 5, threshold = 0.5)
    },

    // Temperature-based source mixing (UniMax/mT5 family): per-source
    // budgets derive from the corpus as p_s ∝ sqrt(tokens_s) (T=2), then
    // the deterministic id-hash keep filter. The oracle replays the
    // threshold math symbolically: sqrt weights, normalizer summed in
    // lexicographic source order (float addition is order-sensitive),
    // t30's md5-prefix bucket recipe.
    Q("t51_temperature_mix", Some("""
      WITH toks AS (SELECT source, CAST(sum(len(regexp_extract_all(text,'\S+'))) AS BIGINT) AS t
                    FROM documents GROUP BY source),
      pos AS (SELECT source, CAST(t AS DOUBLE) AS t, sqrt(CAST(t AS DOUBLE)) AS w
              FROM toks WHERE t > 0),
      z AS (SELECT list_sum(list(w ORDER BY source)) AS z FROM pos),
      thr AS (SELECT source,
                CAST(round(least(1.0, 6000.0 * w / (SELECT z FROM z) / t) * 10000, 0) AS BIGINT) AS cut
              FROM pos),
      h AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
      v AS (SELECT doc_id, source,
              CAST(list_sum(list_transform(range(0, 8), i ->
                CAST(strpos('0123456789abcdef', substr(hx, CAST(i + 1 AS INT), 1)) - 1 AS BIGINT)
                  * (CAST(1 AS BIGINT) << CAST((7 - i) * 4 AS INT)))) AS BIGINT) % 10000 AS bucket
            FROM h)
      SELECT v.doc_id, v.source FROM v JOIN thr ON v.source = thr.source
      WHERE v.bucket < thr.cut""")) { (s, dir) =>
      val d = tbl(s, dir, "documents")
      TextOps.sampleToTemperatureMix(d, "doc_id",
        size(TextOps.tokens(col("text"))).cast(LongType), "source",
        totalBudget = 6000L, temperature = 2.0)
        .select("doc_id", "source")
    },

    // Per-vector symmetric int8 scalar quantization of the embedding
    // corpus (the 4x storage layout of vector stores), exploded to
    // (id, pos, q, scale) rows. All-double IEEE-exact math, so the oracle
    // reproduces q bit-for-bit with list lambdas.
    Q("t52_int8_quantize", Some("""
      WITH m AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings),
      mm AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS ma FROM m),
      u AS (SELECT vec_id, ma,
              unnest(list_transform(e, (x, i) -> {'pos': i, 'x': x})) AS t
            FROM mm)
      SELECT vec_id, CAST(t.pos AS INTEGER) AS pos,
             CAST(CASE WHEN ma = 0 THEN 0 ELSE round(t.x / ma * 127, 0) END AS INTEGER) AS q,
             CASE WHEN ma = 0 THEN 0.0 ELSE ma / 127 END AS scale
      FROM u""")) { (s, dir) =>
      Quantization.int8Quantize(tbl(s, dir, "embeddings"), "vec_id", "embedding")
    },

    // Asymmetric shingle containment (subset-duplicate detection — a short
    // doc quoted inside a longer one clears containment but never Jaccard):
    // rare-shingle blocking, |A∩B|/|A| per direction at ≥ 0.5. The oracle
    // replays blocking + both directions with list functions.
    Q("t53_containment", Some("""
      WITH sets AS (
        SELECT doc_id, list_distinct(list_transform(
                 range(1, greatest(length(text) - 4, 1) + 1),
                 i -> substr(text, CAST(i AS INTEGER), 5))) AS s
        FROM documents),
      sh AS (SELECT doc_id, unnest(s) AS sh FROM sets),
      rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) BETWEEN 2 AND 5),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN rare r ON a.sh = r.sh JOIN sh b ON b.sh = r.sh
        WHERE a.doc_id < b.doc_id),
      scored AS (
        SELECT c.id_a, c.id_b,
               CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                 / CAST(len(sa.s) AS DOUBLE) AS c_ab,
               CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                 / CAST(len(sb.s) AS DOUBLE) AS c_ba
        FROM cand c
        JOIN sets sa ON sa.doc_id = c.id_a
        JOIN sets sb ON sb.doc_id = c.id_b)
      SELECT id_a AS id_inner, id_b AS id_outer, c_ab AS containment
      FROM scored WHERE c_ab >= 0.5
      UNION ALL
      SELECT id_b AS id_inner, id_a AS id_outer, c_ba AS containment
      FROM scored WHERE c_ba >= 0.5""")) { (s, dir) =>
      Dedup.shingleContainmentPairs(tbl(s, dir, "documents"), "doc_id", "text",
        shingleK = 5, maxDf = 5, threshold = 0.5)
    }
  )
}
