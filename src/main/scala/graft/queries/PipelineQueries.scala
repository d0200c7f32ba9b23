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

  /** DuckDB marker-count expression, mirroring TextOps.langScore. */
  private def oscore(pat: String): String =
    s"len(regexp_extract_all(lower(text), '$pat'))"
  private val oen = oscore("\\b(the|a|is|of|and)\\b")
  private val ofr = oscore("\\b(le|la|les|et|des)\\b")
  private val ode = oscore("\\b(der|die|und|das|ist)\\b")
  private val oes = oscore("\\b(el|los|las|y|es)\\b")

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

    // MinHash + banded LSH near-duplicate pairs (no all-pairs join; see
    // PipelineSpec for the exact-Jaccard equivalence test).
    Q("t04_minhash_neardup", None) { (s, dir) =>
      Dedup.minhashPairs(tbl(s, dir, "documents"), "doc_id", "text",
        bands = 8, rowsPerBand = 8, threshold = 0.9, wordGrams = Some(2))
    },

    // SimHash near-duplicate pairs (Hamming ≤ 3 via 16-bit chunk banding).
    Q("t05_simhash_neardup", None) { (s, dir) =>
      Dedup.simhashPairs(tbl(s, dir, "documents"), "doc_id", "text")
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
    Q("t07_ann_lsh", None) { (s, dir) =>
      val emb = tbl(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 20), "vec_id", "embedding", 5)
    },

    // Embedding-cosine near-duplicate pairs (bucketed, no cross join).
    Q("t09_embedding_neardup", None) { (s, dir) =>
      Similarity.embeddingNearDupPairs(tbl(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.95)
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
    }
  )
}
