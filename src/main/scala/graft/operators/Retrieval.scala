package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Lexical retrieval over a document corpus: Okapi BM25 top-k scoring of a
 * SMALL query set against an arbitrarily large corpus (Robertson & Walker
 * SIGIR'94; the Lucene-style `ln(1 + (N-df+0.5)/(df+0.5))` idf that keeps
 * scores non-negative). The text-side counterpart of the embedding ANN
 * operators in [[Similarity]] — eval-set retrieval audits, hard-negative
 * mining, keyword probes over a training corpus.
 *
 * Scale shape (queries are the broadcast side, the corpus is never
 * collected):
 *  - one corpus pass explodes tokens → per-(doc, term) tf carrying the
 *    doc length — ONE shuffle keyed on (doc, term);
 *  - a broadcast semi-join immediately drops every corpus term not in any
 *    query, so document frequencies aggregate over query terms only
 *    (≤ |query vocab| rows — metadata-sized);
 *  - scoring is broadcast joins onto the surviving tf rows, then one
 *    (query, doc) sum and a per-query window top-k. No corpus×corpus or
 *    corpus×query cross product anywhere.
 *
 * Scores are rounded to 6 decimals and ties rank by doc id, so rankings
 * are reproducible across engines (the DuckDB oracle orders identically).
 * Returns (query_id, doc_id, score, rank), rank 1..k per query.
 */
object Retrieval {

  def bm25TopK(docs: DataFrame, queries: DataFrame,
      docIdCol: String, docTextCol: String,
      queryIdCol: String, queryTextCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // ONE corpus tokenize pass (round-16 plan audit): the stats collect,
    // the df aggregate and the scored join each re-ran the regexp tokenizer
    // over the whole corpus (the physical plan carried the scan→tokenize→
    // explode subtree twice, plus a third inferred-filter copy of the
    // tokenizer pushed below the widening exchange — serial on the 1-2-task
    // scan side). The token-array frame is persisted across the three
    // consumers; the query-relevant tf frame (post-semi-join — metadata-
    // sized: ≤ |query vocab| × docs rows) is persisted across its two.
    // Output is eagerly materialized so both persists free immediately
    // (the Dedup persist+materialize+unpersist discipline).
    val tk = Par.widen(docs).select(col(docIdCol).as("did"),
      TextOps.tokens(col(docTextCol)).as("tk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // corpus stats: exact long sum ÷ count, the engine-portable mean
    val statsRow = tk.agg(count(lit(1)).as("n"),
      sum(size(col("tk"))).as("sumdl")).collect()(0)
    val n = statsRow.getLong(0)
    require(n > 0, "bm25TopK: empty corpus")
    val avgdl = statsRow.getLong(1).toDouble / n
    // per-(doc, term) tf with the doc length carried through the explode —
    // no corpus-sized join later
    val tf = tk.select(col("did"), size(col("tk")).as("dl"), explode(col("tk")).as("t"))
      .groupBy("did", "t").agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val qt = queries.select(col(queryIdCol).as("qid"),
      explode(array_distinct(TextOps.tokens(col(queryTextCol)))).as("t"))
    val qterms = qt.select("t").distinct()
    // keep only query-relevant corpus terms before ANY aggregation fan-in
    val tfq = tf.join(broadcast(qterms), Seq("t"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // document frequency per query term ((did, t) is unique ⇒ count = df)
    val dft = tfq.groupBy("t").agg(count(lit(1)).as("df"))
    val scored = tfq
      .join(broadcast(qt), Seq("t"))
      .join(broadcast(dft), Seq("t"))
      .withColumn("idf",
        log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("s", col("idf") * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
      .groupBy("qid", "did").agg(sum(col("s")).as("raw"))
      .withColumn("score", round(col("raw"), 6))
    val res = graft.operators.Par.materialize(scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("did"))))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("did").as("doc_id"),
        col("score"), col("rank")))
    tfq.unpersist(blocking = false)
    tk.unpersist(blocking = false)
    res
  }
}
