package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Byte-pair-encoding tokenizer TRAINING and application (Sennrich, Haddow,
 * Birch: "Neural Machine Translation of Rare Words with Subword Units",
 * ACL 2016, arXiv:1508.07909) — the tokenizer-training step of a
 * training-data pipeline, Spark-first:
 *
 *  - the corpus first collapses to a (word, freq) DICTIONARY via a
 *    map-side-combinable hash aggregate — the only pass over the full
 *    corpus, shuffling one row per distinct word (at 100 TB the dict is
 *    metadata-sized next to the text: ~10⁷ rows);
 *  - each merge round runs over the dict alone: explode adjacent symbol
 *    pairs weighted by word freq, hash-aggregate pair counts, and take the
 *    single best pair (highest freq, ties lexicographic — deterministic);
 *    only that one row reaches the driver per round;
 *  - the dict re-segments under the new merge as a typed map (per-word
 *    imperative symbol rewrite — the mapPartitions tier of the custom-op
 *    preference order), with an eager localCheckpoint every few rounds so
 *    lineage cannot grow linearly in numMerges.
 *
 * `applyBpe` segments documents with a trained merge list: the ranks
 * broadcast to executors and each word merges greedily lowest-rank-first —
 * the standard BPE apply loop.
 */
object Bpe {

  /** End-of-word sentinel (paper §3.2: distinguishes word-final subwords). */
  val EndOfWord = "</w>"

  final case class WordEntry(symbols: Seq[String], freq: Long)

  /** (word, freq) dictionary of the corpus — lowercased whitespace tokens. */
  def wordDict(df: DataFrame, textCol: String): DataFrame =
    Par.widen(df)
      .select(explode_outer(TextOps.tokens(col(textCol))).as("word"))
      .where(col("word").isNotNull)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  private def toEntry(word: String, freq: Long): WordEntry =
    WordEntry(word.map(_.toString) :+ EndOfWord, freq)

  /** One merge applied to one symbol sequence (left-to-right single pass —
    * the paper's replacement semantics). */
  private[operators] def mergeOnce(symbols: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < symbols.length) {
      if (i + 1 < symbols.length && symbols(i) == a && symbols(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += symbols(i); i += 1 }
    }
    out.toSeq
  }

  /**
   * Learn `numMerges` merge rules. `sampleFraction` < 1 trains on a
   * deterministic hash-sample of the corpus (tokenizers are trained on
   * samples at corpus scale; the sample contract matches
   * TextOps.deterministicSample). Stops early when the best remaining pair
   * falls below `minFreq`. Returns merges in rank order.
   */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L, sampleFraction: Double = 1.0): Seq[(String, String)] = {
    require(numMerges >= 0 && minFreq >= 1)
    require(sampleFraction > 0 && sampleFraction <= 1.0)
    val spark = df.sparkSession
    import spark.implicits._
    val base =
      if (sampleFraction >= 1.0) df
      else df.where(TextOps.hashBucket(xxhash64(col(textCol)), 10000) <
        math.round(sampleFraction * 10000).toInt)
    var dict: Dataset[WordEntry] = wordDict(base, textCol)
      .as[(String, Long)].map { case (w, f) => toEntry(w, f) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dict.count()
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      // pair counts: explode adjacent pairs weighted by freq; ONE row
      // (the argmax) returns to the driver
      val best = dict.flatMap(e =>
          e.symbols.sliding(2).collect { case Seq(a, b) => (a, b, e.freq) })
        .toDF("a", "b", "freq")
        .groupBy("a", "b").agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("a"), col("b"))
        .limit(1).collect()
      best.headOption match {
        case Some(r) if r.getLong(2) >= minFreq =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          val next = dict.map(e => e.copy(symbols = mergeOnce(e.symbols, a, b)))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          // eager checkpoint every 8 rounds: caps lineage depth (a plan
          // that nests numMerges map stages re-plans quadratically). The
          // pre-checkpoint persist is released right after — keeping it
          // would leak one cached dictionary copy per 8 rounds over a
          // real (10k+ merge) training run.
          val mat = if ((round + 1) % 8 == 0) {
            val cp = next.localCheckpoint(true)
            next.unpersist(blocking = false)
            cp
          } else { next.count(); next }
          dict.unpersist(blocking = false)
          dict = mat
        case _ => done = true
      }
      round += 1
    }
    dict.unpersist(blocking = false)
    merges.result()
  }

  /** Segment one document under broadcast ranks — the ONE apply loop both
    * [[applyBpe]] and [[tokenCountColumn]] run (no drift between the
    * token-surface and count-only forms). Lowercases EXACTLY as training
    * did (Spark lower() = UTF8String.toLowerCase: ASCII fast path for
    * full-ASCII strings, default-locale String.toLowerCase otherwise) — a
    * blanket Locale.ROOT would diverge on non-ASCII text under tr/az JVM
    * locales, a blanket default-locale on ASCII "I". */
  private[operators] def segment(rk: Map[(String, String), Int], text: String): Seq[String] = {
    val words = Option(text)
      .map { t =>
        val lowered =
          if (t.forall(_ < 0x80)) t.toLowerCase(java.util.Locale.ROOT)
          else t.toLowerCase()
        lowered.split("\\s+").toSeq.filter(_.nonEmpty)
      }
      .getOrElse(Nil)
    words.flatMap { w =>
      var symbols: Seq[String] = w.map(_.toString) :+ EndOfWord
      var continue = true
      while (continue && symbols.length > 1) {
        // lowest-rank adjacent pair present in this word
        val cand = symbols.zip(symbols.tail)
          .flatMap(p => rk.get(p).map(r => (r, p)))
        if (cand.isEmpty) continue = false
        else {
          val (_, (a, b)) = cand.minBy(_._1)
          symbols = mergeOnce(symbols, a, b)
        }
      }
      symbols
    }
  }

  /** Per-document BPE segmentation under a trained merge list: one row per
    * doc with the subword array and its length. Ranks broadcast; each word
    * merges greedily lowest-rank-first (standard apply order). Map-only. */
  def applyBpe(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranksBc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    df.select(col(idCol).cast(LongType).as("doc_id"), col(textCol).as("_t"))
      .as[(Long, String)].map { case (id, text) =>
        val toks = segment(ranksBc.value, text)
        (id, toks, toks.length.toLong)
      }
      .toDF("doc_id", "bpe_tokens", "n_bpe")
  }

  /** TRAINED-tokenizer token count as a COLUMN op — the per-row count the
    * corpus-mixing budget consumes (TextOps.sampleToTokenBudgetBy), without
    * materializing the subword arrays. The BPE apply loop is inherently
    * imperative (the mapPartitions/UDF tier of the custom-op preference
    * order); ranks ride one broadcast, the count never shuffles. */
  def tokenCountColumn(spark: SparkSession, merges: Seq[(String, String)])
      (text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val ranksBc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    udf((t: String) => segment(ranksBc.value, t).length.toLong).apply(text)
  }
}
