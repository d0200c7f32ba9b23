package graft

import graft.operators.{Bpe, TextOps}

/** BPE tokenizer training (Sennrich et al. 2016): the paper's classic
  * example corpus must reproduce the known merge sequence, and application
  * must segment an unseen word with the learned subwords. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // word frequencies: low:5, lower:2, newest:6, widest:3 (paper §3.2)
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  test("trainMerges reproduces the paper's merge sequence on its example") {
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 5, minFreq = 2)
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")),
      s"got $merges")
  }

  test("applyBpe segments an unseen word with learned subwords") {
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 5, minFreq = 2)
    val seg = Bpe.applyBpe(Seq((1L, "lowest")).toDF("doc_id", "text"),
      "doc_id", "text", merges).collect().head
    assert(seg.getSeq[String](1) == Seq("low", "est</w>"), seg.getSeq[String](1))
    assert(seg.getLong(2) == 2)
    // no merges at all: pure character segmentation
    val raw = Bpe.applyBpe(Seq((1L, "ab")).toDF("doc_id", "text"),
      "doc_id", "text", Nil).collect().head
    assert(raw.getSeq[String](1) == Seq("a", "b", "</w>"))
  }

  test("minFreq stops training; sampling and long runs stay deterministic") {
    // minFreq above every pair count: no merges learned
    assert(Bpe.trainMerges(corpus, "text", numMerges = 5, minFreq = 100L).isEmpty)
    // a longer run (crosses the 8-round checkpoint boundary) is stable
    val m1 = Bpe.trainMerges(corpus, "text", numMerges = 12, minFreq = 1)
    val m2 = Bpe.trainMerges(corpus, "text", numMerges = 12, minFreq = 1)
    assert(m1 == m2 && m1.length == 12, s"${m1.length}: $m1")
    // real corpus smoke: documents table trains and applies end-to-end
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 10, minFreq = 2)
    assert(merges.length == 10)
    val out = Bpe.applyBpe(docs.limit(20), "doc_id", "text", merges)
    assert(out.count() == 20 && out.where($"n_bpe" <= 0).count() == 0)
  }

  test("trained-tokenizer counts drive the corpus-mixing token budget") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 20, minFreq = 2)
    // the count COLUMN agrees with applyBpe's n_bpe row for row
    val cnt = Bpe.tokenCountColumn(spark, merges)(col("text"))
    val viaColumn = docs.select(col("doc_id").cast("long"), cnt.as("n"))
      .as[(Long, Long)].collect().toMap
    val viaApply = Bpe.applyBpe(docs, "doc_id", "text", merges)
      .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap
    assert(viaColumn == viaApply)
    // budget on BPE counts: realized tokens track the budget, selection is
    // the deterministic id-hash subset (reproducible across runs)
    val total = viaColumn.values.sum
    val sources = docs.select("source").distinct().as[String].collect().toSeq
    // ~quarter of each source's tokens (sources are near-uniform here)
    val budgets = sources.map(_ -> total / (4L * sources.size)).toMap
    val kept = TextOps.sampleToTokenBudgetBy(docs, "doc_id", cnt, "source", budgets)
    val kept2 = TextOps.sampleToTokenBudgetBy(docs, "doc_id", cnt, "source", budgets)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(ids == kept2.select("doc_id").as[Long].collect().toSet, "mix must be deterministic")
    assert(ids.nonEmpty && ids.size < viaColumn.size, "budget must subsample")
    // whole-document selection tracks the fraction in expectation — loose band
    val realized = kept.select(sum(cnt)).as[Long].head()
    val want = total / 4.0
    assert(realized > want * 0.5 && realized < want * 1.8,
      s"realized $realized vs target ~$want")
  }
}
