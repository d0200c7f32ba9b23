package graft

import scala.collection.JavaConverters._

import org.apache.spark.sql.functions._

import graft.operators._

/** BM25 top-k retrieval: ranking sanity, determinism, and plan shape. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "dogs chase cats in the yard every day"),
    (3L, "quantum field theory describes particle physics"),
    (4L, "the mat was green and the cat was black"),
    (5L, "particle accelerators probe quantum physics experiments")
  ).toDF("doc_id", "text")

  test("bm25TopK ranks term-matching docs first and respects k") {
    val queries = Seq((100L, "quantum physics")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", "qid", "qtext", k = 2)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.length == 2)
    // only docs 3 and 5 contain the query terms; both must be the top 2
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(3L, 5L))
    assert(out.forall(_.getAs[Double]("score") > 0))
  }

  test("idf weighting: a rarer term outranks a common one at equal tf") {
    // "mat" appears in 2 docs, "the" in 3 — a mat query must score doc 1
    // above what a the-only query gives it
    val queries = Seq((1L, "mat"), (2L, "the")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", "qid", "qtext", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) -> r.getAs[Double]("score")).toMap
    assert(out((1L, 1L)) > out((2L, 1L)))
  }

  test("plan: no cross product; query side broadcasts; stable across partitionings") {
    // bm25TopK is eagerly materialized since round 16 (one shared corpus
    // tokenize pass behind a persist), so the returned frame's plan is the
    // checkpoint scan — the EXECUTED internal plan is captured through the
    // graft.explain.dir evidence hook instead.
    val dir = java.nio.file.Files.createTempDirectory("bm25_plan")
    spark.conf.set("graft.explain.dir", dir.toString)
    val out =
      try Retrieval.bm25TopK(corpus, queries = Seq((7L, "cat mat"), (8L, "physics"))
        .toDF("qid", "qtext"), "doc_id", "text", "qid", "qtext", k = 3)
      finally spark.conf.unset("graft.explain.dir")
    val plans = {
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala.map(java.nio.file.Files.readString(_)).mkString("\n")
      finally s.close()
    }
    assert(plans.nonEmpty, "materialize must dump the executed plan under graft.explain.dir")
    assert(!plans.contains("CartesianProduct") && !plans.contains("BroadcastNestedLoopJoin"))
    assert(plans.contains("BroadcastHashJoin"), "query side must broadcast")
    val a = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = Retrieval.bm25TopK(corpus.repartition(5), Seq((7L, "cat mat"), (8L, "physics"))
      .toDF("qid", "qtext"), "doc_id", "text", "qid", "qtext", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b, "ranking must not depend on partitioning")
  }
}
