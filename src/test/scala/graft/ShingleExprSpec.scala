package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/**
 * Value-identity of the codegen'd shingle kernels (round-17) against the
 * composed HOF forms they replace, over the full edge surface: null text,
 * empty text, text shorter than / exactly / longer than k, repeated
 * windows (dedup order), multi-byte code points (2-, 3- and 4-byte UTF-8,
 * where substr's CODE-POINT windows diverge from byte or UTF-16 windows),
 * and a synthetic corpus. Word grams additionally cover null tokens inside
 * the array (concat_ws skips them without a separator), empty token
 * arrays, and a NULL token array. Both eval paths run: the DataFrame
 * comparisons exercise generated code; the collect over the null/edge rows
 * with whole-stage codegen disabled exercises the interpreted eval.
 */
class ShingleExprSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "", "a", "ab", "abc", "abcd", "aaaa", "abab", "banana",
    "héllo wörld", "漢字テキスト", "🙂🙃🙂🙃", "a🙂b", "éclair", // é as e+combining
    " leading and  double  spaces ", "\n\t", "x" * 5000,
    "the quick brown fox jumps over the lazy dog") ++
    (0 until 500).map(i => s"doc $i shingle content with shared phrasing $i mod ${i % 7}")

  private def df = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    .toDF("id", "s")
    .union(Seq((99999L, null.asInstanceOf[String])).toDF("id", "s"))

  test("char shingles kernel equals the HOF form on every edge and both eval paths") {
    for (k <- Seq(1, 2, 3, 5, 9)) {
      val bad = df.select(col("id"),
          TextOps.shingles(col("s"), k).as("neu"),
          TextOps.shinglesHof(col("s"), k).as("alt"))
        .where(!(col("neu") <=> col("alt")))
      assert(bad.count() == 0, s"k=$k diverged: ${bad.collect().take(3).mkString("; ")}")
    }
    // interpreted path (no codegen), incl. the null-text → [null] edge
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows = df.select(
          TextOps.shingles(col("s"), 3).as("neu"),
          TextOps.shinglesHof(col("s"), 3).as("alt"))
        .collect()
      rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("word gram kernel equals the HOF form incl. null tokens and null arrays") {
    val toks = df.select(col("id"), TextOps.tokens(col("s")).as("tk"))
    for (n <- Seq(1, 2, 3)) {
      val bad = toks.select(col("id"),
          TextOps.wordShinglesFromTokens(col("tk"), n).as("neu"),
          TextOps.wordShinglesHofFromTokens(col("tk"), n).as("alt"))
        .where(!(col("neu") <=> col("alt")))
      assert(bad.count() == 0, s"n=$n diverged: ${bad.collect().take(3).mkString("; ")}")
    }
    // crafted arrays: nulls inside, empty strings, empty array, null array
    val crafted = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a", null, "c")),
      (3L, Seq(null, null)),
      (4L, Seq("", "x", "")),
      (5L, Seq.empty[String]),
      (6L, null.asInstanceOf[Seq[String]])).toDF("id", "tk")
    for (n <- Seq(1, 2, 4)) {
      val bad = crafted.select(col("id"),
          TextOps.wordShinglesFromTokens(col("tk"), n).as("neu"),
          TextOps.wordShinglesHofFromTokens(col("tk"), n).as("alt"))
        .where(!(col("neu") <=> col("alt")))
      assert(bad.count() == 0, s"crafted n=$n diverged: " +
        bad.collect().take(6).mkString("; "))
    }
  }
}
