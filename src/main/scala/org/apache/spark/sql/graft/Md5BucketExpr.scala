package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd engine-portable hash bucket: pmod(first 4 bytes of md5(s) as an
 * unsigned int, buckets) — VALUE-IDENTICAL to the composed form
 * `pmod(conv(substring(md5(s), 1, 8), 16, 10) :: long, buckets) :: int`
 * (the first 8 md5 hex digits ARE the big-endian first 4 digest bytes), but
 * without materializing the 32-char hex string, the substring, or conv's
 * base-16 parse per row. hashBucket runs once per GRAM OCCURRENCE in the
 * selection/scoring operators (DSIR, quality score, perplexity, divergence,
 * budget mixing) — at corpus scale the hex round trip was ~4 short-lived
 * allocations per token, pure GC pressure (round-16 bench evidence:
 * gc ≈ 12× cpu on the first runs of t32).
 *
 * Semantics preserved from the composed form: null input → null;
 * buckets = 0 → null (the composed pmod's non-ANSI contract); the final
 * int cast truncates exactly like the composed form's.
 */
case class Md5BucketExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_md5_bucket"
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = left.eval(input)
    if (s == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val r = Md5BucketExpr.bucket(s.asInstanceOf[UTF8String], b.asInstanceOf[Long])
    if (r == Md5BucketExpr.NullSentinel) null else r.toInt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, b) => {
      val r = ctx.freshName("r")
      s"""
        |final long $r = org.apache.spark.sql.graft.Md5BucketExpr.bucket($s, $b);
        |if ($r == org.apache.spark.sql.graft.Md5BucketExpr.NullSentinel()) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = (int) $r;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Md5BucketExpr {
  /** Out-of-band marker for "null result" (bucket values are always in
    * [Int.MinValue, Int.MaxValue], so Long.MinValue cannot collide). */
  val NullSentinel: Long = Long.MinValue

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** pmod(first-4-md5-bytes-as-unsigned, buckets), truncated to int range
    * exactly like the composed form's long→int cast; NullSentinel when
    * buckets = 0. */
  def bucket(s: UTF8String, buckets: Long): Long = {
    if (buckets == 0L) return NullSentinel
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    // Spark's pmod contract exactly: r = a % b; r + b when r negative
    val r = v % buckets
    val m = if (r < 0) r + buckets else r
    // replicate the composed form's CAST(long AS int) truncation
    m.toInt.toLong
  }

  def column(s: Column, buckets: Column): Column =
    ExpressionUtils.column(
      Md5BucketExpr(ExpressionUtils.expression(s), ExpressionUtils.expression(buckets)))
}
