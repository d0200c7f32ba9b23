package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Codegen'd dot product over array<double> — see graft.functions.DotProduct
 * for the public entry point and rationale.
 *
 * The composable alternative, `aggregate(zip_with(a, b, _*_), 0.0, _+_)`,
 * is a higher-order function: lambda expressions are CodegenFallback and
 * excluded from subexpression elimination, so every evaluation walks an
 * interpreter with per-element allocations. This expression generates a
 * tight primitive loop inside whole-stage codegen — the (b)-tier of the
 * custom-op preference order: a native Catalyst Expression with doGenCode.
 *
 * Summation order is left-to-right, bit-identical to both the HOF form and
 * DuckDB's list_dot_product, so oracle hash-compares are unaffected. Null
 * ELEMENTS also match the HOF: any null element nulls the whole product
 * (the check is only generated when the static element type admits nulls).
 * On length mismatch the shorter length wins (the HOF form yields null
 * there — but unequal-length embedding columns are malformed input either
 * way, and min-length keeps the kernel total).
 */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def mayHaveNullElements: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  })

  override def nullable: Boolean =
    left.nullable || right.nullable || mayHaveNullElements

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullCheck =
        if (!mayHaveNullElements) ""
        else s"""
          |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        """.stripMargin
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {$nullCheck
        |  $s += $a.getDouble($i) * $b.getDouble($i);
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
