package graft.functions

import org.apache.spark.sql.Column

/**
 * Codegen'd dot product of two array<double> columns — the hot kernel of
 * every embedding operator (cosine similarity, LSH bucketing, IVF centroid
 * assignment). Public facade over
 * [[org.apache.spark.sql.graft.DotProductExpr]], which lives under
 * org.apache.spark.sql because Catalyst's expression SPI
 * (AbstractDataType, the Expression→Column bridge) is private[sql].
 */
object DotProduct {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DotProductExpr.column(a, b)
}
