package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/**
 * Column bridge to Spark's native bloom-filter expressions (the pair that
 * powers runtime row-group filtering): `BloomFilterAggregate` builds the
 * sketch distributed, `BloomFilterMightContain` probes it inside codegen.
 * Lives under org.apache.spark.sql because both expressions and the
 * Expression→Column bridge are private[sql] SPI.
 *
 * `value` must be an xxhash64 column (LongType) on both sides — the same
 * contract Spark's InjectRuntimeFilter uses.
 */
object BloomKernel {

  private def e(col: Column) =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(col.node)

  /** Aggregate a LongType hash column into a serialized bloom filter. */
  def bloomAgg(hashedValue: Column, numItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(e(hashedValue),
        Literal(numItems), Literal(numBits)).toAggregateExpression())

  /** Codegen'd membership probe of a serialized bloom filter. */
  def mightContain(bloomBytes: Array[Byte], hashedValue: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(Literal(bloomBytes, BinaryType), e(hashedValue)))
}
