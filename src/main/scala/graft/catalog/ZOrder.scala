package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multi-dimensional clustering for compaction: sort by a Morton (Z-order)
 * code so each written file covers a tight hyper-rectangle of the value
 * space — then the per-file footer stats (ManifestEntry.stats) prune
 * selectively on ANY of the clustered columns, not just the leading sort
 * key. The public pattern behind Delta Lake's `OPTIMIZE … ZORDER BY`
 * (VLDB'20 §4.2) re-expressed as a pure Column expression: no UDF, fully
 * codegen'd, evaluated inside the existing materialize pass.
 *
 * Enabled with the table property `compaction.zorder = "colA,colB[,…]"`
 * (2-4 numeric/date/timestamp columns). Column bounds are approximated by
 * one min/max aggregate over just those columns of the active files — a
 * cheap columnar scan; bounds need not be exact (outliers clamp to the
 * edge bins, which only affects clustering quality, never correctness).
 */
object ZOrder {

  val Prop = "compaction.zorder"

  /** Bits per dimension: 16 → 64-bit z-values for up to 4 columns. */
  private val Bits = 16

  /** Parse the table property; None when unset. */
  def columnsOf(properties: Map[String, String]): Option[Seq[String]] =
    properties.get(Prop).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)

  /** Monotone numeric view of a clusterable column (for binning only). */
  private def numeric(c: Column, dt: DataType): Column = dt match {
    case _: NumericType => c.cast(DoubleType)
    case DateType => unix_date(c).cast(DoubleType)
    case TimestampType => unix_micros(c).cast(DoubleType)
    case TimestampNTZType => unix_micros(c.cast(TimestampType)).cast(DoubleType)
    case other => throw new IllegalArgumentException(
      s"$Prop supports numeric/date/timestamp columns, got $other")
  }

  /** (column, min, max) bounds via one multi-column min/max aggregate over
    * a scan of the active data — Catalyst prunes to just the clustered
    * columns. Bounds are approximate by design (clustering quality only). */
  def bounds(scan: DataFrame, schema: StructType, cols: Seq[String])
      : Seq[(String, Double, Double)] = {
    require(cols.size >= 1 && cols.size <= 4, s"$Prop takes 1-4 columns, got ${cols.size}")
    val fields = cols.map(n => schema.fields.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"$Prop column $n not in table schema")))
    val aggs = fields.flatMap(f => Seq(
      min(numeric(col(f.name), f.dataType)).as(s"mn_${f.name}"),
      max(numeric(col(f.name), f.dataType)).as(s"mx_${f.name}")))
    val row = scan.agg(aggs.head, aggs.tail: _*).head()
    fields.zipWithIndex.map { case (f, i) =>
      val mn = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      (f.name, mn, mx)
    }
  }

  /** The interleaved z-value Column for the given (column, min, max) spec.
    * Nulls bin to 0 (cluster at the origin). Pure codegen-able arithmetic:
    * scale each dimension to a per-dimension bit rank, then interleave.
    * 4 dimensions get 15 bits each (60 total) — 16 would shift into bit 63
    * and negative z-values would wrap the SIGNED sort at the sign boundary,
    * splitting the space into two inverted halves. */
  def zvalue(schema: StructType, spec: Seq[(String, Double, Double)]): Column = {
    val n = spec.size
    val bits = if (n >= 4) 15 else Bits
    val maxRank = (1L << bits) - 1
    val ranks = spec.map { case (name, mn, mx) =>
      val dt = schema.fields.find(_.name == name).get.dataType
      val v = coalesce(numeric(col(name), dt), lit(mn))
      if (mx <= mn) lit(0L)
      else least(lit(maxRank), greatest(lit(0L),
        (((v - mn) / (mx - mn)) * maxRank.toDouble).cast(LongType)))
    }
    if (n == 1) return ranks.head
    val terms = for {
      (r, i) <- ranks.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(r, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }
}
