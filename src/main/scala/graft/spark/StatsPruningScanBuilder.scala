package graft.spark

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}

import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

import graft.catalog.StatsSkip
import graft.txn.ManifestEntry

/**
 * DSv2 file-level data skipping for the SQL surface: interposes on the
 * filter-pushdown handshake, evaluates the pushed predicates against each
 * manifest entry's footer stats (ManifestEntry.stats), and rebuilds the
 * delegate parquet table over the SURVIVING file list — so a selective
 * `SELECT … WHERE` plans (lists, opens, schedules) only the files whose
 * value ranges can match. The delegate still receives the full filter set
 * for its own row-group pruning; stats skipping is strictly additive.
 *
 * V2ScanRelationPushDown pushes filters before column pruning, but the
 * builder replays `pruneColumns` onto a rebuilt delegate anyway, so the
 * contract holds under either order.
 *
 * Only safe on read-optimized state (the Graft DSv2 scan already rejects
 * unresolved merge deltas) — under merge-on-read, value-predicate pruning
 * could drop the newest version of a key (see StatsSkip).
 */
final class StatsPruningScanBuilder(
    schema: StructType,
    entries: Seq[ManifestEntry],
    mkDelegate: Seq[String] => ScanBuilder)
  extends ScanBuilder
  with SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates {

  private var delegate: ScanBuilder = mkDelegate(entries.map(_.path))
  private var requiredSchema: Option[StructType] = None

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val translated = filters.flatMap(f =>
      org.apache.spark.sql.graft.GraftFunctions.toSourceFilter(f))
    val kept = StatsSkip.prune(entries, translated, schema)
    if (kept.size < entries.size) {
      StatsPruningScanBuilder.lastPrune = (entries.size, kept.size)
      delegate = mkDelegate(kept.map(_.path))
      requiredSchema.foreach(s =>
        delegate.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(s))
    }
    delegate.asInstanceOf[SupportsPushDownCatalystFilters].pushFilters(filters)
  }

  override def pushedFilters: Array[Predicate] =
    delegate.asInstanceOf[SupportsPushDownCatalystFilters].pushedFilters

  override def pruneColumns(s: StructType): Unit = {
    requiredSchema = Some(s)
    delegate.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(s)
  }

  override def pushAggregation(agg: Aggregation): Boolean = delegate match {
    case a: SupportsPushDownAggregates => a.pushAggregation(agg)
    case _ => false
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean = delegate match {
    case a: SupportsPushDownAggregates => a.supportCompletePushDown(agg)
    case _ => false
  }

  override def build(): Scan = delegate.build()
}

object StatsPruningScanBuilder {
  /** (total files, files kept) of the most recent prune — observability for
    * tests and debugging; planning is driver-side single-threaded per query. */
  @volatile var lastPrune: (Int, Int) = (0, 0)
}
