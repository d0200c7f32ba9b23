package graft.spark

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}

import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
    /** Entry source, called with the TRANSLATED pushed filters (and the
      * pushed limit when filterless) at materialization time. The eager
      * path ignores the arguments and returns the pre-parsed list; the
      * deferred big-manifest path runs the distributed manifest prune (or
      * an O(prefix) limit-prefix stream) and returns survivors only (stats
      * stripped — the local re-prune below then keeps everything, which
      * is correct: the filters were already applied). */
    provider: (Seq[org.apache.spark.sql.sources.Filter], Option[Int]) => Seq[ManifestEntry],
    /** Entry-set roll-up for manifest-served aggregates — O(#columns)
      * state, computed WITHOUT materializing entries (distributed on the
      * deferred path), so `SELECT count(*)/min/max` stays metadata-only at
      * any manifest size. */
    summary: () => graft.catalog.ManifestPlanner.StatsSummary,
    mkDelegate: Seq[String] => ScanBuilder,
    /** True when `provider` is the gated big-manifest provider (entry
      * materialization deferred to pushdown) — observability only. */
    deferredPath: Boolean = false,
    /** Table identity for the per-table observability counters. */
    tag: String = "")
  extends ScanBuilder
  with SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates
  with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  private var entriesOpt: Option[Seq[ManifestEntry]] = None
  private var delegateOpt: Option[ScanBuilder] = None
  private var requiredSchema: Option[StructType] = None
  /** Filters the deferred provider pruned with at materialization. Deferred
    * survivors come back stats-STRIPPED, so an in-process re-prune against
    * a LATER, stronger filter set is a no-op — such a re-push must go back
    * through the provider (it re-derives from the same visible file set). */
  private var materializedWith: Option[Set[org.apache.spark.sql.sources.Filter]] = None
  private var filtersPushed: Boolean = false
  private var delegateAggPushed: Boolean = false
  private var manifestAgg: Option[(StructType, org.apache.spark.sql.catalyst.InternalRow)] = None

  /** First materialization — runs the provider (possibly a distributed
    * prune), builds the delegate over the result, replays column pruning. */
  private def materialize(fs: Seq[org.apache.spark.sql.sources.Filter],
      limit: Option[Int]): Seq[ManifestEntry] = {
    val es = provider(fs, limit)
    if (deferredPath && (fs.nonEmpty || limit.isDefined))
      StatsPruningScanBuilder.recordDeferred(tag, es.size)
    materializedWith = Some(fs.toSet)
    entriesOpt = Some(es)
    delegateOpt = Some(mkDelegate(es.map(_.path)))
    requiredSchema.foreach(s =>
      delegateOpt.get.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(s))
    es
  }

  private def entries: Seq[ManifestEntry] = entriesOpt.getOrElse(materialize(Nil, None))
  private def delegate: ScanBuilder = { entries; delegateOpt.get }

  /** Swap in a delegate over a smaller file list, replaying column pruning
    * (the ONE rebuild path — filters and limit both go through here). */
  private def rebuild(kept: Seq[ManifestEntry]): Unit = {
    StatsPruningScanBuilder.recordPrune(tag, (entries.size, kept.size))
    entriesOpt = Some(kept)
    delegateOpt = Some(mkDelegate(kept.map(_.path)))
    requiredSchema.foreach(s =>
      delegateOpt.get.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(s))
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    // a filterless push must not force materialization — a later pushLimit
    // may still serve the query from an O(prefix) stream
    if (filters.isEmpty && entriesOpt.isEmpty) return Nil
    filtersPushed = filtersPushed || filters.nonEmpty
    val translated = filters.flatMap(f =>
      org.apache.spark.sql.graft.GraftFunctions.toSourceFilter(f))
    // deferred path: hand the filters to the provider so pruning happens
    // BEFORE any entry materializes on the driver
    if (entriesOpt.isEmpty) materialize(translated, None)
    // deferred RE-push with filters beyond the materializing set: the held
    // survivors are stats-stripped (unprunable in-process), so go back
    // through the provider for the full-set distributed prune
    else if (deferredPath && translated.nonEmpty &&
        materializedWith.exists(m => !translated.toSet.subsetOf(m)))
      materialize((materializedWith.get ++ translated).toSeq, None)
    val kept = StatsSkip.prune(entries, translated, schema)
    if (kept.size < entries.size) rebuild(kept)
    delegate.asInstanceOf[SupportsPushDownCatalystFilters].pushFilters(filters)
  }

  override def pushedFilters: Array[Predicate] =
    // must not force materialization — Spark reads this right after a
    // (possibly filterless) pushFilters, before pushLimit gets its turn
    delegateOpt.map(_.asInstanceOf[SupportsPushDownCatalystFilters].pushedFilters)
      .getOrElse(Array.empty)

  override def pruneColumns(s: StructType): Unit = {
    requiredSchema = Some(s)
    delegateOpt.foreach(_.asInstanceOf[SupportsPushDownRequiredColumns].pruneColumns(s))
  }

  /** LIMIT file pruning: an unordered LIMIT n needs at most n rows, so a
    * file prefix covering n suffices — LIMIT 10 over 10^5 files plans one
    * file. Returns false (the limit operator stays above the scan; only
    * the planned FILE LIST shrinks). Declines under pushed filters
    * (per-file match counts unknown). */
  override def pushLimit(n: Int): Boolean = {
    // NEVER rebuild under a pushed aggregation (manifest-served or
    // delegate-accepted): the rebuilt delegate would forget the pushed agg
    // and a file prefix is wrong for min/max anyway. Spark's pushdown rule
    // calls pushLimit after pushDownAggregates without its own guard.
    if (!filtersPushed && manifestAgg.isEmpty && !delegateAggPushed) {
      // deferred + filterless: let the provider stream an O(prefix) entry
      // list instead of materializing the whole manifest first
      val es = entriesOpt.getOrElse(materialize(Nil, Some(n)))
      if (es.nonEmpty) {
        val kept = StatsSkip.limitPrefix(es, n)
        if (kept.size < es.size) rebuild(kept)
      }
    }
    false
  }

  override def pushAggregation(agg: Aggregation): Boolean =
    answerFromManifest(agg) match {
      case Some(sr) => manifestAgg = Some(sr); true
      case None => delegate match {
        case a: SupportsPushDownAggregates =>
          delegateAggPushed = a.pushAggregation(agg)
          delegateAggPushed
        case _ => false
      }
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    answerFromManifest(agg).isDefined || (delegate match {
      case a: SupportsPushDownAggregates => a.supportCompletePushDown(agg)
      case _ => false
    })

  /** Answer COUNT(*)/COUNT(col)/MIN(col)/MAX(col) (no grouping, no pushed
    * filters) from the manifest alone — the skip index doubles as an exact
    * aggregate index, so `SELECT count(*) FROM t` is METADATA-ONLY: zero
    * files opened at any scale. Every uncertainty (missing stats, unknown
    * row/null counts, truncation-prone types, DISTINCT) declines to the
    * real scan. Sound because our stats come from parquet footers verbatim
    * (exact min/max; over-long strings and NaN columns are dropped at
    * harvest, which lands here as "missing stats" → decline). */
  private def answerFromManifest(agg: Aggregation)
      : Option[(StructType, org.apache.spark.sql.catalyst.InternalRow)] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (filtersPushed || agg.groupByExpressions().nonEmpty) return None
    val sm = summaryOnce()
    if (sm.entryCount == 0 || !sm.recordsKnown) return None
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case n: NamedReference if n.fieldNames().length == 1 =>
          schema.fields.find(_.name == n.fieldNames()(0))
        case _ => None
      }
    val total = sm.totalRecords
    val answered = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some((StructField("count_star", LongType, nullable = false), total))
      case c: Count if !c.isDistinct =>
        for {
          f <- colOf(c.column())
          cs <- sm.cols.get(f.name) if cs.nullsKnown
        } yield (StructField(s"count_${f.name}", LongType, nullable = false), total - cs.nulls)
      case m: Min =>
        for {
          f <- colOf(m.column())
          v <- boundOf(sm, f, min = true)
        } yield (StructField(s"min_${f.name}", f.dataType), v)
      case m: Max =>
        for {
          f <- colOf(m.column())
          v <- boundOf(sm, f, min = false)
        } yield (StructField(s"max_${f.name}", f.dataType), v)
      case _ => None
    }
    if (answered.exists(_.isEmpty)) return None
    val (fields, values) = answered.flatten.unzip
    Some((StructType(fields),
      org.apache.spark.sql.catalyst.InternalRow.fromSeq(values)))
  }

  private var summaryCache: Option[graft.catalog.ManifestPlanner.StatsSummary] = None
  private def summaryOnce(): graft.catalog.ManifestPlanner.StatsSummary = {
    if (summaryCache.isEmpty) summaryCache = Some(summary())
    summaryCache.get
  }

  /** Exact table-wide MIN or MAX from the roll-up; None unless every file
    * either carried exact bounds or was provably all-null (boundsOk).
    * Inner value: the SQL result (raw null when the column is null
    * table-wide). */
  private def boundOf(sm: graft.catalog.ManifestPlanner.StatsSummary,
      f: StructField, min: Boolean): Option[Any] = {
    val cs = sm.cols.getOrElse(f.name, return None)
    if (!cs.boundsOk) return None
    val best = if (min) cs.min else cs.max
    if (best == null) Some(null) // every row null => SQL NULL
    else graft.catalog.StatCodec.toInternal(f.dataType, best)
  }

  override def build(): Scan = manifestAgg match {
    case Some((aggSchema, row)) => new ManifestAggScan(aggSchema, row)
    case None => delegate.build()
  }
}

/** One-row metadata-only result for a completely-pushed aggregation. */
private final class ManifestAggScan(
    aggSchema: StructType, row: org.apache.spark.sql.catalyst.InternalRow)
  extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = aggSchema
  override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] = Array(row)
}

object StatsPruningScanBuilder {
  /** (total files, files kept) of the most recent prune, PER TABLE —
    * observability for tests and debugging. Keyed by table identity so
    * concurrent queries over different tables cannot clobber each other's
    * entry (two planners over the SAME table still last-write-win, which
    * is what "most recent" means). */
  private val prunes =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()
  /** Entry count the most recent FILTERED deferred materialization returned
    * for `table` (same caveat: test observability only). */
  private val deferred =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  // observability only — bound the maps so a long-lived session planning
  // over many transient table names cannot leak driver memory
  private val MaxTracked = 256
  // evict ONE arbitrary entry at the cap — a clear() would wipe every
  // table's reading the moment a 257th name arrives, turning concurrent
  // lastPruneFor calls into (0,0) defaults mid-flight
  private def evictOne(m: java.util.concurrent.ConcurrentHashMap[String, _]): Unit = {
    val it = m.keySet.iterator()
    if (it.hasNext) { it.next(); it.remove() }
  }
  private[spark] def recordPrune(tag: String, totalKept: (Int, Int)): Unit = {
    if (prunes.size >= MaxTracked && !prunes.containsKey(tag)) evictOne(prunes)
    prunes.put(tag, totalKept)
  }
  private[spark] def recordDeferred(tag: String, n: Int): Unit = {
    if (deferred.size >= MaxTracked && !deferred.containsKey(tag)) evictOne(deferred)
    deferred.put(tag, n)
  }
  def lastPruneFor(table: String): (Int, Int) =
    Option(prunes.get(table)).getOrElse((0, 0))
  def lastDeferredFor(table: String): Int =
    Option(deferred.get(table)).map(_.intValue()).getOrElse(-1)
  def resetFor(table: String): Unit = { prunes.remove(table); deferred.remove(table) }
  /** Test-only: wipe BOTH maps so eviction-bound assertions are exact
    * (entries left by other suites would otherwise shift the cap). */
  private[spark] def resetAllForTest(): Unit = { prunes.clear(); deferred.clear() }
}
