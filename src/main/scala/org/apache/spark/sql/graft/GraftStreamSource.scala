package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.types.StructType

import graft.catalog.{GraftCatalog, TableHandle}
import graft.model.DeltaType

/**
 * Incremental Structured Streaming source over a Graft table's delta log —
 * the reference's stream-position watermark discovery
 * (compactor_v2/utils/io.py:171 `discover_deltas`) as a streaming offset
 * model. Offsets are committed stream positions; each micro-batch reads
 * exactly the data files of the deltas in (start, end].
 *
 * Lives under org.apache.spark.sql because the streaming-DataFrame
 * constructor (`internalCreateDataFrame(…, isStreaming = true)`) is
 * private[sql] — the same placement Delta Lake's DSv1 source uses.
 *
 * Append-only by contract: UPSERT/DELETE deltas fail the stream unless
 * `ignoreChanges=true` (mirrors Delta's option; upserted rows then surface
 * as appends and deletes are skipped).
 */
class GraftStreamSource(
    sqlContext: SQLContext,
    root: String,
    table: String,
    ignoreChanges: Boolean,
    /** `option("rowFilter", "<sql predicate>")`: the stream carries only
      * matching rows AND each micro-batch skips whole files whose footer
      * stats exclude the predicate — a streaming backfill over a huge
      * table reads only the relevant slice. */
    rowFilterSql: Option[String] = None,
    /** Admission control (Delta's maxFilesPerTrigger analog): cap how much
      * of the delta log one micro-batch may admit. Without a cap, the FIRST
      * trigger of a stream over a long-lived table reads the entire history
      * in one batch — at 100 TB that batch never finishes and its failure
      * restarts from zero. Caps make the backfill incremental: each trigger
      * admits the next ≤N deltas / ≤N files (always ≥1 delta so progress
      * is guaranteed), checkpointing between.
      * Trigger.AvailableNow caveat: Spark's v1-source AvailableNow wrapper
      * snapshots getOffset ONCE per run, so with a cap each run advances
      * exactly one capped step (repeated runs drain the log; an uncapped
      * AvailableNow run drains in one batch) — see StreamingSpec. */
    maxDeltasPerTrigger: Option[Int] = None,
    maxFilesPerTrigger: Option[Int] = None,
    /** This source's metadata directory INSIDE the checkpoint
      * (`<ck>/sources/<ordinal>`, handed down by StreamSourceProvider) —
      * where the version pin is persisted so it survives driver restarts.
      * None only for direct construction outside a streaming query. */
    metadataPath: Option[String] = None) extends Source {

  private val spark: SparkSession = sqlContext.sparkSession
  private val cat = new GraftCatalog(spark, root)

  /** The pin file's location inside the checkpoint, when one exists.
    * Declared BEFORE [[pinnedTable]]: resolvePin() reads it at init. */
  private val pinLocation: Option[(org.apache.hadoop.fs.Path,
      org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager)] =
    metadataPath.map { dir =>
      val p = new org.apache.hadoop.fs.Path(dir, "version-pin")
      (p, org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
        .create(p.getParent, spark.sessionState.newHadoopConf()))
    }

  /** Version PINNED at stream start: checkpointed offsets are positions in
    * ONE version's delta log — re-resolving per micro-batch would compare
    * offsets from two unrelated logs on one axis when a new version
    * activates mid-stream (silently skipping its early positions). Reading
    * a newly-activated version takes a new stream, same contract as
    * restarting a stream over a replaced table. An unpinned name must
    * resolve to an ACTIVE version at start.
    *
    * The pin is persisted in the checkpoint (metadataPath/version-pin) at
    * FIRST construction and read back on every later one, so a restart
    * after a mid-stream activation re-pins the original version before
    * Spark asks for anything — getOffset and getBatch ordering (which
    * varies by trigger: AvailableNow snapshots getOffset during plan init)
    * never matters. A deprecated pinned version keeps streaming (pinned
    * reads work); only a FRESH stream requires an active resolution. */
  private var pinnedTable: String = resolvePin()

  /** One concept drives recovery: the checkpoint's AXIS — the version
    * whose delta log its offsets index. Authority order: the pin file,
    * else the version tagged in the newest offset-WAL entry. A known
    * axis is resumed regardless of lifecycle (pinned reads work on
    * deprecated versions); only a FRESH stream requires an active
    * resolution. An explicit `table` option pin that contradicts a
    * known axis fails unless the offsets log is known-empty; an
    * explicit pin over an axis-less checkpoint is accepted as the
    * user's assertion (it is the documented remedy for the ambiguous
    * case below). */

  private def persistPin(name: String): Unit = pinLocation.foreach { case (p, m) =>
    m.mkdirs(p.getParent) // sources/<ordinal> does not exist on a fresh checkpoint
    val out = m.createAtomic(p, overwriteIfPossible = true)
    try { out.write(name.getBytes("UTF-8")); out.close() }
    catch { case e: Throwable => out.cancel(); throw e }
  }

  private def readFully(
      m: org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager,
      p: org.apache.hadoop.fs.Path): String = {
    val in = m.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
  }

  private def resolvePin(): String = {
    import org.apache.hadoop.fs.Path
    val explicitVer = TableHandle.parse(table).version
    // Some(entries) = offsets dir listed successfully; None = unknown (FS
    // error). Every durable decision gated on this fails CLOSED on unknown:
    // a pin written off a misread state would be durably wrong.
    lazy val offsetEntries: Option[Seq[org.apache.hadoop.fs.FileStatus]] =
      pinLocation.flatMap { case (p, m) =>
        try {
          val d = new Path(p.getParent.getParent.getParent, "offsets")
          Some(if (!m.exists(d)) Nil
          else m.list(d).toSeq.filter(_.getPath.getName.forall(_.isDigit)))
        } catch { case _: Exception => None }
      }
    val pinFile: Option[String] = pinLocation.flatMap { case (p, m) =>
      if (m.exists(p)) Some(readFully(m, p).trim) else None
    }
    // pre-pin-file checkpoints: the version tagged in the newest WAL entry
    // (OffsetSeqLog layout: line 0 = log version, line 1 = metadata —
    // possibly empty — line 2+i = source i's offset)
    // A read failure on the newest entry PROPAGATES (retryable start
    // failure) rather than degrading to None — a swallowed failure here
    // would misclassify a tagged checkpoint as axis-less and let the
    // case-None path below write a durable pin off guesswork. Genuinely
    // untagged content (pre-VerOffset plain longs) yields None through
    // the lift/collect steps without throwing.
    val walAxis: Option[String] =
      if (pinFile.isDefined) None
      else for {
        (p, m) <- pinLocation
        entries <- offsetEntries
        if entries.nonEmpty
        line <- readFully(m, entries.maxBy(_.getPath.getName.toLong).getPath)
          .split("\n", -1).lift(2 + p.getParent.getName.toInt)
        v <- Some(line).collect { case VerOffset.Json(_, x) => x.toLong }
      } yield TableHandle.parse(table, cat.defaultNamespace)
        .copy(version = Some(v)).toString

    (pinFile orElse walAxis) match {
      case Some(name) =>
        // resolution failures propagate: every guard below decides
        // correctness (wrong-table, wrong-schema, durable override) and a
        // start-time failure is retryable, a fail-open guard is not
        val optionCanonical = cat.resolveTableName(table)
        // an axis recorded for a DIFFERENT table than the option names is
        // never silently honored — the checkpoint belongs to that stream
        if (TableHandle.parse(optionCanonical).copy(version = None) !=
            TableHandle.parse(name).copy(version = None))
          throw new IllegalStateException(
            s"this checkpoint was created streaming $name, not $table; " +
              s"use a new checkpointLocation to stream $table")
        if (explicitVer.isDefined) {
          val explicitName =
            TableHandle.parse(name).copy(version = explicitVer).toString
          if (explicitName == name) { if (pinFile.isEmpty) persistPin(name); name }
          else if (offsetEntries.exists(_.isEmpty)) { // KNOWN empty — nothing indexes any axis yet
            persistPin(explicitName); explicitName
          } else throw new IllegalStateException(
            s"this checkpoint follows $name but the query pins $table; " +
              "switching versions requires a new checkpointLocation")
        } else {
          // analysis resolved the UNPINNED option's schema — if the axis
          // version has since diverged from it, demand an explicit pin
          // rather than serving rows the analyzed plan cannot hold
          if (optionCanonical != name &&
              cat.tableSchema(optionCanonical) != cat.tableSchema(name))
            throw new IllegalStateException(
              s"this checkpoint was streaming $name but $table now resolves to " +
                s"$optionCanonical, whose schema differs; restart the query " +
                s"""with option("table", "$name") to keep following the original version""")
          if (pinFile.isEmpty) persistPin(name) // stabilize a WAL-recovered axis
          name
        }
      case None =>
        // an UNREADABLE offsets log could hide a resumed axis, and every
        // pin written below is durable — prove the log listable first or
        // fail (retryable). This guards the explicit-pin branch too: the
        // "user asserts the axis" acceptance is only safe against a
        // checkpoint whose offsets state is KNOWN (empty or untagged) —
        // had the listing succeeded on a tagged log, a contradicting
        // explicit pin would have been refused, not recorded.
        if (pinLocation.isDefined && offsetEntries.isEmpty)
          throw new IllegalStateException(
            s"cannot inspect the checkpoint offsets log for $table " +
              "(listing failed) — refusing to record a version pin; retry")
        val resolved = cat.resolveTableName(table)
        val target =
          if (explicitVer.isDefined) resolved // user asserts the axis
          else if (offsetEntries.exists(_.nonEmpty)) {
            // a RESUMED pre-pin checkpoint whose offsets carry no version:
            // with one version the axis is forced (resume it regardless of
            // lifecycle); with several, any guess risks silent corruption —
            // refuse loudly. Lifecycle states carry no activation history
            // (any transition is legal), so every version counts.
            val bare = TableHandle.parse(resolved).copy(version = None)
            // a listing failure must propagate (retryable): guessing an
            // axis here would write a durably WRONG pin
            val versions = cat.listTableVersions(bare.toString).map(_._1)
            if (versions.size > 1) throw new IllegalStateException(
              s"this checkpoint predates version pins and $table has multiple " +
                "versions — cannot determine which version's delta log its " +
                "offsets index; restart the query with an explicit " +
                """option("table", "ns.t@vN") pin""")
            // listTableVersions throws TableNotFound rather than returning
            // empty, so exactly one version remains here
            bare.copy(version = Some(versions.head)).toString
          } else {
            // fresh stream: require an active resolution, the start contract
            val lc = cat.getTableMeta(resolved).lifecycleState
            if (lc != graft.catalog.Lifecycle.Active)
              throw new graft.catalog.NoActiveTableVersion(table, lc)
            resolved
          }
        persistPin(target)
        target
    }
  }
  private def pinnedVersion: Long = TableHandle.parse(pinnedTable).version.getOrElse(1L)

  override val schema: StructType = cat.tableSchema(pinnedTable)

  private val rowFilter = rowFilterSql.map(org.apache.spark.sql.functions.expr)
  private val skipFilters =
    rowFilter.map(graft.catalog.StatsSkip.translate).getOrElse(Nil)

  /** Deltas past `after` only — O(new deltas) metafile parses per poll
    * (round-15): a trigger-interval poll on a long-lived table must not
    * re-parse its lifetime delta log (deltaLog did exactly that). */
  private def visibleAfter(after: Long): Seq[graft.txn.DeltaMeta] =
    cat.deltasAfter(pinnedTable, after)

  /** Highest position already OFFERED via getOffset (not necessarily
    * committed) — the admission cursor. getBatch fast-forwards it on
    * recovery, so a restarted query resumes admission after its last
    * checkpointed offset rather than re-capping from scratch. */
  @volatile private var offeredHi: Long = -1L

  override def getOffset: Option[Offset] = {
    // only deltas the admission cursor has not offered yet are parsed —
    // the committed past never re-opens
    val fresh0 = visibleAfter(offeredHi)
    if (fresh0.isEmpty)
      return if (offeredHi < 0) None else Some(VerOffset(offeredHi, pinnedVersion))
    val latest = math.max(offeredHi, fresh0.map(_.streamPosition).max)
    if (maxDeltasPerTrigger.isEmpty && maxFilesPerTrigger.isEmpty)
      return Some(VerOffset(latest, pinnedVersion))
    val fresh = fresh0.sortBy(_.streamPosition)
    val maxD = maxDeltasPerTrigger.getOrElse(Int.MaxValue)
    val maxF = maxFilesPerTrigger.getOrElse(Int.MaxValue)
    var (nD, nF) = (0, 0)
    // always admit at least one delta, however many files it carries —
    // otherwise a single delta wider than the cap would stall forever
    val admitted = fresh.takeWhile { d =>
      val take = nD == 0 || (nD < maxD && nF + d.entries.size <= maxF)
      if (take) { nD += 1; nF += d.entries.size }
      take
    }
    offeredHi = admitted.last.streamPosition
    Some(VerOffset(offeredHi, pinnedVersion))
  }

  /** (position, version-if-recorded). Offsets written by this source carry
    * the pinned version; pre-version checkpoints are plain longs. */
  private def parse(o: Offset): (Long, Option[Long]) = o match {
    case VerOffset(p, v) => (p, Some(v))
    case LongOffset(v) => (v, None)
    case s: SerializedOffset =>
      val t = s.json.trim
      t match {
        case VerOffset.Json(p, v) => (p.toLong, Some(v.toLong))
        case _ => (t.toLong, None)
      }
    case other => throw new IllegalArgumentException(s"unexpected offset $other")
  }

  /** Restart guard: checkpointed offsets are positions in ONE version's
    * delta log, and the in-memory pin dies with the driver — a restart
    * after a mid-stream activation would otherwise resolve the new active
    * version and compare old offsets against an unrelated log. Offsets
    * recorded by this source carry their version; on recovery, silently
    * re-pin to it when the schema is unchanged, fail with the explicit-pin
    * remedy when it is not. */
  private def adoptVersion(ver: Long): Unit = {
    if (ver == pinnedVersion) return
    val target = TableHandle.parse(pinnedTable).copy(version = Some(ver)).toString
    if (cat.tableSchema(target) == schema) {
      pinnedTable = target
      // correct the pin file too — a stale one would force every future
      // restart through offset-carried adoption, defeating the file's
      // purpose of making getOffset/getBatch ordering irrelevant
      persistPin(target)
    }
    else throw new IllegalStateException(
      s"this checkpoint was streaming $target but $table now resolves to " +
        s"$pinnedTable, whose schema differs; restart the query with " +
        s"""option("table", "$target") to keep following the original version""")
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val (hi, hiVer) = parse(end)
    val (lo, loVer) = start.map(parse).getOrElse((-1L, None))
    (loVer, hiVer) match {
      case (Some(a), Some(b)) if a != b =>
        // start and end index DIFFERENT versions' logs: a restart raced a
        // version activation and this batch's range spans two axes — no
        // correct row set exists for it
        // the mixed range is already durable in the offset WAL, so every
        // restart replays it — only a fresh checkpoint truly recovers
        throw new IllegalStateException(
          s"offset range for $table mixes table versions v$a..v$b " +
            "(a version was activated across a restart and an offset was " +
            "recorded on the new version's axis); the checkpoint cannot " +
            "be continued — start the query with a NEW checkpointLocation " +
            s"""and option("table", "${TableHandle.parse(pinnedTable)
              .copy(version = Some(a)).toString}") to resume from the """ +
            "original version (reprocessing from its retained history)")
      case _ => hiVer.orElse(loVer).foreach(adoptVersion)
    }
    // recovery fast-forward: a restart replays the last checkpointed batch
    // through getBatch before any getOffset — admission resumes past it
    if (hi > offeredHi) offeredHi = hi
    // a history trim past this batch's floor would silently LOSE deltas —
    // the same loud-failure contract as readChanges
    cat.getTableMeta(pinnedTable).properties
      .get("history.trim.upto.position").flatMap(_.toLongOption)
      .filter(_ > lo).foreach(w => throw new IllegalStateException(
        s"streaming checkpoint for $table resumes from position $lo but " +
          s"deltas up to $w were trimmed by trimHistory — start a new " +
          "checkpoint (full reprocess) or keep retention longer than the " +
          "stream's maximum downtime"))
    val inRange = visibleAfter(lo).filter(_.streamPosition <= hi)
    // REPLACE truncation: a replace marker inside the range semantically
    // erased every earlier delta — a stream that was offline across the
    // replace must deliver the replace's content and what follows, never
    // the pre-replace rows (deltasAfter is truncation-blind by design; the
    // batch scan's effectiveDeltas truncates exactly this way).
    val lastReplace = inRange.filter(_.properties.get("replace").contains("true"))
      .map(_.streamPosition).maxOption
    val batch = lastReplace.fold(inRange)(r => inRange.filter(_.streamPosition >= r))
      // A compacted snapshot re-references already-streamed data: skip it —
      // except bulk-load deltas, whose rows appeared in no earlier delta.
      .filter(d => d.compactedUpTo < 0 || d.properties.get("bulk_load").contains("true"))
    val bad = batch.filter(d => d.typed == DeltaType.Upsert || d.typed == DeltaType.Delete)
    if (bad.nonEmpty && !ignoreChanges) throw new IllegalStateException(
      s"streaming source on $table hit ${bad.size} UPSERT/DELETE delta(s); " +
        "streams are append-only — set option ignoreChanges=true to stream " +
        "upserted rows as appends and skip deletes")
    val dataDeltas = batch.filter(_.typed != DeltaType.Delete)
    val ct = graft.model.ContentType.fromName(
      cat.getTableMeta(pinnedTable).properties.getOrElse("content_type", "parquet"))
    import org.apache.spark.sql.functions.col
    val fullSet = schema.fieldNames.toSet
    // Historical written_columns may carry pre-rename names — translate so
    // renamed fields stream under their current name; the shared subset
    // reader (rename aliasing, positional csv alignment, null padding)
    // keeps this path semantically identical to the batch scan.
    val renames = graft.catalog.MergeRead.renameMapOf(schema)
    def tr(c: String): String = renames.getOrElse(c, c)
    val groups = dataDeltas
      .groupBy(_.properties.get("written_columns").map(_.split(",").toSet.map(tr)).getOrElse(fullSet))
      .toSeq
    val frames = groups.flatMap { case (written, ds) =>
      // footer-stats skipping per micro-batch (appends only — no merge
      // resolution in this source, so value-predicate pruning is sound)
      val paths = graft.catalog.StatsSkip
        .prune(ds.flatMap(_.entries), skipFilters, schema).map(_.path)
      if (paths.isEmpty) None
      else Some(graft.catalog.MergeRead
        .readWrittenSubset(spark, schema, written, paths, ct)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*))
    }
    val df0 =
      if (frames.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else frames.reduce(_ unionByName _)
    val df = rowFilter.foldLeft(df0)((d, p) => d.where(p))
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** A stream position tagged with the table version whose delta log it
  * indexes — makes the source's version pin recoverable from the
  * checkpoint across driver restarts. */
final case class VerOffset(pos: Long, ver: Long) extends Offset {
  override val json: String = s"""{"pos":$pos,"ver":$ver}"""
}

object VerOffset {
  /** Matches this offset's serialized form (and nothing else). */
  val Json: scala.util.matching.Regex =
    """\{"pos":(-?\d+),"ver":(\d+)\}""".r
}
