package graft.catalog

import java.nio.file.Paths

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._
import graft.txn.{DeltaMeta, ManifestEntry, Json}

/**
 * Read-optimizing compaction: folds pending deltas (including upserts and
 * deletes) into a bucketed, sorted, compacted snapshot.
 *
 * Spark-first restatement of the reference compactor v2
 * (compute/compactor_v2/compaction_session.py:68-216): where the reference
 * runs a hash_bucket task wave -> object store -> merge task wave, this is a
 * single Spark job — scan(active files) -> window resolve -> repartition by
 * hash bucket -> sorted bucketed write — with two shuffles total (the window
 * and the bucket clustering), both spill-safe and AQE-managed.
 *
 * Scale features kept from the reference:
 *  - copy-by-reference (merge.py:483-502): buckets untouched by incremental
 *    data keep their existing files in the new manifest; only touched buckets
 *    are read and rewritten. The physical layout partitions compacted data by
 *    `_g_bucket=N` directories precisely so this pruning is a path filter.
 *  - incremental high-watermark (RoundCompletionInfo): the committed delta
 *    records `compactedUpTo`, so the next round only reads newer deltas.
 *  - 4M records per file default (compactor_v2/constants.py:7) via
 *    `maxRecordsPerFile`.
 *  - sort scheme applied within buckets at materialize (merge.py:669-676).
 */
object Compactor {

  import Hidden._

  val DefaultMaxRecordsPerFile = 4000000L

  /** Write-path (pending-delta) file slicing default — deliberately 4×
    * tighter than compaction's. A merge write inherits the INPUT's
    * partitioning, so one skewed input partition becomes one fat file; a
    * 4M-row narrow file is ~100 MB = a single parquet row group = ONE
    * read split, and that file is the merge-on-read scan's straggler task
    * until the next compaction (measured: 10-17 s of a 15 s zipper read).
    * 1M-row pending files (~25-50 MB narrow) keep MoR scans parallel;
    * compacted bases keep the larger slices (their layout is balanced by
    * the bucket×slice repartition, so splittability is already ensured
    * by file count). */
  val WriteMaxRecordsPerFile = 1000000L

  /** ~on-disk bytes one compaction bucket should own. One bucket = one
    * sorted write task (plus record-slice fan-out), so this bounds task
    * input at roughly 1 GiB in-memory under the reference's ~4x
    * parquet→Arrow inflation estimate. */
  val TargetBucketBytes: Long = 256L << 20

  /** Stats-driven bucket count — the Spark-native analog of the reference's
    * resource estimation (it sizes worker tasks from manifest metadata,
    * compute/resource_estimation/manifest.py + the per-type inflation table
    * api.py:103-120; we size the bucket layout the tasks derive from
    * instead). Used only when no explicit count exists: a caller argument,
    * the existing base's count (copy-by-reference must keep the layout) and
    * the `compaction.num_buckets` table property all take precedence. Floor
    * 8 keeps toy tables multi-task; cap 16384 bounds file count (buckets ×
    * slices) on very large tables. */
  /** Shared floor-8 / cap-16384 bucket-count shape. Overflow-safe:
    * Long.MaxValue-sized stats estimates exist. */
  private def suggest(bytes: Double, targetPerBucket: Long): Int = {
    val ceil = math.ceil(math.min(bytes, Long.MaxValue.toDouble) / targetPerBucket).toLong
    math.min(16384L, math.max(8L, ceil)).toInt
  }

  def suggestBuckets(onDiskBytes: Long): Int = suggest(onDiskBytes.toDouble, TargetBucketBytes)

  /** Target IN-MEMORY bytes one bucket's sorted-write task should hold —
    * what TargetBucketBytes approximates via the blanket 4× inflation.
    * Used when ResourceEstimator has real per-entry estimates. */
  val TargetBucketMemoryBytes: Long = 1L << 30

  /** Bucket count from an estimated in-memory footprint (same floor/cap as
    * suggestBuckets) — the resource-estimation-driven layout sizing the
    * reference's compactor derives from its estimates. */
  def suggestBucketsFromMemory(memBytes: Double): Int =
    suggest(memBytes, TargetBucketMemoryBytes)

  /** Hottest-bucket : mean-bucket byte ratio above which a recluster is
    * advised. The partitioned merge scans ONE partition per bucket
    * (BucketedBase doc: duplicate partition keys would corrupt
    * exchange-free plans), so the hottest bucket bounds every stage that
    * touches the base — at 4× mean the scan/merge wall is ≥4× a balanced
    * layout's and salting/recluster beats riding it out. */
  val SkewThreshold: Double = 4.0

  /** One bucket's manifest-stat footprint (metadata only). */
  final case class BucketStat(bucket: Int, bytes: Long, records: Long, files: Int)

  /** Layout-health verdict for a compacted bucketed base. `reasons` is
    * machine-readable: "skew" (hottest ≥ SkewThreshold × mean — includes
    * holes: mean is over the DECLARED bucket count, so empty buckets pull
    * it down exactly as they idle their scan slot), "bucket_overflow"
    * (hottest bucket exceeds 4× TargetBucketBytes — its sorted write task
    * and scan split no longer fit the task-memory budget the layout was
    * sized for), "undersized_layout" (stats-suggested count outgrew the
    * recorded layout by >2×: the table grew; recompacting to more buckets
    * restores per-task bounds). */
  final case class ReclusterAdvice(
      numBuckets: Int, populated: Int, totalBytes: Long, totalRecords: Long,
      hottest: BucketStat, skew: Double, suggestedBuckets: Int,
      reasons: Seq[String]) {
    def recommended: Boolean = reasons.nonEmpty
  }

  /** Per-bucket stats + recluster recommendation from MANIFEST METADATA
    * alone (no file opens, no jobs — safe at any table size; the 100 TB
    * observability story for the one-partition-per-bucket trade).
    * None = the entries don't carry a trustworthy bucket layout (an
    * un-bucketed path, or no entries). `bucketOf` is the catalog's
    * path→bucket parser, the same single source of truth the partitioned
    * read trusts. */
  def reclusterAdvice(entries: Seq[graft.txn.ManifestEntry], numBuckets: Int,
      bucketOf: String => Option[Int],
      skewThreshold: Double = SkewThreshold): Option[ReclusterAdvice] =
    reclusterAdviceOf(numBuckets, bucketOf, skewThreshold)(entries.foreach)

  /** [[reclusterAdvice]] over a STREAMED entry source — O(1) memory, so a
    * base above the manifest planning gate (whose entries never
    * materialize on the driver) still yields advice: pass
    * `ManifestPlanner.foreachEntry(metafile)`. One pass; per-bucket sums
    * are the only state. */
  def reclusterAdviceOf(numBuckets: Int, bucketOf: String => Option[Int],
      skewThreshold: Double = SkewThreshold)(
      forEach: (graft.txn.ManifestEntry => Unit) => Unit): Option[ReclusterAdvice] = {
    if (numBuckets <= 0) return None
    val per = scala.collection.mutable.HashMap[Int, (Long, Long, Int)]()
    var untrusted = false
    // One unattributable path invalidates the whole verdict, so stop the
    // pass right there (round-13 advice) — on a large Seq-backed base the
    // prior flag-at-the-end shape scanned every remaining entry for an
    // answer already known to be None. A private control throw is the only
    // break available through the forEach SAM; it never escapes.
    object Unattributable extends scala.util.control.ControlThrowable
    try forEach { e =>
      bucketOf(e.path) match {
        case Some(b) if b >= 0 && b < numBuckets =>
          val (by, rc, n) = per.getOrElse(b, (0L, 0L, 0))
          per.update(b, (by + math.max(0L, e.sizeBytes),
            rc + math.max(0L, e.recordCount), n + 1))
        case _ => untrusted = true; throw Unattributable
      }
    } catch { case Unattributable => () }
    if (untrusted || per.isEmpty) return None
    val stats = per.toSeq.map { case (b, (by, rc, n)) => BucketStat(b, by, rc, n) }
    val totalBytes = stats.map(_.bytes).sum
    val totalRecords = stats.map(_.records).sum
    val hottest = stats.maxBy(_.bytes)
    val mean = totalBytes.toDouble / numBuckets
    val skew = if (mean > 0) hottest.bytes / mean else 1.0
    val suggested = suggestBuckets(totalBytes)
    val reasons = Seq(
      if (skew >= skewThreshold) Some("skew") else None,
      if (hottest.bytes > 4L * TargetBucketBytes) Some("bucket_overflow") else None,
      if (suggested > 2 * numBuckets) Some("undersized_layout") else None).flatten
    Some(ReclusterAdvice(numBuckets, stats.size, totalBytes, totalRecords,
      hottest, skew, suggested, reasons))
  }

  /** Full layout tag of a sort scheme — EVERY SortKey field affects the
    * physical order (direction, null placement, transform), so the
    * copy-by-reference check must compare them all; a tag that dropped
    * any of them would skip re-sorting after that aspect changed. */
  private[catalog] def sortTag(ss: SortScheme): String = ss.keys.map(k =>
    s"${k.field}:${if (k.ascending) "asc" else "desc"}:" +
      s"${if (k.nullsFirst) "nf" else "nl"}:${k.transform.name}").mkString(",")

  /** Multi-round input valve (reference `num_rounds`,
    * compaction_session.py:73-76 + uniform delta batching,
    * delta_annotated.py): when `compaction.max_input_bytes` is set and the
    * pending on-disk bytes exceed it, compact in sequential sub-rounds —
    * each folds base + one pending CHUNK, commits, and advances the
    * watermark, so no single round's shuffle input exceeds the valve and a
    * crash between rounds loses only uncommitted work. Copy-by-reference
    * composes across rounds (round k's output is round k+1's base).
    * Default off: Spark's spillable shuffle handles over-memory inputs
    * correctly, so the valve is a pressure-relief knob for pathological
    * backlogs (a 64-million-file bootstrap), not the steady state. */
  def compact(cat: GraftCatalog, table: String, numBuckets: Int = 8): Unit = {
    val valve = cat.getTableMeta(table).properties
      .get("compaction.max_input_bytes").map(_.toLong)
    valve match {
      case None => compactOnce(cat, table, numBuckets, None)
      case Some(v) =>
        require(v > 0, s"compaction.max_input_bytes must be positive, got $v")
        val t = cat.handleOf(table)
        val (pairs, streamed) = cat.effectiveDeltasForMaintenance(t)
        val (_, pending) = MergeRead.activeDeltas(pairs.map(_._1))
        val pathOf = pairs.map { case (d, p) => d.streamPosition -> p }.toMap
        def bytesOf(d: DeltaMeta): Long =
          // stamped at commit since round 9 — the common case never
          // re-streams a metafile just to size it
          d.properties.get("total_bytes").flatMap(_.toLongOption) getOrElse {
            if (!streamed) d.totalBytes
            else {
              var b = 0L
              ManifestPlanner.foreachEntry(pathOf(d.streamPosition), cat.io)(e =>
                b += math.max(0L, e.sizeBytes))
              b
            }
          }
        // chunk END positions: ascending, close a chunk when adding the
        // next delta would exceed the valve (a single over-valve delta
        // still forms its own round — deltas never split)
        val ends = scala.collection.mutable.ArrayBuffer[Long]()
        var acc = 0L; var last = -1L
        pending.sortBy(_.streamPosition).foreach { d =>
          val b = bytesOf(d)
          if (last >= 0 && acc + b > v) { ends += last; acc = 0L }
          acc += b; last = d.streamPosition
        }
        if (last >= 0) ends += last
        if (ends.size <= 1) compactOnce(cat, table, numBuckets, None)
        else ends.zipWithIndex.foreach { case (end, i) =>
          compactOnce(cat, table, numBuckets, Some(end))
          // each sub-round is COMMITTED before this point — a crash here
          // (ConcurrencySpec fault injection) loses no committed progress
          // and the next compact() invocation resumes from the advanced
          // watermark
          afterSubRound(i)
        }
    }
  }

  /** Test seam: runs after each committed valve sub-round, before the next
    * starts. A test that throws here simulates a driver crash between
    * sub-rounds; production no-op. */
  private[graft] var afterSubRound: Int => Unit = _ => ()

  private def compactOnce(cat: GraftCatalog, table: String, numBuckets: Int,
      upTo: Option[Long]): Unit = {
    val spark = cat.spark
    val t = cat.handleOf(table)
    val meta = cat.getTableMeta(table)
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val mergeKeys = FieldMeta.mergeKeys(schema)
    val scheme = cat.partitionSchemeOf(meta)
    val sortScheme = cat.sortSchemeOf(meta)
    val ct = cat.contentTypeOf(meta)
    // Above the planning gate the deltas are entry-less skeletons and
    // entry access streams from the metafiles (ManifestPlanner
    // .foreachEntry) — the driver holds per-entry state, never a
    // 10^7-entry base list. Below it, parsed entries as before.
    val (deltaPairs, streamedEntries) = cat.effectiveDeltasForMaintenance(t)
    val deltas = deltaPairs.map(_._1)
    val metafileOf: Map[Long, java.nio.file.Path] =
      deltaPairs.map { case (d, p) => d.streamPosition -> p }.toMap
    def foreachEntryOf(d: DeltaMeta)(f: ManifestEntry => Unit): Unit =
      if (!streamedEntries) d.entries.foreach(f)
      else ManifestPlanner.foreachEntry(metafileOf(d.streamPosition), cat.io)(f)
    // Paths of files being REWRITTEN — proportional to the compaction's
    // actual work (Spark's load(paths) API needs the list either way).
    def entryPathsOf(ds: Seq[DeltaMeta]): Seq[String] = {
      val b = Seq.newBuilder[String]
      ds.foreach(d => foreachEntryOf(d)(e => b += e.path))
      b.result()
    }
    val (base, pending0) = MergeRead.activeDeltas(deltas)
    // valve sub-round: fold only the pending chunk up to `upTo`; later
    // deltas stay pending and the watermark advances to the chunk end
    val pending = upTo.map(u => pending0.filter(_.streamPosition <= u)).getOrElse(pending0)
    // A rename leaves committed files under the OLD physical column name
    // (reads alias them); compaction is the operation that rewrites the
    // data under the current names, so a stale base compacts even with
    // nothing pending. `anyStale` additionally covers stale PENDING deltas
    // on keyless tables: the manifest-folding branch would copy their old
    // files by reference while stamping the fold with current names —
    // falsifying the staleness marker forever.
    val renamedOld = schema.fields.flatMap(FieldMeta.renamedFrom).toSet
    def stale(d: DeltaMeta): Boolean = renamedOld.nonEmpty &&
      d.properties.get("written_columns")
        .map(_.split(",").exists(renamedOld)).getOrElse(true)
    val baseStale = base.exists(stale)
    val anyStale = baseStale || pending.exists(stale)
    // A base never clustered on the CURRENT z-order columns needs a rewrite
    // even with nothing pending (the user just set/changed the property) —
    // keyed tables included: their recluster forces every bucket through
    // the materialize path below.
    val needsRecluster = ZOrder.columnsOf(meta.properties).exists(zc =>
      base.exists(!_.properties.get("zordered").contains(zc.mkString(","))))
    // Sort-scheme analog for keyless tables: a declared (or altered)
    // scheme with a base not stamped under the SAME full tag (field,
    // direction, null order, transform all layout-affecting) must rewrite
    // on an explicit compact() even with nothing pending — otherwise
    // "declare scheme, run compact" is a silent no-op until some
    // unrelated append.
    val needsResort = mergeKeys.isEmpty &&
      ZOrder.columnsOf(meta.properties).isEmpty && !sortScheme.isEmpty &&
      base.exists(!_.properties.get("sorted").contains(sortTag(sortScheme)))
    // Partition-scheme analog (alterTable can change the scheme since
    // round 9): a base not stamped under the CURRENT scheme tag must
    // rewrite, or "alter scheme, run compact" would be the exact silent
    // manifest-fold no-op the sort branch exists to prevent, and
    // partitionValues pruning on the new scheme would stay a full-table
    // superset forever. Keyed tables included (their untouched
    // copy-by-reference buckets would otherwise keep the old layout).
    val schemeTag = scheme.keys.map(k => s"${k.field}:${k.transform.name}").mkString(",")
    def oldLayout(d: DeltaMeta): Boolean =
      !d.properties.get("partition_scheme").contains(schemeTag)
    val needsRelayout = !scheme.isEmpty && base.exists(oldLayout)
    // the pure-fold branch copies PENDING files by reference too — an
    // old-layout pending delta must force the rewrite path, like anyStale
    val anyOldLayout = !scheme.isEmpty &&
      (needsRelayout || pending.exists(oldLayout))
    if (pending.isEmpty && !baseStale && !needsRecluster && !needsResort &&
      !needsRelayout) return
    // Watermark = highest FOLDED position. With pending, that is the
    // pending (chunk) max — the base's own revision can be HIGHER than a
    // valve chunk's positions (it committed after them), and stamping it
    // would silently skip every later chunk. Pending-empty rewrites
    // (stale/recluster/resort) supersede the base at its own position.
    val maxPos =
      if (pending.nonEmpty) pending.map(_.streamPosition).max
      else base.map(_.streamPosition).max

    val txn = cat.store.newTransaction(s"compact $t up to $maxPos")
    try {
      val dir = cat.deltaDirOf(t)
      val rev = cat.store.nextRevision(dir, Some(txn))

      val zCols = ZOrder.columnsOf(meta.properties)
      def zScan(paths: Seq[String]) = spark.read.schema(schema)
        .format(ct.format).options(ct.readOptions).load(paths: _*)

      // Each branch produces the copied-by-reference entry STREAM (pushed
      // straight from source metafiles on the gated path — never resident),
      // the newly-written entries (count = files written, always small),
      // and the delta properties. The stage at the bottom writes
      // ref-entries-then-new in one pass.
      type RefStream = (ManifestEntry => Unit) => Unit
      val (refStream, newEntriesOut, props): (RefStream, Seq[ManifestEntry], Map[String, String]) =
        if (mergeKeys.isEmpty && !anyStale && zCols.isEmpty && sortScheme.isEmpty &&
            !anyOldLayout) {
          // Append-only table, no declared clustering: compaction is pure
          // manifest folding — zero data movement (every file is copied by
          // reference).
          val records = (base.toSeq ++ pending)
            .map(_.properties.getOrElse("record_count", "0").toLong).sum
          val srcBytes = (base.toSeq ++ pending).map(_.properties.get("total_bytes"))
          val bytesProp =
            if (srcBytes.forall(_.isDefined))
              Map("total_bytes" -> srcBytes.flatten.map(_.toLong).sum.toString)
            else Map.empty[String, String]
          (emit => (base.toSeq ++ pending).foreach(d => foreachEntryOf(d)(emit)),
            Nil,
            Map("written_columns" -> schema.fieldNames.mkString(","),
              "record_count" -> records.toString,
              "partition_scheme" -> schemeTag) ++ bytesProp)
        } else if (mergeKeys.isEmpty && !anyStale && zCols.isEmpty) {
          // Append-only + declared SORT scheme: a pure manifest fold would
          // silently never apply the scheme (appends land unsorted and
          // nothing else rewrites them), so range skipping on the sort
          // column would quietly degrade forever. INCREMENTAL like the
          // z-order branch below: a base already materialized under the
          // same sort keys is copied by reference; only the pending tail
          // (plus a base sorted under a different scheme) rewrites.
          val sTag = sortTag(sortScheme)
          val (refDeltas, rewriteDeltas) =
            if (!needsRelayout && base.exists(_.properties.get("sorted").contains(sTag)))
              (base.toSeq, pending)
            else (Nil, base.toSeq ++ pending)
          val paths = entryPathsOf(rewriteDeltas)
          val maxRec = meta.properties.get("compaction.max_records_per_file")
            .map(_.toLong).getOrElse(DefaultMaxRecordsPerFile)
          val (newEntries, written) = if (paths.isEmpty) (Nil, 0L) else {
            val scan = MergeRead.scanWithLineage(spark, schema, deltas, paths, ct)
            val resolved = MergeRead.applyPastDefaults(scan, schema)
              .select(schema.fieldNames.map(col).toIndexedSeq: _*)
            val (e, w, _) = materialize(cat, t, rev, txn.txnId, resolved, schema, scheme,
              sortScheme, ct, numBuckets, maxRec,
              estimatedRecords = Some(rewriteDeltas.map(d =>
                math.max(0L, d.properties.getOrElse("record_count", "0").toLong)).sum),
              encoding = cat.contentEncodingOf(meta),
              writeOptions = cat.bloomOptionsOf(meta), statCols = cat.statColsOf(meta))
            (e, w)
          }
          // one streaming pass for the copied-by-reference counts
          var refRecords = 0L; var refCount = 0L; var refBytes = 0L
          refDeltas.foreach(d => foreachEntryOf(d) { e =>
            refCount += 1; refRecords += math.max(0L, e.recordCount)
            refBytes += math.max(0L, e.sizeBytes)
          })
          (emit => refDeltas.foreach(d => foreachEntryOf(d)(emit)),
            newEntries,
            Map("written_columns" -> schema.fieldNames.mkString(","),
              "record_count" -> (written + refRecords).toString,
              "total_bytes" ->
                (refBytes + newEntries.map(_.sizeBytes).sum).toString,
              "sorted" -> sTag,
              "partition_scheme" -> schemeTag,
              "copied_by_reference" -> refCount.toString))
        } else if (mergeKeys.isEmpty && !anyStale) {
          // Append-only + z-order: INCREMENTAL recluster. A base already
          // z-ordered on the same columns is copied by reference (its files
          // are tight hyper-rectangles already); only the pending tail is
          // rewritten through the z-sort. First compaction (or a changed
          // column list) reclusters everything once.
          val zTag = zCols.get.mkString(",")
          val (refDeltas, rewriteDeltas) =
            if (!needsRelayout && base.exists(_.properties.get("zordered").contains(zTag)))
              (base.toSeq, pending)
            else (Nil, base.toSeq ++ pending)
          // The z-bounds scan needs every active PATH (a Spark load() API
          // constraint) — paths only, not full entries; counts ride along.
          val refPathsB = Seq.newBuilder[String]
          var refRecords = 0L; var refCount = 0L; var refBytes = 0L
          refDeltas.foreach(d => foreachEntryOf(d) { e =>
            refPathsB += e.path; refCount += 1
            refRecords += math.max(0L, e.recordCount)
            refBytes += math.max(0L, e.sizeBytes)
          })
          val refPaths = refPathsB.result()
          val paths = entryPathsOf(rewriteDeltas)
          val maxRec = meta.properties.get("compaction.max_records_per_file")
            .map(_.toLong).getOrElse(DefaultMaxRecordsPerFile)
          val (newEntries, written) = if (paths.isEmpty) (Nil, 0L) else {
            // Bounds over ALL active data (ref + rewrite) so bin edges stay
            // stable as the table grows.
            val allPaths = refPaths ++ paths
            val z = ZOrder.zvalue(schema, ZOrder.bounds(zScan(allPaths), schema, zCols.get))
            val scan = MergeRead.scanWithLineage(spark, schema, deltas, paths, ct)
            val resolved = MergeRead.applyPastDefaults(scan, schema)
              .select(schema.fieldNames.map(col).toIndexedSeq: _*)
            val (e, w, _) = materialize(cat, t, rev, txn.txnId, resolved, schema, scheme,
              sortScheme, ct, numBuckets, maxRec,
              estimatedRecords = Some(rewriteDeltas.map(d =>
                math.max(0L, d.properties.getOrElse("record_count", "0").toLong)).sum),
              encoding = cat.contentEncodingOf(meta), zorder = Some(z),
              writeOptions = cat.bloomOptionsOf(meta), statCols = cat.statColsOf(meta))
            (e, w)
          }
          (emit => refDeltas.foreach(d => foreachEntryOf(d)(emit)),
            newEntries,
            Map("written_columns" -> schema.fieldNames.mkString(","),
              "record_count" -> (written + refRecords).toString,
              "total_bytes" ->
                (refBytes + newEntries.map(_.sizeBytes).sum).toString,
              "zordered" -> zTag,
              "partition_scheme" -> schemeTag,
              "copied_by_reference" -> refCount.toString))
        } else {
          // Copy-by-reference: find buckets touched by incremental rows. Only
          // valid when the base was bucketed with the same bucket count —
          // and never when the base's files predate a rename (every file
          // must be rewritten under the current column names).
          val baseBucketed = base.exists(_.properties.get("num_buckets").contains(numBuckets.toString))
          val pendingPaths = entryPathsOf(pending)
          val touched: Set[Int] =
            if (!baseBucketed || baseStale || needsRecluster || needsRelayout)
              (0 until numBuckets).toSet
            else MergeRead.touchedBuckets(spark, schema, mergeKeys, numBuckets,
              pendingPaths, ct, pending)

          // Untouched buckets copy by reference (streamed + counted, never
          // held as a list); touched buckets contribute read PATHS —
          // proportional to the round's actual rewrite work.
          def isUntouched(e: ManifestEntry): Boolean = baseBucketed &&
            MergeRead.bucketOfPath(e.path).exists(bk => !touched.contains(bk))
          var untouchedRecords = 0L; var untouchedCount = 0L
          var untouchedBytes = 0L
          val baseToReadB = Seq.newBuilder[String]
          // z-order bin edges need the untouched PATHS too (bounds scan all
          // active data so edges stay stable) — collected only under z-order
          val untouchedPathsB =
            if (zCols.isDefined) Some(Seq.newBuilder[String]) else None
          base.foreach(b => foreachEntryOf(b) { e =>
            if (isUntouched(e)) {
              untouchedCount += 1
              untouchedRecords += math.max(0L, e.recordCount)
              untouchedBytes += math.max(0L, e.sizeBytes)
              untouchedPathsB.foreach(_ += e.path)
            } else baseToReadB += e.path
          })
          val touchedBasePaths = baseToReadB.result()
          val paths = touchedBasePaths ++ pendingPaths
          val maxRec = meta.properties.get("compaction.max_records_per_file")
            .map(_.toLong).getOrElse(DefaultMaxRecordsPerFile)

          val (newEntries, written, _) = if (paths.nonEmpty) {
            val scan = MergeRead.scanWithLineage(spark, schema, deltas, paths, ct)
            val active = MergeRead.referencedDeltas(deltas, paths)
            // Backfill past_defaults into the materialized files: compacted
            // files are stamped written_columns = full schema, so the read
            // path no longer backfills for them — the values must be
            // physically present or the table would read differently before
            // vs after compaction.
            // Keyless tables (append-only rewrite after a rename) have no
            // merge semantics — resolve would collapse everything into one
            // group; every scanned row is live as-is.
            // Keyed tables reuse the READ path's merge regime ladder for the
            // resolve HALF of compaction (materialize's bucket/slice shuffle
            // stays — its parallelism decoupling is load-bearing at 100 TB):
            // a sparse/partitioned split means touched-but-uncontested base
            // rows skip the resolve shuffle entirely — compaction's shuffle
            // volume drops from 2x touched-base to 1x touched-base +
            // O(pending). The split MUST use the base's RECORDED bucket
            // count (the layout's n), never the compaction target — a
            // recluster changes the target while files still live in the
            // old layout, and a mismatched n would put keys in the wrong
            // KeyGrouped partitions (wrong join results, silently).
            val layoutBuckets = base.flatMap(_.properties.get("num_buckets")).map(_.toInt)
            // Hot-bucket carve-out applies to compaction's resolve half too
            // (round-14): a hot bucket would straggle the partitioned
            // split's single KeyGrouped partition during the rewrite
            // exactly as it did at read. Detection streams the base
            // metafile above the planning gate (O(1) memory, the recluster
            // advisor's pattern); counts cover the FULL base — the mean is
            // a layout property, not a property of this round's touched
            // subset. Above the gate the split-regime ratios resolve from
            // the commit-stamped record_count properties (MergeRead
            // .deltaRows), so skeleton deltas no longer silently force the
            // dense resolve at exactly the table size the splits exist for.
            // lazy: keyless tables and sparse-eligible rounds never use it,
            // and the detection pass streams the FULL base metafile — at
            // 10^7 entries that is real driver time to spend only when the
            // partitioned rung actually runs
            lazy val hotSet = layoutBuckets.map(n =>
              MergeRead.hotBucketsOf(spark, n, MergeRead.bucketOfPath)(f =>
                base.foreach(b => foreachEntryOf(b)(f)))).getOrElse(Set.empty)
            val merged =
              if (mergeKeys.isEmpty) scan
              else if (MergeRead.sparseEligible(spark, base, touchedBasePaths,
                  pending, pendingPaths))
                // needFile=false: materialize projects the winner's File
                // away, so the resolve need not buffer the path string
                MergeRead.sparseMerge(spark, schema, scheme, mergeKeys, deltas,
                  touchedBasePaths, pending, pendingPaths, ct, needFile = false)
              else MergeRead.partitionedWithCarveout(spark, schema, scheme,
                  mergeKeys, deltas, touchedBasePaths, pending, pendingPaths,
                  ct, layoutBuckets, hotSet, ReadOptions(), Nil)
                .getOrElse(MergeRead.resolve(scan, schema, scheme, mergeKeys,
                  active, needFile = false,
                  approxRows = Some((base.toSeq ++ pending).map(d =>
                    math.max(0L, d.properties.getOrElse("record_count", "0").toLong)).sum)))
            val resolved = MergeRead.applyPastDefaults(merged, schema)
              .select(schema.fieldNames.map(col).toIndexedSeq: _*)
            materialize(cat, t, rev, txn.txnId, resolved, schema, scheme, sortScheme, ct,
              numBuckets, maxRec, estimatedRecords = Some(
                (base.toSeq ++ pending).map(d =>
                  math.max(0L, d.properties.getOrElse("record_count", "0").toLong)).sum),
              encoding = cat.contentEncodingOf(meta),
              // Keyed tables z-sort within each bucket slice: files stay
              // bucket-aligned for merge pruning AND tight in value space.
              // bounds over ALL active files (incl. untouched copy-by-ref
              // buckets) so bin edges stay stable across incremental rounds
              zorder = zCols.map(zc => ZOrder.zvalue(schema, ZOrder.bounds(
                zScan(paths ++ untouchedPathsB.map(_.result()).getOrElse(Nil)), schema, zc))),
              writeOptions = cat.bloomOptionsOf(meta), statCols = cat.statColsOf(meta))
          } else {
            // a placeholder only — no-op where directories are virtual
            cat.io.mkdirs(Paths.get(
              cat.dataDirOf(t).resolve(f"d$rev%06d__${txn.txnId}").toString))
            (Nil, 0L, null)
          }
          (emit => base.foreach(b => foreachEntryOf(b)(e => if (isUntouched(e)) emit(e))),
            newEntries,
            Map(
              "written_columns" -> schema.fieldNames.mkString(","),
              "num_buckets" -> numBuckets.toString,
              "record_count" -> (written + untouchedRecords).toString,
              "total_bytes" ->
                (untouchedBytes + newEntries.map(_.sizeBytes).sum).toString,
              "partition_scheme" -> schemeTag,
              "copied_by_reference" -> untouchedCount.toString) ++
              // stamp the clustering or the next keyless compact would
              // needlessly full-recluster a base this branch just z-sorted
              // (post-rename rewrite path)
              zCols.map(zc => "zordered" -> zc.mkString(",")).toMap)
        }

      val delta = DeltaMeta(rev, DeltaType.Add.name, Nil, txn.txnId, maxPos, props)
      if (!streamedEntries) {
        // small-manifest path: identical bytes to the pre-streaming writer
        val refs = Seq.newBuilder[ManifestEntry]
        refStream(e => refs += e)
        txn.stage(dir, rev, "delta",
          Json.write(delta.copy(entries = refs.result() ++ newEntriesOut)),
          s"COMPACT $t@$rev")
      } else
        // gated path: copied-by-reference entries flow source-metafile →
        // staged file without ever being resident on the driver
        txn.stageStreaming(dir, rev, "delta", s"COMPACT $t@$rev") { out =>
          Json.writeDeltaStreaming(out, delta, emit => {
            refStream(emit); newEntriesOut.foreach(emit)
          })
        }
      txn.seal()
    } catch {
      case e: Throwable => if (!txn.isSealed) txn.abort(); throw e
    }
  }

  /**
   * Bucketed, sorted, sliced write of a resolved frame — the shared
   * materialization of the compactor and the bulk-load fast path. Shuffle
   * parallelism is decoupled from the (small) bucket count: at 100 TB a
   * numBuckets-way shuffle would put TBs in one task; the write's
   * partitionBy(Bucket) keeps the physical bucket layout regardless of how
   * many shuffle partitions feed it.
   */
  private[catalog] def materialize(
      cat: GraftCatalog, t: TableHandle, rev: Long, txnId: String,
      resolved: org.apache.spark.sql.DataFrame,
      schema: StructType, scheme: PartitionScheme, sortScheme: SortScheme,
      ct: ContentType, numBuckets: Int, maxRec: Long,
      extraAggs: Seq[org.apache.spark.sql.Column] = Nil,
      estimatedRecords: Option[Long] = None,
      encoding: Option[String] = None,
      zorder: Option[org.apache.spark.sql.Column] = None,
      writeOptions: Map[String, String] = Map.empty,
      statCols: Option[Set[String]] = None): (Seq[ManifestEntry], Long, Observation) = {
    val spark = cat.spark
    val mergeKeys = FieldMeta.mergeKeys(schema)
    val out = cat.dataDirOf(t).resolve(f"d$rev%06d__$txnId").toString
    val obs = Observation(s"materialize-${t.name}-$rev")
    // Keyless tables (append-only forced through materialize, e.g. a
    // post-rename rewrite) land in one logical bucket; parallelism still
    // comes from the slice hash below.
    val bucketExpr =
      if (mergeKeys.isEmpty) lit(0)
      else pmod(hash(mergeKeys.map(col): _*), lit(numBuckets))
    val bucketed = resolved.withColumn(Bucket, bucketExpr)
    // Z-order clustering sorts by the interleaved z-value ahead of any
    // declared sort keys, so each emitted file covers a tight
    // hyper-rectangle and footer-stats skipping works on every clustered
    // column (ZOrder doc).
    // Merge keys as the FINAL tie-break make each emitted file's row order
    // (and therefore its bytes) a pure function of its row SET: the merge
    // regime ladder feeds materialize from different upstream shapes
    // (resolve aggregate vs pass∪contested union), and without a total
    // order the same logical compaction could emit different bytes per
    // regime — gated≡driver byte-equality tests, retries, and dedup-able
    // object-store puts all want determinism here. Declared orders
    // (z-value, sort scheme) keep precedence; keys only break their ties.
    val sortCols = col(Bucket) +: (zorder.map(_.asc).toSeq ++
      sortScheme.keys.map(_.toColumn) ++
      mergeKeys.filterNot(k => sortScheme.keys.exists(_.field == k)).map(col(_).asc))
    val partCols = cat.addDerivedPartitionColumns(bucketed, scheme)
    val partNames = scheme.keys.map(_.partitionColumnName)
      .filter(partCols.columns.contains)
    val parallelism = math.max(numBuckets, spark.sparkContext.defaultParallelism)
    // Slices per bucket: enough that no task materializes more than maxRec
    // rows (known record counts from the delta metadata), capped by the
    // cluster's parallelism. Small compactions collapse to one slice (few
    // files); 100 TB inputs fan out to the full width.
    val maxSlices = math.max(1, parallelism / numBuckets)
    val slices = estimatedRecords match {
      case Some(n) => math.min(maxSlices.toLong,
        math.max(1L, (n / math.max(1L, maxRec * numBuckets)) + 1L)).toInt
      case None => maxSlices
    }
    val shaped = zorder match {
      // Keyless z-ordered tables RANGE partition on the z-value: tasks own
      // disjoint z-ranges, so files are near-disjoint hyper-rectangles
      // globally (hash slicing would give every task the full value space
      // and every file a full-range span, defeating the skip index).
      case Some(z) if mergeKeys.isEmpty =>
        partCols.repartitionByRange(parallelism, z.asc)
      // Keyless SORTED tables likewise RANGE partition on the sort keys:
      // hash slicing would hand every task a random sample of the key
      // space (each file spanning ~the whole range — no cross-file
      // skipping) or, with one slice, sort the entire rewrite on a single
      // task. Range partitioning gives globally disjoint sorted files,
      // which is the entire point of a declared sort scheme.
      case None if mergeKeys.isEmpty && !sortScheme.isEmpty =>
        partCols.repartitionByRange(parallelism, sortScheme.keys.map(_.toColumn): _*)
      case _ =>
        // Salt the slice hash: pmod(hash(keys), slices) would be arithmetically
        // correlated with the bucket expression (both mod the same hash), so
        // gcd(numBuckets, slices) > 1 — the power-of-two norm — would collapse
        // the extra parallelism back to numBuckets partitions. Keyless tables
        // slice on all columns (merge keys alone would hash a constant).
        // Keyed tables slice on (keys, partition values) — round-14: the
        // merge scope is (partition values, keys), so a hot merge KEY's
        // rows (one live row per partition value, ALL in one bucket at any
        // bucket count) are distinct rows that under keys alone would hash
        // to one slice, serializing the hot bucket's sorted write into a
        // single task. Partition values spread them across slices; the
        // slice stays a deterministic function of row values, so file
        // bytes remain a pure function of the row set.
        val sliceCols =
          if (mergeKeys.nonEmpty) (mergeKeys ++ partNames).map(col)
          else schema.fieldNames.toSeq.map(col)
        partCols.repartition(parallelism, col(Bucket),
          pmod(hash((sliceCols :+ lit("_slice")): _*), lit(slices)))
    }
    shaped
      .sortWithinPartitions(sortCols: _*)
      .observe(obs, count(lit(1)).as("n"), extraAggs: _*)
      .write.mode("overwrite")
      .format(ct.format).options(ct.writeOptions)
      .options(encoding.map("compression" -> _).toMap)
      .options(writeOptions)
      .option("maxRecordsPerFile", maxRec)
      .partitionBy((Seq(Bucket) ++ partNames): _*) match {
        case w => cat.withMicrosTimestamps(w.save(out))
      }
    val entries = cat.manifestEntriesOf(Paths.get(out), ct, statCols)
    (entries, obs.get("n").asInstanceOf[Long], obs)
  }

  /**
   * Fused bulk load: resolve + materialize in ONE shuffle. The standard
   * bulk path shuffles twice — a hash aggregate to dedupe intra-batch
   * merge keys, then the bucket/slice clustering for the sorted write.
   * But the clustering is ALREADY key-deterministic (bucket and slice both
   * hash the merge keys), so every row of a key lands in the same task and
   * intra-batch last-writer-wins reduces to: sort the task by
   * (key, recency desc) and keep the FIRST row of each key run — a lag()
   * window over the exact partitioning the write needs anyway. Halves the
   * shuffled bytes of every bulk ingest.
   *
   * Only valid when batch recency alone picks winners: complete rows (no
   * partial-upsert coalescing), no merge_order fields, no sort scheme
   * (the run sort must double as the file sort). Callers fall back to
   * resolve + [[materialize]] otherwise.
   */
  private[catalog] def materializeBulkDedupe(
      cat: GraftCatalog, t: TableHandle, rev: Long, txnId: String,
      df: org.apache.spark.sql.DataFrame,
      schema: StructType, scheme: PartitionScheme,
      ct: ContentType, numBuckets: Int, maxRec: Long,
      mergeKeys: Seq[String],
      extraAggs: Seq[org.apache.spark.sql.Column] = Nil,
      encoding: Option[String] = None,
      writeOptions: Map[String, String] = Map.empty,
      statCols: Option[Set[String]] = None): (Seq[ManifestEntry], Long, Observation) = {
    require(mergeKeys.nonEmpty, "fused bulk load needs merge keys")
    val spark = cat.spark
    val out = cat.dataDirOf(t).resolve(f"d$rev%06d__$txnId").toString
    val obs = Observation(s"materialize-${t.name}-$rev")
    val parallelism = math.max(numBuckets, spark.sparkContext.defaultParallelism)
    val slices = math.max(1, parallelism / numBuckets)
    // Row order = intra-batch recency (same contract as the two-phase path).
    val withB = df
      .withColumn(Row, monotonically_increasing_id())
      .withColumn(Bucket, pmod(hash(mergeKeys.map(col): _*), lit(numBuckets)))
    val partCols0 = cat.addDerivedPartitionColumns(withB, scheme)
    val partNames = scheme.keys.map(_.partitionColumnName)
      .filter(partCols0.columns.contains)
    // Slice on (keys, partition values), like materialize (round-14): a hot
    // merge key's rows — distinct per partition value — spread across
    // slices instead of serializing into one task. Run contiguity for the
    // lag-dedupe below is preserved: the slice is a function of exactly the
    // run key (partNames ++ mergeKeys), so all rows of one run still land
    // in the same (bucket, slice) task.
    val partCols = partCols0.withColumn("_g_slice",
      pmod(hash(((mergeKeys ++ partNames).map(col) :+ lit("_slice")): _*), lit(slices)))
    // Merge scope = partition values + merge keys (identical keys in
    // different partitions are distinct rows) — both land in the same
    // (bucket, slice) task, so runs are contiguous under the window sort.
    val runKey = struct((partNames ++ mergeKeys).map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(Bucket), col("_g_slice"))
      .orderBy((partNames ++ mergeKeys).map(col(_).asc) :+ col(Row).desc: _*)
    partCols
      .repartition(parallelism, col(Bucket), col("_g_slice"))
      .withColumn("_g_prev", lag(runKey, 1).over(w))
      .where(col("_g_prev").isNull || !(col("_g_prev") <=> runKey))
      .drop("_g_prev", "_g_slice", Row)
      .observe(obs, count(lit(1)).as("n"), extraAggs: _*)
      .write.mode("overwrite")
      .format(ct.format).options(ct.writeOptions)
      .options(encoding.map("compression" -> _).toMap)
      .options(writeOptions)
      .option("maxRecordsPerFile", maxRec)
      .partitionBy((Seq(Bucket) ++ partNames): _*) match {
        case w => cat.withMicrosTimestamps(w.save(out))
      }
    val entries = cat.manifestEntriesOf(Paths.get(out), ct, statCols)
    (entries, obs.get("n").asInstanceOf[Long], obs)
  }
}
