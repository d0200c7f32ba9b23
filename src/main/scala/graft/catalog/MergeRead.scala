package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._
import graft.txn.DeltaMeta

/**
 * Merge-on-read resolver: turns (compacted base + pending deltas) into the
 * logical table state with ordered upsert/delete (LSM-style) semantics.
 *
 * Reference semantics re-expressed as ONE Spark window pass (instead of the
 * reference's hash_bucket task wave -> object store -> merge task wave,
 * compute/compactor_v2/steps/{hash_bucket,merge}.py):
 *
 *  - recency order: (stream_position, file, row_index) descending — matches
 *    the reference's (stream_position, file_index, record_index) sort
 *    (merge.py:522-543 `_sort_df_envelopes`).
 *  - last-writer-wins dedupe: row_number()==1 over merge keys
 *    (compactor/steps/dedupe.py:69-98).
 *  - DELETE deltas are tombstones in the same window: if the most recent row
 *    for a key is a tombstone the key is gone; rows older than a tombstone
 *    never contribute (a running tombstone count masks them) — the v1 dedupe
 *    state machine without the driver-side loop.
 *  - partial upserts (deltas whose schema omits columns) fill omitted fields
 *    from the most recent unmasked row that physically carried the column
 *    (merge.py:256-308 `_merge_records_partially`), via
 *    first(when(present, struct(col)), ignoreNulls) over the full frame.
 *
 * Scale notes: all active files go into ONE parquet scan (stream position is
 * derived from the file path, delta type / column-presence via a broadcast
 * literal map) — so 1000 pending deltas still produce a single FileScan node
 * and a single shuffle for the window.
 */
object MergeRead {

  import Hidden._

  /** Pick the active delta set: latest compacted base + deltas beyond its
    * watermark. */
  def activeDeltas(deltas: Seq[DeltaMeta]): (Option[DeltaMeta], Seq[DeltaMeta]) = {
    val base = deltas.filter(_.compactedUpTo >= 0).sortBy(_.streamPosition).lastOption
    val watermark = base.map(_.compactedUpTo).getOrElse(-1L)
    val pending = deltas.filter(d => d.compactedUpTo < 0 && d.streamPosition > watermark)
    (base, pending)
  }

  def plan(
      spark: SparkSession,
      schema: StructType,
      scheme: PartitionScheme,
      mergeKeys: Seq[String],
      deltas: Seq[DeltaMeta],
      opts: ReadOptions,
      dataDir: String): DataFrame = {
    val (base, pending) = activeDeltas(deltas)
    val active = base.toSeq ++ pending
    val entries = active.flatMap(_.entries).map(_.path)
    val pruned = prunePaths(entries, scheme, opts)
    if (pruned.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    val needMerge = opts.mergeOnRead && mergeKeys.nonEmpty &&
      pending.exists(d => d.typed == DeltaType.Upsert || d.typed == DeltaType.Delete)

    // Lineage must cover every delta whose directory appears among the read
    // paths — copy-by-reference keeps files from *older* deltas alive inside
    // newer manifests, so the full delta log is the safe lineage superset.
    val scan = scanWithLineage(spark, schema, deltas, pruned)
    val resolved =
      if (!needMerge) scan.where(col(Dt) =!= DeltaType.Delete.name)
      else resolve(scan, schema, scheme, mergeKeys, deltas, pruned)
    val out = applyPastDefaults(resolved, schema)
    if (opts.withFilePath) out.withColumn("_file_path", col(File)) else out
  }

  /** Deltas whose physical directory (`d<rev>`) appears among `paths`. */
  def referencedDeltas(lineage: Seq[DeltaMeta], paths: Seq[String]): Seq[DeltaMeta] = {
    val revs = paths.flatMap { p =>
      val m = DirRev.findFirstMatchIn(p)
      m.map(_.group(1).toLong)
    }.toSet
    lineage.filter(d => revs.contains(d.streamPosition))
  }
  private val DirRev = "/d(\\d+)/".r

  /** One scan over all active files, with per-row lineage columns:
    * stream position (from the path), delta type and column-presence
    * (broadcast literal maps keyed by position). */
  def scanWithLineage(
      spark: SparkSession,
      schema: StructType,
      lineage: Seq[DeltaMeta],
      paths: Seq[String]): DataFrame = {
    val dtMap = lineage.map(d => d.streamPosition -> d.deltaType).toMap
    val presentMap = lineage.map { d =>
      d.streamPosition -> d.properties.get("written_columns")
        .map(_.split(",").toSeq).getOrElse(schema.fieldNames.toSeq)
    }.toMap
    spark.read.schema(schema).parquet(paths: _*)
      .withColumn(Pos, regexp_extract(col("_metadata.file_path"), "/d(\\d+)/", 1).cast(LongType))
      .withColumn(File, col("_metadata.file_path"))
      .withColumn(Row, col("_metadata.row_index"))
      .withColumn(Dt, element_at(typedLit(dtMap), col(Pos)))
      .withColumn(Present, element_at(typedLit(presentMap), col(Pos)))
  }

  /** The single-window LSM resolution described in the class doc. */
  def resolve(
      scan: DataFrame,
      schema: StructType,
      scheme: PartitionScheme,
      mergeKeys: Seq[String],
      lineage: Seq[DeltaMeta],
      paths: Seq[String]): DataFrame = {
    val active = referencedDeltas(lineage, paths)
    // Merge scope = partition values + merge keys (the reference compacts
    // within a Partition object, so identical keys in different partitions
    // are distinct rows).
    val partExprs = scheme.keys.map(k => k.column(col(k.field)))
    val winKeys: Seq[Column] = partExprs ++ mergeKeys.map(col)
    val w = Window.partitionBy(winKeys: _*)
      .orderBy(col(Pos).desc, col(File).desc, col(Row).desc)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    val isDelete = col(Dt) === DeltaType.Delete.name
    val ranked = scan
      .withColumn("_g_rn", row_number().over(w))
      .withColumn("_g_tomb",
        coalesce(sum(when(isDelete, 1L).otherwise(0L)).over(wPrev), lit(0L)))

    val fullCols = schema.fieldNames.toSet
    val allComplete = active.forall { d =>
      d.typed == DeltaType.Delete ||
        d.properties.get("written_columns").forall(_.split(",").toSet == fullCols)
    }

    if (allComplete) {
      // Fast path: every non-delete delta carried the full schema, so the
      // rank-1 row IS the resolved row.
      ranked.where(col("_g_rn") === 1 && !isDelete)
    } else {
      // Partial-upsert path: per column, first unmasked value from a row
      // that physically carried the column.
      val dataCols = schema.fields.filterNot(f => mergeKeys.contains(f.name))
      val picks = dataCols.map { f =>
        val contributes = array_contains(col(Present), f.name) &&
          !isDelete && col("_g_tomb") === 0L
        first(when(contributes, struct(col(f.name).as("v"))), ignoreNulls = true)
          .over(wAll).getField("v").as(f.name)
      }
      val keep = schema.fields.filter(f => mergeKeys.contains(f.name)).map(f => col(f.name)) ++
        picks ++ Seq(col("_g_rn"), col(Dt), col(Pos), col(File), col(Row), col(Present))
      ranked.select(keep.toIndexedSeq: _*)
        .where(col("_g_rn") === 1 && !isDelete)
    }
  }

  /** Backfill `past_default` metadata values for rows written before a field
    * existed (reference schema.py:301-311). */
  private def applyPastDefaults(df: DataFrame, schema: StructType): DataFrame = {
    val withDefaults = schema.fields.filter(f => FieldMeta.pastDefault(f).isDefined)
    if (withDefaults.isEmpty) df
    else withDefaults.foldLeft(df) { (d, f) =>
      val default = lit(FieldMeta.pastDefault(f).get).cast(f.dataType)
      d.withColumn(f.name,
        when(!array_contains(col(Present), f.name), default).otherwise(col(f.name)))
    }
  }

  /** Driver-side manifest pruning by partition values (reference
    * partition_filter, catalog/main/impl.py:1356-1386): drop files whose
    * hive-style `_g_p_<field>_<transform>=<value>` path segment contradicts
    * the requested values. Files without the segment are kept (safe). */
  def prunePaths(paths: Seq[String], scheme: PartitionScheme, opts: ReadOptions): Seq[String] =
    opts.partitionValues match {
      case None => paths
      case Some(values) =>
        val segs = values.flatMap { case (field, v) =>
          scheme.keys.find(_.field == field).map(k => (s"${k.partitionColumnName}=", v))
        }
        paths.filter { p =>
          segs.forall { case (prefix, v) =>
            val i = p.indexOf(prefix)
            i < 0 || {
              val rest = p.substring(i + prefix.length)
              val end = rest.indexOf('/')
              (if (end < 0) rest else rest.substring(0, end)) == v
            }
          }
        }
    }
}
