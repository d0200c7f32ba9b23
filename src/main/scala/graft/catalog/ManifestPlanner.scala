package graft.catalog

import java.nio.file.{Files, Path, Paths}

import com.fasterxml.jackson.core.JsonToken

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{DataType, StructType}

import graft.txn.{DeltaMeta, Json, ManifestEntry}

/**
 * Distributed manifest planning — lifts the driver-metadata ceiling on the
 * scan path (the reference materializes every manifest entry driver-side,
 * storage/model/manifest.py — fine to ~10^5 entries, fatal at 10^7; Delta
 * OSS has the same driver-snapshot ceiling).
 *
 * Mechanism, mirroring the repo's driver-below/distributed-above pattern:
 * delta metafiles are SKELETON-parsed on the driver (a streaming Jackson
 * walk that skips the entries array — O(1) heap per file however many
 * entries it holds), and the entry-level pruning that planning needs
 * (footer-stats skip + partition-value prune, the exact predicates
 * MergeRead applies) runs as a Spark job, one task per metafile. The
 * driver materializes ONLY the surviving entries, stats maps stripped
 * (they have served their purpose by then). Survivor identity is equal to
 * the driver path's by construction — both run [[StatsSkip.prune]] and the
 * same path-segment match — so the gate is purely a materialization
 * strategy, never a semantics change.
 */
object ManifestPlanner {

  /** Spark conf key: total visible manifest JSON bytes above which entry
    * planning goes distributed. Default ≈ 10^5 entries. */
  val GateConfKey = "graft.manifest.distributedPlanningBytes"
  val DefaultGateBytes: Long = 16L * 1024 * 1024

  def gateBytes(spark: SparkSession): Long =
    spark.conf.getOption(GateConfKey).map(_.toLong).getOrElse(DefaultGateBytes)

  /** Streaming skeleton parse: the DeltaMeta WITHOUT its entries (position,
    * type, txn, watermark, properties — everything lineage and active-set
    * logic need). O(1) driver heap regardless of entry count. */
  def skeleton(file: Path): DeltaMeta = {
    val p = Json.mapper.getFactory.createParser(file.toFile)
    try {
      require(p.nextToken() == JsonToken.START_OBJECT, s"$file: not a JSON object")
      var pos = 0L; var dt = ""; var txnId = ""; var upTo = -1L
      var props = Map.empty[String, String]
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        name match {
          case "streamPosition" => pos = p.getLongValue
          case "deltaType" => dt = p.getText
          case "txnId" => txnId = p.getText
          case "compactedUpTo" => upTo = p.getLongValue
          case "properties" =>
            props = Json.mapper.readValue(p, classOf[Map[String, String]])
          case _ => p.skipChildren()
        }
      }
      DeltaMeta(pos, dt, Nil, txnId, upTo, props)
    } finally p.close()
  }

  /** Stream a delta metafile's entries one at a time — the full array is
    * never resident. */
  def foreachEntry(file: Path)(f: ManifestEntry => Unit): Unit = {
    val p = Json.mapper.getFactory.createParser(file.toFile)
    try {
      require(p.nextToken() == JsonToken.START_OBJECT, s"$file: not a JSON object")
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        if (name == "entries" && p.currentToken() == JsonToken.START_ARRAY) {
          while (p.nextToken() != JsonToken.END_ARRAY)
            f(Json.mapper.readValue(p, classOf[ManifestEntry]))
        } else p.skipChildren()
      }
    } finally p.close()
  }

  /** Does `path` satisfy the hive-style partition-value segments? Same rule
    * as [[MergeRead.prunePaths]]: a missing segment keeps the file. */
  private[catalog] def matchesSegs(path: String, segs: Seq[(String, String)]): Boolean =
    segs.forall { case (prefix, v) =>
      val i = path.indexOf(prefix)
      i < 0 || {
        val rest = path.substring(i + prefix.length)
        val end = rest.indexOf('/')
        (if (end < 0) rest else rest.substring(0, end)) == v
      }
    }

  /** Distributed entry prune: one task per gated metafile streams its
    * entries and keeps survivors of the stats + partition predicates.
    * Survivors are keyed by the caller's metastore REVISION number (the
    * first tuple element, passed through verbatim — correlate on the same
    * key you pass in), stats stripped. Only entry METADATA that survives
    * pruning reaches the driver. */
  def pruneDistributed(
      spark: SparkSession,
      files: Seq[(Long, String)], // (metastore revision, absolute metafile path)
      filters: Seq[sources.Filter],
      schema: StructType,
      segs: Seq[(String, String)]): Map[Long, Seq[ManifestEntry]] = {
    if (files.isEmpty) return Map.empty
    val schemaJson = schema.json
    val filtersB = spark.sparkContext.broadcast(filters)
    val segsB = spark.sparkContext.broadcast(segs)
    spark.sparkContext
      .parallelize(files, math.min(files.size, spark.sparkContext.defaultParallelism * 2))
      .map { case (pos, path) =>
        val sc = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        val out = Seq.newBuilder[ManifestEntry]
        foreachEntry(Paths.get(path)) { e =>
          if (matchesSegs(e.path, segsB.value) &&
              StatsSkip.prune(Seq(e), filtersB.value, sc).nonEmpty)
            out += e.copy(stats = null)
        }
        (pos, out.result())
      }.collect().toMap
  }

  /** Driver-streaming LIMIT-prefix materialization (the no-predicate LIMIT
    * n case): walk deltas in apply order, stream entries, stop once n rows
    * are covered — O(prefix) heap. Keyed by the caller's revision, like
    * [[pruneDistributed]]. Returns None when the prefix rule is unsound
    * (an unknown record count), in which case the caller must fall back to
    * full streaming materialization. */
  def limitPrefixStreaming(files: Seq[(Long, String)], limit: Int)
      : Option[Map[Long, Seq[ManifestEntry]]] = {
    var acc = 0L
    var unknown = false
    val out = scala.collection.mutable.LinkedHashMap[Long, Seq[ManifestEntry]]()
    val it = files.iterator
    while (it.hasNext && acc < limit && !unknown) {
      val (pos, path) = it.next()
      val buf = Seq.newBuilder[ManifestEntry]
      foreachEntry(Paths.get(path)) { e =>
        if (e.recordCount < 0) unknown = true
        else if (acc < limit) { buf += e.copy(stats = null); acc += e.recordCount }
      }
      out(pos) = buf.result()
    }
    if (unknown) None else Some(out.toMap)
  }

  /** Full streaming materialization (no predicate to prune by): same entry
    * set as a plain parse, but stats maps stripped — the dominant share of
    * manifest heap — and no intermediate Jackson tree. */
  def materializeStreaming(files: Seq[(Long, String)]): Map[Long, Seq[ManifestEntry]] =
    files.map { case (pos, path) =>
      val buf = Seq.newBuilder[ManifestEntry]
      foreachEntry(Paths.get(path))(e => buf += e.copy(stats = null))
      (pos, buf.result())
    }.toMap
}
