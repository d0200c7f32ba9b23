package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink

import graft.catalog.GraftCatalog
import graft.model.WriteMode

/**
 * Structured Streaming sink into a Graft table: `df.writeStream
 * .format("graft").option("root", …).option("table", "ns.t")` — the
 * streaming dual of [[GraftStreamSource]], and the Spark-native expression
 * of the reference's continuous-ingest write path (catalog dc.write with
 * ordered stream positions, catalog/main/impl.py:226-650).
 *
 * Exactly-once: the last committed micro-batch id is persisted as a table
 * property in the SAME MVCC transaction as the batch's delta, so a replayed
 * batch after a driver restart is recognized and skipped — the data and the
 * progress marker can never diverge. The marker is scoped per checkpoint
 * (Spark's batchId sequence is per-checkpoint), so independent queries into
 * one table don't collide.
 *
 * Write-mode mapping (overridable via option `writeMode`):
 * Append → AUTO (creates the table from the stream schema on first batch;
 * merge-keyed tables upsert), Update → MERGE, Complete → REPLACE.
 *
 * Lives under org.apache.spark.sql because converting the micro-batch frame
 * (bound to the streaming IncrementalExecution) into a writable batch frame
 * requires the private[sql] `internalCreateDataFrame` — the same placement
 * as the source.
 */
class GraftStreamSink(
    sqlContext: SQLContext,
    root: String,
    table: String,
    mode: WriteMode,
    queryKey: String) extends Sink {

  private val propKey = s"streaming.last_batch.$queryKey"

  /** Version pinned at first resolution (same rationale as the source):
    * the exactly-once batch marker lives in ONE version's metadata, so a
    * mid-stream activation must not silently split the stream across two
    * versions' delta logs. A missing table resolves to its plain name
    * until the sink's first batch creates it — the create branch then
    * pins v1 directly (its creation IS v1). The pin survives driver
    * restarts because the marker itself records which version this
    * stream was writing: resolution prefers the version carrying this
    * checkpoint's marker over the currently-active one, so a restart
    * after a mid-stream activation re-finds its version instead of
    * splitting the stream. Writing to a later-deprecated pinned version
    * fails loudly. */
  @volatile private var pinned: String = null
  private def pin(cat: GraftCatalog): String = {
    val p = pinned
    if (p != null) return p
    val resolved = cat.resolveTableName(table)
    val h = graft.catalog.TableHandle.parse(resolved)
    // only a versioned resolution is a durable pin; a bare name means
    // the table does not exist yet (do not cache — pin on creation)
    if (h.version.isEmpty) return resolved
    // an EXPLICIT user pin in the table option always wins — recovery
    // must not redirect a deliberately version-addressed stream
    if (graft.catalog.TableHandle.parse(table).version.isDefined) {
      pinned = resolved
      return resolved
    }
    // restart recovery: this checkpoint's marker records which version the
    // stream was writing, and it may no longer be the active one (activated
    // mid-stream, then the driver restarted) — keep writing THERE. Only a
    // missing version means "no marker"; any other failure is an infra
    // error that must fail the batch (retryable), or a transient would
    // silently pin the wrong version.
    def markerOf(name: String): Option[Long] =
      try cat.getTableMeta(name).properties.get(propKey).map(_.toLong)
      catch { case _: graft.catalog.TableNotFound => None }
    val bare = h.copy(version = None)
    val carriers = cat.listTableVersions(bare.toString).flatMap { case (v, _) =>
      markerOf(bare.copy(version = Some(v)).toString).map(m => (v, m))
    }
    // createTableVersion's property inheritance can COPY the marker into a
    // new version, where it freezes while the pinned stream's own marker
    // keeps advancing — so the stream's true version is the one with the
    // HIGHEST marker value; a tie (no batch since inheritance) keeps the
    // lowest version id, which is the side that actually holds the data
    val target = carriers match {
      case Seq() => resolved // fresh stream: the active version it is
      case cs =>
        val v = cs.maxBy { case (v, m) => (m, -v) }._1
        bare.copy(version = Some(v)).toString
    }
    pinned = target
    target
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = sqlContext.sparkSession
    val cat = new GraftCatalog(spark, root)
    var table = pin(cat) // shadow: every access below targets the pin
    var exists = cat.tableExists(table)
    if (exists && pinned == null) {
      // the table appeared between resolution and the existence check
      // (another writer created it) — re-resolve so this batch is pinned
      // too, instead of running one batch against the bare name
      table = pin(cat)
      exists = cat.tableExists(table)
    }
    if (exists) {
      val last = cat.getTableMeta(table).properties.get(propKey).map(_.toLong).getOrElse(-1L)
      if (batchId <= last) return // replayed batch after restart — already durable
    }
    // Rebind the micro-batch rows to a plain batch frame (the incoming frame
    // is owned by the streaming execution and cannot be written directly).
    val batch = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(data.queryExecution.toRdd, data.schema)
    if (!exists) {
      // A version-pinned target that does not exist can never bootstrap
      // here (createTable takes bare names and would reject it with no
      // streaming context) — fail with the remedy spelled out.
      if (graft.catalog.TableHandle.parse(table).version.isDefined)
        throw new IllegalArgumentException(
          s"stream sink targets pinned version '$table', which does not " +
            "exist — create the version first (createTableVersion) or use " +
            "the bare table name to let the sink create v1")
      // First batch creates the table; the marker property rides the same
      // transaction via createTable's property map.
      val tx = cat.transaction(s"stream batch $batchId -> $table (create)")
      try {
        val h = cat.createTable(table, data.schema,
          properties = Map(propKey -> batchId.toString), txn = Some(tx))
        cat.writeToTable(batch, table,
          if (mode == WriteMode.Auto) WriteMode.Add else mode, Some(tx))
        tx.seal()
        // the table this sink just created IS v1 — pin it deterministically
        // (re-resolving could land on a version someone activated since)
        pinned = h.copy(version = Some(1L)).toString
      } catch { case e: Throwable => tx.abort(); throw e }
    } else {
      // Marker first, data second: writeToTable resolves table meta with
      // read-your-writes inside the transaction, so a schema-evolving batch
      // stages its widened schema ON TOP of the marker update.
      val tx = cat.transaction(s"stream batch $batchId -> $table")
      try {
        cat.alterTable(table, setProperties = Map(propKey -> batchId.toString), txn = Some(tx))
        cat.writeToTable(batch, table, mode, Some(tx))
        tx.seal()
      } catch { case e: Throwable => tx.abort(); throw e }
    }
    // Same post-commit policy as batch writes: losing a compaction race to a
    // concurrent writer is benign.
    try cat.maybeAutoCompact(table)
    catch { case _: graft.txn.ConcurrentTxnConflict => () }
  }

  override def toString: String = s"GraftStreamSink[$table]"
}
