package graft.spark

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.GraftCatalog

/**
 * SQL stored procedures for the Graft catalog (Spark 4 ProcedureCatalog —
 * the `CALL cat.system.<proc>(…)` surface Iceberg popularized):
 *
 *   CALL g.system.compact(`table` => 'ns.t' [, num_buckets => 16])
 *   CALL g.system.analyze(`table` => 'ns.t')     -- stats backfill
 *   CALL g.system.zorder(`table` => 'ns.t', columns => 'x,y')
 *   CALL g.system.janitor([timeout_ms => …])     -- fail+sweep stale txns
 *   CALL g.system.trim_history(`table` => 'ns.t' [, retention_ms => …])
 *   CALL g.system.vacuum(`table` => 'ns.t' [, dry_run => true]
 *                        [, min_age_ms => …])   -- reclaim forfeited files
 *
 * Each returns one summary row. Maintenance operations deliberately run
 * through the same public catalog APIs the programmatic surface uses.
 */
object GraftProcedures {

  val Namespace: Array[String] = Array("system")
  val Names: Seq[String] =
    Seq("compact", "analyze", "zorder", "janitor", "estimate",
      "trim_history", "vacuum")

  def load(root: String, ident: Identifier): Option[UnboundProcedure] =
    if (!ident.namespace().sameElements(Namespace)) None
    else Names.find(_ == ident.name()).map(n => new GraftUnboundProcedure(root, n))

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Namespace))
      Names.map(Identifier.of(Namespace, _)).toArray
    else Array.empty

  private def in(name: String, dt: DataType) = ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType, dflt: String) =
    ProcedureParameter.in(name, dt).defaultValue(dflt).build()

  private final class GraftUnboundProcedure(root: String, proc: String)
      extends UnboundProcedure {
    override def name(): String = proc
    override def description(): String = proc match {
      case "compact" => "resolve pending deltas into a read-optimized bucketed snapshot"
      case "analyze" => "backfill the per-file column-stats skip index (metadata-only)"
      case "zorder" => "set compaction.zorder and recluster the table"
      case "janitor" => "fail timed-out transactions and sweep their staged files"
      case "estimate" => "estimate the in-memory resources to process a table (manifest metadata only)"
      case "trim_history" => "delete folded pre-watermark metafiles once the base outlives retention"
      case "vacuum" => "reclaim data files forfeited by trim_history (straggler-margin gated; dry_run previews)"
    }
    override def bind(inputType: StructType): BoundProcedure =
      new GraftBoundProcedure(root, proc)
  }

  private final class GraftBoundProcedure(root: String, proc: String)
      extends BoundProcedure {
    override def name(): String = proc
    override def description(): String = proc
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = proc match {
      case "compact" => Array(in("table", StringType),
        inDefault("num_buckets", IntegerType, "0"))
      case "analyze" => Array(in("table", StringType))
      case "zorder" => Array(in("table", StringType), in("columns", StringType))
      case "janitor" => Array(
        inDefault("timeout_ms", LongType, (24L * 3600 * 1000).toString))
      case "estimate" => Array(in("table", StringType))
      case "trim_history" => Array(in("table", StringType),
        inDefault("retention_ms", LongType, (7L * 24 * 3600 * 1000).toString))
      case "vacuum" => Array(in("table", StringType),
        inDefault("dry_run", BooleanType, "false"),
        // -1 = resolve from the vacuum.min.age.millis property / default
        inDefault("min_age_ms", LongType, "-1"))
    }

    override def call(input: InternalRow): JIterator[Scan] = {
      val cat = new GraftCatalog(SparkSession.active, root)
      val msg = proc match {
        case "compact" =>
          val t = input.getUTF8String(0).toString
          cat.compact(t, input.getInt(1))
          s"compacted $t"
        case "analyze" =>
          val t = input.getUTF8String(0).toString
          val n = cat.analyzeTable(t)
          s"backfilled stats for $n file(s) of $t"
        case "zorder" =>
          val t = input.getUTF8String(0).toString
          val cols = input.getUTF8String(1).toString
          cat.alterTable(t, setProperties = Map(graft.catalog.ZOrder.Prop -> cols))
          cat.compact(t)
          s"z-ordered $t by $cols"
        case "janitor" =>
          // through the public wrapper, same as the programmatic surface
          val (failed, removed) = cat.janitor(input.getLong(0))
          s"failed $failed stale txn(s), removed $removed file(s)"
        case "estimate" =>
          val t = input.getUTF8String(0).toString
          val e = cat.estimateResources(t)
          s"$t: ~${e.memoryBytes.toLong} bytes in memory / ${e.onDiskBytes} on disk, " +
            s"${e.records} rows in ${e.files} file(s) via ${e.methodsUsed.keys.mkString("+")}"
        case "trim_history" =>
          val t = input.getUTF8String(0).toString
          val n = cat.trimHistory(t, input.getLong(1))
          s"trimmed $n metafile(s) of $t"
        case "vacuum" =>
          val t = input.getUTF8String(0).toString
          val dry = input.getBoolean(1)
          val age = input.getLong(2) match { case -1L => None; case v => Some(v) }
          val n = cat.vacuumTable(t, dryRun = dry, minAgeMillis = age)
          if (dry) s"vacuum would reclaim $n file(s) of $t"
          else s"vacuum reclaimed $n file(s) of $t"
      }
      java.util.Collections.singletonList[Scan](new MessageScan(msg)).iterator()
    }
  }

  private final class MessageScan(msg: String) extends LocalScan {
    override def readSchema(): StructType =
      StructType(Seq(StructField("result", StringType, nullable = false)))
    override def rows(): Array[InternalRow] =
      Array(InternalRow(UTF8String.fromString(msg)))
  }
}
