package graft.interop

import java.time.{LocalDateTime, OffsetDateTime, ZoneOffset}

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types._

import graft.catalog.StatCodec
import graft.txn.ColStat

/**
 * Delta Lake per-file statistics (PROTOCOL.md "Per-file Statistics"): the
 * add action's `stats` JSON string with numRecords / minValues / maxValues /
 * nullCount. The write side renders Graft's canonical footer stats
 * (FooterStats) into the protocol's typed-JSON values so FOREIGN Delta
 * readers can data-skip our tables; the read side parses foreign writers'
 * stats back into canonical [[ColStat]]s so OUR reads data-skip theirs.
 * Both directions are best-effort: unparseable values simply drop the
 * column from the skip index (a missing stat can only cost performance,
 * never correctness).
 */
object DeltaStats {

  private def mapper = graft.txn.Json.mapper

  /** Render (numRecords, canonical stats) as the protocol stats JSON.
    * `fields` are the DATA columns as physically written (stats keys use
    * physical names under column mapping, matching the parquet footer). */
  def json(rows: Long, stats: Map[String, ColStat], fields: Seq[StructField]): String = {
    val root = mapper.createObjectNode()
    root.put("numRecords", rows)
    val mins = mapper.createObjectNode()
    val maxs = mapper.createObjectNode()
    val nulls = mapper.createObjectNode()
    fields.foreach { f =>
      stats.get(f.name).foreach { st =>
        if (st.nulls >= 0) nulls.put(f.name, st.nulls)
        if (st.min != null) setTyped(mins, f.name, f.dataType, st.min)
        if (st.max != null) setTyped(maxs, f.name, f.dataType, st.max)
      }
    }
    if (mins.size() > 0) root.set[JsonNode]("minValues", mins)
    if (maxs.size() > 0) root.set[JsonNode]("maxValues", maxs)
    if (nulls.size() > 0) root.set[JsonNode]("nullCount", nulls)
    mapper.writeValueAsString(root)
  }

  private def setTyped(o: ObjectNode, name: String, dt: DataType, canonical: String): Unit =
    try dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        o.put(name, new java.math.BigDecimal(canonical).longValueExact)
      case FloatType | DoubleType => o.put(name, canonical.toDouble)
      case _: DecimalType =>
        o.set[JsonNode](name, mapper.getNodeFactory.numberNode(new java.math.BigDecimal(canonical)))
      case StringType | DateType => o.put(name, canonical)
      case BooleanType => o.put(name, canonical.toBoolean)
      case TimestampType => o.put(name, canonical.replace(' ', 'T') + "Z")
      case TimestampNTZType => o.put(name, canonical.replace(' ', 'T'))
      case _ => ()
    } catch { case _: Exception => () }

  /** Parse a stats JSON (ours or a foreign writer's) into (numRecords,
    * LOGICAL-name → canonical ColStat). None = unusable. */
  def parse(statsJson: String,
      fields: Seq[(String, String, DataType)]): Option[(Long, Map[String, ColStat])] =
    try {
      val root = mapper.readTree(statsJson)
      val rows = if (root.has("numRecords")) root.get("numRecords").asLong(-1L) else -1L
      val mins = root.path("minValues")
      val maxs = root.path("maxValues")
      val nulls = root.path("nullCount")
      val m = fields.flatMap { case (logical, physical, dt) =>
        val mn = canonical(mins.path(physical), dt)
        val mx = canonical(maxs.path(physical), dt)
        val nc = if (nulls.path(physical).isNumber) nulls.get(physical).asLong(-1L) else -1L
        if (mn.isEmpty && mx.isEmpty && nc < 0) None
        // keep a one-sided bound only if BOTH sides parsed or the column is
        // provably all-null — a bound missing because parsing failed must
        // not masquerade as "unbounded on one side only"
        else if (mn.isDefined != mx.isDefined) {
          if (nc >= 0) Some(logical -> ColStat(null, null, nc)) else None
        } else Some(logical -> ColStat(mn.orNull, mx.orNull, nc))
      }.toMap
      if (m.isEmpty && rows < 0) None else Some((rows, m))
    } catch { case _: Exception => None }

  /** Foreign typed-JSON stat value → StatCodec canonical string. */
  private def canonical(n: JsonNode, dt: DataType): Option[String] = {
    if (n == null || n.isMissingNode || n.isNull) return None
    try dt match {
      // Floating-point bounds from FOREIGN writers are untrusted: the Delta
      // protocol excludes NaN from minValues/maxValues while Spark orders
      // NaN above everything, so a range skip could drop a file whose NaN
      // rows match. (Our own write side NaN-drops the whole column, which
      // is why bounds WE wrote are safe — but we cannot tell authorship.)
      case FloatType | DoubleType => None
      case _: NumericType =>
        val t = n.asText()
        new java.math.BigDecimal(t); Some(t)
      case StringType => Some(n.asText()).filter(_.length <= StatCodec.MaxLen)
      case BooleanType => Some(n.asBoolean().toString)
      case DateType =>
        Some(java.time.LocalDate.parse(n.asText()).toString)
      case TimestampType | TimestampNTZType => parseTs(n.asText())
      case _ => None
    } catch { case _: Exception => None }
  }

  /** ISO-ish timestamp spellings foreign writers use ("…T…Z", offset,
    * space-separated, second- or nano-precision) → canonical. */
  private def parseTs(s: String): Option[String] = {
    val t = s.trim
    def fmt(ldt: LocalDateTime): Option[String] =
      StatCodec.formatMicros(ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L)
    try fmt(OffsetDateTime.parse(t).withOffsetSameInstant(ZoneOffset.UTC).toLocalDateTime)
    catch { case _: Exception =>
      try fmt(LocalDateTime.parse(t.replace(' ', 'T').stripSuffix("Z")))
      catch { case _: Exception => None }
    }
  }
}
