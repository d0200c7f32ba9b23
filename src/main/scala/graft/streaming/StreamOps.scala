package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming transforms over event streams (e.g. a Graft CHRONO table
 * consumed through the `graft` streaming source): watermarked windowed
 * rollups and custom session state via flatMapGroupsWithState — the
 * Structured-Streaming expression of the reference's event-time
 * completeness-watermark semantics (schema.py:290-295).
 */
object StreamOps {

  /** Watermarked tumbling-window rollup: (event_type, window) → count+sum.
    * Late events beyond `delay` are dropped by the watermark — the
    * streaming dual of the event-time completeness watermark. */
  def hourlyRollup(events: DataFrame, tsCol: String, delay: String = "30 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withColumn("_ts", col(tsCol).cast("timestamp"))
      .withWatermark("_ts", delay)
      .groupBy(col("event_type"), window(col("_ts"), window_))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(start: Long, lastSeen: Long, events: Int)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Int)

  /**
   * Custom session state: per-user sessions closed after `gapMillis` of
   * event-time inactivity — the KeyValueGroupedDataset
   * .flatMapGroupsWithState pattern with EVENT-time timeouts (watermark
   * driven: stale sessions flush when the watermark passes lastSeen+gap;
   * processing-time timeouts would spin continuous empty micro-batches).
   */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", s"$gapMillis milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.events))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMillis =>
                  // Late (out-of-order but within-watermark) events extend
                  // the session bounds; they must never rewind lastSeen.
                  cur = Some(s.copy(start = math.min(s.start, t),
                    lastSeen = math.max(s.lastSeen, t), events = s.events + 1))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.events)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMillis)
            }
            closed.reverseIterator
          }
      }
  }

  /**
   * Streaming exact dedup by content fingerprint: the first arrival of
   * each normalized content hash passes, later copies are dropped —
   * the streaming half of [[graft.operators.Dedup.dropExactDuplicates]]
   * for a continuously-ingesting corpus.
   *
   * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: unbounded
   * dedup state is the classic streaming-job slow death (state grows
   * with every distinct document ever seen). The watermark bounds state
   * to hashes seen within `delay` of the stream head — duplicates
   * farther apart than the watermark are the batch dedup's job
   * (run [[graft.operators.Dedup]] over the compacted table).
   */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
      delay: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", graft.operators.TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash") // output schema = input schema, like the batch op

  final case class FunnelState(nextStep: Int, lastTs: Long,
      /** Last ACTIVITY in epoch millis (monotone — an out-of-order batch
        * must never rewind the idle timeout; same rule as sessionize's
        * lastSeen). MinValue until the first event. */
      lastSeenMs: Long = Long.MinValue)
  final case class FunnelHit(user_id: Long, step: Int, step_ts: Timestamp)

  /**
   * STREAMING funnel: the real-time half of
   * [[graft.operators.Temporal.funnel]] — per-user progression through
   * `steps` emitted as it happens, with O(1) state per user (next
   * expected step + last completion time; nothing event-sized is ever
   * stored, so state is bounded by the user population, not the stream).
   *
   * Semantics: within a micro-batch events process in event-time order;
   * across batches progression is monotone — a step event is accepted iff
   * it is the next expected step AND strictly after the previous step's
   * completion. An event arriving in a LATER batch than an already-
   * accepted later step cannot retroactively rewrite the path (the batch
   * operator is the exact-reprocessing complement, same trade-off as
   * dedupStream vs the batch dedup). Completed funnels reset so repeat
   * conversions keep counting.
   */
  def funnelStream(spark: SparkSession, events: Dataset[Event],
      steps: Seq[String],
      /** Some(delay): per-user state EXPIRES after `delay` of event-time
        * inactivity — the unbounded-user guard for a forever stream; an
        * expired user must restart from step 0. None: state lives as long
        * as the user (bounded by the user population — fine when that is
        * the smaller cardinality). */
      idleTimeout: Option[String] = None,
      /** Out-of-order tolerance for the watermark the TTL path requires —
        * an INDEPENDENT knob from `idleTimeout` (lateness is an ingest
        * property, state lifetime a capacity one): a small TTL must not
        * silently start dropping routinely-late events. Ignored when
        * `idleTimeout` is None (no watermark, arbitrary in-batch
        * disorder accepted). */
      watermarkDelay: String = "10 minutes"): Dataset[FunnelHit] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import spark.implicits._
    val src = idleTimeout.fold(events)(_ => events.withWatermark("ts", watermarkDelay))
    val timeoutConf = idleTimeout.fold(GroupStateTimeout.NoTimeout())(_ =>
      GroupStateTimeout.EventTimeTimeout())
    val idleMs = idleTimeout.map(d =>
      org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(d)))
      .map { i =>
        require(i.months == 0, "idleTimeout must not use calendar months")
        i.days * 86400000L + i.microseconds / 1000L
      }
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            // A checkpoint written under a LONGER steps list can recover
            // nextStep beyond this run's list; steps(s.nextStep) would then
            // IndexOutOfBounds in a crash loop with no hint of the cause.
            if (s.nextStep >= steps.length)
              throw new IllegalStateException(
                s"recovered funnel state for user $userId has nextStep=" +
                  s"${s.nextStep} but only ${steps.length} steps are " +
                  "configured — the steps list changed across a restart; " +
                  "restart with the original list or a fresh checkpoint")
            val hits = scala.collection.mutable.ListBuffer.empty[FunnelHit]
            // FULL microsecond precision: Timestamp.getTime is millis-only,
            // and the batch funnel (oracle-checked at epoch_us) orders and
            // compares at micros — sub-millisecond-spaced steps must not
            // collapse into "simultaneous" here.
            def micros(x: Timestamp): Long = x.getTime * 1000L + (x.getNanos / 1000L) % 1000L
            batch.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
              val t = micros(e.ts)
              // monotone: an out-of-order event must never REWIND the
              // idle clock (and so re-arm an earlier timeout)
              s = s.copy(lastSeenMs = math.max(s.lastSeenMs, e.ts.getTime))
              if (e.event_type == steps(s.nextStep) && t > s.lastTs) {
                hits += FunnelHit(userId, s.nextStep + 1, e.ts)
                s = if (s.nextStep + 1 == steps.length)
                      s.copy(nextStep = 0, lastTs = t)
                    else s.copy(nextStep = s.nextStep + 1, lastTs = t)
              }
            }
            state.update(s)
            idleMs.foreach(ms =>
              if (s.lastSeenMs != Long.MinValue) state.setTimeoutTimestamp(s.lastSeenMs + ms))
            hits.iterator
          }
      }
  }
}
