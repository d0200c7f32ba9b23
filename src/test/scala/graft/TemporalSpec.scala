package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** As-of join semantics: <= matching, left-join nulls, tolerance,
  * tie-break, and the single-shuffle plan shape. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, "AAPL", ts("2024-01-01 10:00:05"), 100.0),
    (2L, "AAPL", ts("2024-01-01 10:00:00"), 101.0), // exactly at a quote
    (3L, "MSFT", ts("2024-01-01 09:59:00"), 200.0), // before any quote
    (4L, "GOOG", ts("2024-01-01 11:00:00"), 300.0)  // key with no quotes
  ).toDF("trade_id", "sym", "t_ts", "px")

  private val quotes = Seq(
    (10L, "AAPL", ts("2024-01-01 10:00:00"), 99.5),
    (11L, "AAPL", ts("2024-01-01 10:00:03"), 99.7),
    (12L, "MSFT", ts("2024-01-01 10:30:00"), 199.0)
  ).toDF("quote_id", "sym", "q_ts", "bid")

  test("asof join: <= semantics, nulls for unmatched, tie-break") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
      rightTiebreak = Some("quote_id"))
    assert(out.columns.toSeq ==
      Seq("trade_id", "sym", "t_ts", "px", "asof_quote_id", "asof_q_ts", "asof_bid"))
    val m = out.collect().map(r => r.getAs[Long]("trade_id") ->
      Option(r.getAs[java.lang.Long]("asof_quote_id")).map(_.toLong)).toMap
    assert(m(1L).contains(11L), "latest quote at/before 10:00:05 is 11")
    assert(m(2L).contains(10L), "quote exactly AT the trade ts matches (<=)")
    assert(m(3L).isEmpty, "no quote before 09:59")
    assert(m(4L).isEmpty, "key with no right rows -> null")
    assert(out.count() == 4, "left join keeps every left row")
  }

  test("asof join: tolerance drops stale matches") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
      tolerance = Some(expr("INTERVAL 1 SECOND")), rightTiebreak = Some("quote_id"))
    val m = out.collect().map(r => r.getAs[Long]("trade_id") ->
      Option(r.getAs[java.lang.Long]("asof_quote_id")).map(_.toLong)).toMap
    assert(m(1L).isEmpty, "10:00:03 quote is 2s stale under 1s tolerance")
    assert(m(2L).contains(10L), "0s gap survives tolerance")
  }

  test("asof join: null timestamps never match (SQL <= semantics)") {
    val q2 = Seq((20L, "MSFT", null.asInstanceOf[java.sql.Timestamp], 1.0))
      .toDF("quote_id", "sym", "q_ts", "bid")
      .unionByName(quotes)
    val out = Temporal.asofJoin(trades, q2, Seq("sym"), "t_ts", "q_ts",
      rightTiebreak = Some("quote_id"))
    val m = out.collect().map(r => r.getAs[Long]("trade_id") ->
      Option(r.getAs[java.lang.Long]("asof_quote_id")).map(_.toLong)).toMap
    assert(m(3L).isEmpty, "a null-ts right row must not match (null <= ts is never true)")
    assert(m(1L).contains(11L), "real matches unaffected")
  }

  test("asof join plan: one shuffle, no cross product") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not expand a cross product:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one key shuffle, got $shuffles:\n$plan")
  }

  test("funnel: strictly-ordered completion, partial funnels, out-of-order input") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    // user 1 completes all three (with decoy repeats and a purchase BEFORE
    // the click that must not count); user 2 stalls after view; user 3's
    // purchase is simultaneous with the click (strictly-after: no step 3);
    // user 4 never views (clicks alone complete nothing).
    val events = Seq(
      (1L, "purchase", ts(1)), (1L, "view", ts(2)), (1L, "view", ts(5)),
      (1L, "click", ts(4)), (1L, "purchase", ts(9)), (1L, "click", ts(7)),
      (2L, "view", ts(0)), (2L, "purchase", ts(0)),
      (3L, "view", ts(0)), (3L, "click", ts(3)), (3L, "purchase", ts(3)),
      (4L, "click", ts(1)), (4L, "purchase", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val got = Temporal.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getTimestamp(2)).toMap
    assert(got((1L, 1)) == ts(2), "step 1 = earliest view")
    assert(got((1L, 2)) == ts(4), "step 2 = earliest click after the view")
    assert(got((1L, 3)) == ts(9), "step 3 = earliest purchase after the click (t1 decoy ignored)")
    assert(got((2L, 1)) == ts(0) && !got.contains((2L, 2)),
      "purchase without a click completes nothing past step 1")
    assert(got((3L, 2)) == ts(3) && !got.contains((3L, 3)),
      "simultaneous purchase is not strictly after the click")
    assert(!got.exists(_._1._1 == 4L), "no view, no funnel")
    assert(got.size == 6) // (1,1..3), (2,1), (3,1..2)
  }

  test("cohort retention: anchor week grouping, distinct actives, pre-anchor ignored") {
    import java.sql.Timestamp
    def t(d: String) = Timestamp.valueOf(d)
    // users 1,2 sign up in the week of Mon 2024-01-01; user 3 the next week.
    // user 1 active in weeks 0 and 1 (two events in week 1 count once);
    // user 2 only week 0 (the pre-signup view must not count anywhere);
    // user 3 active in its own week 0.
    val events = Seq(
      (1L, "signup", t("2024-01-02 10:00:00")), (1L, "view", t("2024-01-03 09:00:00")),
      (1L, "click", t("2024-01-09 11:00:00")), (1L, "view", t("2024-01-09 12:00:00")),
      (2L, "view", t("2024-01-01 08:00:00")), (2L, "signup", t("2024-01-04 08:00:00")),
      (3L, "signup", t("2024-01-10 09:00:00")), (3L, "purchase", t("2024-01-10 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Temporal.cohortRetention(events, "user_id", "event_type", "ts", "signup")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w1 = t("2024-01-01 00:00:00"); val w2 = t("2024-01-08 00:00:00")
    assert(got((w1, 0L)) == 2L, "both week-1 signups active in their week 0")
    assert(got((w1, 1L)) == 1L, "only user 1 returns in week 1, counted once")
    assert(got((w2, 0L)) == 1L)
    assert(got.size == 3, s"pre-anchor activity must not create rows: $got")
  }

  test("funnel property: engine equals the in-memory reference on random event streams") {
    import java.sql.Timestamp
    val steps = Seq("view", "click", "purchase")
    val types = Vector("view", "click", "purchase", "signup", "error")
    def model(evts: Seq[(Long, String, Timestamp)]): Map[(Long, Int), Timestamp] =
      evts.groupBy(_._1).flatMap { case (u, es) =>
        // t_i = min ts of step-i events strictly after t_{i-1}: pure
        // min-chaining, order-independent, duplicate-ts safe
        var last = Long.MinValue
        steps.zipWithIndex.iterator.map { case (st, i) =>
          val cand = es.filter(e => e._2 == st && e._3.getTime > last)
          if (cand.isEmpty) None
          else { val m = cand.map(_._3.getTime).min; last = m
            Some((u, i + 1) -> new Timestamp(m)) }
        }.takeWhile(_.isDefined).flatten.toSeq
      }
    (0 until 4).foreach { trial =>
      val rnd = new scala.util.Random(500 + trial)
      val evts = (1 to 120).map { _ =>
        (rnd.nextInt(6).toLong + 1L, types(rnd.nextInt(types.length)),
          // coarse minutes force duplicate timestamps across and within users
          new Timestamp(1700000000000L + rnd.nextInt(40) * 60000L))
      }
      val got = Temporal.funnel(evts.toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", steps)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getTimestamp(2)).toMap
      assert(got == model(evts), s"trial $trial diverged")
    }
  }

  test("cohort retention property: engine equals the in-memory reference") {
    import java.sql.Timestamp
    import java.time.{Instant, ZoneOffset, DayOfWeek}
    import java.time.temporal.TemporalAdjusters
    val types = Vector("signup", "view", "click")
    def weekStart(ms: Long): Long =
      Instant.ofEpochMilli(ms).atZone(ZoneOffset.UTC).toLocalDate
        .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    def model(evts: Seq[(Long, String, Timestamp)]): Map[(Long, Long), Long] = {
      val anchor = evts.filter(_._2 == "signup").groupBy(_._1)
        .map { case (u, es) => u -> es.map(_._3.getTime).min }
      evts.flatMap { case (u, _, ts) =>
        anchor.get(u).filter(_ <= ts.getTime).map { a =>
          ((weekStart(a), (ts.getTime - a) / (7L * 86400000L)), u) }
      }.distinct.groupBy(_._1).map { case (k, us) => k -> us.size.toLong }
    }
    (0 until 4).foreach { trial =>
      val rnd = new scala.util.Random(900 + trial)
      val evts = (1 to 150).map { _ =>
        (rnd.nextInt(8).toLong + 1L, types(rnd.nextInt(types.length)),
          // whole seconds over ~5 weeks from a Wednesday epoch
          new Timestamp(1704276000000L + rnd.nextInt(3024000).toLong * 1000L))
      }
      val got = Temporal.cohortRetention(
          evts.toDF("user_id", "event_type", "ts"), "user_id", "event_type",
          "ts", "signup")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(got == model(evts), s"trial $trial diverged")
    }
  }
}
