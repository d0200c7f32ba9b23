package graft

import org.apache.spark.sql.functions._

import graft.catalog._
import graft.model._

/** Incremental streaming source over the delta log: offsets are stream
  * positions, each micro-batch reads exactly the new deltas. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("readStream consumes appends incrementally by stream position") {
    val root = tmpDir("graft-stream")
    val cat = new GraftCatalog(spark, root)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType)))
    cat.createTable("ns.s", schema)
    cat.writeToTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "ns.s", WriteMode.Append)

    val stream = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.s").load()
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("graft_sink")
      .option("checkpointLocation", tmpDir("graft-stream-ck")).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM graft_sink").count() == 2)
      // New appends arrive as a new micro-batch.
      cat.writeToTable(Seq((3L, "c")).toDF("id", "v"), "ns.s", WriteMode.Append)
      cat.writeToTable(Seq((4L, "d")).toDF("id", "v"), "ns.s", WriteMode.Append)
      q.processAllAvailable()
      val got = spark.sql("SELECT id FROM graft_sink").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("a source over a single-version table stays on its version across a mid-stream activation") {
    val root = tmpDir("graft-stream-pin")
    val cat = new GraftCatalog(spark, root)
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.p")

    val ck = tmpDir("graft-stream-pin-ck")
    def start() = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.p").load()
      .writeStream.format("graft")
      .option("root", root).option("table", "ns.pout")
      .option("checkpointLocation", ck).start()
    def out(): Seq[Long] =
      cat.readTable("ns.pout").select("id").as[Long].collect().sorted.toSeq
    val q = start()
    try {
      q.processAllAvailable()
      assert(out() == Seq(1L))
      // activate a v2 mid-stream: its delta log is a DIFFERENT position
      // axis — the running stream must keep serving v1, not remap its
      // checkpointed offsets onto v2's log (replaying/skipping rows)
      val v2 = cat.createTableVersion("ns.p", lifecycle = Lifecycle.Active)
      cat.writeToTable(Seq((100L, "x"), (101L, "y")).toDF("id", "v"),
        s"ns.p@v$v2", WriteMode.Add)
      cat.writeToTable(Seq((2L, "b")).toDF("id", "v"), "ns.p@v1", WriteMode.Add)
      q.processAllAvailable()
      assert(out() == Seq(1L, 2L), s"stream must stay on v1, saw ${out()}")
    } finally q.stop()
    // driver restart AFTER the activation: the rebuilt source initially
    // resolves the now-active v2, but the checkpoint's offsets carry v1 —
    // recovery re-pins to v1 (schemas match), so the stream keeps
    // following v1's log instead of comparing old offsets against v2's
    val q2 = start()
    try {
      q2.processAllAvailable()
      cat.writeToTable(Seq((3L, "c")).toDF("id", "v"), "ns.p@v1", WriteMode.Add)
      q2.processAllAvailable()
      assert(out() == Seq(1L, 2L, 3L), s"restart must recover the v1 pin, saw ${out()}")
    } finally q2.stop()
    // a checkpoint whose pin file is missing (pre-pin build) but whose
    // offset WAL carries versions still recovers its axis from the WAL
    java.nio.file.Files.delete(java.nio.file.Paths.get(ck, "sources", "0", "version-pin"))
    val q3 = start()
    try {
      cat.writeToTable(Seq((4L, "d")).toDF("id", "v"), "ns.p@v1", WriteMode.Add)
      q3.processAllAvailable()
      assert(out() == Seq(1L, 2L, 3L, 4L), s"WAL recovery must re-pin v1, saw ${out()}")
    } finally q3.stop()
    // a DEPRECATED pinned version still resumes (pinned reads work);
    // only a fresh stream requires an active resolution
    cat.alterTableLifecycle("ns.p@v1", Lifecycle.Deprecated)
    val q4 = start()
    try {
      q4.processAllAvailable()
      assert(out() == Seq(1L, 2L, 3L, 4L), "deprecated pinned version must resume")
    } finally q4.stop()
  }

  test("capped AvailableNow runs stay pinned across an activation between runs") {
    // AvailableNow snapshots getOffset during PLAN INIT — before any
    // recovery getBatch — so only the persisted checkpoint pin (not
    // offset-carried adoption) keeps the second run on the right axis
    val root = tmpDir("graft-an-pin")
    val cat = new GraftCatalog(spark, root)
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.ap")
    cat.writeToTable(Seq((2L, "b")).toDF("id", "v"), "ns.ap", WriteMode.Add)
    val ck = tmpDir("graft-an-pin-ck")
    def run() = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.ap")
      .option("maxDeltasPerTrigger", "1").load()
      .writeStream.format("graft")
      .option("root", root).option("table", "ns.apout")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val q = run(); q.awaitTermination() // capped: admits ONE delta, then stops
    assert(cat.readTable("ns.apout").count() == 1)
    // a v2 activated between runs must not capture the next run
    val v2 = cat.createTableVersion("ns.ap", lifecycle = Lifecycle.Active)
    cat.writeToTable(Seq((100L, "x")).toDF("id", "v"), s"ns.ap@v$v2", WriteMode.Add)
    val q2 = run(); q2.awaitTermination() // drains v1's remaining delta
    val got = cat.readTable("ns.apout").select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L), s"second run must stay on v1, saw $got")
  }

  test("a stream offline across a REPLACE resumes at the replace content, not erased deltas") {
    val root = tmpDir("graft-stream-rep")
    val cat = new GraftCatalog(spark, root)
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.sr")
    val ck = tmpDir("graft-stream-rep-ck")
    def start() = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.sr").load()
      .writeStream.format("graft")
      .option("root", root).option("table", "ns.srout")
      .option("checkpointLocation", ck).start()
    def out(): Seq[Long] =
      cat.readTable("ns.srout").select("id").as[Long].collect().sorted.toSeq
    val q = start()
    try { q.processAllAvailable() } finally q.stop()
    assert(out() == Seq(1L))
    // while the stream is OFFLINE: an append the subsequent REPLACE
    // semantically erases, the replace itself, and a post-replace append —
    // the resumed batch must truncate at the replace marker (deltasAfter is
    // truncation-blind; getBatch owns the cut)
    cat.writeToTable(Seq((2L, "erased")).toDF("id", "v"), "ns.sr", WriteMode.Append)
    cat.writeToTable(Seq((10L, "r")).toDF("id", "v"), "ns.sr", WriteMode.Replace)
    cat.writeToTable(Seq((11L, "s")).toDF("id", "v"), "ns.sr", WriteMode.Append)
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(out() == Seq(1L, 10L, 11L),
      s"pre-replace delta leaked into the resumed stream: ${out()}")
  }

  test("merge deltas fail the stream unless ignoreChanges") {
    val root = tmpDir("graft-stream2")
    val cat = new GraftCatalog(spark, root)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType)))
    cat.createTable("ns.m", schema, properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.m", WriteMode.Merge)

    val strict = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.m").load()
      .writeStream.format("memory").queryName("graft_strict")
      .option("checkpointLocation", tmpDir("graft-stream2-ck")).start()
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      strict.processAllAvailable()
    }
    assert(failed.getCause.getMessage.contains("append-only"))

    val tolerant = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.m").option("ignoreChanges", "true").load()
      .writeStream.format("memory").queryName("graft_tolerant")
      .option("checkpointLocation", tmpDir("graft-stream2-ck2")).start()
    try {
      tolerant.processAllAvailable()
      assert(spark.sql("SELECT * FROM graft_tolerant").count() == 1)
    } finally tolerant.stop()
  }

  test("watermarked windowed rollup and stateful sessionization over a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // Watermarked hourly rollup over a memory stream.
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.hourlyRollup(events, "ts", delay = "10 minutes")
      .writeStream.format("memory").queryName("roll").outputMode("update")
      .option("checkpointLocation", tmpDir("graft-roll-ck")).start()
    try {
      in.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2.0),
        (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, total FROM roll").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 3.0)))
    } finally q.stop()

    // Stateful sessionization via flatMapGroupsWithState.
    val sIn = MemoryStream[StreamOps.Event]
    val sessions = StreamOps.sessionize(spark, sIn.toDS(), gapMillis = 60000L)
    val sq = sessions.writeStream.format("memory").queryName("sess").outputMode("append")
      .option("checkpointLocation", tmpDir("graft-sess-ck")).start()
    try {
      sIn.addData(
        StreamOps.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
        StreamOps.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:30"), "b"),
        // > 60 s gap: closes the first session within the same batch
        StreamOps.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), "c"))
      sq.processAllAvailable()
      val got = spark.sql("SELECT user_id, n_events FROM sess").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(got.toSeq == Seq((1L, 2)), s"expected first closed session, got ${got.toSeq}")
    } finally sq.stop()
  }

  test("streaming funnel: cross-batch progression, O(1) state, repeat conversions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(d: String) = java.sql.Timestamp.valueOf(d)
    val in = MemoryStream[StreamOps.Event]
    val hits = StreamOps.funnelStream(spark, in.toDS(),
      Seq("view", "click", "purchase"))
    val q = hits.writeStream.format("memory").queryName("funl").outputMode("append")
      .option("checkpointLocation", tmpDir("graft-funl-ck")).start()
    def got(): Set[(Long, Int, java.sql.Timestamp)] =
      spark.sql("SELECT user_id, step, step_ts FROM funl").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2))).toSet
    try {
      // batch 1: user 1 views (decoy purchase first must not count);
      // user 2 emits view+click OUT OF ORDER within the batch
      in.addData(
        StreamOps.Event(1L, t("2024-01-01 10:01:00"), "purchase"),
        StreamOps.Event(1L, t("2024-01-01 10:02:00"), "view"),
        StreamOps.Event(2L, t("2024-01-01 10:05:00"), "click"),
        StreamOps.Event(2L, t("2024-01-01 10:04:00"), "view"))
      q.processAllAvailable()
      assert(got() == Set((1L, 1, t("2024-01-01 10:02:00")),
        (2L, 1, t("2024-01-01 10:04:00")), (2L, 2, t("2024-01-01 10:05:00"))))
      // batch 2: user 1 completes across the batch boundary (state
      // persisted); a LATE view for user 2 predating its click is ignored
      in.addData(
        StreamOps.Event(1L, t("2024-01-01 10:03:00"), "click"),
        StreamOps.Event(1L, t("2024-01-01 10:06:00"), "purchase"),
        StreamOps.Event(2L, t("2024-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      assert(got().contains((1L, 2, t("2024-01-01 10:03:00"))))
      assert(got().contains((1L, 3, t("2024-01-01 10:06:00"))))
      assert(!got().exists(h => h._1 == 2L && h._2 == 3), "late view must not advance user 2")
      // batch 3: completed funnel resets — a repeat conversion counts again
      in.addData(
        StreamOps.Event(1L, t("2024-01-01 11:00:00"), "view"),
        StreamOps.Event(1L, t("2024-01-01 11:01:00"), "click"))
      q.processAllAvailable()
      assert(got().contains((1L, 1, t("2024-01-01 11:00:00"))), "funnel resets after completion")
      assert(got().contains((1L, 2, t("2024-01-01 11:01:00"))))
      // batch 4: SUB-MILLISECOND-spaced steps must not collapse into
      // "simultaneous" (full-microsecond comparisons, like the batch op)
      in.addData(
        StreamOps.Event(5L, t("2024-01-01 12:00:00.000100"), "view"),
        StreamOps.Event(5L, t("2024-01-01 12:00:00.000600"), "click"))
      q.processAllAvailable()
      assert(got().contains((5L, 2, t("2024-01-01 12:00:00.000600"))),
        "micro-spaced click must advance the funnel")
    } finally q.stop()

    // idle TTL: after event-time inactivity past the timeout, a user's
    // funnel state expires — the next event must restart from step 0
    val in2 = MemoryStream[StreamOps.Event]
    val q2 = StreamOps.funnelStream(spark, in2.toDS(),
      Seq("view", "click", "purchase"), idleTimeout = Some("10 minutes"))
      .writeStream.format("memory").queryName("funl_ttl").outputMode("append")
      .option("checkpointLocation", tmpDir("graft-funl-ttl-ck")).start()
    def gotTtl(): Set[(Long, Int)] =
      spark.sql("SELECT user_id, step FROM funl_ttl").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    try {
      in2.addData(StreamOps.Event(9L, t("2024-01-01 10:00:00"), "view"))
      q2.processAllAvailable()
      assert(gotTtl() == Set((9L, 1)))
      // advance the watermark far past 9's timeout via another user
      in2.addData(StreamOps.Event(8L, t("2024-01-01 11:00:00"), "view"))
      q2.processAllAvailable()
      in2.addData(StreamOps.Event(8L, t("2024-01-01 11:30:00"), "click"))
      q2.processAllAvailable()
      // user 9's state expired: a click alone cannot advance; a fresh view restarts
      in2.addData(StreamOps.Event(9L, t("2024-01-01 11:40:00"), "click"),
        StreamOps.Event(9L, t("2024-01-01 11:41:00"), "view"))
      q2.processAllAvailable()
      assert(!gotTtl().contains((9L, 2)), "expired user must not resume at step 2")
      assert(gotTtl().count(h => h._1 == 9L && h._2 == 1) == 1, "set semantics")
      val steps9 = spark.sql("SELECT step, step_ts FROM funl_ttl WHERE user_id = 9")
        .collect().map(r => r.getInt(0) -> r.getTimestamp(1)).toSet
      assert(steps9 == Set(1 -> t("2024-01-01 10:00:00"), 1 -> t("2024-01-01 11:41:00")),
        s"fresh view must restart the funnel, got $steps9")
    } finally q2.stop()
  }

  test("streaming dedup: later copies of the same content are dropped, state watermark-bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamOps.dedupStream(docs, "text", "ts", delay = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append")
      .option("checkpointLocation", tmpDir("graft-dedup-ck")).start()
    try {
      in.addData(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "alpha beta gamma"),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), "unrelated text"))
      q.processAllAvailable()
      in.addData( // same normalized content, different whitespace/case
        (3L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "ALPHA  beta gamma "),
        (4L, java.sql.Timestamp.valueOf("2024-01-01 10:06:00"), "fresh content here"))
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM dedup_stream").collect()
        .map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(1L, 2L, 4L),
        s"duplicate doc 3 must be dropped, got ${kept.toSeq}")
    } finally q.stop()
  }

  test("writeStream into a graft table: auto-create, incremental deltas, merge mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("graft-wsink")
    val cat = new GraftCatalog(spark, root)

    // Append stream into a table that does not exist yet: first batch creates it.
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "v").writeStream.format("graft")
      .option("root", root).option("table", "ns.out")
      .option("checkpointLocation", tmpDir("graft-wsink-ck")).start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(cat.readTable("ns.out").count() == 2)
      in.addData((3L, "c"))
      q.processAllAvailable()
      assert(cat.readTable("ns.out").as[(Long, String)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()

    // MERGE mode into a merge-keyed table: later batches upsert by key.
    val schema = org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType)))
    cat.createTable("ns.up", schema)
    val mIn = MemoryStream[(Long, String)]
    val mq = mIn.toDF().toDF("id", "v").writeStream.format("graft")
      .option("root", root).option("table", "ns.up").option("writeMode", "MERGE")
      .option("checkpointLocation", tmpDir("graft-wsink-ck2")).start()
    try {
      mIn.addData((1L, "a"), (2L, "b"))
      mq.processAllAvailable()
      mIn.addData((1L, "a2"))
      mq.processAllAvailable()
      assert(cat.readTable("ns.up").as[(Long, String)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "a2"), (2L, "b")))
    } finally mq.stop()
  }

  test("a sink-created table pins v1: mid-stream activation cannot split the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("graft-wsink-pin")
    val cat = new GraftCatalog(spark, root)

    val ck = tmpDir("graft-wsink-pin-ck")
    val in = MemoryStream[(Long, String)]
    def start() = in.toDF().toDF("id", "v").writeStream.format("graft")
      .option("root", root).option("table", "ns.sp")
      .option("checkpointLocation", ck).start()
    val q = start()
    val v2 = try {
      in.addData((1L, "a"))
      q.processAllAvailable() // first batch CREATES ns.sp (v1)
      assert(cat.readTable("ns.sp").count() == 1)
      // activate a v2 mid-stream: later batches must keep landing in v1
      // (and the exactly-once marker must stay in v1's metadata) — an
      // unpinned sink would see v2's missing marker and write there
      val v2 = cat.createTableVersion("ns.sp", lifecycle = Lifecycle.Active,
        properties = Some(Map.empty)) // marker-free: the case an unpinned sink would corrupt
      in.addData((2L, "b"))
      q.processAllAvailable()
      assert(cat.readTable("ns.sp@v1").as[(Long, String)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "a"), (2L, "b")))
      assert(cat.readTable(s"ns.sp@v$v2").count() == 0, "v2 must stay empty")
      assert(cat.getTableMeta("ns.sp@v1").properties.keys.exists(_.startsWith("streaming.last_batch.")))
      assert(!cat.getTableMeta(s"ns.sp@v$v2").properties.keys.exists(_.startsWith("streaming.last_batch.")))
      v2
    } finally q.stop()
    // driver restart AFTER the activation: the rebuilt sink has no
    // in-memory pin — it must recover its version from where this
    // checkpoint's marker lives, not follow active-version resolution
    val q2 = start()
    try {
      in.addData((3L, "c"))
      q2.processAllAvailable()
      assert(cat.readTable("ns.sp@v1").as[(Long, String)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
      assert(cat.readTable(s"ns.sp@v$v2").count() == 0, "v2 must stay empty across restart")
    } finally q2.stop()
    // property INHERITANCE copies the (frozen) marker into a new version;
    // recovery must still find the stream's true home — the version whose
    // marker value is highest, ties resolved to the side holding the data
    val v3 = cat.createTableVersion("ns.sp", lifecycle = Lifecycle.Active,
      properties = Some(cat.getTableMeta("ns.sp@v1").properties))
    val q3 = start()
    try {
      in.addData((4L, "d"))
      q3.processAllAvailable()
      assert(cat.readTable("ns.sp@v1").select("id").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L), "batches must keep landing in v1")
      assert(cat.readTable(s"ns.sp@v$v3").count() == 0, "v3 must stay empty")
    } finally q3.stop()
  }

  test("sink scopes its marker via session-conf checkpoint + queryName") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("graft-wsink-conf")
    val cat = new GraftCatalog(spark, root)
    spark.conf.set("spark.sql.streaming.checkpointLocation", tmpDir("graft-ckconf"))
    try {
      val in = MemoryStream[(Long, String)]
      val q = in.toDF().toDF("id", "v").writeStream.format("graft")
        .queryName("confq")
        .option("root", root).option("table", "ns.cq").start()
      try {
        in.addData((1L, "a"))
        q.processAllAvailable()
        assert(cat.readTable("ns.cq").count() == 1)
      } finally q.stop()
      // Without either an option or (conf + queryName), the sink refuses.
      spark.conf.unset("spark.sql.streaming.checkpointLocation")
      val in2 = MemoryStream[(Long, String)]
      val err = intercept[Exception] {
        in2.toDF().toDF("id", "v").writeStream.format("graft")
          .option("root", root).option("table", "ns.cq2").start()
      }
      assert(err.getMessage.contains("checkpointLocation") ||
        Option(err.getCause).exists(_.getMessage.contains("checkpointLocation")))
    } finally if (spark.conf.getOption("spark.sql.streaming.checkpointLocation").isDefined) {
      spark.conf.unset("spark.sql.streaming.checkpointLocation")
    }
  }

  test("sink batch replay after restart is idempotent (exactly-once marker)") {
    val root = tmpDir("graft-wsink-once")
    val cat = new GraftCatalog(spark, root)
    val sink = new org.apache.spark.sql.graft.GraftStreamSink(
      spark.sqlContext, root, "ns.once", WriteMode.Auto, "ck1")
    sink.addBatch(0, Seq((1L, "a")).toDF("id", "v"))
    // Same batch re-delivered (driver restart replays the last batch).
    sink.addBatch(0, Seq((1L, "a")).toDF("id", "v"))
    sink.addBatch(1, Seq((2L, "b")).toDF("id", "v"))
    assert(cat.readTable("ns.once").count() == 2)
    // A DIFFERENT query (different checkpoint key) has its own sequence.
    val other = new org.apache.spark.sql.graft.GraftStreamSink(
      spark.sqlContext, root, "ns.once", WriteMode.Auto, "ck2")
    other.addBatch(0, Seq((3L, "c")).toDF("id", "v"))
    assert(cat.readTable("ns.once").count() == 3)
  }

  test("graft-to-graft incremental streaming pipeline") {
    import org.apache.spark.sql.functions.upper
    val root = tmpDir("graft-pipe")
    val cat = new GraftCatalog(spark, root)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType)))
    cat.createTable("ns.src", schema)
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.src", WriteMode.Append)
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.src").load()
      .withColumn("v", upper(col("v")))
      .writeStream.format("graft")
      .option("root", root).option("table", "ns.dst")
      .option("checkpointLocation", tmpDir("graft-pipe-ck")).start()
    try {
      q.processAllAvailable()
      cat.writeToTable(Seq((2L, "b")).toDF("id", "v"), "ns.src", WriteMode.Append)
      q.processAllAvailable()
      assert(cat.readTable("ns.dst").as[(Long, String)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "A"), (2L, "B")))
    } finally q.stop()
  }

  test("readChanges surfaces the raw change feed after a position") {
    val cat = new GraftCatalog(spark, tmpDir("graft-cdc"))
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.c")
    val p1 = cat.deltaLog("ns.c").map(_.streamPosition).max
    cat.writeToTable(Seq((2L, "b")).toDF("id", "v"), "ns.c", WriteMode.Add)
    val changes = cat.readChanges("ns.c", afterPosition = p1)
    val rows = changes.select("id", "_delta_type").collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 2L)
    assert(rows.head.getString(1) == "ADD")
    assert(cat.readChanges("ns.c").count() == 2)
  }

  test("rowFilter option streams only matching rows and skips files by stats") {
    val root = tmpDir("graft-stream-rf")
    val cat = new GraftCatalog(spark, root)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType),
      FieldMeta.field("v", org.apache.spark.sql.types.LongType)))
    cat.createTable("ns.rf", schema,
      properties = Map("write.max_records_per_file" -> "100"))
    cat.writeToTable(spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .orderBy("id").coalesce(1), "ns.rf", WriteMode.Append)

    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.rf")
      .option("rowFilter", "id >= 420 AND id < 470").load()
      .writeStream.format("memory").queryName("graft_rf")
      .option("checkpointLocation", tmpDir("graft-stream-rf-ck")).start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT id FROM graft_rf").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == (420L until 470L))
      // a later out-of-range append contributes NOTHING (whole delta skipped)
      cat.writeToTable(spark.range(5000, 5100).select(col("id"), (col("id") * 2).as("v")),
        "ns.rf", WriteMode.Append)
      cat.writeToTable(spark.range(450, 460).select(col("id"), (col("id") * 2).as("v")),
        "ns.rf", WriteMode.Append)
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM graft_rf").head.getLong(0) == 60)
    } finally q.stop()
  }

  test("maxDeltasPerTrigger paces the backfill into multiple micro-batches") {
    val root = tmpDir("graft-stream-rate")
    val cat = new GraftCatalog(spark, root)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType)))
    cat.createTable("ns.rt", schema)
    for (i <- 0 until 5)
      cat.writeToTable(spark.range(i * 10, i * 10 + 10).toDF("id"), "ns.rt", WriteMode.Append)

    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.rt")
      .option("maxDeltasPerTrigger", "2").load()
      .writeStream.format("memory").queryName("graft_rt")
      .option("checkpointLocation", tmpDir("graft-stream-rate-ck")).start()
    try {
      q.processAllAvailable()
      // completeness: every row arrives despite pacing
      val got = spark.sql("SELECT id FROM graft_rt").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == (0L until 50L))
      // pacing: 5 deltas at ≤2/trigger = ≥3 committed micro-batches
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3, s"expected ≥3 paced batches, got $batches")
      assert(q.recentProgress.forall(_.numInputRows <= 20),
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("Trigger.AvailableNow: uncapped drains in one run; caps advance one step per run") {
    val root = tmpDir("graft-stream-an")
    val cat = new GraftCatalog(spark, root)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType)))
    cat.createTable("ns.an", schema)
    for (i <- 0 until 6)
      cat.writeToTable(spark.range(i * 10, i * 10 + 10).toDF("id"), "ns.an", WriteMode.Append)

    // Spark's v1-source AvailableNow wrapper snapshots getOffset ONCE per
    // run, so an admission cap advances exactly one capped step per run
    // (documented on the source options); repeated runs drain the log.
    val ck = tmpDir("graft-stream-an-ck")
    def run(): Long = {
      val q = spark.readStream.format("graft")
        .option("root", root).option("table", "ns.an")
        .option("maxDeltasPerTrigger", "2").load()
        .writeStream.format("parquet").option("path", s"$root/out")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query should self-terminate")
      q.stop()
      spark.read.parquet(s"$root/out").count()
    }
    assert(run() == 20L) // one capped step
    var total = 20L
    var runs = 1
    while (total < 60L && runs < 10) { total = run(); runs += 1 }
    assert(total == 60L, s"repeated AvailableNow runs must drain: $total")
    val got = spark.read.parquet(s"$root/out").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 60L))

    // uncapped AvailableNow drains everything in a single run
    val q2 = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.an").load()
      .writeStream.format("memory").queryName("graft_an_all")
      .option("checkpointLocation", tmpDir("graft-stream-an-ck2"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q2.awaitTermination(120000))
      assert(spark.sql("SELECT count(*) FROM graft_an_all").head.getLong(0) == 60L)
    } finally q2.stop()
  }

  test("maxFilesPerTrigger caps admitted files but a wide delta still progresses") {
    val root = tmpDir("graft-stream-rate2")
    val cat = new GraftCatalog(spark, root)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType)))
    // one delta sliced into ~10 files — wider than the per-trigger cap
    cat.createTable("ns.rt2", schema,
      properties = Map("write.max_records_per_file" -> "10"))
    cat.writeToTable(spark.range(0, 100).toDF("id").coalesce(1), "ns.rt2", WriteMode.Append)
    cat.writeToTable(spark.range(100, 110).toDF("id").coalesce(1), "ns.rt2", WriteMode.Append)

    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.rt2")
      .option("maxFilesPerTrigger", "3").load()
      .writeStream.format("memory").queryName("graft_rt2")
      .option("checkpointLocation", tmpDir("graft-stream-rate2-ck")).start()
    try {
      q.processAllAvailable()
      // the 10-file delta exceeds the cap but is admitted alone (progress
      // guarantee); the second delta lands in a separate batch
      assert(spark.sql("SELECT count(*) FROM graft_rt2").head.getLong(0) == 110)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    } finally q.stop()
  }

  test("an unreadable offsets log fails stream start closed — no durable pin is written") {
    val root = tmpDir("graft-stream-faily")
    val cat = new GraftCatalog(spark, root)
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.fl")
    val ck = tmpDir("graft-stream-faily-ck")
    // an offsets dir EXISTS (so the state is not provably empty) but its
    // listing fails — the simulated transient FS error
    assert(new java.io.File(ck, "offsets").mkdirs())
    spark.sparkContext.hadoopConfiguration
      .set("fs.faily.impl", classOf[FailingListFs].getName)
    def start(table: String): Unit =
      new org.apache.spark.sql.graft.GraftStreamSource(spark.sqlContext, root,
        table, false, None, None, None,
        metadataPath = Some(s"faily:$ck/sources/0"))
    // explicit pin: previously the one durable-write path open on an
    // unknown offsets state — must now refuse instead of recording the
    // user's assertion over a log it could not inspect
    val e1 = intercept[IllegalStateException](start("ns.fl@v1"))
    assert(e1.getMessage.contains("cannot inspect the checkpoint offsets log"))
    // unpinned start refuses identically
    val e2 = intercept[IllegalStateException](start("ns.fl"))
    assert(e2.getMessage.contains("refusing to record a version pin"))
    // and nothing durable was written either time
    assert(!new java.io.File(ck, "sources/0/version-pin").exists())
    // once the listing heals, the same start succeeds and pins durably
    spark.sparkContext.hadoopConfiguration.unset("fs.faily.impl")
    new org.apache.spark.sql.graft.GraftStreamSource(spark.sqlContext, root,
      "ns.fl", false, None, None, None, metadataPath = Some(s"$ck/sources/0"))
    assert(new java.io.File(ck, "sources/0/version-pin").exists())
  }

  test("a checkpoint pin for a dropped table propagates the resolution failure") {
    val root = tmpDir("graft-stream-gone")
    val cat = new GraftCatalog(spark, root)
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.gone")
    val ck = tmpDir("graft-stream-gone-ck")
    val srcDir = new java.io.File(ck, "sources/0"); assert(srcDir.mkdirs())
    java.nio.file.Files.write(srcDir.toPath.resolve("version-pin"),
      "ns.gone@v1".getBytes("UTF-8"))
    cat.dropTable("ns.gone")
    // the wrong-table / wrong-schema guards need the resolution — a start
    // failure here is retryable, a fail-open guard would not be
    intercept[Exception] {
      new org.apache.spark.sql.graft.GraftStreamSource(spark.sqlContext, root,
        "ns.gone", false, None, None, None, metadataPath = Some(srcDir.toString))
    }
  }

  test("adoptVersion corrects the durable pin, not just the in-memory one") {
    val root = tmpDir("graft-stream-adopt")
    val cat = new GraftCatalog(spark, root)
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.ad")
    cat.createTableVersion("ns.ad") // v2, same schema, not yet active
    val ck = tmpDir("graft-stream-adopt-ck")
    val srcDir = new java.io.File(ck, "sources/0")
    val src = new org.apache.spark.sql.graft.GraftStreamSource(spark.sqlContext,
      root, "ns.ad", false, None, None, None, metadataPath = Some(srcDir.toString))
    def pin(): String = new String(java.nio.file.Files.readAllBytes(
      srcDir.toPath.resolve("version-pin")), "UTF-8").trim
    assert(pin() == "ns.ad@v1") // fresh stream pinned the active version
    // recovery hands getBatch an offset recorded on v2's axis (the
    // ordering adoptVersion exists for): the pin file must follow, or
    // every later restart re-walks offset-carried adoption
    src.getBatch(None, org.apache.spark.sql.graft.VerOffset(0L, 2L))
    assert(pin() == "ns.ad@v2")
  }

  test("streaming incremental curation: quality + exact + near-dup against the standing corpus") {
    import graft.operators.{Dedup, TextOps}
    // The daily-ingest loop as ONE streaming pipeline: raw appends stream in,
    // each micro-batch is quality-gated, exact-deduped against the standing
    // curated corpus (Bloom-gated), near-deduped against the persisted
    // signature INDEX (corpus text untouched except verified candidates),
    // intra-batch deduped, then appended to the curated table + index.
    val root = tmpDir("graft-curate")
    val cat = new GraftCatalog(spark, root)
    val good1 = "the cat is on the mat and the dog is of the house and a bird sits by the door"
    val good2 = "a storm is coming over the hills and the river runs fast under the old stone bridge"
    val good3 = "the library holds a copy of the maps and the notes of the first voyage on the sea"
    cat.writeToTable(Seq(
      (1L, good1),
      (2L, "tiny text")                       // quality: too_short
    ).toDF("doc_id", "text"), "ns.raw")

    def curateBatch(batch: org.apache.spark.sql.DataFrame): Unit = {
      val ok = batch.where(TextOps.qualityBucket(col("text")) === "ok")
      val standing = cat.tableExists("ns.cur")
      val fresh =
        if (!standing) ok
        else Dedup.incrementalNew(ok, cat.readTable("ns.cur"), "doc_id", "text",
          expectedCorpusItems = 1000L)
      val noCorpusDup =
        if (!standing) fresh
        else {
          val pairs = Dedup.incrementalNearDupPairs(fresh,
            cat.readTable("ns.sig"), cat.readTable("ns.cur"), "doc_id", "text",
            threshold = 0.7, wordGrams = Some(2))
          fresh.join(pairs.select(col("id_new").as("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
        }
      val intraExact = Dedup.dropExactDuplicates(noCorpusDup, "doc_id", "text")
      val intraPairs = Dedup.minhashPairs(intraExact, "doc_id", "text",
        threshold = 0.7, wordGrams = Some(2))
      val curated = graft.operators.Par.materialize(intraExact.join(
        intraPairs.select(col("id_b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti"))
      if (curated.count() > 0) {
        cat.writeToTable(curated, "ns.cur")
        cat.writeToTable(
          Dedup.minhashSignatures(curated, "doc_id", "text", wordGrams = Some(2)),
          "ns.sig")
      }
    }

    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "ns.raw").load()
      .writeStream
      .option("checkpointLocation", tmpDir("graft-curate-ck"))
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => curateBatch(b))
      .start()
    try {
      q.processAllAvailable()
      assert(cat.readTable("ns.cur").select("doc_id").as[Long].collect().toSet == Set(1L))

      cat.writeToTable(Seq(
        (3L, good1),                          // exact dup of standing doc 1
        (4L, good1 + " today"),               // near-dup of standing doc 1
        (5L, good2)                           // fresh
      ).toDF("doc_id", "text"), "ns.raw", WriteMode.Append)
      q.processAllAvailable()
      assert(cat.readTable("ns.cur").select("doc_id").as[Long].collect().toSet ==
        Set(1L, 5L), "exact + near dup vs the standing corpus must be dropped")

      cat.writeToTable(Seq(
        (6L, good3),                          // intra-batch near-dup pair: keep 6
        (7L, good3 + " again")                // drop 7 (larger id of the pair)
      ).toDF("doc_id", "text"), "ns.raw", WriteMode.Append)
      q.processAllAvailable()
      assert(cat.readTable("ns.cur").select("doc_id").as[Long].collect().toSet ==
        Set(1L, 5L, 6L))
      // the signature index tracks the curated corpus exactly
      assert(cat.readTable("ns.sig").select("doc_id").as[Long].collect().toSet ==
        Set(1L, 5L, 6L))
    } finally q.stop()
  }
}

/** [[StreamingSpec]]'s simulated transient FS: local filesystem whose
  * directory listing of any `offsets` path throws. */
class FailingListFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("faily:///")
  override def listStatus(p: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] =
    if (p.getName == "offsets")
      throw new java.io.IOException("simulated transient listing failure")
    else super.listStatus(p)
}
