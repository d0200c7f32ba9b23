package graft

import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/** Round-9 advisory fixes: one consistent NoActiveTableVersion error for
  * unpinned access to a no-active-version table, a remediable stream-sink
  * error for pinned-nonexistent targets, and a named failure (not an
  * IndexOutOfBounds crash loop) when a funnel's steps list shrinks across
  * a checkpoint restart. */
class Round9FixesSpec extends SparkSpec {
  import spark.implicits._

  test("unpinned access with live-but-inactive versions fails with ONE error everywhere") {
    val cat = new GraftCatalog(spark, tmpDir("r9-noactive"))
    val schema = StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false),
      FieldMeta.field("v", StringType)))
    cat.createTable("ns.t", schema)
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.t")
    // v2 staging version, then v1 deleted: live versions exist, none ACTIVE
    cat.createTableVersion("ns.t", lifecycle = Lifecycle.Created)
    cat.dropTable("ns.t@v1")
    // the table still EXISTS (a live version) — but default access must
    // fail with the lifecycle error, not TableNotFound/TableAlreadyExists
    assert(cat.tableExists("ns.t"))
    val e1 = intercept[NoActiveTableVersion](cat.readTable("ns.t"))
    assert(e1.getMessage.contains("ACTIVE"))
    intercept[NoActiveTableVersion](cat.getTableMeta("ns.t"))
    intercept[NoActiveTableVersion](
      cat.writeToTable(Seq((2L, "b")).toDF("id", "v"), "ns.t"))
    // remedies keep working: pin the staging version, or activate it
    cat.writeToTable(Seq((2L, "b")).toDF("id", "v"), "ns.t@v2")
    assert(cat.readTable("ns.t@v2").count() == 1)
    cat.alterTableLifecycle("ns.t@v2", Lifecycle.Active)
    assert(cat.readTable("ns.t").count() == 1)
    assert(cat.getTableMeta("ns.t").lifecycleState == Lifecycle.Active)
  }

  test("stream sink on a pinned nonexistent version fails with the remedy named") {
    val root = tmpDir("r9-pinsink")
    val sink = new org.apache.spark.sql.graft.GraftStreamSink(
      spark.sqlContext, root, "ns.pnx@v2", WriteMode.Auto, "r9ck")
    val e = intercept[IllegalArgumentException](
      sink.addBatch(0, Seq((1L, "a")).toDF("id", "v")))
    assert(e.getMessage.contains("createTableVersion") &&
      e.getMessage.contains("ns.pnx@v2"),
      s"expected the pinned-nonexistent remedy, got: ${e.getMessage}")
    // the bare name still bootstraps v1 as before
    val ok = new org.apache.spark.sql.graft.GraftStreamSink(
      spark.sqlContext, root, "ns.pnx", WriteMode.Auto, "r9ck2")
    ok.addBatch(0, Seq((1L, "a")).toDF("id", "v"))
    assert(new GraftCatalog(spark, root).readTable("ns.pnx").count() == 1)
  }

  test("alter partition scheme: mixed layouts read exactly; keyed tables need the flag") {
    import org.apache.spark.sql.functions._
    val cat = new GraftCatalog(spark, tmpDir("r9-alterps"))
    cat.createTable("ns.p", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("r", IntegerType),
      FieldMeta.field("v", StringType),
      FieldMeta.field("d", DoubleType))),
      partitionScheme = PartitionScheme(Seq(PartitionKey("r", Transform.Identity))))
    val a = (0L until 10L).map(i => (i, (i % 3).toInt, s"a$i", i * 0.5)).toDF("k", "r", "v", "d")
    val b = (10L until 20L).map(i => (i, (i % 3).toInt, s"b$i", i * 0.5)).toDF("k", "r", "v", "d")
    cat.writeToTable(a, "ns.p", WriteMode.Add)
    cat.alterTable("ns.p", partitionScheme =
      Some(PartitionScheme(Seq(PartitionKey("k", Transform.BucketIceberg(2))))))
    cat.writeToTable(b, "ns.p", WriteMode.Add)
    // full read is exact across the mixed layout
    assert(cat.readTable("ns.p").count() == 20)
    // value-based partitionFilter stays exact on BOTH layouts
    assert(cat.readTable("ns.p",
      ReadOptions(partitionFilter = Some(col("r") === 1))).count() ==
      a.union(b).where(col("r") === 1).count())
    // partitionValues prunes new-layout files and keeps old ones (superset
    // by design until re-layout)
    val bucketOf5 = graft.interop.IcebergHash.bucketLong(15L, 2)
    val pv = cat.readTable("ns.p", ReadOptions(
      partitionValues = Some(Map("k" -> bucketOf5.toString))))
    assert(pv.where(col("k") === 15L).count() == 1)
    // compact() after the alter RE-LAYS the table out under the new
    // scheme (the fold no-op would leave partitionValues a superset
    // forever) — every post-compact file carries the new segment and the
    // partitionValues read is exact again
    cat.compact("ns.p")
    val entries = cat.deltaLog("ns.p").last.entries
    assert(entries.nonEmpty && entries.forall(
      _.path.contains("_g_p_k_bucket_iceberg_2_=")),
      s"relayout must land every file under the new scheme: ${entries.map(_.path)}")
    val pv2 = cat.readTable("ns.p", ReadOptions(
      partitionValues = Some(Map("k" -> bucketOf5.toString))))
    assert(pv2.collect().forall(r =>
      graft.interop.IcebergHash.bucketLong(r.getLong(0), 2) == bucketOf5),
      "post-relayout partitionValues read must be exact")
    // a second compact copies the re-laid base by reference (tags match,
    // so the pure manifest fold returns — zero rewrites)
    val relaidPaths = entries.map(_.path).toSet
    cat.writeToTable(Seq((100L, 1, "x", 0.5)).toDF("k", "r", "v", "d"), "ns.p", WriteMode.Add)
    cat.compact("ns.p")
    val after = cat.deltaLog("ns.p").last.entries.map(_.path).toSet
    assert(relaidPaths.subsetOf(after),
      "matching scheme tag must restore the zero-rewrite fold")
    // a KEYED table refuses the scheme change without the flag (merge
    // scope changes), accepts with it
    val keyed = new GraftCatalog(spark, tmpDir("r9-alterps-k"))
    keyed.createTable("ns.m", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("r", IntegerType))),
      partitionScheme = PartitionScheme(Seq(PartitionKey("r", Transform.Identity))))
    intercept[SchemaCompatibilityError](keyed.alterTable("ns.m", partitionScheme =
      Some(PartitionScheme(Nil))))
    keyed.alterTable("ns.m", partitionScheme = Some(PartitionScheme(Nil)),
      allowIncompatibleChanges = true)
    // unknown partition field / unwritable transform / duplicate keys refuse
    intercept[IllegalArgumentException](cat.alterTable("ns.p", partitionScheme =
      Some(PartitionScheme(Seq(PartitionKey("nope", Transform.Identity))))))
    intercept[UnsupportedOperationException](cat.alterTable("ns.p", partitionScheme =
      Some(PartitionScheme(Seq(PartitionKey("d", Transform.BucketIceberg(4))))))) // over double
    intercept[IllegalArgumentException](cat.alterTable("ns.p", partitionScheme =
      Some(PartitionScheme(Seq(PartitionKey("r", Transform.Identity),
        PartitionKey("r", Transform.Identity))))))
    // partitionValues on a NON-scheme field fails fast (it would silently
    // prune nothing)
    val e = intercept[IllegalArgumentException](cat.readTable("ns.p",
      ReadOptions(partitionValues = Some(Map("r" -> "1")))).count())
    assert(e.getMessage.contains("not a partition field"))
  }

  test("BucketIceberg partition transform: spec murmur3, null-to-null, name roundtrip") {
    import org.apache.spark.sql.functions._
    // spec Appendix B vector through the full Transform surface
    val t = Transform.BucketIceberg(16)
    val got = Seq(Some(34L), None).toDF("k")
      .select(t(col("k"), LongType).as("b")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got(0).contains(graft.interop.IcebergHash.bucketLong(34L, 16)))
    assert(got(1).isEmpty, "iceberg strategy: null transforms to null (not bucket 0)")
    // the DEFAULT (sha1) strategy keeps its null-to-bucket-0 contract
    val sha = Seq(Option.empty[Long]).toDF("k")
      .select(Transform.BucketSha1(16)(col("k")).as("b")).collect().head.getInt(0)
    assert(sha == 0)
    assert(Transform.fromName("bucket_iceberg[16]") == t)
    // string + date sources hash per spec too (shared IceTransform kernel)
    val s = Seq("iceberg").toDF("k")
      .select(t(col("k"), StringType)).collect().head.getInt(0)
    assert(s == graft.interop.IcebergHash.bucketRawString("iceberg", 16))
  }

  test("funnel restart with a shorter steps list fails named, not IndexOutOfBounds") {
    import graft.streaming.StreamOps
    def t(d: String) = java.sql.Timestamp.valueOf(d)
    // a RECOVERABLE source (the graft stream source) — MemoryStream cannot
    // replay across a restart, and the memory sink refuses recovery
    val root = tmpDir("r9-funnel-root")
    val cat = new GraftCatalog(spark, root)
    cat.createTable("ns.ev", StructType(Seq(
      FieldMeta.field("user_id", LongType, nullable = false),
      FieldMeta.field("ts", TimestampType, nullable = false),
      FieldMeta.field("event_type", StringType, nullable = false))))
    cat.writeToTable(Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:01:00"), "click")).toDF("user_id", "ts", "event_type"),
      "ns.ev", WriteMode.Append)
    val ck = tmpDir("r9-funnel-ck")
    def start(steps: Seq[String]) = StreamOps.funnelStream(spark,
      spark.readStream.format("graft").option("root", root).option("table", "ns.ev")
        .load().as[StreamOps.Event],
      steps)
      .writeStream.outputMode("append")
      // the batch MUST materialize or the stateful operator never runs
      // (state-store commit validation fails with zero commits)
      .foreachBatch((ds: org.apache.spark.sql.Dataset[StreamOps.FunnelHit], _: Long) => {
        ds.collect(); ()
      })
      .option("checkpointLocation", ck).start()
    // advance user 1 to nextStep = 2 (view + click consumed), checkpoint it
    val q1 = start(Seq("view", "click", "purchase"))
    try q1.processAllAvailable() finally q1.stop()
    // restart the SAME checkpoint with ONE step: recovered nextStep=2 is
    // out of range — must fail with the steps-changed message
    cat.writeToTable(Seq((1L, t("2024-01-01 10:02:00"), "view"))
      .toDF("user_id", "ts", "event_type"), "ns.ev", WriteMode.Append)
    val q2 = start(Seq("view"))
    try {
      val e = intercept[Exception](q2.processAllAvailable())
      def causes(t0: Throwable): Seq[Throwable] =
        if (t0 == null) Nil else t0 +: causes(t0.getCause)
      assert(causes(e).exists(c => Option(c.getMessage).exists(
        _.contains("steps list changed"))),
        s"expected the steps-changed failure, got: $e")
    } finally q2.stop()
  }
}
