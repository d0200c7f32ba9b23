package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._
import graft.txn.ColStat

/** Per-file footer stats + planning-time data skipping (FileStats.scala). */
class FileStatsSpec extends SparkSpec {
  import spark.implicits._

  private def newCatalog(): GraftCatalog = new GraftCatalog(spark, tmpDir("graft-stats"))

  // --------------------------------------------------- footer extraction

  test("footer stats: min/max/nulls per column, merged across row groups") {
    val dir = tmpDir("fs-footer")
    val df = spark.range(0, 1000).select(
      col("id"),
      (col("id") * 2).cast("int").as("i"),
      (col("id") / 10.0).as("d"),
      concat(lit("k"), format_string("%04d", col("id"))).as("s"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).as("withnulls"),
      date_add(lit(Date.valueOf("2024-01-01")), col("id").cast("int")).as("dt"),
      timestamp_micros(col("id") * 1000000L).as("ts"))
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", "4096") // force multiple row groups
      .parquet(dir)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    val f = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val (rows, stats) = FooterStats.read(f, spark.sessionState.newHadoopConf())
    assert(rows == 1000)
    assert(stats("id") == ColStat("0", "999", 0))
    assert(stats("i") == ColStat("0", "1998", 0))
    // parquet writers record double min as -0.0 (spec-recommended) — the
    // codec compares decimally, so -0.0 == 0.
    assert(BigDecimal(stats("d").min) == 0 && stats("d").max == "99.9")
    assert(stats("s") == ColStat("k0000", "k0999", 0))
    assert(stats("withnulls") == ColStat("1", "999", 100))
    assert(stats("dt") == ColStat("2024-01-01", "2026-09-26", 0))
    assert(stats("ts").min == "1970-01-01 00:00:00.000000")
    assert(stats("ts").max == "1970-01-01 00:16:39.000000")
  }

  // --------------------------------------------------- skip decisions

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType),
    StructField("s", StringType), StructField("dt", DateType),
    StructField("ts", TimestampType)))
  private val st = Map(
    "k" -> ColStat("100", "200", 0),
    "v" -> ColStat("1.5", "9.25", 3),
    "s" -> ColStat("banana", "cherry", 0),
    "dt" -> ColStat("2024-03-01", "2024-06-30", 0),
    "ts" -> ColStat("2024-03-01 00:00:00.000000", "2024-06-30 12:00:00.000000", 0))
  private def keep(f: Filter): Boolean = StatsSkip.keep(f, schema, st, 50)

  test("skip decisions: ranges, equality, null checks, prefixes, boolean ops") {
    assert(!keep(EqualTo("k", 99L)) && keep(EqualTo("k", 100L)) && keep(EqualTo("k", 150)))
    assert(!keep(GreaterThan("k", 200L)) && keep(GreaterThanOrEqual("k", 200L)))
    assert(!keep(LessThan("k", 100L)) && keep(LessThanOrEqual("k", 100L)))
    assert(!keep(In("k", Array(1L, 5L, 99L))) && keep(In("k", Array(1L, 150L))))
    // cross-type literal: int literal against double column
    assert(!keep(GreaterThan("v", 10)) && keep(GreaterThan("v", 9)))
    assert(!keep(IsNull("k")) && keep(IsNull("v")))
    assert(keep(IsNotNull("v")) && keep(IsNotNull("k")))
    // strings: range + prefix
    assert(!keep(EqualTo("s", "apple")) && keep(EqualTo("s", "blueberry")))
    assert(!keep(StringStartsWith("s", "az")) && keep(StringStartsWith("s", "ba")))
    assert(!keep(StringStartsWith("s", "d")) && keep(StringStartsWith("s", "c")))
    // dates / timestamps via external JVM literal types
    assert(!keep(LessThan("dt", Date.valueOf("2024-03-01"))))
    assert(keep(LessThanOrEqual("dt", Date.valueOf("2024-03-01"))))
    assert(!keep(GreaterThan("ts", Timestamp.valueOf("2024-06-30 12:00:00"))))
    assert(keep(GreaterThan("ts", Timestamp.valueOf("2024-06-30 11:59:59"))))
    // boolean composition: one provably-empty conjunct skips the file
    assert(!keep(And(GreaterThan("k", 250L), LessThan("k", 300L))))
    assert(keep(And(GreaterThan("k", 150L), LessThan("k", 180L))))
    assert(keep(Or(GreaterThan("k", 250L), EqualTo("s", "cat"))))
    assert(!keep(Or(GreaterThan("k", 250L), EqualTo("s", "zebra"))))
    // unknown column / unsupported filter: keep
    assert(keep(EqualTo("nope", 1)) && keep(Not(EqualTo("k", 1L))))
  }

  test("all-null column skips comparisons and IsNotNull") {
    val s2 = Map("v" -> ColStat(null, null, 50))
    assert(!StatsSkip.keep(EqualTo("v", 1.0), schema, s2, 50))
    assert(!StatsSkip.keep(IsNotNull("v"), schema, s2, 50))
    assert(StatsSkip.keep(IsNull("v"), schema, s2, 50))
    // unknown bounds, nulls unknown: everything keeps
    val s3 = Map("v" -> ColStat(null, null, -1))
    assert(StatsSkip.keep(EqualTo("v", 1.0), schema, s3, 50))
    assert(StatsSkip.keep(IsNotNull("v"), schema, s3, 50))
  }

  test("column rowFilter translates to pruning filters incl. literal-first and Or") {
    val fs = StatsSkip.translate(
      col("k") > 5 && lit(3) < col("v") && (col("s") === "x" || col("s").startsWith("y")) &&
        col("k").isin(1, 2) && col("v").isNotNull && abs(col("v")) < 2)
    assert(fs.contains(GreaterThan("k", 5)))
    assert(fs.contains(GreaterThan("v", 3)))
    assert(fs.contains(Or(EqualTo("s", "x"), StringStartsWith("s", "y"))))
    assert(fs.contains(In("k", Array(1, 2))))
    assert(fs.contains(IsNotNull("v")))
    assert(fs.size == 5) // abs(v) < 2 is untranslatable and dropped
  }

  // --------------------------------------------------- end-to-end skipping

  test("readTable rowFilter skips files at planning (sorted table)") {
    val cat = newCatalog()
    cat.createTable("q.t", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("v", StringType))),
      properties = Map("write.max_records_per_file" -> "100"))
    val df = spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")).orderBy("k").coalesce(1)
    cat.writeToTable(df, "q.t")
    val all = cat.readTable("q.t")
    assert(all.inputFiles.length >= 10)
    val filtered = cat.readTable("q.t",
      ReadOptions(rowFilter = Some(col("k") >= 420 && col("k") < 470)))
    assert(filtered.inputFiles.length <= 2)
    assert(filtered.count() == 50)
    assert(filtered.agg(min("k"), max("k")).as[(Long, Long)].head() == ((420L, 469L)))
    // disjoint range: zero files planned, empty result
    val none = cat.readTable("q.t", ReadOptions(rowFilter = Some(col("k") > 5000)))
    assert(none.count() == 0)
  }

  test("merge-on-read: value filters never prune pending/base files (no resurrection)") {
    val cat = newCatalog()
    cat.createTable("q.m", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("score", LongType))),
      properties = Map("read_optimization" -> "NONE"))
    // Base: id 0-99 score=id (sorted, one file). Upsert moves id 10's score
    // to 1000 — OUT of the filter range below.
    cat.writeToTable(spark.range(0, 100).select(col("id"), col("id").as("score")),
      "q.m", WriteMode.Merge)
    cat.writeToTable(Seq((10L, 1000L)).toDF("id", "score"), "q.m", WriteMode.Merge)
    val got = cat.readTable("q.m", ReadOptions(rowFilter = Some(col("score") < 50)))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // id 10 must NOT appear with its stale base score of 10.
    assert(!got.exists(_._1 == 10L))
    assert(got.size == 49 && got.forall(r => r._2 == r._1))
    // key filters DO prune under merge-on-read and stay correct.
    val keyed = cat.readTable("q.m", ReadOptions(rowFilter = Some(col("id") === 10)))
      .as[(Long, Long)].collect().toSeq
    assert(keyed == Seq((10L, 1000L)))
  }

  test("DSv2 SQL WHERE skips files via pushed filters") {
    val root = tmpDir("graft-dsv2-skip")
    val cat = new GraftCatalog(spark, root)
    cat.createTable("q.s", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("v", StringType))),
      properties = Map("write.max_records_per_file" -> "100"))
    cat.writeToTable(spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")).orderBy("k").coalesce(1), "q.s")
    graft.spark.StatsPruningScanBuilder.resetFor("q.s")
    val got = spark.read.format("graft").option("root", root).option("table", "q.s")
      .load().where(col("k") >= 420 && col("k") < 470)
    assert(got.count() == 50)
    val (total, kept) = graft.spark.StatsPruningScanBuilder.lastPruneFor("q.s")
    assert(total >= 10 && kept <= 2, s"expected file pruning, got $total -> $kept")
  }

  test("all-null leading row group keeps the numeric merge kind (review fix)") {
    val dir = tmpDir("fs-nullfirst")
    // sorted so the FIRST row groups are entirely null, later ones carry
    // values spanning a decimal-vs-bytes-divergent range (9 vs 85)
    val df = spark.range(0, 3000).select(col("id"),
      when(col("id") < 1500, lit(null))
        .otherwise(when(col("id") < 2000, col("id") % 2 + 9).otherwise(col("id") % 16 + 85))
        .as("x"))
      .orderBy("id").coalesce(1)
    df.write.mode("overwrite").option("parquet.block.size", "1024").parquet(dir)
    val f = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val (_, stats) = FooterStats.read(f, spark.sessionState.newHadoopConf())
    // byte-wise merge would report min "10" > "100"-style garbage ("85" < "9")
    assert(BigDecimal(stats("x").min) == 9 && BigDecimal(stats("x").max) == 100,
      s"got ${stats("x")}")
  }

  test("string timestamp literal skips in the SESSION timezone (review fix)") {
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val cat = newCatalog()
      cat.createTable("q.tz", StructType(Seq(
        FieldMeta.field("ts", TimestampType), FieldMeta.field("k", LongType))),
        properties = Map("write.max_records_per_file" -> "100"))
      // instants 2024-01-01T00:00Z .. +1000h
      cat.writeToTable(spark.range(0, 1000).select(
        timestamp_seconds(lit(1704067200L) + col("id") * 3600).as("ts"), col("id").as("k"))
        .orderBy("k").coalesce(1), "q.tz")
      // string literal is interpreted in session tz (= UTC-8): compare the
      // rowFilter result against Spark's own evaluation of the same filter
      val pred = col("ts") < "2024-01-05 00:00:00"
      val got = cat.readTable("q.tz", ReadOptions(rowFilter = Some(pred))).count()
      val want = cat.readTable("q.tz").where(pred).count()
      assert(got == want, s"skip-pruned read $got != unpruned $want")
      assert(want == 4 * 24 + 8) // 4 days + the 8h offset
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("float bounds use Spark's widened comparison (review fix)") {
    val dir = tmpDir("fs-float")
    spark.range(0, 10).select(lit(0.1f).as("f")).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val f = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val (rows, stats) = FooterStats.read(f, spark.sessionState.newHadoopConf())
    val sch = StructType(Seq(StructField("f", FloatType)))
    // 0.1f widens to 0.100000001490…, which IS > 0.100000001 — the file
    // must be kept (a narrow "0.1" rendering would wrongly skip it)
    assert(StatsSkip.keep(GreaterThan("f", 0.100000001d), sch, stats, rows))
    assert(!StatsSkip.keep(GreaterThan("f", 0.11d), sch, stats, rows))
  }

  test("stats.columns narrows the skip index to the listed columns") {
    val cat = newCatalog()
    cat.createTable("q.n", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("wide", StringType))),
      properties = Map("stats.columns" -> "k"))
    cat.writeToTable(spark.range(0, 100).select(col("id").as("k"),
      concat(lit("w"), col("id")).as("wide")), "q.n")
    val st = cat.deltaLog("q.n").flatMap(_.entries).head.colStats
    assert(st.contains("k") && !st.contains("wide"))
  }

  test("write.bloom.columns emits parquet bloom filters in data files") {
    val cat = newCatalog()
    cat.createTable("q.b", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("v", StringType))),
      properties = Map("write.bloom.columns" -> "k"))
    cat.writeToTable(spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")), "q.b")
    val f = cat.deltaLog("q.b").flatMap(_.entries).head.path
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f), spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val cols = r.getFooter.getBlocks.get(0).getColumns
      import scala.collection.JavaConverters._
      val byName = cols.asScala.map(c => c.getPath.toArray.mkString(".") -> c).toMap
      assert(byName("k").getBloomFilterOffset >= 0, "k should carry a bloom filter")
      assert(byName("v").getBloomFilterOffset < 0, "v should not")
    } finally r.close()
  }

  test("analyzeTable backfills the skip index metadata-only; fileStatsTable exposes it") {
    val cat = newCatalog()
    // stats.columns="" writes NO stats — simulates a pre-stats table
    cat.createTable("q.a", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("v", StringType))),
      properties = Map("stats.columns" -> "", "write.max_records_per_file" -> "250"))
    cat.writeToTable(spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")).orderBy("k").coalesce(1), "q.a")
    val before = cat.deltaLog("q.a").flatMap(_.entries)
    assert(before.nonEmpty && before.forall(_.stats == null))
    // widen the stat set back on and analyze
    cat.alterTable("q.a", removeProperties = Seq("stats.columns"))
    val gained = cat.analyzeTable("q.a")
    assert(gained == before.size, s"backfilled $gained of ${before.size}")
    // same files (copy-by-reference), stats attached, skipping now works
    val d = cat.deltaLog("q.a").filter(_.properties.contains("analyze")).last
    assert(d.entries.map(_.path).toSet == before.map(_.path).toSet)
    val filtered = cat.readTable("q.a", ReadOptions(rowFilter = Some(col("k") < 100)))
    assert(filtered.count() == 100 && filtered.inputFiles.length <= 2)
    // observability frame
    val fs = cat.fileStatsTable("q.a")
    assert(fs.where(col("column_name") === "k").count() == before.size.toLong)
    // idempotent
    assert(cat.analyzeTable("q.a") == 0)
  }

  test("manifest-served aggregates: count/min/max answered with zero files opened") {
    val root = tmpDir("graft-aggpush")
    val cat = new GraftCatalog(spark, root)
    cat.createTable("q.ag", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("s", StringType),
      FieldMeta.field("maybe", LongType))),
      properties = Map("write.max_records_per_file" -> "100"))
    cat.writeToTable(spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("s"), format_string("%04d", col("id"))).as("s"),
      when(col("id") % 4 === 0, lit(null)).otherwise(col("id")).as("maybe")), "q.ag")
    val t = spark.read.format("graft").option("root", root).option("table", "q.ag").load()
    val r = t.agg(count(lit(1)).as("n"), min("k").as("mnk"), max("k").as("mxk"),
      min("s").as("mns"), max("s").as("mxs"), count(col("maybe")).as("nm")).head()
    assert(r.getLong(0) == 1000 && r.getLong(1) == 0 && r.getLong(2) == 999)
    assert(r.getString(3) == "s0000" && r.getString(4) == "s0999")
    assert(r.getLong(5) == 750)
    // metadata-only: the plan carries a LocalScan, no parquet scan at all
    val agg = t.agg(count(lit(1)), min("k"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet") && agg.inputFiles.isEmpty, plan.take(400))
    // with a filter the real scan must come back (no stale manifest answer)
    val f = t.where(col("k") < 100).agg(count(lit(1))).head()
    assert(f.getLong(0) == 100)
  }

  test("LIMIT plans only a file prefix covering n rows (readTable + DSv2)") {
    val root = tmpDir("graft-limit")
    val cat = new GraftCatalog(spark, root)
    cat.createTable("q.l", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("v", StringType))),
      properties = Map("write.max_records_per_file" -> "100"))
    cat.writeToTable(spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")).coalesce(1), "q.l")
    val limited = cat.readTable("q.l", ReadOptions(limit = Some(150)))
    assert(limited.count() == 150)
    assert(limited.inputFiles.length <= 2, s"planned ${limited.inputFiles.length} files")
    // rowFilter + limit: limit pruning declines, result still exact
    val both = cat.readTable("q.l",
      ReadOptions(limit = Some(5), rowFilter = Some(col("k") >= 990)))
    assert(both.count() == 5)
    // DSv2: LIMIT shrinks the planned file list too
    graft.spark.StatsPruningScanBuilder.resetFor("q.l")
    val t = spark.read.format("graft").option("root", root).option("table", "q.l").load()
    assert(t.limit(150).count() == 150)
    val (total, kept) = graft.spark.StatsPruningScanBuilder.lastPruneFor("q.l")
    assert(total == 10 && kept <= 2, s"limit pruning got $total -> $kept")
  }

  test("tableInfo summarizes layout, footprint, and skip-index coverage") {
    val cat = newCatalog()
    cat.createTable("q.i", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", LongType))),
      properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable(spark.range(0, 500).select(col("id"), col("id").as("v")),
      "q.i", WriteMode.Merge)
    cat.writeToTable(spark.range(0, 5).select(col("id"), lit(0L).as("v")),
      "q.i", WriteMode.Merge)
    val r = cat.tableInfo("q.i").head()
    assert(r.getAs[String]("table") == "q.i")
    assert(r.getAs[Long]("num_rows_physical") == 505) // pre-merge physical rows
    assert(r.getAs[Long]("est_memory_bytes") > 0) // estimator rides the summary
    assert(r.getAs[Long]("unresolved_merge_deltas") == 2) // both merge writes pending (no base yet)
    assert(r.getAs[Long]("files_with_stats") == r.getAs[Long]("num_files"))
    cat.compact("q.i")
    val r2 = cat.tableInfo("q.i").head()
    assert(r2.getAs[Long]("unresolved_merge_deltas") == 0)
    assert(r2.getAs[Long]("num_buckets") > 0)
    // Above the planning gate both views compute distributed (streamed
    // metafile entries inside tasks) — identical rows with the gate at 1.
    val inMemFs = cat.fileStatsTable("q.i").collect().map(_.toSeq).toSet
    spark.conf.set(graft.catalog.ManifestPlanner.GateConfKey, "1")
    try {
      assert(cat.tableInfo("q.i").head().toSeq == r2.toSeq,
        "distributed (above-gate) tableInfo must equal the in-memory one")
      val gatedFs = cat.fileStatsTable("q.i").collect().map(_.toSeq).toSet
      assert(gatedFs == inMemFs && gatedFs.nonEmpty,
        "distributed (above-gate) fileStatsTable must equal the in-memory one")
    } finally spark.conf.unset(graft.catalog.ManifestPlanner.GateConfKey)
  }

  test("stats survive the manifest JSON roundtrip and compaction refreshes them") {
    val cat = newCatalog()
    cat.createTable("q.c", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("x", LongType))))
    cat.writeToTable(spark.range(0, 100).select(col("id"), (col("id") * 3).as("x")),
      "q.c", WriteMode.Merge)
    cat.compact("q.c")
    val entries = cat.deltaLog("q.c").flatMap(_.entries).filter(_.stats != null)
    assert(entries.nonEmpty)
    val merged = entries.map(_.colStats("x"))
    assert(merged.map(s => BigDecimal(s.min)).min == 0 &&
      merged.map(s => BigDecimal(s.max)).max == 297)
  }
}
