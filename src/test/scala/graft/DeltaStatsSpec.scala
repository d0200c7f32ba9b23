package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.interop.{DeltaLake, DeltaStats, DeltaStatsColumn}
import graft.txn.ColStat

/** Delta per-file stats: write-side add.stats, read-side data skipping,
  * foreign-writer stats parsing. */
class DeltaStatsSpec extends SparkSpec {
  import spark.implicits._

  test("write emits protocol stats; read with dataFilter skips files") {
    val table = tmpDir("delta-stats") + "/t"
    val df = spark.range(0, 1000).select(col("id"),
        concat(lit("n"), col("id")).as("name"),
        timestamp_micros(col("id") * 1000000L).as("ts"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    DeltaLake.write(df, table)
    // every add action carries a stats JSON with numRecords + bounds
    val log = java.nio.file.Files.list(java.nio.file.Paths.get(table, "_delta_log"))
      .toArray.map(_.toString).filter(_.endsWith(".json")).sorted.head
    val adds = scala.io.Source.fromFile(log).getLines()
      .filter(_.contains("\"add\"")).toSeq
    assert(adds.size == 4)
    assert(adds.forall(_.contains("\"stats\"")))
    assert(adds.forall(_.contains("numRecords")))
    // data skipping: a 1/4-range filter plans ~1 of the 4 files
    val filtered = DeltaLake.read(spark, table,
      dataFilter = Some(col("id") >= 100 && col("id") < 200))
    assert(filtered.count() == 100)
    assert(filtered.inputFiles.length <= 2,
      s"expected file skipping, planned ${filtered.inputFiles.length}/4")
    // timestamp stats skip too (micros output => footer stats exist)
    val ts = DeltaLake.read(spark, table,
      dataFilter = Some(col("ts") < lit("1970-01-01 00:02:00").cast("timestamp")))
    assert(ts.count() == 120)
    assert(ts.inputFiles.length <= 2)
    // stats survive the DV rewrite (deleteWhere re-adds the file)
    DeltaLake.deleteWhere(spark, table, col("id") === 150)
    val after = DeltaLake.read(spark, table,
      dataFilter = Some(col("id") >= 100 && col("id") < 200))
    assert(after.count() == 99)
    assert(after.inputFiles.length <= 2)
  }

  test("timestamp stats skip is session-zone-invariant (round-11 guard)") {
    // The vectorized ts skip pins zone-less bound spellings to UTC
    // (tsMicros appends Z); this leg guards that claim by running the same
    // instant-range read under four session zones — the planned file set
    // and row count must not move. Uses an INSTANT literal (lit of
    // java.time.Instant), which names the same moment in every zone;
    // a string-literal cast would itself be session-zoned (user-side
    // semantics, not skip machinery).
    val table = tmpDir("delta-stats-zone") + "/t"
    val df = spark.range(0, 1000).select(col("id"),
        timestamp_micros(col("id") * 1000000L).as("ts"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    DeltaLake.write(df, table)
    val cut = java.time.Instant.ofEpochSecond(120L)
    val zone0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      val results = Seq("UTC", "America/Los_Angeles", "Asia/Kolkata", "Pacific/Kiritimati")
        .map { z =>
          spark.conf.set("spark.sql.session.timeZone", z)
          val r = DeltaLake.read(spark, table, dataFilter = Some(col("ts") < lit(cut)))
          (z, r.count(), r.inputFiles.length)
        }
      results.foreach { case (z, n, files) =>
        assert(n == 120L, s"zone $z: count $n")
        assert(files <= 2, s"zone $z: skip lost ($files/4 files planned)")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", zone0)
  }

  test("foreign-writer stats JSON parses into canonical ColStats") {
    // delta-spark style: ISO-T timestamps, typed JSON numbers
    val json = """{"numRecords":42,
      "minValues":{"id":7,"name":"abc","ts":"2024-03-01T08:30:00.000Z","d":"2024-03-05"},
      "maxValues":{"id":99,"name":"zzz","ts":"2024-06-30T23:59:59.999999Z","d":"2024-06-30"},
      "nullCount":{"id":0,"name":3,"ts":0,"d":1}}"""
    val fields = Seq(
      ("id", "id", LongType: DataType),
      ("name", "name", StringType: DataType),
      ("ts", "ts", TimestampType: DataType),
      ("d", "d", DateType: DataType))
    val Some((rows, st)) = DeltaStats.parse(json, fields)
    assert(rows == 42)
    assert(st("id") == ColStat("7", "99", 0))
    assert(st("name") == ColStat("abc", "zzz", 3))
    assert(st("ts") == ColStat("2024-03-01 08:30:00.000000", "2024-06-30 23:59:59.999999", 0))
    assert(st("d") == ColStat("2024-03-05", "2024-06-30", 1))
    // a column with only one parseable bound degrades to null-count only
    val Some((_, st2)) = DeltaStats.parse(
      """{"numRecords":5,"minValues":{"x":1},"maxValues":{},"nullCount":{"x":2}}""",
      Seq(("x", "x", LongType)))
    assert(st2("x") == ColStat(null, null, 2))
  }

  test("Column-level stats skipping is equivalent to the UDF over randomized stats") {
    import org.apache.spark.sql.sources
    val fields: Seq[(String, String, DataType)] = Seq(
      ("id", "p_id", LongType), ("name", "p_name", StringType),
      ("d", "p_d", DateType), ("f", "p_f", DoubleType),
      ("ts", "p_ts", TimestampType), ("dec", "p_dec", DecimalType(10, 2)))
    val logical = StructType(fields.map { case (l, _, dt) => StructField(l, dt) })
    val rnd = new scala.util.Random(11)
    def maybe[T](v: => T): Option[T] = if (rnd.nextBoolean()) Some(v) else None
    // randomized foreign stats JSON: bounds/null-counts independently
    // present, occasional garbage values, occasional null stats string
    def statsJson(): String = {
      if (rnd.nextInt(10) == 0) return null
      val ids = (rnd.nextInt(20), rnd.nextInt(20))
      val names = (s"s${rnd.nextInt(5)}", s"s${rnd.nextInt(5) + 5}")
      val days = (rnd.nextInt(20) + 1, rnd.nextInt(8) + 21)
      // the foreign timestamp spelling matrix — every spelling BOTH
      // normalizers parse (plus garbage neither does); offsets convert
      def tsSpelling(day: Int): String = {
        val base = f"2024-02-$day%02dT${rnd.nextInt(24)}%02d:30:00"
        rnd.nextInt(5) match {
          case 0 => "\"" + base + "Z\""
          case 1 => "\"" + base.replace('T', ' ') + "\"" // zone-less → UTC
          case 2 => "\"" + base + ".250000Z\""
          case 3 => "\"" + base + "+02:00\""
          case _ => "\"not-a-timestamp\""
        }
      }
      def kv(k: String, v: Option[String]) = v.map(x => s""""$k":$x""")
      def obj(k: String, vs: Seq[Option[String]]) = {
        val inner = vs.flatten
        if (inner.isEmpty) None else Some(s""""$k":{${inner.mkString(",")}}""")
      }
      val mins = obj("minValues", Seq(
        kv("p_id", maybe(math.min(ids._1, ids._2).toString)),
        kv("p_name", maybe("\"" + (if (names._1 < names._2) names._1 else names._2) + "\"")),
        kv("p_d", maybe(f""""2024-01-${math.min(days._1, days._2)}%02d"""")),
        kv("p_f", maybe("0.5")),
        kv("p_ts", maybe(tsSpelling(rnd.nextInt(14) + 1))),
        // exact-fit (10,2) spellings only: out-of-fit bounds read unknown
        // on the Column path BY DESIGN (separate soundness leg below)
        kv("p_dec", maybe(f"${rnd.nextInt(40)}%d.${rnd.nextInt(100)}%02d"))))
      val maxs = obj("maxValues", Seq(
        kv("p_id", maybe(math.max(ids._1, ids._2).toString)),
        kv("p_name", maybe("\"" + (if (names._1 < names._2) names._2 else names._1) + "\"")),
        kv("p_d", maybe(f""""2024-01-${math.max(days._1, days._2)}%02d"""")),
        kv("p_f", maybe("9.5")),
        kv("p_ts", maybe(tsSpelling(rnd.nextInt(14) + 15))),
        kv("p_dec", maybe(f"${rnd.nextInt(40) + 40}%d.${rnd.nextInt(100)}%02d"))))
      val nulls = obj("nullCount", Seq(
        kv("p_id", maybe(rnd.nextInt(12).toString)),
        kv("p_name", maybe(rnd.nextInt(12).toString)),
        kv("p_d", maybe(rnd.nextInt(12).toString)),
        kv("p_f", maybe(rnd.nextInt(12).toString)),
        kv("p_ts", maybe(rnd.nextInt(12).toString)),
        kv("p_dec", maybe(rnd.nextInt(12).toString))))
      val rows = maybe(s""""numRecords":${rnd.nextInt(12)}""")
      s"{${(Seq(rows) ++ Seq(mins, maxs, nulls)).flatten.mkString(",")}}"
    }
    val filterSets: Seq[Seq[sources.Filter]] = Seq(
      Seq(sources.EqualTo("id", 7L)),
      Seq(sources.GreaterThan("id", 10L), sources.LessThanOrEqual("id", 15L)),
      Seq(sources.In("id", Array(3L, 8L, 19L))),
      Seq(sources.IsNull("name")),
      Seq(sources.IsNotNull("name")),
      Seq(sources.StringStartsWith("name", "s3")),
      Seq(sources.Or(sources.EqualTo("id", 2L), sources.LessThan("name", "s2"))),
      Seq(sources.GreaterThanOrEqual("d", java.sql.Date.valueOf("2024-01-15"))),
      Seq(sources.EqualTo("f", 1.5), sources.IsNotNull("f")), // float bounds distrusted
      Seq(sources.And(sources.IsNotNull("id"), sources.EqualTo("d",
        java.sql.Date.valueOf("2024-01-22")))),
      // the timestamp-vectorization cases (round-10): range, point, null
      Seq(sources.GreaterThan("ts", java.sql.Timestamp.valueOf("2024-02-10 00:00:00"))),
      Seq(sources.GreaterThanOrEqual("ts", java.sql.Timestamp.valueOf("2024-02-05 06:00:00")),
        sources.LessThan("ts", java.sql.Timestamp.valueOf("2024-02-20 18:00:00"))),
      Seq(sources.EqualTo("ts", java.sql.Timestamp.valueOf("2024-02-07 09:30:00"))),
      Seq(sources.IsNotNull("ts")),
      Seq(sources.Or(sources.IsNull("ts"),
        sources.LessThanOrEqual("ts", java.sql.Timestamp.valueOf("2024-02-03 00:00:00")))),
      // decimal (round-10): exact-fit literals compare natively
      Seq(sources.GreaterThan("dec", new java.math.BigDecimal("25.50"))),
      Seq(sources.EqualTo("dec", new java.math.BigDecimal("13.07"))),
      Seq(sources.LessThan("dec", new java.math.BigDecimal("60.00")),
        sources.IsNotNull("dec")))
    val statsRows = (0 until 200).map(i => (i, statsJson()))
    val df = statsRows.toDF("i", "stats")
    filterSets.foreach { fs =>
      // UDF verdicts (the reference semantics)
      val udfKept = statsRows.collect { case (i, s)
        if s == null || (DeltaStats.parse(s, fields) match {
          case Some((rows, st)) =>
            fs.forall(fl => graft.catalog.StatsSkip.keep(fl, logical, st, rows))
          case None => true
        }) => i
      }.toSet
      val Some((pSchema, mkKeep)) = DeltaStatsColumn.build(fs, fields)
      val colKept = df
        .withColumn("_p", from_json(col("stats"), pSchema, Map("dateFormat" -> "yyyy-MM-dd")))
        .where(col("stats").isNull || col("_p").isNull || mkKeep(col("_p")))
        .select("i").as[Int].collect().toSet
      assert(colKept == udfKept,
        s"filters=$fs\nonlyCol=${(colKept -- udfKept).toSeq.sorted.take(5).map(statsRows)}" +
          s"\nonlyUdf=${(udfKept -- colKept).toSeq.sorted.take(5).map(statsRows)}")
    }
    // round-10: decimal and timestamp filters both stay on the Column path
    assert(DeltaStatsColumn.build(Seq(sources.EqualTo("dec", BigDecimal(1))),
      Seq(("dec", "dec", DecimalType(10, 2)))).isDefined)
    assert(DeltaStatsColumn.build(Seq(sources.GreaterThan("ts",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))),
      Seq(("ts", "ts", TimestampType))).isDefined)

    // Out-of-fit decimal soundness: bounds/literals needing rounding into
    // (10,2) read UNKNOWN on the Column path (keep), while the UDF's
    // arbitrary-precision compare may prune — the Column verdicts must be
    // a SUPERSET of the UDF's, never a differently-pruned set.
    val decFields = Seq(("dec", "p_dec", DecimalType(10, 2): DataType))
    val decLogical = StructType(Seq(StructField("dec", DecimalType(10, 2))))
    val oddStats = Seq(
      """{"numRecords":10,"minValues":{"p_dec":1.005},"maxValues":{"p_dec":2.005},"nullCount":{"p_dec":0}}""",
      """{"numRecords":10,"minValues":{"p_dec":1.00},"maxValues":{"p_dec":2.00},"nullCount":{"p_dec":0}}""",
      """{"numRecords":10,"minValues":{"p_dec":99999999999.00},"maxValues":{"p_dec":99999999999.50},"nullCount":{"p_dec":0}}""",
      """{"numRecords":10,"minValues":{"p_dec":5.25},"maxValues":{"p_dec":5.75},"nullCount":{"p_dec":0}}""")
    val oddFilters: Seq[Seq[sources.Filter]] = Seq(
      Seq(sources.GreaterThan("dec", new java.math.BigDecimal("2.0049"))), // out-of-fit literal
      Seq(sources.GreaterThan("dec", new java.math.BigDecimal("3.00"))),
      Seq(sources.LessThan("dec", new java.math.BigDecimal("1.00"))),
      Seq(sources.EqualTo("dec", new java.math.BigDecimal("5.50"))))
    val oddDf = oddStats.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "stats")
    oddFilters.foreach { fs =>
      val udfKept = oddStats.zipWithIndex.filter { case (s, _) =>
        DeltaStats.parse(s, decFields) match {
          case Some((rows, st)) =>
            fs.forall(fl => graft.catalog.StatsSkip.keep(fl, decLogical, st, rows))
          case None => true
        }
      }.map(_._2).toSet
      val Some((pSchema, mkKeep)) = DeltaStatsColumn.build(fs, decFields)
      val colKept = oddDf
        .withColumn("_p", from_json(col("stats"), pSchema))
        .where(col("stats").isNull || col("_p").isNull || mkKeep(col("_p")))
        .select("i").as[Int].collect().toSet
      assert(udfKept.subsetOf(colKept),
        s"Column path pruned a file the UDF keeps: fs=$fs col=$colKept udf=$udfKept")
      // and on exact-fit stats with exact-fit literals it prunes identically
    }
  }

  test("delta read plans no stats UDF on the supported filter path") {
    val t = tmpDir("ds-col") + "/tbl"
    val df = spark.range(0, 1000).select(col("id"),
      concat(lit("n"), col("id")).as("name"))
    DeltaLake.write(df.where(col("id") < 500).orderBy("id").coalesce(1), t)
    DeltaLake.write(df.where(col("id") >= 500).orderBy("id").coalesce(1), t)
    val got = DeltaLake.read(spark, t, dataFilter = Some(col("id") === 7L))
    assert(got.select("id").as[Long].collect().toSeq == Seq(7L))
    // the skip actually happened: only the first file is planned
    assert(got.inputFiles.length == 1, s"expected 1 file, got ${got.inputFiles.length}")
    // timestamp filters ride the same Column path now (round-10): a
    // time-range read over time-clustered files plans only the hit file
    val t2 = tmpDir("ds-colts") + "/tbl"
    val tsDf = spark.range(0, 1000).select(col("id"),
      timestamp_seconds(lit(1700000000L) + col("id") * 3600).as("ts"))
    DeltaLake.write(tsDf.where(col("id") < 500).orderBy("id").coalesce(1), t2)
    DeltaLake.write(tsDf.where(col("id") >= 500).orderBy("id").coalesce(1), t2)
    val cut = new java.sql.Timestamp((1700000000L + 700 * 3600) * 1000L)
    val got2 = DeltaLake.read(spark, t2, dataFilter = Some(col("ts") > lit(cut)))
    assert(got2.count() == 299, s"expected 299 rows, got ${got2.count()}")
    assert(got2.inputFiles.length == 1,
      s"ts skip expected 1 file, got ${got2.inputFiles.length}")
  }
}
