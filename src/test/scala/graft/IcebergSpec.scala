package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.interop.{IceSpecField, IceTransform, Iceberg, IcebergHash, IcebergPartPrune}
import graft.operators.Converter

/** Iceberg v2 binding: metadata/manifest roundtrips, snapshot reads, time
  * travel, partition pruning, and position/equality delete application —
  * including the converter's snapshot commit. */
class IcebergSpec extends SparkSpec {
  import spark.implicits._

  private def nation = spark.read.parquet(s"$sf/nation.parquet")
    .select("n_nationkey", "n_name", "n_regionkey")

  test("iceberg: create + append + read roundtrip, snapshot accumulation") {
    val t = tmpDir("ice-rt") + "/tbl"
    Iceberg.createTable(t, nation.schema)
    val s1 = Iceberg.append(nation.where($"n_nationkey" < 10), t)
    val s2 = Iceberg.append(nation.where($"n_nationkey" >= 10), t)
    assert(s1 != s2)
    val back = Iceberg.read(spark, t)
    assert(back.schema.fieldNames.toSeq == nation.schema.fieldNames.toSeq)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    // pinned to the first snapshot
    assert(Iceberg.read(spark, t, snapshotId = Some(s1)).count() == 10)
    // timestamp travel: at-or-after s2's commit sees everything
    val meta = Iceberg.loadMeta(t)
    val ts1 = meta.snapshots.find(_.snapshotId == s1).get.timestampMs
    assert(Iceberg.read(spark, t, asOfTimestampMs = Some(ts1)).count() == 10)
    // schema JSON roundtrips with field ids intact
    assert(meta.fieldIds == Map("n_nationkey" -> 1, "n_name" -> 2, "n_regionkey" -> 3))
    assert(meta.lastSequenceNumber == 2L)
  }

  test("iceberg: partitioned table prunes by manifest partition values") {
    val t = tmpDir("ice-part") + "/tbl"
    Iceberg.createTable(t, nation.schema, partitionCols = Seq("n_regionkey"))
    Iceberg.append(nation, t)
    val meta = Iceberg.loadMeta(t)
    val snap = meta.snapshots.head
    val entries = Iceberg.fileEntries(spark, meta, snap)
    assert(entries.forall(_.partition.contains("n_regionkey")))
    // physically delete region-4 files: a pruned read must not open them
    val doomed = entries.filter(_.partition("n_regionkey") == "4")
    assert(doomed.nonEmpty)
    doomed.foreach(e => java.nio.file.Files.delete(java.nio.file.Paths.get(e.path)))
    val pruned = Iceberg.read(spark, t, partitionFilter = Some(col("n_regionkey") === 2))
    assert(pruned.count() == nation.where($"n_regionkey" === 2).count())
    assert(pruned.orderBy("n_nationkey").collect().toSeq ==
      nation.where($"n_regionkey" === 2).orderBy("n_nationkey").collect().toSeq)
  }

  test("iceberg: converter position deletes commit as a delete snapshot") {
    val t = tmpDir("ice-posdel") + "/tbl"
    Iceberg.createTable(t, nation.schema)
    Iceberg.append(nation, t)
    // equality predicate -> position deletes via the converter compute core
    val meta = Iceberg.loadMeta(t)
    val dataFiles = Iceberg.fileEntries(spark, meta, meta.snapshots.head)
      .filter(_.content == 0).map(_.path)
    val deleteKeys = nation.where($"n_nationkey" % 3 === 0).select("n_nationkey")
    val pos = Converter.equalityToPositionDeletes(
      spark, dataFiles, nation.schema, deleteKeys, Seq("n_nationkey"))
      .select(regexp_replace(col("file_path"), "^file:/+", "/").as("file_path"), col("pos"))
    Iceberg.commitPositionDeletes(spark, t, pos)
    val back = Iceberg.read(spark, t)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.where($"n_nationkey" % 3 =!= 0).orderBy("n_nationkey").collect().toSeq)
    // the pre-delete snapshot still reads whole
    val first = Iceberg.loadMeta(t).snapshots.head.snapshotId
    assert(Iceberg.read(spark, t, snapshotId = Some(first)).count() == nation.count())
  }

  test("iceberg: equality deletes hit only strictly-older data sequences") {
    val t = tmpDir("ice-eqdel") + "/tbl"
    Iceberg.createTable(t, nation.schema)
    Iceberg.append(nation.where($"n_nationkey" < 15), t) // seq 1
    Iceberg.commitEqualityDeletes(spark, t,
      Seq(3, 7, 20).toDF("n_nationkey"), Seq("n_nationkey")) // seq 2
    Iceberg.append(nation.where($"n_nationkey" >= 15), t) // seq 3 (incl. key 20)
    val back = Iceberg.read(spark, t).select("n_nationkey").as[Int].collect().toSet
    // 3 and 7 deleted (older data); 20 survives (appended AFTER the delete)
    val expect = nation.select("n_nationkey").as[Int].collect().toSet -- Set(3, 7)
    assert(back == expect)
  }

  test("iceberg: gated (distributed) planning equals driver planning") {
    // identity-partitioned table with pos + eq deletes across sequences —
    // every planner responsibility exercised: derived/bounds prunes,
    // identity partitionFilter, delete collection, sequence pairing. The
    // gated path (planGateManifestBytes = 0 forces it) must agree with the
    // driver path on every read shape.
    val t = tmpDir("ice-gate") + "/tbl"
    Iceberg.createTable(t, nation.schema, partitionCols = Seq("n_regionkey"))
    Iceberg.append(nation.where($"n_nationkey" < 15), t) // seq 1
    Iceberg.commitEqualityDeletes(spark, t,
      Seq(3, 7, 20).toDF("n_nationkey"), Seq("n_nationkey")) // seq 2
    Iceberg.append(nation.where($"n_nationkey" >= 15), t) // seq 3
    val meta = Iceberg.loadMeta(t)
    val dataFiles = Iceberg.fileEntries(spark, meta, meta.snapshots.last)
      .filter(_.content == 0).map(_.path)
    val pos = Converter.equalityToPositionDeletes(
      spark, dataFiles, nation.schema, Seq(11).toDF("n_nationkey"), Seq("n_nationkey"))
      .select(regexp_replace(col("file_path"), "^file:/+", "/").as("file_path"), col("pos"))
    Iceberg.commitPositionDeletes(spark, t, pos)
    val shapes: Seq[(Option[org.apache.spark.sql.Column], Option[org.apache.spark.sql.Column])] =
      Seq(
        (None, None),
        (Some($"n_regionkey" === 2), None),
        (None, Some($"n_nationkey" >= 5 && $"n_name".isNotNull)),
        (Some($"n_regionkey".isin(0, 2)), Some($"n_nationkey" < 18)))
    shapes.foreach { case (pf, df0) =>
      val driver = Iceberg.read(spark, t, partitionFilter = pf, dataFilter = df0)
        .orderBy("n_nationkey").collect().toSeq
      val gated = Iceberg.read(spark, t, partitionFilter = pf, dataFilter = df0,
        planGateManifestBytes = 0L).orderBy("n_nationkey").collect().toSeq
      assert(gated == driver, s"gated plan diverged for pf=$pf df=$df0")
      assert(driver.nonEmpty)
    }
    // time travel through the gate too
    val first = Iceberg.loadMeta(t).snapshots.head.snapshotId
    assert(Iceberg.read(spark, t, snapshotId = Some(first),
      planGateManifestBytes = 0L).count() ==
      Iceberg.read(spark, t, snapshotId = Some(first)).count())
  }

  test("property: identity partition spellings (hive, raw-integral, garbage) never prune a matching file") {
    // The manifest carries STRINGIFIED partition values: our writer's
    // hive-dir rendering, a foreign manifest's avro stringification (date
    // = days from epoch, timestamp = micros), or something unknown. The
    // prune must be exact on decodable spellings and FAIL-OPEN on
    // undecodable ones.
    import java.time.{LocalDate, Instant}
    val rnd = new scala.util.Random(77)
    val pSchema = StructType(Seq(
      StructField("i", IntegerType), StructField("s", StringType),
      StructField("d", DateType), StructField("t", TimestampType)))
    val partCols = Seq("i", "s", "d", "t")
    val epoch = LocalDate.of(1970, 1, 1)
    case class F(path: String, i: Option[Int], s: Option[String],
        d: Option[LocalDate], t: Option[Long], // t = epoch micros
        spell: Seq[String], undecodable: Boolean)
    val files = (0 until 120).map { n =>
      val i = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(5))
      val s = if (rnd.nextInt(10) == 0) None else Some(s"g${rnd.nextInt(3)}")
      val d = if (rnd.nextInt(10) == 0) None else Some(LocalDate.of(2024, 1, rnd.nextInt(28) + 1))
      val t = if (rnd.nextInt(10) == 0) None
        else Some(Instant.parse(f"2024-01-${rnd.nextInt(28) + 1}%02dT${rnd.nextInt(24)}%02d:00:00Z")
          .getEpochSecond * 1000000L)
      var garbled = false
      def g[T](v: Option[T])(spellings: T => Seq[String]): String = v match {
        case None => null
        case Some(x) =>
          val all = spellings(x) :+ "un-spellable!"
          val pick = all(rnd.nextInt(all.size))
          if (pick == "un-spellable!") garbled = true
          pick
      }
      val spell = Seq(
        g(i)(v => Seq(v.toString)),
        s.orNull, // strings pass through (no garbage form: any string IS a value)
        g(d)(v => Seq(v.toString, java.time.temporal.ChronoUnit.DAYS.between(epoch, v).toString)),
        g(t)(v => Seq(Instant.ofEpochSecond(v / 1000000L).toString, v.toString)))
      F(s"f$n", i, s, d, t, spell, garbled)
    }
    import spark.implicits._
    val pvDf = files.map(f => (f.path, f.spell)).toDF("path", "pv")
    val cutD = LocalDate.of(2024, 1, 15)
    val cutT = Instant.parse("2024-01-15T00:00:00Z").getEpochSecond * 1000000L
    val preds: Seq[(org.apache.spark.sql.Column, F => Boolean)] = Seq(
      (col("i") === 2, f => f.i.contains(2)),
      (col("s").isin("g0", "g2"), f => f.s.exists(Set("g0", "g2"))),
      (col("d") >= java.sql.Date.valueOf(cutD), f => f.d.exists(!_.isBefore(cutD))),
      (col("t") < new java.sql.Timestamp(cutT / 1000L), f => f.t.exists(_ < cutT)),
      (col("d").isNull, f => f.d.isEmpty),
      (col("i") === 1 && col("d") < java.sql.Date.valueOf(cutD),
        f => f.i.contains(1) && f.d.exists(_.isBefore(cutD))))
    preds.foreach { case (pred, model) =>
      val kept = Iceberg.prunePartitionDf(pvDf, partCols, pSchema, pred)
        .select("path").as[String].collect().toSet
      files.foreach { f =>
        val expectKeep = f.undecodable || model(f)
        if (expectKeep) assert(kept.contains(f.path),
          s"pruned a matching/undecodable file: $f under $pred")
        else assert(!kept.contains(f.path),
          s"kept a provably non-matching file: $f under $pred")
      }
    }
  }

  test("NTZ raw-micros partition values decode zone-free in non-UTC sessions") {
    // Iceberg NTZ partition micros are ZONE-LESS wall-clock micros; the
    // round-10 decode went through TimestampType → NTZ cast, which renders
    // in the SESSION zone — in a non-UTC session an identity
    // partitionFilter on an NTZ column silently pruned matching files
    // (advisor finding, round 11). The decode must yield the same
    // wall-clock in every session zone, including negative micros.
    import java.time.LocalDateTime
    import spark.implicits._
    val pSchema = StructType(Seq(StructField("t", TimestampNTZType)))
    val micros = Seq(
      0L,                                     // 1970-01-01T00:00:00
      -1L,                                    // 1969-12-31T23:59:59.999999
      1705276800000000L,                      // 2024-01-15T00:00:00
      1705276800000000L + 3661000001L,        // 2024-01-15T01:01:01.000001
      1735689600000000L)                      // 2025-01-01T00:00:00
    def wallClock(us: Long): LocalDateTime = {
      val s = Math.floorDiv(us, 1000000L); val f = Math.floorMod(us, 1000000L)
      LocalDateTime.ofEpochSecond(s, f.toInt * 1000, java.time.ZoneOffset.UTC)
    }
    val pvDf = micros.zipWithIndex.map { case (us, i) => (s"f$i", Seq(us.toString)) }
      .toDF("path", "pv")
    val cut = LocalDateTime.of(2024, 1, 15, 0, 0)
    val preds: Seq[(org.apache.spark.sql.Column, Long => Boolean)] = Seq(
      (col("t") >= lit(cut), us => !wallClock(us).isBefore(cut)),
      (col("t") === lit(wallClock(micros(3))), us => us == micros(3)),
      (col("t") < lit(LocalDateTime.of(1970, 1, 1, 0, 0)), us => us < 0L))
    val zone0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (zone <- Seq("UTC", "America/Los_Angeles", "Asia/Kolkata", "Pacific/Kiritimati")) {
        spark.conf.set("spark.sql.session.timeZone", zone)
        preds.foreach { case (pred, model) =>
          val kept = Iceberg.prunePartitionDf(pvDf, Seq("t"), pSchema, pred)
            .select("path").as[String].collect().toSet
          val expect = micros.zipWithIndex.collect { case (us, i) if model(us) => s"f$i" }.toSet
          assert(kept == expect, s"zone=$zone pred=$pred: got $kept want $expect")
        }
        // wall-clock literal spelling decodes zone-free too
        val litDf = Seq(("g0", Seq("2024-01-15T01:01:01.000001"))).toDF("path", "pv")
        assert(Iceberg.prunePartitionDf(litDf, Seq("t"), pSchema,
          col("t") === lit(wallClock(micros(3)))).count() == 1, s"zone=$zone literal spelling")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", zone0)
  }

  test("iceberg: date-identity partition filter prunes through both planners") {
    val t = tmpDir("ice-datepart") + "/tbl"
    val df0 = (1 to 20).map(n => (n, java.sql.Date.valueOf(f"2024-03-${(n % 10) + 1}%02d")))
      .toDF("id", "day")
    Iceberg.createTable(t, df0.schema, partitionCols = Seq("day"))
    Iceberg.append(df0, t)
    val pf = col("day") === java.sql.Date.valueOf("2024-03-05")
    val expect = df0.where(pf).select("id").as[Int].collect().toSet
    val drv = Iceberg.read(spark, t, partitionFilter = Some(pf))
    assert(drv.select("id").as[Int].collect().toSet == expect)
    assert(drv.inputFiles.length < Iceberg.read(spark, t).inputFiles.length)
    val gated = Iceberg.read(spark, t, partitionFilter = Some(pf),
      planGateManifestBytes = 0L)
    assert(gated.select("id").as[Int].collect().toSet == expect)
  }

  test("iceberg: concurrent metadata version commit is a conflict") {
    val t = tmpDir("ice-race") + "/tbl"
    Iceberg.createTable(t, nation.schema)
    // racer publishes v2 out from under us
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "metadata", "v2.metadata.json"), "{}".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](Iceberg.append(nation, t))
    assert(e.getMessage.contains("concurrent"))
  }

  test("iceberg: renamed columns read by FIELD ID; id-less files fall back to names") {
    val t = tmpDir("ice-rename") + "/tbl"
    Iceberg.createTable(t, nation.schema)
    Iceberg.append(nation, t)

    // foreign rename: a new metadata version changes the field NAME but
    // keeps its id — exactly what an Iceberg RENAME COLUMN commit does
    val metaDir = java.nio.file.Paths.get(t, "metadata")
    val v = new String(java.nio.file.Files.readAllBytes(
      metaDir.resolve("version-hint.text")), "UTF-8").trim.toInt
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(
      metaDir.resolve(s"v$v.metadata.json"))).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    import scala.jdk.CollectionConverters._
    root.get("schemas").elements().asScala.foreach { s =>
      s.get("fields").elements().asScala.foreach {
        case f: com.fasterxml.jackson.databind.node.ObjectNode
          if f.get("name").asText() == "n_name" => f.put("name", "nation_title")
        case _ =>
      }
    }
    java.nio.file.Files.write(metaDir.resolve(s"v${v + 1}.metadata.json"),
      om.writeValueAsBytes(root))
    java.nio.file.Files.write(metaDir.resolve("version-hint.text"),
      String.valueOf(v + 1).getBytes("UTF-8"))

    // pre-rename data files surface under the NEW name with the old values
    val back = Iceberg.read(spark, t)
    assert(back.columns.contains("nation_title") && !back.columns.contains("n_name"))
    assert(back.select("nation_title").as[String].collect().toSet ==
      nation.select("n_name").as[String].collect().toSet)
    // and appends under the renamed schema coexist with the old files
    Iceberg.append(back.limit(2).withColumn("n_nationkey", col("n_nationkey") + 100), t)
    assert(Iceberg.read(spark, t).count() == nation.count() + 2)

    // files written without parquet field ids still read by name
    val t2 = tmpDir("ice-noid") + "/tbl"
    Iceberg.createTable(t2, nation.schema)
    val key = "spark.sql.parquet.fieldId.write.enabled"
    val prev = spark.conf.get(key)
    try { spark.conf.set(key, "false"); Iceberg.append(nation, t2) }
    finally spark.conf.set(key, prev)
    assert(Iceberg.read(spark, t2).orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("iceberg transforms: murmur3 single-value hashing matches the spec's Appendix B vectors") {
    // Iceberg spec, Appendix B "32-bit Hash Requirements" — published test
    // values (hashInt/hashLong promote int to the 8-byte little-endian form)
    assert(IcebergHash.hashLong(34L) == 2017239379)
    assert(IcebergHash.hashLong(17486L) == -653330422) // date 2017-11-16
    assert(IcebergHash.hashLong(81068000000L) == -662762989) // time 22:31:08
    assert(IcebergHash.hashLong(1510871468000000L) == -2047944441) // ts 2017-11-16T22:31:08
    assert(IcebergHash.bucketRawString("iceberg", Int.MaxValue) ==
      (1210000089 & Int.MaxValue) % Int.MaxValue)
    assert(IcebergHash.murmur3("iceberg".getBytes("UTF-8")) == 1210000089)
    assert(IcebergHash.murmur3(Array[Byte](0, 1, 2, 3)) == -188683207)
    assert(IcebergHash.bucketJavaDecimal(new java.math.BigDecimal("14.20"), Int.MaxValue) ==
      ((-500754589 & Int.MaxValue) % Int.MaxValue))
    assert(IcebergHash.murmur3(new java.math.BigDecimal("14.20").unscaledValue.toByteArray) ==
      -500754589)
    // independent cross-check: scala's murmur3 x86_32 over bytes, seed 0
    val rnd = new scala.util.Random(7)
    (0 until 64).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(32)); rnd.nextBytes(b)
      assert(IcebergHash.murmur3(b) == scala.util.hashing.MurmurHash3.bytesHash(b, 0))
    }
  }

  test("iceberg transforms: write-path Column equals driver eval across source types") {
    val ts1 = java.sql.Timestamp.valueOf("2017-11-16 22:31:08.000123")
    val df = Seq(
      (34, 34L, "iceberg", BigDecimal("14.20").setScale(2),
        java.sql.Date.valueOf("2017-11-16"), ts1),
      (-7, -7L, "zz", BigDecimal("-0.01").setScale(2),
        java.sql.Date.valueOf("1969-12-31"), java.sql.Timestamp.valueOf("1969-12-31 23:59:59"))
    ).toDF("i", "l", "s", "dec", "d", "ts")
    val cases: Seq[(String, IceTransform)] = Seq(
      "i" -> IceTransform.BucketT(16), "l" -> IceTransform.BucketT(16),
      "s" -> IceTransform.BucketT(16), "dec" -> IceTransform.BucketT(16),
      "d" -> IceTransform.BucketT(16), "ts" -> IceTransform.BucketT(16),
      "i" -> IceTransform.TruncateT(10), "l" -> IceTransform.TruncateT(10),
      "s" -> IceTransform.TruncateT(1),
      "d" -> IceTransform.YearT, "ts" -> IceTransform.YearT,
      "d" -> IceTransform.MonthT, "ts" -> IceTransform.MonthT,
      "d" -> IceTransform.DayT, "ts" -> IceTransform.DayT,
      "ts" -> IceTransform.HourT)
    cases.foreach { case (c, tr) =>
      val srcType = df.schema(c).dataType
      val viaColumn = df.select(tr.column(col(c), srcType)).collect().map(_.get(0)).toSeq
      val viaEval = df.select(col(c)).collect().map(r => tr.eval(srcType, r.get(0)).get)
      assert(viaColumn.map(String.valueOf(_)) == viaEval.map(String.valueOf(_)).toSeq,
        s"column != eval for $c ${tr.json}")
    }
    // negative-int truncate is the floor multiple (spec: -1 trunc 10 = -10)
    assert(IceTransform.TruncateT(10).eval(IntegerType, Int.box(-1)).get == -10)
    // supplementary characters truncate by CODE POINTS on both surfaces —
    // a UTF-16-unit cut would derive a partition value the writer never
    // produced (silent mis-prune on emoji-bearing keys)
    val emoji = "😀xyz"
    val viaColS = Seq(Tuple1(emoji)).toDF("s")
      .select(IceTransform.TruncateT(2).column(col("s"), StringType))
      .head.getString(0)
    assert(viaColS == "😀x")
    assert(IceTransform.TruncateT(2).eval(StringType, emoji).get == viaColS)
    // narrow ints: truncate result stays INT (a width past the type's
    // range must not overflow the cast back under ANSI)
    val b = java.lang.Byte.valueOf((-128).toByte)
    val viaColB = Seq(Tuple1(b.byteValue)).toDF("b")
      .select(IceTransform.TruncateT(100).column(col("b"), ByteType))
      .head.getInt(0)
    assert(viaColB == -200)
    assert(IceTransform.TruncateT(100).eval(ByteType, b).get == -200)
    // hour/day over pre-epoch timestamps floor toward -inf
    assert(IceTransform.DayT.eval(
      TimestampType, java.sql.Timestamp.valueOf("1969-12-31 23:59:59")).get == -1)
    assert(IceTransform.HourT.eval(
      TimestampType, java.sql.Timestamp.valueOf("1969-12-31 23:59:59")).get == -1)
  }

  test("iceberg: bucket+day partitioned write, spec-correct metadata, derived pruning") {
    val t = tmpDir("ice-transform") + "/tbl"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "ts", "user_id", "event_type")
    Iceberg.createTable(t, ev.schema,
      partitionSpec = Seq("user_id" -> "bucket[4]", "ts" -> "day"))
    Iceberg.append(ev, t)

    // metadata carries the spec-exact transform JSON + default field names
    val meta = Iceberg.loadMeta(t)
    assert(meta.specFields.map(f => (f.name, f.transform.json)) ==
      Seq(("user_id_bucket", "bucket[4]"), ("ts_day", "day")))

    // full read is exact
    val back = Iceberg.read(spark, t)
    assert(back.orderBy("event_id").collect().toSeq ==
      ev.orderBy("event_id").collect().toSeq)

    // manifest partition tuples carry the transform VALUES
    val entries = Iceberg.fileEntries(spark, meta, meta.snapshots.head)
    assert(entries.forall(e =>
      e.partition.contains("user_id_bucket") && e.partition.contains("ts_day")))
    val key = ev.select("user_id").as[Long].head()
    val wantBucket = IcebergHash.bucketLong(key, 4).toString

    // derived pruning: user_id = key reads ONLY that bucket's files
    val preds = IcebergPartPrune.derive(
      graft.catalog.StatsSkip.translate(col("user_id") === key),
      meta.specFields, meta.schema)
    assert(preds.nonEmpty)
    val kept = entries.filter(e => IcebergPartPrune.keep(preds, e.partition))
    assert(kept.nonEmpty && kept.size < entries.size)
    assert(kept.forall(_.partition("user_id_bucket") == wantBucket))

    // physical proof: delete every other-bucket file; the filtered read
    // must not open them and must still be row-exact
    entries.filterNot(e => kept.exists(_.path == e.path))
      .foreach(e => java.nio.file.Files.delete(java.nio.file.Paths.get(e.path)))
    val got = Iceberg.read(spark, t, dataFilter = Some(col("user_id") === key))
    assert(got.orderBy("event_id").collect().toSeq ==
      ev.where($"user_id" === key).orderBy("event_id").collect().toSeq)
  }

  test("iceberg: day-range predicates prune inclusively; null/unknown fail open") {
    import IcebergPartPrune._
    val spec = Seq(
      IceSpecField("ts_day", "ts", 1000, IceTransform.DayT),
      IceSpecField("k_bucket", "k", 1001, IceTransform.BucketT(8)))
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("k", LongType)))
    val d0 = java.sql.Timestamp.valueOf("2024-03-05 10:00:00") // day 19787
    val day0 = IceTransform.DayT.eval(TimestampType, d0).get.toString.toInt

    // ts > X derives an INCLUSIVE lower bound (rows later the same day)
    val gt = derive(Seq(org.apache.spark.sql.sources.GreaterThan("ts", d0)), spec, schema)
    assert(gt == Seq(Range("ts_day", Some(day0.toLong), None)))
    assert(keep(gt, Map("ts_day" -> day0.toString)))           // same day kept
    assert(!keep(gt, Map("ts_day" -> (day0 - 1).toString)))    // older day pruned
    assert(keep(gt, Map("other" -> "1")))                      // absent field: open
    assert(!keep(gt, Map("ts_day" -> null)))                   // all-null source: no match

    // OR across the same field unions; bucket ranges never derive
    val or = derive(Seq(org.apache.spark.sql.sources.Or(
      org.apache.spark.sql.sources.EqualTo("k", 1L),
      org.apache.spark.sql.sources.EqualTo("k", 9L))), spec, schema)
    assert(or.size == 1)
    val want = Set(IcebergHash.bucketLong(1L, 8), IcebergHash.bucketLong(9L, 8)).map(_.toString)
    assert(or.head == EqIn("k_bucket", want, matchNull = false))
    assert(derive(Seq(org.apache.spark.sql.sources.GreaterThan("k", 5L)), spec, schema).isEmpty)

    // IN with a null literal drops it (SQL IN never matches null)
    val in = derive(Seq(org.apache.spark.sql.sources.In("k", Array(2L, null))), spec, schema)
    assert(in == Seq(EqIn("k_bucket",
      Set(IcebergHash.bucketLong(2L, 8).toString), matchNull = false)))
  }

  test("property: derived partition predicates never prune a file holding a matching row") {
    // Soundness fuzz for the fail-open contract: random files (rows sharing
    // one partition cell), random filter conjuncts; every file containing a
    // row Spark says matches must survive IcebergPartPrune.keep. Spark
    // itself is the row-level oracle (the same Column the read applies).
    import org.apache.spark.sql.sources
    import org.apache.spark.sql.Column
    val spec = Seq(
      IceSpecField("k_bucket", "k", 1000, IceTransform.BucketT(4)),
      IceSpecField("ts_day", "ts", 1001, IceTransform.DayT),
      IceSpecField("s_trunc", "s", 1002, IceTransform.TruncateT(2)))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("ts", TimestampType), StructField("s", StringType)))
    val rnd = new scala.util.Random(23)
    def ts(day: Int, min: Int) = new java.sql.Timestamp(
      (19700L + day) * 86400000L + min * 60000L)
    // 60 files × up to 3 rows, all rows of a file inside one partition cell
    val files: Seq[(Int, Seq[(Long, java.sql.Timestamp, String)])] =
      (0 until 60).map { fid =>
        val k = rnd.nextInt(40).toLong
        val day = rnd.nextInt(15)
        val s2 = s"${('a' + rnd.nextInt(3)).toChar}${('a' + rnd.nextInt(3)).toChar}"
        val rows = (0 to rnd.nextInt(2)).map(i =>
          (k, ts(day, rnd.nextInt(1440)), s2 + ("x" * rnd.nextInt(3))))
        (fid, rows)
      }
    val tuples: Map[Int, Map[String, String]] = files.map { case (fid, rows) =>
      val (k, t0, s0) = rows.head
      fid -> Map(
        "k_bucket" -> IceTransform.BucketT(4).eval(LongType, Long.box(k)).get.toString,
        "ts_day" -> IceTransform.DayT.eval(TimestampType, t0).get.toString,
        "s_trunc" -> IceTransform.TruncateT(2).eval(StringType, s0).get.toString)
    }.toMap
    val df = files.flatMap { case (fid, rows) =>
      rows.map(r => (fid, r._1, r._2, r._3)) }.toDF("fid", "k", "ts", "s")
    // paired (pushdown Filter, row-level Column) generators
    def genConj(): (sources.Filter, Column) = rnd.nextInt(7) match {
      case 0 => val v = rnd.nextInt(40).toLong
        (sources.EqualTo("k", v), col("k") === v)
      case 1 => val vs = Array.fill(3)(rnd.nextInt(40).toLong)
        (sources.In("k", vs.map(_.asInstanceOf[Any])), col("k").isin(vs: _*))
      case 2 => val t0 = ts(rnd.nextInt(15), rnd.nextInt(1440))
        (sources.GreaterThan("ts", t0), col("ts") > lit(t0))
      case 3 => val t0 = ts(rnd.nextInt(15), rnd.nextInt(1440))
        (sources.LessThanOrEqual("ts", t0), col("ts") <= lit(t0))
      case 4 => val v = s"${('a' + rnd.nextInt(3)).toChar}${('a' + rnd.nextInt(3)).toChar}x"
        (sources.EqualTo("s", v), col("s") === v)
      case 5 => (sources.IsNotNull("k"), col("k").isNotNull)
      case 6 =>
        val (f1, c1) = genConj(); val (f2, c2) = genConj()
        (sources.Or(f1, f2), c1 || c2)
    }
    (0 until 25).foreach { trial =>
      val conj = (0 to rnd.nextInt(2)).map(_ => genConj())
      val filters = conj.map(_._1)
      val pred = conj.map(_._2).reduce(_ && _)
      val preds = IcebergPartPrune.derive(filters, spec, schema)
      val kept = files.map(_._1).filter(f => IcebergPartPrune.keep(preds, tuples(f))).toSet
      val matching = df.where(pred).select("fid").distinct().as[Int].collect().toSet
      assert(matching.subsetOf(kept),
        s"trial $trial pruned a matching file: filters=$filters " +
          s"lost=${(matching -- kept).map(tuples)}")
    }
  }

  test("iceberg: foreign transform spellings parse; unknown transforms read but refuse writes") {
    val t = tmpDir("ice-foreign-tr") + "/tbl"
    val ev = spark.read.parquet(s"$sf/events.parquet").select("event_id", "ts", "user_id")
    Iceberg.createTable(t, ev.schema, partitionSpec = Seq("ts" -> "day"))
    Iceberg.append(ev, t)

    // foreign spelling: rewrite the spec to the pluralized "days" form some
    // writers emit, with a custom field name — parse + pruning must hold
    val metaDir = java.nio.file.Paths.get(t, "metadata")
    val v = new String(java.nio.file.Files.readAllBytes(
      metaDir.resolve("version-hint.text")), "UTF-8").trim.toInt
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(
      metaDir.resolve(s"v$v.metadata.json"))).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    import scala.jdk.CollectionConverters._
    root.get("partition-specs").elements().asScala.foreach { s =>
      s.get("fields").elements().asScala.foreach {
        case f: com.fasterxml.jackson.databind.node.ObjectNode =>
          f.put("transform", "days") // pluralized foreign spelling
        case _ =>
      }
    }
    java.nio.file.Files.write(metaDir.resolve(s"v$v.metadata.json"), om.writeValueAsBytes(root))
    val meta = Iceberg.loadMeta(t)
    assert(meta.specFields.map(_.transform) == Seq(IceTransform.DayT))
    val lo = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    assert(Iceberg.read(spark, t, dataFilter = Some(col("ts") >= lit(lo))).count() ==
      ev.where($"ts" >= lit(lo)).count())

    // unknown transform: table still reads (fail open), writes refuse
    root.get("partition-specs").elements().asScala.foreach { s =>
      s.get("fields").elements().asScala.foreach {
        case f: com.fasterxml.jackson.databind.node.ObjectNode =>
          f.put("transform", "zorder17")
        case _ =>
      }
    }
    java.nio.file.Files.write(metaDir.resolve(s"v$v.metadata.json"), om.writeValueAsBytes(root))
    val meta2 = Iceberg.loadMeta(t)
    assert(meta2.specFields.head.transform == IceTransform.UnknownT("zorder17"))
    assert(Iceberg.read(spark, t).count() == ev.count())
    val e = intercept[UnsupportedOperationException](Iceberg.append(ev.limit(1), t))
    assert(e.getMessage.contains("zorder17"))
    // createTable refuses unknown transforms up front
    val e2 = intercept[IllegalArgumentException](
      Iceberg.createTable(tmpDir("ice-bad") + "/tbl", ev.schema,
        partitionSpec = Seq("ts" -> "zorder17")))
    assert(e2.getMessage.contains("zorder17"))
    // and transform/type mismatches (hour over a long) fail before metadata
    intercept[UnsupportedOperationException](
      Iceberg.createTable(tmpDir("ice-bad2") + "/tbl", ev.schema,
        partitionSpec = Seq("user_id" -> "hour")))
  }

  test("iceberg: truncate + void transforms roundtrip; truncate range-prunes") {
    val t = tmpDir("ice-trunc") + "/tbl"
    val n = nation
    Iceberg.createTable(t, n.schema,
      partitionSpec = Seq("n_nationkey" -> "truncate[10]", "n_name" -> "void"))
    Iceberg.append(n, t)
    val meta = Iceberg.loadMeta(t)
    assert(meta.specFields.map(_.transform.json).toSet == Set("truncate[10]", "void"))
    assert(Iceberg.read(spark, t).orderBy("n_nationkey").collect().toSeq ==
      n.orderBy("n_nationkey").collect().toSeq)
    // truncate is order-preserving: n_nationkey >= 20 prunes the 0/10 slabs
    val entries = Iceberg.fileEntries(spark, meta, meta.snapshots.head)
    val preds = IcebergPartPrune.derive(
      graft.catalog.StatsSkip.translate(col("n_nationkey") >= 20),
      meta.specFields, meta.schema)
    val kept = entries.filter(e => IcebergPartPrune.keep(preds, e.partition))
    assert(kept.nonEmpty && kept.size < entries.size)
    assert(kept.forall(_.partition("n_nationkey_trunc").toInt >= 20))
  }

  test("iceberg: nested types roundtrip through schema JSON") {
    val df = Seq((1, Seq(1.5, 2.5), Map("k" -> 1L), (2, "x")))
      .toDF("id", "arr", "m", "st")
    val t = tmpDir("ice-nested") + "/tbl"
    Iceberg.createTable(t, df.schema)
    Iceberg.append(df, t)
    val back = Iceberg.read(spark, t)
    // spark.read relaxes nullability; compare types via SQL form and check
    // the metadata JSON preserved requiredness exactly
    def shape(s: StructType) = s.map(f => (f.name, f.dataType.sql.replace(" NOT NULL", "")))
    assert(shape(back.schema) == shape(df.schema))
    val meta = Iceberg.loadMeta(t)
    assert(meta.schema("id").nullable == df.schema("id").nullable)
    assert(meta.schema("st").dataType.asInstanceOf[StructType]("_2").nullable)
    assert(back.toJSON.collect().toSeq == df.toJSON.collect().toSeq)
  }

  test("iceberg: compatible schema evolution on append — widen, add-nullable") {
    val t = tmpDir("ice-evolve") + "/tbl"
    val v1 = Seq((1, "a", 1.5f), (2, "b", 2.5f)).toDF("id", "name", "score")
    Iceberg.createTable(t, v1.schema)
    Iceberg.append(v1, t)
    val idsBefore = Iceberg.loadMeta(t).fieldIds

    // widened id (int→long), score (float→double), plus a new nullable col
    val v2 = Seq((3L, "c", 3.5d, Some("x")), (4L, "d", 4.5d, None))
      .toDF("id", "name", "score", "tag")
    Iceberg.append(v2, t)

    val meta = Iceberg.loadMeta(t)
    assert(meta.schema("id").dataType == LongType)
    assert(meta.schema("score").dataType == DoubleType)
    assert(meta.schema("tag").dataType == StringType)
    // kept fields keep their ids; the new field gets a fresh one
    assert(idsBefore.forall { case (n, i) => meta.fieldIds(n) == i })
    assert(meta.fieldIds("tag") > idsBefore.values.max)

    val back = Iceberg.read(spark, t)
    assert(back.count() == 4)
    // old files project through the new schema: padded tag, upcast types
    assert(back.where($"id" === 1L).select("tag").collect()(0).isNullAt(0))
    assert(back.where($"id" === 3L).select("tag").as[String].collect().toSeq == Seq("x"))
    assert(back.schema("id").dataType == LongType)
    assert(back.select(sum($"score")).as[Double].collect()(0) == 12.0)

    // a dropped REQUIRED column (id is required in v1) still refuses
    val e = intercept[IllegalArgumentException](
      Iceberg.append(Seq(("e", 5.5d)).toDF("name", "score"), t))
    assert(e.getMessage.contains("required"))
    // a narrower-typed input is NOT an evolution — it casts up at staging
    Iceberg.append(Seq((6, "f", 6.5f, "y")).toDF("id", "name", "score", "tag"), t)
    assert(Iceberg.read(spark, t).where($"id" === 6L).count() == 1)
    // an incompatible type change refuses
    val e2 = intercept[IllegalArgumentException](
      Iceberg.append(
        Seq(("x7", "g", 7.5d, "z")).toDF("id", "name", "score", "tag"), t))
    assert(e2.getMessage.contains("incompatible"))
  }
}
