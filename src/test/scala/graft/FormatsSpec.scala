package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/** Graft's own Avro and Feather (Arrow IPC) FileFormats: typed roundtrips,
  * schema-evolution reads (absent columns null, numeric widening), and full
  * catalog LSM integration (merge, delete, compaction). */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val formats = Seq("avro", "feather")

  test("typed roundtrip: primitives, date, binary, array, map, struct, nulls") {
    val df = Seq(
      (1L, "alpha", 1.5, java.sql.Date.valueOf("2024-01-02"), Array[Byte](1, 2),
        Seq(1, 2, 3), Map("k" -> 1L), (7, "in")),
      (2L, null.asInstanceOf[String], -0.25, null.asInstanceOf[java.sql.Date],
        null.asInstanceOf[Array[Byte]], Seq.empty[Int], Map.empty[String, Long],
        (8, null.asInstanceOf[String])))
      .toDF("id", "s", "d", "dt", "bin", "arr", "m", "st")
    for (fmt <- formats) {
      val out = tmpDir(s"fmt-rt-$fmt")
      df.write.format(fmt).mode("overwrite").save(out)
      val back = spark.read.schema(df.schema).format(fmt).load(out)
      // compare via json so binary/map/struct compare by VALUE
      assert(back.toJSON.collect().sorted.toSeq == df.toJSON.collect().sorted.toSeq,
        s"$fmt roundtrip mismatch")
      // schemaless read infers the written schema
      val inferred = spark.read.format(fmt).load(out).schema
      assert(inferred.fieldNames.toSeq == df.schema.fieldNames.toSeq, s"$fmt inference")
    }
  }

  test("timestamp and decimal roundtrip") {
    val df = Seq(
      (1L, "2024-03-01 10:30:00", BigDecimal("1234.56")),
      (2L, "2024-03-02 23:59:59", BigDecimal("-0.01")))
      .toDF("id", "ts", "dec")
      .select($"id", $"ts".cast("timestamp_ntz").as("ts"), $"dec".cast(DecimalType(10, 2)).as("dec"))
    for (fmt <- formats) {
      val out = tmpDir(s"fmt-ts-$fmt")
      df.write.format(fmt).mode("overwrite").save(out)
      val back = spark.read.schema(df.schema).format(fmt).load(out)
      assert(back.toJSON.collect().sorted.toSeq == df.toJSON.collect().sorted.toSeq,
        s"$fmt ts/decimal mismatch")
    }
  }

  test("evolved reads: absent column null-fills, int widens to long/double") {
    for (fmt <- formats) {
      val out = tmpDir(s"fmt-ev-$fmt")
      Seq((1, 10), (2, 20)).toDF("k", "v").write.format(fmt).mode("overwrite").save(out)
      val evolved = spark.read.schema(StructType(Seq(
        StructField("k", LongType), StructField("v", DoubleType),
        StructField("w", StringType)))).format(fmt).load(out)
      val got = evolved.as[(Long, Double, Option[String])].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 10.0, None), (2L, 20.0, None)), s"$fmt evolved read: $got")
    }
  }

  test("content_encoding codecs: avro container codec, feather IPC body compression") {
    val df = (1L to 200L).map(i => (i, s"value-$i" * 5)).toDF("id", "v")
    // avro: gzip->deflate rides the container header, reads transparent
    for (enc <- Seq("gzip", "snappy", "zstd")) {
      val cat = new GraftCatalog(spark, tmpDir(s"fmt-enc-avro-$enc"))
      cat.createTable("f.z", df.schema, properties = Map(
        "content_type" -> "avro", "content_encoding" -> enc))
      cat.writeToTable(df, "f.z", WriteMode.Add)
      assert(cat.readTable("f.z").as[(Long, String)].collect().sorted.toSeq ==
        df.as[(Long, String)].collect().sorted.toSeq, s"avro/$enc roundtrip")
    }
    // feather: arrow IPC bodies compress with zstd/lz4
    for (enc <- Seq("zstd", "lz4")) {
      val cat = new GraftCatalog(spark, tmpDir(s"fmt-enc-fth-$enc"))
      cat.createTable("f.z", df.schema, properties = Map(
        "content_type" -> "feather", "content_encoding" -> enc))
      cat.writeToTable(df, "f.z", WriteMode.Add)
      assert(cat.readTable("f.z").as[(Long, String)].collect().sorted.toSeq ==
        df.as[(Long, String)].collect().sorted.toSeq, s"feather/$enc roundtrip")
    }
    // unsupported combination fails loudly at write, not with corrupt files
    val cat = new GraftCatalog(spark, tmpDir("fmt-enc-bad"))
    cat.createTable("f.z", df.schema, properties = Map(
      "content_type" -> "feather", "content_encoding" -> "gzip"))
    intercept[Exception] { cat.writeToTable(df, "f.z", WriteMode.Add) }
  }

  test("nested-struct schema evolution on avro/feather tables") {
    // both readers resolve nested fields by NAME, so evolved reads of old
    // files (widened nested int->long, appended nested field) must work
    // exactly like the parquet path (c39)
    for (fmt <- formats) {
      val cat = new GraftCatalog(spark, tmpDir(s"fmt-nest-$fmt"))
      val w1 = Seq((1L, (10, "x"))).toDF("id", "meta")
        .select($"id", $"meta".cast(StructType(Seq(
          StructField("a", IntegerType), StructField("b", StringType)))).as("meta"))
      val w2 = Seq((2L, (20L, "zz"))).toDF("id", "meta")
        .select($"id", $"meta".cast(StructType(Seq(
          StructField("a", LongType), StructField("c", StringType)))).as("meta"))
      cat.createTable("f.n", w1.schema, properties = Map("content_type" -> fmt))
      cat.writeToTable(w1, "f.n", WriteMode.Add)
      cat.writeToTable(w2, "f.n", WriteMode.Add)
      val rows = cat.readTable("f.n")
        .select($"id", $"meta.a", $"meta.b", $"meta.c")
        .as[(Long, Long, Option[String], Option[String])].collect().sortBy(_._1).toSeq
      assert(rows == Seq((1L, 10L, Some("x"), None), (2L, 20L, None, Some("zz"))),
        s"$fmt nested evolution: $rows")
    }
  }

  test("unescaped TSV: raw values, quotes untouched, roundtrips through merge") {
    val cat = new GraftCatalog(spark, tmpDir("fmt-utsv"))
    cat.createTable("f.u", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))), properties = Map(
      "content_type" -> "unescaped_tsv", "read_optimization" -> "NONE"))
    // values with embedded double quotes and commas must ride raw
    val rows = Seq((1L, """he said "hi", twice"""), (2L, "plain"), (3L, "a'b\"c"))
    cat.writeToTable(rows.toDF("id", "v"), "f.u", WriteMode.Merge)
    cat.writeToTable(Seq((2L, """now "quoted"""")).toDF("id", "v"), "f.u", WriteMode.Merge)
    val got = cat.readTable("f.u").as[(Long, String)].collect().toMap
    assert(got(1L) == """he said "hi", twice""" && got(2L) == """now "quoted"""" &&
      got(3L) == "a'b\"c", got.toString)
    // the physical file carries the quote characters verbatim (no quoting)
    val path = cat.manifestTable("f.u").select("path").as[String].collect()
      .find(_.nonEmpty).get
    val raw = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    assert(raw.contains("he said \"hi\", twice") || raw.contains("now \"quoted\""),
      s"unescaped tsv should carry raw quotes:\n$raw")
  }

  test("avro evolved reads honor file logical types: decimal rescale, date->timestamp") {
    val cat = new GraftCatalog(spark, tmpDir("fmt-avro-logical"))
    val t1 = StructType(Seq(StructField("id", LongType),
      StructField("dec", DecimalType(10, 2)), StructField("dt", DateType)))
    cat.createTable("f.l", t1, properties = Map("content_type" -> "avro"))
    cat.writeToTable(Seq((1L, "1234.56", "2024-01-02")).toDF("id", "dec", "dt")
      .select($"id", $"dec".cast(DecimalType(10, 2)).as("dec"), $"dt".cast(DateType).as("dt")),
      "f.l", WriteMode.Add)
    // second write widens dec -> (12,4) and dt -> timestamp (lattice moves)
    cat.writeToTable(Seq((2L, "0.1234", "2024-02-03 10:30:00")).toDF("id", "dec", "dt")
      .select($"id", $"dec".cast(DecimalType(12, 4)).as("dec"),
        $"dt".cast(TimestampType).as("dt")),
      "f.l", WriteMode.Add)
    val got = cat.readTable("f.l")
      .select($"id", $"dec".cast(StringType), $"dt".cast(StringType))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    // old row: unscaled 123456 at file scale 2 must NOT be reinterpreted at
    // scale 4 (= 12.3456); the date is midnight in the session tz, not
    // day-count-as-microseconds (= 1970-01-01 00:00:00.019724)
    assert(got == Seq((1L, "1234.5600", "2024-01-02 00:00:00"),
      (2L, "0.1234", "2024-02-03 10:30:00")), got.toString)
  }

  test("feather widen path: maps survive, array elements widen") {
    val cat = new GraftCatalog(spark, tmpDir("fmt-fth-widen"))
    val w1 = Seq((1, Map("a" -> 1), Seq(1, 2))).toDF("k", "m", "arr")
    cat.createTable("f.w", w1.schema, properties = Map("content_type" -> "feather"))
    cat.writeToTable(w1, "f.w", WriteMode.Add)
    // k widens to long and arr's elements widen to long; m is untouched but
    // rides the same per-row widen projection
    val w2 = Seq((2L, Map("b" -> 2), Seq(9L))).toDF("k", "m", "arr")
    cat.writeToTable(w2, "f.w", WriteMode.Add)
    val got = cat.readTable("f.w")
      .select($"k", map_keys($"m")(0), $"arr")
      .as[(Long, String, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", Seq(1L, 2L)), (2L, "b", Seq(9L))), got.toString)
  }

  test("catalog LSM on avro/feather tables: merge, delete, compact, read") {
    for (fmt <- formats) {
      val cat = new GraftCatalog(spark, tmpDir(s"fmt-cat-$fmt"))
      cat.createTable("f.t", StructType(Seq(
        FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", StringType))), properties = Map(
        "content_type" -> fmt, "read_optimization" -> "NONE"))
      cat.writeToTable((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), "f.t", WriteMode.Merge)
      cat.writeToTable(Seq((7L, "updated")).toDF("id", "v"), "f.t", WriteMode.Merge)
      cat.writeToTable(Seq(9L).toDF("id"), "f.t", WriteMode.Delete)
      cat.compact("f.t")
      val got = cat.readTable("f.t").select("id", "v").as[(Long, String)].collect().toMap
      assert(got.size == 49 && got(7L) == "updated" && !got.contains(9L) && got(8L) == "v8",
        s"$fmt catalog merge state wrong")
      val paths = cat.manifestTable("f.t").select("path").as[String].collect()
      assert(paths.nonEmpty && paths.forall(_.endsWith(s".$fmt")),
        s"$fmt extension: ${paths.take(3).mkString(",")}")
      cat.dropTable("f.t")
    }
  }
}
