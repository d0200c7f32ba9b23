package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.interop.Iceberg

/** Iceberg manifest column bounds: spec single-value codec roundtrip,
  * write-side bounds, read-side data skipping. */
class IcebergStatsSpec extends SparkSpec {
  import spark.implicits._

  test("single-value serialization roundtrips across types") {
    def rt(dt: DataType, canonical: String): String =
      Iceberg.boundCanonical(dt, Iceberg.boundBytes(dt, canonical).get).get
    assert(rt(IntegerType, "42") == "42" && rt(IntegerType, "-7") == "-7")
    assert(rt(LongType, "9999999999") == "9999999999")
    assert(rt(DoubleType, "3.25") == "3.25" && rt(FloatType, "1.5") == "1.5")
    assert(rt(StringType, "héllo") == "héllo")
    assert(rt(BooleanType, "true") == "true")
    assert(rt(DateType, "2024-06-30") == "2024-06-30")
    assert(rt(TimestampType, "2024-06-30 12:34:56.789012") == "2024-06-30 12:34:56.789012")
    assert(rt(DecimalType(10, 2), "123.45") == "123.45")
    assert(rt(DecimalType(10, 2), "-0.01") == "-0.01")
    // little-endian layout pinned (spec): int 1 -> 01 00 00 00
    assert(Iceberg.boundBytes(IntegerType, "1").get.toSeq ==
      Seq[Byte](1, 0, 0, 0))
  }

  test("write records bounds; read with dataFilter skips data files") {
    val dir = tmpDir("iceberg-stats")
    val t = s"$dir/t"
    val df = spark.range(0, 1000).select(col("id"),
        concat(lit("n"), format_string("%04d", col("id"))).as("name"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    Iceberg.createTable(t, df.schema)
    Iceberg.append(df, t)
    // manifest entries expose per-field bounds
    val meta0 = Iceberg.read(spark, t) // smoke
    assert(meta0.count() == 1000)
    val filtered = Iceberg.read(spark, t,
      dataFilter = Some(col("id") >= 250 && col("id") < 500))
    assert(filtered.count() == 250)
    assert(filtered.inputFiles.length <= 2,
      s"expected manifest-bounds skipping, planned ${filtered.inputFiles.length}/4")
    // string bounds skip too
    val s = Iceberg.read(spark, t, dataFilter = Some(col("name") < "n0100"))
    assert(s.count() == 100)
    assert(s.inputFiles.length <= 2)
    // equality-delete then filter: deletes still mask under skipping
    Iceberg.commitEqualityDeletes(spark, t,
      Seq(300L).toDF("id"), Seq("id"))
    val after = Iceberg.read(spark, t,
      dataFilter = Some(col("id") >= 250 && col("id") < 500))
    assert(after.count() == 249)
  }
}
