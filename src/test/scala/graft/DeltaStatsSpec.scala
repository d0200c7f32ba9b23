package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.interop.{DeltaLake, DeltaStats}
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
}
