package graft

import org.apache.spark.sql.functions._

import graft.interop.Hudi

/** Hudi read-side data skipping: footer-stats pass over pure base-file
  * slices; log-carrying slices are never skipped. */
class HudiStatsSpec extends SparkSpec {
  import spark.implicits._

  test("dataFilter skips base files; MoR log slices keep masking") {
    val t = tmpDir("hudi-stats") + "/t"
    val df = spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    Hudi.write(df, t, tableType = "MERGE_ON_READ", recordKeyFields = Seq("id"))
    val filtered = Hudi.read(spark, t,
      dataFilter = Some(col("id") >= 250 && col("id") < 500))
    assert(filtered.count() == 250)
    assert(filtered.inputFiles.length <= 2,
      s"expected base-slice skipping, planned ${filtered.inputFiles.length}/4")
    // log upsert moves id=300's v OUT of a value-filter range; the slice now
    // carries a log, so it must not be skipped and the merge must win
    Hudi.upsertLog(Seq((300L, 999999L)).toDF("id", "v"), t)
    val byV = Hudi.read(spark, t, dataFilter = Some(col("v") < 1000))
    assert(!byV.as[(Long, Long)].collect().exists(_._1 == 300L),
      "stale base row for id=300 resurrected through skipping")
    // key filter on the logged slice still returns the merged row
    val merged = Hudi.read(spark, t, dataFilter = Some(col("id") === 300))
      .as[(Long, Long)].collect().toSeq
    assert(merged == Seq((300L, 999999L)))
  }
}
