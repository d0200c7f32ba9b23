package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/** Regressions for the round-3 code-review findings. */
class ReviewFixesSpec extends SparkSpec {
  import spark.implicits._

  test("delimited partial-column deltas align by written schema, not position") {
    // The killer case: merge key is NOT the first schema column, so a
    // delete file (key column only) would positionally misalign under the
    // full csv schema.
    val cat = new GraftCatalog(spark, tmpDir("graft-rf1"))
    cat.createTable("r.t", StructType(Seq(
      FieldMeta.field("v", StringType),
      FieldMeta.field("k", IntegerType, nullable = false, mergeKey = true))),
      properties = Map("content_type" -> "tsv", "read_optimization" -> "NONE"))
    cat.writeToTable(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("v", "k"), "r.t", WriteMode.Merge)
    cat.writeToTable(Seq(Tuple1(2)).toDF("k"), "r.t", WriteMode.Delete)
    val got = cat.readTable("r.t").orderBy("k").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got.toSeq == Seq(("a", 1), ("c", 3)), s"got ${got.toSeq}")
    // Partial upsert (key + no v) preserves v for untouched rows.
    cat.writeToTable(Seq((9, "Z")).toDF("k", "v").select("v", "k")
      .where(lit(false)).unionByName(Seq(("Z", 1)).toDF("v", "k")), "r.t", WriteMode.Merge)
    assert(cat.readTable("r.t").where($"k" === 1).select("v").head().getString(0) == "Z")
  }

  test("empty-frame writes commit cleanly (stats over zero rows)") {
    val cat = new GraftCatalog(spark, tmpDir("graft-rf2"))
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "r.t")
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v").where(lit(false)), "r.t", WriteMode.Add)
    assert(cat.readTable("r.t").count() == 1)
  }

  test("bulk-load delta is visible to the change feed and streaming source") {
    val root = tmpDir("graft-rf3")
    val cat = new GraftCatalog(spark, root)
    cat.createTable("r.m", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))))
    cat.writeToTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "r.m", WriteMode.Merge)
    // First merge write took the bulk-load path (committed as compacted)…
    assert(cat.deltaLog("r.m").head.properties.get("bulk_load").contains("true"))
    // …and must still appear in the CDC feed and the stream.
    assert(cat.readChanges("r.m").count() == 2)
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "r.m").option("ignoreChanges", "true").load()
      .writeStream.format("memory").queryName("rf3_sink")
      .option("checkpointLocation", tmpDir("graft-rf3-ck")).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM rf3_sink").count() == 2)
    } finally q.stop()
  }

  test("auto-compaction honors the default namespace for unqualified names") {
    val cat = new GraftCatalog(spark, tmpDir("graft-rf4"))
    cat.defaultNamespace = "work"
    cat.createTable("t", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))))
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "t", WriteMode.Merge)
    cat.writeToTable(Seq((1L, "b")).toDF("id", "v"), "t", WriteMode.Merge)
    // MAX optimization: the upsert must have been compacted away.
    val (_, pending) = MergeRead.activeDeltas(cat.effectiveDeltas(cat.handleOf("t"), None))
    assert(pending.isEmpty, s"auto-compaction missed the default-namespace table: $pending")
    assert(cat.readTable("t").select("v").head().getString(0) == "b")
  }

  test("streaming a csv-typed table reads the declared format") {
    val root = tmpDir("graft-rf5")
    val cat = new GraftCatalog(spark, root)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    cat.createTable("r.c", df.schema, properties = Map("content_type" -> "csv"))
    cat.writeToTable(df, "r.c", WriteMode.Add)
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "r.c").load()
      .writeStream.format("memory").queryName("rf5_sink")
      .option("checkpointLocation", tmpDir("graft-rf5-ck")).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM rf5_sink").count() == 2)
    } finally q.stop()
  }

  test("SQL CREATE TABLE PARTITIONED BY wires the partition scheme through") {
    val root = tmpDir("graft-rf6")
    val cn = s"graft_rf6_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cn", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cn.root", root)
    spark.sql(s"CREATE TABLE $cn.ns.t (id BIGINT, grp INT) PARTITIONED BY (grp)")
    val cat = new GraftCatalog(spark, root)
    val meta = cat.getTableMeta("ns.t")
    assert(meta.partitionKeys == Seq(Seq("grp", "identity")), s"got ${meta.partitionKeys}")
    // Valueless URL flags no longer crash parsing.
    assert(graft.io.UrlIO.parse("/data/f.csv?header").asInstanceOf[graft.io.UrlIO.FileTarget]
      .options.get("header").contains("true"))
  }
}
