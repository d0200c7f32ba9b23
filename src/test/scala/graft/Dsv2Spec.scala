package graft

import org.apache.spark.sql.functions._

import graft.catalog._
import graft.model._

/** DSv2 connector: SQL visibility + pushdown plan assertions. */
class Dsv2Spec extends SparkSpec {
  import spark.implicits._

  test("spark.sql over a graft catalog: filters and columns push to the scan") {
    val root = tmpDir("graft-dsv2")
    val cat = new GraftCatalog(spark, root)
    cat.writeToTable(
      (1L to 500L).map(i => (i, s"name$i", (i % 7).toInt)).toDF("id", "name", "grp"),
      "ns.t")
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)

    val df = spark.sql("SELECT name FROM graft.ns.t WHERE grp = 3 LIMIT 10")
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [EqualTo(grp,3)]"),
      s"filter not pushed:\n$plan")
    // Column pruning: the scan reads only (name, grp), never id.
    val readSchema = "ReadSchema: struct<" + plan.split("ReadSchema: struct<")(1).split(">")(0) + ">"
    assert(!readSchema.contains("id"), s"id not pruned: $readSchema")

    assert(spark.sql("SHOW TABLES IN graft.ns").collect().map(_.getString(1)).contains("t"))
  }

  test("SQL INSERT INTO / OVERWRITE and writeTo().append() commit through the catalog") {
    val root = tmpDir("graft-dsv2w")
    val cat = new GraftCatalog(spark, root)
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.w")
    spark.conf.set("spark.sql.catalog.graftw", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftw.root", root)

    spark.sql("INSERT INTO graftw.ns.w VALUES (2, 'b'), (3, 'c')")
    assert(cat.readTable("ns.w").count() == 3)
    // The SQL insert is a real MVCC commit: the delta log grew.
    assert(cat.deltaLog("ns.w").size == 2)

    Seq((4L, "d")).toDF("id", "v").writeTo("graftw.ns.w").append()
    assert(spark.sql("SELECT id FROM graftw.ns.w").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))

    spark.sql("INSERT OVERWRITE graftw.ns.w VALUES (9, 'z')")
    assert(cat.readTable("ns.w").as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    // REPLACE truncates the EFFECTIVE log to the replacing delta.
    assert(cat.deltaLog("ns.w").size == 1)

    // Merge-keyed table: INSERT takes AUTO semantics = upsert by key.
    cat.createTable("ns.mk", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType))))
    spark.sql("INSERT INTO graftw.ns.mk VALUES (1, 'x'), (1, 'y'), (2, 'b')")
    assert(cat.readTable("ns.mk").count() == 2)
    spark.sql("INSERT INTO graftw.ns.mk VALUES (1, 'upd')")
    assert(cat.readTable("ns.mk").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "upd"), (2L, "b")))
  }

  test("DSv2 reads non-parquet content types through the matching file table") {
    val root = tmpDir("graft-dsv2c")
    val cat = new GraftCatalog(spark, root)
    val df = Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "v")
    cat.createTable("ns.c", df.schema, properties = Map("content_type" -> "tsv"))
    cat.writeToTable(df, "ns.c", WriteMode.Add)
    val got = spark.read.format("graft").option("root", root).option("table", "ns.c")
      .load().orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, null), (3L, "c")))
  }

  test("format reader with time travel option; merge-on-read tables rejected") {
    val root = tmpDir("graft-dsv2b")
    val cat = new GraftCatalog(spark, root)
    cat.writeToTable(Seq((1L, "v1")).toDF("id", "v"), "ns.t")
    val t1 = cat.store.history().head.endTimeMillis
    cat.writeToTable(Seq((2L, "v2")).toDF("id", "v"), "ns.t", WriteMode.Add)

    val now = spark.read.format("graft").option("root", root).option("table", "ns.t").load()
    assert(now.count() == 2)
    val then = spark.read.format("graft").option("root", root).option("table", "ns.t")
      .option("asOf", t1.toString).load()
    assert(then.count() == 1)

    // A table with pending (uncompacted) merge deltas must be rejected.
    val schema = org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType)))
    cat.createTable("ns.m", schema, properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.m", WriteMode.Merge)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("root", root).option("table", "ns.m").load().count()
    }
    assert(e.getMessage.contains("unresolved merge delta"))
    // After compaction the same table serves fine.
    cat.compact("ns.m")
    assert(spark.read.format("graft").option("root", root).option("table", "ns.m")
      .load().count() == 1)
  }
}
