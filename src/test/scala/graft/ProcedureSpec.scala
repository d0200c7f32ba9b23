package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/** SQL stored procedures (CALL cat.system.*). */
class ProcedureSpec extends SparkSpec {

  private def registered(tag: String): (String, GraftCatalog) = {
    val root = tmpDir(s"graft-proc-$tag")
    val cn = s"gproc$tag"
    spark.conf.set(s"spark.sql.catalog.$cn", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cn.root", root)
    (cn, new GraftCatalog(spark, root))
  }

  test("CALL system.compact and system.analyze run through SQL") {
    val (cn, cat) = registered("a")
    cat.createTable("q.t", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", LongType))),
      properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable(spark.range(0, 100).select(col("id"), (col("id") * 2).as("v")),
      "q.t", WriteMode.Merge)
    cat.writeToTable(spark.range(0, 10).select(col("id"), lit(0L).as("v")),
      "q.t", WriteMode.Merge)
    val res = spark.sql(s"CALL $cn.system.compact(`table` => 'q.t')").collect()
    assert(res.head.getString(0).contains("compacted q.t"))
    val (_, pending) = MergeRead.activeDeltas(cat.deltaLog("q.t"))
    assert(!pending.exists(d => d.typed == DeltaType.Upsert || d.typed == DeltaType.Delete))
    val a = spark.sql(s"CALL $cn.system.analyze(`table` => 'q.t')").collect()
    assert(a.head.getString(0).contains("backfilled stats for 0"))
    val e = spark.sql(s"CALL $cn.system.estimate(`table` => 'q.t')").collect()
    assert(e.head.getString(0).contains("rows in") &&
      e.head.getString(0).contains("content_type_meta"), e.head.getString(0))
  }

  test("CALL system.trim_history and system.vacuum run the retention cycle through SQL") {
    val (cn, cat) = registered("v")
    cat.createTable("q.v", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", LongType))),
      properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable(spark.range(0, 2000).select(col("id"), (col("id") * 2).as("v")),
      "q.v", WriteMode.Merge)
    cat.compact("q.v")
    cat.writeToTable(spark.range(0, 2000).where(col("id") % 2 === 0)
      .select(col("id"), lit(0L).as("v")), "q.v", WriteMode.Merge)
    cat.compact("q.v")
    Thread.sleep(20)
    val t = spark.sql(s"CALL $cn.system.trim_history(`table` => 'q.v', retention_ms => 0)")
      .collect().head.getString(0)
    assert(t.matches("trimmed \\d+ metafile\\(s\\) of q.v") && !t.startsWith("trimmed 0"), t)
    // default margin: reclaim gated right after the trim
    val gated = spark.sql(s"CALL $cn.system.vacuum(`table` => 'q.v')")
      .collect().head.getString(0)
    assert(gated == "vacuum reclaimed 0 file(s) of q.v", gated)
    // dry run previews without deleting; the real call matches the preview
    val dry = spark.sql(
      s"CALL $cn.system.vacuum(`table` => 'q.v', dry_run => true, min_age_ms => 0)")
      .collect().head.getString(0)
    val n = dry.stripPrefix("vacuum would reclaim ").takeWhile(_.isDigit).toLong
    assert(n >= 1, dry)
    val real = spark.sql(
      s"CALL $cn.system.vacuum(`table` => 'q.v', min_age_ms => 0)")
      .collect().head.getString(0)
    assert(real == s"vacuum reclaimed $n file(s) of q.v", real)
    assert(cat.readTable("q.v").count() == 2000)
  }

  test("CALL system.zorder reclusters; SHOW PROCEDURES lists them") {
    val (cn, cat) = registered("b")
    cat.createTable("q.g", StructType(Seq(
      FieldMeta.field("x", LongType, nullable = false),
      FieldMeta.field("y", LongType, nullable = false))),
      properties = Map("compaction.max_records_per_file" -> "256"))
    cat.writeToTable(spark.range(0, 4096).select(
      (col("id") % 64).as("x"), shiftright(col("id"), 6).as("y")), "q.g")
    spark.sql(s"CALL $cn.system.zorder(`table` => 'q.g', columns => 'x,y')").collect()
    val d = cat.deltaLog("q.g").filter(_.compactedUpTo >= 0).last
    assert(d.properties.get("zordered").contains("x,y"))
    val yf = cat.readTable("q.g", ReadOptions(rowFilter = Some(col("y") < 8)))
    assert(yf.count() == 8 * 64)
    assert(yf.inputFiles.length <= cat.readTable("q.g").inputFiles.length / 2)
    val procs = spark.sql(s"SHOW PROCEDURES IN $cn.system").collect().map(_.toString)
    assert(procs.exists(_.contains("compact")) && procs.exists(_.contains("zorder")))
    val j = spark.sql(s"CALL $cn.system.janitor()").collect()
    assert(j.head.getString(0).contains("txn"))
  }
}
