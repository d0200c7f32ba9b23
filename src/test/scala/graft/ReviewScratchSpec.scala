package graft

import org.apache.spark.sql.types._
import graft.catalog._
import graft.model._

class ReviewScratchSpec extends SparkSpec {

  private def newCatalog(): GraftCatalog = {
    val dir = java.nio.file.Files.createTempDirectory("graft-review").toString
    new GraftCatalog(spark, dir)
  }

  test("merge_order ASC keeps smallest value across commits") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      FieldMeta.field("id", IntegerType, mergeKey = true),
      FieldMeta.field("prio", IntegerType, mergeOrder = Some("ASC")),
      FieldMeta.field("v", StringType)))
    cat.createTable("mo.t", schema,
      properties = Map("read_optimization" -> "NONE"))
    import spark.implicits._
    cat.writeToTable(Seq((1, 5, "five")).toDF("id", "prio", "v"), "mo.t", WriteMode.Merge)
    cat.writeToTable(Seq((1, 9, "nine")).toDF("id", "prio", "v"), "mo.t", WriteMode.Merge)
    cat.writeToTable(Seq((1, 3, "three")).toDF("id", "prio", "v"), "mo.t", WriteMode.Merge)
    val rows = cat.readTable("mo.t").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("v") == "three", rows.mkString(","))
  }

  test("event-time fallback keeps latest event not latest commit") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      FieldMeta.field("id", IntegerType, mergeKey = true),
      FieldMeta.field("et", LongType, eventTime = true),
      FieldMeta.field("v", StringType)))
    cat.createTable("mo.e", schema, properties = Map("read_optimization" -> "NONE"))
    import spark.implicits._
    cat.writeToTable(Seq((1, 100L, "new")).toDF("id", "et", "v"), "mo.e", WriteMode.Merge)
    // later commit but OLDER event — should NOT win
    cat.writeToTable(Seq((1, 50L, "stale")).toDF("id", "et", "v"), "mo.e", WriteMode.Merge)
    val rows = cat.readTable("mo.e").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("v") == "new", rows.mkString(","))
  }

  test("bucket-pruned merge read after compaction is correct") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      FieldMeta.field("id", IntegerType, mergeKey = true),
      FieldMeta.field("v", StringType)))
    cat.createTable("bp.t", schema, properties = Map("read_optimization" -> "NONE"))
    import spark.implicits._
    cat.writeToTable((1 to 50).map(i => (i, s"v$i")).toDF("id", "v"), "bp.t", WriteMode.Merge)
    cat.compact("bp.t", numBuckets = 4)
    // pending upsert touching a few keys + a delete
    cat.writeToTable(Seq((7, "seven!"), (20, "twenty!")).toDF("id", "v"), "bp.t", WriteMode.Merge)
    cat.writeToTable(Seq(3).toDF("id"), "bp.t", WriteMode.Delete)
    val rows = cat.readTable("bp.t").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows.size == 49, s"expected 49 rows, got ${rows.size}")
    assert(rows(7) == "seven!")
    assert(rows(20) == "twenty!")
    assert(!rows.contains(3))
    assert(rows(10) == "v10")
    // limit pushdown
    assert(cat.readTable("bp.t", ReadOptions(limit = Some(5))).collect().length == 5)
  }

  test("partial upsert via aggregate path preserves merge_order-less semantics") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      FieldMeta.field("id", IntegerType, mergeKey = true),
      FieldMeta.field("a", StringType),
      FieldMeta.field("b", StringType)))
    cat.createTable("pu.t", schema, properties = Map("read_optimization" -> "NONE"))
    import spark.implicits._
    cat.writeToTable(Seq((1, "a1", "b1")).toDF("id", "a", "b"), "pu.t", WriteMode.Merge)
    cat.writeToTable(Seq((1, "a2")).toDF("id", "a"), "pu.t", WriteMode.Merge) // omits b
    // delete then re-insert partially: b must NOT resurrect from pre-tombstone row
    cat.writeToTable(Seq(1).toDF("id"), "pu.t", WriteMode.Delete)
    cat.writeToTable(Seq((1, "a3")).toDF("id", "a"), "pu.t", WriteMode.Merge)
    val r = cat.readTable("pu.t").collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("a") == "a3")
    assert(r.head.getAs[String]("b") == null, s"b resurrected: ${r.head}")
  }
}
