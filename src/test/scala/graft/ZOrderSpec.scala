package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/** Z-order clustering: Morton-code sort at compaction + 2-D file skipping. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits (identity scaling)") {
    val schema = StructType(Seq(StructField("x", LongType), StructField("y", LongType)))
    val spec = Seq(("x", 0.0, 65535.0), ("y", 0.0, 65535.0))
    val z = ZOrder.zvalue(schema, spec)
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (0L, 2L))
      .toDF("x", "y").select(z.as("z")).as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 4L, 8L))
  }

  test("zvalue of one column degenerates to a plain rank sort") {
    val schema = StructType(Seq(StructField("x", LongType)))
    val z = ZOrder.zvalue(schema, Seq(("x", 0.0, 65535.0)))
    val got = Seq(5L, 0L, 65535L).toDF("x").select(z.as("z")).as[Long].collect().toSeq
    assert(got == Seq(5L, 0L, 65535L))
  }

  test("z-ordered compaction prunes files on BOTH dimensions") {
    val cat = new GraftCatalog(spark, tmpDir("graft-z"))
    cat.createTable("q.grid", StructType(Seq(
      FieldMeta.field("x", LongType, nullable = false),
      FieldMeta.field("y", LongType, nullable = false),
      FieldMeta.field("payload", StringType))),
      properties = Map(
        ZOrder.Prop -> "x,y",
        "compaction.max_records_per_file" -> "256"))
    // 64x64 grid, written in row-major order (worst case for y-locality).
    val grid = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), shiftright(col("id"), 6).as("y"),
      concat(lit("p"), col("id")).as("payload"))
    cat.writeToTable(grid, "q.grid")
    cat.compact("q.grid")
    val total = cat.readTable("q.grid").inputFiles.length
    assert(total >= 8, s"expected many files, got $total")
    val xf = cat.readTable("q.grid", ReadOptions(rowFilter = Some(col("x") < 8)))
    val yf = cat.readTable("q.grid", ReadOptions(rowFilter = Some(col("y") < 8)))
    assert(xf.count() == 8 * 64 && yf.count() == 8 * 64)
    assert(xf.inputFiles.length <= total / 2,
      s"x-filter planned ${xf.inputFiles.length}/$total files")
    assert(yf.inputFiles.length <= total / 2,
      s"y-filter planned ${yf.inputFiles.length}/$total files")
    // point lookup in both dims: a small corner of the space
    val pt = cat.readTable("q.grid",
      ReadOptions(rowFilter = Some(col("x") === 3 && col("y") === 3)))
    assert(pt.count() == 1)
    assert(pt.inputFiles.length <= math.max(1, total / 4))
  }

  test("setting zorder on a compacted KEYED table reclusters on next compact (review fix)") {
    val cat = new GraftCatalog(spark, tmpDir("graft-zk"))
    cat.createTable("q.k", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("x", LongType),
      FieldMeta.field("y", LongType))),
      properties = Map("compaction.max_records_per_file" -> "256"))
    cat.writeToTable(spark.range(0, 4096).select(col("id"),
      (col("id") % 64).as("x"), shiftright(col("id"), 6).as("y")), "q.k", WriteMode.Merge)
    cat.compact("q.k")
    // nothing pending now; declaring z-order must still trigger a recluster
    cat.alterTable("q.k", setProperties = Map(ZOrder.Prop -> "x,y"))
    cat.compact("q.k")
    val d = cat.deltaLog("q.k").filter(_.compactedUpTo >= 0).last
    assert(d.properties.get("zordered").contains("x,y"))
    val yf = cat.readTable("q.k", ReadOptions(rowFilter = Some(col("y") < 8)))
    assert(yf.count() == 8 * 64)
    // and the next compact with nothing pending is a no-op (tag present)
    val before = cat.deltaLog("q.k").size
    cat.compact("q.k")
    assert(cat.deltaLog("q.k").size == before)
  }

  test("incremental recluster: z-tagged base is copied by reference") {
    val cat = new GraftCatalog(spark, tmpDir("graft-zi"))
    cat.createTable("q.inc", StructType(Seq(
      FieldMeta.field("x", LongType, nullable = false),
      FieldMeta.field("y", LongType, nullable = false))),
      properties = Map(ZOrder.Prop -> "x,y",
        "compaction.max_records_per_file" -> "128"))
    cat.writeToTable(spark.range(0, 1024).select((col("id") % 32).as("x"), shiftright(col("id"), 5).as("y")), "q.inc")
    cat.compact("q.inc")
    val d1 = cat.deltaLog("q.inc").filter(_.compactedUpTo >= 0).last
    assert(d1.properties.get("zordered").contains("x,y"))
    // Append a tail and recompact: the z-ordered base must not be rewritten.
    cat.writeToTable(spark.range(1024, 1100).select((col("id") % 32).as("x"), shiftright(col("id"), 5).as("y")), "q.inc")
    cat.compact("q.inc")
    val d2 = cat.deltaLog("q.inc").filter(_.compactedUpTo >= 0).last
    assert(d2.properties("copied_by_reference").toInt == d1.entries.size)
    assert(cat.readTable("q.inc").count() == 1100)
  }

  test("declared sort scheme materializes at compaction on append-only tables, incrementally") {
    // A pure manifest fold would never apply the scheme (appends land
    // unsorted, nothing else rewrites them) — compaction must sort, and a
    // sorted base must be copied by reference on the next compact.
    val cat = new GraftCatalog(spark, tmpDir("graft-sortinc"))
    cat.createTable("q.s", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("v", LongType))),
      sortScheme = SortScheme(Seq(SortKey("k"))),
      properties = Map("compaction.max_records_per_file" -> "256",
        "compaction.auto" -> "false"))
    // two unsorted appends (descending + shuffled)
    cat.writeToTable(spark.range(0, 512).select((lit(511) - col("id")).as("k"),
      col("id").as("v")), "q.s", WriteMode.Add)
    cat.writeToTable(spark.range(512, 1024)
      .select((lit(1535) - col("id")).as("k"), col("id").as("v")), "q.s", WriteMode.Add)
    cat.compact("q.s")
    val d1 = cat.deltaLog("q.s").filter(_.compactedUpTo >= 0).last
    assert(d1.properties.get("sorted").contains("k:asc:nl:identity"))
    // every data file is internally sorted by k
    val perFile = cat.readTable("q.s", ReadOptions(withFilePath = true))
      .select(col("_file_path"), col("k")).collect().groupBy(_.getString(0))
    assert(perFile.size > 1, "max_records_per_file must have sliced the base")
    perFile.foreach { case (f, rows) =>
      val ks = rows.map(_.getLong(1)).toSeq
      assert(ks == ks.sorted, s"$f not sorted by the declared scheme")
    }
    assert(cat.readTable("q.s").count() == 1024)
    // incremental: the sorted base is copied by reference on recompact
    cat.writeToTable(spark.range(1024, 1100).select(col("id").as("k"),
      col("id").as("v")), "q.s", WriteMode.Add)
    cat.compact("q.s")
    val d2 = cat.deltaLog("q.s").filter(_.compactedUpTo >= 0).last
    assert(d2.properties("copied_by_reference").toInt == d1.entries.size)
    assert(cat.readTable("q.s").count() == 1100)
  }

  test("altering the sort scheme re-sorts on the next compact even with nothing pending") {
    val cat = new GraftCatalog(spark, tmpDir("graft-sortalter"))
    cat.createTable("q.a", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false),
      FieldMeta.field("v", LongType))),
      properties = Map("compaction.auto" -> "false"))
    cat.writeToTable(spark.range(0, 256).select((lit(255) - col("id")).as("k"),
      col("id").as("v")), "q.a", WriteMode.Add)
    cat.compact("q.a") // schemeless: pure fold
    assert(!cat.deltaLog("q.a").last.properties.contains("sorted"))
    // declare the scheme AFTER the base exists; compact() alone must apply it
    cat.alterTable("q.a", sortScheme = Some(SortScheme(Seq(SortKey("k")))))
    cat.compact("q.a")
    val d = cat.deltaLog("q.a").last
    assert(d.properties.get("sorted").contains("k:asc:nl:identity"),
      "compact with nothing pending must materialize a newly-declared scheme")
    val perFile = cat.readTable("q.a", ReadOptions(withFilePath = true))
      .select(col("_file_path"), col("k")).collect().groupBy(_.getString(0))
    perFile.foreach { case (f, rows) =>
      val ks = rows.map(_.getLong(1)).toSeq
      assert(ks == ks.sorted, s"$f not sorted after the alter+compact")
    }
    // and the now-sorted base folds by reference on the next compact
    cat.compact("q.a")
    assert(cat.deltaLog("q.a").last.properties.get("sorted").contains("k:asc:nl:identity"))
  }
}
