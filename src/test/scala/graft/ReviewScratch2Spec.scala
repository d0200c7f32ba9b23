package graft

import org.apache.spark.sql.types._
import graft.catalog._
import graft.model._

class ReviewScratch2Spec extends SparkSpec {

  private def newCatalog(): GraftCatalog = {
    val dir = java.nio.file.Files.createTempDirectory("graft-review2").toString
    new GraftCatalog(spark, dir)
  }

  test("merge-key int->long promotion after compaction keeps merge correct") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      FieldMeta.field("id", IntegerType, mergeKey = true),
      FieldMeta.field("v", StringType)))
    cat.createTable("tp.t", schema, properties = Map("read_optimization" -> "NONE"))
    import spark.implicits._
    cat.writeToTable((1 to 50).map(i => (i, s"v$i")).toDF("id", "v"), "tp.t", WriteMode.Merge)
    cat.compact("tp.t", numBuckets = 4)
    // schema evolution: long merge key promotes id int->long
    cat.writeToTable((7 to 20).map(i => (i.toLong, s"u$i")).toDF("id", "v"), "tp.t", WriteMode.Merge)
    val rows = cat.readTable("tp.t").collect().map(r => r.getLong(0) -> r.getString(1))
    val dupes = rows.groupBy(_._1).filter(_._2.length > 1)
    assert(dupes.isEmpty, s"duplicate keys after promotion: $dupes")
    (7 to 20).foreach(i => assert(rows.toMap.apply(i.toLong) == s"u$i", s"key $i stale"))
    assert(rows.length == 50, s"expected 50 rows, got ${rows.length}")
  }
}
