package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/** Targeted tests for round-3 fixes and previously-untested semantics:
  * bucket-count reuse in auto-compaction, partition filter on unprojected
  * columns, MANUAL-mode evolution errors, merge_order winners, limit
  * pushdown, null-key deletes. */
class FixesSpec extends SparkSpec {
  import spark.implicits._

  private def newCatalog(): GraftCatalog = new GraftCatalog(spark, tmpDir("graft-fix"))

  private def kvSchema(props: Map[String, String] = Map.empty): StructType = StructType(Seq(
    FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
    FieldMeta.field("v", StringType)))

  test("auto-compaction reuses the existing bucket count; copy-by-reference survives") {
    val cat = newCatalog()
    // min_pending_records=0 = reference parity (compact on every merge
    // write) — the default now defers small trickles to merge-on-read.
    cat.createTable("f.b", kvSchema(), properties = Map(
      "read_optimization" -> "NONE", "compaction.min_pending_records" -> "0"))
    cat.writeToTable((1L to 200L).map(i => (i, s"v$i")).toDF("id", "v"), "f.b", WriteMode.Merge)
    cat.compact("f.b", numBuckets = 4)
    // Switch to MAX so the next merge write triggers auto-compaction.
    cat.alterTable("f.b", setProperties = Map("read_optimization" -> "MAX"))
    cat.writeToTable(Seq((1L, "updated")).toDF("id", "v"), "f.b", WriteMode.Merge)
    val t = TableHandle.parse("f.b")
    val last = cat.effectiveDeltas(t, None).filter(_.compactedUpTo >= 0).last
    assert(last.properties.get("num_buckets").contains("4"),
      s"auto-compact re-bucketed: ${last.properties}")
    assert(last.properties.get("copied_by_reference").exists(_.toInt > 0),
      s"no files copied by reference: ${last.properties}")
    assert(cat.readTable("f.b").where($"id" === 1L).select("v").head().getString(0) == "updated")
    assert(cat.readTable("f.b").count() == 200)
  }

  test("stats-driven bucket suggestion: scales with bytes, floors at 8, caps") {
    assert(Compactor.suggestBuckets(0L) == 8)
    assert(Compactor.suggestBuckets(256L << 20) == 8)       // one target bucket
    assert(Compactor.suggestBuckets(10L << 30) == 40)       // 10 GiB -> 40
    assert(Compactor.suggestBuckets((256L << 20) * 100) == 100)
    assert(Compactor.suggestBuckets(100L << 40) == 16384)   // 100 TiB caps
    assert(Compactor.suggestBuckets(Long.MaxValue) == 16384)
    // explicit property still wins over the suggestion
    val cat = new GraftCatalog(spark, tmpDir("graft-fix-buckets"))
    cat.createTable("x.b", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))), properties = Map(
      "compaction.num_buckets" -> "3", "read_optimization" -> "NONE"))
    cat.writeToTable((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"), "x.b", WriteMode.Merge)
    cat.compact("x.b")
    val base = cat.deltaLog("x.b").last
    assert(base.properties.get("num_buckets").contains("3"))
    // RDD-backed frames report defaultSizeInBytes (Long.MaxValue) — the
    // bulk load must treat that as UNKNOWN and keep the default 8, not
    // shuffle a tiny dataset into 16384 bucket files
    cat.createTable("x.r", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))))
    val rdd = spark.sparkContext.parallelize(
      (1L to 50L).map(i => org.apache.spark.sql.Row(i, s"v$i")))
    cat.writeToTable(spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType, nullable = false), StructField("v", StringType)))),
      "x.r", WriteMode.Merge)
    assert(cat.deltaLog("x.r").last.properties.get("num_buckets").contains("8"),
      s"unknown-stats bulk load must default to 8: ${cat.deltaLog("x.r").last.properties}")
  }

  test("partition filter referencing an unprojected column") {
    val cat = newCatalog()
    cat.writeToTable(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "age"), "f.p")
    val got = cat.readTable("f.p", ReadOptions(
      columns = Some(Seq("name")),
      partitionFilter = Some(col("age") > 15)))
    assert(got.columns.toSeq == Seq("name"))
    assert(got.collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("MANUAL evolution: unknown column vs type conflict raise distinct errors") {
    val cat = newCatalog()
    cat.createTable("f.m", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", IntegerType))), properties = Map("schema_evolution" -> "MANUAL"))
    cat.writeToTable(Seq((1L, 1)).toDF("id", "v"), "f.m", WriteMode.Merge)
    val eNew = intercept[IllegalArgumentException] {
      cat.writeToTable(Seq((2L, 2, 5)).toDF("id", "v", "extra"), "f.m", WriteMode.Merge)
    }
    assert(eNew.getMessage.contains("not in table schema"))
    assert(eNew.getMessage.contains("extra"))
    // Widening (long into int column) is a type change MANUAL must reject.
    val eType = intercept[IllegalArgumentException] {
      cat.writeToTable(Seq((3L, 99L)).toDF("id", "v"), "f.m", WriteMode.Merge)
    }
    assert(eType.getMessage.contains("incompatible type change"))
    // Narrower-but-coercible types are still accepted under MANUAL.
    cat.writeToTable(Seq((4, 4)).toDF("id", "v"), "f.m", WriteMode.Merge)
    assert(cat.readTable("f.m").count() == 2)
  }

  test("merge_order: older commit with higher order value beats newer commit") {
    val cat = newCatalog()
    cat.createTable("f.mo", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("ver", IntegerType, mergeOrder = Some("DESC")),
      FieldMeta.field("src", StringType))), properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable(Seq((1L, 5, "old-high")).toDF("id", "ver", "src"), "f.mo", WriteMode.Merge)
    cat.writeToTable(Seq((1L, 3, "new-low")).toDF("id", "ver", "src"), "f.mo", WriteMode.Merge)
    assert(cat.readTable("f.mo").select("src").head().getString(0) == "old-high")
    // ASC merge_order: smallest wins.
    cat.createTable("f.mo2", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("ver", IntegerType, mergeOrder = Some("ASC")),
      FieldMeta.field("src", StringType))), properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable(Seq((1L, 5, "old-high")).toDF("id", "ver", "src"), "f.mo2", WriteMode.Merge)
    cat.writeToTable(Seq((1L, 3, "new-low")).toDF("id", "ver", "src"), "f.mo2", WriteMode.Merge)
    assert(cat.readTable("f.mo2").select("src").head().getString(0) == "new-low")
    // And the winner survives compaction identically.
    cat.compact("f.mo")
    assert(cat.readTable("f.mo").select("src").head().getString(0) == "old-high")
  }

  test("compaction.min_pending_records defers merge-triggered compaction") {
    val cat = newCatalog()
    cat.createTable("f.d", kvSchema(),
      properties = Map("compaction.min_pending_records" -> "10"))
    cat.writeToTable((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"), "f.d", WriteMode.Merge)
    // Tiny upserts stay pending (merge-on-read), reads remain correct.
    cat.writeToTable(Seq((1L, "x1")).toDF("id", "v"), "f.d", WriteMode.Merge)
    cat.writeToTable(Seq((2L, "x2")).toDF("id", "v"), "f.d", WriteMode.Merge)
    val t = TableHandle.parse("f.d")
    def pending() = MergeRead.activeDeltas(cat.effectiveDeltas(t, None))._2.size
    assert(pending() == 2, "tiny upserts should not have triggered compaction")
    assert(cat.readTable("f.d").where($"id" === 1L).select("v").head().getString(0) == "x1")
    // Crossing the threshold compacts.
    cat.writeToTable((1L to 20L).map(i => (i, s"y$i")).toDF("id", "v"), "f.d", WriteMode.Merge)
    assert(pending() == 0, "threshold crossing should compact all pending deltas")
    assert(cat.readTable("f.d").where($"id" === 1L).select("v").head().getString(0) == "y1")
    assert(cat.readTable("f.d").count() == 100)
  }

  test("limit pushdown caps the read") {
    val cat = newCatalog()
    cat.writeToTable((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"), "f.l")
    assert(cat.readTable("f.l", ReadOptions(limit = Some(7))).count() == 7)
    assert(cat.readTable("f.l", ReadOptions(limit = Some(1000))).count() == 100)
  }

  test("bucket_sha1 transform matches int(sha1_hex,16) % n exactly") {
    val n = 7
    val values = Seq("1", "42", "hello", "graft-key", "999999999")
    val df = values.toDF("k")
      .withColumn("b", Transform.BucketSha1(n)(col("k")))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val md = java.security.MessageDigest.getInstance("SHA-1")
    values.foreach { v =>
      val hex = md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = (BigInt(hex, 16) mod BigInt(n)).toInt
      assert(got(v) == expected, s"value $v: got ${got(v)} expected $expected")
    }
    // Round-trips through the transform registry.
    assert(Transform.fromName(s"bucket_sha1[$n]") == Transform.BucketSha1(n))
  }

  test("null merge-key delete removes the null-keyed row only") {
    val cat = newCatalog()
    cat.createTable("f.n", StructType(Seq(
      FieldMeta.field("k1", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("k2", StringType, mergeKey = true),
      FieldMeta.field("v", LongType))), properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable(Seq((1L, Some("a"), 10L), (2L, None, 20L), (3L, Some("c"), 30L))
      .toDF("k1", "k2", "v"), "f.n", WriteMode.Merge)
    cat.writeToTable(Seq((2L, None: Option[String])).toDF("k1", "k2"), "f.n", WriteMode.Delete)
    val got = cat.readTable("f.n").select("k1").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 3L))
  }
}
