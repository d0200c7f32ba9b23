package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/** Per-field consistency policies, future_default fill, and the
  * remove/rename schema-update gate. */
class SchemaPolicySpec extends SparkSpec {
  import spark.implicits._

  private def newCatalog(): GraftCatalog = new GraftCatalog(spark, tmpDir("graft-pol"))

  test("VALIDATE rejects a type-mismatched write; COERCE casts silently") {
    val cat = newCatalog()
    cat.createTable("p.v", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("strict", LongType, consistency = Some("validate")),
      FieldMeta.field("loose", StringType, consistency = Some("coerce")))))
    cat.writeToTable(Seq((1L, 10L, 7)).toDF("id", "strict", "loose"), "p.v", WriteMode.Merge)
    // loose: int 7 coerced to string "7"
    assert(cat.readTable("p.v").select("loose").head.getString(0) == "7")
    // strict: double rejected with a clear error, nothing committed
    val e = intercept[SchemaValidationError] {
      cat.writeToTable(Seq((2L, 2.5)).toDF("id", "strict"), "p.v", WriteMode.Merge)
    }
    assert(e.getMessage.contains("strict"))
    assert(cat.readTable("p.v").count() == 1)
    // exact-typed write still accepted
    cat.writeToTable(Seq((2L, 20L)).toDF("id", "strict"), "p.v", WriteMode.Merge)
    assert(cat.readTable("p.v").count() == 2)
  }

  test("future_default fills omitted columns at write; required column without it rejects") {
    val cat = newCatalog()
    cat.createTable("p.f", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("tier", StringType, futureDefault = Some("std")),
      FieldMeta.field("req", LongType, nullable = false))))
    // omitting non-nullable req (no future_default) rejects
    intercept[SchemaValidationError] {
      cat.writeToTable(Seq((1L, "x")).toDF("id", "tier"), "p.f", WriteMode.Merge)
    }
    // omitting tier fills the future default physically
    cat.writeToTable(Seq((1L, 5L)).toDF("id", "req"), "p.f", WriteMode.Merge)
    val row = cat.readTable("p.f").head
    assert(row.getAs[String]("tier") == "std")
    // an explicit value wins over the default
    cat.writeToTable(Seq((2L, "gold", 6L)).toDF("id", "tier", "req"), "p.f", WriteMode.Merge)
    val tiers = cat.readTable("p.f").select("id", "tier").as[(Long, String)].collect().toMap
    assert(tiers == Map(1L -> "std", 2L -> "gold"))
    // Field-wise partial upsert on a NON-empty table: an omitted column
    // (even non-nullable req, even tier with its future_default) means
    // "don't touch" — no rejection, no default clobbering the old value.
    cat.writeToTable(Seq((2L, "plat")).toDF("id", "tier"), "p.f", WriteMode.Merge)
    val after = cat.readTable("p.f").select("id", "tier", "req")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(after(2L) == (("plat", 6L)), s"partial upsert clobbered: ${after(2L)}")
    assert(after(1L) == (("std", 5L)))
  }

  test("retired column names stay reserved after rename and remove") {
    val cat = newCatalog()
    cat.createTable("p.n", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType),
      FieldMeta.field("aux", LongType))))
    cat.writeToTable(Seq((1L, "a", 9L)).toDF("id", "v", "aux"), "p.n", WriteMode.Merge)
    cat.alterTable("p.n", renameFields = Map("v" -> "w"),
      removeFields = Seq("aux"), allowIncompatibleChanges = true)
    // An old producer still writing the pre-rename name is rejected, not
    // silently evolved into a duplicate column.
    val e1 = intercept[SchemaValidationError] {
      cat.writeToTable(Seq((2L, "b", "x")).toDF("id", "v", "w"), "p.n", WriteMode.Merge)
    }
    assert(e1.getMessage.contains("retired"))
    // Rename-back and re-adding the removed name are both rejected.
    intercept[SchemaCompatibilityError] {
      cat.alterTable("p.n", renameFields = Map("w" -> "v"), allowIncompatibleChanges = true)
    }
    intercept[SchemaValidationError] {
      cat.writeToTable(Seq((2L, "b", 1L)).toDF("id", "w", "aux"), "p.n", WriteMode.Merge)
    }
    // The current name still works.
    cat.writeToTable(Seq((2L, "b")).toDF("id", "w"), "p.n", WriteMode.Merge)
    assert(cat.readTable("p.n").count() == 2)
  }

  test("removeFields is rejected on positional (csv) tables; keyless rename rewrites") {
    val cat = newCatalog()
    cat.createTable("p.c", StructType(Seq(
      FieldMeta.field("id", LongType),
      FieldMeta.field("gone", StringType),
      FieldMeta.field("v", StringType))), properties = Map("content_type" -> "csv"))
    cat.writeToTable(Seq((1L, "g", "keep")).toDF("id", "gone", "v"), "p.c", WriteMode.Add)
    val e = intercept[SchemaCompatibilityError] {
      cat.alterTable("p.c", removeFields = Seq("gone"), allowIncompatibleChanges = true)
    }
    assert(e.getMessage.contains("positionally"))
    // Keyless (append-only) parquet table: rename + compact rewrites the
    // files under the new name, clearing the stale-rename marker.
    cat.createTable("p.a", StructType(Seq(
      FieldMeta.field("id", LongType), FieldMeta.field("v", StringType))))
    cat.writeToTable(Seq((1L, "x"), (2L, "y")).toDF("id", "v"), "p.a", WriteMode.Add)
    cat.alterTable("p.a", renameFields = Map("v" -> "w"), allowIncompatibleChanges = true)
    cat.compact("p.a")
    val last = cat.deltaLog("p.a").last
    assert(last.properties.get("written_columns").contains("id,w"),
      s"stale fold: ${last.properties}")
    assert(cat.readTable("p.a").select("w").as[String].collect().sorted.toSeq == Seq("x", "y"))
    // Emptying a subschema via removal drops the group.
    cat.createTable("p.e", StructType(Seq(
      FieldMeta.field("id", LongType), FieldMeta.field("x", LongType))))
    cat.setSubschema("p.e", "only", Seq("x"))
    cat.alterTable("p.e", removeFields = Seq("x"), allowIncompatibleChanges = true)
    assert(cat.subschemas("p.e").isEmpty)
  }

  test("remove/rename require allowIncompatibleChanges; keys are protected") {
    val cat = newCatalog()
    cat.createTable("p.g", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType),
      FieldMeta.field("aux", LongType))))
    intercept[SchemaCompatibilityError] {
      cat.alterTable("p.g", removeFields = Seq("aux"))
    }
    intercept[SchemaCompatibilityError] {
      cat.alterTable("p.g", renameFields = Map("v" -> "w"))
    }
    intercept[SchemaCompatibilityError] {
      cat.alterTable("p.g", removeFields = Seq("id"), allowIncompatibleChanges = true)
    }
    intercept[SchemaCompatibilityError] {
      cat.alterTable("p.g", renameFields = Map("id" -> "id2"), allowIncompatibleChanges = true)
    }
  }

  test("rename reads old files under the new name, across merge and compaction") {
    val cat = newCatalog()
    cat.createTable("p.r", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))),
      properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable((1L to 10L).map(i => (i, s"old$i")).toDF("id", "v"), "p.r", WriteMode.Merge)
    cat.alterTable("p.r", renameFields = Map("v" -> "val2"), allowIncompatibleChanges = true)
    // old physical files carry column 'v'; reads map it to val2
    assert(cat.readTable("p.r").columns.toSeq == Seq("id", "val2"))
    assert(cat.readTable("p.r").where($"id" === 3L).select("val2").head.getString(0) == "old3")
    // post-rename partial upsert under the new name merges field-wise
    cat.writeToTable(Seq((3L, "new3")).toDF("id", "val2"), "p.r", WriteMode.Merge)
    val got = cat.readTable("p.r").select("id", "val2").as[(Long, String)].collect().toMap
    assert(got(3L) == "new3" && got(4L) == "old4" && got.size == 10)
    // compaction materializes under the new name; content unchanged
    cat.compact("p.r")
    val post = cat.readTable("p.r").select("id", "val2").as[(Long, String)].collect().toMap
    assert(post == got)
  }

  test("DSv2 scan rejects stale-rename files until compaction rewrites them") {
    val root = tmpDir("graft-pol-dsv2")
    val cat = new GraftCatalog(spark, root)
    cat.createTable("p.d", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))),
      properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "p.d", WriteMode.Merge)
    cat.compact("p.d")
    cat.alterTable("p.d", renameFields = Map("v" -> "w"), allowIncompatibleChanges = true)
    def dsv2() = spark.read.format("graft")
      .option("root", root).option("table", "p.d").load()
    val e = intercept[Exception] { dsv2().collect() }
    assert(e.getMessage.contains("rename"), e.getMessage)
    cat.compact("p.d") // materializes files under the new name
    Thread.sleep(2100) // DSv2 provider snapshot cache TTL
    assert(dsv2().select("w").collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
  }

  test("subschema read prunes the other groups' columns from the scan") {
    val cat = newCatalog()
    cat.createTable("p.s", StructType(Seq(
      FieldMeta.field("id", LongType),
      FieldMeta.field("payload", StringType),
      FieldMeta.field("lang", StringType))))
    cat.setSubschema("p.s", "media", Seq("id", "payload"))
    cat.setSubschema("p.s", "meta", Seq("id", "lang"))
    cat.writeToTable(Seq((1L, "BIGPAYLOAD", "en"), (2L, "HUGE", "fr"))
      .toDF("id", "payload", "lang"), "p.s", WriteMode.Add)
    assert(cat.subschemas("p.s") ==
      Map("media" -> Seq("id", "payload"), "meta" -> Seq("id", "lang")))
    val meta = cat.readSubschema("p.s", "meta")
    assert(meta.columns.toSeq == Seq("id", "lang"))
    // the scan's ReadSchema must not include the payload column
    val scans = meta.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("ReadSchema"))
    assert(scans.nonEmpty && scans.forall(!_.contains("payload")),
      s"payload not pruned from scan:\n${scans.mkString("\n")}")
    // rename + remove flow through group definitions
    cat.alterTable("p.s", renameFields = Map("lang" -> "language"),
      removeFields = Seq("payload"), allowIncompatibleChanges = true)
    assert(cat.subschemas("p.s") ==
      Map("media" -> Seq("id"), "meta" -> Seq("id", "language")))
  }

  test("nested-struct AUTO evolution: widen inside struct, append nested field") {
    val cat = newCatalog()
    val n1 = Seq((1L, (10, "x")), (2L, (20, "y"))).toDF("id", "meta")
      .select($"id", $"meta".cast(StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType)))).as("meta"))
    cat.writeToTable(n1, "p.nest")
    // second write: a widened to long, b absent, c appended
    val n2 = Seq((3L, (30L, "zz"))).toDF("id", "meta")
      .select($"id", $"meta".cast(StructType(Seq(
        StructField("a", LongType), StructField("c", StringType)))).as("meta"))
    cat.writeToTable(n2, "p.nest", WriteMode.Add)
    val evolved = cat.tableSchema("p.nest")("meta").dataType.asInstanceOf[StructType]
    assert(evolved.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(evolved("a").dataType == LongType)
    val rows = cat.readTable("p.nest")
      .select($"id", $"meta.a", $"meta.b", $"meta.c")
      .as[(Long, Long, Option[String], Option[String])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, 10L, Some("x"), None), (2L, 20L, Some("y"), None),
      (3L, 30L, None, Some("zz"))))
  }

  test("nested evolution inside array<struct> and map values; incompatible nested change rejects") {
    val cat = newCatalog()
    val w1 = Seq((1L, Seq((1, "p")))).toDF("id", "tags")
      .select($"id", $"tags".cast(ArrayType(StructType(Seq(
        StructField("k", IntegerType), StructField("v", StringType))))).as("tags"))
    cat.writeToTable(w1, "p.arr")
    val w2 = Seq((2L, Seq((5L, 0.5)))).toDF("id", "tags")
      .select($"id", $"tags".cast(ArrayType(StructType(Seq(
        StructField("k", LongType), StructField("w", DoubleType))))).as("tags"))
    cat.writeToTable(w2, "p.arr", WriteMode.Add)
    val el = cat.tableSchema("p.arr")("tags").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(el.fieldNames.toSeq == Seq("k", "v", "w") && el("k").dataType == LongType)
    val got = cat.readTable("p.arr").select($"id", explode($"tags").as("t"))
      .select($"id", $"t.k", $"t.v", $"t.w")
      .as[(Long, Long, Option[String], Option[Double])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, Some("p"), None), (2L, 5L, None, Some(0.5))))
    // a nested field changing to a non-promotable type is an incompatible
    // change (k: long vs array<int>; note v: string vs array WOULD promote —
    // the lattice sends anything to string)
    val bad = Seq((3L, Seq((Seq(1), "p")))).toDF("id", "tags")
      .select($"id", $"tags".cast(ArrayType(StructType(Seq(
        StructField("k", ArrayType(IntegerType)), StructField("v", StringType))))).as("tags"))
    val e = intercept[IllegalArgumentException] {
      cat.writeToTable(bad, "p.arr", WriteMode.Add)
    }
    assert(e.getMessage.contains("incompatible"), e.getMessage)
  }

  test("deep nesting: struct-in-array-in-struct and map-of-struct evolve") {
    val cat = newCatalog()
    // outer struct holds an array of inner structs AND a map of structs
    val t1 = StructType(Seq(StructField("outer", StructType(Seq(
      StructField("items", ArrayType(StructType(Seq(
        StructField("k", IntegerType), StructField("v", StringType))))),
      StructField("props", MapType(StringType, StructType(Seq(
        StructField("n", IntegerType))))))))))
    val w1 = Seq(1L).toDF("id").select($"id", struct(
      array(struct(lit(1).as("k"), lit("p").as("v"))).as("items"),
      map(lit("x"), struct(lit(5).as("n"))).as("props")).cast(t1("outer").dataType).as("outer"))
    cat.writeToTable(w1, "p.deep")
    // second write: k widens to long inside the array's struct, map-value
    // struct gains field m; items' struct loses v
    val t2inner = StructType(Seq(StructField("k", LongType)))
    val t2map = StructType(Seq(StructField("n", IntegerType), StructField("m", StringType)))
    val w2 = Seq(2L).toDF("id").select($"id", struct(
      array(struct(lit(9L).as("k"))).as("items"),
      map(lit("y"), struct(lit(6).as("n"), lit("mm").as("m"))).as("props"))
      .cast(StructType(Seq(StructField("items", ArrayType(t2inner)),
        StructField("props", MapType(StringType, t2map))))).as("outer"))
    cat.writeToTable(w2, "p.deep", WriteMode.Add)
    val evolved = cat.tableSchema("p.deep")("outer").dataType.asInstanceOf[StructType]
    val itemT = evolved("items").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val mapT = evolved("props").dataType.asInstanceOf[MapType]
      .valueType.asInstanceOf[StructType]
    assert(itemT("k").dataType == LongType && itemT.fieldNames.toSeq == Seq("k", "v"))
    assert(mapT.fieldNames.toSeq == Seq("n", "m"))
    val got = cat.readTable("p.deep")
      .select($"id", explode($"outer.items").as("it"), $"outer.props".as("pr"))
      .select($"id", $"it.k", $"it.v", map_keys($"pr")(0).as("pk"),
        map_values($"pr")(0).getField("n").as("pn"),
        map_values($"pr")(0).getField("m").as("pm"))
      .as[(Long, Long, Option[String], String, Int, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, Some("p"), "x", 5, None),
      (2L, 9L, None, "y", 6, Some("mm"))), got.toString)
  }

  test("map KEY struct evolution conforms (write-side rebuild of key structs)") {
    val cat = newCatalog()
    val k1 = StructType(Seq(StructField("a", IntegerType)))
    val w1 = Seq(1L).toDF("id").select($"id",
      map(struct(lit(1).as("a")), lit(10)).cast(MapType(k1, IntegerType)).as("m"))
    cat.writeToTable(w1, "p.mk")
    val k2 = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val w2 = Seq(2L).toDF("id").select($"id",
      map(struct(lit(2).as("a"), lit("x").as("b")), lit(20))
        .cast(MapType(k2, IntegerType)).as("m"))
    cat.writeToTable(w2, "p.mk", WriteMode.Add)
    val keyT = cat.tableSchema("p.mk")("m").dataType.asInstanceOf[MapType]
      .keyType.asInstanceOf[StructType]
    assert(keyT.fieldNames.toSeq == Seq("a", "b"))
    val got = cat.readTable("p.mk")
      .select($"id", map_keys($"m")(0).getField("a").as("ka"),
        map_keys($"m")(0).getField("b").as("kb"), map_values($"m")(0).as("v"))
      .as[(Long, Int, Option[String], Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1, None, 10), (2L, 2, Some("x"), 20)), got.toString)
  }

  test("nested evolution under MANUAL mode is rejected; alterTable applies it") {
    val cat = newCatalog()
    val metaT = StructType(Seq(StructField("a", IntegerType)))
    cat.createTable("p.man", StructType(Seq(
      FieldMeta.field("id", LongType), StructField("meta", metaT))),
      properties = Map("schema_evolution" -> "MANUAL"))
    val w1 = Seq((1L, Tuple1(1))).toDF("id", "meta")
      .select($"id", $"meta".cast(metaT).as("meta"))
    cat.writeToTable(w1, "p.man", WriteMode.Add)
    val wide = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val w2 = Seq((2L, (2, "n"))).toDF("id", "meta")
      .select($"id", $"meta".cast(wide).as("meta"))
    val e = intercept[IllegalArgumentException] {
      cat.writeToTable(w2, "p.man", WriteMode.Add)
    }
    assert(e.getMessage.contains("MANUAL"), e.getMessage)
    // explicit DDL evolves the nested type, after which the write lands
    cat.alterTable("p.man", newSchema = Some(StructType(Seq(
      FieldMeta.field("id", LongType), StructField("meta", wide)))))
    cat.writeToTable(w2, "p.man", WriteMode.Add)
    val rows = cat.readTable("p.man").select($"id", $"meta.a", $"meta.b")
      .as[(Long, Int, Option[String])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, 1, None), (2L, 2, Some("n"))))
  }

  test("gzip content encoding round-trips through write, compaction and read") {
    val cat = newCatalog()
    cat.createTable("p.z", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))), properties = Map(
      "content_type" -> "csv", "content_encoding" -> "gzip",
      "read_optimization" -> "NONE"))
    cat.writeToTable((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), "p.z", WriteMode.Merge)
    cat.writeToTable(Seq((7L, "updated")).toDF("id", "v"), "p.z", WriteMode.Merge)
    cat.compact("p.z")
    val paths = cat.manifestTable("p.z").select("path").as[String].collect()
    assert(paths.nonEmpty && paths.forall(_.endsWith(".csv.gz")), paths.take(3).mkString(","))
    val got = cat.readTable("p.z").select("id", "v").as[(Long, String)].collect().toMap
    assert(got.size == 50 && got(7L) == "updated" && got(8L) == "v8")
  }
}
