package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def newCatalog(): GraftCatalog = new GraftCatalog(spark, tmpDir("graft-cat"))

  private def usersSchema: StructType = StructType(Seq(
    FieldMeta.field("id", LongType, nullable = false, fieldId = Some(1), mergeKey = true),
    FieldMeta.field("name", StringType, fieldId = Some(2)),
    FieldMeta.field("age", LongType, fieldId = Some(3))))

  test("create + write + read roundtrip") {
    val cat = newCatalog()
    cat.createTable("demo.users", usersSchema)
    val df = Seq((1L, "ann", 34L), (2L, "bob", 25L)).toDF("id", "name", "age")
    cat.writeToTable(df, "demo.users", WriteMode.Merge)
    val back = cat.readTable("demo.users")
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "ann", 34L), (2L, "bob", 25L)))
    assert(cat.listTables("demo") == Seq("users"))
    assert(cat.tableExists("demo.users"))
  }

  test("upsert merge: last writer wins, merge-on-read") {
    val cat = newCatalog()
    cat.createTable("d.u", usersSchema)
    cat.writeToTable(Seq((1L, "ann", 34L), (2L, "bob", 25L), (3L, "cy", 40L)).toDF("id", "name", "age"), "d.u", WriteMode.Merge)
    cat.writeToTable(Seq((2L, "bobby", 26L), (4L, "dee", 19L)).toDF("id", "name", "age"), "d.u", WriteMode.Merge)
    val got = cat.readTable("d.u").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "ann", 34L), (2L, "bobby", 26L), (3L, "cy", 40L), (4L, "dee", 19L)))
  }

  test("delete then later upsert re-inserts; dedupe within a delta keeps last row") {
    val cat = newCatalog()
    cat.createTable("d.t", usersSchema)
    // intra-delta duplicate: id=1 appears twice, last wins
    cat.writeToTable(Seq((1L, "a0", 1L), (1L, "a1", 2L), (2L, "b", 3L)).toDF("id", "name", "age"), "d.t", WriteMode.Merge)
    cat.writeToTable(Seq(Tuple1(1L)).toDF("id"), "d.t", WriteMode.Delete)
    var got = cat.readTable("d.t").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
    cat.writeToTable(Seq((1L, "back", 9L)).toDF("id", "name", "age"), "d.t", WriteMode.Merge)
    got = cat.readTable("d.t").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
    val name1 = cat.readTable("d.t").where($"id" === 1L).select("name").head().getString(0)
    assert(name1 == "back")
  }

  test("compaction matches merge-on-read result and prunes to compacted files") {
    val cat = newCatalog()
    cat.createTable("d.c", usersSchema)
    cat.writeToTable((1L to 100L).map(i => (i, s"n$i", i)).toDF("id", "name", "age"), "d.c", WriteMode.Merge)
    cat.writeToTable((50L to 120L).map(i => (i, s"m$i", i * 2)).toDF("id", "name", "age"), "d.c", WriteMode.Merge)
    cat.writeToTable((1L to 10L).map(Tuple1(_)).toDF("id"), "d.c", WriteMode.Delete)
    val before = cat.readTable("d.c").orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    cat.compact("d.c", numBuckets = 4)
    val after = cat.readTable("d.c").orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == before)
    assert(after.size == 110) // 120 keys - 10 deleted
    assert(after.head._1 == 11L)
    assert(after.find(_._1 == 60L).get._2 == "m60")
    // incremental: new upsert after compaction, then compact again (copy-by-ref)
    cat.writeToTable(Seq((60L, "z60", 0L)).toDF("id", "name", "age"), "d.c", WriteMode.Merge)
    cat.compact("d.c", numBuckets = 4)
    val again = cat.readTable("d.c")
    assert(again.where($"id" === 60L).select("name").head().getString(0) == "z60")
    assert(again.count() == 110)
    // copy-by-reference kept untouched buckets' files
    val manifest = cat.manifestTable("d.c")
    assert(manifest.where($"stream_position" === 5).count() > 0)
  }

  test("time travel and txn history") {
    val cat = newCatalog()
    cat.createTable("d.tt", usersSchema)
    cat.writeToTable(Seq((1L, "v1", 1L)).toDF("id", "name", "age"), "d.tt", WriteMode.Merge)
    val t1 = System.currentTimeMillis()
    Thread.sleep(5)
    cat.writeToTable(Seq((1L, "v2", 2L)).toDF("id", "name", "age"), "d.tt", WriteMode.Merge)
    val nameNow = cat.readTable("d.tt").select("name").head().getString(0)
    val nameThen = cat.readTable("d.tt", ReadOptions(asOf = Some(t1))).select("name").head().getString(0)
    assert(nameNow == "v2")
    assert(nameThen == "v1")
    assert(cat.historyDF().count() >= 3)
  }

  test("schema evolution AUTO: new column + int widening, old rows null") {
    val cat = newCatalog()
    cat.createTable("d.se", usersSchema)
    cat.writeToTable(Seq((1L, "ann", 30L)).toDF("id", "name", "age"), "d.se", WriteMode.Merge)
    cat.writeToTable(Seq((2L, "bob", 40L, "nyc")).toDF("id", "name", "age", "city"), "d.se", WriteMode.Merge)
    val got = cat.readTable("d.se").orderBy("id").collect()
    assert(got.length == 2)
    assert(got(0).isNullAt(3))
    assert(got(1).getString(3) == "nyc")
    assert(cat.tableSchema("d.se").fieldNames.toSeq == Seq("id", "name", "age", "city"))
  }

  test("partial upsert coalesces missing fields from previous state") {
    val cat = newCatalog()
    cat.createTable("d.pu", usersSchema)
    cat.writeToTable(Seq((1L, "ann", 30L), (2L, "bob", 40L)).toDF("id", "name", "age"), "d.pu", WriteMode.Merge)
    // delta carries only (id, age): name must be preserved from previous state
    cat.writeToTable(Seq((1L, 31L)).toDF("id", "age"), "d.pu", WriteMode.Merge)
    val got = cat.readTable("d.pu").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "ann", 31L), (2L, "bob", 40L)))
    // after a delete, partial upsert must NOT resurrect pre-delete values
    cat.writeToTable(Seq(Tuple1(2L)).toDF("id"), "d.pu", WriteMode.Delete)
    cat.writeToTable(Seq((2L, 41L)).toDF("id", "age"), "d.pu", WriteMode.Merge)
    val r2 = cat.readTable("d.pu").where($"id" === 2L).head()
    assert(r2.isNullAt(1), "name must be null after delete+partial upsert")
    assert(r2.getLong(2) == 41L)
    // compaction preserves the same semantics
    val before = cat.readTable("d.pu").orderBy("id").collect().toSeq
    cat.compact("d.pu")
    val after = cat.readTable("d.pu").orderBy("id").collect().toSeq
    assert(after == before)
  }

  test("replace mode truncates previous content") {
    val cat = newCatalog()
    val df1 = Seq((1L, "a", 1L)).toDF("id", "name", "age")
    cat.writeToTable(df1, "d.r", WriteMode.Auto)
    cat.writeToTable(Seq((9L, "z", 9L)).toDF("id", "name", "age"), "d.r", WriteMode.Replace)
    val got = cat.readTable("d.r").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(9L))
  }

  test("partitioned table: bucket transform + partition value pruning") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      FieldMeta.field("id", LongType, mergeKey = true),
      FieldMeta.field("region", StringType),
      FieldMeta.field("v", DoubleType)))
    cat.createTable("d.p", schema,
      PartitionScheme(Seq(PartitionKey("region", Transform.Identity))))
    val df = Seq((1L, "NA", 1.0), (2L, "EU", 2.0), (3L, "NA", 3.0)).toDF("id", "region", "v")
    cat.writeToTable(df, "d.p", WriteMode.Merge)
    val na = cat.readTable("d.p", ReadOptions(partitionValues = Some(Map("region" -> "NA"))))
    assert(na.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // same merge key in different partitions stays distinct
    cat.writeToTable(Seq((1L, "EU", 9.0)).toDF("id", "region", "v"), "d.p", WriteMode.Merge)
    assert(cat.readTable("d.p").count() == 4)
  }

  test("atomic multi-table transaction with rollback on conflict") {
    val cat = newCatalog()
    val tx = cat.transaction("multi-table commit")
    cat.createTable("ns1.a", usersSchema, txn = Some(tx))
    cat.createTable("ns2.b", usersSchema, txn = Some(tx))
    cat.writeToTable(Seq((1L, "x", 1L)).toDF("id", "name", "age"), "ns1.a", WriteMode.Merge, txn = Some(tx))
    cat.writeToTable(Seq((2L, "y", 2L)).toDF("id", "name", "age"), "ns2.b", WriteMode.Merge, txn = Some(tx))
    // not visible before seal
    assert(!cat.tableExists("ns1.a"))
    tx.seal()
    assert(cat.tableExists("ns1.a") && cat.tableExists("ns2.b"))
    assert(cat.readTable("ns1.a").count() == 1)
  }

  test("concurrent txn conflict: same revision, lower txn id defers to higher") {
    // Reference metafile.py:271-368: a conflict exists when two txns write
    // the same revision; the lexicographically-later txn id wins, even if it
    // has not committed yet (deterministic, coordination-free).
    val cat = newCatalog()
    cat.createTable("d.cc", usersSchema)
    val t1 = cat.transaction("t1") // earlier start → smaller id
    val t2 = cat.transaction("t2")
    cat.alterTable("d.cc", setProperties = Map("a" -> "1"), txn = Some(t1))
    cat.alterTable("d.cc", setProperties = Map("b" -> "2"), txn = Some(t2))
    intercept[graft.txn.ConcurrentTxnConflict] { t1.seal() } // defers to t2
    t2.seal() // uncontested now — wins
    assert(cat.getTableMeta("d.cc").properties.get("b").contains("2"))
    assert(!cat.getTableMeta("d.cc").properties.contains("a"))

    // And a lower-id txn racing a *completed* higher-id txn also aborts.
    val t3 = cat.transaction("t3")
    val t4 = cat.transaction("t4")
    cat.alterTable("d.cc", setProperties = Map("c" -> "3"), txn = Some(t3))
    cat.alterTable("d.cc", setProperties = Map("d" -> "4"), txn = Some(t4))
    t4.seal()
    intercept[graft.txn.ConcurrentTxnConflict] { t3.seal() }
    assert(cat.getTableMeta("d.cc").properties.get("d").contains("4"))
    assert(!cat.getTableMeta("d.cc").properties.contains("c"))
  }

  test("drop, rename, truncate, manifest table") {
    val cat = newCatalog()
    cat.writeToTable(Seq((1L, "a", 1L)).toDF("id", "name", "age"), "d.x", WriteMode.Auto)
    cat.renameTable("d.x", "y")
    assert(!cat.tableExists("d.x") && cat.tableExists("d.y"))
    assert(cat.readTable("d.y").count() == 1)
    val m = cat.manifestTable("d.y")
    assert(m.columns.contains("path") && m.count() >= 1)
    cat.truncateTable("d.y")
    assert(cat.readTable("d.y").count() == 0)
    cat.dropTable("d.y")
    assert(!cat.tableExists("d.y"))
  }

  test("append-only table: APPEND mode, compaction folds manifests by reference") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      FieldMeta.field("k", LongType), FieldMeta.field("v", StringType)))
    cat.createTable("d.ap", schema)
    cat.writeToTable(Seq((1L, "a")).toDF("k", "v"), "d.ap", WriteMode.Append)
    cat.writeToTable(Seq((2L, "b")).toDF("k", "v"), "d.ap", WriteMode.Append)
    cat.compact("d.ap")
    assert(cat.readTable("d.ap").count() == 2)
    // merge keys on APPEND forbidden
    cat.createTable("d.mk", usersSchema)
    intercept[IllegalArgumentException] {
      cat.writeToTable(Seq((1L, "a", 1L)).toDF("id", "name", "age"), "d.mk", WriteMode.Append)
    }
  }

  test("time partition transforms derive UTC values in any session zone (round-11)") {
    // year()/month()/day()/hour() are SESSION-zone functions; the derived
    // partition value must not depend on the writer session's zone or
    // mixed-zone sessions would file the same row under different
    // partitions. Instant 2023-12-31T23:30:00Z is year 2024 / hour 5 in
    // Asia/Kolkata — the layout must still say the UTC rendering.
    val inst = java.time.Instant.parse("2023-12-31T23:30:00Z")
    val zone0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      val cat = newCatalog()
      cat.createTable("z.t", StructType(Seq(
        FieldMeta.field("id", LongType, nullable = false),
        FieldMeta.field("ts", TimestampType))),
        partitionScheme = PartitionScheme(Seq(
          PartitionKey("ts", Transform.Year), PartitionKey("ts", Transform.Hour))))
      cat.writeToTable(Seq((1L, java.sql.Timestamp.from(inst))).toDF("id", "ts"),
        "z.t", WriteMode.Add)
      val paths = cat.deltaLog("z.t").flatMap(_.entries.map(_.path))
      assert(paths.nonEmpty && paths.forall(p =>
        p.contains("_g_p_ts_year=2023") && p.contains("_g_p_ts_hour=23")),
        s"derived values must be UTC-pinned, got $paths")
      // and the read returns the instant intact
      assert(cat.readTable("z.t").select("ts").head().getTimestamp(0).toInstant == inst)
    } finally spark.conf.set("spark.sql.session.timeZone", zone0)
  }
}
