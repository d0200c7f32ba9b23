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

  test("SQL DELETE FROM translates key predicates into equality-delete deltas") {
    val root = tmpDir("graft-dsv2d")
    val cat = new GraftCatalog(spark, root)
    spark.conf.set("spark.sql.catalog.gd", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gd.root", root)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType)))
    cat.createTable("ns.d", schema)
    cat.writeToTable((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), "ns.d", WriteMode.Merge)

    spark.sql("DELETE FROM gd.ns.d WHERE id = 3")
    spark.sql("DELETE FROM gd.ns.d WHERE id IN (5, 6) OR id = 8")
    // SELECT right after DELETE works: the SQL path force-resolves merges.
    assert(spark.sql("SELECT id FROM gd.ns.d").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L, 7L, 9L, 10L))

    // Non-key / non-equality predicates are rejected, not silently wrong.
    val e1 = intercept[Exception](spark.sql("DELETE FROM gd.ns.d WHERE v = 'v1'"))
    assert(e1.getMessage.contains("Cannot delete") || e1.getMessage.contains("merge-key equality"),
      s"unexpected: ${e1.getMessage}")
    val e2 = intercept[Exception](spark.sql("DELETE FROM gd.ns.d WHERE id > 5"))
    assert(e2.getMessage.contains("Cannot delete") || e2.getMessage.contains("merge-key equality"),
      s"unexpected: ${e2.getMessage}")

    // Unconditional DELETE = truncate (works on keyless tables too).
    spark.sql("DELETE FROM gd.ns.d")
    assert(spark.sql("SELECT * FROM gd.ns.d").count() == 0)

    // Composite keys: a conjunction must cover ALL keys; OR of conjunctions fans out.
    val comp = org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("k1", org.apache.spark.sql.types.LongType, nullable = false, mergeKey = true),
      FieldMeta.field("k2", org.apache.spark.sql.types.StringType, nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.LongType)))
    cat.createTable("ns.dc", comp)
    cat.writeToTable(Seq((1L, "a", 10L), (1L, "b", 11L), (2L, "a", 12L), (2L, "b", 13L))
      .toDF("k1", "k2", "v"), "ns.dc", WriteMode.Merge)
    spark.sql("DELETE FROM gd.ns.dc WHERE k1 = 1 AND k2 = 'a'")
    spark.sql("DELETE FROM gd.ns.dc WHERE (k1 = 2 AND k2 = 'a') OR (k1 = 2 AND k2 = 'b')")
    assert(spark.sql("SELECT k1, k2 FROM gd.ns.dc").as[(Long, String)].collect().toSeq ==
      Seq((1L, "b")))
    // A conjunction covering only one of two keys is rejected.
    val e3 = intercept[Exception](spark.sql("DELETE FROM gd.ns.dc WHERE k1 = 1"))
    assert(e3.getMessage.contains("Cannot delete") || e3.getMessage.contains("merge-key equality"),
      s"unexpected: ${e3.getMessage}")
  }

  test("SQL UPDATE and MERGE INTO run as merge deltas through the DML strategy") {
    val root = tmpDir("graft-dsv2u")
    val cat = new GraftCatalog(spark, root)
    spark.conf.set("spark.sql.catalog.gu", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gu.root", root)
    cat.createTable("ns.u", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType),
      FieldMeta.field("n", org.apache.spark.sql.types.LongType))))
    cat.writeToTable((1L to 5L).map(i => (i, s"v$i", i * 10)).toDF("id", "v", "n"),
      "ns.u", WriteMode.Merge)

    // UPDATE with values referencing the current row; untouched rows stay.
    spark.sql("UPDATE gu.ns.u SET v = 'upd', n = n + 1 WHERE id <= 2")
    assert(spark.sql("SELECT id, v, n FROM gu.ns.u ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "upd", 11L), (2L, "upd", 21L), (3L, "v3", 30L), (4L, "v4", 40L), (5L, "v5", 50L)))
    // SET NULL really nulls (full-row upsert, not partial coalesce).
    spark.sql("UPDATE gu.ns.u SET v = NULL WHERE id = 3")
    assert(spark.sql("SELECT v FROM gu.ns.u WHERE id = 3").collect().head.isNullAt(0))
    // Merge keys cannot be updated.
    val e = intercept[Exception](spark.sql("UPDATE gu.ns.u SET id = 9 WHERE id = 2"))
    assert(e.getMessage.contains("merge key"), s"unexpected: ${e.getMessage}")

    // Canonical MERGE upsert: matched rows update, unmatched insert.
    spark.sql("MERGE INTO gu.ns.u t USING (SELECT 4L AS id, 'merged' AS v, 99L AS n " +
      "UNION ALL SELECT 10L, 'new', 100L) s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT v FROM gu.ns.u WHERE id IN (4, 10) ORDER BY id")
      .as[String].collect().toSeq == Seq("merged", "new"))

    // WHEN MATCHED THEN DELETE: source keys not in the target are no-ops.
    spark.sql("MERGE INTO gu.ns.u t USING (SELECT 5L AS id UNION ALL SELECT 77L) s " +
      "ON t.id = s.id WHEN MATCHED THEN DELETE")
    assert(spark.sql("SELECT id FROM gu.ns.u ORDER BY id").as[Long].collect().toSeq ==
      Seq(1L, 2L, 3L, 4L, 10L))

    // INSERT-only: existing keys untouched, new keys inserted.
    spark.sql("MERGE INTO gu.ns.u t USING (SELECT 1L AS id, 'clobber' AS v, 0L AS n " +
      "UNION ALL SELECT 20L, 'ins20', 1L) s ON t.id = s.id " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT id, v FROM gu.ns.u WHERE id IN (1, 20) ORDER BY id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "upd"), (20L, "ins20")))

    // UPDATE-only: only matched keys written.
    spark.sql("MERGE INTO gu.ns.u t USING (SELECT 2L AS id, 'm2' AS v, 2L AS n " +
      "UNION ALL SELECT 55L, 'nope', 0L) s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET *")
    assert(spark.sql("SELECT v FROM gu.ns.u WHERE id = 2").as[String].collect().head == "m2")
    assert(spark.sql("SELECT count(*) FROM gu.ns.u WHERE id = 55").as[Long].collect().head == 0L)

    // Unsupported shapes are rejected crisply, not silently wrong.
    val e2 = intercept[Exception](spark.sql(
      "MERGE INTO gu.ns.u t USING (SELECT 2L AS id, 'x' AS v, 0L AS n) s ON t.id = s.id " +
        "WHEN MATCHED AND s.n > 0 THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"))
    assert(e2.getMessage.contains("conditional"), s"unexpected: ${e2.getMessage}")
  }

  test("SQL ALTER TABLE: add/retype/rename/drop columns and table properties") {
    val root = tmpDir("graft-dsv2a")
    val cat = new GraftCatalog(spark, root)
    spark.conf.set("spark.sql.catalog.ga", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.ga.root", root)
    cat.writeToTable(Seq((1, "a"), (2, "b")).toDF("id", "v"), "ns.a")

    spark.sql("ALTER TABLE ga.ns.a ADD COLUMNS (score DOUBLE, note STRING)")
    assert(cat.tableSchema("ns.a").fieldNames.toSeq == Seq("id", "v", "score", "note"))

    spark.sql("ALTER TABLE ga.ns.a ALTER COLUMN id TYPE BIGINT")
    assert(cat.tableSchema("ns.a")("id").dataType == org.apache.spark.sql.types.LongType)
    // Narrowing is refused.
    val e = intercept[Exception](spark.sql("ALTER TABLE ga.ns.a ALTER COLUMN id TYPE INT"))
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") || e.getMessage.contains("widening"),
      s"unexpected: ${e.getMessage}")

    spark.sql("ALTER TABLE ga.ns.a SET TBLPROPERTIES ('team' = 'data', 'x' = '1')")
    assert(cat.getTableMeta("ns.a").properties.get("team").contains("data"))
    spark.sql("ALTER TABLE ga.ns.a UNSET TBLPROPERTIES ('x')")
    assert(!cat.getTableMeta("ns.a").properties.contains("x"))

    // Rename: breadcrumbed, force-compacted — SELECT sees the new name with
    // the historical data intact.
    spark.sql("ALTER TABLE ga.ns.a RENAME COLUMN v TO label")
    assert(spark.sql("SELECT label FROM ga.ns.a ORDER BY id").as[String].collect().toSeq ==
      Seq("a", "b"))

    spark.sql("ALTER TABLE ga.ns.a DROP COLUMN note")
    assert(!cat.tableSchema("ns.a").fieldNames.contains("note"))
  }

  test("SQL time travel: TIMESTAMP AS OF and VERSION AS OF") {
    val root = tmpDir("graft-dsv2t")
    val cat = new GraftCatalog(spark, root)
    spark.conf.set("spark.sql.catalog.gt", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gt.root", root)

    cat.writeToTable(Seq((1L, "v1")).toDF("id", "v"), "ns.t")
    val t1 = cat.store.history().head.endTimeMillis
    Thread.sleep(5) // distinct commit timestamps
    cat.writeToTable(Seq((2L, "v2")).toDF("id", "v"), "ns.t", WriteMode.Add)

    val ts = new java.sql.Timestamp(t1).toString
    assert(spark.sql(s"SELECT * FROM gt.ns.t TIMESTAMP AS OF '$ts'").count() == 1)
    assert(spark.sql("SELECT * FROM gt.ns.t VERSION AS OF 1").count() == 1)
    assert(spark.sql("SELECT * FROM gt.ns.t VERSION AS OF 2").count() == 2)
    val e = intercept[Exception](spark.sql("SELECT * FROM gt.ns.t VERSION AS OF 99").collect())
    assert(e.getMessage.contains("no version"), s"unexpected: ${e.getMessage}")
  }

  test("SQL DROP TABLE PURGE deletes data files; namespace DDL round-trips") {
    val root = tmpDir("graft-dsv2p")
    val cat = new GraftCatalog(spark, root)
    spark.conf.set("spark.sql.catalog.gp", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gp.root", root)

    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.p")
    val files = cat.deltaLog("ns.p").flatMap(_.entries).map(_.path)
    assert(files.nonEmpty && files.forall(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    spark.sql("DROP TABLE gp.ns.p PURGE")
    assert(!cat.tableExists("ns.p"))
    assert(files.forall(p => !java.nio.file.Files.exists(java.nio.file.Paths.get(p))))

    spark.sql("CREATE NAMESPACE gp.wk WITH PROPERTIES ('team' = 'data')")
    assert(cat.namespaceExists("wk"))
    val desc = spark.sql("DESCRIBE NAMESPACE EXTENDED gp.wk").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("Properties").exists(_.contains("team")))
    spark.sql("ALTER NAMESPACE gp.wk SET PROPERTIES ('tier' = 'gold')")
    assert(cat.namespaceProperties("wk").get("tier").contains("gold"))

    spark.sql("CREATE TABLE gp.wk.t (id BIGINT, v STRING) USING parquet")
    val e = intercept[Exception](spark.sql("DROP NAMESPACE gp.wk"))
    assert(e.getMessage.contains("not empty") || e.getMessage.contains("NON_EMPTY"),
      s"unexpected: ${e.getMessage}")
    spark.sql("DROP NAMESPACE gp.wk CASCADE")
    assert(!cat.namespaceExists("wk"))
  }

  test("SQL graft_read_zipped TVF equals readZipped, with pushed key filters") {
    val root = tmpDir("graft-dsv2z")
    val cat = new GraftCatalog(spark, root)
    cat.createTable("ns.z", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("k", org.apache.spark.sql.types.IntegerType,
        nullable = false, mergeKey = true),
      FieldMeta.field("a", org.apache.spark.sql.types.IntegerType),
      FieldMeta.field("t", org.apache.spark.sql.types.StringType))),
      partitionScheme = PartitionScheme(Seq(PartitionKey("k", Transform.Truncate(2)))),
      properties = Map("read_optimization" -> "NONE"))
    cat.setSubschema("ns.z", "nums", Seq("k", "a"))
    cat.setSubschema("ns.z", "text", Seq("k", "t"))
    cat.writeToTable((0 until 8).map(k => (k, k * 10, s"t$k")).toDF("k", "a", "t"),
      "ns.z", WriteMode.Merge)
    val t1 = cat.store.history().head.endTimeMillis // after the bulk load
    cat.writeToTable(Seq((1, 11), (5, 51)).toDF("k", "a"), "ns.z", WriteMode.Merge)
    cat.writeToTable(Seq((2, "zz")).toDF("k", "t"), "ns.z", WriteMode.Merge)
    Graft.registerFunctions(spark) // the runtime registration path
    val viaSql = spark.sql(
      s"SELECT * FROM graft_read_zipped('$root', 'ns.z') ORDER BY k")
    val viaApi = cat.readZipped("ns.z").orderBy("k")
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
    // group subset + pushed key filter: strictly fewer files than full zip
    val full = spark.sql(
      s"SELECT * FROM graft_read_zipped('$root', 'ns.z')").inputFiles.length
    val sel = spark.sql(
      s"SELECT * FROM graft_read_zipped('$root', 'ns.z', '', 'k = 1')")
    assert(sel.inputFiles.length < full,
      s"TVF filter must push (${sel.inputFiles.length} vs $full)")
    assert(sel.collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1, 11, "t1")))
    val one = spark.sql(
      s"SELECT * FROM graft_read_zipped('$root', 'ns.z', 'text', 'k = 2')")
    assert(one.columns.toSeq == Seq("k", "t") &&
      one.collect().map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((2, "zz")))
    // catalog initialization also registers the TVF (SQL-only sessions)
    spark.conf.set("spark.sql.catalog.graftz", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftz.root", root)
    spark.sql("SHOW TABLES IN graftz.ns").collect() // touch → initialize
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_read_zipped('$root', 'ns.z')")
      .head().getLong(0) == 8L)
    // round-11: '' where means "no filter" (mirrors graft_read — needed to
    // reach the asOf argument) …
    assert(spark.sql(s"SELECT * FROM graft_read_zipped('$root', 'ns.z', '', '')")
      .count() == 8L)
    // … and the 5th arg time-travels the zip: at the bulk-load txn the
    // trickles (a=11, t=zz) must not be visible, and the TVF must equal
    // the Scala readZipped(asOf) exactly.
    val asOfSql = spark.sql(
      s"SELECT * FROM graft_read_zipped('$root', 'ns.z', '', '', $t1) ORDER BY k")
    val asOfApi = cat.readZipped("ns.z", Nil, ReadOptions(asOf = Some(t1))).orderBy("k")
    assert(asOfSql.collect().toSeq == asOfApi.collect().toSeq)
    assert(asOfSql.where("a = 11 OR t = 'zz'").isEmpty,
      "asOf zip must serve the pre-trickle state")

    // round-11 stretch: DataFrameReader surface — option("zip", ...) ≡ readZipped
    def rd(extra: (String, String)*) = {
      val b = spark.read.format("graft").option("root", root).option("table", "ns.z")
      extra.foldLeft(b) { case (r, (k, v)) => r.option(k, v) }.load()
    }
    val viaZipOpt = rd("zip" -> "").orderBy("k")
    assert(viaZipOpt.collect().toSeq == cat.readZipped("ns.z").orderBy("k").collect().toSeq)
    // group subset: schema narrows to the group's columns
    val oneGroup = rd("zip" -> "text")
    assert(oneGroup.columns.toSeq == Seq("k", "t"))
    assert(oneGroup.orderBy("k").collect().toSeq ==
      cat.readZipped("ns.z", Seq("text")).orderBy("k").collect().toSeq)
    // filters + projection flow through the V1Scan bridge
    assert(rd("zip" -> "").where("k = 1").select("a").collect().map(_.getInt(0)).toSeq ==
      Seq(11))
    assert(rd("zip" -> "").where("k >= 6").count() == 2L)
    // asOf option time-travels the zipped reader too
    assert(rd("zip" -> "", "asOf" -> t1.toString).where("a = 11 OR t = 'zz'").isEmpty)
    // read-only: writes are refused at analysis (no write capability)
    val we = intercept[Exception](Seq((9, 90, "x")).toDF("k", "a", "t")
      .write.format("graft").option("root", root).option("table", "ns.z")
      .option("zip", "").mode("append").save())
    assert(we != null)
  }

  test("SQL graft_read TVF serves merge-on-read tables the DSv2 relation refuses") {
    val root = tmpDir("graft-dsv2m")
    val cat = new GraftCatalog(spark, root)
    cat.createTable("ns.m", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("k", org.apache.spark.sql.types.IntegerType,
        nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType))),
      properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable((1 to 10).map(k => (k, s"a$k")).toDF("k", "v"),
      "ns.m", WriteMode.Merge)
    val t1 = cat.store.history().head.endTimeMillis // after the first write
    cat.writeToTable(Seq((3, "B3"), (7, "B7")).toDF("k", "v"), "ns.m", WriteMode.Merge)
    cat.writeToTable(Seq(5).toDF("k"), "ns.m", WriteMode.Delete)
    Graft.registerFunctions(spark)
    // the DSv2 relation refuses (unresolved merges)…
    spark.conf.set("spark.sql.catalog.graftm", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftm.root", root)
    val e = intercept[Exception](spark.sql("SELECT * FROM graftm.ns.m").collect())
    assert(e.getMessage.contains("compact() first"))
    // …the TVF serves the resolved state
    val got = spark.sql(s"SELECT * FROM graft_read('$root', 'ns.m')")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val expect = (1 to 10).filter(_ != 5)
      .map(k => (k, if (k == 3 || k == 7) s"B$k" else s"a$k")).toSet
    assert(got == expect)
    // pushed filter + asOf through the TVF
    assert(spark.sql(s"SELECT * FROM graft_read('$root', 'ns.m', 'k = 3')")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((3, "B3")))
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_read('$root', 'ns.m', '', $t1)")
      .head().getLong(0) == 10L)
  }

  test("SQL graft_history / graft_manifest TVFs equal the Scala metadata views") {
    val root = tmpDir("graft-dsv2h")
    val cat = new GraftCatalog(spark, root)
    cat.createTable("ns.h", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("k", org.apache.spark.sql.types.IntegerType,
        nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType))))
    cat.writeToTable((1 to 6).map(k => (k, s"a$k")).toDF("k", "v"), "ns.h", WriteMode.Merge)
    val t1 = cat.store.history().head.endTimeMillis
    cat.writeToTable(Seq((2, "B2")).toDF("k", "v"), "ns.h", WriteMode.Merge)
    Graft.registerFunctions(spark)

    val histSql = spark.sql(s"SELECT * FROM graft_history('$root')")
      .collect().map(_.toSeq).toSet
    assert(histSql == cat.historyDF().collect().map(_.toSeq).toSet && histSql.nonEmpty)

    val mfSql = spark.sql(s"SELECT * FROM graft_manifest('$root', 'ns.h')")
      .collect().map(_.toSeq).toSet
    assert(mfSql == cat.manifestTable("ns.h").collect().map(_.toSeq).toSet && mfSql.nonEmpty)
    // asOf leg: the historical manifest is the TVF's 3rd argument.
    val mfOld = spark.sql(s"SELECT * FROM graft_manifest('$root', 'ns.h', $t1)")
      .collect().map(_.toSeq).toSet
    assert(mfOld == cat.manifestTable("ns.h", Some(t1)).collect().map(_.toSeq).toSet)
    assert(mfOld != mfSql, "second write must change the manifest")
    // metadata views aggregate in plain SQL
    assert(spark.sql(
      s"SELECT sum(size_bytes) FROM graft_manifest('$root', 'ns.h')").head().getLong(0) > 0)
    // Above the planning gate the view goes distributed (skeleton deltas,
    // entries streamed to rows inside tasks) — identical rows, current
    // AND asOf, with the gate forced to 1 byte.
    spark.conf.set(graft.catalog.ManifestPlanner.GateConfKey, "1")
    try {
      assert(cat.manifestTable("ns.h").collect().map(_.toSeq).toSet == mfSql,
        "distributed (above-gate) manifest view must equal the in-memory one")
      assert(cat.manifestTable("ns.h", Some(t1)).collect().map(_.toSeq).toSet == mfOld,
        "distributed asOf manifest view must equal the in-memory one")
    } finally spark.conf.unset(graft.catalog.ManifestPlanner.GateConfKey)
  }

  test("DSv2 reads non-parquet content types through the matching file table") {
    val root = tmpDir("graft-dsv2c")
    val cat = new GraftCatalog(spark, root)
    val df = Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "v")
    for ((ct, ns) <- Seq("tsv" -> "ns.c", "avro" -> "ns.ca", "feather" -> "ns.cf")) {
      cat.createTable(ns, df.schema, properties = Map("content_type" -> ct))
      cat.writeToTable(df, ns, WriteMode.Add)
      val got = spark.read.format("graft").option("root", root).option("table", ns)
        .load().orderBy("id").collect()
      assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, null), (3L, "c")), s"dsv2 over $ct")
    }
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

  test("MERGE INTO pins the dense resolve for its target-key join (keyed-consumer auto-pin)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val root = tmpDir("graft-dml-pin")
    val cat = new GraftCatalog(spark, root)
    spark.conf.set("spark.sql.catalog.gp", classOf[graft.spark.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gp.root", root)
    // Partitioned-eligible fixture: compacted base + a ~25% dense pending
    // band — the shape where an UNPINNED read would take the partitioned
    // union (UnknownPartitioning) and the MERGE command's target-key
    // semi/anti join would re-shuffle the ENTIRE target key set.
    cat.createTable("ns.p", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))),
      properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable(spark.range(20000)
      .select($"id", ($"id" % 7).cast("string").as("v")).toDF(), "ns.p", WriteMode.Merge)
    cat.compact("ns.p")
    cat.writeToTable(spark.range(20000).where($"id" % 4 === 0)
      .select($"id", lit("upd").as("v")).toDF(), "ns.p", WriteMode.Merge)

    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      def stripped(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      stripped(df.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }.size
    }
    // The command's literal target-keys shape (GraftDml GraftMergeCommand):
    // source LEFT ANTI JOIN readTable(keys) on the merge key. Pinned, the
    // target side arrives hash(id)-partitioned from the dense resolve and
    // only the SOURCE shuffles (+1 exchange over the bare read); unpinned,
    // the partitioned union re-shuffles the whole target key set too (+2).
    val src = spark.range(50).select(($"id" * 1000 + 7).as("id"), lit("s").as("v"))
    def keysOf(o: ReadOptions) = cat.readTable("ns.p", o).select("id")
    val pinned = ReadOptions(denseResolve = true)
    // Broadcast off for the plan A/B: at fixture scale the 20k-key target
    // side broadcasts and neither variant shuffles — the pin targets the
    // at-scale regime where the target key set CANNOT broadcast and the
    // join falls back to partitioned (SMJ/SHJ) execution.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (addedPinned, addedSplit) = try {(
      exchanges(src.join(keysOf(pinned), Seq("id"), "left_anti")) -
        exchanges(keysOf(pinned)),
      exchanges(src.join(keysOf(ReadOptions()), Seq("id"), "left_anti")) -
        exchanges(keysOf(ReadOptions())))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(addedPinned == 1,
      s"pinned target keys must add only the source-side shuffle (added $addedPinned)")
    assert(addedSplit >= 2,
      s"fixture must show the unpinned read re-shuffling the target (added $addedSplit)")

    // SQL-surface correctness of the INSERT-only / UPDATE-only clause
    // shapes (the two that build targetKeys) is covered end-to-end by
    // "SQL UPDATE and MERGE INTO run as merge deltas" above — MERGE INTO
    // analyzes the target through the DSv2 relation, which requires a
    // read-optimized table, so the merge-on-read fixture here serves the
    // PLAN assertion only (compaction state does not change the pinned
    // read's row semantics, which the A/B above also re-asserts).
    val pinnedRows = keysOf(pinned).as[Long].collect().sorted.toSeq
    assert(pinnedRows == keysOf(ReadOptions()).as[Long].collect().sorted.toSeq &&
      pinnedRows.size == 20000,
      "pinned and split target-key reads must be row-identical")

    // SQL route to the same pin: a graft_read TVF reader has no
    // ReadOptions, so `SET graft.merge.denseResolve=true` is its version
    // of the cookbook rule — with the conf on, the same read plans the
    // dense resolve (no KeyGrouped BatchScan), rows identical.
    graft.Graft.registerFunctions(spark)
    def tvf = spark.sql(s"SELECT id FROM graft_read('$root', 'ns.p')")
    assert(tvf.queryExecution.executedPlan.toString.contains("BatchScan"),
      "conf off: the dense-band TVF read takes the partitioned path")
    spark.conf.set(graft.catalog.MergeRead.DenseResolveConfKey, "true")
    try {
      assert(!tvf.queryExecution.executedPlan.toString.contains("BatchScan"),
        "conf on: the TVF read must pin the dense resolve")
      assert(tvf.as[Long].collect().sorted.toSeq == pinnedRows,
        "conf-pinned TVF read must be row-identical")
    } finally spark.conf.unset(graft.catalog.MergeRead.DenseResolveConfKey)
    // unparseable values fail loudly naming the key (a silently ignored
    // SET would leave the downstream aggregate re-shuffling with no signal)
    spark.conf.set(graft.catalog.MergeRead.DenseResolveConfKey, "1")
    try {
      val e = intercept[Exception](cat.readTable("ns.p").count())
      assert(e.getMessage.contains(graft.catalog.MergeRead.DenseResolveConfKey),
        s"unexpected: ${e.getMessage}")
    } finally spark.conf.unset(graft.catalog.MergeRead.DenseResolveConfKey)
  }
}
