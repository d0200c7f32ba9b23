package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/** First-class table versions + lifecycle states — reference
  * storage/model/table_version.py, LifecycleState (types.py:122), and the
  * version cases of tests/catalog/main/test_catalog_impl_table_operations.py:
  * staged (UNRELEASED) versions are invisible to default reads/writes until
  * promoted ACTIVE; DEPRECATED versions refuse writes; pinned `ns.t@vN`
  * addressing targets any live version. */
class TableVersionSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(tag: String) = new GraftCatalog(spark, tmpDir(tag))

  test("createTableVersion on a missing table creates v1 in the requested state") {
    val cat = freshCat("tv-create")
    val v = cat.createTableVersion("q.t",
      schema = Some(StructType(Seq(FieldMeta.field("id", LongType, nullable = false)))),
      lifecycle = Lifecycle.Unreleased)
    assert(v == 1L)
    assert(cat.tableExists("q.t")) // exists, though nothing is active
    assert(cat.listTableVersions("q.t") == Seq(1L -> Lifecycle.Unreleased))
    intercept[NoActiveTableVersion](cat.readTable("q.t"))
    // promote → default reads work
    cat.alterTableLifecycle("q.t", Lifecycle.Active)
    cat.writeToTable(Seq((1L)).toDF("id"), "q.t", WriteMode.Add)
    assert(cat.readTable("q.t").count() == 1)
  }

  test("staged v2 with evolved schema: default stays on v1 until activation") {
    val cat = freshCat("tv-stage")
    cat.writeToTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "q.t")
    // stage a breaking change: v2 drops `v` and adds `score`
    val v2Schema = StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false),
      FieldMeta.field("score", DoubleType)))
    val v2 = cat.createTableVersion("q.t", schema = Some(v2Schema),
      lifecycle = Lifecycle.Unreleased)
    assert(v2 == 2L)
    assert(cat.listTableVersions("q.t") ==
      Seq(1L -> Lifecycle.Active, 2L -> Lifecycle.Unreleased))
    assert(cat.latestTableVersion("q.t") == 2L)
    assert(cat.latestActiveVersion("q.t") == Some(1L))

    // default read/write still serve v1
    assert(cat.readTable("q.t").columns.toSeq == Seq("id", "v"))
    assert(cat.readTable("q.t").count() == 2)
    assert(cat.tableSchema("q.t").fieldNames.toSeq == Seq("id", "v"))

    // loading the staging version requires pinning it
    cat.writeToTable(Seq((10L, 0.5), (11L, 0.7)).toDF("id", "score"), "q.t@v2", WriteMode.Add)
    assert(cat.readTable("q.t@v2").columns.toSeq == Seq("id", "score"))
    assert(cat.readTable("q.t@v2").count() == 2)
    // v1's data untouched
    assert(cat.readTable("q.t").count() == 2)

    // activation flips default resolution atomically
    val before = System.currentTimeMillis()
    Thread.sleep(5)
    cat.alterTableLifecycle("q.t@v2", Lifecycle.Active)
    assert(cat.latestActiveVersion("q.t") == Some(2L))
    assert(cat.readTable("q.t").columns.toSeq == Seq("id", "score"))
    assert(cat.readTable("q.t").as[(Long, Double)].collect().sorted.toSeq ==
      Seq((10L, 0.5), (11L, 0.7)))
    // v1 still addressable pinned; time travel before activation resolves v1
    assert(cat.readTable("q.t@v1").count() == 2)
    assert(cat.readTable("q.t", ReadOptions(asOf = Some(before))).columns.toSeq ==
      Seq("id", "v"))
  }

  test("DEPRECATED version refuses writes, pinned reads keep working") {
    val cat = freshCat("tv-deprecate")
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "q.t")
    val v2 = cat.createTableVersion("q.t", lifecycle = Lifecycle.Active)
    cat.writeToTable(Seq((2L, "b")).toDF("id", "v"), "q.t", WriteMode.Add) // lands in v2
    cat.alterTableLifecycle("q.t@v1", Lifecycle.Deprecated)
    intercept[IllegalStateException] {
      cat.writeToTable(Seq((9L, "x")).toDF("id", "v"), "q.t@v1", WriteMode.Add)
    }
    assert(cat.readTable("q.t@v1").count() == 1) // pinned read fine
    assert(cat.readTable("q.t").count() == 1)    // default = v2 (one row)
    // deprecating the ONLY active version leaves no default target
    cat.alterTableLifecycle(s"q.t@v$v2", Lifecycle.Deprecated)
    intercept[NoActiveTableVersion](cat.readTable("q.t"))
    intercept[NoActiveTableVersion] {
      cat.writeToTable(Seq((9L, "x")).toDF("id", "v"), "q.t", WriteMode.Add)
    }
  }

  test("v2 inherits schema/schemes/properties unless overridden") {
    val cat = freshCat("tv-inherit")
    cat.createTable("q.t", StructType(Seq(
      FieldMeta.field("k", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", StringType))),
      properties = Map("read_optimization" -> "NONE", "x" -> "1"))
    val v2 = cat.createTableVersion("q.t")
    val m2 = cat.getTableMeta(s"q.t@v$v2")
    assert(m2.lifecycleState == Lifecycle.Created)
    assert(m2.properties.get("x") == Some("1"))
    assert(DataType.fromJson(m2.schemaJson) == DataType.fromJson(cat.getTableMeta("q.t@v1").schemaJson))
    // merge-keyed writes work against the pinned new version
    cat.writeToTable(Seq((1L, "a")).toDF("k", "v"), s"q.t@v$v2", WriteMode.Merge)
    cat.writeToTable(Seq((1L, "b")).toDF("k", "v"), s"q.t@v$v2", WriteMode.Merge)
    assert(cat.readTable(s"q.t@v$v2").as[(Long, String)].collect().toSeq == Seq((1L, "b")))
  }

  test("bare dropTable drops every version; pinned drop removes one") {
    val cat = freshCat("tv-drop")
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "q.t")
    cat.createTableVersion("q.t", lifecycle = Lifecycle.Active)
    // pinned drop of v2 falls back to v1 as the active target
    cat.dropTable("q.t@v2")
    assert(cat.listTableVersions("q.t") == Seq(1L -> Lifecycle.Active))
    assert(cat.readTable("q.t").count() == 1)
    // bare drop removes the rest
    cat.dropTable("q.t")
    assert(!cat.tableExists("q.t"))
    intercept[TableNotFound](cat.readTable("q.t"))
  }

  test("rename moves every version atomically") {
    val cat = freshCat("tv-rename")
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "q.t")
    val v2 = cat.createTableVersion("q.t", lifecycle = Lifecycle.Unreleased)
    cat.writeToTable(Seq((2L, "b")).toDF("id", "v"), s"q.t@v$v2", WriteMode.Add)
    cat.renameTable("q.t", "t2")
    assert(!cat.tableExists("q.t"))
    assert(cat.listTableVersions("q.t2") ==
      Seq(1L -> Lifecycle.Active, 2L -> Lifecycle.Unreleased))
    assert(cat.readTable("q.t2").count() == 1)
    assert(cat.readTable("q.t2@v2").count() == 1)
  }

  test("DSv2 and deltaLog surfaces follow active-version resolution") {
    val root = tmpDir("tv-dsv2")
    val cat = new GraftCatalog(spark, root)
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "q.t")
    val v2 = cat.createTableVersion("q.t")
    cat.writeToTable(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), s"q.t@v$v2", WriteMode.Add)
    cat.alterTableLifecycle(s"q.t@v$v2", Lifecycle.Active)
    // DSv2 load resolves the newly-active version
    val t = spark.read.format("graft").option("root", root).option("table", "q.t").load()
    assert(t.count() == 2)
    // the incremental surface too
    assert(cat.deltaLog("q.t").flatMap(_.entries).nonEmpty)
    assert(cat.readChanges("q.t").count() == 2)
  }

  test("recreating a dropped table via createTableVersion does not resurrect old rows") {
    val cat = freshCat("tv-resurrect")
    cat.writeToTable(Seq((1L, "old"), (2L, "old")).toDF("id", "v"), "q.t")
    cat.dropTable("q.t") // no purge: the old incarnation's deltas remain on disk
    val v = cat.createTableVersion("q.t",
      schema = Some(StructType(Seq(
        FieldMeta.field("id", LongType, nullable = false),
        FieldMeta.field("v", StringType)))),
      lifecycle = Lifecycle.Active)
    cat.writeToTable(Seq((9L, "new")).toDF("id", "v"), s"q.t@v$v", WriteMode.Add)
    assert(cat.readTable("q.t").as[(Long, String)].collect().toSeq == Seq((9L, "new")),
      "old incarnation's rows must not resurrect")
  }

  test("asOf resolves the version active AT the travel point on every surface") {
    val cat = freshCat("tv-asof")
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "q.t")
    val v2 = cat.createTableVersion("q.t",
      schema = Some(StructType(Seq(
        FieldMeta.field("id", LongType, nullable = false),
        FieldMeta.field("score", DoubleType)))))
    cat.writeToTable(Seq((5L, 0.5)).toDF("id", "score"), s"q.t@v$v2", WriteMode.Add)
    val before = System.currentTimeMillis(); Thread.sleep(5)
    cat.alterTableLifecycle(s"q.t@v$v2", Lifecycle.Active)
    // schema/meta surfaces must agree with the data surface at asOf
    assert(cat.tableSchema("q.t", asOf = Some(before)).fieldNames.toSeq == Seq("id", "v"))
    assert(cat.getTableMeta("q.t", asOf = Some(before)).schemaJson.contains("\"v\""))
    assert(cat.manifestTable("q.t", asOf = Some(before)).count() == 1)
    assert(cat.readTable("q.t", ReadOptions(asOf = Some(before))).columns.toSeq == Seq("id", "v"))
    // and at "now" they all flip together
    assert(cat.tableSchema("q.t").fieldNames.toSeq == Seq("id", "score"))
  }

  test("staged versions do not leak through the DSv2/SQL surface") {
    val root = tmpDir("tv-dsv2-gate")
    val cat = new GraftCatalog(spark, root)
    val v = cat.createTableVersion("q.t",
      schema = Some(StructType(Seq(FieldMeta.field("id", LongType, nullable = false)))),
      lifecycle = Lifecycle.Unreleased)
    cat.writeToTable(Seq((1L)).toDF("id"), s"q.t@v$v", WriteMode.Add)
    intercept[NoActiveTableVersion] {
      spark.read.format("graft").option("root", root).option("table", "q.t").load()
    }
    cat.alterTableLifecycle(s"q.t@v$v", Lifecycle.Active)
    assert(spark.read.format("graft").option("root", root)
      .option("table", "q.t").load().count() == 1)
  }

  test("lifecycle DELETED is terminal: drop semantics, not a half-state") {
    val cat = freshCat("tv-deleted")
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "q.t")
    val v2 = cat.createTableVersion("q.t", lifecycle = Lifecycle.Active)
    cat.alterTableLifecycle("q.t@v1", Lifecycle.Deleted)
    assert(!cat.tableExists("q.t@v1"))
    assert(cat.listTableVersions("q.t") == Seq(v2 -> Lifecycle.Active))
    intercept[TableNotFound](cat.readTable("q.t@v1"))
    intercept[TableNotFound](cat.alterTableLifecycle("q.t@v1", Lifecycle.Active))
    // the table itself lives on through v2
    assert(cat.tableExists("q.t"))
  }

  test("pinned @vN addressing works on the DSv2 surface and alterTable") {
    val root = tmpDir("tv-pinned")
    val cat = new GraftCatalog(spark, root)
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "q.t")
    val v2 = cat.createTableVersion("q.t", lifecycle = Lifecycle.Unreleased)
    cat.writeToTable(Seq((2L, "b")).toDF("id", "v"), s"q.t@v$v2", WriteMode.Add)
    // a pinned DSv2 load may inspect a staged version (the unpinned gate
    // only protects DEFAULT resolution)
    val pinned = spark.read.format("graft").option("root", root)
      .option("table", s"q.t@v$v2").load()
    assert(pinned.count() == 1)
    // alterTable targeting the staged version evolves ITS schema only
    // (reference alter-with-version, catalog/main/impl.py:1730)
    def plus(base: StructType, name: String, dt: org.apache.spark.sql.types.DataType) =
      StructType(base.fields :+ FieldMeta.field(name, dt))
    cat.alterTable(s"q.t@v$v2",
      newSchema = Some(plus(cat.tableSchema(s"q.t@v$v2"), "tag", StringType)))
    assert(cat.tableSchema(s"q.t@v$v2").fieldNames.toSeq == Seq("id", "v", "tag"))
    assert(cat.tableSchema("q.t").fieldNames.toSeq == Seq("id", "v"))
    // and on the active version, the staged one is untouched
    cat.alterTable("q.t", newSchema = Some(plus(cat.tableSchema("q.t"), "act", LongType)))
    assert(cat.tableSchema("q.t").fieldNames.toSeq == Seq("id", "v", "act"))
    assert(cat.tableSchema(s"q.t@v$v2").fieldNames.toSeq == Seq("id", "v", "tag"))
  }

  test("activation is transactional: txn sees it pre-seal, others post-seal") {
    val cat = freshCat("tv-txn")
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "q.t")
    val v2 = cat.createTableVersion("q.t")
    cat.writeToTable(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), s"q.t@v$v2", WriteMode.Add)
    val tx = cat.transaction("stage activation")
    cat.alterTableLifecycle(s"q.t@v$v2", Lifecycle.Active, txn = Some(tx))
    // outside the txn: v1 still active
    assert(cat.readTable("q.t").count() == 1)
    // within: v2 already resolves (read-your-writes)
    assert(cat.readTable("q.t", ReadOptions(txn = Some(tx))).count() == 2)
    tx.seal()
    assert(cat.readTable("q.t").count() == 2)
  }

  test("CDC and compaction target pinned versions independently") {
    val cat = freshCat("tv-cross")
    cat.writeToTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "q.t")
    val v2 = cat.createTableVersion("q.t", lifecycle = Lifecycle.Unreleased)
    cat.writeToTable(Seq((10L, "x")).toDF("id", "v"), s"q.t@v$v2", WriteMode.Add)
    cat.writeToTable(Seq((11L, "y")).toDF("id", "v"), s"q.t@v$v2", WriteMode.Add)
    // each version has its own change feed
    assert(cat.readChanges(s"q.t@v$v2").count() == 2)
    assert(cat.readChanges("q.t").count() == 2)
    // compacting the staged version leaves the active one untouched
    val activeDeltas = cat.deltaLog("q.t").size
    cat.compact(s"q.t@v$v2")
    assert(cat.readTable(s"q.t@v$v2").select("id").as[Long].collect().sorted.toSeq ==
      Seq(10L, 11L))
    assert(cat.deltaLog("q.t").size == activeDeltas)
    assert(cat.readTable("q.t").count() == 2)
    // the skip index and tableInfo resolve the pinned version too
    assert(cat.analyzeTable(s"q.t@v$v2") == 0) // stats already footer-harvested
    assert(cat.tableInfo(s"q.t@v$v2").select("num_files").as[Long].head() >= 1)
  }

  test("resolveTableName pins single-version tables; activation cannot remap the pin") {
    val cat = freshCat("tv-pin")
    // missing table: bare name (a streaming sink creates it on first batch)
    assert(cat.resolveTableName("q.t") == "q.t")
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "q.t")
    // single-version tables pin to the legacy v1 layout — an UNPINNED name
    // here would silently follow a later activation (the streaming
    // source/sink hold this name across micro-batches)
    val pinned = cat.resolveTableName("q.t")
    assert(pinned == "q.t@v1")
    assert(cat.readTable(pinned).count() == 1)

    val v2 = cat.createTableVersion("q.t", lifecycle = Lifecycle.Active)
    cat.writeToTable(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), s"q.t@v$v2", WriteMode.Add)
    // new consumers resolve the activated version...
    assert(cat.resolveTableName("q.t") == s"q.t@v$v2")
    // ...but the existing pin still serves v1's data and delta log
    assert(cat.readTable(pinned).as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    assert(cat.deltaLog(pinned).size == 1)
    assert(cat.deltaLog("q.t").size == 1) // v2's own log: one append
  }
}
