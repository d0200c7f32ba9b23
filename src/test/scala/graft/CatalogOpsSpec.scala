package graft

import org.apache.spark.sql.functions._

import graft.catalog._
import graft.model._

/** Namespaces (props/alter/drop/default), janitor, column stats, multi-
  * catalog registry, URL IO. */
class CatalogOpsSpec extends SparkSpec {
  import spark.implicits._

  test("namespace create/alter/drop with properties and cascade") {
    val cat = new GraftCatalog(spark, tmpDir("graft-ns"))
    cat.createNamespace("a", Map("owner" -> "x"))
    assert(cat.namespaceProperties("a") == Map("owner" -> "x"))
    cat.alterNamespace("a", Map("ttl" -> "7d"))
    assert(cat.namespaceProperties("a") == Map("owner" -> "x", "ttl" -> "7d"))
    cat.writeToTable(Seq((1L, "v")).toDF("id", "v"), "a.t")
    intercept[IllegalArgumentException] { cat.dropNamespace("a") }
    cat.dropNamespace("a", cascade = true)
    assert(!cat.namespaceExists("a"))
    assert(!cat.tableExists("a.t"))
  }

  test("default namespace routes unqualified table names") {
    val cat = new GraftCatalog(spark, tmpDir("graft-dns"))
    cat.defaultNamespace = "work"
    cat.writeToTable(Seq((1L, "v")).toDF("id", "v"), "t")
    assert(cat.tableExists("work.t"))
    assert(cat.readTable("t").count() == 1)
  }

  test("refreshTable invalidates cached metadata; unknown table rejected") {
    val cat = new GraftCatalog(spark, tmpDir("graft-refresh"))
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.r")
    cat.refreshTable("ns.r") // must not throw; next read sees latest state
    assert(cat.readTable("ns.r").count() == 1)
    intercept[graft.catalog.TableNotFound](cat.refreshTable("ns.missing"))
  }

  test("janitor fails timed-out running txns and sweeps their staged files") {
    val cat = new GraftCatalog(spark, tmpDir("graft-jan"))
    cat.writeToTable(Seq((1L, "v")).toDF("id", "v"), "ns.t")
    // Abandon a txn mid-flight (crash simulation: never sealed or aborted).
    val tx = cat.transaction("abandoned")
    cat.alterTable("ns.t", setProperties = Map("x" -> "1"), txn = Some(tx))
    // A warm JVM can reach the janitor within the txn's start millisecond,
    // making `now - start > 0` flicker false — step past the tick.
    Thread.sleep(5)
    val (failedTxns, swept) = cat.janitor(timeoutMillis = 0)
    assert(failedTxns == 1)
    assert(swept == 1)
    // The abandoned property never became visible; table still readable.
    assert(!cat.getTableMeta("ns.t").properties.contains("x"))
    assert(cat.readTable("ns.t").count() == 1)
  }

  test("column stats ride the write and surface per delta") {
    val cat = new GraftCatalog(spark, tmpDir("graft-stats"))
    cat.writeToTable(Seq((1L, "a", 10.5), (5L, null, 2.0), (3L, "c", 7.25))
      .toDF("id", "name", "score"), "ns.t")
    val st = cat.columnStats("ns.t").collect()
      .map(r => r.getString(1) -> (r.getString(2), r.getString(3), r.getLong(4))).toMap
    assert(st("id") == ("1", "5", 0L))
    assert(st("name") == ("a", "c", 1L))
    assert(st("score") == ("2.0", "10.5", 0L))
  }

  test("converter: equality deletes -> position deletes; PK dedupe across files") {
    import graft.operators.Converter
    val dir = tmpDir("graft-conv")
    val a = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val b = Seq((3L, "c2"), (4L, "d")).toDF("id", "v")
    a.repartition(1).sortWithinPartitions("id").write.parquet(s"$dir/f1")
    b.repartition(1).sortWithinPartitions("id").write.parquet(s"$dir/f2")
    def files(p: String) = {
      import scala.collection.JavaConverters._
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(p))
      try st.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toList
      finally st.close()
    }
    val all = files(s"$dir/f1") ++ files(s"$dir/f2")
    // equality delete id=2 -> exactly one (file, pos=1) in f1
    val pd = Converter.equalityToPositionDeletes(spark, all, a.schema,
      Seq(Tuple1(2L)).toDF("id"), Seq("id")).collect()
    assert(pd.length == 1 && pd.head.getLong(1) == 1L && pd.head.getString(0).contains("f1"))
    // PK dedupe: id=3 appears in both; lower-sequence file's row is deleted
    val seqd = files(s"$dir/f1").map(_ -> 1L) ++ files(s"$dir/f2").map(_ -> 2L)
    val dd = Converter.duplicateKeyPositionDeletes(spark, seqd, a.schema, Seq("id")).collect()
    assert(dd.length == 1 && dd.head.getString(0).contains("f1") && dd.head.getLong(1) == 2L)
  }

  test("multi-catalog registry + URL get/put/list/copy with transforms") {
    val root1 = tmpDir("graft-cat1"); val root2 = tmpDir("graft-cat2")
    Graft.initCatalog("c1", spark, root1)
    Graft.initCatalog("c2", spark, root2)
    assert(Graft.listCatalogs.contains("c1") && Graft.listCatalogs.contains("c2"))

    val src = tmpDir("graft-url-src") + "/in.parquet"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").write.parquet(src)

    // file → graft with an uppercase transform
    Graft.copy(spark, src, "graft://c1/ns.t",
      transforms = Seq(df => df.withColumn("v", upper(col("v")))))
    val got = Graft.get(spark, "graft://c1/ns.t").orderBy("id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("A", "B", "C"))

    // graft → graft across catalogs, then graft → file
    Graft.copy(spark, "graft://c1/ns.t", "graft://c2/ns.t2")
    assert(Graft.get(spark, "graft://c2/ns.t2").count() == 3)
    val outDir = tmpDir("graft-url-out") + "/out.csv"
    Graft.copy(spark, "graft://c2/ns.t2", outDir)
    assert(spark.read.option("header", "true").csv(outDir).count() == 3)

    assert(Graft.list(spark, "graft://c1/ns") == Seq("ns.t"))
    assert(Graft.list(spark, "graft://c1/") == Seq("ns"))

    // avro/feather round the URL surface too (extension-dispatched)
    for (ext <- Seq("avro", "feather")) {
      val out = tmpDir(s"graft-url-$ext") + s"/out.$ext"
      Graft.copy(spark, "graft://c1/ns.t", out)
      assert(Graft.get(spark, out).count() == 3, s"$ext url roundtrip")
    }
  }

  test("URL ops the reference declares but never implemented: concat/delete/move/exists/touch/head/tail/query") {
    Graft.initCatalog("u1", spark, tmpDir("graft-uops"))
    val a = tmpDir("graft-uops-a") + "/a.parquet"
    val b = tmpDir("graft-uops-b") + "/b.parquet"
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").write.parquet(a)
    Seq((3L, "z")).toDF("id", "v").write.parquet(b)

    // concat appends source rows into an existing graft table
    Graft.copy(spark, a, "graft://u1/ns.t")
    Graft.concat(spark, b, "graft://u1/ns.t")
    assert(Graft.get(spark, "graft://u1/ns.t").count() == 3)

    // head/tail/query
    assert(Graft.head(spark, "graft://u1/ns.t", 2).count() == 2)
    assert(Graft.tail(spark, "graft://u1/ns.t", 1).count() == 1)
    Graft.get(spark, "graft://u1/ns.t").createOrReplaceTempView("uops_t")
    assert(Graft.query(spark, "SELECT count(*) AS n FROM uops_t")
      .head().getLong(0) == 3)

    // exists / touch
    assert(Graft.exists(spark, "graft://u1/ns.t"))
    assert(!Graft.exists(spark, "graft://u1/ns.missing"))
    assert(Graft.exists(spark, a))
    Graft.touch(spark, "graft://u1/fresh")
    assert(Graft.exists(spark, "graft://u1/fresh"))
    val touched = tmpDir("graft-uops-touch") + "/marker"
    Graft.touch(spark, touched)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(touched)))

    // move = copy + delete; delete removes files and graft tables
    val moved = tmpDir("graft-uops-moved") + "/m.parquet"
    Graft.move(spark, b, moved)
    assert(Graft.get(spark, moved).count() == 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(b)))
    Graft.delete(spark, "graft://u1/ns.t")
    assert(!Graft.exists(spark, "graft://u1/ns.t"))

    // dot-less delete targets the NAMESPACE (cascade), matching touch/exists
    assert(Graft.exists(spark, "graft://u1/fresh"))
    Graft.delete(spark, "graft://u1/fresh")
    assert(!Graft.exists(spark, "graft://u1/fresh"))

    // registry pop/clear (don't clear the whole registry mid-suite)
    Graft.initCatalog("u-pop", spark, tmpDir("graft-upop"))
    assert(Graft.popCatalog("u-pop").isDefined)
    assert(!Graft.catalogExists("u-pop"))
    assert(Graft.popCatalog("u-pop").isEmpty)
  }
}
