package graft

import org.apache.spark.sql.functions._

import graft.catalog._
import graft.model._

/** Per-delta download APIs, repartition rewrite, paged listings, txn
  * pause/resume. */
class DeltaApiSpec extends SparkSpec {
  import spark.implicits._

  test("downloadDelta and downloadDeltaManifestEntry read exactly one delta/file") {
    val cat = new GraftCatalog(spark, tmpDir("graft-dl"))
    cat.writeToTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1), "ns.t")
    cat.writeToTable(Seq((3L, "c")).toDF("id", "v").repartition(1), "ns.t", WriteMode.Add)
    val log = cat.deltaLog("ns.t")
    assert(log.size == 2)
    assert(cat.downloadDelta("ns.t", log.head.streamPosition).count() == 2)
    assert(cat.downloadDelta("ns.t", log.last.streamPosition)
      .select("id").head().getLong(0) == 3L)
    assert(cat.downloadDeltaManifestEntry("ns.t", log.head.streamPosition, 0).count() == 2)
    intercept[IllegalArgumentException] {
      cat.downloadDeltaManifestEntry("ns.t", log.head.streamPosition, 5)
    }
  }

  test("repartitionTable rewrites files without changing content") {
    val cat = new GraftCatalog(spark, tmpDir("graft-rep"))
    cat.writeToTable((1L to 100L).map(i => (i, i % 10)).toDF("id", "g"), "ns.t")
    val before = cat.readTable("ns.t").orderBy("id").collect().toSeq
    cat.repartitionTable("ns.t", 4, byColumns = Seq("g"))
    assert(cat.readTable("ns.t").orderBy("id").collect().toSeq == before)
    // ≤ numPartitions files (hash partitions may be empty and write none)
    val nFiles = cat.manifestTable("ns.t").count()
    assert(nFiles >= 2 && nFiles <= 4)
    cat.repartitionTable("ns.t", 2, byColumns = Seq("id"), range = true)
    assert(cat.readTable("ns.t").orderBy("id").collect().toSeq == before)
  }

  test("paged listings walk in stable order with a resume token") {
    val cat = new GraftCatalog(spark, tmpDir("graft-page"))
    ('a' to 'e').foreach(c => cat.writeToTable(Seq((1L, "v")).toDF("id", "v"), s"ns.t$c"))
    val (p1, tok1) = cat.listTablesPaged("ns", 2)
    assert(p1 == Seq("ta", "tb") && tok1.contains("tb"))
    val (p2, tok2) = cat.listTablesPaged("ns", 2, tok1)
    assert(p2 == Seq("tc", "td") && tok2.contains("td"))
    val (p3, tok3) = cat.listTablesPaged("ns", 2, tok2)
    assert(p3 == Seq("te") && tok3.isEmpty)
  }

  test("txn pause survives handle loss and resumes to an atomic commit") {
    val cat = new GraftCatalog(spark, tmpDir("graft-pause"))
    val tx = cat.transaction("long-running ingest")
    cat.createTable("ns.t", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType))), txn = Some(tx))
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "ns.t", WriteMode.Add, txn = Some(tx))
    val id = tx.txnId
    tx.pause()
    intercept[IllegalArgumentException] { tx.stage(null, 0, "", "", "") }
    assert(!cat.tableExists("ns.t"), "paused txn must stay invisible")

    val resumed = cat.store.resumeTransaction(id)
    cat.writeToTable(Seq((2L, "b")).toDF("id", "v"), "ns.t", WriteMode.Add, txn = Some(resumed))
    resumed.seal()
    assert(cat.readTable("ns.t").count() == 2)
    assert(cat.historyDF().where(col("txn_id") === id).count() == 1)
  }
}
