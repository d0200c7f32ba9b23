package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._
import graft.txn.ConcurrentTxnConflict

/** Regressions for the second review pass: table-incarnation lifecycle,
  * janitor-vs-seal fencing, delimited bucket discovery, stats on bulk load. */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("drop + recreate does not resurrect the old incarnation's data") {
    val cat = new GraftCatalog(spark, tmpDir("graft-lc1"))
    cat.writeToTable(Seq((1L, "old")).toDF("id", "v"), "l.t")
    cat.dropTable("l.t")
    cat.createTable("l.t", StructType(Seq(
      FieldMeta.field("id", LongType), FieldMeta.field("v", StringType))))
    assert(cat.readTable("l.t").count() == 0, "dropped data resurrected")
    cat.writeToTable(Seq((2L, "new")).toDF("id", "v"), "l.t", WriteMode.Add)
    assert(cat.readTable("l.t").collect().map(_.getString(1)).toSeq == Seq("new"))
    // Rename onto a name with prior history is refused (revision collision).
    cat.writeToTable(Seq((3L, "x")).toDF("id", "v"), "l.u")
    cat.dropTable("l.u")
    cat.writeToTable(Seq((4L, "y")).toDF("id", "v"), "l.w")
    val e = intercept[IllegalArgumentException] { cat.renameTable("l.w", "u") }
    assert(e.getMessage.contains("prior table history"))
  }

  test("dropTable purge deletes data files; plain drop preserves them") {
    val cat = new GraftCatalog(spark, tmpDir("graft-lc-purge"))
    cat.writeToTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "l.keep")
    cat.writeToTable(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), "l.gone")
    def files(t: String): Seq[String] =
      cat.manifestTable(t).select("path").collect().map(_.getString(0)).toSeq
    val keepFiles = files("l.keep")
    val goneFiles = files("l.gone")
    assert(keepFiles.nonEmpty && goneFiles.nonEmpty)

    cat.dropTable("l.keep")
    assert(keepFiles.forall(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
      "plain drop must preserve data files (time travel)")

    cat.dropTable("l.gone", purge = true)
    assert(goneFiles.forall(p => !java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
      "purge must delete every manifest-listed data file")

    // Purge inside a caller-managed transaction is refused.
    cat.writeToTable(Seq((5L, "e")).toDF("id", "v"), "l.tx")
    val tx = cat.transaction("no-purge")
    intercept[IllegalArgumentException] { cat.dropTable("l.tx", Some(tx), purge = true) }
    tx.abort()
  }

  test("many-file purge deletes via a distributed job, not a driver loop") {
    val cat = new GraftCatalog(spark, tmpDir("graft-lc-bigpurge"))
    cat.createTable("l.big", StructType(Seq(
      FieldMeta.field("id", LongType), FieldMeta.field("v", StringType))),
      properties = Map("write.max_records_per_file" -> "2"))
    cat.writeToTable((1L to 300L).map(i => (i, s"v$i")).toDF("id", "v"),
      "l.big", WriteMode.Add)
    val paths = cat.manifestTable("l.big").select("path").collect().map(_.getString(0)).toSeq
    assert(paths.size > 64, s"fixture too small for the distributed branch: ${paths.size}")
    // Count job stages while the purge runs: past the threshold the deletes
    // must go through a Spark job (multi-task), never a serial driver loop.
    @volatile var deleteTasks = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        deleteTasks += sc.stageInfo.numTasks
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      cat.dropTable("l.big", purge = true)
      // listener events are async; poll briefly for the stage-completed event
      val deadline = System.currentTimeMillis() + 10000
      while (deleteTasks <= 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(deleteTasks > 1, "purge of a many-file table must run as a multi-task Spark job")
    assert(paths.forall(p => !java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
      "purge must delete every manifest-listed data file")
  }

  test("a janitor-failed transaction cannot seal afterwards") {
    val cat = new GraftCatalog(spark, tmpDir("graft-lc2"))
    cat.writeToTable(Seq((1L, "a")).toDF("id", "v"), "l.t")
    val tx = cat.transaction("slowpoke")
    cat.alterTable("l.t", setProperties = Map("x" -> "1"), txn = Some(tx))
    Thread.sleep(5) // step past the txn's start millisecond (timeout 0)
    cat.janitor(timeoutMillis = 0) // times the txn out
    intercept[ConcurrentTxnConflict] { tx.seal() }
    assert(!cat.getTableMeta("l.t").properties.contains("x"))
    // Abandoned PAUSED txns are also reclaimed.
    val tp = cat.transaction("paused-then-abandoned")
    cat.alterTable("l.t", setProperties = Map("y" -> "2"), txn = Some(tp))
    tp.pause()
    Thread.sleep(5)
    val (failed, _) = cat.janitor(timeoutMillis = 0)
    assert(failed == 1, "paused txn not timed out")
    intercept[IllegalArgumentException] { cat.store.resumeTransaction(tp.txnId) }
  }

  test("delimited bucket discovery reads delete files by written schema") {
    // Key is the SECOND schema column: a positional read of the delete file
    // would hash the wrong column and copy-by-reference would drop the
    // delete. Verified through compaction on a TSV table.
    val cat = new GraftCatalog(spark, tmpDir("graft-lc3"))
    cat.createTable("l.t", StructType(Seq(
      FieldMeta.field("v", StringType),
      FieldMeta.field("k", IntegerType, nullable = false, mergeKey = true))),
      properties = Map("content_type" -> "tsv", "read_optimization" -> "NONE"))
    cat.writeToTable((1 to 50).map(i => (s"v$i", i)).toDF("v", "k"), "l.t", WriteMode.Merge)
    cat.compact("l.t", numBuckets = 4)
    cat.writeToTable(Seq(Tuple1(7)).toDF("k"), "l.t", WriteMode.Delete)
    cat.compact("l.t", numBuckets = 4)
    val keys = cat.readTable("l.t").select("k").collect().map(_.getInt(0)).toSet
    assert(!keys.contains(7), "delete dropped by misaligned bucket discovery")
    assert(keys.size == 49)
  }

  test("bulk-load deltas carry column stats; empty reads honor withFilePath") {
    val cat = new GraftCatalog(spark, tmpDir("graft-lc4"))
    cat.createTable("l.t", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
      FieldMeta.field("score", IntegerType))))
    cat.writeToTable(Seq((1L, 10), (2L, 30)).toDF("id", "score"), "l.t", WriteMode.Merge)
    val st = cat.columnStats("l.t").collect()
      .map(r => r.getString(1) -> (r.getString(2), r.getString(3))).toMap
    assert(st("score") == ("10", "30"), s"bulk-load stats missing: $st")
    // Empty table + withFilePath must not throw.
    cat.createTable("l.e", StructType(Seq(FieldMeta.field("id", LongType))))
    val empty = cat.readTable("l.e", ReadOptions(withFilePath = true))
    assert(empty.columns.contains("_file_path") && empty.count() == 0)
  }
}
