package graft

import org.apache.spark.sql.functions._

import graft.catalog._
import graft.model._

/**
 * Plan-quality guard: every registered read/pipeline query must plan
 * without an all-pairs join (except the brute-force ANN baseline, which is
 * one by design), filters must push to the parquet scan, and the
 * merge-on-read bucket pruning must leave untouched buckets scan-only.
 */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private val sfd = "/root/testdata/sf0.001"

  test("no registered read/pipeline query plans a cartesian product") {
    val skip = Set("t06_ann_brute") // broadcast nested-loop baseline by design
    val names = (queries.ReadQueries.all ++ queries.PipelineQueries.all)
      .map(_.name).filterNot(skip)
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfd).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$n plans CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$n plans BroadcastNestedLoopJoin")
    }
  }

  test("LSH candidate distincts dedup id pairs, not dim-sized vectors") {
    // The cross-table candidate dedup in lshTopK / embeddingNearDupPairs
    // must shuffle id pairs only — a distinct whose output carries the
    // embedding arrays multiplies shuffle bytes by ~2·dim·8 per duplicate
    // candidate at corpus scale. Vectors rejoin after the distinct.
    Seq("t07_ann_lsh", "t09_embedding_neardup").foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfd).queryExecution.sparkPlan
      val distincts = plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if a.aggregateExpressions.isEmpty && a.groupingExpressions.nonEmpty => a
      }
      assert(distincts.nonEmpty, s"$n: expected a candidate-dedup distinct in the plan")
      distincts.foreach { a =>
        val arrays = a.output.filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        assert(arrays.isEmpty,
          s"$n: candidate distinct carries array column(s) ${arrays.map(_.name).mkString(",")}")
      }
    }
  }

  test("catalog read pushes filters and projection into the parquet scan") {
    val cat = new GraftCatalog(spark, tmpDir("graft-plan"))
    cat.writeToTable((1L to 1000L).map(i => (i, s"n$i", (i % 5).toInt)).toDF("id", "name", "grp"), "p.t")
    val df = cat.readTable("p.t", ReadOptions(
      columns = Some(Seq("name")), partitionFilter = Some(col("grp") === 2)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(grp,2)"),
      s"filter not pushed to scan:\n$plan")
    assert(!plan.split("ReadSchema:")(1).split(">")(0).contains("id"),
      "projection not pruned to scan")
  }

  test("bucket-pruned merge-on-read: untouched buckets stream scan-only (union plan)") {
    val cat = new GraftCatalog(spark, tmpDir("graft-plan2"))
    cat.createTable("p.m", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType, nullable = false, mergeKey = true),
      FieldMeta.field("v", org.apache.spark.sql.types.StringType))),
      properties = Map("read_optimization" -> "NONE"))
    cat.writeToTable((1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v"), "p.m", WriteMode.Merge)
    cat.compact("p.m", numBuckets = 8)
    cat.writeToTable(Seq((1L, "updated")).toDF("id", "v"), "p.m", WriteMode.Merge)
    val df = cat.readTable("p.m")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Union"), s"expected union of merged + scan-only branches:\n$plan")
    // Only ONE window (the merge branch); scan-only branch must have none.
    assert("Window".r.findAllIn(plan).size <= 2, // Window + WindowExec naming variance
      s"untouched buckets should not pass through the merge window:\n$plan")
    assert(df.count() == 1000)
  }

  test("write path honors max_records_per_file slicing") {
    val cat = new GraftCatalog(spark, tmpDir("graft-plan3"))
    cat.createTable("p.s", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType))),
      properties = Map("write.max_records_per_file" -> "100"))
    cat.writeToTable((1L to 1000L).map(Tuple1(_)).toDF("id").repartition(1), "p.s", WriteMode.Add)
    assert(cat.manifestTable("p.s").count() == 10)
  }

  test("metafilesDF exposes the metadata tree; event-time watermark from stats") {
    val cat = new GraftCatalog(spark, tmpDir("graft-plan4"))
    cat.createTable("p.e", org.apache.spark.sql.types.StructType(Seq(
      FieldMeta.field("id", org.apache.spark.sql.types.LongType),
      FieldMeta.field("ts", org.apache.spark.sql.types.TimestampNTZType, eventTime = true))))
    val df = Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-02 09:30:00"))
      .toDF("id", "s").select($"id", $"s".cast("timestamp_ntz").as("ts"))
    cat.writeToTable(df, "p.e", WriteMode.Chrono)
    val kinds = cat.metafilesDF().select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds.contains("meta") && kinds.contains("delta"))
    assert(cat.metafilesDF().where(!$"committed").count() == 0)
    assert(cat.eventTimeWatermark("p.e").contains("2024-01-02 09:30:00"))
    assert(cat.eventTimeWatermark("p.e").isDefined)
    // Past 8 table dirs the listing walks as a distributed job; the output
    // must be identical in content to the driver-side walk's.
    val before = cat.metafilesDF().collect().map(_.toSeq).toSet
    (1 to 9).foreach(i => cat.writeToTable(Seq((i.toLong, s"v$i")).toDF("id", "v"), s"p.m$i"))
    val after = cat.metafilesDF()
    val rows = after.collect()
    assert(before.subsetOf(rows.map(_.toSeq).toSet), "distributed walk lost driver-walk rows")
    (1 to 9).foreach { i =>
      assert(rows.exists(r => r.getString(0).contains(s"/m$i/") && r.getString(1) == "meta"),
        s"table p.m$i missing from distributed metafilesDF")
    }
    assert(after.where(!$"committed").count() == 0)
  }
}
