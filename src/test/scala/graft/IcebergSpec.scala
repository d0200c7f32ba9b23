package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.interop.Iceberg
import graft.operators.Converter

/** Iceberg v2 binding: metadata/manifest roundtrips, snapshot reads, time
  * travel, partition pruning, and position/equality delete application —
  * including the converter's snapshot commit. */
class IcebergSpec extends SparkSpec {
  import spark.implicits._

  private def nation = spark.read.parquet(s"$sf/nation.parquet")
    .select("n_nationkey", "n_name", "n_regionkey")

  test("iceberg: create + append + read roundtrip, snapshot accumulation") {
    val t = tmpDir("ice-rt") + "/tbl"
    Iceberg.createTable(t, nation.schema)
    val s1 = Iceberg.append(nation.where($"n_nationkey" < 10), t)
    val s2 = Iceberg.append(nation.where($"n_nationkey" >= 10), t)
    assert(s1 != s2)
    val back = Iceberg.read(spark, t)
    assert(back.schema.fieldNames.toSeq == nation.schema.fieldNames.toSeq)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    // pinned to the first snapshot
    assert(Iceberg.read(spark, t, snapshotId = Some(s1)).count() == 10)
    // timestamp travel: at-or-after s2's commit sees everything
    val meta = Iceberg.loadMeta(t)
    val ts1 = meta.snapshots.find(_.snapshotId == s1).get.timestampMs
    assert(Iceberg.read(spark, t, asOfTimestampMs = Some(ts1)).count() == 10)
    // schema JSON roundtrips with field ids intact
    assert(meta.fieldIds == Map("n_nationkey" -> 1, "n_name" -> 2, "n_regionkey" -> 3))
    assert(meta.lastSequenceNumber == 2L)
  }

  test("iceberg: partitioned table prunes by manifest partition values") {
    val t = tmpDir("ice-part") + "/tbl"
    Iceberg.createTable(t, nation.schema, partitionCols = Seq("n_regionkey"))
    Iceberg.append(nation, t)
    val meta = Iceberg.loadMeta(t)
    val snap = meta.snapshots.head
    val entries = Iceberg.fileEntries(spark, meta, snap)
    assert(entries.forall(_.partition.contains("n_regionkey")))
    // physically delete region-4 files: a pruned read must not open them
    val doomed = entries.filter(_.partition("n_regionkey") == "4")
    assert(doomed.nonEmpty)
    doomed.foreach(e => java.nio.file.Files.delete(java.nio.file.Paths.get(e.path)))
    val pruned = Iceberg.read(spark, t, partitionFilter = Some(col("n_regionkey") === 2))
    assert(pruned.count() == nation.where($"n_regionkey" === 2).count())
    assert(pruned.orderBy("n_nationkey").collect().toSeq ==
      nation.where($"n_regionkey" === 2).orderBy("n_nationkey").collect().toSeq)
  }

  test("iceberg: converter position deletes commit as a delete snapshot") {
    val t = tmpDir("ice-posdel") + "/tbl"
    Iceberg.createTable(t, nation.schema)
    Iceberg.append(nation, t)
    // equality predicate -> position deletes via the converter compute core
    val meta = Iceberg.loadMeta(t)
    val dataFiles = Iceberg.fileEntries(spark, meta, meta.snapshots.head)
      .filter(_.content == 0).map(_.path)
    val deleteKeys = nation.where($"n_nationkey" % 3 === 0).select("n_nationkey")
    val pos = Converter.equalityToPositionDeletes(
      spark, dataFiles, nation.schema, deleteKeys, Seq("n_nationkey"))
      .select(regexp_replace(col("file_path"), "^file:/+", "/").as("file_path"), col("pos"))
    Iceberg.commitPositionDeletes(spark, t, pos)
    val back = Iceberg.read(spark, t)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.where($"n_nationkey" % 3 =!= 0).orderBy("n_nationkey").collect().toSeq)
    // the pre-delete snapshot still reads whole
    val first = Iceberg.loadMeta(t).snapshots.head.snapshotId
    assert(Iceberg.read(spark, t, snapshotId = Some(first)).count() == nation.count())
  }

  test("iceberg: equality deletes hit only strictly-older data sequences") {
    val t = tmpDir("ice-eqdel") + "/tbl"
    Iceberg.createTable(t, nation.schema)
    Iceberg.append(nation.where($"n_nationkey" < 15), t) // seq 1
    Iceberg.commitEqualityDeletes(spark, t,
      Seq(3, 7, 20).toDF("n_nationkey"), Seq("n_nationkey")) // seq 2
    Iceberg.append(nation.where($"n_nationkey" >= 15), t) // seq 3 (incl. key 20)
    val back = Iceberg.read(spark, t).select("n_nationkey").as[Int].collect().toSet
    // 3 and 7 deleted (older data); 20 survives (appended AFTER the delete)
    val expect = nation.select("n_nationkey").as[Int].collect().toSet -- Set(3, 7)
    assert(back == expect)
  }

  test("iceberg: concurrent metadata version commit is a conflict") {
    val t = tmpDir("ice-race") + "/tbl"
    Iceberg.createTable(t, nation.schema)
    // racer publishes v2 out from under us
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "metadata", "v2.metadata.json"), "{}".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](Iceberg.append(nation, t))
    assert(e.getMessage.contains("concurrent"))
  }

  test("iceberg: renamed columns read by FIELD ID; id-less files fall back to names") {
    val t = tmpDir("ice-rename") + "/tbl"
    Iceberg.createTable(t, nation.schema)
    Iceberg.append(nation, t)

    // foreign rename: a new metadata version changes the field NAME but
    // keeps its id — exactly what an Iceberg RENAME COLUMN commit does
    val metaDir = java.nio.file.Paths.get(t, "metadata")
    val v = new String(java.nio.file.Files.readAllBytes(
      metaDir.resolve("version-hint.text")), "UTF-8").trim.toInt
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(
      metaDir.resolve(s"v$v.metadata.json"))).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    import scala.jdk.CollectionConverters._
    root.get("schemas").elements().asScala.foreach { s =>
      s.get("fields").elements().asScala.foreach {
        case f: com.fasterxml.jackson.databind.node.ObjectNode
          if f.get("name").asText() == "n_name" => f.put("name", "nation_title")
        case _ =>
      }
    }
    java.nio.file.Files.write(metaDir.resolve(s"v${v + 1}.metadata.json"),
      om.writeValueAsBytes(root))
    java.nio.file.Files.write(metaDir.resolve("version-hint.text"),
      String.valueOf(v + 1).getBytes("UTF-8"))

    // pre-rename data files surface under the NEW name with the old values
    val back = Iceberg.read(spark, t)
    assert(back.columns.contains("nation_title") && !back.columns.contains("n_name"))
    assert(back.select("nation_title").as[String].collect().toSet ==
      nation.select("n_name").as[String].collect().toSet)
    // and appends under the renamed schema coexist with the old files
    Iceberg.append(back.limit(2).withColumn("n_nationkey", col("n_nationkey") + 100), t)
    assert(Iceberg.read(spark, t).count() == nation.count() + 2)

    // files written without parquet field ids still read by name
    val t2 = tmpDir("ice-noid") + "/tbl"
    Iceberg.createTable(t2, nation.schema)
    val key = "spark.sql.parquet.fieldId.write.enabled"
    val prev = spark.conf.get(key)
    try { spark.conf.set(key, "false"); Iceberg.append(nation, t2) }
    finally spark.conf.set(key, prev)
    assert(Iceberg.read(spark, t2).orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("iceberg: nested types roundtrip through schema JSON") {
    val df = Seq((1, Seq(1.5, 2.5), Map("k" -> 1L), (2, "x")))
      .toDF("id", "arr", "m", "st")
    val t = tmpDir("ice-nested") + "/tbl"
    Iceberg.createTable(t, df.schema)
    Iceberg.append(df, t)
    val back = Iceberg.read(spark, t)
    // spark.read relaxes nullability; compare types via SQL form and check
    // the metadata JSON preserved requiredness exactly
    def shape(s: StructType) = s.map(f => (f.name, f.dataType.sql.replace(" NOT NULL", "")))
    assert(shape(back.schema) == shape(df.schema))
    val meta = Iceberg.loadMeta(t)
    assert(meta.schema("id").nullable == df.schema("id").nullable)
    assert(meta.schema("st").dataType.asInstanceOf[StructType]("_2").nullable)
    assert(back.toJSON.collect().toSeq == df.toJSON.collect().toSeq)
  }

  test("iceberg: compatible schema evolution on append — widen, add-nullable") {
    val t = tmpDir("ice-evolve") + "/tbl"
    val v1 = Seq((1, "a", 1.5f), (2, "b", 2.5f)).toDF("id", "name", "score")
    Iceberg.createTable(t, v1.schema)
    Iceberg.append(v1, t)
    val idsBefore = Iceberg.loadMeta(t).fieldIds

    // widened id (int→long), score (float→double), plus a new nullable col
    val v2 = Seq((3L, "c", 3.5d, Some("x")), (4L, "d", 4.5d, None))
      .toDF("id", "name", "score", "tag")
    Iceberg.append(v2, t)

    val meta = Iceberg.loadMeta(t)
    assert(meta.schema("id").dataType == LongType)
    assert(meta.schema("score").dataType == DoubleType)
    assert(meta.schema("tag").dataType == StringType)
    // kept fields keep their ids; the new field gets a fresh one
    assert(idsBefore.forall { case (n, i) => meta.fieldIds(n) == i })
    assert(meta.fieldIds("tag") > idsBefore.values.max)

    val back = Iceberg.read(spark, t)
    assert(back.count() == 4)
    // old files project through the new schema: padded tag, upcast types
    assert(back.where($"id" === 1L).select("tag").collect()(0).isNullAt(0))
    assert(back.where($"id" === 3L).select("tag").as[String].collect().toSeq == Seq("x"))
    assert(back.schema("id").dataType == LongType)
    assert(back.select(sum($"score")).as[Double].collect()(0) == 12.0)

    // a dropped REQUIRED column (id is required in v1) still refuses
    val e = intercept[IllegalArgumentException](
      Iceberg.append(Seq(("e", 5.5d)).toDF("name", "score"), t))
    assert(e.getMessage.contains("required"))
    // a narrower-typed input is NOT an evolution — it casts up at staging
    Iceberg.append(Seq((6, "f", 6.5f, "y")).toDF("id", "name", "score", "tag"), t)
    assert(Iceberg.read(spark, t).where($"id" === 6L).count() == 1)
    // an incompatible type change refuses
    val e2 = intercept[IllegalArgumentException](
      Iceberg.append(
        Seq(("x7", "g", 7.5d, "z")).toDF("id", "name", "score", "tag"), t))
    assert(e2.getMessage.contains("incompatible"))
  }
}
