package graft

import org.apache.spark.sql.functions._

import graft.interop.DeltaLake

/** Delta Lake binding: log-replay reads, partitioned writes, metadata-only
  * deletes, time travel, checkpoint + tail replay, protocol gating. */
class InteropSpec extends SparkSpec {
  import spark.implicits._

  private def nation = spark.read.parquet(s"$sf/nation.parquet")
    .select("n_nationkey", "n_name", "n_regionkey")

  test("delta: unpartitioned append roundtrip + overwrite") {
    val t = tmpDir("delta-rt")
    val v0 = DeltaLake.write(nation, t)
    assert(v0 == 0L)
    val back = DeltaLake.read(spark, t)
    assert(back.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)

    val v1 = DeltaLake.write(nation.where($"n_regionkey" === 0), t, mode = "overwrite")
    assert(v1 == 1L)
    assert(DeltaLake.read(spark, t).count() == nation.where($"n_regionkey" === 0).count())
    // time travel back to the full table
    assert(DeltaLake.read(spark, t, versionAsOf = Some(0L)).count() == nation.count())
  }

  test("delta: partitioned writes, partition reattachment, pruning, delete") {
    val t = tmpDir("delta-part")
    DeltaLake.write(nation, t, partitionBy = Seq("n_regionkey"))
    val back = DeltaLake.read(spark, t)
    // partition column values come back intact and typed
    assert(back.schema("n_regionkey").dataType == nation.schema("n_regionkey").dataType)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)

    // pruning is behavioral: physically delete another partition's files;
    // the pruned read must succeed without ever opening them
    val doomed = DeltaLake.snapshot(spark, t).files
      .where(element_at(col("partitionValues"), "n_regionkey") === "4")
      .select("path").as[String].collect()
    assert(doomed.nonEmpty)
    doomed.foreach(p => java.nio.file.Files.delete(java.nio.file.Paths.get(p)))
    val pruned = DeltaLake.read(spark, t, partitionFilter = Some(col("n_regionkey") === 2))
    assert(pruned.count() == nation.where($"n_regionkey" === 2).count())
    // restore for the rest of the test: re-write partition 4 is not needed —
    // subsequent asserts avoid partition 4 by deleting it from the log first
    DeltaLake.deletePartitions(spark, t, col("n_regionkey") === 4)

    // metadata-only partition delete: no data files rewritten
    val filesBefore = DeltaLake.snapshot(spark, t).files
      .select("path").as[String].collect().toSet
    DeltaLake.deletePartitions(spark, t, col("n_regionkey") === 2)
    val filesAfter = DeltaLake.snapshot(spark, t).files
      .select("path").as[String].collect().toSet
    assert(filesAfter.subsetOf(filesBefore), "delete must not write data files")
    assert(DeltaLake.read(spark, t).count() ==
      nation.where(!$"n_regionkey".isin(2, 4)).count())
    // re-append the deleted region (path re-add after remove)
    DeltaLake.write(nation.where($"n_regionkey" === 2), t, partitionBy = Seq("n_regionkey"))
    assert(DeltaLake.read(spark, t).orderBy("n_nationkey").collect().toSeq ==
      nation.where($"n_regionkey" =!= 4).orderBy("n_nationkey").collect().toSeq)
  }

  test("delta: checkpoint + tail replay agrees with pure-json replay") {
    val t = tmpDir("delta-cp")
    // interval 2: versions 0,1,2,3 -> checkpoint at 2, tail 3
    DeltaLake.write(nation.where($"n_nationkey" < 5), t,
      partitionBy = Seq("n_regionkey"), checkpointInterval = 2)
    DeltaLake.write(nation.where($"n_nationkey" >= 5 && $"n_nationkey" < 10), t,
      partitionBy = Seq("n_regionkey"), checkpointInterval = 2)
    DeltaLake.write(nation.where($"n_nationkey" >= 10 && $"n_nationkey" < 15), t,
      partitionBy = Seq("n_regionkey"), checkpointInterval = 2)
    DeltaLake.write(nation.where($"n_nationkey" >= 15), t,
      partitionBy = Seq("n_regionkey"), checkpointInterval = 2)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, "_delta_log", f"${2L}%020d.checkpoint.parquet")))
    assert(DeltaLake.read(spark, t).orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    // snapshot pinned before the checkpoint still resolves (json-only replay)
    assert(DeltaLake.read(spark, t, versionAsOf = Some(1L)).count() ==
      nation.where($"n_nationkey" < 10).count())
  }

  test("delta: timestamp time travel and changes feed") {
    val t = tmpDir("delta-ts")
    DeltaLake.write(nation.where($"n_nationkey" < 10), t)
    val afterV0 = System.currentTimeMillis()
    Thread.sleep(1100) // fs mtime granularity
    DeltaLake.write(nation.where($"n_nationkey" >= 10), t)
    assert(DeltaLake.read(spark, t, timestampAsOf = Some(afterV0)).count() == 10)
    val ch = DeltaLake.changes(spark, t, 1L)
    assert(ch.where($"action" === "add").count() > 0)
    assert(ch.where($"action" === "remove").count() == 0)
  }

  test("delta: unsupported protocol is refused, not misread") {
    val t = tmpDir("delta-proto")
    DeltaLake.write(nation, t)
    // hand-write a commit that upgrades the protocol past what we support
    val log = java.nio.file.Paths.get(t, "_delta_log", f"${1L}%020d.json")
    java.nio.file.Files.write(log,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}"""
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](DeltaLake.read(spark, t))
    assert(e.getMessage.contains("v2Checkpoint"))
    // but the pre-upgrade version still reads
    assert(DeltaLake.read(spark, t, versionAsOf = Some(0L)).count() == nation.count())
  }

  test("copy: inflation-aware scan sizing + foreign-format urls") {
    import graft.io.UrlIO
    assert(UrlIO.inflationFor("/a/b/data.csv.gz") == 35)
    assert(UrlIO.inflationFor("x.parquet") == 5)
    assert(UrlIO.inflationFor("weird.xyz") == 2.5)

    // gzip-csv source -> parquet dest through copy(); split-size conf is
    // scaled during the copy and restored after
    val srcDir = tmpDir("copy-src")
    nation.write.mode("overwrite").option("compression", "gzip")
      .option("header", "true").csv(srcDir)
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    val dst = tmpDir("copy-dst") + "/out.parquet"
    UrlIO.copy(spark, s"$srcDir?format=csv", dst)
    assert(spark.conf.get(key) == prev, "conf must be restored")
    assert(spark.read.parquet(dst).count() == nation.count())

    // delta:// and iceberg:// read dispatch
    val dt = tmpDir("copy-delta")
    graft.interop.DeltaLake.write(nation, dt)
    assert(UrlIO.read(spark, s"delta://$dt").count() == nation.count())
    val it = tmpDir("copy-ice") + "/tbl"
    graft.interop.Iceberg.createTable(it, nation.schema)
    graft.interop.Iceberg.append(nation, it)
    assert(UrlIO.read(spark, s"iceberg://$it").count() == nation.count())
  }

  test("graft table exports to delta/iceberg/hive via copy; all read back equal") {
    import graft.{Graft => G}
    val cat = new graft.catalog.GraftCatalog(spark, tmpDir("export-cat"))
    G.putCatalog("exp", cat)
    cat.writeToTable(nation, "ns.nation")

    val dt = tmpDir("export-delta") + "/t"
    G.copy(spark, "graft://exp/ns.nation", s"delta://$dt?partitionBy=n_regionkey")
    assert(graft.io.UrlIO.read(spark, s"delta://$dt").orderBy("n_nationkey")
      .collect().toSeq == nation.orderBy("n_nationkey").collect().toSeq)

    val it = tmpDir("export-ice") + "/t"
    G.copy(spark, "graft://exp/ns.nation", s"iceberg://$it?partitionBy=n_regionkey")
    assert(graft.io.UrlIO.read(spark, s"iceberg://$it")
      .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
      .collect().toSeq == nation.orderBy("n_nationkey").collect().toSeq)

    // transform partitioning through the URL surface: spec-exact murmur3
    // buckets in the exported table's manifests
    val itb = tmpDir("export-ice-bucket") + "/t"
    G.copy(spark, "graft://exp/ns.nation", s"iceberg://$itb?partitionSpec=n_nationkey:bucket[4]")
    assert(graft.io.UrlIO.read(spark, s"iceberg://$itb")
      .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
      .collect().toSeq == nation.orderBy("n_nationkey").collect().toSeq)
    val bm = graft.interop.Iceberg.loadMeta(itb)
    assert(bm.specFields.map(_.transform.json) == Seq("bucket[4]"))
    val bEntries = graft.interop.Iceberg.fileEntries(spark, bm, bm.snapshots.head)
    assert(bEntries.forall(e => e.partition.get("n_nationkey_bucket").exists(v =>
      (0 until 4).map(_.toString).contains(v))))

    val ht = tmpDir("export-hive") + "/t"
    G.copy(spark, "graft://exp/ns.nation", s"hive://$ht?partitionBy=n_regionkey")
    assert(graft.io.UrlIO.read(spark, s"hive://$ht")
      .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
      .collect().toSeq == nation.orderBy("n_nationkey").collect().toSeq)

    val hu = tmpDir("export-hudi") + "/t"
    G.copy(spark, "graft://exp/ns.nation", s"hudi://$hu?partitionBy=n_regionkey")
    assert(graft.io.UrlIO.read(spark, s"hudi://$hu")
      .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
      .collect().toSeq == nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("hudi: append roundtrip, overwrite as replacecommit, instant time travel") {
    import graft.interop.Hudi
    val t = tmpDir("hudi-rt")
    val i0 = Hudi.write(nation, t)
    val back = Hudi.read(spark, t)
    assert(back.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)

    Hudi.write(nation.where($"n_regionkey" === 0), t)
    assert(Hudi.read(spark, t).count() ==
      nation.count() + nation.where($"n_regionkey" === 0).count())

    // overwrite must publish a replacecommit that hides every prior group
    Hudi.write(nation.where($"n_regionkey" === 1), t, mode = "overwrite")
    assert(Hudi.timeline(t).last.action == "replacecommit")
    assert(Hudi.read(spark, t).count() == nation.where($"n_regionkey" === 1).count())
    // time travel to the first commit sees only the original rows
    assert(Hudi.read(spark, t, asOfInstant = Some(i0)).count() == nation.count())
  }

  test("hudi: partitioned writes, typed reattachment, pruning; escapable values") {
    import graft.interop.Hudi
    val t = tmpDir("hudi-part")
    Hudi.write(nation, t, partitionBy = Seq("n_regionkey"))
    val back = Hudi.read(spark, t)
    assert(back.schema("n_regionkey").dataType == nation.schema("n_regionkey").dataType)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)

    // pruning is behavioral: physically delete another partition's files;
    // the pruned read must succeed without ever opening them
    val root = java.nio.file.Paths.get(t)
    val gone = Hudi.snapshot(spark, t).slices.filter(_.partitionPath == "n_regionkey=4")
    assert(gone.nonEmpty)
    gone.foreach(s => java.nio.file.Files.delete(root.resolve(s.relPath)))
    val pruned = Hudi.read(spark, t, partitionFilter = Some(col("n_regionkey") === 2))
    assert(pruned.count() == nation.where($"n_regionkey" === 2).count())

    // escapable partition values roundtrip through hive-style dirs
    val esc = Seq((1L, "a:b c"), (2L, "plain")).toDF("id", "k")
    val et = tmpDir("hudi-esc")
    Hudi.write(esc, et, partitionBy = Seq("k"))
    assert(Hudi.read(spark, et).select("k").as[String].collect().toSet == Set("a:b c", "plain"))
    val hit = Hudi.read(spark, et, partitionFilter = Some(col("k") === "a:b c"))
    assert(hit.select("id").as[Long].collect().toSeq == Seq(1L))

    // filter on an unpartitioned table throws instead of scanning everything
    val ut = tmpDir("hudi-nofilter")
    Hudi.write(nation, ut)
    val e = intercept[IllegalArgumentException](
      Hudi.read(spark, ut, partitionFilter = Some(col("n_regionkey") === 1)))
    assert(e.getMessage.contains("unpartitioned"))
  }

  test("hudi: foreign meta-field tables drop _hoodie_* unless asked; schema gate") {
    import graft.interop.Hudi
    // a populated-meta-fields table (what real Hudi writers produce)
    val withMeta = nation
      .withColumn("_hoodie_commit_time", lit("20260101000000000"))
      .withColumn("_hoodie_record_key", $"n_nationkey".cast("string"))
    val t = tmpDir("hudi-meta")
    Hudi.write(withMeta, t)
    val back = Hudi.read(spark, t)
    assert(!back.columns.exists(_.startsWith("_hoodie_")))
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    val kept = Hudi.read(spark, t, keepMetaFields = true)
    assert(kept.columns.contains("_hoodie_record_key"))

    // a type CHANGE (not a legal widening) still refuses
    val retyped = withMeta.withColumn("n_regionkey", $"n_regionkey".cast("string"))
    val e = intercept[IllegalArgumentException](Hudi.write(retyped, t))
    assert(e.getMessage.contains("incompatible type change"))
  }

  test("hudi: compatible schema evolution on append — widen, add-nullable") {
    import graft.interop.Hudi
    val t = tmpDir("hudi-evolve")
    Hudi.write(nation.where($"n_nationkey" < 10), t)
    // widen the key int→long, add a nullable column
    Hudi.write(nation.where($"n_nationkey" >= 10)
      .withColumn("n_nationkey", $"n_nationkey".cast("long"))
      .withColumn("tag", concat(lit("t"), $"n_nationkey")), t)
    val back = Hudi.read(spark, t)
    assert(back.schema("n_nationkey").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(back.count() == nation.count())
    assert(back.where($"n_nationkey" < 10).where($"tag".isNotNull).count() == 0)
    assert(back.where($"n_nationkey" >= 10).where($"tag".isNull).count() == 0)
    // a frame missing the optional column still appends, null-padded
    Hudi.write(nation.where($"n_nationkey" === 0)
      .withColumn("n_nationkey", $"n_nationkey" + 200), t)
    assert(Hudi.read(spark, t).where($"n_nationkey" === 200).count() == 1)
  }

  test("hudi merge-on-read: log upsert/tombstone/insert, time travel, incremental") {
    import graft.interop.Hudi
    val t = tmpDir("hudi-mor")
    val i0 = Hudi.write(nation, t,
      tableType = "MERGE_ON_READ", recordKeyFields = Seq("n_nationkey"))
    assert(Hudi.timeline(t).last.action == "deltacommit")

    // upsert: rename every %3 key via a parquet log block
    Hudi.upsertLog(
      nation.where($"n_nationkey" % 3 === 0).withColumn("n_name", concat($"n_name", lit("_v2"))), t)
    val r1 = Hudi.read(spark, t)
    assert(r1.count() == nation.count())
    assert(r1.where($"n_name".endsWith("_v2")).count() ==
      nation.where($"n_nationkey" % 3 === 0).count())

    // tombstone delete via _hoodie_is_deleted rows
    Hudi.upsertLog(
      nation.where($"n_nationkey" % 4 === 0).withColumn("_hoodie_is_deleted", lit(true)), t)
    val r2 = Hudi.read(spark, t)
    assert(r2.count() == nation.where($"n_nationkey" % 4 =!= 0).count())
    assert(!r2.columns.exists(_.startsWith("_hoodie_")))

    // brand-new keys route to a fresh log-only file group
    Hudi.upsertLog(nation.where($"n_nationkey" === 1)
      .withColumn("n_nationkey", $"n_nationkey" + 100), t)
    assert(Hudi.read(spark, t).where($"n_nationkey" === 101).count() == 1)

    // time travel to the base instant ignores every later log block
    assert(Hudi.read(spark, t, asOfInstant = Some(i0)).orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)

    // incremental pull over the upsert window returns exactly its log rows
    val tl = Hudi.timeline(t)
    val inc = Hudi.incremental(spark, t, i0, Some(tl(1).time))
    assert(inc.columns.contains("_hoodie_commit_instant"))
    assert(inc.count() == nation.where($"n_nationkey" % 3 === 0).count())
    assert(inc.where(!$"n_name".endsWith("_v2")).count() == 0)

    // partitioned MoR: an upsert batch containing keys of a partition the
    // table has NEVER seen routes them to a fresh log-only group under the
    // new hive-style dir (escaped partition value included)
    val tp = tmpDir("hudi-mor-newpart")
    val seed = Seq((1L, "a", "p one"), (2L, "b", "p one")).toDF("id", "v", "part")
    Hudi.write(seed, tp, partitionBy = Seq("part"),
      tableType = "MERGE_ON_READ", recordKeyFields = Seq("id"))
    Hudi.upsertLog(Seq((2L, "b2", "p one"), (3L, "c", "p:two")).toDF("id", "v", "part"), tp)
    val backP = Hudi.read(spark, tp)
    assert(backP.orderBy("id").collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("v"), r.getAs[String]("part"))).toSeq ==
      Seq((1L, "a", "p one"), (2L, "b2", "p one"), (3L, "c", "p:two")))
    val prunedP = Hudi.read(spark, tp, partitionFilter = Some(col("part") === "p:two"))
    assert(prunedP.select("id").as[Long].collect().toSeq == Seq(3L))

    // compaction folds logs into fresh base files; the read is unchanged,
    // no slice carries logs anymore, and clean() reclaims the old files
    val preCompact = Hudi.read(spark, t).orderBy("n_nationkey").collect().toSeq
    assert(Hudi.compact(spark, t).isDefined)
    val postSnap = Hudi.snapshot(spark, t)
    assert(postSnap.slices.forall(_.logFiles.isEmpty), "no live slice keeps logs")
    assert(Hudi.read(spark, t).orderBy("n_nationkey").collect().toSeq == preCompact)
    // time travel to the pre-compaction instant still merges the old logs
    assert(Hudi.read(spark, t, asOfInstant = Some(tl.last.time))
      .orderBy("n_nationkey").collect().toSeq == preCompact)
    assert(Hudi.clean(spark, t) > 0)
    assert(Hudi.read(spark, t).orderBy("n_nationkey").collect().toSeq == preCompact)
    // nothing left to compact
    assert(Hudi.compact(spark, t).isEmpty)
  }

  test("hudi merge-on-read: foreign DELETE_BLOCK (avro delete-record list)") {
    import graft.interop.Hudi

    // content codec round-trips; kryo-era versions refuse with context
    val recs = Seq(("k1", ""), ("f:2,g:__null__", "part=x"))
    assert(Hudi.decodeDeleteContent(Hudi.encodeDeleteContent(recs)) == recs)
    val kryo = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      o.writeInt(2); o.writeInt(4); o.write(Array[Byte](1, 2, 3, 4)); bos.toByteArray
    }
    val ex = intercept[UnsupportedOperationException](Hudi.decodeDeleteContent(kryo))
    assert(ex.getMessage.contains("kryo"))
    // an unknown FUTURE content version refuses loudly instead of
    // mis-parsing its payload as v3 avro
    val future = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      o.writeInt(4); o.writeInt(4); o.write(Array[Byte](1, 2, 3, 4)); bos.toByteArray
    }
    val exF = intercept[UnsupportedOperationException](Hudi.decodeDeleteContent(future))
    assert(exF.getMessage.contains("newer"))

    // simple key: a real delete block tombstones its keys on snapshot read,
    // later data blocks resurrect, compaction folds the result
    val t = tmpDir("hudi-delblock")
    Hudi.write(nation, t, tableType = "MERGE_ON_READ", recordKeyFields = Seq("n_nationkey"))
    Hudi.upsertLog(
      nation.where($"n_nationkey" % 3 === 0).withColumn("n_name", concat($"n_name", lit("_v2"))), t)
    val iDel = Hudi.deleteByKeyBlock(nation.where($"n_nationkey" % 4 === 0).select("n_nationkey"), t)
    val r = Hudi.read(spark, t)
    assert(r.count() == nation.where($"n_nationkey" % 4 =!= 0).count())
    assert(r.where($"n_nationkey" % 4 === 0).count() == 0)
    assert(r.where($"n_name".endsWith("_v2") && $"n_nationkey" % 4 =!= 0).count() ==
      nation.where($"n_nationkey" % 3 === 0 && $"n_nationkey" % 4 =!= 0).count())
    // a later upsert of a deleted key wins over the tombstone
    Hudi.upsertLog(nation.where($"n_nationkey" === 4), t)
    assert(Hudi.read(spark, t).where($"n_nationkey" === 4).count() == 1)
    // time travel BEFORE the delete block sees the full key set
    assert(Hudi.read(spark, t, asOfInstant = Some(Hudi.timeline(t)(1).time)).count() ==
      nation.count())
    // incremental pull over the delete window carries the tombstone flags
    val tl = Hudi.timeline(t)
    val from = tl(tl.indexWhere(_.time == iDel) - 1).time
    val inc = Hudi.incremental(spark, t, from, Some(iDel))
    assert(inc.where($"_hoodie_is_deleted").count() ==
      nation.where($"n_nationkey" % 4 === 0).count())
    // compaction folds the delete into fresh log-free bases
    val pre = Hudi.read(spark, t).orderBy("n_nationkey").collect().toSeq
    assert(Hudi.compact(spark, t).isDefined)
    assert(Hudi.snapshot(spark, t).slices.forall(_.logFiles.isEmpty))
    assert(Hudi.read(spark, t).orderBy("n_nationkey").collect().toSeq == pre)

    // composite key: "f1:v1,f2:v2" serialization incl. __null__/__empty__
    // sentinels AND separator characters (',' ':') INSIDE key values —
    // the read-side parse is field-anchored, not a blind split
    val tc = tmpDir("hudi-delblock-ck")
    val rows = Seq((1L, Option("a,b:c"), "x"), (2L, None, "y"), (3L, Option(""), "z"),
      (4L, Option("d"), "w")).toDF("id", "sub", "v")
    Hudi.write(rows, tc, tableType = "MERGE_ON_READ", recordKeyFields = Seq("id", "sub"))
    Hudi.deleteByKeyBlock(rows.where($"id" =!= 4).select("id", "sub"), tc)
    val rc = Hudi.read(spark, tc)
    assert(rc.select("id").as[Long].collect().toSeq == Seq(4L))
  }

  test("hudi merge-on-read: foreign avro data block and rollback command block") {
    import graft.interop.Hudi
    import org.apache.spark.sql.graft.formats.AvroFileFormat
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.EncoderFactory
    val t = tmpDir("hudi-mor-avro")
    Hudi.write(nation, t, tableType = "MERGE_ON_READ", recordKeyFields = Seq("n_nationkey"))
    val root = java.nio.file.Paths.get(t).toAbsolutePath
    val snap = Hudi.snapshot(spark, t)
    val s0 = snap.slices.head
    val k = spark.read.parquet(root.resolve(s0.relPath).toString)
      .select("n_nationkey").limit(1).collect()(0).getInt(0)

    // hand-craft what a real Hudi writer produces: an AVRO_DATA_BLOCK whose
    // content is formatVersion + count + per-record length-prefixed binary
    val avroSchema = AvroFileFormat.toAvroSchema(
      nation.schema, "hoodie_record")
    def avroBlockBytes(name: String): Array[Byte] = {
      val rec = new GenericData.Record(avroSchema)
      rec.put("n_nationkey", k); rec.put("n_name", name); rec.put("n_regionkey", 9)
      val bos = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      new GenericDatumWriter[GenericRecord](avroSchema).write(rec, enc)
      enc.flush()
      val recBytes = bos.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(out)
      d.writeInt(3); d.writeInt(1); d.writeInt(recBytes.length); d.write(recBytes)
      d.flush(); out.toByteArray
    }
    val i1 = (snap.instant.toLong + 1).toString
    val i2 = (snap.instant.toLong + 2).toString
    val schemaStr = avroSchema.toString
    // block at i1 (later rolled back), rollback command for i1, block at i2
    val log = new java.io.ByteArrayOutputStream()
    log.write(Hudi.frameLogBlock(3, Map(0 -> i1, 2 -> schemaStr), avroBlockBytes("ROLLED_BACK")))
    log.write(Hudi.frameLogBlock(0, Map(1 -> i1, 3 -> "0"), Array.emptyByteArray))
    log.write(Hudi.frameLogBlock(3, Map(0 -> i2, 2 -> schemaStr), avroBlockBytes("AVRO_WINS")))
    val logName = s".${s0.fileId}_${s0.instant}.log.1_0-0-0"
    java.nio.file.Files.write(root.resolve(logName), log.toByteArray)
    // two foreign deltacommits publishing the log file
    for (i <- Seq(i1, i2)) {
      val json = s"""{"partitionToWriteStats":{"":[{"fileId":"${s0.fileId}","path":"$logName"}]},
        "extraMetadata":{"schema":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(schemaStr)}}}"""
      java.nio.file.Files.write(root.resolve(".hoodie").resolve(s"$i.deltacommit"),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val r = Hudi.read(spark, t)
    assert(r.count() == nation.count())
    val hit = r.where($"n_nationkey" === k).collect()(0)
    assert(hit.getAs[String]("n_name") == "AVRO_WINS") // rollback erased i1's block
    assert(hit.getAs[Int]("n_regionkey") == 9)
  }

  test("delta: partition values with escapable chars roundtrip, incl. checkpoint") {
    val df = Seq((1L, "a:b c"), (2L, "x%25y"), (3L, "plain"), (4L, "a:b c"))
      .toDF("id", "k")
    val t = tmpDir("delta-esc")
    // interval 1 forces a checkpoint, so the encoded checkpoint paths and
    // the encoded commit paths must agree byte-for-byte
    DeltaLake.write(df, t, partitionBy = Seq("k"), checkpointInterval = 1)
    DeltaLake.write(df.where($"id" === 1L), t, partitionBy = Seq("k"), checkpointInterval = 1)
    val back = DeltaLake.read(spark, t)
    assert(back.count() == 5)
    assert(back.select("k").distinct().as[String].collect().toSet == Set("a:b c", "x%25y", "plain"))
    // pruning on the weird value hits exactly its rows
    val pruned = DeltaLake.read(spark, t, partitionFilter = Some(col("k") === "a:b c"))
    assert(pruned.select("id").as[Long].collect().toSet == Set(1L, 1L, 4L))
  }

  test("iceberg: escapable partition values prune correctly") {
    import graft.interop.Iceberg
    val df = Seq((1L, "a:b c"), (2L, "plain")).toDF("id", "k")
    val t = tmpDir("ice-esc") + "/tbl"
    Iceberg.createTable(t, df.schema, partitionCols = Seq("k"))
    Iceberg.append(df, t)
    val pruned = Iceberg.read(spark, t, partitionFilter = Some(col("k") === "a:b c"))
    assert(pruned.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("delta: readerFeatures in a CHECKPOINT-only protocol still gate the read") {
    val t = tmpDir("delta-cp-proto")
    DeltaLake.write(nation, t)
    // craft a checkpoint at v0 whose protocol demands v2Checkpoint; the
    // JSON tail above it is empty, so metadata resolution must use the
    // checkpoint AND preserve readerFeatures
    val files = DeltaLake.snapshot(spark, t).files.select("path").as[String].collect()
    val addDf = files.toSeq.toDF("p").select(struct(
      col("p").as("path"),
      map().cast(org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)).as("partitionValues"),
      lit(1L).as("size")).as("add"))
    val metaDf = Seq(1).toDF("x").select(struct(
      lit(nation.schema.json).as("schemaString"),
      array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)).as("partitionColumns")).as("metaData"))
    val protoDf = Seq(1).toDF("x").select(struct(
      lit(3).as("minReaderVersion"), lit(7).as("minWriterVersion"),
      array(lit("v2Checkpoint")).as("readerFeatures")).as("protocol"))
    val cpTmp = tmpDir("cp-build")
    addDf.unionByName(metaDf, allowMissingColumns = true)
      .unionByName(protoDf, allowMissingColumns = true)
      .coalesce(1).write.mode("overwrite").parquet(cpTmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(cpTmp)).iterator()
    val parquet = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.copy(parquet,
      java.nio.file.Paths.get(t, "_delta_log", f"${0L}%020d.checkpoint.parquet"))
    val e = intercept[IllegalArgumentException](DeltaLake.read(spark, t))
    assert(e.getMessage.contains("v2Checkpoint"))
  }

  test("schema-shape gates: type-mismatched appends are refused") {
    val t = tmpDir("delta-types")
    DeltaLake.write(nation, t)
    // delta now EVOLVES compatible shapes; a type change is not one (it
    // would need the typeWidening feature) and still refuses
    val retyped = nation.withColumn("n_regionkey", $"n_regionkey".cast("string"))
    val e1 = intercept[IllegalArgumentException](DeltaLake.write(retyped, t))
    assert(e1.getMessage.contains("incompatible type change"))

    import graft.interop.Iceberg
    val it = tmpDir("ice-types") + "/tbl"
    Iceberg.createTable(it, nation.schema)
    // iceberg now EVOLVES compatible shapes; an int→string retype is not
    // one of the spec's legal promotions and still refuses
    val e2 = intercept[IllegalArgumentException](Iceberg.append(retyped, it))
    assert(e2.getMessage.contains("incompatible type change"))
  }

  test("inflation: hive-partitioned gz source found through nested dirs; filter on unpartitioned throws") {
    val src = tmpDir("inf-src")
    nation.write.mode("overwrite").option("compression", "gzip")
      .partitionBy("n_regionkey").option("header", "true").csv(src)
    assert(graft.io.UrlIO.sourceInflation(src) == 35.0)

    val t = tmpDir("delta-nofilter")
    DeltaLake.write(nation, t) // unpartitioned
    val e = intercept[IllegalArgumentException](
      DeltaLake.read(spark, t, partitionFilter = Some(col("n_regionkey") === 1)))
    assert(e.getMessage.contains("unpartitioned"))
  }

  test("delta: deletion vectors — row-level delete with zero file rewrites") {
    val t = tmpDir("delta-dv")
    DeltaLake.write(nation, t, partitionBy = Seq("n_regionkey"))
    val filesBefore = DeltaLake.snapshot(spark, t).files
      .select("path").as[String].collect().toSet
    val v = DeltaLake.deleteWhere(spark, t, col("n_nationkey") % 3 === 0)
    assert(v == 1L)
    // same data files after the delete — only DV descriptors attached
    assert(DeltaLake.snapshot(spark, t).files
      .select("path").as[String].collect().toSet == filesBefore)
    assert(DeltaLake.snapshot(spark, t).files
      .where(col("deletionVector").isNotNull).count() > 0)
    val expect1 = nation.where($"n_nationkey" % 3 =!= 0)
    assert(DeltaLake.read(spark, t).orderBy("n_nationkey").collect().toSeq ==
      expect1.orderBy("n_nationkey").collect().toSeq)

    // a second delete merges bitmaps: cumulative row-level removal
    DeltaLake.deleteWhere(spark, t, col("n_name").startsWith("A"))
    val expect2 = nation.where($"n_nationkey" % 3 =!= 0 && !$"n_name".startsWith("A"))
    assert(DeltaLake.read(spark, t).orderBy("n_nationkey").collect().toSeq ==
      expect2.orderBy("n_nationkey").collect().toSeq)

    // time travel before any DV sees every row
    assert(DeltaLake.read(spark, t, versionAsOf = Some(0L)).count() == nation.count())
    // partition pruning composes with the DV filter (pred on a data column)
    val pruned = DeltaLake.read(spark, t, partitionFilter = Some(col("n_regionkey") === 2))
    assert(pruned.collect().toSet == expect2.where($"n_regionkey" === 2).collect().toSet)
  }

  test("delta: deletion vectors survive checkpoints; inline DVs; z85 vector") {
    // ZeroMQ RFC 32 test vector
    val hello = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte)
    assert(DeltaLake.z85Encode(hello) == "HelloWorld")
    assert(DeltaLake.z85Decode("HelloWorld").toSeq == hello.toSeq)

    // checkpoint directly after the DV commit: replay below comes from the
    // checkpoint alone (empty JSON tail), so descriptors AND the upgraded
    // protocol must have survived it
    val t = tmpDir("delta-dv-cp")
    DeltaLake.write(nation, t)
    DeltaLake.deleteWhere(spark, t, col("n_nationkey") < 5, checkpointInterval = 1)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, "_delta_log", f"${1L}%020d.checkpoint.parquet")))
    assert(DeltaLake.read(spark, t).count() == nation.where($"n_nationkey" >= 5).count())

    // inline ("i") storage: hand-written commit with the bitmap in-line
    val t2 = tmpDir("delta-dv-inline")
    DeltaLake.write(nation.coalesce(1), t2)
    val snap = DeltaLake.snapshot(spark, t2)
    val abs = snap.files.select("path").as[String].head()
    val rel = java.nio.file.Paths.get(t2).toAbsolutePath.relativize(
      java.nio.file.Paths.get(abs)).toString
    val size = snap.files.select("size").as[Long].head()
    val bm = new org.roaringbitmap.buffer.MutableRoaringBitmap()
    bm.add(0); bm.add(1); bm.add(2)
    val blob = DeltaLake.serializeBitmapArray(Seq(bm))
    val inline = DeltaLake.z85Encode(blob)
    // a compliant DV rewrite pairs the new add with a remove of the old
    // (path, no-DV) logical file — replay is keyed on (path, dvId)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t2, "_delta_log", f"${1L}%020d.json"),
      (s"""{"remove":{"path":"$rel","partitionValues":{},"dataChange":true}}""" + "\n" +
        s"""{"add":{"path":"$rel","partitionValues":{},"size":$size,""" +
        s""""deletionVector":{"storageType":"i","pathOrInlineDv":"$inline",""" +
        s""""sizeInBytes":${blob.length},"cardinality":3}}}""").getBytes("UTF-8"))
    // expected: every row except the file's first three by physical position
    val survivors = spark.read.parquet(abs)
      .where(col("_metadata.row_index") >= 3).drop("_metadata")
    assert(DeltaLake.read(spark, t2).orderBy("n_nationkey").collect().toSeq ==
      survivors.orderBy("n_nationkey").collect().toSeq)
  }

  test("delta: column-mapped tables (name mode) read under logical names") {
    import org.apache.spark.sql.types._
    val t = tmpDir("delta-cm")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t, "_delta_log"))

    def fmeta(phys: String, id: Long) = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id).build()
    val logical = StructType(Seq(
      StructField("id", LongType, true, fmeta("col-a1", 1)),
      StructField("info", StructType(Seq(
        StructField("tag", StringType, true, fmeta("col-c3", 3)))), true, fmeta("col-b2", 2)),
      StructField("k", StringType, true, fmeta("col-k9", 4))))

    // physical data files: parquet columns carry the PHYSICAL names and
    // omit the partition column
    def writePhys(rows: Seq[(Long, String)], name: String): Unit = {
      val tmp = tmpDir(s"cm-$name")
      rows.toDF("a", "c").select(col("a").as("col-a1"),
        struct(col("c").as("col-c3")).as("col-b2"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp)).iterator()
      val pq = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(pq, java.nio.file.Paths.get(t, name))
    }
    writePhys(Seq((1L, "t1"), (2L, "t2")), "f1.parquet")
    writePhys(Seq((3L, "t3")), "f2.parquet")

    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val ss = om.writeValueAsString(logical.json)
    val commit =
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"cm-test","format":{"provider":"parquet","options":{}},"schemaString":$ss,"partitionColumns":["col-k9"],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"4"},"createdTime":0}}
         |{"add":{"path":"f1.parquet","partitionValues":{"col-k9":"x"},"size":1,"modificationTime":0,"dataChange":true}}
         |{"add":{"path":"f2.parquet","partitionValues":{"col-k9":"y"},"size":1,"modificationTime":0,"dataChange":true}}""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_delta_log", f"${0L}%020d.json"), commit.getBytes("UTF-8"))

    val back = DeltaLake.read(spark, t)
    assert(back.columns.toSeq == Seq("id", "info", "k"))
    assert(back.select("info.tag").as[String].collect().toSet == Set("t1", "t2", "t3"))
    assert(back.select("id", "k").as[(Long, String)].collect().toSet ==
      Set((1L, "x"), (2L, "x"), (3L, "y")))

    // pruning happens on logical names BEFORE data files open: delete f2
    // physically, then a k="x" read must still succeed
    java.nio.file.Files.delete(java.nio.file.Paths.get(t, "f2.parquet"))
    val pruned = DeltaLake.read(spark, t, partitionFilter = Some(col("k") === "x"))
    assert(pruned.select("id").as[Long].collect().toSet == Set(1L, 2L))

    // appending to the foreign name-mode table: staged parquet must carry
    // PHYSICAL names and partitionValues must key physically, while the
    // caller speaks logical names (partitionColumns here is physical —
    // the gate maps it back)
    DeltaLake.write(
      Seq((9L, "t9", "x")).toDF("id", "c", "k")
        .select(col("id"), struct(col("c").as("tag")).as("info"), col("k")),
      t, partitionBy = Seq("k"))
    val appended = DeltaLake.read(spark, t, partitionFilter = Some(col("k") === "x"))
    assert(appended.select("id").as[Long].collect().toSet == Set(1L, 2L, 9L))
    assert(appended.where($"id" === 9L).select("info.tag").as[String].collect().toSeq == Seq("t9"))
  }

  test("delta: schema evolution on append — add-nullable, plain and column-mapped") {
    // plain table: an appended frame with a new nullable column evolves the
    // schemaString in the same commit; old rows pad null
    val t = tmpDir("delta-evolve")
    DeltaLake.write(nation.where($"n_nationkey" < 10), t)
    DeltaLake.write(
      nation.where($"n_nationkey" >= 10).withColumn("tag", concat(lit("t"), $"n_nationkey")), t)
    val back = DeltaLake.read(spark, t)
    assert(back.columns.contains("tag"))
    assert(back.count() == nation.count())
    assert(back.where($"n_nationkey" < 10).where($"tag".isNotNull).count() == 0)
    assert(back.where($"n_nationkey" >= 10).where($"tag".isNull).count() == 0)
    // and a frame MISSING the (nullable) column still appends, padded
    DeltaLake.write(
      nation.where($"n_nationkey" === 0).withColumn("n_nationkey", $"n_nationkey" + 100), t)
    assert(DeltaLake.read(spark, t).where($"n_nationkey" === 100).count() == 1)

    // column-mapped table: the new column gets a fresh physical name + id
    val tc = tmpDir("delta-evolve-cm")
    DeltaLake.write(nation.where($"n_nationkey" < 10), tc, columnMappingMode = "name")
    DeltaLake.write(
      nation.where($"n_nationkey" >= 10).withColumn("tag", concat(lit("t"), $"n_nationkey")), tc)
    val snap = DeltaLake.snapshot(spark, tc)
    val tagField = snap.schema("tag")
    assert(tagField.metadata.getString("delta.columnMapping.physicalName").startsWith("col-"))
    assert(tagField.metadata.getLong("delta.columnMapping.id") == 4L)
    val backCm = DeltaLake.read(spark, tc)
    assert(backCm.where($"n_nationkey" >= 10).where($"tag".isNull).count() == 0)
    assert(backCm.where($"n_nationkey" < 10).where($"tag".isNotNull).count() == 0)
  }

  test("delta: type widening on append — schema + protocol upgrade, old files up-cast") {
    import org.apache.spark.sql.types.{LongType, DoubleType}
    val t = tmpDir("delta-widen")
    DeltaLake.write(nation.where($"n_nationkey" < 10), t) // n_nationkey/n_regionkey are INT
    DeltaLake.write(nation.where($"n_nationkey" >= 10)
      .withColumn("n_nationkey", $"n_nationkey".cast("long"))
      .withColumn("n_regionkey", $"n_regionkey".cast("double")), t)
    val snap = DeltaLake.snapshot(spark, t)
    assert(snap.schema("n_nationkey").dataType == LongType)
    assert(snap.schema("n_regionkey").dataType == DoubleType)
    val tc = snap.schema("n_nationkey").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.length == 1 && tc(0).getString("fromType") == "integer" &&
      tc(0).getString("toType") == "long")
    val p = snap.protocol.get
    assert(p.get("minReaderVersion").asInt == 3 && p.get("minWriterVersion").asInt == 7)
    assert(p.get("readerFeatures").toString.contains("typeWidening"))
    assert(p.get("writerFeatures").toString.contains("appendOnly"), "legacy implied features enumerated")
    // read back: pre-change int32 files up-cast at scan; values preserved
    val back = DeltaLake.read(spark, t)
    assert(back.schema("n_nationkey").dataType == LongType)
    assert(back.count() == nation.count())
    assert(back.agg(sum($"n_nationkey")).head.getLong(0) ==
      nation.agg(sum($"n_nationkey".cast("long"))).head.getLong(0))
    // a narrower INCOMING frame still appends (up-cast at staging, no evolution)
    DeltaLake.write(nation.where($"n_nationkey" === 0)
      .withColumn("n_nationkey", $"n_nationkey" + 200), t)
    assert(DeltaLake.read(spark, t).where($"n_nationkey" === 200).count() == 1)
  }

  test("delta: column-mapping writes — create name-mode, append, DV delete, partition delete") {
    import scala.jdk.CollectionConverters._
    val t = tmpDir("delta-cm-write")
    DeltaLake.write(nation.where($"n_nationkey" % 2 === 0), t,
      partitionBy = Seq("n_regionkey"), columnMappingMode = "name")
    // every physical parquet column is a col-… name; no logical name leaks
    val dataFile = java.nio.file.Files.walk(java.nio.file.Paths.get(t)).iterator().asScala
      .find(p => p.getFileName.toString.endsWith(".parquet") &&
        !p.toString.contains("_delta_log")).get
    val physCols = spark.read.parquet(dataFile.toString).columns
    assert(physCols.nonEmpty && physCols.forall(_.startsWith("col-")), physCols.mkString(","))
    // partition dir uses the physical name too
    assert(dataFile.getParent.getFileName.toString.startsWith("col-"))

    DeltaLake.write(nation.where($"n_nationkey" % 2 === 1), t, partitionBy = Seq("n_regionkey"))
    assert(DeltaLake.read(spark, t).orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)

    // row-level DV delete on the mapped table (logical predicate)
    DeltaLake.deleteWhere(spark, t, $"n_nationkey" % 5 === 0)
    val afterDv = DeltaLake.read(spark, t)
    assert(afterDv.count() == nation.where($"n_nationkey" % 5 =!= 0).count())
    // protocol upgrade must re-declare columnMapping alongside deletionVectors
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val proto = java.nio.file.Files.list(java.nio.file.Paths.get(t, "_delta_log")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json")).toSeq.sorted
      .flatMap(p => java.nio.file.Files.readAllLines(p).asScala)
      .map(om.readTree).filter(_.has("protocol")).last.get("protocol")
    assert(proto.get("readerFeatures").toString.contains("columnMapping"))

    // metadata-only partition delete with a logical predicate
    DeltaLake.deletePartitions(spark, t, $"n_regionkey" === 2)
    val afterPd = DeltaLake.read(spark, t)
    assert(afterPd.count() ==
      nation.where($"n_nationkey" % 5 =!= 0 && $"n_regionkey" =!= 2).count())
    // pruned read on the logical partition name
    val pruned = DeltaLake.read(spark, t, partitionFilter = Some(col("n_regionkey") === 1))
    assert(pruned.select("n_regionkey").distinct().as[Int].collect().toSeq == Seq(1))
  }

  test("delta: DV rewrite pairs the add with a remove of the old logical file") {
    // the protocol keys logical files by (path, dv uniqueId): a foreign
    // replay must see the superseded (path, oldDV) removed or rows resurrect
    val t = tmpDir("delta-dv-remove")
    DeltaLake.write(nation.coalesce(1), t)
    DeltaLake.deleteWhere(spark, t, col("n_nationkey") < 3)
    DeltaLake.deleteWhere(spark, t, col("n_nationkey") >= 20)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def actions(v: Long) = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(t, "_delta_log", f"$v%020d.json")).toArray
      .map(l => om.readTree(l.toString))
    val v1 = actions(1L)
    assert(v1.exists(_.has("remove")), "DV commit must remove the old logical file")
    assert(v1.filter(_.has("remove")).forall(!_.get("remove").has("deletionVector")),
      "first rewrite removes the DV-less original")
    val v2 = actions(2L)
    val rm = v2.filter(_.has("remove")).map(_.get("remove"))
    assert(rm.nonEmpty && rm.forall(_.has("deletionVector")),
      "second rewrite must remove the (path, firstDV) logical file")
    // and the replay still resolves to exactly one live entry per path
    assert(DeltaLake.snapshot(spark, t).files.count() == 1)
    assert(DeltaLake.read(spark, t).count() ==
      nation.where($"n_nationkey" >= 3 && $"n_nationkey" < 20).count())
  }

  test("hudi: distributed timeline replay matches the driver loop; 1.x layout reads") {
    import graft.interop.Hudi
    val t = tmpDir("hudi-dist")
    Hudi.write(nation.where($"n_regionkey" < 2), t)
    Hudi.write(nation.where($"n_regionkey" === 2), t)
    Hudi.write(nation.where($"n_regionkey" === 3), t, mode = "overwrite") // replacecommit
    Hudi.write(nation.where($"n_regionkey" === 4), t)
    val driverRows = Hudi.read(spark, t).orderBy("n_nationkey").collect().toSeq
    val prev = Hudi.DistributedReplayThreshold
    try {
      Hudi.DistributedReplayThreshold = 1 // force the DataFrame replay
      assert(Hudi.read(spark, t).orderBy("n_nationkey").collect().toSeq == driverRows)
    } finally Hudi.DistributedReplayThreshold = prev
    assert(driverRows.map(_.getInt(2)).toSet == Set(3, 4))

    // in-job partition pruning (distributed replay) selects the same
    // slices as the driver-path prune — only survivors reach the driver
    val tp = tmpDir("hudi-dist-prune")
    val seed = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "y")).toDF("id", "v", "part")
    Hudi.write(seed.where($"id" === 1), tp, partitionBy = Seq("part"))
    Hudi.write(seed.where($"id" =!= 1), tp, partitionBy = Seq("part"))
    val want = Hudi.read(spark, tp, partitionFilter = Some(col("part") === "y"))
      .orderBy("id").collect().toSeq
    try {
      Hudi.DistributedReplayThreshold = 1
      val snapP = Hudi.snapshot(spark, tp, partitionFilter = Some(col("part") === "y"))
      assert(snapP.slices.nonEmpty && snapP.slices.forall(_.partitionPath == "part=y"),
        s"pruned-away slices must not materialize: ${snapP.slices.map(_.partitionPath)}")
      assert(Hudi.read(spark, tp, partitionFilter = Some(col("part") === "y"))
        .orderBy("id").collect().toSeq == want)
      // the IN-JOB prune itself (before the local authority pass): the raw
      // distributed replay must already return only surviving slices
      val raw = Hudi.replayDistributed(spark, tp, Hudi.timeline(tp),
        Some((Seq("part"), col("part") === "y",
          Some(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("part",
              org.apache.spark.sql.types.StringType)))))))
      assert(raw.nonEmpty && raw.forall(_.partitionPath == "part=y"),
        s"in-job prune must drop non-matching slices: ${raw.map(_.partitionPath)}")
    } finally Hudi.DistributedReplayThreshold = prev

    // foreign 1.x layout: instants under .hoodie/timeline/ with
    // <instant>_<completionTime>.commit names
    val t2 = tmpDir("hudi-v1x")
    Hudi.write(nation, t2)
    val hoodie = java.nio.file.Paths.get(t2, ".hoodie")
    val tl = hoodie.resolve("timeline")
    java.nio.file.Files.createDirectories(tl)
    val flat = java.nio.file.Files.list(hoodie).iterator()
    Iterator.continually(flat).takeWhile(_.hasNext).map(_.next())
      .filter(_.getFileName.toString.matches("^[0-9]+\\.commit.*|^[0-9]+\\.inflight$"))
      .toList.foreach { p =>
        val n = p.getFileName.toString
        val renamed = if (n.endsWith(".commit")) n.replace(".commit", "_20991231235959999.commit") else n
        java.nio.file.Files.move(p, tl.resolve(renamed))
      }
    assert(Hudi.read(spark, t2).count() == nation.count())
    Hudi.write(nation.where($"n_regionkey" === 0), t2) // append coexists with 1.x timeline
    assert(Hudi.read(spark, t2).count() ==
      nation.count() + nation.where($"n_regionkey" === 0).count())
  }

  test("hudi: incremental pull returns exactly the window's rows, tagged by instant") {
    import graft.interop.Hudi
    val t = tmpDir("hudi-incr")
    Hudi.write(nation.where($"n_regionkey" === 0), t)
    val i0 = Hudi.timeline(t).last.time
    Hudi.write(nation.where($"n_regionkey" === 1), t)
    val i1 = Hudi.timeline(t).last.time
    Hudi.write(nation.where($"n_regionkey" === 2), t)

    // (i0, i1]: only the second commit's rows, tagged with its instant
    val mid = Hudi.incremental(spark, t, i0, toInstant = Some(i1))
    assert(mid.select("n_nationkey").as[Int].collect().toSet ==
      nation.where($"n_regionkey" === 1).select("n_nationkey").as[Int].collect().toSet)
    assert(mid.select("_hoodie_commit_instant").distinct().as[String].collect().toSeq == Seq(i1))
    // (i0, ∞): commits two and three
    assert(Hudi.incremental(spark, t, i0).count() ==
      nation.where($"n_regionkey".isin(1, 2)).count())
    // from the beginning: everything
    assert(Hudi.incremental(spark, t, "").count() ==
      nation.where($"n_regionkey".isin(0, 1, 2)).count())
    // a file group replaced INSIDE the window never surfaces
    Hudi.write(nation.where($"n_regionkey" === 3), t, mode = "overwrite")
    val afterReplace = Hudi.incremental(spark, t, i1)
    assert(afterReplace.select("n_nationkey").as[Int].collect().toSet ==
      nation.where($"n_regionkey" === 3).select("n_nationkey").as[Int].collect().toSet)
    // empty window yields an empty, well-formed frame
    val none = Hudi.incremental(spark, t, Hudi.timeline(t).last.time)
    assert(none.columns.contains("_hoodie_commit_instant") && none.count() == 0)
  }

  test("hudi: incremental row-filters populated-meta rewrites; delta reads encoded absolute paths") {
    import graft.interop.Hudi
    // foreign CoW upsert shape: the second commit's base file carries
    // CARRIED-OVER rows (old _hoodie_commit_time) plus genuinely new ones —
    // the pull must return only rows whose own commit time is in the window
    val t = tmpDir("hudi-incr-meta")
    val c1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .withColumn("_hoodie_commit_time", lit("00000000000000001"))
    Hudi.write(c1, t)
    val i1 = Hudi.timeline(t).last.time
    val carried = c1 // rows rewritten into the new file with their OLD times
    val fresh = Seq((3L, "c")).toDF("id", "v")
      .withColumn("_hoodie_commit_time", lit("99999999999999999"))
    Hudi.write(carried.unionByName(fresh), t)
    val pulled = Hudi.incremental(spark, t, i1)
    assert(pulled.select("id").as[Long].collect().toSeq == Seq(3L),
      "carried-over rows must not surface in the incremental pull")

    // delta: an ABSOLUTE percent-encoded add.path must resolve to the real
    // on-disk file (decode applies to absolute paths too)
    val dt = tmpDir("delta-abs")
    DeltaLake.write(nation.coalesce(1), dt)
    val abs = DeltaLake.snapshot(spark, dt).files.select("path").as[String].head()
    val spaced = java.nio.file.Paths.get(dt, "part with space.parquet")
    java.nio.file.Files.copy(java.nio.file.Paths.get(abs), spaced)
    val encoded = spaced.toString.replace(" ", "%20")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dt, "_delta_log", f"${1L}%020d.json"),
      (s"""{"add":{"path":"$encoded","partitionValues":{},"size":1,"dataChange":true}}""")
        .getBytes("UTF-8"))
    // v1 adds the same rows again under the encoded absolute path
    assert(DeltaLake.read(spark, dt).count() == nation.count() * 2)
  }

  test("hudi: non-hive partition paths map positionally, never one-segment-for-all") {
    import graft.interop.Hudi
    assert(Hudi.partValues("2026/08", Seq("year", "month")) == Seq("2026", "08"))
    assert(Hudi.partValues("2026", Seq("year", "month")) == Seq(null, null))
    assert(Hudi.partValues("k=a%3Ab/j=2", Seq("k", "j")) == Seq("a:b", "2"))
    assert(Hudi.partValues("", Seq("k")) == Seq(null))
  }

  test("hudi: fabricated 140k-slice timeline — distributed replay engages, prune bounds the driver list, gated == driver") {
    // Round-11 gate-parity sweep (IcebergSpec's gated≡driver pattern at
    // manifest scale): 70 fabricated commit instants × 10 partitions × 200
    // slices each. Planning-only — no data file ever opens — so the test
    // proves the timeline-replay boundary: the DataFrame replay engages at
    // the REAL threshold (no var forcing), an in-job partition prune means
    // only surviving slices materialize driver-side, a replacecommit's
    // group death applies in both planners, and the two planners agree
    // slice-for-slice.
    import graft.interop.Hudi
    import com.fasterxml.jackson.databind.JsonNode
    val t = tmpDir("hudi-many")
    Hudi.write(Seq((0L, "seed", "p0")).toDF("id", "v", "part"), t, partitionBy = Seq("part"))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val hoodie = java.nio.file.Paths.get(t, ".hoodie")
    val nInstants = 70; val partsN = 10; val perPart = 200
    (0 until nInstants).foreach { i =>
      val meta = om.createObjectNode()
      val ptws = om.createObjectNode()
      (0 until partsN).foreach { p =>
        val arr = om.createArrayNode()
        (0 until perPart).foreach { j =>
          val st = om.createObjectNode()
          val fid = f"g$i%03d-$p-$j"
          st.put("fileId", fid)
          st.put("path", s"part=p$p/${fid}_0-0_fab.parquet")
          arr.add(st)
        }
        ptws.set[JsonNode](s"part=p$p", arr)
      }
      meta.set[JsonNode]("partitionToWriteStats", ptws)
      java.nio.file.Files.write(hoodie.resolve(f"20270101$i%09d.commit"),
        om.writeValueAsBytes(meta))
    }
    // one replacecommit kills commit 0's part=p3 file groups
    locally {
      val rc = om.createObjectNode()
      rc.set[JsonNode]("partitionToWriteStats", om.createObjectNode())
      val ptr = om.createObjectNode(); val arr = om.createArrayNode()
      (0 until perPart).foreach(j => arr.add(s"g000-3-$j"))
      ptr.set[JsonNode]("part=p3", arr)
      rc.set[JsonNode]("partitionToReplaceFileIds", ptr)
      java.nio.file.Files.write(hoodie.resolve("20270102000000000.replacecommit"),
        om.writeValueAsBytes(rc))
    }
    assert(Hudi.DistributedReplayThreshold <= nInstants,
      "fixture must exceed the real threshold so the distributed branch engages unforced")
    val fabricated = nInstants * partsN * perPart
    val snap = Hudi.snapshot(spark, t)
    assert(snap.slices.size == 1 + fabricated - perPart, // seed + fabricated − replaced
      s"live slice count: ${snap.slices.size}")
    // selective prune: ONLY survivors materialize on the driver
    val snapP = Hudi.snapshot(spark, t, partitionFilter = Some(col("part") === "p3"))
    assert(snapP.slices.size == (nInstants - 1) * perPart &&
      snapP.slices.forall(_.partitionPath == "part=p3"),
      s"pruned snapshot: ${snapP.slices.size}")
    // gated == driver, slice for slice
    val prev = Hudi.DistributedReplayThreshold
    try {
      Hudi.DistributedReplayThreshold = Int.MaxValue // force the driver loop
      val drvP = Hudi.snapshot(spark, t, partitionFilter = Some(col("part") === "p3"))
      assert(drvP.slices.map(s => (s.partitionPath, s.fileId, s.relPath, s.instant)) ==
        snapP.slices.map(s => (s.partitionPath, s.fileId, s.relPath, s.instant)),
        "driver and distributed planners must agree on the pruned slice set")
      val drvAll = Hudi.snapshot(spark, t)
      assert(drvAll.slices.map(s => (s.partitionPath, s.fileId)) ==
        snap.slices.map(s => (s.partitionPath, s.fileId)),
        "driver and distributed planners must agree on the full slice set")
    } finally Hudi.DistributedReplayThreshold = prev
  }

  test("delta/hudi: undecodable foreign partition spellings fail OPEN on reads, fail SAFE on deletes") {
    // Round-11 parity sweep: the Iceberg binding's fail-open rule (r10)
    // applied to the other two bindings. A foreign writer's partition
    // spelling we cannot decode must (a) never THROW planning off (ANSI
    // cast would), (b) KEEP the file on filtered reads (unknown rendering
    // must not prune matching rows), and (c) never be DELETED by a
    // metadata-only partition delete (destructive ops fail safe).
    val t = tmpDir("delta-failopen")
    DeltaLake.write(nation, t, partitionBy = Seq("n_regionkey"))
    // garble region 4's add.partitionValues in the log
    val log = java.nio.file.Paths.get(t, "_delta_log", f"${0L}%020d.json")
    val edited = new String(java.nio.file.Files.readAllBytes(log), "UTF-8")
      .replace("""{"n_regionkey":"4"}""", """{"n_regionkey":"oops"}""")
    assert(edited.contains("oops"), "fixture: expected a region-4 partition value to garble")
    java.nio.file.Files.write(log, edited.getBytes("UTF-8"))
    val r2 = nation.where($"n_regionkey" === 2).count()
    val r4 = nation.where($"n_regionkey" === 4).count()
    val pruned = DeltaLake.read(spark, t, partitionFilter = Some(col("n_regionkey") === 2))
    // matching partition intact; garbled file kept, its rows surfacing with
    // a NULL partition value (try_cast of "oops")
    assert(pruned.where($"n_regionkey" === 2).count() == r2)
    assert(pruned.where($"n_regionkey".isNull).count() == r4,
      "undecodable partition file must stay in plan (fail-open)")
    assert(pruned.count() == r2 + r4)
    // destructive direction: partition delete never touches the garbled file
    DeltaLake.deletePartitions(spark, t, col("n_regionkey") === 2)
    val after = DeltaLake.read(spark, t)
    assert(after.where($"n_regionkey" === 2).count() == 0)
    assert(after.where($"n_regionkey".isNull).count() == r4,
      "undecodable partition must survive deletePartitions (fail-safe)")

    // Hudi: fabricated foreign slices under an INT partition field — one
    // decodable non-matching (pruned), one garbage (kept), both planners
    import graft.interop.Hudi
    import com.fasterxml.jackson.databind.JsonNode
    val ht = tmpDir("hudi-failopen")
    Hudi.write(Seq((1L, "a", 5)).toDF("id", "v", "part"), ht, partitionBy = Seq("part"))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = om.createObjectNode(); val ptws = om.createObjectNode()
    for (p <- Seq("7", "oops")) {
      val arr = om.createArrayNode(); val st = om.createObjectNode()
      st.put("fileId", s"g-$p"); st.put("path", s"part=$p/g-${p}_0-0_fab.parquet")
      arr.add(st); ptws.set[JsonNode](s"part=$p", arr)
    }
    meta.set[JsonNode]("partitionToWriteStats", ptws)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ht, ".hoodie", "20270101000000000.commit"),
      om.writeValueAsBytes(meta))
    def partsOf(snap: Hudi.Snapshot) = snap.slices.map(_.partitionPath).toSet
    val drv = Hudi.snapshot(spark, ht, partitionFilter = Some(col("part") === 5))
    assert(partsOf(drv) == Set("part=5", "part=oops"),
      s"driver prune must keep match + undecodable, drop part=7: ${partsOf(drv)}")
    val prev = Hudi.DistributedReplayThreshold
    try {
      Hudi.DistributedReplayThreshold = 1
      val dist = Hudi.snapshot(spark, ht, partitionFilter = Some(col("part") === 5))
      assert(partsOf(dist) == partsOf(drv), "in-job prune must agree with the driver prune")
    } finally Hudi.DistributedReplayThreshold = prev
  }

  test("lifecycle: delta vacuum, iceberg expireSnapshots, hudi clean reclaim storage") {
    // delta vacuum: files orphaned by an overwrite go; live + DV files stay
    val t = tmpDir("delta-vac")
    DeltaLake.write(nation, t)
    DeltaLake.write(nation.where($"n_regionkey" === 1), t, mode = "overwrite")
    DeltaLake.deleteWhere(spark, t, col("n_nationkey") === 1)
    def parquets(dir: String) = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p => java.nio.file.Files.isRegularFile(p)
          && !p.toString.contains("_delta_log")
          && p.getFileName.toString.endsWith(".parquet")).size
      } finally s.close()
    }
    val before = parquets(t)
    val deleted = DeltaLake.vacuum(spark, t, retentionMs = 0L)
    assert(deleted > 0)
    assert(parquets(t) == before - deleted.toInt ||
      parquets(t) == before) // DV .bin files may be among the deleted
    val expect = nation.where($"n_regionkey" === 1 && $"n_nationkey" =!= 1)
    assert(DeltaLake.read(spark, t).orderBy("n_nationkey").collect().toSeq ==
      expect.orderBy("n_nationkey").collect().toSeq)

    // iceberg expireSnapshots: old manifest lists go, current stays readable
    import graft.interop.Iceberg
    val it = tmpDir("ice-expire") + "/tbl"
    Iceberg.createTable(it, nation.schema)
    Iceberg.append(nation.where($"n_regionkey" < 2), it)
    Iceberg.append(nation.where($"n_regionkey" === 2), it)
    Iceberg.append(nation.where($"n_regionkey" > 2), it)
    def snapLists() = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(it, "metadata"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.getFileName.toString.startsWith("snap-"))
      } finally s.close()
    }
    assert(snapLists() == 3)
    // a foreign tag on a to-be-expired snapshot must be pruned with it, or
    // real Iceberg readers reject the table (ref validation)
    locally {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val md = java.nio.file.Paths.get(it, "metadata")
      val v = new String(java.nio.file.Files.readAllBytes(
        md.resolve("version-hint.text")), "UTF-8").trim.toInt
      val root = om.readTree(java.nio.file.Files.readAllBytes(
        md.resolve(s"v$v.metadata.json")))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val oldestId = Iceberg.loadMeta(it).snapshots.minBy(_.timestampMs).snapshotId
      val refs = om.createObjectNode()
      val tag = om.createObjectNode()
      tag.put("snapshot-id", oldestId); tag.put("type", "tag")
      refs.set[com.fasterxml.jackson.databind.JsonNode]("old-tag", tag)
      root.set[com.fasterxml.jackson.databind.JsonNode]("refs", refs)
      java.nio.file.Files.write(md.resolve(s"v${v + 1}.metadata.json"),
        om.writeValueAsBytes(root))
      java.nio.file.Files.write(md.resolve("version-hint.text"),
        String.valueOf(v + 1).getBytes("UTF-8"))
    }
    val dropped = Iceberg.expireSnapshots(spark, it, keepLast = 1)
    assert(dropped >= 2) // at least the two expired manifest lists
    assert(snapLists() == 1)
    assert(Iceberg.loadMeta(it).snapshots.size == 1)
    locally {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val md = java.nio.file.Paths.get(it, "metadata")
      val v = new String(java.nio.file.Files.readAllBytes(
        md.resolve("version-hint.text")), "UTF-8").trim.toInt
      val root = om.readTree(java.nio.file.Files.readAllBytes(
        md.resolve(s"v$v.metadata.json")))
      assert(!root.path("refs").has("old-tag"), "dangling ref must be pruned")
    }
    assert(Iceberg.read(spark, it).orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)

    // hudi clean: a replaced file group's base files are reclaimed
    import graft.interop.Hudi
    val ht = tmpDir("hudi-clean")
    Hudi.write(nation, ht)
    Hudi.write(nation.where($"n_regionkey" === 0), ht, mode = "overwrite")
    val cleaned = Hudi.clean(spark, ht)
    assert(cleaned > 0)
    assert(Hudi.read(spark, ht).count() == nation.where($"n_regionkey" === 0).count())
  }

  test("delta: concurrent same-version commit loses the rename race") {
    val t = tmpDir("delta-race")
    DeltaLake.write(nation, t)
    // a racer takes version 1 after our (stale) listing saw only version 0
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_delta_log", f"${1L}%020d.json"),
      "{}".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      DeltaLake.commit(t, Seq(0L), Nil)
    }
    assert(e.getMessage.contains("concurrent"))
  }
}
