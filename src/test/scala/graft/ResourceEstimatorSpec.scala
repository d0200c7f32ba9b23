package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._

/** Resource estimation (SURVEY §2 row 27 — the last "partial"): method
  * semantics mirror reference compute/resource_estimation: per-entry
  * fallback chains, intelligent type-aware sizing, footer-probe sampling. */
class ResourceEstimatorSpec extends SparkSpec {
  import spark.implicits._
  import ResourceEstimator.{Method, Params}

  private def newCatalog(): GraftCatalog = new GraftCatalog(spark, tmpDir("graft-re"))

  test("intelligent estimate from manifest stats matches the hand-computed model") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false),
      FieldMeta.field("name", StringType)))
    cat.createTable("re.a", schema)
    // 10 rows, 2 nulls; min="aa" (2), max="zzzz" (4)
    val names = Seq("aa", "bbb", "cccc", "dd", "ee", "ffff", "gg", "zzzz", null, null)
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    cat.writeToTable(df.repartition(1), "re.a")
    val est = cat.estimateResources("re.a",
      Params(method = Method.Intelligent, parquetToArrowInflation = 1.0))
    // longs: 10*8; strings: 8 non-null * ((2+4)/2 + 4) + 2 nulls * 4
    val expected = 10 * 8.0 + 8 * ((2 + 4) / 2.0 + 4) + 2 * 4.0
    assert(est.memoryBytes === expected, s"got ${est.memoryBytes}")
    assert(est.records == 10 && est.files == 1)
    assert(est.methodsUsed == Map("intelligent" -> 1))
  }

  test("default chain uses manifest-cached uncompressed bytes × inflation") {
    val cat = newCatalog()
    cat.createTable("re.b", StructType(Seq(FieldMeta.field("id", LongType, nullable = false))))
    cat.writeToTable((1L to 1000L).toDF("id").repartition(1), "re.b")
    val t = TableHandle.parse("re.b")
    val entry = cat.effectiveDeltas(t, None).flatMap(_.entries).head
    assert(entry.uncompressedBytes > 0, "commit path should cache uncompressed size")
    val est = cat.estimateResources("re.b") // Default: content_type_meta first
    assert(est.methodsUsed == Map("content_type_meta" -> 1))
    assert(est.memoryBytes === entry.uncompressedBytes * ResourceEstimator.DefaultParquetToArrowInflation)
    assert(est.onDiskBytes == entry.sizeBytes)
  }

  test("unpriceable schema falls through intelligent to footer sampling") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false),
      FieldMeta.field("emb", ArrayType(FloatType)))) // nested: stats can't price it
    cat.createTable("re.c", schema)
    val df = (1L to 100L).map(i => (i, Array.fill(8)(i.toFloat))).toDF("id", "emb")
    cat.writeToTable(df.repartition(2), "re.c")
    val est = cat.estimateResources("re.c", Params(method = Method.DefaultV2))
    assert(est.methodsUsed.keySet == Set("file_sampling"), s"${est.methodsUsed}")
    // Footer probe: ids 100×8; emb values are FLOATs under a list — 800×4 —
    // plus uncompressed overhead bounds; just require a sane band.
    assert(est.memoryBytes > 100 * 8 && est.memoryBytes < 1e6, s"${est.memoryBytes}")
  }

  test("non-parquet tables estimate by previous inflation; rows derive from avg record size") {
    val cat = newCatalog()
    cat.createTable("re.d", StructType(Seq(FieldMeta.field("id", LongType, nullable = false))),
      properties = Map("content_type" -> "csv"))
    cat.writeToTable((1L to 50L).toDF("id").repartition(1), "re.d")
    val t = TableHandle.parse("re.d")
    val entry = cat.effectiveDeltas(t, None).flatMap(_.entries).head
    assert(entry.uncompressedBytes <= 0 && entry.stats == null)
    val est = cat.estimateResources("re.d",
      Params(previousInflation = 2.0, averageRecordBytes = Some(4.0)))
    assert(est.methodsUsed == Map("previous_inflation" -> 1))
    assert(est.memoryBytes === entry.sizeBytes * 2.0)
    // CSV footers carry no row count → rows derived from memory / avg bytes
    assert(est.records == (entry.sizeBytes * 2.0 / 4.0).toLong)
  }

  test("DefaultV2 on a non-parquet table falls through sampling to previous inflation") {
    val cat = newCatalog()
    cat.createTable("re.g", StructType(Seq(FieldMeta.field("id", LongType, nullable = false))),
      properties = Map("content_type" -> "csv"))
    cat.writeToTable((1L to 50L).toDF("id"), "re.g")
    // intelligent declines (no stats), sampling probes fail (csv footers),
    // previous_inflation resolves — no crash
    val est = cat.estimateResources("re.g", Params(method = Method.DefaultV2))
    assert(est.methodsUsed == Map("previous_inflation" -> est.files))
    assert(est.memoryBytes > 0)
  }

  test("strict single-method params refuse when prerequisites are missing") {
    val cat = newCatalog()
    cat.createTable("re.e", StructType(Seq(FieldMeta.field("id", LongType, nullable = false))),
      properties = Map("content_type" -> "csv"))
    cat.writeToTable((1L to 5L).toDF("id"), "re.e")
    intercept[IllegalArgumentException] {
      cat.estimateResources("re.e", Params(method = Method.ContentTypeMeta))
    }
  }

  test("memory-driven bucket suggestion floors, scales, caps") {
    assert(Compactor.suggestBucketsFromMemory(0.0) == 8)
    assert(Compactor.suggestBucketsFromMemory((1L << 30).toDouble * 8) == 8)
    assert(Compactor.suggestBucketsFromMemory((1L << 30).toDouble * 100) == 100)
    assert(Compactor.suggestBucketsFromMemory(Double.MaxValue) == 16384)
  }

  test("estimateDelta scopes to one stream position") {
    val cat = newCatalog()
    cat.createTable("re.f", StructType(Seq(FieldMeta.field("id", LongType, nullable = false))))
    cat.writeToTable((1L to 10L).toDF("id").repartition(1), "re.f")
    cat.writeToTable((1L to 90L).toDF("id").repartition(1), "re.f", WriteMode.Add)
    val positions = cat.effectiveDeltas(TableHandle.parse("re.f"), None).map(_.streamPosition)
    val d1 = ResourceEstimator.estimateDelta(cat, "re.f", positions.head)
    val d2 = ResourceEstimator.estimateDelta(cat, "re.f", positions.last)
    assert(d1.records == 10 && d2.records == 90)
    assert(d1.memoryBytes > 0 && d2.memoryBytes > d1.memoryBytes)
  }

  test("streamed (above-gate) estimate equals the in-memory estimate, every chain") {
    // Above the planning gate estimate() resolves the per-entry chain in
    // Spark tasks over lazily-streamed entries, with file_sampling's
    // observed inflation precomputed from the SAME prefix the in-memory
    // algorithm samples. Same table, gate forced to 1 byte → identical
    // Estimate (memory up to distributed-summation float order).
    val cat = newCatalog()
    cat.createTable("re.g", StructType(Seq(
      FieldMeta.field("id", LongType, nullable = false),
      FieldMeta.field("name", StringType))),
      properties = Map("write.max_records_per_file" -> "100"))
    cat.writeToTable((1L to 900L).map(i => (i, s"name-$i")).toDF("id", "name"), "re.g")
    cat.writeToTable((901L to 1000L).map(i => (i, null: String)).toDF("id", "name"),
      "re.g", WriteMode.Add)
    for (m <- Seq(Method.Default, Method.DefaultV2, Method.PreviousInflation,
        Method.Intelligent, Method.FileSampling)) {
      val p = Params(method = m, maxFilesToSample = 3)
      val inMem = cat.estimateResources("re.g", p)
      spark.conf.set(graft.catalog.ManifestPlanner.GateConfKey, "1")
      val streamed =
        try cat.estimateResources("re.g", p)
        finally spark.conf.unset(graft.catalog.ManifestPlanner.GateConfKey)
      assert(math.abs(streamed.memoryBytes - inMem.memoryBytes) <=
        math.max(1e-6 * inMem.memoryBytes, 1e-6),
        s"$m memory: ${streamed.memoryBytes} vs ${inMem.memoryBytes}")
      assert((streamed.records, streamed.onDiskBytes, streamed.files, streamed.methodsUsed) ==
        ((inMem.records, inMem.onDiskBytes, inMem.files, inMem.methodsUsed)),
        s"$m: $streamed vs $inMem")
      // per-entry DF surface: identical rows (path → (bytes, records,
      // estimate, method)) through both routes
      def dfRows(gated: Boolean) = {
        if (gated) spark.conf.set(graft.catalog.ManifestPlanner.GateConfKey, "1")
        try ResourceEstimator.entriesDF(cat, "re.g", p).collect()
          .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
            math.round(r.getDouble(3) * 1e6), r.getString(4)))).toMap
        finally if (gated) spark.conf.unset(graft.catalog.ManifestPlanner.GateConfKey)
      }
      assert(dfRows(gated = true) == dfRows(gated = false),
        s"$m: entriesDF must be route-identical")
    }
  }
}
