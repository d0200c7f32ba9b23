package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.catalog._
import graft.model._

/** Rivulet-style zipper read: per-group merge-on-read zipped by merge key.
  * Must be ROW-EQUIVALENT to the plain read over the same columns on any
  * interleaving of full/partial/delete writes, while never scanning a
  * group-foreign delta's files. */
class ZipperSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    FieldMeta.field("k", IntegerType, nullable = false, mergeKey = true),
    FieldMeta.field("a", IntegerType),
    FieldMeta.field("b", IntegerType),
    FieldMeta.field("t", StringType)))

  private def newTable(tag: String): GraftCatalog = {
    val cat = new GraftCatalog(spark, tmpDir(tag))
    cat.createTable("z.t", schema, properties = Map("read_optimization" -> "NONE"))
    cat.setSubschema("z.t", "nums", Seq("k", "a", "b"))
    cat.setSubschema("z.t", "text", Seq("k", "t"))
    cat
  }

  private def rows(cat: GraftCatalog, df: org.apache.spark.sql.DataFrame) =
    df.select("k", "a", "b", "t").collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getString(3)))).toSet

  test("zip + merge_order: full-row (superset-of-group) writers keep merge-order winners") {
    // The r16 ADVICE scenario: column-narrowed zipper group schemas made a
    // full-row write a strict SUPERSET of each group's narrowed schema, so
    // the old equality completeness check routed such lineages to the
    // partial resolve — which resolves by pure recency, silently ignoring
    // merge_order/event-time winner selection.
    val moSchema = StructType(Seq(
      FieldMeta.field("k", IntegerType, nullable = false, mergeKey = true),
      FieldMeta.field("a", IntegerType),
      FieldMeta.field("prio", IntegerType, mergeOrder = Some("DESC")),
      FieldMeta.field("t", StringType)))
    val cat = new GraftCatalog(spark, tmpDir("zip-mo"))
    cat.createTable("z.mo", moSchema, properties = Map("read_optimization" -> "NONE"))
    cat.setSubschema("z.mo", "nums", Seq("k", "a", "prio"))
    cat.setSubschema("z.mo", "text", Seq("k", "t"))
    // two FULL-ROW writes per key; k=1's later write has LOWER priority
    // (merge_order must pick the earlier), k=2's has HIGHER (recency and
    // merge_order agree) — one key per direction.
    cat.writeToTable(
      Seq((1, 10, 5, "keep"), (2, 20, 1, "old")).toDF("k", "a", "prio", "t"),
      "z.mo", WriteMode.Merge)
    cat.writeToTable(
      Seq((1, 11, 3, "drop"), (2, 21, 9, "new")).toDF("k", "a", "prio", "t"),
      "z.mo", WriteMode.Merge)
    def all(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "a", "prio", "t").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    val plain = all(cat.readTable("z.mo"))
    assert(plain == Set((1, 10, 5, "keep"), (2, 21, 9, "new")),
      s"plain read must honor merge_order: $plain")
    assert(all(cat.readZipped("z.mo")) == plain,
      "zipped read silently dropped merge_order winner selection")
  }

  test("zipper equals the plain read over random full/partial/delete interleavings") {
    // op: 0 = full row write, 1 = nums-group partial, 2 = text-group
    // partial, 3 = delete
    val genOp = for {
      kind <- Gen.choose(0, 3)
      n <- Gen.choose(1, 5)
      ks <- Gen.listOfN(n, Gen.choose(0, 9))
    } yield (kind, ks.distinct)
    val params = Gen.Parameters.default
    (0 until 3).foreach { trial =>
      val ops = Gen.listOfN(6, genOp)
        .pureApply(params, org.scalacheck.rng.Seed(4000L + trial))
      val cat = newTable(s"zip-$trial")
      ops.zipWithIndex.foreach { case ((kind, ks), i) =>
        val base = ks.map(k => (k, k * 10 + i, k * 100 + i, s"t$k-$i")).toDF("k", "a", "b", "t")
        kind match {
          case 0 => cat.writeToTable(base, "z.t", WriteMode.Merge)
          case 1 => cat.writeToTable(base.select("k", "a", "b"), "z.t", WriteMode.Merge)
          case 2 => cat.writeToTable(base.select("k", "t"), "z.t", WriteMode.Merge)
          case 3 => cat.writeToTable(base.select("k"), "z.t", WriteMode.Delete)
        }
      }
      val plain = rows(cat, cat.readTable("z.t"))
      val zipped = rows(cat, cat.readZipped("z.t"))
      assert(zipped == plain, s"trial $trial\nops=$ops\nzip=$zipped\nplain=$plain")
      // pushed key-only filter: per-frame evaluation must equal the plain
      // filtered read on every interleaving (deletes, partials, full-outer)
      val kf = ReadOptions(rowFilter = Some(col("k") <= 4))
      assert(rows(cat, cat.readZipped("z.t", opts = kf)) ==
        rows(cat, cat.readTable("z.t", kf)), s"trial $trial key-filter push")
      // and after compaction (single resolved base participates everywhere)
      val tMid = cat.store.history().head.endTimeMillis // pre-compaction txn
      cat.compact("z.t", numBuckets = 4)
      assert(rows(cat, cat.readZipped("z.t")) == plain, s"trial $trial post-compact")
      // time travel ACROSS the compaction boundary: a zipped read asOf a
      // pre-compaction txn must reconstruct that snapshot from the
      // uncompacted deltas, exactly like the plain asOf read (round-11)
      val asOf = ReadOptions(asOf = Some(tMid))
      assert(rows(cat, cat.readZipped("z.t", opts = asOf)) ==
        rows(cat, cat.readTable("z.t", asOf)), s"trial $trial asOf-across-compaction")
    }
  }

  test("group reads scan only their own deltas; zip surfaces group-only keys") {
    val cat = newTable("zip-prune")
    cat.writeToTable(Seq((1, 10, 100, "x")).toDF("k", "a", "b", "t"), "z.t", WriteMode.Merge)
    cat.writeToTable(Seq((1, 11), (2, 12)).toDF("k", "a").withColumn("b", col("a") * 10),
      "z.t", WriteMode.Merge) // nums-only, introduces key 2
    cat.writeToTable(Seq((3, "only-text")).toDF("k", "t"), "z.t", WriteMode.Merge)
    def norm(p: String) = p.replaceFirst("^file:/+", "/")
    val numsOnly = cat.deltaLog("z.t").filter(_.properties.get("written_columns")
      .exists(w => !w.split(",").contains("t"))).flatMap(_.entries.map(e => norm(e.path))).toSet
    assert(numsOnly.nonEmpty)
    val textFiles = cat.readZipped("z.t", Seq("text")).inputFiles.map(norm).toSet
    assert(textFiles.nonEmpty && numsOnly.forall(p => !textFiles.contains(p)),
      "text-group zip must not scan nums-only delta files")
    // full-outer semantics: key 2 has null text, key 3 has null nums
    assert(rows(cat, cat.readZipped("z.t")) == Set(
      (1, Some(11), Some(110), Some("x")),
      (2, Some(12), Some(120), None),
      (3, None, None, Some("only-text"))))
    // caller's filters/projection/limit apply to ZIPPED rows
    val f = cat.readZipped("z.t",
      opts = ReadOptions(rowFilter = Some(col("t").isNotNull && col("a").isNotNull)))
    assert(f.select("k").as[Int].collect().toSeq == Seq(1))
    assert(cat.readZipped("z.t", opts = ReadOptions(columns = Some(Seq("k", "t"))))
      .columns.toSeq == Seq("k", "t"))
    assert(cat.readZipped("z.t", opts = ReadOptions(limit = Some(2))).count() == 2)
  }

  test("key-only filter conjuncts push into each group's plan") {
    val cat = new GraftCatalog(spark, tmpDir("zip-push"))
    // truncate[2] on the key clusters each partition's files to a tight
    // key range, so per-file stats make the pushed predicate's prune
    // observable in inputFiles
    cat.createTable("z.p", schema,
      partitionScheme = PartitionScheme(Seq(PartitionKey("k", Transform.Truncate(2)))),
      properties = Map("read_optimization" -> "NONE"))
    cat.setSubschema("z.p", "nums", Seq("k", "a", "b"))
    cat.setSubschema("z.p", "text", Seq("k", "t"))
    cat.writeToTable((0 until 8).map(k => (k, k * 10, k * 100, s"t$k"))
      .toDF("k", "a", "b", "t"), "z.p", WriteMode.Merge)
    cat.writeToTable(Seq((1, 11, 110), (5, 51, 510)).toDF("k", "a", "b"),
      "z.p", WriteMode.Merge) // nums trickle, two partitions
    cat.writeToTable(Seq((2, "zz")).toDF("k", "t"), "z.p", WriteMode.Merge)
    val all = cat.readZipped("z.p").inputFiles.length
    val kOpts = ReadOptions(rowFilter = Some(col("k") === 1 && col("t").isNotNull))
    val pruned = cat.readZipped("z.p", opts = kOpts).inputFiles.length
    assert(pruned < all, s"pushed key conjunct must prune per-group files ($pruned vs $all)")
    // the text trickle (k=2) and k>=2 partitions must all be out of plan
    assert(pruned <= 2, s"k=1 zip should plan at most the two k∈{0,1} files, got $pruned")
    // mixed key + residual conjuncts: result equals the plain filtered read
    val zf = cat.readZipped("z.p", opts = kOpts)
    assert(rows(cat, zf) == rows(cat, cat.readTable("z.p", kOpts)))
    assert(rows(cat, zf) == Set((1, Some(11), Some(110), Some("t1"))))
    // a key filter alone on the single-group read stays group-pruned AND
    // row-correct
    val one = cat.readZipped("z.p", Seq("text"),
      ReadOptions(rowFilter = Some(col("k") === 2)))
    assert(one.select("k", "t").collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((2, "zz")))
  }

  test("property: splitKeyConjuncts — key∧residual ≡ original, key side references only keys") {
    // Random predicate trees over key column k and non-key columns a/t
    // (nondeterministic leaves are covered by the dedicated test above —
    // they can't participate in a semantic-equality check). Two
    // properties: (1) the split
    // never changes semantics — (key AND residual) selects exactly the
    // rows the original conjunction selects on random data; (2) the key
    // side references ONLY merge keys and only deterministic expressions
    // (pushing it per-group is the zipper's soundness condition).
    val rnd = new scala.util.Random(20260815L)
    val keys = Set("k")
    def leaf(): org.apache.spark.sql.Column = rnd.nextInt(8) match {
      case 0 => col("k") > lit(rnd.nextInt(10))
      case 1 => col("k") === lit(rnd.nextInt(10))
      case 2 => col("a") < lit(rnd.nextInt(100))
      case 3 => col("t").isNotNull
      case 4 => col("k").isin(rnd.nextInt(10), rnd.nextInt(10))
      case 5 => expr(s"k % ${rnd.nextInt(3) + 2} = 0")
      case 6 => lit(rnd.nextBoolean())
      case 7 => col("a") + col("k") > lit(rnd.nextInt(50)) // mixed refs → residual
    }
    def tree(depth: Int): org.apache.spark.sql.Column =
      if (depth == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => tree(depth - 1) && tree(depth - 1)
        case 1 => tree(depth - 1) || tree(depth - 1)
        case 2 => !tree(depth - 1)
      }
    val data = (0 until 60).map { i =>
      (i % 12, if (i % 5 == 0) None else Some(i * 3 % 97),
        if (i % 7 == 0) None else Some(s"t$i"))
    }.toDF("k", "a", "t")
    data.createOrReplaceTempView("skc_rows")
    (0 until 60).foreach { trial =>
      val pred = tree(rnd.nextInt(3) + 1)
      val (key, residual) = StatsSkip.splitKeyConjuncts(Seq(pred), keys)
      val recombined = (key.toSeq ++ residual.toSeq).reduceOption(_ && _).getOrElse(lit(true))
      val want = data.where(pred).select("k", "a", "t").collect().toSeq
        .map(_.toSeq).sortBy(_.toString)
      val got = data.where(recombined).select("k", "a", "t").collect().toSeq
        .map(_.toSeq).sortBy(_.toString)
      assert(got == want, s"trial $trial: split changed semantics for $pred")
      key.foreach { kc =>
        val e = org.apache.spark.sql.graft.GraftFunctions.expressionOf(kc)
        val refs = e.collect {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => u.name
          case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
        }
        assert(refs.nonEmpty && refs.forall(keys.contains),
          s"trial $trial: key side leaked non-key refs $refs in $kc")
        assert(e.deterministic, s"trial $trial: nondeterministic key side $kc")
      }
    }
  }

  test("nullable merge keys zip null-safely; non-nullable keys reuse the resolve partitioning") {
    // Round-11: non-nullable keys zip with plain equality so the full-outer
    // join reuses each resolve's hash(k) partitioning (one shuffle per
    // group saved); NULLABLE keys must keep the null-safe join — a null
    // key row present in both groups is ONE zipped row, not two.
    val cat = new GraftCatalog(spark, tmpDir("zip-nullkey"))
    cat.createTable("z.n", StructType(Seq(
      FieldMeta.field("k", IntegerType, nullable = true, mergeKey = true),
      FieldMeta.field("a", IntegerType),
      FieldMeta.field("t", StringType))),
      properties = Map("read_optimization" -> "NONE"))
    cat.setSubschema("z.n", "nums", Seq("k", "a"))
    cat.setSubschema("z.n", "text", Seq("k", "t"))
    cat.writeToTable(Seq((Some(1), 10, "x"), (None, 20, "nullkey"))
      .toDF("k", "a", "t"), "z.n", WriteMode.Merge)
    cat.writeToTable(Seq((Option.empty[Int], 21)).toDF("k", "a"), "z.n", WriteMode.Merge)
    cat.writeToTable(Seq((Option.empty[Int], "NK2")).toDF("k", "t"), "z.n", WriteMode.Merge)
    def rows3(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "a", "t").collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getInt(0)),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSet
    val plain = rows3(cat.readTable("z.n"))
    val zipped = rows3(cat.readZipped("z.n"))
    assert(zipped == plain, s"null-key zip diverged: $zipped vs $plain")
    assert(zipped == Set(
      (Some(1), Some(10), Some("x")),
      (None, Some(21), Some("NK2"))), s"got $zipped")
    // and the equi-join fast path's plan claim: a NON-nullable-key table's
    // zip plans no null-safe (coalesce/isnull) join keys — through a
    // PARQUET round-trip, because every parquet read is nullable-TYPED and
    // the write must not let that widen the declared key contract (the
    // 30x probe caught exactly this: unify flipped the keys nullable and
    // the equi-join fix silently stopped applying)
    val cat2 = newTable("zip-eqplan")
    val srcDir = tmpDir("zip-eqplan-src")
    Seq((1, 10, 100, "x"), (2, 20, 200, "y")).toDF("k", "a", "b", "t")
      .write.parquet(s"$srcDir/d")
    val viaParquet = spark.read.parquet(s"$srcDir/d") // all columns nullable-typed
    assert(viaParquet.schema.forall(_.nullable))
    cat2.writeToTable(viaParquet, "z.t", WriteMode.Merge)
    cat2.writeToTable(Seq((1, 11, 110)).toDF("k", "a", "b"), "z.t", WriteMode.Merge)
    val plan = cat2.readZipped("z.t").queryExecution.executedPlan.toString
    val joinLines = plan.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(joinLines.nonEmpty && joinLines.forall(l => !l.contains("coalesce")),
      s"non-nullable keys must equi-join after a parquet-typed write: $joinLines")
    // the contract that makes this sound: an actual null VALUE into a
    // declared non-nullable column fails the write loudly
    val err = intercept[Exception] {
      cat2.writeToTable(Seq((Some(3), None: Option[Int], Some(1), Some("z")))
        .toDF("k", "a", "b", "t")
        .select(when(col("k") === 999, col("k")).as("k"), col("a"), col("b"), col("t")),
        "z.t", WriteMode.Merge)
    }
    def msgs(e: Throwable): Seq[String] =
      if (e == null) Nil else Option(e.getMessage).toSeq ++ msgs(e.getCause)
    assert(msgs(err).exists(_.contains("non-nullable")),
      s"null key write must name the contract: ${msgs(err)}")
  }

  test("zipped read over a dense-partitioned-band table: groups pin the dense resolve, rows equal the plain read") {
    // Round-12 (verdict ask #6): the zipper pins ReadOptions.denseResolve
    // so each group's resolve output stays hash(k)-partitioned for the
    // zip join. That pin must HOLD when the table sits inside the
    // storage-partitioned regime's eligibility band — one group dense-band
    // (25% partial upserts), the other a trickle (sparse-eligible) — i.e.
    // the zipped plan must contain NO KeyGrouped BatchScan even though an
    // unpinned plain read of the same table engages the partitioned path.
    val cat = newTable("zip-spj")
    val n = 20000
    cat.writeToTable(spark.range(n).select($"id".cast("int").as("k"),
      ($"id" * 10).cast("int").as("a"), ($"id" * 100).cast("int").as("b"),
      concat(lit("t"), $"id").as("t")).toDF(), "z.t", WriteMode.Merge)
    cat.compact("z.t", numBuckets = 4)
    // nums group: dense-band pending (25% of keys, partial columns k,a,b)
    cat.writeToTable(spark.range(n).where($"id" % 4 === 0)
      .select($"id".cast("int").as("k"), lit(-1).as("a"), lit(-2).as("b")).toDF(),
      "z.t", WriteMode.Merge)
    // text group: trickle pending (sparse-eligible on its own)
    cat.writeToTable(Seq((7, "zipped-7")).toDF("k", "t"), "z.t", WriteMode.Merge)

    // Eligibility really holds on this table: the unpinned plain read
    // takes the partitioned path (KeyGrouped BatchScan in the plan).
    val unpinned = cat.readTable("z.t")
    assert(unpinned.queryExecution.executedPlan.toString.contains("BatchScan"),
      "precondition: the table must sit in the dense-partitioned band")
    // The zipped read's group plans pin denseResolve — no SPJ scan
    // anywhere, the group resolves keep hash(k) for the zip join.
    val zipped = cat.readZipped("z.t")
    assert(!zipped.queryExecution.executedPlan.toString.contains("BatchScan"),
      "zipper group plans must pin the dense resolve under SPJ eligibility:\n" +
        zipped.queryExecution.executedPlan.toString.take(2500))
    // Row-equal to the plain read under BOTH resolve strategies.
    val z = rows(cat, zipped)
    assert(z == rows(cat, unpinned), "zip vs partitioned plain read diverged")
    assert(z == rows(cat, cat.readTable("z.t", ReadOptions(denseResolve = true))),
      "zip vs dense plain read diverged")
    assert(z.size == n)
    val upd = z.find(_._1 == 8).get
    assert(upd == ((8, Some(-1), Some(-2), Some("t8"))), s"got $upd")
    assert(z.find(_._1 == 7).get._4.contains("zipped-7"))
  }

  test("nondeterministic / reference-free conjuncts never push into group plans") {
    // A pushed conjunct evaluates once per GROUP frame; rand() pushed into
    // two groups would let them disagree on surviving keys and the
    // full-outer zip would emit corrupt partial rows (round-11 fix).
    val keys = Set("k")
    def split(c: org.apache.spark.sql.Column) = StatsSkip.splitKeyConjuncts(Seq(c), keys)
    // resolved Rand via the Column API (deterministic=false)
    val (k1, r1) = split(col("k") === 1 && rand() < lit(2.0))
    assert(k1.isDefined && r1.isDefined, "key conjunct pushes, rand() stays residual")
    // pre-analysis UnresolvedFunction spelled "rand"
    val (k2, r2) = split(expr("k = 1 AND rand() < 2.0"))
    assert(k2.isDefined && r2.isDefined)
    // reference-free deterministic conjunct: residual (vacuous forall fix)
    val (k3, r3) = split(lit(true))
    assert(k3.isEmpty && r3.isDefined)
    // a key-referencing conjunct CONTAINING a nondeterministic call: residual
    val (k4, r4) = split(col("k") < rand() * 100)
    assert(k4.isEmpty && r4.isDefined)

    // behavior: under a nondeterministic filter, every zipped row must be a
    // complete row of the plain unfiltered read — per-group evaluation
    // would surface rows with spuriously-nulled group fields.
    val cat = newTable("zip-nondet")
    cat.writeToTable((0 until 10).map(k => (k, k, k * 10, s"t$k")).toDF("k", "a", "b", "t"),
      "z.t", WriteMode.Merge)
    cat.writeToTable(Seq((3, 33, 330)).toDF("k", "a", "b"), "z.t", WriteMode.Merge)
    cat.writeToTable(Seq((7, "seven")).toDF("k", "t"), "z.t", WriteMode.Merge)
    val plainAll = rows(cat, cat.readTable("z.t"))
    (0 until 5).foreach { trial =>
      val got = rows(cat, cat.readZipped("z.t",
        opts = ReadOptions(rowFilter = Some(expr("rand() < 0.5")))))
      assert(got.subsetOf(plainAll),
        s"trial $trial: nondeterministic filter corrupted zipped rows: ${got.diff(plainAll)}")
    }
  }

  test("a delta writing only UNCOVERED columns still surfaces its keys") {
    // schema has a column no declared group covers; a write touching only
    // (keys, uncovered) must not vanish from the zip — it participates in
    // every group so its keys survive the full-outer join
    val cat = new GraftCatalog(spark, tmpDir("zip-uncov"))
    cat.createTable("z.u", StructType(Seq(
      FieldMeta.field("k", IntegerType, nullable = false, mergeKey = true),
      FieldMeta.field("a", IntegerType),
      FieldMeta.field("t", StringType),
      FieldMeta.field("u", IntegerType))), // covered by NO group
      properties = Map("read_optimization" -> "NONE"))
    cat.setSubschema("z.u", "nums", Seq("k", "a"))
    cat.setSubschema("z.u", "text", Seq("k", "t"))
    cat.writeToTable(Seq((1, 10, "x", 5)).toDF("k", "a", "t", "u"), "z.u", WriteMode.Merge)
    cat.writeToTable(Seq((9, 99)).toDF("k", "u"), "z.u", WriteMode.Merge) // uncovered-only
    val zipped = cat.readZipped("z.u").select("k", "a", "t").collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSet
    assert(zipped == Set((1, Some(10), Some("x")), (9, None, None)),
      s"uncovered-writer key must survive the zip: $zipped")
    // matches the plain read over the same columns
    val plain = cat.readTable("z.u").select("k", "a", "t").collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSet
    assert(zipped == plain)
  }

  test("zipper refusals: overlapping groups, unknown group, keyless table") {
    val cat = newTable("zip-refuse")
    cat.writeToTable(Seq((1, 1, 1, "x")).toDF("k", "a", "b", "t"), "z.t", WriteMode.Merge)
    cat.setSubschema("z.t", "numsplus", Seq("k", "a", "t"))
    intercept[IllegalArgumentException](
      cat.readZipped("z.t", Seq("nums", "numsplus", "text")).count())
    intercept[IllegalArgumentException](cat.readZipped("z.t", Seq("nope")))
    // withFilePath is undefined across a zip (one file per group per row)
    intercept[IllegalArgumentException](
      cat.readZipped("z.t", opts = ReadOptions(withFilePath = true)))
    val keyless = new GraftCatalog(spark, tmpDir("zip-keyless"))
    keyless.createTable("z.k", StructType(Seq(
      FieldMeta.field("x", IntegerType), FieldMeta.field("y", IntegerType))))
    keyless.setSubschema("z.k", "g", Seq("x"))
    intercept[IllegalArgumentException](keyless.readZipped("z.k"))
  }
}
