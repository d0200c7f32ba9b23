package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.model._
import graft.operators.Converter

/**
 * Catalog-stateful correctness queries: each closure builds a Graft table in
 * a fresh temp dir from the driver testdata, applies writes / upserts /
 * deletes / DDL, and returns the terminal table state; the paired oracle SQL
 * computes the same terminal state directly from the raw parquet (the
 * reference's declarative test style — compact_partition_test_cases.py).
 *
 * Every scenario is deterministic: update/delete key sets are arithmetic
 * predicates (k % n), winners are forced by explicit versions or sorted
 * single-file writes, and timestamps come from the committed txn log.
 */
object CatalogQueries {
  import Queries._

  private def newCat(s: SparkSession, tag: String): GraftCatalog =
    new GraftCatalog(s, Files.createTempDirectory(s"graft_$tag").toString)

  /** Merge-on-read table properties (suppress write-triggered compaction). */
  private val MoR = Map("read_optimization" -> "NONE")

  val all: Seq[Q] = Seq(

    // Write a table and read it back — datasink + read_table roundtrip.
    Q("c01_roundtrip", Some("SELECT * FROM nation")) { (s, dir) =>
      val cat = newCat(s, "c01")
      cat.writeToTable(tbl(s, dir, "nation"), "q.nation")
      cat.readTable("q.nation")
    },

    // Column projection + row filter pushed through the catalog read path.
    Q("c02_projection_filter", Some(
      "SELECT n_name, n_regionkey FROM nation WHERE n_regionkey IN (0, 2)")) { (s, dir) =>
      val cat = newCat(s, "c02")
      cat.writeToTable(tbl(s, dir, "nation"), "q.nation")
      cat.readTable("q.nation", ReadOptions(
        columns = Some(Seq("n_name", "n_regionkey")),
        partitionFilter = Some(col("n_regionkey").isin(0, 2))))
    },

    // Limit pushdown: the limited read returns exactly n rows.
    Q("c03_limit", Some("SELECT CAST(10 AS BIGINT) AS n")) { (s, dir) =>
      val cat = newCat(s, "c03")
      cat.writeToTable(tbl(s, dir, "nation"), "q.nation")
      cat.readTable("q.nation", ReadOptions(limit = Some(10))).agg(cnt.as("n"))
    },

    // LSM merge-on-read: upsert overwrite + delete tombstones, no compaction.
    Q("c04_upsert_delete_mor", Some("""
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0""")) { (s, dir) =>
      val cat = newCat(s, "c04")
      cat.createTable("q.o", StructType(Seq(
        FieldMeta.field("o_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("o_custkey", LongType),
        FieldMeta.field("o_orderstatus", StringType),
        FieldMeta.field("o_totalprice", DoubleType))), properties = MoR)
      val base = tbl(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      cat.writeToTable(base, "q.o", WriteMode.Merge)
      cat.writeToTable(
        base.where(col("o_orderkey") % 10 === 0)
          .withColumn("o_orderstatus", lit("X"))
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        "q.o", WriteMode.Merge)
      cat.writeToTable(
        base.select("o_orderkey").where(col("o_orderkey") % 7 === 0),
        "q.o", WriteMode.Delete)
      cat.readTable("q.o")
    },

    // Same terminal state through the compactor (write-triggered compaction,
    // bucket pruning + copy-by-reference on the later writes).
    Q("c05_upsert_delete_compacted", Some("""
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0""")) { (s, dir) =>
      val cat = newCat(s, "c05")
      cat.createTable("q.o", StructType(Seq(
        FieldMeta.field("o_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("o_custkey", LongType),
        FieldMeta.field("o_orderstatus", StringType),
        FieldMeta.field("o_totalprice", DoubleType))))
      val base = tbl(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      cat.writeToTable(base, "q.o", WriteMode.Merge)
      cat.writeToTable(
        base.where(col("o_orderkey") % 10 === 0)
          .withColumn("o_orderstatus", lit("X"))
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        "q.o", WriteMode.Merge)
      cat.writeToTable(
        base.select("o_orderkey").where(col("o_orderkey") % 7 === 0),
        "q.o", WriteMode.Delete)
      cat.readTable("q.o")
    },

    // Partial upsert: delta carries (key, acctbal) only — name survives.
    Q("c06_partial_upsert", Some("""
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal
      FROM customer""")) { (s, dir) =>
      val cat = newCat(s, "c06")
      cat.createTable("q.c", StructType(Seq(
        FieldMeta.field("c_custkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("c_name", StringType),
        FieldMeta.field("c_acctbal", DoubleType))), properties = MoR)
      val base = tbl(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
      cat.writeToTable(base, "q.c", WriteMode.Merge)
      cat.writeToTable(
        base.where(col("c_custkey") % 5 === 0)
          .select(col("c_custkey"), (col("c_acctbal") + 100).as("c_acctbal")),
        "q.c", WriteMode.Merge)
      cat.readTable("q.c")
    },

    // merge_order winner selection: a LOWER-versioned later commit must lose.
    Q("c07_merge_order", Some(
      "SELECT n_nationkey, CAST(5 AS INTEGER) AS version, 'first' AS src FROM nation")) { (s, dir) =>
      val cat = newCat(s, "c07")
      cat.createTable("q.n", StructType(Seq(
        FieldMeta.field("n_nationkey", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("version", IntegerType, mergeOrder = Some("DESC")),
        FieldMeta.field("src", StringType))), properties = MoR)
      val n = tbl(s, dir, "nation").select("n_nationkey")
      cat.writeToTable(n.withColumn("version", lit(5)).withColumn("src", lit("first")),
        "q.n", WriteMode.Merge)
      cat.writeToTable(n.withColumn("version", lit(3)).withColumn("src", lit("second")),
        "q.n", WriteMode.Merge)
      cat.readTable("q.n")
    },

    // Intra-delta dedupe: duplicate keys inside ONE delta — last row wins.
    Q("c08_intra_delta_dedupe", Some(
      "SELECT n_nationkey, CAST(2 AS INTEGER) AS v FROM nation")) { (s, dir) =>
      val cat = newCat(s, "c08")
      cat.createTable("q.n", StructType(Seq(
        FieldMeta.field("n_nationkey", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("v", IntegerType))), properties = MoR)
      val n = tbl(s, dir, "nation").select("n_nationkey")
      val dup = n.withColumn("v", lit(1)).unionByName(n.withColumn("v", lit(2)))
        .repartition(1).sortWithinPartitions("n_nationkey", "v")
      cat.writeToTable(dup, "q.n", WriteMode.Merge)
      cat.readTable("q.n")
    },

    // Composite merge keys with NULLs: null-keyed rows are deletable too.
    Q("c09_delete_null_composite", Some("""
      SELECT n_nationkey AS k1,
             CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_name END AS k2,
             n_regionkey AS v
      FROM nation WHERE n_nationkey % 5 <> 0 AND n_nationkey NOT IN (1, 2)""")) { (s, dir) =>
      val cat = newCat(s, "c09")
      cat.createTable("q.n", StructType(Seq(
        FieldMeta.field("k1", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("k2", StringType, mergeKey = true),
        FieldMeta.field("v", IntegerType))), properties = MoR)
      val base = tbl(s, dir, "nation").select(
        col("n_nationkey").as("k1"),
        when(col("n_nationkey") % 5 === 0, lit(null)).otherwise(col("n_name")).as("k2"),
        col("n_regionkey").as("v"))
      cat.writeToTable(base, "q.n", WriteMode.Merge)
      cat.writeToTable(
        base.select("k1", "k2").where(col("k1") % 5 === 0 || col("k1").isin(1, 2)),
        "q.n", WriteMode.Delete)
      cat.readTable("q.n")
    },

    // Time travel: read the pre-REPLACE snapshot via the committed txn time.
    Q("c10_time_travel", Some("SELECT * FROM nation")) { (s, dir) =>
      val cat = newCat(s, "c10")
      cat.writeToTable(tbl(s, dir, "nation"), "q.n")
      val t1 = cat.store.history().head.endTimeMillis
      cat.writeToTable(tbl(s, dir, "nation").withColumn("n_name", lit("XX")),
        "q.n", WriteMode.Replace)
      cat.readTable("q.n", ReadOptions(asOf = Some(t1)))
    },

    // Schema evolution AUTO: int→bigint widening + appended column, old rows null.
    Q("c11_schema_evolution", Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name, CAST(NULL AS INTEGER) AS region FROM nation
      UNION ALL
      SELECT CAST(n_nationkey + 100 AS BIGINT) AS id, n_name AS name, n_regionkey AS region FROM nation""")) { (s, dir) =>
      val cat = newCat(s, "c11")
      val n = tbl(s, dir, "nation")
      cat.writeToTable(
        n.select(col("n_nationkey").cast(IntegerType).as("id"), col("n_name").as("name")), "q.t")
      cat.writeToTable(
        n.select((col("n_nationkey") + 100).cast(LongType).as("id"),
          col("n_name").as("name"), col("n_regionkey").as("region")),
        "q.t", WriteMode.Add)
      cat.readTable("q.t")
    },

    // past_default backfill: rows written before the column existed read the
    // declared default, not NULL.
    Q("c12_past_default", Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name, CAST(7 AS INTEGER) AS score FROM nation
      UNION ALL
      SELECT CAST(n_nationkey + 100 AS BIGINT) AS id, n_name AS name, n_regionkey AS score FROM nation""")) { (s, dir) =>
      val cat = newCat(s, "c12")
      val n = tbl(s, dir, "nation")
      cat.writeToTable(
        n.select(col("n_nationkey").cast(LongType).as("id"), col("n_name").as("name")), "q.t")
      cat.alterTable("q.t", newSchema = Some(StructType(Seq(
        FieldMeta.field("id", LongType),
        FieldMeta.field("name", StringType),
        FieldMeta.field("score", IntegerType, pastDefault = Some("7"))))))
      cat.writeToTable(
        n.select((col("n_nationkey") + 100).cast(LongType).as("id"),
          col("n_name").as("name"), col("n_regionkey").as("score")),
        "q.t", WriteMode.Add)
      cat.readTable("q.t")
    },

    // Partition transform (month) + driver-side manifest pruning.
    Q("c13_partition_prune", Some("""
      SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
      WHERE month(o_orderdate) = 3""")) { (s, dir) =>
      val cat = newCat(s, "c13")
      val o = tbl(s, dir, "orders").select("o_orderkey", "o_totalprice", "o_orderdate")
      cat.createTable("q.o", o.schema,
        PartitionScheme(Seq(PartitionKey("o_orderdate", Transform.Month))))
      cat.writeToTable(o, "q.o", WriteMode.Add)
      cat.readTable("q.o", ReadOptions(partitionValues = Some(Map("o_orderdate" -> "3"))))
    },

    // Truncate drops data, schema stays; rename keeps history alive.
    Q("c14_truncate_rename", Some("""
      SELECT r_regionkey AS n_nationkey, r_name AS n_name, CAST(0 AS INTEGER) AS n_regionkey
      FROM region""")) { (s, dir) =>
      val cat = newCat(s, "c14")
      cat.writeToTable(tbl(s, dir, "nation"), "q.t1")
      cat.truncateTable("q.t1")
      cat.writeToTable(
        tbl(s, dir, "region").select(col("r_regionkey").as("n_nationkey"),
          col("r_name").as("n_name"), lit(0).cast(IntegerType).as("n_regionkey")),
        "q.t1", WriteMode.Add)
      cat.renameTable("q.t1", "t2")
      cat.readTable("q.t2")
    },

    // Catalog-level atomic multi-table transaction.
    Q("c15_txn_atomic", Some("""
      SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey""")) { (s, dir) =>
      val cat = newCat(s, "c15")
      val tx = cat.transaction("atomic pair")
      cat.createTable("q.n", tbl(s, dir, "nation").schema, txn = Some(tx))
      cat.createTable("q.r", tbl(s, dir, "region").schema, txn = Some(tx))
      cat.writeToTable(tbl(s, dir, "nation"), "q.n", WriteMode.Add, txn = Some(tx))
      cat.writeToTable(tbl(s, dir, "region"), "q.r", WriteMode.Add, txn = Some(tx))
      tx.seal()
      cat.readTable("q.n").join(cat.readTable("q.r"),
        col("n_regionkey") === col("r_regionkey")).select("n_name", "r_name")
    },

    // Schemaless read: the manifest as a table (file/record accounting).
    Q("c16_manifest_stats", Some("""
      SELECT CAST(2 AS BIGINT) AS n_deltas, CAST(2 AS BIGINT) AS n_files,
             CAST(50 AS BIGINT) AS total_records""")) { (s, dir) =>
      val cat = newCat(s, "c16")
      val n = tbl(s, dir, "nation").repartition(1)
      cat.writeToTable(n, "q.n")
      cat.writeToTable(n, "q.n", WriteMode.Add)
      cat.manifestTable("q.n").agg(
        countDistinct(col("stream_position")).cast(LongType).as("n_deltas"),
        cnt.as("n_files"),
        sum(col("delta_record_count")).cast(LongType).as("total_records"))
    },

    // from_manifest_table: load the files listed in a manifest table.
    Q("c17_from_manifest", Some(
      "SELECT * FROM nation UNION ALL SELECT * FROM nation")) { (s, dir) =>
      val cat = newCat(s, "c17")
      val n = tbl(s, dir, "nation").repartition(1)
      cat.writeToTable(n, "q.n")
      cat.writeToTable(n, "q.n", WriteMode.Add)
      cat.fromManifestTable(cat.manifestTable("q.n"))
    },

    // Ordered APPEND stream positions are contiguous and typed.
    Q("c18_append_positions", Some("""
      SELECT 'APPEND' AS delta_type, CAST(1 AS BIGINT) AS stream_position
      UNION ALL SELECT 'APPEND', CAST(2 AS BIGINT)
      UNION ALL SELECT 'APPEND', CAST(3 AS BIGINT)""")) { (s, dir) =>
      val cat = newCat(s, "c18")
      val r = tbl(s, dir, "region").select(col("r_regionkey").cast(LongType).as("k"),
        col("r_name").as("v"))
      cat.createTable("q.a", r.schema)
      cat.writeToTable(r, "q.a", WriteMode.Append)
      cat.writeToTable(r, "q.a", WriteMode.Append)
      cat.writeToTable(r, "q.a", WriteMode.Append)
      cat.manifestTable("q.a").select("delta_type", "stream_position").distinct()
    },

    // CHRONO (event-time) ingest of the events stream + hourly rollup.
    Q("c19_chrono_rollup", Some("""
      SELECT event_type, date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)""")) { (s, dir) =>
      val cat = newCat(s, "c19")
      val e = events(s, dir).select("event_id", "ts", "event_type", "value")
      cat.createTable("q.e", StructType(Seq(
        FieldMeta.field("event_id", LongType),
        FieldMeta.field("ts", TimestampNTZType, eventTime = true),
        FieldMeta.field("event_type", StringType),
        FieldMeta.field("value", DoubleType))))
      cat.writeToTable(e, "q.e", WriteMode.Chrono)
      cat.readTable("q.e")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(cnt.as("n"))
    },

    // Sort scheme applied through compaction; content is unchanged.
    Q("c20_sort_scheme", Some(
      "SELECT p_partkey, p_name, p_size FROM part")) { (s, dir) =>
      val cat = newCat(s, "c20")
      val p = tbl(s, dir, "part").select("p_partkey", "p_name", "p_size")
      cat.createTable("q.p", p.schema,
        sortScheme = SortScheme(Seq(SortKey("p_size", ascending = false))))
      cat.writeToTable(p, "q.p", WriteMode.Add)
      cat.compact("q.p")
      cat.readTable("q.p")
    },

    // Txn history surfaces exactly the committed transactions.
    Q("c21_history", Some("SELECT CAST(1 AS BIGINT) AS n_txns")) { (s, dir) =>
      val cat = newCat(s, "c21")
      val tx = cat.transaction("everything in one txn")
      cat.createTable("q.n", tbl(s, dir, "nation").schema, txn = Some(tx))
      cat.writeToTable(tbl(s, dir, "nation"), "q.n", WriteMode.Add, txn = Some(tx))
      tx.seal()
      cat.historyDF().agg(cnt.as("n_txns"))
    },

    // Non-parquet content types: the table's data files are written and
    // scanned in the declared format (reference utils/pyarrow.py:232-683).
    Q("c22_csv_roundtrip", Some("SELECT * FROM nation")) { (s, dir) =>
      val cat = newCat(s, "c22")
      val n = tbl(s, dir, "nation")
      cat.createTable("q.n", n.schema, properties = Map("content_type" -> "csv"))
      cat.writeToTable(n, "q.n", WriteMode.Add)
      cat.readTable("q.n")
    },

    Q("c23_json_roundtrip", Some("SELECT p_partkey, p_name, p_size FROM part")) { (s, dir) =>
      val cat = newCat(s, "c23")
      val p = tbl(s, dir, "part").select("p_partkey", "p_name", "p_size")
      cat.createTable("q.p", p.schema, properties = Map("content_type" -> "json"))
      cat.writeToTable(p, "q.p", WriteMode.Add)
      cat.readTable("q.p")
    },

    Q("c24_orc_roundtrip", Some("SELECT * FROM supplier")) { (s, dir) =>
      val cat = newCat(s, "c24")
      val sup = tbl(s, dir, "supplier")
      cat.createTable("q.s", sup.schema, properties = Map("content_type" -> "orc"))
      cat.writeToTable(sup, "q.s", WriteMode.Add)
      cat.readTable("q.s")
    },

    // Merge-on-read + compaction over a TSV-typed table: format-independent
    // LSM semantics.
    Q("c25_tsv_merge", Some("""
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 3 = 0 THEN 'Z' ELSE n_name END AS n_name
      FROM nation WHERE n_nationkey % 4 <> 0""")) { (s, dir) =>
      val cat = newCat(s, "c25")
      val base = tbl(s, dir, "nation").select("n_nationkey", "n_name")
      cat.createTable("q.n", StructType(Seq(
        FieldMeta.field("n_nationkey", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("n_name", StringType))),
        properties = Map("content_type" -> "tsv"))
      cat.writeToTable(base, "q.n", WriteMode.Merge)
      cat.writeToTable(
        base.where(col("n_nationkey") % 3 === 0).withColumn("n_name", lit("Z")),
        "q.n", WriteMode.Merge)
      cat.writeToTable(
        base.select("n_nationkey").where(col("n_nationkey") % 4 === 0),
        "q.n", WriteMode.Delete)
      cat.readTable("q.n")
    },

    // DSv2: plain Spark SQL over the catalog plugin, filter pushed to scan.
    Q("c26_dsv2_sql", Some(
      "SELECT n_name, n_regionkey FROM nation WHERE n_regionkey <= 2")) { (s, dir) =>
      val cat = newCat(s, "c26")
      cat.writeToTable(tbl(s, dir, "nation"), "q.n")
      // Unique catalog name per invocation: Spark caches plugin instances
      // by name, and each run uses a fresh temp root.
      val cn = s"graft_c26_${System.nanoTime()}"
      s.conf.set(s"spark.sql.catalog.$cn", classOf[graft.spark.GraftSparkCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cn.root", cat.root.toString)
      s.sql(s"SELECT n_name, n_regionkey FROM $cn.q.n WHERE n_regionkey <= 2")
    },

    // Delta column stats computed during the write (min/max/null counts).
    Q("c27_column_stats", Some("""
      SELECT 'n_nationkey' AS column_name, CAST(MIN(n_nationkey) AS VARCHAR) AS min,
             CAST(MAX(n_nationkey) AS VARCHAR) AS max, CAST(0 AS BIGINT) AS null_count
      FROM nation
      UNION ALL
      SELECT 'n_name', MIN(n_name), MAX(n_name), CAST(0 AS BIGINT) FROM nation
      UNION ALL
      SELECT 'n_regionkey', CAST(MIN(n_regionkey) AS VARCHAR),
             CAST(MAX(n_regionkey) AS VARCHAR), CAST(0 AS BIGINT) FROM nation""")) { (s, dir) =>
      val cat = newCat(s, "c27")
      cat.writeToTable(tbl(s, dir, "nation"), "q.n")
      cat.columnStats("q.n").select("column_name", "min", "max", "null_count")
    },

    // URL-addressed copy pipeline: file → graft table with a transform.
    Q("c28_url_copy", Some(
      "SELECT n_nationkey, upper(n_name) AS n_name FROM nation")) { (s, dir) =>
      val cname = s"c28_${System.nanoTime()}"
      graft.Graft.initCatalog(cname, s,
        java.nio.file.Files.createTempDirectory("graft_c28").toString)
      graft.Graft.copy(s, s"$dir/nation.parquet", s"graft://$cname/q.n",
        transforms = Seq(df => df.select(col("n_nationkey"), upper(col("n_name")).as("n_name"))))
      graft.Graft.get(s, s"graft://$cname/q.n")
    },

    // Per-delta download: exactly the second delta's rows.
    Q("c29_download_delta", Some(
      "SELECT r_regionkey, r_name FROM region")) { (s, dir) =>
      val cat = newCat(s, "c29")
      cat.writeToTable(tbl(s, dir, "nation").select(
        col("n_nationkey").as("r_regionkey"), col("n_name").as("r_name")), "q.t")
      cat.writeToTable(tbl(s, dir, "region"), "q.t", WriteMode.Add)
      val last = cat.deltaLog("q.t").map(_.streamPosition).max
      cat.downloadDelta("q.t", last)
    },

    // Repartition rewrite preserves content exactly.
    Q("c30_repartition", Some(
      "SELECT o_orderkey, o_custkey, o_orderpriority FROM orders")) { (s, dir) =>
      val cat = newCat(s, "c30")
      cat.writeToTable(
        tbl(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority"), "q.o")
      cat.repartitionTable("q.o", 6, byColumns = Seq("o_custkey"))
      cat.readTable("q.o")
    },

    // Event-time completeness watermark derived from per-delta column stats.
    Q("c31_watermark", Some(
      "SELECT CAST(epoch_us(MAX(ts)) AS BIGINT) AS watermark_us FROM events")) { (s, dir) =>
      val cat = newCat(s, "c31")
      val e = events(s, dir).select("event_id", "ts", "event_type")
      cat.createTable("q.e", StructType(Seq(
        FieldMeta.field("event_id", LongType),
        FieldMeta.field("ts", TimestampNTZType, eventTime = true),
        FieldMeta.field("event_type", StringType))))
      cat.writeToTable(e, "q.e", WriteMode.Chrono)
      val wm = cat.eventTimeWatermark("q.e").get
      s.sql(s"SELECT unix_micros(CAST('$wm' AS TIMESTAMP)) AS watermark_us")
    },

    // Iceberg-converter core: equality deletes → (file_path, pos) position
    // deletes. Positions are deterministic (single sorted file).
    Q("c32_position_deletes", Some("""
      SELECT CAST(rn - 1 AS BIGINT) AS pos FROM (
        SELECT row_number() OVER (ORDER BY o_orderkey) AS rn, o_orderkey FROM orders)
      WHERE o_orderkey % 50 = 0""")) { (s, dir) =>
      val o = tbl(s, dir, "orders").select("o_orderkey", "o_custkey")
      val out = java.nio.file.Files.createTempDirectory("graft_c32").toString + "/data"
      o.repartition(1).sortWithinPartitions("o_orderkey").write.parquet(out)
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      val paths = try {
        import scala.collection.JavaConverters._
        files.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toList
      } finally files.close()
      Converter.equalityToPositionDeletes(s, paths, o.schema,
        o.where(col("o_orderkey") % 50 === 0).select("o_orderkey"), Seq("o_orderkey"))
        .select("pos")
    },

    // Per-field consistency policies (reference SchemaConsistencyType): the
    // COERCE column accepts a long and casts it to string; the VALIDATE
    // column rejects a double write-attempt outright (the rejected write
    // must leave NO trace — the read proves it).
    Q("c33_consistency_policies", Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
             CAST(n_regionkey AS VARCHAR) AS region_str,
             CAST(n_nationkey * 2 AS BIGINT) AS strict_val
      FROM nation""")) { (s, dir) =>
      val cat = newCat(s, "c33")
      cat.createTable("q.n", StructType(Seq(
        FieldMeta.field("n_nationkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("region_str", StringType, consistency = Some("coerce")),
        FieldMeta.field("strict_val", LongType, consistency = Some("validate")))))
      val n = tbl(s, dir, "nation")
      cat.writeToTable(n.select(col("n_nationkey"),
        col("n_regionkey").as("region_str"),
        (col("n_nationkey") * 2).cast(LongType).as("strict_val")), "q.n", WriteMode.Merge)
      // VALIDATE rejects a type-mismatched write; nothing may be committed.
      try {
        cat.writeToTable(n.select(col("n_nationkey"),
          (col("n_nationkey") * 2.5).as("strict_val")), "q.n", WriteMode.Merge)
        throw new IllegalStateException("VALIDATE should have rejected the double write")
      } catch { case _: SchemaValidationError => () }
      cat.readTable("q.n")
    },

    // future_default: a write omitting the column physically fills the
    // declared default (reference schema.py:301-311), distinct from
    // past_default (which backfills rows OLDER than the field).
    Q("c34_future_default", Some("""
      SELECT r_regionkey, r_name, 'backfill' AS tier FROM region""")) { (s, dir) =>
      val cat = newCat(s, "c34")
      cat.createTable("q.r", StructType(Seq(
        FieldMeta.field("r_regionkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("r_name", StringType),
        FieldMeta.field("tier", StringType, futureDefault = Some("backfill")))))
      cat.writeToTable(tbl(s, dir, "region").select("r_regionkey", "r_name"),
        "q.r", WriteMode.Merge)
      cat.readTable("q.r")
    },

    // remove_field + rename behind the allow_incompatible_changes gate
    // (reference SchemaUpdate, schema.py:140-216): data written under the
    // OLD column name reads back under the new one; the removed column is
    // gone from the schema and the result.
    Q("c35_remove_rename", Some("""
      SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name AS supplier_name
      FROM supplier""")) { (s, dir) =>
      val cat = newCat(s, "c35")
      cat.createTable("q.s", StructType(Seq(
        FieldMeta.field("s_suppkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("s_name", StringType),
        FieldMeta.field("s_acctbal", DoubleType))))
      cat.writeToTable(tbl(s, dir, "supplier").select("s_suppkey", "s_name", "s_acctbal"),
        "q.s", WriteMode.Merge)
      cat.alterTable("q.s",
        removeFields = Seq("s_acctbal"),
        renameFields = Map("s_name" -> "supplier_name"),
        allowIncompatibleChanges = true)
      cat.readTable("q.s")
    },

    // Content encoding: gzip-compressed delimited table round-trips
    // (reference ContentEncoding, types/media.py:35-54). Write goes through
    // the datasource `compression` option; read auto-decompresses by the
    // .csv.gz extension.
    Q("c36_gzip_csv", Some("SELECT * FROM nation")) { (s, dir) =>
      val cat = newCat(s, "c36")
      val n = tbl(s, dir, "nation")
      cat.createTable("q.n", n.schema, properties = Map(
        "content_type" -> "csv", "content_encoding" -> "gzip"))
      cat.writeToTable(n, "q.n", WriteMode.Add)
      val files = cat.manifestTable("q.n").select("path")
        .collect().map(_.getString(0))
      require(files.nonEmpty && files.forall(_.endsWith(".csv.gz")),
        s"expected gzip csv files, got ${files.take(3).mkString(",")}")
      cat.readTable("q.n")
    },

    // Named subschemas: one multimodal-style table with a `text` group and
    // a `meta` group; reading the meta group projects only its columns
    // (the text payload is never scanned — see SchemaPolicySpec's plan
    // assert for the ReadSchema proof).
    Q("c37_subschema_read", Some("""
      SELECT doc_id, lang, source FROM documents""")) { (s, dir) =>
      val cat = newCat(s, "c37")
      val d = tbl(s, dir, "documents").select("doc_id", "text", "lang", "source")
      cat.createTable("q.d", d.schema)
      cat.setSubschema("q.d", "text", Seq("doc_id", "text"))
      cat.setSubschema("q.d", "meta", Seq("doc_id", "lang", "source"))
      cat.writeToTable(d, "q.d", WriteMode.Add)
      cat.readSubschema("q.d", "meta")
    },

    // Partition-scoped stream positions (reference Partition.stream_position,
    // storage/model/partition.py:53-78): after a second write touching only
    // regions 0 and 1, those partitions' high watermarks advance to delta 2
    // while the untouched partitions stay at delta 1.
    Q("c38_partition_positions", Some("""
      SELECT CAST(r_regionkey AS VARCHAR) AS part_value,
             CAST(CASE WHEN r_regionkey IN (0, 1) THEN 2 ELSE 1 END AS BIGINT) AS stream_position
      FROM (SELECT DISTINCT r_regionkey FROM region)""")) { (s, dir) =>
      val cat = newCat(s, "c38")
      val r = tbl(s, dir, "region")
      cat.createTable("q.r", r.schema,
        partitionScheme = PartitionScheme(Seq(PartitionKey("r_regionkey", Transform.Identity))))
      cat.writeToTable(r, "q.r", WriteMode.Add)
      cat.writeToTable(r.where(col("r_regionkey") < 2), "q.r", WriteMode.Add)
      val pcol = PartitionKey("r_regionkey", Transform.Identity).partitionColumnName
      cat.partitionStreamPositions("q.r")
        .select(col(pcol).as("part_value"), col("stream_position"))
    },

    // Nested-struct schema evolution (reference schema.py:319-321 nested
    // field paths; pa.unify_schemas permissive widening inside structs):
    // write struct<a:int,b:string>, then a second write whose struct widens
    // a→bigint, drops b, and appends c. AUTO evolution unifies to
    // struct<a:bigint,b:string,c:string>; write-1 files are read under the
    // evolved nested schema (a widened, c null) and write-2 rows conform at
    // write time (b null). Output flattens the struct — the compare harness
    // sorts/hashes primitive cells.
    Q("c39_nested_evolution", Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS id, CAST(n_regionkey AS BIGINT) AS a,
             n_name AS b, CAST(NULL AS VARCHAR) AS c FROM nation
      UNION ALL
      SELECT CAST(n_nationkey + 100 AS BIGINT) AS id, CAST(n_nationkey AS BIGINT) AS a,
             CAST(NULL AS VARCHAR) AS b, 'c' || CAST(n_nationkey AS VARCHAR) AS c FROM nation""")) { (s, dir) =>
      val cat = newCat(s, "c39")
      val n = tbl(s, dir, "nation")
      cat.writeToTable(n.select(
        col("n_nationkey").cast(LongType).as("id"),
        struct(col("n_regionkey").cast(IntegerType).as("a"), col("n_name").as("b")).as("meta")),
        "q.t")
      cat.writeToTable(n.select(
        (col("n_nationkey") + 100).cast(LongType).as("id"),
        struct(col("n_nationkey").cast(LongType).as("a"),
          concat(lit("c"), col("n_nationkey").cast(StringType)).as("c")).as("meta")),
        "q.t", WriteMode.Add)
      cat.readTable("q.t").select(col("id"), col("meta.a").as("a"),
        col("meta.b").as("b"), col("meta.c").as("c"))
    },

    // CDC change feed (reference discover_deltas, compactor_v2/utils/io.py:171):
    // rows of every delta past a consumer's checkpoint position, tagged with
    // _delta_type/_stream_position. Positions are the per-table revision
    // numbers (1=base load, 2=upsert, 3=delete), so afterPosition=1 yields
    // exactly the upsert rows and the key-only delete tombstones.
    Q("c40_read_changes", Some("""
      SELECT n_nationkey, 'UPD' AS n_name, n_regionkey,
             'UPSERT' AS _delta_type, CAST(2 AS BIGINT) AS _stream_position
      FROM nation WHERE n_nationkey % 5 = 0
      UNION ALL
      SELECT n_nationkey, CAST(NULL AS VARCHAR) AS n_name, CAST(NULL AS INTEGER) AS n_regionkey,
             'DELETE' AS _delta_type, CAST(3 AS BIGINT) AS _stream_position
      FROM nation WHERE n_nationkey % 7 = 0""")) { (s, dir) =>
      val cat = newCat(s, "c40")
      val n = tbl(s, dir, "nation")
      cat.createTable("q.n", StructType(Seq(
        FieldMeta.field("n_nationkey", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("n_name", StringType),
        FieldMeta.field("n_regionkey", IntegerType))), properties = MoR)
      cat.writeToTable(n.select("n_nationkey", "n_name", "n_regionkey"), "q.n", WriteMode.Merge)
      cat.writeToTable(
        n.where(col("n_nationkey") % 5 === 0)
          .select(col("n_nationkey"), lit("UPD").as("n_name"), col("n_regionkey")),
        "q.n", WriteMode.Merge)
      cat.writeToTable(
        n.where(col("n_nationkey") % 7 === 0).select("n_nationkey"),
        "q.n", WriteMode.Delete)
      cat.readChanges("q.n", afterPosition = 1L)
    },

    // Avro content type (reference utils/pyarrow.py:448-483,643) through
    // Graft's own AvroFileFormat: merge + delete + read on an avro table.
    Q("c41_avro_merge", Some("""
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 3 = 0 THEN 'A' ELSE n_name END AS n_name
      FROM nation WHERE n_nationkey % 4 <> 0""")) { (s, dir) =>
      val cat = newCat(s, "c41")
      cat.createTable("q.n", StructType(Seq(
        FieldMeta.field("n_nationkey", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("n_name", StringType))), properties = Map(
        "content_type" -> "avro", "read_optimization" -> "NONE"))
      val n = tbl(s, dir, "nation").select("n_nationkey", "n_name")
      cat.writeToTable(n, "q.n", WriteMode.Merge)
      cat.writeToTable(
        n.where(col("n_nationkey") % 3 === 0)
          .select(col("n_nationkey"), lit("A").as("n_name")),
        "q.n", WriteMode.Merge)
      cat.writeToTable(
        n.where(col("n_nationkey") % 4 === 0).select("n_nationkey"),
        "q.n", WriteMode.Delete)
      cat.readTable("q.n")
    },

    // Feather/Arrow-IPC content type (reference utils/pyarrow.py:272-329)
    // through Graft's own FeatherFileFormat, with compaction rewriting the
    // LSM into feather files.
    Q("c42_feather_merge", Some("""
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 3 = 0 THEN 'F' ELSE n_name END AS n_name
      FROM nation WHERE n_nationkey % 4 <> 0""")) { (s, dir) =>
      val cat = newCat(s, "c42")
      cat.createTable("q.n", StructType(Seq(
        FieldMeta.field("n_nationkey", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("n_name", StringType))), properties = Map(
        "content_type" -> "feather", "read_optimization" -> "NONE"))
      val n = tbl(s, dir, "nation").select("n_nationkey", "n_name")
      cat.writeToTable(n, "q.n", WriteMode.Merge)
      cat.writeToTable(
        n.where(col("n_nationkey") % 3 === 0)
          .select(col("n_nationkey"), lit("F").as("n_name")),
        "q.n", WriteMode.Merge)
      cat.writeToTable(
        n.where(col("n_nationkey") % 4 === 0).select("n_nationkey"),
        "q.n", WriteMode.Delete)
      cat.compact("q.n")
      cat.readTable("q.n")
    },

    // Unescaped-TSV content type (reference UNESCAPED_TSV media.py:32,
    // quoting_style="none" pyarrow.py:689-693): raw tab-delimited roundtrip.
    Q("c43_unescaped_tsv", Some("SELECT n_nationkey, n_name FROM nation")) { (s, dir) =>
      val cat = newCat(s, "c43")
      val n = tbl(s, dir, "nation").select("n_nationkey", "n_name")
      cat.createTable("q.n", n.schema, properties = Map("content_type" -> "unescaped_tsv"))
      cat.writeToTable(n, "q.n", WriteMode.Add)
      cat.readTable("q.n")
    },

    // Delta Lake foreign stream format (reference StreamFormat.DELTA_LAKE,
    // storage/model/types.py:32-38), spoken via the public transaction-log
    // protocol: partitioned append, metadata-only partition delete, append
    // after delete (path re-add), then a snapshot read that reattaches
    // partition columns from the log's add actions.
    Q("c44_delta_lake", Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      FROM lineitem WHERE l_orderkey % 3 = 0 AND l_returnflag <> 'R'
      UNION ALL
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      FROM lineitem WHERE l_orderkey % 3 = 1 AND l_returnflag = 'R'""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c44").resolve("tbl").toString
      val li = tbl(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      graft.interop.DeltaLake.write(
        li.where(col("l_orderkey") % 3 === 0), t, partitionBy = Seq("l_returnflag"))
      graft.interop.DeltaLake.deletePartitions(s, t, col("l_returnflag") === "R")
      graft.interop.DeltaLake.write(
        li.where(col("l_orderkey") % 3 === 1 && col("l_returnflag") === "R"),
        t, partitionBy = Seq("l_returnflag"))
      graft.interop.DeltaLake.read(s, t)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    },

    // Delta Lake time travel: versionAsOf replays the log prefix, and the
    // checkpoint written at version 2 (interval 2) is used for the head
    // snapshot while the pinned read replays pure JSON — both paths oracled.
    Q("c45_delta_time_travel", Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 4 = 0""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c45").resolve("tbl").toString
      val o = tbl(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      graft.interop.DeltaLake.write(
        o.where(col("o_orderkey") % 4 === 0), t, checkpointInterval = 2)
      graft.interop.DeltaLake.write(
        o.where(col("o_orderkey") % 4 === 1), t, checkpointInterval = 2)
      graft.interop.DeltaLake.write(
        o.where(col("o_orderkey") % 4 === 2), t, checkpointInterval = 2)
      graft.interop.DeltaLake.read(s, t, versionAsOf = Some(0L))
    },

    // Iceberg v2 foreign stream format (reference StreamFormat.ICEBERG),
    // spoken via the public table spec: JSON metadata + avro manifests
    // written by Graft's own binding. Partitioned append (seq 1), an
    // equality-delete snapshot (seq 2), then a later append (seq 3) whose
    // rows the delete must NOT hit (sequence-gated application).
    Q("c46_iceberg", Some("""
      SELECT c_custkey, c_name, c_nationkey
      FROM customer WHERE c_custkey % 6 <> 0""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c46").resolve("tbl").toString
      val c = tbl(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey")
      graft.interop.Iceberg.createTable(t, c.schema, partitionCols = Seq("c_nationkey"))
      graft.interop.Iceberg.append(c.where(col("c_custkey") % 2 === 0), t)
      graft.interop.Iceberg.commitEqualityDeletes(
        s, t, c.where(col("c_custkey") % 6 === 0).select("c_custkey"), Seq("c_custkey"))
      graft.interop.Iceberg.append(c.where(col("c_custkey") % 2 === 1), t)
      graft.interop.Iceberg.read(s, t)
    },

    // The converter's Iceberg snapshot commit (reference
    // pyiceberg/update_snapshot_overrides.py): equality keys become
    // position deletes (Converter compute core) and are PUBLISHED as a
    // delete snapshot; the snapshot read applies them.
    Q("c47_iceberg_converter", Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 9 <> 0""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c47").resolve("tbl").toString
      val o = tbl(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      graft.interop.Iceberg.createTable(t, o.schema)
      graft.interop.Iceberg.append(o, t)
      val meta = graft.interop.Iceberg.loadMeta(t)
      val dataFiles = graft.interop.Iceberg
        .fileEntries(s, meta, meta.snapshots.head).filter(_.content == 0).map(_.path)
      val pos = Converter.equalityToPositionDeletes(
        s, dataFiles, o.schema,
        o.where(col("o_orderkey") % 9 === 0).select("o_orderkey"), Seq("o_orderkey"))
        .select(regexp_replace(col("file_path"), "^file:/+", "/").as("file_path"), col("pos"))
      graft.interop.Iceberg.commitPositionDeletes(s, t, pos)
      graft.interop.Iceberg.read(s, t)
    },

    // Hudi copy-on-write foreign stream format (reference StreamFormat.HUDI,
    // readers via ray/daft read_hudi url.py:120-124): partitioned appends
    // through the timeline, snapshot read reattaches typed partition values
    // from the hive-style slice paths.
    Q("c48_hudi", Some("""
      SELECT s_suppkey, s_name, s_nationkey FROM supplier""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c48").resolve("tbl").toString
      val sp = tbl(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
      graft.interop.Hudi.write(
        sp.where(col("s_suppkey") % 2 === 0), t, partitionBy = Seq("s_nationkey"))
      graft.interop.Hudi.write(
        sp.where(col("s_suppkey") % 2 === 1), t, partitionBy = Seq("s_nationkey"))
      graft.interop.Hudi.read(s, t).select("s_suppkey", "s_name", "s_nationkey")
    },

    // Delta deletion vectors (PROTOCOL.md): two row-level deleteWhere
    // commits rewrite NO data files — each publishes a roaring-bitmap DV
    // and the (path, dvId)-keyed replay applies the merged bitmap on read.
    Q("c49_delta_deletion_vectors", Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0 AND o_custkey % 5 <> 0""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c49").resolve("tbl").toString
      val o = tbl(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      graft.interop.DeltaLake.write(o, t)
      graft.interop.DeltaLake.deleteWhere(s, t, col("o_orderkey") % 7 === 0)
      graft.interop.DeltaLake.deleteWhere(s, t, col("o_custkey") % 5 === 0)
      graft.interop.DeltaLake.read(s, t)
    },

    // Hudi incremental pull: rows written by the commits AFTER a given
    // instant (the reference catalog's readChanges analog for the foreign
    // format). The wall-clock instant tag is dropped for determinism.
    Q("c50_hudi_incremental", Some("""
      SELECT p_partkey, p_name, p_retailprice
      FROM part WHERE p_partkey % 3 <> 0""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c50").resolve("tbl").toString
      val p = tbl(s, dir, "part").select("p_partkey", "p_name", "p_retailprice")
      graft.interop.Hudi.write(p.where(col("p_partkey") % 3 === 0), t)
      val i0 = graft.interop.Hudi.timeline(t).last.time
      graft.interop.Hudi.write(p.where(col("p_partkey") % 3 === 1), t)
      graft.interop.Hudi.write(p.where(col("p_partkey") % 3 === 2), t)
      graft.interop.Hudi.incremental(s, t, i0).drop("_hoodie_commit_instant")
    },

    // Hudi merge-on-read (StreamFormat.HUDI is format-generic — real MoR
    // tables carry `.log` delta files): base insert via deltacommit, a
    // price upsert and a tombstone delete each append parquet data blocks
    // in HoodieLogFormat v1, and the snapshot read zipper-merges base +
    // logs per record key (latest block wins, tombstones drop).
    Q("c51_hudi_mor", Some("""
      SELECT p_partkey, p_name,
             CASE WHEN p_partkey % 5 = 0 THEN p_retailprice * 2 ELSE p_retailprice END AS p_retailprice
      FROM part WHERE p_partkey % 7 <> 0""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c51").resolve("tbl").toString
      val p = tbl(s, dir, "part").select("p_partkey", "p_name", "p_retailprice")
      graft.interop.Hudi.write(p, t,
        tableType = "MERGE_ON_READ", recordKeyFields = Seq("p_partkey"))
      graft.interop.Hudi.upsertLog(
        p.where(col("p_partkey") % 5 === 0)
          .withColumn("p_retailprice", col("p_retailprice") * 2), t)
      graft.interop.Hudi.upsertLog(
        p.where(col("p_partkey") % 7 === 0).withColumn("_hoodie_is_deleted", lit(true)), t)
      graft.interop.Hudi.read(s, t)
    },

    // Merge-on-read incremental pull: the rows carried by log blocks whose
    // deltacommit falls inside the requested instant window — here exactly
    // the price-upsert batch, not the base insert before it nor the
    // tombstone batch after it.
    Q("c56_hudi_mor_incremental", Some("""
      SELECT p_partkey, p_name, p_retailprice * 2 AS p_retailprice
      FROM part WHERE p_partkey % 5 = 0""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c56").resolve("tbl").toString
      val p = tbl(s, dir, "part").select("p_partkey", "p_name", "p_retailprice")
      graft.interop.Hudi.write(p, t,
        tableType = "MERGE_ON_READ", recordKeyFields = Seq("p_partkey"))
      val i0 = graft.interop.Hudi.timeline(t).last.time
      val i1 = graft.interop.Hudi.upsertLog(
        p.where(col("p_partkey") % 5 === 0)
          .withColumn("p_retailprice", col("p_retailprice") * 2), t)
      graft.interop.Hudi.upsertLog(
        p.where(col("p_partkey") % 11 === 0).withColumn("_hoodie_is_deleted", lit(true)), t)
      graft.interop.Hudi.incremental(s, t, i0, Some(i1))
        .drop("_hoodie_commit_instant")
    },

    // Hudi MoR compaction: after folding the upsert + tombstone logs into
    // fresh base files, the snapshot read must still be the merged state —
    // now served from bases alone (no slice keeps logs).
    Q("c57_hudi_mor_compact", Some("""
      SELECT p_partkey, p_name,
             CASE WHEN p_partkey % 5 = 0 THEN p_retailprice * 2 ELSE p_retailprice END AS p_retailprice
      FROM part WHERE p_partkey % 9 <> 0""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c57").resolve("tbl").toString
      val p = tbl(s, dir, "part").select("p_partkey", "p_name", "p_retailprice")
      graft.interop.Hudi.write(p, t,
        tableType = "MERGE_ON_READ", recordKeyFields = Seq("p_partkey"))
      graft.interop.Hudi.upsertLog(
        p.where(col("p_partkey") % 5 === 0)
          .withColumn("p_retailprice", col("p_retailprice") * 2), t)
      graft.interop.Hudi.upsertLog(
        p.where(col("p_partkey") % 9 === 0).withColumn("_hoodie_is_deleted", lit(true)), t)
      require(graft.interop.Hudi.compact(s, t).isDefined, "compaction must run")
      require(graft.interop.Hudi.snapshot(s, t).slices.forall(_.logFiles.isEmpty),
        "post-compaction slices must be log-free")
      graft.interop.Hudi.read(s, t)
    },

    // Delta schema evolution on append: the second half arrives with a new
    // nullable column; earlier rows surface it as null.
    Q("c58_delta_evolution", Some("""
      SELECT s_suppkey, s_name,
             CASE WHEN s_suppkey % 2 = 1 THEN concat('t', CAST(s_suppkey AS VARCHAR)) END AS tag
      FROM supplier""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c58").resolve("tbl").toString
      val sp = tbl(s, dir, "supplier").select("s_suppkey", "s_name")
      graft.interop.DeltaLake.write(sp.where(col("s_suppkey") % 2 === 0), t)
      graft.interop.DeltaLake.write(
        sp.where(col("s_suppkey") % 2 === 1)
          .withColumn("tag", concat(lit("t"), col("s_suppkey"))), t)
      graft.interop.DeltaLake.read(s, t)
    },

    // Delta TYPE WIDENING on append (PROTOCOL.md Type Widening): int→long
    // arrives in the second half; the table's schema widens, the protocol
    // upgrades to the feature form, and pre-change int32 files up-cast at
    // scan.
    Q("c69_delta_widen", Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c69").resolve("tbl").toString
      val n = tbl(s, dir, "nation").select("n_nationkey", "n_name")
      graft.interop.DeltaLake.write(n.where(col("n_nationkey") < 10), t)
      graft.interop.DeltaLake.write(
        n.where(col("n_nationkey") >= 10)
          .withColumn("n_nationkey", col("n_nationkey").cast(LongType)), t)
      graft.interop.DeltaLake.read(s, t)
    },

    // Iceberg schema evolution on append: int→long key widening + a new
    // nullable column, committed as a new schema-id; old files project
    // through the evolved schema by field id.
    Q("c59_iceberg_evolution", Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
             CASE WHEN n_nationkey >= 10 THEN concat('t', CAST(n_nationkey AS VARCHAR)) END AS tag
      FROM nation""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c59").resolve("tbl").toString
      val n = tbl(s, dir, "nation").select("n_nationkey", "n_name")
      graft.interop.Iceberg.createTable(t, n.schema)
      graft.interop.Iceberg.append(n.where(col("n_nationkey") < 10), t)
      graft.interop.Iceberg.append(
        n.where(col("n_nationkey") >= 10)
          .withColumn("n_nationkey", col("n_nationkey").cast(LongType))
          .withColumn("tag", concat(lit("t"), col("n_nationkey"))), t)
      graft.interop.Iceberg.read(s, t)
    },

    // Delta column-mapping WRITE path (PROTOCOL.md "Column Mapping"):
    // create a name-mode table (physical col-… parquet names), append to
    // it, then a DV row-delete — all under logical names; the snapshot
    // read maps physical back to logical.
    Q("c52_delta_cm_write", Some("""
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_custkey % 4 <> 0""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c52").resolve("tbl").toString
      val c = tbl(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
      graft.interop.DeltaLake.write(
        c.where(col("c_custkey") % 2 === 0), t, columnMappingMode = "name")
      graft.interop.DeltaLake.write(c.where(col("c_custkey") % 2 === 1), t)
      graft.interop.DeltaLake.deleteWhere(s, t, col("c_custkey") % 4 === 0)
      graft.interop.DeltaLake.read(s, t)
    },

    // download_delta_manifest_entry (reference storage/interface.py:229-248):
    // a sorted single-partition write sliced at 1 record/file gives a
    // deterministic entry order (manifest entries sort by path; Spark's
    // slice suffixes c000,c001,… sort in write order), so entry i IS row i.
    Q("c53_manifest_entry", Some("""
      SELECT r_regionkey, r_name FROM region WHERE r_regionkey IN (1, 3)""")) { (s, dir) =>
      val cat = newCat(s, "c53")
      val r = tbl(s, dir, "region").select("r_regionkey", "r_name")
      cat.createTable("q.r", r.schema,
        properties = Map("write.max_records_per_file" -> "1"))
      cat.writeToTable(r.repartition(1).sortWithinPartitions("r_regionkey"),
        "q.r", WriteMode.Add)
      val pos = cat.deltaLog("q.r").head.streamPosition
      cat.downloadDeltaManifestEntry("q.r", pos, 1)
        .unionByName(cat.downloadDeltaManifestEntry("q.r", pos, 3))
    },

    // Paged listing (reference ListResult, storage/model/list_result.py):
    // 25 tables named after the nations, walked at page size 7 with resume
    // tokens; each name must surface exactly once on its predicted page.
    Q("c54_list_pagination", Some("""
      SELECT replace(n_name, ' ', '_') AS table_name,
             CAST(floor((row_number() OVER (ORDER BY replace(n_name, ' ', '_')) - 1) / 7) AS BIGINT) AS page
      FROM nation""")) { (s, dir) =>
      import s.implicits._
      val cat = newCat(s, "c54")
      val schema = StructType(Seq(FieldMeta.field("id", LongType)))
      val names = tbl(s, dir, "nation").select("n_name")
        .collect().map(_.getString(0).replace(' ', '_')).toSeq
      names.foreach(n => cat.createTable(s"pg.$n", schema))
      val pages = Iterator.unfold((Option.empty[String], 0, true)) {
        case (_, _, false) => None
        case (token, page, true) =>
          val (batch, next) = cat.listTablesPaged("pg", 7, token)
          Some((batch.map(n => (n, page.toLong)), (next, page + 1, next.isDefined)))
      }.flatten.toSeq
      pages.toDF("table_name", "page")
    },

    // SHA-1 bucket transform end-to-end: every row must land in EXACTLY one
    // of the 8 bucket partitions and be found by a bucket-value-pruned read
    // — a misrouted write or a file missing its bucket path segment makes
    // the union of the 8 pruned reads drop or duplicate rows.
    Q("c55_bucket_pruned_read", Some("""
      SELECT c_custkey, c_name, c_acctbal FROM customer""")) { (s, dir) =>
      val cat = newCat(s, "c55")
      val c = tbl(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
      cat.createTable("q.c", StructType(Seq(
        FieldMeta.field("c_custkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("c_name", StringType),
        FieldMeta.field("c_acctbal", DoubleType))),
        PartitionScheme(Seq(PartitionKey("c_custkey", Transform.BucketSha1(8)))))
      cat.writeToTable(c, "q.c", WriteMode.Merge)
      (0 until 8).map(b => cat.readTable("q.c",
          ReadOptions(partitionValues = Some(Map("c_custkey" -> b.toString)))))
        .reduce(_ unionByName _)
    },

    // File-level data skipping: a date-sorted many-file table read through a
    // rowFilter must return exactly the predicate's rows — a skip decision
    // that wrongly drops a file loses rows; one that mis-translates the
    // predicate returns extras. (The pruning itself is asserted in
    // FileStatsSpec/PlanSpec; this row pins the VALUES.)
    Q("c60_stats_skip_read", Some("""
      SELECT l_orderkey, CAST(l_shipdate AS DATE) AS l_shipdate, l_quantity
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1995-03-01'
        AND CAST(l_shipdate AS DATE) < DATE '1995-06-01'""")) { (s, dir) =>
      val cat = newCat(s, "c60")
      cat.createTable("q.li", StructType(Seq(
        FieldMeta.field("l_orderkey", LongType),
        FieldMeta.field("l_shipdate", DateType),
        FieldMeta.field("l_quantity", DoubleType))),
        properties = Map("write.max_records_per_file" -> "5000"))
      cat.writeToTable(tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate").cast("date").as("l_shipdate"),
          col("l_quantity"))
        .orderBy("l_shipdate").coalesce(1), "q.li")
      cat.readTable("q.li", ReadOptions(rowFilter = Some(
        col("l_shipdate") >= "1995-03-01" && col("l_shipdate") < "1995-06-01")))
    },

    // Z-order clustering: Morton-sorted compaction must preserve the table
    // EXACTLY (clustering is layout-only), and a 2-D rowFilter over the
    // clustered columns returns the predicate's rows through the pruned
    // plan.
    Q("c61_zorder_read", Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_custkey BETWEEN 100 AND 500 AND o_totalprice BETWEEN 50000 AND 150000""")) { (s, dir) =>
      val cat = newCat(s, "c61")
      cat.createTable("q.o", StructType(Seq(
        FieldMeta.field("o_orderkey", LongType),
        FieldMeta.field("o_custkey", LongType),
        FieldMeta.field("o_totalprice", DoubleType))),
        properties = Map(
          graft.catalog.ZOrder.Prop -> "o_custkey,o_totalprice",
          "compaction.max_records_per_file" -> "2000"))
      cat.writeToTable(tbl(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"), "q.o")
      cat.compact("q.o")
      cat.readTable("q.o", ReadOptions(rowFilter = Some(
        col("o_custkey").between(100, 500) && col("o_totalprice").between(50000, 150000))))
    },

    // Delta-native data skipping: our add.stats written at commit must be
    // sound (a wrongly-skipped file loses rows vs the oracle) and the
    // dataFilter semantics exact.
    Q("c63_delta_skip_read", Some("""
      SELECT l_orderkey, l_quantity, l_shipdate FROM lineitem
      WHERE l_quantity >= 45""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c63").toString + "/t"
      graft.interop.DeltaLake.write(
        tbl(s, dir, "lineitem").select("l_orderkey", "l_quantity", "l_shipdate")
          .repartitionByRange(8, col("l_quantity")), t)
      graft.interop.DeltaLake.read(s, t, dataFilter = Some(col("l_quantity") >= 45))
    },

    // ANALYZE backfill: a pre-stats table (stats.columns="") analyzed into
    // a copy-by-reference fold must read identically through the new
    // skip-indexed manifest — both filtered and in full.
    Q("c64_analyze_backfill", Some("""
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 50000""")) { (s, dir) =>
      val cat = newCat(s, "c64")
      cat.createTable("q.o", StructType(Seq(
        FieldMeta.field("o_orderkey", LongType),
        FieldMeta.field("o_totalprice", DoubleType))),
        properties = Map("stats.columns" -> "", "write.max_records_per_file" -> "2000"))
      cat.writeToTable(tbl(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_totalprice").coalesce(1), "q.o")
      cat.alterTable("q.o", removeProperties = Seq("stats.columns"))
      cat.analyzeTable("q.o")
      cat.readTable("q.o", ReadOptions(rowFilter = Some(col("o_totalprice") < 50000)))
    },

    // Manifest-served aggregates through the SQL surface: count/min/max
    // answered from the skip index must equal the real aggregation.
    Q("c65_agg_pushdown", Some("""
      SELECT count(*) AS n, min(l_quantity) AS mn, max(l_quantity) AS mx,
             min(l_returnflag) AS mnf, max(l_returnflag) AS mxf
      FROM lineitem""")) { (s, dir) =>
      val cat = newCat(s, "c65")
      cat.createTable("q.li", StructType(Seq(
        FieldMeta.field("l_quantity", DoubleType),
        FieldMeta.field("l_returnflag", StringType))),
        properties = Map("write.max_records_per_file" -> "5000"))
      cat.writeToTable(tbl(s, dir, "lineitem")
        .select("l_quantity", "l_returnflag"), "q.li")
      s.read.format("graft").option("root", cat.root.toString).option("table", "q.li").load()
        .agg(count(lit(1)).as("n"),
          min("l_quantity").as("mn"), max("l_quantity").as("mx"),
          min("l_returnflag").as("mnf"), max("l_returnflag").as("mxf"))
    },

    // DSv2 SQL data skipping end-to-end: a WHERE through the registered
    // catalog runs the StatsPruningScanBuilder path; values must match the
    // oracle exactly (an unsound skip loses rows, a mistranslation adds).
    Q("c66_sql_skip_read", Some("""
      SELECT l_orderkey, l_quantity FROM lineitem
      WHERE l_quantity BETWEEN 20 AND 25""")) { (s, dir) =>
      val cat = newCat(s, "c66")
      val cn = "gq66"
      s.conf.set(s"spark.sql.catalog.$cn", classOf[graft.spark.GraftSparkCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cn.root", cat.root.toString)
      cat.createTable("q.li", StructType(Seq(
        FieldMeta.field("l_orderkey", LongType),
        FieldMeta.field("l_quantity", DoubleType))),
        properties = Map("write.max_records_per_file" -> "5000"))
      cat.writeToTable(tbl(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .orderBy("l_quantity").coalesce(1), "q.li")
      s.sql(s"SELECT l_orderkey, l_quantity FROM $cn.q.li WHERE l_quantity BETWEEN 20 AND 25")
    },

    // rowFilter under merge-on-read: value predicates must see POST-merge
    // values (an upsert moving a row out of the filtered range removes it;
    // a naive file prune would resurrect the stale base row).
    Q("c62_rowfilter_mor", Some("""
      SELECT o_orderkey, o_totalprice * CASE WHEN o_orderkey % 10 = 0 THEN 3 ELSE 1 END AS o_totalprice
      FROM orders
      WHERE o_totalprice * CASE WHEN o_orderkey % 10 = 0 THEN 3 ELSE 1 END < 100000""")) { (s, dir) =>
      val cat = newCat(s, "c62")
      cat.createTable("q.o", StructType(Seq(
        FieldMeta.field("o_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("o_totalprice", DoubleType))), properties = MoR)
      val base = tbl(s, dir, "orders").select("o_orderkey", "o_totalprice")
      cat.writeToTable(base, "q.o", WriteMode.Merge)
      cat.writeToTable(base.where(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 3), "q.o", WriteMode.Merge)
      cat.readTable("q.o", ReadOptions(rowFilter = Some(col("o_totalprice") < 100000)))
    },

    // Resource estimation (SURVEY §2 row 27): the INTELLIGENT method's
    // type-aware in-memory model is pure arithmetic over footer statistics
    // — int32 ≡ 4 bytes/row, strings ≡ observed (len(min)+len(max))/2 + 4
    // arrow-offset bytes per value (reference parquet.py:10-14, 29-32) —
    // so DuckDB reproduces it exactly from the raw column values.
    Q("c67_resource_estimate", Some("""
      SELECT CAST(count(*) AS BIGINT) AS records,
             CAST(count(*) * 4
                  + count(*) * ((length(min(n_name)) + length(max(n_name))) / 2.0 + 4)
               AS DOUBLE) AS est_memory_bytes
      FROM nation""")) { (s, dir) =>
      val cat = newCat(s, "c67")
      cat.writeToTable(
        tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name")).repartition(1), "q.n")
      val est = cat.estimateResources("q.n", ResourceEstimator.Params(
        method = ResourceEstimator.Method.Intelligent, parquetToArrowInflation = 1.0))
      import s.implicits._
      Seq((est.records, est.memoryBytes)).toDF("records", "est_memory_bytes")
    },

    // Namespace lifecycle + list/exists (SURVEY §2 rows 56/57): create,
    // list (nested dropped), tables listed per namespace, drop CASCADE
    // removes both. The terminal inventory is the deterministic frame.
    Q("c70_namespace_ops", Some("""
      SELECT 'a' AS ns, 'r1' AS tbl UNION ALL
      SELECT 'a', 'r2' UNION ALL SELECT 'b', 'r3'""")) { (s, dir) =>
      val cat = newCat(s, "c70")
      val r = tbl(s, dir, "region")
      cat.createNamespace("a"); cat.createNamespace("b"); cat.createNamespace("gone")
      cat.writeToTable(r, "a.r1"); cat.writeToTable(r, "a.r2")
      cat.writeToTable(r, "b.r3"); cat.writeToTable(r, "gone.r4")
      cat.dropNamespace("gone", cascade = true)
      assert(!cat.namespaceExists("gone") && !cat.tableExists("gone.r4"))
      assert(cat.tableExists("a.r1") && !cat.tableExists("a.r9"))
      import s.implicits._
      cat.listNamespaces().sorted
        .flatMap(ns => cat.listTables(ns).sorted.map(t => (ns, t)))
        .toDF("ns", "tbl")
    },

    // Txn-log janitor (SURVEY §2 row 44): an abandoned in-flight txn is
    // failed and its staged files swept; committed data is untouched.
    Q("c71_janitor", Some("""
      SELECT CAST(1 AS INTEGER) AS failed_txns, CAST(count(*) AS BIGINT) AS rows_after
      FROM region""")) { (s, dir) =>
      val cat = newCat(s, "c71")
      cat.writeToTable(tbl(s, dir, "region"), "q.r")
      val abandoned = cat.transaction("never sealed")
      cat.writeToTable(tbl(s, dir, "region"), "q.r", WriteMode.Add, txn = Some(abandoned))
      // stage() heartbeats the lease, so idleness accrues from the LAST
      // staged write, not txn start — wait past the timeout before sweeping.
      Thread.sleep(25)
      val (failed, _) = cat.janitor(timeoutMillis = 10)
      import s.implicits._
      Seq((failed, cat.readTable("q.r").count())).toDF("failed_txns", "rows_after")
    },

    // URL datastore ops (SURVEY §2 row 13 — the dc.* surface incl. the ops
    // the reference declares but never implemented): put → copy → move →
    // concat → get, exercised over parquet/csv urls; terminal read is the
    // doubled region table.
    Q("c73_url_ops", Some(
      "SELECT * FROM region UNION ALL SELECT * FROM region")) { (s, dir) =>
      val base = Files.createTempDirectory("graft_c73")
      val r = tbl(s, dir, "region").repartition(1)
      val p1 = s"$base/a.parquet"
      graft.Graft.put(r, p1)
      graft.Graft.copy(s, p1, s"$base/b.parquet")
      graft.Graft.move(s, s"$base/b.parquet", s"$base/c.parquet")
      assert(!graft.Graft.exists(s, s"$base/b.parquet"))
      assert(graft.Graft.exists(s, s"$base/c.parquet"))
      assert(graft.Graft.list(s, base.toString).nonEmpty)
      graft.Graft.get(s, p1).unionByName(graft.Graft.get(s, s"$base/c.parquet"))
    },

    // Snapshot-isolation read-your-writes (SURVEY §2 row 47): a read
    // WITHIN an open txn sees its staged delta; a plain read does not.
    Q("c72_read_your_writes", Some("""
      SELECT 'outside' AS reader, CAST(count(*) AS BIGINT) AS n FROM region
      UNION ALL
      SELECT 'within', CAST(2 * count(*) AS BIGINT) FROM region""")) { (s, dir) =>
      val cat = newCat(s, "c72")
      val r = tbl(s, dir, "region")
      cat.writeToTable(r, "q.r")
      val tx = cat.transaction("open writer")
      cat.writeToTable(r, "q.r", WriteMode.Add, txn = Some(tx))
      import s.implicits._
      Seq(
        ("outside", cat.readTable("q.r").count()),
        ("within", cat.readTable("q.r", ReadOptions(txn = Some(tx))).count())
      ).toDF("reader", "n")
    },

    // Interactive transaction pause/resume (SURVEY §2 row 42): a two-phase
    // ingest staged across a pause — a NEW handle resumes by txn id and
    // both halves land in ONE atomic commit. The terminal state equals the
    // plain table; mid-txn invisibility is ScalaTested (DeltaApiSpec).
    Q("c68_txn_pause_resume", Some("SELECT * FROM nation")) { (s, dir) =>
      val cat = newCat(s, "c68")
      val n = tbl(s, dir, "nation")
      val tx = cat.transaction("paused two-phase ingest")
      cat.writeToTable(n.where(col("n_nationkey") < 12), "q.n", txn = Some(tx))
      tx.pause()
      val resumed = cat.store.resumeTransaction(tx.txnId)
      cat.writeToTable(n.where(col("n_nationkey") >= 12), "q.n", WriteMode.Add,
        txn = Some(resumed))
      resumed.seal()
      cat.readTable("q.n")
    },

    // Table versions + lifecycle states (SURVEY coverage: reference
    // table_version.py:1-513, LifecycleState types.py:122): an UNRELEASED
    // v2 with an evolved schema stages invisibly — default reads serve v1
    // until v2 is promoted ACTIVE, then resolution flips atomically. The
    // row set interleaves reads taken at each stage.
    Q("c74_table_versions", Some("""
      SELECT 'v1_before' AS stage, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_nationkey) AS BIGINT) AS s FROM nation
      UNION ALL
      SELECT 'v2_pinned', CAST(count(*) AS BIGINT),
             CAST(sum(n_regionkey * 10) AS BIGINT)
      FROM nation WHERE n_nationkey < 10
      UNION ALL
      SELECT 'v2_after', CAST(count(*) AS BIGINT),
             CAST(sum(n_regionkey * 10) AS BIGINT)
      FROM nation WHERE n_nationkey < 10
      UNION ALL
      SELECT 'v1_time_travel', CAST(count(*) AS BIGINT),
             CAST(sum(n_nationkey) AS BIGINT) FROM nation""")) { (s, dir) =>
      import s.implicits._
      val cat = newCat(s, "c74")
      val n = tbl(s, dir, "nation")
      cat.writeToTable(n.select("n_nationkey", "n_name"), "q.n")
      def snap(stage: String, df: org.apache.spark.sql.DataFrame, sumCol: String) = {
        val r = df.agg(cnt.as("n"), sum(col(sumCol)).cast("long").as("s")).head()
        (stage, r.getLong(0), r.getLong(1))
      }
      // v2: breaking change (different shape), staged UNRELEASED
      val v2 = cat.createTableVersion("q.n",
        schema = Some(org.apache.spark.sql.types.StructType(Seq(
          FieldMeta.field("n_nationkey", org.apache.spark.sql.types.LongType, nullable = false),
          FieldMeta.field("score", org.apache.spark.sql.types.LongType)))),
        lifecycle = Lifecycle.Unreleased)
      cat.writeToTable(
        n.where(col("n_nationkey") < 10)
          .select(col("n_nationkey"), (col("n_regionkey") * 10).as("score")),
        s"q.n@v$v2", WriteMode.Add)
      val before = snap("v1_before", cat.readTable("q.n"), "n_nationkey")
      val pinned = snap("v2_pinned", cat.readTable(s"q.n@v$v2"), "score")
      val tBefore = System.currentTimeMillis(); Thread.sleep(5)
      cat.alterTableLifecycle(s"q.n@v$v2", Lifecycle.Active)
      val after = snap("v2_after", cat.readTable("q.n"), "score")
      val travel = snap("v1_time_travel",
        cat.readTable("q.n", ReadOptions(asOf = Some(tBefore))), "n_nationkey")
      Seq(before, pinned, after, travel).toDF("stage", "n", "s")
    },

    // Lifecycle-gated writes: a DEPRECATED version refuses writes (its rows
    // stay frozen) while the ACTIVE successor keeps accepting them.
    Q("c75_lifecycle_gates", Some("""
      SELECT 'v1_frozen' AS stage, CAST(count(*) AS BIGINT) AS n
      FROM region
      UNION ALL
      SELECT 'v1_write_refused', CAST(1 AS BIGINT)
      UNION ALL
      SELECT 'v2_grows', CAST(2 * count(*) AS BIGINT) FROM region""")) { (s, dir) =>
      import s.implicits._
      val cat = newCat(s, "c75")
      val r = tbl(s, dir, "region")
      cat.writeToTable(r, "q.r")
      val v2 = cat.createTableVersion("q.r", lifecycle = Lifecycle.Active)
      cat.writeToTable(r, s"q.r@v$v2", WriteMode.Add)
      cat.alterTableLifecycle("q.r@v1", Lifecycle.Deprecated)
      val refused =
        try { cat.writeToTable(r, "q.r@v1", WriteMode.Add); 0L }
        catch { case _: IllegalStateException => 1L }
      cat.writeToTable(r, s"q.r@v$v2", WriteMode.Add) // active version still writable
      Seq(
        ("v1_frozen", cat.readTable("q.r@v1").count()),
        ("v1_write_refused", refused),
        ("v2_grows", cat.readTable("q.r").count())
      ).toDF("stage", "n")
    },

    // Hudi foreign DELETE_BLOCK: a real Hudi writer's delete emits a
    // DELETE_BLOCK log block (avro HoodieDeleteRecordList, content v3 —
    // tech-specs "Log File Format"), not soft-delete data rows. The
    // snapshot read decodes the key list into tombstones feeding the same
    // latest-wins merge as data blocks.
    Q("c76_hudi_delete_block", Some("""
      SELECT p_partkey, p_name,
             CASE WHEN p_partkey % 5 = 0 THEN p_retailprice * 2 ELSE p_retailprice END AS p_retailprice
      FROM part WHERE p_partkey % 7 <> 0""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c76").resolve("tbl").toString
      val p = tbl(s, dir, "part").select("p_partkey", "p_name", "p_retailprice")
      graft.interop.Hudi.write(p, t,
        tableType = "MERGE_ON_READ", recordKeyFields = Seq("p_partkey"))
      graft.interop.Hudi.upsertLog(
        p.where(col("p_partkey") % 5 === 0)
          .withColumn("p_retailprice", col("p_retailprice") * 2), t)
      graft.interop.Hudi.deleteByKeyBlock(
        p.where(col("p_partkey") % 7 === 0).select("p_partkey"), t)
      graft.interop.Hudi.read(s, t)
    },

    // Distributed manifest planning (the driver-metadata ceiling lift):
    // with the size gate forced to 1 byte, scan planning skeleton-parses
    // the delta metafiles and prunes entries in a Spark job instead of on
    // the driver — and must select the same files / return the same rows.
    Q("c77_distributed_manifest_planning", Some("""
      SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM orders WHERE o_orderkey >= 100000 AND o_orderkey < 200000""")) { (s, dir) =>
      import s.implicits._
      val cat = newCat(s, "c77")
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("o_orderkey"), col("o_totalprice"))
      cat.createTable("q.o", org.apache.spark.sql.types.StructType(Seq(
        FieldMeta.field("o_orderkey", org.apache.spark.sql.types.LongType, nullable = false),
        FieldMeta.field("o_totalprice", org.apache.spark.sql.types.DoubleType))),
        properties = Map("write.max_records_per_file" -> "2000",
          "compaction.auto" -> "false"))
      cat.writeToTable(o.orderBy("o_orderkey").coalesce(1), "q.o")
      val filter = col("o_orderkey") >= 100000L && col("o_orderkey") < 200000L
      val driverFiles = cat.readTable("q.o", ReadOptions(rowFilter = Some(filter)))
        .inputFiles.sorted.toSeq
      s.conf.set(graft.catalog.ManifestPlanner.GateConfKey, "1")
      try {
        val gated = cat.readTable("q.o", ReadOptions(rowFilter = Some(filter)))
        require(gated.inputFiles.sorted.toSeq == driverFiles,
          "gated planning must select exactly the driver path's files")
        require(driverFiles.size < cat.readTable("q.o").inputFiles.length,
          "stats skip must have pruned files for this range")
        gated.agg(dsum(col("o_totalprice")).as("s"), cnt.as("n"))
      } finally s.conf.unset(graft.catalog.ManifestPlanner.GateConfKey)
    },

    // Object-store commit protocol: the same catalog semantics through the
    // conditional-put CommitStore (no rename anywhere on the decisive
    // transitions) — write, upsert, janitor sweep, read back.
    Q("c78_conditional_put_commits", Some("""
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s_suppkey) AS BIGINT) AS s
      FROM supplier WHERE s_suppkey % 10 <> 3""")) { (s, dir) =>
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_c78").toString
      val cat = new GraftCatalog(s, root,
        commitStore = new graft.txn.ConditionalPutCommitStore)
      val sup = tbl(s, dir, "supplier")
        .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"))
      cat.createTable("q.s", org.apache.spark.sql.types.StructType(Seq(
        FieldMeta.field("s_suppkey", org.apache.spark.sql.types.LongType,
          nullable = false, mergeKey = true),
        FieldMeta.field("s_name", org.apache.spark.sql.types.StringType))))
      cat.writeToTable(sup, "q.s", WriteMode.Merge)
      cat.writeToTable(sup.where(col("s_suppkey") % 10 === 3)
        .select("s_suppkey"), "q.s", WriteMode.Delete)
      val abandoned = cat.transaction("never sealed")
      cat.writeToTable(sup.limit(1), "q.s", WriteMode.Add, txn = Some(abandoned))
      Thread.sleep(25)
      cat.janitor(timeoutMillis = 10) // sweeps the abandoned txn via claim-moves
      cat.readTable("q.s").agg(cnt.as("n"), sum("s_suppkey").cast("long").as("s"))
    },

    // Declared sort scheme on an APPEND-ONLY table: compaction must
    // materialize it (a manifest fold would leave it forever inert and
    // range skipping degraded). Order is not observable through the
    // driver's sorted-row compare, so the builder asserts the physical
    // contract — every post-compact file internally sorted, the sorted
    // base copied by reference on recompact — and the oracle checks the
    // row set (same pattern as c77's plan asserts).
    Q("c79_sorted_compaction", Some("""
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 7 < 2""")) { (s, dir) =>
      val cat = newCat(s, "c79")
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("o_orderkey"), col("o_totalprice"))
        .where(col("o_orderkey") % 7 < 2)
      cat.createTable("q.o", org.apache.spark.sql.types.StructType(Seq(
        FieldMeta.field("o_orderkey", org.apache.spark.sql.types.LongType, nullable = false),
        FieldMeta.field("o_totalprice", org.apache.spark.sql.types.DoubleType))),
        sortScheme = SortScheme(Seq(SortKey("o_orderkey"))),
        properties = Map("compaction.auto" -> "false",
          "compaction.max_records_per_file" -> "2000"))
      // two appends, both deliberately unsorted
      cat.writeToTable(o.where(col("o_orderkey") % 7 === 0)
        .orderBy(col("o_orderkey").desc), "q.o", WriteMode.Add)
      cat.writeToTable(o.where(col("o_orderkey") % 7 === 1)
        .orderBy(col("o_orderkey").desc), "q.o", WriteMode.Add)
      cat.compact("q.o")
      val perFile = cat.readTable("q.o", ReadOptions(withFilePath = true))
        .select(col("_file_path"), col("o_orderkey")).collect()
        .groupBy(_.getString(0)).values
      require(perFile.size > 1, "slicing must produce several files")
      perFile.foreach { rows =>
        val ks = rows.map(_.getLong(1)).toSeq
        require(ks == ks.sorted, "compacted file not sorted by the declared scheme")
      }
      val d1 = cat.deltaLog("q.o").last
      require(d1.properties.get("sorted").contains("o_orderkey:asc:nl:identity"))
      // recompact after a tail append: the sorted base rides by reference
      cat.writeToTable(o.limit(50), "q.o", WriteMode.Add)
      cat.compact("q.o")
      val d2 = cat.deltaLog("q.o").last
      require(d2.properties("copied_by_reference").toInt == d1.entries.size,
        "sorted base must be copied by reference on recompact")
      cat.readTable("q.o").select("o_orderkey", "o_totalprice").distinct()
    },

    // Iceberg non-identity partition transforms (reference
    // storage/model/transform.py:32-41 bucketing strategies, :251-304
    // truncate/time families; Iceberg spec Appendix B murmur3 hashing):
    // Graft WRITES a bucket[4](user_id) + day(ts) partitioned Iceberg
    // table and the selective read derives partition predicates from the
    // data predicates (key IN → bucket ids; ts range → inclusive day
    // range), pruning manifest entries before any data file is opened.
    // Pruning is not observable through the row compare, so the builder
    // asserts the physical contract (same pattern as c77/c79).
    Q("c80_iceberg_transform_pruning", Some("""
      SELECT event_id, ts, user_id, event_type FROM events
      WHERE user_id IN (3, 7) AND ts >= TIMESTAMP '2024-01-10 00:00:00'""")) { (s, dir) =>
      val t = Files.createTempDirectory("graft_c80").resolve("tbl").toString
      val ev = tbl(s, dir, "events").select("event_id", "ts", "user_id", "event_type")
      graft.interop.Iceberg.createTable(t, ev.schema,
        partitionSpec = Seq("user_id" -> "bucket[4]", "ts" -> "day"))
      graft.interop.Iceberg.append(ev, t)
      val filter = col("user_id").isin(3L, 7L) &&
        col("ts") >= to_timestamp(lit("2024-01-10 00:00:00"))
      // physical claim: transform-derived predicates prune manifest entries
      val meta = graft.interop.Iceberg.loadMeta(t)
      val entries = graft.interop.Iceberg.fileEntries(s, meta, meta.snapshots.head)
      val preds = graft.interop.IcebergPartPrune.derive(
        graft.catalog.StatsSkip.translate(filter), meta.specFields, meta.schema)
      require(preds.nonEmpty, "bucket+day predicates must derive from the data filter")
      val kept = entries.count(e => graft.interop.IcebergPartPrune.keep(preds, e.partition))
      require(kept > 0 && kept < entries.size,
        s"partition pruning must drop files ($kept of ${entries.size} kept)")
      val buckets = Set(3L, 7L).map(k =>
        graft.interop.IcebergHash.bucketLong(k, 4).toString)
      require(entries.filter(e =>
        graft.interop.IcebergPartPrune.keep(preds, e.partition))
        .forall(e => buckets.contains(e.partition("user_id_bucket"))),
        "a kept file outside the derived buckets")
      graft.interop.Iceberg.read(s, t, dataFilter = Some(filter))
    },

    // Rivulet-style zipper read (reference experimental rivulet,
    // reader/dataset_reader.py:41-65): meta and body column GROUPS written
    // as independent partial upserts, resolved per group, zipped by merge
    // key with FULL OUTER semantics — keys written in only one group
    // surface with the other group's fields null. The builder asserts the
    // physical contract (a body-group read never scans meta-only deltas);
    // the oracle recomputes the field-wise last-writer terminal state.
    Q("c81_zipper_read", Some("""
      WITH upd AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'xx' ELSE lang END AS lang,
               source,
               CASE WHEN doc_id % 4 = 0 THEN 'B:' || text ELSE text END AS text
        FROM documents WHERE doc_id % 7 <> 0)
      SELECT * FROM upd
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, 'new' AS lang,
             CAST(NULL AS VARCHAR) AS source, CAST(NULL AS VARCHAR) AS text
      FROM documents""")) { (s, dir) =>
      val cat = newCat(s, "c81")
      val d = tbl(s, dir, "documents").select("doc_id", "lang", "source", "text")
      cat.createTable("q.z", StructType(Seq(
        FieldMeta.field("doc_id", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("lang", StringType),
        FieldMeta.field("source", StringType),
        FieldMeta.field("text", StringType))), properties = MoR)
      cat.setSubschema("q.z", "meta", Seq("doc_id", "lang", "source"))
      cat.setSubschema("q.z", "body", Seq("doc_id", "text"))
      cat.writeToTable(d, "q.z", WriteMode.Merge) // base writes both groups
      cat.writeToTable(d.where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), lit("xx").as("lang")), "q.z", WriteMode.Merge)
      cat.writeToTable(d.where(col("doc_id") % 4 === 0)
        .select(col("doc_id"), concat(lit("B:"), col("text")).as("text")),
        "q.z", WriteMode.Merge)
      cat.writeToTable(d.where(col("doc_id") % 7 === 0).select("doc_id"),
        "q.z", WriteMode.Delete)
      // meta-ONLY keys: the zip must surface them with null body fields
      cat.writeToTable(d.select((col("doc_id") + 100000L).as("doc_id"),
        lit("new").as("lang")), "q.z", WriteMode.Merge)
      // physical claim: a body-group read plans around meta-only deltas
      def norm(p: String) = p.replaceFirst("^file:/+", "/")
      val metaOnly = cat.deltaLog("q.z")
        .filter(dm => dm.properties.get("written_columns")
          .exists(w => !w.split(",").contains("text") && dm.deltaType != "DELETE"))
        .flatMap(_.entries.map(e => norm(e.path))).toSet
      require(metaOnly.nonEmpty, "expected meta-only deltas")
      val bodyFiles = cat.readZipped("q.z", Seq("body")).inputFiles.map(norm).toSet
      require(bodyFiles.nonEmpty && metaOnly.forall(p => !bodyFiles.contains(p)),
        "body-group zip must not scan meta-only delta files")
      cat.readZipped("q.z")
    },

    // Iceberg-STRATEGY murmur3 bucketing on a GRAFT partition scheme
    // (reference BucketingStrategy.ICEBERG, transform.py:32-41; the DEFAULT
    // sha1 strategy is c55): bucket assignment is the spec hash an Iceberg
    // engine reproduces, and a partitionValues read prunes to the one
    // bucket directory (builder-asserted — DuckDB has no murmur3, so the
    // oracle checks the ROW semantics, the require the physical pruning).
    Q("c82_bucket_iceberg_scheme", Some("""
      SELECT event_id, ts, user_id, event_type FROM events WHERE user_id = 3""")) { (s, dir) =>
      val cat = newCat(s, "c82")
      val ev = tbl(s, dir, "events").select("event_id", "ts", "user_id", "event_type")
      val pk = PartitionKey("user_id", Transform.BucketIceberg(4))
      cat.createTable("q.e", ev.schema, partitionScheme = PartitionScheme(Seq(pk)))
      cat.writeToTable(ev, "q.e", WriteMode.Add)
      val bucket = graft.interop.IcebergHash.bucketLong(3L, 4)
      val pruned = cat.readTable("q.e", ReadOptions(
        partitionValues = Some(Map("user_id" -> bucket.toString)),
        rowFilter = Some(col("user_id") === 3L)))
      val seg = s"${pk.partitionColumnName}=$bucket"
      val files = pruned.inputFiles
      require(files.nonEmpty && files.forall(_.contains(seg)),
        s"pruned read must plan only $seg files")
      require(files.length < cat.readTable("q.e").inputFiles.length,
        "bucket pruning must drop files")
      pruned
    },

    // Partition-scheme UPDATE via alter_table — parity-plus: the reference
    // raises NotImplementedError here (impl.py:1778-1780). Old files keep
    // their layout (a missing segment never prunes), new writes land under
    // the new scheme, and the full read stays exact across the mixed
    // layout. The builder asserts the physical halves.
    Q("c83_alter_partition_scheme", Some("""
      SELECT doc_id, lang, source, text FROM documents""")) { (s, dir) =>
      val cat = newCat(s, "c83")
      val d = tbl(s, dir, "documents").select("doc_id", "lang", "source", "text")
      cat.createTable("q.d", d.schema,
        partitionScheme = PartitionScheme(Seq(PartitionKey("lang", Transform.Identity))))
      cat.writeToTable(d.where(col("doc_id") % 2 === 0), "q.d", WriteMode.Add)
      cat.alterTable("q.d", partitionScheme =
        Some(PartitionScheme(Seq(PartitionKey("source", Transform.Identity)))))
      cat.writeToTable(d.where(col("doc_id") % 2 === 1), "q.d", WriteMode.Add)
      val log = cat.deltaLog("q.d")
      require(log.head.entries.forall(_.path.contains("_g_p_lang_identity=")),
        "pre-alter files must keep the old layout")
      require(log.last.entries.forall(_.path.contains("_g_p_source_identity=")),
        "post-alter files must carry the new layout")
      cat.readTable("q.d")
    },

    // Zipper read with MIXED filters (round-10): the merge-KEY conjunct
    // pushes into every group's plan (manifest prune on a key-truncate
    // partitioned layout + pre-join row filter — builder-asserted fewer
    // planned files), the cross-group conjunct evaluates post-zip. The
    // oracle recomputes the filtered field-wise terminal state.
    Q("c84_zipper_filtered", Some("""
      WITH upd AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'xx' ELSE lang END AS lang,
               source,
               CASE WHEN doc_id % 4 = 0 THEN 'B:' || text ELSE text END AS text
        FROM documents WHERE doc_id % 7 <> 0)
      SELECT * FROM upd WHERE doc_id < 300 AND lang IS NOT NULL""")) { (s, dir) =>
      val cat = newCat(s, "c84")
      val d = tbl(s, dir, "documents").select("doc_id", "lang", "source", "text")
      cat.createTable("q.zf", StructType(Seq(
        FieldMeta.field("doc_id", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("lang", StringType),
        FieldMeta.field("source", StringType),
        FieldMeta.field("text", StringType))),
        partitionScheme = PartitionScheme(Seq(
          PartitionKey("doc_id", Transform.Truncate(128)))),
        properties = MoR)
      cat.setSubschema("q.zf", "meta", Seq("doc_id", "lang", "source"))
      cat.setSubschema("q.zf", "body", Seq("doc_id", "text"))
      cat.writeToTable(d, "q.zf", WriteMode.Merge)
      cat.writeToTable(d.where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), lit("xx").as("lang")), "q.zf", WriteMode.Merge)
      cat.writeToTable(d.where(col("doc_id") % 4 === 0)
        .select(col("doc_id"), concat(lit("B:"), col("text")).as("text")),
        "q.zf", WriteMode.Merge)
      cat.writeToTable(d.where(col("doc_id") % 7 === 0).select("doc_id"),
        "q.zf", WriteMode.Delete)
      val opts = ReadOptions(rowFilter =
        Some(col("doc_id") < 300L && col("lang").isNotNull))
      val filtered = cat.readZipped("q.zf", opts = opts)
      // physical claim: the pushed key conjunct prunes each group's plan
      require(filtered.inputFiles.length < cat.readZipped("q.zf").inputFiles.length,
        "key-filtered zip must plan fewer files than the unfiltered zip")
      filtered
    },

    // The SQL surface of the zipper (round-10): graft_read_zipped TVF with
    // the pushed-filter argument — SQL users reach the same per-group
    // merge-on-read plan, same oracle as the Scala API leg.
    Q("c85_zipper_sql", Some("""
      WITH upd AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'xx' ELSE lang END AS lang,
               source,
               CASE WHEN doc_id % 4 = 0 THEN 'B:' || text ELSE text END AS text
        FROM documents WHERE doc_id % 7 <> 0)
      SELECT doc_id, lang, source FROM upd WHERE doc_id < 300""")) { (s, dir) =>
      val root = Files.createTempDirectory("graft_c85").toString
      val cat = new GraftCatalog(s, root)
      val d = tbl(s, dir, "documents").select("doc_id", "lang", "source", "text")
      cat.createTable("q.zs", StructType(Seq(
        FieldMeta.field("doc_id", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("lang", StringType),
        FieldMeta.field("source", StringType),
        FieldMeta.field("text", StringType))), properties = MoR)
      cat.setSubschema("q.zs", "meta", Seq("doc_id", "lang", "source"))
      cat.setSubschema("q.zs", "body", Seq("doc_id", "text"))
      cat.writeToTable(d, "q.zs", WriteMode.Merge)
      cat.writeToTable(d.where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), lit("xx").as("lang")), "q.zs", WriteMode.Merge)
      cat.writeToTable(d.where(col("doc_id") % 7 === 0).select("doc_id"),
        "q.zs", WriteMode.Delete)
      graft.Graft.registerFunctions(s)
      s.sql(s"SELECT * FROM graft_read_zipped('$root', 'q.zs', 'meta', 'doc_id < 300')")
    },

    // SQL merge-on-read via the graft_read TVF (round-10): the DSv2
    // relation refuses unresolved-merge tables ("compact() first"); this
    // surface routes SQL readers through readTable's LSM fold, filter
    // pushed into manifest pruning. Oracle recomputes last-writer-wins
    // over the upsert + delete interleaving.
    Q("c86_sql_mor_read", Some("""
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 3 = 0 THEN 'upd' ELSE n_name END AS n_name,
             n_regionkey
      FROM nation WHERE n_nationkey % 5 <> 0 AND n_regionkey < 3""")) { (s, dir) =>
      val root = Files.createTempDirectory("graft_c86").toString
      val cat = new GraftCatalog(s, root)
      val n = tbl(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      cat.createTable("q.m", StructType(Seq(
        FieldMeta.field("n_nationkey", IntegerType, nullable = false, mergeKey = true),
        FieldMeta.field("n_name", StringType),
        FieldMeta.field("n_regionkey", IntegerType))), properties = MoR)
      cat.writeToTable(n, "q.m", WriteMode.Merge)
      cat.writeToTable(n.where(col("n_nationkey") % 3 === 0)
        .select(col("n_nationkey"), lit("upd").as("n_name"), col("n_regionkey")),
        "q.m", WriteMode.Merge)
      cat.writeToTable(n.where(col("n_nationkey") % 5 === 0).select("n_nationkey"),
        "q.m", WriteMode.Delete)
      graft.Graft.registerFunctions(s)
      s.sql(s"SELECT * FROM graft_read('$root', 'q.m', 'n_regionkey < 3')")
    },

    // Time travel through the ZIPPED surfaces (round-11): the
    // graft_read_zipped TVF's 5th argument and the DataFrameReader's
    // option("zip") + asOf must both serve the pre-trickle zip at a
    // committed txn — the oracle is the bulk-load state, so any leakage
    // of the later per-group trickles or the delete hash-mismatches.
    // Builder asserts reader ≡ TVF row-for-row.
    Q("c87_zipper_asof", Some("""
      SELECT doc_id, lang, source FROM documents""")) { (s, dir) =>
      val root = Files.createTempDirectory("graft_c87").toString
      val cat = new GraftCatalog(s, root)
      val d = tbl(s, dir, "documents").select("doc_id", "lang", "source", "text")
      cat.createTable("q.za", StructType(Seq(
        FieldMeta.field("doc_id", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("lang", StringType),
        FieldMeta.field("source", StringType),
        FieldMeta.field("text", StringType))), properties = MoR)
      cat.setSubschema("q.za", "meta", Seq("doc_id", "lang", "source"))
      cat.setSubschema("q.za", "body", Seq("doc_id", "text"))
      cat.writeToTable(d, "q.za", WriteMode.Merge)
      val t1 = cat.store.history().head.endTimeMillis
      cat.writeToTable(d.where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), lit("xx").as("lang")), "q.za", WriteMode.Merge)
      cat.writeToTable(d.where(col("doc_id") % 7 === 0).select("doc_id"),
        "q.za", WriteMode.Delete)
      graft.Graft.registerFunctions(s)
      val viaTvf = s.sql(
        s"SELECT * FROM graft_read_zipped('$root', 'q.za', 'meta', '', $t1)")
      val viaReader = s.read.format("graft").option("root", root)
        .option("table", "q.za").option("zip", "meta").option("asOf", t1.toString)
        .load()
      require(viaReader.orderBy("doc_id").collect().toSeq ==
        viaTvf.orderBy("doc_id").collect().toSeq,
        "DataFrameReader zip+asOf must equal the TVF asOf read")
      viaTvf
    },

    // Advice→action recluster (round-13): a deliberately undersized
    // 2-bucket layout (suggestBuckets' floor of 8 > 2×2 ⇒ the advisor
    // reports undersized_layout) is grown past the compaction trigger by
    // a trickle write; write-triggered auto-compaction consults the
    // advisor and recompacts at the suggested count. Structural effects
    // (new recorded bucket count, zero copy-by-reference survivors from
    // the old layout) are required in-query; the terminal ROWS are the
    // oracle check — the recluster must be invisible to readers.
    Q("c88_recluster_auto", Some("""
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 100 = 0 THEN 'moved' ELSE c_mktsegment END AS c_mktsegment
      FROM customer""")) { (s, dir) =>
      val cat = newCat(s, "c88")
      val c = tbl(s, dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
      cat.createTable("q.rc", StructType(Seq(
        FieldMeta.field("c_custkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("c_name", StringType),
        FieldMeta.field("c_mktsegment", StringType))),
        properties = MoR ++ Map("compaction.num_buckets" -> "2",
          "compaction.trigger.deltas" -> "1000"))
      cat.writeToTable(c, "q.rc", WriteMode.Merge)
      cat.compact("q.rc")
      def base = graft.catalog.MergeRead.activeDeltas(cat.deltaLog("q.rc"))._1
        .getOrElse(sys.error("q.rc must have a compacted base"))
      val advice = cat.reclusterAdvice("q.rc")
        .getOrElse(sys.error("bucketed base must yield advice"))
      require(advice.numBuckets == 2 && advice.reasons.contains("undersized_layout"),
        s"fixture must present an undersized layout: $advice")
      val oldPaths = base.entries.map(_.path).toSet
      cat.alterTable("q.rc", setProperties = Map("compaction.trigger.deltas" -> "1"))
      cat.writeToTable(c.where(col("c_custkey") % 100 === 0)
        .withColumn("c_mktsegment", lit("moved")), "q.rc", WriteMode.Merge)
      require(base.properties("num_buckets").toInt == advice.suggestedBuckets,
        "auto-compaction must have re-bucketed at the advised count")
      require(!base.entries.exists(e => oldPaths.contains(e.path)),
        "a bucket-count change must invalidate copy-by-reference")
      cat.readTable("q.rc")
    },

    // The >maxDeltas lineage FALLBACK (per-row path-derived positions +
    // the broadcast lineage join — the thousand-delta-backlog plan shape)
    // under the oracle gate: the same upsert+delete LSM state as c04,
    // planned with the literal threshold forced to 0 so every scan takes
    // the fallback. Conf is planning-time: set around readTable, restored
    // before returning (the returned plan keeps the fallback shape).
    Q("c89_lineage_fallback", Some("""
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0""")) { (s, dir) =>
      val cat = newCat(s, "c89")
      cat.createTable("q.of", StructType(Seq(
        FieldMeta.field("o_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("o_custkey", LongType),
        FieldMeta.field("o_orderstatus", StringType),
        FieldMeta.field("o_totalprice", DoubleType))), properties = MoR)
      val base = tbl(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      cat.writeToTable(base, "q.of", WriteMode.Merge)
      cat.writeToTable(
        base.where(col("o_orderkey") % 10 === 0)
          .withColumn("o_orderstatus", lit("X"))
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        "q.of", WriteMode.Merge)
      cat.writeToTable(
        base.select("o_orderkey").where(col("o_orderkey") % 7 === 0),
        "q.of", WriteMode.Delete)
      s.conf.set(graft.catalog.MergeRead.LineageLiteralConfKey, "0")
      try cat.readTable("q.of")
      finally s.conf.unset(graft.catalog.MergeRead.LineageLiteralConfKey)
    },

    // Mixed ADD/CHRONO/MERGE interleaving on one keyed table (c90,
    // round-14; deviation record corrected round-15): the reference's
    // catalog layer REFUSES APPEND (catalog/main/impl.py:564-568), ADD
    // (:587-592) and CHRONO (:612-617) on tables with merge keys — only
    // MERGE/DELETE write keyed tables there, so its reserved
    // stream-position ranges (storage/main/impl.py:2788-2814: APPEND
    // partition counters < CHRONO epoch-ms ≤ UINT48_MAX < ADD UUID63,
    // ADDs ordered RANDOMLY among themselves via uuid4) never arbitrate a
    // cross-type merge. The DOCUMENTED DEVIATION this oracle pins is
    // therefore that this build ACCEPTS Add/Chrono on keyed tables at
    // all, ranking every delta type on the ONE metastore rev total order:
    // the merge winner for a key is its most recent COMMIT regardless of
    // delta type — a deterministic contract for writes the reference
    // rejects outright. The oracle freezes it:
    // U(rev4) > D(rev3 ADD) > C(rev2 CHRONO) > A(rev1 ADD). APPEND stays
    // absent by design: both builds forbid it on keyed tables.
    // SURVEY §7.4 #4 documents the deviation + this proof.
    Q("c90_mixed_delta_ordering", Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'U'
                  WHEN o_orderkey % 5 = 0 THEN 'D'
                  WHEN o_orderkey % 3 = 0 THEN 'C'
                  ELSE 'A' END AS v
      FROM orders""")) { (s, dir) =>
      val cat = newCat(s, "c90")
      cat.createTable("q.mx", StructType(Seq(
        FieldMeta.field("o_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", StringType))), properties = MoR)
      val keys = tbl(s, dir, "orders").select("o_orderkey")
      cat.writeToTable(keys.withColumn("v", lit("A")), "q.mx", WriteMode.Add)
      cat.writeToTable(keys.where(col("o_orderkey") % 3 === 0)
        .withColumn("v", lit("C")), "q.mx", WriteMode.Chrono)
      cat.writeToTable(keys.where(col("o_orderkey") % 5 === 0)
        .withColumn("v", lit("D")), "q.mx", WriteMode.Add)
      cat.writeToTable(keys.where(col("o_orderkey") % 7 === 0)
        .withColumn("v", lit("U")), "q.mx", WriteMode.Merge)
      cat.readTable("q.mx")
    },

    // Streaming exactly-once terminal state (c91, round-14): a graft→graft
    // AvailableNow pipeline run as TWO separate activations over one
    // checkpoint — the second must resume from the committed offsets (no
    // replay of the first run's deltas, no loss of the new one), so the
    // sink's terminal state is the source content EXACTLY once.
    // Deterministic: micro-batch boundaries are delta boundaries, no
    // wall-clock anywhere. (GraftStreamSource/GraftStreamSink; the
    // ScalaTest-only fixture this promotes to a DuckDB-gated row.)
    Q("c91_streaming_exactly_once", Some(
      "SELECT n_nationkey, n_name FROM nation")) { (s, dir) =>
      val root = Files.createTempDirectory("graft_c91").toString
      val cat = new GraftCatalog(s, root)
      val n = tbl(s, dir, "nation").select("n_nationkey", "n_name")
      cat.createTable("q.src", n.schema)
      cat.writeToTable(n.where(col("n_nationkey") < 10), "q.src", WriteMode.Append)
      cat.writeToTable(n.where(col("n_nationkey") >= 10 && col("n_nationkey") < 20),
        "q.src", WriteMode.Append)
      val ck = Files.createTempDirectory("graft_c91_ck").toString
      def runOnce(): Unit = {
        val q = s.readStream.format("graft")
          .option("root", root).option("table", "q.src").load()
          .writeStream.format("graft")
          .option("root", root).option("table", "q.sout")
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runOnce()
      cat.writeToTable(n.where(col("n_nationkey") >= 20), "q.src", WriteMode.Append)
      runOnce()
      cat.readTable("q.sout")
    },

    // Hot-bucket carve-out terminal state (c92, round-14): a power-law
    // merge key (id = -1 live in 400 day partitions — all its rows in ONE
    // bucket at any bucket count, because the bucket id hashes the key
    // alone) plus a uniform cold population, upserted and deleted on both
    // sides of the split, read with the carve-out ENGAGED (thresholds at
    // test scale; the regime is asserted, so a detection/eligibility
    // regression fails loudly instead of silently passing via the dense
    // plan). The DuckDB oracle reproduces the partition-scoped terminal
    // state; the carve-out must not change a single row of it.
    Q("c92_hot_bucket_carveout", Some("""
      WITH days AS (SELECT DISTINCT o_orderkey % 400 AS day FROM orders),
           cold AS (SELECT o_orderkey AS id, o_orderkey % 400 AS day
                    FROM orders WHERE o_orderkey % 10 = 0)
      SELECT CAST(-1 AS BIGINT) AS id, day,
             CASE WHEN day % 2 = 0 THEN 'H' ELSE 'h' END AS v
      FROM days WHERE day < 380
      UNION ALL
      SELECT id, day, CASE WHEN id % 90 = 0 THEN 'C' ELSE 'c' END AS v
      FROM cold WHERE id % 97 <> 0""")) { (s, dir) =>
      import graft.catalog.MergeRead
      val cat = newCat(s, "c92")
      cat.createTable("q.hb", StructType(Seq(
        FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("day", LongType, nullable = false),
        FieldMeta.field("v", StringType))),
        partitionScheme = PartitionScheme(Seq(PartitionKey("day", Transform.Identity))),
        properties = MoR ++ Map("compaction.num_buckets" -> "4",
          // the partitioned write's file fan-out must not trip the
          // auto-compaction file trigger (it would fold the pending deltas
          // and read the base scan-only — the bench A/B hit exactly this)
          "compaction.trigger.files" -> "1000000"))
      val o = tbl(s, dir, "orders").select("o_orderkey")
      val hot = o.select(lit(-1L).as("id"), (col("o_orderkey") % 400).as("day"),
        lit("h").as("v")).distinct()
      val cold = o.where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("id"), (col("o_orderkey") % 400).as("day"),
          lit("c").as("v"))
      cat.writeToTable(hot.unionByName(cold), "q.hb", WriteMode.Merge)
      cat.compact("q.hb")
      // pending past the sparse 8x band, inside the partitioned band on
      // the COLD base: hot-key upserts on even days, cold upserts, and
      // deletes landing on both sides of the split
      cat.writeToTable(hot.where(col("day") % 2 === 0).withColumn("v", lit("H")),
        "q.hb", WriteMode.Merge)
      cat.writeToTable(cold.where(col("id") % 90 === 0).withColumn("v", lit("C")),
        "q.hb", WriteMode.Merge)
      cat.writeToTable(
        hot.where(col("day") >= 380).select("id", "day")
          .unionByName(cold.where(col("id") % 97 === 0).select("id", "day")),
        "q.hb", WriteMode.Delete)
      s.conf.set(MergeRead.HotBucketFactorKey, "1.2")
      s.conf.set(MergeRead.HotBucketMinRowsKey, "100")
      try {
        MergeRead.lastSplitRegime = ""
        val df = cat.readTable("q.hb")
        require(MergeRead.lastSplitRegime == "partitioned_hotsplit",
          s"c92 must engage the carve-out, planned '${MergeRead.lastSplitRegime}'")
        df
      } finally {
        s.conf.unset(MergeRead.HotBucketFactorKey)
        s.conf.unset(MergeRead.HotBucketMinRowsKey)
      }
    },

    // Hot-bucket carve-out through COMPACTION (c93, round-15): c92 pins the
    // READ regime; this pins the rewrite half — Compactor.compactOnce
    // shares MergeRead.partitionedWithCarveout, so the same power-law
    // fixture compacted with carve-out thresholds must (a) actually take
    // the partitioned_hotsplit regime during the rewrite (asserted, so an
    // eligibility/detection regression in the compaction path fails loudly
    // instead of silently passing via the dense resolve) and (b) leave a
    // base whose content hash-matches the oracle's terminal state. The
    // post-compaction read is a plain base scan — every row it returns was
    // materialized BY the carve-out plan.
    Q("c93_hot_bucket_compaction", Some("""
      WITH days AS (SELECT DISTINCT o_orderkey % 400 AS day FROM orders),
           cold AS (SELECT o_orderkey AS id, o_orderkey % 400 AS day
                    FROM orders WHERE o_orderkey % 10 = 0)
      SELECT CAST(-1 AS BIGINT) AS id, day,
             CASE WHEN day % 2 = 0 THEN 'H' ELSE 'h' END AS v
      FROM days WHERE day < 380
      UNION ALL
      SELECT id, day, CASE WHEN id % 90 = 0 THEN 'C' ELSE 'c' END AS v
      FROM cold WHERE id % 97 <> 0""")) { (s, dir) =>
      import graft.catalog.MergeRead
      val cat = newCat(s, "c93")
      cat.createTable("q.hc", StructType(Seq(
        FieldMeta.field("id", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("day", LongType, nullable = false),
        FieldMeta.field("v", StringType))),
        partitionScheme = PartitionScheme(Seq(PartitionKey("day", Transform.Identity))),
        properties = MoR ++ Map("compaction.num_buckets" -> "4",
          "compaction.trigger.files" -> "1000000"))
      val o = tbl(s, dir, "orders").select("o_orderkey")
      val hot = o.select(lit(-1L).as("id"), (col("o_orderkey") % 400).as("day"),
        lit("h").as("v")).distinct()
      val cold = o.where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("id"), (col("o_orderkey") % 400).as("day"),
          lit("c").as("v"))
      cat.writeToTable(hot.unionByName(cold), "q.hc", WriteMode.Merge)
      cat.compact("q.hc")
      cat.writeToTable(hot.where(col("day") % 2 === 0).withColumn("v", lit("H")),
        "q.hc", WriteMode.Merge)
      cat.writeToTable(cold.where(col("id") % 90 === 0).withColumn("v", lit("C")),
        "q.hc", WriteMode.Merge)
      cat.writeToTable(
        hot.where(col("day") >= 380).select("id", "day")
          .unionByName(cold.where(col("id") % 97 === 0).select("id", "day")),
        "q.hc", WriteMode.Delete)
      s.conf.set(MergeRead.HotBucketFactorKey, "1.2")
      s.conf.set(MergeRead.HotBucketMinRowsKey, "100")
      try {
        MergeRead.lastSplitRegime = ""
        cat.compact("q.hc")
        require(MergeRead.lastSplitRegime == "partitioned_hotsplit",
          s"c93 compaction must engage the carve-out, planned '${MergeRead.lastSplitRegime}'")
      } finally {
        s.conf.unset(MergeRead.HotBucketFactorKey)
        s.conf.unset(MergeRead.HotBucketMinRowsKey)
      }
      cat.readTable("q.hc")
    },

    // History trim (c94, round-15): a long-lived table's delta log is
    // bounded by trimHistory — folded pre-watermark metafiles deleted
    // once the base outlives the retention window, horizon committed
    // BEFORE any delete. The read after the trim is served by exactly the
    // surviving base + pending metafiles and must hash-match the oracle's
    // terminal state; the closure also requires the trim actually removed
    // the folded log entries and that pre-horizon time travel fails
    // loudly (a silent partial history is the failure mode this guards).
    Q("c94_history_trim", Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 3
                  WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS v
      FROM orders WHERE o_orderkey % 7 <> 0""")) { (s, dir) =>
      val cat = newCat(s, "c94")
      cat.createTable("q.ht", StructType(Seq(
        FieldMeta.field("o_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", DoubleType))), properties = MoR)
      val base = tbl(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").as("v"))
      val preTrim = System.currentTimeMillis()
      cat.writeToTable(base, "q.ht", WriteMode.Merge)
      cat.writeToTable(base.where(col("o_orderkey") % 3 === 0)
        .withColumn("v", col("v") * 2), "q.ht", WriteMode.Merge)
      cat.compact("q.ht")
      // post-compaction pending survives the trim
      cat.writeToTable(base.where(col("o_orderkey") % 5 === 0)
        .withColumn("v", col("v") * 3), "q.ht", WriteMode.Merge)
      cat.writeToTable(base.select("o_orderkey").where(col("o_orderkey") % 7 === 0),
        "q.ht", WriteMode.Delete)
      Thread.sleep(20) // the base must be older than the (zero) window
      val removed = cat.trimHistory("q.ht", retentionMillis = 0L)
      require(removed >= 2, s"c94 trim must remove the folded metafiles, removed $removed")
      val loud = try { cat.readTable("q.ht",
        ReadOptions(asOf = Some(preTrim))); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("trimmed-history horizon") }
      require(loud, "c94: pre-horizon time travel must fail loudly after a trim")
      cat.readTable("q.ht")
    },

    // Data-file vacuum (c95, round-15): after trimHistory forfeits the
    // pre-horizon metafiles, vacuumTable reclaims the data files no
    // retained metafile references. Two compaction generations make the
    // first base's files reclaimable; the closure requires the vacuum
    // actually deleted something AND the read after it hash-matches the
    // oracle — a wrongly-deleted live file fails the row loudly
    // (FileNotFoundException), a missed reclaim fails the require. The
    // copy-by-reference SURVIVAL side (referenced old files must outlive
    // the vacuum) is pinned by HistoryTrimSpec's bucket-restricted leg.
    Q("c95_vacuum", Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS v
      FROM orders""")) { (s, dir) =>
      val cat = newCat(s, "c95")
      cat.createTable("q.vc", StructType(Seq(
        FieldMeta.field("o_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", DoubleType))), properties = MoR)
      val base = tbl(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").as("v"))
      cat.writeToTable(base, "q.vc", WriteMode.Merge)
      cat.compact("q.vc")
      cat.writeToTable(base.where(col("o_orderkey") % 2 === 0)
        .withColumn("v", col("v") * 2), "q.vc", WriteMode.Merge)
      cat.compact("q.vc")
      Thread.sleep(20)
      require(cat.trimHistory("q.vc", retentionMillis = 0L) >= 2,
        "c95 trim must forfeit the folded metafiles")
      val removed = cat.vacuumTable("q.vc", minAgeMillis = Some(0L))
      require(removed >= 1, s"c95 vacuum must reclaim forfeited files, removed $removed")
      cat.readTable("q.vc")
    },

    // Object-store end-to-end (c96, round-16): the FULL
    // write → compact → trim → vacuum → read cycle on the storage profile
    // a real S3/GCS/ADLS deployment is — ConditionalPutCommitStore (no
    // rename; per-source decision objects) + ObjectStoreFileIO (virtual
    // dirs, touch-by-rewrite, listing-only enumeration) together. The
    // terminal state must hash-match DuckDB exactly like the local c95.
    Q("c96_object_store_cycle", Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS v
      FROM orders""")) { (s, dir) =>
      val cat = new GraftCatalog(s,
        Files.createTempDirectory("graft_c96").toString,
        commitStore = new graft.txn.ConditionalPutCommitStore,
        fileIO = new graft.txn.ObjectStoreFileIO)
      cat.createTable("q.os", StructType(Seq(
        FieldMeta.field("o_orderkey", LongType, nullable = false, mergeKey = true),
        FieldMeta.field("v", DoubleType))), properties = MoR)
      val base = tbl(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").as("v"))
      cat.writeToTable(base, "q.os", WriteMode.Merge)
      cat.compact("q.os")
      cat.writeToTable(base.where(col("o_orderkey") % 2 === 0)
        .withColumn("v", col("v") * 2), "q.os", WriteMode.Merge)
      cat.compact("q.os")
      Thread.sleep(20)
      require(cat.trimHistory("q.os", retentionMillis = 0L) >= 2,
        "c96 trim must forfeit the folded metafiles")
      require(cat.vacuumTable("q.os", minAgeMillis = Some(0L)) >= 1,
        "c96 vacuum must reclaim files")
      cat.janitor()
      cat.readTable("q.os")
    }
  )
}
