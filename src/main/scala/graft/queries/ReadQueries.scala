package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Pure read-path queries over the driver testdata, each paired with a
 * DuckDB-equivalent oracle SQL for the correctness gate.
 *
 * Determinism rules (the driver hash-compares values after sorting columns
 * by name):
 *  - every aggregate over DOUBLE goes through an exact DECIMAL(18,4) sum and
 *    is cast back to DOUBLE, so parallel (Spark) vs sequential (DuckDB)
 *    summation cannot diverge in floating point;
 *  - every ORDER BY ... LIMIT carries a unique tie-break key so the selected
 *    row SET is unique;
 *  - timestamps compare via exact microseconds (unix_micros / epoch_us).
 */
object Queries {
  type QFn = (SparkSession, String) => DataFrame
  /** One registered query: Spark plan + optional DuckDB oracle SQL. */
  final case class Q(name: String, oracle: Option[String])(val fn: QFn)

  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
  /** events.parquet's `ts` column has shipped in two physical encodings
    * across testdata generations: int64 nanoseconds (unreadable by Spark's
    * parquet reader natively) and a proper microsecond timestamp. Branch on
    * the type actually read so both work: long nanos truncate to micros —
    * exactly what DuckDB's ns→µs conversion does — while native timestamps
    * just normalize to TIMESTAMP_NTZ. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = tbl(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case TimestampNTZType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampNTZType))
    }
  }
  /** Exact decimal sum of a double column, surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)
  /** Scale-6 variant for derived products (e.g. price×(1−disc)×(1+tax)): the
    * true value has ≤6 decimal places, so rounding at scale 6 is exact in
    * both engines and no HALF_UP-vs-HALF_EVEN tie can appear. */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(22, 6))).cast(DoubleType)
  def cnt: Column = count(lit(1)).cast(LongType)
  /** Exact epoch microseconds of a timestamp(_ntz) column (UTC session). */
  def us(c: Column): Column = unix_micros(c.cast(TimestampType))
  /** Literal cast to the same type as the named column (timestamp_ntz safe). */
  def litAs(df: DataFrame, colName: String, v: String): Column =
    lit(v).cast(df.schema(colName).dataType)
}

object ReadQueries {
  import Queries._

  /** DECIMAL-exact sum of a double expression, DuckDB side. */
  private def osum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"
  private def osum6(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(22,6))) AS DOUBLE)"

  val all: Seq[Q] = Seq(
    // TPC-H Q1-style pricing summary — scan + filter pushdown + hash agg.
    Q("q01_pricing_summary", Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${osum("l_quantity")} AS sum_qty,
        ${osum("l_extendedprice")} AS sum_base_price,
        ${osum6("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
        ${osum6("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
        CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus""")) { (s, dir) =>
      val l = tbl(s, dir, "lineitem")
      l.where(col("l_shipdate") <= litAs(l, "l_shipdate", "1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          cnt.as("count_order"))
    },

    // Projection + predicate pushdown to the parquet scan.
    Q("q02_filter_project", Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      FROM lineitem WHERE l_quantity < 5 AND l_returnflag = 'R'""")) { (s, dir) =>
      tbl(s, dir, "lineitem")
        .where(col("l_quantity") < 5 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    },

    // 3-way join with broadcast dim + decimal-exact revenue + unique top-k.
    Q("q03_join_topk", Some(s"""
      SELECT o.o_orderkey, c.c_name, ${osum6("l_extendedprice*(1-l_discount)")} AS revenue
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY o.o_orderkey, c.c_name
      ORDER BY revenue DESC, o.o_orderkey LIMIT 20""")) { (s, dir) =>
      val c = broadcast(tbl(s, dir, "customer").where(col("c_mktsegment") === "BUILDING"))
      val o = tbl(s, dir, "orders")
      val l = tbl(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "c_name")
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)
    },

    // Distinct aggregate.
    Q("q04_agg_distinct", Some("""
      SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag""")) { (s, dir) =>
      tbl(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).cast(LongType).as("distinct_parts"), cnt.as("n"))
    },

    // Star-join through region→nation→supplier→lineitem (broadcast chain).
    Q("q05_region_revenue", Some(s"""
      SELECT n_name, ${osum6("l_extendedprice*(1-l_discount)")} AS revenue
      FROM region JOIN nation ON n_regionkey = r_regionkey
        JOIN supplier ON s_nationkey = n_nationkey
        JOIN lineitem ON l_suppkey = s_suppkey
      WHERE r_name = 'ASIA' GROUP BY n_name""")) { (s, dir) =>
      val dims = broadcast(
        tbl(s, dir, "region").where(col("r_name") === "ASIA")
          .join(tbl(s, dir, "nation"), col("n_regionkey") === col("r_regionkey"))
          .join(tbl(s, dir, "supplier"), col("s_nationkey") === col("n_nationkey")))
      tbl(s, dir, "lineitem").join(dims, col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name")
        .agg(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // Window: latest order per customer (deterministic tie-break).
    Q("q06_window_latest", Some("""
      SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) t WHERE rn = 1""")) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      tbl(s, dir, "orders").withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).select("o_custkey", "o_orderkey", "o_totalprice")
    },

    // Top-k with unique tie-break (TakeOrderedAndProject — no full sort).
    Q("q07_topk_orders", Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")) { (s, dir) =>
      tbl(s, dir, "orders").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice").limit(100)
    },

    // Rollup (grouping sets).
    Q("q08_rollup", Some("""
      SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")) { (s, dir) =>
      tbl(s, dir, "lineitem").rollup("l_returnflag", "l_linestatus").agg(cnt.as("n"))
    },

    // Set op: customers placing both urgent and low-priority orders.
    Q("q09_intersect", Some("""
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""")) { (s, dir) =>
      val o = tbl(s, dir, "orders")
      o.where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        .intersect(o.where(col("o_orderpriority") === "5-LOW").select("o_custkey"))
    },

    // Anti join: customers with no urgent orders.
    Q("q10_anti_join", Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""")) { (s, dir) =>
      tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // Event-time rollup by hour.
    Q("q11_events_hourly", Some(s"""
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n, ${osum("value")} AS total
      FROM events GROUP BY event_type, date_trunc('hour', ts)""")) { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(cnt.as("n"), dsum(col("value")).as("total"))
    },

    // Sessionization: 30-minute-gap sessions per user (window lag + cumsum).
    Q("q12_events_sessionize", Some("""
      WITH g AS (
        SELECT user_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM g GROUP BY user_id""")) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("new_s",
          when(lag(col("ts"), 1).over(w).isNull ||
            us(col("ts")) - us(lag(col("ts"), 1).over(w)) > 1800000000L, 1).otherwise(0))
        .groupBy("user_id")
        .agg(sum("new_s").cast(LongType).as("n_sessions"), cnt.as("n_events"))
    },

    // Semi-structured: extract int from JSON props (regexp — engine-portable).
    Q("q13_events_props", Some("""
      SELECT event_type,
             CAST(SUM(CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS BIGINT)) AS BIGINT) AS sum_k
      FROM events GROUP BY event_type""")) { (s, dir) =>
      events(s, dir)
        .groupBy("event_type")
        .agg(sum(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast(LongType))
          .cast(LongType).as("sum_k"))
    },

    // Union with schema alignment across heterogeneous tables.
    Q("q14_union_entities", Some("""
      SELECT 'customer' AS kind, c_name AS name, c_acctbal AS acctbal, CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_name AS name, s_acctbal AS acctbal, CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier""")) { (s, dir) =>
      val c = tbl(s, dir, "customer").select(lit("customer").as("kind"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"), col("c_nationkey").cast(IntegerType).as("nationkey"))
      val sup = tbl(s, dir, "supplier").select(lit("supplier").as("kind"), col("s_name").as("name"),
        col("s_acctbal").as("acctbal"), col("s_nationkey").cast(IntegerType).as("nationkey"))
      c.unionByName(sup)
    },

    // LIKE filter + join to lineitem volume.
    Q("q15_part_volume", Some("""
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
      FROM part JOIN lineitem ON l_partkey = p_partkey
      WHERE p_name LIKE '%red%' GROUP BY p_brand""")) { (s, dir) =>
      val p = broadcast(tbl(s, dir, "part").where(col("p_name").like("%red%")))
      tbl(s, dir, "lineitem").join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(cnt.as("n_lines"), dsum(col("l_quantity")).as("total_qty"))
    },

    // As-of join: each click matched to the user's latest view at or
    // before it (point-in-time lookup). Spark has no native as-of; the
    // operator is one key shuffle + sort (union + running last window) —
    // no per-key cross product. DuckDB's native ASOF JOIN is the oracle.
    // Views are pre-deduped to one row per (user, microsecond): nanosecond
    // ts values can collapse to the same microsecond after truncation, and
    // DuckDB's ASOF JOIN gives no tie-break guarantee — removing the ties
    // makes both engines' answers unique.
    Q("q16_asof_join", Some("""
      WITH c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
      v AS (SELECT view_id, user_id, ts, view_value FROM (
              SELECT event_id AS view_id, user_id, ts, value AS view_value,
                     row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
              FROM events WHERE event_type = 'view') WHERE rn = 1)
      SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
             v.view_id AS asof_view_id, v.view_value AS asof_view_value
      FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts""")) { (s, dir) =>
      val ev = events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val wv = Window.partitionBy("user_id", "ts").orderBy(col("view_id").desc)
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"),
          col("value").as("view_value"))
        .withColumn("_rn", row_number().over(wv)).where(col("_rn") === 1).drop("_rn")
      graft.operators.Temporal.asofJoin(clicks, views, Seq("user_id"), "ts", "ts",
          rightTiebreak = Some("view_id"))
        .select(col("event_id"), col("user_id"), us(col("ts")).as("ts_us"),
          col("asof_view_id"), col("asof_view_value"))
    },

    // Exact percentiles (sort-based aggregate): both engines compute the
    // same linear-interpolated continuous quantile; round(,9) absorbs
    // last-ulp interpolation differences.
    Q("q17_quantiles", Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.5), 9) AS median_qty,
             round(quantile_cont(l_quantity, 0.95), 9) AS p95_qty,
             round(quantile_cont(l_extendedprice, 0.99), 9) AS p99_price
      FROM lineitem GROUP BY l_returnflag""")) { (s, dir) =>
      tbl(s, dir, "lineitem").groupBy("l_returnflag").agg(
        round(percentile(col("l_quantity"), lit(0.5)), 9).as("median_qty"),
        round(percentile(col("l_quantity"), lit(0.95)), 9).as("p95_qty"),
        round(percentile(col("l_extendedprice"), lit(0.99)), 9).as("p99_price"))
    },

    // Ordered funnel (view → click → purchase): per user, each step's
    // completion time — the earliest matching event strictly after the
    // previous step. Long-form output; exact-microsecond timestamps.
    Q("q18_funnel", Some("""
      WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT e.user_id, s1.t1, min(e.ts) AS t2 FROM events e
             JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'click' AND e.ts > s1.t1
             GROUP BY e.user_id, s1.t1),
      s3 AS (SELECT e.user_id, s2.t2, min(e.ts) AS t3 FROM events e
             JOIN s2 ON e.user_id = s2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2
             GROUP BY e.user_id, s2.t2)
      SELECT user_id, 1 AS step, epoch_us(t1) AS step_us FROM s1
      UNION ALL SELECT user_id, 2, epoch_us(t2) FROM s2
      UNION ALL SELECT user_id, 3, epoch_us(t3) FROM s3""")) { (s, dir) =>
      graft.operators.Temporal.funnel(events(s, dir), "user_id", "event_type",
          "ts", Seq("view", "click", "purchase"))
        .select(col("user_id"), col("step"), us(col("step_ts")).as("step_us"))
    },

    // Cohort retention triangle: users grouped by signup week, distinct
    // actives counted N whole weeks later (exact microsecond arithmetic).
    Q("q19_cohort_retention", Some("""
      WITH a AS (SELECT user_id, min(ts) AS a_ts FROM events
                 WHERE event_type = 'signup' GROUP BY user_id),
      act AS (SELECT DISTINCT
                epoch_us(CAST(date_trunc('week', a.a_ts) AS TIMESTAMP)) AS cohort_us,
                CAST(floor((epoch_us(e.ts) - epoch_us(a.a_ts)) / 604800000000) AS BIGINT) AS week_n,
                e.user_id
              FROM events e JOIN a ON e.user_id = a.user_id
              WHERE epoch_us(e.ts) >= epoch_us(a.a_ts))
      SELECT cohort_us, week_n, CAST(count(*) AS BIGINT) AS n_active
      FROM act GROUP BY cohort_us, week_n""")) { (s, dir) =>
      graft.operators.Temporal.cohortRetention(events(s, dir), "user_id",
          "event_type", "ts", anchorType = "signup")
        .select(us(col("cohort_week")).as("cohort_us"), col("week_n"),
          col("n_active"))
    }
  )
}
