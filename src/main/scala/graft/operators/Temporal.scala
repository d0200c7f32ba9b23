package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Temporal join operators Spark lacks natively.
 *
 * The as-of join (each left row matched to the latest right row at or
 * before its timestamp, per key) is the standard point-in-time lookup of
 * feature stores, market data, and slowly-changing dimensions. Spark has
 * no built-in; the naive `l JOIN r ON l.k = r.k AND r.ts <= l.ts` +
 * row_number explodes to the full per-key cross product before pruning —
 * quadratic per key, fatal at scale.
 */
object Temporal {

  /**
   * As-of join via union + single key-partitioned sort + running
   * `last(..., ignoreNulls)` window: right rows interleave with left rows
   * in time order within each key, and every left row picks up the most
   * recent right payload at or before it (`<=` semantics — a right row
   * exactly at the left timestamp matches, sorting before the left row at
   * equal timestamps).
   *
   * Scale shape: ONE shuffle of |left| + |right| rows on the join keys and
   * a per-partition sort — no per-key cross product, no range explosion,
   * skew bounded by the biggest single key (same bound as any windowed
   * computation). This is the plan a native as-of operator would produce.
   *
   * Output: every left row (left join semantics), with the matched right
   * row's non-key columns appended as `<rightPrefix><name>`; nulls when no
   * right row precedes. `tolerance` (an interval/duration Column, e.g.
   * `expr("INTERVAL 1 HOUR")`) drops matches staler than leftTs − tolerance.
   *
   * Ties among right rows with identical (key, rightTs) resolve by
   * `rightTiebreak` (default: none — pass a unique column for fully
   * deterministic output, as in any window ordering).
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "asof_",
      tolerance: Option[Column] = None,
      rightTiebreak: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val rPayloadCols = right.columns.filterNot(keys.contains).toSeq
    val lCols = left.columns.toSeq
    val rStructType = StructType(rPayloadCols.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))

    // Unioned event stream: keys, the ordering columns, one struct per side.
    val lPart = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        struct(lCols.filterNot(keys.contains).map(col): _*).as("_l"),
        lit(null).cast(rStructType).as("_r")): _*)
    // Null right timestamps can never satisfy r.ts <= l.ts (SQL semantics);
    // unfiltered they would sort nulls-first and become the running "match"
    // for left rows with no genuine predecessor. Null LEFT timestamps also
    // sort first and so match nothing — consistent with the same rule.
    val rPart = right.where(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(lPart.schema("_l").dataType).as("_l"),
        struct(rPayloadCols.map(col): _*).as("_r")): _*)

    val tieCols = rightTiebreak.toSeq.map(t => col("_r").getField(t))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(col("_ts").asc, col("_side").asc) ++ tieCols.map(_.asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lPart.unionByName(rPart)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)

    val withTol = tolerance match {
      case None => matched
      case Some(tol) => matched.withColumn("_m",
        when(col("_m").getField(rightTs) >= col("_ts") - tol, col("_m")))
    }
    withTol.select(
      lCols.map(c => (if (keys.contains(c)) col(c) else col("_l").getField(c)).as(c)) ++
        rPayloadCols.map(c => col("_m").getField(c).as(s"$rightPrefix$c")): _*)
  }

  /** Ordered FUNNEL analysis: per entity, the completion time of each
    * step in `steps`, where step i completes at the EARLIEST event of its
    * type strictly after step i−1's completion (step 0 at the entity's
    * earliest matching event). The classic product-analytics sequence
    * query (view → click → purchase) Spark has no native operator for.
    *
    * Output is long-form: one row per (entity, completed step) —
    * (idCol, step 1-based INT, step_ts) — so any funnel length fits one
    * schema; `steps_completed` is `max(step)` per entity downstream.
    *
    * Scale shape: one combinable min-aggregate per step over only that
    * step's events (filter pushes to the scan), chained by equi-joins on
    * the entity key — each successive frame is one row per surviving
    * entity, monotonically shrinking, so stage i's join input is tiny.
    * No per-entity event-list collection (a power user with 10⁸ events
    * costs nothing beyond their min()); no window over the event stream.
    * Steps count is the funnel definition (3-6 in practice) — joins are
    * O(|steps|), not data-dependent. */
  def funnel(events: DataFrame, idCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col(idCol).as("_u"), col(typeCol).as("_et"),
      col(tsCol).as("_t"))
    // frames(i) = entities completing step i+1, with t1.._t{i+1}
    val first = e.where(col("_et") === steps.head)
      .groupBy("_u").agg(min(col("_t")).as("_ts1"))
    val frames = steps.zipWithIndex.tail.scanLeft(first) {
      case (prev, (step, i)) => // i = 0-based index of `step` (so `step` is step i+1; _ts$i is the PREVIOUS step's column)
        val prevTs = (1 to i).map(j => col(s"_ts$j"))
        e.where(col("_et") === step)
          .join(prev, Seq("_u"))
          .where(col("_t") > col(s"_ts$i"))
          .groupBy(col("_u") +: prevTs: _*)
          .agg(min(col("_t")).as(s"_ts${i + 1}"))
    }
    frames.zipWithIndex.map { case (f, i) =>
      f.select(col("_u").as(idCol), lit(i + 1).as("step"),
        col(s"_ts${i + 1}").as("step_ts"))
    }.reduce(_.unionByName(_))
  }

  /** COHORT RETENTION: group entities by the ISO week of their anchor
    * event (first `anchorType` occurrence), then count how many of each
    * cohort are active (any event) N whole weeks later — the standard
    * product-retention triangle. Activity strictly before the anchor is
    * ignored (week_n ≥ 0 only).
    *
    * Output: (cohort_week timestamp, week_n long, n_active long) with
    * n_active = DISTINCT active entities of that cohort in that week.
    *
    * Scale shape: the anchor frame is one combinable min per entity; the
    * activity join is one equi-join on the entity key; the distinct-count
    * is a two-level aggregate ((cohort, week, entity) partial collapses
    * map-side, then the count) — no window over the event stream, no
    * per-entity collection. */
  def cohortRetention(events: DataFrame, idCol: String, typeCol: String,
      tsCol: String, anchorType: String): DataFrame = {
    val weekMicros = 7L * 86400L * 1000000L
    val e = events.select(col(idCol).as("_u"), col(typeCol).as("_et"),
      col(tsCol).as("_t"))
    val anchor = e.where(col("_et") === anchorType)
      .groupBy("_u").agg(min(col("_t")).as("_a"))
    e.join(anchor, Seq("_u"))
      .withColumn("week_n",
        floor((unix_micros(col("_t").cast(TimestampType)) -
          unix_micros(col("_a").cast(TimestampType))) / weekMicros))
      .where(col("week_n") >= 0)
      .select(date_trunc("week", col("_a")).as("cohort_week"),
        col("week_n"), col("_u"))
      .distinct()
      .groupBy("cohort_week", "week_n")
      .agg(count(lit(1)).as("n_active"))
  }
}
