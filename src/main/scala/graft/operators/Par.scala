package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for map-heavy operators. */
private[graft] object Par {

  /** Eagerly materialize a derived frame, cutting lineage: upstream caches
    * can be freed, self-joins don't recompute it, and nondeterministic
    * upstream stages (range-partitioner sampling, RNG) are frozen at their
    * first evaluation. Reliable checkpoint when spark.checkpoint.dir is set
    * (survives executor loss — required under dynamic allocation / spot
    * nodes); localCheckpoint otherwise (single-JVM local mode, tests). */
  def materialize(d: DataFrame): DataFrame =
    if (d.sparkSession.sparkContext.getCheckpointDir.isDefined) d.checkpoint(true)
    else d.localCheckpoint(true)

  /**
   * Widen a small input to the cluster's default parallelism before
   * expensive per-row work (shingling, hashing, dot products). A small
   * corpus often arrives as one or two file splits, which would serialize
   * the whole map side on one task; one cheap shuffle of the raw rows
   * unlocks every core.
   *
   * "Small" is judged from optimizer statistics (estimated bytes below one
   * full wave of default-sized splits: parallelism × maxPartitionBytes) —
   * NOT from `df.rdd.getNumPartitions`, which forces a throwaway physical
   * planning pass and, under adaptive execution, eagerly executes upstream
   * shuffle stages just to learn a partition count. Large inputs (the
   * 100 TB case) exceed the threshold and pass through untouched, so no
   * extra shuffle at scale; Catalyst's conservative over-estimates for
   * complex plans also land on the safe (no-shuffle) side.
   */
  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val oneWave = BigInt(par) * spark.sessionState.conf.filesMaxPartitionBytes
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes < oneWave) df.repartition(par)
    else df
  }
}
