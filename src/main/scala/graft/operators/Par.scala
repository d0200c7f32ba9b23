package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for map-heavy operators. */
private[graft] object Par {

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
