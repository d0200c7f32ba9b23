package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for map-heavy operators. */
private[operators] object Par {

  /**
   * Widen a narrow input to the cluster's default parallelism before
   * expensive per-row work (shingling, hashing, dot products). A small
   * corpus often arrives as one or two file splits, which would serialize
   * the whole map side on one task; one cheap shuffle of the raw rows
   * unlocks every core. On wide inputs (the 100 TB case — thousands of
   * splits ≥ parallelism) this is a no-op, so no extra shuffle at scale.
   */
  def widen(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
