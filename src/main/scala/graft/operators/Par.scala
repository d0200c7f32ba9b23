package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for map-heavy operators. */
private[graft] object Par {

  private val matCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Eagerly materialize a derived frame, cutting lineage: upstream caches
    * can be freed, self-joins don't recompute it, and nondeterministic
    * upstream stages (range-partitioner sampling, RNG) are frozen at their
    * first evaluation. Reliable checkpoint when spark.checkpoint.dir is set
    * (survives executor loss — required under dynamic allocation / spot
    * nodes); localCheckpoint otherwise (single-JVM local mode, tests).
    *
    * Plan-evidence hook: with `graft.explain.dir` set, the EXECUTED plan of
    * every materialized frame is dumped to that directory — eager operators
    * return checkpoint-backed frames whose `explain` shows only the RDD
    * scan, so this is the only way to capture what actually ran (the
    * optimization rounds' before/after plan files). Zero cost when unset. */
  def materialize(d: DataFrame): DataFrame = {
    val out =
      if (d.sparkSession.sparkContext.getCheckpointDir.isDefined) d.checkpoint(true)
      else d.localCheckpoint(true)
    // dumped AFTER the eager checkpoint so AQE has finalized: the file
    // shows the join strategies/exchanges that actually executed
    d.sparkSession.conf.getOption("graft.explain.dir").foreach { dir =>
      try {
        val n = matCounter.incrementAndGet()
        val p = java.nio.file.Paths.get(dir, f"materialize_$n%03d.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, d.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case _: Exception => () } // evidence only; never fail the job
    }
    out
  }

  /** Count-gated broadcast of an eagerly-MATERIALIZED frame (round-16):
    * the static planner sees a checkpointed frame with unknown stats and
    * plans a sort-merge join — AQE converts it to broadcast at runtime,
    * but the exchanges of the OTHER (corpus-sized) side are already
    * planned and still execute. An explicit hint removes them at plan
    * time. Gated on the exact row count (cheap against the checkpoint
    * RDD, never an estimate): above `graft.broadcast.maxRows` (default
    * 4M — the sparse-merge pending cap's sizing logic) the frame returns
    * unhinted and the shuffled join stands.
    *
    * Byte gate (round-17): rows alone under-estimate array-valued frames
    * (4M per-doc removal-list rows can be hundreds of MB — broadcast-cap/
    * driver-OOM territory at scale), so the MATERIALIZED size — the
    * checkpoint's real storage bytes, never a plan estimate — is also
    * checked against `graft.broadcast.maxBytes` (default 256 MB; an
    * explicit hint bypasses Spark's own size checks, so this is the only
    * guard). Unmeasurable frames (no storage info, e.g. an unmaterialized
    * input) pass the byte gate and rely on the row cap, as before. */
  def broadcastGated(d: DataFrame): DataFrame = {
    val conf = d.sparkSession.conf
    val maxRows = conf.get("graft.broadcast.maxRows", (4L * 1000 * 1000).toString).toLong
    val maxBytes = conf.get("graft.broadcast.maxBytes", (256L * 1024 * 1024).toString).toLong
    if (d.count() <= maxRows && materializedBytesOf(d).forall(_ <= maxBytes))
      org.apache.spark.sql.functions.broadcast(d)
    else d
  }

  /** Physical size of a [[materialize]]d frame: the bytes its checkpoint
    * actually occupies — block-manager blocks for a localCheckpoint, files
    * on the checkpoint FS for a reliable checkpoint. None when the frame
    * is not checkpoint-backed (or storage info is unavailable). */
  def materializedBytesOf(d: DataFrame): Option[Long] =
    d.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.flatMap { rdd =>
      rdd.getCheckpointFile match {
        case Some(path) =>
          try {
            val p = new org.apache.hadoop.fs.Path(path)
            val fs = p.getFileSystem(d.sparkSession.sparkContext.hadoopConfiguration)
            Some(fs.getContentSummary(p).getLength)
          } catch { case _: Exception => None }
        case None =>
          d.sparkSession.sparkContext.getRDDStorageInfo
            .find(_.id == rdd.id).map(i => i.memSize + i.diskSize)
      }
    }

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
