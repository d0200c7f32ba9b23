package graft

import org.apache.spark.sql.functions._

import graft.operators.Par

/**
 * Byte-aware broadcast gate (round-17, verdict ask #2): `broadcastGated`
 * previously gated on row count alone — 4M rows of pair keys is fine, but
 * 4M rows of per-doc removal-list ARRAYS can be hundreds of MB, past
 * `autoBroadcastJoinThreshold` territory and a driver/executor OOM risk at
 * scale. The gate now also sizes the MATERIALIZED frame (its cached/
 * checkpointed bytes — real storage, never a plan estimate) against
 * `graft.broadcast.maxBytes` and declines the hint above it.
 */
class ParGateSpec extends SparkSpec {
  import spark.implicits._

  private def hinted(out: org.apache.spark.sql.DataFrame,
      in: org.apache.spark.sql.DataFrame): Boolean = out ne in

  test("small frames broadcast; the rows cap and maxBytes=0 escape hatch decline") {
    val d = Par.materialize((1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "v"))
    assert(hinted(Par.broadcastGated(d), d), "a 1000-row frame must broadcast")
    spark.conf.set("graft.broadcast.maxRows", "10")
    try assert(!hinted(Par.broadcastGated(d), d), "rows over the cap must not broadcast")
    finally spark.conf.unset("graft.broadcast.maxRows")
    spark.conf.set("graft.broadcast.maxRows", "0")
    try assert(!hinted(Par.broadcastGated(d), d), "maxRows=0 must force the shuffled shape")
    finally spark.conf.unset("graft.broadcast.maxRows")
  }

  test("few rows of fat arrays exceed the byte gate and decline the hint") {
    // ~4000 rows x 1KB arrays ≈ 4+ MB materialized — tiny row count, real bytes
    val fat = Par.materialize(spark.range(4000)
      .select(col("id"), array_repeat(col("id"), 128).as("payload")))
    val measured = Par.materializedBytesOf(fat)
    assert(measured.exists(_ > 1024 * 1024),
      s"materialized size must be measurable and >1MB, got $measured")
    spark.conf.set("graft.broadcast.maxBytes", (1024 * 1024).toString)
    try assert(!hinted(Par.broadcastGated(fat), fat),
      "a frame above graft.broadcast.maxBytes must keep the shuffled shape")
    finally spark.conf.unset("graft.broadcast.maxBytes")
    // under the default 256MB cap the same frame still broadcasts
    assert(hinted(Par.broadcastGated(fat), fat))
  }
}
