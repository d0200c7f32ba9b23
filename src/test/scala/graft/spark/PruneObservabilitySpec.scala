package graft.spark

import org.scalatest.funsuite.AnyFunSuite

/** The per-table prune/deferred observability maps are bounded; hitting the
  * bound must evict ONE entry, not wipe every table's reading. */
class PruneObservabilitySpec extends AnyFunSuite {

  test("cap eviction drops a single entry, not the whole map") {
    val tag = (i: Int) => s"evict.t$i"
    (0 until 300).foreach(i => StatsPruningScanBuilder.resetFor(tag(i)))
    (0 until 300).foreach { i =>
      StatsPruningScanBuilder.recordPrune(tag(i), (10, i))
      StatsPruningScanBuilder.recordDeferred(tag(i), i)
    }
    // 300 records through a 256 cap: most entries must survive — a clear()
    // at the cap would leave only the post-wipe tail (≲80 even granting
    // other suites' entries in this shared map); single eviction keeps
    // ≥ 300 - (overflow + other-suite entries) ≈ 236+
    val prunesAlive = (0 until 300).count(i =>
      StatsPruningScanBuilder.lastPruneFor(tag(i)) == ((10, i)))
    val deferredAlive = (0 until 300).count(i =>
      StatsPruningScanBuilder.lastDeferredFor(tag(i)) == i)
    assert(prunesAlive >= 200, s"only $prunesAlive prune entries survived")
    assert(deferredAlive >= 200, s"only $deferredAlive deferred entries survived")
    // the newest record always lands
    assert(StatsPruningScanBuilder.lastPruneFor(tag(299)) == ((10, 299)))
    (0 until 300).foreach(i => StatsPruningScanBuilder.resetFor(tag(i)))
  }
}
