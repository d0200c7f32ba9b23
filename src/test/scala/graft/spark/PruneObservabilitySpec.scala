package graft.spark

import org.scalatest.funsuite.AnyFunSuite

/** The per-table prune/deferred observability maps are bounded; hitting the
  * bound must evict ONE entry, not wipe every table's reading. */
class PruneObservabilitySpec extends AnyFunSuite {

  test("cap eviction drops a single entry, not the whole map") {
    val tag = (i: Int) => s"evict.t$i"
    // start from empty maps so the eviction bound is exact (the maps are
    // process-wide; foreign entries would shift the cap arbitrarily)
    StatsPruningScanBuilder.resetAllForTest()
    (0 until 300).foreach { i =>
      StatsPruningScanBuilder.recordPrune(tag(i), (10, i))
      StatsPruningScanBuilder.recordDeferred(tag(i), i)
    }
    // 300 records through a 256 cap with single eviction: exactly 256
    // survive (each overflow insert evicts one, inserts one). A clear()
    // at the cap would leave only the post-wipe tail (~44). The small
    // slack below tolerates a concurrently-planning suite.
    val prunesAlive = (0 until 300).count(i =>
      StatsPruningScanBuilder.lastPruneFor(tag(i)) == ((10, i)))
    val deferredAlive = (0 until 300).count(i =>
      StatsPruningScanBuilder.lastDeferredFor(tag(i)) == i)
    assert(prunesAlive >= 250, s"only $prunesAlive prune entries survived")
    assert(deferredAlive >= 250, s"only $deferredAlive deferred entries survived")
    // the newest record always lands
    assert(StatsPruningScanBuilder.lastPruneFor(tag(299)) == ((10, 299)))
    (0 until 300).foreach(i => StatsPruningScanBuilder.resetFor(tag(i)))
  }
}
