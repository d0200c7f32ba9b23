package org.apache.spark.sql.graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/**
 * Per-run task-metric probe for graft.Bench: cumulative sums of the four
 * signals that attribute an elevated wall time WITHOUT a rerun —
 *
 *  - jvmGCTime: a GC excursion shows gc ≈ the wall inflation
 *    (the t41/zipper attribution pattern: task GC 22 s vs 1.9 s on
 *    matched runs);
 *  - executorRunTime vs executorCpuTime: co-tenant CPU steal shows task
 *    wall (runTime) inflated while actual CPU burned stays flat — the
 *    load signature that exonerated four round-10 entries, previously
 *    provable only by a hand-run listener in BENCH_NOTES;
 *  - shuffle read/write bytes: a plan regression moves these; a noisy
 *    machine doesn't.
 *
 * The bench snapshots the sums around each measured run and emits the
 * deltas next to the raw run seconds, so the OFFICIAL artifact is
 * self-attributing. Lives under org.apache.spark.sql because draining
 * the async listener bus between snapshot points needs the
 * private[spark] LiveListenerBus.waitUntilEmpty seam.
 */
final class BenchProbe extends SparkListener {
  private var gcMs = 0L
  private var runMs = 0L
  private var cpuNs = 0L
  private var shReadB = 0L
  private var shWriteB = 0L

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) synchronized {
      gcMs += m.jvmGCTime
      runMs += m.executorRunTime
      cpuNs += m.executorCpuTime
      shReadB += m.shuffleReadMetrics.totalBytesRead
      shWriteB += m.shuffleWriteMetrics.bytesWritten
    }
  }

  /** (gc seconds, task-wall seconds, task-cpu seconds, shuffle-read MB,
    * shuffle-write MB, whole-JVM GC seconds, process CPU s, other-process
    * machine CPU s) — cumulative since registration (jvmGcS/procCpuS/
    * machine counters: since JVM/boot). */
  def snapshot(): BenchProbe.Snap = synchronized {
    val pc = BenchProbe.processCpuSeconds()
    BenchProbe.Snap(gcMs / 1e3, runMs / 1e3, cpuNs / 1e9,
      shReadB / 1048576.0, shWriteB / 1048576.0, BenchProbe.jvmGcSeconds(),
      pc, math.max(0.0, BenchProbe.machineBusyCpuSeconds() - pc),
      BenchProbe.machineIoWaitSeconds())
  }
}

object BenchProbe {
  final case class Snap(gcS: Double, rtS: Double, cpuS: Double,
      srMb: Double, swMb: Double, jvmGcS: Double = 0.0,
      procCpuS: Double = 0.0, otherCpuS: Double = 0.0,
      ioWaitS: Double = 0.0) {
    def -(o: Snap): Snap =
      Snap(gcS - o.gcS, rtS - o.rtS, cpuS - o.cpuS, srMb - o.srMb,
        swMb - o.swMb, jvmGcS - o.jvmGcS, procCpuS - o.procCpuS,
        otherCpuS - o.otherCpuS, ioWaitS - o.ioWaitS)
  }

  /** Whole-JVM cumulative GC seconds (all collectors). local[32] is ONE
    * JVM, so `jvmGcS − gcS` (delta-to-delta) is the GC that ran OUTSIDE
    * task execution — driver planning/commit pauses, invisible to task
    * metrics. The round-12 matrix showed zipper_read_10x's best runs with
    * task GC ≈ 2 s while the entry stayed elevated and task time covered
    * only ~12% of wall×cores: a latency-bound entry needs this signal to
    * tell a collector trade from co-tenant load. */
  def jvmGcSeconds(): Double =
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans)
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum / 1e3

  /** This JVM's cumulative CPU seconds (all threads: tasks, driver, JIT,
    * GC). Delta per run minus the task-cpu delta = CPU burned OUTSIDE task
    * bodies (planning, commit, JIT compilation). */
  def processCpuSeconds(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        math.max(0L, os.getProcessCpuTime) / 1e9
      case _ => 0.0
    }

  /** WHOLE-MACHINE busy CPU seconds since boot (user+nice+system+irq+
    * softirq+steal from /proc/stat, USER_HZ=100). The load witness the
    * round-12 t35 postmortem was missing: task cpu-seconds are NOT
    * load-invariant on an SMT box (hyperthread contention, LLC pollution,
    * and JIT starvation all inflate cpu, mimicking a real plan
    * regression), but `other = machine − process` is direct evidence of a
    * co-tenant — a quiet run has other ≈ 0, a loaded one shows the
    * competing burn. Linux-only; returns 0 (⇒ other=0, neutral) elsewhere. */
  def machineBusyCpuSeconds(): Double =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      // user nice system idle iowait irq softirq steal
      val busy = f(0) + f(1) + f(2) +
        (if (f.length > 5) f(5) else 0L) + (if (f.length > 6) f(6) else 0L) +
        (if (f.length > 7) f(7) else 0L)
      busy / 100.0
    } catch { case _: Throwable => 0.0 }

  /** WHOLE-MACHINE iowait seconds since boot (/proc/stat field 5) — the
    * witness for the one elevation signature nothing else sees: task wall
    * (rt) inflated with cpu flat, ocpu ≈ 0, AND a quiet calibration spin
    * (cal measures CPU contention; a saturated or throttled DISK never
    * shows there). A round-14 full run breached t40 with exactly that
    * shape across four agreeing runs while an isolated rerun minutes later
    * sat back in band — storage contention was the only suspect left and
    * had no number. iow ≫ quiet baseline on an elevated run = I/O-bound
    * co-tenancy; iow flat with rt ≫ cpu = scheduler/lock waiting,
    * investigate the plan. Linux-only; 0 elsewhere (neutral). */
  def machineIoWaitSeconds(): Double =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      if (f.length > 4) f(4) / 100.0 else 0.0
    } catch { case _: Throwable => 0.0 }

  /** Block until queued listener events are delivered, so snapshot deltas
    * bracket exactly the tasks of one measured run (the bus is async).
    * Best-effort: on bus-timeout the snapshot is merely a bit stale. */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: Throwable => () }

  /** HOST-contention witness: wall milliseconds of a FIXED single-thread
    * spin (60M xorshift steps, ~25 ms quiet). A hypervisor-level noisy
    * neighbor is invisible to every guest counter on this box — no PV
    * steal accounting, so preempted vCPU time silently inflates guest
    * cpu-seconds (gc 0, ocpu 0, cpu up ~2×: the r12-t35 and r13-rerun
    * signature). Fixed work has no such ambiguity: its wall time inflates
    * 1:1 with the slowdown, so `cal` ≫ its quiet baseline indicts the
    * HOST even when ocpu ≈ 0. JIT-stable: same code path every call. */
  def calibrateMs(): Double = {
    val t0 = System.nanoTime()
    var x = 88172645463325252L
    var i = 0
    while (i < 20000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    calSink = x // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e6
  }
  @volatile private var calSink: Long = 0L
}
