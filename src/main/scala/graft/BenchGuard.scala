package graft

/** Bench-process hygiene (round 6, VERDICT r5 "what's wrong" #1): the
  * driver bench and a taskset-pinned ScalingBench child must never
  * overlap — a pinned child reads the bench's load as host noise (its
  * probes go dirty) and the bench's timings are contended by the pinned
  * cores. Round 5 shipped a BENCH artifact captured while an orphaned
  * pinned child was alive; this makes the rule mechanical:
  *
  *   - [[Bench]] calls [[awaitClear]] before timing anything — it waits
  *     for live ScalingBench JVMs to drain and, if they don't, proceeds
  *     with a LOUD stderr warning and a `"contended":true` field in the
  *     headline JSON (never silently).
  *   - ScalingBench's parent mode refuses to start when another
  *     ScalingBench is already live (the observed two-invocation overlap
  *     failure), and installs a shutdown hook that kills any still-alive
  *     pinned children so a dying parent can't orphan them.
  */
object BenchGuard {

  /** Pids of OTHER live JVMs running graft.ScalingBench (self and own
    * ancestry excluded — a ScalingBench child must not see its parent).
    */
  def liveScalingBench(): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val self = ProcessHandle.current()
    val ancestry = Iterator.iterate(Option(self))(
      _.flatMap(h => if (h.parent().isPresent) Some(h.parent().get) else None))
      .takeWhile(_.nonEmpty).flatten.map(_.pid()).take(10).toSet
    ProcessHandle.allProcesses().iterator().asScala
      .filter(h => !ancestry.contains(h.pid()))
      .filter(h => h.info().commandLine()
        .map[Boolean](_.contains("graft.ScalingBench")).orElse(false))
      .map(_.pid()).toSeq
  }

  /** Block until no foreign ScalingBench JVM is alive, polling every
    * `pollMs` up to `waitMs` total. Returns true when clear; false when
    * the budget ran out with a bench still live (caller must warn loudly
    * and mark its artifact contended).
    */
  def awaitClear(waitMs: Long, pollMs: Long = 5000L): Boolean = {
    val deadline = System.currentTimeMillis() + waitMs
    var live = liveScalingBench()
    while (live.nonEmpty && System.currentTimeMillis() < deadline) {
      System.err.println(
        s"[bench-guard] live ScalingBench pid(s) ${live.mkString(",")} — " +
          "waiting for them to drain before timing")
      Thread.sleep(pollMs)
      live = liveScalingBench()
    }
    live.isEmpty
  }
}
