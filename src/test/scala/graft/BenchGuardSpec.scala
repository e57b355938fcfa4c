package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 bench hygiene: [[BenchGuard]] must see a foreign process whose
  * command line carries the ScalingBench marker, wait it out, and report
  * clear once it exits; [[ScalingBench.reapChildren]] must kill children
  * it is handed. Uses `sleep` stand-ins (the marker only has to appear in
  * the command line — detection is textual by design, same as the
  * documented `pgrep -f ScalingBench` session rule).
  */
class BenchGuardSpec extends AnyFunSuite {

  // the sh wrapper's OWN command line carries the marker (no exec: sh
  // stays alive as the marked process, sleep is its child)
  private def spawnMarked(seconds: Int): Process =
    new ProcessBuilder("sh", "-c",
      s"sleep $seconds # graft.ScalingBench marker").start()

  test("liveScalingBench sees a marked foreign process and clears on exit") {
    assert(BenchGuard.liveScalingBench().isEmpty,
      "precondition: no real ScalingBench may be running during tests")
    val p = spawnMarked(30)
    try {
      // detection: command line contains the marker
      var tries = 0
      while (BenchGuard.liveScalingBench().isEmpty && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      assert(BenchGuard.liveScalingBench().nonEmpty)
      // awaitClear with a small budget honestly reports NOT clear
      assert(!BenchGuard.awaitClear(waitMs = 300L, pollMs = 100L))
    } finally {
      p.destroyForcibly()
      p.waitFor()
    }
    // and clear once it's gone
    assert(BenchGuard.awaitClear(waitMs = 5000L, pollMs = 100L))
  }

  test("reapChildren kills a still-alive registered child") {
    // go through the real registration path: a private runChild isn't
    // reachable, but reapChildren over the registry is the hook's body —
    // register via reflection-free seam: spawn, add, reap
    val p = new ProcessBuilder("sleep", "30").start()
    try {
      val f = ScalingBench.getClass.getDeclaredField("liveChildren")
      f.setAccessible(true)
      f.get(ScalingBench)
        .asInstanceOf[java.util.Set[Process]].add(p)
      assert(p.isAlive)
      ScalingBench.reapChildren()
      assert(p.waitFor(5, java.util.concurrent.TimeUnit.SECONDS))
      assert(!p.isAlive)
    } finally { p.destroyForcibly(); () }
  }
}
