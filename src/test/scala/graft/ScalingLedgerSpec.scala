package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip tests for the cross-invocation scaling-replication ledger
  * (ScalingBench.ledgerAppend / ledgerLoad): the gate evidence ACCUMULATES
  * across bench invocations through this file, so a parse drift would
  * silently discard prior replications (the ledger's whole point is that a
  * degraded-window invocation's wait is not thrown away).
  */
class ScalingLedgerSpec extends AnyFunSuite {

  private def rep(cores: Int, eff: Double): ScalingBench.Rep = {
    // choose docsPerSec so that eff = dps(4N) / (4 * dps(N)); values are
    // pre-rounded to the ledger's serialized precision (%.3f / %.1f) so
    // the round-trip comparison is exact
    def r3(x: Double) = math.rint(x * 1000) / 1000
    val a = ScalingBench.RunResult(cores, 100.0, 2000.0, 500.0, 900.0,
      5.123, 1.881, "aabb00112233445566778899aabbccdd")
    val b = ScalingBench.RunResult(4 * cores, r3(100.0 / (4 * eff)),
      2000.0 * 4 * eff, 400.0, 700.0, 1.321, 0.676,
      "aabb00112233445566778899aabbccdd")
    ScalingBench.Rep(a, b)
  }

  test("runJson / parseRun round-trip preserves every field") {
    val r = ScalingBench.RunResult(8, 33.101, 6042.1, 407.5, 685.2,
      1.321, 0.676, "b6140f0f725644d48ac22c9a58f62e35")
    val back = ScalingBench.parseRun(ScalingBench.runJson(r))
    assert(back.contains(r))
  }

  test("parseRun rejects malformed payloads instead of throwing") {
    assert(ScalingBench.parseRun("").isEmpty)
    assert(ScalingBench.parseRun("[8,1.0]").isEmpty)
    assert(ScalingBench.parseRun("""[8,a,b,c,d,e,f,"zz"]""").isEmpty)
  }

  test("append then load returns the same replications, keyed by invocation") {
    val path = Files.createTempFile("graft-ledger", ".jsonl").toString
    Files.deleteIfExists(Paths.get(path))
    val r1 = rep(2, 0.85)
    val r2 = rep(2, 0.62)
    ScalingBench.ledgerAppend(r1, 2, 200000L, inv = 1, path = path)
    ScalingBench.ledgerAppend(r2, 2, 200000L, inv = 3, path = path)
    val loaded = ScalingBench.ledgerLoad(2, 200000L, path = path)
    assert(loaded.map(_._1) == Seq(1, 3))
    assert(loaded.map(_._2) == Seq(r1, r2))
    assert(math.abs(loaded.head._2.eff - 0.85) < 1e-3)
    Files.deleteIfExists(Paths.get(path))
  }

  test("load filters by span and corpus size (other keys invisible)") {
    val path = Files.createTempFile("graft-ledger", ".jsonl").toString
    Files.deleteIfExists(Paths.get(path))
    ScalingBench.ledgerAppend(rep(2, 0.8), 2, 200000L, inv = 1, path = path)
    ScalingBench.ledgerAppend(rep(4, 0.8), 4, 200000L, inv = 1, path = path)
    ScalingBench.ledgerAppend(rep(2, 0.8), 2, 50000L, inv = 1, path = path)
    assert(ScalingBench.ledgerLoad(2, 200000L, path = path).size == 1)
    assert(ScalingBench.ledgerLoad(4, 200000L, path = path).size == 1)
    assert(ScalingBench.ledgerLoad(2, 50000L, path = path).size == 1)
    assert(ScalingBench.ledgerLoad(8, 200000L, path = path).isEmpty)
    Files.deleteIfExists(Paths.get(path))
  }

  test("a corrupt line is skipped, not fatal (host-killed writer mid-line)") {
    val path = Files.createTempFile("graft-ledger", ".jsonl").toString
    Files.deleteIfExists(Paths.get(path))
    ScalingBench.ledgerAppend(rep(2, 0.8), 2, 200000L, inv = 1, path = path)
    Files.write(Paths.get(path),
      "{\"workload\":\"r5-tfv3-encFromTf\",\"n\":2,\"nDocs\":200000,\"inv\":2,\"a\":[2,1.0,tru".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val loaded = ScalingBench.ledgerLoad(2, 200000L, path = path)
    assert(loaded.size == 1 && loaded.head._1 == 1)
    Files.deleteIfExists(Paths.get(path))
  }

  test("lifecycle event rows coexist with data rows (round 7): loaded " +
      "replications unchanged, events written with escaping") {
    val path = Files.createTempFile("graft-ledger", ".jsonl").toString
    Files.deleteIfExists(Paths.get(path))
    ScalingBench.ledgerEvent("start", 5, 2, 200000L,
      "prior=21 targetClean=3 maxReps=55", path = path)
    ScalingBench.ledgerAppend(rep(2, 0.83), 2, 200000L, inv = 5, path = path)
    ScalingBench.ledgerEvent("hb", 5, 2, 200000L,
      "pre-poll 0 cpu@8=1.45 clean=false", path = path)
    ScalingBench.ledgerEvent("abort", 5, 2, 200000L,
      "phase=rep 2 level 8 \"quoted\" \\ backslash", path = path)
    // data rows load exactly as before — event rows are invisible to the
    // replication loader
    val loaded = ScalingBench.ledgerLoad(2, 200000L, path = path)
    assert(loaded.size == 1 && loaded.head._1 == 5)
    // every event row is present, well-formed and carries the workload key
    val lines = Files.readAllLines(Paths.get(path))
    assert(lines.size == 4)
    val events = Seq(0, 2, 3).map(lines.get)
    assert(events.forall(_.startsWith("{\"event\":\"")))
    assert(events.forall(_.contains("\"ts\":\"")))
    assert(lines.get(3).contains("\\\"quoted\\\""))
    Files.deleteIfExists(Paths.get(path))
  }

  test("min-time efficiency pairs each level's best run across DIFFERENT reps") {
    def run(cores: Int, dps: Double) = ScalingBench.RunResult(
      cores, 1.0, dps, 0, 0, 1.0, 1.0, "d")
    // rep 1: clean @2 (fast 1600), storm-hit @8 (slow 4000)
    // rep 2: storm-hit @2 (slow 1300), clean @8 (fast 5200)
    val reps = Seq(
      ScalingBench.Rep(run(2, 1600.0), run(8, 4000.0)), // eff .625
      ScalingBench.Rep(run(2, 1300.0), run(8, 5200.0))) // eff 1.0
    // per-rep effs are both contaminated; the estimator pairs the two
    // least-contended runs: 5200 / (4 * 1600) = 0.8125
    assert(math.abs(ScalingBench.minTimeEfficiency(reps) - 0.8125) < 1e-9)
    assertThrows[IllegalArgumentException](
      ScalingBench.minTimeEfficiency(Nil))
  }

  test("ranked min-time pairs each level's (rank+1)-th fastest run") {
    def run(cores: Int, dps: Double) = ScalingBench.RunResult(
      cores, 1.0, dps, 0, 0, 1.0, 1.0, "d")
    val reps = Seq(
      ScalingBench.Rep(run(2, 1600.0), run(8, 4000.0)),
      ScalingBench.Rep(run(2, 1300.0), run(8, 5200.0)),
      ScalingBench.Rep(run(2, 1500.0), run(8, 4800.0)))
    // rank 0 == the min-time estimator itself
    assert(math.abs(ScalingBench.minTimeRanked(reps, 0) -
      ScalingBench.minTimeEfficiency(reps)) < 1e-12)
    // rank 1: 2nd-fastest per level = 4800 / (4 * 1500)
    assert(math.abs(ScalingBench.minTimeRanked(reps, 1) - 0.8) < 1e-12)
    // rank 2: slowest per level = 4000 / (4 * 1300)
    assert(math.abs(ScalingBench.minTimeRanked(reps, 2) - 4000.0 / 5200.0) < 1e-12)
    assertThrows[IllegalArgumentException](ScalingBench.minTimeRanked(reps, 3))
    assertThrows[IllegalArgumentException](ScalingBench.minTimeRanked(reps, -1))
  }

  test("dirt regression recovers a perfect eff-vs-dirt line, None when degenerate") {
    val base = Map("cpu@2" -> 1.0, "mem@2" -> 1.0, "cpu@8" -> 1.0, "mem@8" -> 1.0)
    def rep(dirtCpuAt2: Double, bDps: Double) = ScalingBench.Rep(
      ScalingBench.RunResult(2, 1.0, 1000.0, 0, 0, dirtCpuAt2, 1.0, "d"),
      ScalingBench.RunResult(8, 1.0, bDps, 0, 0, 1.0, 1.0, "d"))
    // eff = 0.9 - 0.2 * dirt, exactly: dirt 0 -> 0.9, 0.5 -> 0.8, 1 -> 0.7
    val reps = Seq(rep(1.0, 3600.0), rep(1.5, 3200.0), rep(2.0, 2800.0))
    val Some((alpha, beta, hw)) = ScalingBench.dirtRegression(reps, base)
    assert(math.abs(alpha - 0.9) < 1e-9)
    assert(math.abs(beta - -0.2) < 1e-9)
    assert(hw < 1e-6) // zero residuals -> zero intercept width
    // fewer than 3 reps, or zero dirt variance: no regression
    assert(ScalingBench.dirtRegression(reps.take(2), base).isEmpty)
    val flat = Seq(rep(1.5, 3600.0), rep(1.5, 3200.0), rep(1.5, 2800.0))
    assert(ScalingBench.dirtRegression(flat, base).isEmpty)
  }

  test("dirt sweep ranks by worst probe ratio, clamps the k ladder, ends at the raw mean") {
    val base = Map("cpu@2" -> 1.0, "mem@2" -> 1.0, "cpu@8" -> 1.0, "mem@8" -> 1.0)
    def rep(dirtCpuAt8: Double, bDps: Double) = ScalingBench.Rep(
      ScalingBench.RunResult(2, 1.0, 1000.0, 0, 0, 1.0, 1.0, "d"),
      ScalingBench.RunResult(8, 1.0, bDps, 0, 0, dirtCpuAt8, 1.0, "d"))
    // effs 0.90/0.85/0.80/0.75 at dirt 0.0/0.1/0.2/0.3 (given shuffled)
    val reps = Seq(rep(1.2, 3200.0), rep(1.0, 3600.0),
      rep(1.3, 3000.0), rep(1.1, 3400.0))
    val sweep = ScalingBench.dirtSweep(reps, base, ks = Seq(2, 3, 9))
    // ladder: ks below size kept, oversize dropped, full set appended
    assert(sweep.map(_._1) == Seq(2, 3, 4))
    // each row's max-dirt is the k-th cleanest window's dirt
    assert(sweep.map(_._2).zip(Seq(0.1, 0.2, 0.3))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // means over the cleanest k: (.90+.85)/2, +.80, +.75 — monotone down
    assert(sweep.map(_._3).zip(Seq(0.875, 2.55 / 3, 0.825))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // last row IS the raw mean over all reps
    assert(math.abs(sweep.last._3 - reps.map(_.eff).sum / reps.size) < 1e-12)
    // a ladder k equal to the rep count is not duplicated
    assert(ScalingBench.dirtSweep(reps, base, ks = Seq(4)).map(_._1) == Seq(4))
    assert(ScalingBench.dirtSweep(Nil, base).isEmpty)
  }

  test("bootstrap CI is deterministic, ordered and brackets the mean") {
    val xs = Seq(0.742, 0.817, 0.679, 0.843, 0.664, 0.831, 0.845, 0.698,
      0.934, 0.919, 0.774, 0.819)
    val (lo, hi) = ScalingBench.bootstrapCI(xs)
    val (lo2, hi2) = ScalingBench.bootstrapCI(xs)
    assert((lo, hi) == (lo2, hi2)) // fixed seed => committed report reproduces
    val mean = xs.sum / xs.size
    assert(lo < mean && mean < hi)
    assert(hi - lo < 0.2) // 12 reps with sd ~0.086 => CI width ~0.1
    // degenerate single observation: CI collapses onto it
    val (l1, h1) = ScalingBench.bootstrapCI(Seq(0.8))
    assert(l1 == 0.8 && h1 == 0.8)
    assertThrows[IllegalArgumentException](ScalingBench.bootstrapCI(Nil))
  }

  test("hbFloor parses only this workload's heartbeats and takes minima") {
    val path = "/tmp/graft-hbfloor-test.jsonl"
    val wl = "r7-extractV6" // must match ScalingBench.WorkloadVersion
    Files.writeString(Paths.get(path),
      s"""{"event":"hb","workload":"$wl","n":2,"nDocs":100,"inv":1,"ts":"t","detail":"pre-poll 0 cpu@8=1.52 mem@8=0.81 clean=false"}
         |{"event":"hb","workload":"$wl","n":2,"nDocs":100,"inv":1,"ts":"t","detail":"pre-poll 1 cpu@8=1.35 mem@8=0.92 clean=false"}
         |{"event":"hb","workload":"OTHER","n":2,"nDocs":100,"inv":1,"ts":"t","detail":"pre-poll 0 cpu@8=0.01 mem@8=0.01 clean=true"}
         |{"event":"hb","workload":"$wl","n":4,"nDocs":100,"inv":1,"ts":"t","detail":"pre-poll 0 cpu@16=0.02 mem@16=0.02 clean=true"}
         |{"event":"rep-start","workload":"$wl","n":2,"nDocs":100,"inv":1,"ts":"t","detail":"attempt 1"}
         |""".stripMargin)
    // other workloads, other spans and non-hb rows are all excluded
    assert(ScalingBench.hbFloor(2, 100, path) === Some((2, 1.35, 0.81)))
    assert(ScalingBench.hbFloor(2, 999, path) === None)
    assert(ScalingBench.hbFloor(2, 100, "/tmp/graft-hbfloor-none") === None)
    Files.deleteIfExists(Paths.get(path))
  }

  test("deleteRecursively removes nested scratch and tolerates absence") {
    val root = Files.createTempDirectory("graft-delrec")
    Files.createDirectories(root.resolve("a/b"))
    Files.writeString(root.resolve("a/b/f.txt"), "x")
    Files.writeString(root.resolve("g.txt"), "y")
    ScalingBench.deleteRecursively(root.toString)
    assert(!Files.exists(root))
    ScalingBench.deleteRecursively(root.toString) // second call: no-op
  }
}
