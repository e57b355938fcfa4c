package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.corpus.PagesCorpus
import graft.index.IndexBuilder
import graft.query.Bm25Query

/** Two-cluster-size scaling evidence (BASELINE.json north_rule): run the
  * IDENTICAL index-build + query workload at local[N] and local[4N] on the
  * same input, report docs/sec at both, scaling efficiency
  * = throughput(4N) / (4 * throughput(N)), and assert the top-k results
  * are identical across parallelism levels (the determinism gate).
  * Writes BENCH/BASELINE.md.
  *
  * Usage: runMain graft.ScalingBench [nDocs] [N]   (defaults 40000, 8)
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def querySet: Seq[(String, Boolean)] = {
    val needles = (0 until 10).map(i => (PagesCorpus.needleTerm(i), true))
    val heads = (0 until 5).map(i => (PagesCorpus.vocab(i), true))
    val conj = (0 until 10).map(i =>
      (s"${PagesCorpus.vocab(3 + i)} ${PagesCorpus.vocab(40 + 7 * i)}", true))
    val disj = (0 until 5).map(i =>
      (s"${PagesCorpus.vocab(20 + i)} ${PagesCorpus.vocab(100 + i)}", false))
    needles ++ heads ++ conj ++ disj
  }

  private case class RunResult(cores: Int, buildSec: Double, docsPerSec: Double,
      p50Ms: Double, p95Ms: Double, topk: Seq[Seq[(Long, Double)]])

  private def runAt(cores: Int, nDocs: Long): RunResult = {
    val spark = session(cores)
    try {
      val dir = Files.createTempDirectory(s"graft-scale-$cores").toString
      val raw = PagesCorpus.pages(spark, nDocs, parts = math.max(cores * 2, 16))
      val t0 = System.nanoTime()
      val extracted = IndexBuilder.extractPages(raw.toDF())
      val idx = IndexBuilder.build(spark, extracted, dir)
      val buildSec = (System.nanoTime() - t0) / 1e9
      // warm one query, then measure
      Bm25Query.searchBlocks(idx, PagesCorpus.vocab(9), 10).collect()
      val lat = querySet.map { case (q, conj) =>
        val q0 = System.nanoTime()
        val hits = Bm25Query.searchBlocks(idx, q, 10, conj).collect()
        ((System.nanoTime() - q0) / 1e6,
          hits.map(h => (h.doc_id, h.score)).toSeq)
      }
      val sorted = lat.map(_._1).sorted
      def pct(p: Double) = sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))
      RunResult(cores, buildSec, nDocs / buildSec, pct(0.5), pct(0.95), lat.map(_._2))
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 40000L
    val n = if (args.length > 1) args(1).toInt else 8
    // JIT warmup: a small untimed build so the first measured run is not
    // penalized by cold codegen/JIT (it inflated efficiency to >1 before).
    runAt(n, math.max(2000L, nDocs / 20))
    val rN = runAt(n, nDocs)
    val r4N = runAt(4 * n, nDocs)
    val eff = r4N.docsPerSec / (4.0 * rN.docsPerSec)
    val identical = rN.topk == r4N.topk

    val md =
      f"""# BENCH / BASELINE — scaling evidence (N vs 4N parallelism)
         |
         |North rule realization in this sandbox (no multi-node cluster):
         |the IDENTICAL index-build + query workload runs at `local[$n]` and
         |`local[${4 * n}]` on the same ${nDocs}-doc generated pages corpus
         |(seed 42). Efficiency = docs_per_sec(4N) / (4 x docs_per_sec(N)).
         |
         || parallelism | build wall (s) | index docs/sec | query p50 (ms) | query p95 (ms) |
         ||---|---|---|---|---|
         || local[$n]  | ${rN.buildSec}%.1f | ${rN.docsPerSec}%.0f | ${rN.p50Ms}%.1f | ${rN.p95Ms}%.1f |
         || local[${4 * n}] | ${r4N.buildSec}%.1f | ${r4N.docsPerSec}%.0f | ${r4N.p50Ms}%.1f | ${r4N.p95Ms}%.1f |
         |
         |- **Scaling efficiency (index build): ${eff}%.3f** (target >= 0.8)
         |- **Top-k identical across parallelism levels: $identical** (30-query
         |  workload: needles, head terms, conjunctive + disjunctive pairs;
         |  docIDs AND scores compared exactly)
         |- Query set: 30 queries, k=10, block/WAND path, warm session.
         |- Reference baseline numbers: see BASELINE.md (the reference is a
         |  single-node in-RAM engine; its ~100 MB/s single-node indexing and
         |  ms-scale hot-RAM query latencies anchor the per-node budget, not
         |  the distributed design).
         |""".stripMargin
    Files.createDirectories(java.nio.file.Paths.get("BENCH"))
    Files.writeString(java.nio.file.Paths.get("BENCH/BASELINE.md"), md)
    println(md)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","identical_topk":$identical}""")
  }
}
