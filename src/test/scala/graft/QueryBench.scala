package graft

import java.nio.file.Files

import graft.corpus.PagesCorpus
import graft.index.IndexBuilder
import graft.query.Bm25Query

/** Serving-mode query-latency probe (scratch tool): build over the cached
  * 200k-doc corpus, pin hot tables + driver dictionary, run the
  * ScalingBench 30-query workload twice (first pass warms), report p50 /
  * p95 of the second pass. Complements ScalingBench (which measures the
  * same thing inside the scaling protocol) without overwriting
  * BENCH/BASELINE.md.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = s"${System.getProperty("java.io.tmpdir")}/graft-scale-corpus-$nDocs"
    val raw =
      if (Files.exists(java.nio.file.Paths.get(corpus, "_SUCCESS")))
        spark.read.parquet(corpus)
      else PagesCorpus.pages(spark, nDocs, parts = 64).toDF()
    val dir = Files.createTempDirectory("graft-qbench").toString
    val idx = IndexBuilder.build(spark, IndexBuilder.extractPages(raw), dir)
      .cacheHot().cacheDictionary()

    val queries =
      (0 until 10).map(i => (PagesCorpus.needleTerm(i), true)) ++
      (0 until 5).map(i => (PagesCorpus.vocab(i), true)) ++
      (0 until 10).map(i =>
        (s"${PagesCorpus.vocab(3 + i)} ${PagesCorpus.vocab(40 + 7 * i)}", true)) ++
      (0 until 5).map(i =>
        (s"${PagesCorpus.vocab(20 + i)} ${PagesCorpus.vocab(100 + i)}", false))

    def pass(): Seq[Double] = queries.map { case (q, conj) =>
      val t0 = System.nanoTime()
      Bm25Query.searchBlocks(idx, q, 10, conj).collect()
      (System.nanoTime() - t0) / 1e6
    }
    pass() // warm
    val lat = pass().sorted
    def pct(p: Double) = lat(math.min(lat.size - 1, (p * lat.size).toInt))
    println(f"[qbench] n=$nDocs queries=${lat.size} " +
      f"p50=${pct(0.5)}%.1fms p95=${pct(0.95)}%.1fms min=${lat.min}%.1fms max=${lat.max}%.1fms")
    spark.stop()
  }
}
