package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Chunking, Dedup}

/** Round-8 focused internals tests — one per optimization that changed
  * an operator's internals without (by contract) changing its results:
  *
  *  - connectedComponents: the bounded driver union-find shortcut must
  *    produce EXACTLY the distributed alternating-contraction output
  *    (same ids, same min labels) on graphs with chains, stars,
  *    multi-component mixes and reversed/duplicate edges;
  *  - Chunking.chunks: the array-domain derivation must reproduce the
  *    line-membership definition (line L in chunk c iff
  *    c*step <= L < c*step+size) for a sweep of (size, overlap, nLines);
  *  - Par.spread: repartitioning is content-invariant and only a
  *    partitioning change.
  */
class R8OptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("driver union-find equals the distributed contraction exactly") {
    val edges = Seq(
      // chain 1-2-3-4, star around 10, two-node comp, dupes + reversed
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (12L, 10L), (10L, 13L), (11L, 13L),
      (20L, 21L), (21L, 20L), (2L, 1L), (1L, 2L),
      // larger random-ish blob
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 30L), (34L, 31L),
      (35L, 36L), (36L, 34L))
    val df = edges.toDF("a", "b")
    val viaDriver = Dedup.connectedComponents(df)
      .as[(Long, Long)].collect().toSet
    val viaStars = Dedup.connectedComponents(df, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toSet
    assert(viaDriver == viaStars)
    // and the labels are the component minima
    assert(viaDriver.contains((4L, 1L)) && viaDriver.contains((13L, 10L)) &&
      viaDriver.contains((21L, 20L)) && viaDriver.contains((36L, 30L)))
    assert(viaDriver.map(_._1).size == viaDriver.size) // one row per node
  }

  test("array-domain chunks reproduce the line-membership definition") {
    for ((size, overlap) <- Seq((8, 2), (5, 0), (3, 2), (10, 9));
         nLines <- Seq(1, 2, 5, 17, 24)) {
      val text = (0 until nLines).map(i => s"line$i").mkString("\n")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val got = Chunking.chunks(df, size, overlap)
        .select("chunk", "start_line", "end_line", "n_lines", "chunk_text")
        .as[(Long, Int, Int, Long, String)].collect().toSet
      val step = size - overlap
      val want = (0 to (nLines - 1) / step).map { c =>
        val lines = (c * step until math.min(c * step + size, nLines))
        (c.toLong, lines.head, lines.last, lines.size.toLong,
          lines.map(i => s"line$i").mkString("\n"))
      }.toSet
      assert(got == want, s"size=$size overlap=$overlap nLines=$nLines")
    }
  }

  test("Par.spread is content-invariant and fires only on small file scans") {
    // generated (non-file) source: size estimates are unreliable, the
    // creator chose the parallelism — spread must be the identity
    val gen = spark.range(0, 1000).select(col("id"),
      concat(lit("payload-"), col("id")).as("s"))
    assert(Par.spread(gen) eq gen)
    // small parquet source: spread repartitions, content unchanged
    val dir = java.nio.file.Files.createTempDirectory("r8-spread").toString
    gen.coalesce(1).write.mode("overwrite").parquet(dir)
    val file = spark.read.parquet(dir)
    val spreadDf = Par.spread(file)
    assert(!(spreadDf eq file))
    assert(spreadDf.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(spreadDf.as[(Long, String)].collect().toSet ==
      file.as[(Long, String)].collect().toSet)
    assert(spreadDf.schema == file.schema)
  }
}
