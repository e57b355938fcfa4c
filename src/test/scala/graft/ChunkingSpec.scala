package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Chunking

/** Line-window chunking (reference chunking.rs:20-28 semantics: fixed
  * window, overlap, trailing chunk may be short, ids contiguous from 0).
  */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(n: Int): (Long, String) =
    (n.toLong, (0 until n).map(i => s"line$i").mkString("\n"))

  test("chunks match the window definition for varied doc lengths") {
    val size = 8; val overlap = 2; val step = size - overlap
    val docs = Seq(1, 2, 7, 8, 9, 13, 14, 20, 40).map(doc)
    val got = Chunking.chunks(docs.toDF("doc_id", "text"), size, overlap)
      .select("doc_id", "chunk", "start_line", "end_line", "n_lines", "chunk_text")
      .as[(Long, Long, Int, Int, Long, String)]
      .collect().groupBy(_._1)
    for ((id, text) <- docs) {
      val nLines = text.split("\n", -1).length
      val want = (0 to (nLines - 1) / step).map { c =>
        val lo = c * step
        val hi = math.min(lo + size, nLines)
        (id, c.toLong, lo, hi - 1, (hi - lo).toLong,
          (lo until hi).map(i => s"line$i").mkString("\n"))
      }
      assert(got(id).sortBy(_._2).toSeq == want, s"doc of $nLines lines")
    }
  }

  test("every line is covered; consecutive chunks overlap by exactly `overlap`") {
    val size = 8; val overlap = 2
    val ch = Chunking.chunks(Seq(doc(23)).toDF("doc_id", "text"), size, overlap)
      .select("chunk", "start_line", "end_line")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    val covered = ch.flatMap { case (_, a, b) => a to b }.toSet
    assert(covered == (0 until 23).toSet)
    ch.sliding(2).foreach {
      case Array((_, _, e1), (s2, a2, _)) =>
        assert(e1 - a2 + 1 == overlap || s2 == ch.last._1,
          "interior chunks overlap by exactly `overlap` lines")
      case _ =>
    }
  }

  test("empty text yields one single-line chunk (split of '' is [''])") {
    val ch = Chunking.chunks(Seq((1L, "")).toDF("doc_id", "text"))
      .collect()
    assert(ch.length == 1 && ch.head.getAs[Long]("n_lines") == 1L)
  }

  test("chunks feed the BM25 stack as retrieval units (chunk-level search)") {
    // a needle on line 12 of doc 7 must surface exactly the chunks whose
    // window covers line 12 (size=8 step=6: chunks 1 and 2)
    val base = (0 until 20).map(i =>
      if (i == 12) "needleline unique here" else s"filler common line$i")
    val pages = Seq((7L, base.mkString("\n"))).toDF("doc_id", "text")
    val ch = Chunking.chunks(pages, 8, 2)
    val asDocs = ch.select(
      (org.apache.spark.sql.functions.col("doc_id") * 1000 +
        org.apache.spark.sql.functions.col("chunk")).as("doc_id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("chunk-"),
        org.apache.spark.sql.functions.col("chunk")).as("url"),
      org.apache.spark.sql.functions.col("chunk_text").as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk-idx").toString
    val idx = graft.index.IndexBuilder.build(spark, asDocs, dir, blockBits = 4)
    val hits = graft.query.Bm25Query.searchBlocks(idx, "needleline", 10).collect()
    assert(hits.map(_.doc_id).toSet == Set(7001L, 7002L))
  }
}
