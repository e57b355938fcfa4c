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

  test("symbol chunks: typed per the reference arm, 50-line cap, 1-based") {
    // chunking.rs:57-96: one chunk per symbol, [line, line+49] capped at
    // EOF, Function|Method -> function, Class|Type -> class, _ -> module
    val body = (1 to 60).map(i => s"  body$i").mkString("\n")
    val text = s"def alpha_fn():\n$body\nclass beta_cls:\n  x = 1\nconst gamma_c = 2"
    val pages = Seq((1L, text)).toDF("doc_id", "text")
    val syms = graft.symbols.Symbols.extractCode(pages)
    val got = Chunking.symbolChunks(pages, syms)
      .select("name", "chunk_type", "start_line", "end_line", "chunk_text")
      .as[(String, String, Int, Int, String)].collect().sortBy(_._3)
    val nLines = text.split("\n", -1).length // 64
    // def on line 1: capped window [1, 50]
    assert(got(0) == (("alpha_fn", "function", 1, 50,
      text.split("\n", -1).slice(0, 50).mkString("\n"))))
    // class on line 62: short trailing window [62, 64]
    assert(got(1)._1 == "beta_cls" && got(1)._2 == "class" &&
      got(1)._3 == 62 && got(1)._4 == nLines)
    // const -> module type
    assert(got(2)._1 == "gamma_c" && got(2)._2 == "module" &&
      got(2)._3 == 64 && got(2)._4 == 64)
  }

  test("typedChunks dispatch: symbol docs typed, symbol-less docs fixed") {
    val codey = (2L, "def foo_fn():\n  return 1\nplain line")
    val prose = (3L, (0 until 10).map(i => s"prose line$i").mkString("\n"))
    val pages = Seq(codey, prose).toDF("doc_id", "text")
    val syms = graft.symbols.Symbols.extractCode(pages)
    val got = Chunking.typedChunks(pages, syms, sizeLines = 8, overlap = 2)
      .select("doc_id", "name", "chunk_type", "start_line", "end_line")
      .as[(Long, Option[String], String, Int, Int)].collect()
    val byDoc = got.groupBy(_._1)
    assert(byDoc(2L).forall(_._3 == "function"))
    assert(byDoc(2L).forall(_._2.contains("foo_fn")))
    // prose doc: fixed windows, 1-based inclusive lines, null name
    assert(byDoc(3L).forall(r => r._3 == "fixed" && r._2.isEmpty))
    assert(byDoc(3L).map(r => (r._4, r._5)).toSet == Set((1, 8), (7, 10)))
  }

  test("CRLF content chunks identically to LF (reference lines() strips \\r)") {
    val lf = Seq((1L, (0 until 12).map(i => s"l$i").mkString("\n")))
      .toDF("doc_id", "text")
    val crlf = Seq((1L, (0 until 12).map(i => s"l$i").mkString("\r\n")))
      .toDF("doc_id", "text")
    val a = Chunking.chunks(lf, 8, 2).select("chunk", "chunk_text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = Chunking.chunks(crlf, 8, 2).select("chunk", "chunk_text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b)
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
