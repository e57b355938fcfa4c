package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.PagesCorpus
import graft.extract.Extract
import graft.tokenize.Tokenizer

class CorpusSpec extends AnyFunSuite {

  private val n = 200L

  test("generator is a pure function of (seed,row): parallelism-invariant") {
    val spark = TestSpark.spark
    val a = PagesCorpus.pages(spark, n, parts = 2).collect().sortBy(_.doc_id)
    val b = PagesCorpus.pages(spark, n, parts = 7).collect().sortBy(_.doc_id)
    assert(a.length == n && b.length == n)
    a.zip(b).foreach { case (x, y) =>
      assert(x.doc_id == y.doc_id && x.url == y.url && x.text == y.text &&
        x.lang == y.lang && java.util.Arrays.equals(x.html, y.html))
    }
  }

  test("per-row invariant: extracted text is byte-identical per url") {
    val spark = TestSpark.spark
    val rows = PagesCorpus.pages(spark, n, parts = 4).collect()
    rows.foreach { p =>
      val got = Extract.transcodeToUtf8(p.html)
      assert(got.contains(p.text), s"row ${p.doc_id} (enc case ${p.doc_id % 20})")
    }
  }

  test("needle manifest matches generated tf exactly") {
    (0 until 3).foreach { i =>
      val hosts = PagesCorpus.needleDocs(i, n)
      hosts.foreach { case (row, tf) =>
        val toks = Tokenizer.tokenize(PagesCorpus.text(PagesCorpus.Seed, row))
        assert(toks.count(_ == PagesCorpus.needleTerm(i)) == tf,
          s"needle $i doc $row")
      }
    }
    // needles never appear outside their manifest docs
    val all = (0L until n).flatMap { r =>
      Tokenizer.tokenize(PagesCorpus.text(PagesCorpus.Seed, r))
        .filter(_.startsWith("needle")).map(t => (t, r))
    }
    val manifest = (0 until PagesCorpus.NeedleCount).flatMap { i =>
      PagesCorpus.needleDocs(i, n).flatMap { case (r, tf) =>
        Seq.fill(tf)((PagesCorpus.needleTerm(i), r))
      }
    }
    assert(all.sorted == manifest.sorted)
  }

  test("round-6 charset rows: unlabeled decode + comment-skip (explicit)") {
    // unlabeled KOI8-R / Shift_JIS / windows-1251 rows decode to real
    // script via the v5 classifier — no declaration anywhere in the page
    def decoded(row: Long): String =
      Extract.transcodeToUtf8(PagesCorpus.html(PagesCorpus.Seed, row)).get
    assert(decoded(8).endsWith(PagesCorpus.Koi8Tail))
    assert(decoded(9).endsWith(PagesCorpus.SjisTail))
    assert(decoded(10).endsWith(PagesCorpus.Win1251Tail))
    assert(!PagesCorpus.text(PagesCorpus.Seed, 8).contains("meta"))
    // the declared-KOI8 disagree row now carries a commented-out SJIS
    // meta BEFORE the live declaration: the prescan must skip it
    val t5 = decoded(5)
    assert(t5.startsWith("<!--<meta charset=shift_jis>-->"))
    assert(t5.endsWith(PagesCorpus.Koi8Tail))
  }

  test("round-7 charset rows: unlabeled Greek / Hebrew / Thai decode (explicit)") {
    def decoded(row: Long): String =
      Extract.transcodeToUtf8(PagesCorpus.html(PagesCorpus.Seed, row)).get
    assert(decoded(11).endsWith(PagesCorpus.GreekTail))
    assert(decoded(12).endsWith(PagesCorpus.HebrewTail))
    assert(decoded(13).endsWith(PagesCorpus.ThaiTail))
    // no declaration anywhere — only the v6 classifier reaches these
    Seq(11L, 12L, 13L).foreach(r =>
      assert(!PagesCorpus.text(PagesCorpus.Seed, r).contains("meta")))
  }

  test("safety rows fail the gate; all others pass") {
    (0L until n).foreach { r =>
      val safe = Extract.isSafe(PagesCorpus.expectedText(PagesCorpus.Seed, r))
      assert(safe == !PagesCorpus.isSafetyRow(r), s"row $r")
    }
  }
}
