package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.corpus.PagesCorpus
import graft.extract.Extract
import graft.index.IndexBuilder
import graft.query.RegexQuery

class RegexQuerySpec extends AnyFunSuite {

  test("requiredTokens: sound literal extraction") {
    // interior + \s-bounded tokens are complete
    assert(RegexQuery.requiredTokens("data\\s+join") == Seq("data", "join"))
    assert(RegexQuery.requiredTokens("data join merge") ==
      Seq("data", "join", "merge"))
    // quantifier makes the char optional and right boundary unknown:
    // "spark?" could match "spar" + more word chars -> no complete token
    assert(RegexQuery.requiredTokens("sparks?") == Seq())
    // "spark+ x" -> spark+ matches sparkk... not complete; prefix "spar"
    // has unknown right boundary -> dropped
    assert(RegexQuery.requiredTokens("spark+") == Seq())
    // dot breaks completeness on that side only
    assert(RegexQuery.requiredTokens("data.join") == Seq())
    assert(RegexQuery.requiredTokens("data .join ") == Seq("data"))
    // classes/groups/alternation -> conservative full scan
    assert(RegexQuery.requiredTokens("da(ta|sh)") == Seq())
    assert(RegexQuery.requiredTokens("[dm]ata") == Seq())
    assert(RegexQuery.requiredTokens("a|b") == Seq())
    // short tokens dropped (index has no len<=2 terms)
    assert(RegexQuery.requiredTokens("ab cd efgh") == Seq("efgh"))
    // \w extends words -> unknown boundary
    assert(RegexQuery.requiredTokens("\\wdata") == Seq())
    assert(RegexQuery.requiredTokens("\\bdata\\b") == Seq("data"))
  }

  test("regex search: accelerated path == full-scan path == ground truth") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("graft-rx").toString
    val raw = PagesCorpus.pages(spark, 300, parts = 4).toDF()
    val pages = IndexBuilder.extractPages(raw)
      .where(Extract.safe(col("text")))
    val idx = IndexBuilder.build(spark, pages, dir, blockBits = 6)

    val w1 = PagesCorpus.vocab(5); val w2 = PagesCorpus.vocab(12)
    val pattern = s"$w1\\s+$w2" // accelerated: both tokens required
    assert(RegexQuery.requiredTokens(pattern) == Seq(w1, w2))

    val got = RegexQuery.search(idx, pages, pattern, 1000)
      .collect().map(_.doc_id).toSet
    // ground truth: java regex over the oracle corpus
    val rx = ("(?s)" + pattern).r
    val want = pages.select("doc_id", "text").collect()
      .filter(r => rx.findFirstIn(r.getString(1).toLowerCase).isDefined)
      .map(_.getLong(0)).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture should produce at least one match")

    // full-scan fallback (no usable literal) must agree with ground truth
    val pat2 = s"$w1.$w2" // dot kills completeness -> full scan
    assert(RegexQuery.requiredTokens(pat2).isEmpty)
    val got2 = RegexQuery.search(idx, pages, pat2, 1000)
      .collect().map(_.doc_id).toSet
    val rx2 = ("(?s)" + pat2).r
    val want2 = pages.select("doc_id", "text").collect()
      .filter(r => rx2.findFirstIn(r.getString(1).toLowerCase).isDefined)
      .map(_.getLong(0)).toSet
    assert(got2 == want2)
  }
}
