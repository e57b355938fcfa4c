package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.corpus.PagesCorpus
import graft.extract.Extract
import graft.index.IndexBuilder
import graft.query.RegexQuery

/** Round-6 batched regex serving: [[RegexQuery.searchBatch]] must return
  * BIT-IDENTICAL per-query results (doc_ids, scores, ranks, urls) to
  * [[RegexQuery.search]] across every query class — ranked (single
  * branch, complete terms), accelerated (alternation / open-sided
  * literals through the shared postings pass), full-scan (no usable
  * literal), empty (literal absent), and their mix in one batch —
  * and chunking the verify collect must not change any result.
  */
class RegexBatchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val (idx, pages) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-rxb").toString
    val base = IndexBuilder.extractPages(
      PagesCorpus.pages(spark, 300, parts = 4).toDF())
      .where(Extract.safe(col("text")))
    val extra = Seq(
      (910000L, "https://x/alt1", "metadata join rendezvous"),
      (910001L, "https://x/alt2", "dashboard rendezvous"),
      (910002L, "https://x/pre", "rendezvousness prefix-extended token"),
      (910003L, "https://x/suf", "unrendezvous suffix-embedded token"))
      .toDF("doc_id", "url", "text")
    val p = base.unionByName(extra)
    (IndexBuilder.build(spark, p, dir, blockBits = 6), p)
  }

  private val patterns = Seq(
    s" ${PagesCorpus.vocab(2)} ${PagesCorpus.vocab(7)} ",  // ranked (bothBound)
    "(data|dash)board",                                    // accelerated, alternation
    "\\srendez\\w+",                                       // accelerated, prefix range
    "\\w+vous\\s",                                         // accelerated, suffix (terms_rev)
    "re..ez.ous",                                          // accelerated, infix trigram ('ous')
    "ba.a",                                                // full scan (no literal > 2 chars)
    "l.rl.r",                                              // full scan, distinct regex same pass
    " zzzznotthere ",                                      // ranked but absent -> empty
    s" ${PagesCorpus.vocab(5)} ")                          // ranked, single term

  private def asTuples(hits: Seq[graft.query.Hit]): Seq[(Long, String, Double, Int)] =
    hits.map(h => (h.doc_id, h.url, h.score, h.rank))

  test("batch == single per query across all classes") {
    val batch = RegexQuery.searchBatch(idx, pages, patterns, 20)
    patterns.zipWithIndex.foreach { case (p, qi) =>
      val single = RegexQuery.search(idx, pages, p, 20).collect().toSeq
      assert(asTuples(batch(qi)) == asTuples(single), s"pattern '$p'")
    }
    assert(batch.count(_.nonEmpty) >= 5, "fixture should exercise non-empty classes")
    assert(batch(patterns.indexOf(" zzzznotthere ")).isEmpty)
  }

  test("tiny verify-collect budget (one leg per chunk) == unchunked") {
    val one = RegexQuery.searchBatch(idx, pages, patterns, 20)
    val chunked = RegexQuery.searchBatch(idx, pages, patterns, 20,
      maxCollectRows = 1L)
    patterns.indices.foreach(qi =>
      assert(asTuples(one(qi)) == asTuples(chunked(qi)), s"query $qi"))
  }
}
