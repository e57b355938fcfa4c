package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.PagesCorpus
import graft.deps.Deps
import graft.index.IndexBuilder
import graft.query.Bm25Query

class DepsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resolveEdges: broadcast resolution join, self-edges dropped") {
    val imports = Seq((1L, "a"), (2L, "a"), (3L, "b"), (10L, "a"), (7L, "zz"))
      .toDF("from_doc", "import_key")
    val targets = Seq(("a", 1L), ("b", 3L)).toDF("import_key", "to_doc")
    val edges = Deps.resolveEdges(imports, targets)
      .as[(Long, Long)].collect().toSet
    // 1->a and 3->b are self-edges; "zz" is unresolvable
    assert(edges == Set((2L, 1L), (10L, 1L)))
  }

  test("edgesFromHtml: href extraction + url-dictionary resolution") {
    val pages = Seq(
      (1L, "<p>x</p><a href=\"u2\">two</a> mid <a href=\"u3\">three</a>" +
        "<a href=\"https://elsewhere/off-corpus\">gone</a>"),
      (2L, "<a href=\"u1\">one</a> no other links"),
      (3L, "<a href=\"u3\">self link</a>"),
      (4L, "no anchors at all")).toDF("doc_id", "html")
    val dict = Seq(("u1", 1L), ("u2", 2L), ("u3", 3L))
      .toDF("import_key", "to_doc")
    val edges = Deps.edgesFromHtml(pages, dict)
      .as[(Long, Long)].collect().toSet
    // off-corpus href unresolved, self-edge dropped, anchorless doc inert
    assert(edges == Set((1L, 2L), (1L, 3L), (2L, 1L)))
  }

  test("inDegree, dependents, dependencies, staticRank formula") {
    val edges = Seq((2L, 1L), (10L, 1L), (5L, 3L), (1L, 3L), (9L, 3L))
      .toDF("from_doc", "to_doc")
    val ind = Deps.inDegree(edges).as[(Long, Long)].collect().toMap
    assert(ind == Map(1L -> 2L, 3L -> 3L))
    assert(Deps.dependents(edges, 3L).as[Long].collect().toSet == Set(5L, 1L, 9L))
    assert(Deps.dependencies(edges, 1L).as[Long].collect().toSet == Set(3L))
    val rank = Deps.staticRank(edges).as[(Long, Double)].collect().toMap
    // reference formula 1 + log10(n) * 0.5 (engine.rs:2003-2007)
    assert(rank(1L) == 1.0 + math.log10(2.0) * 0.5)
    assert(rank(3L) == 1.0 + math.log10(3.0) * 0.5)
  }

  test("searchBoosted multiplies BM25 by static rank (absent docs = 1.0)") {
    val dir = Files.createTempDirectory("graft-deps-idx").toString
    val pages = IndexBuilder.extractPages(
      PagesCorpus.pages(spark, 120, parts = 2).toDF())
    val index = IndexBuilder.build(spark, pages, dir, blockBits = 6)
    val q = s"${PagesCorpus.vocab(3)} ${PagesCorpus.vocab(7)}"
    val base = Bm25Query.searchNaive(index, q, 1000).collect()
    assert(base.nonEmpty)
    // boost half the hit docs by a known factor
    val boosted = base.map(_.doc_id).filter(_ % 2 == 0)
    val rank = boosted.toSeq.map(d => (d, 1.5)).toDF("doc_id", "static_rank")
    val got = Bm25Query.searchBoosted(index, q, 1000, rank).collect()
    val want = base.map(h =>
      (h.doc_id, if (h.doc_id % 2 == 0) h.score * 1.5 else h.score))
      .sortBy { case (d, s) => (-s, d) }
      .zipWithIndex.map { case ((d, s), i) => (d, s, i + 1) }
    assert(got.map(h => (h.doc_id, h.score, h.rank)).toSeq == want.toSeq)

    // PRODUCTION block path (boost broadcast into the WAND merge, bounds
    // scaled by max rank): bit-identical to the declarative path, in
    // both modes, incl. a boost > 1 that can reorder docs across blocks
    for (conj <- Seq(true, false)) {
      val dGot = Bm25Query.searchBoosted(index, q, 1000, rank, conj).collect()
      val bGot = Bm25Query.searchBlocksBoosted(index, q, 1000, rank, conj)
        .collect()
      assert(bGot.map(h => (h.doc_id, h.score, h.rank, h.url)).toSeq ==
        dGot.map(h => (h.doc_id, h.score, h.rank, h.url)).toSeq,
        s"block-path boosted differs (conj=$conj)")
    }
    // small k forces the scaled pruning bounds to actually cut
    val dTop = Bm25Query.searchBoosted(index, q, 3, rank).collect()
    val bTop = Bm25Query.searchBlocksBoosted(index, q, 3, rank).collect()
    assert(bTop.map(h => (h.doc_id, h.score)).toSeq ==
      dTop.map(h => (h.doc_id, h.score)).toSeq)
  }
}
