package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.PagesCorpus
import graft.extract.Extract
import graft.index.IndexBuilder
import graft.oracle.Bm25Oracle
import graft.query.Bm25Query

/** Rank-identity + exact-score gate: distributed engine (both physical
  * paths) vs the single-node oracle on the fixed query workload
  * (FIXTURES.md §3, mirroring the reference validator's query-coverage
  * checks at /root/reference/src/bin/validator/validator.rs:464-692).
  */
class Bm25EngineSpec extends AnyFunSuite {

  private val n = 400L
  private lazy val spark = TestSpark.spark

  private lazy val (index, oracle) = {
    val dir = Files.createTempDirectory("graft-index").toString
    val raw = PagesCorpus.pages(spark, n, parts = 4)
    // full front end: html -> text (extraction), then build
    val extracted = IndexBuilder.extractPages(raw.toDF())
    val idx = IndexBuilder.build(spark, extracted, dir, blockBits = 6)
    // oracle corpus = safety-passed docs with the SAME extracted text
    val docs = raw.collect().toSeq
      .flatMap(p => Extract.transcodeToUtf8(p.html).map(t => (p.doc_id, t)))
      .filter { case (_, t) => Extract.isSafe(t) }
    (idx, Bm25Oracle(docs))
  }

  private val queries = Seq(
    PagesCorpus.needleTerm(0),                      // rare needle
    PagesCorpus.needleTerm(1),
    PagesCorpus.vocab(0),                           // head term (max df)
    PagesCorpus.vocab(1),
    s"${PagesCorpus.vocab(3)} ${PagesCorpus.vocab(7)}",        // conjunctive 2-term
    s"${PagesCorpus.vocab(0)} ${PagesCorpus.vocab(10)} ${PagesCorpus.vocab(25)}",
    s"${PagesCorpus.needleTerm(0)} ${PagesCorpus.vocab(0)}",   // needle + head
    "zzzznonexistenttermzzzz",                      // no-match
    s"zzzznonexistenttermzzzz ${PagesCorpus.vocab(0)}",        // partial-missing
    "ab")                            // short query -> all-docs fallback (P4)

  test("index stats are sane") {
    assert(index.stats.num_docs == oracle.numDocs)
    assert(index.stats.avgdl == oracle.avgdl)
    assert(index.stats.total_tokens == oracle.totalTokens)
  }

  test("naive path: rank-identical docIDs and exact-equal scores vs oracle") {
    for (q <- queries; conj <- Seq(true, false)) {
      val want = oracle.search(q, 20, conj)
      val got = Bm25Query.searchNaive(index, q, 20, conj).collect().toVector
      assert(got.map(_.doc_id) == want.map(_.doc_id),
        s"docIDs differ: q='$q' conj=$conj\n got=$got\nwant=$want")
      got.zip(want).foreach { case (g, w) =>
        assert(g.score == w.score, s"score differs: q='$q' doc=${g.doc_id}")
      }
    }
  }

  test("block path (WAND): rank-identical and exact-equal vs oracle") {
    for (q <- queries; conj <- Seq(true, false)) {
      val want = oracle.search(q, 20, conj)
      val got = Bm25Query.searchBlocks(index, q, 20, conj).collect().toVector
      assert(got.map(_.doc_id) == want.map(_.doc_id),
        s"docIDs differ: q='$q' conj=$conj\n got=$got\nwant=$want")
      got.zip(want).foreach { case (g, w) =>
        assert(g.score == w.score, s"score differs: q='$q' doc=${g.doc_id}")
      }
    }
  }

  test("adaptive OR-mode threshold bootstrap stays exact vs oracle") {
    // force the pre-pass (threshold 0) on disjunctive queries, including
    // the head-term cases where pruning actually bites
    for (q <- queries) {
      val want = oracle.search(q, 20, conjunctive = false)
      val got = Bm25Query.searchBlocks(index, q, 20, conjunctive = false,
        adaptiveThreshold = 0L).collect().toVector
      assert(got.map(_.doc_id) == want.map(_.doc_id),
        s"docIDs differ under adaptive bootstrap: q='$q'\n got=$got\nwant=$want")
      got.zip(want).foreach { case (g, w) =>
        assert(g.score == w.score, s"score differs: q='$q' doc=${g.doc_id}")
      }
    }
  }

  test("driver-resident dictionary (serving mode) changes nothing") {
    val q = s"${PagesCorpus.vocab(3)} ${PagesCorpus.vocab(7)}"
    val cold = Bm25Query.searchBlocks(index, q, 20).collect().toSeq
      .map(h => (h.doc_id, h.score))
    index.cacheDictionary()
    try {
      val hot = Bm25Query.searchBlocks(index, q, 20).collect().toSeq
        .map(h => (h.doc_id, h.score))
      assert(hot == cold)
      // missing-term short circuit still works through the map
      assert(Bm25Query.searchBlocks(index, "zzznope " + PagesCorpus.vocab(0),
        10).collect().isEmpty)
    } finally {
      // other tests in this suite share the index; leave state hot is fine
    }
  }

  test("needle queries surface exactly the manifest docs") {
    val hosts = PagesCorpus.needleDocs(0, n).map(_._1)
      .filterNot(PagesCorpus.isSafetyRow).toSet
    val got = Bm25Query.searchNaive(index, PagesCorpus.needleTerm(0), 50)
      .collect().map(_.doc_id).toSet
    assert(got == hosts)
  }

  test("include/exclude glob filter restricts candidates (P5 parity)") {
    import graft.query.PathFilter
    val inc = Seq("https://site-00*.example/**")
    val exc = Seq("**/page-000000??")
    val q = PagesCorpus.vocab(0)
    val want = {
      // oracle: score everything, filter urls, re-rank
      val all = oracle.search(q, 1000, conjunctive = true)
      all.filter(h => PathFilter.matches(PagesCorpus.url(h.doc_id), inc, exc))
        .take(10)
    }
    for (blocks <- Seq(false, true)) {
      val got = (if (blocks) Bm25Query.searchBlocks(index, q, 10, true, inc, exc)
                 else Bm25Query.searchNaive(index, q, 10, true, inc, exc))
        .collect().toVector
      assert(got.map(_.doc_id) == want.map(_.doc_id), s"blocks=$blocks")
      got.zip(want).foreach { case (g, w) => assert(g.score == w.score) }
    }
  }

  test("filtered block path: allow / deny / declarative modes all exact") {
    import org.apache.spark.sql.functions.col
    // sparse filter (1/3 of docs) exercises allow-mode; dense filter
    // (2/3) with a mid ceiling forces deny-mode (complement broadcast);
    // ceiling 1 defeats BOTH broadcasts -> the co-located shard path
    // (round 4; the declarative fallback now only serves legacy layouts)
    val sparse = index.docs.where(col("doc_id") % 3 === 0).select("doc_id")
    val dense = index.docs.where(col("doc_id") % 3 =!= 0).select("doc_id")
    val sparseN = sparse.count(); val denseN = dense.count()
    // deny ceiling: below the dense allow size, at/above its complement
    val denyCeil = denseN - 1
    assert(sparseN <= denyCeil, "fixture: complement must fit the ceiling")
    val cases = Seq(
      ("allow", sparse, Bm25Query.MaxBroadcastFilterDocs),
      ("deny", dense, denyCeil),
      ("sharded", sparse, 0L),
      ("sharded-dense", dense, 0L))
    // OR mode included deliberately: the bootstrap threshold must be
    // disabled under a filter (its lower bound is unsound when the
    // block-max doc can be filtered out)
    for (q <- Seq(PagesCorpus.vocab(0),
                  s"${PagesCorpus.vocab(3)} ${PagesCorpus.vocab(7)}");
         conj <- Seq(true, false);
         (mode, allowDf, ceil) <- cases) {
      val allowSet = allowDf.collect().map(_.getLong(0)).toSet
      val want = oracle.search(q, 1000, conj)
        .filter(h => allowSet.contains(h.doc_id)).take(10)
      val got = Bm25Query.searchBlocksFiltered(index, q, 10, conj, allowDf,
        maxBroadcastDocs = ceil).collect().toVector
      assert(got.map(_.doc_id) == want.map(_.doc_id),
        s"docIDs differ: q='$q' conj=$conj mode=$mode\n got=$got\nwant=$want")
      got.zip(want).foreach { case (g, w) =>
        assert(g.score == w.score, s"score differs: mode=$mode doc=${g.doc_id}")
      }
    }
    // empty allow-set short-circuits
    assert(Bm25Query.searchBlocksFiltered(index, PagesCorpus.vocab(0), 10,
      conjunctive = true,
      sparse.where(col("doc_id") < 0)).collect().isEmpty)
  }

  test("batched serving: one job answers the whole workload bit-identically") {
    val batch = queries.flatMap(q => Seq((q, true), (q, false)))
    val got = Bm25Query.searchBlocksBatch(index, batch, 20)
    batch.zip(got).foreach { case ((q, conj), hits) =>
      val want = Bm25Query.searchBlocks(index, q, 20, conj).collect().toVector
      assert(hits.map(h => (h.doc_id, h.score, h.rank, h.url)) ==
        want.map(h => (h.doc_id, h.score, h.rank, h.url)),
        s"batch result differs: q='$q' conj=$conj")
    }
  }

  test("sparse v3 tf builds the same dictionary+postings as dense v2 tf") {
    import org.apache.spark.sql.functions.col
    // the sparse term column (string once per partition, null on repeats)
    // must be invisible in every derived artifact
    val raw = PagesCorpus.pages(spark, n, parts = 4)
    val pages = IndexBuilder.extractPages(raw.toDF())
      .where(Extract.safe(col("text")))
    val dirD = Files.createTempDirectory("graft-densetf").toString
    val tfDense = IndexBuilder.termFrequenciesDense(pages)
    val docLens = tfDense.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.first("doc_len").as("doc_len"))
    val docsDim = pages.select("doc_id", "url")
      .join(docLens, Seq("doc_id"), "left").na.fill(0L, Seq("doc_len"))
    val idxD = IndexBuilder.buildFromTf(spark, tfDense, docsDim, dirD,
      blockBits = 6)
    def canon(df: org.apache.spark.sql.DataFrame, cols: String*): Seq[String] =
      df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
    assert(canon(index.terms, "term_id", "term", "df", "idf") ==
      canon(idxD.terms, "term_id", "term", "df", "idf"))
    assert(canon(index.postings, "term_id", "doc_id", "impact") ==
      canon(idxD.postings, "term_id", "doc_id", "impact"))
    assert(index.stats == idxD.stats)
    // and the sparse tf itself: per-partition first-sight strings only
    val tfSparse = index.tfRows
    assert(tfSparse.where(col("term").isNotNull).count() <
      tfSparse.count())
    assert(tfSparse.groupBy("term_id")
      .agg(org.apache.spark.sql.functions.countDistinct(col("term")).as("c"))
      .where(col("c") =!= 1).count() == 0)
  }

  test("web-vocab (non-broadcast) postings path builds an identical index") {
    import org.apache.spark.sql.functions.col
    // maxBroadcastTerms=0 forces the shuffle-join branch that a web-scale
    // dictionary would take; every serving table must equal the
    // broadcast build bit-for-bit
    val dirB = java.nio.file.Files.createTempDirectory("graft-bigvocab").toString
    val idxB = graft.index.IndexBuilder.buildFromTf(spark,
      spark.read.parquet(s"${index.path}/tf"),
      spark.read.parquet(s"${index.path}/docs"),
      dirB, blockBits = 6, maxBroadcastTerms = 0L)
    def canon(df: org.apache.spark.sql.DataFrame, cols: String*): Seq[String] =
      df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
    assert(canon(idxB.postings, "term_id", "doc_id", "impact") ==
      canon(index.postings, "term_id", "doc_id", "impact"))
    assert(canon(idxB.blocks, "term_id", "block_id", "n", "block_max") ==
      canon(index.blocks, "term_id", "block_id", "n", "block_max"))
    assert(idxB.stats == index.stats)
    val q = s"${PagesCorpus.vocab(3)} ${PagesCorpus.vocab(7)}"
    assert(Bm25Query.searchBlocks(idxB, q, 10).collect().map(h => (h.doc_id, h.score)).toSeq ==
      Bm25Query.searchBlocks(index, q, 10).collect().map(h => (h.doc_id, h.score)).toSeq)
  }

  test("urls and ranks are attached correctly") {
    val hits = Bm25Query.searchNaive(index, PagesCorpus.vocab(5), 10).collect()
    assert(hits.nonEmpty)
    assert(hits.map(_.rank).toSeq == (1 to hits.length))
    hits.foreach(h => assert(h.url == PagesCorpus.url(h.doc_id)))
  }
}
