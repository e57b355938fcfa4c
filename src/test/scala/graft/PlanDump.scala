package graft

import java.io.{File, PrintStream}

import org.apache.spark.sql.functions._

import graft.corpus.PagesCorpus
import graft.index.IndexBuilder
import graft.query.Bm25Query
import graft.tokenize.Tokenizer

/** Regenerates the raw plan dumps behind PLANS.md (plan-audit tool). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft-plans").toString
    val idx = IndexBuilder.build(spark,
      IndexBuilder.extractPages(PagesCorpus.pages(spark, 2000, parts = 8).toDF()), dir)
    val out = new PrintStream(new File("/tmp/plans_raw.txt"))
    Console.withOut(out) {
      println("### PLAN 1: tf stage (doc-local histogram flatMap — ZERO shuffle)")
      IndexBuilder.termFrequencies(
        PagesCorpus.pages(spark, 2000, parts = 8).toDF()).explain("formatted")
      println("### PLAN 2: naive BM25 scoring (pushed term_id IN filter, canonical-order sum)")
      Bm25Query.scoredNaive(idx,
        s"${PagesCorpus.vocab(3)} ${PagesCorpus.vocab(7)}", conjunctive = true)
        .get.explain("formatted")
      println("### PLAN 3: block scan for WAND (pushed filter + whole-stage codegen)")
      val qids = Seq(
        graft.index.Bm25.termId(PagesCorpus.vocab(3)),
        graft.index.Bm25.termId(PagesCorpus.vocab(7)))
      idx.blocks.where(col("term_id").isin(qids: _*)).explain("formatted")
      println("### PLAN 4: FULL block-WAND query (bucketed scan -> local sort -> merge; zero Exchange)")
      Bm25Query.scoredBlocks(idx,
        s"${PagesCorpus.vocab(3)} ${PagesCorpus.vocab(7)}", 10, conjunctive = true)
        .get.explain("formatted")
      println("### PLAN 5: terms dictionary lookup (pushed In(term), sorted row groups)")
      idx.terms.where(col("term").isin(PagesCorpus.vocab(3), PagesCorpus.vocab(7)))
        .explain("formatted")
      println("### PLAN 6: posting-block encode (one Tungsten shuffle + local sort + streaming mapPartitions)")
      graft.index.PostingBlocks.encode(idx.postings).explain("formatted")
      println("### PLAN 7: line-serving content scan (pushed In(doc_id) — reads ONLY the top-k docs)")
      val pages = spark.read.parquet(s"$dir/pages")
      val topIds = Bm25Query.searchBlocks(idx, PagesCorpus.vocab(3), 5)
        .collect().map(_.doc_id).toSeq
      pages.where(col("doc_id").isin(topIds: _*))
        .select(col("doc_id"),
          posexplode(split(col("text"), "\n")).as(Seq("ln0", "line")))
        .explain("formatted")
      println("### PLAN 8: filtered block-WAND (doc filter BROADCAST into the merge; zero Exchange, no naive fallback)")
      val allow = idx.docs.where(col("doc_id") % 3 === 0).select("doc_id")
      val arr = allow.collect().map(_.getLong(0)); java.util.Arrays.sort(arr)
      Bm25Query.scoredBlocks(idx,
        s"${PagesCorpus.vocab(3)} ${PagesCorpus.vocab(7)}", 10, conjunctive = true,
        docFilter = Some(Bm25Query.DocFilter(arr, isAllow = true)))
        .get.explain("formatted")
      println("### PLAN 9: symbols search via artifact (containment on the names DIMENSION, pushed In(name) on the fact table)")
      val symDir = java.nio.file.Files.createTempDirectory("graft-plans-sym").toString
      graft.symbols.Symbols.build(pages, symDir)
      graft.symbols.Symbols.searchIndexed(spark, symDir, PagesCorpus.vocab(3), 10)
        .explain("formatted")
      println("### PLAN 10: regex PREFIX literal lookup (sorted-range predicate pushed into the terms scan)")
      graft.query.RegexQuery.termIdsForLiteral(idx,
        graft.query.RegexQuery.Lit("vect", leftBound = true, rightBound = false))
        .explain("formatted")
      println("### PLAN 11: regex SUFFIX literal lookup (sorted-range predicate on the REVERSED-term dimension)")
      graft.query.RegexQuery.termIdsForLiteral(idx,
        graft.query.RegexQuery.Lit("vous", leftBound = false, rightBound = true))
        .explain("formatted")
      println("### PLAN 12: DENSE-filter block query (per-block shards bucket-joined with blocks; no Exchange on the blocks side)")
      val allowDense = idx.docs.where(col("doc_id") % 3 =!= 0).select("doc_id")
      val (shardScored, cleanupShards) = Bm25Query.scoredBlocksSharded(idx,
        s"${PagesCorpus.vocab(3)} ${PagesCorpus.vocab(7)}", 10,
        conjunctive = true, allowDense)
      shardScored.get.explain("formatted")
      cleanupShards()
      println("### PLAN 13: blocks encode FROM TF ROWS (round 5 byte cut — the one build shuffle ships (tf INT, doc_len INT), impacts computed in-task from the broadcast idf dict)")
      val idfMap = new graft.index.LongDoubleMap(
        math.max(16, idx.stats.num_terms.toInt))
      idx.terms.select("term_id", "idf").collect()
        .foreach(r => idfMap.put(r.getLong(0), r.getDouble(1)))
      graft.index.PostingBlocks.encodeFromTf(
        idx.tfRows.select("term_id", "doc_id", "tf", "doc_len"),
        idx.stats.avgdl, spark.sparkContext.broadcast(idfMap))
        .explain("formatted")
      println("### PLAN 14: regex INFIX literal lookup (pushed In(gram) probes over the trigram dimension, containment verify on candidates only)")
      graft.query.RegexQuery.termIdsForLiteral(idx,
        graft.query.RegexQuery.Lit("ecto", leftBound = false, rightBound = false))
        .explain("formatted")
      println("### PLAN 15: batched-regex SHARED postings pass (ONE pushed In(term_id) scan for every ranked+accelerated query; broadcast query mapping; one agg = conjunctive merge + canonical ranked score fold; per-query row_number cap)")
      val bIds = Seq(PagesCorpus.vocab(3), PagesCorpus.vocab(7),
        PagesCorpus.vocab(11)).map(graft.index.Bm25.termId)
      graft.query.RegexQuery.batchCandidatesDf(idx,
        IndexedSeq((bIds(0), 0, 0, 0, true), (bIds(1), 0, 0, 1, true),
          (bIds(2), 1, 0, 0, false)),
        IndexedSeq((0, 0, 2), (1, 0, 1)))
        .explain("formatted")
      println("### PLAN 16: one-pass symbol extraction (extractCode: ONE exploded-lines scan, arms as array-of-structs, doc-local lag window; extractWeb: ONE combined-regex scan)")
      graft.symbols.Symbols.extractCode(
        pages.select(col("doc_id"), col("text"))).explain("formatted")
      graft.symbols.Symbols.extractWeb(
        pages.select(col("doc_id"),
          concat(lit("<html><title>t</title><h1>"), col("doc_id"),
            lit("</h1></html>")).as("html"))).explain("formatted")
      println("### PLAN 17: typed-chunk dispatch (symbols materialized ONCE — both the membership anti-join and the chunk equi-join read the checkpoint scan, not a re-run of the 14-arm extraction; fixed branch = posexplode+groupBy on symbol-less docs only)")
      val plainPages = pages.select(col("doc_id"), col("text"))
      graft.ops.Chunking.typedChunks(plainPages,
        graft.symbols.Symbols.extractCode(plainPages)
          .where(col("is_definition")), sizeLines = 8, overlap = 2)
        .explain("formatted")
      println("### PLAN 18: dedup cluster resolution — one contraction round as iterated, BOTH half-rounds (groupBy-min Exchange + equi-join, NO neighborhood arrays; each half reads a localCheckpoint RDD scan, never a re-derivation — the unmaterialized form executed large-star 3x per round)")
      val seedEdges = pages.select(col("doc_id").as("u"),
        (col("doc_id") + lit(1L)).as("v")).where(col("doc_id") % 5 === 0)
        .localCheckpoint()
      val half = graft.ops.Dedup.largeStar(seedEdges)
      half.explain("formatted")
      graft.ops.Dedup.smallStar(half.localCheckpoint()).explain("formatted")
    }
    out.close()
    spark.stop()
    println("wrote /tmp/plans_raw.txt")
  }
}
