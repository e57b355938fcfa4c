package graft

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.deps.Deps
import graft.extract.Extract
import graft.index.{BuiltIndex, IndexBuilder}
import graft.ops.{Dedup, Multimodal, Similarity, TextStats}
import graft.query.Bm25Query
import graft.symbols.Symbols

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2 ids in the names), with DuckDB-equivalent `oracleSql`
  * where SQL can express the op. BM25 entries run the REAL engine
  * (IndexBuilder + Bm25Query over a memoized on-disk index), not ad-hoc
  * re-derivations.
  */
object SparkEntry {

  private def documents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  /** One index build per (sfDir) per JVM — the gate queries all share it.
    * [[warmIndex]] exposes the build for bench timing.
    */
  def warmIndex(s: SparkSession, dir: String): Unit = { indexFor(s, dir); () }
  private val indexCache = TrieMap.empty[String, BuiltIndex]
  private def indexFor(s: SparkSession, dir: String): BuiltIndex =
    indexCache.getOrElseUpdate(dir, {
      val out = Files.createTempDirectory("graft-gate-idx").toString
      val pages = documents(s, dir).select(
        col("doc_id"),
        concat(lit("doc-"), col("doc_id")).as("url"),
        col("text"))
      // serving mode for the query gates: hot block/terms tables +
      // driver dictionary (query analysis without a Spark job); the two
      // warm-ups are independent (counts vs a dictionary collect) and
      // overlap (guide §2.6)
      val built = IndexBuilder.build(s, pages, out)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext = Par.ec
      val fHot = Future(built.cacheHot())
      val fDict = Future(built.cacheDictionary())
      Await.result(fHot, Duration.Inf); Await.result(fDict, Duration.Inf)
      built
    })

  /** DuckDB twin of the symbols-search semantics (shared by the scan and
    * indexed gates — both must produce identical results).
    */
  private val SymSearchSql =
    """WITH l AS (SELECT doc_id,
      |             unnest(string_split(text, chr(10))) AS line,
      |             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS ln
      |           FROM documents),
      |sy AS (SELECT doc_id, ln AS line,
      |         list_filter(regexp_split_to_array(lower(line), '[^a-z0-9]+'),
      |                     x -> length(x) > 2)[1] AS name
      |       FROM l),
      |mt AS (SELECT doc_id, line,
      |         CASE WHEN name = 'vector' THEN 2.0 ELSE 1.0 END AS w
      |       FROM sy WHERE name IS NOT NULL AND contains(name, 'vector'))
      |SELECT doc_id, round(CAST(sum(w) AS DOUBLE), 4) AS score,
      |       count(*) AS n_matches, min(line) AS first_line
      |FROM mt GROUP BY doc_id
      |ORDER BY sum(w) DESC, doc_id ASC LIMIT 10""".stripMargin

  /** One persisted symbols artifact per sfDir per JVM (see [[indexFor]]). */
  private val symbolsCache = TrieMap.empty[String, String]
  private def symbolsFor(s: SparkSession, dir: String): String =
    symbolsCache.getOrElseUpdate(dir, {
      val out = Files.createTempDirectory("graft-gate-sym").toString
      Symbols.build(documents(s, dir), out)
      out
    })

  /** Web-structural symbols artifact (extractWeb over the html view). */
  private val webSymbolsCache = TrieMap.empty[String, String]
  private def webSymbolsFor(s: SparkSession, dir: String): String =
    webSymbolsCache.getOrElseUpdate(dir, {
      val out = Files.createTempDirectory("graft-gate-wsym").toString
      Symbols.buildFrom(Symbols.extractWeb(webView(s, dir)), out)
      out
    })

  /** Code-definition symbols artifact (extractCode over the code view). */
  private val codeSymbolsCache = TrieMap.empty[String, String]
  private def codeSymbolsFor(s: SparkSession, dir: String): String =
    codeSymbolsCache.getOrElseUpdate(dir, {
      val out = Files.createTempDirectory("graft-gate-csym").toString
      Symbols.buildFrom(Symbols.extractCode(codeView(s, dir)), out)
      out
    })

  private def topkDf(s: SparkSession, dir: String, q: String, k: Int,
      conjunctive: Boolean, blocks: Boolean): DataFrame = {
    val hits =
      if (blocks) Bm25Query.searchBlocks(indexFor(s, dir), q, k, conjunctive)
      else Bm25Query.searchNaive(indexFor(s, dir), q, k, conjunctive)
    hits.toDF().select(col("doc_id"), round(col("score"), 4).as("score"))
  }

  /** Deterministic html VIEW of the documents table: the driver corpus
    * ships plain text, so the web-structure operators (href extraction,
    * web symbols) gate over a deterministically derived html wrapper —
    * the SAME construction on both sides of the oracle ([[WebViewCte]]),
    * so what the gate verifies is the EXTRACTION, not the wrapper. Each
    * page carries a title, an h1, the body text, an anchor to its
    * source-group hub page and an anchor to its section-head page
    * (doc_id rounded down to a multiple of 7).
    */
  private def webView(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val hub = d.groupBy("source").agg(min("doc_id").as("hub"))
    val sec = (col("doc_id") - pmod(col("doc_id"), lit(7L))).cast("string")
    d.join(hub, Seq("source"))
      .select(
        col("doc_id"), col("source"),
        concat(lit("https://corpus.example/doc-"),
          col("doc_id").cast("string")).as("url"),
        concat(
          lit("<html><head><title>"), col("source"),
          lit(" overview</title></head><body><h1>"),
          element_at(split(col("text"), " "), 1),
          lit("</h1><p>"), col("text"),
          lit("</p><a href=\"https://corpus.example/doc-"),
          col("hub").cast("string"), lit("\">"), col("source"),
          lit(" hub</a><a href=\"https://corpus.example/doc-"),
          sec, lit("\">section "), sec,
          lit("</a></body></html>")).as("html"))
  }

  /** Deterministic source-code VIEW of the documents table (round 5):
    * the driver corpus is prose, so the code-grammar extractor gates over
    * a deterministically derived code wrapper — same construction on both
    * sides of the oracle ([[CodeViewBody]]), so what the gate verifies is
    * the DEFINITION-GRAMMAR extraction. Each doc becomes a 6-line source
    * file exercising every kind (function / class / variable), a
    * modifier-prefixed definition, and two non-definition lines that must
    * NOT extract. Out-of-range word indexes null the whole text in BOTH
    * engines (concat/|| null-propagate), so short docs drop identically.
    */
  private def codeView(s: SparkSession, dir: String): DataFrame = {
    def w(n: Int) = element_at(split(col("text"), " "), n)
    // 19-line synthetic source file per doc, exercising EVERY grammar arm
    // (round 6): keyword families of all ten kinds, Go receiver / Ruby
    // singleton / typed-declaration methods, the two-line and single-line
    // C definition shapes (the last one CRLF-terminated — round 7), plus
    // non-definition lines that must not extract. Twin construction:
    // [[CodeViewBody]].
    documents(s, dir).select(
      col("doc_id"),
      concat(
        lit("def "), w(1), lit("_"), w(2), lit("():\n"),
        lit("    return "), w(3), lit("\n"),
        lit("class "), w(4), lit("_type:\n"),
        lit("let "), w(5), lit(" = 1\n"),
        lit("pub fn "), w(6), lit("_go():\n"),
        lit("x = "), w(7), lit("\n"),
        lit("const "), w(1), lit("_cmax = 9\n"),
        lit("type "), w(2), lit("_t = int\n"),
        lit("struct "), w(3), lit("_s {\n"),
        lit("trait "), w(4), lit("_tr:\n"),
        lit("interface "), w(5), lit("_i {\n"),
        lit("enum "), w(6), lit("_e {\n"),
        lit("  public static int "), w(7), lit("_len() {\n"),
        lit("func (s "), w(1), lit(") "), w(2), lit("_recv() {\n"),
        lit("def self."), w(3), lit("_sing\n"),
        lit("static long\n"),
        w(4), lit("_cfn(int n) {\n"),
        lit("int "), w(5), lit("_main(int argc) {\r\n"),
        // CRLF tail (round 7, ADVICE r6): the last three lines use \r\n
        // endings — with a bare-\n split, java.util.regex `$` matches
        // before the trailing \r and DuckDB's RE2 does not, so the
        // $-anchored C arms would diverge between engines; the \r?\n
        // split both sides now use is PROVEN by these rows, not just
        // spec'd
        lit("unsigned long\r\n"),
        w(6), lit("_crlf(void) {")).as("text"))
  }

  /** Edges EXTRACTED from page content (round 4; previously synthetic):
    * href attributes pulled out of the html view, resolved against the
    * url->doc_id dictionary — the reference's parse-imports-then-resolve
    * path (engine.rs:839-866, dependencies/mod.rs:87-137).
    */
  private def gateEdges(s: SparkSession, dir: String): DataFrame = {
    val w = webView(s, dir)
    Deps.edgesFromHtml(
      w.select("doc_id", "html"),
      w.select(col("url").as("import_key"), col("doc_id").as("to_doc")))
  }

  /** Flagship query on sf=0.001: BM25 conjunctive top-10. */
  def entry(spark: SparkSession): DataFrame =
    topkDf(spark, "/root/testdata/sf0.001", "spark merge", 10,
      conjunctive = true, blocks = true)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scan/filter/tokenize/aggregate pipeline (SURVEY §2.1/2.2/2.4) ---
    "s5_safety_filter" -> ((s, dir) =>
      documents(s, dir).where(Extract.safe(col("text"))).select("doc_id")),

    "a1_postings" -> ((s, dir) => {
      // tf lives in the tf intermediate only — the postings/blocks serving
      // artifacts carry impacts, which subsume tf at fixed BM25 constants.
      // v3 tf rows carry term_id (the per-row string was cut from the
      // intermediate); the string comes back from the dictionary — so this
      // gate also proves the id<->string round-trip end to end.
      val idx = indexFor(s, dir)
      idx.tfRows.select(col("term_id"), col("doc_id"), col("tf"))
        .join(idx.terms.select(col("term_id"), col("term")), Seq("term_id"))
        .select(col("term"), col("doc_id"), col("tf").cast("long").as("tf"))
    }),

    "a6_doclen" -> ((s, dir) =>
      indexFor(s, dir).docs.select(col("doc_id"), col("doc_len"))),

    "a5_corpus_stats" -> ((s, dir) => {
      val st = indexFor(s, dir).stats
      import s.implicits._
      Seq((st.num_docs, st.total_tokens, st.num_terms,
        BigDecimal(st.avgdl).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .toDF("num_docs", "total_tokens", "num_terms", "avgdl")
    }),

    "a4_term_idf" -> ((s, dir) =>
      indexFor(s, dir).terms.select(
        col("term"), col("df"), round(col("idf"), 6).as("idf"))),

    // --- query engine (J1 intersection, K1 top-k, P5 filter) ---
    "j1_conjunctive" -> ((s, dir) =>
      Bm25Query.scoredNaive(indexFor(s, dir), "spark merge window", conjunctive = true)
        .get.select("doc_id")),

    "k1_bm25_topk_and" -> ((s, dir) =>
      topkDf(s, dir, "spark merge window", 20, conjunctive = true, blocks = false)),

    "k1_bm25_topk_or" -> ((s, dir) =>
      topkDf(s, dir, "vector stream", 20, conjunctive = false, blocks = true)),

    // batched serving: both queries answered by ONE Spark job over one
    // pruned blocks scan — per-query results must equal the single-query
    // path (and therefore the oracle) exactly
    "k1_bm25_batch" -> ((s, dir) => {
      val res = Bm25Query.searchBlocksBatch(indexFor(s, dir),
        Seq(("spark merge window", true), ("vector stream", false)), 20)
      import s.implicits._
      res.zipWithIndex.flatMap { case (hits, qi) =>
        hits.map(h => (qi.toLong, h.doc_id, h.score))
      }.toDF("qid", "doc_id", "score")
        .select(col("qid"), col("doc_id"), round(col("score"), 4).as("score"))
    }),

    // batched serving across QUERY CLASSES (round 5): plain, url-glob
    // filtered, and rank-boosted queries answered through the one-job
    // batch kernel — per-query results must equal the single-query paths
    // (and therefore the oracle) exactly
    "k1_bm25_batch_mixed" -> ((s, dir) => {
      import graft.query.BatchQuery
      val idx = indexFor(s, dir)
      val rank = Deps.staticRank(gateEdges(s, dir))
      val res = Bm25Query.searchBlocksBatchEx(idx, Seq(
        BatchQuery("spark merge window"),
        BatchQuery("data join", include = Seq("doc-1*")),
        BatchQuery("data join", boosted = true)), 10, Some(rank))
      import s.implicits._
      res.zipWithIndex.flatMap { case (hits, qi) =>
        hits.map(h => (qi.toLong, h.doc_id, h.score))
      }.toDF("qid", "doc_id", "score")
        .select(col("qid"), col("doc_id"), round(col("score"), 4).as("score"))
    }),

    // batched line-level serving: one job materializes the line records
    // of the whole batch; must equal searchWithLines (and its oracle)
    "p7_line_matches_batch" -> ((s, dir) => {
      val rows = Bm25Query.searchWithLinesBatch(indexFor(s, dir),
        documents(s, dir),
        Seq(graft.query.BatchQuery("vector stream", conjunctive = false)), 10)
        .head
      import s.implicits._
      s.createDataset(rows).toDF()
        .select(col("doc_id"), col("rank"), col("line_number"),
          col("match_start"), col("match_end"), col("snippet"),
          round(col("score"), 4).as("score"))
    }),

    "p5_filtered_search" -> ((s, dir) => {
      val scored = Bm25Query
        .scoredNaive(indexFor(s, dir), "data join", conjunctive = true).get
      scored
        .join(documents(s, dir).where(col("lang") === "en").select("doc_id"), Seq("doc_id"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),

    // same filtered query through the PRODUCTION block path: the allowed
    // doc set is broadcast into the WAND merge (no naive fallback)
    "p5_filtered_blocks" -> ((s, dir) => {
      val allowed = documents(s, dir).where(col("lang") === "en").select("doc_id")
      Bm25Query.searchBlocksFiltered(indexFor(s, dir), "data join", 10,
        conjunctive = true, allowed).toDF()
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),

    // DENSE filter past the broadcast ceiling (maxBroadcastDocs=0 defeats
    // both broadcasts): per-block filter shards bucket-joined with the
    // blocks — the query stays on the block path (round 4)
    "p5_dense_filter_blocks" -> ((s, dir) => {
      val allowed = documents(s, dir).where(col("lang") === "en").select("doc_id")
      Bm25Query.searchBlocksFiltered(indexFor(s, dir), "spark merge", 10,
        conjunctive = true, allowed, maxBroadcastDocs = 0L).toDF()
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),

    // --- window / percentile analogs (W1, A8) ---
    "w1_top_per_source" -> ((s, dir) => {
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      documents(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select("source", "doc_id", "rn")
    }),

    "a8_percentiles" -> ((s, dir) =>
      indexFor(s, dir).docs.agg(
        round(percentile(col("doc_len"), lit(0.5)), 4).as("p50"),
        round(percentile(col("doc_len"), lit(0.95)), 4).as("p95"),
        round(percentile(col("doc_len"), lit(0.99)), 4).as("p99"))),

    // --- dedup suite (U3 + training-data ops) ---
    "u3_dedup_exact" -> ((s, dir) =>
      Dedup.exactByText(documents(s, dir), "doc_id", "text")
        .select("doc_id", "canonical_id", "is_canonical")),

    "dedup_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(documents(s, dir), "doc_id", "text", 3, 0.8)
        .select(col("a"), col("b"), round(col("j"), 4).as("j"))),

    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashDuplicates(documents(s, dir), "doc_id", "text")
        .select(col("a"), col("b"), round(col("j"), 4).as("j"))),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashDuplicates(documents(s, dir), "doc_id", "text", 3)),

    // cluster resolution: transitive closure of the minhash near-dup
    // pairs, one canonical survivor (min doc_id) per component
    "dedup_clusters" -> ((s, dir) => {
      val docs = documents(s, dir)
      val pairs = Dedup.minhashDuplicates(docs, "doc_id", "text").select("a", "b")
      Dedup.clusters(docs, "doc_id", pairs)
        .select("doc_id", "component", "is_canonical")
    }),

    "txt_fingerprint" -> ((s, dir) =>
      documents(s, dir).select(
        col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))),

    // --- sub-document chunking (chunk-level retrieval units) ---
    "chunk_split" -> ((s, dir) =>
      graft.ops.Chunking.chunks(documents(s, dir), sizeLines = 8, overlap = 2)
        .select(col("doc_id"), col("chunk"), col("start_line"),
          col("end_line"), col("n_lines"),
          md5(col("chunk_text")).as("chunk_md5"))),

    // structure-aware chunk_file dispatch (VERDICT r6 "missing" #3) over
    // the code view: symbol-anchored typed chunks for docs with symbols,
    // fixed fallback for the rest — symbols are dropped for doc_id%3==0
    // so the gate exercises BOTH branches
    "chunk_typed" -> ((s, dir) => {
      // (round 8: checkpointing the view here was tried and measured
      // SLOWER — the materialization outweighs deriving the cheap
      // projection three times; left as lineage)
      val cv = codeView(s, dir)
      val syms = Symbols.extractCode(cv)
        .where(pmod(col("doc_id"), lit(3)) =!= 0)
      graft.ops.Chunking.typedChunks(cv, syms, sizeLines = 8, overlap = 2)
        .select(col("doc_id"), col("name"), col("chunk_type"),
          col("start_line").cast("long").as("start_line"),
          col("end_line").cast("long").as("end_line"),
          md5(col("chunk_text")).as("chunk_md5"))
    }),

    // --- text analysis ---
    "txt_quality" -> ((s, dir) => {
      val d = documents(s, dir)
      d.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        TextStats.tokenCount(col("text")).as("n_tokens"),
        round(TextStats.tokenChars(col("text")).cast("double") /
          TextStats.tokenCount(col("text")).cast("double"), 4).as("mean_tok_len"),
        round(TextStats.qualityScore(col("text")), 4).as("quality"))
    }),

    "txt_langid" -> ((s, dir) =>
      documents(s, dir).select(
        col("doc_id"), TextStats.langId(col("text")).as("lang_guess"))),

    // LLM-token-budget estimate (BPE pre-tokenizer units) alongside the
    // search tokenizer's word count
    "txt_tokens_bpe" -> ((s, dir) =>
      documents(s, dir).select(
        col("doc_id"),
        TextStats.tokenCount(col("text")).as("n_tokens_word"),
        TextStats.bpeTokenCount(col("text")).as("n_tokens_bpe"))),

    // --- similarity search ---
    "sim_cosine_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble)
      Similarity.cosineTopK(e, "vec_id", "embedding", q, 10, excludeId = Some(0L))
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),

    "sim_ivf_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble)
      import s.implicits._
      val cents = Similarity.centroids(e, "vec_id", "embedding", 8, dim = q.length)
        .as[(Long, Seq[Double])].collect().toSeq
        .map { case (c, v) => (c.toInt, v) }.sortBy(_._1)
      val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      Similarity.ivfTopK(assigned, "vec_id", "embedding", cents, q, 10, 2,
        excludeId = Some(0L))
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),

    "sim_ivf_kpp_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble)
      val cents = Similarity.centroidsKpp(e, "vec_id", "embedding", KppList,
        lloydIters = KppLloyd)
      val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      Similarity.ivfTopK(assigned, "vec_id", "embedding", cents, q, 10, 2,
        excludeId = Some(0L))
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),

    "sim_ivfpq_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.where(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble)
      import s.implicits._
      // IVF centroids and PQ codebooks are independent driver collects —
      // overlap them (guide §2.6); results are the same two literals
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext = Par.ec
      val fCents = Future {
        Similarity.centroids(e, "vec_id", "embedding", 8, dim = q.length)
          .as[(Long, Seq[Double])].collect().toSeq
          .map { case (c, v) => (c.toInt, v) }.sortBy(_._1)
      }
      val fCbs = Future {
        Similarity.pqCodebooks(e, "vec_id", "embedding", PqSub, PqCodes,
          dim = q.length)
      }
      val cents = Await.result(fCents, Duration.Inf)
      val cbs = Await.result(fCbs, Duration.Inf)
      val assigned = Similarity.pqEncode(
        Similarity.ivfAssign(e, "vec_id", "embedding", cents), "embedding", cbs)
      Similarity.ivfPqTopK(assigned, "vec_id", "embedding", cents, cbs, q,
        10, nProbe = 2, refine = PqRefine, excludeId = Some(0L))
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),

    "sim_lsh_neardups" -> ((s, dir) =>
      Similarity.embeddingNearDups(embeddings(s, dir), "vec_id", "embedding", 8, 0.4)
        .select(col("a"), col("b"), round(col("sim"), 4).as("sim"))),

    // --- multimodal plumbing (stubbed decoder, real batching/schema) ---
    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        documents(s, dir).select(col("doc_id"), col("text").cast("binary").as("payload")),
        "doc_id", "payload")
        .select("mm_id", "n_bytes", "width", "height", "checksum")),

    // --- event-time windowed agg (ST analog, batch-replayable) ---
    "st_windowed_events" -> ((s, dir) =>
      events(s, dir)
        .groupBy(
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("total_value"))),

    // --- P7: case-insensitive substring position (verification scan) ---
    "p7_substring_pos" -> ((s, dir) =>
      documents(s, dir)
        .select(col("doc_id"),
          instr(lower(col("text")), "spark merge").cast("long").as("pos"))
        .where(col("pos") > 0)),

    // --- P8: snippet window around the match ---
    "p8_snippet" -> ((s, dir) =>
      documents(s, dir)
        .withColumn("pos", instr(lower(col("text")), "vector"))
        .where(col("pos") > 0)
        .select(col("doc_id"),
          substring(col("text"),
            greatest(lit(1), col("pos") - 20), lit(50)).as("snippet"))),

    // --- A3: in-degree style count (groupBy-count shape) ---
    "a3_indegree" -> ((s, dir) =>
      documents(s, dir).groupBy("source").agg(count(lit(1)).as("n_docs"))),

    // --- dependency graph: J2 resolution join, A3 in-degree over real
    //     edges, J4 adjacency lookup, A4 static rank feeding a K3 boost ---
    "j2_resolve" -> ((s, dir) => gateEdges(s, dir)),

    "a3_edges_indegree" -> ((s, dir) => Deps.inDegree(gateEdges(s, dir))),

    "j4_dependents" -> ((s, dir) => {
      val d = documents(s, dir)
      val src0 = d.where(col("doc_id") === 0).select("source").head().getString(0)
      val hub = d.where(col("source") === src0)
        .agg(min("doc_id")).head().getLong(0)
      Deps.dependents(gateEdges(s, dir), hub)
    }),

    "k3_boosted_topk" -> ((s, dir) =>
      Bm25Query.searchBoosted(indexFor(s, dir), "data join", 10,
        Deps.staticRank(gateEdges(s, dir))).toDF()
        .select(col("doc_id"), round(col("score"), 4).as("score"))),

    // same boosted query through the PRODUCTION block path (rank set
    // broadcast into the WAND merge, bounds scaled by max rank)
    "k3_boosted_blocks" -> ((s, dir) =>
      Bm25Query.searchBlocksBoosted(indexFor(s, dir), "data join", 10,
        Deps.staticRank(gateEdges(s, dir))).toDF()
        .select(col("doc_id"), round(col("score"), 4).as("score"))),

    // --- P4: short-query fallback (all docs are candidates) ---
    "p4_short_query" -> ((s, dir) =>
      Bm25Query.searchBlocks(indexFor(s, dir), "ab", 10).toDF()
        .select(col("doc_id"), round(col("score"), 4).as("score"))),

    // --- P7/P8/W1 composed: per-match line records on the final top-k ---
    "p7_line_matches" -> ((s, dir) =>
      Bm25Query.searchWithLines(indexFor(s, dir), documents(s, dir),
        "vector stream", 10, conjunctive = false).toDF()
        .select(col("doc_id"), col("rank"), col("line_number"),
          col("match_start"), col("match_end"), col("snippet"),
          round(col("score"), 4).as("score"))),

    // --- symbols mode: extraction + symbols-only search ---
    "sym_extract" -> ((s, dir) => Symbols.extract(documents(s, dir))),

    "sym_search" -> ((s, dir) =>
      Symbols.search(Symbols.extract(documents(s, dir)), "vector", 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"),
          col("n_matches"), col("first_line"))),

    // same query through the PERSISTED artifact: containment resolved on
    // the names dimension, symbols read with a pushed In(name) filter
    "sym_search_indexed" -> ((s, dir) =>
      Symbols.searchIndexed(s, symbolsFor(s, dir), "vector", 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"),
          col("n_matches"), col("first_line"))),

    // --- web-structural symbols (round 4): title/heading/anchor kinds
    //     extracted from html content — the real web extraction path ---
    "sym_web_extract" -> ((s, dir) =>
      Symbols.extractWeb(webView(s, dir))),

    "sym_web_search" -> ((s, dir) =>
      Symbols.search(Symbols.extractWeb(webView(s, dir)), "section 7", 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"),
          col("n_matches"), col("first_line"))),

    "sym_web_search_indexed" -> ((s, dir) =>
      Symbols.searchIndexed(s, webSymbolsFor(s, dir), "section 7", 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"),
          col("n_matches"), col("first_line"))),

    // --- code-definition symbols (round 5): anchored definition-grammar
    //     extraction over source-code content, every kind exercised ---
    "sym_code_extract" -> ((s, dir) =>
      Symbols.extractCode(codeView(s, dir))),

    // synthetic FileName symbols (engine.rs:501-509: stem @ line 0)
    "sym_filenames" -> ((s, dir) =>
      Symbols.extractFileNames(webView(s, dir))),

    "sym_code_search" -> ((s, dir) =>
      Symbols.search(Symbols.extractCode(codeView(s, dir)), "table", 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"),
          col("n_matches"), col("first_line"))),

    "sym_code_search_indexed" -> ((s, dir) =>
      Symbols.searchIndexed(s, codeSymbolsFor(s, dir), "table", 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"),
          col("n_matches"), col("first_line"))),

    // --- U2: set difference (staleness-triage shape) ---
    "u2_except" -> ((s, dir) =>
      documents(s, dir).where(col("lang") === "en").select("doc_id")
        .except(documents(s, dir).where(col("n_chars") < 200).select("doc_id"))),

    // --- P2/J1 regex path: literal extraction -> index prefilter -> verify ---
    "p3_regex_accel" -> ((s, dir) =>
      graft.query.RegexQuery.search(indexFor(s, dir), documents(s, dir),
        "spark\\s+\\w+\\s+merge", 1000).toDF().select("doc_id")),

    "p3_regex_fullscan" -> ((s, dir) =>
      graft.query.RegexQuery.search(indexFor(s, dir), documents(s, dir),
        "ba.ch", 1000).toDF().select("doc_id")),

    // alternation: per-branch literal analysis -> union of branch
    // candidate sets (round-4; previously a full corpus scan)
    "p3_regex_alt" -> ((s, dir) =>
      graft.query.RegexQuery.search(indexFor(s, dir), documents(s, dir),
        "(vector|stream)\\s+\\w+", 1000).toDF().select("doc_id")),

    // open-sided literals: prefix -> sorted-range dictionary lookup,
    // suffix -> sorted range over the reversed-term dimension
    "p3_regex_prefix" -> ((s, dir) =>
      graft.query.RegexQuery.search(indexFor(s, dir), documents(s, dir),
        "\\svect\\w+", 1000).toDF().select("doc_id")),

    "p3_regex_suffix" -> ((s, dir) =>
      graft.query.RegexQuery.search(indexFor(s, dir), documents(s, dir),
        "\\w+tor\\s", 1000).toDF().select("doc_id")),

    // infix literal (unbounded both sides): pushed In(gram) probes over
    // the character-trigram dictionary dimension (round 5), then exact
    // containment verify on the candidate rows only
    "p3_regex_infix" -> ((s, dir) =>
      graft.query.RegexQuery.search(indexFor(s, dir), documents(s, dir),
        "\\w+ustome\\w+", 1000).toDF().select("doc_id")),

    // batched regex serving (round 6): every class — accelerated,
    // alternation, prefix/suffix/infix, full scan — through the shared
    // kernel (one postings pass + chunked verify legs + one fullscan
    // content pass); per-query results must equal RegexQuery.search and
    // therefore the per-pattern oracles
    "p3_regex_batch" -> ((s, dir) => {
      val pats = Seq("spark\\s+\\w+\\s+merge", "(vector|stream)\\s+\\w+",
        "\\svect\\w+", "\\w+tor\\s", "\\w+ustome\\w+", "ba.ch")
      val res = graft.query.RegexQuery.searchBatch(indexFor(s, dir),
        documents(s, dir), pats, 1000)
      import s.implicits._
      res.zipWithIndex.flatMap { case (hits, qi) =>
        hits.map(h => (qi.toLong, h.doc_id))
      }.toDF("qid", "doc_id")
    }),

    // --- W2: fast-rank cut — rank on cheap metadata, rescore top slice ---
    "w2_fast_rank" -> ((s, dir) => {
      val top = documents(s, dir)
        .orderBy(col("n_chars").desc, col("doc_id").asc).limit(100)
      top.select(col("doc_id"),
          round(TextStats.qualityScore(col("text")), 4).as("quality"))
        .orderBy(col("quality").desc, col("doc_id").asc).limit(10)
    }))

  // ---------------------------------------------------------------------

  /** DuckDB twin of [[webView]] (no leading WITH so it can splice into
    * larger CTE chains): both sides derive the SAME html, so what the
    * gates verify is the extraction over it.
    */
  private val WebViewBody =
    """hubt AS (SELECT source, min(doc_id) AS hub FROM documents GROUP BY 1),
      |w AS (SELECT d.doc_id, d.source,
      |        '<html><head><title>' || d.source || ' overview</title></head><body><h1>' ||
      |        string_split(d.text, ' ')[1] ||
      |        '</h1><p>' || d.text || '</p><a href="https://corpus.example/doc-' ||
      |        hubt.hub || '">' || d.source || ' hub</a><a href="https://corpus.example/doc-' ||
      |        (d.doc_id - (d.doc_id % 7)) || '">section ' || (d.doc_id - (d.doc_id % 7)) ||
      |        '</a></body></html>' AS html
      |      FROM documents d JOIN hubt USING (source))""".stripMargin

  /** href extraction + url-dictionary resolution (twin of
    * Deps.edgesFromHtml over the view).
    */
  private val EdgesBody =
    s"""$WebViewBody,
       |links AS (SELECT doc_id AS from_doc,
       |            unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS import_key
       |          FROM w),
       |dict AS (SELECT 'https://corpus.example/doc-' || doc_id AS import_key,
       |                doc_id AS to_doc FROM documents),
       |edges AS (SELECT from_doc, to_doc FROM links JOIN dict USING (import_key)
       |          WHERE from_doc <> to_doc)""".stripMargin

  private def symWebPart(alias: String, kind: String, pat: String): String =
    s"""$alias AS (SELECT doc_id, '$kind' AS kind,
       |  unnest(regexp_extract_all(html, '$pat', 1)) AS raw,
       |  unnest(range(1, len(regexp_extract_all(html, '$pat', 1)) + 1)) AS ord
       |  FROM w)""".stripMargin

  /** Twin of Symbols.extractWeb over the view (same `(?i)` + optional
    * attribute-tail patterns, one CTE per heading level — RE2 in DuckDB,
    * java.util.regex in Spark, both within the shared subset).
    */
  private val SymWebBody =
    s"""${symWebPart("swt", "title", "(?i)<title(?:\\s[^>]*)?>([^<]*)</title\\s*>")},
       |${(1 to 6).map(l => symWebPart(s"swh$l", "heading",
            s"(?i)<h$l(?:\\s[^>]*)?>([^<]*)</h$l\\s*>")).mkString(",\n")},
       |${symWebPart("swa", "anchor", "(?i)<a(?:\\s[^>]*)?>([^<]*)</a\\s*>")},
       |swu AS (SELECT * FROM swt
       |        ${(1 to 6).map(l => s"UNION ALL SELECT * FROM swh$l").mkString(" ")}
       |        UNION ALL SELECT * FROM swa),
       |sy AS (SELECT doc_id, lower(trim(raw)) AS name, kind,
       |              CAST(ord AS INT) AS line
       |       FROM swu WHERE length(lower(trim(raw))) > 2)""".stripMargin

  /** DuckDB twin of [[codeView]] (no leading WITH — splices into larger
    * CTE chains): both sides derive the SAME 6-line source file per doc,
    * so the gates verify the definition-grammar extraction over it.
    */
  private val CodeViewBody = {
    def w(n: Int) = s"string_split(text, ' ')[$n]"
    s"""cv AS (SELECT doc_id,
       |  'def ' || ${w(1)} || '_' || ${w(2)} || '():' || chr(10) ||
       |  '    return ' || ${w(3)} || chr(10) ||
       |  'class ' || ${w(4)} || '_type:' || chr(10) ||
       |  'let ' || ${w(5)} || ' = 1' || chr(10) ||
       |  'pub fn ' || ${w(6)} || '_go():' || chr(10) ||
       |  'x = ' || ${w(7)} || chr(10) ||
       |  'const ' || ${w(1)} || '_cmax = 9' || chr(10) ||
       |  'type ' || ${w(2)} || '_t = int' || chr(10) ||
       |  'struct ' || ${w(3)} || '_s {' || chr(10) ||
       |  'trait ' || ${w(4)} || '_tr:' || chr(10) ||
       |  'interface ' || ${w(5)} || '_i {' || chr(10) ||
       |  'enum ' || ${w(6)} || '_e {' || chr(10) ||
       |  '  public static int ' || ${w(7)} || '_len() {' || chr(10) ||
       |  'func (s ' || ${w(1)} || ') ' || ${w(2)} || '_recv() {' || chr(10) ||
       |  'def self.' || ${w(3)} || '_sing' || chr(10) ||
       |  'static long' || chr(10) ||
       |  ${w(4)} || '_cfn(int n) {' || chr(10) ||
       |  'int ' || ${w(5)} || '_main(int argc) {' || chr(13) || chr(10) ||
       |  'unsigned long' || chr(13) || chr(10) ||
       |  ${w(6)} || '_crlf(void) {' AS code
       |  FROM documents)""".stripMargin
  }

  /** One UNION ALL leg per grammar arm, generated from the SAME
    * [[graft.symbols.Symbols.CodeArms]] constants Spark compiles — the
    * regexes cannot drift between engines (RE2 in DuckDB, java.util.regex
    * in Spark, all patterns inside the shared subset: no lookahead, arm
    * disambiguation is explicit NOT-matches).
    */
  private def symCodeArmSql(a: graft.symbols.Symbols.CodeArm): String = {
    val guards =
      a.notRx.map(r => s"\n  AND NOT regexp_matches(ltxt, '$r')").mkString
    if (!a.onPrevLine)
      s"""SELECT doc_id, lower(regexp_extract(ltxt, '${a.rx}', 1)) AS name,
         |  '${a.kind}' AS kind, CAST(ln AS INT) AS line, ind AS "column"
         |FROM cl WHERE regexp_matches(ltxt, '${a.rx}')$guards""".stripMargin
    else
      s"""SELECT doc_id, lower(regexp_extract(ltxt, '${a.rx}', 1)) AS name,
         |  '${a.kind}' AS kind, CAST(ln - 1 AS INT) AS line, 0 AS "column"
         |FROM cl WHERE regexp_matches(ltxt, '${a.rx}')$guards
         |  AND prev IS NOT NULL
         |  AND regexp_matches(prev, '${graft.symbols.Symbols.cTypeLineRx}')
         |  AND NOT regexp_matches(prev, '${graft.symbols.Symbols.kwAnyRx}')""".stripMargin
  }

  /** Twin of Symbols.extractCode over the code view: exploded lines with
    * a doc-local lag (the two-line C arm reads the previous line) and the
    * leading-space count (the `column` field), then the generated arm
    * union.
    */
  private val SymCodeBody =
    s"""cl AS (SELECT doc_id, ltxt, ln,
       |         lag(ltxt) OVER (PARTITION BY doc_id ORDER BY ln) AS prev,
       |         CAST(length(ltxt) - length(ltrim(ltxt)) AS INT) AS ind
       |       FROM (SELECT doc_id,
       |               unnest(regexp_split_to_array(code, '\\r?\\n')) AS ltxt,
       |               unnest(range(1, len(regexp_split_to_array(code, '\\r?\\n')) + 1)) AS ln
       |             FROM cv)),
       |scall AS (${graft.symbols.Symbols.CodeArms.map(symCodeArmSql)
                     .mkString("\n  UNION ALL ")}),
       |sy AS (SELECT *, TRUE AS is_definition FROM scall
       |       WHERE length(name) > 2)""".stripMargin

  /** Twin of the code symbols-search semantics (scan and indexed gates
    * must produce identical results).
    */
  private val SymCodeSearchSql =
    s"""WITH $CodeViewBody,
       |$SymCodeBody,
       |mt AS (SELECT doc_id, line,
       |         CASE WHEN name = 'table' THEN 2.0 ELSE 1.0 END AS wt
       |       FROM sy WHERE contains(name, 'table'))
       |SELECT doc_id, round(CAST(sum(wt) AS DOUBLE), 4) AS score,
       |       count(*) AS n_matches, min(line) AS first_line
       |FROM mt GROUP BY doc_id
       |ORDER BY sum(wt) DESC, doc_id ASC LIMIT 10""".stripMargin

  /** Twin of the web symbols-search semantics (scan and indexed gates
    * must produce identical results).
    */
  private val SymWebSearchSql =
    s"""WITH $WebViewBody,
       |$SymWebBody,
       |mt AS (SELECT doc_id, line,
       |         CASE WHEN name = 'section 7' THEN 2.0 ELSE 1.0 END AS wt
       |       FROM sy WHERE contains(name, 'section 7'))
       |SELECT doc_id, round(CAST(sum(wt) AS DOUBLE), 4) AS score,
       |       count(*) AS n_matches, min(line) AS first_line
       |FROM mt GROUP BY doc_id
       |ORDER BY sum(wt) DESC, doc_id ASC LIMIT 10""".stripMargin

  private val Tok =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> length(x) > 2)"
  private val ToksCte =
    s"WITH toks AS (SELECT doc_id, unnest($Tok) AS term FROM documents)"
  private val TfCte =
    s"$ToksCte, tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2)"

  /** Full BM25 CTE chain (shared by the top-k oracles). `extraFilter` is
    * an arbitrary SQL condition over the joined documents row `dx` (used
    * by the batched url-glob gate).
    */
  private def bm25Sql(terms: Seq[String], conjunctive: Boolean,
      k: Int, langFilter: Option[String] = None,
      extraFilter: Option[String] = None): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val conjFilter = if (conjunctive) s"HAVING count(*) = ${terms.size}" else ""
    val joinLang = langFilter
      .map(l => s"JOIN documents d ON d.doc_id = agg.doc_id AND d.lang = '$l'")
      .getOrElse("") + extraFilter
      .map(f => s" JOIN documents dx ON dx.doc_id = agg.doc_id AND ($f)")
      .getOrElse("")
    s"""$TfCte,
       |dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY 1),
       |st AS (SELECT (SELECT count(*) FROM documents) AS n,
       |              (SELECT count(*) FROM toks) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |q AS (SELECT unnest([$termList]) AS term),
       |sc AS (SELECT tf.doc_id,
       |              ln((st.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0) *
       |              ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.doc_len / st.avgdl)))) AS s
       |       FROM tf JOIN q USING (term) JOIN dft USING (term) JOIN dl USING (doc_id), st),
       |agg AS (SELECT doc_id, count(*) AS nt, sum(s) AS score FROM sc GROUP BY 1 $conjFilter)
       |SELECT agg.doc_id AS doc_id, round(agg.score, 4) AS score FROM agg $joinLang
       |ORDER BY agg.score DESC, agg.doc_id ASC LIMIT $k""".stripMargin
  }

  private val ShingleCte =
    s"""WITH toksl AS (SELECT doc_id, $Tok AS ts FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(1, len(ts) - 1),
       |                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
       |       FROM toksl),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  // ---- generated oracles for the hash-seeded operators ----------------

  /** dedup_simhash: full signature recomputation in SQL — md5 token
    * hashes, 128 per-bit vote aggregates, sign bits packed into two
    * UBIGINT words, exact hamming-pair join (the 4x32-chunk pigeonhole in
    * the Spark op has recall 1.0 at hamming<=3, so the sets are equal).
    */
  private def simhashOracleSql: String = {
    val one = "CAST(1 AS UBIGINT)"
    def votes(word: String, pfx: String) = (0 until 64).map(b =>
      s"sum(CASE WHEN (($word >> $b) & $one) = $one THEN 1 ELSE -1 END) AS $pfx$b")
      .mkString(", ")
    def sig(pfx: String) = (0 until 64).map(b =>
      s"(CASE WHEN $pfx$b >= 0 THEN CAST('${java.lang.Long.toUnsignedString(1L << b)}' AS UBIGINT) ELSE CAST(0 AS UBIGINT) END)")
      .mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, unnest($Tok) AS term FROM documents),
       |h AS (SELECT doc_id,
       |        CAST(('0x' || substr(md5(term), 1, 16)) AS UBIGINT) AS hi,
       |        CAST(('0x' || substr(md5(term), 17, 16)) AS UBIGINT) AS lo
       |      FROM toks),
       |v AS (SELECT doc_id, ${votes("hi", "vh")}, ${votes("lo", "vl")}
       |      FROM h GROUP BY doc_id),
       |sg AS (SELECT doc_id, ${sig("vh")} AS sighi, ${sig("vl")} AS siglo FROM v)
       |SELECT x.doc_id AS a, y.doc_id AS b,
       |       bit_count(xor(x.sighi, y.sighi)) +
       |       bit_count(xor(x.siglo, y.siglo)) AS hamming
       |FROM sg x JOIN sg y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.sighi, y.sighi)) +
       |      bit_count(xor(x.siglo, y.siglo)) <= 3""".stripMargin
  }

  /** Embedding dim of the test tables (all sf dirs emit 64). */
  private val EmbDim = 64
  /** IVF-PQ shape: 4 subspaces of 16 dims, 16 codes each (4-bit codes —
    * 2 bytes/vector vs 256 raw), ADC funnel keeps the top 50 for the
    * exact re-rank.
    */
  private val PqSub = 4
  private val PqCodes = 16
  private val PqRefine = 50
  /** kpp-IVF gate shape: 8 cells, farthest-point seeds + 2 Lloyd steps. */
  private val KppList = 8
  private val KppLloyd = 2

  /** Ordered left-fold dot product — bit-identical to Similarity.dotLit's
    * `aggregate` fold (same products, same summation order).
    */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${EmbDim + 1}), " +
      s"j -> CAST($a[j] AS DOUBLE) * CAST($b[j] AS DOUBLE))), (acc, x) -> acc + x)"

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** sim_lsh_neardups: the hyperplanes are deterministic literals
    * (Similarity.hyperplanes, splitmix64 seed 42) — embed their VALUES so
    * DuckDB recomputes buckets and exact cosines from scratch.
    */
  private def lshOracleSql: String = {
    val planes = graft.ops.Similarity.hyperplanes(8, EmbDim)
    def planeLit(p: Seq[Double]) =
      p.map(x => s"CAST($x AS DOUBLE)").mkString("[", ", ", "]")
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotSql("v", planeLit(p))} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |           FROM embeddings),
       |bk AS (SELECT vec_id, v, $bucket AS bucket FROM e)
       |SELECT x.vec_id AS a, y.vec_id AS b,
       |       round(${cosSql("x.v", "y.v")}, 4) AS sim
       |FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |WHERE ${cosSql("x.v", "y.v")} >= 0.4""".stripMargin
  }

  /** sim_ivf_topk: deterministic pmod(id,8) seed centroids (element means),
    * nearest-centroid assignment (ties -> smallest cid), probe the 2 cells
    * nearest the query, exact cosine top-10 within them.
    */
  private def ivfOracleSql: String =
    s"""WITH e AS (SELECT vec_id,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |           FROM embeddings),
       |cm AS (SELECT vec_id % 8 AS cid,
       |              unnest(range(1, ${EmbDim + 1})) AS j, unnest(v) AS x
       |       FROM e),
       |cent AS (SELECT cid, list(sd ORDER BY j) AS c FROM
       |           (SELECT cid, j, sum(x) / count(*) AS sd FROM cm GROUP BY cid, j)
       |         GROUP BY cid),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |asn AS (SELECT vec_id, cid FROM (
       |          SELECT e.vec_id, cent.cid,
       |                 row_number() OVER (PARTITION BY e.vec_id
       |                   ORDER BY ${cosSql("e.v", "cent.c")} DESC, cent.cid ASC) AS rn
       |          FROM e CROSS JOIN cent) WHERE rn = 1),
       |probe AS (SELECT cid FROM (
       |            SELECT cent.cid,
       |                   row_number() OVER (ORDER BY ${cosSql("cent.c", "q.qv")} DESC,
       |                                      cent.cid ASC) AS rn
       |            FROM cent, q) WHERE rn <= 2)
       |SELECT e.vec_id AS vec_id, round(${cosSql("e.v", "q.qv")}, 4) AS sim
       |FROM e JOIN asn USING (vec_id), q
       |WHERE asn.cid IN (SELECT cid FROM probe) AND e.vec_id <> 0
       |ORDER BY ${cosSql("e.v", "q.qv")} DESC, e.vec_id ASC
       |LIMIT 10""".stripMargin

  /** sim_ivf_kpp_topk: full SQL replication of the deterministic
    * k-means++-analog funnel — greedy farthest-point (Gonzalez) seeding
    * unrolled as one CTE per seed (seed 0 = smallest vec_id; seed i = the
    * row whose MAX cosine to seeds 0..i-1 is minimal, ties -> smallest
    * id — the argmax-distance deterministic variant of kmeans++'s D^2
    * draw), then [[KppLloyd]] unrolled Lloyd steps (nearest-centroid
    * assignment, element means, empty cells keep the previous centroid),
    * then the same probe-2 / exact-cosine top-10 tail as `ivfOracleSql`.
    * Every fold is the index-ordered `cosSql`, so seed selection is
    * bit-identical to the driver-side Scala seeding. The Lloyd means are
    * rounded to [[graft.ops.Similarity.LloydRoundDecimals]] decimals on
    * BOTH sides (ADVICE r6): the raw means are sum-order-sensitive
    * doubles (Spark's distributed aggregation vs DuckDB's serial sum),
    * and an ulp difference at a cell boundary would flip an assignment;
    * after snapping, both engines refine from identical centroids.
    *
    * Every CTE is `AS MATERIALIZED`: DuckDB inlines plain CTEs, and the
    * seed chain references each predecessor (sd7 expands sd0..sd6, each
    * expanding its own predecessors) — unmaterialized, the plan tree
    * grows 2^nlist-fold and OOMs an 8 GB instance on 500 rows (measured;
    * the SQL cousin of the when(...)-reduce expression-duplication trap).
    * Materialized, the whole funnel runs in <1 s.
    */
  private def ivfKppOracleSql: String = {
    val seedCtes = (1 until KppList).map { i =>
      val prev = (0 until i).map(j => s"sd$j")
      val maxCos =
        if (i == 1) cosSql("smp.v", "sd0.v")
        else s"greatest(${prev.map(p => cosSql("smp.v", s"$p.v")).mkString(", ")})"
      val excl = prev.map(p => s"smp.vec_id <> $p.vec_id").mkString(" AND ")
      s"""sd$i AS MATERIALIZED (SELECT vec_id, v FROM (
         |  SELECT smp.vec_id, smp.v, row_number() OVER (ORDER BY
         |    $maxCos ASC, smp.vec_id ASC) AS rn
         |  FROM smp, ${prev.mkString(", ")} WHERE $excl) WHERE rn = 1)""".stripMargin
    }
    val cent0 = (0 until KppList)
      .map(i => s"SELECT $i AS cid, v AS c FROM sd$i")
      .mkString("kcent0 AS MATERIALIZED (", "\n  UNION ALL ", ")")
    val lloydCtes = (1 to KppLloyd).map { t =>
      s"""kasn$t AS MATERIALIZED (SELECT vec_id, cid FROM (
         |  SELECT e.vec_id, p.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSql("e.v", "p.c")} DESC, p.cid ASC) AS rn
         |  FROM e CROSS JOIN kcent${t - 1} p) WHERE rn = 1),
         |km$t AS MATERIALIZED (SELECT cid, j, round(sum(x) / count(*), 6) AS sd FROM (
         |    SELECT a.cid, unnest(range(1, ${EmbDim + 1})) AS j, unnest(e.v) AS x
         |    FROM e JOIN kasn$t a USING (vec_id)) GROUP BY cid, j),
         |kc$t AS MATERIALIZED (SELECT cid, list(sd ORDER BY j) AS c FROM km$t GROUP BY cid),
         |kcent$t AS MATERIALIZED (SELECT p.cid, coalesce(kc$t.c, p.c) AS c
         |            FROM kcent${t - 1} p LEFT JOIN kc$t ON p.cid = kc$t.cid)""".stripMargin
    }
    val fc = s"kcent$KppLloyd"
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |           FROM embeddings),
       |smp AS MATERIALIZED (SELECT vec_id, v FROM e),
       |sd0 AS MATERIALIZED (SELECT vec_id, v FROM smp ORDER BY vec_id LIMIT 1),
       |${seedCtes.mkString(",\n")},
       |$cent0,
       |${lloydCtes.mkString(",\n")},
       |q AS MATERIALIZED (SELECT v AS qv FROM e WHERE vec_id = 0),
       |fasn AS MATERIALIZED (SELECT vec_id, cid FROM (
       |  SELECT e.vec_id, p.cid, row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY ${cosSql("e.v", "p.c")} DESC, p.cid ASC) AS rn
       |  FROM e CROSS JOIN $fc p) WHERE rn = 1),
       |probe AS MATERIALIZED (SELECT cid FROM (
       |  SELECT p.cid, row_number() OVER (ORDER BY ${cosSql("p.c", "q.qv")} DESC,
       |                                   p.cid ASC) AS rn
       |  FROM $fc p, q) WHERE rn <= 2)
       |SELECT e.vec_id AS vec_id, round(${cosSql("e.v", "q.qv")}, 4) AS sim
       |FROM e JOIN fasn USING (vec_id), q
       |WHERE fasn.cid IN (SELECT cid FROM probe) AND e.vec_id <> 0
       |ORDER BY ${cosSql("e.v", "q.qv")} DESC, e.vec_id ASC
       |LIMIT 10""".stripMargin
  }

  /** sim_ivfpq_topk: full replication of the IVF-PQ funnel — vectors
    * unit-normalized, PQ codebooks (pmod(id,16) seed-cluster element
    * means of the normalized space sliced into 4 subspaces of 16 dims),
    * per-vector per-subspace argmin codes (ties -> smallest code), ADC
    * approx-cosine = sum of the query's per-code dot LUT, IVF probe
    * filter (2 of 8 cells), top-[[PqRefine]] ADC candidates, then EXACT
    * cosine re-rank of the survivors (bit-identical `cosSql` fold) for
    * the final top-10. The approximate stages only pick the candidate
    * SET; every returned sim is exact.
    */
  private def ivfPqOracleSql: String = {
    val w = EmbDim / PqSub
    s"""WITH e AS (SELECT vec_id,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |           FROM embeddings),
       |en AS (SELECT vec_id, list_transform(v, x -> x /
       |           sqrt(list_reduce(list_transform(v, y -> y * y),
       |                (a, b) -> a + b))) AS nv FROM e),
       |ev AS (SELECT vec_id, unnest(range(1, ${EmbDim + 1})) AS j, unnest(nv) AS x
       |       FROM en),
       |cbs AS (SELECT code, j, cd, CAST(floor((j - 1) / $w) AS INT) AS sub FROM
       |          (SELECT vec_id % $PqCodes AS code, j, sum(x) / count(*) AS cd
       |           FROM ev GROUP BY code, j)),
       |pd AS (SELECT ev.vec_id, cbs.sub, cbs.code,
       |              sum((ev.x - cbs.cd) * (ev.x - cbs.cd)) AS d2
       |       FROM ev JOIN cbs ON ev.j = cbs.j
       |       GROUP BY ev.vec_id, cbs.sub, cbs.code),
       |codes AS (SELECT vec_id, sub, code FROM (
       |            SELECT vec_id, sub, code, row_number() OVER (
       |              PARTITION BY vec_id, sub ORDER BY d2 ASC, code ASC) AS rn
       |            FROM pd) WHERE rn = 1),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |qj AS (SELECT unnest(range(1, ${EmbDim + 1})) AS j, unnest(nv) AS qx
       |       FROM en WHERE vec_id = 0),
       |lut AS (SELECT cbs.sub, cbs.code, sum(qj.qx * cbs.cd) AS dotq
       |        FROM cbs JOIN qj ON cbs.j = qj.j GROUP BY cbs.sub, cbs.code),
       |cm AS (SELECT vec_id % 8 AS cid,
       |              unnest(range(1, ${EmbDim + 1})) AS j, unnest(v) AS x
       |       FROM e),
       |cent AS (SELECT cid, list(sd ORDER BY j) AS c FROM
       |           (SELECT cid, j, sum(x) / count(*) AS sd FROM cm GROUP BY cid, j)
       |         GROUP BY cid),
       |asn AS (SELECT vec_id, cid FROM (
       |          SELECT e.vec_id, cent.cid,
       |                 row_number() OVER (PARTITION BY e.vec_id
       |                   ORDER BY ${cosSql("e.v", "cent.c")} DESC, cent.cid ASC) AS rn
       |          FROM e CROSS JOIN cent) WHERE rn = 1),
       |probe AS (SELECT cid FROM (
       |            SELECT cent.cid,
       |                   row_number() OVER (ORDER BY ${cosSql("cent.c", "q.qv")} DESC,
       |                                      cent.cid ASC) AS rn
       |            FROM cent, q) WHERE rn <= 2),
       |approx AS (SELECT codes.vec_id, sum(lut.dotq) AS a
       |           FROM codes JOIN lut ON codes.sub = lut.sub AND codes.code = lut.code
       |           GROUP BY codes.vec_id),
       |cand AS (SELECT approx.vec_id FROM approx
       |         JOIN asn ON approx.vec_id = asn.vec_id
       |         WHERE asn.cid IN (SELECT cid FROM probe) AND approx.vec_id <> 0
       |         ORDER BY approx.a DESC, approx.vec_id ASC LIMIT $PqRefine)
       |SELECT e.vec_id AS vec_id, round(${cosSql("e.v", "q.qv")}, 4) AS sim
       |FROM e JOIN cand ON e.vec_id = cand.vec_id, q
       |ORDER BY ${cosSql("e.v", "q.qv")} DESC, e.vec_id ASC
       |LIMIT 10""".stripMargin
  }

  /** K3 boosted-search oracle (shared by the declarative and block-path
    * gates — both must produce identical results).
    */
  private def k3OracleSql: String =
    s"""$TfCte,
         |dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY 1),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |              (SELECT count(*) FROM toks) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |q AS (SELECT unnest(['data', 'join']) AS term),
         |sc AS (SELECT tf.doc_id,
         |              ln((st.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0) *
         |              ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.doc_len / st.avgdl)))) AS s
         |       FROM tf JOIN q USING (term) JOIN dft USING (term) JOIN dl USING (doc_id), st),
         |agg AS (SELECT doc_id, sum(s) AS score FROM sc GROUP BY 1 HAVING count(*) = 2),
         |$EdgesBody,
         |ind AS (SELECT to_doc AS doc_id, count(*) AS n FROM edges GROUP BY 1),
         |rnk AS (SELECT doc_id, 1.0 + log10(n) * 0.5 AS sr FROM ind)
         |SELECT agg.doc_id AS doc_id,
         |       round(agg.score * coalesce(rnk.sr, 1.0), 4) AS score
         |FROM agg LEFT JOIN rnk USING (doc_id)
         |ORDER BY agg.score * coalesce(rnk.sr, 1.0) DESC, agg.doc_id ASC
         |LIMIT 10""".stripMargin

  /** Line-records oracle ('vector stream' OR top-10, per-line earliest
    * match) — shared by the single and batched lines gates, which must
    * produce identical rows.
    */
  private def oracleSqlLineMatches: String =
    s"""$TfCte,
       |dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY 1),
       |st AS (SELECT (SELECT count(*) FROM documents) AS n,
       |              (SELECT count(*) FROM toks) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |q AS (SELECT unnest(['vector', 'stream']) AS term),
       |sc AS (SELECT tf.doc_id,
       |              ln((st.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0) *
       |              ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.doc_len / st.avgdl)))) AS s
       |       FROM tf JOIN q USING (term) JOIN dft USING (term) JOIN dl USING (doc_id), st),
       |agg AS (SELECT doc_id, sum(s) AS score FROM sc GROUP BY 1),
       |tk AS (SELECT doc_id, score,
       |              row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
       |       FROM agg ORDER BY score DESC, doc_id ASC LIMIT 10),
       |l AS (SELECT tk.doc_id, tk.rank, tk.score,
       |             unnest(string_split(d.text, chr(10))) AS line,
       |             unnest(range(1, len(string_split(d.text, chr(10))) + 1)) AS ln
       |      FROM tk JOIN documents d USING (doc_id)),
       |m AS (SELECT doc_id, rank, score, ln, line,
       |             least(coalesce(nullif(strpos(lower(line), 'vector'), 0), 999999999),
       |                   coalesce(nullif(strpos(lower(line), 'stream'), 0), 999999999)) AS p
       |      FROM l),
       |f AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY ln) AS rn
       |      FROM m WHERE p < 999999999)
       |SELECT doc_id, rank, ln AS line_number, p AS match_start,
       |       p + 6 AS match_end,
       |       substr(line, greatest(1, p - 200), 400) AS snippet,
       |       round(score, 4) AS score
       |FROM f WHERE rn <= 100""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "dedup_simhash" -> simhashOracleSql,
    "sim_lsh_neardups" -> lshOracleSql,
    "sim_ivf_topk" -> ivfOracleSql,
    "sim_ivf_kpp_topk" -> ivfKppOracleSql,
    "sim_ivfpq_topk" -> ivfPqOracleSql,
    // Full replication of Extract.contentSafetyCheck (utils.rs:174-211):
    // (1) binary gate — NUL or >10% control chars in the first 8KB (char
    //     window stands in for the byte window: exact on ASCII text, and
    //     line/nesting checks below are byte-exact regardless);
    // (2) no line over 100000 BYTES (strlen = bytes in DuckDB);
    // (3) bracket nesting depth (clamped at 0) <= 500, via the reflected-
    //     walk identity depth_i = S_i - min(0, min_{j<=i} S_j).
    "s5_safety_filter" ->
      """WITH sub AS (SELECT doc_id, substr(text, 1, 8192) AS s8 FROM documents),
        |bin AS (SELECT doc_id,
        |          contains(s8, chr(0)) AS has_nul, length(s8) AS clen,
        |          length(s8) - length(regexp_replace(s8,
        |            '[\x01-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS ctl
        |        FROM sub),
        |lns AS (SELECT doc_id,
        |          len(list_filter(string_split(text, chr(10)),
        |              l -> strlen(l) > 100000)) AS nlong
        |        FROM documents),
        |br AS (SELECT doc_id,
        |         regexp_replace(text, '[^{}()\[\]]', '', 'g') AS bs
        |       FROM documents),
        |steps AS (SELECT doc_id, unnest(range(1, len(bs) + 1)) AS i, bs FROM br),
        |walk AS (SELECT doc_id, i,
        |           sum(CASE WHEN bs[i] IN ('{', '(', '[') THEN 1 ELSE -1 END)
        |             OVER (PARTITION BY doc_id ORDER BY i) AS s
        |         FROM steps),
        |dep AS (SELECT doc_id, max(s - least(0, mn)) AS maxd FROM (
        |          SELECT doc_id, s,
        |                 min(s) OVER (PARTITION BY doc_id ORDER BY i
        |                   ROWS UNBOUNDED PRECEDING) AS mn
        |          FROM walk) GROUP BY doc_id)
        |SELECT d.doc_id FROM documents d
        |LEFT JOIN bin USING (doc_id)
        |LEFT JOIN lns USING (doc_id)
        |LEFT JOIN dep USING (doc_id)
        |WHERE NOT (bin.has_nul OR (bin.clen > 0 AND bin.ctl > bin.clen // 10))
        |  AND lns.nlong = 0 AND coalesce(dep.maxd, 0) <= 500""".stripMargin,

    "a1_postings" ->
      s"$TfCte SELECT term, doc_id, tf FROM tf",

    "a6_doclen" ->
      s"$ToksCte SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id",

    "a5_corpus_stats" ->
      s"""$ToksCte
         |SELECT (SELECT count(*) FROM documents) AS num_docs,
         |       (SELECT count(*) FROM toks) AS total_tokens,
         |       (SELECT count(DISTINCT term) FROM toks) AS num_terms,
         |       round((SELECT count(*) FROM toks) * 1.0 /
         |             (SELECT count(*) FROM documents), 6) AS avgdl""".stripMargin,

    "a4_term_idf" ->
      s"""$TfCte
         |SELECT term, count(*) AS df,
         |       round(ln(((SELECT count(*) FROM documents) - count(*) + 0.5) /
         |                (count(*) + 0.5) + 1.0), 6) AS idf
         |FROM tf GROUP BY term""".stripMargin,

    "j1_conjunctive" ->
      s"""$TfCte
         |SELECT doc_id FROM tf WHERE term IN ('spark', 'merge', 'window')
         |GROUP BY doc_id HAVING count(*) = 3""".stripMargin,

    "k1_bm25_topk_and" ->
      bm25Sql(Seq("spark", "merge", "window"), conjunctive = true, k = 20),

    "k1_bm25_topk_or" ->
      bm25Sql(Seq("vector", "stream"), conjunctive = false, k = 20),

    "k1_bm25_batch" ->
      s"""SELECT 0 AS qid, doc_id, score FROM (
         |${bm25Sql(Seq("spark", "merge", "window"), conjunctive = true, k = 20)})
         |UNION ALL
         |SELECT 1 AS qid, doc_id, score FROM (
         |${bm25Sql(Seq("vector", "stream"), conjunctive = false, k = 20)})""".stripMargin,

    // per-class oracles composed with qid: plain AND, url-glob filtered
    // ('doc-1*' over urls 'doc-<id>' == doc_id decimal string starts
    // with '1'), and the boosted-class oracle (k3OracleSql)
    "k1_bm25_batch_mixed" ->
      s"""SELECT 0 AS qid, doc_id, score FROM (
         |${bm25Sql(Seq("spark", "merge", "window"), conjunctive = true, k = 10)})
         |UNION ALL
         |SELECT 1 AS qid, doc_id, score FROM (
         |${bm25Sql(Seq("data", "join"), conjunctive = true, k = 10,
             extraFilter = Some("CAST(dx.doc_id AS VARCHAR) LIKE '1%'"))})
         |UNION ALL
         |SELECT 2 AS qid, doc_id, score FROM (
         |$k3OracleSql)""".stripMargin,

    // identical results contract: batched lines == single-path lines
    "p7_line_matches_batch" -> oracleSqlLineMatches,

    "p5_filtered_search" ->
      bm25Sql(Seq("data", "join"), conjunctive = true, k = 10, langFilter = Some("en")),

    "p5_filtered_blocks" ->
      bm25Sql(Seq("data", "join"), conjunctive = true, k = 10, langFilter = Some("en")),

    "p5_dense_filter_blocks" ->
      bm25Sql(Seq("spark", "merge"), conjunctive = true, k = 10, langFilter = Some("en")),

    "w1_top_per_source" ->
      """SELECT source, doc_id, rn FROM (
        |  SELECT source, doc_id,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents) WHERE rn <= 3""".stripMargin,

    "a8_percentiles" ->
      s"""$ToksCte, dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY 1)
         |SELECT round(quantile_cont(doc_len, 0.5), 4) AS p50,
         |       round(quantile_cont(doc_len, 0.95), 4) AS p95,
         |       round(quantile_cont(doc_len, 0.99), 4) AS p99 FROM dl""".stripMargin,

    "u3_dedup_exact" ->
      """SELECT doc_id,
        |       min(doc_id) OVER (PARTITION BY lower(text)) AS canonical_id,
        |       doc_id = min(doc_id) OVER (PARTITION BY lower(text)) AS is_canonical
        |FROM documents""".stripMargin,

    // MinHash+LSH with exact verification: at this banding geometry the
    // candidate recall is 1.0 on this dataset (verified: output == exact
    // join), so the exact-Jaccard SQL is a valid oracle.
    "dedup_minhash" ->
      s"""$ShingleCte,
         |common AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
         |           FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
         |           GROUP BY 1, 2)
         |SELECT a, b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS j
         |FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
         |WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8""".stripMargin,

    "txt_langid" ->
      s"""WITH t AS (SELECT doc_id, $Tok AS ts FROM documents),
         |s AS (SELECT doc_id,
         |  len(list_filter(ts, x -> x IN ('the','and','for','with','that','this','are','was'))) AS en,
         |  len(list_filter(ts, x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS de,
         |  len(list_filter(ts, x -> x IN ('les','des','est','une','dans','pour','que','sur'))) AS fr,
         |  len(list_filter(ts, x -> x IN ('los','las','por','para','con','una','del','est'))) AS es
         |  FROM t)
         |SELECT doc_id, CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
         |  WHEN en >= de AND en >= fr AND en >= es THEN 'en'
         |  WHEN de >= fr AND de >= es THEN 'de'
         |  WHEN fr >= es THEN 'fr' ELSE 'es' END AS lang_guess FROM s""".stripMargin,

    "txt_tokens_bpe" ->
      """SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 2)) AS n_tokens_word,
        |  len(regexp_extract_all(text,
        |      '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]+')) AS n_tokens_bpe
        |FROM documents""".stripMargin,

    "dedup_jaccard_pairs" ->
      s"""$ShingleCte,
         |common AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
         |           FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
         |           GROUP BY 1, 2)
         |SELECT a, b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS j
         |FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
         |WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8""".stripMargin,

    // transitive closure of the near-dup pairs via a recursive CTE
    // (min-label over reachability); the minhash pair set equals the
    // exact-Jaccard pair set at this banding geometry (recall 1.0 on
    // this dataset, same argument as the dedup_minhash oracle)
    "dedup_clusters" ->
      s"""${ShingleCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |common AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
         |           FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
         |           GROUP BY 1, 2),
         |pairs AS (SELECT a, b FROM common
         |          JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
         |          WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8),
         |edges AS (SELECT a AS u, b AS v FROM pairs
         |          UNION SELECT b AS u, a AS v FROM pairs),
         |reach(u, v) AS (SELECT u, v FROM edges
         |                UNION SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v),
         |comp AS (SELECT u, least(u, min(v)) AS component FROM reach GROUP BY u)
         |SELECT d.doc_id,
         |       coalesce(c.component, d.doc_id) AS component,
         |       d.doc_id = coalesce(c.component, d.doc_id) AS is_canonical
         |FROM documents d LEFT JOIN comp c ON c.u = d.doc_id""".stripMargin,

    "txt_fingerprint" ->
      s"SELECT doc_id, md5(array_to_string($Tok, ' ')) AS fp FROM documents",

    // line-window chunks size=8 overlap=2 (step=6): line L belongs to
    // chunks [max(0,(L-8)//6+1) .. L//6]; duckdb range() is exclusive-hi
    "chunk_split" ->
      """WITH l AS (SELECT doc_id,
        |             unnest(string_split(text, chr(10))) AS line,
        |             unnest(range(0, len(string_split(text, chr(10))))) AS ln0
        |           FROM documents),
        |lc AS (SELECT doc_id, ln0, line,
        |         unnest(range(CASE WHEN ln0 < 8 THEN 0 ELSE (ln0 - 8) // 6 + 1 END,
        |                      ln0 // 6 + 1)) AS chunk
        |       FROM l)
        |SELECT doc_id, chunk, min(ln0) AS start_line, max(ln0) AS end_line,
        |       count(*) AS n_lines,
        |       md5(string_agg(line, chr(10) ORDER BY ln0)) AS chunk_md5
        |FROM lc GROUP BY 1, 2""".stripMargin,

    // chunk_file dispatch twin: symbol-anchored chunks (50-line cap,
    // Function/Class/Module typing per chunking.rs:71-84) for docs with
    // kept symbols (doc_id%3<>0 — gate choice to exercise both
    // branches), fixed 8/2 windows for the rest; symbol extraction
    // reuses the SAME generated CodeArm legs as sym_code_extract
    "chunk_typed" ->
      s"""WITH $CodeViewBody,
         |$SymCodeBody,
         |syk AS (SELECT * FROM sy WHERE doc_id % 3 <> 0),
         |ls AS (SELECT doc_id, regexp_split_to_array(code, '\\r?\\n') AS lines
         |       FROM cv WHERE code IS NOT NULL),
         |symc AS (SELECT s.doc_id, s.name,
         |    CASE WHEN s.kind IN ('function', 'method') THEN 'function'
         |         WHEN s.kind IN ('class', 'type') THEN 'class'
         |         ELSE 'module' END AS chunk_type,
         |    CAST(s.line AS BIGINT) AS start_line,
         |    CAST(least(s.line + 49, len(l.lines)) AS BIGINT) AS end_line,
         |    md5(array_to_string(
         |      list_slice(l.lines, s.line, least(s.line + 49, len(l.lines))),
         |      chr(10))) AS chunk_md5
         |  FROM syk s JOIN ls l USING (doc_id)),
         |fl AS (SELECT doc_id, unnest(lines) AS line,
         |         unnest(range(0, len(lines))) AS ln0
         |       FROM ls WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM syk)),
         |fc AS (SELECT doc_id, ln0, line,
         |         unnest(range(CASE WHEN ln0 < 8 THEN 0 ELSE (ln0 - 8) // 6 + 1 END,
         |                      ln0 // 6 + 1)) AS chunk
         |       FROM fl),
         |fx AS (SELECT doc_id, CAST(NULL AS VARCHAR) AS name,
         |         'fixed' AS chunk_type,
         |         min(ln0) + 1 AS start_line, max(ln0) + 1 AS end_line,
         |         md5(string_agg(line, chr(10) ORDER BY ln0)) AS chunk_md5
         |       FROM fc GROUP BY doc_id, chunk)
         |SELECT doc_id, name, chunk_type, start_line, end_line, chunk_md5 FROM symc
         |UNION ALL
         |SELECT doc_id, name, chunk_type, start_line, end_line, chunk_md5 FROM fx""".stripMargin,

    "txt_quality" ->
      s"""$ToksCte,
         |t AS (SELECT doc_id, count(*) AS n_tokens,
         |             CAST(sum(length(term)) AS BIGINT) AS tc,
         |             CAST(sum(CASE WHEN term = 'the' THEN 1 ELSE 0 END) AS BIGINT) AS stops
         |      FROM toks GROUP BY 1)
         |SELECT d.doc_id AS doc_id, length(d.text) AS n_chars, t.n_tokens AS n_tokens,
         |       round(t.tc * 1.0 / t.n_tokens, 4) AS mean_tok_len,
         |       round(1.0 / (1.0 + exp(-(ln(1.0 + t.n_tokens) / 2.0 -
         |             2.0 * (t.stops * 1.0 / t.n_tokens)))), 4) AS quality
         |FROM documents d JOIN t ON t.doc_id = d.doc_id""".stripMargin,

    "sim_cosine_topk" ->
      """WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
        |SELECT v.vec_id AS vec_id,
        |       round((SELECT sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
        |              FROM (SELECT unnest(v.embedding) AS a, unnest(q.e) AS b)) /
        |             (sqrt((SELECT sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE))
        |                    FROM (SELECT unnest(v.embedding) AS a))) *
        |              sqrt((SELECT sum(CAST(b AS DOUBLE) * CAST(b AS DOUBLE))
        |                    FROM (SELECT unnest(q.e) AS b)))), 4) AS sim
        |FROM embeddings v, q WHERE v.vec_id <> 0
        |ORDER BY (SELECT sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
        |          FROM (SELECT unnest(v.embedding) AS a, unnest(q.e) AS b)) /
        |         (sqrt((SELECT sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE))
        |                FROM (SELECT unnest(v.embedding) AS a))) *
        |          sqrt((SELECT sum(CAST(b AS DOUBLE) * CAST(b AS DOUBLE))
        |                FROM (SELECT unnest(q.e) AS b)))) DESC, v.vec_id ASC
        |LIMIT 10""".stripMargin,

    "st_windowed_events" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |       event_type, count(*) AS n_events, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "p7_substring_pos" ->
      """SELECT doc_id, CAST(strpos(lower(text), 'spark merge') AS BIGINT) AS pos
        |FROM documents WHERE strpos(lower(text), 'spark merge') > 0""".stripMargin,

    "p8_snippet" ->
      """SELECT doc_id,
        |       substr(text, greatest(1, strpos(lower(text), 'vector') - 20), 50) AS snippet
        |FROM documents WHERE strpos(lower(text), 'vector') > 0""".stripMargin,

    "a3_indegree" ->
      "SELECT source, count(*) AS n_docs FROM documents GROUP BY source",

    "j2_resolve" ->
      s"WITH $EdgesBody SELECT from_doc, to_doc FROM edges",

    "a3_edges_indegree" ->
      s"""WITH $EdgesBody
         |SELECT to_doc AS doc_id, count(*) AS in_degree
         |FROM edges GROUP BY 1""".stripMargin,

    "j4_dependents" ->
      s"""WITH $EdgesBody,
         |s0 AS (SELECT source FROM documents WHERE doc_id = 0),
         |hubx AS (SELECT min(doc_id) AS h FROM documents
         |         WHERE source = (SELECT source FROM s0))
         |SELECT from_doc FROM edges
         |WHERE to_doc = (SELECT h FROM hubx)""".stripMargin,

    "k3_boosted_topk" -> k3OracleSql,

    // identical results contract: block-path boosted == declarative
    "k3_boosted_blocks" -> k3OracleSql,


    "p4_short_query" ->
      """SELECT doc_id, CAST(0.0 AS DOUBLE) AS score FROM documents
        |ORDER BY doc_id ASC LIMIT 10""".stripMargin,

    "p7_line_matches" -> oracleSqlLineMatches,

    "sym_extract" ->
      """WITH l AS (SELECT doc_id,
        |             unnest(string_split(text, chr(10))) AS line,
        |             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS ln
        |           FROM documents),
        |sy AS (SELECT doc_id, ln AS line,
        |         list_filter(regexp_split_to_array(lower(line), '[^a-z0-9]+'),
        |                     x -> length(x) > 2)[1] AS name
        |       FROM l)
        |SELECT doc_id, name,
        |       CASE WHEN line % 3 = 1 THEN 'def'
        |            WHEN line % 3 = 2 THEN 'ref' ELSE 'use' END AS kind,
        |       line
        |FROM sy WHERE name IS NOT NULL""".stripMargin,

    "sym_search" -> SymSearchSql,

    // identical results contract: the indexed path must equal the scan path
    "sym_search_indexed" -> SymSearchSql,

    "sym_web_extract" ->
      s"""WITH $WebViewBody,
         |$SymWebBody
         |SELECT doc_id, name, kind, line FROM sy""".stripMargin,

    "sym_web_search" -> SymWebSearchSql,

    "sym_web_search_indexed" -> SymWebSearchSql,

    "sym_code_extract" ->
      s"""WITH $CodeViewBody,
         |$SymCodeBody
         |SELECT doc_id, name, kind, line, "column", is_definition FROM sy""".stripMargin,

    "sym_filenames" ->
      s"""WITH u AS (SELECT doc_id,
         |  'https://corpus.example/doc-' || CAST(doc_id AS VARCHAR) AS url
         |  FROM documents)
         |SELECT doc_id,
         |  lower(regexp_extract(url, '${graft.symbols.Symbols.FileNameRx}', 1)) AS name,
         |  'filename' AS kind, 0 AS line, 0 AS "column", TRUE AS is_definition
         |FROM u
         |WHERE length(lower(regexp_extract(url, '${graft.symbols.Symbols.FileNameRx}', 1))) > 2""".stripMargin,

    "sym_code_search" -> SymCodeSearchSql,

    "sym_code_search_indexed" -> SymCodeSearchSql,

    "p3_regex_accel" ->
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(lower(text), 'spark\s+\w+\s+merge')""".stripMargin,

    "p3_regex_fullscan" ->
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(lower(text), 'ba.ch')""".stripMargin,

    "p3_regex_alt" ->
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(lower(text), '(vector|stream)\s+\w+')""".stripMargin,

    "p3_regex_prefix" ->
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(lower(text), '\svect\w+')""".stripMargin,

    "p3_regex_suffix" ->
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(lower(text), '\w+tor\s')""".stripMargin,

    "p3_regex_infix" ->
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(lower(text), '\w+ustome\w+')""".stripMargin,

    "p3_regex_batch" ->
      """SELECT 0 AS qid, doc_id FROM documents
        |WHERE regexp_matches(lower(text), 'spark\s+\w+\s+merge')
        |UNION ALL SELECT 1 AS qid, doc_id FROM documents
        |WHERE regexp_matches(lower(text), '(vector|stream)\s+\w+')
        |UNION ALL SELECT 2 AS qid, doc_id FROM documents
        |WHERE regexp_matches(lower(text), '\svect\w+')
        |UNION ALL SELECT 3 AS qid, doc_id FROM documents
        |WHERE regexp_matches(lower(text), '\w+tor\s')
        |UNION ALL SELECT 4 AS qid, doc_id FROM documents
        |WHERE regexp_matches(lower(text), '\w+ustome\w+')
        |UNION ALL SELECT 5 AS qid, doc_id FROM documents
        |WHERE regexp_matches(lower(text), 'ba.ch')""".stripMargin,

    "u2_except" ->
      """SELECT doc_id FROM documents WHERE lang = 'en'
        |EXCEPT SELECT doc_id FROM documents WHERE n_chars < 200""".stripMargin,

    // FNV-1a over the payload bytes in 128-bit arithmetic mod 2^64
    // (replicates FakeDecoder.decode exactly; >>17 arithmetic shift done
    // as a biased floor-division, width/height from the signed checksum)
    "mm_features" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |                  octet_length(encode(text)) AS n FROM documents),
        |fnv AS (SELECT doc_id, n,
        |  list_reduce(
        |    list_prepend(CAST(1469598103934665603 AS HUGEINT),
        |      list_transform(range(1, n + 1),
        |        i -> CAST(CAST(('0x' || substr(hx, 2*i - 1, 2)) AS UBIGINT) AS HUGEINT))),
        |    (acc, byte) -> (xor(acc, byte) * 1099511628211) % 18446744073709551616
        |  ) AS hu
        |  FROM b),
        |s AS (SELECT doc_id, n,
        |  CASE WHEN hu >= 9223372036854775808
        |       THEN CAST(hu - 18446744073709551616 AS BIGINT)
        |       ELSE CAST(hu AS BIGINT) END AS h
        |  FROM fnv)
        |SELECT doc_id AS mm_id, n AS n_bytes,
        |  64 + CAST(abs(h % 577) AS INT) AS width,
        |  64 + CAST(abs(CAST((((CAST(h AS HUGEINT) + 9223372036854775808) // 131072)
        |                      - 70368744177664) % 431 AS BIGINT)) AS INT) AS height,
        |  h AS checksum
        |FROM s""".stripMargin,

    "w2_fast_rank" ->
      s"""WITH top100 AS (
         |  SELECT doc_id, text FROM documents
         |  ORDER BY n_chars DESC, doc_id ASC LIMIT 100),
         |t AS (SELECT doc_id,
         |             len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
         |                             x -> length(x) > 2)) AS n_tokens,
         |             len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
         |                             x -> x = 'the')) AS stops
         |      FROM top100)
         |SELECT doc_id,
         |       round(1.0 / (1.0 + exp(-(ln(1.0 + n_tokens) / 2.0 -
         |             2.0 * (stops * 1.0 / n_tokens)))), 4) AS quality
         |FROM t ORDER BY quality DESC, doc_id ASC LIMIT 10""".stripMargin)
}
