package graft

import scala.collection.mutable.LinkedHashMap

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one warm session, every SparkEntry query timed
  * once (the index build for the BM25 queries is timed separately as
  * `index_build`). Prints exactly ONE JSON line with a per-query and a
  * per-query-class breakdown; a failed query is reported by its exception
  * string under "errors" (never as a fake small/negative time — the
  * round-over-round signal must not hide breakage as speed).
  */
object Bench {

  /** Workload class per gate query, so regressions localize to the query
    * family (the reference validator's load-test reports per-class QPS the
    * same way, fast_code_search_validator.rs:692-810).
    */
  val QueryClass: Map[String, String] = Map(
    "index_build" -> "build",
    // BM25 serving paths
    "k1_bm25_topk_and" -> "conjunctive",
    "j1_conjunctive" -> "conjunctive",
    "p5_filtered_search" -> "conjunctive",
    "p5_filtered_blocks" -> "conjunctive",
    "p5_dense_filter_blocks" -> "conjunctive",
    "k3_boosted_topk" -> "conjunctive",
    "k3_boosted_blocks" -> "conjunctive",
    "k1_bm25_topk_or" -> "disjunctive",
    "k1_bm25_batch" -> "disjunctive",
    "k1_bm25_batch_mixed" -> "disjunctive",
    "p4_short_query" -> "disjunctive",
    "p7_line_matches" -> "serving_lines",
    "p7_line_matches_batch" -> "serving_lines",
    "p7_substring_pos" -> "needle",
    "p8_snippet" -> "needle",
    "p3_regex_accel" -> "regex",
    "p3_regex_fullscan" -> "regex",
    "p3_regex_alt" -> "regex",
    "p3_regex_prefix" -> "regex",
    "p3_regex_suffix" -> "regex",
    "p3_regex_infix" -> "regex",
    "p3_regex_batch" -> "regex",
    // index/aggregate derivations
    "a1_postings" -> "agg",
    "a6_doclen" -> "agg",
    "a5_corpus_stats" -> "agg",
    "a4_term_idf" -> "agg",
    "a8_percentiles" -> "agg",
    "a3_indegree" -> "agg",
    "w1_top_per_source" -> "agg",
    "st_windowed_events" -> "agg",
    // dedup family
    "u3_dedup_exact" -> "dedup",
    "dedup_jaccard_pairs" -> "dedup",
    "dedup_minhash" -> "dedup",
    "dedup_simhash" -> "dedup",
    "txt_fingerprint" -> "dedup",
    // similarity family
    "sim_cosine_topk" -> "similarity",
    "sim_ivf_topk" -> "similarity",
    "sim_lsh_neardups" -> "similarity",
    // text analysis
    "txt_quality" -> "text",
    "chunk_split" -> "text",
    "chunk_typed" -> "text",
    "txt_langid" -> "text",
    "txt_tokens_bpe" -> "text",
    "s5_safety_filter" -> "text",
    "w2_fast_rank" -> "text",
    "mm_features" -> "text",
    // dependency graph
    "j2_resolve" -> "graph",
    "a3_edges_indegree" -> "graph",
    "j4_dependents" -> "graph",
    // symbols
    "sym_extract" -> "symbols",
    "sym_search" -> "symbols",
    "sym_search_indexed" -> "symbols",
    "sym_web_extract" -> "symbols",
    "sym_web_search" -> "symbols",
    "sym_web_search_indexed" -> "symbols",
    // set ops
    "u2_except" -> "setops")

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Core count of the bracketing window probes: 8 is the host's
    * "binding" level (its persisted best-ever baseline exists and its
    * readings detected every degraded regime rounds 4-6 caught).
    */
  val ProbeCores = 8

  /** Bracketing window-certification probes (round 7, VERDICT r6 #2):
    * the round-6 bench was captured in a host window the same day's
    * scaling probes showed was degraded (±50% swings), and nothing in
    * the artifact said so — `contended` only certifies against sibling
    * bench JVMs, not host neighbors. The same pinned CPU/memory probe
    * children ScalingBench uses now run BEFORE and AFTER the bench,
    * their ratios to the persisted best-ever baseline
    * (BENCH/probe_baseline.json) are stamped into the JSON, and
    * `window_clean` applies the scaling gate tolerances (cpu 1.10 /
    * mem 1.25) to the WORSE bracket of each kind. No baseline on disk
    * => probes are skipped and `window_clean` is null (unknown), never
    * a false "clean".
    */
  private def probePair(): Option[(Double, Double)] =
    try Some(ScalingBench.spawnProbe(ProbeCores))
    catch {
      case e: Exception =>
        System.err.println(s"[bench-probe] probe failed: ${e.getMessage}")
        None
    }

  def main(args: Array[String]): Unit = {
    // hygiene gate (round 6): never time against a live pinned
    // ScalingBench — wait for it to drain; if it won't, warn loudly and
    // stamp the artifact contended so the number can't be read as clean
    val clear = BenchGuard.awaitClear(waitMs = 180000L)
    if (!clear)
      System.err.println("[bench-guard] WARNING: proceeding with a live " +
        "ScalingBench — this bench run is CONTENDED and its timings are " +
        "not comparable to clean-window rounds")
    val baseline = ScalingBench.loadBaseline()
    val haveBase = baseline.contains(s"cpu@$ProbeCores") &&
      baseline.contains(s"mem@$ProbeCores")
    val pre = if (haveBase && clear) probePair() else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = LinkedHashMap.empty[String, Double]
    val errors = LinkedHashMap.empty[String, String]
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // index build (extract+tokenize+tf+dict+postings+blocks) over documents
    results += "index_build" -> time(SparkEntry.warmIndex(spark, sfDir))

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try results += name -> time(fn(spark, sfDir).count())
      catch {
        case e: Throwable =>
          errors += name -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }

    val qs = results.map { case (k, v) => jsonStr(k) + f":${v}%.3f" }
      .mkString("{", ",", "}")
    val classTotals = LinkedHashMap.empty[String, Double]
    results.foreach { case (k, v) =>
      val c = QueryClass.getOrElse(k, "other")
      classTotals += c -> (classTotals.getOrElse(c, 0.0) + v)
    }
    val cs = classTotals.map { case (k, v) => jsonStr(k) + f":${v}%.3f" }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }
      .mkString("{", ",", "}")
    // "failed" rides in the headline so a cross-round total comparison
    // cannot mistake a dropped (broken) query for a speedup
    val total = results.values.sum
    spark.stop()

    // post-bracket probe + window verdict (see probePair scaladoc)
    val post = if (haveBase && clear) probePair() else None
    val (probesJson, windowClean) = (pre, post) match {
      case (Some((pc, pm)), Some((qc, qm))) =>
        val bc = baseline(s"cpu@$ProbeCores"); val bm = baseline(s"mem@$ProbeCores")
        val cpuRatio = math.max(pc, qc) / bc
        val memRatio = math.max(pm, qm) / bm
        val cleanV = cpuRatio <= ScalingBench.CpuTolerance &&
          memRatio <= ScalingBench.MemTolerance
        // a better-than-best probe updates the persisted host baseline
        // (one source of truth with the scaling protocol)
        val improved = math.min(pc, qc) < bc || math.min(pm, qm) < bm
        if (improved) {
          baseline(s"cpu@$ProbeCores") = math.min(bc, math.min(pc, qc))
          baseline(s"mem@$ProbeCores") = math.min(bm, math.min(pm, qm))
          try ScalingBench.saveBaseline(baseline)
          catch { case _: Exception => () }
        }
        (f"""{"pre_cpu@$ProbeCores":$pc%.3f,"pre_mem@$ProbeCores":$pm%.3f,"post_cpu@$ProbeCores":$qc%.3f,"post_mem@$ProbeCores":$qm%.3f,"base_cpu@$ProbeCores":$bc%.3f,"base_mem@$ProbeCores":$bm%.3f,"cpu_ratio":$cpuRatio%.3f,"mem_ratio":$memRatio%.3f}""",
          cleanV.toString)
      case _ => ("null", "null")
    }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":${errors.size},"contended":${!clear},"window_clean":$windowClean,"probes":$probesJson,"queries":$qs,"classes":$cs,"errors":$es,"sf":"$sfDir"}""")
  }
}
