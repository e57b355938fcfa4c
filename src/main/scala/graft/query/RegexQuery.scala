package graft.query

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.index.BuiltIndex
import graft.tokenize.Tokenizer

/** Regex search with index acceleration — the Spark re-expression of the
  * reference's regex path (/root/reference/src/search/engine.rs:1540-1613
  * + literal extraction from the regex HIR in
  * src/search/regex_search.rs:30-117): derive REQUIRED literals from the
  * pattern, pre-filter candidates through the index, verify candidates
  * with the real regex; no usable literal -> full scan (the reference's
  * `no_literal` fallback, README.md:499).
  *
  * One semantic shift, documented: the reference's trigram index is
  * substring-sound, our index is WORD-level. A literal run in the pattern
  * therefore yields one of two sound prefilter forms per side:
  *   - a side bounded by guaranteed non-alphanumeric context (a literal
  *     non-alnum char, `\s`, `^`/`$`) pins the token edge;
  *   - an UNBOUNDED side (pattern start/end, `.`, `\w`, quantifiers, and
  *     the charset-unsafe zero-width/class escapes `\b \B \W \D`) means
  *     the match can begin or end MID-token, so the doc's token may extend
  *     on that side -> the literal becomes a dictionary prefix/suffix/infix
  *     LIKE lookup instead of an exact term.
  * Both forms never exclude a true match (the regex verify decides).
  * Matching is case-insensitive via `(?i)` on the ORIGINAL pattern —
  * lowercasing the pattern text would corrupt metacharacters (\W -> \w,
  * \B -> \b, \P{..} -> \p{..}).
  */
object RegexQuery {

  /** A required literal with per-side boundary knowledge. */
  case class Lit(text: String, leftBound: Boolean, rightBound: Boolean) {
    def bothBound: Boolean = leftBound && rightBound
  }

  private def utf8Len(s: String): Int = s.getBytes("UTF-8").length

  /** Driver-side pattern analysis: required literals (lowercased to match
    * the index; byte-length > 2 like the tokenizer), conservative —
    * returns Nil whenever soundness is in doubt (top-level alternation,
    * classes, groups).
    */
  def requiredLiterals(pattern: String): Seq[Lit] = {
    if (pattern.exists(c => c == '|' || c == '[' || c == '(')) {
      // conservative: alternation/classes/groups anywhere -> no prefilter
      // (a full HIR analysis would do better; this mirrors the fallback
      // shape of regex_search.rs for complex patterns)
      return Nil
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Lit]
    val n = pattern.length
    var i = 0
    // pattern start is NOT a token boundary: an unanchored regex can match
    // mid-token ('data\s+join' matches inside 'bigdata join')
    var leftB = false
    val cur = new StringBuilder

    // split the accumulated literal run on the indexer's own character
    // class; interior tokens have literal separators on both sides,
    // first/last inherit the run's outer boundary knowledge
    def flush(rightB: Boolean): Unit = {
      if (cur.nonEmpty) {
        val s = cur.toString
        val runs = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        var start = -1
        while (j < s.length) {
          val cp = s.codePointAt(j)
          val w = Character.charCount(cp)
          if (Tokenizer.isAlnumCodePoint(cp)) { if (start < 0) start = j }
          else if (start >= 0) { runs += s.substring(start, j); start = -1 }
          j += w
        }
        val endsAlnum = start >= 0
        if (endsAlnum) runs += s.substring(start)
        val startsAlnum = s.nonEmpty &&
          Tokenizer.isAlnumCodePoint(s.codePointAt(0))
        runs.zipWithIndex.foreach { case (t, j2) =>
          if (utf8Len(t) > 2) {
            val lb = j2 > 0 || !startsAlnum || leftB
            val rb = j2 < runs.length - 1 || !endsAlnum || rightB
            out += Lit(t.toLowerCase(java.util.Locale.ROOT), lb, rb)
          }
        }
        cur.clear()
      }
    }
    def deleteLastCodePoint(): Unit =
      if (cur.nonEmpty) {
        val last = cur.length - 1
        if (last > 0 && Character.isLowSurrogate(cur.charAt(last)) &&
            Character.isHighSurrogate(cur.charAt(last - 1)))
          cur.delete(last - 1, last + 1)
        else cur.deleteCharAt(last)
      }

    while (i < n) {
      val c = pattern(i)
      if (c == '\\' && i + 1 < n) {
        val e = pattern(i + 1)
        if (e == 's') {
          // \s is a guaranteed separator in every charset
          flush(true); leftB = true
        } else if (!Character.isLetterOrDigit(e)) {
          // escaped punctuation: a literal non-alnum char
          flush(true); leftB = true
        } else {
          // \w \d (extend words), \b \B \W \D (ASCII semantics are unsound
          // against the Unicode tokenizer), \n \t ... -> unknown boundary
          flush(false); leftB = false
        }
        i += 2
      } else if (c == '?' || c == '*' || c == '{') {
        // zero-allowed quantifier: the previous unit may be absent -> its
        // contribution and the boundary after it are unknown
        if (cur.nonEmpty) { deleteLastCodePoint(); flush(false) }
        else if (out.nonEmpty) {
          // the quantified unit is the SEPARATOR that just flushed (e.g.
          // 'data\s*join'): \s* can match empty, so the right boundary it
          // granted the preceding literal is void — 'datajoin' is a true
          // match and must survive the prefilter. (Conservative when an
          // earlier separator in the run was unquantified, or the brace
          // min is >= 1 — a weaker prefilter, never an unsound one.)
          val last = out.length - 1
          out(last) = out(last).copy(rightBound = false)
        }
        leftB = false
        if (c == '{') { while (i < n && pattern(i) != '}') i += 1 }
        i += 1
      } else if (c == '+') {
        if (cur.nonEmpty) {
          // one-or-more on an alnum char: char required, but the word may
          // extend (spark+ matches sparkk) -> right boundary unknown
          flush(false); leftB = false
        }
        // '+' on a separator (e.g. \s+): still a guaranteed separator —
        // leftB keeps whatever the separator established
        i += 1
      } else if (c == '.') {
        flush(false); leftB = false
        i += 1
      } else if (c == '^' || c == '$') {
        flush(true); leftB = true
        i += 1
      } else if (Tokenizer.isAlnumCodePoint(pattern.codePointAt(i))) {
        val w = Character.charCount(pattern.codePointAt(i))
        cur.append(pattern.substring(i, i + w))
        i += w
      } else {
        // literal non-alnum char: a guaranteed separator
        flush(true); leftB = true
        i += 1
      }
    }
    // pattern end is NOT a boundary (can match mid-token) unless anchored
    flush(false)
    out.toSeq.distinct
  }

  /** Exact complete tokens only (both sides bounded) — the strongest
    * prefilter class; kept as the BM25-rankable case.
    */
  def requiredTokens(pattern: String): Seq[String] =
    requiredLiterals(pattern).filter(_.bothBound).map(_.text).distinct

  /** Candidate doc_ids for partially-bounded literals: each literal maps
    * to the dictionary terms it can live in (exact / prefix / suffix /
    * infix), then one postings pass keeps docs covering ALL literals.
    * A LIKE dictionary scan has no parquet pushdown, but the dictionary
    * is orders of magnitude smaller than the corpus — this is the
    * word-level analog of the reference's trigram-key prefilter.
    */
  private def candidatesByLiterals(index: BuiltIndex,
      lits: Seq[Lit]): DataFrame = {
    def esc(s: String) =
      s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    val reqTerms = lits.zipWithIndex.map { case (l, i) =>
      val sel = (l.leftBound, l.rightBound) match {
        case (true, true)   => col("term") === l.text
        case (true, false)  => col("term").like(esc(l.text) + "%")
        case (false, true)  => col("term").like("%" + esc(l.text))
        case (false, false) => col("term").like("%" + esc(l.text) + "%")
      }
      index.terms.where(sel).select(col("term_id")).withColumn("req", lit(i))
    }.reduce(_ unionAll _)
    index.postings
      .join(reqTerms, Seq("term_id"))
      .groupBy("doc_id")
      .agg(countDistinct(col("req")).as("nreq"))
      .where(col("nreq") === lits.size)
      .select("doc_id")
  }

  /** Index-accelerated regex search. `pagesText` supplies (doc_id, text)
    * for verification (the index itself stores no raw text — lazy content
    * materialization, like the reference's mmap-on-demand store).
    * Ranking: BM25 over the literal terms when every literal is a
    * complete token; otherwise score 0.0 in doc_id order. Tie-break
    * (score DESC, doc_id ASC), k clamped to 1..1000.
    */
  def search(index: BuiltIndex, pagesText: DataFrame, pattern: String,
      k: Int,
      include: Seq[String] = Nil, exclude: Seq[String] = Nil): Dataset[Hit] = {
    val spark = index.spark
    import spark.implicits._
    val kk = math.max(1, math.min(k, 1000))
    // P5 on the regex path (reference search_regex honors the same path
    // filters, engine.rs:1540-1613): restrict candidates by url BEFORE
    // the top-k, exactly like the BM25 paths
    val urlFilter: DataFrame => DataFrame =
      if (include.isEmpty && exclude.isEmpty) identity
      else df => df.join(
        index.docs.where(PathFilter.predicate(col("url"), include, exclude))
          .select("doc_id"),
        Seq("doc_id"), "left_semi")
    val lits = requiredLiterals(pattern)
    // (?i): ASCII case-insensitive like the reference's fold
    // (engine.rs:22-65); (?s): '.' crosses lines. Applied to the ORIGINAL
    // pattern — see scaladoc.
    val rx = "(?is)" + pattern

    val verifiedScored: DataFrame = if (lits.nonEmpty && lits.forall(_.bothBound)) {
      // all literals are complete index terms -> conjunctive BM25 prefilter
      Bm25Query.scoredNaive(index, lits.map(_.text).mkString(" "),
          conjunctive = true) match {
        case None => return spark.emptyDataset[Hit] // literal not in corpus
        case Some(scored) =>
          scored.join(pagesText.select("doc_id", "text"), Seq("doc_id"))
            .where(regexp_like(col("text"), lit(rx)))
            .select(col("doc_id"), col("score"))
      }
    } else if (lits.nonEmpty) {
      candidatesByLiterals(index, lits)
        .join(pagesText.select("doc_id", "text"), Seq("doc_id"))
        .where(regexp_like(col("text"), lit(rx)))
        .select(col("doc_id"), lit(0.0).as("score"))
    } else {
      pagesText.select("doc_id", "text")
        .where(regexp_like(col("text"), lit(rx)))
        .select(col("doc_id"), lit(0.0).as("score"))
    }
    val top = urlFilter(verifiedScored)
      .orderBy(col("score").desc, col("doc_id").asc).limit(kk)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    if (top.isEmpty) return spark.emptyDataset[Hit]
    val urls = index.docs.where(col("doc_id").isin(top.map(_._1): _*))
      .select("doc_id", "url").as[(Long, String)].collect().toMap
    spark.createDataset(top.zipWithIndex.map { case ((d, s), i) =>
      Hit(d, urls.getOrElse(d, ""), s, i + 1)
    }.toSeq)
  }
}
