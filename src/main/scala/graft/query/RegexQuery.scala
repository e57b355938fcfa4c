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
  * substring-sound, our index is WORD-level. A literal is only a sound
  * word-level pre-filter if it is a COMPLETE token in every match, so
  * [[requiredTokens]] keeps only literal tokens bounded on both sides by
  * guaranteed non-alphanumeric context (interior tokens of multi-token
  * literals, or tokens bounded by non-alnum literal chars / \s / \b /
  * pattern anchors). Matching is case-insensitive (pattern and text are
  * lowercased), like the reference's search semantics (engine.rs:437,754).
  */
object RegexQuery {

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** Driver-side pattern analysis: required complete tokens (lowercased,
    * len > 2), conservative — returns Nil whenever soundness is in doubt
    * (top-level alternation, classes, groups, unknown escapes around a
    * token).
    */
  def requiredTokens(pattern: String): Seq[String] = {
    // boundary kinds: S = guaranteed non-alnum separator, U = unknown
    sealed trait B
    case object Sep extends B
    case object Unknown extends B

    if (pattern.exists(c => c == '|' || c == '[' || c == '(')) {
      // conservative: alternation/classes/groups anywhere -> no prefilter
      // (a full HIR analysis would do better; this mirrors the fallback
      // shape of regex_search.rs for complex patterns)
      return Nil
    }
    val out = Seq.newBuilder[String]
    val n = pattern.length
    var i = 0
    var leftB: B = Sep // pattern start = anchor-like boundary
    val cur = new StringBuilder
    def flush(rightB: B): Unit = {
      // tokens inside the run: interior ones have literal non-alnum
      // separators on both sides; first/last inherit leftB/rightB
      val toks = cur.toString.split("[^a-zA-Z0-9]+").filter(_.nonEmpty)
      if (toks.nonEmpty) {
        val hasInteriorSeps = toks.length
        toks.zipWithIndex.foreach { case (t, j) =>
          val okLeft = j > 0 || leftB == Sep
          val okRight = j < hasInteriorSeps - 1 || rightB == Sep
          if (okLeft && okRight && t.getBytes("UTF-8").length > 2)
            out += t.toLowerCase(java.util.Locale.ROOT)
        }
      }
      cur.clear()
    }
    while (i < n) {
      val c = pattern(i)
      if (c == '\\' && i + 1 < n) {
        val e = pattern(i + 1)
        if (e == 's' || e == 'b' || e == 'W' || e == 'B') {
          // guaranteed non-alnum (or boundary) context
          flush(Sep); leftB = Sep
        } else if (!isAlnum(e) && e != 'w' && e != 'd') {
          // escaped punctuation: a literal non-alnum char
          flush(Sep); leftB = Sep
        } else {
          // \w \d or escaped alnum: could extend a word -> unknown
          flush(Unknown); leftB = Unknown
        }
        i += 2
      } else if (c == '?' || c == '*' || c == '{') {
        // zero-allowed quantifier: the previous unit may be absent. If it
        // was an alnum char, drop it (prefix stays, right boundary
        // unknown); if it was a separator, the separator is optional ->
        // boundary unknown either way.
        if (cur.nonEmpty) { cur.deleteCharAt(cur.length - 1); flush(Unknown) }
        leftB = Unknown
        // skip {m,n} body
        if (c == '{') { while (i < n && pattern(i) != '}') i += 1 }
        i += 1
      } else if (c == '+') {
        if (cur.nonEmpty) {
          // one-or-more on an alnum char: char required, but the word may
          // extend (spark+ matches sparkk) -> right boundary unknown
          flush(Unknown); leftB = Unknown
        }
        // '+' on a separator (e.g. \s+): still a guaranteed separator —
        // leftB keeps whatever the separator established
        i += 1
      } else if (c == '.') {
        flush(Unknown); leftB = Unknown
        i += 1
      } else if (c == '^' || c == '$') {
        flush(Sep); leftB = Sep
        i += 1
      } else if (isAlnum(c) || c == '_') {
        cur.append(c)
        i += 1
      } else {
        // literal non-alnum char: a guaranteed separator
        flush(Sep); leftB = Sep
        i += 1
      }
    }
    flush(Sep)
    out.result().distinct
  }

  /** Index-accelerated regex search. `pagesText` supplies (doc_id, text)
    * for verification (the index itself stores no raw text — lazy content
    * materialization, like the reference's mmap-on-demand store).
    * Results ranked by BM25 over the derived literal terms (score 0.0,
    * doc_id order when no literal exists), tie-break (score DESC, doc_id
    * ASC), k clamped to 1..1000.
    */
  def search(index: BuiltIndex, pagesText: DataFrame, pattern: String,
      k: Int): Dataset[Hit] = {
    val spark = index.spark
    import spark.implicits._
    val kk = math.max(1, math.min(k, 1000))
    val toks = requiredTokens(pattern)
    val rx = "(?s)" + pattern.toLowerCase(java.util.Locale.ROOT)

    val verifiedScored: DataFrame = if (toks.nonEmpty) {
      Bm25Query.scoredNaive(index, toks.mkString(" "), conjunctive = true) match {
        case None => return spark.emptyDataset[Hit] // literal not in corpus
        case Some(scored) =>
          scored.join(pagesText.select("doc_id", "text"), Seq("doc_id"))
            .where(regexp_like(lower(col("text")), lit(rx)))
            .select(col("doc_id"), col("score"))
      }
    } else {
      pagesText.select("doc_id", "text")
        .where(regexp_like(lower(col("text")), lit(rx)))
        .select(col("doc_id"), lit(0.0).as("score"))
    }
    val top = verifiedScored
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
