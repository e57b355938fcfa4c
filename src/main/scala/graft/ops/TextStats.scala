package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting. All pure Column
  * expressions (whole-stage codegen) except langId's wordlists (broadcast
  * literals inside the expression).
  */
object TextStats {

  /** Token count (post-filter, reference tokenizer semantics). */
  def tokenCount(text: Column): Column =
    size(Tokenizer.tokensCol(text)).cast("long")

  /** Sum of token character lengths (for mean token length). */
  def tokenChars(text: Column): Column =
    aggregate(Tokenizer.tokensCol(text), lit(0L), (a, t) => a + length(t))

  /** BPE-style pre-tokenizer unit count — the GPT-2-family pre-tokenize
    * shape (letter runs | digit runs | punctuation runs; whitespace
    * separates): an LLM-token-budget estimator that, unlike the search
    * tokenizer's [[tokenCount]], counts numbers, punctuation and short
    * tokens. One `regexp_count`, whole-stage codegen; the regex is RE2-
    * compatible so the DuckDB oracle replays it verbatim. (Real BPE then
    * splits each unit into subwords — a merges table this container
    * doesn't ship; the unit count is the standard cheap upper-structure
    * estimate.)
    */
  val BpeTokenRegex = "[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]+"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenRegex)).cast("long")

  /** Stopword ratio: occurrences of `the` (the only >2-char stopword in
    * the synthetic corpus) over token count; 0 when no tokens.
    */
  def stopRatio(text: Column): Column = {
    val toks = Tokenizer.tokensCol(text)
    val n = size(toks)
    when(n === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t === lit("the"))).cast("double") / n.cast("double"))
  }

  /** Heuristic quality score in (0,1): logistic over doc length minus a
    * stopword-density penalty. Deliberately SQL-expressible so the DuckDB
    * oracle replays it exactly: 1/(1+exp(-(ln(1+n_tokens)/2 - 2*stop_ratio))).
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    lit(1.0) / (lit(1.0) + exp(-(log(lit(1.0) + n) / lit(2.0) - lit(2.0) * stopRatio(text))))
  }

  /** Document fingerprint: md5 of the canonical token stream — equal iff
    * token sequences are equal (exact-dup detection key that's robust to
    * separator/punctuation noise).
    */
  def fingerprint(text: Column): Column =
    md5(array_join(Tokenizer.tokensCol(text), " "))

  /** n-gram-free language-ID heuristic: per-language stopword hit counts,
    * argmax with a deterministic preference order, "und" when nothing hits.
    * (A production system would use fastText/cld3; the Spark shape — one
    * pass, broadcast wordlists, no UDF — is the point.)
    */
  private val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "for", "with", "that", "this", "are", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("les", "des", "est", "une", "dans", "pour", "que", "sur"),
    "es" -> Seq("los", "las", "por", "para", "con", "una", "del", "est"))

  def langId(text: Column): Column = {
    val toks = Tokenizer.tokensCol(text)
    // argmax via array_max over (hits, prio, lang) structs — single
    // evaluation per language, ties resolved by preference order (earlier
    // language in langWords wins via higher prio).
    val cand = array(langWords.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        size(filter(toks, t => t.isInCollection(words))).as("hits"),
        lit(langWords.size - i).as("prio"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(cand)
    when(best.getField("hits") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Rolling polynomial fingerprint over the token stream (analog of the
    * reference's config fingerprint, config.rs:266-296, and a cheap
    * order-sensitive doc signature): h = h*31 + xxhash64(token), with
    * wrapping multiplication — a UDF because Spark 4's default ANSI mode
    * makes Column arithmetic throw on long overflow.
    */
  private val rollingUdf = udf { text: String =>
    Tokenizer.tokenize(if (text == null) "" else text)
      .foldLeft(0L)((acc, t) => acc * 31L + graft.index.Bm25.termId(t))
  }
  def rollingHash(text: Column): Column = rollingUdf(text)

  /** Convenience projection of all stats for a (idCol, textCol) frame. */
  def statsFor(df: DataFrame, id: String, text: String): DataFrame =
    df.select(
      col(id),
      length(col(text)).cast("long").as("n_chars"),
      tokenCount(col(text)).as("n_tokens"),
      tokenChars(col(text)).as("token_chars"),
      qualityScore(col(text)).as("quality"),
      langId(col(text)).as("lang_guess"),
      fingerprint(col(text)).as("fp"))
}
