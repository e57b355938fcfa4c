package graft.tokenize

import java.nio.charset.StandardCharsets
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word tokenizer with the exact semantics of the reference engine's
  * `tokenize_simple` (/root/reference/src/semantic/embeddings.rs:342-348):
  *
  *   1. Unicode-lowercase the text,
  *   2. split on every non-alphanumeric character (Unicode letter/number),
  *   3. drop tokens whose UTF-8 **byte** length is <= 2 (Rust `str::len()`
  *      is bytes, so a 2-char CJK token survives — we preserve that).
  *
  * Two twin implementations are provided and property-tested against each
  * other (TokenizerSpec):
  *   - [[tokenize]]: pure Scala, used by the single-node oracle and by
  *     driver-side query parsing;
  *   - [[tokensCol]]: pure Catalyst built-ins (`split`/`lower`/`filter`),
  *     fully codegen'd, used in the distributed pipeline so tokenization
  *     never leaves whole-stage codegen.
  */
object Tokenizer {

  /** Bumped whenever token semantics change — part of the checkpoint
    * config fingerprint (a resumed build must not mix token streams from
    * two tokenizer versions; reference: config.rs:266-296).
    */
  val Version = 1

  /** Rust `char::is_alphanumeric` = Alphabetic | Nd | Nl | No. The closest
    * JVM predicate (and the one Java regex `[\p{L}\p{N}]` uses) is
    * letter-categories | Nd | Nl | No. Differences are confined to exotic
    * `Other_Alphabetic` marks that never appear in web text.
    */
  /** Public twin of the tokenizer's character class, for analyses that
    * must classify characters EXACTLY like the indexer (e.g. regex literal
    * extraction — an ASCII-only predicate there would call 'é' a token
    * separator and build unsound prefilters on non-ASCII corpora).
    */
  def isAlnumCodePoint(cp: Int): Boolean = isAlnum(cp)

  @inline private def isAlnum(cp: Int): Boolean = {
    val t = Character.getType(cp)
    Character.isLetter(cp) ||
    t == Character.DECIMAL_DIGIT_NUMBER ||
    t == Character.LETTER_NUMBER ||
    t == Character.OTHER_NUMBER
  }

  /** Pure-Scala twin. Deterministic, allocation-lean. */
  def tokenize(text: String): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val lower = text.toLowerCase(Locale.ROOT)
    val out = Vector.newBuilder[String]
    val n = lower.length
    var i = 0
    var start = -1
    while (i < n) {
      val cp = lower.codePointAt(i)
      val w = Character.charCount(cp)
      if (isAlnum(cp)) {
        if (start < 0) start = i
      } else if (start >= 0) {
        emit(lower, start, i, out); start = -1
      }
      i += w
    }
    if (start >= 0) emit(lower, start, n, out)
    out.result()
  }

  @inline private def emit(s: String, a: Int, b: Int,
      out: scala.collection.mutable.Builder[String, Vector[String]]): Unit = {
    val tok = s.substring(a, b)
    // Reference keeps tokens with byte-length > 2 (Rust str::len == bytes).
    if (utf8Len(tok) > 2) out += tok
  }

  @inline private def utf8Len(s: String): Int = {
    // Cheap UTF-8 byte count without materializing the array for ASCII.
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      n += (if (cp < 0x80) 1 else if (cp < 0x800) 2
            else if (cp < 0x10000) 3 else 4)
      i += Character.charCount(cp)
    }
    n
  }

  /** Java-regex equivalent of "split on non-alphanumeric". */
  val SplitRegex = "[^\\p{L}\\p{N}]+"

  /** Catalyst-builtin twin: array of tokens for a text column. Stays inside
    * whole-stage codegen (no UDF). `octet_length` mirrors the byte-length
    * filter.
    */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), SplitRegex), t => octet_length(t) > lit(2))

  /** ASCII-only variant used where the DuckDB oracle must reproduce the
    * regex exactly (`[^a-z0-9]+` means the same in RE2 and Java). On ASCII
    * corpora it is identical to [[tokensCol]].
    */
  def tokensColAscii(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > lit(2))
}
