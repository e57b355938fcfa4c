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

  /** Per-doc token histogram, allocation-lean: the tf stage is the
    * dominant build cost and is memory-bandwidth-bound on this class of
    * hardware, so bytes touched per doc is the scaling lever. Compared to
    * `tokenize(text)` + a boxed HashMap count, this avoids (for the ASCII
    * fast path, i.e. essentially all web text after extraction):
    *
    *   - the full lowered copy of the text (`toLowerCase` duplicates every
    *     doc through the heap),
    *   - a String allocation per token OCCURRENCE (tokens materialize only
    *     on first sight, via a reusable char buffer),
    *   - Integer boxing per count increment (open-addressed int counts).
    *
    * Semantics are EXACTLY `tokenize(text)` grouped and counted: for pure
    * ASCII, lower-then-split ≡ split-then-lower (1:1 class-preserving case
    * map), and any non-ASCII char falls back to the reference-exact path
    * (order matters there: e.g. U+0130 lowers to "i" + a combining mark
    * that is a token separator). Histogram order is unspecified. The
    * returned counter also carries `total` (= the doc length in kept
    * tokens), so callers get doc_len in the same pass.
    */
  def termFrequencies(text: String): TokenCounter = {
    val tc = new TokenCounter
    if (text == null || text.isEmpty) return tc
    val n = text.length
    var ascii = true
    var i = 0
    while (ascii && i < n) { if (text.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) {
      var buf = new Array[Char](64)
      var len = 0
      var h = 0
      i = 0
      while (i <= n) {
        val c = if (i < n) text.charAt(i) else ' '
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
          if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
          buf(len) = lc; len += 1
          h = 31 * h + lc
        } else if (len > 0) {
          // ASCII: byte length == char length
          if (len > 2) tc.add(buf, len, h)
          len = 0; h = 0
        }
        i += 1
      }
    } else {
      tokenize(text).foreach(tc.add)
    }
    tc
  }

  /** Driver/executor-side twin of Catalyst's `xxhash64(term)` (seed 42 over
    * the UTF-8 bytes) — the build computes term ids INSIDE the tokenize
    * stage (so tf rows never carry the term string) and the dictionary
    * derives the same id declaratively; the two MUST agree bit-for-bit or
    * postings would join against a different id space. Parity is asserted
    * in TokenizerSpec against the SQL function itself.
    */
  def termId(term: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType, 42L)

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

/** Open-addressed long set for per-partition "term id already emitted"
  * tracking in the tf stage (8 bytes/slot, no boxing). Past [[SeenTermIds.MaxSize]]
  * entries it stops deduplicating (add() keeps answering true) — soundness
  * is unaffected (the dictionary takes min/max over the non-null strings;
  * extra strings only cost bytes), so a freak per-partition vocabulary
  * cannot grow the set without bound.
  */
final class SeenTermIds {
  private var cap = 1 << 10 // power of 2
  private var mask = cap - 1
  private var slots = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var size = 0

  /** True if `id` was NOT seen before (caller should emit the string). */
  def add(id: Long): Boolean = {
    if (size >= SeenTermIds.MaxSize) return true
    var i = java.lang.Long.hashCode(id * -7046029254386353131L) & mask
    while (used(i)) {
      if (slots(i) == id) return false
      i = (i + 1) & mask
    }
    slots(i) = id; used(i) = true
    size += 1
    if (size * 2 > cap) grow()
    true
  }

  private def grow(): Unit = {
    val os = slots; val ou = used
    cap *= 2; mask = cap - 1
    slots = new Array[Long](cap); used = new Array[Boolean](cap)
    var i = 0
    while (i < os.length) {
      if (ou(i)) {
        val v = os(i)
        var j = java.lang.Long.hashCode(v * -7046029254386353131L) & mask
        while (used(j)) j = (j + 1) & mask
        slots(j) = v; used(j) = true
      }
      i += 1
    }
  }
}

object SeenTermIds {
  /** ~16M ids = ~160 MB/partition worst case; beyond it dedup degrades
    * gracefully to always-emit (correct, just more string bytes).
    */
  val MaxSize: Int = 1 << 24
}

/** Open-addressed (String -> int) counter for per-doc histograms. Keys
  * hash with the String.hashCode polynomial so a probe over a char-buffer
  * region needs no String, and rehash-on-grow reuses the cached hashCode
  * of stored keys. Linear probing, load factor 0.5.
  */
final class TokenCounter private[tokenize] () {
  private var cap = 256 // power of 2
  private var mask = cap - 1
  private var keys = new Array[String](cap)
  private var counts = new Array[Int](cap)
  private var size = 0

  /** Total occurrences counted (= doc_len when fed one doc's tokens). */
  var total: Long = 0L

  /** Count an occurrence of buf[0..len); h must be the String.hashCode
    * polynomial over exactly those chars. Allocates only on first sight.
    */
  private[tokenize] def add(buf: Array[Char], len: Int, h: Int): Unit = {
    total += 1
    var i = h & mask
    while (true) {
      val k = keys(i)
      if (k == null) {
        keys(i) = new String(buf, 0, len); counts(i) = 1
        size += 1
        if (size * 2 > cap) grow()
        return
      }
      if (k.length == len && regionEq(k, buf, len)) {
        counts(i) += 1; return
      }
      i = (i + 1) & mask
    }
  }

  /** Count an occurrence of an already-materialized token. */
  private[tokenize] def add(tok: String): Unit = {
    total += 1
    var i = tok.hashCode & mask
    while (true) {
      val k = keys(i)
      if (k == null) {
        keys(i) = tok; counts(i) = 1
        size += 1
        if (size * 2 > cap) grow()
        return
      }
      if (k == tok) { counts(i) += 1; return }
      i = (i + 1) & mask
    }
  }

  @inline private def regionEq(k: String, buf: Array[Char], len: Int): Boolean = {
    var j = 0
    while (j < len) { if (k.charAt(j) != buf(j)) return false; j += 1 }
    true
  }

  private def grow(): Unit = {
    val ok = keys; val oc = counts
    cap *= 2; mask = cap - 1
    keys = new Array[String](cap); counts = new Array[Int](cap)
    var i = 0
    while (i < ok.length) {
      val k = ok(i)
      if (k != null) {
        var j = k.hashCode & mask
        while (keys(j) != null) j = (j + 1) & mask
        keys(j) = k; counts(j) = oc(i)
      }
      i += 1
    }
  }

  def iterator: Iterator[(String, Int)] = new Iterator[(String, Int)] {
    private var i = 0
    private def seek(): Unit = { while (i < cap && keys(i) == null) i += 1 }
    seek()
    def hasNext: Boolean = i < cap
    def next(): (String, Int) = {
      val r = (keys(i), counts(i)); i += 1; seek(); r
    }
  }
}
