package graft.corpus

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style page row (BASELINE.json input_hint shape, plus the
  * deterministic docId the generator assigns).
  */
case class Page(
    doc_id: Long,
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic `pages` corpus, modeled on the reference's
  * whitebox validator corpus (/root/reference/src/bin/validator/corpus.rs:
  * 77-133 — seeded corpus with known needle markers, determinism test at
  * corpus.rs:954).
  *
  * Every row is a pure function of (seed, rowIndex): no shared RNG state,
  * so the Dataset is identical at any parallelism level (the N-vs-4N
  * determinism gate, SURVEY.md §7.4).
  *
  * Contents:
  *   - ~2000-word syllable vocabulary with a Zipfian frequency profile
  *     (head terms ~ stopwords, so head-term skew/salting is exercised);
  *   - needle terms `needle%05d` injected with KNOWN tf into KNOWN docs
  *     ([[needleDocs]] reproduces the mapping corpus-free, so BM25 scores
  *     are hand-computable);
  *   - html encodings restricted to the deterministic-decode cases of the
  *     reference transcoder (UTF-8 / UTF-8 BOM / UTF-16LE / UTF-16BE /
  *     BOM-less ISO-8859-1 with printable-range high bytes / BOM-less
  *     windows-1252 with C1 bytes / DECLARED Shift_JIS and KOI8-R via
  *     in-content meta tags — the round-5 declaration-wins branch — and
  *     UNLABELED KOI8-R / Shift_JIS / windows-1251 rows for the round-6
  *     deterministic classifier plus UNLABELED ISO-8859-7 Greek /
  *     windows-1255 Hebrew / TIS-620 Thai rows for its round-7
  *     extension);
  *   - a few safety-gate rows (bracket nesting > 500) that
  *     `content_safety_check` must drop.
  */
object PagesCorpus {

  val Seed = 42L

  // -- splitmix64: the per-row PRNG stream (pure function of its seed) --
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** k-th draw of the stream for (seed,row). */
  @inline private def draw(seed: Long, row: Long, k: Int): Long =
    mix64(mix64(seed ^ (row * 0x632be59bd9b4e019L)) + k)
  @inline private def drawDouble(seed: Long, row: Long, k: Int): Double =
    ((draw(seed, row, k) >>> 11).toDouble) / (1L << 53).toDouble

  // -- vocabulary: 2000 syllable-composed words, all length >= 4 --
  private val Syllables = Vector(
    "ba", "ce", "di", "fo", "gu", "ha", "ke", "li", "mo", "nu",
    "pa", "re", "si", "to", "vu", "wa", "xe", "zi", "lor", "tem")
  val VocabSize = 2000
  val vocab: Vector[String] = (0 until VocabSize).map { i =>
    val s = new StringBuilder
    var x = i
    var parts = 0
    do { s.append(Syllables(x % Syllables.length)); x /= Syllables.length; parts += 1 }
    while (x > 0 || parts < 2)
    s.toString
  }.toVector
  require(vocab.distinct.size == VocabSize && vocab.forall(_.length > 2))

  // -- Zipf(s=1.07) cumulative distribution over vocab ranks --
  private val zipfCum: Array[Double] = {
    val w = Array.tabulate(VocabSize)(i => 1.0 / math.pow(i + 1.0, 1.07))
    val total = w.sum
    val cum = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / total; cum(i) = acc; i += 1 }
    cum(VocabSize - 1) = 1.0
    cum
  }
  @inline private def zipfWord(u: Double): String = {
    var lo = 0; var hi = VocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCum(mid) < u) lo = mid + 1 else hi = mid
    }
    vocab(lo)
  }

  // -- needles: doc row % NeedleEvery == 0 carries needle(row/NeedleEvery % NeedleCount)
  val NeedleEvery = 37
  val NeedleCount = 100
  def needleTerm(i: Int): String = f"needle$i%05d"
  /** tf of the needle in its host doc: known, varies 1..5. */
  @inline def needleTf(row: Long): Int = (1 + (row / NeedleEvery) % 5).toInt
  @inline def hasNeedle(row: Long): Boolean = row % NeedleEvery == 0
  @inline def needleIdOf(row: Long): Int = ((row / NeedleEvery) % NeedleCount).toInt

  /** All (docId, tf) host docs of needle i in an n-row corpus — pure
    * function, no corpus scan needed (the generator manifest).
    */
  def needleDocs(i: Int, n: Long): Seq[(Long, Int)] =
    (0L until n).filter(r => hasNeedle(r) && needleIdOf(r) == i)
      .map(r => (r, needleTf(r)))

  /** Safety-gate rows: text fails content_safety_check (nesting > 500). */
  @inline def isSafetyRow(row: Long): Boolean = row % 101 == 100

  val BaseEpochMs = 1767225600000L // 2026-01-01T00:00:00Z

  /** Token list of row `row` — the ground truth for tokenizer tests. */
  def bodyTokens(seed: Long, row: Long): Vector[String] = {
    // doc length 50..1000 tokens, varied by row
    val nTokens = 50 + math.abs(((draw(seed, row, 0) >>> 16) % 951).toInt)
    val b = Vector.newBuilder[String]
    var k = 1
    while (k <= nTokens) { b += zipfWord(drawDouble(seed, row, k)); k += 1 }
    var out = b.result()
    if (hasNeedle(row)) {
      val nd = needleTerm(needleIdOf(row))
      val tf = needleTf(row)
      // spread tf copies at deterministic interior positions
      var j = 0
      while (j < tf) {
        val pos = 1 + ((j + 1) * out.size) / (tf + 1)
        out = (out.take(pos) :+ nd) ++ out.drop(pos)
        j += 1
      }
    }
    out
  }

  /** Ground-truth extracted text of row `row`. */
  def text(seed: Long, row: Long): String = {
    if (isSafetyRow(row)) return "unsafe " + ("{" * 600) + " generated"
    val toks = bodyTokens(seed, row)
    val sb = new StringBuilder(toks.size * 8)
    var i = 0
    while (i < toks.size) {
      sb.append(toks(i))
      if (i < toks.size - 1) {
        // vary separators to exercise the splitter (still deterministic)
        (i % 13: @annotation.switch) match {
          case 5  => sb.append(", ")
          case 11 => sb.append(".\n")
          case _  => sb.append(' ')
        }
      }
      i += 1
    }
    // rows on the ISO-8859-1 encoding case (html(), row%20==3) carry a
    // Latin-1 tail so the fallback branch decodes real high bytes — all
    // in 0xA0-0xFF, per the deterministic-subset contract (Extract);
    // rows on the windows-1252 case (row%20==7) carry C1-range chars
    // (curly quotes, em-dash, euro) so the cp1252 branch decodes real
    // 0x80-0x9F bytes
    if (row % 20 == 3) sb.append(Latin1Tail)
    if (row % 20 == 7) sb.append(Cp1252Tail)
    // declared-charset cases (round 5, Extract v4): the meta declaration
    // is part of the page content, so it is part of the ground-truth
    // extracted text too (the transcoder decodes the whole buffer)
    if (row % 20 == 4) { sb.insert(0, SjisMeta); sb.append(SjisTail) }
    if (row % 20 == 5) { sb.insert(0, Koi8Meta); sb.append(Koi8Tail) }
    // UNLABELED non-Latin cases (round 6, Extract v5): no declaration —
    // only the deterministic classifier reaches the right decode
    if (row % 20 == 8) sb.append(Koi8Tail)
    if (row % 20 == 9) sb.append(SjisTail)
    if (row % 20 == 10) sb.append(Win1251Tail)
    // UNLABELED single-byte script cases (round 7, Extract v6)
    if (row % 20 == 11) sb.append(GreekTail)
    if (row % 20 == 12) sb.append(HebrewTail)
    if (row % 20 == 13) sb.append(ThaiTail)
    sb.toString
  }

  /** Non-ASCII (0xA0-0xFF only) tail for the Latin-1 encoding case. */
  val Latin1Tail = " caféresumé münchen nöise"

  /** Tail with C1-encoded chars for the windows-1252 case: curly quotes
    * (0x93/0x94), em-dash (0x97), euro (0x80) — all in 0x80-0x9F, plus a
    * printable-range ï (0xEF).
    */
  val Cp1252Tail = " \u201cquoted\u201d na\u00efve\u2014dash \u20ac9"

  /** Declared Shift_JIS case (row%20==4): multi-byte Japanese tail \u2014
    * invalid UTF-8 and outside every byte heuristic; only the
    * declaration branch (Extract v4) reaches it.
    */
  val SjisMeta = "<meta charset=shift_jis> "
  val SjisTail = " \u30c6\u30b9\u30c8 \u691c\u7d22\u6f22\u5b57"

  /** Declared KOI8-R case (row%20==5): the DISAGREE row \u2014 KOI8-R
    * Cyrillic bytes live entirely in 0xA0-0xFF, so the ISO-8859-1 byte
    * heuristic would happily decode them as Latin-1 mojibake; the
    * declaration must WIN (browser behavior), yielding real Cyrillic.
    * Round 6: a COMMENTED-OUT Shift_JIS meta precedes the live one \u2014
    * the v5 prescan must skip the comment span or the page mojibakes
    * (the in-corpus proof for the comment-skip rule).
    */
  val Koi8Meta =
    "<!--<meta charset=shift_jis>-->" +
      "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=koi8-r\"> "
  val Koi8Tail = " \u043f\u0440\u0438\u0432\u0435\u0442 \u043f\u043e\u0438\u0441\u043a"

  /** Unlabeled windows-1251 case (row%20==10): lowercase Cyrillic \u2014 in
    * 1251 these bytes land in 0xE0-0xFF (the Latin-1 lowercase band), so
    * ONLY the case-band frequency rule separates them from a Latin page;
    * distinct words from the KOI8 tail so each classification is proven
    * independently.
    */
  val Win1251Tail = " \u043d\u043e\u0432\u043e\u0441\u0442\u0438 \u043f\u043e\u0433\u043e\u0434\u0430"

  /** Unlabeled Greek case (row%20==11): ISO-8859-7 lowercase lives in
    * the SAME byte band as windows-1251 lowercase \u2014 only the v6 rule
    * order (Greek's strict-decode holes + tonos marker before the
    * Cyrillic verdict) reaches the right decode. \u03b1\u03bd\u03b1\u03b6\u03ae\u03c4\u03b7\u03c3\u03b7 carries \u03ae,
    * \u03b5\u03bb\u03bb\u03b7\u03bd\u03b9\u03ba\u03ac carries \u03ac (the tonos markers).
    */
  val GreekTail = " \u03b1\u03bd\u03b1\u03b6\u03ae\u03c4\u03b7\u03c3\u03b7 \u03b5\u03bb\u03bb\u03b7\u03bd\u03b9\u03ba\u03ac"

  /** Unlabeled Hebrew case (row%20==12): windows-1255 letters occupy
    * 0xE0-0xFA \u2014 inside the cp1251 lowercase band; the final-form
    * placement law is the discriminator (\u05d7\u05d9\u05e4\u05d5\u05e9 \u05e2\u05d1\u05e8\u05d9\u05ea has no mid-word
    * final forms by construction of the script).
    */
  val HebrewTail = " \u05d7\u05d9\u05e4\u05d5\u05e9 \u05e2\u05d1\u05e8\u05d9\u05ea"

  /** Unlabeled Thai case (row%20==13): TIS-620; both words are
    * mark-free (the tokenizer splits on combining marks) and \u0e40\u0e2d\u0e01\u0e2a\u0e32\u0e23 /
    * \u0e44\u0e17\u0e22 carry the leading-vowel bigram the v6 rule requires.
    */
  val ThaiTail = " \u0e40\u0e2d\u0e01\u0e2a\u0e32\u0e23 \u0e20\u0e32\u0e29\u0e32\u0e44\u0e17\u0e22"

  /** Ground-truth EXTRACTED text (what the transcoder must reproduce
    * byte-identically per url). A BOM'd UTF-8 buffer is itself valid
    * UTF-8, so the reference's fast path (utils.rs:22-25) keeps the U+FEFF
    * char — we mirror that here for encoding case 2.
    */
  def expectedText(seed: Long, row: Long): String =
    if (row % 20 == 2) "﻿" + text(seed, row) else text(seed, row)

  /** html bytes: encoding chosen per row among the deterministic-decode
    * cases of the reference transcoder (SURVEY.md §7.4).
    */
  def html(seed: Long, row: Long): Array[Byte] = {
    val t = text(seed, row)
    (row % 20) match {
      case 0 => // UTF-16LE BOM
        val body = t.getBytes(StandardCharsets.UTF_16LE)
        Array[Byte](0xFF.toByte, 0xFE.toByte) ++ body
      case 1 => // UTF-16BE BOM
        val body = t.getBytes(StandardCharsets.UTF_16BE)
        Array[Byte](0xFE.toByte, 0xFF.toByte) ++ body
      case 2 => // UTF-8 BOM
        Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
          t.getBytes(StandardCharsets.UTF_8)
      case 3 => // BOM-less ISO-8859-1 (deterministic chardetng subset)
        t.getBytes(StandardCharsets.ISO_8859_1)
      case 4 => // DECLARED Shift_JIS (<meta charset=..> in the content)
        t.getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
      case 5 => // DECLARED KOI8-R via http-equiv; bytes ALSO satisfy the
        // ISO-8859-1 heuristic — declaration wins (disagree case)
        t.getBytes(java.nio.charset.Charset.forName("KOI8-R"))
      case 7 => // BOM-less windows-1252 (C1 bytes -> cp1252 branch)
        t.getBytes(java.nio.charset.Charset.forName("windows-1252"))
      case 8 => // UNLABELED KOI8-R (v5 classifier: lowercase band 0xC0-0xDF)
        t.getBytes(java.nio.charset.Charset.forName("KOI8-R"))
      case 9 => // UNLABELED Shift_JIS (v5 classifier: lead/trail structure)
        t.getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
      case 10 => // UNLABELED windows-1251 (v5 classifier: band 0xE0-0xFF)
        t.getBytes(java.nio.charset.Charset.forName("windows-1251"))
      case 11 => // UNLABELED Greek (v6: 8859-7 decode holes + tonos marker)
        t.getBytes(java.nio.charset.Charset.forName("ISO-8859-7"))
      case 12 => // UNLABELED Hebrew (v6: letter band + final-form law)
        t.getBytes(java.nio.charset.Charset.forName("windows-1255"))
      case 13 => // UNLABELED Thai (v6: TIS decode holes + leading vowels)
        t.getBytes(java.nio.charset.Charset.forName("TIS-620"))
      case _ => t.getBytes(StandardCharsets.UTF_8)
    }
  }

  def url(row: Long): String =
    f"https://site-${row % 997}%04d.example/page-$row%08d"

  def lang(row: Long): String = (row % 17) match {
    case 15 => "de"
    case 16 => "fr"
    case _  => "en"
  }

  /** One row, pure function of (seed, row). */
  def page(seed: Long, row: Long): Page = Page(
    doc_id = row,
    url = url(row),
    warc_ts = new Timestamp(BaseEpochMs + row * 1000L),
    html = html(seed, row),
    text = expectedText(seed, row),
    lang = lang(row))

  /** Distributed generator: n rows over `parts` partitions. Identical
    * content at any `parts` because rows are index-pure.
    */
  def pages(spark: SparkSession, n: Long, seed: Long = Seed,
      parts: Int = 16): Dataset[Page] = {
    import spark.implicits._
    spark.range(0L, n, 1L, parts).map(row => page(seed, row))
  }
}
