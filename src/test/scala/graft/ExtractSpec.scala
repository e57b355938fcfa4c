package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Extract

/** Mirrors the reference transcoder + safety-gate tests
  * (/root/reference/src/utils.rs:356-529): per-encoding decode, binary
  * rejection, safety thresholds.
  */
class ExtractSpec extends AnyFunSuite {

  private val sample = "Héllo wörld — 日本語 test 123\nsecond line"

  test("utf-8 fast path") {
    val b = sample.getBytes(StandardCharsets.UTF_8)
    assert(Extract.transcodeToUtf8(b).contains(sample))
  }

  test("utf-8 BOM stripped") {
    // NB: a BOM'd UTF-8 buffer is itself valid UTF-8, so like the
    // reference fast path it decodes WITH the BOM char (utils.rs:22-25
    // returns Ok(None) before the BOM branch). The BOM branch only fires
    // for BOM + otherwise-invalid-UTF-8; emulate with a BOM'd UTF-16
    // masquerade that fails, then a real case: BOM + valid utf8 => fast
    // path keeps ﻿ prefix.
    val b = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      sample.getBytes(StandardCharsets.UTF_8)
    assert(Extract.transcodeToUtf8(b).contains("﻿" + sample))
  }

  test("utf-16le BOM") {
    val b = Array[Byte](0xFF.toByte, 0xFE.toByte) ++
      sample.getBytes(StandardCharsets.UTF_16LE)
    assert(Extract.transcodeToUtf8(b).contains(sample))
  }

  test("utf-16be BOM") {
    val b = Array[Byte](0xFE.toByte, 0xFF.toByte) ++
      sample.getBytes(StandardCharsets.UTF_16BE)
    assert(Extract.transcodeToUtf8(b).contains(sample))
  }

  test("binary content rejected") {
    // invalid UTF-8 (bare continuation bytes), no BOM -> reject branch
    val b = Array.tabulate[Byte](1024)(i => (0x80 + i % 0x40).toByte)
    assert(Extract.transcodeToUtf8(b).isEmpty)
    // NUL-laden bytes ARE valid UTF-8 — like the reference fast path they
    // decode fine (utils.rs:22-25); the safety gate drops them later.
    val nuls = Array.tabulate[Byte](64)(i => (i % 7).toByte)
    assert(Extract.isBinaryBytes(nuls))
    assert(Extract.transcodeToUtf8(nuls).exists(s => Extract.contentSafetyCheck(s).contains("binary")))
  }

  test("deterministic ISO-8859-1 fallback: printable high bytes decode") {
    // invalid as UTF-8 (0xE9 not followed by continuation), all high
    // bytes in 0xA0-0xFF -> the unambiguous Latin-1 subset
    val latin = "café résumé münchen"
    val b = latin.getBytes(StandardCharsets.ISO_8859_1)
    assert(Extract.transcodeToUtf8(b).contains(latin))
  }

  test("C1-range high bytes decode as windows-1252 (fixed table)") {
    // 0x93 is a C1 control in ISO-8859-1 but a curly quote in
    // windows-1252 — real pages never carry C1 controls, so C1 presence
    // selects the cp1252 table deterministically (round 4)
    val b = Array[Byte](0xC3.toByte, 0x28.toByte, 0x93.toByte, 0xA1.toByte)
    assert(Extract.transcodeToUtf8(b).contains("Ã(“¡"))
    val smart = "he said “hello” — for €9"
    val sb = smart.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    assert(Extract.transcodeToUtf8(sb).contains(smart))
    // the 5 UNDEFINED cp1252 bytes stay ambiguous -> reject
    for (u <- Seq(0x81, 0x8D, 0x8F, 0x90, 0x9D)) {
      val bad = Array[Byte]('h'.toByte, u.toByte, 'i'.toByte, 0x93.toByte)
      assert(Extract.transcodeToUtf8(bad).isEmpty, f"byte 0x$u%02X")
    }
    // binary-looking content never reaches the fallback
    val bin = ("x" * 10).getBytes(StandardCharsets.US_ASCII) ++
      Array.fill[Byte](200)(0xE9.toByte) ++ Array.fill[Byte](300)(1.toByte)
    assert(Extract.transcodeToUtf8(bin).isEmpty)
  }

  test("declared charset: <meta charset=..> decodes Shift_JIS/EUC/KOI8") {
    // multi-byte Japanese: invalid UTF-8, outside every byte heuristic —
    // only the declaration (v4) reaches it
    val sjis = "<meta charset=shift_jis> テスト 漢字検索 desu"
    assert(Extract.transcodeToUtf8(
      sjis.getBytes(java.nio.charset.Charset.forName("Shift_JIS")))
      .contains(sjis))
    // http-equiv Content-Type form + uppercase + quoted name
    val euc = "<META HTTP-EQUIV=\"Content-Type\" CONTENT=\"text/html; charset=EUC-JP\"> 日本語ページ"
    assert(Extract.transcodeToUtf8(
      euc.getBytes(java.nio.charset.Charset.forName("EUC-JP")))
      .contains(euc))
  }

  test("declared charset WINS over the byte heuristics (disagree case)") {
    // KOI8-R Cyrillic bytes are all 0xA0-0xFF: without the declaration
    // the ISO-8859-1 rule would return Latin-1 mojibake; with it the
    // page decodes to real Cyrillic (browser behavior)
    val ru = "<meta charset=koi8-r> привет мир"
    val bytes = ru.getBytes(java.nio.charset.Charset.forName("KOI8-R"))
    assert(bytes.forall(b => (b & 0xff) < 0x80 || (b & 0xff) >= 0xA0),
      "fixture must satisfy the ISO heuristic's byte range")
    assert(Extract.transcodeToUtf8(bytes).contains(ru))
    // v5: a long-enough unlabeled Cyrillic tail is now caught by the
    // classifier instead — so the declaration-decided proof uses a tail
    // BELOW the classifier thresholds (one run, < MinCyrillicBytes):
    // without a declaration it takes the ISO heuristic (mojibake)
    val short = " мир".getBytes(java.nio.charset.Charset.forName("KOI8-R"))
    val fallback = Extract.transcodeToUtf8(short)
    assert(fallback.nonEmpty && !fallback.get.contains("мир"))
    val declaredShort = "<meta charset=koi8-r> мир"
    assert(Extract.transcodeToUtf8(declaredShort
      .getBytes(java.nio.charset.Charset.forName("KOI8-R")))
      .contains(declaredShort))
  }

  test("v5 classifier: unlabeled KOI8-R / windows-1251 / Shift_JIS decode") {
    // KOI8-R lowercase: band 0xC0-0xDF dominant
    val koi = "some ascii body... привет поиск"
    assert(Extract.transcodeToUtf8(
      koi.getBytes(java.nio.charset.Charset.forName("KOI8-R")))
      .contains(koi))
    // windows-1251 lowercase: band 0xE0-0xFF dominant — the band that
    // overlaps Latin-1 lowercase accents; only the run rule separates it
    val win = "some ascii body... новости погода"
    assert(Extract.transcodeToUtf8(
      win.getBytes(java.nio.charset.Charset.forName("windows-1251")))
      .contains(win))
    // Shift_JIS without any declaration: structural + kana + CJK checks
    val sj = "some ascii body... テスト 検索漢字"
    assert(Extract.transcodeToUtf8(
      sj.getBytes(java.nio.charset.Charset.forName("Shift_JIS")))
      .contains(sj))
  }

  test("v5 classifier: Latin pages never qualify (isolated accents)") {
    // enough high bytes to pass the count floor, but all isolated — the
    // run rule must keep these on the Latin-1 / cp1252 branches
    val lat = "café résumé naïve mañana señor über größe"
    assert(Extract.transcodeToUtf8(
      lat.getBytes(StandardCharsets.ISO_8859_1)).contains(lat))
    val cp = "“quoted” naïve—dash €9 café résumé"
    assert(Extract.transcodeToUtf8(
      cp.getBytes(java.nio.charset.Charset.forName("windows-1252")))
      .contains(cp))
  }

  test("v5 prescan: comments skipped, attr parsing, continue past unsupported") {
    // commented-out meta must NOT win over the live one after it
    val ru = "<!--<meta charset=shift_jis>--><meta charset=koi8-r> мир"
    assert(Extract.transcodeToUtf8(
      ru.getBytes(java.nio.charset.Charset.forName("KOI8-R"))).contains(ru))
    // unterminated comment blanks the rest of the window: the meta
    // inside it is invisible, short tail -> mojibake (not KOI8)
    val unterm = "<!-- <meta charset=koi8-r> мир"
    val u = Extract.transcodeToUtf8(
      unterm.getBytes(java.nio.charset.Charset.forName("KOI8-R")))
    assert(u.nonEmpty && !u.get.contains("мир"))
    // charset= inside a NON-declaration attribute value must not count
    val desc = "<meta name=\"description\" content=\"how charset=shift_jis works\"> мир"
    val d = Extract.transcodeToUtf8(
      desc.getBytes(java.nio.charset.Charset.forName("KOI8-R")))
    assert(d.nonEmpty && !d.get.contains("мир"),
      "a description mentioning charset= must not be honored")
    // unsupported label in the FIRST tag: scanning continues to the next
    val two = "<meta charset=x-klingon><meta charset=koi8-r> мир"
    assert(Extract.transcodeToUtf8(
      two.getBytes(java.nio.charset.Charset.forName("KOI8-R"))).contains(two))
  }

  test("declared charset: failures fall through, junk stays rejected") {
    // declaration whose strict decode fails (invalid Shift_JIS trail
    // byte) -> falls through; bytes also fail the heuristics -> reject
    val bad = "<meta charset=shift_jis> x".getBytes(StandardCharsets.US_ASCII) ++
      Array[Byte](0x85.toByte, 0x00.toByte) // SJIS lead + invalid trail
    assert(Extract.transcodeToUtf8(bad).isEmpty)
    // unsupported/unknown label -> heuristics (here: valid Latin-1 tail)
    val unk = "<meta charset=x-klingon> café".getBytes(StandardCharsets.ISO_8859_1)
    assert(Extract.transcodeToUtf8(unk).contains("<meta charset=x-klingon> café"))
    // binary content never consults a (stray) declaration
    val bin = "charset=koi8-r".getBytes(StandardCharsets.US_ASCII) ++
      Array.fill[Byte](300)(1.toByte) ++ Array.fill[Byte](100)(0xE9.toByte)
    assert(Extract.transcodeToUtf8(bin).isEmpty)
  }

  test("v6 classifier: unlabeled Greek / Hebrew / Thai decode") {
    def cs(n: String) = java.nio.charset.Charset.forName(n)
    // Greek: tonos-accented words (every real polysyllabic word has one)
    val el = "some ascii body... αναζήτηση ελληνικά"
    assert(Extract.transcodeToUtf8(el.getBytes(cs("ISO-8859-7"))).contains(el))
    // Hebrew: unpointed letters, no mid-word final forms (by orthography)
    val he = "some ascii body... חיפוש עברית"
    assert(Extract.transcodeToUtf8(he.getBytes(cs("windows-1255"))).contains(he))
    // Thai: leading-vowel bigrams (เอ / ไท)
    val th = "some ascii body... เอกสาร ภาษาไทย"
    assert(Extract.transcodeToUtf8(th.getBytes(cs("TIS-620"))).contains(th))
  }

  test("v6 rule order: Cyrillic never claimed by the Greek/Hebrew/Thai rules") {
    def cs(n: String) = java.nio.charset.Charset.forName(n)
    // cp1251 lowercase lives in the SAME byte band as windows-1255
    // letters and decodes coherently as ISO-8859-7 — the final-form law
    // (н 0xED mid-word) and the tonos-marker absence are what reject it
    val win = "some ascii body... новости погода"
    assert(Extract.transcodeToUtf8(
      win.getBytes(cs("windows-1251"))).contains(win))
    // KOI8-R lowercase: р = 0xD2 is an ISO-8859-7 decode hole
    val koi = "some ascii body... привет поиск"
    assert(Extract.transcodeToUtf8(koi.getBytes(cs("KOI8-R"))).contains(koi))
    // and the reverse: the new tails classify as THEIR script even
    // though their byte bands overlap the Cyrillic ones (rule order)
    val he = "some ascii body... חיפוש עברית"
    val decoded = Extract.transcodeToUtf8(he.getBytes(cs("windows-1255")))
    assert(decoded.exists(_.contains("חיפוש")))
  }

  test("v6 SJIS guard: isolated cp1252 punctuation pairs no longer masquerade") {
    def cs(n: String) = java.nio.charset.Charset.forName(n)
    // four ISOLATED ƒ-pairs: each (0x83 + letter) parses as a valid SJIS
    // pair AND strict-decodes to a lone katakana (0x8341 = ア ...) — the
    // v5 rule (>= 4 pairs + >= 1 kana + coherence) classified pages like
    // this as SJIS mojibake; the v6 consecutive-Japanese requirement
    // keeps them on the cp1252 rule
    val cp = "win ƒA loss ƒB more ƒC text ƒD end"
    val bytes = cp.getBytes(cs("windows-1252"))
    assert(Extract.transcodeToUtf8(bytes).contains(cp))
    // real Japanese runs (>= 2 consecutive) still classify
    val sj = "some ascii body... テスト 検索漢字"
    assert(Extract.transcodeToUtf8(sj.getBytes(cs("Shift_JIS"))).contains(sj))
  }

  test("safety gate: clean text passes") {
    assert(Extract.contentSafetyCheck("normal text { with (some) [nesting] }").isEmpty)
  }

  test("safety gate: null byte => binary") {
    assert(Extract.contentSafetyCheck("has null").contains("binary"))
  }

  test("safety gate: >100KB line rejected, 100KB line passes") {
    val long = "x" * 100001
    assert(Extract.contentSafetyCheck(long).contains("long-line"))
    val edge = "x" * 100000
    assert(Extract.contentSafetyCheck(edge).isEmpty)
    assert(Extract.contentSafetyCheck(("y" * 99999) + "\n" + ("z" * 99999)).isEmpty)
  }

  test("safety gate: nesting depth 501 rejected, 500 passes") {
    assert(Extract.contentSafetyCheck("{" * 501).contains("deep-nesting"))
    assert(Extract.contentSafetyCheck("{" * 500).isEmpty)
    // balanced nesting counts peak depth
    assert(Extract.contentSafetyCheck(("(" * 501) + (")" * 501)).contains("deep-nesting"))
  }
}
