package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Reference semantics: /root/reference/src/semantic/embeddings.rs:342-348
  * — lowercase, split on non-alphanumeric, keep tokens with utf8 byte
  * length > 2.
  */
class TokenizerSpec extends AnyFunSuite {

  test("golden cases match reference tokenize_simple semantics") {
    assert(Tokenizer.tokenize("Hello, World!") == Vector("hello", "world"))
    assert(Tokenizer.tokenize("a bb ccc dddd") == Vector("ccc", "dddd"))
    assert(Tokenizer.tokenize("") == Vector.empty)
    assert(Tokenizer.tokenize("...!!!") == Vector.empty)
    assert(Tokenizer.tokenize("foo_bar-baz") == Vector("foo", "bar", "baz"))
    assert(Tokenizer.tokenize("CamelCase123 x9") == Vector("camelcase123"))
    assert(Tokenizer.tokenize("num42x,     tab\t\nnewline") ==
      Vector("num42x", "tab", "newline"))
    // 2-char token with >2 utf8 bytes survives (Rust str::len is bytes)
    assert(Tokenizer.tokenize("héllo wörld") == Vector("héllo", "wörld"))
    assert(Tokenizer.tokenize("日本") == Vector("日本"))
    assert(Tokenizer.tokenize("ab") == Vector.empty)
    assert(Tokenizer.tokenize("été") == Vector("été")) // 5 utf8 bytes
  }

  test("termId is bit-identical to Catalyst xxhash64 (seed 42)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val inputs = Seq("", "a", "spark", "merge", "héllo", "日本",
      "caféresumé", "0123456789abcdef0123456789abcdef-longer-than-32",
      "İstanbul", "x" * 1000)
    val sql = inputs.toDF("t").select(col("t"), xxhash64(col("t")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s =>
      assert(Tokenizer.termId(s) == sql(s), s"termId mismatch for '$s'")
    }
  }

  test("column twin agrees with pure function") {
    val spark = TestSpark.spark
    import spark.implicits._
    val inputs = Seq(
      "Hello, World!", "a bb ccc dddd", "", "...!!!", "foo_bar-baz",
      "CamelCase123 x9", "héllo wörld", "mixed: UPPER lower 42abc",
      "trailing space ", " leading", "tab\tsep", "new\nline\nsplit")
    val got = inputs.toDF("t")
      .select(Tokenizer.tokensCol(col("t")).as("toks"))
      .as[Seq[String]].collect()
    inputs.zip(got).foreach { case (in, g) =>
      assert(g == Tokenizer.tokenize(in), s"input: '$in'")
    }
  }

  test("termFrequencies histogram == tokenize grouped+counted, total == doc_len") {
    def want(s: String): Map[String, Int] =
      Tokenizer.tokenize(s).groupBy(identity).map { case (k, v) => k -> v.size }
    val fixed = Seq(
      "Hello, World! hello WORLD hello", "", "...!!!", "a bb ccc dddd ccc",
      "héllo wörld héllo", "日本 日本 日本語",
      // exercises the non-ASCII fallback's order-sensitivity: U+0130
      // lowers to i + combining mark (a separator)
      "AİB data", "mixed ASCII then héllo then ascii again",
      ("tok%04d " * 600).format(0 until 600: _*), // counter growth
      "x" * 5000 + " yyy " + "x" * 5000)
    val genWord = Gen.oneOf("the", "DATA", "data", "Data", "a", "ab", "abc",
      "x9", "42", "999", "héllo", "日本語", "under_score", "dup,dup", "...")
    val genText = Gen.listOfN(40, genWord).map(_.mkString(" "))
    val random = Gen.listOfN(200, genText).sample.get
    (fixed ++ random).foreach { s =>
      val tc = Tokenizer.termFrequencies(s)
      val got = tc.iterator.toMap
      assert(got == want(s), s"input: '${s.take(80)}'")
      assert(tc.total == Tokenizer.tokenize(s).size.toLong,
        s"total != token count for '${s.take(80)}'")
    }
  }

  test("property: column twin == pure function on realistic text") {
    val spark = TestSpark.spark
    import spark.implicits._
    val wordGen = Gen.oneOf(
      "the", "a", "Fast", "KEY", "order42", "x", "ab", "abc",
      "merge-sort", "dup,dup", "tab\ttab", "line\nline", "héllo", "日本語",
      "...", "(paren)", "[brack]", "{curly}", "under_score", "99", "999")
    val textGen = Gen.listOfN(30, wordGen).map(_.mkString(" "))
    val samples = Gen.listOfN(60, textGen).sample.get
    val got = samples.toDF("t")
      .select(Tokenizer.tokensCol(col("t")).as("toks"))
      .as[Seq[String]].collect()
    samples.zip(got).foreach { case (in, g) =>
      assert(g == Tokenizer.tokenize(in), s"input: '$in'")
    }
  }
}
