package graft.oracle

import scala.collection.mutable

import graft.index.Bm25
import graft.tokenize.Tokenizer

/** Single-node exact BM25 oracle — plays the role the whitebox validator
  * plays in the reference (/root/reference/src/bin/validator/validator.rs:
  * 312-400: index completeness + accuracy checks against a corpus with
  * known needles). Plain Scala collections, no pruning, no compression.
  *
  * Shares every constant and the exact double-operation order with the
  * distributed engine (graft.index.Bm25), so rank-identity tests can
  * assert score equality with == (no tolerance).
  */
object Bm25Oracle {

  case class OracleHit(doc_id: Long, score: Double)

  final class Corpus(docs: Seq[(Long, String)]) {
    val tokenized: Map[Long, Vector[String]] =
      docs.map { case (id, t) => id -> Tokenizer.tokenize(t) }.toMap
    val tf: Map[Long, Map[String, Int]] =
      tokenized.map { case (id, toks) =>
        id -> toks.groupBy(identity).map { case (t, xs) => t -> xs.size }
      }
    val docLen: Map[Long, Long] =
      tokenized.map { case (id, toks) => id -> toks.size.toLong }
    val numDocs: Long = docs.size.toLong
    val totalTokens: Long = docLen.values.sum
    val avgdl: Double =
      if (numDocs == 0) 0.0 else totalTokens.toDouble / numDocs.toDouble
    val df: Map[String, Long] = {
      val m = mutable.HashMap.empty[String, Long]
      tf.valuesIterator.foreach(_.keysIterator.foreach { t =>
        m.update(t, m.getOrElse(t, 0L) + 1L)
      })
      m.toMap
    }
    def idf(term: String): Double = Bm25.idf(numDocs, df(term))

    /** Exact BM25 top-k; tie-break (score DESC, doc_id ASC) — the frozen
      * total order (the reference's own top-k is tie-unstable,
      * engine.rs:1381-1401, so the spec fixes it; SURVEY.md §5).
      */
    def search(query: String, k: Int,
        conjunctive: Boolean = true): Vector[OracleHit] = {
      val qTokens = Tokenizer.tokenize(query).distinct
      if (qTokens.isEmpty) {
        // P4 short-query fallback: every doc is a candidate, score 0.0 in
        // doc_id order (reference engine.rs:1242-1246 all_documents())
        if (query != null && query.trim.nonEmpty)
          return tf.keysIterator.toVector.sorted
            .take(math.max(1, math.min(k, 1000))).map(OracleHit(_, 0.0))
        return Vector.empty
      }
      val resolved = qTokens.filter(df.contains)
      if (conjunctive && resolved.size != qTokens.size) return Vector.empty
      if (resolved.isEmpty) return Vector.empty
      // canonical summation order: ascending term_id (xxhash64, signed)
      val qSorted = resolved.sortBy(Bm25.termId)
      val qIdf = qSorted.map(t => t -> idf(t)).toMap
      val hits = tf.iterator.flatMap { case (docId, tfs) =>
        val present = qSorted.filter(tfs.contains)
        if (present.isEmpty || (conjunctive && present.size != qSorted.size))
          None
        else {
          var score = 0.0
          present.foreach { t =>
            score += Bm25.impact(
              tfs(t).toDouble, docLen(docId).toDouble, avgdl, qIdf(t))
          }
          Some(OracleHit(docId, score))
        }
      }.toVector
      hits.sortBy(h => (-h.score, h.doc_id)).take(math.max(1, math.min(k, 1000)))
    }
  }

  def apply(docs: Seq[(Long, String)]): Corpus = new Corpus(docs)
}
