package graft.index

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.Platform
import org.apache.spark.sql.catalyst.expressions.XXH64

/** BM25 (k1=1.2, b=0.75, Robertson idf) — the scoring model the north star
  * specifies. The reference has no BM25; its ranked-retrieval analog is the
  * TF-vector cosine engine (/root/reference/src/semantic/embeddings.rs:
  * 318-339) and its hand-tuned lexical boosts
  * (/root/reference/src/search/engine.rs:239-278). Every constant below is
  * shared between the distributed engine, the block builder, and the
  * single-node oracle so scores are bit-identical.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75
  /** Precomputed once so engine and oracle use the *same* doubles. */
  val K1p1: Double = K1 + 1.0
  val OneMinusB: Double = 1.0 - B

  /** Robertson idf: ln((N - df + 0.5) / (df + 0.5) + 1). */
  def idf(numDocs: Long, df: Long): Double =
    math.log((numDocs - df + 0.5) / (df + 0.5) + 1.0)

  /** Same formula as a Column (codegen'd java.lang.Math.log — identical
    * result to [[idf]] on the same JVM).
    */
  def idfCol(numDocs: Long, df: Column): Column =
    log((lit(numDocs.toDouble) - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))

  /** Per-(term,doc) BM25 contribution ("impact"). Operand order is frozen;
    * the oracle mirrors it exactly (SURVEY.md §7.4 score-identity note).
    */
  def impact(tf: Double, docLen: Double, avgdl: Double, idf: Double): Double =
    idf * ((tf * K1p1) / (tf + K1 * (OneMinusB + B * (docLen / avgdl))))

  /** Column twin of [[impact]] with the identical operand tree. */
  def impactCol(tf: Column, docLen: Column, avgdl: Double, idf: Column): Column =
    idf * ((tf * lit(K1p1)) /
      (tf + lit(K1) * (lit(OneMinusB) + lit(B) * (docLen / lit(avgdl)))))

  /** Stable 64-bit term id — identical to Spark SQL's `xxhash64(term)`
    * (seed 42), so the driver-side query analyzer and the distributed
    * plan agree without a lookup.
    */
  def termId(term: String): Long = {
    val b = term.getBytes(StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }
}
