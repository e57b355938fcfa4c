package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.PostingCodec
import graft.query.{BlockRow, Bm25Query}

/** Unit tests of the block-merge kernel (processPartition) — the
  * doc-level WAND refinements are proven structurally here (the
  * oracle-equality suites prove end-to-end exactness):
  *
  *   - impacts decode LAZILY: a group whose intersection is empty must
  *     never touch the impact payload (evidenced with corrupt payloads
  *     that would throw on decode);
  *   - scoring positions come from the intersection pointers, and sums
  *     accumulate in ascending term_id order.
  */
class WandMergeSpec extends AnyFunSuite {

  private def enc(imps: Array[Double]): Array[Byte] =
    PostingCodec.encodeImpacts(imps)

  test("empty intersection: impact payloads are never decoded") {
    // docs disjoint within the block -> intersection empty. The impact
    // payloads are CORRUPT (far too short for n) — any decode attempt
    // throws, so completing without exception proves laziness.
    val t1 = BlockRow(1L, 0L, 3,
      PostingCodec.encodeDocIds(Array(0L, 2L, 4L)), Array[Byte](1), 5.0)
    val t2 = BlockRow(2L, 0L, 3,
      PostingCodec.encodeDocIds(Array(1L, 3L, 5L)), Array[Byte](2), 4.0)
    val out = Bm25Query.processPartition(
      Iterator(t1, t2), nTerms = 2, k = 10, conjunctive = true).toList
    assert(out.isEmpty)
  }

  test("conjunctive group missing a term is skipped before ANY decode") {
    // nTerms=2 but only one term present: even the docId payload (also
    // corrupt here) must not be touched
    val t1 = BlockRow(1L, 0L, 3, Array[Byte](7), Array[Byte](7), 5.0)
    val out = Bm25Query.processPartition(
      Iterator(t1), nTerms = 2, k = 10, conjunctive = true).toList
    assert(out.isEmpty)
  }

  test("overlap scores exactly from intersection pointers") {
    val t1 = BlockRow(1L, 0L, 3,
      PostingCodec.encodeDocIds(Array(0L, 2L, 4L)),
      enc(Array(1.0, 2.0, 3.0)), 3.0)
    val t2 = BlockRow(2L, 0L, 2,
      PostingCodec.encodeDocIds(Array(2L, 7L)),
      enc(Array(10.0, 20.0)), 20.0)
    val out = Bm25Query.processPartition(
      Iterator(t1, t2), nTerms = 2, k = 10, conjunctive = true).toList
    assert(out == List((2L, 12.0)))
  }

  test("multi-block runs intersect per block; union mode sums all terms") {
    val rows = Iterator(
      BlockRow(1L, 0L, 2, PostingCodec.encodeDocIds(Array(0L, 1L)),
        enc(Array(1.0, 4.0)), 4.0),
      BlockRow(2L, 0L, 2, PostingCodec.encodeDocIds(Array(1L, 3L)),
        enc(Array(0.5, 0.5)), 0.5),
      BlockRow(1L, 9L, 1, PostingCodec.encodeDocIds(Array(100L)),
        enc(Array(2.0)), 2.0))
    val conj = Bm25Query.processPartition(
      rows, nTerms = 2, k = 10, conjunctive = true).toList
    assert(conj == List((1L, 4.5))) // block 9 lacks term 2
    val rows2 = Iterator(
      BlockRow(1L, 0L, 2, PostingCodec.encodeDocIds(Array(0L, 1L)),
        enc(Array(1.0, 4.0)), 4.0),
      BlockRow(2L, 0L, 2, PostingCodec.encodeDocIds(Array(1L, 3L)),
        enc(Array(0.5, 0.5)), 0.5))
    val union = Bm25Query.processPartition(
      rows2, nTerms = 2, k = 10, conjunctive = false).toList.sortBy(_._1)
    assert(union == List((0L, 1.0), (1L, 4.5), (3L, 0.5)))
  }

  test("union WAND: below-threshold list is never decoded (k=1)") {
    // list 1 fills the k=1 heap with score 10; list 2's block_max (0.5)
    // then bounds every remaining doc strictly below the threshold, so
    // its CORRUPT impact payload must never be decoded
    val rows = Iterator(
      BlockRow(1L, 0L, 2, PostingCodec.encodeDocIds(Array(0L, 1L)),
        enc(Array(10.0, 9.0)), 10.0),
      BlockRow(2L, 0L, 2, PostingCodec.encodeDocIds(Array(50L, 60L)),
        Array[Byte](3), 0.5))
    val out = Bm25Query.processPartition(
      rows, nTerms = 2, k = 1, conjunctive = false).toList
    assert(out == List((0L, 10.0)))
  }

  test("union WAND: equal-to-threshold docs are still evaluated (ties exact)") {
    // doc 5 scores exactly the heap threshold (3.0) from a list whose
    // block_max equals it — strictly-below-only skipping must evaluate
    // it, and the tie-break (smaller doc_id) must keep doc 2
    val rows = Iterator(
      BlockRow(1L, 0L, 1, PostingCodec.encodeDocIds(Array(2L)),
        enc(Array(3.0)), 3.0),
      BlockRow(2L, 0L, 1, PostingCodec.encodeDocIds(Array(5L)),
        enc(Array(3.0)), 3.0))
    val out = Bm25Query.processPartition(
      rows, nTerms = 2, k = 1, conjunctive = false).toList
    assert(out == List((2L, 3.0)))
  }
}
