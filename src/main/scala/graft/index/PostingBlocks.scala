package graft.index

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Input posting for the block aggregator. */
case class PostingIn(doc_id: Long, tf: Int, impact: Double)

/** Encoded posting block: all postings of one term whose docIds fall in one
  * fixed docId range (block = docId >> blockBits).
  *
  * Fixed docId ranges are the skew defense (SURVEY.md §7.4 "head-term
  * skew"): a stopword with df ~ N fans out over ~N/2^blockBits independent
  * (termId, blockId) groups, so the final merge never concentrates a hot
  * term on one reducer — the blockId IS the salt, and salted sub-lists
  * concatenate in docId order without re-encoding. The reference's analog
  * merge is the single-writer RwLock section
  * (/root/reference/src/search/engine.rs:797-831) that this shuffle design
  * replaces.
  */
case class PostingBlock(
    n: Int,
    docs_enc: Array[Byte],
    tfs_enc: Array[Byte],
    impacts_enc: Array[Byte],
    block_max: Double)

/** Typed Catalyst aggregate (the one genuinely custom Catalyst piece,
  * SURVEY.md §7.3): (docId, tf, impact) rows -> sorted, delta+varint
  * encoded posting block with stored block-max score (for block-max WAND
  * pruning at query time). Partial aggregation (map-side combine) is
  * planned automatically by Catalyst for Aggregator-based UDAFs.
  */
class PostingBlockAggregator
    extends Aggregator[PostingIn, ArrayBuffer[PostingIn], PostingBlock] {

  override def zero: ArrayBuffer[PostingIn] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[PostingIn], a: PostingIn): ArrayBuffer[PostingIn] = {
    b += a; b
  }

  override def merge(b1: ArrayBuffer[PostingIn], b2: ArrayBuffer[PostingIn]): ArrayBuffer[PostingIn] = {
    b1 ++= b2; b1
  }

  override def finish(buf: ArrayBuffer[PostingIn]): PostingBlock = {
    val sorted = buf.sortBy(_.doc_id).toArray
    val n = sorted.length
    val docIds = new Array[Long](n)
    val tfs = new Array[Int](n)
    val impacts = new Array[Double](n)
    var blockMax = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      docIds(i) = sorted(i).doc_id
      tfs(i) = sorted(i).tf
      impacts(i) = sorted(i).impact
      if (impacts(i) > blockMax) blockMax = impacts(i)
      i += 1
    }
    PostingBlock(
      n = n,
      docs_enc = PostingCodec.encodeDocIds(docIds),
      tfs_enc = PostingCodec.encodeTfs(tfs),
      impacts_enc = PostingCodec.encodeImpacts(impacts),
      block_max = if (n == 0) 0.0 else blockMax)
  }

  override def bufferEncoder: Encoder[ArrayBuffer[PostingIn]] =
    Encoders.kryo[ArrayBuffer[PostingIn]]
  override def outputEncoder: Encoder[PostingBlock] = Encoders.product[PostingBlock]
}

object PostingBlocks {
  /** Default block width: 8192 docIds per block. */
  val DefaultBlockBits = 13

  /** Column-callable UDAF: `blockAgg($"doc_id", $"tf", $"impact")`. */
  val blockAgg = udaf(new PostingBlockAggregator, Encoders.product[PostingIn])
}
