package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._

/** One posting row routed into the block encoder (top-level so Catalyst's
  * generated deserializer can construct it).
  */
case class PostingRowIn(
    term_id: Long, doc_id: Long, impact: Double, block_id: Long)

/** Encoded posting block: all postings of one term whose docIds fall in one
  * fixed docId range (block_id = docId >> blockBits).
  *
  * Fixed docId ranges are the skew defense (SURVEY.md §7.4 "head-term
  * skew"): a stopword with df ~ N fans out over ~N/2^blockBits independent
  * (termId, blockId) groups, so no reducer ever concentrates a hot term —
  * the blockId IS the salt, and salted sub-lists concatenate in docId order
  * without re-encoding. The reference's analog merge is the single-writer
  * RwLock section (/root/reference/src/search/engine.rs:797-831) that this
  * shuffle design replaces.
  */
case class PostingBlock(
    term_id: Long,
    block_id: Long,
    n: Int,
    docs_enc: Array[Byte],
    impacts_enc: Array[Byte],
    block_max: Double)

object PostingBlocks {
  /** Default block width: 8192 docIds per block. */
  val DefaultBlockBits = 13

  /** Posting rows -> encoded blocks.
    *
    * Shuffle-once streaming design: hash-repartition on the exact group key
    * (term_id, block_id) — Tungsten UnsafeRow shuffle, no object
    * serialization — then a spillable local radix sort and a streaming
    * mapPartitions encode whose live state is ONE group's arrays (bounded
    * by 2^blockBits docIds). This replaced a kryo-buffered Aggregator
    * (round 1's GC-bound worst-scaling stage: ObjectHashAggregate
    * deserialized/merged ArrayBuffer buffers through kryo on every spill
    * and shuffle read).
    */
  def encode(postings: DataFrame,
      blockBits: Int = DefaultBlockBits,
      quantizeImpacts: Boolean = false): Dataset[PostingBlock] = {
    val spark = postings.sparkSession
    import spark.implicits._
    val q8 = quantizeImpacts
    postings
      .withColumn("block_id", shiftright(col("doc_id"), blockBits))
      .repartition(col("term_id"), col("block_id"))
      .sortWithinPartitions("term_id", "block_id", "doc_id")
      // the serving artifact carries docIds + impacts only: tf is never
      // read at query time (impacts subsume it at fixed k1/b) and lives in
      // the tf/postings tables for rebuilds — one byte/posting saved in
      // the shuffle, the files and the hot cache
      .select(col("term_id"), col("doc_id"), col("impact"), col("block_id"))
      .as[PostingRowIn]
      .mapPartitions(it => encodePartition(it, q8))
  }

  /** Streaming group encoder over rows sorted by (term_id, block_id,
    * doc_id). Strictly-increasing doc_ids within a group are enforced by
    * the codec — a violation means a term_id hash collision merged two
    * terms' postings, and the build fails loudly.
    */
  private[index] def encodePartition(
      it: Iterator[PostingRowIn],
      q8: Boolean = false): Iterator[PostingBlock] =
    new Iterator[PostingBlock] {
      private var pending: PostingRowIn = if (it.hasNext) it.next() else null
      def hasNext: Boolean = pending != null
      def next(): PostingBlock = {
        val term = pending.term_id
        val block = pending.block_id
        var cap = 64
        var docs = new Array[Long](cap)
        var imps = new Array[Double](cap)
        var n = 0
        var blockMax = Double.NegativeInfinity
        var r = pending
        while (r != null && r.term_id == term && r.block_id == block) {
          if (n == cap) {
            cap *= 2
            docs = java.util.Arrays.copyOf(docs, cap)
            imps = java.util.Arrays.copyOf(imps, cap)
          }
          docs(n) = r.doc_id; imps(n) = r.impact
          if (r.impact > blockMax) blockMax = r.impact
          n += 1
          r = if (it.hasNext) it.next() else null
        }
        pending = r
        val impArr = java.util.Arrays.copyOf(imps, n)
        PostingBlock(term, block, n,
          PostingCodec.encodeDocIds(java.util.Arrays.copyOf(docs, n)),
          if (q8) PostingCodec.encodeImpactsQ8(impArr)
          else PostingCodec.encodeImpacts(impArr),
          blockMax)
      }
    }

  /** Write encoded blocks as a BUCKETED table (bucketBy block_id, files
    * sorted by (term_id, block_id)) registered in the session catalog with
    * the data under `$outDir/blocks`.
    *
    * The bucketing is the serving-path contract: a query reads the blocks
    * of its terms (pushed In(term_id) filter; file sort keeps row-group
    * stats tight) with ONE TASK PER BUCKET, so every (term_id, block_id)
    * group of one docId range is complete inside a single task and the
    * WAND merge runs with zero per-query Exchange — round 1 shipped a
    * `repartition(block_id)` shuffle on every query, which at head-term
    * scale moves the posting lists of the most common words in the corpus.
    *
    * A bucket may hold multiple files (one per encode task that produced
    * rows for it); correctness only needs bucket-level co-location because
    * the query side re-sorts locally by (block_id, term_id).
    */
  def writeBlocks(postings: DataFrame, outDir: String, numBuckets: Int,
      blockBits: Int = DefaultBlockBits,
      quantizeImpacts: Boolean = false): Long = {
    val spark = postings.sparkSession
    val table = BuiltIndex.blocksTableName(outDir)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val obs = org.apache.spark.sql.Observation()
    encode(postings, blockBits, quantizeImpacts)
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.format("parquet")
      // zstd over the snappy default: the already-delta/varint-coded
      // binary payloads still shrink ~20-30%, and the serving scan is
      // I/O-bound, not decompressor-bound
      .option("compression", "zstd")
      .bucketBy(numBuckets, "block_id")
      .sortBy("term_id", "block_id")
      .option("path", s"$outDir/blocks")
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
    import spark.implicits._
    Seq((numBuckets, blockBits, if (quantizeImpacts) "q8" else "f64"))
      .toDF("num_buckets", "block_bits", "impact_codec")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/blocks_meta")
    obs.get("n").asInstanceOf[Long]
  }
}
