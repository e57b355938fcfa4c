package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._

/** One posting row routed into the block encoder (top-level so Catalyst's
  * generated deserializer can construct it).
  */
case class PostingRowIn(
    term_id: Long, doc_id: Long, impact: Double, block_id: Long)

/** One tf row routed into the tf-driven block encoder ([[PostingBlocks
  * .encodeFromTf]]): the impact is computed INSIDE the encode task from a
  * broadcast idf dictionary, so the build shuffle ships (tf, doc_len)
  * small ints instead of an 8-byte near-incompressible double.
  */
case class TfRowIn(term_id: Long, doc_id: Long, tf: Int, doc_len: Int)

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

  /** Posting blocks straight from TF ROWS `(term_id, doc_id, tf,
    * doc_len)` with the BM25 impact computed inside the streaming encode
    * from a broadcast `(term_id -> idf)` dictionary — the round-5 byte
    * cut through the one build-dominant Exchange (VERDICT r4 next-step
    * 1b). The [[encode]] path ships `impact DOUBLE` per posting: 8 bytes
    * of near-incompressible mantissa through the shuffle. Here the
    * shuffle ships `(tf INT, doc_len INT)` instead — small, highly
    * repetitive integers that the shuffle's lz4 squeezes to a fraction
    * of the doubles — and the impact materializes only inside the
    * encoder's bounded per-group arrays.
    *
    * BIT-EXACT by construction: [[Bm25.impact]] is the scalar twin of
    * the [[Bm25.impactCol]] operand tree the postings stage uses (same
    * operand order, same doubles; equivalence asserted block-for-block in
    * PostingCodecSpec), and idf values come from the same dictionary
    * table the postings join reads.
    *
    * The repartition hashes on (term_id, doc_id >> blockBits) expressions
    * — nothing extra is shipped for the salt — and within a term the
    * docId sort IS the block sort (block_id is monotonic in doc_id), so
    * the sort key needs no block_id column either.
    */
  def encodeFromTf(tfRows: DataFrame, avgdl: Double,
      idf: org.apache.spark.broadcast.Broadcast[LongDoubleMap],
      blockBits: Int = DefaultBlockBits,
      quantizeImpacts: Boolean = false): Dataset[PostingBlock] = {
    val spark = tfRows.sparkSession
    import spark.implicits._
    val q8 = quantizeImpacts
    val bits = blockBits
    tfRows
      .select(col("term_id"), col("doc_id"),
        col("tf").cast("int").as("tf"),
        col("doc_len").cast("int").as("doc_len"))
      .repartition(col("term_id"), shiftright(col("doc_id"), bits))
      .sortWithinPartitions("term_id", "doc_id")
      .as[TfRowIn]
      .mapPartitions(it => encodeTfPartition(it, bits, avgdl, idf.value, q8))
  }

  /** Streaming group encoder over tf rows sorted by (term_id, doc_id) —
    * the [[encodePartition]] twin with the impact computed per posting
    * from the broadcast idf map. Group key: (term_id, doc_id >> bits).
    */
  private[index] def encodeTfPartition(
      it: Iterator[TfRowIn],
      bits: Int,
      avgdl: Double,
      idf: LongDoubleMap,
      q8: Boolean = false): Iterator[PostingBlock] =
    new Iterator[PostingBlock] {
      private var pending: TfRowIn = if (it.hasNext) it.next() else null
      def hasNext: Boolean = pending != null
      def next(): PostingBlock = {
        val term = pending.term_id
        val block = pending.doc_id >> bits
        val termIdf = idf(term)
        var cap = 64
        var docs = new Array[Long](cap)
        var imps = new Array[Double](cap)
        var n = 0
        var blockMax = Double.NegativeInfinity
        var r = pending
        while (r != null && r.term_id == term && (r.doc_id >> bits) == block) {
          if (n == cap) {
            cap *= 2
            docs = java.util.Arrays.copyOf(docs, cap)
            imps = java.util.Arrays.copyOf(imps, cap)
          }
          val imp = Bm25.impact(r.tf.toDouble, r.doc_len.toDouble, avgdl, termIdf)
          docs(n) = r.doc_id; imps(n) = imp
          if (imp > blockMax) blockMax = imp
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
      quantizeImpacts: Boolean = false): Long =
    writeBlocksEncoded(encode(postings, blockBits, quantizeImpacts),
      outDir, numBuckets, blockBits, quantizeImpacts)

  /** [[writeBlocks]] from tf rows via [[encodeFromTf]] (the byte-cut
    * path; caller guarantees the dictionary fits the broadcast).
    */
  def writeBlocksFromTf(tfRows: DataFrame, avgdl: Double,
      idf: org.apache.spark.broadcast.Broadcast[LongDoubleMap],
      outDir: String, numBuckets: Int,
      blockBits: Int = DefaultBlockBits,
      quantizeImpacts: Boolean = false): Long =
    writeBlocksEncoded(
      encodeFromTf(tfRows, avgdl, idf, blockBits, quantizeImpacts),
      outDir, numBuckets, blockBits, quantizeImpacts)

  /** Bucketed-table writer for an already-encoded blocks Dataset (shared
    * tail of the postings-driven, tf-driven and checkpoint-assembly
    * paths). The write itself needs no shuffle: each task writes its
    * groups into per-bucket files after a local sort by the bucket
    * expression (a bucket may hold files from many tasks — the query
    * side only needs bucket-level co-location).
    */
  def writeBlocksEncoded(blocks: Dataset[PostingBlock], outDir: String,
      numBuckets: Int,
      blockBits: Int = DefaultBlockBits,
      quantizeImpacts: Boolean = false): Long = {
    val spark = blocks.sparkSession
    val table = BuiltIndex.blocksTableName(outDir)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val obs = org.apache.spark.sql.Observation()
    blocks
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
