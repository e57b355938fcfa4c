package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** One decoded feature row (top-level for Catalyst's encoder). */
case class MmFeature(
    mm_id: Long,
    n_bytes: Long,
    width: Int,
    height: Int,
    checksum: Long,
    feature: Seq[Float])

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches (the Spark-side shape of a decode/feature-extract stage).
  *
  * The actual decoders (libjpeg/ffmpeg/…) are NOT available in this
  * container, so [[FakeDecoder]] is a clearly-marked deterministic STUB —
  * the schema, batching, partitioning and test surface around it are real
  * (and SQL-replicable: FNV-1a over the payload bytes drives every output,
  * so the DuckDB gate verifies the full pipeline). Swapping in a real
  * decoder means replacing exactly one function.
  */
object Multimodal {

  val FeatureDim = 8

  /** STUB decoder: deterministic pseudo-decode of an opaque payload.
    * Stands in for image decode + resize + embed. Every output is a pure
    * function of the FNV-1a checksum of the bytes, so tests are exact.
    */
  object FakeDecoder {
    def decode(id: Long, bytes: Array[Byte]): MmFeature = {
      var h = 1469598103934665603L // FNV-1a offset basis
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 1099511628211L; i += 1
      }
      val w = 64 + math.abs(h % 577).toInt
      val ht = 64 + math.abs((h >> 17) % 431).toInt
      val feat = Array.tabulate(FeatureDim) { d =>
        (((h >>> (d * 8)) & 0xffL).toFloat - 128f) / 128f
      }
      MmFeature(id, bytes.length.toLong, w, ht, h, feat.toSeq)
    }
  }

  /** Batch feature extraction over (idCol LONG, binCol BINARY). Typed
    * Dataset mapPartitions (no RDD hop — input-hint rule) so a real
    * decoder can amortize model/codec init once per partition (the
    * Pandas-UDF batch shape, JVM edition).
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens here (codec/model load in real life)
        it.map { case (id, bytes) => FakeDecoder.decode(id, bytes) }
      }
      .toDF()
  }
}
