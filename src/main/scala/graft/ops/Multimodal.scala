package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches (the Spark-side shape of a decode/feature-extract stage).
  *
  * The actual decoders (libjpeg/ffmpeg/…) are NOT available in this
  * container, so [[FakeDecoder]] is a clearly-marked deterministic STUB —
  * the schema, batching, partitioning and test surface around it are real.
  * Swapping in a real decoder means replacing exactly one function.
  */
object Multimodal {

  /** Output schema of the feature-extraction stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("mm_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  val FeatureDim = 8

  /** STUB decoder: deterministic pseudo-decode of an opaque payload.
    * Stands in for image decode + resize + embed; replace with a real
    * codec when one is available. Everything it returns is a pure
    * function of the bytes, so tests are exact.
    */
  object FakeDecoder {
    def decode(id: Long, bytes: Array[Byte]): Row = {
      var h = 1469598103934665603L // FNV-1a
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 1099511628211L; i += 1
      }
      val w = 64 + (math.abs(h % 577)).toInt
      val ht = 64 + (math.abs((h >> 17) % 431)).toInt
      val feat = Array.tabulate(FeatureDim) { d =>
        (((h >>> (d * 8)) & 0xffL).toFloat - 128f) / 128f
      }
      Row(id, bytes.length.toLong, w, ht, h, feat.toSeq)
    }
  }

  /** Batch feature extraction over (idCol LONG, binCol BINARY). Runs as
    * mapPartitions so a real decoder could amortize model/codec init per
    * partition (the Pandas-UDF batch shape, JVM edition).
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(idCol, binCol).rdd.mapPartitions { it =>
      // per-partition init happens here (codec/model load in real life)
      it.map { r => FakeDecoder.decode(r.getLong(0), r.getAs[Array[Byte]](1)) }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
