package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** Multimodal column plumbing: image/audio/video treated as opaque `binary`
  * payloads with typed metadata, and feature extraction as a batched
  * per-partition pass.
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs, so
  * `fakeDecode` below produces deterministic pseudo-features from the raw
  * bytes. The Spark-side contract — schema, binary transport, partition-
  * batched extraction, feature vector shape — is real and tested; swapping
  * `fakeDecode` for a JNI/FFI decoder is a local change inside the
  * mapPartitions. */
object Multimodal {

  val FeatureDim = 8

  /** Asset table: payload = UTF-8 bytes of the text (stand-in for real
    * media), modality round-robin by id, metadata struct derived
    * deterministically. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(64)) * 16 + 64).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 48).cast(IntegerType).as("height"),
        lit(16000).as("sample_rate")).as("meta"))

  /** STUB decoder: a real implementation would decode the codec frame here
    * (e.g. libjpeg/ffmpeg via JNI). Produces a deterministic byte checksum
    * and an 8-dim feature vector from byte histograms so the downstream
    * plumbing is fully exercisable. */
  private[ops] def fakeDecode(payload: Array[Byte]): (Long, Array[Float]) = {
    var checksum = 0L
    val hist = new Array[Long](FeatureDim)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      checksum = (checksum * 31 + b) & 0x7fffffffffffffL
      hist(b % FeatureDim) += 1
      i += 1
    }
    val n = math.max(payload.length, 1).toDouble
    (checksum, hist.map(h => (h / n).toFloat))
  }

  /** Batched feature extraction over the binary column. One pass per
    * partition, no shuffle; output schema
    * (doc_id, modality, byte_len, checksum, feat: array<float>). */
  def extractFeatures(assetDf: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[(Long, String, Array[Byte])]
    val outEnc = Encoders.product[(Long, String, Int, Long, Array[Float])]
    assetDf.select(col("doc_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point (a real decoder would open its context here)
        it.map { case (id, modality, payload) =>
          val (checksum, feat) = fakeDecode(payload)
          (id, modality, payload.length, checksum, feat)
        }
      }(outEnc)
      .toDF("doc_id", "modality", "byte_len", "checksum", "feat")
  }

  /** Oracle-checkable metadata projection (byte length is exact — UTF-8 of
    * ASCII text). */
  def modalMeta(spark: SparkSession, dir: String): DataFrame =
    assets(t(spark, dir, "documents"))
      .select(col("doc_id"), col("modality"), octet_length(col("payload")).cast(LongType).as("byte_len"))

  /** Full stub pipeline as a query (rows-only check; exactness in
    * MultimodalSpec). */
  def modalFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(assets(t(spark, dir, "documents")))
      .select(col("doc_id"), col("modality"), col("byte_len"), col("checksum"),
        round(element_at(col("feat"), 1).cast(DoubleType), 4).as("f0"))
}
