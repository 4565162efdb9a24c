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

  /** STUB nearest-neighbor resize: the "decoded image" of a payload is the
    * virtual w×h grayscale raster pixel(x,y) = payload[(y·w+x) mod len] (a
    * real decoder would supply actual pixels); the resize itself — index
    * math, batch pass, payload/metadata rewrite — is the real plumbing.
    * Output payload is exactly tw·th bytes. */
  private[ops] def nnResize(payload: Array[Byte], w: Int, h: Int, tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th)
    val n = math.max(payload.length, 1)
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        val sx = x * w / tw
        out(y * tw + x) = payload((sy * w + sx) % n)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize the image-modality assets to `tw`×`th`; per-partition batch,
    * no shuffle, metadata struct rewritten alongside the payload. */
  def resizeImages(assetDf: DataFrame, tw: Int = 32, th: Int = 24): DataFrame = {
    implicit val enc = Encoders.product[(Long, Array[Byte], Int, Int)]
    val outEnc = Encoders.product[(Long, Int, Int, Array[Byte])]
    assetDf.filter(col("modality") === "image")
      .select(col("doc_id"), col("payload"), col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions(_.map { case (id, payload, w, h) =>
        (id, tw, th, nnResize(payload, w, h, tw, th))
      })(outEnc)
      .toDF("doc_id", "out_w", "out_h", "payload")
  }

  /** STUB frame sampler: treats a video payload as consecutive
    * `frameBytes`-byte frames and keeps every `every`-th complete frame
    * (a real implementation would seek keyframes via the container codec);
    * the explode-to-rows shape (doc_id, frame_no, frame) is the real
    * plumbing. */
  def sampleFrames(assetDf: DataFrame, frameBytes: Int = 64, every: Int = 4): DataFrame = {
    implicit val enc = Encoders.product[(Long, Array[Byte])]
    val outEnc = Encoders.product[(Long, Long, Array[Byte])]
    assetDf.filter(col("modality") === "video")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        val nFrames = payload.length / frameBytes
        (0 until nFrames by every).iterator.map { f =>
          (id, f.toLong, java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes))
        }
      })(outEnc)
      .toDF("doc_id", "frame_no", "frame")
  }

  /** Resize as a gated query: structural outputs (dims, payload length) are
    * oracle-exact; byte-level resize math is MultimodalSpec's job. */
  def modalResize(spark: SparkSession, dir: String): DataFrame =
    resizeImages(assets(t(spark, dir, "documents")))
      .select(col("doc_id"), col("out_w"), col("out_h"),
        octet_length(col("payload")).cast(LongType).as("byte_len"))

  def modalResizeOracleSql: String =
    """SELECT doc_id, CAST(32 AS INT) AS out_w, CAST(24 AS INT) AS out_h,
      | CAST(768 AS BIGINT) AS byte_len
      |FROM documents WHERE doc_id % 3 = 0""".stripMargin

  /** Frame sampling as a gated query: the sampled frame index set and frame
    * sizes are oracle-exact; frame byte content is MultimodalSpec's job. */
  def modalFrames(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(assets(t(spark, dir, "documents")))
      .select(col("doc_id"), col("frame_no"),
        octet_length(col("frame")).cast(LongType).as("frame_len"))

  def modalFramesOracleSql: String =
    """SELECT doc_id,
      | unnest(range(0, CAST(floor(octet_length(encode(text)) / 64) AS BIGINT), 4)) AS frame_no,
      | CAST(64 AS BIGINT) AS frame_len
      |FROM documents WHERE doc_id % 3 = 2""".stripMargin

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
