package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** Multimodal column plumbing: image/audio/video treated as opaque `binary`
  * payloads with typed metadata, and feature extraction as a batched
  * per-partition pass.
  *
  * The IMAGE path is a REAL codec path: the deterministic source raster is
  * encoded to an actual PNG and decoded back through `javax.imageio` (which
  * ships with the JDK) before any pixel math runs, so feature extraction and
  * resizing operate on genuinely decoded pixels. PNG grayscale is lossless,
  * which keeps every decoded pixel closed-form (the tiled source bytes) —
  * that is what lets the DuckDB oracle replay m2's pixel checksum without an
  * engine-side dump. The AUDIO path is likewise REAL as of m5: waveforms
  * roundtrip through the JDK's WAV codec (`javax.sound.sampled` — RIFF
  * container parse, PCM16 LE) before featurization, with the same
  * lossless ⇒ closed-form-oracle argument. VIDEO decode remains a
  * deterministic stub (no video codec ships with the JDK or container):
  * payload bytes stand in for decoded frames, and the honest
  * md5-of-payload checksum keeps even the stub rows oracle-checkable.
  * Swapping that stub for an FFI decoder is a local change inside the
  * mapPartitions. */
object Multimodal {

  val FeatureDim = 8

  /** Fixed thumbnail raster for feature extraction (decode-at-fixed-size is
    * the standard feature-extraction shape; it also bounds oracle cost). */
  val ThumbW = 64
  val ThumbH = 48

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

  /** Tile `src` into a w×h 8-bit grayscale raster:
    * `pixel(x,y) = src[(y·w+x) mod len]` (zeros for an empty source). This
    * is the closed-form source image — both the PNG encoder input and the
    * oracle's replayable definition of the decoded pixels. */
  private[ops] def tileRaster(src: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (src.length > 0) {
      var i = 0
      while (i < out.length) { out(i) = src(i % src.length); i += 1 }
    }
    out
  }

  /** REAL image encode of an 8-bit grayscale raster via `javax.imageio`
    * (`format`: "png" for compressed thumbs, "bmp" for large rasters —
    * PNG's deflate costs ~10x BMP's memcpy at full frame size and the
    * codec-path proof is identical). */
  private[ops] def imgEncode(raster: Array[Byte], w: Int, h: Int, format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, raster)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** REAL image decode via `javax.imageio` (container sniffed from the
    * bytes) → (8-bit grayscale pixels, w, h). */
  private[ops] def imgDecode(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](w * h)
    img.getRaster.getDataElements(0, 0, w, h, out)
    (out, w, h)
  }

  private[ops] def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Byte-histogram feature vector: `feat(j) = |{i : b_i mod 8 = j}| / n`.
    * Doubles (not floats) so the gate's select-time `round(·, 4)` sees the
    * same raw ratio DuckDB computes. */
  private[ops] def histFeatures(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Long](FeatureDim)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % FeatureDim) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    hist.map(_ / n)
  }

  /** Batched feature extraction over the binary column. One pass per
    * partition, no shuffle; output schema
    * (doc_id, modality, byte_len, checksum, feat: array<double>).
    * Image rows run the REAL decode (PNG roundtrip at [[ThumbW]]×[[ThumbH]])
    * and hash/featurize the DECODED pixels — a broken decoder fails the
    * driver gate, not just a spec. Audio/video rows featurize payload bytes
    * directly (stub decode, documented above). */
  def extractFeatures(assetDf: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[(Long, String, Array[Byte])]
    val outEnc = Encoders.product[(Long, String, Int, String, Array[Double])]
    assetDf.select(col("doc_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point (an FFI decoder would open its context here)
        it.map { case (id, modality, payload) =>
          val px =
            if (modality == "image")
              imgDecode(imgEncode(tileRaster(payload, ThumbW, ThumbH), ThumbW, ThumbH))._1
            else payload
          (id, modality, payload.length, md5hex(px), histFeatures(px))
        }
      }(outEnc)
      .toDF("doc_id", "modality", "byte_len", "checksum", "feat")
  }

  /** Closed-form nearest-neighbor resize over the VIRTUAL raster
    * `pixel(x,y) = payload[(y·w+x) mod len]` — the spec's independent
    * reference for [[resizeImages]] (which must agree because the PNG
    * roundtrip is lossless). */
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

  /** Nearest-neighbor resample of a fully materialized w×h raster. */
  private[ops] def nnResizeRaster(raster: Array[Byte], w: Int, h: Int, tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th)
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        out(y * tw + x) = raster(sy * w + x * w / tw)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize the image-modality assets to `tw`×`th`; per-partition batch, no
    * shuffle, metadata-sized source. The source image is materialized as a
    * REAL PNG and decoded back through `javax.imageio` before resampling —
    * the pixel math runs on decoded pixels, not on the virtual raster. */
  def resizeImages(assetDf: DataFrame, tw: Int = 32, th: Int = 24): DataFrame = {
    implicit val enc = Encoders.product[(Long, Array[Byte], Int, Int)]
    val outEnc = Encoders.product[(Long, Int, Int, Array[Byte])]
    val slots = assetDf.sparkSession.sparkContext.defaultParallelism
    assetDf.filter(col("modality") === "image")
      .select(col("doc_id"), col("payload"), col("meta.width"), col("meta.height"))
      // the codec kernel is CPU-heavy (~ms per full frame) while the input
      // rows are tiny (text payloads), so a small-row shuffle that spreads
      // the decode over every core wins at any scale — a small parquet
      // otherwise arrives as ONE partition and serializes the whole job
      .repartition(slots)
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions(_.map { case (id, payload, w, h) =>
        // full-frame rasters go through BMP: same real ImageIO decode, no
        // deflate bill (PNG at these sizes measured ~4s of bench time)
        val (px, dw, dh) = imgDecode(imgEncode(tileRaster(payload, w, h), w, h, "bmp"))
        (id, tw, th, nnResizeRaster(px, dw, dh, tw, th))
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
    * oracle-exact; byte-level resize math is spec'd against the closed-form
    * reference in ExtensionOpsSpec. */
  def modalResize(spark: SparkSession, dir: String): DataFrame =
    resizeImages(assets(t(spark, dir, "documents")))
      .select(col("doc_id"), col("out_w"), col("out_h"),
        octet_length(col("payload")).cast(LongType).as("byte_len"))

  def modalResizeOracleSql: String =
    """SELECT doc_id, CAST(32 AS INT) AS out_w, CAST(24 AS INT) AS out_h,
      | CAST(768 AS BIGINT) AS byte_len
      |FROM documents WHERE doc_id % 3 = 0""".stripMargin

  /** Frame sampling as a gated query: the sampled frame index set and frame
    * sizes are oracle-exact; frame byte content is spec'd in
    * ExtensionOpsSpec. */
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

  /** Full decode pipeline as a gated query: for image rows the checksum and
    * f0 come from pixels that went through a REAL `javax.imageio` decode, so
    * the hash gate itself proves the codec path; the oracle replays them
    * from the closed-form tiled raster (PNG grayscale is lossless). */
  def modalFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(assets(t(spark, dir, "documents")))
      .select(col("doc_id"), col("modality"), col("byte_len").cast(LongType).as("byte_len"),
        col("checksum"),
        round(element_at(col("feat"), 1), 4).as("f0"))

  /** DuckDB twin of [[modalFeatures]]: image rows rebuild the 64×48 tiled
    * raster (≡ the losslessly decoded PNG pixels) as a string — safe because
    * the documents are printable ASCII, so char positions are byte
    * positions — and replay md5 + the mod-8 histogram ratio; audio/video
    * rows hash/featurize the payload directly, mirroring the stub. */
  def modalFeaturesOracleSql: String =
    s"""WITH d AS (SELECT doc_id,
       |        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       |        text, octet_length(encode(text)) AS byte_len FROM documents),
       | r AS (SELECT doc_id, modality, byte_len,
       |        CASE WHEN modality = 'image'
       |             THEN substr(repeat(text, CAST(ceil(${ThumbW * ThumbH}.0 / length(text)) AS INT)), 1, ${ThumbW * ThumbH})
       |             ELSE text END AS raster FROM d)
       |SELECT doc_id, modality, byte_len, md5(raster) AS checksum,
       | round(CAST(len(list_filter(range(1, length(raster) + 1),
       |                            i -> ord(substr(raster, CAST(i AS INT), 1)) % 8 = 0)) AS DOUBLE)
       |       / length(raster), 4) AS f0
       |FROM r""".stripMargin

  // ---------------- REAL audio codec path (WAV / javax.sound) ----------------

  /** Deterministic PCM16 waveform for doc `id`: `n = 400 + (id mod 97)·8`
    * samples, `s_i = ((id·7919 + i·104729) mod 65536) − 32768` — closed
    * form, so the oracle replays the DECODED samples without a dump
    * (WAV PCM16 is lossless, the m2 argument exactly). */
  private[ops] def synthSamples(id: Long): Array[Short] = {
    val n = (400 + (id % 97) * 8).toInt
    Array.tabulate(n)(i => (((id * 7919 + i.toLong * 104729) % 65536) - 32768).toShort)
  }

  val AudioRate = 16000f

  /** REAL WAV encode via `javax.sound.sampled` (RIFF container, PCM16 LE
    * mono) — the JDK's audio codec, same ships-with-the-JDK status as
    * ImageIO. */
  private[ops] def wavEncode(samples: Array[Short], rate: Float = AudioRate): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(rate, 16, 1, true, false) // signed, little-endian
    val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(pcm.putShort)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL WAV decode: parse the RIFF container, return the PCM16 samples
    * plus the HEADER-declared format (rate, channels, bits) — emitting the
    * parsed fields is what proves the container really was read. */
  private[ops] def wavDecode(bytes: Array[Byte]): (Array[Short], Int, Int, Int) = {
    import javax.sound.sampled.AudioSystem
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    val raw = ais.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(raw).order(
      if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Short](raw.length / 2)
    var i = 0
    while (i < out.length) { out(i) = bb.getShort(); i += 1 }
    (out, fmt.getSampleRate.toInt, fmt.getChannels, fmt.getSampleSizeInBits)
  }

  /** Audio feature extraction through a REAL codec roundtrip: per document,
    * synthesize the closed-form waveform, encode it to an actual WAV file
    * with the JDK encoder, decode it back (container parse + PCM read), and
    * featurize the DECODED samples — integer-exact aggregates (peak,
    * energy, zero crossings) plus an RMS, so a broken encoder, parser, or
    * byte-order handling fails the driver's hash gate, not just a spec.
    * Row-local mapPartitions, zero shuffle — the m2 shape for audio. */
  def modalAudio(spark: SparkSession, dir: String): DataFrame = {
    implicit val inEnc = Encoders.scalaLong
    val outEnc = Encoders.product[(Long, Int, Int, Int, Long, Long, Long, Long, Double)]
    t(spark, dir, "documents").select(col("doc_id")).as[Long](inEnc)
      .mapPartitions { it =>
        it.map { id =>
          val (smp, sr, ch, bits) = wavDecode(wavEncode(synthSamples(id)))
          var sumSq = 0L
          var peak = 0L
          var zeroX = 0L
          var i = 0
          while (i < smp.length) {
            val s = smp(i).toLong
            sumSq += s * s
            if (math.abs(s) > peak) peak = math.abs(s)
            if (i > 0 && ((s < 0) != (smp(i - 1) < 0))) zeroX += 1
            i += 1
          }
          (id, sr, ch, bits, smp.length.toLong, peak, sumSq, zeroX,
            math.sqrt(sumSq.toDouble / smp.length))
        }
      }(outEnc)
      .toDF("doc_id", "sr", "ch", "bits", "n_samples", "peak", "sum_sq", "zero_x", "rms")
      // HALF_UP like every gated rounding (kernel emits the raw double)
      .withColumn("rms", round(col("rms"), 4))
  }

  /** DuckDB oracle twin of [[modalAudio]]: replays the closed-form
    * synthesis and the same integer aggregates — it can only match if the
    * engine's WAV roundtrip returned the samples bit-exactly and the
    * parsed header carried (16000 Hz, mono, 16-bit). */
  def modalAudioOracleSql: String =
    s"""WITH d AS (SELECT doc_id, 400 + (doc_id % 97) * 8 AS n FROM documents),
       | s AS (SELECT doc_id, n,
       |        [ ((doc_id * 7919 + i * 104729) % 65536) - 32768 FOR i IN range(0, CAST(n AS BIGINT)) ] AS smp
       |       FROM d)
       |SELECT doc_id, 16000 AS sr, 1 AS ch, 16 AS bits,
       | CAST(n AS BIGINT) AS n_samples,
       | CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak,
       | CAST(list_sum(list_transform(smp, x -> x * x)) AS BIGINT) AS sum_sq,
       | CAST(len(list_filter(range(2, CAST(n AS BIGINT) + 1),
       |                      i -> (smp[CAST(i AS INT)] < 0) <> (smp[CAST(i AS INT) - 1] < 0))) AS BIGINT) AS zero_x,
       | round(sqrt(CAST(list_sum(list_transform(smp, x -> x * x)) AS DOUBLE) / n), 4) AS rms
       |FROM s""".stripMargin
}
