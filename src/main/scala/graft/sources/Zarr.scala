package graft.sources

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{Codec, Meta}
import graft.core.Meta.{ScaleMeta, VolumeMeta, VoxelType}
import graft.volume.{ChunkStore, Volume}

/** Zarr v2 array support — a second public chunked-array format alongside
  * "precomputed", reusing the whole Volume engine (cutout/ingest/toVoxels/
  * voxels()/missingChunks) through two format knobs:
  *
  *  - **axis order / memory layout**: zarr bytes are C-order over dims
  *    `[d0, d1, d2]` (last dim fastest) by default. Naming `d2→x, d1→y,
  *    d0→z` makes C-order bytes exactly this engine's x-fastest layout, so
  *    chunks need NO transpose — only the chunk KEY uses zarr's dim order
  *    (`"z.y.x"` 0-based indices; `keyStyle = "zarr-c"`). `order: "F"`
  *    means d0-fastest: naming `d0→x` again matches, with `"x.y.z"` keys
  *    (`keyStyle = "zarr-f"`).
  *  - **edge chunks**: zarr stores every chunk FULL-SIZE, padded with the
  *    fill value past the array edge (`padEdgeChunks = true`), where
  *    precomputed clamps boundary chunks.
  *
  * Supported: zarr_format 2, 2-d or 3-d arrays, dtypes
  * {bool, u1, u2, u4, u8, f4, f8} little-endian, `fill_value` 0/null,
  * no filters, compressor null / zlib / blosc-with-blosclz (the pure-JVM
  * codecs of this engine). Anything else fails loudly with the offending
  * field. The `.zarray` document rides the same store as the chunks, like
  * precomputed's `info`.
  */
object Zarr {

  /** Parsed `.zarray` plus the axis mapping chosen from `order`. */
  final case class ZarrayMeta(
      shape: (Int, Int, Int), // (x, y, z) after axis mapping
      chunks: (Int, Int, Int),
      dataType: VoxelType,
      encoding: String, // this engine's codec name
      keyStyle: String) // zarr-c | zarr-f

  private def dtypeOf(code: String): VoxelType = {
    // numpy typestr: byte order ('<' little, '|' none), kind, size
    val norm = code match {
      case c if c.startsWith("<") || c.startsWith("|") => c.drop(1)
      case c if c.startsWith(">") =>
        throw new IllegalArgumentException(s"zarr: big-endian dtype $c unsupported")
      case c => c
    }
    norm match {
      case "b1" => Meta.TBool
      case "u1" => Meta.TUInt8
      case "u2" => Meta.TUInt16
      case "u4" => Meta.TUInt32
      case "u8" => Meta.TUInt64
      case "f4" => Meta.TFloat32
      case "f8" => Meta.TFloat64
      case other => throw new IllegalArgumentException(s"zarr: unsupported dtype $code ($other)")
    }
  }

  private def encodingOf(compressor: JValue): String = compressor match {
    case JNull | JNothing => "identity"
    case JObject(fields) =>
      val m = fields.toMap
      m.get("id").collect { case JString(s) => s } match {
        case Some("zlib") => "zlib"
        case Some("blosc") =>
          m.get("cname").collect { case JString(s) => s } match {
            case Some("blosclz") | None => "blosclz"
            case Some(other) => throw new IllegalArgumentException(
              s"zarr: blosc cname '$other' unsupported (only blosclz has a pure-JVM codec here)")
          }
        case Some(other) => throw new IllegalArgumentException(s"zarr: compressor '$other' unsupported")
        case None => throw new IllegalArgumentException("zarr: compressor object without id")
      }
    case other => throw new IllegalArgumentException(s"zarr: malformed compressor $other")
  }

  def parseZarray(jsonStr: String): ZarrayMeta = {
    val j = JsonMethods.parse(jsonStr)
    def ints(v: JValue, what: String): List[Int] = v match {
      case JArray(xs) => xs.map {
        case JInt(i) => i.toInt
        case other => throw new IllegalArgumentException(s"zarr: non-integer in $what: $other")
      }
      case _ => throw new IllegalArgumentException(s"zarr: missing $what")
    }
    (j \ "zarr_format") match {
      case JInt(v) if v == 2 => ()
      case other => throw new IllegalArgumentException(s"zarr: zarr_format must be 2, got $other")
    }
    (j \ "filters") match {
      case JNull | JNothing | JArray(Nil) => ()
      case other => throw new IllegalArgumentException(s"zarr: filters unsupported: $other")
    }
    (j \ "fill_value") match {
      case JNull | JNothing => ()
      case JInt(v) if v == BigInt(0) => ()
      case JDouble(0.0) => ()
      case other => throw new IllegalArgumentException(s"zarr: only fill_value 0/null supported, got $other")
    }
    val dims = ints(j \ "shape", "shape")
    val cdims = ints(j \ "chunks", "chunks")
    require(dims.length == cdims.length, "zarr: shape/chunks rank mismatch")
    require(dims.length == 2 || dims.length == 3, s"zarr: rank ${dims.length} unsupported (2-d/3-d only)")
    val order = (j \ "order") match {
      case JString(s) => s
      case _ => "C"
    }
    val dt = (j \ "dtype") match {
      case JString(s) => dtypeOf(s)
      case other => throw new IllegalArgumentException(s"zarr: missing dtype: $other")
    }
    val enc = encodingOf(j \ "compressor")
    val rank = dims.length
    (order, rank) match {
      // C: last dim fastest → x = last dim; keys keep zarr dim order
      case ("C", 3) => ZarrayMeta((dims(2), dims(1), dims(0)),
        (cdims(2), cdims(1), cdims(0)), dt, enc, "zarr-c")
      case ("C", 2) => ZarrayMeta((dims(1), dims(0), 1),
        (cdims(1), cdims(0), 1), dt, enc, "zarr-c2")
      // F: first dim fastest → x = first dim
      case ("F", 3) => ZarrayMeta((dims(0), dims(1), dims(2)),
        (cdims(0), cdims(1), cdims(2)), dt, enc, "zarr-f")
      case ("F", 2) => ZarrayMeta((dims(0), dims(1), 1),
        (cdims(0), cdims(1), 1), dt, enc, "zarr-f2")
      case (other, _) => throw new IllegalArgumentException(s"zarr: order '$other' unsupported")
    }
  }

  /** Serialize array metadata back to a `.zarray` document (3-d only —
    * 2-d stores are read-supported). */
  def toZarrayJson(m: ZarrayMeta): String = {
    val (shape, chunks) = m.keyStyle match {
      case "zarr-c" => (List(m.shape._3, m.shape._2, m.shape._1),
        List(m.chunks._3, m.chunks._2, m.chunks._1))
      case "zarr-f" => (List(m.shape._1, m.shape._2, m.shape._3),
        List(m.chunks._1, m.chunks._2, m.chunks._3))
      case other => throw new IllegalArgumentException(s"zarr: cannot serialize key style $other")
    }
    val dtype = m.dataType match {
      case Meta.TBool => "|b1"
      case Meta.TUInt8 => "|u1"
      case Meta.TUInt16 => "<u2"
      case Meta.TUInt32 => "<u4"
      case Meta.TUInt64 => "<u8"
      case Meta.TFloat32 => "<f4"
      case Meta.TFloat64 => "<f8"
    }
    val compressor = m.encoding match {
      case "identity" => JNull
      case "zlib" => JObject("id" -> JString("zlib"), "level" -> JInt(6))
      case "blosclz" => JObject("id" -> JString("blosc"), "cname" -> JString("blosclz"),
        "clevel" -> JInt(5), "shuffle" -> JInt(if (m.dataType.byteSize > 1) 1 else 0))
      case other => throw new IllegalArgumentException(s"zarr: cannot serialize encoding $other")
    }
    val obj = JObject(
      "zarr_format" -> JInt(2),
      "shape" -> JArray(shape.map(JInt(_))),
      "chunks" -> JArray(chunks.map(JInt(_))),
      "dtype" -> JString(dtype),
      "order" -> JString(if (m.keyStyle == "zarr-c") "C" else "F"),
      "compressor" -> compressor,
      "fill_value" -> JInt(0),
      "filters" -> JNull)
    JsonMethods.compact(JsonMethods.render(obj))
  }

  private def volumeMetaOf(z: ZarrayMeta): VolumeMeta =
    VolumeMeta("image", z.dataType, 1, Vector(ScaleMeta(
      key = "", chunkSize = z.chunks, encoding = z.encoding,
      resolution = (1.0, 1.0, 1.0), size = z.shape, voxelOffset = (0, 0, 0))))

  /** Open a zarr v2 array as a [[Volume]] (full engine surface). */
  def open(spark: SparkSession, root: String, fillMissing: Boolean = true): Volume = {
    val fs = ChunkStore.fs(root, spark.sessionState.newHadoopConf())
    val z = parseZarray(new String(ChunkStore.read(fs, root, ".zarray"), "UTF-8"))
    new Volume(spark, root, volumeMetaOf(z), mip = 1, fillMissing = fillMissing,
      keyStyle = z.keyStyle, padEdgeChunks = true)
  }

  /** Create a new zarr v2 array: write `.zarray`, return the handle. */
  def create(spark: SparkSession, root: String, shape: (Int, Int, Int),
      chunks: (Int, Int, Int), dataType: VoxelType, encoding: String = "zlib",
      fillMissing: Boolean = true): Volume = {
    val z = ZarrayMeta(shape, chunks, dataType, encoding, "zarr-c")
    val fs = ChunkStore.fs(root, spark.sessionState.newHadoopConf())
    ChunkStore.write(fs, root, ".zarray", toZarrayJson(z).getBytes("UTF-8"))
    new Volume(spark, root, volumeMetaOf(z), mip = 1, fillMissing = fillMissing,
      keyStyle = z.keyStyle, padEdgeChunks = true)
  }
}
