package graft.sources

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.Meta
import graft.core.Meta.{ScaleMeta, VolumeMeta, VoxelType}
import graft.volume.{ChunkStore, Volume}

/** N5 array support — a third public chunked-array format alongside
  * "precomputed" and zarr v2, again reusing the whole Volume engine through
  * the format knobs plus one n5-specific transform pair:
  *
  *  - **axis order**: n5 is column-major (dimension 0 fastest), so naming
  *    `d0→x, d1→y, d2→z` makes n5 payload order exactly this engine's
  *    x-fastest layout — no transpose, mirroring the zarr-F mapping. Block
  *    keys are nested grid paths `"x/y/z"` (0-based).
  *  - **edge blocks are CLIPPED** (stored at their actual size), like
  *    precomputed and unlike zarr — `padEdgeChunks = false`.
  *  - **per-block header + endianness**: every block object starts with a
  *    big-endian header `{mode:u16 = 0, numDims:u16, dims:u32[numDims]}`
  *    carrying the clipped block size, and the payload VALUES are
  *    big-endian too (n5 serializes through java DataOutputStream). The
  *    engine's buffers are little-endian, so decode strips the header and
  *    byte-swaps per element; encode mirrors it. Both are row-local O(n)
  *    per chunk inside the same executor task that fetched it.
  *
  * Supported: 3-d datasets, dataTypes {uint8, uint16, uint32, uint64,
  * float32, float64}, compression `raw` and `gzip` (both the modern
  * `compression: {type: ...}` object and the legacy `compressionType`
  * string are read). Anything else fails loudly with the offending field.
  * The dataset `attributes.json` rides the same store as the blocks.
  */
object N5 {

  final case class N5Meta(
      shape: (Int, Int, Int), // (x, y, z) = n5 dims (d0, d1, d2)
      blockSize: (Int, Int, Int),
      dataType: VoxelType,
      encoding: String) // this engine's codec name: identity | gzip

  private val dtypes: Map[String, VoxelType] = Map(
    "uint8" -> Meta.TUInt8, "uint16" -> Meta.TUInt16, "uint32" -> Meta.TUInt32,
    "uint64" -> Meta.TUInt64, "float32" -> Meta.TFloat32, "float64" -> Meta.TFloat64)
  private val dtypeNames: Map[VoxelType, String] = dtypes.map(_.swap)

  def parseAttributes(jsonStr: String): N5Meta = {
    val j = JsonMethods.parse(jsonStr)
    def ints(v: JValue, what: String): List[Int] = v match {
      case JArray(xs) => xs.map {
        case JInt(i) => i.toInt
        case other => throw new IllegalArgumentException(s"n5: non-integer in $what: $other")
      }
      case _ => throw new IllegalArgumentException(s"n5: missing $what")
    }
    val dims = ints(j \ "dimensions", "dimensions")
    val bs = ints(j \ "blockSize", "blockSize")
    require(dims.length == 3 && bs.length == 3,
      s"n5: rank ${dims.length} unsupported (3-d only)")
    val dt = (j \ "dataType") match {
      case JString(s) => dtypes.getOrElse(s,
        throw new IllegalArgumentException(s"n5: unsupported dataType '$s'"))
      case other => throw new IllegalArgumentException(s"n5: missing dataType: $other")
    }
    val enc = (j \ "compression" \ "type", j \ "compressionType") match {
      case (JString("raw"), _) => "identity"
      case (JString("gzip"), _) => "gzip"
      case (JString(other), _) => throw new IllegalArgumentException(
        s"n5: compression '$other' unsupported (raw/gzip)")
      case (_, JString("raw")) => "identity"
      case (_, JString("gzip")) => "gzip"
      case (_, JString(other)) => throw new IllegalArgumentException(
        s"n5: compressionType '$other' unsupported (raw/gzip)")
      case _ => throw new IllegalArgumentException("n5: missing compression")
    }
    N5Meta((dims(0), dims(1), dims(2)), (bs(0), bs(1), bs(2)), dt, enc)
  }

  def toAttributesJson(m: N5Meta): String = {
    val obj = JObject(
      "dimensions" -> JArray(List(m.shape._1, m.shape._2, m.shape._3).map(JInt(_))),
      "blockSize" -> JArray(List(m.blockSize._1, m.blockSize._2, m.blockSize._3).map(JInt(_))),
      "dataType" -> JString(dtypeNames(m.dataType)),
      "compression" -> JObject("type" -> JString(m.encoding match {
        case "identity" => "raw"
        case "gzip" => "gzip"
        case other => throw new IllegalArgumentException(s"n5: cannot serialize encoding $other")
      })))
    JsonMethods.compact(JsonMethods.render(obj))
  }

  private def volumeMetaOf(m: N5Meta): VolumeMeta =
    VolumeMeta("image", m.dataType, 1, Vector(ScaleMeta(
      key = "", chunkSize = m.blockSize, encoding = m.encoding,
      resolution = (1.0, 1.0, 1.0), size = m.shape, voxelOffset = (0, 0, 0))))

  /** Open an n5 dataset as a [[Volume]] (full engine surface). */
  def open(spark: SparkSession, root: String, fillMissing: Boolean = true): Volume = {
    val fs = ChunkStore.fs(root, spark.sessionState.newHadoopConf())
    val m = parseAttributes(new String(ChunkStore.read(fs, root, "attributes.json"), "UTF-8"))
    new Volume(spark, root, volumeMetaOf(m), mip = 1, fillMissing = fillMissing,
      keyStyle = "n5", padEdgeChunks = false)
  }

  /** Create a new n5 dataset: write `attributes.json`, return the handle. */
  def create(spark: SparkSession, root: String, shape: (Int, Int, Int),
      blockSize: (Int, Int, Int), dataType: VoxelType, encoding: String = "gzip",
      fillMissing: Boolean = true): Volume = {
    val m = N5Meta(shape, blockSize, dataType, encoding)
    val fs = ChunkStore.fs(root, spark.sessionState.newHadoopConf())
    ChunkStore.write(fs, root, "attributes.json", toAttributesJson(m).getBytes("UTF-8"))
    new Volume(spark, root, volumeMetaOf(m), mip = 1, fillMissing = fillMissing,
      keyStyle = "n5", padEdgeChunks = false)
  }
}
