package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Dataset metadata: the neuroglancer-"precomputed" `info` JSON schema.
  *
  * Mirrors the reference's `Info`/`InfoScale` model
  * (reference: src/Infos.jl:33-40, 185-196) as immutable case classes with a
  * JSON codec, mip-pyramid derivation (reference: src/Infos.jl:169-178) and
  * the 4-d channel-widening rules (reference: src/Infos.jl:371-394).
  */
object Meta {

  /** Element type of the stored array. Spark has no unsigned integer types,
    * so the voxel view widens each storage type losslessly: u8→Short,
    * u16→Int, u32→Long, u64→Decimal(20,0), f32→Float, f64→Double,
    * bool→Boolean (see graft.volume.Volume.widenedType).
    * (reference DATATYPE_MAP: src/Infos.jl:6-14)
    */
  sealed abstract class VoxelType(val name: String, val byteSize: Int)
  case object TBool extends VoxelType("bool", 1)
  case object TUInt8 extends VoxelType("uint8", 1)
  case object TUInt16 extends VoxelType("uint16", 2)
  case object TUInt32 extends VoxelType("uint32", 4)
  case object TUInt64 extends VoxelType("uint64", 8)
  case object TFloat32 extends VoxelType("float32", 4)
  case object TFloat64 extends VoxelType("float64", 8)

  object VoxelType {
    val all: Seq[VoxelType] = Seq(TBool, TUInt8, TUInt16, TUInt32, TUInt64, TFloat32, TFloat64)
    def fromName(s: String): VoxelType =
      all.find(_.name == s).getOrElse(throw new IllegalArgumentException(s"unknown data_type: $s"))
  }

  /** One mip level (reference `InfoScale`, src/Infos.jl:33-40).
    * Exactly one chunk size per scale is supported, like the reference
    * (src/Infos.jl:106-108). Coordinates are 0-based voxel offsets as stored
    * in the JSON. */
  final case class ScaleMeta(
      key: String,
      chunkSize: (Int, Int, Int),
      encoding: String,
      resolution: (Double, Double, Double),
      size: (Int, Int, Int),
      voxelOffset: (Int, Int, Int)) {

    /** Physical extent as a 1-based inclusive box: offset+1 .. offset+size
      * (reference: src/type.jl:152-159). */
    def volumeBox: Grid.Box = Grid.Box(
      Grid.Ival(voxelOffset._1 + 1, voxelOffset._1 + size._1),
      Grid.Ival(voxelOffset._2 + 1, voxelOffset._2 + size._2),
      Grid.Ival(voxelOffset._3 + 1, voxelOffset._3 + size._3))

    /** Next mip level: 2x resolution in x/y only, size/offset halved in x/y,
      * same chunk size and encoding (reference: src/Infos.jl:169-178). */
    def nextMip: ScaleMeta = {
      val res = (resolution._1 * 2.0, resolution._2 * 2.0, resolution._3)
      ScaleMeta(
        key = s"${res._1.round}_${res._2.round}_${res._3.round}",
        chunkSize = chunkSize,
        encoding = encoding,
        resolution = res,
        size = (size._1 / 2, size._2 / 2, size._3),
        voxelOffset = (voxelOffset._1 / 2, voxelOffset._2 / 2, voxelOffset._3))
    }
  }

  /** Whole-dataset metadata (reference `Info`, src/Infos.jl:185-196). */
  final case class VolumeMeta(
      layerType: String, // "image" | "segmentation"
      dataType: VoxelType,
      numChannels: Int,
      scales: Vector[ScaleMeta],
      mesh: String = "",
      skeletons: String = "") {

    require(layerType == "image" || layerType == "segmentation",
      s"layer type must be image or segmentation, got $layerType") // reference: src/Infos.jl:208

    /** mip is 1-based like the reference (src/type.jl:23-24). */
    def scale(mip: Int): ScaleMeta = scales(mip - 1)

    /** 3 when single-channel, 4 otherwise (reference: src/Infos.jl:350-357). */
    def ndims: Int = if (numChannels == 1) 3 else 4

    /** Per-mip properties widened to 4-d when channels > 1: chunk/volume size
      * get numChannels appended, offset gets 0
      * (reference: src/Infos.jl:371-394). Kept 3-d here; channel count is
      * carried separately — each chunk blob holds all channels. */
    def chunkVoxels(mip: Int): Long = {
      val c = scale(mip).chunkSize
      c._1.toLong * c._2 * c._3 * numChannels
    }

    def chunkBytes(mip: Int): Long = chunkVoxels(mip) * dataType.byteSize

    def withNumMips(n: Int): VolumeMeta = {
      val more = Iterator.iterate(scales.last)(_.nextMip).drop(1).take(n - scales.length)
      copy(scales = scales ++ more)
    }
  }

  // ------------------------------------------------------------------
  // JSON codec (the on-store `info` object; reference: src/Infos.jl:234-293)
  // ------------------------------------------------------------------

  def parse(jsonStr: String): VolumeMeta = {
    val j = JsonMethods.parse(jsonStr)
    def str(v: JValue, default: String = ""): String = v match {
      case JString(s) => s
      case _ => default
    }
    def ints(v: JValue): List[Int] = v match {
      case JArray(xs) => xs.map {
        case JInt(i) => i.toInt
        case JDouble(d) => d.toInt
        case other => throw new IllegalArgumentException(s"bad int in info: $other")
      }
      case _ => Nil
    }
    def dbls(v: JValue): List[Double] = v match {
      case JArray(xs) => xs.map {
        case JInt(i) => i.toDouble
        case JDouble(d) => d
        case other => throw new IllegalArgumentException(s"bad double in info: $other")
      }
      case _ => Nil
    }
    val scales = (j \ "scales") match {
      case JArray(ss) => ss.toVector.map { s =>
        val chunkSizes = (s \ "chunk_sizes") match {
          case JArray(cs) => cs.map(ints)
          case _ => Nil
        }
        require(chunkSizes.length == 1, "exactly one chunk size per scale") // src/Infos.jl:106-108
        val List(cx, cy, cz) = chunkSizes.head
        val List(rx, ry, rz) = dbls(s \ "resolution")
        val List(sx, sy, sz) = ints(s \ "size")
        val off = ints(s \ "voxel_offset") match {
          case List(a, b, c) => (a, b, c)
          case Nil => (0, 0, 0)
          case other => throw new IllegalArgumentException(s"bad voxel_offset: $other")
        }
        ScaleMeta(str(s \ "key"), (cx, cy, cz), str(s \ "encoding", "raw"),
          (rx, ry, rz), (sx, sy, sz), off)
      }
      case _ => Vector.empty
    }
    VolumeMeta(
      layerType = str(j \ "type", "image"),
      dataType = VoxelType.fromName(str(j \ "data_type", "uint8")),
      numChannels = (j \ "num_channels") match {
        case JInt(i) => i.toInt
        case _ => 1
      },
      scales = scales,
      mesh = str(j \ "mesh"),
      skeletons = str(j \ "skeletons"))
  }

  def toJson(m: VolumeMeta): String = {
    def scaleJ(s: ScaleMeta): JObject = JObject(
      "key" -> JString(s.key),
      "chunk_sizes" -> JArray(List(JArray(List(s.chunkSize._1, s.chunkSize._2, s.chunkSize._3).map(JInt(_))))),
      "encoding" -> JString(s.encoding),
      "resolution" -> JArray(List(s.resolution._1, s.resolution._2, s.resolution._3).map(JDouble(_))),
      "size" -> JArray(List(s.size._1, s.size._2, s.size._3).map(JInt(_))),
      "voxel_offset" -> JArray(List(s.voxelOffset._1, s.voxelOffset._2, s.voxelOffset._3).map(JInt(_))))
    val obj = JObject(
      "num_channels" -> JInt(m.numChannels),
      "type" -> JString(m.layerType),
      "data_type" -> JString(m.dataType.name),
      "scales" -> JArray(m.scales.toList.map(scaleJ)),
      "mesh" -> JString(m.mesh),
      "skeletons" -> JString(m.skeletons))
    JsonMethods.compact(JsonMethods.render(obj))
  }
}
