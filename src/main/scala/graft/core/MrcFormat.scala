package graft.core

import java.nio.{ByteBuffer, ByteOrder}

import graft.core.Meta.VoxelType

/** MRC2014 container codec — the electron-microscopy interchange format the
  * reference's domain receives raw acquisitions in (the CCP-EM/IMOD "MRC/CCP4
  * map" layout: a fixed 1024-byte little-endian header, an optional extended
  * header of `nsymbt` bytes, then voxels x-fastest, then y, then z). The data
  * section's axis order and endianness are EXACTLY this engine's chunk
  * layout (column-major x-fastest little-endian), so an MRC file is a dense
  * single-object volume whose z-planes are contiguous byte ranges — each
  * full-XY-plane chunk maps to ONE ranged GET with zero pixel reordering.
  *
  * Pure header math lives here (shared by driver-side open/export and the
  * executor-side fetch path); the Spark-facing handle is
  * [[graft.sources.Mrc]].
  *
  * Mode support: 0 (8-bit — read as this engine's uint8; MRC2014 defines
  * mode 0 as signed with an IMOD-stamp unsigned convention, and the BYTES
  * move through unreinterpreted either way), 2 (float32), 6 (uint16).
  * Signed 16-bit (mode 1) and the packed/complex modes fail loudly.
  * Big-endian files (MACHST != little-endian stamp) fail loudly at open. */
object MrcFormat {

  val HeaderBytes = 1024

  /** Everything the executor fetch path needs to address a plane. */
  final case class Params(fileName: String, dataOffset: Long)

  def modeOf(dt: VoxelType): Int = dt match {
    case Meta.TUInt8 => 0
    case Meta.TFloat32 => 2
    case Meta.TUInt16 => 6
    case other => throw new IllegalArgumentException(
      s"mrc: voxel type $other has no MRC2014 mode (uint8/float32/uint16 only)")
  }

  def typeOfMode(mode: Int): VoxelType = mode match {
    case 0 => Meta.TUInt8
    case 2 => Meta.TFloat32
    case 6 => Meta.TUInt16
    case 1 => throw new IllegalArgumentException(
      "mrc: mode 1 (signed int16) unsupported — this engine carries uint16 (mode 6)")
    case other => throw new IllegalArgumentException(s"mrc: mode $other unsupported")
  }

  /** Serialize a fresh MRC2014 header for an `nx×ny×nz` volume of `dt`
    * voxels: cell = voxel grid at unit spacing, axis mapping (1,2,3),
    * density stats left in the spec's "undetermined" convention
    * (dmin > dmax, rms < 0), NVERSION 20140, little-endian MACHST. */
  def header(nx: Int, ny: Int, nz: Int, dt: VoxelType): Array[Byte] = {
    require(nx > 0 && ny > 0 && nz > 0, s"mrc: bad dims ($nx,$ny,$nz)")
    val b = ByteBuffer.allocate(HeaderBytes).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(nx).putInt(ny).putInt(nz)
    b.putInt(modeOf(dt))
    b.putInt(0).putInt(0).putInt(0)       // nxstart, nystart, nzstart
    b.putInt(nx).putInt(ny).putInt(nz)    // mx, my, mz (sampling = grid)
    b.putFloat(nx.toFloat).putFloat(ny.toFloat).putFloat(nz.toFloat) // cella (Å)
    b.putFloat(90f).putFloat(90f).putFloat(90f)                      // cellb
    b.putInt(1).putInt(2).putInt(3)       // mapc, mapr, maps (x, y, z)
    b.putFloat(0f).putFloat(-1f).putFloat(-2f) // dmin > dmax: stats unset
    b.putInt(1)                           // ispg: 3-d volume
    b.putInt(0)                           // nsymbt: no extended header
    b.position(104)                       // words 25-26 reserved (zeros)
    b.put("MRCO".getBytes("US-ASCII"))    // EXTTYP (word 27)
    b.putInt(20140)                       // NVERSION (word 28)
    b.position(196)
    b.putFloat(0f).putFloat(0f).putFloat(0f) // origin
    b.put("MAP ".getBytes("US-ASCII"))    // format magic (word 53)
    b.put(Array[Byte](0x44, 0x44, 0, 0)) // MACHST: little-endian stamp
    b.putFloat(-1f)                       // rms: unset
    b.putInt(0)                           // nlabl
    b.array()
  }

  /** Parsed geometry of an MRC header: dims, voxel type, data offset. */
  final case class Geometry(nx: Int, ny: Int, nz: Int, dataType: VoxelType, dataOffset: Long)

  /** Parse + validate the fixed header: MAP magic, little-endian machine
    * stamp, supported mode; the data section starts after the extended
    * header (`1024 + nsymbt`). */
  def parseHeader(bytes: Array[Byte]): Geometry = {
    require(bytes.length >= HeaderBytes, s"mrc: header truncated (${bytes.length} bytes)")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new String(bytes.slice(208, 212), "US-ASCII")
    require(magic == "MAP ", s"mrc: bad format magic '$magic' (want 'MAP ')")
    // MACHST: 0x44 in the first byte marks little-endian (0x11 = big)
    require((bytes(212) & 0xFF) == 0x44,
      f"mrc: machine stamp 0x${bytes(212) & 0xFF}%02x is not little-endian (0x44) — " +
        "big-endian MRC files are unsupported")
    val nx = b.getInt(0); val ny = b.getInt(4); val nz = b.getInt(8)
    require(nx > 0 && ny > 0 && nz > 0, s"mrc: bad dims ($nx,$ny,$nz)")
    val mode = b.getInt(12)
    val nsymbt = b.getInt(92)
    require(nsymbt >= 0, s"mrc: negative extended header size $nsymbt")
    Geometry(nx, ny, nz, typeOfMode(mode), HeaderBytes.toLong + nsymbt)
  }
}
