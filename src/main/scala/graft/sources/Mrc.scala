package graft.sources

import org.apache.spark.sql.SparkSession

import graft.core.{MrcFormat, Meta}
import graft.core.Meta.{ScaleMeta, VolumeMeta, VoxelType}
import graft.volume.{ChunkStore, Volume, VoxelBuffer}

/** MRC2014 single-file volumes on the shared Volume engine — the sixth
  * storage format (precomputed, zarr v2/v3+sharded, N5, TIFF stacks, MRC):
  * the dense container electron-microscopy acquisitions ship in. The data
  * section is x-fastest little-endian — byte-identical to this engine's
  * chunk layout — so the chunk grid is `(nx, ny, 1)` (every chunk IS a
  * z-plane) and each fetch is ONE computed ranged GET of `planeBytes` at
  * `dataOffset + plane·planeBytes`: a cutout of k planes costs exactly k
  * Range requests against the one object, never a whole-file download
  * (MrcSpec pins the read amplification via the rangeTrace hook).
  *
  * Read-only through the chunk engine (a dense container has no
  * chunk-grain write — mirroring the reference's jpeg decode-only parity,
  * K5); [[write]] is the single-pass export, and the a35 pipeline
  * demonstrates MRC → precomputed conversion through
  * [[graft.ops.VolumeOps.rechunk]] for stores that need writable chunks. */
object Mrc {

  private def split(path: String): (String, String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (Option(p.getParent).map(_.toString).getOrElse("/"), p.getName)
  }

  private def volumeMetaOf(g: MrcFormat.Geometry): VolumeMeta =
    VolumeMeta("image", g.dataType, 1, Vector(ScaleMeta(
      key = "", chunkSize = (g.nx, g.ny, 1), encoding = "identity",
      resolution = (1.0, 1.0, 1.0), size = (g.nx, g.ny, g.nz), voxelOffset = (0, 0, 0))))

  /** Open an existing `.mrc` file: ONE ranged GET of the fixed header for
    * geometry, dtype, and the extended-header size. */
  def open(spark: SparkSession, path: String): Volume = {
    val (root, name) = split(path)
    val fs = ChunkStore.fs(root, spark.sessionState.newHadoopConf())
    val g = MrcFormat.parseHeader(
      ChunkStore.readRange(fs, root, name, 0, MrcFormat.HeaderBytes))
    new Volume(spark, root, volumeMetaOf(g), mip = 1, fillMissing = true,
      keyStyle = "mrc-z", mrc = Some(MrcFormat.Params(name, g.dataOffset)))
  }

  /** Export a buffer as a fresh MRC file — header + the buffer's bytes,
    * which are ALREADY the MRC data section (x-fastest little-endian), so
    * the export is one sequential write with zero reordering. The buffer
    * must cover the full volume from (1,1,1) (a dense container has no
    * holes to leave); driver-grain like the capped cutout API — convert
    * through `VolumeOps.rechunk` for distributed re-layout instead. */
  def write(spark: SparkSession, path: String, buf: VoxelBuffer): Unit = {
    require(buf.nc == 1, s"mrc: single-channel only (got ${buf.nc})")
    require(buf.origin == ((1, 1, 1)),
      s"mrc: the export buffer must start at (1,1,1), got ${buf.origin}")
    val (root, name) = split(path)
    val fs = ChunkStore.fs(root, spark.sessionState.newHadoopConf())
    val hdr = MrcFormat.header(buf.sx, buf.sy, buf.sz, buf.dataType)
    ChunkStore.write(fs, root, name, hdr ++ buf.bytes)
  }
}
