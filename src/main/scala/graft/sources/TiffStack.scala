package graft.sources

import org.apache.spark.sql.SparkSession

import graft.core.Meta
import graft.core.Meta.{ScaleMeta, VolumeMeta, VoxelType}
import graft.volume.{ChunkStore, Volume}

/** TIFF image-stack support — the classic microscopy/connectomics layout
  * the reference's domain ships raw data in: a directory of per-z-slice
  * grayscale TIFF images named `0000.tif`, `0001.tif`, …, each one full XY
  * plane. Fifth format on the shared Volume engine: the chunk grid is
  * `(W, H, 1)` so every chunk IS a slice, and the per-chunk codec is the
  * REAL TIFF container via `javax.imageio` (ships with the JDK; TIFF
  * plugin since JDK 9) — see the `"tiff-z"` branches of
  * [[graft.volume.VolumeCtx.decodeChunk]]/`encodeChunk`.
  *
  * A stack has NO metadata document — the slices are the metadata, which
  * is exactly how stack-reading tools treat such directories: `open`
  * LISTs the slice names for the depth and reads ONE slice header for
  * width/height/dtype. TIFF rows are top-down row-major = this engine's
  * x-fastest layout for a single plane, so pixels move with zero
  * reordering.
  *
  * Supported: 8-bit and 16-bit grayscale (TYPE_BYTE_GRAY /
  * TYPE_USHORT_GRAY — lossless, which keeps every gated readback
  * closed-form). Anything else fails loudly at decode. */
object TiffStack {

  // any digit count so nothing silently truncates the derived depth (relKey
  // zero-pads to 4 but emits 5+ digits naturally past slice 9999); open()
  // then VALIDATES each matched name against the canonical %04d spelling,
  // because the read path resolves only that spelling — an externally
  // produced stack with other padding must fail at open, not read zeros
  private val SliceRe = "^(\\d+)\\.tif$".r

  private def volumeMetaOf(w: Int, h: Int, depth: Int, dt: VoxelType): VolumeMeta =
    VolumeMeta("image", dt, 1, Vector(ScaleMeta(
      key = "", chunkSize = (w, h, 1), encoding = "identity",
      resolution = (1.0, 1.0, 1.0), size = (w, h, depth), voxelOffset = (0, 0, 0))))

  /** Open an existing stack: one LIST for the slice set (depth = highest
    * slice index + 1 — a sparse stack reads missing slices as zeros like
    * any missing chunk), one header read for geometry and dtype. */
  def open(spark: SparkSession, root: String, fillMissing: Boolean = true): Volume = {
    val fs = ChunkStore.fs(root, spark.sessionState.newHadoopConf())
    val slices = ChunkStore.globNames(fs, root, "", "*.tif")
      .flatMap { n => SliceRe.findFirstMatchIn(n).map(m => m.group(1).toInt -> n) }
      .toSeq.sortBy(_._1)
    require(slices.nonEmpty, s"tiff stack: no NNNN.tif slices under $root")
    // every subsequent READ resolves only the canonical zero-padded
    // spelling (VolumeCtx.relKey "tiff-z"), so an externally produced
    // stack with different padding would open fine here and then silently
    // read every voxel as zero under fillMissing — fail loudly instead
    val dups = slices.groupBy(_._1).filter(_._2.size > 1)
    require(dups.isEmpty, s"tiff stack: duplicate spellings for slice " +
      s"index(es) ${dups.map { case (i, ns) => s"$i (${ns.map(_._2).mkString(", ")})" }.mkString("; ")} " +
      s"under $root — one NNNN.tif per index")
    slices.foreach { case (i, n) =>
      val canon = f"$i%04d.tif"
      require(n == canon, s"tiff stack: slice '$n' is not the canonical " +
        s"zero-padded spelling '$canon' this engine reads — rename the stack " +
        s"(e.g. 7.tif -> 0007.tif)")
    }
    val depth = slices.last._1 + 1
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ChunkStore.read(fs, root, slices.head._2)))
    require(img != null, s"tiff stack: ${slices.head._2} is not a decodable image")
    val dt = img.getRaster.getTransferType match {
      case java.awt.image.DataBuffer.TYPE_BYTE => Meta.TUInt8
      case java.awt.image.DataBuffer.TYPE_USHORT => Meta.TUInt16
      case t => throw new IllegalArgumentException(
        s"tiff stack: transfer type $t unsupported (8/16-bit grayscale only)")
    }
    new Volume(spark, root, volumeMetaOf(img.getWidth, img.getHeight, depth, dt),
      mip = 1, fillMissing = fillMissing, keyStyle = "tiff-z")
  }

  /** Create a handle for a NEW stack (the directory itself is the store —
    * nothing to write until slices are ingested; `open` requires at least
    * one slice, so a never-written stack fails loudly there). */
  def create(spark: SparkSession, root: String, shape: (Int, Int, Int),
      dataType: VoxelType, fillMissing: Boolean = true): Volume = {
    require(dataType == Meta.TUInt8 || dataType == Meta.TUInt16,
      s"tiff stack: $dataType unsupported (8/16-bit grayscale only)")
    new Volume(spark, root, volumeMetaOf(shape._1, shape._2, shape._3, dataType),
      mip = 1, fillMissing = fillMissing, keyStyle = "tiff-z")
  }
}
