package graft.sources

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.Meta
import graft.core.Meta.{ScaleMeta, VolumeMeta, VoxelType}
import graft.volume.{ChunkStore, Volume}

/** Zarr v3 array support (the current zarr spec) — third chunked-array
  * format on the shared Volume engine, alongside [[Zarr]] (v2) and [[N5]].
  *
  * v3 vs v2, as it lands here:
  *  - one `zarr.json` document (node_type "array") instead of `.zarray`,
  *    with named dtypes ("uint16", not "<u2"), a `chunk_grid` object, and a
  *    `codecs` CHAIN in place of the single `compressor`;
  *  - chunk keys use the v3 "default" chunk-key encoding: a `c/` prefix and
  *    "/"-separated 0-based grid indices in dim order (`c/z/y/x` after this
  *    engine's d2→x naming) — `keyStyle = "zarr3-c"`;
  *  - the first codec must be the `bytes` array→bytes codec (little
  *    endian), which serializes C-order — naming d2→x makes that exactly
  *    this engine's x-fastest layout, same zero-transpose trick as v2;
  *    an optional second codec compresses: `gzip` (RFC-1952 — NOT v2's
  *    zlib!) or `blosc` with cname blosclz; absent → identity.
  *  - edge chunks are stored full-size, zero-padded (`padEdgeChunks`),
  *    like v2.
  *
  * Supported: zarr_format 3, node_type "array", 2-d/3-d, dtypes
  * {bool, uint8/16/32/64, float32/64}, fill_value 0/null/0.0, default
  * chunk-key encoding with "/" separator, codec chains [bytes] /
  * [bytes, gzip] / [bytes, blosc(blosclz)], each optionally preceded by a
  * 3-d `transpose` codec (any of the 6 permutations — handled by
  * re-deriving the axis naming, zero data movement; key style
  * "zarr3-p:<order>"). Anything else fails loudly with the offending
  * field. */
object Zarr3 {

  final case class Zarr3Meta(
      shape: (Int, Int, Int), // (x, y, z) after axis mapping
      chunks: (Int, Int, Int), // outer grid unit: the chunk, or the SHARD when sharded
      dataType: VoxelType,
      encoding: String, // this engine's codec name (the inner chain when sharded)
      keyStyle: String, // zarr3-c | zarr3-c2 | zarr3-shard
      /** `sharding_indexed`: inner chunk shape (x, y, z) + index framing.
        * `chunks` is then the shard shape; the engine's addressable unit is
        * the inner chunk. */
      innerChunks: Option[(Int, Int, Int)] = None,
      indexCrc: Boolean = true,
      indexAtEnd: Boolean = true)

  private val DtypeNames: Map[String, VoxelType] = Map(
    "bool" -> Meta.TBool, "uint8" -> Meta.TUInt8, "uint16" -> Meta.TUInt16,
    "uint32" -> Meta.TUInt32, "uint64" -> Meta.TUInt64,
    "float32" -> Meta.TFloat32, "float64" -> Meta.TFloat64)

  private def codecName(c: JValue): String = c \ "name" match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"zarr3: codec without name: $other")
  }

  /** The engine encoding for a v3 codec chain: [bytes(, compressor)]. */
  private def encodingOf(codecs: JValue): String = codecs match {
    case JArray(chain) if chain.nonEmpty =>
      require(codecName(chain.head) == "bytes",
        s"zarr3: first codec must be 'bytes', got '${codecName(chain.head)}'")
      chain.head \ "configuration" \ "endian" match {
        case JString("little") | JNothing | JNull => ()
        case other => throw new IllegalArgumentException(s"zarr3: bytes endian $other unsupported")
      }
      chain.tail match {
        case Nil => "identity"
        case compressor :: Nil => codecName(compressor) match {
          case "gzip" => "gzip" // v3 gzip is RFC-1952 gzip (v2 zlib is NOT)
          case "blosc" => compressor \ "configuration" \ "cname" match {
            case JString("blosclz") | JNothing | JNull => "blosclz"
            case JString(other) => throw new IllegalArgumentException(
              s"zarr3: blosc cname '$other' unsupported (only blosclz has a pure-JVM codec here)")
            case other => throw new IllegalArgumentException(s"zarr3: malformed blosc cname $other")
          }
          case other => throw new IllegalArgumentException(s"zarr3: codec '$other' unsupported")
        }
        case more => throw new IllegalArgumentException(
          s"zarr3: codec chains longer than [bytes, compressor] unsupported (${more.map(codecName)})")
      }
    case _ => throw new IllegalArgumentException("zarr3: missing/empty codecs chain")
  }

  def parseZarrJson(jsonStr: String): Zarr3Meta = {
    val j = JsonMethods.parse(jsonStr)
    (j \ "zarr_format") match {
      case JInt(v) if v == 3 => ()
      case other => throw new IllegalArgumentException(s"zarr3: zarr_format must be 3, got $other")
    }
    (j \ "node_type") match {
      case JString("array") => ()
      case other => throw new IllegalArgumentException(s"zarr3: node_type must be 'array', got $other")
    }
    (j \ "fill_value") match {
      case JNull | JNothing => ()
      case JInt(v) if v == BigInt(0) => ()
      case JDouble(0.0) => ()
      case other => throw new IllegalArgumentException(s"zarr3: only fill_value 0 supported, got $other")
    }
    (j \ "chunk_key_encoding") match {
      case JNothing | JNull => () // spec default: "default" with "/"
      case cke =>
        (cke \ "name") match {
          case JString("default") | JNothing | JNull => ()
          case other => throw new IllegalArgumentException(s"zarr3: chunk_key_encoding $other unsupported")
        }
        (cke \ "configuration" \ "separator") match {
          case JString("/") | JNothing | JNull => ()
          case other => throw new IllegalArgumentException(s"zarr3: key separator $other unsupported ('/' only)")
        }
    }
    def ints(v: JValue, what: String): List[Int] = v match {
      case JArray(xs) => xs.map {
        case JInt(i) => i.toInt
        case other => throw new IllegalArgumentException(s"zarr3: non-integer in $what: $other")
      }
      case _ => throw new IllegalArgumentException(s"zarr3: missing $what")
    }
    val dims = ints(j \ "shape", "shape")
    val grid = j \ "chunk_grid"
    (grid \ "name") match {
      case JString("regular") => ()
      case other => throw new IllegalArgumentException(s"zarr3: chunk_grid $other unsupported")
    }
    val cdims = ints(grid \ "configuration" \ "chunk_shape", "chunk_shape")
    require(dims.length == cdims.length, "zarr3: shape/chunk_shape rank mismatch")
    require(dims.length == 2 || dims.length == 3, s"zarr3: rank ${dims.length} unsupported (2-d/3-d only)")
    val dt = (j \ "data_type") match {
      case JString(s) => DtypeNames.getOrElse(s,
        throw new IllegalArgumentException(s"zarr3: unsupported data_type '$s'"))
      case other => throw new IllegalArgumentException(s"zarr3: missing data_type: $other")
    }
    // sharding_indexed wraps the whole chain: the outer grid unit becomes
    // the SHARD and the codec's configuration carries the inner chunk
    // shape, the inner codec chain, and the index framing
    (j \ "codecs") match {
      // transpose: an array->array codec permuting dims BEFORE the bytes
      // codec serializes C-order. No data movement needed here — the
      // engine just re-derives its axis naming from the permutation
      // (x = the serialized-FASTEST dim = order.last), the same zero-copy
      // trick the C/F-order mapping uses; only the chunk KEY layout (which
      // stays in ORIGINAL dim order per the spec) needs the permutation,
      // carried in the key style as "zarr3-p:<order digits>".
      case JArray(head :: tail) if codecName(head) == "transpose" =>
        require(dims.length == 3, "zarr3: transpose on 2-d arrays unsupported (3-d only)")
        val order = ints(head \ "configuration" \ "order", "transpose order")
        require(order.sorted == List(0, 1, 2),
          s"zarr3: transpose order $order must be a permutation of [0, 1, 2]")
        val enc = encodingOf(JArray(tail))
        val style =
          if (order == List(0, 1, 2)) "zarr3-c" else s"zarr3-p:${order.mkString}"
        Zarr3Meta((dims(order(2)), dims(order(1)), dims(order(0))),
          (cdims(order(2)), cdims(order(1)), cdims(order(0))), dt, enc, style)
      case JArray(chain @ (head :: _)) if codecName(head) == "sharding_indexed" =>
        require(chain.lengthCompare(1) == 0,
          "zarr3: sharding_indexed must be the only array->bytes codec in the chain")
        require(dims.length == 3, "zarr3: sharded 2-d arrays unsupported (3-d only)")
        val cfg = head \ "configuration"
        val idims = ints(cfg \ "chunk_shape", "sharding chunk_shape")
        require(idims.length == 3, "zarr3: sharding chunk_shape rank mismatch")
        (0 until 3).foreach { d =>
          require(idims(d) > 0 && cdims(d) % idims(d) == 0,
            s"zarr3: shard shape $cdims not a multiple of inner chunk shape $idims")
        }
        val innerEnc = encodingOf(cfg \ "codecs")
        val idxCodecs = (cfg \ "index_codecs") match {
          case JArray(ics) => ics.map(codecName)
          case JNothing | JNull => List("bytes", "crc32c") // spec default
          case other => throw new IllegalArgumentException(s"zarr3: malformed index_codecs $other")
        }
        val crc = idxCodecs match {
          case List("bytes") => false
          case List("bytes", "crc32c") => true
          case other => throw new IllegalArgumentException(
            s"zarr3: index_codecs $other unsupported ([bytes] or [bytes, crc32c])")
        }
        val atEnd = (cfg \ "index_location") match {
          case JString("end") | JNothing | JNull => true
          case JString("start") => false
          case other => throw new IllegalArgumentException(s"zarr3: index_location $other unsupported")
        }
        Zarr3Meta((dims(2), dims(1), dims(0)), (cdims(2), cdims(1), cdims(0)), dt,
          innerEnc, "zarr3-shard",
          innerChunks = Some((idims(2), idims(1), idims(0))),
          indexCrc = crc, indexAtEnd = atEnd)
      case codecs =>
        val enc = encodingOf(codecs)
        // the bytes codec is C-order (last dim fastest): name d_last → x, zero transpose
        if (dims.length == 3)
          Zarr3Meta((dims(2), dims(1), dims(0)), (cdims(2), cdims(1), cdims(0)), dt, enc, "zarr3-c")
        else
          Zarr3Meta((dims(1), dims(0), 1), (cdims(1), cdims(0), 1), dt, enc, "zarr3-c2")
    }
  }

  /** The dim permutation encoded in a key style: identity for the
    * C-order styles, the transpose codec's order for "zarr3-p:...". */
  private[sources] def orderOf(keyStyle: String): List[Int] = keyStyle match {
    case s if s.startsWith("zarr3-p:") =>
      val o = s.drop("zarr3-p:".length).map(_ - '0').toList
      require(o.sorted == List(0, 1, 2), s"zarr3: malformed key style $s")
      o
    case _ => List(0, 1, 2)
  }

  /** Serialize array metadata to a `zarr.json` document (3-d only — 2-d
    * stores are read-supported). */
  def toZarrJson(m: Zarr3Meta): String = {
    require(m.keyStyle == "zarr3-c" || m.keyStyle == "zarr3-shard" ||
      m.keyStyle.startsWith("zarr3-p:"),
      s"zarr3: cannot serialize key style ${m.keyStyle}")
    // transpose + sharding_indexed composition is unsupported end-to-end
    // (the parser rejects it too) — silently dropping the transpose codec
    // here would write metadata whose reopen transposes the voxels
    require(m.innerChunks.isEmpty || !m.keyStyle.startsWith("zarr3-p:"),
      "zarr3: transpose inside a sharded store is unsupported")
    val order = orderOf(m.keyStyle)
    // engine (x, y, z) sit at original dim positions (order(2), order(1),
    // order(0)) — invert the mapping to write original-dim-order lists
    def toOriginal(t: (Int, Int, Int)): List[Int] = {
      val out = new Array[Int](3)
      out(order(2)) = t._1; out(order(1)) = t._2; out(order(0)) = t._3
      out.toList
    }
    val shape = toOriginal(m.shape)
    val chunks = toOriginal(m.chunks)
    val dtype = DtypeNames.collectFirst { case (n, t) if t == m.dataType => n }.get
    val bytesCodec: JValue = JObject("name" -> JString("bytes"),
      "configuration" -> JObject("endian" -> JString("little")))
    val innerCodecs = m.encoding match {
      case "identity" => List(bytesCodec)
      case "gzip" => List(bytesCodec, JObject("name" -> JString("gzip"),
        "configuration" -> JObject("level" -> JInt(6))))
      case "blosclz" => List(bytesCodec, JObject("name" -> JString("blosc"),
        "configuration" -> JObject("cname" -> JString("blosclz"), "clevel" -> JInt(5),
          "shuffle" -> JString(if (m.dataType.byteSize > 1) "shuffle" else "noshuffle"),
          "typesize" -> JInt(m.dataType.byteSize))))
      case other => throw new IllegalArgumentException(s"zarr3: cannot serialize encoding $other")
    }
    val transposeCodec: List[JValue] =
      if (order == List(0, 1, 2)) Nil
      else List(JObject("name" -> JString("transpose"),
        "configuration" -> JObject("order" -> JArray(order.map(JInt(_))))))
    val codecs = m.innerChunks match {
      case None => transposeCodec ++ innerCodecs
      case Some((ix, iy, iz)) =>
        List(JObject("name" -> JString("sharding_indexed"),
          "configuration" -> JObject(
            "chunk_shape" -> JArray(List(iz, iy, ix).map(JInt(_))),
            "codecs" -> JArray(innerCodecs),
            "index_codecs" -> JArray(bytesCodec ::
              (if (m.indexCrc) List(JObject("name" -> JString("crc32c"))) else Nil)),
            "index_location" -> JString(if (m.indexAtEnd) "end" else "start"))))
    }
    val obj = JObject(
      "zarr_format" -> JInt(3),
      "node_type" -> JString("array"),
      "shape" -> JArray(shape.map(JInt(_))),
      "data_type" -> JString(dtype),
      "chunk_grid" -> JObject("name" -> JString("regular"),
        "configuration" -> JObject("chunk_shape" -> JArray(chunks.map(JInt(_))))),
      "chunk_key_encoding" -> JObject("name" -> JString("default"),
        "configuration" -> JObject("separator" -> JString("/"))),
      "fill_value" -> JInt(0),
      "codecs" -> JArray(codecs))
    JsonMethods.compact(JsonMethods.render(obj))
  }

  private def volumeMetaOf(z: Zarr3Meta): VolumeMeta =
    VolumeMeta("image", z.dataType, 1, Vector(ScaleMeta(
      // the engine's addressable unit: the inner chunk when sharded
      key = "", chunkSize = z.innerChunks.getOrElse(z.chunks), encoding = z.encoding,
      resolution = (1.0, 1.0, 1.0), size = z.shape, voxelOffset = (0, 0, 0))))

  private def shardParamsOf(z: Zarr3Meta): Option[graft.core.Shard.Params] =
    z.innerChunks.map { case (ix, iy, iz) =>
      graft.core.Shard.Params(z.chunks._1 / ix, z.chunks._2 / iy, z.chunks._3 / iz,
        crc32c = z.indexCrc, indexAtEnd = z.indexAtEnd)
    }

  private def volumeOf(spark: SparkSession, root: String, z: Zarr3Meta,
      fillMissing: Boolean): Volume =
    new Volume(spark, root, volumeMetaOf(z), mip = 1, fillMissing = fillMissing,
      keyStyle = z.keyStyle, padEdgeChunks = true, shard = shardParamsOf(z))

  /** Open a zarr v3 array as a [[Volume]] (full engine surface), sharded
    * (`sharding_indexed`) or per-chunk. */
  def open(spark: SparkSession, root: String, fillMissing: Boolean = true): Volume = {
    val fs = ChunkStore.fs(root, spark.sessionState.newHadoopConf())
    val z = parseZarrJson(new String(ChunkStore.read(fs, root, "zarr.json"), "UTF-8"))
    volumeOf(spark, root, z, fillMissing)
  }

  /** Create a new zarr v3 array: write `zarr.json`, return the handle.
    * `shape`/`chunks` are ENGINE axes (x, y, z); a non-identity
    * `transposeOrder` writes a `transpose` codec ahead of `bytes`, storing
    * dims permuted so original dim `order(2)` serializes fastest (= engine
    * x) — zero data movement either way. */
  def create(spark: SparkSession, root: String, shape: (Int, Int, Int),
      chunks: (Int, Int, Int), dataType: VoxelType, encoding: String = "gzip",
      fillMissing: Boolean = true, transposeOrder: Seq[Int] = Seq(0, 1, 2)): Volume = {
    require(transposeOrder.sorted == Seq(0, 1, 2),
      s"zarr3: transposeOrder $transposeOrder must be a permutation of [0, 1, 2]")
    val style =
      if (transposeOrder == Seq(0, 1, 2)) "zarr3-c" else s"zarr3-p:${transposeOrder.mkString}"
    val z = Zarr3Meta(shape, chunks, dataType, encoding, style)
    val fs = ChunkStore.fs(root, spark.sessionState.newHadoopConf())
    ChunkStore.write(fs, root, "zarr.json", toZarrJson(z).getBytes("UTF-8"))
    volumeOf(spark, root, z, fillMissing)
  }

  /** Create a SHARDED zarr v3 array (`sharding_indexed`): `shardShape`
    * voxels per stored object, `innerChunks` voxels per addressable unit.
    * Sharding is the petavoxel layout — object count shrinks by the
    * shard/chunk volume ratio while reads stay inner-chunk-granular via
    * ranged GETs against the shard index. */
  def createSharded(spark: SparkSession, root: String, shape: (Int, Int, Int),
      shardShape: (Int, Int, Int), innerChunks: (Int, Int, Int),
      dataType: VoxelType, encoding: String = "gzip",
      fillMissing: Boolean = true): Volume = {
    require(shardShape._1 % innerChunks._1 == 0 && shardShape._2 % innerChunks._2 == 0 &&
      shardShape._3 % innerChunks._3 == 0,
      s"zarr3: shard shape $shardShape must be a multiple of inner chunk shape $innerChunks")
    val z = Zarr3Meta(shape, shardShape, dataType, encoding, "zarr3-shard",
      innerChunks = Some(innerChunks))
    val fs = ChunkStore.fs(root, spark.sessionState.newHadoopConf())
    ChunkStore.write(fs, root, "zarr.json", toZarrJson(z).getBytes("UTF-8"))
    volumeOf(spark, root, z, fillMissing)
  }
}
