package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Codec, Grid, Meta}
import graft.volume.VoxelBuffer

/** Catalyst expressions for the chunk-grid algebra — the reference's key
  * codec and id math (src/Indexes.jl:41-94) as SQL-callable, codegen'd
  * functions, plus the chunk→voxel Generator (UDTF).
  */
object ChunkExprs {

  import org.apache.spark.sql.graftshim.shim.{toColumn, toExpression}

  /** chunk_id(x, chunkSize, offset) = fld(x-1-o, c)+1, with the grid
    * alignment offset o = floorMod(offset, chunkSize)
    * (reference: src/Indexes.jl:41-45, src/ChunkIterators.jl:30-34). */
  case class ChunkId(x: Expression, chunkSize: Expression, offset: Expression)
      extends TernaryExpression {
    override def first: Expression = x
    override def second: Expression = chunkSize
    override def third: Expression = offset
    override def dataType: DataType = IntegerType

    override def nullSafeEval(xv: Any, cv: Any, ov: Any): Any = {
      val c = cv.asInstanceOf[Int]
      Grid.chunkIdOf(xv.asInstanceOf[Int], c, Grid.gridOffset(ov.asInstanceOf[Int], c))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (xv, cv, ov) =>
        s"${ev.value} = java.lang.Math.floorDiv($xv - 1 - java.lang.Math.floorMod($ov, $cv), $cv) + 1;")

    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
      copy(x = a, chunkSize = b, offset = c)
  }

  /** chunk_key(cx, cy, cz, csx, csy, csz, ox, oy, oz) — the storage key of a
    * chunk grid cell: "<x0>-<x1>_<y0>-<y1>_<z0>-<z1>", 0-based-start
    * exclusive-stop (reference: src/Indexes.jl:80-94). */
  case class ChunkKey(children: Seq[Expression]) extends Expression with CodegenFallback {
    require(children.length == 9, "chunk_key(cx, cy, cz, csx, csy, csz, ox, oy, oz)")
    override def dataType: DataType = StringType
    override def nullable: Boolean = children.exists(_.nullable)

    override def eval(input: InternalRow): Any = {
      val v = children.map(_.eval(input))
      if (v.contains(null)) return null
      val Seq(cx, cy, cz, csx, csy, csz, ox, oy, oz) = v.map(_.asInstanceOf[Int])
      def part(id: Int, cs: Int, off: Int): String = {
        val o = Grid.gridOffset(off, cs)
        val iv = Grid.chunkIval(id, cs, o)
        s"${iv.lo - 1}-${iv.hi}"
      }
      UTF8String.fromString(s"${part(cx, csx, ox)}_${part(cy, csy, oy)}_${part(cz, csz, oz)}")
    }

    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  /** chunk_key_parse(key) → struct(x0,x1,y0,y1,z0,z1) — inverse of
    * [[ChunkKey]], 1-based inclusive bounds
    * (reference: src/Indexes.jl:96-106). Null on malformed input. */
  case class ChunkKeyParse(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("x0", IntegerType), StructField("x1", IntegerType),
      StructField("y0", IntegerType), StructField("y1", IntegerType),
      StructField("z0", IntegerType), StructField("z1", IntegerType)))
    override def nullable: Boolean = true

    override def nullSafeEval(v: Any): Any =
      Grid.parseKey(v.toString) match {
        case Some(b) => InternalRow(b.x.lo, b.x.hi, b.y.lo, b.y.hi, b.z.lo, b.z.hi)
        case None => null
      }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---------------- chunk → voxel Generator (UDTF) ----------------

  /** explode_chunk(blob, x0, y0, z0, sx, sy, sz) — unpack a decoded (or
    * codec'd; magic-sniffed) chunk blob into voxel rows
    * `(x, y, z, c, value)`. dataType/channels/encoding are constructor
    * parameters since they're per-volume constants. The Generator form lets
    * SQL explode chunk tables directly:
    * `SELECT g.* FROM chunks LATERAL VIEW explode_chunk(...) g`. */
  case class ExplodeChunk(children: Seq[Expression], dataTypeName: String,
      numChannels: Int, encoding: String)
      extends Generator with CodegenFallback {
    require(children.length == 7, "explode_chunk(blob, x0, y0, z0, sx, sy, sz)")

    @transient private lazy val vt = Meta.VoxelType.fromName(dataTypeName)
    @transient private lazy val codec = Codec.forEncoding(encoding)

    override def elementSchema: StructType = StructType(Seq(
      StructField("x", IntegerType, nullable = false),
      StructField("y", IntegerType, nullable = false),
      StructField("z", IntegerType, nullable = false),
      StructField("c", IntegerType, nullable = false),
      StructField("value", graft.volume.Volume.widenedType(vt), nullable = false)))

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val blob = children.head.eval(input).asInstanceOf[Array[Byte]]
      if (blob == null) return Iterator.empty
      val args = children.tail.map(_.eval(input))
      if (args.contains(null)) return Iterator.empty // null coords: no rows
      val Seq(x0, y0, z0, sx, sy, sz) = args.map(_.asInstanceOf[Int])
      val buf = new VoxelBuffer(vt, sx, sy, sz, numChannels, (x0, y0, z0), codec.decode(blob))
      for {
        ch <- (0 until numChannels).iterator
        z <- (0 until sz).iterator
        y <- (0 until sy).iterator
        x <- (0 until sx).iterator
      } yield {
        val v = graft.volume.Volume.widenedValue(vt, buf, x, y, z, ch) match {
          case s: String => UTF8String.fromString(s)
          case bd: java.math.BigDecimal => org.apache.spark.sql.types.Decimal(bd)
          case other => other
        }
        InternalRow(x0 + x, y0 + y, z0 + z, ch, v)
      }
    }

    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  // ---------------- Column API + SQL registration ----------------

  def chunk_id(x: Column, chunkSize: Column, offset: Column): Column =
    toColumn(ChunkId(toExpression(x), toExpression(chunkSize), toExpression(offset)))

  def chunk_key(cx: Column, cy: Column, cz: Column,
      chunkSize: (Int, Int, Int), offset: (Int, Int, Int)): Column =
    toColumn(ChunkKey(Seq(toExpression(cx), toExpression(cy), toExpression(cz),
      Literal(chunkSize._1), Literal(chunkSize._2), Literal(chunkSize._3),
      Literal(offset._1), Literal(offset._2), Literal(offset._3))))

  def chunk_key_parse(key: Column): Column = toColumn(ChunkKeyParse(toExpression(key)))

  /** SQL builder for [[ExplodeChunk]]:
    * `explode_chunk(blob, x0, y0, z0, sx, sy, sz, dtype, num_channels, encoding)`
    * — the trailing three are per-volume constants and must be literals
    * (they fix the Generator's output schema at analysis time). */
  def explodeChunkBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 10,
      "explode_chunk(blob, x0, y0, z0, sx, sy, sz, dtype, num_channels, encoding)")
    def const(e: Expression, what: String): Any = e match {
      case Literal(v, _) if v != null => v
      case other => throw new IllegalArgumentException(
        s"explode_chunk: $what must be a non-null literal, got $other")
    }
    ExplodeChunk(exprs.take(7),
      const(exprs(7), "dtype").toString,
      const(exprs(8), "num_channels").asInstanceOf[Int],
      const(exprs(9), "encoding").toString)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("chunk_id",
      exprs => ChunkId(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("chunk_key", exprs => ChunkKey(exprs), "built-in")
    reg.createOrReplaceTempFunction("chunk_key_parse",
      exprs => ChunkKeyParse(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("explode_chunk", explodeChunkBuilder, "built-in")
  }
}
