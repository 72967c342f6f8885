package graft.functions

import graft.geom._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Column encodings shared by all graft geometry expressions:
  *   point     struct<x: double, y: double>
  *   ring      array<struct<x: double, y: double>>       (closed or not — auto-closed)
  *   holes     array<array<struct<x: double, y: double>>>
  * mirroring the reference FFI's nested-array ABI
  * (/root/reference/src/ffi.rs:12-24) as Spark nested types.
  */
object GeomEncoding {
  val pointType: StructType =
    StructType(Seq(StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false)))
  val ringType: ArrayType = ArrayType(pointType, containsNull = false)
  val holesType: ArrayType = ArrayType(ringType, containsNull = false)
  val labelType: StructType =
    StructType(Seq(StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))

  def ringFrom(ad: ArrayData): Ring = {
    val n = ad.numElements()
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = ad.getStruct(i, 2)
      xs(i) = row.getDouble(0)
      ys(i) = row.getDouble(1)
      i += 1
    }
    Ring.of(xs, ys)
  }

  def polygonFrom(ext: ArrayData, holes: ArrayData): PolygonG = {
    val hs =
      if (holes == null || holes.numElements() == 0) Array.empty[Ring]
      else {
        val out = new Array[Ring](holes.numElements())
        var i = 0
        while (i < out.length) { out(i) = ringFrom(holes.getArray(i)); i += 1 }
        out
      }
    new PolygonG(ringFrom(ext), hs)
  }
}

/** `polylabel(exterior, holes, tolerance) -> struct<x, y, dist>`.
  *
  * The SQL surface of the kernel (SURVEY.md §2.1 K1/K13): any error —
  * malformed ring, non-positive tolerance — yields the (NaN, NaN, NaN)
  * sentinel, the same error collapse as the reference's C ABI
  * (/root/reference/src/ffi.rs:78-80). Null inputs yield null.
  * Deterministic; CodegenFallback (the kernel is a hand-written search
  * loop — codegen would merely inline the same call).
  */
case class PolylabelExpr(exterior: Expression, holes: Expression, tolerance: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(exterior, holes, tolerance)
  override def dataType: DataType = GeomEncoding.labelType
  override def nullable: Boolean = true
  override def prettyName: String = "polylabel"

  private val nanRow = {
    val r = new GenericInternalRow(3)
    r.setDouble(0, Double.NaN); r.setDouble(1, Double.NaN); r.setDouble(2, Double.NaN)
    r
  }

  override def eval(input: InternalRow): Any = {
    val ext = exterior.eval(input)
    val tol = tolerance.eval(input)
    if (ext == null || tol == null) return null
    val hs = holes.eval(input) // null holes treated as no holes
    try {
      val poly = GeomEncoding.polygonFrom(ext.asInstanceOf[ArrayData],
        hs.asInstanceOf[ArrayData])
      val r = Polylabel.polylabel(poly, tol.asInstanceOf[Double])
      val row = new GenericInternalRow(3)
      row.setDouble(0, r.x); row.setDouble(1, r.y); row.setDouble(2, r.dist)
      row
    } catch {
      case _: IllegalArgumentException | _: IndexOutOfBoundsException |
           _: NullPointerException => nanRow
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(exterior = c(0), holes = c(1), tolerance = c(2))
}

/** `cell_of(x, y, level) -> bigint` — hierarchical quadkey cell of a point
  * (graft.geom.CellIndex). Null-safe: any null input -> null.
  */
case class CellOfExpr(x: Expression, y: Expression, level: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(x, y, level)
  override def dataType: DataType = LongType
  override def nullable: Boolean = x.nullable || y.nullable || level.nullable
  override def prettyName: String = "cell_of"

  override def eval(input: InternalRow): Any = {
    val xv = x.eval(input); val yv = y.eval(input); val lv = level.eval(input)
    if (xv == null || yv == null || lv == null) null
    else CellIndex.cellOf(xv.asInstanceOf[Double], yv.asInstanceOf[Double],
      lv.asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(x = c(0), y = c(1), level = c(2))
}

/** `cell_parent(cell) -> bigint`. */
case class CellParentExpr(cell: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(cell)
  override def dataType: DataType = LongType
  override def nullable: Boolean = cell.nullable
  override def prettyName: String = "cell_parent"

  override def eval(input: InternalRow): Any = {
    val c = cell.eval(input)
    if (c == null) null else CellIndex.parent(c.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(cell = c(0))
}

/** `cell_kring(cell, k) -> array<bigint>` — all cells within Chebyshev
  * distance k (kNN candidate neighbourhood), sorted.
  */
case class CellKRingExpr(cell: Expression, k: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(cell, k)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = cell.nullable || k.nullable
  override def prettyName: String = "cell_kring"

  override def eval(input: InternalRow): Any = {
    val c = cell.eval(input); val kv = k.eval(input)
    if (c == null || kv == null) null
    else UnsafeArrayData.fromPrimitiveArray(
      CellIndex.kRing(c.asInstanceOf[Long], kv.asInstanceOf[Int]))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(cell = c(0), k = c(1))
}

/** `polygon_cover(exterior, holes, level) -> array<bigint>` — exact set of
  * level-`level` cells intersecting the polygon (PIP-join prefilter).
  */
case class PolygonCoverExpr(exterior: Expression, holes: Expression, level: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(exterior, holes, level)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "polygon_cover"

  override def eval(input: InternalRow): Any = {
    val ext = exterior.eval(input); val lv = level.eval(input)
    if (ext == null || lv == null) return null
    val hs = holes.eval(input)
    val poly = GeomEncoding.polygonFrom(ext.asInstanceOf[ArrayData],
      hs.asInstanceOf[ArrayData])
    UnsafeArrayData.fromPrimitiveArray(
      CellIndex.cover(poly, lv.asInstanceOf[Int]))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(exterior = c(0), holes = c(1), level = c(2))
}

/** `pip(x, y, exterior, holes) -> boolean` — exact even-odd ray-cast
  * point-in-polygon (the refine predicate after the cell equi-join).
  */
case class PipExpr(x: Expression, y: Expression, exterior: Expression, holes: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(x, y, exterior, holes)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "pip"

  override def eval(input: InternalRow): Any = {
    val xv = x.eval(input); val yv = y.eval(input); val ext = exterior.eval(input)
    if (xv == null || yv == null || ext == null) return null
    val hs = holes.eval(input)
    val poly = GeomEncoding.polygonFrom(ext.asInstanceOf[ArrayData],
      hs.asInstanceOf[ArrayData])
    Geom.pointInPolygon(xv.asInstanceOf[Double], yv.asInstanceOf[Double], poly)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(x = c(0), y = c(1), exterior = c(2), holes = c(3))
}

/** `signed_dist(x, y, exterior, holes) -> double` — signed distance to the
  * polygon outline (positive inside), the kNN-join refinement metric.
  */
case class SignedDistExpr(x: Expression, y: Expression, exterior: Expression, holes: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(x, y, exterior, holes)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "signed_dist"

  override def eval(input: InternalRow): Any = {
    val xv = x.eval(input); val yv = y.eval(input); val ext = exterior.eval(input)
    if (xv == null || yv == null || ext == null) return null
    val hs = holes.eval(input)
    val poly = GeomEncoding.polygonFrom(ext.asInstanceOf[ArrayData],
      hs.asInstanceOf[ArrayData])
    Polylabel.signedDistance(xv.asInstanceOf[Double], yv.asInstanceOf[Double],
      Polylabel.prepare(poly))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(x = c(0), y = c(1), exterior = c(2), holes = c(3))
}

/** `geojson_polygon(str) -> struct<exterior: ring, holes: array<ring>>` —
  * parse a GeoJSON `Polygon` geometry (or a Feature wrapping one), per the
  * reference's ell.geojson shape (/root/reference/ell.geojson:1-23).
  * Malformed input -> null.
  */
case class GeoJsonPolygonExpr(child: Expression)
    extends Expression with CodegenFallback {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StructType(Seq(
    StructField("exterior", GeomEncoding.ringType),
    StructField("holes", GeomEncoding.holesType)))
  override def nullable: Boolean = true
  override def prettyName: String = "geojson_polygon"

  @transient private lazy val mapper = new ObjectMapper()

  private def ringToCatalyst(ring: JsonNode): GenericArrayData = {
    val pts = new Array[Any](ring.size())
    var i = 0
    while (i < pts.length) {
      val pt = ring.get(i)
      val row = new GenericInternalRow(2)
      row.setDouble(0, pt.get(0).asDouble())
      row.setDouble(1, pt.get(1).asDouble())
      pts(i) = row
      i += 1
    }
    new GenericArrayData(pts)
  }

  override def eval(input: InternalRow): Any = {
    val s = child.eval(input)
    if (s == null) return null
    try {
      var node: JsonNode = mapper.readTree(s.toString)
      if (node.has("geometry")) node = node.get("geometry")
      if (node.get("type").asText() != "Polygon") return null
      val coords = node.get("coordinates")
      if (coords == null || coords.size() == 0) return null
      val holes = new Array[Any](coords.size() - 1)
      var i = 1
      while (i < coords.size()) { holes(i - 1) = ringToCatalyst(coords.get(i)); i += 1 }
      val out = new GenericInternalRow(2)
      out.update(0, ringToCatalyst(coords.get(0)))
      out.update(1, new GenericArrayData(holes))
      out
    } catch { case _: Exception => null }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}
