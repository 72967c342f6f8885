package graft.geom

/** Pole-of-inaccessibility label point + its distance to the outline. */
final case class LabelResult(x: Double, y: Double, dist: Double)

/** A ring pre-decomposed for the distance scan: edges grouped into
  * fixed-size blocks, one bounding box per block, so `signedDistance` can
  * skip whole blocks in O(1) when they can neither hold a nearer edge nor
  * flip ray-cast parity. Re-derivation of the reference's prepared-polygon
  * structure (/root/reference/src/lib.rs:89-161).
  */
final class PreparedRing(ring: Ring) {
  import Polylabel.BlockSize
  val xs: Array[Double] = ring.xs
  val ys: Array[Double] = ring.ys
  val nEdges: Int = ring.nEdges
  val nBlocks: Int = if (nEdges == 0) 0 else (nEdges + BlockSize - 1) / BlockSize
  val bMinX = new Array[Double](nBlocks)
  val bMinY = new Array[Double](nBlocks)
  val bMaxX = new Array[Double](nBlocks)
  val bMaxY = new Array[Double](nBlocks)
  locally {
    var b = 0
    while (b < nBlocks) {
      val start = b * BlockSize
      val end = math.min(start + BlockSize, nEdges)
      var minX = Double.PositiveInfinity; var minY = Double.PositiveInfinity
      var maxX = Double.NegativeInfinity; var maxY = Double.NegativeInfinity
      var i = start
      // every edge endpoint, i.e. vertices start..end inclusive
      while (i <= end) {
        val x = xs(i); val y = ys(i)
        if (x < minX) minX = x
        if (x > maxX) maxX = x
        if (y < minY) minY = y
        if (y > maxY) maxY = y
        i += 1
      }
      bMinX(b) = minX; bMinY(b) = minY; bMaxX(b) = maxX; bMaxY(b) = maxY
      b += 1
    }
  }
}

/** Quadtree search node (reference `Qcell`, /root/reference/src/lib.rs:27-58):
  * cell centroid, half extent, signed distance of the centroid to the
  * outline, and the admissible upper bound on the distance anywhere in the
  * cell (`distance + halfExtent * sqrt(2)`, the cell-corner Chebyshev bound).
  */
final case class Qcell(cx: Double, cy: Double, halfExtent: Double,
                       distance: Double, maxDistance: Double)

/** Binary max-heap on `Qcell.maxDistance` replicating Rust's
  * `std::collections::BinaryHeap` sift order exactly (push = sift-up;
  * pop = swap-in-last + sift-down-to-bottom + sift-up). Cells with EQUAL
  * upper bounds therefore pop in the same order as the reference, which
  * pins tie-breaking when two candidate cells have identical distances
  * (observable on the FFI octagon fixture).
  */
private[geom] final class CellHeap(initialCapacity: Int = 64) {
  private var data = new Array[Qcell](math.max(initialCapacity, 4))
  private var n = 0

  def size: Int = n
  def nonEmpty: Boolean = n > 0

  @inline private def le(a: Qcell, b: Qcell): Boolean = a.maxDistance <= b.maxDistance

  def push(item: Qcell): Unit = {
    if (n == data.length) {
      val bigger = new Array[Qcell](data.length * 2)
      System.arraycopy(data, 0, bigger, 0, n)
      data = bigger
    }
    data(n) = item
    n += 1
    siftUp(0, n - 1)
  }

  private def siftUp(start: Int, pos0: Int): Int = {
    var pos = pos0
    val element = data(pos)
    var done = false
    while (!done && pos > start) {
      val parent = (pos - 1) / 2
      if (le(element, data(parent))) done = true
      else { data(pos) = data(parent); pos = parent }
    }
    data(pos) = element
    pos
  }

  def pop(): Qcell = {
    val last = data(n - 1)
    n -= 1
    data(n) = null
    if (n == 0) last
    else {
      val top = data(0)
      data(0) = last
      siftDownToBottom(0)
      top
    }
  }

  private def siftDownToBottom(pos0: Int): Unit = {
    val end = n
    val start = pos0
    var pos = pos0
    val element = data(pos)
    var child = 2 * pos + 1
    while (child <= end - 2) {
      if (le(data(child), data(child + 1))) child += 1
      data(pos) = data(child)
      pos = child
      child = 2 * pos + 1
    }
    if (child == end - 1) {
      data(pos) = data(child)
      pos = child
    }
    data(pos) = element
    siftUp(start, pos)
  }

  /** Classic sift-down over data(pos0..n): promote the larger child (right
    * wins ties) while it beats the sifted element.
    */
  private def siftDownRange(pos0: Int): Unit = {
    val end = n
    var pos = pos0
    val element = data(pos)
    var child = 2 * pos + 1
    var done = false
    while (!done && child <= end - 2) {
      if (le(data(child), data(child + 1))) child += 1
      if (element.maxDistance >= data(child).maxDistance) {
        done = true
      } else {
        data(pos) = data(child)
        pos = child
        child = 2 * pos + 1
      }
    }
    if (!done && child == end - 1 && element.maxDistance < data(child).maxDistance) {
      data(pos) = data(child)
      pos = child
    }
    data(pos) = element
  }

  /** Floyd heapify of the whole array. */
  private def rebuild(): Unit = {
    var i = n / 2
    while (i > 0) { i -= 1; siftDownRange(i) }
  }

  /** Append a batch then restore the heap property, with the batch-vs-size
    * policy Rust's `BinaryHeap::extend` uses (full Floyd rebuild when the
    * batch rivals the existing heap, per-element sift-up otherwise) so pop
    * order — including ties — matches the reference bit-for-bit.
    */
  def extendBatch(items: Array[Qcell], count: Int): Unit = {
    val start = n
    if (n + count > data.length) {
      var cap = data.length
      while (cap < n + count) cap *= 2
      val bigger = new Array[Qcell](cap)
      System.arraycopy(data, 0, bigger, 0, n)
      data = bigger
    }
    System.arraycopy(items, 0, data, n, count)
    n += count
    val tailLen = count
    // element footprint ~40 bytes -> small-heap hybrid threshold 2048/40 = 51
    val betterToRebuild =
      if (start < tailLen) true
      else if (n <= 51) tailLen > n / 2
      else tailLen > n / 4
    if (betterToRebuild) rebuild()
    else {
      var i = start
      while (i < n) { siftUp(0, i); i += 1 }
    }
  }
}

/** Re-derivation of the polylabel pole-of-inaccessibility algorithm
  * (branch-and-bound quadtree search over a max-priority queue ordered by
  * the Chebyshev-corner upper bound), matching the reference
  * (/root/reference/src/lib.rs:336-398) f64-exactly on its fixture tests.
  *
  * Pure, allocation-light, per-row compute: no Spark types in here — the
  * Catalyst expression layer (graft.functions) adapts columns to this.
  */
object Polylabel {

  /** Edges per skip-block (reference BLOCK_SIZE, src/lib.rs:90). */
  final val BlockSize = 32

  private val Sqrt2 = math.sqrt(2.0)

  def prepare(p: PolygonG): Array[PreparedRing] = p.rings.map(new PreparedRing(_))

  /** Signed distance from (px,py) to the polygon outline: positive inside,
    * negative outside. One pass over all rings accumulates both the even-odd
    * ray-cast parity and the minimum point-to-edge distance; whole blocks are
    * skipped when their bbox can neither contain a nearer edge (point-to-bbox
    * clamp >= current min squared) nor straddle the rightward parity ray.
    * Arithmetic mirrors /root/reference/src/lib.rs:163-233 for f64 parity.
    */
  def signedDistance(px: Double, py: Double, rings: Array[PreparedRing]): Double = {
    var inside = false
    var minDistance = Double.PositiveInfinity
    var ri = 0
    while (ri < rings.length) {
      val r = rings(ri)
      var b = 0
      while (b < r.nBlocks) {
        val start = b * BlockSize
        val end = math.min(start + BlockSize, r.nEdges)
        val bminX = r.bMinX(b); val bminY = r.bMinY(b)
        val bmaxX = r.bMaxX(b); val bmaxY = r.bMaxY(b)

        // lower bound on the distance to any edge in this block
        val dx = if (px < bminX) bminX - px else if (px > bmaxX) px - bmaxX else 0.0
        val dy = if (py < bminY) bminY - py else if (py > bmaxY) py - bmaxY else 0.0
        val skipDist = dx * dx + dy * dy >= minDistance * minDistance

        // edges here can only flip parity if the bbox straddles y and
        // extends right of x
        val skipCross = py < bminY || py >= bmaxY || px > bmaxX

        if (!(skipDist && skipCross)) {
          var i = start
          while (i < end) {
            val ax = r.xs(i); val ay = r.ys(i)
            val bx = r.xs(i + 1); val by = r.ys(i + 1)
            if (!skipCross &&
                ((ay > py) != (by > py)) &&
                (px < (bx - ax) * (py - ay) / (by - ay) + ax)) {
              inside = !inside
            }
            if (!skipDist) {
              val d = Geom.segmentDistance(px, py, ax, ay, bx, by)
              if (d < minDistance) minDistance = d
            }
            i += 1
          }
        }
        b += 1
      }
      ri += 1
    }
    if (inside) minDistance else -minDistance
  }

  @inline private def mkCell(cx: Double, cy: Double, halfExtent: Double,
                             rings: Array[PreparedRing]): Qcell = {
    val d = signedDistance(cx, cy, rings)
    Qcell(cx, cy, halfExtent, d, d + halfExtent * Sqrt2)
  }

  /** Compute the pole of inaccessibility of `poly` to within `tolerance`.
    * Degenerate polygons (zero signed area) yield (0,0); zero-extent
    * bounding boxes yield the bbox min corner — both per the reference's
    * short-circuits (src/lib.rs:340-352).
    */
  def polylabel(poly: PolygonG, tolerance: Double): LabelResult = {
    // The reference accepts any tolerance but never terminates for
    // tolerance <= 0 or NaN (the prune test `max - best <= tol` can never
    // fire while half-extents stay positive). Those inputs are rejected
    // here; the SQL surface maps this to the (NaN, NaN) error sentinel.
    require(tolerance > 0.0 && !tolerance.isInfinity,
      s"tolerance must be a finite positive number, got $tolerance")
    if (Geom.signedArea(poly) == 0.0) return LabelResult(0.0, 0.0, 0.0)

    val bbox = Geom.boundingRect(poly.exterior)
    val cellSize = math.min(bbox.width, bbox.height)
    if (cellSize == 0.0) return LabelResult(bbox.minX, bbox.minY, 0.0)

    var halfExtent = cellSize / 2.0
    val rings = prepare(poly)

    // initial guesses: polygon centroid and bbox center, with the
    // reference's seed selection (src/lib.rs:361-374)
    val c = Geom.centroid(poly).getOrElse(Pt(bbox.centerX, bbox.centerY))
    val centroidCell = mkCell(c.x, c.y, 0.0, rings)
    val bboxCell = mkCell(bbox.centerX, bbox.centerY, 0.0, rings)
    var best = if (bboxCell.distance < centroidCell.distance) bboxCell else centroidCell

    // seed the queue with a regular grid of cells of size cellSize
    val queue = new CellHeap()
    val gridCellSize = halfExtent * 2.0
    val nx = math.ceil(bbox.width / gridCellSize).toLong
    val ny = math.ceil(bbox.height / gridCellSize).toLong
    val seed = new Array[Qcell]((nx * ny).toInt)
    var si = 0
    var gx = 0L
    while (gx < nx) {
      var gy = 0L
      while (gy < ny) {
        val px = (bbox.minX + gx.toDouble * gridCellSize) + halfExtent
        val py = (bbox.minY + gy.toDouble * gridCellSize) + halfExtent
        seed(si) = mkCell(px, py, halfExtent, rings)
        si += 1
        gy += 1
      }
      gx += 1
    }
    queue.extendBatch(seed, si)

    // branch-and-bound: pop the cell with the best upper bound; prune when
    // it cannot beat the current best by more than tolerance; else split
    val quad = new Array[Qcell](4)
    while (queue.nonEmpty) {
      val cell = queue.pop()
      if (cell.distance > best.distance) best = cell
      if (cell.maxDistance - best.distance > tolerance) {
        halfExtent = cell.halfExtent / 2.0
        quad(0) = mkCell(cell.cx - halfExtent, cell.cy - halfExtent, halfExtent, rings)
        quad(1) = mkCell(cell.cx + halfExtent, cell.cy - halfExtent, halfExtent, rings)
        quad(2) = mkCell(cell.cx - halfExtent, cell.cy + halfExtent, halfExtent, rings)
        quad(3) = mkCell(cell.cx + halfExtent, cell.cy + halfExtent, halfExtent, rings)
        queue.extendBatch(quad, 4)
      }
    }

    LabelResult(best.cx, best.cy, best.distance)
  }
}
