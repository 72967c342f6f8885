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
  // NOTE: precomputing per-edge deltas/lengths was measured 2.3x SLOWER
  // than recomputing them in the scan — the probe loop is memory-bound and
  // three extra arrays (212 KB for Norway) evict the vertex data from L2
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

/** Binary max-heap of quadtree search nodes (reference `Qcell`,
  * /root/reference/src/lib.rs:27-58: cell centroid, half extent, signed
  * distance of the centroid, and the admissible upper bound
  * `distance + halfExtent * sqrt(2)` — the cell-corner Chebyshev bound),
  * keyed on that upper bound and replicating Rust's
  * `std::collections::BinaryHeap` sift order exactly (push = sift-up;
  * pop = swap-in-last + sift-down-to-bottom + sift-up; extend = append +
  * Floyd-rebuild-or-sift policy). Cells with EQUAL upper bounds therefore
  * pop in the same order as the reference, which pins tie-breaking when
  * two candidate cells have identical distances (observable on the FFI
  * octagon fixture).
  *
  * Storage is a packed strided double array (cx, cy, halfExtent, distance,
  * maxDistance per slot) — no per-cell allocation, no pointer chasing in
  * the hot loop. Record moves copy 5 doubles; comparisons read slot+4.
  */
private[geom] final class CellHeap(initialCapacity: Int = 64) {
  private final val S = 5 // doubles per record; slot 4 = maxDistance key
  private var data = new Array[Double](math.max(initialCapacity, 8) * S)
  private var n = 0
  // the "hole element" scratch record used during sifts
  private val el = new Array[Double](S)

  def size: Int = n
  def nonEmpty: Boolean = n > 0

  // popped cell fields (read after pop())
  var cx = 0.0; var cy = 0.0; var halfExtent = 0.0
  var distance = 0.0; var maxDistance = 0.0

  private def ensure(cap: Int): Unit = {
    if (cap * S > data.length) {
      var c = data.length / S
      while (c < cap) c *= 2
      val bigger = new Array[Double](c * S)
      System.arraycopy(data, 0, bigger, 0, n * S)
      data = bigger
    }
  }

  @inline private def key(pos: Int): Double = data(pos * S + 4)
  @inline private def move(from: Int, to: Int): Unit =
    System.arraycopy(data, from * S, data, to * S, S)
  @inline private def loadEl(pos: Int): Unit =
    System.arraycopy(data, pos * S, el, 0, S)
  @inline private def storeEl(pos: Int): Unit =
    System.arraycopy(el, 0, data, pos * S, S)

  /** Write a record directly into slot `pos` (no heap maintenance). */
  @inline private def put(pos: Int, x: Double, y: Double, he: Double,
                          d: Double, maxD: Double): Unit = {
    val b = pos * S
    data(b) = x; data(b + 1) = y; data(b + 2) = he
    data(b + 3) = d; data(b + 4) = maxD
  }

  private def siftUp(start: Int, pos0: Int): Unit = {
    var pos = pos0
    loadEl(pos)
    val k = el(4)
    var done = false
    while (!done && pos > start) {
      val parent = (pos - 1) / 2
      if (k <= key(parent)) done = true
      else { move(parent, pos); pos = parent }
    }
    storeEl(pos)
  }

  def pop(): Unit = {
    n -= 1
    val lastBase = n * S
    if (n == 0) {
      cx = data(lastBase); cy = data(lastBase + 1); halfExtent = data(lastBase + 2)
      distance = data(lastBase + 3); maxDistance = data(lastBase + 4)
    } else {
      cx = data(0); cy = data(1); halfExtent = data(2)
      distance = data(3); maxDistance = data(4)
      move(n, 0)
      siftDownToBottom(0)
    }
  }

  private def siftDownToBottom(pos0: Int): Unit = {
    val end = n
    val start = pos0
    var pos = pos0
    loadEl(pos)
    var child = 2 * pos + 1
    while (child <= end - 2) {
      if (key(child) <= key(child + 1)) child += 1
      move(child, pos)
      pos = child
      child = 2 * pos + 1
    }
    if (child == end - 1) {
      move(child, pos)
      pos = child
    }
    storeEl(pos)
    siftUp(start, pos)
  }

  /** Classic sift-down over pos0..n: promote the larger child (right wins
    * ties) while it beats the sifted element.
    */
  private def siftDownRange(pos0: Int): Unit = {
    val end = n
    var pos = pos0
    loadEl(pos)
    val k = el(4)
    var child = 2 * pos + 1
    var done = false
    while (!done && child <= end - 2) {
      if (key(child) <= key(child + 1)) child += 1
      if (k >= key(child)) done = true
      else { move(child, pos); pos = child; child = 2 * pos + 1 }
    }
    if (!done && child == end - 1 && k < key(child)) {
      move(child, pos)
      pos = child
    }
    storeEl(pos)
  }

  /** Floyd heapify of the whole array. */
  private def rebuild(): Unit = {
    var i = n / 2
    while (i > 0) { i -= 1; siftDownRange(i) }
  }

  /** Begin appending `count` records for extend; call `append` exactly
    * `count` times, then `finishExtend(count)`.
    */
  def beginExtend(count: Int): Unit = ensure(n + count)

  @inline def append(x: Double, y: Double, he: Double, d: Double, maxD: Double): Unit = {
    put(n, x, y, he, d, maxD)
    n += 1
  }

  /** Restore the heap property after `count` appended records, with the
    * batch-vs-size policy Rust's `BinaryHeap::extend` uses (full Floyd
    * rebuild when the batch rivals the existing heap — element footprint
    * 40 bytes gives the 2048/40 = 51 small-heap hybrid threshold).
    */
  def finishExtend(count: Int): Unit = {
    val start = n - count
    val betterToRebuild =
      if (start < count) true
      else if (n <= 51) count > n / 2
      else count > n / 4
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
    // fl(minDistance * minDistance), maintained alongside. The edge scan
    // works on SQUARED distances and takes the (expensive, serial-port)
    // sqrt/div only for edges that can still beat the minimum: IEEE-754
    // sqrt is monotone and sqrt(fl(m*m)) == m exactly, so an edge with
    // squared distance >= minSq can never produce d < minDistance — the
    // per-edge result (and hence the final value) is BIT-IDENTICAL to
    // calling Geom.segmentDistance on every edge, ~nEdges sqrt+div ops
    // cheaper per probe.
    var minSq = Double.PositiveInfinity
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
        val skipDist = dx * dx + dy * dy >= minSq

        // edges here can only flip parity if the bbox straddles y and
        // extends right of x
        val skipCross = py < bminY || py >= bmaxY || px > bmaxX

        if (!(skipDist && skipCross)) {
          val xs = r.xs; val ys = r.ys
          var i = start
          while (i < end) {
            val ax = xs(i); val ay = ys(i)
            val bx = xs(i + 1); val by = ys(i + 1)
            if (!skipCross &&
                ((ay > py) != (by > py)) &&
                (px < (bx - ax) * (py - ay) / (by - ay) + ax)) {
              inside = !inside
            }
            if (!skipDist) {
              // Geom.segmentDistance inlined with squared-distance gating;
              // every arithmetic expression that can win keeps its exact
              // original shape (same ops, same order)
              // ux/uy = px-ax / py-ay reused across dot, cross, and the
              // endpoint-a norm: IEEE negation and sign-symmetric multiply
              // keep every reused expression bit-equal to the originals
              val ex = bx - ax; val ey = by - ay
              val ux = px - ax; val uy = py - ay
              if (ex == 0.0 && ey == 0.0) {
                val q = ux * ux + uy * uy
                if (q < minSq) {
                  val d = math.sqrt(q)
                  if (d < minDistance) { minDistance = d; minSq = d * d }
                }
              } else {
                val d2 = ex * ex + ey * ey
                val dot = ux * ex + uy * ey
                // branch tests dot<=0 / dot>=d2 — the SAME classification
                // Geom.segmentDistance uses, so kernel and per-edge
                // surfaces agree bit-for-bit (property-checked); avoiding
                // the division here is the measured round-2 kernel win
                if (dot <= 0.0) {
                  val q = ux * ux + uy * uy
                  if (q < minSq) {
                    val d = math.sqrt(q)
                    if (d < minDistance) { minDistance = d; minSq = d * d }
                  }
                } else if (dot >= d2) {
                  val vx = bx - px; val vy = by - py
                  val q = vx * vx + vy * vy
                  if (q < minSq) {
                    val d = math.sqrt(q)
                    if (d < minDistance) { minDistance = d; minSq = d * d }
                  }
                } else {
                  // == fl((ay-py)*ex) - fl((ax-px)*ey) by sign symmetry
                  val cross = ux * ey - uy * ex
                  // (|cross|/d2*sqrt(d2))^2 == cross^2/d2 up to a few ulp;
                  // the 1e-9 relative slack over-admits candidates, never
                  // rejects a true winner. cross^2 can overflow to +Inf
                  // for ~1e160-scale coordinates while cross/d2 is still
                  // finite — an overflowed gate must ADMIT (compute the
                  // exact distance), not skip the edge.
                  val cc = cross * cross
                  if (cc < minSq * d2 * 1.000000001 || cc == Double.PositiveInfinity) {
                    val s = cross / d2
                    val d = math.abs(s) * math.sqrt(d2)
                    if (d < minDistance) { minDistance = d; minSq = d * d }
                  }
                }
              }
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

  @inline private def appendCell(queue: CellHeap, cx: Double, cy: Double,
                                 halfExtent: Double, rings: Array[PreparedRing]): Unit = {
    val d = signedDistance(cx, cy, rings)
    queue.append(cx, cy, halfExtent, d, d + halfExtent * Sqrt2)
  }

  /** Typed error surface (SURVEY.md K15): the reference's two distinct
    * failure codes, /root/reference/src/errors.rs:8-13. The SQL expression
    * surface collapses both to the (NaN, NaN, NaN) sentinel like the
    * reference's C ABI; this Dataset-side ADT preserves them.
    */
  sealed abstract class PolylabelError(val message: String)
  object PolylabelError {
    /** reference src/errors.rs:9-10 (centroid() returned None) */
    case object CentroidCalculation
      extends PolylabelError("Couldn't calculate a centroid for the input Polygon")
    /** reference src/errors.rs:11-12 (bounding_rect() returned None) */
    case object RectCalculation
      extends PolylabelError("Couldn't calculate a bounding box for the input Polygon")
  }

  /** Compute the pole of inaccessibility of `poly` to within `tolerance`.
    * Degenerate polygons (zero signed area) yield (0,0); zero-extent
    * bounding boxes yield the bbox min corner — both per the reference's
    * short-circuits (src/lib.rs:340-352). Throws on error; use
    * [[polylabelEither]] for the typed error surface.
    */
  def polylabel(poly: PolygonG, tolerance: Double): LabelResult =
    polylabelEither(poly, tolerance) match {
      case Right(r) => r
      case Left(e) => throw new IllegalArgumentException(e.message)
    }

  /** Result-typed variant preserving the reference's error distinction
    * (src/lib.rs:345-347 RectCalculation, :361-363 CentroidCalculation).
    */
  def polylabelEither(poly: PolygonG,
                      tolerance: Double): Either[PolylabelError, LabelResult] = {
    // The reference accepts any tolerance but never terminates for
    // tolerance <= 0 or NaN (the prune test `max - best <= tol` can never
    // fire while half-extents stay positive). Those inputs are rejected
    // here; the SQL surface maps this to the (NaN, NaN) error sentinel.
    require(tolerance > 0.0 && !tolerance.isInfinity,
      s"tolerance must be a finite positive number, got $tolerance")
    if (Geom.signedArea(poly) == 0.0) return Right(LabelResult(0.0, 0.0, 0.0))

    // reference src/lib.rs:345-347: no usable bounding rect -> error.
    // Reachable with an empty exterior or non-finite coordinates (NaN
    // vertices give a NaN signed area, which passes the == 0 guard).
    if (poly.exterior.xs.length == 0) return Left(PolylabelError.RectCalculation)
    val bbox = Geom.boundingRect(poly.exterior)
    if (!java.lang.Double.isFinite(bbox.width) || !java.lang.Double.isFinite(bbox.height))
      return Left(PolylabelError.RectCalculation)
    val cellSize = math.min(bbox.width, bbox.height)
    if (cellSize == 0.0) return Right(LabelResult(bbox.minX, bbox.minY, 0.0))

    // reference src/lib.rs:361-363: centroid failure is a DISTINCT error.
    // Reachable with finite bbox but overflowing shoelace accumulators
    // (coordinates near DBL_MAX): the centroid comes out non-finite.
    val c = Geom.centroid(poly) match {
      case Some(p) if java.lang.Double.isFinite(p.x) && java.lang.Double.isFinite(p.y) => p
      case _ => return Left(PolylabelError.CentroidCalculation)
    }
    Right(search(poly, tolerance, bbox, cellSize, c))
  }

  private def search(poly: PolygonG, tolerance: Double, bbox: Rect2,
                     cellSize: Double, c: Pt): LabelResult = {
    var halfExtent = cellSize / 2.0
    val rings = prepare(poly)

    // initial guesses: polygon centroid and bbox center, with the
    // reference's seed selection (src/lib.rs:361-374)
    val centroidDist = signedDistance(c.x, c.y, rings)
    val bboxDist = signedDistance(bbox.centerX, bbox.centerY, rings)
    var bestX = c.x; var bestY = c.y; var bestDist = centroidDist
    if (bboxDist < centroidDist) {
      bestX = bbox.centerX; bestY = bbox.centerY; bestDist = bboxDist
    }

    // seed the queue with a regular grid of cells of size cellSize.
    // Guard the grid size: extreme aspect ratios (> ~6.7e7) make nx*ny
    // exceed any sane allocation (and would overflow the Int cast). Do
    // NOT skip seeding in that case (an empty queue would silently return
    // the centroid/bbox seed, violating the tolerance contract with no
    // signal) — clamp to <= 4096 cells along the long axis and grow the
    // seed cell to match: maxDistance = d + halfExtent*sqrt(2) is a valid
    // upper bound for ANY cell size, so branch-and-bound still refines to
    // the requested tolerance, just from a coarser start. One genuine
    // escape hatch remains: when even the FINAL refinement breadth
    // (~longSide/tolerance cells) blows the same budget, the clamped
    // cascade would grind ~forever (every along-ridge cell splits until
    // halfExtent ~ tolerance) and a hang is strictly worse than the
    // reference's own degradation on such inputs (its usize grid fails
    // allocation) — those keep the seed-only fallback, explicitly.
    val queue = new CellHeap()
    var gridCellSize = halfExtent * 2.0
    var seedHalf = halfExtent
    var nx = math.ceil(bbox.width / gridCellSize).toLong
    var ny = math.ceil(bbox.height / gridCellSize).toLong
    if (nx > (1L << 26) || ny > (1L << 26) || nx * ny > (1L << 26)) {
      if (math.max(bbox.width, bbox.height) / tolerance <= (1L << 26).toDouble) {
        gridCellSize = math.max(gridCellSize, math.max(bbox.width, bbox.height) / 4096.0)
        seedHalf = gridCellSize / 2.0
        nx = math.ceil(bbox.width / gridCellSize).toLong
        ny = math.ceil(bbox.height / gridCellSize).toLong
      } else {
        nx = 0L; ny = 0L // intractable extent/tolerance: seed-only
      }
    }
    val nCells = nx * ny
    if (nCells > 0) {
      queue.beginExtend(nCells.toInt)
      var gx = 0L
      while (gx < nx) {
        var gy = 0L
        while (gy < ny) {
          val px = (bbox.minX + gx.toDouble * gridCellSize) + seedHalf
          val py = (bbox.minY + gy.toDouble * gridCellSize) + seedHalf
          appendCell(queue, px, py, seedHalf, rings)
          gy += 1
        }
        gx += 1
      }
      queue.finishExtend(nCells.toInt)
    }

    // branch-and-bound: pop the cell with the best upper bound; prune when
    // it cannot beat the current best by more than tolerance; else split
    while (queue.nonEmpty) {
      queue.pop()
      val cellX = queue.cx; val cellY = queue.cy
      if (queue.distance > bestDist) {
        bestX = cellX; bestY = cellY; bestDist = queue.distance
      }
      if (queue.maxDistance - bestDist > tolerance) {
        halfExtent = queue.halfExtent / 2.0
        queue.beginExtend(4)
        appendCell(queue, cellX - halfExtent, cellY - halfExtent, halfExtent, rings)
        appendCell(queue, cellX + halfExtent, cellY - halfExtent, halfExtent, rings)
        appendCell(queue, cellX - halfExtent, cellY + halfExtent, halfExtent, rings)
        appendCell(queue, cellX + halfExtent, cellY + halfExtent, halfExtent, rings)
        queue.finishExtend(4)
      }
    }

    LabelResult(bestX, bestY, bestDist)
  }
}
