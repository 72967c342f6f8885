package graft.operators

import graft.functions.GraftFunctions._
import graft.geom.CellIndex
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed spatial joins (SURVEY.md §2.2 E7-E9), built the Spark-first
  * way: declarative cell equi-joins that Catalyst/AQE can plan (broadcast
  * vs sort-merge, skew splitting), with the exact geometry refine as a
  * post-join filter expression. No theta joins, no cross joins on the hot
  * path, no driver-side loops over rows.
  */
object SpatialJoins {

  /** Point-in-polygon join.
    *
    * points:   (..., x: double, y: double)
    * polygons: (poly_id, exterior, holes)
    *
    * Stage 1 — prefilter: explode each polygon's exact cell cover at
    * `level` and equi-join on the point's cell (the shuffle key is a
    * single long — dense, salt-able, AQE-splittable). Stage 2 — refine:
    * exact ray-cast `pip`. The cover is exact (cells intersecting the
    * polygon), so prefilter ⊇ truth and refine ⊆ prefilter = truth.
    *
    * `broadcastPolygons` hints the exploded polygon side as the build
    * side — right whenever polygons ≪ points (the common case at scale:
    * dimension-table-sized vector data joined against a petabyte fact
    * table of points).
    */
  def pipJoin(points: DataFrame, polygons: DataFrame, level: Int,
              broadcastPolygons: Boolean = true): DataFrame = {
    val cover = polygons
      .withColumn("cell_id", explode(polygon_cover(col("exterior"), col("holes"), lit(level))))
    val build = if (broadcastPolygons) broadcast(cover) else cover
    points
      .withColumn("cell_id", cell_of(col("x"), col("y"), lit(level)))
      .join(build, "cell_id")
      .where(pip(col("x"), col("y"), col("exterior"), col("holes")))
      .drop("cell_id", "exterior", "holes", "tolerance")
  }

  /** PIP join with explicit salting for hot cells (E8): dense point
    * regions joined against mega-polygon covers make single cell_ids
    * carry a disproportionate share of the shuffle. Points get a
    * deterministic salt in [0, salt); the polygon side replicates each
    * cover cell across all salt values, so one hot cell fans out over
    * `salt` shuffle partitions. Use the unsalted variant + AQE when in
    * doubt; this one is for known-pathological skew.
    */
  def pipJoinSalted(points: DataFrame, polygons: DataFrame, level: Int,
                    salt: Int): DataFrame = {
    val cover = polygons
      .withColumn("cell_id", explode(polygon_cover(col("exterior"), col("holes"), lit(level))))
      .withColumn("salt", explode(lit((0 until salt).toArray)))
    points
      .withColumn("cell_id", cell_of(col("x"), col("y"), lit(level)))
      .withColumn("salt", pmod(xxhash64(col("x"), col("y")), lit(salt)).cast("int"))
      .join(cover, Seq("cell_id", "salt"))
      .where(pip(col("x"), col("y"), col("exterior"), col("holes")))
      .drop("cell_id", "salt", "exterior", "holes", "tolerance")
  }

  /** k-nearest-neighbour join: for every point, the k nearest label
    * points (EDBT'12-style cell-ring expansion, SURVEY.md E9).
    *
    * points: (point_id, x, y);  labels: (poly_id, lx, ly)
    *
    * Rounds with growing Chebyshev ring radius r: candidates = equi-join
    * on the exploded kRing(cell, r) of each unresolved point. A point is
    * resolved when it has >= k candidates AND its kth distance is
    * <= r * cellSize — the geometric guarantee that nothing outside the
    * ring can be closer. Unresolved points (sparse regions) go to the
    * next round; the final fallback is a broadcast of the (tiny) leftover
    * point set against all labels. Output: (point cols, poly_id, dist, rank).
    */
  def knnJoin(points: DataFrame, labels: DataFrame, k: Int, level: Int,
              rounds: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    val cellW = CellIndex.SpanX / CellIndex.gridSize(level).toDouble
    val cellH = CellIndex.SpanY / CellIndex.gridSize(level).toDouble
    val minDim = math.min(cellW, cellH)

    val lab = labels
      .withColumn("lcell", cell_of(col("lx"), col("ly"), lit(level)))
      .select("poly_id", "lx", "ly", "lcell")

    // rank on SQUARED distance (exact arithmetic — products and sums only),
    // so rankings are reproducible bit-for-bit by any engine; sqrt only for
    // the reported dist column. (A collect_list/sort_array hash-agg variant
    // was measured ~2x slower than the window sort here — array buffering
    // beats Tungsten's radix sort only for much larger per-key fan-in.)
    val w = Window.partitionBy("point_id").orderBy(col("d2"), col("poly_id"))

    def topk(cand: DataFrame): DataFrame = cand
      .withColumn("d2", (col("x") - col("lx")) * (col("x") - col("lx")) +
        (col("y") - col("ly")) * (col("y") - col("ly")))
      .withColumn("dist", sqrt(col("d2")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)

    import org.apache.spark.storage.StorageLevel
    var unresolved = points
      .select(col("point_id"), col("x"), col("y"))
      .withColumn("pcell", cell_of(col("x"), col("y"), lit(level)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var resolvedParts = List.empty[DataFrame]

    for (r <- rounds) {
      val cand = unresolved
        .withColumn("ncell", explode(cell_kring(col("pcell"), lit(r))))
        .join(broadcast(lab), col("ncell") === col("lcell"))
        .drop("ncell", "lcell")
      // persisted: `ranked` feeds both the resolution test and the output,
      // and `unresolved` would otherwise re-derive every earlier round's
      // join inside its lineage; trimmed to the output columns so the
      // cached footprint stays small
      val ranked = topk(cand)
        .select("point_id", "x", "y", "poly_id", "d2", "dist", "rank")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val kth = ranked.groupBy("point_id")
        .agg(max(col("d2")).as("kth_d2"), count(lit(1)).as("n_cand"))
        .where(col("n_cand") >= k && col("kth_d2") <= lit((r * minDim) * (r * minDim)))
        .select(col("point_id").as("ok_id"))
      resolvedParts ::= ranked.join(kth, ranked("point_id") === kth("ok_id"), "left_semi")
      unresolved = unresolved.join(kth, unresolved("point_id") === kth("ok_id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    // fallback: whatever is left (isolated points) against all labels
    val fallback = topk(unresolved.crossJoin(broadcast(lab)).drop("lcell"))
      .select("point_id", "x", "y", "poly_id", "d2", "dist", "rank")
    (fallback :: resolvedParts).reduce(_ unionByName _)
  }
}
