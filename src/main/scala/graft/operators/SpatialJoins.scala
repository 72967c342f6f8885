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
    * The broadcast path uses TWO SLIM broadcasts instead of one fat one:
    * the per-cell fan-out carries only (cell_id, poly_id) and the geometry
    * is broadcast once per polygon for the refine. Broadcasting geometry
    * per cover cell made the (single-threaded) broadcast-relation build
    * the dominant serial fraction at high parallelism — measured as the
    * round-1 pip_join scaling-efficiency miss (0.43).
    *
    * `broadcastPolygons`: Some(true)/Some(false) force the path; None
    * (default) broadcasts unless the polygon side's optimizer stats are
    * file-backed AND above 16x autoBroadcastJoinThreshold — a mega-polygon
    * parquet table routes to the sort-merge path automatically (AQE still
    * splits skewed cells), while synthesized/unknown-stats dimension
    * tables keep the broadcast.
    */
  def pipJoin(points: DataFrame, polygons: DataFrame, level: Int,
              broadcastPolygons: Option[Boolean] = None): DataFrame = {
    val spark = points.sparkSession
    val doBroadcast = broadcastPolygons.getOrElse {
      val thr = spark.sessionState.conf.autoBroadcastJoinThreshold
      if (thr <= 0) false // user disabled broadcasting entirely — honor it
      else {
        val st = polygons.queryExecution.optimizedPlan.stats
        // "unknown stats" means EXACTLY the conf's defaultSizeInBytes
        // sentinel (a stat-less leaf): that reads as the dimension-table
        // assumption (a caller with a genuinely huge stats-less table
        // passes Some(false)). A plan whose estimate merely multiplied
        // its way to a huge number is KNOWN-huge — no broadcast.
        val unknown =
          st.sizeInBytes == BigInt(spark.sessionState.conf.defaultSizeInBytes)
        if (unknown) true
        else {
          // size what is actually broadcast: the slim (cell_id, poly_id)
          // cover fan-out (16 B x cells-per-polygon; rowCount when CBO
          // stats exist, else geometry bytes as a same-order proxy — a
          // ~100-vertex polygon's geometry and its ~64-cell cover rows
          // are comparable) PLUS the geometry once per polygon
          val coverBytes = st.rowCount.map(rc => rc * 16 * 64)
            .getOrElse(st.sizeInBytes)
          st.sizeInBytes + coverBytes <= BigInt(thr) * 16
        }
      }
    }
    val pts = points.withColumn("cell_id", cell_of(col("x"), col("y"), lit(level)))
    val joined = if (doBroadcast) {
      val cellMap = polygons.select(col("poly_id"),
        explode(polygon_cover(col("exterior"), col("holes"), lit(level))).as("cell_id"))
      pts.join(broadcast(cellMap), "cell_id")
        .join(broadcast(polygons), "poly_id")
    } else {
      // shuffle path: one sort-merge on the dense int64 cell key with the
      // geometry riding along (a second shuffle of the prefiltered
      // intermediate would cost more than the cover replication)
      val cover = polygons
        .withColumn("cell_id", explode(polygon_cover(col("exterior"), col("holes"), lit(level))))
      pts.join(cover, "cell_id")
    }
    joined
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
    *
    * `broadcastLabels = true` assumes the label set fits on every executor
    * (dimension-table case). With false, NEITHER side is broadcast: each
    * label is replicated into the kRing of its own cell (Chebyshev rings
    * are symmetric, so the candidate set is identical) and the join is a
    * shuffle on the cell key — the path for label sets that rival the
    * point set in size (both sides co-partition by cell).
    *
    * Rounds are materialized eagerly (count per round): that enables
    * early-exit when everything is resolved and lets each superseded
    * round's cache be dropped immediately. The returned DataFrame is
    * itself materialized+cached and all intermediates unpersisted — no
    * cached state leaks beyond the (output-sized) result; callers drop
    * the result with `unpersist()` (or `Caching.release`) when done.
    *
    * CARRY-FORWARD (`carryForward = true`, off by default): round r+1
    * reuses the previous round's candidates — cached UNPRUNED, restricted
    * to surviving points — and explodes only the NEW ring shell
    * (`cell_annulus(prevR, r]`); Chebyshev disks nest, so the candidate
    * set is identical to the full re-explode (SpatialJoinSpec asserts
    * output equality). MEASURED AND DEFAULTED OFF: making candidates
    * carriable forces materializing the unpruned candidate frame
    * (points x ring cells x label density rows — ~190M rows / ~8 GB at
    * bench scale 32), and that materialization took the 8-core bench
    * round from ~30 s to 346 s. With a well-chosen cell level almost
    * every point resolves in round 1, so re-exploding the small
    * unresolved TAIL (the default) is strictly cheaper than storing
    * everything in case it is needed. The option remains for workloads
    * whose label density forces most points through many rounds.
    *
    * LINEAGE TRUNCATION: the unresolved-points chain (and the carried
    * candidates in carry mode) is materialized with an EAGER
    * `localCheckpoint`, not a bare persist. An iterative chain of
    * persisted frames keeps its full LOGICAL lineage, and this loop's
    * lineage otherwise grows exponentially in the round count (each
    * round references the previous unresolved set twice) — measured: a
    * 5-round run built a 2.1 GB plan string and OOM'd the driver inside
    * AQE's plan-update logging. The checkpoint replaces the chain's plan
    * with a LogicalRDD leaf, so every round's plan is constant-size.
    * Eager is load-bearing: a lazy local checkpoint first computed inside
    * an AQE shuffle-map stage (submitMapStage skips `doCheckpoint`) never
    * finalizes, and releasing it then poisons every later job that walks
    * the lineage. Round outputs (`ranked`) and the result stay COLUMNAR
    * persists — InMemoryRelation scans measured ~4x faster than
    * row-format checkpoint blocks at bench scale 32 — and nothing is
    * released until the result is materialized, because a result branch
    * whose cache substitution misses may recompute through these blocks,
    * and a released local checkpoint on that path is unrecoverable
    * (blocks are not rebuildable on executor loss — the standard
    * iterative-Spark trade, bounded to this operator's lifetime).
    */
  def knnJoin(points: DataFrame, labels: DataFrame, k: Int, level: Int,
              rounds: Seq[Int] = Seq(1, 2, 4, 8),
              broadcastLabels: Boolean = true,
              carryForward: Boolean = false): DataFrame = {
    val cellW = CellIndex.SpanX / CellIndex.gridSize(level).toDouble
    val cellH = CellIndex.SpanY / CellIndex.gridSize(level).toDouble
    val minDim = math.min(cellW, cellH)

    // materialized once: every round (and the fallback) rebuilds its
    // broadcast from `lab`, and without the cache each build re-runs the
    // label-side lineage (often a polylabel computation) as its own
    // serial-ish job — measured as part of the operator's
    // parallelism-insensitive cost
    val lab = labels
      .withColumn("lcell", cell_of(col("lx"), col("ly"), lit(level)))
      .select("poly_id", "lx", "ly", "lcell")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // rank on SQUARED distance (exact arithmetic — products and sums only),
    // so rankings are reproducible bit-for-bit by any engine; sqrt only for
    // the reported dist column. Window row_number is the measured winner
    // here (a collect_list hash-agg was 2x slower; a bounded
    // TypedImperativeAggregate was 4-8x slower — per-key Java buffers
    // thrash the GC at millions of groups).
    val w = Window.partitionBy("point_id").orderBy(col("d2"), col("poly_id"))

    def withD2(cand: DataFrame): DataFrame = cand
      .withColumn("d2", (col("x") - col("lx")) * (col("x") - col("lx")) +
        (col("y") - col("ly")) * (col("y") - col("ly")))
      .select("point_id", "x", "y", "poly_id", "d2")

    var unresolved = truncated(points
      .select(col("point_id"), col("x"), col("y"))
      .withColumn("pcell", cell_of(col("x"), col("y"), lit(level))))
    // round 1 always runs — its own count() establishes the real number;
    // an up-front count of the input would cost one full extra pass
    var nLeft = Long.MaxValue
    var resolvedParts = List.empty[DataFrame]
    var carried: DataFrame = null // prev round's UNPRUNED candidates, cached
    var prevR = 0
    val cacheHandles = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val releaseHandles = scala.collection.mutable.ListBuffer.empty[DataFrame]

    val it = rounds.iterator
    while (it.hasNext && nLeft > 0) {
      val r = it.next()
      // in carry mode, rounds after the first explode only the new shell;
      // in the default mode every round explodes the full disk for the
      // (small) unresolved tail
      val fullDisk = !carryForward || carried == null
      val newCand = roundCandidates(unresolved, lab, r, prevR,
        first = fullDisk, broadcastLabels = broadcastLabels)
      // Default path: the full-disk candidates are computed LAZILY inside
      // the ranking job and pruned before its exchange — never stored.
      // Carry-forward path: carried (restricted to surviving points — no
      // broadcast hint, AQE picks one when small) union the new shell,
      // materialized unpruned for the next round (see the trade-off note
      // in the scaladoc).
      val candAll =
        if (!carryForward) withD2(newCand)
        else truncated(
          if (carried == null) withD2(newCand)
          else carried
            .join(unresolved.select("point_id"), Seq("point_id"), "leftsemi")
            .unionByName(withD2(newCand)))

      // One window pass carries BOTH the ranking and the resolution proof.
      // The <= rad2 prune is lossless: a point resolves at ring radius r
      // iff it has >= k candidates with d2 <= (r*minDim)^2 (if the k
      // nearest are within the guarantee radius they all survive the
      // filter; if not, the filtered count is < k and the point carries to
      // the next round) — so `count() over (partition by point_id)` after
      // the rank filter replaces a separate kth-aggregate stage and the
      // resolved-semi-join stage; the same exchange serves both windows.
      val rad2 = (r * minDim) * (r * minDim)
      val wc = Window.partitionBy("point_id")
      val ranked = candAll.where(col("d2") <= rad2)
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .withColumn("n_cand", count(lit(1)).over(wc))
      // What gets cached is the round's RESOLVED OUTPUT SLICE — as a
      // DIRECTLY-persisted columnar dataset, not a filtered view over a
      // cached `ranked`. The result union only substitutes a branch's
      // cache when the branch IS the cached dataset (measured: a union of
      // directly-cached parts reads buffers in ~1 s where the
      // filtered-view formulation recomputed every round's window
      // pipeline — a flat, memory-bandwidth-bound ~14 s at ANY core
      // count, the dominant parallelism-insensitive cost of this
      // operator). `dist` is computed here, after the rank filter — the
      // window exchange carries d2 only, not a redundant sqrt column.
      val part = ranked.where(col("n_cand") >= k)
        .withColumn("dist", sqrt(col("d2")))
        .select("point_id", "x", "y", "poly_id", "d2", "dist", "rank")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      resolvedParts ::= part
      cacheHandles += part
      // resolved ids come off the part's cache (rank==1 marks each
      // resolved point exactly once)
      val okIds = part.where(col("rank") === 1).select(col("point_id").as("ok_id"))
      val t0 = System.nanoTime()
      val next = truncated(
        unresolved.join(okIds, unresolved("point_id") === okIds("ok_id"), "left_anti"))
      val tCkpt = System.nanoTime()
      nLeft = next.count()
      if (sys.env.contains("SPARK_GRAFT_KNN_DEBUG"))
        System.err.println(f"[knn] round r=$r ckpt=${(tCkpt - t0) / 1e9}%.2f s " +
          f"count=${(System.nanoTime() - tCkpt) / 1e9}%.2f s nLeft=$nLeft")
      // NOTHING is released mid-loop: the result assembly below may
      // recompute a branch whose lineage reads these blocks (cache
      // substitution is not guaranteed across the union), and a released
      // local checkpoint in that path is an unrecoverable error — the
      // measured crash mode. All storage is dropped together after the
      // result is materialized; MEMORY_AND_DISK spills rather than OOMs
      // in the meantime.
      releaseHandles += unresolved
      if (carryForward) {
        if (carried != null) releaseHandles += carried
        carried = candAll
      }
      prevR = r
      unresolved = next
    }
    // fallback: whatever is left (isolated points) against all labels —
    // skipped outright when the rounds resolved everything (the empty
    // cross join still costs a window stage otherwise)
    val parts =
      if (nLeft == 0) resolvedParts
      else {
        val leftover = unresolved.crossJoin(if (broadcastLabels) broadcast(lab) else lab)
        withD2(leftover)
          .withColumn("dist", sqrt(col("d2")))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= k)
          .select("point_id", "x", "y", "poly_id", "d2", "dist", "rank") :: resolvedParts
      }
    val tRes = System.nanoTime()
    val result = parts.reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    if (sys.env.contains("SPARK_GRAFT_KNN_DEBUG"))
      System.err.println(f"[knn] result assembly=${(System.nanoTime() - tRes) / 1e9}%.2f s")
    cacheHandles.foreach(_.unpersist(blocking = false))
    releaseHandles.foreach(release)
    if (carried != null) release(carried)
    release(unresolved)
    lab.unpersist(blocking = false)
    result
  }

  /** One round's NEW candidate pairs: explode the (first round) full
    * Chebyshev disk or (later rounds) only the annulus shell of each
    * unresolved point, equi-join against the labels — broadcast for
    * dimension-sized label sets, symmetric cell-shuffle otherwise.
    * Package-private so PlanSpec can audit the physical shape directly
    * (the executed round plans hide behind the lineage-truncation
    * boundary in the composed operator).
    */
  private[graft] def roundCandidates(unresolved: DataFrame, lab: DataFrame,
      r: Int, prevR: Int, first: Boolean, broadcastLabels: Boolean): DataFrame =
    if (broadcastLabels) {
      val ring = if (first) cell_kring(col("pcell"), lit(r))
        else cell_annulus(col("pcell"), lit(prevR), lit(r))
      unresolved
        .withColumn("ncell", explode(ring))
        .join(broadcast(lab), col("ncell") === col("lcell"))
        .drop("ncell", "lcell")
    } else {
      // symmetric formulation: replicate each LABEL into the ring of its
      // own cell and shuffle-join on the point's cell — identical
      // candidate set (Chebyshev rings are symmetric), no broadcast
      val ring = if (first) cell_kring(col("lcell"), lit(r))
        else cell_annulus(col("lcell"), lit(prevR), lit(r))
      val labRinged = lab.withColumn("rcell", explode(ring)).drop("lcell")
      unresolved.join(labRinged, col("pcell") === col("rcell")).drop("rcell")
    }

  /** Materialize-and-truncate for the iterative kNN loop: an EAGER local
    * checkpoint replaces the frame's logical plan with a LogicalRDD leaf
    * over materialized MEMORY_AND_DISK blocks. Eager is load-bearing, not
    * a convenience: a LAZY local checkpoint only finalizes in a job that
    * calls `rdd.doCheckpoint()`, and AQE materializes shuffle-map stages
    * through `submitMapStage`, which doesn't — the checkpoint then stays
    * pending forever, and releasing its blocks leaves a marked-but-
    * incomplete RDD that ANY later job touching the lineage trips over
    * ("storage level not appropriate for local checkpointing" assertion;
    * reproduced by graft.Bench's knn workload). Eager finalization also
    * clears the dependency chain, which is the lineage cut we want.
    */
  private def truncated(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true)

  /** Release the blocks behind a [[truncated]] frame. */
  private def release(df: DataFrame): Unit = Caching.release(df)
}
