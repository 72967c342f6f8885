package graft

import graft.operators.SpatialJoins
import graft.sources.GeoTables
import org.apache.spark.sql.functions._

/** A/B harnesses for structural plan decisions — each mode runs the same
  * workload under both formulations in one JVM (interleaved, min-able by
  * re-running) and prints per-pass seconds. Evidence lands in COVERAGE.md
  * next to the decision it justifies.
  *
  * {{{
  *   sbt "runMain graft.AbBench pip_shuffle [copies] [points] [level]"
  * }}}
  */
object AbBench {
  def main(args: Array[String]): Unit = args.headOption match {
    case Some("pip_shuffle") => pipShuffle(
      args.lift(1).map(_.toInt).getOrElse(30),
      args.lift(2).map(_.toLong).getOrElse(2000000L),
      args.lift(3).map(_.toInt).getOrElse(10))
    case Some("knn_rounds") => knnRounds(
      args.lift(1).map(_.toLong).getOrElse(3200000L))
    case Some("knn_slim") => knnSlim(
      args.lift(1).map(_.toLong).getOrElse(3200000L),
      args.lift(2).map(_.toInt).getOrElse(32))
    case other => sys.error(s"unknown A/B mode: $other")
  }

  /** kNN window payload: slim (point_id, poly_id, d2) through the ranking
    * exchange + output-sized x,y re-join (slimWindow=true, the default)
    * vs x,y riding every candidate through the window sort. `cores` lets
    * the A/B run at both sides of a scaling pair — the slim shape exists
    * to cut the bandwidth-bound bytes that cap kNN's N->4N efficiency.
    */
  private def knnSlim(nPts: Long, cores: Int): Unit = {
    val spark = GraftSession.create(s"local[$cores]",
      math.max(128, (nPts / 50000L).toInt), "graft-ab-knn-slim")
    import spark.implicits._
    val polys = GeoTables.syntheticPolygons(spark, 2000).toDF
    val labels = polys
      .withColumn("label", graft.functions.GraftFunctions.polylabel(
        $"exterior", $"holes", $"tolerance"))
      .select($"poly_id", $"label.x".as("lx"), $"label.y".as("ly"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    labels.count()
    val pts = GeoTables.syntheticPoints(spark, nPts).toDF
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pts.count()
    for (pass <- 1 to Option(System.getenv("AB_PASSES")).map(_.toInt).getOrElse(2);
         (tag, slim, xy) <- Seq(("fat", false, true), ("slim", true, true),
           ("noxy", true, false))) {
      val t0 = System.nanoTime()
      val out = SpatialJoins.knnJoin(pts, labels, k = 5, level = 7,
        rounds = Seq(1, 2), slimWindow = slim, outputXY = xy)
      out.write.format("noop").mode("overwrite").save()
      graft.operators.Caching.release(out)
      println(f"[ab knn_slim] pass=$pass variant=$tag cores=$cores pts=$nPts " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }

  /** kNN ring schedule: Seq(1,2) (narrow first round + annulus second)
    * vs the speculatively-batched Seq(2) (one kRing(2) explode resolving
    * both radii in a single window pass — provably the same output, the
    * resolution test subsumes both rounds' guarantees). Trades ~25/9 more
    * exploded candidate rows per point against one whole round of
    * per-round driver fixed cost (~12 stages) — the measured reason knn
    * scales worse than its siblings.
    */
  private def knnRounds(nPts: Long): Unit = {
    val spark = GraftSession.create("local[32]",
      math.max(128, (nPts / 50000L).toInt), "graft-ab-knn")
    import spark.implicits._
    val polys = GeoTables.syntheticPolygons(spark, 2000).toDF
    val labels = polys
      .withColumn("label", graft.functions.GraftFunctions.polylabel(
        $"exterior", $"holes", $"tolerance"))
      .select($"poly_id", $"label.x".as("lx"), $"label.y".as("ly"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    labels.count()
    val pts = GeoTables.syntheticPoints(spark, nPts).toDF
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pts.count()
    for (pass <- 1 to Option(System.getenv("AB_PASSES")).map(_.toInt).getOrElse(2);
         rounds <- Seq(Seq(1, 2), Seq(2))) {
      val t0 = System.nanoTime()
      val out = SpatialJoins.knnJoin(pts, labels, k = 5, level = 7, rounds = rounds)
      out.write.format("noop").mode("overwrite").save()
      graft.operators.Caching.release(out)
      println(f"[ab knn_rounds] pass=$pass rounds=${rounds.mkString("+")} pts=$nPts " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }

  /** pipJoin non-broadcast (shuffle) path: slim (cell_id, poly_id) cover +
    * geometry re-join vs geometry riding the cell shuffle once per cover
    * cell — the mega-polygon regime both paths exist for (Norway copies:
    * 8,854 vertices each, covers of thousands of cells).
    */
  private def pipShuffle(copies: Int, nPts: Long, level: Int): Unit = {
    val spark = GraftSession.create("local[32]", 64, "graft-ab-pip")
    // the A/B compares the two SHUFFLE formulations of the known-huge
    // polygon regime; at harness scale the optimizer's size estimates
    // would otherwise sneak a (mis-estimated, multi-GB) broadcast in
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._
    val nw = GeoTables.fixtures(spark).toDF.where($"poly_id" === "norway")
      .crossJoin(spark.range(copies).select($"id".as("copy")))
      .drop("poly_id").withColumn("poly_id", concat(lit("nw"), $"copy"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nw.count()
    val pts = GeoTables.syntheticPoints(spark, nPts).toDF
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pts.count()
    for (pass <- 1 to Option(System.getenv("AB_PASSES")).map(_.toInt).getOrElse(2); slim <- Seq(true, false)) {
      val t0 = System.nanoTime()
      SpatialJoins.pipJoin(pts, nw, level,
          broadcastPolygons = Some(false), slimShuffle = slim)
        .write.format("noop").mode("overwrite").save()
      println(f"[ab pip_shuffle] pass=$pass slim=$slim copies=$copies pts=$nPts " +
        f"level=$level  ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
