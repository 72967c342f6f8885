package graft.operators

import graft.TestSpark
import graft.functions.GraftFunctions._
import graft.sources.GeoTables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join correctness against brute-force oracles (SURVEY.md §5.2 item 3). */
class SpatialJoinSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val polys = GeoTables.syntheticPolygons(spark, 25).toDF.cache()
  private lazy val points = GeoTables.syntheticPoints(spark, 2000).toDF.cache()

  // drop the suite-level caches so suites sharing the session (e.g. the
  // global leak tripwires in Bench) never see this suite's blocks
  override def afterAll(): Unit = {
    polys.unpersist(blocking = false)
    points.unpersist(blocking = false)
  }

  test("pipJoin == brute-force cross-join PIP at several levels") {
    val brute = points.crossJoin(polys)
      .where(pip($"x", $"y", $"exterior", $"holes"))
      .select($"point_id", $"poly_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(brute.nonEmpty, "oracle must produce matches for the test to mean anything")
    for (level <- Seq(6, 9, 12); bcast <- Seq(Some(true), Some(false), None)) {
      val got = SpatialJoins.pipJoin(points, polys, level, bcast)
        .select($"point_id", $"poly_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === brute, s"level=$level broadcast=$bcast")
    }
  }

  test("pipJoin auto mode routes file-backed oversized polygon tables to sort-merge") {
    // write the polygon table to parquet so the optimizer has REAL size
    // stats, then shrink the broadcast threshold until the auto heuristic
    // (stats > 16x threshold) must refuse to broadcast
    val dir = java.nio.file.Files.createTempDirectory("graft_polyfile_").toString
    polys.write.mode("overwrite").parquet(dir)
    val filePolys = spark.read.parquet(dir)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64") // bytes
      val joined = SpatialJoins.pipJoin(points, filePolys, 9)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"auto mode must fall back to a shuffle join for oversized file-backed tables:\n$plan")
      // and the fallback path is still correct
      val brute = points.crossJoin(polys)
        .where(pip($"x", $"y", $"exterior", $"holes"))
        .select($"point_id", $"poly_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val got = joined.select($"point_id", $"poly_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === brute)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("pipJoinSalted == brute force") {
    val brute = points.crossJoin(polys)
      .where(pip($"x", $"y", $"exterior", $"holes"))
      .select($"point_id", $"poly_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = SpatialJoins.pipJoinSalted(points, polys, 9, salt = 4)
      .select($"point_id", $"poly_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === brute)
  }

  test("knnJoin == brute-force kNN (k=3)") {
    val labels = polys
      .withColumn("label", polylabel($"exterior", $"holes", $"tolerance"))
      .select($"poly_id", $"label.x".as("lx"), $"label.y".as("ly"))
      .cache()
    val k = 3
    val w = Window.partitionBy("point_id").orderBy($"d2", $"poly_id")
    val brute = points.crossJoin(labels)
      .withColumn("d2", ($"x" - $"lx") * ($"x" - $"lx") + ($"y" - $"ly") * ($"y" - $"ly"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"point_id", $"poly_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

    // the operator contract: callers own the returned frame's (adopted)
    // storage and MUST drop it with Caching.release — these tests also
    // guard the ComponentsSpec/CachingSpec global leak asserts downstream
    val gotDf = SpatialJoins.knnJoin(points, labels, k, level = 8)
    val got = gotDf.select($"point_id", $"poly_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    Caching.release(gotDf)
    assert(got === brute)

    // partitioned variant (no label broadcast): identical output
    val gotPartDf = SpatialJoins.knnJoin(points, labels, k, level = 8,
      broadcastLabels = false)
    val gotPart = gotPartDf.select($"point_id", $"poly_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    Caching.release(gotPartDf)
    labels.unpersist(blocking = false)
    assert(gotPart === brute)
  }

  test("radiusJoin == brute-force distance filter at several levels, both modes") {
    val labels = polys
      .withColumn("label", polylabel($"exterior", $"holes", $"tolerance"))
      .select($"poly_id", $"label.x".as("lx"), $"label.y".as("ly"))
      .cache()
    for (radius <- Seq(1.5, 6.0)) {
      val brute = points.crossJoin(labels)
        .where(($"x" - $"lx") * ($"x" - $"lx") + ($"y" - $"ly") * ($"y" - $"ly")
          <= lit(radius * radius))
        .select($"point_id", $"poly_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(brute.nonEmpty, s"radius $radius oracle must match something")
      // AutoLevel (k=1 ring), a coarser grid (whole disk inside one ring),
      // and a DELIBERATELY too-fine grid (k > 1: the boundary-straddle +1
      // must keep the ring cover lossless)
      for (level <- Seq(SpatialJoins.AutoLevel, 4, 9);
           bcast <- Seq(true, false)) {
        val out = SpatialJoins.radiusJoin(points, labels, radius,
          level = level, broadcastLabels = bcast)
        val got = out.select($"point_id", $"poly_id")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        assert(got === brute, s"radius=$radius level=$level broadcast=$bcast")
        if (level == 9 && !bcast) {
          val plan = out.queryExecution.executedPlan.toString
          assert(!plan.contains("Cartesian"),
            s"radius join must stay a cell equi-join:\n$plan")
        }
      }
    }
    labels.unpersist(blocking = false)
  }

  test("radiusAutoLevel: finest cell exceeding the radius, clamped at grid bounds") {
    assert(SpatialJoins.radiusAutoLevel(2.0) === 6)      // 180/64=2.81 > 2 > 180/128
    assert(SpatialJoins.radiusAutoLevel(200.0) === 0)    // radius > SpanY -> coarsest
    assert(SpatialJoins.radiusAutoLevel(1e-9) === 26)    // clamped at MaxLevel
  }

  test("knnJoin multi-round carry-forward: sparse labels, many rounds == brute") {
    // 25 labels over a level-11 grid: almost nothing resolves in round 1,
    // so rounds 2..4 exercise the carried-candidate union + annulus-shell
    // explode path specifically (and the fallback catches the rest)
    val labels = polys
      .withColumn("label", polylabel($"exterior", $"holes", $"tolerance"))
      .select($"poly_id", $"label.x".as("lx"), $"label.y".as("ly"))
    val k = 4
    val w = Window.partitionBy("point_id").orderBy($"d2", $"poly_id")
    val brute = points.limit(500).crossJoin(labels)
      .withColumn("d2", ($"x" - $"lx") * ($"x" - $"lx") + ($"y" - $"ly") * ($"y" - $"ly"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"point_id", $"poly_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    for (bcast <- Seq(true, false); carry <- Seq(false, true)) {
      val got = SpatialJoins.knnJoin(points.limit(500), labels, k, level = 11,
        rounds = Seq(1, 2, 4, 8, 16), broadcastLabels = bcast,
        carryForward = carry)
      val gotSet = got.select($"point_id", $"poly_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      Caching.release(got)
      assert(gotSet === brute, s"broadcastLabels=$bcast carryForward=$carry")
    }
  }

  test("knnJoin releases every cached intermediate (only the result stays)") {
    val labels = polys
      .withColumn("label", polylabel($"exterior", $"holes", $"tolerance"))
      .select($"poly_id", $"label.x".as("lx"), $"label.y".as("ly"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = SpatialJoins.knnJoin(points.limit(400), labels, 3, level = 9)
    out.count()
    Caching.release(out)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"knnJoin leaked ${leaked.size} cached RDD(s)")
  }

  test("knnJoin adaptive fallback: isolated points, huge label side, no cartesian anywhere") {
    // adversarial density-mismatch layout (the old cross-join fallback's
    // cliff): labels clustered in one corner, probe points isolated far
    // away, a fine grid level so the caller's rounds resolve NOTHING, and
    // cell-partitioned (non-broadcast) label mode
    val labels = spark.range(2000).select(
      concat(lit("L"), $"id").as("poly_id"),
      (($"id" % 40) / 20.0 + 100.0).as("lx"),   // lon 100..102
      (($"id" / 40 % 40) / 20.0 + 40.0).as("ly")) // lat 40..42
    val iso = spark.range(50).select(
      $"id".as("point_id"),
      ($"id" % 10 - 170.0).as("x"),             // lon -170..-160: far away
      ($"id" / 10 - 60.0).as("y"))              // lat -60..-56

    // every executed plan the operator runs goes past this listener;
    // the forbidden nodes are the unconditioned-product shapes
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit =
        plans.add(qe.executedPlan.toString)
    }
    spark.listenerManager.register(listener)
    val gotSet = try {
      val got = SpatialJoins.knnJoin(iso, labels, k = 3, level = 12,
        rounds = Seq(1, 2), broadcastLabels = false)
      val g = got.select($"point_id", $"poly_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      Caching.release(got)
      g
    } finally {
      // listener delivery is async; drain before unregistering/asserting
      Thread.sleep(1500)
      spark.listenerManager.unregister(listener)
    }
    // only operator-issued actions were captured (the brute-force oracle
    // below, which legitimately cross-joins, runs after unregistering)
    val offenders = plans.toArray(Array.empty[String]).filter(p =>
      p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
    assert(offenders.isEmpty,
      s"operator built a cartesian/BNLJ plan:\n${offenders.mkString("\n---\n")}")
    assert(plans.size > 0, "listener captured nothing — the audit didn't run")
    val w = Window.partitionBy("point_id").orderBy($"d2", $"poly_id")
    val brute = iso.crossJoin(labels)
      .withColumn("d2", ($"x" - $"lx") * ($"x" - $"lx") + ($"y" - $"ly") * ($"y" - $"ly"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= 3)
      .select($"point_id", $"poly_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(gotSet === brute, "adaptive fallback must still produce exact kNN")
  }

  test("knnJoin extension round shape: cell equi-join in both modes, broadcast only when asked") {
    val lab = spark.range(10).select(concat(lit("p"), $"id").as("poly_id"),
      ($"id" * 1.0).as("lx"), ($"id" * 0.5).as("ly"),
      cell_of($"id" * 1.0, $"id" * 0.5, lit(8)).as("lcell"))
    val pts = spark.range(20).select($"id".as("point_id"),
      ($"id" * 2.0 - 120.0).as("x"), ($"id" * 1.0 - 60.0).as("y"))
    for (bcast <- Seq(true, false)) {
      val plan = SpatialJoins.extensionCandidates(pts, lab, lvl = 5, broadcastLabels = bcast)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"extension round must stay an equi-join (bcast=$bcast):\n$plan")
      if (bcast) assert(plan.contains("BroadcastHashJoin"), s"dimension mode should broadcast:\n$plan")
    }
  }

  test("knnJoin resolves every point exactly k times") {
    val labels = polys
      .withColumn("label", polylabel($"exterior", $"holes", $"tolerance"))
      .select($"poly_id", $"label.x".as("lx"), $"label.y".as("ly"))
    val got = SpatialJoins.knnJoin(points.limit(300), labels, 2, level = 10)
    val counts = got.groupBy("point_id").count().select("count").distinct().collect()
    val nDistinct = got.select("point_id").distinct().count()
    Caching.release(got)
    assert(counts.map(_.getLong(0)).toSet === Set(2L))
    assert(nDistinct === 300)
  }

  test("AutoLevel (default level): pipJoin and knnJoin pick a level and stay exact") {
    val bruteP = points.crossJoin(polys)
      .where(pip($"x", $"y", $"exterior", $"holes"))
      .select($"point_id", $"poly_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val gotP = SpatialJoins.pipJoin(points, polys) // no level passed
      .select($"point_id", $"poly_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gotP === bruteP)

    val labels = polys
      .withColumn("label", polylabel($"exterior", $"holes", $"tolerance"))
      .select($"poly_id", $"label.x".as("lx"), $"label.y".as("ly"))
      .cache()
    val w = Window.partitionBy("point_id").orderBy($"d2", $"poly_id")
    val bruteK = points.crossJoin(labels)
      .withColumn("d2", ($"x" - $"lx") * ($"x" - $"lx") + ($"y" - $"ly") * ($"y" - $"ly"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= 3)
      .select($"point_id", $"poly_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val gotKDf = SpatialJoins.knnJoin(points, labels, 3) // no level passed
    val gotK = gotKDf.select($"point_id", $"poly_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    Caching.release(gotKDf)
    labels.unpersist(blocking = false)
    assert(gotK === bruteK)
  }

  test("autoLevel scales with polygon bbox; knnAutoLevel with label count") {
    def rects(hw: Double) = spark.range(50).select(array(
      struct(lit(-hw).as("x"), lit(-hw).as("y")),
      struct(lit(hw).as("x"), lit(-hw).as("y")),
      struct(lit(hw).as("x"), lit(hw).as("y")),
      struct(lit(-hw).as("x"), lit(hw).as("y")),
      struct(lit(-hw).as("x"), lit(-hw).as("y"))).as("exterior"))
    val fine = SpatialJoins.autoLevel(rects(0.05))   // parcel-sized
    val coarse = SpatialJoins.autoLevel(rects(45.0)) // continent-sized
    assert(fine > coarse,
      s"small polygons must get a finer grid (fine=$fine coarse=$coarse)")
    assert(coarse >= 0 && fine <= graft.geom.CellIndex.MaxLevel)
    // degenerate side falls back to the historical constant
    assert(SpatialJoins.autoLevel(rects(0.0)) === 9)

    // density rule: grid cells ~ label count (Range plans carry rowCount)
    def labs(n: Long) = spark.range(n).select($"id".as("poly_id"),
      lit(0.0).as("lx"), lit(0.0).as("ly"))
    assert(SpatialJoins.knnAutoLevel(labs(4096)) === 6) // 4^6 = 4096
    assert(SpatialJoins.knnAutoLevel(labs(16)) === 2)
    assert(SpatialJoins.knnAutoLevel(labs(1)) === 1) // floor
  }
}
