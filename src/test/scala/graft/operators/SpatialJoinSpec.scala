package graft.operators

import graft.TestSpark
import graft.functions.GraftFunctions._
import graft.sources.GeoTables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join correctness against brute-force oracles (SURVEY.md §5.2 item 3). */
class SpatialJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val polys = GeoTables.syntheticPolygons(spark, 25).toDF.cache()
  private lazy val points = GeoTables.syntheticPoints(spark, 2000).toDF.cache()

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

    val got = SpatialJoins.knnJoin(points, labels, k, level = 8)
      .select($"point_id", $"poly_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got === brute)

    // partitioned variant (no label broadcast): identical output
    val gotPart = SpatialJoins.knnJoin(points, labels, k, level = 8,
      broadcastLabels = false)
      .select($"point_id", $"poly_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(gotPart === brute)
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

  test("knnJoin resolves every point exactly k times") {
    val labels = polys
      .withColumn("label", polylabel($"exterior", $"holes", $"tolerance"))
      .select($"poly_id", $"label.x".as("lx"), $"label.y".as("ly"))
    val got = SpatialJoins.knnJoin(points.limit(300), labels, 2, level = 10)
    val counts = got.groupBy("point_id").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSet === Set(2L))
    assert(got.select("point_id").distinct().count() === 300)
  }
}
