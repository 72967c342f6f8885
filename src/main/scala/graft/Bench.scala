package graft

import graft.functions.GraftFunctions._
import graft.operators._
import graft.sources.{GeoTables, Images}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Headline benchmark workloads. Each returns a DataFrame whose FULL
  * evaluation is forced through the noop sink (count() would let Spark
  * elide the projected compute — the polylabel column must actually run).
  */
object BenchWorkloads {

  /** (name, logical input rows, build). Sizes chosen so the sf0.1 suite
    * finishes in a few minutes at local[32] while each workload still
    * shuffles/computes enough to expose scaling.
    */
  def all(spark: SparkSession, sfDir: String,
          scale: Double = 1.0): Seq[(String, Long, () => DataFrame)] = {
    import spark.implicits._
    def sc(n: Long): Long = math.max(1L, (n * scale).toLong)
    val nPolys = 2000
    val nPoints = sc(2000000L)
    val nImages = sc(1500L)
    val nSynPolys = sc(12000L).toInt
    val nNorway = sc(200L)
    val nKnnPoints = sc(200000L)
    Seq(
      ("polylabel_mixed", nSynPolys + nNorway, () => {
        // synthetic polygons (6..512 vertices) + Norway copies
        val syn = GeoTables.syntheticPolygons(spark, nSynPolys).toDF
        val nw = GeoTables.fixtures(spark).toDF.where($"poly_id" === "norway")
          .crossJoin(spark.range(nNorway).select($"id".as("copy")))
          .drop("poly_id").withColumn("poly_id", concat(lit("nw"), $"copy"))
        syn.unionByName(nw.select(syn.columns.map(col): _*))
          .withColumn("label", polylabel($"exterior", $"holes", $"tolerance"))
          .select($"poly_id", $"label.x", $"label.y", $"label.dist")
      }),
      ("pip_join", nPoints, () => {
        val polys = GeoTables.syntheticPolygons(spark, nPolys).toDF
        val pts = GeoTables.syntheticPoints(spark, nPoints).toDF
        SpatialJoins.pipJoin(pts, polys, level = 10)
      }),
      ("knn_join", nKnnPoints, () => {
        val polys = GeoTables.syntheticPolygons(spark, nPolys).toDF
        val labels = polys
          .withColumn("label", polylabel($"exterior", $"holes", $"tolerance"))
          .select($"poly_id", $"label.x".as("lx"), $"label.y".as("ly"))
        SpatialJoins.knnJoin(GeoTables.syntheticPoints(spark, nKnnPoints).toDF,
          labels, k = 5, level = 7)
      }),
      ("tile_assign", nImages, () => {
        Tiling.assign(Tiling.tile(Images.table(spark, nImages)), level = 12)
      }),
      ("minhash_dedup", -1L, () => {
        Dedup.minhashLshPairs(
          spark.read.parquet(s"$sfDir/documents.parquet"), 16, 4, 1, 2)
      }),
      ("embed_topk", -1L, () => {
        Similarity.bruteTopK(
          spark.read.parquet(s"$sfDir/embeddings.parquet"), nQueries = 50, k = 10)
      }),
      ("cell_agg", -1L, () => {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .withColumn("x", (col("l_orderkey") % 3600) / 10.0 - 180.0)
          .withColumn("y", (col("l_partkey") % 1800) / 10.0 - 90.0)
          .withColumn("cell_id", cell_of(col("x"), col("y"), lit(12)))
          .groupBy("cell_id").agg(count(lit(1)).as("n"), avg("l_quantity").as("q"))
      }))
  }

  /** Force full evaluation. */
  def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def runAll(spark: SparkSession, sfDir: String, scale: Double = 1.0,
             only: Set[String] = Set.empty): Map[String, Double] =
    all(spark, sfDir, scale)
      .filter { case (n, _, _) => only.isEmpty || only(n) }
      .map { case (name, _, build) =>
      val t0 = System.nanoTime()
      exec(build())
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
}

/** Driver-run benchmark: one JSON line, per-query seconds. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt, "graft-bench")
    val results = BenchWorkloads.runAll(spark, sfDir)
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + f"""":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.values.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** Two-parallelism scaling evidence (north_rule: efficiency >= 0.8 from N
  * to 4N): the same workload at local[8] and local[32] on identical input,
  * one warm-up + one measured pass each. Prints a summary and appends it
  * to BENCH/BASELINE.md.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the north_rule's headline operators, sized so compute (not job
    // overhead) dominates at local[8]
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "8").toDouble
    val headline = Set("polylabel_mixed", "pip_join", "knn_join", "tile_assign")
    def measure(cores: Int): Map[String, Double] = {
      val spark = GraftSession.create(s"local[$cores]", cores, s"graft-scale-$cores")
      BenchWorkloads.runAll(spark, sfDir, scale / 8.0, headline) // warm-up (JIT, page cache)
      val r = BenchWorkloads.runAll(spark, sfDir, scale, headline)
      spark.stop()
      r
    }
    val r8 = measure(8)
    val r32 = measure(32)
    val t8 = r8.values.sum
    val t32 = r32.values.sum
    val speedup = t8 / t32
    val eff = speedup / 4.0
    val lines = new StringBuilder
    lines ++= s"\n## Scaling run (${java.time.LocalDate.now}) — sf=$sfDir\n\n"
    lines ++= "| workload | local[8] s | local[32] s | speedup | efficiency |\n|---|---|---|---|---|\n"
    for (k <- r8.keys.toSeq.sorted) {
      val s = r8(k) / r32(k)
      lines ++= f"| $k | ${r8(k)}%.2f | ${r32(k)}%.2f | ${s}%.2f | ${s / 4.0}%.2f |\n"
    }
    lines ++= f"| **total** | $t8%.2f | $t32%.2f | $speedup%.2f | **$eff%.2f** |\n"
    print(lines)
    val p = java.nio.file.Paths.get("BENCH/BASELINE.md")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, lines.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
