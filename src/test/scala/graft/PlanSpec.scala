package graft

import graft.operators.SpatialJoins
import graft.sources.GeoTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the optimizations the engine depends on at scale
  * must actually appear in the executed plan — filters pushed to the
  * parquet scan, columns pruned, dimension sides broadcast, partial
  * aggregation before the shuffle.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet scan: filter pushdown + column pruning (q_agg_pricing)") {
    val df = SparkEntry.queries("q_agg_pricing")(spark, "/root/testdata/sf0.001")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed to scan:\n$plan")
    // only the 5 needed columns are read, not all 11
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && !readSchema.contains("l_suppkey"),
      s"column pruning failed: $readSchema")
  }

  test("PIP join broadcasts the exploded polygon side") {
    val polys = GeoTables.syntheticPolygons(spark, 10).toDF
    val pts = GeoTables.syntheticPoints(spark, 100).toDF
    val plan = planOf(SpatialJoins.pipJoin(pts, polys, 9))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"), "must never degrade to a cross join")
  }

  test("aggregation is partial+final (map-side combine before the shuffle)") {
    val df = SparkEntry.queries("q_cell_of")(spark, "/root/testdata/sf0.001")
    val plan = planOf(df)
    assert(plan.contains("partial_count") ||
      "HashAggregate.*partial".r.findFirstIn(plan).isDefined,
      s"no partial aggregation before shuffle:\n$plan")
  }

  test("graft expressions stay inside whole-stage codegen") {
    // every geometry expression implements doGenCode as a static
    // ExprHelpers call, so the stage shows the *(n) codegen markers
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .selectExpr(
        "cell_of(cast(l_orderkey as double)/100.0, cast(l_partkey as double)/1000.0, 10) AS c")
      .selectExpr("c", "cell_parent(c) AS p", "cell_kring(c, 1) AS ring")
    df.write.format("noop").mode("overwrite").save()
    val plan = planOf(df)
    assert(plan.contains("*("), s"stage fell out of whole-stage codegen:\n$plan")
  }

  test("lshBuckets is a pure per-row projection: no exchange, codegen'd") {
    // the bucket build must NOT be the old posexplode -> join -> groupBy
    // shape (512 shuffle rows per vector); one narrow projection per row
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = graft.operators.Similarity.lshBuckets(emb, planes = 8, dim = 64)
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), s"bucket build must not shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"bucket build must not explode:\n$plan")
    assert(plan.contains("*("), s"bucket build fell out of codegen:\n$plan")
  }

  test("minhash signature build adds exactly ONE exchange over the shingle frame") {
    // the old formulation (distinct -> params crossJoin -> groupBy(doc,j))
    // pushed 3 exchanges carrying up to H x |shingles| rows; the wide
    // build is one partial-agg'd groupBy(doc_id) — map-side combine means
    // the single exchange carries ~1 row per (doc, partition)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = graft.operators.TextOps.shingles3(docs)
      .select("doc_id", "shingle").persist()
    try {
      sh.count()
      val plan = planOf(graft.operators.Dedup.minhashSignaturesWide(sh, 16))
      // count only the operators the signature build ADDS on top of the
      // cached shingle frame (whose own plan — window, distinct — is
      // rendered below the InMemoryTableScan leaf)
      val added = plan.split("InMemoryTableScan")(0)
      val exchanges = "Exchange".r.findAllIn(added).size
      assert(exchanges <= 1, s"expected <= 1 exchange, got $exchanges:\n$added")
      assert(added.contains("HashAggregate"), s"expected a hash agg:\n$added")
      assert(!added.contains("CartesianProduct") && !added.contains("Join"),
        s"signature build must not join a params table:\n$added")
    } finally sh.unpersist()
  }

  test("IVF list assignment is a pure per-row projection: no exchange, codegen'd") {
    // the codebook is a literal (bounded metadata), so assigning every
    // vector to its nearest centroid must not join or shuffle — the data
    // side of annTopKIvf stays map-only at any scale
    import graft.functions.GraftFunctions.ivf_nearest
    import org.apache.spark.sql.functions._
    graft.GraftSession.install(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cent = (0 until 16 * 64).map(_.toLong % 7L)
    val df = emb.select(col("vec_id"),
      ivf_nearest(transform(col("embedding"),
          v => round(v.cast("double") * 1000.0, 0).cast("long")),
        typedLit(cent), lit(16), lit(0)).as("list"))
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), s"list assignment must not shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"list assignment must not explode:\n$plan")
    assert(plan.contains("*("), s"list assignment fell out of codegen:\n$plan")
  }

  test("fingerprint is a per-row codegen'd scalar: no explode, no exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = planOf(graft.operators.TextOps.fingerprint(docs))
    assert(!plan.contains("Exchange"), s"fingerprint must not shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"fingerprint must not explode:\n$plan")
    assert(plan.contains("*("), s"fingerprint fell out of whole-stage codegen:\n$plan")
  }

  test("kNN join keeps the label side broadcast in every round") {
    // audited on the round-candidate builder itself: the composed
    // operator's executed plans hide behind its lineage-truncation
    // (localCheckpoint) boundaries
    import graft.functions.GraftFunctions.cell_of
    val lab = GeoTables.syntheticPoints(spark, 10).toDF
      .select(concat(lit("p"), col("point_id")).as("poly_id"),
        col("x").as("lx"), col("y").as("ly"))
      .withColumn("lcell", cell_of(col("lx"), col("ly"), lit(8)))
    val pts = GeoTables.syntheticPoints(spark, 100).toDF
      .withColumn("pcell", cell_of(col("x"), col("y"), lit(8)))
    for (first <- Seq(true, false)) {
      val plan = planOf(graft.operators.SpatialJoins.roundCandidates(
        pts, lab, r = 2, prevR = 1, first = first, broadcastLabels = true))
      assert(plan.contains("BroadcastHashJoin"),
        s"labels must broadcast (first=$first):\n$plan")
      assert(!plan.contains("CartesianProduct"), "no cross join in a round")
    }
    // symmetric (no-broadcast) mode must be an equi-join on the cell key,
    // never a cross join
    val sym = planOf(graft.operators.SpatialJoins.roundCandidates(
      pts, lab, r = 1, prevR = 0, first = true, broadcastLabels = false))
    assert(!sym.contains("CartesianProduct"), s"symmetric mode crossed:\n$sym")
  }

  test("CC phases: partial-agg min + equi-join, never a cross join") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("u", "v")
    for (phase <- Seq(graft.operators.Components.largeStar(e),
                      graft.operators.Components.smallStar(e))) {
      phase.count()
      val plan = planOf(phase)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"CC phase crossed:\n$plan")
      assert(plan.contains("partial_min") || plan.contains("partial min") ||
        plan.contains("HashAggregate"), s"min not partial-agg'd:\n$plan")
    }
  }

  test("contamination: equi-join on the shingle key, never a cross join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = graft.operators.TextOps.contamination(
      docs.where(col("source") === "src0"), docs.where(col("source") =!= "src0"))
    df.count()
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"contamination crossed:\n$plan")
  }
}
