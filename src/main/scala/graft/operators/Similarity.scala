package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>):
  * brute-force top-k as the correctness baseline, sign-LSH bucketing as
  * the scale path, plus blocked near-duplicate pairs.
  *
  * All scoring is on QUANTIZED integer vectors (round(v*1000)): integer
  * dot products are order-independent and exact, so rankings are
  * bit-reproducible by any engine — and at 100 TB the quantized path is
  * also the cheap one (int64 multiply-adds, dense shuffles, no float
  * reduction-order nondeterminism across partitions).
  */
object Similarity {

  /** (vec_id, i [0-based], q) quantized component stream. */
  def quantized(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("i"),
        round(col("col").cast("double") * 1000.0, 0).cast("long").as("q"))

  /** Exact top-k by integer dot product for the `nQueries` lowest vec_ids
    * against the whole table. Output: (query_id, vec_id, dot, rank).
    */
  def bruteTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = quantized(embeddings).cache()
    val queries = q.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("i"), col("q").as("qa"))
    val data = q.select(col("vec_id"), col("i"), col("q").as("qb"))
    val dots = queries.join(data, "i")
      .where(col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("qa") * col("qb")).as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("vec_id"))
    dots.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic integer hyperplane component w(j, i): closed form so
    * any engine derives the same planes.
    */
  def planeWeight(j: Int, dim: Int) =
    (i: Int) => ((j.toLong * dim + i) * 2654435761L % 2001L) - 1000L

  /** Sign-LSH bucket per vector: bit j = (sum_i q_i * w(j,i)) > 0.
    * Returns (vec_id, bucket).
    */
  def lshBuckets(embeddings: DataFrame, planes: Int, dim: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val w = (for (j <- 0 until planes; i <- 0 until dim)
      yield (j, i, planeWeight(j, dim)(i))).toDF("j", "i", "w")
    val bits = quantized(embeddings)
      .join(broadcast(w), "i")
      .groupBy("vec_id", "j")
      .agg(sum(col("q") * col("w")).as("proj"))
      .withColumn("bit", when(col("proj") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L))
    bits.groupBy("vec_id").agg(sum("bit").as("bucket"))
  }

  /** ANN top-k: candidates share one of the query's probe buckets; exact
    * integer dot re-ranks within the candidates. Output
    * (query_id, vec_id, dot, rank). The scale path: bucket equi-join
    * instead of all-pairs.
    *
    * `multiProbe` widens each QUERY to its bucket plus all buckets at
    * Hamming distance 1 (flip each plane bit once) — the classic
    * multi-probe LSH recall fix: a near-neighbour straddling one
    * hyperplane lands one bit away, and single-probe misses it. Only the
    * query side fans out (x planes+1 rows), the data side stays one row
    * per vector, and the join stays an equi-join on the bucket key.
    */
  def annTopK(embeddings: DataFrame, nQueries: Int, k: Int,
              planes: Int = 8, dim: Int = 64,
              multiProbe: Boolean = false): DataFrame = {
    val buckets = lshBuckets(embeddings, planes, dim).cache()
    val q = quantized(embeddings).cache()
    val queries0 = buckets.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("bucket"))
    val queries =
      if (!multiProbe) queries0
      else queries0
        .withColumn("j", explode(lit((-1 until planes).toArray)))
        .withColumn("bucket",
          when(col("j") === -1, col("bucket"))
            .otherwise(expr("bucket ^ shiftleft(CAST(1 AS BIGINT), j)")))
        .select("query_id", "bucket")
    // no distinct needed: the probe buckets of a query are all distinct
    // values and each data vector has exactly one bucket, so a pair can
    // match through at most one probe
    val candPairs = queries.join(buckets, "bucket")
      .where(col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id")
    val dots = candPairs
      .join(q.select(col("vec_id").as("query_id"), col("i"), col("q").as("qa")),
        Seq("query_id"))
      .join(q.select(col("vec_id"), col("i"), col("q").as("qb")), Seq("vec_id", "i"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("qa") * col("qb")).as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("vec_id"))
    dots.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Near-duplicate pairs: cosine >= tau via the integer
    * cross-multiplication dot^2 * 10000 >= tau2x10000 * |a|^2 * |b|^2
    * (dot > 0). Output (vec_a, vec_b, dot).
    *
    * Candidates are pairs sharing BOTH the blocking label and the sign-LSH
    * bucket — the scale path: a per-label all-pairs join is quadratic in
    * the label's population, while bucketed candidates split every label
    * into 2^planes cells first (high-cosine pairs land in the same bucket
    * with high probability; the bucket criterion is part of the operator
    * contract, mirrored by the SQL oracle). The exact integer verify runs
    * on candidates only.
    */
  def nearDupPairs(embeddings: DataFrame, tau2x10000: Int,
                   planes: Int = 8, dim: Int = 64): DataFrame = {
    val q = quantized(embeddings).cache()
    val meta = lshBuckets(embeddings, planes, dim)
      .join(embeddings.select("vec_id", "label"), "vec_id")
    val cand = meta.as("a").join(meta.as("b"),
        col("a.label") === col("b.label") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    val norms = q.groupBy("vec_id").agg(sum(col("q") * col("q")).as("n2"))
    val dots = cand
      .join(q.select(col("vec_id").as("vec_a"), col("i"), col("q").as("qa")), "vec_a")
      .join(q.select(col("vec_id").as("vec_b"), col("i"), col("q").as("qb")),
        Seq("vec_b", "i"))
      .groupBy("vec_a", "vec_b")
      .agg(sum(col("qa") * col("qb")).as("dot"))
    dots
      .join(norms.select(col("vec_id").as("vec_a"), col("n2").as("na2")), "vec_a")
      .join(norms.select(col("vec_id").as("vec_b"), col("n2").as("nb2")), "vec_b")
      .where(col("dot") > 0 &&
        col("dot") * col("dot") * 10000L >= lit(tau2x10000.toLong) * col("na2") * col("nb2"))
      .select("vec_a", "vec_b", "dot")
  }
}
