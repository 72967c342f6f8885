package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, phash). Thresholds are integer
  * cross-multiplications (inter*2 >= union for tau=0.5), never float
  * divisions, so every result is engine-reproducible; every stage is a
  * shuffle-on-key relational op (the MapReduce-set-similarity shape):
  * shingles shuffle by shingle, signatures by (doc, hash-ix), candidates
  * by band key — no driver-side state, no quadratic blow-up outside the
  * candidate verify.
  */
object Dedup {

  final val P = TextOps.P

  /** Exact dedup: representative (min doc_id) + multiplicity per distinct
    * text. At 100 TB this is the classic hash-shuffle group-by; partial
    * aggregation handles the heavy hitters.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy("text")
      .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n"))
      .select("rep_id", "n")

  /** All-pairs word-3-gram Jaccard >= num/den within a blocking key
    * (lang): explode distinct shingles, self-join on shingle+block, count
    * intersections, cross-multiply against set sizes. Output:
    * (doc_a, doc_b, inter, uni).
    */
  def ngramJaccardPairs(docs: DataFrame, num: Int, den: Int): DataFrame = {
    val sh = TextOps.shingles3(docs).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("doc_a"), col("lang"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("lang"), col("shingle"))
    val inter = a.join(b, Seq("lang", "shingle"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .where(col("inter") * den >= col("uni") * num)
      .select("doc_a", "doc_b", "inter", "uni")
  }

  /** MinHash signature matrix: H hashes h_j(doc) = min over shingle ints s
    * of (a_j*s + b_j) mod P, with closed-form (a_j, b_j). Returns
    * (doc_id, j, minh).
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val params = (0 until numHashes)
      .map(j => (j, (j * 2654435761L + 1L) % P, (j * 40503L + 7L) % P))
      .toDF("j", "a", "b")
    TextOps.shingles3(docs)
      .withColumn("s", TextOps.shingleInt(col("shingle")))
      .select("doc_id", "s").distinct()
      .crossJoin(broadcast(params))
      .groupBy("doc_id", "j")
      .agg(min((col("a") * col("s") + col("b")) % P).as("minh"))
  }

  /** MinHash + LSH banding + exact verify. Bands of `rowsPerBand` hashes;
    * band key = order-free weighted fold of the band's minhashes.
    * Candidates (same band key in any band) are verified with the exact
    * shingle Jaccard; pairs with jaccard >= num/den survive.
    * Output: (doc_a, doc_b, inter, uni).
    */
  def minhashLshPairs(docs: DataFrame, numHashes: Int, rowsPerBand: Int,
                      num: Int, den: Int): DataFrame = {
    val sig = minhashSignatures(docs, numHashes)
    // 31^(j mod rows) as an explicit integer mapping — libm pow() is not
    // guaranteed exactly rounded, and a 29790.999.. would silently change
    // band keys differently per engine
    val wMap = (0 until rowsPerBand).map(r => (r, (0 until r).foldLeft(1L)((a, _) => a * 31L)))
    val wCol = wMap.tail.foldLeft(lit(wMap.head._2)) { case (acc, (r, v)) =>
      when(col("j") % rowsPerBand === r, v).otherwise(acc)
    }
    val banded = sig
      .withColumn("band", (col("j") / rowsPerBand).cast("int"))
      .withColumn("w", wCol)
      .groupBy("doc_id", "band")
      .agg(sum(col("minh") * col("w")).as("band_key"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    // exact verify on the candidate set only
    val sh = TextOps.shingles3(docs).select("doc_id", "shingle").cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingle", "sa"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b2").withColumnRenamed("shingle", "sb"),
        col("doc_b") === col("doc_b2") && col("sa") === col("sb"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .where(col("inter") * den >= col("uni") * num)
      .select("doc_a", "doc_b", "inter", "uni")
  }

  /** 16-bit SimHash over token hashes: bit b is the sign of
    * sum(+/-1 per token occurrence by bit b of the token hash).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(docs)
      .withColumn("h", (TextOps.tokenInt(col("tok")) % P) * 48271L % 65536L)
    val bitSums = (0 until 16).map { b =>
      sum(shiftright(col("h"), b) % 2L * 2L - 1L).as(s"s$b")
    }
    val packed = (0 until 16).map { b =>
      when(col(s"s$b") > 0, 1L << b).otherwise(0L)
    }.reduce(_ + _)
    toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash", packed)
      .select("doc_id", "simhash")
  }

  /** Image-side dedup: groups of images sharing a perceptual hash
    * (the planted mod-17 duplicates in the synthetic table surface here).
    */
  def phashGroups(images: DataFrame): DataFrame =
    images.groupBy("phash")
      .agg(count(lit(1)).as("n"), sort_array(collect_list("image_id")).as("ids"))
      .where(col("n") > 1)
      .select(col("phash"), col("n"), col("ids"))
}
