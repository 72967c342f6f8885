package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stratified sampling for training-data mixing: keep a per-stratum
  * fraction (language/source/quality-bucket quotas) of a corpus,
  * deterministically — the same rows survive on every run, on any
  * cluster size, with no RNG state.
  *
  * Two shapes, matching the two scales:
  *  - [[stratifiedSample]] (rate-based): a pure map-stage FILTER — no
  *    shuffle, no sort, no state. At 100 TB the sample runs at scan
  *    speed and composes with column pruning; this is the production
  *    path for "keep 3% of web, 40% of books".
  *  - [[stratifiedQuota]] (exact-count): exactly n rows per stratum,
  *    smallest splitter values first — one window shuffle, for when the
  *    mixing recipe demands exact counts (eval sets, small strata).
  *
  * The splitter is `(id mod 10^6) * 2654435761 mod 10^6`: the constant
  * (Knuth's multiplicative-hash number) is odd and not divisible by 5,
  * hence coprime to 10^6, so the map is a BIJECTION on [0, 10^6) —
  * exactly uniform, and `splitter < ppm` keeps exactly the stated
  * fraction of any full residue range. Integer-only arithmetic (products
  * bounded by 10^6·2654435761 < 2^63, ANSI-safe) mirrors bit-exactly in
  * any SQL engine, which is what makes the driver oracle possible.
  */
object Sampling {

  private val Knuth = 2654435761L
  private val M = 1000000L

  /** Deterministic per-row splitter in [0, 10^6) from a numeric id. */
  def splitter(id: Column): Column = pmod(pmod(id, lit(M)) * lit(Knuth), lit(M))

  /** Keep rows whose splitter falls under the stratum's parts-per-million
    * rate. `rates` are exact integer ppm (no float compare drift);
    * strata absent from the map fall back to `defaultPpm`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Long], defaultPpm: Long = 0L): DataFrame = {
    val ppm = rates.foldLeft(lit(defaultPpm)) { case (acc, (k, v)) =>
      when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.where(splitter(col(idCol)) < ppm)
  }

  /** Exactly `n` rows per stratum: rank by (splitter, id) — the id
    * tie-break makes the cut deterministic even for colliding splitter
    * values — and keep rank <= n. Emits a `rank` column so the caller
    * (and the oracle) can see the cut order.
    */
  def stratifiedQuota(df: DataFrame, idCol: String, strataCol: String,
                      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol)
      .orderBy(splitter(col(idCol)).asc, col(idCol).asc)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= n)
  }
}
