package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join/aggregation keys.
  *
  * AQE's skew-join split handles most runtime skew automatically; explicit
  * salting remains the tool when a single key's build side must be
  * replicated (e.g. one user owns 10% of 100 TB of events). The helpers
  * here implement the classic scheme: the skewed (large) side gets a
  * deterministic salt in [0, factor); the small side is replicated across
  * every salt value; the join key becomes (key, salt).
  */
object Skew {

  /** Deterministic salt derived from stable row content (no rand(): results
    * and retries stay reproducible). */
  def salt(c: Column, factor: Int): Column = pmod(xxhash64(c), lit(factor))

  /** Salted inner equi-join: `large` ⋈ `small` on `key`, with `small`
    * replicated `factor`×. Use when `key`'s distribution is too skewed for
    * one reducer even after AQE splitting. */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      saltOn: String, factor: Int): DataFrame = {
    val l = large.withColumn("_salt", salt(col(saltOn), factor))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit((factor - 1).toLong))))
    l.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted partial → final) count per key: heavy keys are
    * pre-aggregated across `factor` reducers before the final combine. */
  def saltedCountByKey(df: DataFrame, key: String, saltOn: String, factor: Int): DataFrame =
    df.withColumn("_salt", salt(col(saltOn), factor))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).as("n"))

  /** Heavy-hitter report: the top-`k` keys by row count with their exact
    * corpus share in basis points, plus the salt factor that would bring
    * each key under `1/targetShareBp` of a reducer's fair load. This is the
    * measurement that decides WHERE salting/AQE-skew-split is needed —
    * run it before keying a 100 TB shuffle, not after it straggles.
    *
    * One map-side-combinable count per key + a total (computed from the
    * same aggregate, no second scan) + a top-k sort over the key counts —
    * the relation sorted is |distinct keys|, never |rows|. */
  def heavyHitterReport(df: DataFrame, key: String, k: Int,
      targetShareBp: Long = 100L): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_bp", expr("n * 10000 DIV total"))
      .withColumn("salt_factor",
        expr(s"CASE WHEN share_bp <= $targetShareBp THEN 1L " +
          s"ELSE (share_bp + $targetShareBp - 1) DIV $targetShareBp END"))
      .orderBy(col("n").desc, col(key))
      .limit(k)
      .select(col(key), col("n"), col("share_bp"), col("salt_factor"))
  }
}
