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
}
