package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / downsampling for data-curation pipelines.
  *
  * `rand()`-based sampling is not reproducible across engines, retries or
  * partition layouts; curation pipelines want content-addressed sampling:
  * order rows inside each stratum by a cryptographic hash of a stable key
  * and keep a prefix. Same inputs → same sample, on any engine (md5 is
  * engine-portable, unlike Spark-specific hash functions).
  */
object Sampling {

  /** The hash sort key for a row id. */
  def hashKey(id: Column): Column = md5(id.cast("string"))

  /** Keep `n` rows per value of `stratumCol`, chosen by md5 order of
    * `idCol` (ties broken by the id itself). */
  def perGroup(df: DataFrame, stratumCol: String, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashKey(col(idCol)), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Keep approximately `fraction` of rows, deterministically: a row stays
    * iff the integer value of its hash-key prefix falls under the cut. */
  def byFraction(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    val cut = (fraction * 65536).toInt
    df.filter(conv(substring(hashKey(col(idCol)), 1, 4), 16, 10).cast("long") < cut)
  }
}
