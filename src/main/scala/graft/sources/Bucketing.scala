package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the shuffle. Writing
  * both sides bucketed (and optionally sorted) by the join key lets Spark's
  * `FileSourceScanExec` expose `HashPartitioning(key, n)` directly from the
  * layout: the join plans with NO Exchange on either side (verified in
  * BucketingSpec via `.explain`). This is the persistent-layout complement
  * to the reference's partition-key pruning (which handles selective
  * lookups; bucketing handles joins/aggregations over the whole table).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (replacing any previous
    * incarnation — a stale warehouse directory from another session would
    * otherwise fail the create). */
  def writeBucketed(
      df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free when
    * bucket counts match. */
  def coLocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
