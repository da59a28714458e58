package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stats summary index over the partitioned fact table.
  *
  * The reference consolidates every parquet footer (per-column min/max/count
  * + relative file path) into a root `_metadata` file so clients can plan a
  * scan without listing/opening files (reference: make-metadata.py:8-22,
  * README.md:56). Spark neither reads nor writes `_metadata` — partition
  * discovery + parquet footer row-group pruning provide the same *pruning
  * capability* natively. For API parity we materialize the same information
  * as an explicit, queryable stats TABLE: one row per
  * (collection, uuid, file) with min/max time, min/max value and row count.
  *
  * At 100 TB this is a single scan + map-side-combinable aggregation over
  * the partition keys — no wide shuffle (the groupBy keys subsume the
  * physical partitioning), and the result is tiny (one row per stream file).
  */
object StatsIndex {

  /** Build the stats table for the dataset rooted at `root` and persist it
    * to `statsPath` (parquet). Returns the stats DataFrame. */
  def build(spark: SparkSession, root: String, statsPath: String): DataFrame = {
    val fact = spark.read.parquet(root)
    val stats = fact
      .withColumn("file", input_file_name())
      .groupBy(col("collection"), col("uuid"), col("file"))
      .agg(
        min("time").as("min_time"),
        max("time").as("max_time"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        count(lit(1)).as("num_rows"))

    stats.write.mode("overwrite").parquet(statsPath)
    spark.read.parquet(statsPath)
  }

  /** Re-open and sanity-check the stats table, mirroring the reference's
    * self-validation reopen (make-metadata.py:20-22). */
  def validate(spark: SparkSession, statsPath: String): Boolean = {
    val df = spark.read.parquet(statsPath)
    val cols = Set("collection", "uuid", "file", "min_time", "max_time",
      "min_value", "max_value", "num_rows")
    cols.subsetOf(df.columns.toSet) && df.limit(1).count() >= 0
  }

  /** Plan-time pruning helper: streams whose [min_time, max_time] window
    * overlaps [start, end] — the application-level analogue of the
    * reference's `_metadata`-driven fragment skipping (client.py:70-72). */
  def streamsInWindow(stats: DataFrame, start: String, end: String): DataFrame =
    stats
      .filter(col("min_time") <= lit(end).cast("timestamp") &&
        col("max_time") >= lit(start).cast("timestamp"))
      .select("collection", "uuid").distinct()
}
