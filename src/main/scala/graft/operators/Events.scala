package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over a timestamped fact table: time-bucketed
  * aggregation, sessionization, as-of alignment. The reference's `events`
  * role-model is the mortar fact table (time-range + id filters) — these
  * operators extend it with the batch shapes a telemetry pipeline needs.
  *
  * Shuffle shapes: bucketed aggregation is one map-side-combinable
  * hash agg; sessionization and as-of are ONE shuffle each (partition by
  * entity, sort by time) — the window functions then run within partitions.
  */
object Events {

  /** Time-bucketed aggregate: counts + exact decimal sums per
    * (bucket, event_type). */
  def timeBucketStats(events: DataFrame, bucket: String = "hour"): DataFrame =
    events
      .groupBy(date_trunc(bucket, col("ts")).as("bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Assign session ids per user: a new session starts after `gapSeconds`
    * of inactivity. Adds `session_id` (0-based per user). */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("_prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev_us").isNull ||
          unix_micros(col("ts")) - col("_prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("_new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("_prev_us", "_new_session")
  }

  /** Per-session stats: event count, span in µs (exact integers). */
  def sessionStats(events: DataFrame, gapSeconds: Long = 1800): DataFrame =
    sessionize(events, gapSeconds)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"))

  /** As-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` for the same key. Implemented as a UNION +
    * single window pass (one shuffle, no row explosion — scales to skewed
    * keys far better than a join + filter + re-rank). `valueCol` from the
    * right side is carried as `asof_<valueCol>`, its timestamp as
    * `asof_ts`. Ties (equal ts) take the right row (inclusive semantics,
    * matching standard ASOF joins). */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val vType = right.schema(valueCol).dataType
    val lTagged = left.withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(vType))
      .withColumn("_rts", lit(null).cast("timestamp"))
    val rTagged = right.select(
      col(keyCol), col(tsCol), lit(0).as("_side"),
      col(valueCol).cast(vType).as("_rv"), col(tsCol).as("_rts"))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal ts (inclusive as-of)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("asof_" + valueCol, last(col("_rv"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("_rts"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rv", "_rts")
  }

  /** Range (point-in-interval) join: every point row paired with each
    * interval containing its timestamp (`start <= t < end`).
    *
    * Spark plans a raw inequality join as BroadcastNestedLoopJoin (fine
    * only while one side broadcasts) or a cartesian product — at millions
    * of intervals both die. This is the bucketed EQUI-join shape instead:
    * time is cut into `bucketWidth`-second buckets; each point carries its
    * one bucket, each interval is exploded to the buckets it overlaps, and
    * the join is a plain hash equi-join on the bucket id refined by the
    * exact containment predicate. A point's bucket equals exactly one of a
    * containing interval's buckets, so no post-join dedup is needed.
    * Choose `bucketWidth` near the typical interval length: explode factor
    * = interval span / width + 1. */
  def rangeJoinBucketed(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long = 3600L): DataFrame = {
    val pB = points.withColumn("_bkt",
      floor(unix_timestamp(col(tsCol)) / bucketWidth))
    val iB = intervals.withColumn("_bkt",
      explode(sequence(floor(unix_timestamp(col(startCol)) / bucketWidth),
        floor((unix_timestamp(col(endCol)) - 1) / bucketWidth))))
    pB.join(iB, Seq("_bkt"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bkt")
  }
}
