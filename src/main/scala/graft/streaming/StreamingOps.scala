package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming surface of the engine.
  *
  * The reference's only "streaming" is pull-based incremental batch delivery
  * (reference: client.py:65-72,95-109 — an Arrow `to_batches` generator).
  * The Spark-native generalization is a real incremental pipeline:
  * `readStream` over the same parquet layout, watermarked event-time
  * windows, append sinks. The same code runs a 100 TB backfill (batch) and
  * the live tail (stream) — the query shapes below mirror the batch
  * operators in [[graft.operators.Events]].
  */
object StreamingOps {

  /** Incremental parquet source over a directory (new files appear →
    * new micro-batches), fixed schema. */
  def readEvents(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "8").parquet(dir)

  /** Watermarked sliding-window counts per event type. */
  def windowedCounts(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Drive a streaming query to a named in-memory sink and process all
    * currently-available input synchronously (local smoke harness). */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
