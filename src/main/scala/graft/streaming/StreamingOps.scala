package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
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

  /** Streaming exact-dedup: drop events whose `idCols` were already seen,
    * with state bounded by the watermark (late duplicates beyond it age
    * out — the streaming counterpart of Dedup.dropExactDuplicates). */
  def dedupStream(events: DataFrame, watermarkCol: String, watermark: String,
      idCols: Seq[String]): DataFrame =
    events.withWatermark(watermarkCol, watermark)
      .dropDuplicates(idCols :+ watermarkCol)

  /** Minimal event shape for stateful sessionization. */
  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

  /** One closed session: count + span. */
  final case class ClosedSession(
      user_id: Long, n_events: Long, start: java.sql.Timestamp, end: java.sql.Timestamp)


  /** Custom streaming state: per-user sessionization via
    * flatMapGroupsWithState. A session closes when a gap > `gapSeconds`
    * appears in a user's event-time sequence (batch-order approximation on
    * sorted micro-batch input; the batch counterpart is
    * [[graft.operators.Events.sessionize]]). */
  def sessionizeStream(
      events: Dataset[SessionEvent], gapSeconds: Long = 1800): Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stEnc = Encoders.product[graft.streaming.SessionState]
    implicit val longEnc = Encoders.scalaLong
    val gapUs = gapSeconds * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
          var st = state.getOption.orNull
          it.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val us = e.ts.getTime * 1000L
            st match {
              case null => st = SessionState(1, us, us)
              case s if us - s.lastUs > gapUs =>
                closed += ClosedSession(user, s.n,
                  new java.sql.Timestamp(s.startUs / 1000), new java.sql.Timestamp(s.lastUs / 1000))
                st = SessionState(1, us, us)
              case s => st = SessionState(s.n + 1, s.startUs, us)
            }
          }
          if (st != null) state.update(st)
          closed.iterator
        })
  }

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

/** Per-user open-session state (top-level: Catalyst's state encoder
  * generates code that needs a public constructor). */
final case class SessionState(n: Long, startUs: Long, lastUs: Long)
