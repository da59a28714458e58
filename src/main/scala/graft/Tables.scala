package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared loaders for the driver-generated test tables.
  *
  * The `events.ts` physical type has already changed once between rounds
  * (TIMESTAMP(NANOS) → µs TIMESTAMP_NTZ), breaking every call site that
  * hand-rolled its own coercion — so the normalization lives HERE, once.
  */
object Tables {

  /** `events` with `ts` normalized to Spark TimestampType (µs, UTC):
    *  - TIMESTAMP(NANOS) footers: read nanos as long, floor to µs —
    *    exactly DuckDB's coercion of ns to its µs TIMESTAMP;
    *  - µs TIMESTAMP_NTZ footers: cast — reinterprets wall-clock in the
    *    session timezone, which every graft entry point pins to UTC,
    *    making it the identity relabel DuckDB also applies.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType.typeName match {
      case "long" => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
