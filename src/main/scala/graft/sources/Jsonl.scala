package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Robust JSONL (newline-delimited JSON) source — the other ubiquitous
  * LLM-corpus interchange format besides parquet and tar shards. Web
  * crawls and vendor drops arrive as JSONL with a real-world defect
  * rate: truncated lines from interrupted uploads, interleaved garbage,
  * encoding damage. A pipeline must QUARANTINE those lines (count them,
  * keep their bytes for triage), not die on them and not silently drop
  * them.
  *
  * Built as text-scan + `from_json` rather than the native json reader's
  * PERMISSIVE mode: Spark disallows queries that reference only the
  * internal corrupt-record column (SPARK-21610) — the documented
  * workaround is caching, which a long-lived-session library must not
  * impose. `from_json` has no such restriction, stays inside whole-stage
  * codegen, and makes the good/quarantined split an ordinary codegen'd
  * predicate: one scan, no caching, nothing to leak.
  *
  * Returns one DataFrame with the schema's fields flattened, plus
  * `_ok` (parse succeeded) and `_raw` (the original line — null for
  * good rows to keep the relation narrow; quarantined rows carry their
  * bytes for triage). Filter `_ok` for the data path; `!_ok` IS the
  * quarantine export. */
object Jsonl {

  def readRobust(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    // from_json in PERMISSIVE mode yields an all-null row for malformed
    // input (indistinguishable from a legitimately-null record), so
    // corruption is detected the way the json datasource itself does it:
    // a corrupt-record column INSIDE the parse schema, which PERMISSIVE
    // fills with the raw text exactly when the line failed to parse.
    val crCol = "_graft_corrupt"
    require(!schema.fieldNames.contains(crCol),
      s"schema may not contain the reserved column $crCol")
    val parseSchema = schema.add(crCol, org.apache.spark.sql.types.StringType)
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0) // blank lines are not data
      .select(col("value").as("_line"),
        from_json(col("value"), parseSchema,
          Map("columnNameOfCorruptRecord" -> crCol)).as("_p"))
    parsed.select(
      (schema.fieldNames.map(f => col(s"_p.$f").as(f)) :+
        col(s"_p.$crCol").isNull.as("_ok") :+
        when(col(s"_p.$crCol").isNotNull, col("_line")).as("_raw")): _*)
  }
}
