package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV → hive-partitioned parquet ingest.
  *
  * Re-expresses the reference's per-file pandas loop (reference:
  * transform.py:8-41, run-example.sh:1-3) as ONE distributed Spark job over
  * every CSV at once:
  *
  *   - each input CSV holds one stream; the filename (minus extension) is the
  *     stream UUID (reference: transform.py:10-16, README.md:93);
  *   - the header row is `<timeCol>,<label>` — the label (original column
  *     name) becomes the `label` column (reference: transform.py:28,33);
  *   - rows are `(timestamp, value)`; output is sorted by time within each
  *     stream (reference: transform.py:25-26, README.md:70);
  *   - derived columns: `uri = "urn:{collection}/{label}"`, constant
  *     `collection` (reference: transform.py:31-35);
  *   - output layout `collection=<c>/uuid=<u>/...parquet`, µs timestamps
  *     (reference: transform.py:39 — `partition_cols=['collection','uuid'],
  *     coerce_timestamps='us'`; µs is Spark's native timestamp precision).
  *
  * Scale design: because per-file headers differ (the label IS the header),
  * a naive `spark.read.csv` of all files can't work. We read the files as
  * lines of text with `input_file_name()`, split header rows from data rows,
  * broadcast the tiny (one-per-file) header table back onto the data rows,
  * and write once, `repartition`ed by the partition keys so each stream lands
  * in few well-sized files instead of a small-file explosion. Everything is
  * a single shuffle-light job that scales to millions of input files.
  */
object Ingest {

  private val UuidRe = "([0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12})\\.[Cc][Ss][Vv]$"

  /** Transform a directory (or glob) of single-stream CSVs into the
    * partitioned fact table at `dest`. Returns the ingested DataFrame
    * (lazy; already written).
    *
    * Files whose basename is not a UUID are skipped, mirroring the
    * reference's guard (transform.py:11-16). Rows whose timestamp fails to
    * parse are dropped (the reference would raise; we prefer a clean filter
    * — the count is available via the returned DataFrame).
    */
  def transform(
      spark: SparkSession,
      collection: String,
      csvPath: String,
      dest: String,
      timeCol: String = "datetime",
      maxRecordsPerFile: Long = 0L): DataFrame = {

    val raw = spark.read.text(csvPath)
      .withColumn("_file", input_file_name())
      .withColumn("uuid", regexp_extract(col("_file"), UuidRe, 1))
      .filter(col("uuid") =!= "") // UUID guard (reference: transform.py:11-16)

    // Header rows: "<timeCol>,<label>" — exactly one per file. Tiny table.
    val headers = raw
      .filter(col("value").startsWith(timeCol + ","))
      .select(
        col("_file"),
        substring(col("value"), timeCol.length + 2, Int.MaxValue).as("label"))

    val data = raw
      .filter(!col("value").startsWith(timeCol + ","))
      .join(broadcast(headers), Seq("_file"), "inner")
      .select(
        to_timestamp(substring_index(col("value"), ",", 1)).as("time"),
        substring_index(col("value"), ",", -1).cast("double").as("value"),
        col("label"),
        concat(lit(s"urn:$collection/"), col("label")).as("uri"),
        lit(collection).as("collection"),
        col("uuid"))
      .filter(col("time").isNotNull && col("value").isNotNull)

    // One partition per (collection,uuid) hash bucket; time-sorted within,
    // so every written file is time-ordered and carries tight min/max
    // footer stats (reference: README.md:25,56).
    // maxRecordsPerFile caps leaf-file size for very long streams — the
    // reference's "partitioned by size but ordered by time" (README.md:25):
    // files split on row count, each still internally time-sorted.
    val writer = data
      .repartition(col("collection"), col("uuid"))
      .sortWithinPartitions("uuid", "time")
      .write
      .mode("append")
      .partitionBy("collection", "uuid")
    (if (maxRecordsPerFile > 0)
      writer.option("maxRecordsPerFile", maxRecordsPerFile)
    else writer).parquet(dest)

    spark.read.parquet(dest)
  }
}
