package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents (with token
  * counts) to fixed-capacity training sequences by GLOBAL order — doc d
  * starts at global token offset Σ tokens(d') over all d' before it, and
  * lands in sequence floor(offset / capacity).
  *
  * The interesting part at scale is the global running sum. The naive
  * formulation — `sum(n) OVER (ORDER BY id)` with no PARTITION BY — is
  * correct and is exactly what the DuckDB oracle runs, but Spark executes
  * an unpartitioned window on ONE task: the whole corpus flows through a
  * single executor thread. This implementation computes the same number
  * as a DISTRIBUTED PREFIX SUM:
  *
  *   1. range-repartition by id (order-preserving partition boundaries),
  *      sort within partitions;
  *   2. one pass per partition accumulates local running sums and emits
  *      the per-partition total;
  *   3. the per-partition totals (one row per partition — tiny) are
  *      prefix-summed on the driver and broadcast back as offsets;
  *   4. global offset = partition offset + local running sum.
  *
  * Two narrow passes over the data, no single-task stage, bit-identical
  * to the window formulation.
  */
object Packing {

  /** (idCol, n_tokens, seq_id, seq_offset): global contiguous packing of
    * each document into capacity-`capacity` sequences, ordered by id.
    * `seq_offset` is the document's starting token offset within its
    * sequence; a document may overrun its sequence's end (greedy
    * contiguous packing — the consumer truncates or wraps). */
  def packSequences(
      df: DataFrame, textCol: String, idCol: String,
      capacity: Long, partitions: Int = 0): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val counted = df.select(col(idCol).cast("long").as("id"),
      TextOps.bpeishTokenCount(col(textCol)).cast("long").as("n_tokens"))
    val cum = prefixSum(counted, "id", "n_tokens", nParts)
    cum.select(
      col("id").as(idCol), col("n_tokens"),
      ((col("cum") - col("n_tokens")) / capacity).cast("long").as("seq_id"),
      ((col("cum") - col("n_tokens")) % capacity).as("seq_offset"))
  }

  /** Deterministic training-SHARD assignment + per-shard manifest — the
    * "global shuffle then write N shards" step at the end of a curation
    * pipeline, without any actual global sort: each document's shard is a
    * pure function of its id (portable md5-derived hash mod `nShards`), so
    * the assignment is reproducible across engines, retries and partition
    * layouts, and the physical write is one hash-partitioned shuffle
    * (`repartition(nShards, shard)`) that any number of executors perform
    * in parallel. The manifest below is the correctness artifact: per-shard
    * document/token/byte totals and id range.
    *
    * Output: (shard, n_docs, n_tokens, n_chars, min_doc_id, max_doc_id). */
  def shardStats(
      df: DataFrame, textCol: String, idCol: String, nShards: Int): DataFrame =
    df.select(
        pmod(TextOps.portableHash60(
          concat(lit("shard#"), col(idCol).cast("string"))), lit(nShards.toLong))
          .as("shard"),
        col(idCol).cast("long").as("id"),
        TextOps.bpeishTokenCount(col(textCol)).cast("long").as("_tok"),
        length(col(textCol)).cast("long").as("_nch"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_tok")).as("n_tokens"),
        sum(col("_nch")).as("n_chars"), min(col("id")).as("min_doc_id"),
        max(col("id")).as("max_doc_id"))

  /** Exact global running sum of `valCol` ordered by `ordCol` (inclusive),
    * as a distributed prefix sum: adds a `cum` column. */
  def prefixSum(
      df: DataFrame, ordCol: String, valCol: String, nParts: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df.select(col(ordCol).as("id"), col(valCol).as("v"))
      .as[(Long, Long)]
      .repartitionByRange(nParts, col("id"))
      .sortWithinPartitions("id")
    // pass 1: local running sums (per-partition totals derived below)
    val local = parted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var acc = 0L
      it.map { case (id, v) =>
        acc += v
        (pid, id, v, acc) // (partition, id, value, local inclusive cumsum)
      }
    }.toDF("pid", "id", "v", "local").localCheckpoint() // one materialization, reused twice
    // pass 2: per-partition totals (≤ nParts rows) → driver prefix sum →
    // broadcast join of the offsets
    val totals = local.groupBy(col("pid")).agg(max(col("local")).as("total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.toSeq.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (pid, tot)) => (pid, acc + tot)
    }.sliding(2).collect { case Seq((_, prev), (pid, _)) => (pid, prev) }.toSeq
    val offsetDf = offsets.toDF("pid", "offset")
    local.join(broadcast(offsetDf), Seq("pid"))
      .select(col("id"), col("v").as(valCol),
        (col("local") + col("offset")).as("cum"))
  }
}
