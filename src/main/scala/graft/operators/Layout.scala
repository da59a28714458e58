package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout planning operators — the data-organization decisions
  * that decide whether a 100 TB store is scannable or not.
  *
  * The reference organizes its store one-dimensionally: hive partitions by
  * `collection=/uuid=` and time-sorted files within each stream
  * (reference: transform.py:39, README.md:25). That layout prunes perfectly
  * on (uuid, time) but on nothing else. These operators generalize it:
  *
  *   - [[zorderKey]] interleaves the bits of two dimensions so that sorting
  *     by the single derived key co-locates rows that are close in BOTH
  *     dimensions — parquet row-group min/max footers then prune range
  *     predicates on either column (the multi-dimensional analogue of the
  *     reference's time-sorted files).
  *   - [[compactionPlan]] bin-packs the store's per-file stats rows into
  *     target-sized compaction groups — the maintenance operation that keeps
  *     a continuously-ingested store (reference: transform.py appends one
  *     file per CSV) from degenerating into millions of tiny files.
  *
  * Both are pure column arithmetic / one window over a SMALL relation (the
  * stats index, one row per file — never the fact table), so they hold their
  * shape unchanged at cluster scale.
  */
object Layout {

  /** Z-order (Morton) key: interleave the low `bits` bits of two non-negative
    * integer columns, x in the even bit positions and y in the odd ones.
    *
    * Built as an unrolled OR-chain of shift/mask terms over the two input
    * columns — a foldable expression tree that whole-stage codegen collapses
    * to straight-line long arithmetic (no UDF, no loop at runtime).
    */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_.bitwiseOR(_))
  }

  /** Sequential bin-packing of per-file stats into compaction groups: files
    * are laid end-to-end in (partition key, file id) order and a file joins
    * the group its STARTING row offset falls into —
    * `group_id = floor(prefix_rows / targetRows)`.
    *
    * One window cumsum over the stats relation (a row per FILE, not per data
    * row; at 100 TB that is ~10⁶ rows), partitioned by the grouping key —
    * no driver loop, no stateful scan. Groups may overshoot `targetRows` by
    * at most one file (the straddler stays in the group it started in),
    * which is the correct bias for compaction: slightly-large files beat
    * an extra generation of small ones.
    *
    * Input: `statsDf` with one row per file. Output: input columns +
    * `group_id` (long, dense from 0 per `keyCol`) — files sharing a
    * `group_id` should be rewritten as one file.
    */
  def compactionPlan(statsDf: DataFrame, keyCol: String, fileCol: String,
      rowsCol: String, targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(keyCol).orderBy(fileCol)
    val prefixRows = sum(col(rowsCol)).over(byKey) - col(rowsCol)
    // integer DIV, not floor(double /): prefix sums past 2^53 would round
    // at group boundaries (values are nonnegative, so DIV == floor here)
    statsDf.withColumn("_prefix", prefixRows)
      .withColumn("group_id", expr(s"_prefix DIV $targetRows").cast("long"))
      .drop("_prefix")
  }
}
