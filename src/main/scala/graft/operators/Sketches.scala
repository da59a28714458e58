package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality-sketch state with ENGINE-PORTABLE hashing.
  *
  * `approx_count_distinct` is the right tool inside one Spark job, but its
  * registers hash with private seeds — two engines (or two clusters) can
  * never merge or compare them. These registers derive from md5, so any
  * engine reproduces them bit-for-bit: the sketch TABLE becomes the
  * exchange format (ship 64 rows per group, merge with MAX — the
  * fundamental HLL property), and the DuckDB oracle recomputes the exact
  * same registers. The float estimate (harmonic mean over registers) is
  * deliberately NOT computed here: estimation is a client-side display
  * step; the mergeable state is the pipeline artifact.
  */
object Sketches {

  /** Number of HLL registers (low bits of the hash pick the register). */
  val Registers = 64

  /** ρ(h) over the post-register bits: 1-based position of the lowest set
    * bit of `h DIV 64` (0 when no bit set) — the classic HLL rank, via the
    * isolate-lowest-bit trick `b & −b` and one foldable 54-branch CASE
    * (the hash is 60 bits, so 54 remain after the register index). */
  private def rho(b: Column): Column = {
    val lob = b.bitwiseAND(-b)
    (0 until 54).foldLeft(when(lit(false), lit(0L))) { (acc, i) =>
      acc.when(lob === lit(1L << i), lit(i + 1L))
    }.otherwise(lit(0L))
  }

  /** Per-(group, register) max-ρ table over the md5-60-bit hash of
    * `keyCol` — 64 rows per group, mergeable with MAX across any split of
    * the data. One map-side-combinable hash agg; duplicates of a key are
    * free (max is idempotent), which is the whole point of the sketch. */
  def hllRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame = {
    val h = TextOps.portableHash60(col(keyCol).cast("string"))
    df.select(groupCols.map(col) :+ h.as("_h"): _*)
      .withColumn("register", pmod(col("_h"), lit(Registers.toLong)))
      .withColumn("_rho", rho(expr(s"_h DIV $Registers")))
      .groupBy(groupCols.map(col) :+ col("register"): _*)
      .agg(max(col("_rho")).as("max_rho"))
  }

  /** Count-Min sketch counter table over `keyCol`: `depth` independent
    * rows (salted md5 hashes) × `width` counter positions, SPARSE — only
    * nonzero cells emitted. Counters are exact sums, so the sketch merges
    * with SUM by (depth, width_pos) across any split of the data, and the
    * DuckDB oracle reproduces every cell bit-for-bit (same portable
    * hashing as [[hllRegisters]]; the point estimate min_d(cell[d][h_d(x)])
    * is a client-side read). One map-side-combinable hash agg over
    * depth × |rows| exploded inputs; output ≤ depth·width per group. */
  def cmSketch(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    val salted = df
      .select(col(keyCol).cast("string").as("_k"))
      .withColumn("depth", explode(array((0 until depth).map(lit(_)): _*)))
    val h = TextOps.portableHash60(
      concat(col("depth").cast("string"), lit("|"), col("_k")))
    salted
      .withColumn("width_pos", pmod(h, lit(width.toLong)))
      .groupBy(col("depth").cast("long").as("depth"), col("width_pos"))
      .agg(count(lit(1)).as("c"))
  }

  // --- client-side estimate readers (plain Scala: the sketches above are
  // the DISTRIBUTED artifacts; estimation runs on their collected rows) ---

  /** The md5-60-bit hash of [[TextOps.portableHash60]], computed locally —
    * estimate readers must hash exactly like the sketch builders. */
  private[graft] def localHash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** HLL cardinality estimate from collected (register, max_rho) rows of
    * ONE group — the standard harmonic mean with the small-range
    * linear-counting correction. Registers absent from the sparse table
    * count as zero. */
  def hllEstimate(registers: Seq[(Long, Long)]): Double = {
    val m = Registers
    val rho = Array.fill(m)(0L)
    // max, not overwrite: passing the concatenated rows of several sketch
    // tables must behave as their merge (HLL's defining property)
    registers.foreach { case (r, x) => rho(r.toInt) = math.max(rho(r.toInt), x) }
    val alpha = 0.709 // α_64
    val raw = alpha * m * m / rho.map(x => math.pow(2.0, -x.toDouble)).sum
    val zeros = rho.count(_ == 0L)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** Count-Min point estimate of `key`'s frequency from collected sparse
    * (depth, width_pos, c) cells: min over rows of the key's cell —
    * always an OVERestimate (collisions only add). */
  def cmEstimate(cells: Seq[(Long, Long, Long)], key: String,
      depth: Int = 4, width: Int = 256): Long = {
    val m = cells.map { case (d, w, c) => (d, w) -> c }.toMap
    (0 until depth).map { d =>
      m.getOrElse((d.toLong, localHash60(s"$d|$key") % width), 0L)
    }.min
  }
}
