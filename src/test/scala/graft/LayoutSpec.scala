package graft

import graft.operators.{Dedup, Layout, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 layout/curation operators: Z-order keys, compaction planning,
  * source-overlap matrix, heavy-hitter skew report. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // ---- zorderKey -------------------------------------------------------

  test("zorderKey interleaves bits exactly (reference Morton values)") {
    val s = spark; import s.implicits._
    // hand-computed: z(x, y) = x bits at even positions, y at odd.
    // z(1,0)=1, z(0,1)=2, z(1,1)=3, z(2,0)=4, z(3,5)=39, z(7,7)=63
    val rows = Seq((1, 0, 1L), (0, 1, 2L), (1, 1, 3L), (2, 0, 4L),
      (3, 5, 39L), (7, 7, 63L), (0, 0, 0L))
    val df = rows.toDF("x", "y", "expect")
      .withColumn("z", Layout.zorderKey(col("x"), col("y"), bits = 16))
    assert(df.filter(col("z") =!= col("expect")).count() == 0)
  }

  test("zorderKey bucket ranges are rectangles: both dims bounded per bucket") {
    val s = spark; import s.implicits._
    // a 64×64 grid; buckets of 4096 z-values = 64×64 tiles? no — zkey>>4
    // tiles the grid into 4×4 squares: both dims span ≤ 4 per bucket.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y))).toDF("x", "y")
    val stats = grid
      .withColumn("zb", shiftright(Layout.zorderKey(col("x"), col("y"), 16), 4))
      .groupBy("zb")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
    assert(stats.filter(col("dx") > 3 || col("dy") > 3).count() == 0)
    // a plain row-major layout has no such bound on the second dimension:
    // the same 16-value buckets over x*64+y span the full y range
    val rowMajor = grid
      .withColumn("rb", shiftright(col("x") * 64 + col("y"), 4))
      .groupBy("rb").agg((max("y") - min("y")).as("dy"))
    assert(rowMajor.filter(col("dy") >= 15).count() > 0)
  }

  test("zorderKey rejects out-of-range bits") {
    intercept[IllegalArgumentException] { Layout.zorderKey(lit(1), lit(1), 0) }
    intercept[IllegalArgumentException] { Layout.zorderKey(lit(1), lit(1), 32) }
  }

  // ---- compactionPlan --------------------------------------------------

  test("compactionPlan buckets files by starting offset, per key") {
    val s = spark; import s.implicits._
    // key A: sizes 300,300,300,300 target 500 → offsets 0,300,600,900
    //   → groups 0,0,1,1 ; key B: one oversized file then a small one:
    //   sizes 1200,10 → offsets 0,1200 → groups 0,2 (straddler isolated)
    val files = Seq(
      ("A", "f1", 300L), ("A", "f2", 300L), ("A", "f3", 300L), ("A", "f4", 300L),
      ("B", "f1", 1200L), ("B", "f2", 10L))
      .toDF("key", "file", "n_rows")
    val plan = Layout.compactionPlan(files, "key", "file", "n_rows", 500L)
      .select("key", "file", "group_id").as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(plan(("A", "f1")) == 0L && plan(("A", "f2")) == 0L)
    assert(plan(("A", "f3")) == 1L && plan(("A", "f4")) == 1L)
    assert(plan(("B", "f1")) == 0L && plan(("B", "f2")) == 2L)
  }

  test("compactionPlan rejects non-positive target") {
    val s = spark; import s.implicits._
    val files = Seq(("A", "f1", 1L)).toDF("key", "file", "n_rows")
    intercept[IllegalArgumentException] {
      Layout.compactionPlan(files, "key", "file", "n_rows", 0L)
    }
  }

  // ---- sourceOverlap ---------------------------------------------------

  test("sourceOverlap computes exact distinct-shingle Jaccard per slice pair") {
    val s = spark; import s.implicits._
    // srcA: grams {a b c, b c d} ; srcB: {a b c} (duplicated doc → still
    // distinct per slice) ; srcC: {x y z} (no overlap → absent from output)
    val docs = Seq(
      (1L, "srcA", "a b c d"), (2L, "srcB", "a b c"), (3L, "srcB", "a b c"),
      (4L, "srcC", "x y z"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlap(docs, "text", "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // inter(A,B) = {a b c} = 1; union = 2 + 1 - 1 = 2 → 5000 bp
    assert(out((("srcA"): String, "srcB")) == ((1L, 2L, 5000L)))
    assert(out.size == 1) // no-overlap pairs are not emitted
  }

  // ---- heavyHitterReport -----------------------------------------------

  test("heavyHitterReport ranks keys and sizes the salt factor") {
    val s = spark; import s.implicits._
    // key 1: 96 rows of 100 total → 9600 bp → salt = ceil(9600/100) = 96
    // keys 2..5: 1 row each → 100 bp → salt 1
    val rows = (Seq.fill(96)(1) ++ Seq(2, 3, 4, 5)).toDF("k")
    val rep = Skew.heavyHitterReport(rows, "k", k = 3, targetShareBp = 100L)
      .collect()
    assert(rep.length == 3)
    assert(rep(0).getInt(0) == 1 && rep(0).getLong(1) == 96L &&
      rep(0).getLong(2) == 9600L && rep(0).getLong(3) == 96L)
    // ties below the top key break by key order
    assert(rep(1).getInt(0) == 2 && rep(1).getLong(3) == 1L)
    assert(rep(2).getInt(0) == 3)
  }
}
