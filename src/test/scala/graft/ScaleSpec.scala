package graft

import graft.operators.Skew
import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique specs: bucketed co-located joins plan without
  * exchanges; salting spreads heavy keys; SQL-registered native kernels. */
class ScaleSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("bucketed tables join with no shuffle exchange") {
    val s = spark; import s.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, i, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 50L).map(i => (i, s"name$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", "k", 8)
    Bucketing.writeBucketed(dims, "b_dims", "k", 8)
    // force the sort-merge path (a broadcast join would hide the bucketed
    // layout's point: joining two LARGE tables without a shuffle)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "b_facts", "b_dims", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join equals plain join; salted count equals plain count") {
    val s = spark; import s.implicits._
    // heavy skew: 90% of rows share one key
    val large = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i))
      .toDF("k", "payload")
    val small = (0L until 7L).map(i => (i, s"dim$i")).toDF("k", "dim")
    val plain = large.join(small, "k")
    val salted = Skew.saltedJoin(large, small, "k", saltOn = "payload", factor = 4)
    assert(salted.count() == plain.count())
    val plainCounts = large.groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val saltedCounts = Skew.saltedCountByKey(large, "k", "payload", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(saltedCounts == plainCounts)
  }

  test("vec_dot / vec_cosine callable from SQL after registration") {
    val s = spark; import s.implicits._
    GraftExtensions.register(s)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vv")
    val r = s.sql("SELECT vec_dot(a, b) AS d, vec_cosine(a, a) AS c FROM vv").head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    // the fused LSH kernel is SQL-callable too; planes as an inline array
    // literal, planesPerTable a literal third arg (part of the output shape)
    val lsh = s.sql(
      """SELECT vec_lsh_buckets(a,
        |  array(array(1.0D, 0.0D), array(0.0D, -1.0D)), 1) AS b FROM vv""".stripMargin)
      .head().getSeq[Long](0)
    assert(lsh == Seq(1L, 0L)) // a=(1,2): dot>0 -> bit set; -2<0 -> clear
    // the top-k heap aggregate is SQL-callable with a literal k
    val tk = s.sql(
      """SELECT top_k_by_score(id, sc, 2) AS t FROM VALUES
        |  (1L, 0.5D), (2L, 0.9D), (3L, 0.9D), (4L, 0.1D) AS v(id, sc)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(r => (r.getLong(0), r.getDouble(1))) == Seq((2L, 0.9), (3L, 0.9)))
  }
}
