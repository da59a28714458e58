package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Robust JSONL source: good lines parse, corrupt lines quarantine with
  * their original bytes, blanks are ignored, schema drift stays on the
  * good path. */
class JsonlSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("good/corrupt/blank/drifted lines route correctly; one scan, no cache") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val lines = Seq(
      """{"id": 1, "text": "hello world"}""",
      """{"id": 2, "text": "quoted \" and \n escapes"}""",
      "", // blank: ignored
      """{"id": 3 text": broken""", // corrupt: quarantined
      """not json at all""", // corrupt: quarantined
      """{"id": 4}""", // drifted (missing field): good path, null text
      """{"id": 5, "text": "bye", "extra": true}""") // extra field: good
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val out = Jsonl.readRobust(spark, dir.toString, schema)
    val before = spark.sparkContext.getPersistentRDDs.size
    val rows = out.collect()
    assert(spark.sparkContext.getPersistentRDDs.size == before, "cached blocks leaked")
    val good = rows.filter(_.getAs[Boolean]("_ok"))
    val bad = rows.filterNot(_.getAs[Boolean]("_ok"))
    assert(good.map(_.getAs[Long]("id")).sorted.toSeq == Seq(1L, 2L, 4L, 5L))
    assert(good.forall(_.getAs[String]("_raw") == null)) // narrow good rows
    assert(bad.map(_.getAs[String]("_raw")).toSet ==
      Set("""{"id": 3 text": broken""", "not json at all"))
    val r2 = good.find(_.getAs[Long]("id") == 2L).get
    assert(r2.getAs[String]("text") == "quoted \" and \n escapes")
    assert(good.find(_.getAs[Long]("id") == 4L).get.getAs[String]("text") == null)
  }

  test("reserved corrupt-record column name in the schema is rejected") {
    val bad = StructType(Seq(StructField("_graft_corrupt", StringType)))
    val e = intercept[IllegalArgumentException] {
      Jsonl.readRobust(spark, "/tmp/nonexistent", bad)
    }
    assert(e.getMessage.contains("_graft_corrupt"), e.getMessage)
  }

  test("native-writer roundtrip: parquet -> jsonl -> readRobust is lossless") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl2").toString
    val df = Seq((1L, "line one\nwith newline"), (2L, "two"), (3L, "three"))
      .toDF("id", "text")
    df.write.mode("overwrite").json(dir)
    val back = Jsonl.readRobust(spark, dir, schema)
    assert(back.filter(!col("_ok")).count() == 0)
    assert(back.select("id", "text").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "line one\nwith newline"), (2L, "two"), (3L, "three")))
  }
}
