package graft

import graft.operators.{Dedup, Events}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 regression guards.
  *
  * 1. The driver's `events.ts` switched parquet type NANOS→µs-TIMESTAMP_NTZ
  *    between rounds 7 and 8 and silently broke `unix_micros`-based
  *    operators at ANALYSIS time (r8 verdict #1). Every events operator
  *    must run against a µs-NTZ parquet fixture — written here through
  *    Spark's own TIMESTAMP_NTZ type so the fixture matches the corpus
  *    footers (`isAdjustedToUTC=false`).
  *
  * 2. Operators that persist intermediates must RELEASE them: a long-lived
  *    session (bench loop, query service) must not accumulate blocks
  *    (r8 verdict #2).
  */
class NtzRegressionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** events-shaped fixture whose `ts` round-trips parquet as µs-NTZ. */
  private lazy val ntzDir: String = {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    val rows = (1L to 200L).map { i =>
      (i, i % 10,
        if (i % 3 == 0) "purchase" else if (i % 2 == 0) "click" else "view",
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(i * 17),
        i * 1.5)
    }
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  private def ntzEvents = {
    val df = spark.read.parquet(s"$ntzDir/events.parquet")
    assert(df.schema("ts").dataType.typeName == "timestamp_ntz",
      s"fixture must be NTZ, got ${df.schema("ts").dataType}")
    df
  }

  test("every events operator runs on a TIMESTAMP_NTZ ts column") {
    val ev = ntzEvents
    assert(Events.sessionize(ev).count() == 200)
    assert(Events.sessionStats(ev).count() > 0)
    assert(Events.timeBucketStats(ev).count() > 0)
    assert(Events.movingDailyStats(ev).count() > 0)
    assert(Events.cohortRetention(ev).count() > 0)
    val funnel = Events.funnelReport(ev, Seq("view", "click", "purchase"))
    assert(funnel.count() == 3)
    val asof = Events.asOfJoin(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"),
      "user_id", "ts", "value")
    assert(asof.count() > 0)
  }

  test("q16_sessionize and q76_funnel run via the shared loader on NTZ data") {
    // the shared loader t() must normalize NTZ → TimestampType; exercise
    // the two driver queries that died in round 8 against the fixture
    for (q <- Seq("q16_sessionize", "q76_funnel")) {
      val df = SparkEntry.queries(q)(spark, ntzDir)
      assert(df.count() > 0, s"$q returned no rows on the NTZ fixture")
    }
  }

  test("funnelReport leaves no persisted blocks behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    Events.funnelReport(ntzEvents, Seq("view", "click", "purchase")).count()
    // unpersist(blocking=false) is async on the block manager but the
    // cacheManager/persistentRdds entry is removed synchronously
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "funnelReport leaked persisted blocks")
  }

  test("fused minhashCandidates: no persist, kernel scan shared via ReusedExchange") {
    val s = spark; import s.implicits._
    // through parquet, not toDF: a LocalRelation gets constant-folded by
    // ConvertToLocalRelation and the kernel would vanish from the plan,
    // making the single-evaluation assertion vacuous
    val dir = java.nio.file.Files.createTempDirectory("graft-mh").toString
    (1L to 50L).map { i =>
      (i, if (i % 7 == 0) "the quick brown fox jumps over the lazy dog again and again"
          else s"document number $i with some distinct words ${i * 31} and ${i * 17}")
    }.toDF("doc_id", "text").write.parquet(s"$dir/docs.parquet")
    val docs = spark.read.parquet(s"$dir/docs.parquet")
    val before = spark.sparkContext.getPersistentRDDs.size
    val cands = Dedup.minhashCandidates(docs, "text", "doc_id",
      k = 64, bands = 16, fused = true)
    cands.collect()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "fused minhashCandidates persisted blocks")
    // the AQE toString appends the pre-execution "Initial Plan" — assert
    // on the Final Plan section only
    val plan = cands.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("ReusedExchange"),
      "fused self-join must reuse the kernel's shuffle, not re-run the scan:\n" +
        plan.take(3000))
    // the kernel must be evaluated in exactly one place (the projection
    // under the one shuffle) — no alias re-inlining into scan filters
    assert("minhash_bands".r.findAllIn(plan).length == 1,
      "minhash kernel appears more than once in the executed plan:\n" +
        plan.take(3000))
  }
}
