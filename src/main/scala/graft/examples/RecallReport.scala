package graft.examples

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off recall@k audit of the ANN family against exact brute force —
  * the number that justifies the IVF/PQ defaults the driver queries use
  * (q23 nProbe=2, q74 m=8, q102 nProbe=2). Run:
  *
  *   sbt "runMain graft.examples.RecallReport [sfDir] [k] [nQueries]"
  *
  * Results are recorded in PLANS.md §ANN recall. Uses the exact same
  * quantizer constructions as the driver queries (k-means mod-37/2-round
  * for IVF, mod-59 codebook for PQ, mod-37 filter centroids for IVF-PQ)
  * so the reported recall is the recall OF the gated configurations. */
object RecallReport {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nQueries = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < nQueries)
    val nq = queries.count()
    val exact = Similarity.bruteForceTopK(emb, queries, k)
      .select("qid", "nid").cache()
    exact.count()
    def recall(name: String, approx: DataFrame): Unit = {
      val hit = exact.join(approx.select("qid", "nid"), Seq("qid", "nid")).count()
      println(f"[recall] $name%-16s recall@$k = ${hit.toDouble / (nq * k)}%.3f  ($hit/${nq * k})")
    }
    val cents = Similarity.kmeansCentroids(emb, dim = 64, centroidMod = 37, iters = 2)
    Seq(1, 2, 4).foreach { p =>
      recall(s"ivf nProbe=$p", Similarity.ivfTopKWith(emb, queries, cents, k = k, nProbe = p))
    }
    // round 14: the shipped q23 configuration — two-level corpus assign
    // AND two-level query probe (probes come from the query's super's
    // member group, so boundary queries trade some recall for the
    // bounded ~N^¼ broadcasts; compare against the flat rows above)
    Seq(1, 2, 4).foreach { p =>
      recall(s"ivf 2L nProbe=$p", Similarity.ivfTopKWith(emb, queries, cents,
        k = k, nProbe = p, twoLevel = true))
    }
    // round 13: the production default — fixed ~256-cell codebook
    // (seedMod = N/256); recall numbers are therefore vs the shipped
    // configuration, not the old fixed-mod one
    val cb = Similarity.pqCodebook(emb, m = 8)
    recall("pq m=8", Similarity.pqTopKWith(emb, queries, cb, m = 8, dim = 64, k = k))
    // round 14: exact re-rank over the PQ shortlist (c=4) — if ADC
    // ranking distortion (not candidate coverage) is the ceiling, this
    // row should recover most of it at shortlist-bounded exact cost
    val pqShort = Similarity.pqTopKWith(emb, queries, cb,
      m = 8, dim = 64, k = 4 * k)
    recall("pq m=8 rerank4k", Similarity.rerankTopK(emb, queries,
      pqShort.select(col("qid"), col("nid")), k))
    val fcents = emb.filter(pmod(col("vec_id"), lit(37)) === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    Seq(2, 4, 8).foreach { p =>
      recall(s"ivfpq nProbe=$p", Similarity.ivfPqTopK(emb, queries, fcents, cb,
        m = 8, dim = 64, k = k, nProbe = p))
    }
    Seq(2, 4, 8).foreach { p =>
      recall(s"ivfpq 2L nProbe=$p", Similarity.ivfPqTopK(emb, queries, fcents, cb,
        m = 8, dim = 64, k = k, nProbe = p, twoLevel = true))
    }
    // round 14: residual encoding — PQ over (v − assigned centroid); the
    // same codebook budget spent on the residual distribution
    Seq(2, 4, 8).foreach { p =>
      recall(s"ivfpq resid nP=$p", Similarity.ivfPqResidualTopK(emb, queries,
        fcents, m = 8, dim = 64, k = k, nProbe = p))
    }
    spark.stop()
  }
}
