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

    // round 15: the residual claim MEASURED, not asserted — a planted
    // MANIFOLD corpus (clustered Gaussians: unit-norm centers, σ-noise)
    // where the coarse stage explains most of each vector's energy, so
    // residual encoding should spend the same codebook budget on the
    // within-cluster structure the plain encoding wastes on cluster
    // position. The synthetic-i.i.d. rows above remain as the honest
    // negative (nothing centroid-explained to remove). Deterministic
    // seed → reproducible rows for PLANS.md.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val (nClus, nVecs, dim, sigma) = (64, 16384, 64, 0.15)
    val centers = Array.fill(nClus)(Array.fill(dim)(rnd.nextGaussian()))
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(x => (x / n).toFloat)
      }
    val clusEmb = (0 until nVecs).map { i =>
      val c = centers(i % nClus)
      (i.toLong, c.map(x => x + (sigma * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding").cache()
    val cQueries = clusEmb.filter(col("vec_id") < nQueries)
    val cExact = Similarity.bruteForceTopK(clusEmb, cQueries, k)
      .select("qid", "nid").cache()
    cExact.count()
    def recallClus(name: String, approx: DataFrame): Unit = {
      val hit = cExact.join(approx.select("qid", "nid"), Seq("qid", "nid")).count()
      println(f"[recall] $name%-16s recall@$k = ${hit.toDouble / (nq * k)}%.3f  ($hit/${nq * k}) [clustered]")
    }
    // Centroids = the TRUE cluster centers (the instrument that makes
    // the coarse stage near-perfect, so the rows isolate the ENCODING:
    // both variants probe the same ~exact lists, and any recall gap is
    // ADC resolution — plain PQ must spread its cells over the whole
    // sphere while residual PQ spends them on the σ-ball). A mod-37
    // corpus-sample centroid set was measured first and leaves list
    // misses dominating (~0.25 both variants) — see PLANS.md.
    val ccents = centers.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toSeq.toDF("cid", "cvec")
    val ccb = Similarity.pqCodebook(clusEmb, m = 8)
    Seq(1, 2).foreach { p =>
      recallClus(s"ivfpq clus nP=$p", Similarity.ivfPqTopK(clusEmb, cQueries,
        ccents, ccb, m = 8, dim = 64, k = k, nProbe = p))
    }
    Seq(1, 2).foreach { p =>
      recallClus(s"resid clus nP=$p", Similarity.ivfPqResidualTopK(clusEmb,
        cQueries, ccents, m = 8, dim = 64, k = k, nProbe = p))
    }
    spark.stop()
  }
}
