package graft

import graft.functions.{MinHashBandKeys, MinHashSignature}
import graft.functions.TopK.TopKByScore
import graft.functions.VectorExpressions.{CosineSimilarity, DotProduct, HyperplaneBuckets}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration: makes the engine's native
  * expressions callable from SQL text.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT vec_cosine(a.embedding, b.embedding) ...")
  *
  * (For an existing session, use [[GraftExtensions.register]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.vecDot)
    e.injectFunction(GraftExtensions.vecCosine)
    e.injectFunction(GraftExtensions.vecLshBuckets)
    e.injectFunction(GraftExtensions.topKByScore)
    e.injectFunction(GraftExtensions.minhashSig)
    e.injectFunction(GraftExtensions.minhashBands)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private[graft] val vecDot =
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1)))

  private[graft] val vecCosine =
    (FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1)))

  /** The table width is part of the function IDENTITY (it shapes the
    * output), so SQL callers pass it as a literal third argument. */
  private def lshFromArgs(args: Seq[Expression]): Expression = {
    require(args.length == 3 && args(2).foldable,
      "vec_lsh_buckets(vec, planes, planesPerTable) needs a literal third arg")
    val r = args(2).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"planesPerTable must be an integer literal, got $other")
    }
    HyperplaneBuckets(args(0), args(1), r)
  }

  private[graft] val vecLshBuckets =
    (FunctionIdentifier("vec_lsh_buckets"),
      info("vec_lsh_buckets",
        "vec_lsh_buckets(vec, planes, planesPerTable) - multi-table random-hyperplane LSH bucket ids"),
      (args: Seq[Expression]) => lshFromArgs(args))

  private def topKFromArgs(args: Seq[Expression]): Expression = {
    require(args.length == 3 && args(2).foldable,
      "top_k_by_score(id, score, k) needs a literal k")
    val k = args(2).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"k must be an integer literal, got $other")
    }
    TopKByScore(args(0), args(1), k).toAggregateExpression()
  }

  private def minhashFromArgs(args: Seq[Expression]): Expression = {
    require(args.length == 3 && args(1).foldable && args(2).foldable,
      "minhash_sig(tokens, k, shingleN) needs literal k and shingleN")
    def lit(e: Expression): Int = e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"expected an integer literal, got $other")
    }
    MinHashSignature(args(0), lit(args(1)), lit(args(2)))
  }

  private[graft] val minhashSig =
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(tokens, k, shingleN) - fused per-row MinHash signature (array<long> of k minima)"),
      (args: Seq[Expression]) => minhashFromArgs(args))

  private def minhashBandsFromArgs(args: Seq[Expression]): Expression = {
    require(args.length == 4 && args.drop(1).forall(_.foldable),
      "minhash_bands(tokens, k, shingleN, bands) needs literal k/shingleN/bands")
    def lit(e: Expression): Int = e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"expected an integer literal, got $other")
    }
    MinHashBandKeys(args(0), lit(args(1)), lit(args(2)), lit(args(3)))
  }

  private[graft] val minhashBands =
    (FunctionIdentifier("minhash_bands"),
      info("minhash_bands",
        "minhash_bands(tokens, k, shingleN, bands) - one-pass MinHash LSH band keys (array<long>)"),
      (args: Seq[Expression]) => minhashBandsFromArgs(args))

  private[graft] val topKByScore =
    (FunctionIdentifier("top_k_by_score"),
      info("top_k_by_score",
        "top_k_by_score(id, score, k) - k best (score desc, id asc) entries of the group as array<struct>"),
      (args: Seq[Expression]) => topKFromArgs(args))

  /** Register the functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", args => DotProduct(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", args => CosineSimilarity(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_lsh_buckets", lshFromArgs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_by_score", topKFromArgs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", minhashFromArgs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_bands", minhashBandsFromArgs, "built-in")
  }
}
