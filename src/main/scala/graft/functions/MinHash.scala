package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Row-local MinHash core shared by the Catalyst kernels below and the
  * streaming path ([[graft.streaming.StreamingOps.bandKeysOf]]): plain
  * Scala over String tokens, producing values BIT-IDENTICAL to the batch
  * xxhash64 pipeline — so streaming candidate state and batch LSH output
  * live in the same hash space and can be joined/compared directly. */
object MinHash {
  import org.apache.spark.unsafe.types.UTF8String

  /** Signature of a token sequence: k salted minima over
    * `shingleN`-gram shingle hashes; same composition as
    * `Dedup.minhashSignatures`. Empty input → null. */
  def signature(toks: Array[String], k: Int, shingleN: Int): Array[Long] = {
    val m = toks.length
    if (m == 0) return null
    val th = new Array[Long](m)
    var p = 0
    while (p < m) {
      th(p) = if (toks(p) == null) 0L
        else XXH64.hashUTF8String(UTF8String.fromString(toks(p)), 42L)
      p += 1
    }
    val sig = Array.fill(k)(Long.MaxValue)
    val last = if (m >= shingleN) m - shingleN else 0
    p = 0
    while (p <= last) {
      var h = 42L
      var j = 0
      while (j < shingleN) {
        h = XXH64.hashLong(if (p + j < m) th(p + j) else 0L, h)
        j += 1
      }
      var i = 0
      while (i < k) {
        val s = XXH64.hashInt(i, XXH64.hashLong(h, 42L))
        if (s < sig(i)) sig(i) = s
        i += 1
      }
      p += 1
    }
    sig
  }

  /** LSH band keys of a signature; same fold as `Dedup.bandKeys`. */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { j =>
      var h = 42L
      var i = 0
      while (i < rows) { h = XXH64.hashLong(sig(j * rows + i), h); i += 1 }
      XXH64.hashInt(j, h)
    }
  }
}

/** Fused per-row MinHash signature kernel.
  *
  * Computes, in ONE codegen pass over a document's token array, the exact
  * signature the explode-shape pipeline produces
  * (`Dedup.shingleHashes` → k `min` aggregates): word-`shingleN`-gram
  * shingle identities as xxhash64 folds of per-token xxhash64 values, then
  * `sig[i] = min over shingles of xxhash64(shingle, i)`. Bit-identical to
  * the DataFrame formulation (verified by a differential spec), because it
  * replays Spark's own hash composition: strings via
  * `XXH64.hashUTF8String(t, 42)`, long folds via `hashLong(h, seed)` from
  * seed 42, and the integer salt via `hashInt(i, ·)` — exactly what
  * `xxhash64(col…)` evaluates.
  *
  * Why it exists (scale): the explode shape shuffles one (id, shingle-hash)
  * row PER TOKEN of the corpus to group-and-minimize — at 100 TB that
  * shuffle is corpus-sized. This kernel keeps the whole signature
  * computation inside the scan's WholeStageCodegen: zero shuffle, zero
  * intermediate rows, one long[] per document. Same output, one fewer
  * corpus-wide exchange.
  *
  * Short documents (fewer than `shingleN` tokens) hash their single
  * truncated shingle with missing positions as 0L — the same
  * whole-short-doc identity the explode shape's coalesce produces. An
  * EMPTY token array yields NULL (the explode shape simply emits no rows
  * for such a doc), so callers filter `isNotNull`.
  */
case class MinHashSignature(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression {

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 && shingleN > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens and k, shingleN > 0; " +
        s"got ${other.simpleString}, k=$k, shingleN=$shingleN")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m == 0) return null
    val th = new Array[Long](m)
    var p = 0
    while (p < m) {
      val t = toks.getUTF8String(p)
      th(p) = if (t == null) 0L else XXH64.hashUTF8String(t, 42L)
      p += 1
    }
    val sig = Array.fill(k)(Long.MaxValue)
    val last = if (m >= shingleN) m - shingleN else 0
    p = 0
    while (p <= last) {
      var h = 42L
      var j = 0
      while (j < shingleN) {
        val hj = if (p + j < m) th(p + j) else 0L
        h = XXH64.hashLong(hj, h)
        j += 1
      }
      var i = 0
      while (i < k) {
        val s = XXH64.hashInt(i, XXH64.hashLong(h, 42L))
        if (s < sig(i)) sig(i) = s
        i += 1
      }
      p += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val m = ctx.freshName("m"); val th = ctx.freshName("th")
      val sig = ctx.freshName("sig"); val p = ctx.freshName("p")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val hj = ctx.freshName("hj")
      val s = ctx.freshName("s"); val t = ctx.freshName("t")
      val last = ctx.freshName("last")
      s"""
         |int $m = $a.numElements();
         |if ($m == 0) { ${ev.isNull} = true; } else {
         |  long[] $th = new long[$m];
         |  for (int $p = 0; $p < $m; $p++) {
         |    org.apache.spark.unsafe.types.UTF8String $t =
         |      $a.isNullAt($p) ? null : $a.getUTF8String($p);
         |    $th[$p] = $t == null ? 0L : $xxh.hashUTF8String($t, 42L);
         |  }
         |  long[] $sig = new long[$k];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  int $last = ($m >= $shingleN) ? ($m - $shingleN) : 0;
         |  for (int $p = 0; $p <= $last; $p++) {
         |    long $h = 42L;
         |    for (int $j = 0; $j < $shingleN; $j++) {
         |      long $hj = ($p + $j < $m) ? $th[$p + $j] : 0L;
         |      $h = $xxh.hashLong($hj, $h);
         |    }
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $s = $xxh.hashInt($i, $xxh.hashLong($h, 42L));
         |      if ($s < $sig[$i]) $sig[$i] = $s;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused per-row MinHash LSH BAND KEYS: the full [[MinHashSignature]]
  * computation plus the band fold of `Dedup.bandKeys`
  * (`xxhash64(slice(sig, j·rows+1, rows), j)` — Spark hashes an array by
  * folding `hashLong` over its elements from seed 42, then the band index
  * via `hashInt`), all inside ONE codegen evaluation.
  *
  * Why a separate kernel instead of `bandKeys(minhash_sig(…))`: Catalyst
  * inlines a projected alias into its consumers, and the 16 band slices
  * each re-evaluated the whole signature — measured 19.9 s vs 0.5 s for
  * the one-pass form at sf0.1. The aggregation barrier protects the
  * explode shape from this; a pure-projection pipeline must fuse the
  * fan-out into the kernel itself. Bit-identical to
  * `bandKeys(minhashSignatures(…))` (differential-spec'd). */
case class MinHashBandKeys(child: Expression, k: Int, shingleN: Int, bands: Int)
    extends UnaryExpression {

  private def rows: Int = k / bands

  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _)
        if k > 0 && shingleN > 0 && bands > 0 && k % bands == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, k, shingleN, bands > 0 " +
        s"and bands | k; got ${other.simpleString}, k=$k, shingleN=$shingleN, " +
        s"bands=$bands")
  }

  @transient private lazy val sigKernel = MinHashSignature(child, k, shingleN)

  override def nullSafeEval(input: Any): Any = {
    val sigOrNull = sigKernel.nullSafeEval(input)
    if (sigOrNull == null) return null
    val sig = sigOrNull.asInstanceOf[ArrayData]
    val bk = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var h = 42L
      var i = 0
      while (i < rows) { h = XXH64.hashLong(sig.getLong(j * rows + i), h); i += 1 }
      bk(j) = XXH64.hashInt(j, h)
      j += 1
    }
    new GenericArrayData(bk)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val m = ctx.freshName("m"); val th = ctx.freshName("th")
      val sig = ctx.freshName("sig"); val p = ctx.freshName("p")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val hj = ctx.freshName("hj")
      val s = ctx.freshName("s"); val t = ctx.freshName("t")
      val last = ctx.freshName("last"); val bk = ctx.freshName("bk")
      val bh = ctx.freshName("bh")
      s"""
         |int $m = $a.numElements();
         |if ($m == 0) { ${ev.isNull} = true; } else {
         |  long[] $th = new long[$m];
         |  for (int $p = 0; $p < $m; $p++) {
         |    org.apache.spark.unsafe.types.UTF8String $t =
         |      $a.isNullAt($p) ? null : $a.getUTF8String($p);
         |    $th[$p] = $t == null ? 0L : $xxh.hashUTF8String($t, 42L);
         |  }
         |  long[] $sig = new long[$k];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  int $last = ($m >= $shingleN) ? ($m - $shingleN) : 0;
         |  for (int $p = 0; $p <= $last; $p++) {
         |    long $h = 42L;
         |    for (int $j = 0; $j < $shingleN; $j++) {
         |      long $hj = ($p + $j < $m) ? $th[$p + $j] : 0L;
         |      $h = $xxh.hashLong($hj, $h);
         |    }
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $s = $xxh.hashInt($i, $xxh.hashLong($h, 42L));
         |      if ($s < $sig[$i]) $sig[$i] = $s;
         |    }
         |  }
         |  long[] $bk = new long[$bands];
         |  for (int $j = 0; $j < $bands; $j++) {
         |    long $bh = 42L;
         |    for (int $i = 0; $i < $rows; $i++) {
         |      $bh = $xxh.hashLong($sig[$j * $rows + $i], $bh);
         |    }
         |    $bk[$j] = $xxh.hashInt($j, $bh);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bk);
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
