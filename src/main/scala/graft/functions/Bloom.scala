package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter membership as NATIVE Spark machinery: a mergeable
  * `TypedImperativeAggregate` that ORs per-partition bitmasks (map-side
  * partial aggregation gives the classic distributed-bloom build: each
  * input partition contributes one m-bit mask to the shuffle, never its
  * rows), plus a codegen'd scalar membership probe over the broadcast
  * mask.
  *
  * The decontamination shape at 100 TB: the REFERENCE set (test-set /
  * benchmark grams — tiny next to the corpus) is aggregated into one
  * mask; the corpus side is then a pure broadcast scan — no shuffle of
  * corpus rows at all, unlike the exact join path
  * (`Dedup.crossCorpusContamination`), at the price of deterministic,
  * engine-reproducible false positives: bit positions derive from md5 of
  * the gram text, so any engine with md5 reproduces the EXACT same mask
  * and the exact same false positives (the DuckDB oracle does).
  */
object Bloom {

  /** bloom_mask_agg(pos): aggregate bit positions (0 ≤ pos < mBits) into
    * a BinaryType bitmask of mBits/8 bytes. Bit `p` lives in byte
    * `p >> 3`, bit-in-byte `p & 7` — the layout `bloom_contains` probes. */
  case class BloomMaskAgg(
      child: Expression, mBits: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]] {

    require(mBits > 0 && mBits % 8 == 0, "mBits must be a positive multiple of 8")

    override def prettyName: String = "bloom_mask_agg"
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBits / 8)

    override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val p = v.asInstanceOf[Long]
        require(p >= 0 && p < mBits, s"bloom position $p outside [0, $mBits)")
        b((p >> 3).toInt) = (b((p >> 3).toInt) | (1 << (p & 7).toInt)).toByte
      }
      b
    }

    override def merge(b: Array[Byte], other: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < b.length) { b(i) = (b(i) | other(i)).toByte; i += 1 }
      b
    }

    override def eval(b: Array[Byte]): Any = b
    override def serialize(b: Array[Byte]): Array[Byte] = b
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def withNewMutableAggBufferOffset(o: Int): BloomMaskAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomMaskAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BloomMaskAgg =
      copy(child = newChildren(0))
  }

  /** bloom_mask_or_agg(mask): OR whole bitmasks together (round 16 — the
    * APPEND half of the persisted decontamination index: a new
    * benchmark's gram mask ORs into the existing mask because the bloom
    * build is a pure set union over bit positions). Same buffer layout
    * as [[BloomMaskAgg]]; masks of the wrong length fail loudly rather
    * than silently truncating the reference. */
  case class BloomMaskOrAgg(
      child: Expression, mBits: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]] {

    require(mBits > 0 && mBits % 8 == 0, "mBits must be a positive multiple of 8")

    override def prettyName: String = "bloom_mask_or_agg"
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBits / 8)

    override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val m = v.asInstanceOf[Array[Byte]]
        require(m.length == b.length,
          s"bloom mask of ${m.length * 8} bits cannot OR into $mBits-bit aggregate")
        merge(b, m)
      } else b
    }

    override def merge(b: Array[Byte], other: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < b.length) { b(i) = (b(i) | other(i)).toByte; i += 1 }
      b
    }

    override def eval(b: Array[Byte]): Any = b
    override def serialize(b: Array[Byte]): Array[Byte] = b
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def withNewMutableAggBufferOffset(o: Int): BloomMaskOrAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomMaskOrAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BloomMaskOrAgg =
      copy(child = newChildren(0))
  }

  /** bloom_contains(mask, pos): bit `pos` set in `mask`? Codegen'd to two
    * array reads — stays inside whole-stage codegen on the corpus scan. */
  case class BloomContains(left: Expression, right: Expression)
      extends BinaryExpression {

    override def prettyName: String = "bloom_contains"
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, bigint), got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
      }

    override protected def nullSafeEval(mask: Any, pos: Any): Any = {
      val m = mask.asInstanceOf[Array[Byte]]
      val p = pos.asInstanceOf[Long]
      (m((p >> 3).toInt) & (1 << (p & 7).toInt)) != 0
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (m, p) =>
        s"${ev.value} = (($m[(int)($p >> 3)]) & (1 << (int)($p & 7))) != 0;")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BloomContains =
      copy(left = newLeft, right = newRight)
  }

  def bloom_mask_agg(pos: Column, mBits: Int): Column =
    Bridge.column(BloomMaskAgg(Bridge.expression(pos), mBits).toAggregateExpression())

  def bloom_mask_or_agg(mask: Column, mBits: Int): Column =
    Bridge.column(BloomMaskOrAgg(Bridge.expression(mask), mBits).toAggregateExpression())

  def bloom_contains(mask: Column, pos: Column): Column =
    Bridge.column(BloomContains(Bridge.expression(mask), Bridge.expression(pos)))
}
