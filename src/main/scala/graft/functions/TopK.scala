package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as a REAL aggregate, not a ranking window.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k` shuffles
  * and sorts EVERY scored row — at ANN scale that is corpus × queries rows
  * through one exchange. This aggregate keeps a k-bounded binary heap per
  * group with map-side partial aggregation: each input partition
  * contributes at most k entries per group to the shuffle, and merges are
  * heap-merges. Same results (ties broken by ascending id — identical to
  * the window formulation's ORDER BY score DESC, id ASC), shuffle bounded
  * by k·groups instead of the scored row count.
  */
object TopK {

  /** k-bounded heap of (id, score); the WORST entry sits at the root so
    * inserts into a full heap evict in O(log k). Worse = lower score, or
    * equal score and larger id. */
  final class Buffer(val k: Int) {
    var n = 0
    val ids = new Array[Long](k)
    val scores = new Array[Double](k)

    private def worse(i: Int, j: Int): Boolean =
      scores(i) < scores(j) || (scores(i) == scores(j) && ids(i) > ids(j))
    private def swap(i: Int, j: Int): Unit = {
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    }
    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && worse(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }
    private def siftDown(i0: Int): Unit = {
      var i = i0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < n && worse(l, m)) m = l
        if (r < n && worse(r, m)) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

    def insert(id: Long, score: Double): Unit =
      if (n < k) {
        ids(n) = id; scores(n) = score; n += 1; siftUp(n - 1)
      } else if (n > 0 &&
          (score > scores(0) || (score == scores(0) && id < ids(0)))) {
        ids(0) = id; scores(0) = score; siftDown(0)
      }

    /** Entries sorted best-first (score desc, id asc). */
    def sorted: Array[(Long, Double)] =
      Array.tabulate(n)(i => (ids(i), scores(i)))
        .sortBy { case (id, s) => (-s, id) }
  }

  val EntryType: StructType = StructType(Seq(
    StructField("nid", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  case class TopKByScore(
      idExpr: Expression, scoreExpr: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buffer] {

    require(k > 0, "k must be positive")

    override def prettyName: String = "top_k_by_score"
    override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(EntryType, containsNull = false)

    override def createAggregationBuffer(): Buffer = new Buffer(k)

    override def update(b: Buffer, input: InternalRow): Buffer = {
      val id = idExpr.eval(input)
      val sc = scoreExpr.eval(input)
      if (id != null && sc != null)
        b.insert(id.asInstanceOf[Long], sc.asInstanceOf[Double])
      b
    }

    override def merge(b: Buffer, other: Buffer): Buffer = {
      var i = 0
      while (i < other.n) { b.insert(other.ids(i), other.scores(i)); i += 1 }
      b
    }

    override def eval(b: Buffer): Any =
      new GenericArrayData(b.sorted.map { case (id, s) =>
        InternalRow(id, s)
      }: Array[Any])

    override def serialize(b: Buffer): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 16 * b.n)
      bb.putInt(b.k); bb.putInt(b.n)
      var i = 0
      while (i < b.n) { bb.putLong(b.ids(i)); bb.putDouble(b.scores(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val b = new Buffer(bb.getInt())
      val n = bb.getInt()
      // raw heap arrays round-trip as-is; the heap property is positional
      var i = 0
      while (i < n) { b.ids(i) = bb.getLong(); b.scores(i) = bb.getDouble(); i += 1 }
      b.n = n
      b
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKByScore =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): TopKByScore =
      copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
  }

  /** top_k_by_score(id, score, k): array<struct<nid,score>> of the k
    * best (score desc, id asc) entries of the group. */
  def top_k_by_score(id: Column, score: Column, k: Int): Column =
    Bridge.column(TopKByScore(Bridge.expression(id), Bridge.expression(score), k)
      .toAggregateExpression())
}
