package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k BEST (score, id) pairs under the total
  * order (score desc, id asc — the rank-window tie rule) in two
  * primitive arrays. Insert = O(k) replace-worst (k is small); merge =
  * insert the other side's entries. No boxing, no per-row encoders —
  * the whole point of the hand-written aggregate over an
  * `Aggregator`/udaf wrapper, whose per-row input encoding measured
  * 2× SLOWER than the sort it replaced at the 10⁹-candidate fold.
  */
final class TopKBuf(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true iff (s1, id1) is better than (s2, id2): score desc, id asc. */
  @inline private def better(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 > s2 || (s1 == s2 && id1 < id2)

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
    } else {
      // find the worst kept entry; replace it if the candidate beats it
      var worst = 0
      var i = 1
      while (i < size) {
        if (better(scores(worst), ids(worst), scores(i), ids(i))) worst = i
        i += 1
      }
      if (better(score, id, scores(worst), ids(worst))) {
        scores(worst) = score; ids(worst) = id
      }
    }
  }

  /** Indices of the kept entries, best-first. */
  def sortedIdx: Array[Int] =
    Array.range(0, size).sortWith((a, b) =>
      better(scores(a), ids(a), scores(b), ids(b)))
}

/** `topk_pairs(score, id)`: per-group top-k (score, id) pairs as
  * array<struct<score, id>>, best-first — bounded aggregation state
  * (k pairs per group per partition, combined map-side), so the
  * exchange carries ≤ k rows per group and NO candidate-stream sort
  * exists anywhere in the plan. Deterministic for any merge order:
  * (score desc, id asc) is a total order when ids are unique within a
  * group, so the k best are a set property of the input. Callers with
  * exact integer scores stay exact below 2⁵³ (the quantized-dot range
  * is ≤ 2.6e14) and IEEE doubles compare identically in both engines.
  */
case class TopKPairsAgg(k: Int, score: Expression, id: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  override def left: Expression = score
  override def right: Expression = id
  override def prettyName: String = "topk_pairs"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs requires (DOUBLE, BIGINT), got (${s.simpleString}, ${i.simpleString})")
    }

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.scores(i), other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    val idx = buf.sortedIdx
    new GenericArrayData(idx.map(i => new GenericInternalRow(
      Array[Any](buf.scores(i), buf.ids(i)))))
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    var i = 0
    while (i < n) {
      buf.scores(i) = bb.getDouble; buf.ids(i) = bb.getLong; i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKPairsAgg =
    copy(score = newLeft, id = newRight)
}

object TopKPairs {
  /** Top-k (score, id) pairs per group, best-first — fields `score`,
    * `id` in the result array's structs.
    */
  def topK(k: Int, score: Column, id: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(TopKPairsAgg(k, shims.expression(score), shims.expression(id))
      .toAggregateExpression())
  }
}
