package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Partial-aggregatable top-k: keeps a BOUNDED heap of the k best
  * (score desc, id asc) entries per group and merges heaps map-side,
  * so a group's candidate set never lands in a single task for a full
  * sort — the fix for the `row_number() OVER (PARTITION BY query)`
  * anti-pattern, where every query's whole candidate list must be
  * collected and sorted in one place. Partial buffers are at most k
  * entries regardless of input size, so the shuffle carries O(k) per
  * group per mapper instead of O(candidates).
  *
  * Output: array of ids in rank order (best first). Ties on score
  * break toward the lower id — the same total order as the window
  * formulation it replaces, so results are identical.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (double, bigint), got " +
          s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")
    }

  /** Worst-first: the queue's head (max per this ordering) is the
    * entry to evict — lowest score, then highest id.
    */
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // lower score = worse
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher id = worse
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  // worstFirst makes the worst entry the ordering's MAX (so the queue
  // evicts it); ascending sort under it is therefore best-first.
  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(worstFirst).map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var n = in.readInt()
    while (n > 0) { buf.enqueue((in.readDouble(), in.readLong())); n -= 1 }
    buf
  }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** Column-level API: ids of the k best rows per group, best first.
    * Callers must pass a double score and a long id (cast at the call
    * site — ExpectsInputTypes checks but does not coerce).
    */
  def topKByScore(score: org.apache.spark.sql.Column,
                  id: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
  }
}
