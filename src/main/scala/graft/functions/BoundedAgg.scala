package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Partial-aggregatable "k smallest strings, ascending": the bounded
  * companion to `collect_list` + `sort_array`. A plain collect_list
  * buffers EVERY group member — one hot group (a brand with 10⁸ rows
  * at corpus scale) inflates a single aggregation buffer without
  * bound. This aggregate keeps a max-heap of at most k strings per
  * buffer, merges heaps map-side, and ships O(k) per group per mapper
  * through the shuffle, so per-group state is bounded by k·maxlen
  * regardless of group size.
  *
  * Ordering is UTF8String's byte-wise (binary UTF-8) comparison — the
  * same total order `sort_array` and DuckDB's default collation use,
  * so `min_k_strings(c, k)` ≡ `slice(sort_array(collect_list(c)), 1, k)`
  * row-for-row (duplicates preserved: this is a multiset min-k).
  */
case class MinKStrings(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[UTF8String]] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  /** Max-heap by binary string order: the queue's head is the LARGEST
    * retained string — the one to evict once size exceeds k.
    */
  private val largestFirst: Ordering[UTF8String] =
    Ordering.fromLessThan[UTF8String]((a, b) => a.compareTo(b) < 0)

  override def createAggregationBuffer(): mutable.PriorityQueue[UTF8String] =
    mutable.PriorityQueue.empty[UTF8String](largestFirst)

  override def update(
      buf: mutable.PriorityQueue[UTF8String],
      input: InternalRow): mutable.PriorityQueue[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      // clone: eval may return a pointer into a reused row buffer
      buf.enqueue(v.asInstanceOf[UTF8String].clone())
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[UTF8String],
      other: mutable.PriorityQueue[UTF8String]): mutable.PriorityQueue[UTF8String] = {
    other.foreach { s =>
      buf.enqueue(s)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  // ascending under the same binary order the heap evicts by
  override def eval(buf: mutable.PriorityQueue[UTF8String]): Any =
    new GenericArrayData(buf.toArray.sortWith((a, b) => a.compareTo(b) < 0)
      .asInstanceOf[Array[Any]])

  override def serialize(buf: mutable.PriorityQueue[UTF8String]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var n = in.readInt()
    while (n > 0) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.enqueue(UTF8String.fromBytes(b))
      n -= 1
    }
    buf
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "min_k_strings"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKStrings =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKStrings =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKStrings =
    copy(child = newChildren(0))
}

/** Partial-aggregatable "k smallest DISTINCT longs, ascending" — the
  * KMV (k-minimum-values) sketch state as an aggregate: feed it a
  * 64-bit hash column and the result IS a theta sketch (the k-th
  * smallest distinct hash, normalized, is the theta threshold; the
  * retained set under theta is a uniform sample of the distinct
  * values, which is what makes set-operation ESTIMATES — intersection
  * and union cardinality, the thing HLL cannot do — a few array
  * built-ins away; see StatOps.thetaSetOps). Distinctness is the
  * semantic difference from [[MinKStrings]]: duplicates of one value
  * must not occupy k slots or the estimator is biased, so the buffer
  * is a bounded sorted SET. O(k) state per buffer, map-side
  * combinable, merge-order-independent (a set of minima is), so the
  * output array is deterministic under any partitioning — sketch
  * equality gates can demand exact array equality.
  */
case class MinKDistinctLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def merge(
      buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach { v =>
      buf.add(v)
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray[Long]) // TreeSet iterates ascending; primitive overload

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var n = in.readInt()
    while (n > 0) { buf.add(in.readLong()); n -= 1 }
    buf
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "min_k_distinct_longs"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKDistinctLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKDistinctLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKDistinctLongs =
    copy(child = newChildren(0))
}

object BoundedAgg {

  /** Column-level API: the k binary-smallest strings per group,
    * ascending, duplicates preserved.
    */
  def minKStrings(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MinKStrings(Bridge.expression(c), k).toAggregateExpression())
  }

  /** Column-level API: the k smallest DISTINCT longs per group,
    * ascending — a KMV/theta sketch when fed 64-bit hashes.
    */
  def minKDistinctLongs(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MinKDistinctLongs(Bridge.expression(c), k).toAggregateExpression())
  }

  /** Signed-long hash mapped onto (0,1) in the same order longs sort —
    * the normalization every KMV consumer must share (theta, the
    * common-theta cut in set-op estimates).
    */
  def kmvNorm(hash: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    hash.cast("double") / lit(1.8446744073709552e19) + lit(0.5) // 2^64 exactly
  }

  /** The sketch's theta threshold: the k-th smallest retained hash
    * mapped from signed-long order onto (0,1) — the fraction of hash
    * space the retained set samples. 1.0 while the sketch is below
    * capacity (exact mode). Single-sourced here so the batch set-ops
    * gate, the streaming sketch, and any future consumer share ONE
    * estimator definition.
    *
    * Clamped to Double.MinPositiveValue: a retained hash of exactly
    * Long.MinValue maps to kmvNorm = 0.0 (probability ~2^-63 per
    * sketch), and a zero theta would turn every downstream (k−1)/θ
    * estimate into Infinity and silently fail the tolerance gates —
    * the guard is one `greatest`, so pay it rather than document the
    * exclusion.
    */
  def kmvTheta(sketch: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(size(sketch) < k, lit(1.0))
      .otherwise(greatest(kmvNorm(element_at(sketch, k)), lit(java.lang.Double.MIN_VALUE)))
  }

  /** The KMV cardinality estimate: (k−1)/θ when the sketch is
    * saturated, the exact retained count below capacity.
    */
  def kmvEstimate(sketch: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) / kmvTheta(sketch, k))
  }
}
