package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the whole-operator Catalyst extension tier
  * (logical node → strategy → physical merge-scan), for the one
  * common operator Spark genuinely lacks: "for each left row, the
  * LATEST right row with the same key and time ≤ the left time"
  * (pandas merge_asof, kdb aj, QuestDB/Flink ASOF JOIN).
  *
  * Why not compose built-ins? The engine's window formulation
  * (StatOps.asofJoin: running max-over-rangeBetween) is correct and
  * the same O(|L|+|R|) asymptotics — but only because its payload is
  * ONE orderable column riding a max(); a general as-of join must
  * return the whole matched right row, which the window trick can
  * express only by packing every payload column into a
  * lexicographically-max struct, mixing both sides into one
  * partition stream. This operator is the direct plan: shuffle each
  * side once on the key (the same ClusteredDistribution contract
  * sort-merge join uses, so EnsureRequirements co-partitions them),
  * sort each partition by (key, time), then a single forward merge
  * pass emitting the full right row — clean nullability, no
  * union/struct contortions, and measured at parity with the window
  * twin on the single-column case (TimeQuery sf0.1: 0.62 s vs
  * 0.50 s). At 100 TB the shuffle is the same as any equi-join's;
  * everything after is streaming.
  *
  * Scope kept honest: time expressions must be LongType (the engine's
  * epoch-second convention via TimeSeriesOps.epochSecExpr) or the
  * same timestamp type on both sides (timestamps are Long micros
  * internally; tolerance is then in microseconds); a NULL
  * time never matches (left emits nulls, right rows are skipped) —
  * the same contract as the window twin, where null es sorts first
  * and a null max propagates. NULL equi-keys follow SQL equi-join
  * semantics: a null key matches NOTHING (a null-keyed left row emits
  * nulls, a null-keyed right row is never a candidate) — NOT the
  * "null group joins null group" reading the sort order alone would
  * give, which no SQL engine's `l.k = r.k` join condition exhibits.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long] = None,
    broadcastRight: Boolean = false) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs at least one equi-key per side")
  // a normal SQL join would COERCE mismatched key types; this node
  // hash-partitions and byte-compares each side with its own type, so
  // a mismatch (INT vs BIGINT key) would silently drop matches —
  // fail fast instead and tell the caller to cast. sameType ignores
  // nullability (UnsafeRow layout/hash are identical across it),
  // matching Spark's own join checks.
  leftKeys.zip(rightKeys).zipWithIndex.foreach { case ((lk, rk), i) =>
    require(!lk.resolved || !rk.resolved ||
      org.apache.spark.sql.graftbridge.Bridge.sameType(lk.dataType, rk.dataType),
      s"as-of join key #$i has mismatched types: ${lk.dataType} vs " +
        s"${rk.dataType} — cast one side explicitly")
  }
  // same fail-fast treatment for the time columns (the exec re-checks
  // at execution as defense, but the error belongs at the call site)
  if (leftTime.resolved && rightTime.resolved)
    AsOfTime.requireTypes(leftTime, rightTime)

  // right payload becomes nullable: a left row may have no match
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: two physical choices — the shuffle-free
  * broadcast probe when the caller asserts the right side is small
  * (`broadcastRight`, the as-of analog of a broadcast-hash-join
  * hint), else the co-partitioned merge-scan (the SMJ analog).
  * planLater for the children so the rest of the tree plans normally.
  */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case a: AsOfJoin if a.broadcastRight =>
      BroadcastAsOfJoinExec(a.leftKeys, a.rightKeys, a.leftTime, a.rightTime,
        a.tolerance, planLater(a.left), planLater(a.right)) :: Nil
    case a: AsOfJoin =>
      AsOfJoinExec(a.leftKeys, a.rightKeys, a.leftTime, a.rightTime,
        a.tolerance, planLater(a.left), planLater(a.right)) :: Nil
    case _ => Nil
  }
}

/** Shared time-type contract for both physical forms: LongType (the
  * engine's epoch-second convention) or a timestamp type — timestamps
  * are Long microseconds in InternalRow, so comparisons and the
  * tolerance arithmetic work unchanged (tolerance is in the column's
  * native unit). Both sides must agree.
  */
private[plans] object AsOfTime {
  def requireTypes(leftTime: Expression, rightTime: Expression): Unit = {
    def ok(dt: org.apache.spark.sql.types.DataType) =
      dt == LongType ||
        dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.TimestampNTZType
    require(ok(leftTime.dataType) && rightTime.dataType == leftTime.dataType,
      "as-of time expressions must be LongType (epoch seconds) or the same " +
        s"timestamp type on both sides; got ${leftTime.dataType} vs ${rightTime.dataType}")
  }
}

/** Physical merge-scan. Children are co-partitioned on the keys and
  * sorted by (keys…, time) — both declared as requirements, so
  * EnsureRequirements inserts exactly one Exchange + Sort per side
  * (or none when an upstream layout already satisfies them — the same
  * reuse bucketed tables get for free on sort-merge joins).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  // hot-key note: like sort-merge join, a single very hot key lands
  // in one partition; the mitigations are the same as SMJ's (salt the
  // key upstream where semantics allow) or the broadcast form when
  // the right side is small.

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // one row out per left row in left order — the left child's
  // partitioning and ordering survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    AsOfTime.requireTypes(leftTime, rightTime)
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val lTimeEval = BindReferences.bindReference(leftTime, left.output)
      val rTimeEval = BindReferences.bindReference(rightTime, right.output)
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(right.output.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)
      // candidate = latest right row already consumed whose key equals
      // candKey; both copied out of the projection/scan reuse buffers
      var candidate: InternalRow = null
      var candKey: InternalRow = null
      var candTime: Long = Long.MinValue
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTime = lTimeEval.eval(lRow)
        // consume right rows that can never match a LATER left row:
        // strictly-smaller keys, and same-key rows at time ≤ lTime
        // (left is key+time sorted, so later left rows only grow).
        // Null keys sort FIRST under the natural ordering, so a
        // null-keyed left row cannot starve the advance: the only
        // rows it consumes (cmp ≤ 0) are null-keyed right rows, which
        // SQL equi-semantics discard anyway.
        var advance = lTime != null
        while (advance && rBuf.hasNext) {
          val head = rBuf.head
          val headKey = rKeyProj(head)
          val cmp = keyOrd.compare(headKey, lKey)
          if (cmp < 0) { rBuf.next() } // dead key, drop
          else if (cmp == 0) {
            if (headKey.anyNull) { rBuf.next() } // null key never matches (SQL)
            else {
              val rTime = rTimeEval.eval(head)
              if (rTime == null) { rBuf.next() } // null time never matches
              else if (rTime.asInstanceOf[Long] <= lTime.asInstanceOf[Long]) {
                val r = rBuf.next()
                candidate = r.copy()
                candKey = rKeyProj(candidate).copy()
                candTime = rTime.asInstanceOf[Long]
              } else advance = false
            }
          } else advance = false
        }
        // tolerance (pandas merge_asof): the latest-at-or-before match
        // must also be RECENT enough, else the left row gets nulls —
        // emission-time check only, so the candidate stays valid for
        // later (larger-time) left rows of the same key
        val matched = lTime != null && !lKey.anyNull && candidate != null &&
          keyOrd.compare(candKey, lKey) == 0 &&
          tolerance.forall(t => lTime.asInstanceOf[Long] - candTime <= t)
        numOutputRows += 1
        if (matched) numMatched += 1
        resultProj(joined(lRow, if (matched) candidate else nullRight))
      }
    }
  }
}

/** Broadcast physical form — the BHJ to [[AsOfJoinExec]]'s SMJ: when
  * the right side is SMALL (a reference/state history beside a huge
  * fact stream), co-partitioning both sides wastes a full shuffle+sort
  * of the fact table for nothing. This exec collects the right side
  * once, builds a per-key time-sorted index, broadcasts it, and probes
  * with a binary search per left row:
  *
  *  - NO distribution or ordering requirement on either child — the
  *    left keeps its scan partitioning and ordering end-to-end (zero
  *    Exchange in the plan, spec-pinned);
  *  - per-row work is O(log h) for history length h; memory is the
  *    broadcast index only.
  *
  * Same semantics as the merge-scan (null keys/times match nothing,
  * tolerance at probe time, ties need a caller-total composite time —
  * the index takes the LAST entry in time order, exactly the merge's
  * contract) — value-equality is spec-pinned against the merge exec.
  *
  * The `broadcastRight` flag is the caller's size assertion, like
  * Spark's `broadcast()` hint: the right side must fit in driver and
  * executor memory (`spark.driver.maxResultSize` guards the collect).
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"),
    "indexRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "broadcast index rows"))

  // the point of this exec: left flows through untouched
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    AsOfTime.requireTypes(leftTime, rightTime)
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val indexRows = longMetric("indexRows")
    // driver-side index build: key → (times asc, rows in same order).
    // executeCollect materializes independent rows (no scan-buffer
    // reuse), so only the projected keys need copying.
    val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
    val rTimeEval = BindReferences.bindReference(rightTime, right.output)
    val grouped = scala.collection.mutable.HashMap
      .empty[InternalRow, scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]
    right.executeCollect().foreach { r =>
      val k = rKeyProj(r)
      if (!k.anyNull) { // null key never matches (SQL equi-semantics)
        val t = rTimeEval.eval(r)
        if (t != null) // null time never matches
          grouped.getOrElseUpdate(k.copy(),
            scala.collection.mutable.ArrayBuffer.empty) +=
            ((t.asInstanceOf[Long], r))
      }
    }
    val index: Map[InternalRow, (Array[Long], Array[InternalRow])] =
      grouped.iterator.map { case (k, buf) =>
        val sorted = buf.sortBy(_._1)
        k -> (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
      }.toMap
    indexRows += index.valuesIterator.map(_._1.length.toLong).sum
    // driver-side metric writes reach the SQL UI only via an explicit
    // post (the BroadcastExchangeExec pattern); task-side accumulator
    // updates flow automatically but this one is set on the driver
    org.apache.spark.sql.execution.metric.SQLMetrics.postDriverMetricUpdates(
      sparkContext,
      sparkContext.getLocalProperty(
        org.apache.spark.sql.execution.SQLExecution.EXECUTION_ID_KEY),
      Seq(indexRows))
    val bc = sparkContext.broadcast(index)
    val rightWidth = right.output.length
    left.execute().mapPartitions({ iter =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val lTimeEval = BindReferences.bindReference(leftTime, left.output)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(rightWidth)
      val idx = bc.value
      iter.map { lRow =>
        val lTime = lTimeEval.eval(lRow)
        val lKey = lKeyProj(lRow)
        var matched: InternalRow = null
        if (lTime != null && !lKey.anyNull) {
          idx.get(lKey) match {
            case Some((times, rows)) =>
              // greatest i with times(i) ≤ lTime (upper-bound binary
              // search — the LAST of equal times wins, like the merge)
              val lt = lTime.asInstanceOf[Long]
              var lo = 0; var hi = times.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= lt) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (ans >= 0 && tolerance.forall(t => lt - times(ans) <= t))
                matched = rows(ans)
            case None =>
          }
        }
        numOutputRows += 1
        if (matched != null) numMatched += 1
        resultProj(joined(lRow, if (matched != null) matched else nullRight))
      }
    }, preservesPartitioning = true)
  }
}
