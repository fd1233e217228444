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
/** Match direction, the pandas merge_asof triple:
  *  - [[AsOfDirection.Backward]] — the LATEST right row at-or-before
  *    the left time (the native as-of; default);
  *  - [[AsOfDirection.Forward]] — the EARLIEST right row at-or-after;
  *  - [[AsOfDirection.Nearest]] — whichever of the two is closer in
  *    absolute time distance, ties (equidistant neighbors) going to
  *    the BACKWARD match — the pinned rule, matching the oracle's
  *    `ORDER BY abs(Δt), t_r`.
  * `tolerance` bounds the |gap| on whichever side is considered.
  * Forward is also expressible as backward over negated times; the
  * native form exists because nearest is NOT (it needs both
  * neighbors), and once the scan keeps both, forward is free.
  */
sealed trait AsOfDirection
object AsOfDirection {
  case object Backward extends AsOfDirection
  case object Forward extends AsOfDirection
  case object Nearest extends AsOfDirection
}

/** Physical-form hint, mirroring Spark's own join-strategy hints:
  *  - [[AsOfHint.Auto]] (default) — the strategy chooses like
  *    `JoinSelection` does: the broadcast probe form when the right
  *    side's LOGICAL STATS fall at or under
  *    `spark.sql.autoBroadcastJoinThreshold` (`-1` disables, same
  *    escape as everywhere else in Spark), else the co-partitioned
  *    merge. The plan you'd want at 100× scale is chosen from stats,
  *    not requested per call site.
  *  - [[AsOfHint.Broadcast]] — force the broadcast form (the caller's
  *    size assertion, like the `broadcast()` function).
  *  - [[AsOfHint.Merge]] — force the merge form (like a MERGE join
  *    hint; also what a stats-blind caller uses to keep a
  *    borderline-sized right side off the driver).
  */
sealed trait AsOfHint
object AsOfHint {
  case object Auto extends AsOfHint
  case object Broadcast extends AsOfHint
  case object Merge extends AsOfHint
}

case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long] = None,
    direction: AsOfDirection = AsOfDirection.Backward,
    hint: AsOfHint = AsOfHint.Auto) extends BinaryNode {

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

/** Planner strategy: two physical forms — the shuffle-free broadcast
  * probe (the BHJ analog) and the co-partitioned merge-scan (the SMJ
  * analog). Under [[AsOfHint.Auto]] the choice is STATS-DRIVEN,
  * exactly the decision Spark's `JoinSelection` makes for equi-joins:
  * broadcast when the right side's logical `stats.sizeInBytes` is at
  * or under `spark.sql.autoBroadcastJoinThreshold` (read from the
  * planning session's conf — `SQLConf.get` is bound by
  * `QueryExecution` during planning), merge otherwise; threshold ≤ 0
  * disables auto-broadcast, Spark's own `never` escape. The explicit
  * hints override in either direction. planLater for the children so
  * the rest of the tree plans normally.
  */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case a: AsOfJoin =>
      val broadcast = a.hint match {
        case AsOfHint.Broadcast => true
        case AsOfHint.Merge => false
        case AsOfHint.Auto =>
          val threshold = org.apache.spark.sql.internal.SQLConf.get
            .autoBroadcastJoinThreshold
          threshold > 0 && a.right.stats.sizeInBytes <= threshold
      }
      if (broadcast)
        BroadcastAsOfJoinExec(a.leftKeys, a.rightKeys, a.leftTime, a.rightTime,
          a.tolerance, a.direction, planLater(a.left), planLater(a.right)) :: Nil
      else
        AsOfJoinExec(a.leftKeys, a.rightKeys, a.leftTime, a.rightTime,
          a.tolerance, a.direction, planLater(a.left), planLater(a.right)) :: Nil
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
    direction: AsOfDirection,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  // hot-key note: like sort-merge join, a single very hot key lands
  // in one partition. Mitigations, by right-side size: SMALL → the
  // broadcast form (zero shuffle, no skew possible); too big to
  // broadcast → AsOfJoinOps.asofSalted (salt the left, replicate the
  // right across salts — each (key, salt) partition keeps the key's
  // full history, so semantics are unchanged; spec-pinned).

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
    val dir = direction
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
      // Backward/Nearest keep a BACKWARD candidate: the latest right
      // row already consumed (key, time ≤ left time), copied out of
      // the projection/scan reuse buffers. Forward keeps none — its
      // match is always the un-consumed HEAD, peeked in place.
      val keepBackward = dir != AsOfDirection.Forward
      var candidate: InternalRow = null
      var candKey: InternalRow = null
      var candTime: Long = Long.MinValue
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeAny = lTimeEval.eval(lRow)
        val lTime = if (lTimeAny == null) 0L else lTimeAny.asInstanceOf[Long]
        // consume right rows that can never match a LATER left row:
        // strictly-smaller keys, and same-key rows behind the frontier
        // (time ≤ lTime for backward/nearest — they become the
        // backward candidate; time < lTime for forward — dead, since
        // later left rows only grow). Null keys sort FIRST under the
        // natural ordering, so a null-keyed left row cannot starve the
        // advance: the only rows it consumes (cmp ≤ 0) are null-keyed
        // right rows, which SQL equi-semantics discard anyway. Null
        // times sort first WITHIN a key group and are dropped here, so
        // the head a forward/nearest probe peeks always has a real time.
        var advance = lTimeAny != null
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
              else {
                val rt = rTime.asInstanceOf[Long]
                if (if (keepBackward) rt <= lTime else rt < lTime) {
                  val r = rBuf.next()
                  if (keepBackward) {
                    candidate = r.copy()
                    candKey = rKeyProj(candidate).copy()
                    candTime = rt
                  }
                } else advance = false
              }
            }
          } else advance = false
        }
        // decide the match for THIS left row. tolerance (pandas
        // merge_asof): the neighbor must also be CLOSE enough, else
        // nulls — an emission-time check only, so the backward
        // candidate stays valid for later left rows of the same key.
        var matched: InternalRow = null
        if (lTimeAny != null && !lKey.anyNull) {
          val backOk = keepBackward && candidate != null &&
            keyOrd.compare(candKey, lKey) == 0 &&
            tolerance.forall(t => lTime - candTime <= t)
          // forward neighbor = the still-buffered head, iff same key:
          // the FIRST right row at-or-after (forward) / strictly after
          // (nearest — equal times were consumed as the backward
          // candidate, distance 0) the left time. Peeked, never
          // consumed — it may be a later left row's backward match.
          var fwdRow: InternalRow = null
          var fwdTime = 0L
          if (dir != AsOfDirection.Backward && rBuf.hasNext) {
            val head = rBuf.head
            val headKey = rKeyProj(head)
            if (!headKey.anyNull && keyOrd.compare(headKey, lKey) == 0) {
              val rTime = rTimeEval.eval(head)
              if (rTime != null) {
                val rt = rTime.asInstanceOf[Long]
                if (rt >= lTime && tolerance.forall(t => rt - lTime <= t)) {
                  fwdRow = head; fwdTime = rt
                }
              }
            }
          }
          matched = dir match {
            case AsOfDirection.Backward => if (backOk) candidate else null
            case AsOfDirection.Forward => fwdRow
            case AsOfDirection.Nearest =>
              if (backOk && fwdRow != null)
                // pinned tie rule: equidistant → backward (earlier t_r)
                if (lTime - candTime <= fwdTime - lTime) candidate else fwdRow
              else if (backOk) candidate
              else fwdRow
          }
        }
        numOutputRows += 1
        if (matched != null) numMatched += 1
        resultProj(joined(lRow, if (matched != null) matched else nullRight))
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
  * tolerance at probe time, all three directions) — value-equality is
  * spec-pinned against the merge exec. EQUAL-TIME ties: both forms
  * take the last (backward) / first (forward) entry *in their own
  * physical order* — shuffle-sort order here, driver-collect order in
  * the index — so WHICH of several same-(key, time) right rows wins
  * is undefined and may differ between the forms and between runs.
  * Callers needing determinism under ties must make the time column a
  * total order (the composite-time pattern `asof2` uses); payloads
  * that are functions of (key, time) alone — like the gated `asof_bc`
  * query, whose payload IS the time — are tie-immune by construction.
  *
  * Planned under [[AsOfHint.Broadcast]] (the caller's size assertion,
  * like Spark's `broadcast()` hint: the right side must fit in driver
  * and executor memory — `spark.driver.maxResultSize` guards the
  * collect) or under [[AsOfHint.Auto]] when the right side's stats
  * clear `spark.sql.autoBroadcastJoinThreshold`.
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    direction: AsOfDirection,
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
      .createMetric(sparkContext, "broadcast index rows"),
    "indexBytes" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createSizeMetric(sparkContext, "broadcast index size"))

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
    val indexBytes = longMetric("indexBytes")
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
    // measured memory bill of the boxed-Map index (SizeEstimator walks
    // the object graph — the same estimator Spark's MemoryStore uses),
    // so "how expensive was this broadcast" is a number in the SQL UI
    // rather than a guess. Measured on the signup history (2 long
    // columns): ~104 bytes/row, ≈4× the raw 24-byte UnsafeRow payload
    // — the boxed-Map/two-array overhead, per-row so scale-invariant
    // (AsOfJoinSpec asserts the band). Acceptable for a
    // caller-asserted small side; switch to an UnsafeRow-paged layout
    // only if this metric ever says otherwise on a real workload.
    indexBytes += org.apache.spark.util.SizeEstimator.estimate(index)
    // driver-side metric writes reach the SQL UI only via an explicit
    // post (the BroadcastExchangeExec pattern); task-side accumulator
    // updates flow automatically but these are set on the driver
    org.apache.spark.sql.execution.metric.SQLMetrics.postDriverMetricUpdates(
      sparkContext,
      sparkContext.getLocalProperty(
        org.apache.spark.sql.execution.SQLExecution.EXECUTION_ID_KEY),
      Seq(indexRows, indexBytes))
    val bc = sparkContext.broadcast(index)
    val rightWidth = right.output.length
    val dir = direction
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
              // search — the LAST of equal times wins, like the merge;
              // the forward neighbor is then ans+1, the FIRST strictly
              // after, and forward-inclusive probes lower-bound below)
              val lt = lTime.asInstanceOf[Long]
              var lo = 0; var hi = times.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= lt) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              val backOk = ans >= 0 &&
                tolerance.forall(t => lt - times(ans) <= t)
              dir match {
                case AsOfDirection.Backward =>
                  if (backOk) matched = rows(ans)
                case AsOfDirection.Forward =>
                  // smallest i with times(i) ≥ lt — the FIRST of equal
                  // times, exactly the merge's un-consumed head. That
                  // is ans+1 (first > lt) unless times(ans) == lt, in
                  // which case walk back to the first equal entry.
                  var f = ans + 1
                  if (ans >= 0 && times(ans) == lt) {
                    f = ans
                    while (f > 0 && times(f - 1) == lt) f -= 1
                  }
                  if (f < times.length &&
                    tolerance.forall(t => times(f) - lt <= t))
                    matched = rows(f)
                case AsOfDirection.Nearest =>
                  // backward neighbor vs the first strictly-after one;
                  // pinned tie rule: equidistant → backward (equal
                  // times land on the backward side at distance 0)
                  val f = ans + 1
                  val fwdOk = f < times.length &&
                    tolerance.forall(t => times(f) - lt <= t)
                  if (backOk && fwdOk)
                    matched =
                      if (lt - times(ans) <= times(f) - lt) rows(ans)
                      else rows(f)
                  else if (backOk) matched = rows(ans)
                  else if (fwdOk) matched = rows(f)
              }
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
