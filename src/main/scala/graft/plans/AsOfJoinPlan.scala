package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}

/** AS-OF JOIN as a first-class engine operator — the (c)-tier of the
  * custom-operator ladder (custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered through `SparkSessionExtensions`), for the
  * one relational operation Spark has no built-in for and the
  * compositional spelling (union + running window, q94) pays a
  * window's state for.
  *
  * Semantics: for every left row, attach the right row with the
  * LATEST `rightTime` ≤ `leftTime` within the same key (ties include
  * the equal-time right row), or nulls when none precedes it.
  *
  * Scale design: the physical operator demands hash clustering on the
  * key and (key, time) ordering from BOTH children — `EnsureRequirements`
  * inserts exactly the exchanges/sorts a sort-merge join would get —
  * then streams the two sorted sides through a single forward-only
  * merge per partition: O(left + right), no buffering beyond one
  * candidate row, no window state, no row expansion. The same merge
  * an ASOF JOIN does in kdb/QuestDB/DuckDB, here as a Spark operator.
  */
final case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                          leftKey: Attribute, rightKey: Attribute,
                          leftTime: Attribute, rightTime: Attribute,
                          rightValues: Seq[Attribute])
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  /** The whole left output passes through — declare it referenced so
    * generic column pruning never strips columns this node carries. */
  override def references:
      org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ Seq(rightKey, rightTime) ++ rightValues)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** User-facing entry: `AsOf.join(facts, refs, key, time, values)` —
  * each fact row gains the `values` columns of the latest `refs` row
  * with ref.time ≤ fact.time for the same key (nulls when none).
  * Column names are resolved per side, so both sides naturally share
  * the key/time names; rename value columns on the right beforehand if
  * they collide with left columns. */
object AsOf {
  def join(left: org.apache.spark.sql.DataFrame,
           right: org.apache.spark.sql.DataFrame,
           key: String, time: String,
           values: Seq[String]): org.apache.spark.sql.DataFrame = {
    val lp = left.queryExecution.analyzed
    // both sides often share lineage (facts/refs filtered off one
    // table) → rewrite the right side's exprIds like a self-join
    val rp = org.apache.spark.sql.GraftPlanBridge.dedupRight(
      lp, right.queryExecution.analyzed)
    // resolve names the way the analyzer would (case-insensitive by
    // default), not by raw string equality
    val resolve = org.apache.spark.sql.GraftPlanBridge
      .resolver(left.sparkSession)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(a => resolve(a.name, n)).getOrElse(
        sys.error(s"as-of join: no column '$n' in ${p.output.map(_.name)}"))
    org.apache.spark.sql.GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoin(lp, rp, attr(lp, key), attr(rp, key),
        attr(lp, time), attr(rp, time), values.map(attr(rp, _))))
  }
}

/** Planner rule with a COST-BASED physical choice, mirroring Spark's
  * broadcast-vs-merge join selection: a right side under the
  * autoBroadcastJoinThreshold plans as [[BroadcastAsOfJoinExec]]
  * (zero shuffles, zero sorts — the reference timeline ships to every
  * executor as a per-key sorted index), anything bigger as the
  * co-partitioned merge [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, rv) =>
      val threshold = org.apache.spark.sql.internal.SQLConf.get
        .autoBroadcastJoinThreshold
      val exec =
        if (threshold > 0 && r.stats.sizeInBytes <= threshold)
          BroadcastAsOfJoinExec(planLater(l), planLater(r),
            lk, rk, lt, rt, rv)
        else
          AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv)
      exec :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                              leftKey: Attribute, rightKey: Attribute,
                              leftTime: Attribute, rightTime: Attribute,
                              rightValues: Seq[Attribute])
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  /** Both sides cluster on the key: EnsureRequirements gives the two
    * children the SAME hash partitioning (co-partitioned merge). */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  /** And each side arrives sorted by (key, time) — the merge is then a
    * single forward pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** Left rows pass through in order, so downstream operators can
    * reuse both the partitioning and the sort. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // bindReference casts its result back to the STATIC type of the
    // argument — pass as Expression or the BoundReference cast throws
    val lKey = BindReferences.bindReference(
      leftKey: org.apache.spark.sql.catalyst.expressions.Expression,
      left.output)
    val lTime = BindReferences.bindReference(
      leftTime: org.apache.spark.sql.catalyst.expressions.Expression,
      left.output)
    val rKey = BindReferences.bindReference(
      rightKey: org.apache.spark.sql.catalyst.expressions.Expression,
      right.output)
    val rTime = BindReferences.bindReference(
      rightTime: org.apache.spark.sql.catalyst.expressions.Expression,
      right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightValueAttrs = rightValues
    val rightOutput = right.output
    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // projects the buffered right row down to just the carried values
      val rValueProj = UnsafeProjection.create(rightValueAttrs, rightOutput)
      val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val nulls = new GenericInternalRow(rightValueAttrs.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // last right row (key + projected values) with time <= current
      // left time; BOTH the key and the values are COPIES — unsafe
      // shuffle rows (and UTF8String keys pointing into them) are
      // reused buffers that mutate when the iterator advances
      var candKey: Any = null
      var hasCand = false
      var candValues: InternalRow = null
      // a NULL key or time never matches (SQL join semantics — the
      // interpreted ordering would otherwise unbox NULL to 0 and
      // silently join NULL-key facts to key-0 refs); sorted input
      // puts right-side NULLs first, so they drain up front
      lIter.map { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        if (k == null || t == null) {
          outProj(joined(lRow, nulls))
        } else {
          // drop candidate from a previous key group
          if (hasCand && keyOrd.compare(candKey, k) != 0) {
            hasCand = false; candValues = null
          }
          // advance the right side: discard earlier/NULL keys, absorb
          // rows of this key with time <= left time (the LAST wins)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rk = rKey.eval(rRow)
            if (rk == null) { rBuf.next() }
            else {
              val c = keyOrd.compare(rk, k)
              if (c < 0) { rBuf.next() }
              else if (c == 0) {
                val rt = rTime.eval(rRow)
                if (rt == null) { rBuf.next() }
                else if (timeOrd.compare(rt, t) <= 0) {
                  candKey = InternalRow.copyValue(rk)
                  candValues = rValueProj(rRow).copy()
                  hasCand = true
                  rBuf.next()
                } else advancing = false
              } else advancing = false
            }
          }
          outProj(joined(lRow, if (hasCand) candValues else nulls))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast variant for a small reference side (the dimension /
  * price-timeline case): the whole right side collects ONCE, builds a
  * per-key time-sorted index, and ships to executors — the left side
  * keeps its partitioning and ordering untouched (no exchange, no
  * sort on either side), each left row resolves by binary search.
  * Exactly the asymmetry BroadcastHashJoin exploits, for as-of
  * semantics. */
final case class BroadcastAsOfJoinExec(left: SparkPlan, right: SparkPlan,
                                       leftKey: Attribute,
                                       rightKey: Attribute,
                                       leftTime: Attribute,
                                       rightTime: Attribute,
                                       rightValues: Seq[Attribute])
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val rKey = BindReferences.bindReference(
      rightKey: org.apache.spark.sql.catalyst.expressions.Expression,
      right.output)
    val rTime = BindReferences.bindReference(
      rightTime: org.apache.spark.sql.catalyst.expressions.Expression,
      right.output)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rValueProj = UnsafeProjection.create(rightValues, right.output)
    // driver-side build: key → (times sorted asc, values aligned);
    // NULL keys/times never match (SQL join semantics) so they are
    // excluded from the index
    val index: Map[Any, (Array[Any], Array[InternalRow])] =
      right.executeCollect()
        .map(r => (rKey.eval(r), rTime.eval(r), rValueProj(r).copy()))
        .filter(x => x._1 != null && x._2 != null)
        .groupBy(_._1)
        .map { case (k, rows) =>
          val sorted = rows.sortWith((a, b) => timeOrd.compare(a._2, b._2) < 0)
          k -> (sorted.map(_._2), sorted.map(_._3
            : InternalRow))
        }
    val bcast = sparkContext.broadcast(index)
    val lKeyAttr = leftKey
    val lTimeAttr = leftTime
    val leftOutput = left.output
    val outputAttrs = output
    val nValues = rightValues.length
    left.execute().mapPartitions { iter =>
      val lKey = BindReferences.bindReference(
        lKeyAttr: org.apache.spark.sql.catalyst.expressions.Expression,
        leftOutput)
      val lTime = BindReferences.bindReference(
        lTimeAttr: org.apache.spark.sql.catalyst.expressions.Expression,
        leftOutput)
      val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val nulls = new GenericInternalRow(nValues)
      val joined = new JoinedRow
      val idx = bcast.value
      iter.map { lRow =>
        val t = lTime.eval(lRow)
        val matched =
          if (t == null) nulls // NULL time never matches
          else idx.get(lKey.eval(lRow)) match {
            case Some((times, values)) =>
              // greatest index with times(i) <= t
              var lo = 0
              var hi = times.length - 1
              var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (timeOrd.compare(times(mid), t) <= 0) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (ans >= 0) values(ans) else nulls
            case None => nulls
          }
        outProj(joined(lRow, matched))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
