package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF JOIN — the full custom-operator stack (SURVEY.md §2 J9,
  * the (c) tier of the extension preference order): a LogicalPlan node,
  * a planner Strategy, and a physical BinaryExecNode, registered
  * through SparkSessionExtensions (graft.spark.GraftExtensions).
  *
  * Semantics (DuckDB `ASOF LEFT JOIN ... ON lk = rk AND rts <= lts`):
  * every left row picks the single right row with the same key and the
  * greatest rts ≤ lts, or nulls.
  *
  * Why a physical operator when a window composition exists
  * (queries.Events.asofJoin): the composition shuffles the UNION of
  * both sides and carries every right payload column through the
  * window frame; the native operator declares
  * requiredChildDistribution/Ordering so Catalyst plans one hash
  * shuffle + sort PER SIDE (exactly a sort-merge join's cost envelope)
  * and the merge itself is a streaming two-pointer pass — O(1) state
  * per key, no frame buffering. At 100 TB: identical shuffle bytes to
  * an equi-join, zero extra passes.
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    // false = backward (greatest rts <= lts, the default);
    // true = forward (smallest rts >= lts)
    forward: Boolean = false) extends BinaryNode {

  // right side is outer: unmatched left rows emit nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, fwd) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge. Children arrive hash-clustered on the key and
  * sorted by (key, ts) — Catalyst's EnsureRequirements inserts the
  * exchanges/sorts (and elides them when the data is already laid out,
  * e.g. bucketed or sorted-on-write tables: the operator then runs
  * shuffle-free). Per partition: a single forward pass over both sorted
  * iterators, remembering only the latest right row at-or-before the
  * current left timestamp — O(left + right) time, O(1 row) state. */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightAttrs = right.output
    val outAttrs = output
    // bind the projection against NULLABLE right attrs: the outer-side
    // null row must be read through null checks, not as zeros
    val inAttrs = left.output ++ right.output.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightAttrs.length)
      val joined = new JoinedRow()
      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      var pending: InternalRow = if (rit.hasNext) rit.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null
      if (forward) lit.map { lrow =>
        // FORWARD: smallest rts >= lts. Left rows arrive ts-ascending,
        // so right rows with rts < lts are dead for every later left row
        // of the key too — consuming them is safe; the match (if any) is
        // the pending row itself, NOT consumed (the next left row may
        // match it again). No carried state at all.
        val k = lkB.eval(lrow)
        val t = ltB.eval(lrow)
        var matched: InternalRow = nullRight
        if (k != null && t != null) {
          var advancing = true
          while (advancing && pending != null) {
            val rk = rkB.eval(pending)
            val cmp = if (rk == null) -1 else keyOrd.compare(rk, k)
            if (cmp < 0) {
              pending = if (rit.hasNext) rit.next() else null
            } else if (cmp == 0) {
              val rt = rtB.eval(pending)
              if (rt == null || tsOrd.compare(rt, t) < 0) {
                pending = if (rit.hasNext) rit.next() else null
              } else { matched = pending; advancing = false }
            } else advancing = false
          }
        }
        proj(joined(lrow, matched))
      }
      else lit.map { lrow =>
        val k = lkB.eval(lrow)
        val t = ltB.eval(lrow)
        // SQL semantics: a null key or null left-ts matches nothing
        // (rts <= NULL is never true), and a null right-ts can never BE
        // a match. The required Ascending ordering sorts NULLS FIRST,
        // so null-ts right rows lead their key group: consume and drop.
        if (k != null && t != null) {
          // consume right rows with (rk < k) or (rk == k && rts <= t);
          // the last equal-key VALID one consumed is the as-of match
          var advancing = true
          while (advancing && pending != null) {
            val rk = rkB.eval(pending)
            val cmp = if (rk == null) -1 else keyOrd.compare(rk, k)
            if (cmp < 0) {
              pending = if (rit.hasNext) rit.next() else null
            } else if (cmp == 0) {
              val rt = rtB.eval(pending)
              if (rt == null) { // unmatched by construction: skip
                pending = if (rit.hasNext) rit.next() else null
              } else if (tsOrd.compare(rt, t) <= 0) {
                // copy BOTH the row and the key: the sort iterator
                // reuses its row buffer (and, post-spill, the backing
                // bytes of non-primitive keys like UTF8String)
                lastMatch = pending.copy()
                lastMatchKey = rkB.eval(lastMatch)
                pending = if (rit.hasNext) rit.next() else null
              } else advancing = false
            } else advancing = false
          }
        }
        val matched =
          if (k != null && t != null && lastMatch != null && lastMatchKey != null &&
            keyOrd.compare(lastMatchKey, k) == 0) lastMatch
          else nullRight
        proj(joined(lrow, matched))
      }
    }
  }
}
