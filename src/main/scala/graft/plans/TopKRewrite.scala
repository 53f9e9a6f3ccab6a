package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, CurrentRow, Expression, IntegerLiteral, LessThan,
  LessThanOrEqual, NamedExpression, RowFrame, RowNumber, SortOrder,
  SpecifiedWindowFrame, UnboundedPreceding, WindowExpression,
  WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** OPTIMIZER REWRITE: the universal top-k idiom
  *
  *   `row_number() OVER (PARTITION BY g ORDER BY o) AS rn` + `rn <= k`
  *
  * becomes the custom [[TopKPerGroup]] operator — users keep writing
  * the standard window spelling (DataFrame or SQL) and the engine
  * plans k-bounded heaps instead of a full partition sort. The rewrite
  * reuses row_number's own output attribute, so downstream references
  * resolve unchanged.
  *
  * Deliberately narrow — it fires only when ALL of:
  *   - the Window computes exactly ONE expression, a plain
  *     `row_number()` over the default row frame;
  *   - every partition key is a bare attribute of the child;
  *   - the Filter is exactly `rn <= lit` / `rn < lit` (a conjunct-free
  *     bound) sitting directly on the Window, or on a deterministic
  *     Project of it that exposes the rank — bare (`rn`) or RENAMED
  *     (`rn AS rank`); a recomputed rank (`rn + 1 AS rank`) is a
  *     different bound and declines;
  *   - the bound is positive (`rn <= 0` must yield the empty relation,
  *     which the heap operator cannot represent — left to Spark).
  *
  * Gated by `spark.graft.topk.rewrite` (default FALSE): the engine's
  * oracle queries spell top-k through the operator explicitly where
  * intended; the rule is the opt-in path for workloads that arrive as
  * plain SQL. */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    // tolerant parse: this rule runs in EVERY query's optimization,
    // so a value like "1" must read as off, not throw from toBoolean
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.topk.rewrite", "false")
      .trim.equalsIgnoreCase("true")

  /** The single-window-expression row_number shape, if eligible. */
  private object RowNumberWindow {
    def unapply(w: Window): Option[(LogicalPlan, Seq[Attribute],
        Seq[SortOrder], Attribute)] = w match {
      case Window(Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(parts, order, frame)), _)), _, _, child, _)
          if frameIsDefault(frame) &&
            parts.forall(_.isInstanceOf[AttributeReference]) &&
            order.nonEmpty =>
        Some((child, parts.map(_.asInstanceOf[Attribute]), order,
          a.toAttribute))
      case _ => None
    }
    private def frameIsDefault(frame: Expression): Boolean = frame match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
        true
      case _ => false
    }
  }

  /** `rn <= k` / `rn < k` over the given attribute → k. */
  private def bound(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rn) => Some(k)
      // Int.MinValue - 1 would wrap to MaxValue and turn an
      // always-false predicate into keep-everything
      case LessThan(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rn) && k > Int.MinValue => Some(k - 1)
      case _ => None
    }

  /** Every handle the projection exposes for the rank: the bare
    * attribute or a direct rename (`Alias(rn, _)`). A COMPUTED alias
    * (`rn + 1 AS rank`) is deliberately not a handle — its bound
    * means something else. */
  private def rankHandles(projList: Seq[NamedExpression],
                          rn: Attribute): Seq[Attribute] =
    projList.collect {
      case a: Attribute if a.semanticEquals(rn) => a
      case al @ Alias(a: Attribute, _) if a.semanticEquals(rn) =>
        al.toAttribute
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case Filter(cond, w @ RowNumberWindow(child, keys, order, rn)) =>
        bound(cond, rn) match {
          case Some(k) if k > 0 => TopKPerGroup(child, keys, order, k, rn)
          case _ => Filter(cond, w)
        }
      // the rank may flow through a Project renamed (rn AS rank) or
      // bare; replacing Window→TopK under a deterministic Project is
      // row-equivalent (the projection of surviving rows is the same
      // either side of the bound), while a nondeterministic one would
      // change which rows draw values — decline those like Spark's
      // own filter pushdown does
      case f @ Filter(cond,
          Project(projList, RowNumberWindow(child, keys, order, rn)))
          if projList.forall(_.deterministic) =>
        rankHandles(projList, rn).flatMap(bound(cond, _)).headOption match {
          case Some(k) if k > 0 =>
            Project(projList, TopKPerGroup(child, keys, order, k, rn))
          case _ => f
        }
    }
}
